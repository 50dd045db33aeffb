"""Relational engine-parity queries over the TPC-H-ish tables.

Each query exercises one of the join/agg shapes the CPG passes rely on
(SURVEY.md §2.E):

- pricing_summary  — partial-agg groupBy (NamespaceCreator shape, ref #5)
- orders_by_nation — broadcast-dim join chain (AstLinkerPass shape, ref #10)
- top_order_per_customer — window dedup (Engine.scala:154-179 keep-best shape)
- customers_without_orders — anti-join (stub creation shape, ref #6/#7)
- events_rollup    — event-stream groupBy rollup (lineage/metrics shape)

Money math convention (drives the driver's value-hash gate): every monetary
output is an INTEGER minor-unit column (``*_c`` = cents, ``*_bp`` = 1e-4
units). Per-row ``round(x * scale)`` on the source double is IEEE-identical
in Spark and DuckDB (same multiply, positive half-up rounding), and the sum
of longs is exact and order-independent — no decimal-rendering ambiguity.
Sums accumulate in decimal(38,0) so ANSI mode can't overflow at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _minor(col, scale: int):
    """Double → exact integer minor units (e.g. cents): round(x*scale) as long."""
    return F.round(col * F.lit(float(scale))).cast("long")


def _lsum(col):
    """Overflow-safe exact sum of a long column → long."""
    return F.sum(col.cast("decimal(38,0)")).cast("long")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (integer minor-unit money math)."""
    li = _t(spark, sf_dir, "lineitem")
    price_c = _minor(F.col("l_extendedprice"), 100)
    disc_bp = _minor(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 10000
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _lsum(_minor(F.col("l_quantity"), 100)).alias("sum_qty_c"),
            _lsum(price_c).alias("sum_base_price_c"),
            _lsum(disc_bp).alias("sum_disc_price_bp"),
            F.count("*").cast("long").alias("count_order"),
        )
    )


def orders_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per nation: fact ⋈ broadcast(customer) ⋈ broadcast(nation)."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            _lsum(_minor(F.col("o_totalprice"), 100)).alias("total_price_c"),
        )
    )


def top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-best-per-key window (rank 1 by price desc, orderkey asc)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("top_orderkey"),
            _minor(F.col("o_totalprice"), 100).alias("top_price_c"),
        )
    )


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join: customers that never ordered (stub-creation shape)."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer["c_custkey"] == orders["o_custkey"], "left_anti")
        .select("c_custkey", "c_name")
    )


def events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event rollup per (event_type, day): count + exact total value (1e-4 units)."""
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy(
            "event_type", F.to_date("ts").cast("string").alias("day")
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            _lsum(_minor(F.col("value"), 10000)).alias("total_value_bp"),
        )
    )


QUERIES = {
    "rel_pricing_summary": pricing_summary,
    "rel_orders_by_nation": orders_by_nation,
    "rel_top_order_per_customer": top_order_per_customer,
    "rel_customers_without_orders": customers_without_orders,
    "rel_events_rollup": events_rollup,
}

ORACLES = {
    "rel_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(round(l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS sum_qty_c,
               CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS sum_base_price_c,
               CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000.0) AS BIGINT)) AS BIGINT) AS sum_disc_price_bp,
               count(*)::BIGINT AS count_order
        FROM lineitem
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "rel_orders_by_nation": """
        SELECT n_name,
               count(*)::BIGINT AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS total_price_c
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "rel_top_order_per_customer": """
        SELECT o_custkey, o_orderkey AS top_orderkey,
               CAST(round(o_totalprice * 100.0) AS BIGINT) AS top_price_c
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
            ) AS rn FROM orders
        ) WHERE rn = 1
    """,
    "rel_customers_without_orders": """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    "rel_events_rollup": """
        SELECT event_type, (ts::DATE)::VARCHAR AS day,
               count(*)::BIGINT AS n_events,
               CAST(sum(CAST(round(value * 10000.0) AS BIGINT)) AS BIGINT) AS total_value_bp
        FROM events
        GROUP BY event_type, ts::DATE
    """,
}
