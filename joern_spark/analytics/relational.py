"""Relational engine-parity queries over the TPC-H-ish tables.

Each query exercises one of the join/agg shapes the CPG passes rely on
(SURVEY.md §2.E), with money arithmetic in exact decimals so Spark and the
DuckDB oracle agree bit-for-bit:

- pricing_summary  — partial-agg groupBy (NamespaceCreator shape, ref #5)
- orders_by_nation — broadcast-dim join chain (AstLinkerPass shape, ref #10)
- top_order_per_customer — window dedup (Engine.scala:154-179 keep-best shape)
- customers_without_orders — anti-join (stub creation shape, ref #6/#7)
- events_rollup    — event-stream groupBy rollup (lineage/metrics shape)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (exact decimal money math)."""
    li = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("decimal(38,2)").alias("sum_qty"),
            F.sum(price).cast("decimal(38,2)").alias("sum_base_price"),
            F.sum((price * (F.lit(1).cast("decimal(18,2)") - disc)).cast("decimal(18,4)"))
            .cast("decimal(38,4)").alias("sum_disc_price"),
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
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("decimal(38,2)").alias("total_price"),
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
            F.col("o_totalprice").cast("decimal(18,2)").alias("top_price"),
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
    """Event rollup per (event_type, day): count + exact total value."""
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy(
            "event_type", F.to_date("ts").alias("day")
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("decimal(38,4)").alias("total_value"),
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
               sum(l_quantity::DECIMAL(18,2))::DECIMAL(38,2) AS sum_qty,
               sum(l_extendedprice::DECIMAL(18,2))::DECIMAL(38,2) AS sum_base_price,
               sum((l_extendedprice::DECIMAL(18,2) * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)))::DECIMAL(18,4))::DECIMAL(38,4) AS sum_disc_price,
               count(*)::BIGINT AS count_order
        FROM lineitem
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "rel_orders_by_nation": """
        SELECT n_name,
               count(*)::BIGINT AS n_orders,
               sum(o_totalprice::DECIMAL(18,2))::DECIMAL(38,2) AS total_price
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "rel_top_order_per_customer": """
        SELECT o_custkey, o_orderkey AS top_orderkey,
               o_totalprice::DECIMAL(18,2) AS top_price
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
        SELECT event_type, ts::DATE AS day,
               count(*)::BIGINT AS n_events,
               sum(value::DECIMAL(18,4))::DECIMAL(38,4) AS total_value
        FROM events
        GROUP BY event_type, ts::DATE
    """,
}
