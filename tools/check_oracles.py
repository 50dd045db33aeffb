"""Local stand-in for the driver's correctness gate: run every queries()
entry and its oracle_sql() side-by-side at sf0.01, compare row count, column
names, and an order-insensitive value hash.

Usage: python tools/check_oracles.py [name ...]
"""

from __future__ import annotations

import hashlib
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import duckdb

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v) -> str:
    import datetime
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.6f}"
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (datetime.date, datetime.datetime)):
        return str(v)[:10] if isinstance(v, datetime.date) else str(v)
    return str(v)


def type_class(t: str) -> str:
    """Coarse type class for Spark dtypes and DuckDB logical types.

    Deliberately keeps HUGEINT/DECIMAL distinct from plain ints: the driver's
    value hash renders DuckDB HUGEINT differently from Spark BIGINT even when
    fetchall() yields equal Python ints (VERDICT r3 "What's wrong" #1), so the
    local gate must be at least as strict.
    """
    t = t.lower()
    if t.startswith("decimal") or t == "hugeint" or t == "uhugeint":
        return "decimal"
    if t in ("tinyint", "smallint", "int", "integer", "bigint",
             "utinyint", "usmallint", "uinteger", "ubigint"):
        return "int"
    if t in ("float", "double", "real"):
        return "float"
    if t in ("string", "varchar", "text"):
        return "str"
    if t.startswith("timestamp"):
        return "timestamp"
    return t


def value_hash(rows, columns) -> str:
    idx = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(",".join(norm_cell(r[i]) for i in idx) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main() -> None:
    import __spark_entry__ as entry_mod
    from joern_spark.session import get_spark

    spark = get_spark(app_name="check_oracles", cpus=8, shuffle_partitions=8,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    only = set(sys.argv[1:])
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {exc}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle — rows-only check)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = list(rel.columns)
            dtypes = [str(t) for t in rel.types]
            drows = rel.fetchall()
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures.append(name)
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rows {len(srows)} != {len(drows)}")
        stype_by_col = dict(sdf.dtypes)
        dtype_by_col = dict(zip(dcols, dtypes))
        for c in sorted(set(scols) & set(dcols)):
            sc, dc = type_class(stype_by_col[c]), type_class(dtype_by_col[c])
            if sc != dc:
                problems.append(
                    f"type mismatch {c}: spark {stype_by_col[c]} ({sc}) vs "
                    f"duckdb {dtype_by_col[c]} ({dc})")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} != {sorted(dcols)}")
        elif value_hash(srows, scols) != value_hash(drows, dcols):
            problems.append("value-hash mismatch")
            sset = {",".join(norm_cell(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i])) for r in srows}
            dset = {",".join(norm_cell(r[i]) for i in sorted(range(len(dcols)), key=lambda i: dcols[i])) for r in drows}
            for x in sorted(sset - dset)[:3]:
                problems.append(f"  spark-only: {x}")
            for x in sorted(dset - sset)[:3]:
                problems.append(f"  duck-only:  {x}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(f"      {p}")
            failures.append(name)
        else:
            print(f"OK    {name}: {len(srows)} rows")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
