"""Single-process parse-stage profile: where does a parse CPU-second go?

Splits the per-batch cost of the AST pass into (a) lower_doc (pure parsing),
(b) row-stream assembly, (c) batch construction — comparing the legacy
pandas object-frame + Int64-cast build against the Arrow-native
``pa.Table.from_pylist`` build that ``parse_docs`` now ships — over N
deterministic synth docs drawn from the SAME 11-language dispatch the
pipeline parses. No Spark session; run it in a quiet window to attribute
the parse wall to Python CPU vs Arrow/shuffle.

Usage: python tools/profile_parse.py [n_docs] [--cprofile]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import pandas as pd
import pyarrow as pa

from joern_spark.frontend.lowering import lower_doc
from joern_spark.operators.ast_pass import _ALL_COLUMNS, _rows_for_doc
from joern_spark.schema import CPGROW_SCHEMA_DDL, arrow_schema
from joern_spark.synth import split_code_spans, synth_code_for_key, synth_key


def main(n_docs: int = 2000) -> None:
    docs = []
    for i in range(n_docs):
        doc_id = f"prof-{i}"
        k = synth_key(doc_id)
        helper = f"helper_{k % 1000000:06d}"
        code = synth_code_for_key(k, helper)
        docs.append((doc_id, split_code_spans(code, 3)))

    t0 = time.perf_counter()
    lowered = [lower_doc(d, s) for d, s in docs]
    t1 = time.perf_counter()
    rows = []
    for d, s in docs:
        rows.extend(_rows_for_doc(d, s))
    t2 = time.perf_counter()
    # legacy pandas build (what mapInPandas shipped before round 4)
    out = pd.DataFrame(rows, dtype=object)
    for col in _ALL_COLUMNS:
        if col not in out.columns:
            out[col] = None
    for col in ["node_id", "parent_id", "method_id", "edge_src", "edge_dst",
                "order", "argument_index", "line", "span_offset"]:
        out[col] = out[col].astype("Int64")
    out = out[_ALL_COLUMNS]
    t3 = time.perf_counter()
    # Arrow-native build (what parse_docs ships now)
    tbl = pa.Table.from_pylist(rows, schema=arrow_schema(CPGROW_SCHEMA_DDL))
    t4 = time.perf_counter()

    n_rows = len(rows)
    print(f"docs={n_docs} rows={n_rows}")
    print(f"lower_doc (parse only)     : {t1 - t0:7.2f}s  "
          f"{1e6 * (t1 - t0) / n_docs:7.1f} us/doc")
    print(f"row assembly (incl parse)  : {t2 - t1:7.2f}s")
    print(f"pandas build + Int64 casts : {t3 - t2:7.2f}s  "
          f"{1e9 * (t3 - t2) / n_rows:7.1f} ns/row")
    print(f"arrow from_pylist build    : {t4 - t3:7.2f}s  "
          f"{1e9 * (t4 - t3) / n_rows:7.1f} ns/row  "
          f"({(t3 - t2) / max(t4 - t3, 1e-9):.1f}x faster)")
    share = (t4 - t3) / ((t2 - t1) + (t4 - t3))
    print(f"arrow-build share of batch cost: {share:.0%}")
    _ = lowered, tbl

    if "--cprofile" in sys.argv:
        import cProfile
        import pstats

        pr = cProfile.Profile()
        pr.enable()
        for d, s in docs:
            _rows_for_doc(d, s)
        pr.disable()
        pstats.Stats(pr).sort_stats("cumulative").print_stats(25)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(int(args[0]) if args else 2000)
