"""Single-process parse-stage profile: where does a parse CPU-second go?

Splits the per-batch cost of the AST pass into (a) lower_doc (pure parsing),
(b) row-stream assembly, (c) pandas frame construction + Int64 casts — the
exact shape of ast_pass.parse_docs.run — over N deterministic synth docs.
No Spark session; run it next to a quiet-window pair to attribute the
non-scaling parse wall to Python CPU vs Arrow/shuffle.

Usage: python tools/profile_parse.py [n_docs]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import pandas as pd

from joern_spark.frontend.lowering import lower_doc
from joern_spark.operators.ast_pass import _ALL_COLUMNS, _rows_for_doc
from joern_spark.synth import code_for_key, js_code_for_key, split_code_spans, synth_key


def main(n_docs: int = 2000) -> None:
    docs = []
    for i in range(n_docs):
        doc_id = f"prof-{i}"
        k = synth_key(doc_id)
        helper = f"helper_{k % 1000000:06d}"
        code = js_code_for_key(k, helper) if k % 11 == 3 else code_for_key(k, helper)
        docs.append((doc_id, split_code_spans(code, 3)))

    t0 = time.perf_counter()
    lowered = [lower_doc(d, s) for d, s in docs]
    t1 = time.perf_counter()
    rows = []
    for d, s in docs:
        rows.extend(_rows_for_doc(d, s))
    t2 = time.perf_counter()
    out = pd.DataFrame(rows, dtype=object)
    for col in _ALL_COLUMNS:
        if col not in out.columns:
            out[col] = None
    for col in ["node_id", "parent_id", "method_id", "edge_src", "edge_dst",
                "order", "argument_index", "line", "span_offset"]:
        out[col] = out[col].astype("Int64")
    out = out[_ALL_COLUMNS]
    t3 = time.perf_counter()

    n_rows = len(rows)
    print(f"docs={n_docs} rows={n_rows}")
    print(f"lower_doc (parse only)   : {t1 - t0:7.2f}s  "
          f"{1e6 * (t1 - t0) / n_docs:7.1f} us/doc")
    print(f"row assembly (incl parse): {t2 - t1:7.2f}s")
    print(f"frame build + Int64 casts: {t3 - t2:7.2f}s  "
          f"{1e9 * (t3 - t2) / n_rows:7.1f} ns/row")
    share = (t3 - t2) / ((t2 - t1) + (t3 - t2))
    print(f"frame-build share of batch cost: {share:.0%}")
    _ = lowered


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2000)
