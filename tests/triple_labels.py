"""Content-labelled triple rendering for golden P/R comparison.

Node ids are hashes; for cross-run comparison each node is rendered as a
stable content label ``KIND|name|code|order`` and triples become label-level
(subj, pred, obj) multisets. This matches the reference's graph-diff tooling
(``/root/reference/compareJson.py``) which compares per-function JSON keyed by
names, not ids.
"""

from __future__ import annotations

from collections import Counter


def node_label(row) -> str:
    name = row.get("name") or ""
    code = row.get("code") or ""
    order = row.get("order")
    order = "" if order is None or order != order else str(int(order))
    return f"{row['kind']}|{name}|{code}|{order}"


def triple_counter(nodes_pdf, edges_pdf, doc_id: str) -> Counter:
    """Label-level triple multiset for one document."""
    n = nodes_pdf[nodes_pdf["doc_id"] == doc_id]
    labels = {nid: node_label(row) for nid, row in n.iterrows()}
    out: Counter = Counter()
    for nid, row in n.iterrows():
        lab = labels[nid]
        out[(lab, "kind", row["kind"])] += 1
        for p in ("name", "full_name", "code", "signature", "dispatch_type"):
            v = row.get(p)
            if v:
                out[(lab, p, v)] += 1
    e = edges_pdf[edges_pdf["doc_id"] == doc_id]
    for src, dst, kind, var in zip(e["src"], e["dst"], e["kind"], e["variable"]):
        s = labels.get(src, f"?{src}")
        d = labels.get(dst, f"?{dst}")
        out[(s, kind, d)] += 1
        if var:
            out[(s, f"{kind}.variable", var)] += 1
    return out


def precision_recall(got: Counter, want: Counter) -> tuple[float, float]:
    tp = sum((got & want).values())
    p = tp / max(1, sum(got.values()))
    r = tp / max(1, sum(want.values()))
    return p, r


def to_json(c: Counter) -> list:
    return [[list(k), v] for k, v in sorted(c.items())]


def from_json(data: list) -> Counter:
    return Counter({tuple(k): v for k, v in data})
