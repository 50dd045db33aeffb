"""Golden triple P/R gate (BASELINE.md: P/R >= 0.95 per fixture + aggregate).

Goldens live in tests/golden/*.json (regenerate with tools/regen_goldens.py
after a *verified* semantic change — the CFG/dataflow/callgraph suites are the
independent semantic check; this suite locks the full triple sets against
regressions, the way the reference's fixture graphs lock its frontends).
"""

import json
import pathlib

import pytest

from tests.conftest import (F1, F2, F3, F4, F5, F6, F13, F15, F18, F19, F20,
                            F21, F22, F23, F24, F27, F28, F30, F31, F32,
                            F36, F38, F39, F40, F41, F42, F43, F44, F45, F46,
                            F47, F48, F49, F50, F51, F52)
from tests.triple_labels import from_json, precision_recall, triple_counter

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"
FIXTURES = [F1, F2, F3, F4, F5, F6, F13, F15, F18, F19, F20, F21, F22, F23,
            F24, F27, F28, F30, F31, F32, F36, F38, F39, F40, F41, F42,
            F43, F44, F45, F46, F47, F48, F49, F50, F51, F52]


def _slug(doc_id: str) -> str:
    return doc_id.replace("/", "_").replace(".", "_")


@pytest.mark.parametrize("doc_id", FIXTURES)
def test_fixture_triples_pr(g, doc_id):
    path = GOLDEN_DIR / f"{_slug(doc_id)}.json"
    if not path.exists():
        pytest.skip(f"golden not generated yet: {path}")
    want = from_json(json.loads(path.read_text()))
    got = triple_counter(g.nodes, g.edges, doc_id)
    p, r = precision_recall(got, want)
    assert p >= 0.95, f"{doc_id}: precision {p:.3f} < 0.95"
    assert r >= 0.95, f"{doc_id}: recall {r:.3f} < 0.95"


def test_aggregate_pr(g):
    from collections import Counter

    got_all, want_all = Counter(), Counter()
    found = 0
    for doc_id in FIXTURES:
        path = GOLDEN_DIR / f"{_slug(doc_id)}.json"
        if not path.exists():
            continue
        found += 1
        want_all += from_json(json.loads(path.read_text()))
        got_all += triple_counter(g.nodes, g.edges, doc_id)
    if not found:
        pytest.skip("no goldens generated")
    p, r = precision_recall(got_all, want_all)
    assert p >= 0.95 and r >= 0.95, f"aggregate P={p:.3f} R={r:.3f}"


def test_triples_table_covers_edges(g):
    """Every edge row surfaces as an edge triple (subj=src id, pred=kind)."""
    t = g.triples
    edge_preds = set(t["pred"]) & {"AST", "CFG", "CALL", "REACHING_DEF", "ARGUMENT"}
    assert edge_preds == {"AST", "CFG", "CALL", "REACHING_DEF", "ARGUMENT"}
    n_edge_triples = len(t[t["pred"].isin(list(edge_preds))])
    n_edges = len(g.edges[g.edges["kind"].isin(list(edge_preds))])
    assert n_edge_triples == n_edges


def test_triples_deterministic_ids(g):
    """subj/obj of edge triples resolve to node ids present in the nodes table."""
    t = g.triples
    kinds = t[t["pred"] == "kind"]
    node_ids = {str(i) for i in g.nodes.index}
    assert set(kinds["subj"]) <= node_ids
