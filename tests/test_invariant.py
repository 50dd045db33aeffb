"""Per-row span-sequence invariant (BASELINE.json input_hint).

The span sequence (kind, text, media_ref, order) must be reconstructable,
unchanged, from the pipeline's provenance output; media spans bypass the
parser but round-trip into provenance triples.
"""

from tests.conftest import F1, F8


def _span_seq(doc):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in doc["spans"]]


def test_span_sequence_roundtrip(g, docs_by_id):
    """Provenance spans == input spans, exactly, for every fixture doc."""
    for doc_id, doc in docs_by_id.items():
        got = g.spans[g.spans["doc_id"] == doc_id].sort_values("span_offset")
        got_seq = [
            (k, t, m, o)
            for k, t, m, o in zip(got["kind"], got["text"], got["media_ref"], got["span_offset"])
        ]
        assert got_seq == _span_seq(doc), f"span invariant broken for {doc_id}"


def test_media_doc_parses_identically(g):
    """F8 = F1 + interleaved media spans; the code-derived graph must be
    identical up to node ids (media spans bypass the parser)."""
    def shape(doc_id):
        n = g.doc_nodes(doc_id)
        return sorted(zip(n["kind"], n["name"].fillna(""), n["code"].fillna(""), n["order"].fillna(-1)))

    f1 = [(k, nm, c, o) for k, nm, c, o in shape(F1)]
    f8 = [(k, nm, c, o) for k, nm, c, o in shape(F8)]
    # F8 has the same code nodes; FILE node code/name differs by doc_id only
    f1 = [t for t in f1 if t[0] != "FILE"]
    f8 = [t for t in f8 if t[0] != "FILE"]
    assert f1 == f8


def test_media_provenance_triples(g):
    """media_ref artifacts surface as provenance triples (kind-filtered out of
    the parser, SURVEY.md §7.4 risk 6)."""
    t = g.triples
    media = t[(t["pred"] == "media_ref") & (t["doc_id"] == F8)]
    assert set(media["obj"]) == {"bin://blob-1", "bin://blob-2"}


def test_media_edges_identical(g):
    """Edge multiset (by kind) identical between F1 and F8."""
    from collections import Counter

    def ec(doc_id):
        return Counter(g.edges[g.edges["doc_id"] == doc_id]["kind"])

    assert ec(F1) == ec(F8)
