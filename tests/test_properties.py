"""Property-based robustness tests (hypothesis) — kernel level, no Spark.

The reference tests only golden values (SURVEY.md §5); these properties go
beyond it:
- parsing is total (never raises) on generated programs,
- the derived graph is INVARIANT to how code is split into spans,
- CFG is connected and the method entry reaches every CFG node,
- the parse → lower → kernel path is deterministic.
"""

from hypothesis import given, settings, strategies as st

from joern_spark.corpus import split_code_spans
from joern_spark.frontend.lowering import lower_doc
from joern_spark.operators.cfg_pass import cfg_edges_for_method

# ---- tiny program generator ----------------------------------------------

_names = st.sampled_from(["a", "b", "c", "x", "y"])
_consts = st.integers(0, 99).map(str)
_operand = st.one_of(_names, _consts)


@st.composite
def _expr(draw, depth=2):
    if depth == 0 or draw(st.booleans()):
        return draw(_operand)
    op = draw(st.sampled_from(["+", "-", "*", "<", "==", "&&", "||"]))
    return f"({draw(_expr(depth - 1))} {op} {draw(_expr(depth - 1))})"


@st.composite
def _stmt(draw, depth=2):
    kind = draw(st.sampled_from(
        ["assign", "call", "if", "while", "do", "decl"]
        + (["nested"] if depth > 0 else [])
    ))
    if kind == "assign":
        return f"{draw(_names)} = {draw(_expr())};"
    if kind == "decl":
        return f"int {draw(_names)} = {draw(_expr())};"
    if kind == "call":
        return f"printf({draw(_expr())});"
    body = draw(_stmt(depth - 1)) if depth else "x = 1;"
    if kind == "if":
        return f"if ({draw(_expr())}) {{ {body} }} else {{ {draw(_stmt(0))} }}"
    if kind == "while":
        return f"while ({draw(_expr())}) {{ {body} }}"
    if kind == "do":
        return f"do {{ {body} }} while ({draw(_expr())});"
    return f"{{ {body} {draw(_stmt(0))} }}"


@st.composite
def programs(draw):
    n = draw(st.integers(1, 5))
    body = "\n  ".join(draw(_stmt()) for _ in range(n))
    return f"int f(int x) {{\n  {body}\n  return x;\n}}"


# ---- properties -----------------------------------------------------------

@given(programs())
@settings(max_examples=60, deadline=None)
def test_parse_is_total(src):
    nodes, edges, spans = lower_doc("p", split_code_spans(src, 2))
    assert any(n["kind"] == "METHOD" for n in nodes)


@given(programs(), st.integers(1, 6), st.integers(1, 6))
@settings(max_examples=40, deadline=None)
def test_graph_invariant_to_span_split(src, k1, k2):
    """Splitting the same code into different span counts must not change
    the derived graph (content labels; ids differ by span_offset)."""
    def shape(k):
        nodes, edges, _ = lower_doc("p", split_code_spans(src, k))
        label = {n["node_id"]: (n["kind"], n["name"], n["code"], n["order"]) for n in nodes}
        return (
            sorted(label.values()),
            sorted((label[e["src"]], e["kind"], label[e["dst"]]) for e in edges),
        )

    assert shape(k1) == shape(k2)


@given(programs())
@settings(max_examples=40, deadline=None)
def test_cfg_entry_reaches_all(src):
    nodes, _, _ = lower_doc("p", split_code_spans(src, 2))
    mid = next(n["node_id"] for n in nodes if n["kind"] == "METHOD")
    rows = [n for n in nodes if n.get("method_id") == mid]
    edges = cfg_edges_for_method(rows)
    if not edges:
        return
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    seen, stack = {mid}, [mid]
    while stack:
        cur = stack.pop()
        for nxt in adj.get(cur, ()):
            if nxt not in seen:
                seen.add(nxt)
                stack.append(nxt)
    all_cfg = {s for s, _ in edges} | {d for _, d in edges}
    assert all_cfg <= seen


@given(programs())
@settings(max_examples=30, deadline=None)
def test_lowering_deterministic(src):
    a = lower_doc("p", split_code_spans(src, 3))
    b = lower_doc("p", split_code_spans(src, 3))
    assert a == b


@given(programs())
@settings(max_examples=30, deadline=None)
def test_span_rows_roundtrip(src):
    spans = split_code_spans(src, 4)
    _, _, span_rows = lower_doc("p", spans)
    got = [(r["span_offset"], r["kind"], r["text"], r["media_ref"]) for r in span_rows]
    want = [(s["offset"], s["kind"], s["text"], s["media_ref"]) for s in spans]
    assert sorted(got) == sorted(want)
