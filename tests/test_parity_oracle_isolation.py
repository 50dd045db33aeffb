"""Lint gate: the sequential parity-oracle linkers stay out of production.

``dynamic_call_linker`` / ``naive_call_linker`` / ``prefer_internal_call_edges``
(operators/callgraph.py) exist only so test_dims.py can A/B the one-pass
aggregate arbitration against a sequential window-based twin. A future caller
inside the ``joern_spark`` package would silently reintroduce the
window-on-the-hot-path plan the round-3/4 work removed — this test makes that
a loud failure instead (round-4 verdict #6). Dev profilers under ``tools/``
and the tests themselves are allowed callers.

No Spark session needed: this is a pure source scan.
"""

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / "joern_spark"

PARITY_ONLY = [
    "dynamic_call_linker",
    "naive_call_linker",
    "prefer_internal_call_edges",
]


def test_no_production_module_uses_parity_oracle_linkers():
    offenders = []
    for path in sorted(PKG.rglob("*.py")):
        if path.name == "callgraph.py":
            continue  # the defining module
        text = path.read_text()
        for name in PARITY_ONLY:
            for m in re.finditer(rf"\b{name}\b", text):
                line = text[: m.start()].count("\n") + 1
                offenders.append(f"{path.relative_to(PKG.parent)}:{line} uses {name}")
    assert not offenders, (
        "parity-oracle linkers referenced from production modules:\n"
        + "\n".join(offenders)
    )


def test_parity_oracle_defs_are_marked():
    text = (PKG / "operators" / "callgraph.py").read_text()
    for name in PARITY_ONLY:
        m = re.search(rf"def {name}\(.*?\"\"\"(.{{0,120}})", text, re.S)
        assert m and "PARITY-ORACLE ONLY" in m.group(1), (
            f"{name} lost its PARITY-ORACLE ONLY marker"
        )
