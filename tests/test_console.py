"""Console surface (SURVEY.md §3.2 — the joern REPL analog).

The reference's Console binds `cpg` + workspace helpers into a REPL
(console/src/main/scala/io/joern/console/Console.scala); here we check the
Spark twin builds the same bindings and evaluates traversals one-shot.
"""

import subprocess
import sys


def test_console_objects_over_fixture_corpus(cpg):
    import tools.console as console
    from joern_spark.query import Cpg

    # bindings built from an existing result mirror what build() produces
    q = Cpg(nodes=cpg.nodes, edges=cpg.edges)
    assert {r["name"] for r in q.method("^flow$").l()} == {"flow"}
    assert {r["kind"] for r in q.method("^flow$").ast_children().l()} >= {
        "BLOCK", "METHOD_RETURN"}
    assert "cpg" in console.BANNER and "run_scan" in console.BANNER


def test_console_one_shot_eval():
    # -c mode: build the fixture corpus, run one traversal, exit 0
    out = subprocess.run(
        [sys.executable, "tools/console.py", "--cpus", "4", "-c",
         "sorted({r['name'] for r in cpg.method('^flow$').l()})"],
        capture_output=True, text=True, timeout=600, check=True)
    assert out.stdout.strip().splitlines()[-1] == "['flow']"
