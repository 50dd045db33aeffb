"""Regenerate tests/golden/*.json from the current pipeline output.

Run ONLY after the semantic suites (test_cfg/test_dataflow/test_callgraph/
test_ast) pass — they are the independent check; goldens lock full triple
sets against regressions.

Usage: python tools/regen_goldens.py
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from joern_spark.corpus import fixture_docs_df
from joern_spark.pipeline import run_pipeline
from joern_spark.session import get_spark
from tests.triple_labels import to_json, triple_counter

FIXTURES = [
    "fixtures/c/flow", "fixtures/c/free_list", "fixtures/c/test",
    "fixtures/c/zoo", "fixtures/java/MethodTest.java", "fixtures/java/Dispatch.java",
    "fixtures/js/app.js", "fixtures/py/app.py",
    "fixtures/c/scanners", "fixtures/java/Injection.java",
    "fixtures/jimple/Dispatch.jimple",
    "fixtures/java/Crypto.java", "fixtures/c/metrics", "fixtures/js/view.jsx",
    "fixtures/c/heap", "fixtures/c/lencheck", "fixtures/java/Net.java",
    "fixtures/java/Servlet.java", "fixtures/java/Trust.java",
    "fixtures/c/envcopy", "fixtures/js/phpish.js",
    "fixtures/java/RootCheck.java", "fixtures/java/Rng.java",
    "fixtures/java/FwdActivity.java", "fixtures/java/EvilReceiver.java",
    "fixtures/java/Dyn.java", "fixtures/java/WebHost.java",
    "fixtures/java/Unzip.java", "fixtures/java/Trustmgr.java",
    "fixtures/java/Redirector.java", "fixtures/php/inject.php",
    "fixtures/c/uaf_field", "fixtures/kotlin/Net.kt",
    "fixtures/swift/Net.swift", "fixtures/go/pool.go",
    "fixtures/ruby/feed.rb", "fixtures/csharp/Client.cs",
    "fixtures/asm/bsum.asm",
]


def main() -> None:
    golden_dir = pathlib.Path(__file__).resolve().parent.parent / "tests" / "golden"
    golden_dir.mkdir(exist_ok=True)
    spark = get_spark(app_name="regen_goldens", cpus=8, shuffle_partitions=8)
    res = run_pipeline(spark, fixture_docs_df(spark), n_parts=4)
    nodes = res.nodes.toPandas().set_index("node_id")
    edges = res.edges.toPandas()
    for doc_id in FIXTURES:
        c = triple_counter(nodes, edges, doc_id)
        slug = doc_id.replace("/", "_").replace(".", "_")
        path = golden_dir / f"{slug}.json"
        path.write_text(json.dumps(to_json(c), indent=0))
        print(f"{doc_id}: {sum(c.values())} triples -> {path.name}")


if __name__ == "__main__":
    main()
