"""A/B: run_scan with vs without the shared FlowEngine path cache.

Evidence for the cross-task path-cache claim (reference:
``dataflowengineoss/.../queryengine/Engine.scala:133-143``
``shareCacheBetweenTasks``): the scan bundle's ~24 dataflow queries route
through ONE FlowEngine cached on the Cpg instance (query/dsl.py:99-117) —
relations built and (within budget) collected once. The B leg disables the
sharing by handing every flow() call a FRESH engine, i.e. per-query relation
rebuild + per-query mode probe, which is what a naive per-task driver would
do.

Usage: python tools/ab_scan_cache.py [sf_dir]  (default /root/testdata/sf0.1)
Prints one JSON line with both walls; findings are asserted identical.
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from joern_spark.corpus import fixture_docs_df
from joern_spark.pipeline import run_pipeline
from joern_spark.session import get_spark
from joern_spark.synth import synth_docs


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = 32
    spark = get_spark(app_name="ab_scan_cache", cpus=cpus,
                      shuffle_partitions=cpus,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    if sf_dir == "fixtures":
        docs = fixture_docs_df(spark)
    else:
        docs = synth_docs(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    res = run_pipeline(spark, docs, n_parts=cpus)

    from joern_spark import scan as scan_mod
    from joern_spark.query import Cpg

    def timed_scan(disable_cache: bool) -> tuple[float, list]:
        import joern_spark.query.dsl as dsl
        orig = dsl.Cpg.flow

        if disable_cache:
            def fresh_flow(self, sinks, sources, max_call_depth=None):
                from joern_spark.dataflow import MAX_CALL_DEPTH, FlowEngine
                eng = FlowEngine(self.nodes, self.edges)  # no sharing
                return eng.flow(sinks, sources,
                                max_call_depth or MAX_CALL_DEPTH)
            dsl.Cpg.flow = fresh_flow
        try:
            t0 = time.time()
            rows = scan_mod.run_scan(res.nodes, res.edges).collect()
            wall = time.time() - t0
        finally:
            dsl.Cpg.flow = orig
        key = sorted((r["name"], r["node_id"]) for r in rows)
        return wall, key

    wall_shared, k1 = timed_scan(disable_cache=False)
    wall_fresh, k2 = timed_scan(disable_cache=True)
    assert k1 == k2, "findings differ between cache modes"
    print(json.dumps({
        "ab": "scan_flow_cache", "sf_dir": sf_dir, "cpus": cpus,
        "wall_shared_cache_s": round(wall_shared, 1),
        "wall_fresh_engine_s": round(wall_fresh, 1),
        "speedup": round(wall_fresh / wall_shared, 2),
        "findings": len(k1), "identical": True,
    }))


if __name__ == "__main__":
    main()
