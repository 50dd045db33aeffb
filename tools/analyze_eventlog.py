"""Summarize a Spark event log: per-job/stage wall, task count, task-time sum,
and effective parallelism (task-time / wall) — pinpoints which stages cap
scaling. Usage: python tools/analyze_eventlog.py <eventlog-file-or-dir> [top_n]
"""

import json
import os
import sys


def main() -> None:
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    if os.path.isdir(path):
        files = sorted(
            (os.path.join(path, f) for f in os.listdir(path)
             if not f.startswith(".")),
            key=os.path.getmtime)
        path = files[-1]
        if os.path.isdir(path):  # eventlog_v2 rolling dir
            inner = [os.path.join(path, f) for f in os.listdir(path)
                     if "events" in f]
            path = sorted(inner, key=os.path.getmtime)[-1]
        print(f"# {path}")

    stages = {}
    t_min = None
    t_max = 0
    if path.endswith(".zstd"):
        import io
        import subprocess
        raw = subprocess.run(["zstd", "-dc", path], capture_output=True,
                             check=True).stdout
        fh = io.StringIO(raw.decode("utf-8", "replace"))
    else:
        fh = open(path)
    with fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            kind = ev.get("Event")
            if kind == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                prev_tt = stages.get(sid, {}).get("task_time", 0.0)
                stages[sid] = {
                    "name": si["Stage Name"].split("\n")[0][:70],
                    "tasks": si["Number of Tasks"],
                    "wall": (comp - sub) / 1000 if sub and comp else 0.0,
                    "sub": sub, "task_time": prev_tt,
                }
                if sub:
                    t_min = sub if t_min is None else min(t_min, sub)
                if comp:
                    t_max = max(t_max, comp)
            elif kind == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                ti = ev.get("Task Info", {})
                dur = (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) / 1000
                if sid in stages:
                    stages[sid]["task_time"] += dur
                else:
                    stages.setdefault(sid, {"name": "?", "tasks": 0, "wall": 0,
                                            "sub": None, "task_time": 0.0})
                    stages[sid]["task_time"] += dur

    total_wall = (t_max - (t_min or t_max)) / 1000
    total_task = sum(s["task_time"] for s in stages.values())
    stage_wall = sum(s["wall"] for s in stages.values())
    print(f"stages={len(stages)} app_wall={total_wall:.1f}s "
          f"sum_stage_wall={stage_wall:.1f}s sum_task_time={total_task:.1f}s")
    print(f"{'sid':>5} {'wall':>7} {'tasks':>6} {'ttime':>8} {'par':>5}  name")
    for sid, s in sorted(stages.items(), key=lambda kv: -kv[1]["wall"])[:top_n]:
        par = s["task_time"] / s["wall"] if s["wall"] > 0.05 else 0
        print(f"{sid:>5} {s['wall']:>7.2f} {s['tasks']:>6} "
              f"{s['task_time']:>8.1f} {par:>5.1f}  {s['name']}")


if __name__ == "__main__":
    main()
