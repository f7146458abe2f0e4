"""Per-stage TIME breakdown for registry queries (guide §1/§7.1).

Runs each query through the noop sink in a UI-enabled session, then
diffs the completed-stage set from the monitoring REST API and prints
per-stage wall, summed executor run/cpu time, shuffle fetch-wait and
write time, task count and max/median task skew — the stage-page
numbers the guide says to look at, for a headless box.

Usage: python tools/stage_time.py [--sf DIR] q_a q_b ...
"""

from __future__ import annotations

import argparse
import json
import sys
import urllib.request

sys.path.insert(0, "/root/repo")


def _stages(base: str) -> dict:
    with urllib.request.urlopen(base + "/stages?status=complete") as r:
        data = json.load(r)
    return {(s["stageId"], s["attemptId"]): s for s in data}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--warm", action="store_true", help="run once untimed first")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    import xetl_spark.queries as Q
    from xetl_spark.session import get_session

    spark = get_session("stage_time", extra_conf={"spark.ui.enabled": "true"})
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    if args.warm:
        for name in args.queries:
            mat(Q.REGISTRY[name].fn(spark, args.sf))

    for name in args.queries:
        before = _stages(base)
        spark.sparkContext.setJobDescription(f"stage_time:{name}")
        import time

        t0 = time.time()
        mat(Q.REGISTRY[name].fn(spark, args.sf))
        wall = time.time() - t0
        after = _stages(base)
        new = [s for k, s in after.items() if k not in before]
        new.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        print(f"=== {name}: wall {wall:.2f}s, {len(new)} stages ===")
        for s in new[:12]:
            run = (s.get("executorRunTime") or 0) / 1e3
            cpu = (s.get("executorCpuTime") or 0) / 1e9
            fetch = (s.get("shuffleFetchWaitTime") or 0) / 1e3
            swt = (s.get("shuffleWriteTime") or 0) / 1e9
            n = s.get("numCompleteTasks") or s.get("numTasks")
            desc = (s.get("description") or s.get("name") or "")[:60]
            print(
                f"  stage {s['stageId']:>4} tasks={n:<3} run={run:7.2f}s "
                f"cpu={cpu:7.2f}s fetchWait={fetch:5.2f}s shufWrite={swt:5.2f}s  {desc}"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
