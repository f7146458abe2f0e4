"""Measure the skewed-key join story and write it into SHUFFLE.md.

SCALE.md asserts that hot-key joins survive scale via AQE skew-split
with salted_join as the manual fallback; this tool turns the claim
into measured evidence. It builds a deliberately pathological join —
ONE key holds 50% of the left rows — and runs it three ways:

  aqe_skew_off   sort-merge join, AQE skew handling disabled: the hot
                 key lands on one task, whose shuffle read is ~half
                 the table (the straggler that kills a 1000-executor
                 run, where one task carries 50 TB).
  aqe_skew_on    same plan with spark.sql.adaptive.skewJoin: AQE
                 splits the oversized partition at runtime; the final
                 plan carries SortMergeJoin(skew=true) and the
                 max-task read collapses toward the advisory size.
  salted_join    operators/relational.salted_join: the hot key is
                 pre-spread over 16 salt buckets (the fallback when
                 skew is known ahead of time or AQE can't fire, e.g.
                 a stateful/streaming side).

For each variant it records wall time, the join-stage per-task
shuffle-read max and median (REST taskSummary), and the plan marker,
then rewrites the "## Skew evidence" section of SHUFFLE.md (preserved
verbatim by tools/stage_metrics.py regenerations).

Usage: python tools/skew_evidence.py
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

N_LEFT = 2_000_000
N_KEYS = 1_000
SALT_BUCKETS = 16


def _stages(ui: str, app: str) -> dict:
    url = f"{ui}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        return {(s["stageId"], s["attemptId"]): s for s in json.load(r)}


def _task_summary(ui: str, app: str, stage_id: int, attempt: int) -> dict:
    url = (
        f"{ui}/api/v1/applications/{app}/stages/{stage_id}/{attempt}/"
        f"taskSummary?quantiles=0.5,1.0"
    )
    with urllib.request.urlopen(url) as r:
        return json.load(r)


def main() -> None:
    from pyspark.sql import functions as F

    from xetl_spark.operators.relational import salted_join
    from xetl_spark.session import get_session

    spark = get_session(
        "skew_evidence",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4048"},
    )
    ui = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{ui}/api/v1/applications") as r:
        app = json.load(r)[0]["id"]

    def skewed_left():
        # 50% of rows share key 0; the rest spread over N_KEYS
        return spark.range(N_LEFT).select(
            F.when(F.col("id") % 2 == 0, 0)
            .otherwise(F.col("id") % N_KEYS)
            .alias("k"),
            F.col("id").alias("v"),
            F.concat(F.lit("pad" * 12), F.col("id").cast("string")).alias("pad"),
        )

    right = spark.range(N_KEYS).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )

    def run(tag: str, skew_on: bool, salted: bool):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
        # thresholds scaled to the local fixture (defaults are sized
        # for 256 MB partitions); factor/advisory express the same
        # shape the defaults express at cluster scale
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m"
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        before = _stages(ui, app)
        left = skewed_left()
        if salted:
            joined = salted_join(left, right, on=["k"], salt_buckets=SALT_BUCKETS)
        else:
            joined = left.join(right, "k")
        # aggregate output: forces the join while keeping the driver
        # transfer to one row
        out = joined.groupBy().agg(
            F.count("*").alias("n"), F.sum("v").alias("sv")
        )
        t0 = time.time()
        rows = out.collect()
        wall = time.time() - t0
        assert rows[0]["n"] == N_LEFT, rows
        plan = out._jdf.queryExecution().executedPlan().toString()
        time.sleep(0.4)
        after = _stages(ui, app)
        new = [(k, s) for k, s in after.items() if k not in before]
        # the join stage = the new stage with the largest shuffle read
        join_stage = max(new, key=lambda ks: ks[1].get("shuffleReadBytes", 0))
        (sid, att), st = join_stage
        summ = _task_summary(ui, app, sid, att)
        srb = summ.get("shuffleReadMetrics", {}).get("readBytes", [0, 0])
        med, mx = srb[0], srb[-1]
        total = st.get("shuffleReadBytes", 0)
        marker = (
            "SortMergeJoin(skew=true)"
            if "skew=true" in plan
            else ("salted 16-way" if salted else "no split")
        )
        res = {
            "tag": tag,
            "wall_s": round(wall, 2),
            "join_stage_tasks": st.get("numCompleteTasks"),
            "shuffle_read_total_mb": round(total / 1e6, 1),
            "task_read_median_mb": round(med / 1e6, 2),
            "task_read_max_mb": round(mx / 1e6, 2),
            "max_over_median": round(mx / max(med, 1), 1),
            "marker": marker,
        }
        print(f"# {res}", file=sys.stderr)
        return res

    results = [
        run("aqe_skew_off", skew_on=False, salted=False),
        run("aqe_skew_on", skew_on=True, salted=False),
        run("salted_join", skew_on=False, salted=True),
    ]

    lines = [
        "## Skew evidence",
        "",
        "Generated by `python tools/skew_evidence.py`: an inner join where",
        f"ONE key holds 50% of {N_LEFT:,} left rows (the other half spread",
        f"over {N_KEYS:,} keys), measured three ways on the join stage. The",
        "scale-relevant column is **max task read**: without mitigation one",
        "task carries half the table (at 100 TB, a 50 TB straggler); AQE's",
        "runtime split and the salted fallback both collapse it to",
        "partition-sized work. Thresholds are scaled to the local fixture",
        "(1 MB advisory vs the 64 MB cluster default) — the RATIO between",
        "variants is the evidence, not the absolute MBs.",
        "",
        "| variant | wall s | join tasks | stage shuffle read MB "
        "| task read median MB | task read MAX MB | max/median | plan marker |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in results:
        lines.append(
            f"| {r['tag']} | {r['wall_s']} | {r['join_stage_tasks']} "
            f"| {r['shuffle_read_total_mb']} | {r['task_read_median_mb']} "
            f"| {r['task_read_max_mb']} | {r['max_over_median']}x "
            f"| {r['marker']} |"
        )
    section = "\n".join(lines) + "\n"

    path = "/root/repo/SHUFFLE.md"
    text = open(path).read()
    i = text.find("## Skew evidence")
    text = (text[:i].rstrip() + "\n\n" + section) if i >= 0 else (
        text.rstrip() + "\n\n" + section
    )
    open(path, "w").write(text)
    print("updated SHUFFLE.md skew section")


if __name__ == "__main__":
    main()
