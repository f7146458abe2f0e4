"""Movement-based gate for the plan_audit exchange-allowance queries.

plan_audit.py caps shuffle-exchange COUNTS per executed plan, with a
per-query allowance list for queries whose static plan text repeats
cached subtrees or pins hint-forced exchanges (the count then measures
plan TEXT, not data movement — the r14 q_dedup_incremental_semantic
allowance grew 19 -> 30 for identical per-doc movement). This gate
asserts what the count cannot: the measured shuffle WRITE volume at a
fixed SF. Each allowance-listed query runs to completion through the
noop sink; completed-stage deltas from the monitoring REST API are
summed (the tools/stage_metrics.py method) and compared against the
declared per-query bound.

Bounds are ~2x the r15 measured values at sf0.1 (below, in the table)
— loose enough for fixture drift and AQE plan wobble, tight enough
that a regression to a corpus-sized re-shuffle (the failure mode the
allowances could hide: 10-100x movement) trips immediately.

Usage: python tools/movement_gate.py [sf_dir] [query ...]
Exit code = number of queries over their bound.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

# query -> (bound_mb, measured_mb) at sf0.1. measured_mb is the r15
# session measurement of this tool itself (2026-08-18, sf0.1,
# recorded in OPTIMIZATION_r15.md); bound ~= 2x measured.
BOUNDS_SF01: dict[str, tuple[float, float]] = {
    "q_text_bigram_logprob": (14.0, 6.96),
    "q_text_kn_bigram_logprob": (13.0, 6.34),
    "q_dedup_minhash_lsh": (13.0, 6.46),
    "q_graph_triangles": (2.0, 0.70),
    "q_fuzzy_name_join": (36.0, 17.72),
    "q_join_effective_dated": (2.5, 1.03),
    "q_ivm_rollup_maintenance": (1.0, 0.00),
    "q_text_perplexity_buckets": (13.0, 6.37),
    "q_text_kn_sampled_fit": (5.0, 2.28),
    "q_dedup_incremental_semantic": (5.0, 2.46),
}


def _stages(ui: str, app: str) -> dict:
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/stages?status=complete"
    ) as r:
        return {(s["stageId"], s["attemptId"]): s for s in json.load(r)}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])
    import xetl_spark.queries as Q
    from xetl_spark.session import get_session

    spark = get_session(
        "movement_gate",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        raise SystemExit("movement_gate needs the monitoring REST API")
    with urllib.request.urlopen(f"{ui}/api/v1/applications") as r:
        app = json.load(r)[0]["id"]

    failures: list[str] = []
    for name, (bound_mb, measured_mb) in BOUNDS_SF01.items():
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"movement_gate: {name}")
        before = _stages(ui, app)
        try:
            df = Q.REGISTRY[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            failures.append(f"{name}: FAILED to run: {exc}")
            continue
        time.sleep(0.3)  # let the status store settle
        after = _stages(ui, app)
        new = [s for k, s in after.items() if k not in before]
        sw_mb = sum(s.get("shuffleWriteBytes", 0) for s in new) / 1e6
        verdict = "ok" if sw_mb <= bound_mb else "OVER BOUND"
        print(
            f"{name}: shuffle_write={sw_mb:.2f} MB "
            f"(bound {bound_mb} MB, r15 measured {measured_mb} MB) {verdict}"
        )
        if sw_mb > bound_mb:
            failures.append(
                f"{name}: shuffle write {sw_mb:.2f} MB > bound {bound_mb} MB"
            )
    print("\n--- movement gate ---")
    for f in failures or ["all within bounds"]:
        print(f)
    return len(failures)


if __name__ == "__main__":
    raise SystemExit(main())
