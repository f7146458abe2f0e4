"""Measure per-query SHUFFLE and SPILL bytes for the bench headline
set and write SHUFFLE.md — the measured-evidence companion to
SCALE.md's design arguments.

Method: run each headline query to completion, then diff the
completed-stage set from Spark's monitoring REST API
(/api/v1/applications/<app>/stages, the same data the UI shows) and
sum shuffle read/write and memory/disk spill over the new stages.
Source bytes are the on-disk sizes of the plan's input files
(df.inputFiles) — the REST inputBytes counter undercounts local
scans. Wall time is NOT reported
here (bench.py owns timing); this file answers "how much data moved"
— the number that decides whether a plan survives a 1000-executor
100 TB run, because shuffle volume scales with data while wall time
on local[32] does not.

Usage: python tools/stage_metrics.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import urllib.request

sys.path.insert(0, "/root/repo")

HEADLINE = [
    "q_agg_pricing_summary",
    "q_join_revenue_by_nation",
    "q_join_range",
    "q_join_asof",
    "q_tpch_q7_like",
    "q_tpch_q21_like",
    "q_dedup_exact",
    "q_dedup_minhash_lsh",
    "q_sim_topk_cosine",
    "q_text_tfidf",
    "q_text_unigram_logprob",
    "q_win_ranking",
    "q_text_line_dedup",
    "q_basket_frequent_pairs",
    "q_text_dsir_weights",
    "q_ivm_rollup_maintenance",
    # round 9: exact span dedup's every-offset window table is the
    # honest cost being claimed in SCALE.md — measure it; perplexity
    # buckets = the full KN pipeline + global threshold agg
    "q_text_exact_span_dedup_corpus",
    "q_text_perplexity_buckets",
    # round 11: the CCNet fit/score split — scoring-pass shuffle should
    # track the 10% fit-model size, not the corpus (contrast with the
    # self-fit q_text_perplexity_buckets row above)
    "q_text_kn_sampled_fit",
    # round 14: semdedup's movement profile changed twice this round —
    # cell-local union-find CC (no iterative label shuffles) and
    # in-place pair generation (vectors shuffle once into their cell,
    # no candidate-set re-attach joins) — measure what actually moves
    "q_dedup_semantic",
]


def _stages(ui: str, app: str) -> dict[int, dict]:
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=complete") as r:
        return {(s["stageId"], s["attemptId"]): s for s in json.load(r)}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import xetl_spark.queries as Q
    from xetl_spark.session import get_session

    spark = get_session(
        "stage_metrics",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4047"},
    )
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        raise SystemExit("Spark UI disabled; stage metrics need the REST API")
    with urllib.request.urlopen(f"{ui}/api/v1/applications") as r:
        app = json.load(r)[0]["id"]

    import os as _os
    import time as _time

    def measure(d: str) -> list[tuple[str, dict]]:
        out = []
        for name in HEADLINE:
            before = _stages(ui, app)
            try:
                df = Q.REGISTRY[name].fn(spark, d)
                # noop-sink write, not count(): count lets Catalyst prune
                # the work being measured (round-9 methodology fix)
                df.write.format("noop").mode("overwrite").save()
            except Exception as e:  # noqa: BLE001
                print(f"# {name} FAILED: {e}", file=sys.stderr)
                continue
            _time.sleep(0.3)  # let the status store settle
            after = _stages(ui, app)
            new = [s for k, s in after.items() if k not in before]
            # source bytes = the actual files behind the plan (REST
            # inputBytes undercounts local scans); shuffle/spill come from
            # the shuffle managers and are exact
            try:
                src = sum(
                    _os.path.getsize(f.removeprefix("file://"))
                    for f in df.inputFiles()
                )
            except Exception:  # noqa: BLE001  (non-file sources)
                src = 0
            agg = {
                "source_mb": src / 1e6,
                "shuffle_write_mb": sum(s.get("shuffleWriteBytes", 0) for s in new) / 1e6,
                "shuffle_read_mb": sum(s.get("shuffleReadBytes", 0) for s in new) / 1e6,
                "mem_spill_mb": sum(s.get("memoryBytesSpilled", 0) for s in new) / 1e6,
                "disk_spill_mb": sum(s.get("diskBytesSpilled", 0) for s in new) / 1e6,
                "stages": len(new),
            }
            out.append((name, agg))
            print(f"# {name}: {agg}", file=sys.stderr)
        return out

    rows = measure(sf_dir)
    # sf1 shuffle-growth comparison (r13): shuffle VOLUME growth vs
    # data growth is the scale question local wall time can't answer
    sf1_dir = "/root/repo/.sfdata/sf1"
    sf1_rows: dict[str, dict] = {}
    if sf_dir != sf1_dir and _os.path.isdir(sf1_dir):
        sf1_rows = dict(measure(sf1_dir))

    lines = [
        "# SHUFFLE — measured data movement per headline query",
        "",
        f"Generated by `python tools/stage_metrics.py {sf_dir}` from Spark's",
        "monitoring REST API (completed-stage deltas per query). Shuffle",
        "volume — not local wall time — is what scales to a 1000-executor",
        "100 TB run: a query whose shuffle is a small fraction of its input",
        "stays network-bound-safe at scale; spill >0 at this SF flags an",
        "operator that needs partition-size tuning before scale-up.",
        "",
        "| query | source MB | shuffle write MB | shuffle read MB | mem spill MB | disk spill MB | stages |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, a in rows:
        # inputFiles() is empty when the plan reads through a persisted
        # mid-plan relation (q21's shared distinct, minhash's signature
        # table) — source is then unattributable, not zero
        src = f"{a['source_mb']:.1f}" if a["source_mb"] else "n/a"
        lines.append(
            f"| {name} | {src} | {a['shuffle_write_mb']:.2f} "
            f"| {a['shuffle_read_mb']:.2f} | {a['mem_spill_mb']:.1f} "
            f"| {a['disk_spill_mb']:.1f} | {a['stages']} |"
        )
    total_in = sum(a["source_mb"] for _n, a in rows)
    total_sw = sum(a["shuffle_write_mb"] for _n, a in rows)
    lines += [
        "",
        f"Battery totals: {total_in:.0f} MB of source files, {total_sw:.1f} MB "
        f"shuffled ({100 * total_sw / max(total_in, 1e-9):.1f}% of source). "
        "Zero spill anywhere = partitions sized within executor memory at "
        "this SF.",
    ]
    if sf1_rows:
        lines += [
            "",
            "## sf1 shuffle growth (r13)",
            "",
            "The scale question local wall time can't answer: does shuffle",
            "VOLUME track data volume? Same battery at the 10x gen_sf",
            "fixture; `growth` = sf1/sf0.1 shuffle-write ratio. growth <=",
            "~10 means data movement is linear in input (network-safe at",
            "1000 executors); growth >> 10 is row amplification. Spill",
            "columns are sf1's.",
            "",
            "| query | shuf-w sf0.1 MB | shuf-w sf1 MB | growth | sf1 mem spill | sf1 disk spill |",
            "|---|---|---|---|---|---|",
        ]
        for name, a in rows:
            b = sf1_rows.get(name)
            if b is None:
                continue
            g = (
                f"{b['shuffle_write_mb'] / a['shuffle_write_mb']:.1f}"
                if a["shuffle_write_mb"] > 0.005
                else "n/a"
            )
            lines.append(
                f"| {name} | {a['shuffle_write_mb']:.2f} "
                f"| {b['shuffle_write_mb']:.2f} | {g} "
                f"| {b['mem_spill_mb']:.1f} | {b['disk_spill_mb']:.1f} |"
            )
        lines += [
            "",
            "Above-linear rows, attributed (r13 run):",
            "",
            "- `q_tpch_q7_like` ~32x from a near-zero base (0.06 MB at",
            "  sf0.1: every join broadcasts there, so the ratio divides",
            "  by broadcast-threshold noise, not by a real shuffle;",
            "  1.8 MB absolute at sf1 is still ~0.01% of a linear-scaled",
            "  join's volume). `n/a` rows are the same base effect.",
            "- `q_dedup_minhash_lsh` ~28x (r14; was ~15x): two named",
            "  terms. (1) gen_sf PLANTS ~10 near-dup copies per base doc,",
            "  so candidate pairs per bucket grow ~|bucket|^2 by design —",
            "  duplicate-density-driven, giant-bucket guard caps the worst",
            "  case. (2) r14's shuffle_hash verify joins move the per-doc",
            "  hset table through both exchanges — corpus-linear bytes",
            "  (~70 MB/side at sf1) that previously rode an in-heap",
            "  broadcast, which is exactly what OOM'd at sf10; bounded-",
            "  memory shuffle traded deliberately for broadcast heap.",
            "- `q_text_unigram_logprob` / `q_basket_frequent_pairs` /",
            "  `q_text_perplexity_buckets` at 10.7-12.4x: within ~25% of",
            "  linear — the suffix-perturbed document copies add new",
            "  vocabulary types (the groupBy key space grows a little",
            "  faster than rows), and zero spill everywhere.",
        ]
    # preserve sections other tools/runs maintain (the SCALING.md
    # lesson — a regen must not silently drop evidence blocks): the
    # sf1 growth section when this run has no sf1 fixture to re-measure
    # it, and the measured-skew section from skew_evidence.py
    try:
        old = open("/root/repo/SHUFFLE.md").read()
        if not sf1_rows:
            i = old.find("## sf1 shuffle growth")
            if i >= 0:
                j = old.find("## Skew evidence", i)
                lines += ["", old[i : j if j >= 0 else None].rstrip()]
        i = old.find("## Skew evidence")
        if i >= 0:
            lines += ["", old[i:].rstrip()]
    except FileNotFoundError:
        pass
    with open("/root/repo/SHUFFLE.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote SHUFFLE.md")


if __name__ == "__main__":
    main()
