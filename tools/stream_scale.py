"""Streaming-throughput scaling leg: the one scale surface the sf1
batch sweep (tools/sf1_sweep.py) does not touch. Drives the TRUE
streaming queries — real readStream -> stateful operator -> memory
sink — at sf0.1 and the 10x gen_sf sf1 fixture and reports events/sec
per query plus the sf1/sf0.1 wall ratio.

What 10x means per query's STATE (gen_sf keeps the event-time span,
10x density, and offsets user/event ids per copy):
  - q_stream_tumbling / complete-mode window agg: state keys are
    (1h window x event_type) — UNCHANGED at 10x (same span, same
    types); only input volume grows. Expect ~linear wall, ev/s held.
  - q_stream_stateful_totals (applyInPandasWithState): state keys =
    distinct user_id — 10x keys. The state-sizing question the r13
    verdict asked.
  - q_stream_dedup_watermark: dedup state holds every event_id inside
    the watermark — 10x state rows, the heaviest state growth here.
Each query also runs with state_store='rocksdb' at sf1 to compare the
HDFS-heap default against the production store at 10x state.

A ratio well above ~10 on a 10x-input leg is a finding (state
maintenance scaling super-linearly); ~10x or below is linear-in-input
(micro-batch count is fixed by maxFilesPerTrigger and file count, so
per-batch fixed costs amortize BETTER at sf1).

Usage: python tools/stream_scale.py [small_dir] [big_dir] [reps]
Writes nothing; paste the table into SCALING.md (streaming section).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def _events_rows(spark, sf_dir: str) -> int:
    return (
        spark.read.option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .count()
    )


def main() -> int:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.sfdata/sf1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from xetl_spark.session import get_session

    spark = get_session("stream_scale")
    spark.sparkContext.setLogLevel("ERROR")

    from xetl_spark.queries.streaming_ops import (  # noqa: F401
        q_stream_dedup_watermark,
        q_stream_stateful_totals,
        q_stream_tumbling,
    )
    from xetl_spark.streaming import (
        read_events_stream,
        run_stream_to_memory,
        running_totals_stateful,
        tumbling_window_agg,
        watermarked_dedup,
    )
    from pyspark.sql import functions as F

    def tumbling(sf_dir, store=None):
        return run_stream_to_memory(
            tumbling_window_agg(read_events_stream(spark, sf_dir)),
            mode="complete", state_partitions=8, state_store=store,
        )

    def totals(sf_dir, store=None):
        return run_stream_to_memory(
            running_totals_stateful(read_events_stream(spark, sf_dir)),
            mode="update", state_partitions=8, state_store=store,
        )

    def dedup(sf_dir, store=None):
        deduped = watermarked_dedup(read_events_stream(spark, sf_dir))
        counted = deduped.groupBy("event_type").agg(F.count("*").alias("n"))
        return run_stream_to_memory(
            counted, mode="complete", state_partitions=8, state_store=store,
        )

    legs = [
        ("tumbling", tumbling),
        ("stateful_totals", totals),
        ("dedup_watermark", dedup),
    ]

    n_small = _events_rows(spark, small)
    n_big = _events_rows(spark, big)
    header = (
        f"events: {small}={n_small}  {big}={n_big}  "
        f"loadavg={os.getloadavg()[0]:.1f}  reps={reps} (best-of)\n"
        f"{'query':<22}{'sf0.1 s':>9}{'ev/s':>10}{'sf1 s':>9}"
        f"{'ev/s':>10}{'x10 wall':>9}{'sf1 rocks s':>12}"
    )
    lines = []
    for name, fn in legs:
        def best(f, *a):
            return min(_timed(f, *a) for _ in range(reps))

        def _timed(f, *a):
            t0 = time.time()
            f(*a).count()
            return time.time() - t0

        w_small = best(fn, small)
        w_big = best(fn, big)
        w_rocks = best(fn, big, "rocksdb")
        lines.append(
            f"{name:<22}{w_small:>9.2f}{n_small / w_small:>10.0f}"
            f"{w_big:>9.2f}{n_big / w_big:>10.0f}"
            f"{w_big / w_small:>9.2f}{w_rocks:>12.2f}"
        )
        print(lines[-1], flush=True)
    # progress bars interleave with mid-run prints; the block below is
    # the copy-paste artifact
    print("\n=== stream_scale summary ===")
    print(header)
    for ln in lines:
        print(ln)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
