"""Standalone JVM↔Python crossing-regime probe (see bench.py's
crossing_probe): prints the best-of-3 wall (ms) of a fixed 32-task
identity mapInPandas round-trip plus the 1-min loadavg. ~100ms = fast
regime, ~400ms+ = slow; codec-battery / mapInPandas query timings are
only comparable within a regime.

Usage: python tools/crossing_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    from xetl_spark.session import get_session

    spark = get_session("crossing_probe")
    probe = spark.range(0, 256).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    )
    probe.count()  # worker + Arrow channel init
    best = None
    for _ in range(3):
        t0 = time.time()
        probe.count()
        best = min(best or 9e9, time.time() - t0)
    print(f"crossing_ms={round(best * 1000)} loadavg={os.getloadavg()[0]:.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
