"""Time individual registry queries in isolation (noop sink, best-of-N).

Usage: python tools/qtime.py [--sf DIR] [--reps N] [--warm] [--repo PATH] q_a q_b ...

Per guide §1: one JVM warmup pass at sf0.001 (codegen/JIT), then each
query timed best-of-N through the noop sink at the target SF. Prints
one line per query plus the 1-min loadavg before each measurement.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--repo", default="/root/repo")
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()
    sys.path.insert(0, args.repo)

    import xetl_spark.queries as Q
    from xetl_spark.session import get_session

    spark = get_session("qtime")

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    warm_dir = "/root/testdata/sf0.001"
    if not args.no_warm and os.path.isdir(warm_dir):
        for _ in range(2):
            for name in args.queries:
                try:
                    mat(Q.REGISTRY[name].fn(spark, warm_dir))
                except Exception as e:  # noqa: BLE001
                    print(f"# warm {name}: {e}", file=sys.stderr)

    for name in args.queries:
        best = None
        load = round(os.getloadavg()[0], 2)
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            t0 = time.time()
            try:
                mat(Q.REGISTRY[name].fn(spark, args.sf))
            except Exception as e:  # noqa: BLE001
                print(f"{name}: FAILED {type(e).__name__}: {e}")
                best = None
                break
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        if best is not None:
            print(f"{name}: {best:.3f}s (load@start {load})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
