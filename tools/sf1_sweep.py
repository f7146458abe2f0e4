"""Registry-wide sf1 sweep: run EVERY batch query against the 10x
gen_sf fixture with a per-query watchdog, hunting super-linear stages
the 21-query scaling battery can't see (that battery caught the IVM
minmax quadratic in r13 — this sweep asks whether any of the other
~290 queries hides one).

Each query gets one warm pass discarded? No — one pass is enough
here: the hunt is for ORDER-OF-MAGNITUDE blowups (quadratic stages,
hangs), not steady-state timings; JIT noise is ~2x, a quadratic is
~100x. A query that exceeds the watchdog has its Spark job group
cancelled and is reported as TIMEOUT — every TIMEOUT is a finding.

Usage: python tools/sf1_sweep.py [sf_dir] [timeout_s]
Prints one line per query (slowest last) + a findings block.
"""

from __future__ import annotations

import sys
import threading
import time

sys.path.insert(0, "/root/repo")

SKIP_PREFIXES = ("q_stream_",)  # streaming queries drive their own sinks
SKIP = {
    "q_ingest_url",  # network-shaped
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.sfdata/sf1"
    timeout_s = float(sys.argv[2]) if len(sys.argv) > 2 else 120.0
    # optional explicit query list (the sf10 spot-run of the worst
    # slope10 rows, r14): each named query runs TWICE and the
    # steady-state (second) wall is reported, matching scaling.py
    only = sys.argv[3:] or None

    import xetl_spark.queries as Q
    from xetl_spark.session import get_session

    spark = get_session("sf1_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    results: list[tuple[float, str, str]] = []
    for name, q in Q.REGISTRY.items():
        if only is not None:
            if name not in only:
                continue
        elif name in SKIP or any(name.startswith(p) for p in SKIP_PREFIXES):
            continue
        group = f"sweep_{name}"
        outcome = {"status": "ok", "err": None}

        def run():
            try:
                sc.setJobGroup(group, name, interruptOnCancel=True)
                df = Q.REGISTRY[name].fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
            except Exception as e:  # noqa: BLE001
                outcome["status"] = "error"
                outcome["err"] = f"{type(e).__name__}: {e}"[:160]
            # no clearJobGroup in PySpark; the next iteration's
            # setJobGroup overwrites this thread-local anyway

        passes = 2 if only is not None else 1  # steady-state in only-mode
        dt = 0.0
        for _p in range(passes):
            t0 = time.time()
            th = threading.Thread(target=run, daemon=True)
            th.start()
            th.join(timeout_s)
            if th.is_alive():
                sc.cancelJobGroup(group)
                th.join(30)
                outcome["status"] = "timeout"
            dt = time.time() - t0
            if outcome["status"] != "ok":
                break
        results.append((dt, name, outcome["status"]))
        tag = "" if outcome["status"] == "ok" else f"  [{outcome['status']}]"
        if outcome["status"] == "error":
            tag += f" {outcome['err']}"
        print(f"{name}: {dt:.2f}s{tag}", flush=True)

    results.sort()
    print("\n--- slowest 20 ---")
    for dt, name, status in results[-20:]:
        print(f"{dt:8.2f}s  {name}  {status}")
    findings = [r for r in results if r[2] != "ok"]
    print("\n--- findings ---")
    for dt, name, status in findings or []:
        print(f"{name}: {status} after {dt:.1f}s")
    if not findings:
        print("none")
    return 1 if any(r[2] == "timeout" for r in results) else 0


if __name__ == "__main__":
    raise SystemExit(main())
