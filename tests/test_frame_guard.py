"""Suffix-aggregate window-frame guard (VERDICT r9 item 2).

Round 9's scaling table exposed that ``rowsBetween(0,
Window.unboundedFollowing)`` — a "[current row → end of partition)"
aggregate frame — is evaluated by Spark's
``UnboundedFollowingWindowFunctionFrame``, which re-aggregates the
partition *suffix* for EVERY row: O(n²) per key. On
q_ts_interpolate_linear that was a measured 30.9× blowup over a 100×
data range (16.9 s at sf0.1 for ~720 buckets/key); a 3-year hourly key
at 100 TB would be 26k² ≈ 350 M frame evaluations. The fix (round 10)
is the reverse-ordered *cumulative* frame — ``orderBy(col.desc())
.rowsBetween(unboundedPreceding, 0)`` + ``last(ignorenulls)`` — which
Spark evaluates with the O(n) running-frame implementation (13× faster,
bit-identical rows).

The only O(n)-safe frame classes are:

- cumulative/running: ``(unboundedPreceding, X]`` for any upper X;
- full-partition: ``(unboundedPreceding, unboundedFollowing)`` —
  computed once per partition;
- bounded sliding: ``(-a, +b)`` with finite a, b.

Anything with a *non-unboundedPreceding lower bound and an
unboundedFollowing upper bound* is the quadratic class. These tests
fail if that class reappears anywhere in the package, at source level
and at optimized-plan level, and pin the long-span behaviour with a
one-key / many-bucket fixture (the exact shape the quadratic frame
dies on).
"""

from __future__ import annotations

import math
import re
import time
from pathlib import Path

from pyspark.sql import functions as F

PKG = Path(__file__).resolve().parents[1] / "xetl_spark"

# matches rowsBetween(...)/rangeBetween(...) including multi-line calls
_BETWEEN_RE = re.compile(r"(?:rows|range)Between\(([^()]*(?:\([^()]*\)[^()]*)*)\)")
# one optimized-plan frame spec, e.g.
#   specifiedwindowframe(RowFrame, currentrow$(), unboundedfollowing$())
_PLAN_FRAME_RE = re.compile(r"specifiedwindowframe\(([^()]*(?:\(\))?[^()]*(?:\(\))?[^()]*)\)")


def _strip_comments_and_strings(src: str) -> str:
    """Drop comment and string tokens so docstrings *describing* the
    banned pattern don't trip the guard — only live code can."""
    import io
    import tokenize

    out = []
    for tok in tokenize.generate_tokens(io.StringIO(src).readline):
        if tok.type in (tokenize.COMMENT, tokenize.STRING):
            continue
        out.append(tok.string)
    return " ".join(out)


def _suffix_frames_in_source(src: str) -> list[str]:
    """Return every rows/rangeBetween call whose upper bound is
    unboundedFollowing but whose lower bound is NOT unboundedPreceding
    (the O(n²)-per-key class)."""
    flat = re.sub(r"\s+", " ", _strip_comments_and_strings(src))
    bad = []
    for m in _BETWEEN_RE.finditer(flat):
        args = m.group(1)
        if "unboundedFollowing" not in args:
            continue
        lower = args.split(",")[0]
        if "unboundedPreceding" not in lower:
            bad.append(m.group(0))
    return bad


def test_no_suffix_aggregate_frame_in_package_source():
    """FAILS if any rows/rangeBetween(<not unboundedPreceding>,
    unboundedFollowing) call exists anywhere in xetl_spark/."""
    offenders: dict[str, list[str]] = {}
    for py in sorted(PKG.rglob("*.py")):
        bad = _suffix_frames_in_source(py.read_text())
        if bad:
            offenders[str(py.relative_to(PKG.parent))] = bad
    assert not offenders, (
        "quadratic suffix-aggregate window frame reintroduced "
        f"(O(n^2) per key — see test docstring): {offenders}"
    )


def _plan_suffix_frames(df) -> list[str]:
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    bad = []
    for m in _PLAN_FRAME_RE.finditer(plan):
        args = m.group(1).lower()
        parts = [p.strip() for p in args.split(",")]
        if len(parts) < 3:
            continue
        lower, upper = parts[1], parts[2]
        if "unboundedfollowing" in upper and "unboundedpreceding" not in lower:
            bad.append(m.group(0))
    return bad


def test_timeseries_plans_have_only_running_frames(spark):
    """Optimized plans of the window-bearing timeseries operators must
    contain no suffix-aggregate frame (plan-level guard: catches the
    quadratic class even if spelled via SQL or a helper the source
    regex can't see)."""
    import xetl_spark.queries as Q

    sf_dir = "/root/testdata/sf0.001"
    for name in (
        "q_ts_interpolate_linear",
        "q_ts_resample_ffill",
        "q_ts_ewma",
        "q_ts_anomaly_zscore",
    ):
        if name not in Q.REGISTRY:
            continue
        df = Q.REGISTRY[name].fn(spark, sf_dir)
        bad = _plan_suffix_frames(df)
        assert not bad, f"{name}: suffix-aggregate frame in optimized plan: {bad}"


def test_long_span_interpolation_one_key(spark):
    """One key spanning 30k hourly buckets with observations every 64
    buckets — the exact shape the quadratic frame dies on (30k² ≈ 900 M
    frame evaluations; many minutes). With running frames it completes
    in seconds, and every interpolated value is exact: observations are
    v = 3·i at bucket i ∈ {0, 64, 128, …}, linear interpolation of a
    linear series reproduces v_interp = 3·i at EVERY grid bucket."""
    from xetl_spark.operators.timeseries import interpolate_linear as resample_interpolate

    n, stride = 30_000, 64
    obs = spark.range(0, n, stride).select(
        F.lit("k").alias("sensor"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_interval(hours=F.col("id"))).alias(
            "ts"
        ),
        (F.col("id") * 3.0).alias("reading"),
    )
    t0 = time.time()
    out = resample_interpolate(
        obs, "ts", "sensor", "reading", unit="hour", agg=F.sum("reading")
    )
    errs = out.select(
        F.max(
            F.abs(
                F.col("v_interp")
                - (F.col("bucket").cast("double") - F.to_timestamp(F.lit("2024-01-01 00:00:00")).cast("double"))
                / 3600.0
                * 3.0
            )
        ).alias("max_err"),
        F.count("*").alias("rows"),
    ).collect()[0]
    wall = time.time() - t0
    assert errs["rows"] == ((n - 1) // stride) * stride + 1
    assert errs["max_err"] is not None and errs["max_err"] < 1e-6 * n
    # generous bound: running frames finish in single-digit seconds;
    # the quadratic frame takes minutes on this fixture
    assert wall < 120, f"long-span interpolation took {wall:.0f}s — quadratic frame back?"


def test_interpolation_matches_pandas_reference(spark):
    """Planted irregular series vs an independent pure-pandas
    interpolation — values, not just plan shape."""
    import pandas as pd

    from xetl_spark.operators.timeseries import interpolate_linear as resample_interpolate

    rows = [
        ("a", "2024-01-01 00:10:00", 1.0),
        ("a", "2024-01-01 03:40:00", 8.0),
        ("a", "2024-01-01 04:05:00", 2.0),
        ("b", "2024-01-01 00:00:00", 5.0),
        ("b", "2024-01-01 00:59:00", 7.0),
    ]
    df = spark.createDataFrame(rows, "sensor string, ts string, reading double").select(
        "sensor", F.to_timestamp("ts").alias("ts"), "reading"
    )
    got = {
        (r["key"], str(r["bucket"])): r["v_interp"]
        for r in resample_interpolate(
            df, "ts", "sensor", "reading", unit="hour", agg=F.sum("reading")
        ).collect()
    }
    pdf = pd.DataFrame(rows, columns=["sensor", "ts", "reading"])
    pdf["bucket"] = pd.to_datetime(pdf["ts"]).dt.floor("h")
    for key, grp in pdf.groupby("sensor"):
        g = grp.groupby("bucket")["reading"].sum()
        full = g.reindex(pd.date_range(g.index.min(), g.index.max(), freq="h"))
        expect = full.interpolate(method="time").ffill().bfill()
        for bucket, val in expect.items():
            assert math.isclose(got[(key, str(bucket))], val, rel_tol=1e-9), (
                key,
                bucket,
                got[(key, str(bucket))],
                val,
            )
