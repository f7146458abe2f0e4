"""Declarative data-quality checks (deequ-style constraint report).

A pipeline stage declares constraints; the report computes every
violation count in ONE pass over the data (a single aggregation with
conditional counters — not one job per rule), plus per-rule pass/fail.
Uniqueness and referential-integrity rules need their own keyed
aggregations and are unioned in.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Check:
    name: str
    kind: str  # not_null | in_range | matches | unique | custom
    expr: Column | None = None  # violation predicate for row-level kinds
    cols: list[str] | None = None  # key columns for set-level kinds


def not_null(*cols: str) -> list[Check]:
    return [
        Check(f"not_null_{c}", "not_null", F.col(c).isNull()) for c in cols
    ]


def in_range(col: str, lo, hi) -> Check:
    return Check(
        f"in_range_{col}",
        "in_range",
        F.col(col).isNull() | (F.col(col) < lo) | (F.col(col) > hi),
    )


def matches(col: str, pattern: str) -> Check:
    return Check(f"matches_{col}", "matches", ~F.col(col).rlike(pattern))


def custom(name: str, violation: Column) -> Check:
    return Check(name, "custom", violation)


def unique(*cols: str) -> Check:
    return Check("unique_" + "_".join(cols), "unique", cols=list(cols))


def quality_report(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate all checks; returns (check, n_violations, passed).

    Row-level rules fold into one aggregation (conditional sums);
    each uniqueness rule adds one groupBy counting surplus rows.
    """
    row_checks = [c for c in checks if c.kind != "unique"]
    agg_exprs = [
        F.sum(F.when(c.expr, 1).otherwise(0)).cast("long").alias(c.name)
        for c in row_checks
    ]
    parts: list[DataFrame] = []
    if agg_exprs:
        wide = df.agg(*agg_exprs)
        stack_args = ", ".join(f"'{c.name}', {c.name}" for c in row_checks)
        parts.append(
            wide.selectExpr(
                f"stack({len(row_checks)}, {stack_args}) AS (check, n_violations)"
            )
        )
    for c in checks:
        if c.kind == "unique":
            cols = c.cols or []
            dup = (
                df.groupBy(*cols)
                .agg((F.count("*") - 1).alias("extra"))
                .agg(F.sum("extra").cast("long").alias("n_violations"))
                .select(F.lit(c.name).alias("check"), "n_violations")
            )
            parts.append(dup)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "check",
        F.coalesce("n_violations", F.lit(0)).alias("n_violations"),
        (F.coalesce("n_violations", F.lit(0)) == 0).alias("passed"),
    )


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One-pass column profile: rows, nulls, approx distinct, min/max
    (stringified for type uniformity). The profiling primitive behind
    data catalogs — a single aggregation regardless of column count.
    """
    cols = columns or df.columns
    aggs: list[Column] = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"__nulls_{c}"),
            F.approx_count_distinct(c).alias(f"__dist_{c}"),
            F.min(F.col(c).cast("string")).alias(f"__min_{c}"),
            F.max(F.col(c).cast("string")).alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nulls_{c}, __dist_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return wide.selectExpr(
        "__rows AS n_rows",
        f"stack({len(cols)}, {stack_args}) AS (column, n_nulls, approx_distinct, min_str, max_str)",
    ).select("column", "n_rows", "n_nulls", "approx_distinct", "min_str", "max_str")
