"""Count-min sketch: mergeable frequency estimation in pure Catalyst.

The sketch is a (depth × width) counter grid represented relationally
as (row, slot, c) — at most depth·width rows regardless of corpus
size, built with one explode + one aggregation. Because counters add,
the groupBy IS the merge: map-side partial aggregation builds partial
sketches per partition and the shuffle combines them, which is exactly
the associative-merge property that makes CMS the right frequency
structure for a 100 TB corpus or an unbounded stream (vs exact
per-key counts whose state grows with key cardinality).

Hashing is xxhash64(key, row-seed) — deterministic, so estimates are
reproducible run-over-run (no RNG), and the standard guarantees hold:
estimate ≥ true count always (counters only over-count), and
estimate ≤ true + εN with probability 1-δ for width=⌈e/ε⌉,
depth=⌈ln 1/δ⌉.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _slots(key: Column, depth: int, width: int) -> Column:
    """Array of the key's slot per sketch row: pmod(xxhash64(k, i), w)."""
    return F.array(
        *[F.pmod(F.xxhash64(key, F.lit(i)), F.lit(width)) for i in range(depth)]
    )


def count_min_sketch(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build the sketch: (row, slot, c) with c = Σ occurrences hashing
    there. One narrow explode (depth rows per input row, map-side
    combined immediately) + one bounded-cardinality shuffle of at most
    depth·width groups."""
    return (
        df.select(F.posexplode(_slots(F.col(key_col), depth, width)).alias("row", "slot"))
        .groupBy("row", "slot")
        .agg(F.count("*").alias("c"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches of identical (depth, width): counters add.
    Distributivity is the point — sketch(A ∪ B) = merge(sketch(A),
    sketch(B)), so shards/streams sketch independently and combine."""
    return (
        a.unionByName(b)
        .groupBy("row", "slot")
        .agg(F.sum("c").alias("c"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query a batch of keys: min over the key's depth counters.
    The sketch side is ≤ depth·width rows → broadcast join; the keys
    side streams. Returns (key_col, est)."""
    probes = keys.select(
        key_col, F.posexplode(_slots(F.col(key_col), depth, width)).alias("row", "slot")
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "slot"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
    )
