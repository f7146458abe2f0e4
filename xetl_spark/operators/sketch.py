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


def bloom_build(
    df: DataFrame, key_col: str, num_hashes: int = 7, num_bits: int = 1 << 16
) -> DataFrame:
    """Mergeable Bloom filter, represented relationally as the set of
    set bit positions: one row per distinct (bit,) — at most
    ``num_bits`` rows regardless of corpus size.

    Like the CMS, the distributed build IS the merge: each partition
    contributes its distinct bits and the shuffle unions them (set
    union is the Bloom merge operator), so sharded corpora and stream
    batches can be sketched independently and OR-ed. Guarantees: no
    false negatives ever; false-positive rate ≈ (1-e^{-kn/m})^k for k
    hashes / m bits / n distinct keys. Hashing is xxhash64(key, seed) —
    deterministic, reproducible run-over-run.
    """
    bits = F.array(
        *[
            F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(num_bits))
            for i in range(num_hashes)
        ]
    )
    return df.select(F.explode(bits).alias("bit")).distinct()


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR two filters of identical (num_hashes, num_bits): bit-set union.
    bloom(A ∪ B) == merge(bloom(A), bloom(B)) exactly."""
    return a.unionByName(b).distinct()


def bloom_probe(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    num_hashes: int = 7,
    num_bits: int = 1 << 16,
) -> DataFrame:
    """Membership-test a batch of keys: present iff all ``num_hashes``
    probe bits are set. The sketch is ≤ num_bits rows → broadcast
    join; the probe side streams. Returns (key_col, maybe_present) —
    false means definitely absent; true means present-or-collision.
    One output row per distinct key: present iff NO probed bit missed
    (min over per-bit hit flags), which stays correct when the probe
    batch repeats a key — a raw hit-count == num_hashes compare would
    see k*num_hashes rows for a k-duplicated key and report a false
    negative, breaking the definitely-absent guarantee.
    """
    bits = F.array(
        *[
            F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(num_bits))
            for i in range(num_hashes)
        ]
    )
    probes = keys.select(key_col, F.explode(bits).alias("bit"))
    hit = F.when(F.col("__hit").isNull(), 0).otherwise(1)
    return (
        probes.join(F.broadcast(sketch.withColumn("__hit", F.lit(1))), ["bit"], "left")
        .groupBy(key_col)
        .agg((F.min(hit) == F.lit(1)).alias("maybe_present"))
    )
