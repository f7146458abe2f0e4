"""Market-basket co-occurrence mining (frequent item pairs).

The frequent-itemset building block (A-Priori's pair pass): count, for
every unordered item pair, the number of baskets containing both, and
keep pairs at or above a support threshold.

Scale design (the r6 SCALING.md flagged the previous self-join shape as
the worst x100 grower at 5.0×):

- ONE shuffle assembles baskets: ``groupBy(basket).collect_set(item)``
  with map-side partial sets — this subsumes the (basket, item)
  ``distinct()`` the self-join formulation needed as a separate
  exchange, and replaces the two join-side shuffles. Pair expansion is
  then map-side over the sorted basket array (higher-order array
  functions, no Python), and the pair count is the second and final
  shuffle, with map-side partial aggregation.
- ``max_basket_size`` is the quadratic-blowup guard (mirrors
  ``dedup.max_bucket_size``): a single degenerate basket of 100k items
  would otherwise emit 5×10⁹ pairs from one task. Oversized baskets
  are dropped, bounding any task's expansion at k²/2. TPC-H baskets
  are ≤7 items, so the default guard never triggers on the fixtures
  and the operator stays oracle-exact.
- ``prune_items=True`` bolts on the A-Priori item prefilter: a pair in
  ≥ min_support baskets needs BOTH items in ≥ min_support baskets, so
  dropping rarer items first is semantics-preserving and cuts the
  expansion on corpora with a long one-off-item tail (costs one extra
  item-keyed shuffle + a semi-join, so it's opt-in — on TPC-H every
  part clears support 2 and the prune would be pure overhead).

Reference analog: sebmartin/xETL has no relational operators; this is
part of the engine's declared beyond-reference analytics surface
(SURVEY.md §2-B "frequent pairs").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket_size: int | None = 10_000,
    prune_items: bool = False,
) -> DataFrame:
    """Pairs of distinct items co-occurring in >= min_support baskets.

    Returns (item_a, item_b, n_baskets) with item_a < item_b.
    """
    items = df.select(
        F.col(basket_col).alias("__basket"), F.col(item_col).alias("__item")
    )
    if prune_items and min_support > 1:
        frequent = (
            items.groupBy("__item")
            .agg(F.count_distinct("__basket").alias("__s"))
            .filter(F.col("__s") >= min_support)
            .select("__item")
        )
        items = items.join(frequent, "__item", "semi")
    baskets = items.groupBy("__basket").agg(
        F.sort_array(F.collect_set("__item")).alias("__items")
    )
    if max_basket_size is not None:
        baskets = baskets.filter(F.size("__items") <= max_basket_size)
    # map-side pair expansion over the sorted array: posexplode each
    # item, then explode its tail — a<b orientation for free. Two plain
    # generators, NO lambda higher-order functions: HOF lambdas run
    # interpreted outside whole-stage codegen and measured 35% slower
    # on the same expansion at sf0.1.
    e1 = baskets.select("__items", F.posexplode("__items").alias("__i", "item_a"))
    pairs = e1.select(
        "item_a",
        F.explode(
            F.slice(
                "__items",
                F.col("__i") + 2,
                F.greatest(F.size("__items") - F.col("__i") - 1, F.lit(0)),
            )
        ).alias("item_b"),
    )
    return (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_baskets"))
        .filter(F.col("n_baskets") >= min_support)
    )
