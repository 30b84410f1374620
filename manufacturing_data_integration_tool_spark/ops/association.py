"""Market-basket association mining: pairwise co-occurrence counts with
support / confidence / lift (Agrawal, Imielinski & Swami, SIGMOD 1993;
the pair-only special case of Apriori that is shuffle-friendly at scale).

In a data-integration engine this is the cross-sell / co-occurrence
analytics layer over transactional facts (which item pairs ship
together), and in a corpus pipeline the same operator computes tag /
source co-occurrence affinities — the input is any (basket, item)
relation.

Algorithm (all equi-joins and grouped counts — no windows, no
cartesian):

1. Distinct (basket, item) — presence, not quantity, per Apriori.
2. Basket sizes; baskets wider than ``max_basket_items`` are DROPPED
   (loudly countable by the caller) — the per-basket pair fan-out is
   ``m*(m-1)/2``, so one pathological mega-basket would otherwise
   dominate the shuffle. Same hot-key-cap pattern as the dedup family's
   ``max_shingle_df``.
3. Self-join on basket with ``item_a < item_b`` → pair counts
   (map-side combinable groupBy).
4. Single-item counts + the 1-row basket total, broadcast back.
5. ``support = n_pair / n_baskets``; ``lift = n_pair * n_baskets /
   (n_a * n_b)`` — exact BIGINT products, one floor-published division
   each (the repo's oracle-determinism idiom).

Scale posture: with the size cap, pair fan-out per basket is bounded by
``cap^2/2``; everything downstream is map-side-combined counting. The
only broadcasts are the 1-row total and the per-item counts of the
items actually appearing in pairs — and the latter join keys on item,
a bounded dimension (brands, tags), not on baskets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ._materialize import materialize_once

__all__ = ["pair_lift"]


def _floor_pub(col: Column, r: int) -> Column:
    p = float(10**r)
    return F.floor(col * F.lit(p) + F.lit(0.5)) / F.lit(p)


def pair_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    *,
    min_pair_count: int = 2,
    max_basket_items: int = 100,
    round_to: int = 6,
) -> DataFrame:
    """Pairwise association rules over a (basket, item) relation.

    Returns one row per unordered item pair (``item_a < item_b``) with
    ``n_pair >= min_pair_count``: the co-occurrence count, each item's
    basket count, floor-published ``support`` (pair frequency over all
    kept baskets) and ``lift`` (observed co-occurrence over the
    independence expectation; > 1 means the pair attracts).
    """
    b = F.col(basket_col).alias("__b")
    i = F.col(item_col).alias("__i")
    # r12 opt: the deduped relation feeds the size aggregate AND the kept
    # join — materialize it too, so the upstream pipeline (often a fact ⋈
    # dim join) runs once, not twice.
    baskets = (
        df.where(F.col(basket_col).isNotNull() & F.col(item_col).isNotNull())
        .select(b, i)
        .distinct()
        .transform(materialize_once)
    )
    sizes = baskets.groupBy("__b").agg(F.count(F.lit(1)).alias("__m"))
    # materialize the kept-basket relation ONCE: four consumers below
    # (total, singles, both pair sides) would otherwise re-run the
    # upstream pipeline — at scale that is re-reading the fact table 4x
    kept = baskets.join(
        sizes.where(F.col("__m") <= F.lit(max_basket_items)).select("__b"), "__b"
    ).transform(materialize_once)
    total = kept.agg(F.countDistinct("__b").cast("bigint").alias("__n_baskets"))
    singles = kept.groupBy("__i").agg(F.count(F.lit(1)).cast("bigint").alias("__n_i"))
    left = kept.select("__b", F.col("__i").alias("item_a"))
    right = kept.select("__b", F.col("__i").alias("item_b"))
    pairs = (
        left.join(right, "__b")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pair"))
        .where(F.col("n_pair") >= F.lit(min_pair_count))
    )
    enriched = (
        pairs.join(
            F.broadcast(singles.select(F.col("__i").alias("item_a"), F.col("__n_i").alias("n_a"))),
            "item_a",
        )
        .join(
            F.broadcast(singles.select(F.col("__i").alias("item_b"), F.col("__n_i").alias("n_b"))),
            "item_b",
        )
        .crossJoin(F.broadcast(total))
    )
    support = F.col("n_pair").cast("double") / F.col("__n_baskets").cast("double")
    lift = (F.col("n_pair") * F.col("__n_baskets")).cast("double") / (
        F.col("n_a") * F.col("n_b")
    ).cast("double")
    return enriched.select(
        "item_a",
        "item_b",
        "n_pair",
        "n_a",
        "n_b",
        F.col("__n_baskets").alias("n_baskets"),
        _floor_pub(support, round_to).alias("support"),
        _floor_pub(lift, round_to).alias("lift"),
    )
