"""Skew-mitigation helpers: salted joins and two-stage aggregations.

AQE's skew-join split (``spark.sql.adaptive.skewJoin``) is the first line
of defense and is enabled by the engine's sessions. These helpers cover the
cases AQE can't fix:

* ``salted_join`` — a hot key on the large side overwhelms one task even
  after AQE splits, because every replica still joins the full matching dim
  partition. Salting replicates the SMALL side ``n`` ways and scatters the
  large side uniformly, so a single join key spreads over ``n`` tasks.
* ``two_stage_agg`` — a hot group key makes the final aggregation task the
  straggler. Stage one aggregates on (key, salt) — map-side combine plus a
  uniform shuffle — stage two merges the ``n`` partials per key. Only valid
  for decomposable aggregates (count/sum/min/max, and avg via sum+count).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["salted_join", "two_stage_agg", "key_skew_profile"]

SALT = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    *,
    n_salts: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join that spreads each join key over ``n_salts`` tasks.

    The small side is replicated ``n_salts`` times (explode of a literal
    range — cost n_salts x |small|), the large side gets a uniform random
    salt, and the join key becomes (on..., salt). Results are identical to
    the plain join; only the shuffle distribution changes.
    """
    salted_large = large.withColumn(SALT, F.floor(F.rand(seed) * n_salts).cast("int"))
    salted_small = small.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    out = salted_large.join(salted_small, [*on, SALT], how)
    return out.drop(SALT)


def two_stage_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str],
    *,
    n_salts: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Skew-safe groupBy for decomposable aggregates.

    ``aggs`` maps output column -> ``"fn(col)"`` with fn in
    {count, sum, min, max}. Stage 1 groups on (keys..., salt); stage 2
    merges partials per key (count partials merge via sum).
    """
    import re

    parsed = {}
    for out_name, spec in aggs.items():
        m = re.fullmatch(r"(count|sum|min|max)\((\w+|\*)\)", spec.strip())
        if not m:
            raise ValueError(f"unsupported agg spec: {spec!r} (decomposable only)")
        parsed[out_name] = (m.group(1), m.group(2))

    def stage1_expr(fn: str, col: str) -> Column:
        if fn == "count":
            return F.count(F.lit(1)) if col == "*" else F.count(col)
        return getattr(F, fn)(col)

    merge_fn = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}

    salted = df.withColumn(SALT, F.floor(F.rand(seed) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, SALT).agg(
        *[stage1_expr(fn, col).alias(name) for name, (fn, col) in parsed.items()]
    )
    final = partial.groupBy(*keys).agg(
        *[
            getattr(F, merge_fn[fn])(name).alias(name)
            for name, (fn, col) in parsed.items()
        ]
    )
    return final


def key_skew_profile(
    df: DataFrame,
    key_cols: Sequence[str],
    *,
    top_n: int = 20,
) -> DataFrame:
    """Join/group-key skew diagnostic: the top ``top_n`` heaviest keys with
    their row counts and share of the table — the query you run BEFORE
    picking a join strategy, deciding ``salted_join``'s salt count, or
    trusting AQE's skew split to cope.

    One map-side-combined aggregate on the key, a 1-row total broadcast,
    and a TakeOrderedAndProject top-N (never a full sort). Ties break
    deterministically on the key itself so the LIMIT is reproducible and
    oracle-able. Share is ONE IEEE division of two exact bigints, rounded.

    Reading it at 100 TB: ``share`` of the top key ~ the fraction of the
    shuffle that lands on one reducer — anything over ~1/shuffle.partitions
    is a straggler in waiting.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n"))
    tot = df.agg(F.count(F.lit(1)).cast("bigint").alias("__total"))
    return (
        counts.join(F.broadcast(tot))
        .select(
            *key_cols,
            "n",
            F.col("__total").alias("total_rows"),
            F.round(F.col("n") / F.col("__total"), 6).alias("share"),
        )
        .orderBy(F.desc("n"), *[F.asc(c) for c in key_cols])
        .limit(top_n)
    )
