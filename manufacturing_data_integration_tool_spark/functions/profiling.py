"""Dataset-profiling primitives beyond per-column stats: functional-
dependency auditing — the "is this column determined by that one?"
check a schema-inference / key-discovery pass runs before trusting a
join key or a dimension hierarchy.

Each candidate FD ``lhs -> rhs`` costs one combiner-friendly groupBy on
``lhs`` (the distinct-rhs count partial-aggregates map-side) plus a
one-row summary — per-candidate cost is a single shuffle of |distinct
lhs| rows, never a sort, and candidates evaluate independently so Spark
schedules them as parallel jobs.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["fd_violations"]


def fd_violations(
    df: DataFrame,
    candidates: Sequence[tuple[str, str]],
    *,
    round_to: int = 6,
) -> DataFrame:
    """Audit candidate functional dependencies: for each ``(lhs, rhs)``
    pair, count the keys whose rhs is NOT unique.

    Output, one row per candidate:
    ``(fd, n_keys, n_violating_keys, violation_rate, max_distinct_rhs)``
    — ``violation_rate`` 0.0 means the FD holds exactly (``lhs`` is a
    sound join/dimension key for ``rhs``).
    """
    if not candidates:
        raise ValueError("need at least one (lhs, rhs) candidate")
    parts = []
    for lhs, rhs in candidates:
        per_key = df.groupBy(lhs).agg(
            F.countDistinct(rhs).alias("__nd")
        )
        parts.append(
            per_key.agg(
                F.lit(f"{lhs}->{rhs}").alias("fd"),
                F.count(F.lit(1)).alias("n_keys"),
                F.sum(F.when(F.col("__nd") > 1, 1).otherwise(0))
                .cast("bigint")
                .alias("n_violating_keys"),
                F.round(
                    F.sum(F.when(F.col("__nd") > 1, 1).otherwise(0))
                    / F.count(F.lit(1)),
                    round_to,
                ).alias("violation_rate"),
                F.max("__nd").alias("max_distinct_rhs"),
            )
        )
    return reduce(DataFrame.unionByName, parts)
