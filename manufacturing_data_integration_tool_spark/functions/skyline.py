"""Skyline (Pareto-dominance) queries — the multi-criteria "best
tradeoffs" operator (Borzsony/Kossmann/Stocker ICDE'01; integrated into
Spark SQL by Grasmann et al., EDBT'23). A point p dominates q when p is
<= q on every dimension and strictly < on at least one; the skyline is
the non-dominated set ("cheapest AND smallest", no single weighting).

``skyline_2d`` is the exact 2-D form, computed scale-honestly:

1. collapse to DISTINCT points with multiplicity (one combiner groupBy);
2. per-x champion: only the min-y point at each x can be non-dominated
   (one more combiner groupBy — everything else at that x is dominated
   by the champion);
3. the classic x-ascending sweep — keep a champion iff its y is
   strictly below every smaller-x champion's y — as a TWO-PHASE prefix
   min (the q137/q143 sub-bucket pattern): per-bucket minima cumulate
   over the tiny bucket table, broadcast back as offsets, and the wide
   window partitions on the sub-bucket — never an unpartitioned
   ORDER BY x window over the table.

With ``group_cols`` the same pipeline runs once per group (GROUPED
skyline — "best tradeoffs per brand"): every groupBy/window gains the
group keys, so group frontiers compute in parallel and the bucket-minima
table stays |groups| x |buckets| rows.

The naive NOT-EXISTS dominance definition is deliberately kept as the
ORACLE form (q194/q195): the optimized sweep must reproduce the
definitional quadratic answer exactly, which is the differential
evidence that the two-phase rewrite is semantics-preserving.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["skyline_2d"]


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    sub_bucket: Column,
    out_count: str = "n_rows",
    group_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Exact 2-D skyline with BOTH dimensions minimized (negate a column
    to maximize it). Returns the non-dominated DISTINCT points
    ``(*group_cols, x_col, y_col, out_count)`` with their input
    multiplicities — identical points do not dominate each other, so
    collapsing them to one counted row sidesteps the strictness corner
    case entirely. With ``group_cols`` dominance is evaluated WITHIN
    each group (a point only dominates points of its own group).

    ``sub_bucket`` must be monotone non-decreasing in ``x_col`` (a
    value-range prefix such as ``F.expr("x div 65536")``) — same contract
    as ``two_phase_ntile``; it bounds every window task at one
    (group, bucket).
    """
    g = list(group_cols or [])
    pts = df.groupBy(*g, x_col, y_col).agg(F.count(F.lit(1)).alias(out_count))
    # per-x champion: min (y, mult) struct — y values are distinct per
    # (group, x) after the collapse, so the struct min is the min-y row
    champ = (
        pts.groupBy(*g, x_col)
        .agg(F.min(F.struct(y_col, out_count)).alias("__c"))
        .select(
            *g,
            x_col,
            F.col(f"__c.{y_col}").alias(y_col),
            F.col(f"__c.{out_count}").alias(out_count),
        )
        .withColumn("__xb", sub_bucket)
    )
    # phase 1: per-(group, bucket) min y; prefix-cumulate over the TINY
    # bucket table — |groups| x |buckets| rows, partitioned by group
    # (unpartitioned only in the ungrouped case, where it is |buckets|
    # rows — the q137 offset shape)
    bmin = champ.groupBy(*g, "__xb").agg(F.min(y_col).alias("__bmin"))
    wprev = (
        Window.partitionBy(*g) if g else Window.partitionBy(F.lit(0))
    ).orderBy("__xb").rowsBetween(Window.unboundedPreceding, -1)
    prefix = bmin.select(*g, "__xb", F.min("__bmin").over(wprev).alias("__pmin"))
    # phase 2: strict-prefix min within the (group, bucket) — x distinct
    # per group, so every preceding row has strictly smaller x — combined
    # with the broadcast earlier-bucket minimum
    wintra = (
        Window.partitionBy(*g, "__xb")
        .orderBy(F.asc(x_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    joined = champ.join(F.broadcast(prefix), [*g, "__xb"], "left").withColumn(
        "__imin", F.min(y_col).over(wintra)
    )
    # least() skips NULLs (returns the least NON-null, NULL only if all
    # are), so no infinity sentinel and no double cast — comparisons stay
    # in the column's own type (a double sentinel would mis-compare
    # bigints past 2^53)
    eff = F.least(F.col("__imin"), F.col("__pmin"))
    return (
        joined.filter(eff.isNull() | (F.col(y_col) < eff))
        .select(*g, x_col, y_col, out_count)
    )
