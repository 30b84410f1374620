"""Classifier-evaluation primitives for data-curation pipelines: exact
distributed ROC-AUC (Mann-Whitney rank-sum) and calibration
(reliability-diagram) bins.

Why these belong in a training-data engine: modern corpus curation gates
documents through learned quality classifiers (fastText-style filters in
GPT-3 / CCNet; DCLM and FineWeb-Edu ablate them explicitly), and the
pipeline must be able to EVALUATE those filters at corpus scale — "how
well does this score separate the keep class from the drop class" (AUC)
and "do its probabilities mean what they say" (calibration) — without
sampling to a single machine.

Determinism contract (the repo's oracle rules):

- Scores enter on an INTEGER grid (callers quantize floats with the
  floor-grid idiom first). Every rank statistic is then exact integer
  arithmetic — no float accumulation anywhere before the single final
  division, so partial-aggregation order cannot change a digit.
- Ties are handled the textbook way (average ranks) but in DOUBLED rank
  units so the math stays integral: a score bucket holding ``n`` rows
  after ``below`` smaller rows contributes ``n_pos * (2*below + n + 1)``
  to the doubled positive rank-sum. ``AUC = (R2 - n_pos*(n_pos+1)) /
  (2*n_pos*n_neg)`` — one exact-integer ratio, divided once.
- Published ratios use the floor-publish idiom ``floor(x*10^r + 0.5) /
  10^r`` (pure IEEE ops, identical on Spark and DuckDB).

Scale posture: both operators aggregate the raw rows down to the
DISTINCT-SCORE table first (map-side combined), so the heavy input is
touched exactly once with no wide shuffle beyond that groupBy. The
cumulative "rows below this score" count then runs over score buckets —
via :func:`~..ops.sampling.two_phase_running_sum`, so even a
billion-bucket fine grid never serializes through one window task. The
doubled rank-sum is accumulated as ``decimal(38,0)`` (Spark) / HUGEINT
(DuckDB): at 10^12 rows the per-bucket contribution reaches ~10^24,
past BIGINT but comfortably inside 38 digits.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F

from .sampling import two_phase_running_sum

__all__ = ["roc_auc", "calibration_bins", "pr_curve"]


def _floor_pub(col: Column, r: int) -> Column:
    """floor-publish a ratio to ``r`` decimals (engine-portable)."""
    p = float(10**r)
    return F.floor(col * F.lit(p) + F.lit(0.5)) / F.lit(p)


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    group_cols: Sequence[str] = (),
    sub_bucket: Optional[Column] = None,
    round_to: int = 6,
) -> DataFrame:
    """Exact ROC-AUC of an integer-grid ``score_col`` against a 0/1
    ``label_col``, optionally per group (one output row per group).

    AUC equals the Mann-Whitney U statistic normalised by ``n_pos *
    n_neg`` (Hanley & McNeil, Radiology 1982): the probability that a
    uniformly chosen positive outscores a uniformly chosen negative,
    ties counting half. Computed from average ranks in doubled-rank
    units so every accumulator is an exact integer (see module
    docstring); the one division happens at the end, per group.

    ``sub_bucket`` must be monotone non-decreasing in ``score_col``
    (default ``score div 65536``) — it de-serializes the cumulative
    below-count exactly as in ``two_phase_running_sum``.

    Output: ``group_cols + (n_pos, n_neg, auc)``; ``auc`` is NULL for a
    degenerate group (no positives or no negatives).
    """
    gcols = list(group_cols)
    s = F.col(score_col).cast("bigint")
    lab = F.col(label_col).cast("int")
    buckets = (
        df.select(*gcols, s.alias("__s"), lab.alias("__y"))
        .groupBy(*gcols, "__s")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum("__y").cast("bigint").alias("__np"),
        )
    )
    sub = sub_bucket if sub_bucket is not None else F.expr("__s div 65536")
    run = two_phase_running_sum(
        buckets, gcols, [F.asc("__s")], F.col("__n"), sub, out_col="__below_incl"
    )
    below = F.col("__below_incl") - F.col("__n")
    # doubled positive rank-sum contribution, exact and decimal-wide
    contrib = (
        F.col("__np").cast("decimal(38,0)")
        * (F.lit(2) * below + F.col("__n") + F.lit(1)).cast("decimal(38,0)")
    )
    agg = run.groupBy(*gcols).agg(
        F.sum("__np").cast("bigint").alias("n_pos"),
        (F.sum("__n") - F.sum("__np")).cast("bigint").alias("n_neg"),
        F.sum(contrib).cast("decimal(38,0)").alias("__r2"),
    )
    # keep U in exact decimal space; only the final ratio goes to double
    u2 = (
        F.col("__r2")
        - (
            F.col("n_pos").cast("decimal(38,0)")
            * (F.col("n_pos") + F.lit(1)).cast("decimal(38,0)")
        ).cast("decimal(38,0)")
    ).cast("double")
    denom = F.lit(2.0) * F.col("n_pos").cast("double") * F.col("n_neg").cast("double")
    return agg.select(
        *gcols,
        "n_pos",
        "n_neg",
        _floor_pub(F.try_divide(u2, denom), round_to).alias("auc"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    n_bins: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Reliability-diagram bins: equal-width buckets of an integer-grid
    score vs the empirical positive rate (Murphy 1973; reliability
    diagrams per DeGroot & Fienberg 1983).

    Bin edges come from the GLOBAL min/max — one 1-row aggregate
    broadcast back onto the stream (the repo's two-pass stats shape, no
    unpartitioned window). Bin index is pure integer arithmetic:
    ``least(n_bins-1, (s - min) * n_bins div (max - min + 1))`` — exact
    on any engine, no float edges to disagree about. Per-bin outputs
    (count, positives, mean score, positive rate) are integer sums with
    one floor-published division each.
    """
    s = F.col(score_col).cast("bigint")
    lab = F.col(label_col).cast("int")
    base = df.select(s.alias("__s"), lab.alias("__y"))
    stats = base.agg(
        F.min("__s").alias("__lo"), F.max("__s").alias("__hi")
    )
    bin_idx = F.least(
        F.lit(n_bins - 1),
        F.expr(f"((__s - __lo) * {n_bins}) div (__hi - __lo + 1)"),
    )
    binned = base.crossJoin(F.broadcast(stats)).select(
        bin_idx.cast("bigint").alias("bin"), "__s", "__y"
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("__y").cast("bigint").alias("n_pos"),
            F.sum("__s").cast("bigint").alias("__sum_s"),
        )
        .select(
            "bin",
            "n",
            "n_pos",
            _floor_pub(
                F.col("__sum_s").cast("double") / F.col("n").cast("double"), round_to
            ).alias("mean_score"),
            _floor_pub(
                F.col("n_pos").cast("double") / F.col("n").cast("double"), round_to
            ).alias("pos_rate"),
        )
    )


def pr_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    sub_bucket: Optional[Column] = None,
    round_to: int = 6,
) -> DataFrame:
    """Precision-recall curve points: one row per distinct score
    threshold with the confusion counts of the classifier "predict
    positive iff score >= threshold" (Davis & Goadrich, ICML 2006 on
    PR-vs-ROC; the curve itself, not an interpolated area, so every
    published number is an exact integer ratio).

    Same scale shape as :func:`roc_auc`: collapse to the distinct-score
    table first, then ONE two-phase running sum computes both cumulative
    counts (total and positive) below each threshold; ``tp = n_pos_total
    - pos_below`` etc. are pure column arithmetic on the bucket table.
    The global (n, n_pos) totals ride a broadcast 1-row aggregate.

    Output: ``threshold, tp, fp, fn, precision, recall`` — precision and
    recall floor-published; thresholds where ``tp + fp = 0`` cannot occur
    (every emitted threshold has at least its own bucket at/above it).
    """
    s = F.col(score_col).cast("bigint")
    lab = F.col(label_col).cast("int")
    buckets = (
        df.select(s.alias("__s"), lab.alias("__y"))
        .groupBy("__s")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum("__y").cast("bigint").alias("__np"),
        )
    )
    sub = sub_bucket if sub_bucket is not None else F.expr("__s div 65536")
    # one pass stamps the all-rows running count; a second stamps the
    # positive running count — both over the same tiny bucket table
    run = two_phase_running_sum(
        buckets, [], [F.asc("__s")], F.col("__n"), sub, out_col="__cum_n"
    )
    run = two_phase_running_sum(
        run, [], [F.asc("__s")], F.col("__np"), sub,
        out_col="__cum_np",
    )
    totals = buckets.agg(
        F.sum("__n").cast("bigint").alias("__tot_n"),
        F.sum("__np").cast("bigint").alias("__tot_np"),
    )
    tp = F.col("__tot_np") - (F.col("__cum_np") - F.col("__np"))
    predicted_pos = F.col("__tot_n") - (F.col("__cum_n") - F.col("__n"))
    fp = predicted_pos - tp
    fn = F.col("__tot_np") - tp
    return (
        run.crossJoin(F.broadcast(totals))
        .select(
            F.col("__s").alias("threshold"),
            tp.cast("bigint").alias("tp"),
            fp.cast("bigint").alias("fp"),
            fn.cast("bigint").alias("fn"),
            _floor_pub(
                tp.cast("double") / predicted_pos.cast("double"), round_to
            ).alias("precision"),
            _floor_pub(
                F.try_divide(tp.cast("double"), F.col("__tot_np").cast("double")),
                round_to,
            ).alias("recall"),
        )
    )
