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

__all__ = [
    "roc_auc",
    "calibration_bins",
    "pr_curve",
    "psi_drift",
    "woe_iv",
    "target_encode_loo",
    "simpson_screen",
    "bh_step_up",
    "fleiss_kappa_binary",
    "cmh_test",
    "cronbach_alpha",
    "hosmer_lemeshow",
]


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


def psi_drift(
    df: DataFrame,
    bucket: Column,
    is_current: Column,
    *,
    group_cols: Sequence[str] = (),
    ln_round: int = 9,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    population over a declared bucketing — the standard serving-drift
    gate on model features / corpus statistics (PSI < 0.1 stable,
    0.1-0.25 watch, > 0.25 shifted; credit-scoring folklore since the
    1990s, same binned form as Lin 2017's summaries of it):

        PSI = sum_buckets (p_cur - p_ref) * ln(p_cur / p_ref)

    Determinism: p_cur/p_ref are exact count ratios (single IEEE
    divisions off BIGINT counts and broadcast totals); each bucket's
    ln(.) rounds to ``ln_round`` decimals (kills libm last-ulp drift —
    the q86 pattern) before the product; each term then floor-quantizes
    to the 1e-9 integer lattice BEFORE the sum (the q204 per-term
    pattern), so the cross-bucket addition is BIGINT-associative.

    Buckets present on only one side are EXCLUDED from the sum (their
    ln diverges; the standard smoothed-PSI variants are approximations
    this engine won't fake) but are COUNTED: ``n_one_sided`` > 0 is
    itself a drift signal the caller must not ignore.

    Scale posture: one groupBy over (group, bucket, side) — map-side
    combined — then bucket-table arithmetic; group totals ride a
    broadcast join. Output: group_cols + ``psi_x1e9`` (BIGINT),
    ``n_buckets``, ``n_one_sided``.
    """
    g = list(group_cols)
    base = df.select(
        *g,
        bucket.alias("__b"),
        F.when(is_current, F.lit(1)).otherwise(F.lit(0)).alias("__cur"),
    )
    cells = base.groupBy(*g, "__b").agg(
        F.sum(F.when(F.col("__cur") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("__nr"),
        F.sum("__cur").cast("bigint").alias("__nc"),
    )
    totals = cells.groupBy(*g).agg(
        F.sum("__nr").cast("bigint").alias("__tr"),
        F.sum("__nc").cast("bigint").alias("__tc"),
    )
    j = (
        cells.join(F.broadcast(totals), g)
        if g
        else cells.crossJoin(F.broadcast(totals))
    )
    p_ref = F.col("__nr").cast("double") / F.col("__tr").cast("double")
    p_cur = F.col("__nc").cast("double") / F.col("__tc").cast("double")
    both = (F.col("__nr") > 0) & (F.col("__nc") > 0)
    term = (p_cur - p_ref) * F.round(F.log(p_cur / p_ref), ln_round)
    term_q = F.when(
        both, F.floor(term * F.lit(1e9) + F.lit(0.5)).cast("bigint")
    ).otherwise(F.lit(0).cast("bigint"))
    return (
        j.select(
            *g,
            term_q.alias("__t"),
            both.cast("int").alias("__both"),
        )
        .groupBy(*g)
        .agg(
            F.sum("__t").cast("bigint").alias("psi_x1e9"),
            F.sum("__both").cast("bigint").alias("n_buckets"),
            (F.count(F.lit(1)) - F.sum("__both")).cast("bigint").alias("n_one_sided"),
        )
    )


def woe_iv(
    df: DataFrame,
    bucket: Column,
    label: Column,
    *,
    ln_round: int = 9,
) -> DataFrame:
    """Weight-of-evidence / information-value screen of a bucketed
    feature against a binary outcome (Siddiqi's credit-scorecard
    formulation; the standard pre-model univariate feature audit):

        WOE_i = ln( (bad_i / B) / (good_i / G) )
        IV    = sum_i (bad_i/B - good_i/G) * WOE_i

    (IV < 0.02 useless, 0.02-0.3 predictive, > 0.5 suspicious.)

    Determinism: exact BIGINT cell counts + broadcast (G, B) totals;
    the WOE ln rounds to ``ln_round`` decimals; each IV term
    floor-quantizes to the 1e-9 lattice before the cross-bucket sum
    (same recipe as :func:`psi_drift`). Buckets with zero goods or
    zero bads publish NULL woe and contribute 0 to IV (the exact
    treatment — smoothing variants are approximations).

    Output: one row per bucket — ``bucket, n_good, n_bad, woe_x1e9,
    iv_term_x1e9, iv_x1e9`` (the last column is the feature-level IV,
    identical on every row, attached via a broadcast 1-row aggregate so
    the per-bucket table stays the single output).

    Scale posture: ONE map-side-combined groupBy over the bucket
    expression; everything after runs on the bucket-count table.
    """
    cells = (
        df.select(
            bucket.alias("bucket"),
            F.when(label, F.lit(1)).otherwise(F.lit(0)).alias("__y"),
        )
        .groupBy("bucket")
        .agg(
            F.sum(F.lit(1) - F.col("__y")).cast("bigint").alias("n_good"),
            F.sum("__y").cast("bigint").alias("n_bad"),
        )
    )
    totals = cells.agg(
        F.sum("n_good").cast("bigint").alias("__G"),
        F.sum("n_bad").cast("bigint").alias("__B"),
    )
    j = cells.crossJoin(F.broadcast(totals))
    rb = F.col("n_bad").cast("double") / F.col("__B").cast("double")
    rg = F.col("n_good").cast("double") / F.col("__G").cast("double")
    both = (F.col("n_good") > 0) & (F.col("n_bad") > 0)
    woe = F.round(F.log(rb / rg), ln_round)
    woe_x = F.when(both, F.floor(woe * F.lit(1e9) + F.lit(0.5)).cast("bigint"))
    term_x = F.when(
        both, F.floor((rb - rg) * woe * F.lit(1e9) + F.lit(0.5)).cast("bigint")
    ).otherwise(F.lit(0).cast("bigint"))
    per = j.select(
        "bucket",
        "n_good",
        "n_bad",
        woe_x.alias("woe_x1e9"),
        term_x.alias("iv_term_x1e9"),
    )
    iv = per.agg(F.sum("iv_term_x1e9").cast("bigint").alias("iv_x1e9"))
    return per.crossJoin(F.broadcast(iv))


def target_encode_loo(
    df: DataFrame,
    key_cols: Sequence[str],
    target_int: Column,
    *,
    out_col: str = "te_loo",
    round_to: int = 6,
) -> DataFrame:
    """Leave-one-out target encoding of ``key_cols`` against an
    INTEGER-grid target (Micci-Barreca, SIGKDD Expl. 2001 — the
    high-cardinality categorical encoder; leave-one-out is the variant
    that doesn't leak the row's own label into its feature):

        te(row) = (sum(target over key) - target(row)) / (n(key) - 1)

    NULL for singleton keys (n = 1) — the honest answer, not a prior
    blend (blending variants are approximations callers can layer on).

    Determinism: per-key (sum, n) are exact BIGINT aggregates; the one
    division is a single IEEE op, floor-published. Scale posture: one
    map-side-combined groupBy + one keyed equi-join back onto the rows
    (both hash-partitioned on the key — AQE skew-splittable); no
    window, no per-row state.
    """
    k = list(key_cols)
    base = df.withColumn("__t", target_int.cast("bigint"))
    stats = base.groupBy(*k).agg(
        F.sum("__t").cast("bigint").alias("__sum"),
        F.count(F.lit(1)).cast("bigint").alias("__n"),
    )
    j = base.join(stats, k)
    loo = F.try_divide(
        (F.col("__sum") - F.col("__t")).cast("double"),
        F.when(F.col("__n") > 1, (F.col("__n") - 1).cast("double")),
    )
    return j.withColumn(out_col, _floor_pub(loo, round_to)).drop(
        "__t", "__sum", "__n"
    )


def simpson_screen(
    df: DataFrame,
    x_col: Column | str,
    y_col: Column | str,
    strata_col: Column | str,
    *,
    strata_name: str = "stratum",
) -> DataFrame:
    """Simpson's-paradox screen (Simpson, JRSS-B 1951): does the
    treatment-outcome association REVERSE inside every stratum relative
    to the pooled table? The classic aggregation trap every dashboard
    comparing pooled rates eventually hits — this publishes the per-
    stratum 2x2 cells, both association signs, and a ``flipped`` flag.

    ``x_col`` / ``y_col`` are boolean Columns (treatment, outcome);
    ``strata_col`` the confounder. Association sign per table is the
    sign of the odds-ratio numerator ``a*d - b*c`` — EXACT BIGINT
    cross-products, never a rate division, so the screen is
    float-free end to end.

    Scale posture: one map-side-combined groupBy to the stratum cells,
    a 1-row pooled aggregate broadcast back — two shuffles of a
    |strata|-row table.

    Output: one row per stratum —
    ``(stratum, a, b, c, d, stratum_sign, pooled_sign, flipped)``
    with cells a = (x,y), b = (x,!y), c = (!x,y), d = (!x,!y).
    """
    x = (F.col(x_col) if isinstance(x_col, str) else x_col).cast("boolean")
    y = (F.col(y_col) if isinstance(y_col, str) else y_col).cast("boolean")
    s = F.col(strata_col) if isinstance(strata_col, str) else strata_col
    base = df.select(
        s.alias(strata_name), x.alias("__x"), y.alias("__y")
    )
    cells = base.groupBy(strata_name).agg(
        F.sum(F.when(F.col("__x") & F.col("__y"), 1).otherwise(0))
        .cast("bigint")
        .alias("a"),
        F.sum(F.when(F.col("__x") & ~F.col("__y"), 1).otherwise(0))
        .cast("bigint")
        .alias("b"),
        F.sum(F.when(~F.col("__x") & F.col("__y"), 1).otherwise(0))
        .cast("bigint")
        .alias("c"),
        F.sum(F.when(~F.col("__x") & ~F.col("__y"), 1).otherwise(0))
        .cast("bigint")
        .alias("d"),
    )
    pooled = cells.agg(
        F.sum("a").cast("bigint").alias("__pa"),
        F.sum("b").cast("bigint").alias("__pb"),
        F.sum("c").cast("bigint").alias("__pc"),
        F.sum("d").cast("bigint").alias("__pd"),
    )
    sgn = F.signum(
        (F.col("a") * F.col("d") - F.col("b") * F.col("c")).cast("double")
    ).cast("int")
    psgn = F.signum(
        (F.col("__pa") * F.col("__pd") - F.col("__pb") * F.col("__pc")).cast(
            "double"
        )
    ).cast("int")
    return cells.crossJoin(F.broadcast(pooled)).select(
        strata_name,
        "a",
        "b",
        "c",
        "d",
        sgn.alias("stratum_sign"),
        psgn.alias("pooled_sign"),
        ((sgn * psgn) < 0).alias("flipped"),
    )


def bh_step_up(
    df: DataFrame,
    key_cols: Sequence[str],
    stat_col: str,
    thresholds: Sequence[int],
) -> DataFrame:
    """Benjamini-Hochberg step-up multiple-testing control (Benjamini &
    Hochberg, JRSS-B 1995) over a BOUNDED test family — the governance
    layer for the repo's per-group screens (chi-square cells, z-tests,
    McNemar): without it, scanning m groups at alpha yields ~m*alpha
    false alarms; BH caps the FALSE DISCOVERY RATE at alpha.

    Engine-portability is the design problem: BH needs p-values, but
    neither Spark nor DuckDB exposes an inverse normal/chi-square CDF.
    Solution: p is MONOTONE in the test statistic, so "p_(i) <= i*alpha/m"
    is equivalently "|z|_(i) >= Phi^-1(1 - i*alpha/(2m))" — and those m
    per-rank cut points are compile-time constants the caller precomputes
    once (Python ``statistics.NormalDist``) and injects as the SAME
    integer-lattice literals into both engines. ``thresholds[i-1]`` is
    the cut for rank i on the lattice of ``stat_col``.

    ``stat_col`` is a BIGINT lattice statistic (e.g. ``|z| * 1e6``
    floor-published from a verbatim-mirrored IEEE tree). NULL statistics
    (degenerate cells) stay in the output, are never rejected, and do
    not consume a rank — but the family size m stays ``len(thresholds)``
    by construction (missing tests are conservatively never-rejected,
    never a smaller m).

    Family-size tripwire: the per-rank cuts are only valid while the
    REALIZED family fits the compile-time m. If any non-NULL statistic
    ranks beyond m (e.g. a category cardinality grew at a larger scale
    factor), ranks <= m would silently become anticonservative — so the
    plan ``raise_error``s at runtime instead of weakening FDR control
    quietly.

    Scale posture: the family is bounded (m literals), so the rank
    window and the step-up max run over <= m rows — broadcast-sized by
    contract, like q60's vocab window. The heavy work is whatever
    aggregation PRODUCED the per-test rows, upstream.

    Output: ``key_cols + (stat_col, bh_rank, bh_threshold, rejected)``.
    """
    from pyspark.sql import Window

    g = list(key_cols)
    m = len(thresholds)
    spark = df.sparkSession
    thr = spark.createDataFrame(
        [(i + 1, int(t)) for i, t in enumerate(thresholds)],
        "bh_rank bigint, bh_threshold bigint",
    )
    ranked = df.withColumn(
        "bh_rank",
        F.when(
            F.col(stat_col).isNotNull(),
            F.row_number().over(
                Window.partitionBy(F.lit(1)).orderBy(
                    F.desc_nulls_last(stat_col), *[F.asc(c) for c in g]
                )
            ),
        ).cast("bigint"),
    ).join(F.broadcast(thr), "bh_rank", "left")
    flagged = ranked.withColumn(
        "__hit",
        F.col(stat_col).isNotNull()
        & (F.col("bh_rank") <= m)
        & (F.col(stat_col) >= F.col("bh_threshold")),
    )
    kmax = flagged.agg(
        F.coalesce(
            F.max(F.when(F.col("__hit"), F.col("bh_rank"))), F.lit(0)
        ).alias("__k")
    )
    return (
        flagged.crossJoin(F.broadcast(kmax))
        .select(
            *g,
            stat_col,
            "bh_rank",
            "bh_threshold",
            F.when(
                F.col(stat_col).isNotNull() & (F.col("bh_rank") > m),
                F.raise_error(
                    F.lit(
                        "bh_step_up: realized test family exceeds the "
                        f"compile-time family size m={m}; the per-rank "
                        "cut points are anticonservative — recompute "
                        "thresholds for the true family size"
                    )
                ).cast("boolean"),
            )
            .otherwise(
                F.col("bh_rank").isNotNull()
                & (F.col("bh_rank") <= F.col("__k"))
            )
            .alias("rejected"),
        )
    )


def fleiss_kappa_binary(
    votes: DataFrame,
    votes_col: str,
    n_raters: int,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Fleiss' kappa (Psych. Bull. 1971) for ``n_raters`` binary raters —
    the MULTI-rater chance-corrected agreement behind q257's pairwise
    Cohen kappa and q298's Cochran Q homogeneity: given per-subject pass
    counts ``r_i`` (0..n), how much do the raters agree beyond chance?

    Exact-integer derivation (n = n_raters, N subjects, A = sum r_i,
    B = sum r_i^2): per-subject agreement sums collapse to
    ``P_bar = (B - (n-1)*A*? ...`` — for the binary two-category case

        ``sum_j n_ij^2 = r^2 + (n-r)^2 = 2r^2 - 2nr + n^2``
        ``P_bar = (2B - 2nA + n(n-1)N + ... )``  — concretely, with
        ``U = nN*(2B - 2nA + nnN - nN)/(n-1)``-free form below:

        ``P_bar = (2B - 2nA + n^2*N - nN) / (n(n-1)N)``
        ``P_e   = (A^2 + (nN - A)^2) / (nN)^2``
        ``kappa = (P_bar - P_e) / (1 - P_e)``

    Putting both over the common denominator ``D = (nN)^2`` with
    ``U = nN * (2B - 2nA + n^2*N - nN) / (n-1)`` — and since n is a
    COMPILE-TIME literal, (n-1) divides out exactly in the published
    cross-multiplied form

        ``kappa = ((n-1)*U' - (n-1)*V) / ((n-1)*(D - V))``  with
        ``U' = nN*(2B - 2nA + n^2*N - nN)``:
        ``kappa = (U' - (n-1)*V) / ((n-1)*(D - V))``

    — numerator and denominator exact decimal(38,0) integers, ONE
    division, floor-published (NULL when P_e = 1: every subject
    unanimous the same way, kappa undefined).

    Scale posture: one global aggregate over the votes table.

    Output: one row — ``n_subjects, n_raters, pbar_x1e9, pe_x1e9,
    kappa_x1e6``.
    """
    n = int(n_raters)
    if n < 2:
        raise ValueError(f"n_raters must be >= 2, got {n}")
    r = F.col(votes_col).cast("bigint")
    dec = "decimal(38,0)"
    base = votes.filter(r.isNotNull()).select(r.alias("__r"))
    agg = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_subjects"),
        F.coalesce(F.sum(F.col("__r").cast(dec)), F.lit(0).cast(dec))
        .cast(dec)
        .alias("__a"),
        F.coalesce(
            F.sum(F.col("__r").cast(dec) * F.col("__r")), F.lit(0).cast(dec)
        )
        .cast(dec)
        .alias("__b"),
    )
    nn = F.lit(n).cast(dec)
    nd = F.col("n_subjects").cast(dec)
    a, b = F.col("__a"), F.col("__b")
    nt = (nn * nd).cast(dec)  # n*N total votes
    u1 = (
        nt
        * (
            F.lit(2).cast(dec) * b
            - F.lit(2 * n).cast(dec) * a
            + F.lit(n * n).cast(dec) * nd
            - nt
        )
    ).cast(dec)
    vv = (a * a + (nt - a) * (nt - a)).cast(dec)
    d = (nt * nt).cast(dec)
    num = (u1 - F.lit(n - 1).cast(dec) * vv).cast(dec)
    den = (F.lit(n - 1).cast(dec) * (d - vv)).cast(dec)
    pub9 = lambda e: F.floor(  # noqa: E731
        e * F.lit(1e9) + F.lit(0.5)
    ).cast("bigint")
    pbar = u1.cast("double") / (F.lit(float(n - 1)) * d.cast("double"))
    pe = vv.cast("double") / d.cast("double")
    return agg.select(
        "n_subjects",
        F.lit(n).cast("bigint").alias("n_raters"),
        pub9(pbar).alias("pbar_x1e9"),
        pub9(pe).alias("pe_x1e9"),
        F.when(
            (F.col("n_subjects") < 1) | (den <= F.lit(0).cast(dec)),
            F.lit(None).cast("bigint"),
        )
        .otherwise(
            F.floor(
                num.cast("double") / den.cast("double") * F.lit(float(scale))
                + F.lit(0.5)
            ).cast("bigint")
        )
        .alias("kappa_x1e6"),
    )


def cmh_test(
    df: DataFrame,
    exposure: Column,
    outcome: Column,
    strata: Column,
    *,
    strata_name: str = "stratum",
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Cochran-Mantel-Haenszel stratified 2x2 test + MH common odds
    ratio (Mantel & Haenszel JNCI 1959; Cochran 1954) — the inferential
    companion to :func:`simpson_screen` on the SAME cells: after
    controlling for the stratum, is there a common exposure-outcome
    association, and what is its pooled odds ratio?

    Exact-arithmetic derivation: per stratum with 2x2 counts a,b,c,d
    (a = exposed & outcome) and n = a+b+c+d,

        ``E-term  = (a+b)(a+c) / n``
        ``V-term  = (a+b)(c+d)(a+c)(b+d) / (n^2 (n-1))``
        ``R-term  = a*d / n``,  ``S-term = b*c / n``  (MH odds ratio)

    each floored per stratum onto the 1e9 lattice in decimal(38,0) (the
    q292/q342 per-term discipline; truncation < 1e-9 per stratum), sums
    exact integers. chi2 = (sum a - sum E)^2 / sum V and OR = R/S are
    each ONE mirrored IEEE tree over the published integers. Magnitude
    contract: n^4/16 * 1e9 per V-term numerator -> stratum size below
    ~2e7 rows for decimal(38,0); loud ANSI overflow beyond.

    Scale posture: ONE map-side-combined groupBy(stratum) builds the
    cells; everything after runs on the strata-count table.

    Output: ONE row — ``n_strata, sum_a, e_x1e9, var_x1e9,
    cmh_chi2_x1e6`` (NULL when sum V = 0) ``, mh_or_x1e6`` (NULL when
    S = 0).
    """
    dec = "decimal(38,0)"
    cells = (
        df.select(
            strata.alias(strata_name),
            exposure.cast("boolean").alias("__e"),
            outcome.cast("boolean").alias("__o"),
        )
        .filter(
            F.col(strata_name).isNotNull()
            & F.col("__e").isNotNull()
            & F.col("__o").isNotNull()
        )
        .groupBy(strata_name)
        .agg(
            F.sum(F.when(F.col("__e") & F.col("__o"), 1).otherwise(0))
            .cast("bigint")
            .alias("__a"),
            F.sum(F.when(F.col("__e") & ~F.col("__o"), 1).otherwise(0))
            .cast("bigint")
            .alias("__b"),
            F.sum(F.when(~F.col("__e") & F.col("__o"), 1).otherwise(0))
            .cast("bigint")
            .alias("__c"),
            F.sum(F.when(~F.col("__e") & ~F.col("__o"), 1).otherwise(0))
            .cast("bigint")
            .alias("__d"),
        )
    )
    n_expr = "(CAST(__a AS decimal(38,0)) + __b + __c + __d)"
    e_term = F.expr(
        f"CAST((CAST(__a AS {dec}) + __b) * (CAST(__a AS {dec}) + __c)"
        f" * CAST({int(scale)} AS {dec}) AS {dec}) div {n_expr}"
    )
    v_term = F.when(
        (F.col("__a") + F.col("__b") + F.col("__c") + F.col("__d")) > 1,
        F.expr(
            f"CAST((CAST(__a AS {dec}) + __b) * (CAST(__c AS {dec}) + __d)"
            f" * (CAST(__a AS {dec}) + __c) * (CAST(__b AS {dec}) + __d)"
            f" * CAST({int(scale)} AS {dec}) AS {dec})"
            f" div CAST({n_expr} * {n_expr} * ({n_expr} - 1) AS {dec})"
        ),
    ).otherwise(F.lit(0).cast(dec))
    r_term = F.expr(
        f"CAST(CAST(__a AS {dec}) * __d * CAST({int(scale)} AS {dec})"
        f" AS {dec}) div {n_expr}"
    )
    s_term = F.expr(
        f"CAST(CAST(__b AS {dec}) * __c * CAST({int(scale)} AS {dec})"
        f" AS {dec}) div {n_expr}"
    )
    agg = cells.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.coalesce(F.sum("__a"), F.lit(0)).cast("bigint").alias("sum_a"),
        F.coalesce(F.sum(e_term), F.lit(0).cast(dec))
        .cast("bigint")
        .alias("e_x1e9"),
        F.coalesce(F.sum(v_term), F.lit(0).cast(dec))
        .cast("bigint")
        .alias("var_x1e9"),
        F.coalesce(F.sum(r_term), F.lit(0).cast(dec))
        .cast("bigint")
        .alias("__r9"),
        F.coalesce(F.sum(s_term), F.lit(0).cast(dec))
        .cast("bigint")
        .alias("__s9"),
    )
    num = (
        F.col("sum_a").cast("double")
        - F.col("e_x1e9").cast("double") / F.lit(1.0e9)
    )
    chi2 = num * num / (F.col("var_x1e9").cast("double") / F.lit(1.0e9))
    return agg.select(
        "n_strata",
        "sum_a",
        "e_x1e9",
        "var_x1e9",
        F.when(F.col("var_x1e9") <= 0, F.lit(None).cast("bigint"))
        .otherwise(
            F.floor(chi2 * F.lit(1_000_000.0) + F.lit(0.5)).cast("bigint")
        )
        .alias("cmh_chi2_x1e6"),
        F.when(F.col("__s9") <= 0, F.lit(None).cast("bigint"))
        .otherwise(
            F.floor(
                F.col("__r9").cast("double")
                / F.col("__s9").cast("double")
                * F.lit(1_000_000.0)
                + F.lit(0.5)
            ).cast("bigint")
        )
        .alias("mh_or_x1e6"),
    )


def cronbach_alpha(
    df: DataFrame,
    item_cols,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Cronbach's alpha internal-consistency reliability (Cronbach,
    Psychometrika 1951) over k integer-valued item columns — the
    agreement family's reliability member (q257 Cohen, q298 Cochran Q,
    q339 Fleiss): do the k quality screens measure ONE underlying
    construct?

    Exact-arithmetic derivation (population variances; n subjects,
    S_i = sum item_i, Q_i = sum item_i^2, A = sum total, B = sum
    total^2):

        ``V = sum_i (n*Q_i - S_i^2)``      (n^2 x summed item variances)
        ``T = n*B - A^2``                  (n^2 x total-score variance)
        ``alpha = k/(k-1) * (1 - V/T)``

    V and T are exact decimal(38,0) integers (the shared n^2 factor
    cancels), and alpha is ONE mirrored IEEE tree over the two
    published BIGINTs — floor-published x1e6, NULL when T <= 0 (no
    total-score variance: reliability undefined).

    Scale posture: ONE map-side-combined global aggregate; 2k+3 sums.

    Output: ONE row — ``n_subjects, n_items, items_var_num,
    total_var_num, alpha_x1e6``.
    """
    items = list(item_cols)
    k = len(items)
    if k < 2:
        raise ValueError(f"need >= 2 items, got {k}")
    dec = "decimal(38,0)"
    cols = [F.col(c).cast("bigint").alias(f"__i{ix}") for ix, c in enumerate(items)]
    base = df.select(*cols)
    for ix in range(k):
        base = base.filter(F.col(f"__i{ix}").isNotNull())
    tot = sum(F.col(f"__i{ix}").cast(dec) for ix in range(k))
    aggs = [F.count(F.lit(1)).cast(dec).alias("__n")]
    for ix in range(k):
        c = F.col(f"__i{ix}").cast(dec)
        aggs.append(F.sum(c).cast(dec).alias(f"__s{ix}"))
        aggs.append(F.sum(c * c).cast(dec).alias(f"__q{ix}"))
    aggs.append(F.sum(tot).cast(dec).alias("__a"))
    aggs.append(F.sum(tot * tot).cast(dec).alias("__b"))
    agg = base.agg(*aggs)
    v = sum(
        (
            F.col("__n") * F.col(f"__q{ix}")
            - F.col(f"__s{ix}") * F.col(f"__s{ix}")
        ).cast(dec)
        for ix in range(k)
    )
    t = (F.col("__n") * F.col("__b") - F.col("__a") * F.col("__a")).cast(dec)
    staged = agg.select(
        F.col("__n").cast("bigint").alias("n_subjects"),
        F.lit(k).cast("bigint").alias("n_items"),
        v.cast("bigint").alias("items_var_num"),
        t.cast("bigint").alias("total_var_num"),
    )
    alpha = (
        F.lit(float(k))
        / F.lit(float(k - 1))
        * (
            F.lit(1.0)
            - F.col("items_var_num").cast("double")
            / F.col("total_var_num").cast("double")
        )
    )
    return staged.select(
        "n_subjects",
        "n_items",
        "items_var_num",
        "total_var_num",
        F.when(
            F.col("total_var_num") <= 0, F.lit(None).cast("bigint")
        )
        .otherwise(
            F.floor(alpha * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
        )
        .alias("alpha_x1e6"),
    )


def hosmer_lemeshow(
    df: DataFrame,
    bin_col: str,
    y_col: str,
    arm_col: str,
    *,
    train_arm: int = 0,
    scale: int = 1_000_000,
) -> DataFrame:
    """Hosmer-Lemeshow calibration goodness-of-fit (Hosmer & Lemeshow,
    Comm. Stat. 1980) over pre-assigned probability bins — the
    INFERENTIAL companion to q275's ECE/Brier readout on the same
    train/test-arm histogram calibrator: is the test arm's observed
    event count consistent with the train arm's per-bin rates?

    Exact-arithmetic derivation: with per-bin integer counts
    (train: k_tr of n_tr, test: O = k_te of n) and the train rate as
    the prediction, the textbook term (O - E)^2 / (E (1 - E/n)) with
    E = n*k_tr/n_tr collapses to the exact rational

        ``term = (O*n_tr - n*k_tr)^2 / (n * k_tr * (n_tr - k_tr))``

    — numerator and denominator exact decimal(38,0) integers, floored
    per bin onto the x1e6 lattice (q292 discipline), summed exactly, so
    the statistic is BIGINT end-to-end with NO IEEE anywhere. Bins
    whose train rate is degenerate (k_tr = 0 or k_tr = n_tr, infinite
    term) or that lack train/test mass are EXCLUDED FROM THE SUM but
    COUNTED OUT LOUD (``n_bins_degenerate``) — the distributed-honesty
    alternative to the textbook's silent bin merging. dof = scored
    bins - 2 by HL convention.

    Scale posture: ONE map-side-combined groupBy(bin) then bin-count
    arithmetic.

    Output: ONE row — ``n_bins_scored, n_bins_degenerate, dof,
    hl_x1e6`` (NULL when no bin is scorable).
    """
    dec = "decimal(38,0)"
    cells = (
        df.select(
            F.col(bin_col).alias("__b"),
            F.col(y_col).cast("bigint").alias("__y"),
            F.col(arm_col).cast("bigint").alias("__arm"),
        )
        .filter(
            F.col("__b").isNotNull()
            & F.col("__y").isNotNull()
            & F.col("__arm").isNotNull()
        )
        .groupBy("__b")
        .agg(
            F.sum(F.when(F.col("__arm") == train_arm, 1).otherwise(0))
            .cast("bigint")
            .alias("__ntr"),
            F.sum(
                F.when(F.col("__arm") == train_arm, F.col("__y")).otherwise(0)
            )
            .cast("bigint")
            .alias("__ktr"),
            F.sum(F.when(F.col("__arm") != train_arm, 1).otherwise(0))
            .cast("bigint")
            .alias("__n"),
            F.sum(
                F.when(F.col("__arm") != train_arm, F.col("__y")).otherwise(0)
            )
            .cast("bigint")
            .alias("__o"),
        )
    )
    scorable = (
        (F.col("__n") > 0)
        & (F.col("__ktr") > 0)
        & (F.col("__ktr") < F.col("__ntr"))
    )
    term = F.expr(
        f"CAST((CAST(__o AS {dec}) * __ntr - CAST(__n AS {dec}) * __ktr)"
        f" * (CAST(__o AS {dec}) * __ntr - CAST(__n AS {dec}) * __ktr)"
        f" * CAST({int(scale)} AS {dec}) AS {dec})"
        f" div CAST(CAST(__n AS {dec}) * __ktr * (CAST(__ntr AS {dec})"
        f" - __ktr) AS {dec})"
    )
    agg = cells.agg(
        F.coalesce(F.sum(F.when(scorable, 1).otherwise(0)), F.lit(0))
        .cast("bigint")
        .alias("n_bins_scored"),
        F.coalesce(F.sum(F.when(~scorable, 1).otherwise(0)), F.lit(0))
        .cast("bigint")
        .alias("n_bins_degenerate"),
        F.sum(F.when(scorable, term)).cast("bigint").alias("__hl"),
    )
    return agg.select(
        "n_bins_scored",
        "n_bins_degenerate",
        F.greatest(F.col("n_bins_scored") - 2, F.lit(0))
        .cast("bigint")
        .alias("dof"),
        F.when(F.col("n_bins_scored") <= 0, F.lit(None).cast("bigint"))
        .otherwise(F.col("__hl"))
        .alias("hl_x1e6"),
    )


def info_gain_ranking(
    df: DataFrame,
    target: Column,
    features: "dict[str, Column]",
    *,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Filter-style feature ranking against a binary target: information
    gain (entropy reduction; Quinlan, Mach. Learn. 1986) and Gini-impurity
    reduction (Breiman et al., CART 1984) per categorical feature — which
    columns are worth splitting/stratifying on before any model is fit.

        ``IG(f)  = H(Y) - sum_v (n_v/N) * H(Y | f=v)``
        ``GG(f)  = G(Y) - sum_v (n_v/N) * G(Y | f=v)``

    Determinism: all counts are exact; Gini terms are exact integer
    divisions ``(n_v^2 - pos_v^2 - neg_v^2) * 1e9 div n_v`` summed as
    integers (G(Y) itself is one rational); entropy terms fix each
    ``(n_v/N) * H(Y|v)`` on the 1e9 round-9-ln lattice before the
    integer sum (the q274 mutual-information discipline).  Zero-count
    branches contribute 0 by the 0*ln(0) = 0 convention, guarded
    per-row.

    Scale posture: features stack into one (feature, value, y) frame —
    one explode, one groupBy over |features| x |levels| cells; no
    windows, no joins beyond the broadcast per-feature totals.

    Output: one row per feature — ``feature, n_levels,
    info_gain_x1e9, gini_gain_x1e9`` (NULL when the feature's rows are
    empty).
    """
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("feature"),
                        fcol.cast("string").alias("val"),
                    )
                    for name, fcol in features.items()
                ]
            )
        ).alias("__fv"),
        target.cast("boolean").alias("__y"),
    ).select(
        F.col("__fv.feature").alias("feature"),
        F.col("__fv.val").alias("__val"),
        "__y",
    ).filter(F.col("__val").isNotNull() & F.col("__y").isNotNull())
    cells = stacked.groupBy("feature", "__val").agg(
        F.count(F.lit(1)).cast("bigint").alias("__nv"),
        F.sum(F.when(F.col("__y"), 1).otherwise(0))
        .cast("bigint")
        .alias("__pv"),
    )
    tot = cells.groupBy("feature").agg(
        F.sum("__nv").cast("bigint").alias("__n"),
        F.sum("__pv").cast("bigint").alias("__p"),
        F.count(F.lit(1)).cast("bigint").alias("n_levels"),
    )
    j = cells.join(tot, "feature")
    nv = F.col("__nv").cast("double")
    n = F.col("__n").cast("double")
    pv = F.col("__pv").cast("double")
    qv = (F.col("__nv") - F.col("__pv")).cast("double")
    # H(Y|v) with 0*ln0 = 0, each branch's p*ln(p) on the round-9 lattice
    hterm = lambda num: F.when(  # noqa: E731
        (num > F.lit(0.0)) & (num < nv),
        -(num / nv) * F.round(F.log(num / nv), 9),
    ).otherwise(F.lit(0.0))
    ent_i = F.floor(
        (nv / n) * (hterm(pv) + hterm(qv)) * F.lit(1e9) + F.lit(0.5)
    ).cast("decimal(38,0)")
    gini_i = F.expr(
        "(CAST(__nv AS DECIMAL(38,0)) * __nv"
        " - CAST(__pv AS DECIMAL(38,0)) * __pv"
        " - CAST(__nv - __pv AS DECIMAL(38,0)) * (__nv - __pv))"
        " * 1000000000 div CAST(__nv AS DECIMAL(38,0))"
    ).cast("decimal(38,0)")
    per_f = j.groupBy("feature").agg(
        F.max("__n").alias("__n"),
        F.max("__p").alias("__p"),
        F.max("n_levels").cast("bigint").alias("n_levels"),
        F.coalesce(F.sum(ent_i), F.lit(0).cast("decimal(38,0)")).alias(
            "__hcond"
        ),
        F.coalesce(F.sum(gini_i), F.lit(0).cast("decimal(38,0)")).alias(
            "__gcond"
        ),
    )
    nn = F.col("__n").cast("double")
    pp = F.col("__p").cast("double")
    qq = (F.col("__n") - F.col("__p")).cast("double")
    hy_term = lambda num: F.when(  # noqa: E731
        (num > F.lit(0.0)) & (num < nn),
        -(num / nn) * F.round(F.log(num / nn), 9),
    ).otherwise(F.lit(0.0))
    h_y = hy_term(pp) + hy_term(qq)
    ig = h_y - F.col("__hcond").cast("double") / F.lit(1e9)
    g_y = (
        F.lit(1.0)
        - (pp / nn) * (pp / nn)
        - (qq / nn) * (qq / nn)
    )
    gg = g_y - F.col("__gcond").cast("double") / (F.lit(1e9) * nn)
    bad = F.col("__n") < 1
    pub = lambda c: F.when(  # noqa: E731
        bad, F.lit(None).cast("bigint")
    ).otherwise(F.floor(c * F.lit(float(scale)) + F.lit(0.5)).cast("bigint"))
    return per_f.select(
        "feature",
        "n_levels",
        pub(ig).alias("info_gain_x1e9"),
        pub(gg).alias("gini_gain_x1e9"),
    )


def youden_threshold(
    df: DataFrame,
    score_col: Column | str,
    label_col: Column | str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Youden's J optimal operating point (Youden, Cancer 1950) for a
    binary screen: the score threshold maximizing ``J = TPR - FPR`` —
    the decision-layer companion to q196's threshold-free AUC (AUC says
    whether the score separates; J says WHERE to cut it).

    With predict-positive = (score >= t) evaluated at every distinct
    score t: ``J(t) * P * N = N * TP(t) - P * FP(t)`` is an EXACT
    integer, so the argmax is exact integer comparison — ties break to
    the smallest threshold via a max over (J_num, -t) structs, no float
    boundary cases.  TP/FP cumulatives ride
    :func:`~.sampling.two_phase_running_sum` over the distinct-score
    table (descending via negated scores).

    Output: one row — ``n_pos, n_neg, best_threshold, j_x1e6`` (NULL
    when either class is empty).
    """
    s = (
        F.col(score_col) if isinstance(score_col, str) else score_col
    ).cast("bigint")
    y = (
        F.col(label_col) if isinstance(label_col, str) else label_col
    ).cast("boolean")
    base = df.select(s.alias("__s"), y.alias("__y")).filter(
        F.col("__s").isNotNull() & F.col("__y").isNotNull()
    )
    vals = base.groupBy("__s").agg(
        F.sum(F.when(F.col("__y"), 1).otherwise(0))
        .cast("bigint")
        .alias("__tp1"),
        F.sum(F.when(~F.col("__y"), 1).otherwise(0))
        .cast("bigint")
        .alias("__fp1"),
    ).withColumn("__neg", -F.col("__s"))
    run = two_phase_running_sum(
        vals,
        [],
        [F.asc("__neg")],
        F.col("__tp1"),
        F.expr("__neg div 65536"),
        out_col="__tp",
    )
    run = two_phase_running_sum(
        run,
        [],
        [F.asc("__neg")],
        F.col("__fp1"),
        F.expr("__neg div 65536"),
        out_col="__fp",
    )
    tot = vals.agg(
        F.sum("__tp1").cast("bigint").alias("__p"),
        F.sum("__fp1").cast("bigint").alias("__n"),
    )
    full = run.crossJoin(F.broadcast(tot))
    jnum = (
        F.col("__n").cast("decimal(38,0)") * F.col("__tp")
        - F.col("__p").cast("decimal(38,0)") * F.col("__fp")
    ).cast("decimal(38,0)")
    best = full.agg(
        F.max("__p").alias("n_pos"),
        F.max("__n").alias("n_neg"),
        F.max(
            F.struct(
                jnum.alias("j"), F.col("__neg").alias("negt")
            )
        ).alias("__best"),
    )
    j = F.col("__best.j").cast("double") / (
        F.col("n_pos").cast("double") * F.col("n_neg").cast("double")
    )
    bad = (
        F.col("n_pos").isNull()
        | F.col("n_neg").isNull()
        | (F.col("n_pos") < 1)
        | (F.col("n_neg") < 1)
    )
    return best.select(
        F.coalesce(F.col("n_pos"), F.lit(0)).cast("bigint").alias("n_pos"),
        F.coalesce(F.col("n_neg"), F.lit(0)).cast("bigint").alias("n_neg"),
        F.when(bad, F.lit(None).cast("bigint"))
        .otherwise((-F.col("__best.negt")).cast("bigint"))
        .alias("best_threshold"),
        F.when(bad, F.lit(None).cast("bigint"))
        .otherwise(
            F.floor(j * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
        )
        .alias("j_x1e6"),
    )


def stuart_maxwell(
    df: DataFrame,
    true_col: str,
    pred_col: str,
    cats: tuple[str, str, str],
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Stuart-Maxwell marginal-homogeneity test (Stuart, Biometrika 1955;
    Maxwell, Br J Psychiatry 1970) for a 3x3 paired confusion matrix:
    does the PREDICTED category distribution match the TRUE one — the
    k = 3 generalization of McNemar (q278) that catches a classifier
    systematically over-calling one class even when per-pair swaps
    balance. Rows where either side is outside ``cats`` are excluded
    (both engines identically).

    With marginal differences d_i = n_{i.} - n_{.i} for the first two
    categories and the H0 covariance built from exact cell counts
    (S_11 = n_{1.} + n_{.1} - 2 n_11, S_22 analogous,
    S_12 = -(n_12 + n_21)), the statistic is the closed 2x2 quadratic
    form

        ``chi2 = (d1^2 S22 - 2 d1 d2 S12 + d2^2 S11) / det(S)``

    — numerator and determinant are exact BIGINT, the publish is ONE
    IEEE division (chi^2 with 2 df under H0). NULL when det <= 0 (a
    degenerate margin) or no rows survive the category filter.

    Output: one row — ``n_obs, d1, d2, chi2_x1e6``.
    """
    c1, c2, c3 = cats
    t = F.col(true_col)
    p = F.col(pred_col)
    base = df.filter(t.isin(*cats) & p.isin(*cats))
    cell = lambda a, b: F.sum(  # noqa: E731
        F.when((t == a) & (p == b), 1).otherwise(0)
    ).cast("bigint")
    s = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        cell(c1, c1).alias("__n11"),
        cell(c1, c2).alias("__n12"),
        cell(c2, c1).alias("__n21"),
        cell(c2, c2).alias("__n22"),
        F.sum(F.when(t == c1, 1).otherwise(0)).cast("bigint").alias("__r1"),
        F.sum(F.when(t == c2, 1).otherwise(0)).cast("bigint").alias("__r2"),
        F.sum(F.when(p == c1, 1).otherwise(0)).cast("bigint").alias("__c1"),
        F.sum(F.when(p == c2, 1).otherwise(0)).cast("bigint").alias("__c2"),
    )
    d1 = F.col("__r1") - F.col("__c1")
    d2 = F.col("__r2") - F.col("__c2")
    s11 = F.col("__r1") + F.col("__c1") - 2 * F.col("__n11")
    s22 = F.col("__r2") + F.col("__c2") - 2 * F.col("__n22")
    s12 = -(F.col("__n12") + F.col("__n21"))
    det = s11 * s22 - s12 * s12
    num = d1 * d1 * s22 - 2 * d1 * d2 * s12 + d2 * d2 * s11
    bad = (F.col("n_obs") < 1) | (det <= 0)
    return s.select(
        "n_obs",
        F.when(bad, F.lit(None).cast("bigint")).otherwise(d1).alias("d1"),
        F.when(bad, F.lit(None).cast("bigint")).otherwise(d2).alias("d2"),
        F.when(bad, F.lit(None).cast("bigint"))
        .otherwise(
            F.floor(
                num.cast("double") / det.cast("double")
                * F.lit(float(scale))
                + F.lit(0.5)
            ).cast("bigint")
        )
        .alias("chi2_x1e6"),
    )
