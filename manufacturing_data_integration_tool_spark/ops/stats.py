"""Sequential / robust statistics as deterministic DataFrame compositions:
trailing EWMA, MAD outlier screens, and integer-exact CUSUM change
detection.

These are the monitoring primitives a large ingest pipeline runs next to
validation (SURVEY §2.3's zscore rule is the parametric cousin): a
z-score screen breaks down when the contamination it is hunting inflates
the mean/std it depends on, so production screens use the median/MAD
robust pair; drift on a metric stream is the CUSUM sequential test, not a
per-batch threshold.

Determinism is the design constraint throughout — every operator here
must hash-match a DuckDB oracle, so:

- EWMA weights are precomputed exact Python integers (``decay_num**j *
  decay_den**(depth-1-j)``), never ``pow()`` on doubles (``7**19`` already
  exceeds 2^53 — a float pow would round);
- values are snapped to a ``1/scale`` integer grid at the boundary and all
  accumulation happens in ``decimal``/exact-integer space (associative,
  so partial-aggregation order is irrelevant);
- CUSUM runs the closed form ``S_d = cum_d - min(0, prefix-min(cum))``
  over integer cumulative sums — the textbook ``max(0, S_{d-1} + y_d)``
  recursion is not window-expressible, but its prefix-min closed form is,
  and on integers it is exact on any engine.

Scale posture: MAD is two grouped aggregates plus one broadcast join
back (same two-pass shape as the zscore rule — no unpartitioned window);
EWMA is one per-key window over a bounded ``depth`` tail; CUSUM
aggregates the raw stream down to one row per (key, day) FIRST, so the
windows that follow run over day-count-sized partitions no matter how
many raw events a key has.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from ._materialize import materialize_once

__all__ = [
    "ewma_trailing",
    "oneway_anova_f",
    "welch_t_test",
    "bartlett_test",
    "g_test_independence",
    "jarque_bera",
    "seasonal_mann_kendall",
    "mad_outliers",
    "cusum_flags",
    "xbar_r_chart",
    "p_chart",
    "we_run_rules",
    "process_capability",
    "ewma_control_chart",
    "kmv_distinct",
    "bloom_build",
    "bloom_probe",
    "chisq_independence",
    "kmv_jaccard",
    "hdr_quantiles",
    "rolling_corr",
    "changepoint_cusum",
    "wilson_rate_ci",
    "mann_kendall_trend",
    "spearman_rho",
    "poisson_bootstrap_mean",
    "POISSON1_CUM",
    "ks_pairwise",
    "gini_coefficient",
    "trimmed_mean",
    "winsorized_mean",
    "cochran_armitage",
    "eb_shrunk_rates",
    "loglog_slope",
    "kruskal_wallis",
    "dunn_pairwise",
    "dunn_z_pub_sql",
    "brown_forsythe",
    "cliffs_delta_pairwise",
    "EWMA_CHART_LAMBDA",
    "EWMA_CHART_FACTOR",
    "XBAR_R_CONSTANTS",
    "D2_CONSTANTS",
]


def ewma_trailing(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    tiebreak_col: str,
    depth: int = 16,
    decay_num: int = 7,
    decay_den: int = 10,
    scale: int = 10_000,
    round_to: int = 6,
    sub_buckets: int = 16,
) -> DataFrame:
    """Per-key exponentially weighted average of the last ``depth``
    observations (most recent first), weights ``(decay_num/decay_den)**j``
    normalized over the rows actually present.

    The weight table is ``depth`` exact integers ``num^j * den^(depth-1-j)``
    built driver-side in Python int arithmetic and shipped as an array
    literal — ``element_at(weights, rn)`` — so both Spark and any SQL
    oracle index the same constants. Values snap to the ``1/scale`` grid;
    weight*value products and both sums run in ``decimal`` (exact), and
    only the final ratio touches floating point, as one fixed expression.

    The "latest ``depth`` rows" selection is a per-key top-k, and a bare
    ``row_number`` window would sort a key's ENTIRE history in one task —
    the single-task-sort scale-killer. With ``sub_buckets > 1`` the
    selection runs TWO-PHASE (the q137/q164 sub-bucket pattern): rank
    within (key, hash-bucket) first — ``sub_buckets``-way parallel, and
    every global top-``depth`` row is necessarily in its bucket's
    top-``depth`` — then the final ranking window sees at most
    ``depth * sub_buckets`` rows per key, never the history.

    Output: ``(key_col, n_used, ewma)``.
    """
    if depth < 1 or depth > 32:
        raise ValueError("depth must be in [1, 32] (exact-integer weights)")
    weights = [decay_num**j * decay_den ** (depth - 1 - j) for j in range(depth)]
    if max(weights) >= 10**18:
        raise ValueError("weight table overflows 18 digits; lower depth/decay_den")
    w_arr = F.array(*[F.lit(w).cast("decimal(20,0)") for w in weights])
    # decimal(18,0), not (12,0): with the default scale=10_000 a (12,0)
    # quantized value overflows (-> non-ANSI NULL, silently skewing the
    # weighted sum) at |value| >= 10^8; 18 digits represent |value| up to
    # 10^14 at that scale. w*x products then peak < 10^36 and a depth-32
    # sum < 10^38 — inside decimal(38,0). Values past 18 digits would
    # STILL cast to NULL non-ANSI and silently skew the weighted sum, so
    # the quantizer raises loudly first — mirroring the weight-table
    # ValueError above rather than repeating the (12,0) failure mode one
    # magnitude up. NULL values pass through as NULL (when(NULL) takes
    # the otherwise branch); Spark orders NaN above every double, so NaN
    # trips the guard too.
    overflow_limit = (10.0**18 - 1.0) / scale
    v = F.col(value_col).cast("double")
    xq = (
        F.when(
            F.abs(v) >= F.lit(overflow_limit),
            F.raise_error(
                F.concat(
                    F.lit(
                        f"ewma_trailing: |{value_col}| * scale={scale} overflows "
                        "decimal(18,0) (the quantized sum would silently NULL); "
                        "lower scale or pre-filter. value="
                    ),
                    F.col(value_col).cast("string"),
                )
            ).cast("double"),
        )
        .otherwise(F.floor(v * scale + F.lit(0.5)))
        .cast("decimal(18,0)")
    )
    pruned = df.select(
        F.col(key_col), F.col(ts_col), F.col(tiebreak_col), xq.alias("__xq")
    )
    if sub_buckets > 1:
        pre = F.row_number().over(
            Window.partitionBy(
                key_col,
                F.pmod(F.xxhash64(F.col(tiebreak_col)), F.lit(sub_buckets)),
            ).orderBy(F.col(ts_col).desc(), F.col(tiebreak_col).desc())
        )
        pruned = (
            pruned.withColumn("__pre", pre)
            .filter(F.col("__pre") <= depth)
            .drop("__pre")
        )
    rn = F.row_number().over(
        Window.partitionBy(key_col).orderBy(
            F.col(ts_col).desc(), F.col(tiebreak_col).desc()
        )
    )
    tail = (
        pruned.withColumn("__rn", rn)
        .filter(F.col("__rn") <= depth)
        .select(
            F.col(key_col),
            F.element_at(w_arr, F.col("__rn")).alias("__w"),
            "__xq",
        )
    )
    return tail.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_used"),
        F.round(
            F.sum(F.col("__w") * F.col("__xq")).cast("double")
            / F.sum("__w").cast("double")
            / F.lit(float(scale)),
            round_to,
        ).alias("ewma"),
    )


def mad_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    scale: int = 100,
    n_sigmas: float = 3.0,
    consistency: float = 1.4826,
    round_to: int = 4,
) -> DataFrame:
    """Median/MAD robust outlier screen per group: a value is an outlier
    when ``|x - median| > n_sigmas * consistency * MAD`` (1.4826 rescales
    MAD to a normal-equivalent sigma).

    Unlike the zscore rule (plans/dataset_rules.py), a single 1e9 junk
    value cannot drag the screen's center or width — the breakdown point
    is 50 %. Values snap to the ``1/scale`` integer grid; the exact
    ``percentile`` aggregate interpolates ``(a+b)/2`` on integers, which
    every engine's ``quantile_cont`` reproduces bit-identically.

    Two grouped aggregates (median, then median of absolute deviations)
    and one broadcast join back — the same two-pass no-global-window shape
    as the zscore rule, so a hot group costs two combiner-friendly
    shuffles, never a single-task sort.

    Output: one row per group —
    ``(group_cols..., n, median_v, mad_v, n_outliers)`` in original value
    units.
    """
    gcols = [F.col(c) for c in group_cols]
    vq = F.floor(F.col(value_col).cast("double") * scale + F.lit(0.5)).cast("bigint")
    base = df.select(*gcols, vq.alias("__vq"))
    med = base.groupBy(*group_cols).agg(
        F.expr("percentile(__vq, 0.5)").alias("__med"),
        F.count(F.lit(1)).alias("n"),
    )
    dev = base.join(F.broadcast(med), list(group_cols)).withColumn(
        "__dev", F.abs(F.col("__vq") - F.col("__med"))
    )
    mad = dev.groupBy(*group_cols).agg(
        F.expr("percentile(__dev, 0.5)").alias("__mad")
    )
    cut = F.lit(float(n_sigmas)) * F.lit(float(consistency)) * F.col("__mad")
    return (
        dev.join(F.broadcast(mad), list(group_cols))
        .groupBy(*group_cols)
        .agg(
            F.max("n").alias("n"),
            F.round(F.max("__med") / scale, round_to).alias("median_v"),
            F.round(F.max("__mad") / scale, round_to).alias("mad_v"),
            F.sum(F.when(F.col("__dev") > cut, 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


def cusum_flags(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    scale: int = 10_000,
    slack: float = 0.0,
    threshold: float = 1.0,
    round_to: int = 4,
) -> DataFrame:
    """Two-sided CUSUM drift detection on a per-(key, day) mean series.

    Page's recursion ``S_d = max(0, S_{d-1} + (x_d - mu - k))`` has the
    window-expressible closed form ``S_d = cum_d - min(0, min_{i<=d}
    cum_i)`` over the cumulative sum of centered deviations — this runs
    that form ENTIRELY in exact integer units:

    1. aggregate raw events to one quantized daily mean ``m_d`` per key
       (exact decimal sum of grid-snapped values, one deterministic double
       division, one floor back to the grid);
    2. center by the key's own series mean WITHOUT dividing — multiply
       through by the day count ``D`` so the deviation ``y_d = D*m_d -
       sum(m) -/+ D*k`` stays an exact bigint;
    3. integer cumulative-sum + prefix-min windows give ``S+``/``S-``; a
       day flags when either exceeds ``D * threshold * scale`` (the same
       D-scaling, so the comparison is exact too).

    The raw stream collapses at step 1 via one combiner-friendly groupBy —
    the windows after it see day-count-sized partitions per key, so a key
    with 10^9 events costs the same window work as one with 10^3.

    Output: one row per (key, day) —
    ``(key_col, day, m, s_pos, s_neg, flagged)`` with ``s_pos``/``s_neg``
    reported in original value units.
    """
    k_units = int(round(slack * scale))
    h_units = int(round(threshold * scale))
    vq = F.floor(F.col(value_col).cast("double") * scale + F.lit(0.5)).cast("bigint")
    daily = (
        df.select(
            F.col(key_col),
            F.to_date(F.col(ts_col)).alias("day"),
            vq.alias("__vq"),
        )
        .groupBy(key_col, "day")
        .agg(
            F.floor(
                F.sum(F.col("__vq").cast("decimal(38,0)")).cast("double")
                / F.count(F.lit(1)).cast("double")
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("__m")
        )
    )
    st = daily.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("__d"), F.sum("__m").alias("__sm")
    )
    y = daily.join(F.broadcast(st), key_col).select(
        F.col(key_col),
        "day",
        "__m",
        "__d",
        (F.col("__d") * F.col("__m") - F.col("__sm") - F.col("__d") * k_units)
        .alias("__yp"),
        (F.col("__sm") - F.col("__d") * F.col("__m") - F.col("__d") * k_units)
        .alias("__yn"),
    )
    wcum = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # prefix-min INCLUDES the current row (cum_0 = 0 is the LEAST(0, .)):
    # S_d = cum_d - min(0, min_{i<=d} cum_i) — dropping the current row
    # from the frame lets S_d go negative when cum_d is itself the min,
    # which the max(0, .) recursion never does.
    wmin = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = y.select(
        F.col(key_col),
        "day",
        "__m",
        "__d",
        F.sum("__yp").over(wcum).alias("__cp"),
        F.sum("__yn").over(wcum).alias("__cn"),
    )
    s = c.select(
        F.col(key_col),
        "day",
        "__m",
        "__d",
        (
            F.col("__cp")
            - F.least(F.lit(0).cast("bigint"), F.min("__cp").over(wmin))
        ).alias("__sp"),
        (
            F.col("__cn")
            - F.least(F.lit(0).cast("bigint"), F.min("__cn").over(wmin))
        ).alias("__sn"),
    )
    denom = F.col("__d").cast("double") * F.lit(float(scale))
    return s.select(
        F.col(key_col),
        "day",
        F.round(F.col("__m") / F.lit(float(scale)), round_to).alias("m"),
        F.round(F.col("__sp") / denom, round_to).alias("s_pos"),
        F.round(F.col("__sn") / denom, round_to).alias("s_neg"),
        (
            (F.col("__sp") > F.col("__d") * h_units)
            | (F.col("__sn") > F.col("__d") * h_units)
        ).alias("flagged"),
    )


# Shewhart X-bar/R control-chart constants (ASTM E2587 / standard SPC
# tables) for subgroup sizes 2..10: A2 (X-bar limits from R-bar), D3/D4
# (R limits). Literals, so any SQL oracle reuses the exact same numbers.
XBAR_R_CONSTANTS = {
    2: (1.880, 0.0, 3.267),
    3: (1.023, 0.0, 2.574),
    4: (0.729, 0.0, 2.282),
    5: (0.577, 0.0, 2.114),
    6: (0.483, 0.0, 2.004),
    7: (0.419, 0.076, 1.924),
    8: (0.373, 0.136, 1.864),
    9: (0.337, 0.184, 1.816),
    10: (0.308, 0.223, 1.777),
}


def xbar_r_chart(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    tiebreak_col: str,
    n: int = 5,
    scale: int = 100,
    round_to: int = 4,
    sub_buckets: int = 16,
) -> DataFrame:
    """Shewhart X-bar/R control chart per key over daily rational
    subgroups — THE statistical-process-control primitive for
    manufacturing quality data (the domain the reference tool feeds):
    sample the first ``n`` readings of each (key, day), chart each
    subgroup's mean and range against 3-sigma limits derived from the
    key's average range (``A2/D3/D4`` constants, standard SPC tables).

    Determinism/scale posture mirrors the EWMA operator:

    - the "first n per (key, day)" selection is the same lossless
      TWO-PHASE top-k (pre-rank inside (key, day, hash-bucket), then a
      final window over <= n * sub_buckets rows) — no task ever sorts a
      full day's readings for a hot key;
    - values snap to the ``1/scale`` grid, so subgroup sums and ranges
      are exact integers; every division is a fixed IEEE expression on
      exact operands; the A2/D3/D4 multipliers are shared literals.

    Subgroups with fewer than ``n`` readings are dropped (standard
    practice — partial subgroups bias R-bar downward).

    Output: one row per complete (key, day) subgroup —
    ``(key_col, day, xbar, r, xbarbar, rbar, ucl_x, lcl_x, ucl_r, lcl_r,
    out_of_control)``.
    """
    if n not in XBAR_R_CONSTANTS:
        raise ValueError(f"subgroup size must be in {sorted(XBAR_R_CONSTANTS)}")
    a2, d3, d4 = XBAR_R_CONSTANTS[n]
    vq = F.floor(F.col(value_col).cast("double") * scale + F.lit(0.5)).cast("bigint")
    base = df.select(
        F.col(key_col),
        F.to_date(F.col(ts_col)).alias("day"),
        F.col(ts_col),
        F.col(tiebreak_col),
        vq.alias("__vq"),
    )
    if sub_buckets > 1:
        pre = F.row_number().over(
            Window.partitionBy(
                key_col,
                "day",
                F.pmod(F.xxhash64(F.col(tiebreak_col)), F.lit(sub_buckets)),
            ).orderBy(F.col(ts_col).asc(), F.col(tiebreak_col).asc())
        )
        base = base.withColumn("__pre", pre).filter(F.col("__pre") <= n).drop("__pre")
    rn = F.row_number().over(
        Window.partitionBy(key_col, "day").orderBy(
            F.col(ts_col).asc(), F.col(tiebreak_col).asc()
        )
    )
    sub = (
        base.withColumn("__rn", rn)
        .filter(F.col("__rn") <= n)
        .groupBy(key_col, "day")
        .agg(
            F.count(F.lit(1)).alias("__cnt"),
            F.sum("__vq").alias("__s"),
            (F.max("__vq") - F.min("__vq")).alias("__r"),
        )
        .filter(F.col("__cnt") == n)
    )
    per_key = sub.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("__d"),
        F.sum("__s").alias("__ss"),
        F.sum("__r").alias("__sr"),
    )
    j = sub.join(F.broadcast(per_key), key_col)
    xbar = F.col("__s").cast("double") / F.lit(float(n * scale))
    rr = F.col("__r").cast("double") / F.lit(float(scale))
    xbarbar = F.col("__ss").cast("double") / (
        F.col("__d").cast("double") * F.lit(float(n * scale))
    )
    rbar = F.col("__sr").cast("double") / (
        F.col("__d").cast("double") * F.lit(float(scale))
    )
    ucl_x = xbarbar + F.lit(a2) * rbar
    lcl_x = xbarbar - F.lit(a2) * rbar
    ucl_r = F.lit(d4) * rbar
    lcl_r = F.lit(d3) * rbar
    return j.select(
        F.col(key_col),
        "day",
        F.round(xbar, round_to).alias("xbar"),
        F.round(rr, round_to).alias("r"),
        F.round(xbarbar, round_to).alias("xbarbar"),
        F.round(rbar, round_to).alias("rbar"),
        F.round(ucl_x, round_to).alias("ucl_x"),
        F.round(lcl_x, round_to).alias("lcl_x"),
        F.round(ucl_r, round_to).alias("ucl_r"),
        F.round(lcl_r, round_to).alias("lcl_r"),
        (
            (xbar > ucl_x) | (xbar < lcl_x) | (rr > ucl_r) | (rr < lcl_r)
        ).alias("out_of_control"),
    )


def p_chart(
    df: DataFrame,
    group_col: str,
    flag_col: str,
    *,
    n_sigmas: float = 3.0,
    round_to: int = 6,
) -> DataFrame:
    """Attribute (p) control chart: per-group defective PROPORTION
    charted against binomial 3-sigma limits around the overall rate —
    ``pbar +- n_sigmas * sqrt(pbar*(1-pbar)/n)``, with per-group ``n``
    (variable-width limits, the standard p-chart treatment for unequal
    subgroup sizes; LCL floors at 0).

    ``flag_col`` is any boolean defect indicator — here typically "row
    failed validation", which makes this the SPC view OVER the
    validation engine: is today's failure rate in statistical control,
    or did the upstream process shift?

    One combiner-friendly groupBy + a 1-row overall-rate broadcast; all
    counts are exact integers, every derived number is one fixed IEEE
    expression over them (sqrt is correctly rounded, so engines agree).

    Output: ``(group_col, n, defects, p, pbar, ucl, lcl,
    out_of_control)``.
    """
    daily = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(flag_col).cast("int")).cast("bigint").alias("defects"),
    )
    tot = daily.agg(
        F.sum("n").alias("__nn"), F.sum("defects").alias("__dd")
    )
    j = daily.crossJoin(F.broadcast(tot))
    p_u = F.col("defects").cast("double") / F.col("n").cast("double")
    pbar_u = F.col("__dd").cast("double") / F.col("__nn").cast("double")
    se_u = F.sqrt(pbar_u * (F.lit(1.0) - pbar_u) / F.col("n").cast("double"))
    ucl_u = pbar_u + F.lit(float(n_sigmas)) * se_u
    lcl_u = F.greatest(F.lit(0.0), pbar_u - F.lit(float(n_sigmas)) * se_u)
    return j.select(
        F.col(group_col),
        "n",
        "defects",
        F.round(p_u, round_to).alias("p"),
        F.round(pbar_u, round_to).alias("pbar"),
        F.round(ucl_u, round_to).alias("ucl"),
        F.round(lcl_u, round_to).alias("lcl"),
        ((p_u > ucl_u) | (p_u < lcl_u)).alias("out_of_control"),
    )


# Hartley's d2 (mean-range-to-sigma) constants for subgroup sizes 2..10,
# standard SPC tables — sigma_hat = R-bar / d2.
D2_CONSTANTS = {
    2: 1.128, 3: 1.693, 4: 2.059, 5: 2.326,
    6: 2.534, 7: 2.704, 8: 2.847, 9: 2.970, 10: 3.078,
}


def we_run_rules(
    chart: DataFrame,
    key_col: str,
    *,
    order_col: str = "day",
    round_to: int = 4,
) -> DataFrame:
    """Western Electric run rules over an X-bar chart's subgroup series
    (input = ``xbar_r_chart`` output): the patterns that flag a process
    drifting while every point is still inside the 3-sigma limits.

    - rule1: point beyond 3 sigma (the chart's own ``out_of_control``);
    - rule2: 2 of the last 3 points beyond 2 sigma on the SAME side;
    - rule4: 8 consecutive points on the same side of the center line.

    ``sigma_xbar`` is recovered as ``(ucl_x - xbarbar) / 3`` — the A2
    identity — so the rules run on exactly the numbers the chart
    published. All windows are per-key, ordered by ``order_col``, with
    bounded ROWS frames (8 at most): one hash shuffle, subgroup-count
    partitions. Side/zone tests compare deterministic doubles, so the
    flags hash-match a SQL oracle.

    Output: the full chart row — ``(key, order, xbar, r, xbarbar, rbar,
    ucl_x, lcl_x, ucl_r, lcl_r)`` — plus ``(side, beyond_2s, rule1,
    rule2, rule4)``; consumers plotting rule hits against the limits
    need both halves.
    """
    sigma = (F.col("ucl_x") - F.col("xbarbar")) / F.lit(3.0)
    side = F.when(F.col("xbar") > F.col("xbarbar"), F.lit(1)).otherwise(
        F.when(F.col("xbar") < F.col("xbarbar"), F.lit(-1)).otherwise(F.lit(0))
    )
    beyond2 = (
        F.abs(F.col("xbar") - F.col("xbarbar")) > F.lit(2.0) * sigma
    ).cast("int")
    w3 = (
        Window.partitionBy(key_col).orderBy(order_col).rowsBetween(-2, 0)
    )
    w8 = (
        Window.partitionBy(key_col).orderBy(order_col).rowsBetween(-7, 0)
    )
    step = chart.withColumn("side", side).withColumn("__b2", beyond2)
    rule2 = (
        (F.sum(F.when(F.col("side") > 0, F.col("__b2")).otherwise(0)).over(w3)
         >= 2)
        | (F.sum(F.when(F.col("side") < 0, F.col("__b2")).otherwise(0)).over(w3)
           >= 2)
    ) & (F.count(F.lit(1)).over(w3) == 3)
    rule4 = (
        (F.abs(F.sum("side").over(w8)) == 8)
        & (F.count(F.lit(1)).over(w8) == 8)
    )
    return step.select(
        F.col(key_col),
        F.col(order_col),
        "xbar",
        "r",
        "xbarbar",
        "rbar",
        "ucl_x",
        "lcl_x",
        "ucl_r",
        "lcl_r",
        "side",
        F.col("__b2").cast("boolean").alias("beyond_2s"),
        F.col("out_of_control").alias("rule1"),
        rule2.alias("rule2"),
        rule4.alias("rule4"),
    )


def process_capability(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    tiebreak_col: str,
    lsl: float,
    usl: float,
    n: int = 5,
    scale: int = 100,
    round_to: int = 4,
    sub_buckets: int = 16,
) -> DataFrame:
    """Process capability Cp / Cpk per key from the X-bar/R machinery:
    ``sigma_hat = R-bar / d2(n)`` (within-subgroup estimate, the
    standard short-term capability sigma), ``Cp = (USL-LSL)/(6*sigma)``,
    ``Cpk = min(USL - xbarbar, xbarbar - LSL) / (3*sigma)``.

    Rides ``xbar_r_chart`` unchanged (same two-phase subgroup sampling,
    same exact integer sums), then one per-key aggregate; spec limits
    and ``d2`` are literals shared with any oracle.

    Output: ``(key_col, n_subgroups, xbarbar, sigma_hat, cp, cpk)``.
    """
    if n not in D2_CONSTANTS:
        raise ValueError(f"subgroup size must be in {sorted(D2_CONSTANTS)}")
    d2 = D2_CONSTANTS[n]
    chart = xbar_r_chart(
        df,
        key_col,
        ts_col,
        value_col,
        tiebreak_col=tiebreak_col,
        n=n,
        scale=scale,
        round_to=9,
        sub_buckets=sub_buckets,
    )
    per_key = chart.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_subgroups"),
        F.max("xbarbar").alias("__xbb"),
        F.max("rbar").alias("__rb"),
    )
    sigma = F.col("__rb") / F.lit(d2)
    cp = (F.lit(float(usl)) - F.lit(float(lsl))) / (F.lit(6.0) * sigma)
    cpk = F.least(
        F.lit(float(usl)) - F.col("__xbb"), F.col("__xbb") - F.lit(float(lsl))
    ) / (F.lit(3.0) * sigma)
    return per_key.select(
        F.col(key_col),
        "n_subgroups",
        F.round(F.col("__xbb"), round_to).alias("xbarbar"),
        F.round(sigma, round_to).alias("sigma_hat"),
        F.round(cp, round_to).alias("cp"),
        F.round(cpk, round_to).alias("cpk"),
    )


# EWMA chart limit width sqrt(lambda/(2-lambda)) for the asymptotic
# (steady-state) limits, precomputed for the default lambda=0.25 so BOTH
# engines use the identical double literal — no runtime sqrt whose last
# ulp could differ between libm builds (same discipline as the A2/D2
# literal tables above).
EWMA_CHART_LAMBDA = 0.25  # lambda AND 1-lambda are exact binary doubles
EWMA_CHART_FACTOR = 0.3779644730092272  # sqrt(0.25 / 1.75)


def ewma_control_chart(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    lam: float = EWMA_CHART_LAMBDA,
    limit_factor: float = EWMA_CHART_FACTOR,
    n_sigmas: float = 3.0,
    round_to: int = 4,
) -> DataFrame:
    """EWMA control chart (Roberts 1959; Montgomery SPC ch. 9) over the
    per-(key, day) mean series: ``z_i = lam*x_i + (1-lam)*z_{i-1}``,
    ``z_1 = x_1``, flagged against asymptotic limits ``center +/-
    n_sigmas * sigma_hat * sqrt(lam/(2-lam))`` — the drift detector that
    beats Shewhart charts on small sustained shifts.

    Determinism discipline (what makes this hash-match a SQL oracle):

    * day means quantize to an exact 1e-6 grid — ``xq = floor(sum_cents *
      10000.0 / cnt + 0.5)`` — so the cross-row aggregates (grand mean,
      moving-range sum via an integer fold over the sorted day array)
      accumulate BIGINTs, immune to float summation order;
    * the EWMA recursion runs as one left-to-right ``F.aggregate`` fold
      in doubles with ``lam`` = 0.25 (both lam and 1-lam exact binary),
      the identical op sequence any engine's left fold produces;
    * ``sqrt(lam/(2-lam))`` enters as the shared literal
      ``limit_factor`` — no runtime sqrt;
    * the out-of-control flag compares ROUNDED z against ROUNDED limits,
      so both engines test exactly the published numbers (q184-q187's
      rule).

    sigma_hat is the individuals-chart estimate MR-bar/1.128. Keys with
    a single day are dropped (no moving range).

    100 TB posture: the raw stream collapses to (key, day) FIRST (one
    map-side-combined shuffle); the per-key sorted array and fold then
    touch day-count-sized data — a year is 365 elements however many
    raw events exist. Output: ``(key, day, x, z, center, ucl, lcl,
    out_of_control)``.
    """
    lam = float(lam)
    one_m = 1.0 - lam
    day = F.to_date(F.col(ts_col)).alias("day")
    cents = F.floor(F.col(value_col).cast("double") * 100 + F.lit(0.5)).cast("bigint")
    daily = (
        df.select(F.col(key_col), day, cents.alias("__c"))
        .groupBy(key_col, "day")
        .agg(F.count(F.lit(1)).alias("__cnt"), F.sum("__c").alias("__sc"))
        .select(
            F.col(key_col),
            "day",
            F.floor(F.col("__sc") * F.lit(10000.0) / F.col("__cnt") + F.lit(0.5))
            .cast("bigint")
            .alias("__xq"),
        )
    )
    per_key = daily.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__xq").alias("__sxq"),
        F.array_sort(
            F.collect_list(F.struct(F.col("day"), F.col("__xq")))
        ).alias("__pts"),
    ).filter(F.col("__n") >= 2)
    # moving-range sum as an exact integer fold over the sorted day array
    xs = F.transform(F.col("__pts"), lambda p: p["__xq"])
    mr_sum = F.aggregate(
        F.sequence(F.lit(2), F.col("__n").cast("int")),
        F.lit(0).cast("bigint"),
        lambda acc, i: acc
        + F.abs(
            F.element_at(xs, i.cast("int"))
            - F.element_at(xs, (i - 1).cast("int"))
        ),
    )
    # z sequence: left fold appending lam*x + (1-lam)*last(acc)
    zs = F.aggregate(
        F.slice(xs, 2, 1_000_000),
        F.array(F.element_at(xs, 1).cast("double") / F.lit(1e6)),
        lambda acc, v: F.concat(
            acc,
            F.array(
                F.lit(lam) * (v.cast("double") / F.lit(1e6))
                + F.lit(one_m) * F.element_at(acc, F.size(acc))
            ),
        ),
    )
    center = F.col("__sxq").cast("double") / F.col("__n").cast("double") / F.lit(1e6)
    sigma = (
        mr_sum.cast("double")
        / (F.col("__n") - 1).cast("double")
        / F.lit(1e6)
        / F.lit(1.128)
    )
    half = F.lit(float(n_sigmas)) * sigma * F.lit(float(limit_factor))
    # publish via floor(v*10^r + 0.5)/10^r, NOT each engine's native
    # round(): natives disagree on exact .5 boundaries (Spark rounds the
    # shortest decimal string HALF_UP, DuckDB rounds the true binary
    # value), and the 1e-6 quantization grid lands on .00005 boundaries
    # routinely. floor/mul/add are plain IEEE ops — identical inputs give
    # identical outputs on any engine.
    pw = float(10 ** round_to)

    def _pub(v):
        return F.floor(v * F.lit(pw) + F.lit(0.5)) / F.lit(pw)

    staged = per_key.select(
        F.col(key_col),
        F.col("__pts"),
        zs.alias("__zs"),
        _pub(center).alias("center"),
        _pub(center + half).alias("ucl"),
        _pub(center - half).alias("lcl"),
    )
    exploded = staged.select(
        F.col(key_col),
        "center",
        "ucl",
        "lcl",
        F.posexplode(F.col("__pts")).alias("__i", "__p"),
        F.col("__zs"),
    )
    z_r = _pub(F.element_at(F.col("__zs"), F.col("__i") + 1))
    return exploded.select(
        F.col(key_col),
        F.col("__p")["day"].alias("day"),
        _pub(F.col("__p")["__xq"].cast("double") / F.lit(1e6)).alias("x"),
        z_r.alias("z"),
        "center",
        "ucl",
        "lcl",
        ((z_r > F.col("ucl")) | (z_r < F.col("lcl"))).alias("out_of_control"),
    )


def kmv_distinct(
    df: DataFrame,
    col: str,
    *,
    k: int = 256,
) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al.,
    RANDOM'02): hash every value to a 32-bit integer (first md5 lane),
    keep the k smallest DISTINCT hashes, estimate
    ``n ~ (k-1) * 2^32 / h_k`` where ``h_k`` is the k-th minimum. With
    fewer than k distinct hashes the count is exact (the sketch holds
    everything). Standard error ~ 1/sqrt(k-2).

    This is the DETERMINISTIC, engine-portable counterpart to
    ``approx_count_distinct`` (q74's HLL, whose binary state is
    engine-private): md5 is byte-identical everywhere and the estimate is
    ONE integer division — no float anywhere — so a SQL oracle reproduces
    it bit-for-bit. Mergeable: the union sketch is the k smallest of the
    concatenated minima (same rule as each shard).

    100 TB posture: one combiner-friendly distinct on the 32-bit hash
    (map-side partial dedup), then a global k-smallest —
    TakeOrderedAndProject, every partition contributes at most k rows to
    ONE final heap-merge task; never a global sort of the corpus.

    Returns one row: ``(n_kept, kmv_estimate)`` — ``n_kept < k`` means
    the estimate is exact.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    h = F.conv(
        F.substring(F.md5(F.col(col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    # NULL keys are excluded BEFORE hashing: count_distinct ignores NULL,
    # and an un-filtered NULL hash would both consume a sketch slot and
    # sort differently across engines (Spark ASC is NULLS FIRST, DuckDB
    # defaults NULLS LAST) — a latent parity divergence
    mins = (
        df.filter(F.col(col).isNotNull())
        .select(h.alias("__h"))
        .distinct()
        .orderBy("__h")
        .limit(k)
    )
    agg = mins.agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("__h").alias("__hk")
    )
    # integer `div`, never a double->long cast of the ratio: Spark
    # truncates that cast while DuckDB rounds it (the q70 lesson) —
    # BIGINT floor-division is exact and identical on both engines.
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("long")
    ).otherwise(F.expr(f"CAST({(k - 1) * (1 << 32)} AS BIGINT) div __hk"))
    return agg.select("n_kept", est.cast("long").alias("kmv_estimate"))


def bloom_build(
    df: DataFrame,
    col: str,
    *,
    m_words: int = 256,
    k: int = 4,
    salt: int = 0,
) -> DataFrame:
    """Build a deterministic Bloom filter (Bloom, CACM 1970) over a key
    column: ``k`` md5-derived hash lanes set bits in an ``m_words * 32``
    bit array stored as one row per 32-bit word (BIGINT-held, so no
    sign-bit games on any engine).

    Same portability rationale as :func:`kmv_distinct` / the Count-Min
    sketch: md5 lanes are byte-identical everywhere, the filter state is
    plain (word_idx, bits) integers, and merging two filters is
    ``bit_or`` per word — so unlike an engine-private Bloom (or Spark's
    runtime BloomFilterAggregate state) this one carries a full SQL
    oracle AND can be persisted/joined like any table.

    The classic use at 100 TB is JOIN PRE-FILTERING: build over the
    small-but-not-broadcastable side's keys, probe the huge side with
    :func:`bloom_probe` (a broadcast join against ~KBs of words), and
    drop the guaranteed-non-members before the real shuffle join —
    Spark's own runtime row-group filters do exactly this, invisibly;
    this operator makes the technique an explicit, persistable step.

    Scale: one narrow projection (k lane rows per key), one
    map-side-combinable ``bit_or`` groupBy over at most ``m_words``
    groups. With n keys the false-positive rate is ~``(1 - e^(-k*n/m))^k``.
    """
    from .dedup import _md5_lane

    m_bits = m_words * 32
    key = F.col(col).cast("string")
    lanes = F.array(
        *[F.pmod(_md5_lane(key, salt, lane), F.lit(m_bits)) for lane in range(k)]
    )
    pos = (
        df.filter(F.col(col).isNotNull())
        .select(F.explode(lanes).alias("__pos"))
    )
    return (
        pos.select(
            F.expr("__pos div 32").cast("bigint").alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(__pos, 32) AS INT))"
            ).alias("__mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__mask").cast("bigint").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    col: str,
    bloom: DataFrame,
    *,
    m_words: int = 256,
    k: int = 4,
    salt: int = 0,
    out_col: str = "maybe_member",
) -> DataFrame:
    """Probe a :func:`bloom_build` filter: a key "maybe" belongs iff all
    ``k`` of its lane bits are set (no false negatives; false positives
    at the filter's design rate). ``m_words``/``k``/``salt`` must match
    the build call.

    Plan shape: k lane rows per probe key, one BROADCAST join against
    the tiny word table (the filter is ~KBs), then an all-lanes-hit
    groupBy — the probe side is touched once, narrowly, and nothing
    about the huge side shuffles.
    """
    from .dedup import _md5_lane

    m_bits = m_words * 32
    key = F.col(col).cast("string")
    lanes = F.array(
        *[F.pmod(_md5_lane(key, salt, lane), F.lit(m_bits)) for lane in range(k)]
    )
    probes = (
        df.filter(F.col(col).isNotNull())
        .select(F.col(col).alias("__key"), F.explode(lanes).alias("__pos"))
        .select(
            "__key",
            F.expr("__pos div 32").cast("bigint").alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(__pos, 32) AS INT))"
            ).alias("__mask"),
        )
    )
    hit = (
        F.col("bits").isNotNull()
        & (F.col("bits").bitwiseAND(F.col("__mask")) == F.col("__mask"))
    ).cast("int")
    return (
        probes.join(F.broadcast(bloom), "word_idx", "left")
        .select("__key", hit.alias("__hit"))
        .groupBy("__key")
        .agg((F.sum("__hit") == F.lit(k)).alias(out_col))
        .select(F.col("__key").alias(col), out_col)
    )


def bloom_prefilter(
    df: DataFrame,
    col: str,
    bloom: DataFrame,
    *,
    m_words: int = 256,
    k: int = 4,
    salt: int = 0,
) -> DataFrame:
    """Drop ``df`` rows whose ``col`` is a guaranteed NON-member of a
    :func:`bloom_build` filter — as a SCALAR predicate evaluated at the
    scan, before any shuffle. This is the join-reduction shape
    :func:`bloom_probe` (a per-key membership TABLE) cannot give: probe's
    explode + groupBy shuffles the probe keys, and its flags must then be
    joined back — two extra exchanges on the huge side. Here the filter's
    (word_idx, bits) rows fold into ONE row holding a ``map<bigint,
    bigint>`` (~m_words entries, KBs), ride a 1-row broadcast join onto
    every probe row (the documented bounded BroadcastNestedLoopJoin
    class), and each row evaluates its k md5 lanes against the map
    inline: all-bits-set or the row is discarded right there.

    No false negatives (the exact join downstream sees every true match);
    false positives at the filter's design rate just fail the exact join.
    At 100 TB this is semi-join reduction: only probable matches pay the
    shuffle — Spark's runtime BloomFilterAggregate does this invisibly
    for some plans; this operator is the explicit, persistable,
    engine-portable version (md5 lanes + integer words, full SQL oracle).

    ``m_words``/``k``/``salt`` must match the build call. Null keys are
    dropped (a null never equi-joins anyway).
    """
    from .dedup import _md5_lane

    m_bits = m_words * 32
    packed = bloom.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word_idx", "bits"))
        ).alias("__bf")
    )
    key = F.col(col).cast("string")
    pred = F.lit(True)
    for lane in range(k):
        pos = F.pmod(_md5_lane(key, salt, lane), F.lit(m_bits))
        word = (pos / 32).cast("bigint")
        mask = F.call_function(
            "shiftleft",
            F.lit(1).cast("bigint"),
            F.pmod(pos, F.lit(32)).cast("int"),
        )
        hit = (
            F.coalesce(
                F.element_at(F.col("__bf"), word), F.lit(0).cast("bigint")
            ).bitwiseAND(mask)
            == mask
        )
        pred = pred & hit
    return (
        df.filter(F.col(col).isNotNull())
        .join(F.broadcast(packed))
        .filter(pred)
        .drop("__bf")
    )


def chisq_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
    *,
    grid: int = 10**9,
    round_to: int = 6,
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns (the contingency-table statistic; Pearson 1900) — the
    drift/association screen between, e.g., corpus language and source.

    Exactness: observed, row, column and grand totals are BIGINTs; each
    cell's term ``(obs*N - r*c)^2 / (N*r*c)`` is computed from
    decimal(38,0) products (r*c reaches ~10^24 at 10^12 rows — past
    BIGINT, inside 38 digits), quantized to a ``1/grid`` integer lattice
    per cell, and SUMMED AS INTEGERS — so the cross-cell float-order
    dependence that makes naive chi-square unhashable never arises. One
    floor-published division at the end.

    Scale: one groupBy per marginal + the cell table (all map-side
    combinable); marginals broadcast back onto cells (category
    dimensions are bounded). Output one row: ``n, n_a, n_b, dof, chi2``.
    """
    a, b = F.col(col_a), F.col(col_b)
    base = df.filter(a.isNotNull() & b.isNotNull()).select(
        a.alias("__a"), b.alias("__b")
    )
    cells = base.groupBy("__a", "__b").agg(F.count(F.lit(1)).alias("__obs"))
    rows = base.groupBy("__a").agg(F.count(F.lit(1)).alias("__r"))
    cols = base.groupBy("__b").agg(F.count(F.lit(1)).alias("__c"))
    total = base.agg(
        F.count(F.lit(1)).alias("__n"),
        F.countDistinct("__a").cast("bigint").alias("n_a"),
        F.countDistinct("__b").cast("bigint").alias("n_b"),
    )
    dec = "decimal(38,0)"
    joined = (
        cells.join(F.broadcast(rows), "__a")
        .join(F.broadcast(cols), "__b")
        .crossJoin(F.broadcast(total))
    )
    diff = (
        F.col("__obs").cast(dec) * F.col("__n").cast(dec)
        - F.col("__r").cast(dec) * F.col("__c").cast(dec)
    )
    term = (diff.cast("double") * diff.cast("double")) / (
        F.col("__n").cast("double")
        * F.col("__r").cast("double")
        * F.col("__c").cast("double")
    )
    term_q = F.floor(term * F.lit(float(grid)) + F.lit(0.5)).cast(dec)
    agg = joined.agg(
        F.max("__n").cast("bigint").alias("n"),
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.sum(term_q).alias("__chi_q"),
    )
    chi2 = F.col("__chi_q").cast("double") / F.lit(float(grid))
    return agg.select(
        "n",
        "n_a",
        "n_b",
        ((F.col("n_a") - 1) * (F.col("n_b") - 1)).cast("bigint").alias("dof"),
        (
            F.floor(chi2 * F.lit(10.0 ** round_to) + F.lit(0.5))
            / F.lit(10.0 ** round_to)
        ).alias("chi2"),
    )


def kmv_jaccard(
    df: DataFrame,
    col: str,
    group_col: str,
    *,
    k: int = 256,
    sub_bits: int = 24,
    round_to: int = 6,
) -> DataFrame:
    """Pairwise Jaccard similarity between groups' key SETS from KMV
    (bottom-k) sketches — the sketch-algebra estimator of Bar-Yossef et
    al. (RANDOM'02) / Beyer et al. (SIGMOD'07): for groups A and B,
    ``J ~ |S_k(A u B) n S(A) n S(B)| / |S_k(A u B)|`` where ``S_k`` is
    the k smallest distinct hash values. With fewer than k distinct
    union hashes the estimate is EXACT (the sketches hold everything).

    Determinism: hashes are the first md5 lane (engine-portable), the
    estimate is one integer ratio — same contract as
    :func:`kmv_distinct`, which this generalises from cardinality to
    set-overlap between every group pair, at sketch cost (each group is
    k BIGINTs, so the pair stage touches |groups|^2 * k TINY rows, never
    the raw sets).

    Scale: the per-group k-smallest is TWO-PHASE — rank within (group,
    hash-prefix sub-bucket) first (bounded partitions), then rank the
    <= k * 2^(32-sub_bits) survivors per group — no full per-group
    stream through one window task. ``group_col`` must be a bounded
    dimension (sources, languages); the pair matrix is |groups|^2.

    Output per pair (group_a < group_b): ``k_used`` (union sketch size),
    ``n_shared``, floor-published ``jaccard_est``.
    """
    h = F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    hashes = (
        df.filter(F.col(col).isNotNull() & F.col(group_col).isNotNull())
        .select(F.col(group_col).alias("__g"), h.alias("__h"))
        .distinct()
    )
    pre_w = Window.partitionBy("__g", "__sub").orderBy(F.asc("__h"))
    pre = (
        hashes.withColumn("__sub", F.expr(f"__h div {1 << sub_bits}"))
        .withColumn("__rn", F.row_number().over(pre_w))
        .filter(F.col("__rn") <= k)
    )
    fin_w = Window.partitionBy("__g").orderBy(F.asc("__h"))
    sketch = (
        pre.withColumn("__rn2", F.row_number().over(fin_w))
        .filter(F.col("__rn2") <= k)
        .select("__g", "__h")
    )
    groups = sketch.select("__g").distinct()
    pairs = (
        groups.select(F.col("__g").alias("group_a"))
        .crossJoin(F.broadcast(groups.select(F.col("__g").alias("group_b"))))
        .filter(F.col("group_a") < F.col("group_b"))
    )
    side_a = pairs.join(
        sketch.select(F.col("__g").alias("group_a"), "__h"), "group_a"
    ).select("group_a", "group_b", "__h", F.lit(1).alias("__ia"), F.lit(0).alias("__ib"))
    side_b = pairs.join(
        sketch.select(F.col("__g").alias("group_b"), "__h"), "group_b"
    ).select("group_a", "group_b", "__h", F.lit(0).alias("__ia"), F.lit(1).alias("__ib"))
    union_rows = (
        side_a.unionByName(side_b)
        .groupBy("group_a", "group_b", "__h")
        .agg(F.max("__ia").alias("__ia"), F.max("__ib").alias("__ib"))
    )
    uw = Window.partitionBy("group_a", "group_b").orderBy(F.asc("__h"))
    union_k = union_rows.withColumn("__ur", F.row_number().over(uw)).filter(
        F.col("__ur") <= k
    )
    agg = union_k.groupBy("group_a", "group_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("k_used"),
        F.sum((F.col("__ia") * F.col("__ib"))).cast("bigint").alias("n_shared"),
    )
    p = float(10**round_to)
    return agg.select(
        "group_a",
        "group_b",
        "k_used",
        "n_shared",
        (
            F.floor(
                F.col("n_shared").cast("double")
                / F.col("k_used").cast("double")
                * F.lit(p)
                + F.lit(0.5)
            )
            / F.lit(p)
        ).alias("jaccard_est"),
    )


def hdr_quantiles(
    df: DataFrame,
    col: str,
    quantiles: Sequence[float] = (0.5, 0.9, 0.99),
    *,
    sig_digits: int = 3,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Bounded-relative-error quantiles from a decimal log-bucket
    histogram (the HdrHistogram idea, Tene; decimal rather than binary
    sub-buckets so every boundary is integer-exact in any engine):
    bucket(v) keeps the top ``sig_digits`` decimal digits of a
    NON-NEGATIVE integer value and zeroes the rest, so the bucket lower
    bound under-estimates the true quantile by < 10^(1-sig_digits)
    relative.

    This is the ENGINE-PORTABLE counterpart to ``approx_percentile``
    (q100's Greenwald-Khanna, whose state is engine-private and
    rows-only): the histogram is a plain (bucket, count) table —
    mergeable by count addition across shards/streams — and the
    estimate is pure integer arithmetic, so it carries a full SQL
    oracle. Error is RELATIVE (multiplicative), the right contract for
    long-tailed size/latency/price distributions.

    Scale: one map-side-combinable groupBy down to at most
    ``9 * 10^(sig_digits-1)`` buckets per decade; the cumulative count
    rides :func:`~..ops.sampling.two_phase_running_sum`; the quantile
    targets are a literal crossed against the tiny bucket table.

    Output per (group x quantile): ``group_cols + (quantile,
    target_rank, est, n)`` where ``est`` is the lower bound of the first
    bucket whose cumulative count reaches ``ceil(q * n)``. With
    ``group_cols`` the histogram, running sum, and totals all key by the
    group — one parallel pipeline for every group's quantiles; the
    group dimension must be bounded (the totals broadcast back).
    """
    from .sampling import two_phase_running_sum

    if not quantiles:
        raise ValueError("quantiles must be non-empty")
    for q in quantiles:
        if not (0.0 < q <= 1.0):
            raise ValueError(f"quantile out of (0, 1]: {q}")
    gcols = list(group_cols)
    v = F.col(col).cast("bigint")
    pw = F.expr(
        f"CAST(power(10, greatest(length(CAST(__v AS STRING)) - {sig_digits}, 0)) "
        "AS BIGINT)"
    )
    base = df.filter(v.isNotNull() & (v >= 0)).select(*gcols, v.alias("__v"))
    buckets = (
        base.select(*gcols, "__v", pw.alias("__pw"))
        .select(*gcols, (F.expr("__v div __pw") * F.col("__pw")).alias("bucket"))
        .groupBy(*gcols, "bucket")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    run = two_phase_running_sum(
        buckets,
        gcols,
        [F.asc("bucket")],
        F.col("__n"),
        F.expr("bucket div 1000000"),
        out_col="__cum",
    )
    total = buckets.groupBy(*gcols).agg(F.sum("__n").cast("bigint").alias("__tot"))
    spark = df.sparkSession
    targets = spark.createDataFrame(
        [(float(q),) for q in quantiles], "quantile double"
    )
    joined = run.crossJoin(F.broadcast(targets))
    if gcols:
        joined = joined.join(F.broadcast(total), gcols)
    else:
        joined = joined.crossJoin(F.broadcast(total))
    ranked = joined.withColumn(
        "__rank",
        F.greatest(
            F.lit(1).cast("bigint"),
            F.ceil(F.col("quantile") * F.col("__tot").cast("double")).cast(
                "bigint"
            ),
        ),
    ).filter(F.col("__cum") >= F.col("__rank"))
    return (
        ranked.groupBy(*gcols, "quantile")
        .agg(
            F.max("__rank").alias("target_rank"),
            F.min("bucket").cast("bigint").alias("est"),
            F.max("__tot").alias("n"),
        )
        .select(*gcols, "quantile", "target_rank", "est", "n")
    )


def rolling_corr(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    x_col: str,
    y_col: str,
    *,
    window_days: int = 7,
    scale: int = 100,
    round_to: int = 6,
) -> DataFrame:
    """Trailing Pearson correlation between two DAILY metrics per key —
    the co-movement monitor (does order count still track revenue?)
    computed deterministically: raw rows collapse to one (key, day) row
    of integer-lattice sums FIRST, then the five rolling sums (n, Sx,
    Sy, Sxx, Syy, Sxy) run over a ``window_days``-row frame and the
    correlation closes in doubles at the end:

        r = (n*Sxy - Sx*Sy) / (sqrt(n*Sxx - Sx^2) * sqrt(n*Syy - Sy^2))

    Determinism notes: per-day products reach (value_sum)^2 — decimal
    (38,0), not BIGINT; sqrt IS correctly-rounded under IEEE 754 (unlike
    ln/exp), so both engines return the identical double; degenerate
    windows (either variance zero, or fewer than 2 days) publish NULL.
    Floor-published to ``round_to``.

    Scale: the groupBy collapses arbitrary per-day row counts before any
    window; the rolling frame is ``window_days`` rows per task and the
    window partitions by key — day-count-sized partitions regardless of
    raw volume.
    """
    dec = "decimal(38,0)"
    ts = F.col(ts_col).cast("timestamp")
    xq = F.floor(F.col(x_col).cast("double") * F.lit(float(scale)) + F.lit(0.5)).cast(
        "bigint"
    )
    yq = F.floor(F.col(y_col).cast("double") * F.lit(float(scale)) + F.lit(0.5)).cast(
        "bigint"
    )
    daily = (
        df.select(
            F.col(key_col).alias("__key"),
            ts.cast("date").alias("day"),
            xq.alias("__x"),
            yq.alias("__y"),
        )
        .groupBy("__key", "day")
        .agg(
            F.sum("__x").cast("bigint").alias("__dx"),
            F.sum("__y").cast("bigint").alias("__dy"),
        )
    )
    w = (
        Window.partitionBy("__key")
        .orderBy(F.asc("day"))
        .rowsBetween(-(window_days - 1), 0)
    )
    n = F.count(F.lit(1)).over(w).cast(dec)
    sx = F.sum(F.col("__dx").cast(dec)).over(w)
    sy = F.sum(F.col("__dy").cast(dec)).over(w)
    sxx = F.sum((F.col("__dx").cast(dec) * F.col("__dx").cast(dec))).over(w)
    syy = F.sum((F.col("__dy").cast(dec) * F.col("__dy").cast(dec))).over(w)
    sxy = F.sum((F.col("__dx").cast(dec) * F.col("__dy").cast(dec))).over(w)
    stats = daily.select(
        F.col("__key").alias(key_col),
        "day",
        n.cast("bigint").alias("n_days"),
        (n * sxy - sx * sy).cast("double").alias("__num"),
        (n * sxx - sx * sx).cast("double").alias("__vx"),
        (n * syy - sy * sy).cast("double").alias("__vy"),
    )
    p = float(10**round_to)
    corr = F.when(
        (F.col("n_days") >= 2) & (F.col("__vx") > 0) & (F.col("__vy") > 0),
        F.floor(
            F.col("__num")
            / (F.sqrt(F.col("__vx")) * F.sqrt(F.col("__vy")))
            * F.lit(p)
            + F.lit(0.5)
        )
        / F.lit(p),
    )
    return stats.select(key_col, "day", "n_days", corr.alias("corr"))


def changepoint_cusum(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    scale: int = 100,
) -> DataFrame:
    """Single most-likely changepoint per key: the first step of CUSUM
    binary segmentation (Page 1954; Scott-Knott style recursive splits
    run this repeatedly on the halves).

    For a key's daily sums ``x_1..x_n`` with prefix sums ``S_t``, the
    split statistic at candidate ``t`` (1 <= t < n) is

        D_t = | n * S_t - t * S_n |

    — the between-segment mean gap ``|S_t/t - (S_n-S_t)/(n-t)|`` with
    every division cross-multiplied away, so it is an EXACT BIGINT on
    inputs snapped to a ``1/scale`` grid.  The reported split is the
    argmax of ``D_t`` with the earliest day winning ties (deterministic
    on any engine).

    Scale posture: the raw stream collapses to one row per (key, day)
    in a combiner-friendly groupBy FIRST; the prefix-sum window and the
    argmax window after it run over day-count-sized partitions (time is
    bounded — a key with 10^9 events has the same ~365 rows/year here).
    The per-key totals come back via one broadcast join, never an
    unpartitioned window.

    Output: one row per key with >= 2 days —
    ``(key_col, n_days, split_day, split_t, stat, left_sum, right_sum)``
    where ``left_sum``/``right_sum`` are grid-unit segment sums.
    """
    vq = F.floor(F.col(value_col).cast("double") * scale + F.lit(0.5)).cast(
        "bigint"
    )
    daily = (
        df.select(
            F.col(key_col).alias("__key"),
            F.to_date(F.col(ts_col)).alias("day"),
            vq.alias("__vq"),
        )
        .groupBy("__key", "day")
        .agg(F.sum("__vq").cast("bigint").alias("dv"))
    )
    wcum = (
        Window.partitionBy("__key")
        .orderBy(F.asc("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wrn = Window.partitionBy("__key").orderBy(F.asc("day"))
    c = daily.select(
        "__key",
        "day",
        F.row_number().over(wrn).cast("bigint").alias("__t"),
        F.sum("dv").over(wcum).cast("bigint").alias("__st"),
    )
    tot = daily.groupBy("__key").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum("dv").cast("bigint").alias("__sn"),
    )
    scored = (
        c.join(F.broadcast(tot), "__key")
        .filter((F.col("__t") < F.col("__n")) & (F.col("__n") >= 2))
        .withColumn(
            "__stat",
            F.abs(F.col("__n") * F.col("__st") - F.col("__t") * F.col("__sn")),
        )
    )
    wpick = Window.partitionBy("__key").orderBy(
        F.desc("__stat"), F.asc("day")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(wpick))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("__key").alias(key_col),
            F.col("__n").alias("n_days"),
            F.col("day").alias("split_day"),
            F.col("__t").alias("split_t"),
            F.col("__stat").cast("bigint").alias("stat"),
            F.col("__st").alias("left_sum"),
            (F.col("__sn") - F.col("__st")).cast("bigint").alias("right_sum"),
        )
    )


def wilson_rate_ci(
    df: DataFrame,
    group_cols: Sequence[str],
    success: Column,
    *,
    z: float = 1.96,
    round_to: int = 9,
) -> DataFrame:
    """Per-group event-rate estimate with a Wilson score interval
    (Wilson, JASA 1927) — the interval defect-rate monitoring wants at
    small n, where the Wald interval collapses to nonsense (k=0 gives
    [0,0]).

    ``success`` is a boolean Column; the group's ``k``/``n`` are exact
    bigint counts from one combiner-friendly groupBy.  The interval

        center = (p + z²/2n) / (1 + z²/n)
        half   = z * sqrt(p(1-p)/n + z²/4n²) / (1 + z²/n)

    is evaluated on doubles derived from the integer (k, n) pair with a
    FIXED expression tree — every +,*,/ and sqrt is an IEEE-754
    correctly-rounded op, so identical integers give bit-identical
    doubles on any engine; publication floors to ``round_to`` decimals.

    Output: one row per group —
    ``(group_cols..., n, k, rate_lo, rate_hi)``.
    """
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(success, 1).otherwise(0)).cast("bigint").alias("k"),
    )
    nn = F.col("n").cast("double")
    kk = F.col("k").cast("double")
    z2 = z * z
    p = kk / nn
    denom = F.lit(1.0) + F.lit(z2) / nn
    center = (p + F.lit(z2) / (F.lit(2.0) * nn)) / denom
    half = (
        F.lit(z)
        * F.sqrt(p * (F.lit(1.0) - p) / nn + F.lit(z2) / (F.lit(4.0) * nn * nn))
        / denom
    )
    pw = float(10**round_to)
    pub = lambda c: (F.floor(c * F.lit(pw)) / F.lit(pw)).alias  # noqa: E731
    return agg.select(
        *group_cols,
        "n",
        "k",
        pub(center - half)("rate_lo"),
        pub(center + half)("rate_hi"),
    )


def mann_kendall_trend(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    scale: int = 100,
    z_crit: float = 1.96,
) -> DataFrame:
    """Mann-Kendall monotone-trend test per key (Mann 1945, Kendall's
    tau-b S statistic) over the daily value series — the
    distribution-free answer to "is this KPI drifting" that q115's OLS
    slope can't give when the series is non-normal or has outliers.

    ``S = sum over day pairs i<j of sign(x_j - x_i)`` is computed with
    an exact integer pair aggregation; the tie-corrected variance

        18 * Var(S) = n(n-1)(2n+5) - sum over tie groups t(t-1)(2t+5)

    stays integer too, so only the final z (with the standard +/-1
    continuity correction) touches floating point — one fixed IEEE tree
    over integers, floor-published x1e6.

    Scale posture: the raw stream collapses to one row per (key, day)
    FIRST (combiner-friendly).  The pair self-join is quadratic in the
    number of DAYS, not rows — time is calendar-bounded (a year is 365
    rows per key whatever the data volume), so the join is
    |keys| x O(days^2) inside key-partitioned tasks.  For multi-decade
    series swap in the O(n log n) inversion-count formulation.

    Output: ``(key_col, n_days, s_stat, var18, z_x1e6, trend)`` with
    trend in {'increasing','decreasing','no_trend'} at ``z_crit``.
    """
    vq = F.floor(F.col(value_col).cast("double") * scale + F.lit(0.5)).cast(
        "bigint"
    )
    daily = (
        df.select(
            F.col(key_col).alias("__key"),
            F.to_date(F.col(ts_col)).alias("day"),
            vq.alias("__vq"),
        )
        .groupBy("__key", "day")
        .agg(F.sum("__vq").cast("bigint").alias("dv"))
    )
    a = daily.select(
        F.col("__key"), F.col("day").alias("__da"), F.col("dv").alias("__va")
    )
    b = daily.select(
        F.col("__key"), F.col("day").alias("__db"), F.col("dv").alias("__vb")
    )
    s = (
        a.join(b, "__key")
        .filter(F.col("__da") < F.col("__db"))
        .groupBy("__key")
        .agg(
            F.sum(
                F.when(F.col("__vb") > F.col("__va"), 1)
                .when(F.col("__vb") < F.col("__va"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s_stat")
        )
    )
    n_ = daily.groupBy("__key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    ties = (
        daily.groupBy("__key", "dv")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
        .filter(F.col("__c") >= 2)
        .groupBy("__key")
        .agg(
            F.sum(
                F.col("__c")
                * (F.col("__c") - 1)
                * (2 * F.col("__c") + 5)
            )
            .cast("bigint")
            .alias("__tsum")
        )
    )
    base = (
        n_.join(s, "__key", "left")
        .join(ties, "__key", "left")
        .select(
            "__key",
            "n_days",
            F.coalesce(F.col("s_stat"), F.lit(0).cast("bigint")).alias(
                "s_stat"
            ),
            (
                F.col("n_days")
                * (F.col("n_days") - 1)
                * (2 * F.col("n_days") + 5)
                - F.coalesce(F.col("__tsum"), F.lit(0).cast("bigint"))
            )
            .cast("bigint")
            .alias("var18"),
        )
    )
    sd = F.col("s_stat").cast("double")
    v = F.col("var18").cast("double") / F.lit(18.0)
    z = (
        F.when((F.col("var18") <= 0) | (F.col("s_stat") == 0), F.lit(0.0))
        .when(F.col("s_stat") > 0, (sd - F.lit(1.0)) / F.sqrt(v))
        .otherwise((sd + F.lit(1.0)) / F.sqrt(v))
    )
    return base.select(
        F.col("__key").alias(key_col),
        "n_days",
        "s_stat",
        "var18",
        F.floor(z * F.lit(1_000_000.0)).cast("bigint").alias("z_x1e6"),
        F.when(z > F.lit(z_crit), F.lit("increasing"))
        .when(z < F.lit(-z_crit), F.lit("decreasing"))
        .otherwise(F.lit("no_trend"))
        .alias("trend"),
    )


def ks_pairwise(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance for every pair of groups
    (Kolmogorov 1933; the distribution-shift screen for "did source X's
    length/quality profile drift away from source Y's").

    ``D = max_x |F_a(x) - F_b(x)|`` evaluated EXACTLY on integers:
    with cumulative counts ``c`` and totals ``n``, the max of
    ``|c_a * n_b - c_b * n_a|`` over the value grid is the cross-
    multiplied D (one IEEE division publishes it x1e6 at the end).

    Mechanics: value counts collapse map-side to one row per (group,
    value); the (distinct values x groups) grid is completed with a
    broadcast cross join so every group has a cumulative count AT EVERY
    grid point (else F_a would be unsampled where only b has mass);
    per-group prefix sums run over value-grid-sized partitions; the
    pair join is grid x groups² — all bounded by the VALUE DOMAIN
    (lengths, scores), not row counts.

    Output: one row per unordered pair —
    ``(group_a, group_b, n_a, n_b, d_num, d_x1e6)``.
    """
    counts = (
        df.select(F.col(group_col).alias("__g"), F.col(value_col).alias("__v"))
        .groupBy("__g", "__v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
    )
    vals = counts.select("__v").distinct()
    grps = counts.select("__g").distinct()
    grid = vals.crossJoin(F.broadcast(grps))
    full = grid.join(counts, ["__g", "__v"], "left").select(
        "__g", "__v", F.coalesce(F.col("__c"), F.lit(0).cast("bigint")).alias("__c")
    )
    w = (
        Window.partitionBy("__g")
        .orderBy(F.asc("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = full.select(
        "__g", "__v", F.sum("__c").over(w).cast("bigint").alias("__cum")
    )
    n = counts.groupBy("__g").agg(F.sum("__c").cast("bigint").alias("__n"))
    cdf = cum.join(F.broadcast(n), "__g")
    a = cdf.select(
        F.col("__v"),
        F.col("__g").alias("group_a"),
        F.col("__cum").alias("__ca"),
        F.col("__n").alias("n_a"),
    )
    b = cdf.select(
        F.col("__v"),
        F.col("__g").alias("group_b"),
        F.col("__cum").alias("__cb"),
        F.col("__n").alias("n_b"),
    )
    pairs = a.join(b, "__v").filter(F.col("group_a") < F.col("group_b"))
    return (
        pairs.groupBy("group_a", "group_b")
        .agg(
            F.max("n_a").cast("bigint").alias("n_a"),
            F.max("n_b").cast("bigint").alias("n_b"),
            F.max(
                F.abs(F.col("__ca") * F.col("n_b") - F.col("__cb") * F.col("n_a"))
            )
            .cast("bigint")
            .alias("d_num"),
        )
        .select(
            "group_a",
            "group_b",
            "n_a",
            "n_b",
            "d_num",
            F.floor(
                F.lit(1_000_000.0)
                * F.col("d_num").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            )
            .cast("bigint")
            .alias("d_x1e6"),
        )
    )


def gini_coefficient(
    df: DataFrame,
    key_col: str,
    value_col: str,
    *,
    sub_bucket_width: int = 10_000_000,
) -> DataFrame:
    """Gini concentration coefficient of a nonnegative integer measure
    (Gini 1912; the inequality complement to q138's Herfindahl):

        G = (2 * sum(i * x_i) - (n + 1) * sum(x)) / (n * sum(x))

    with ``x_1 <= ... <= x_n`` ranked ascending (``key_col`` breaks
    ties — tie order cannot change the statistic since tied x are
    equal).  Ranks come from the skew-safe two-phase running count
    (never a one-task global sort); the moment sums accumulate in
    decimal(38,0) (exact — rank*x products overflow bigint near 10^18;
    decimal keeps petabyte-scale sums exact like DuckDB's HUGEINT), and
    only the final ratio touches floating point, floor-published x1e9.

    Output: one row — ``(n_keys, total, gini_x1e9)``.
    """
    from .sampling import two_phase_running_sum

    base = df.select(
        F.col(key_col).alias("__k"),
        F.col(value_col).cast("bigint").alias("__x"),
    )
    ranked = two_phase_running_sum(
        base.withColumn("__all", F.lit(0)),
        ["__all"],
        [F.col("__x"), F.col("__k")],
        F.lit(1),
        F.floor(F.col("__x") / F.lit(float(sub_bucket_width))).cast("bigint"),
        out_col="__rank",
    )
    dec = "decimal(38,0)"
    m = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum(F.col("__x").cast(dec)).alias("__sx"),
        F.sum((F.col("__rank") * F.col("__x")).cast(dec)).alias("__six"),
    )
    num = (
        F.lit(2).cast(dec) * F.col("__six")
        - (F.col("n_keys") + F.lit(1)).cast(dec) * F.col("__sx")
    )
    den = F.col("n_keys").cast(dec) * F.col("__sx")
    return m.select(
        "n_keys",
        F.col("__sx").cast("bigint").alias("total"),
        F.floor(
            F.lit(1_000_000_000.0)
            * (num.cast("double") / den.cast("double"))
        )
        .cast("bigint")
        .alias("gini_x1e9"),
    )


def trimmed_mean(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    tiebreak_col: str,
    *,
    trim_pct: int = 5,
    scale: int = 100,
    sub_bucket_width: int = 1_000,
) -> DataFrame:
    """Per-group symmetric trimmed mean (the robust location estimate
    between mean and median — standard in timing/benchmark reporting):
    drop the bottom and top ``trim_pct``% by rank, average the rest.

    Ranks are EXACT per-group order statistics via the two-phase
    running count (sub-bucketed on the value grid), never a
    one-task-per-group sort window — the hottest group's ranking
    parallelizes across ``value div sub_bucket_width`` buckets.  The
    trim boundaries are integers (``k = n * trim_pct div 100``), kept
    rows are ``k < rank <= n - k``, and the mean is one IEEE division
    of exact integer sums, floor-published x1e6.

    Output: ``(group_cols..., n, n_kept, mean_x1e6)``.
    """
    vq = F.floor(F.col(value_col).cast("double") * scale + F.lit(0.5)).cast(
        "bigint"
    )
    base = df.select(
        *[F.col(c) for c in group_cols],
        vq.alias("__vq"),
        F.col(tiebreak_col).alias("__tb"),
    ).filter(F.col("__vq").isNotNull())
    from .sampling import two_phase_running_sum

    ranked = two_phase_running_sum(
        base,
        list(group_cols),
        [F.col("__vq"), F.col("__tb")],
        F.lit(1),
        F.expr(f"__vq div {int(sub_bucket_width)}"),
        out_col="__rank",
    )
    tot = base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n")
    )
    k = F.expr(f"__n * {int(trim_pct)} div 100")
    kept = (
        ranked.join(F.broadcast(tot), list(group_cols))
        .filter((F.col("__rank") > k) & (F.col("__rank") <= F.col("__n") - k))
    )
    return kept.groupBy(*group_cols).agg(
        F.max("__n").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.floor(
            F.lit(1_000_000.0)
            * F.sum("__vq").cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(float(scale))
        )
        .cast("bigint")
        .alias("mean_x1e6"),
    )


def spearman_rho(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    round_to: int = 6,
) -> DataFrame:
    """Spearman rank correlation between two INTEGER-grid columns, exact
    at any scale (Spearman 1904; the tie-aware form = Pearson on average
    ranks): the monotone-association screen that, unlike Pearson,
    doesn't care about the metrics' scales — 'do longer documents have
    more tokens', 'does quality rise with recency'.

    Average ranks are computed in DOUBLED units so everything stays
    integral (a value v with n_v rows after `below` smaller rows has
    doubled rank 2*below + n_v + 1 — the roc_auc trick), via
    :func:`~.sampling.two_phase_running_sum` on each metric's
    distinct-value table (no unpartitioned window). All five moment sums
    accumulate as decimal(38,0) (doubled ranks reach ~2e12 at 1e12 rows,
    their squares ~4e24, sums ~4e36 — inside 38 digits); the final
    Pearson-on-ranks ratio is one fixed IEEE tree over the
    decimal->double casts, floor-published.

    Output: one row ``(n_rows, rho_x1e6)``; NULL rho when either metric
    is constant (zero rank variance).
    """
    from .sampling import two_phase_running_sum

    base = df.select(
        F.col(x_col).cast("bigint").alias("__x"),
        F.col(y_col).cast("bigint").alias("__y"),
    )

    def doubled_ranks(col: str, out: str) -> DataFrame:
        vals = base.groupBy(col).agg(F.count(F.lit(1)).alias("__nv"))
        run = two_phase_running_sum(
            vals,
            [],
            [F.asc(col)],
            F.col("__nv"),
            F.expr(f"{col} div 65536"),
            out_col="__incl",
        )
        return run.select(
            col,
            (F.lit(2) * (F.col("__incl") - F.col("__nv")) + F.col("__nv") + 1)
            .cast("bigint")
            .alias(out),
        )

    rx = doubled_ranks("__x", "__rx")
    ry = doubled_ranks("__y", "__ry")
    ranked = base.join(rx, "__x").join(ry, "__y")
    dec = "decimal(38,0)"
    s = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("__rx").cast(dec)).cast(dec).alias("__sx"),
        F.sum(F.col("__ry").cast(dec)).cast(dec).alias("__sy"),
        F.sum((F.col("__rx").cast(dec) * F.col("__ry").cast(dec)).cast(dec))
        .cast(dec)
        .alias("__sxy"),
        F.sum((F.col("__rx").cast(dec) * F.col("__rx").cast(dec)).cast(dec))
        .cast(dec)
        .alias("__sxx"),
        F.sum((F.col("__ry").cast(dec) * F.col("__ry").cast(dec)).cast(dec))
        .cast(dec)
        .alias("__syy"),
    )
    n = F.col("n_rows").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    num = n * F.col("__sxy").cast("double") - sx * sy
    vx = n * F.col("__sxx").cast("double") - sx * sx
    vy = n * F.col("__syy").cast("double") - sy * sy
    p = float(10**round_to)
    # publish the scaled integer directly — a /p*p round-trip through
    # doubles can drop an ulp and truncate off-by-one at the cast
    rho_scaled = F.when(
        (vx > 0) & (vy > 0),
        F.floor(num / F.sqrt(vx * vy) * F.lit(p) + F.lit(0.5)).cast("bigint"),
    )
    return s.select("n_rows", rho_scaled.alias(f"rho_x1e{round_to}"))


# Cumulative Poisson(1) probabilities, k = 0..7 — computed once in Python
# and injected as the SAME literals into Spark and any SQL oracle, so the
# inverse-CDF draw is engine-identical. P(K > 7) ~ 1e-5 truncates to 8.
import math as _math

POISSON1_CUM: tuple[float, ...] = tuple(
    sum(_math.exp(-1.0) / _math.factorial(j) for j in range(k + 1))
    for k in range(8)
)


def poisson_bootstrap_mean(
    df: DataFrame,
    key_col: str,
    value_int: Column,
    *,
    n_replicates: int = 32,
    salt: str = "boot",
    round_to: int = 4,
) -> DataFrame:
    """Deterministic Poisson bootstrap of a mean (Chamandy et al.,
    Google 2012: resample-counts ~ Poisson(1) make the bootstrap a
    SINGLE distributed pass — no resample shuffles, no driver loop):
    every (row, replicate) draws its multiplicity by inverse-CDF over a
    md5-lane uniform against the shared ``POISSON1_CUM`` literals, and
    each replicate's weighted mean is two exact BIGINT sums and one
    floor-published division. Sorting the replicate means gives the CI;
    the published table IS the replicate set, so the oracle can check
    every draw.

    Scale posture: one explode by ``n_replicates`` (a literal array —
    no shuffle), one map-side-combined groupBy over the replicate id.
    Cost is n_replicates x the scan, the textbook trade for a
    shuffle-free bootstrap.

    Output: ``(replicate, n_rows_weighted, mean_x1e{round_to})``,
    ``n_replicates`` rows.
    """
    reps = F.explode(
        F.array(*[F.lit(b).cast("int") for b in range(n_replicates)])
    ).alias("replicate")
    base = df.select(
        F.col(key_col).cast("string").alias("__k"),
        value_int.cast("bigint").alias("__v"),
    ).select("__k", "__v", reps)
    u52 = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("__k"),
                    F.lit(":" + salt + ":"),
                    F.col("replicate").cast("string"),
                )
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("bigint")
    u = (u52.cast("double") + F.lit(0.5)) / F.lit(float(1 << 52))
    w = sum(
        (u > F.lit(c)).cast("int") for c in POISSON1_CUM
    ).cast("bigint")
    p = float(10**round_to)
    agg = base.select("replicate", w.alias("__w"), (w * F.col("__v")).alias("__wv"))
    out = agg.groupBy("replicate").agg(
        F.sum("__w").cast("bigint").alias("n_rows_weighted"),
        F.sum("__wv").cast("bigint").alias("__sum_wv"),
    )
    mean = F.when(
        F.col("n_rows_weighted") > 0,
        F.floor(
            F.col("__sum_wv").cast("double")
            / F.col("n_rows_weighted").cast("double")
            * F.lit(p)
            + F.lit(0.5)
        ).cast("bigint"),
    )
    return out.select(
        "replicate", "n_rows_weighted", mean.alias(f"mean_x1e{round_to}")
    )


def eb_shrunk_rates(
    counts: DataFrame,
    key_cols: Sequence[str],
    k_col: str = "k",
    n_col: str = "n",
    *,
    max_kappa: float = 10000.0,
    scale: int = 1_000_000,
) -> DataFrame:
    """Empirical-Bayes (beta-binomial) shrinkage of per-entity rates
    (Efron & Morris 1975; the small-sample defect-rate stabilizer):
    entities with few trials are pulled toward the pooled rate, entities
    with many keep their own.

    ``counts`` carries one row per entity with exact BIGINT successes
    ``k_col`` and trials ``n_col``. Method-of-moments prior: mean
    ``m = sum(k)/sum(n)``; strength ``kappa = m(1-m)/var - 1`` from the
    across-entity variance of the raw rates, clamped to
    ``[1, max_kappa]`` (degenerate variance -> max_kappa: full pooling).
    Posterior mean per entity: ``(k + kappa*m) / (n + kappa)``.

    Determinism: raw rates snap to the 1e-9 integer grid BEFORE the
    variance pass (``(k * 1e9) div n`` — BIGINT), the grid sums run in
    decimal(38,0) (exact), and the handful of float ops that remain are
    ONE fixed expression tree over those exact scalars, so any engine
    reproduces the same doubles bit-for-bit; outputs floor-publish on
    the 1e-6 grid. Guards: a single entity or non-positive variance
    takes the max_kappa branch via CASE, never a NaN comparison.

    Scale posture: one map-side-combined 1-row aggregate broadcast back
    over the entity table — no shuffle beyond the aggregate, no window.

    Output: ``key_cols + (k, n, raw_x1e6, kappa_x1e6, shrunk_x1e6)``.
    """
    g = list(key_cols)
    base = counts.select(
        *g,
        F.col(k_col).cast("bigint").alias("k"),
        F.col(n_col).cast("bigint").alias("n"),
        F.expr(f"(CAST({k_col} AS BIGINT) * 1000000000) div "
               f"CAST({n_col} AS BIGINT)").alias("__rq"),
    )
    scalars = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("__g"),
        F.sum("k").cast("bigint").alias("__sk"),
        F.sum("n").cast("bigint").alias("__sn"),
        F.sum(F.col("__rq").cast("decimal(38,0)")).alias("__s1"),
        F.sum(
            (F.col("__rq") * F.col("__rq")).cast("decimal(38,0)")
        ).alias("__s2"),
    )
    # ONE canonical IEEE tree — mirrored verbatim by the SQL oracle.
    m_sql = "CAST(__sk AS DOUBLE) / CAST(__sn AS DOUBLE)"
    vr_sql = (
        "(CAST(__s2 AS DOUBLE) - CAST(__s1 AS DOUBLE) * CAST(__s1 AS DOUBLE)"
        " / CAST(__g AS DOUBLE))"
        " / ((CAST(__g AS DOUBLE) - 1.0) * 1000000000000000000.0)"
    )
    kappa_sql = (
        f"CASE WHEN __g <= 1 THEN {max_kappa!r} "
        f"WHEN {vr_sql} <= 0.0 THEN {max_kappa!r} "
        f"ELSE least({max_kappa!r}, greatest(1.0, "
        f"{m_sql} * (1.0 - {m_sql}) / ({vr_sql}) - 1.0)) END"
    )
    shrunk_sql = (
        f"(CAST(k AS DOUBLE) + ({kappa_sql}) * ({m_sql}))"
        f" / (CAST(n AS DOUBLE) + ({kappa_sql}))"
    )
    s = float(scale)
    return base.crossJoin(F.broadcast(scalars)).select(
        *g,
        "k",
        "n",
        F.expr(f"(k * {int(scale)}) div n").cast("bigint").alias("raw_x1e6"),
        F.floor(F.expr(kappa_sql) * F.lit(s) + F.lit(0.5))
        .cast("bigint")
        .alias("kappa_x1e6"),
        F.floor(F.expr(shrunk_sql) * F.lit(s) + F.lit(0.5))
        .cast("bigint")
        .alias("shrunk_x1e6"),
    )


def loglog_slope(
    df: DataFrame,
    x_col: Column | str,
    y_col: Column | str,
    *,
    group_cols: Sequence[str] = (),
    ln_round: int = 9,
    scale: int = 1_000_000,
) -> DataFrame:
    """OLS slope of ``ln(y)`` on ``ln(x)`` per group — the log-log
    elasticity estimator (a 1% change in x associates with slope% in y;
    the standard price-elasticity / Zipf-exponent regression shape).

    Determinism: each ln lands on the 1e-9 integer lattice FIRST
    (``floor(round(ln(v), 9) * 1e9 + 0.5)`` — ln is the one libm op
    that may differ between engines past ~15 significant digits, so it
    is rounded to 9 before any arithmetic), then every moment
    (n, Σx, Σy, Σxy, Σx²) is an EXACT decimal(38,0) sum of BIGINTs, and
    the closed-form slope ``(nΣxy - ΣxΣy) / (nΣx² - (Σx)²)`` is ONE
    fixed IEEE tree over those exact scalars, floor-published. Rows
    with x <= 0 or y <= 0 are excluded (ln undefined) — counted in
    ``n_used`` vs nothing hidden. Degenerate groups (n < 2 or zero
    x-variance by the EXACT integer check) publish NULL.

    Scale posture: one map-side-combined groupBy — five sums — per
    group; no window, no join.

    Output: ``group_cols + (n_used, slope_x1e6)``.
    """
    g = list(group_cols)
    x = (F.col(x_col) if isinstance(x_col, str) else x_col).cast("double")
    y = (F.col(y_col) if isinstance(y_col, str) else y_col).cast("double")

    def lat(c: Column) -> Column:
        return (
            F.floor(F.round(F.log(c), ln_round) * F.lit(1e9) + F.lit(0.5))
            .cast("bigint")
        )

    base = df.filter((x > 0) & (y > 0)).select(
        *g, lat(x).alias("__lx"), lat(y).alias("__ly")
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    agg = base.groupBy(*g).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_used"),
        F.sum(dec("__lx")).alias("__sx"),
        F.sum(dec("__ly")).alias("__sy"),
        F.sum(dec("__lx") * F.col("__ly")).alias("__sxy"),
        F.sum(dec("__lx") * F.col("__lx")).alias("__sxx"),
    )
    # exact zero-variance check: n*Σx² == (Σx)² in decimal
    degenerate = (F.col("n_used") < 2) | (
        F.col("n_used").cast("decimal(38,0)") * F.col("__sxx")
        == F.col("__sx") * F.col("__sx")
    )
    # numerator/denominator stay EXACT decimal until the one division
    n_dec = F.col("n_used").cast("decimal(38,0)")
    num = n_dec * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    den = n_dec * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    slope = num.cast("double") / den.cast("double")
    return agg.select(
        *g,
        "n_used",
        F.when(degenerate, F.lit(None).cast("bigint"))
        .otherwise(
            F.floor(slope * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
        )
        .alias("slope_x1e6"),
    )


def _kw_rank_sums(
    df: DataFrame,
    group_col: str,
    value_col: Column | str,
    sub_bucket: Column | None,
) -> tuple[DataFrame, DataFrame]:
    """Shared rank-sum core for :func:`kruskal_wallis` and
    :func:`dunn_pairwise`: per-group ``(__g, __nj, __r2j)`` — ``__r2j``
    the DOUBLED rank-sum in decimal(38,0) — plus the 1-row tie table
    ``(__tie3,)`` = sum(t^3 - t) over value multiplicities. Below-counts
    run through :func:`~.sampling.two_phase_running_sum`, so the distinct-
    value cumulative never serializes through one window task."""
    from .sampling import two_phase_running_sum

    v = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "bigint"
    )
    base = df.filter(v.isNotNull() & F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("__g"), v.alias("__v")
    )
    # r12 opt: aggregate ONCE to (group, value) counts and derive the
    # per-value tallies from that — `base` used to be scanned twice (per-
    # value counts + per-(group, value) counts), re-running the source
    # pipeline each time. gv is bounded by |groups| x |distinct values|
    # (analysis-sized, not data-sized), so the checkpoint is tiny and every
    # downstream table (vals, ranks, ties, per-group sums) derives from it.
    gv = (
        base.groupBy("__g", "__v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__ngv"))
        .transform(materialize_once)
    )
    vals = gv.groupBy("__v").agg(F.sum("__ngv").cast("bigint").alias("__t"))
    sub = sub_bucket if sub_bucket is not None else F.expr("__v div 65536")
    run = two_phase_running_sum(
        vals, [], [F.asc("__v")], F.col("__t"), sub, out_col="__below_incl"
    )
    dmid = (
        F.lit(2) * (F.col("__below_incl") - F.col("__t"))
        + F.col("__t")
        + F.lit(1)
    ).cast("decimal(38,0)")
    ranked = run.select("__v", "__t", dmid.alias("__dmid"))
    per_group = (
        gv.join(ranked.select("__v", "__dmid"), "__v")
        .groupBy("__g")
        .agg(
            F.sum("__ngv").cast("bigint").alias("__nj"),
            F.sum(F.col("__ngv").cast("decimal(38,0)") * F.col("__dmid"))
            .cast("decimal(38,0)")
            .alias("__r2j"),
        )
    )
    ties = vals.agg(
        F.sum(
            F.col("__t").cast("decimal(38,0)")
            * F.col("__t").cast("decimal(38,0)")
            * F.col("__t").cast("decimal(38,0)")
            - F.col("__t").cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("__tie3")
    )
    return per_group, ties


def kruskal_wallis(
    df: DataFrame,
    group_col: str,
    value_col: Column | str,
    *,
    sub_bucket: Column | None = None,
    scale: int = 1_000_000,
) -> DataFrame:
    """Kruskal-Wallis H test (Kruskal & Wallis, JASA 1952): does a value's
    distribution differ across k groups — the rank-based (distribution-free)
    one-way ANOVA, the k-group generalization of the Mann-Whitney machinery
    in :func:`~..ops.evaluation.roc_auc`.

    Determinism contract: values are ranked with textbook average ranks
    but in DOUBLED units so everything stays integral — a value bucket of
    ``n`` rows after ``below`` smaller rows has doubled midrank
    ``2*below + n + 1``. Per-group doubled rank-sums ``R2_j`` accumulate
    in decimal(38,0); each group's ``R_j^2 / n_j`` term is the exact
    integer division ``R2_j^2 div (4*n_j)`` (truncation error < 1 per
    group against an N^3-scale sum — and identical on both engines, so
    hash-safe). H and its tie correction
    ``C = 1 - sum(t^3 - t)/(N^3 - N)`` are ONE fixed IEEE tree over those
    exact scalars, floor-published.

    Scale posture: raw rows collapse to the distinct-value table first
    (map-side combined); the cumulative below-count runs over value
    buckets via :func:`~.sampling.two_phase_running_sum` (no single-task
    window); per-(group, value) counts are a second map-side groupBy.

    Output: one row — ``n_total, n_groups, h_x1e6, h_adj_x1e6`` (NULL
    when every value is tied: C = 0).
    """
    per_group, ties = _kw_rank_sums(df, group_col, value_col, sub_bucket)
    # exact integer term R_j^2/n_j = R2_j^2 div (4 n_j); decimal div is
    # integer division on decimal(38,0) operands on both engines
    term = F.expr("CAST(__r2j * __r2j AS DECIMAL(38,0)) div CAST(4 * __nj AS DECIMAL(38,0))")
    g = per_group.agg(
        F.sum("__nj").cast("bigint").alias("n_total"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(term).cast("decimal(38,0)").alias("__s"),
    ).crossJoin(F.broadcast(ties))
    n = F.col("n_total").cast("double")
    h = (
        F.lit(12.0) * F.col("__s").cast("double") / (n * (n + F.lit(1.0)))
        - F.lit(3.0) * (n + F.lit(1.0))
    )
    c = F.lit(1.0) - F.col("__tie3").cast("double") / (n * n * n - n)
    pub = lambda col: F.floor(col * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")  # noqa: E731
    return g.select(
        "n_total",
        "n_groups",
        pub(h).alias("h_x1e6"),
        F.when(c <= F.lit(0.0), F.lit(None).cast("bigint"))
        .otherwise(pub(h / c))
        .alias("h_adj_x1e6"),
    )


def dunn_z_pub_sql(
    r2a: str, na: str, r2b: str, nb: str, N: str, tie3: str
) -> str:
    """Dunn (1964) pairwise post-hoc z after Kruskal-Wallis,
    |.|-floor-published at 1e6 — ONE SQL tree string used verbatim by
    the Spark operator (F.expr) and the DuckDB oracle (renamed scalars),
    the q290 verbatim-mirror pattern. Mean ranks come from DOUBLED
    rank-sums (``r2/(2n)``); the variance uses the tie-corrected
    ``N(N+1)/12 - sum(t^3-t)/(12(N-1))``. sqrt is IEEE-correctly
    rounded; every input is an exact integer/decimal scalar."""
    rb_a = f"(CAST({r2a} AS DOUBLE) / (2.0 * CAST({na} AS DOUBLE)))"
    rb_b = f"(CAST({r2b} AS DOUBLE) / (2.0 * CAST({nb} AS DOUBLE)))"
    var = (
        f"((CAST({N} AS DOUBLE) * (CAST({N} AS DOUBLE) + 1.0) / 12.0"
        f" - CAST({tie3} AS DOUBLE) / (12.0 * (CAST({N} AS DOUBLE) - 1.0)))"
        f" * (1.0/CAST({na} AS DOUBLE) + 1.0/CAST({nb} AS DOUBLE)))"
    )
    z = f"(({rb_a} - {rb_b}) / sqrt({var}))"
    return (
        f"CASE WHEN {N} < 2 OR {var} <= 0.0 THEN NULL"
        f" ELSE CAST(floor(abs({z}) * 1000000.0 + 0.5) AS BIGINT) END"
    )


def dunn_pairwise(
    df: DataFrame,
    group_col: str,
    value_col: Column | str,
    *,
    sub_bucket: Column | None = None,
) -> DataFrame:
    """Dunn's post-hoc pairwise comparisons (Dunn, Technometrics 1964)
    after :func:`kruskal_wallis`: for every group pair, the tie-corrected
    z of the mean-rank difference — WHICH groups differ, once the global
    H says SOME do. Feed the result to
    :func:`~.evaluation.bh_step_up` for the multiple-comparison control
    Dunn's procedure requires (k groups -> k(k-1)/2 tests).

    Shares :func:`_kw_rank_sums` (doubled integer midranks, two-phase
    below-counts, decimal rank-sums); the z is one verbatim-mirrored
    IEEE tree (:func:`dunn_z_pub_sql`). The pairwise join runs on a
    constant-key BROADCAST equi-join of the per-group table — bounded
    by the group cardinality k (an analysis parameter, not data volume),
    so k(k-1)/2 stays a driver-sized result at any corpus size.

    Output: ``(group_a, group_b, n_a, n_b, abs_z_x1e6)`` for a < b.
    """
    per_group, ties = _kw_rank_sums(df, group_col, value_col, sub_bucket)
    # r12 opt: per_group (k rows) feeds the total, the a-side and the
    # b-side — materialize once instead of three rank-sum pipelines.
    per_group = per_group.transform(materialize_once)
    tot = per_group.agg(
        F.sum("__nj").cast("bigint").alias("__nt")
    ).crossJoin(F.broadcast(ties))
    a = per_group.select(
        F.col("__g").alias("group_a"),
        F.col("__nj").alias("__na"),
        F.col("__r2j").alias("__r2a"),
        F.lit(1).alias("__one"),
    )
    b = per_group.select(
        F.col("__g").alias("group_b"),
        F.col("__nj").alias("__nb"),
        F.col("__r2j").alias("__r2b"),
        F.lit(1).alias("__one"),
    )
    pairs = (
        a.join(F.broadcast(b), "__one")
        .filter(F.col("group_a") < F.col("group_b"))
        .crossJoin(F.broadcast(tot))
    )
    return pairs.select(
        "group_a",
        "group_b",
        F.col("__na").alias("n_a"),
        F.col("__nb").alias("n_b"),
        F.expr(
            dunn_z_pub_sql(
                r2a="__r2a", na="__na", r2b="__r2b", nb="__nb",
                N="__nt", tie3="__tie3",
            )
        ).alias("abs_z_x1e6"),
    )


def brown_forsythe(
    df: DataFrame,
    group_col: str,
    value_col: Column | str,
    *,
    sub_bucket: Column | None = None,
    scale: int = 1_000_000,
) -> DataFrame:
    """Brown-Forsythe variance-homogeneity test (Brown & Forsythe, JASA
    1974): one-way ANOVA F on absolute deviations from each group's
    MEDIAN — the robust Levene variant, the spread-difference companion
    to :func:`kruskal_wallis`'s location test (KW assumes similar
    shapes; this is the check).

    Determinism contract: the center is the exact LOWER median (the
    order statistic at rank ceil(n/2), i.e. the smallest v with
    ``2 * cum_count(v) >= n`` — integer-exact, no interpolation;
    documented choice, mirrored verbatim in the oracle). Deviations are
    integers; the F statistic uses the per-term exact integer division
    ``s1_g^2 div n_g`` (the q292 per-term-floor discipline: truncation
    < 1 per group, identical on both engines), so
    ``F = ((N-k) * SSB*) / ((k-1) * SSW*)`` is ONE division of exact
    decimals, floor-published.

    Scale posture: distinct-(group, value) collapse first, per-group
    cumulative counts via :func:`~.sampling.two_phase_running_sum`
    (no one-task-per-group window), medians via a min over the flagged
    buckets, then one map-side-combined moment aggregate.

    Output: one row — ``n_total, n_groups, bf_f_x1e6`` (NULL when SSW*
    is zero: every deviation identical within groups).
    """
    from .sampling import two_phase_running_sum

    v = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "bigint"
    )
    base = df.filter(v.isNotNull() & F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("__g"), v.alias("__v")
    )
    gv = base.groupBy("__g", "__v").agg(
        F.count(F.lit(1)).cast("bigint").alias("__ngv")
    )
    sub = sub_bucket if sub_bucket is not None else F.expr("__v div 65536")
    run = two_phase_running_sum(
        gv, ["__g"], [F.asc("__v")], F.col("__ngv"), sub, out_col="__ci"
    )
    totals = gv.groupBy("__g").agg(F.sum("__ngv").cast("bigint").alias("__ng"))
    med = (
        run.join(F.broadcast(totals), "__g")
        .filter(F.lit(2) * F.col("__ci") >= F.col("__ng"))
        .groupBy("__g")
        .agg(F.min("__v").alias("__med"))
    )
    z = base.join(F.broadcast(med), "__g").select(
        "__g", F.abs(F.col("__v") - F.col("__med")).cast("bigint").alias("__z")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    pg = z.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("__ng"),
        F.sum(dec(F.col("__z"))).cast("decimal(38,0)").alias("__s1"),
        F.sum(dec(F.col("__z")) * F.col("__z")).cast("decimal(38,0)").alias("__s2"),
    )
    term = F.expr(
        "CAST(__s1 * __s1 AS DECIMAL(38,0)) div CAST(__ng AS DECIMAL(38,0))"
    )
    agg = pg.agg(
        F.sum("__ng").cast("bigint").alias("n_total"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(term).cast("decimal(38,0)").alias("__t"),
        F.sum("__s1").cast("decimal(38,0)").alias("__g1"),
        F.sum("__s2").cast("decimal(38,0)").alias("__g2"),
    )
    grand = F.expr(
        "CAST(__g1 * __g1 AS DECIMAL(38,0)) div CAST(n_total AS DECIMAL(38,0))"
    )
    ssb = F.col("__t") - grand
    ssw = F.col("__g2") - F.col("__t")
    n = F.col("n_total").cast("decimal(38,0)")
    k = F.col("n_groups").cast("decimal(38,0)")
    f_num = ((n - k) * ssb).cast("double")
    f_den = ((k - F.lit(1).cast("decimal(38,0)")) * ssw).cast("double")
    return agg.select(
        "n_total",
        "n_groups",
        F.when(
            (F.col("n_groups") < 2) | (ssw <= F.lit(0).cast("decimal(38,0)")),
            F.lit(None).cast("bigint"),
        )
        .otherwise(
            F.floor(f_num / f_den * F.lit(float(scale)) + F.lit(0.5)).cast(
                "bigint"
            )
        )
        .alias("bf_f_x1e6"),
    )


def cliffs_delta_pairwise(
    df: DataFrame,
    group_col: str,
    value_col: Column | str,
    *,
    sub_bucket: Column | None = None,
    scale: int = 1_000_000,
) -> DataFrame:
    """Cliff's delta ordinal effect size for every group pair (Cliff,
    Psychological Bulletin 1993): ``delta = (#(x>y) - #(x<y)) /
    (n_a * n_b)`` — the magnitude companion to :func:`dunn_pairwise`'s
    significance z (a tiny shift is "significant" at corpus n; delta
    says whether anyone should care). Magnitude labels follow Romano
    et al. 2006 (0.147 / 0.33 / 0.474).

    Exact throughout: the dominance counts come from per-group
    cumulative counts over the SHARED distinct-value axis —
    ``#(x_a > y_b) - #(x_a < y_b) = sum_v n_a(v) * (2*cum_b(v) - n_b(v)
    - n_b)`` where ``cum_b`` is b's inclusive cumulative count at v —
    so the numerator is one decimal(38,0) sum of integer products and
    delta is ONE division, floor-published.

    Scale posture: rows collapse to the distinct-(group, value) table;
    the group axis is densified over the shared value axis (k * |values|
    rows — values are integer/bucketed by the module contract, callers
    quantize continuous scores first); cumulative counts run two-phase;
    the pairwise combine is an equi-join ON THE VALUE KEY (never a
    cartesian), map-side aggregated to k(k-1)/2 rows.

    Output: ``(group_a, group_b, n_a, n_b, delta_x1e6, magnitude)``.
    """
    from .sampling import two_phase_running_sum

    v = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "bigint"
    )
    base = df.filter(v.isNotNull() & F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("__g"), v.alias("__v")
    )
    gv = base.groupBy("__g", "__v").agg(
        F.count(F.lit(1)).cast("bigint").alias("__ngv")
    )
    # densify groups over the shared value axis via a constant-key
    # broadcast equi-join (k rows broadcast; a BroadcastHashJoin, so the
    # plan-audit's no-cartesian/benign-BNLJ discipline holds)
    vals = gv.select("__v").distinct().withColumn("__one", F.lit(1))
    groups = gv.select("__g").distinct().withColumn("__one", F.lit(1))
    lattice = (
        vals.join(F.broadcast(groups), "__one")
        .drop("__one")
        .join(gv, ["__g", "__v"], "left")
        .na.fill({"__ngv": 0})
    )
    sub = sub_bucket if sub_bucket is not None else F.expr("__v div 65536")
    run = two_phase_running_sum(
        lattice, ["__g"], [F.asc("__v")], F.col("__ngv"), sub, out_col="__ci"
    )
    totals = gv.groupBy("__g").agg(F.sum("__ngv").cast("bigint").alias("__ng"))
    full = run.join(F.broadcast(totals), "__g")
    a = full.select(
        F.col("__v").alias("__va"),
        F.col("__g").alias("group_a"),
        F.col("__ngv").alias("__na_v"),
        F.col("__ng").alias("n_a"),
    )
    b = full.select(
        F.col("__v").alias("__vb"),
        F.col("__g").alias("group_b"),
        F.col("__ngv").alias("__nb_v"),
        F.col("__ci").alias("__cb"),
        F.col("__ng").alias("n_b"),
    )
    contrib = (
        F.col("__na_v").cast("decimal(38,0)")
        * (
            F.lit(2) * F.col("__cb") - F.col("__nb_v") - F.col("n_b")
        ).cast("decimal(38,0)")
    )
    pairs = (
        a.join(b, a["__va"] == b["__vb"])
        .filter(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b", "n_a", "n_b")
        .agg(F.sum(contrib).cast("decimal(38,0)").alias("__num"))
    )
    delta = F.col("__num").cast("double") / (
        F.col("n_a").cast("double") * F.col("n_b").cast("double")
    )
    dx = F.floor(delta * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
    mag = (
        F.when(F.abs(dx) < 147000, F.lit("negligible"))
        .when(F.abs(dx) < 330000, F.lit("small"))
        .when(F.abs(dx) < 474000, F.lit("medium"))
        .otherwise(F.lit("large"))
    )
    return pairs.select(
        "group_a", "group_b", "n_a", "n_b",
        dx.alias("delta_x1e6"), mag.alias("magnitude"),
    )


def oneway_anova_f(
    df: DataFrame,
    group_col: str,
    value_col: Column | str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Classic one-way ANOVA F (Fisher 1925) on raw integer values — the
    parametric location test completing the k-group trio: q304's
    Kruskal-Wallis (rank), q308's Brown-Forsythe (spread), and this
    (means under equal-variance normality).

    Shares :func:`brown_forsythe`'s exact-moment machinery minus the
    median-deviation step: per-group ``(n_g, s1_g, s2_g)`` in
    decimal(38,0), the per-group ``s1_g^2 div n_g`` exact integer terms
    (truncation < 1 per group — identical on both engines), grand term
    the same, and ``F = ((N-k) * SSB*) / ((k-1) * SSW*)`` is ONE
    division of exact decimals, floor-published at 1e6.

    Scale posture: one map-side-combined groupBy over the corpus, then
    a k-row aggregate — no windows, no joins.

    Output: one row — ``n_total, n_groups, f_x1e6`` (NULL when k < 2 or
    SSW* <= 0).
    """
    v = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "bigint"
    )
    base = df.filter(v.isNotNull() & F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("__g"), v.alias("__v")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    pg = base.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("__ng"),
        F.sum(dec(F.col("__v"))).cast("decimal(38,0)").alias("__s1"),
        F.sum(dec(F.col("__v")) * F.col("__v"))
        .cast("decimal(38,0)")
        .alias("__s2"),
    )
    term = F.expr(
        "CAST(__s1 * __s1 AS DECIMAL(38,0)) div CAST(__ng AS DECIMAL(38,0))"
    )
    agg = pg.agg(
        F.sum("__ng").cast("bigint").alias("n_total"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(term).cast("decimal(38,0)").alias("__t"),
        F.sum("__s1").cast("decimal(38,0)").alias("__g1"),
        F.sum("__s2").cast("decimal(38,0)").alias("__g2"),
    )
    grand = F.expr(
        "CAST(__g1 * __g1 AS DECIMAL(38,0)) div CAST(n_total AS DECIMAL(38,0))"
    )
    ssb = F.col("__t") - grand
    ssw = F.col("__g2") - F.col("__t")
    n = F.col("n_total").cast("decimal(38,0)")
    k = F.col("n_groups").cast("decimal(38,0)")
    f_num = ((n - k) * ssb).cast("double")
    f_den = ((k - F.lit(1).cast("decimal(38,0)")) * ssw).cast("double")
    return agg.select(
        "n_total",
        "n_groups",
        F.when(
            (F.col("n_groups") < 2)
            | (ssw <= F.lit(0).cast("decimal(38,0)")),
            F.lit(None).cast("bigint"),
        )
        .otherwise(
            F.floor(f_num / f_den * F.lit(float(scale)) + F.lit(0.5)).cast(
                "bigint"
            )
        )
        .alias("f_x1e6"),
    )


def welch_t_test(
    df: DataFrame,
    group_col: str,
    label_a: str,
    label_b: str,
    value_col: Column | str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Welch's unequal-variance two-sample t test (Welch, Biometrika
    1947) with the Welch-Satterthwaite df — the parametric mean
    comparison that does NOT assume equal spread (q308 tests exactly
    that assumption; when it fails, this is the test to use instead of
    pooled t).

    Exactness: per-group counts and first/second moments are exact
    decimal(38,0); the mean difference, per-group variance terms
    ``v_g = s2_g/n_g - (s1_g/n_g)^2`` (computed in the equivalent exact
    cross-multiplied form ``(n*s2 - s1^2) / (n^2 * (n-1)) * n`` — one
    IEEE tree over exact scalars), t and df are each ONE mirrored tree,
    floor-published at 1e6.

    Output: one row — ``n_a, n_b, t_x1e6, df_x1e6`` (NULL when either
    n < 2 or both sample variances are zero).
    """
    g = F.col(group_col)
    v = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "bigint"
    )
    base = df.filter(v.isNotNull() & g.isin([label_a, label_b])).select(
        F.when(g == F.lit(label_a), F.lit(0)).otherwise(F.lit(1)).alias("__s"),
        v.alias("__v"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = base.agg(
        F.sum(F.when(F.col("__s") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("__s") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when(F.col("__s") == 0, dec(F.col("__v"))).otherwise(
            F.lit(0).cast("decimal(38,0)")
        )).cast("decimal(38,0)").alias("__sa"),
        F.sum(F.when(F.col("__s") == 1, dec(F.col("__v"))).otherwise(
            F.lit(0).cast("decimal(38,0)")
        )).cast("decimal(38,0)").alias("__sb"),
        F.sum(F.when(F.col("__s") == 0, dec(F.col("__v")) * F.col("__v"))
              .otherwise(F.lit(0).cast("decimal(38,0)")))
        .cast("decimal(38,0)").alias("__qa"),
        F.sum(F.when(F.col("__s") == 1, dec(F.col("__v")) * F.col("__v"))
              .otherwise(F.lit(0).cast("decimal(38,0)")))
        .cast("decimal(38,0)").alias("__qb"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    # sample variance s^2 = (n*q - s^2) / (n*(n-1)); var-of-mean = s^2/n
    va = (
        F.col("n_a").cast("decimal(38,0)") * F.col("__qa")
        - F.col("__sa") * F.col("__sa")
    ).cast("double") / (na * na * (na - F.lit(1.0)))
    vb = (
        F.col("n_b").cast("decimal(38,0)") * F.col("__qb")
        - F.col("__sb") * F.col("__sb")
    ).cast("double") / (nb * nb * (nb - F.lit(1.0)))
    mdiff = (
        F.col("__sa").cast("double") / na
        - F.col("__sb").cast("double") / nb
    )
    se2 = va + vb
    t = mdiff / F.sqrt(se2)
    dfree = (se2 * se2) / (
        va * va / (na - F.lit(1.0)) + vb * vb / (nb - F.lit(1.0))
    )
    pub = lambda col: F.floor(col * F.lit(float(scale)) + F.lit(0.5)).cast(  # noqa: E731
        "bigint"
    )
    bad = (
        (F.col("n_a") < 2) | (F.col("n_b") < 2) | (se2 <= F.lit(0.0))
    )
    return agg.select(
        "n_a",
        "n_b",
        F.when(bad, F.lit(None).cast("bigint")).otherwise(pub(t)).alias(
            "t_x1e6"
        ),
        F.when(bad, F.lit(None).cast("bigint")).otherwise(pub(dfree)).alias(
            "df_x1e6"
        ),
    )


def seasonal_mann_kendall(
    df: DataFrame,
    key_col: str,
    season_col: Column | str,
    ts_col: str,
    value_col: str,
    *,
    scale: int = 100,
    z_crit: float = 1.96,
) -> DataFrame:
    """Seasonal Mann-Kendall trend test per key (Hirsch & Slack, Water
    Resour. Res. 1984): the :func:`mann_kendall_trend` S statistic
    computed WITHIN each season (e.g. each weekday) and summed — so a
    strong weekly cycle can neither fake nor mask a real monotone
    drift, the failure mode of running plain MK on seasonal data.

    ``S = sum_seasons S_season`` and ``18*Var(S) = sum_seasons
    [n(n-1)(2n+5) - sum t(t-1)(2t+5)]`` stay exact BIGINTs (the
    independent-seasons form; serial-correlation adjustment out of
    scope, as in the original); z applies the same +/-1 continuity
    correction as plain MK — ONE mirrored IEEE tree.

    ``season_col`` must be constant within a day (e.g.
    ``F.dayofweek(ts)``); it partitions pair comparisons and is never
    published, so Spark's and an oracle engine's different weekday
    ENCODINGS cannot leak into the result (the repo's dayofweek rule).

    Scale posture: identical to plain MK with seasons folded into the
    pair-join key — |keys| x |seasons| x O(days-per-season^2) inside
    key-partitioned tasks, calendar-bounded.

    Output: ``(key_col, n_days, n_seasons, s_stat, var18, z_x1e6,
    trend)``.
    """
    season = F.col(season_col) if isinstance(season_col, str) else season_col
    vq = F.floor(F.col(value_col).cast("double") * scale + F.lit(0.5)).cast(
        "bigint"
    )
    daily = (
        df.select(
            F.col(key_col).alias("__key"),
            season.alias("__sea"),
            F.to_date(F.col(ts_col)).alias("day"),
            vq.alias("__vq"),
        )
        .groupBy("__key", "__sea", "day")
        .agg(F.sum("__vq").cast("bigint").alias("dv"))
    )
    a = daily.select(
        "__key", "__sea", F.col("day").alias("__da"), F.col("dv").alias("__va")
    )
    b = daily.select(
        "__key", "__sea", F.col("day").alias("__db"), F.col("dv").alias("__vb")
    )
    s = (
        a.join(b, ["__key", "__sea"])
        .filter(F.col("__da") < F.col("__db"))
        .groupBy("__key", "__sea")
        .agg(
            F.sum(
                F.when(F.col("__vb") > F.col("__va"), 1)
                .when(F.col("__vb") < F.col("__va"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("__s")
        )
    )
    n_ = daily.groupBy("__key", "__sea").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n")
    )
    ties = (
        daily.groupBy("__key", "__sea", "dv")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
        .filter(F.col("__c") >= 2)
        .groupBy("__key", "__sea")
        .agg(
            F.sum(
                F.col("__c") * (F.col("__c") - 1) * (2 * F.col("__c") + 5)
            )
            .cast("bigint")
            .alias("__tsum")
        )
    )
    per_season = (
        n_.join(s, ["__key", "__sea"], "left")
        .join(ties, ["__key", "__sea"], "left")
        .select(
            "__key",
            "__n",
            F.coalesce(F.col("__s"), F.lit(0).cast("bigint")).alias("__s"),
            (
                F.col("__n") * (F.col("__n") - 1) * (2 * F.col("__n") + 5)
                - F.coalesce(F.col("__tsum"), F.lit(0).cast("bigint"))
            )
            .cast("bigint")
            .alias("__v18"),
        )
    )
    base = per_season.groupBy("__key").agg(
        F.sum("__n").cast("bigint").alias("n_days"),
        F.count(F.lit(1)).cast("bigint").alias("n_seasons"),
        F.sum("__s").cast("bigint").alias("s_stat"),
        F.sum("__v18").cast("bigint").alias("var18"),
    )
    sd = F.col("s_stat").cast("double")
    v = F.col("var18").cast("double") / F.lit(18.0)
    z = (
        F.when((F.col("var18") <= 0) | (F.col("s_stat") == 0), F.lit(0.0))
        .when(F.col("s_stat") > 0, (sd - F.lit(1.0)) / F.sqrt(v))
        .otherwise((sd + F.lit(1.0)) / F.sqrt(v))
    )
    zq = F.floor(z * F.lit(1_000_000.0)).cast("bigint")
    crit = int(z_crit * 1_000_000)
    return base.select(
        F.col("__key").alias(key_col),
        "n_days",
        "n_seasons",
        "s_stat",
        "var18",
        zq.alias("z_x1e6"),
        F.when(zq > F.lit(crit), F.lit("increasing"))
        .when(zq < F.lit(-crit), F.lit("decreasing"))
        .otherwise(F.lit("no_trend"))
        .alias("trend"),
    )


def bartlett_test(
    df: DataFrame,
    group_col: str,
    value_col: Column | str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Bartlett's variance-homogeneity test (Bartlett, Proc. R. Soc.
    1937) — the PARAMETRIC spread test (chi-square under normality)
    whose robust sibling is q308's Brown-Forsythe: more powerful when
    normality holds, famously fragile when it doesn't (run both; if
    they disagree, trust Brown-Forsythe and suspect the tails).

    Determinism: per-group sample variances are ONE mirrored IEEE tree
    each over exact decimal moments (``(n*q - s^2) / (n*(n-1))``), then
    land on the 1e-9 ln lattice (the loglog_slope discipline — ln is
    the one libm op that may differ across engines); the weighted sums
    ``sum (n_j-1)*ln_lat(s_j^2)`` and the correction's
    ``sum 1e12 div (n_j-1)`` are exact BIGINT/decimal sums (float
    summation order never enters); the statistic

        ``B = [(N-k)*ln(s_p^2) - sum (n_j-1)*ln(s_j^2)] / C``,
        ``C = 1 + (sum 1/(n_j-1) - 1/(N-k)) / (3(k-1))``

    is ONE final IEEE tree, floor-published at 1e6.

    Groups with n_j < 2 are excluded (variance undefined — the
    textbook requirement); any zero-variance group publishes NULL.

    Output: one row — ``n_total, n_groups, b_x1e6``.
    """
    v = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "bigint"
    )
    base = df.filter(v.isNotNull() & F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("__g"), v.alias("__v")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    pg = (
        base.groupBy("__g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("__ng"),
            F.sum(dec(F.col("__v"))).cast("decimal(38,0)").alias("__s1"),
            F.sum(dec(F.col("__v")) * F.col("__v"))
            .cast("decimal(38,0)")
            .alias("__s2"),
        )
        .filter(F.col("__ng") >= 2)
    )
    nd = F.col("__ng").cast("double")
    varnum = (
        F.col("__ng").cast("decimal(38,0)") * F.col("__s2")
        - F.col("__s1") * F.col("__s1")
    )
    s2 = varnum.cast("double") / (nd * (nd - F.lit(1.0)))
    ln_lat = F.floor(F.round(F.log(s2), 9) * F.lit(1e9) + F.lit(0.5)).cast(
        "bigint"
    )
    inv_lat = F.expr(
        "CAST(1000000000000 AS DECIMAL(38,0))"
        " div CAST(__ng - 1 AS DECIMAL(38,0))"
    )
    terms = pg.select(
        "__ng",
        varnum.alias("__vn"),
        F.when(varnum > F.lit(0).cast("decimal(38,0)"), ln_lat).alias("__ll"),
        inv_lat.cast("bigint").alias("__inv"),
        # SSW accumulates exactly: (n-1)*s^2 = varnum/n, per-term floor
        # on the 1e-6 lattice for the pooled variance numerator
        F.expr(
            "CAST((__ng * __s2 - __s1 * __s1) * 1000000 AS DECIMAL(38,0))"
            " div CAST(__ng AS DECIMAL(38,0))"
        ).alias("__ssw_q"),
    )
    agg = terms.agg(
        F.sum("__ng").cast("bigint").alias("n_total"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.min(F.col("__vn")).alias("__minvn"),
        F.sum((F.col("__ng") - 1).cast("decimal(38,0)") * F.col("__ll"))
        .cast("decimal(38,0)")
        .alias("__wln"),
        F.sum("__inv").cast("decimal(38,0)").alias("__sinv"),
        F.sum("__ssw_q").cast("decimal(38,0)").alias("__sswq"),
    )
    n = F.col("n_total").cast("double")
    k = F.col("n_groups").cast("double")
    sp2 = F.col("__sswq").cast("double") / (
        F.lit(1e6) * (n - k)
    )
    ln_sp = F.floor(F.round(F.log(sp2), 9) * F.lit(1e9) + F.lit(0.5))
    num = ((n - k) * ln_sp - F.col("__wln").cast("double")) / F.lit(1e9)
    c_corr = F.lit(1.0) + (
        F.col("__sinv").cast("double") / F.lit(1e12)
        - F.lit(1.0) / (n - k)
    ) / (F.lit(3.0) * (k - F.lit(1.0)))
    b = num / c_corr
    return agg.select(
        "n_total",
        "n_groups",
        F.when(
            (F.col("n_groups") < 2)
            | (F.col("__minvn") <= F.lit(0).cast("decimal(38,0)")),
            F.lit(None).cast("bigint"),
        )
        .otherwise(
            F.floor(b * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
        )
        .alias("b_x1e6"),
    )


def g_test_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """G-test of independence (log-likelihood ratio; Sokal & Rohlf,
    Biometry): ``G = 2 * sum obs * ln(obs*N / (r*c))`` over the
    contingency cells — chi-square's likelihood twin (additive across
    table partitions, better behaved for small expected counts), on the
    SAME marginal machinery as :func:`chisq_independence`.

    Determinism: each cell's likelihood ratio ``obs*N/(r*c)`` is one
    IEEE tree over exact BIGINT/decimal products, its ln lands on the
    1e-9 lattice, the per-cell term ``obs * ln_lat`` is an exact BIGINT
    product summed as DECIMAL(38,0) — float summation order never
    enters — and G is one published division.

    Output: one row — ``n, n_a, n_b, dof, g_x1e6``.
    """
    a, b = F.col(col_a), F.col(col_b)
    base = df.filter(a.isNotNull() & b.isNotNull()).select(
        a.alias("__a"), b.alias("__b")
    )
    cells = base.groupBy("__a", "__b").agg(
        F.count(F.lit(1)).cast("bigint").alias("__obs")
    )
    rows = base.groupBy("__a").agg(F.count(F.lit(1)).cast("bigint").alias("__r"))
    cols = base.groupBy("__b").agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
    total = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.countDistinct("__a").cast("bigint").alias("n_a"),
        F.countDistinct("__b").cast("bigint").alias("n_b"),
    )
    dec = "decimal(38,0)"
    joined = (
        cells.join(F.broadcast(rows), "__a")
        .join(F.broadcast(cols), "__b")
        .crossJoin(F.broadcast(total))
    )
    ratio = (
        F.col("__obs").cast(dec) * F.col("__n").cast(dec)
    ).cast("double") / (
        F.col("__r").cast(dec) * F.col("__c").cast(dec)
    ).cast("double")
    ln_lat = F.floor(F.round(F.log(ratio), 9) * F.lit(1e9) + F.lit(0.5)).cast(
        "bigint"
    )
    term = F.col("__obs").cast(dec) * ln_lat
    agg = joined.agg(
        F.max("__n").cast("bigint").alias("n"),
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.sum(term).cast(dec).alias("__gq"),
    )
    g = F.lit(2.0) * F.col("__gq").cast("double") / F.lit(1e9)
    return agg.select(
        "n",
        "n_a",
        "n_b",
        ((F.col("n_a") - 1) * (F.col("n_b") - 1)).cast("bigint").alias("dof"),
        F.floor(g * F.lit(float(scale)) + F.lit(0.5)).cast("bigint").alias(
            "g_x1e6"
        ),
    )


def jarque_bera(
    df: DataFrame,
    group_col: str,
    value_col: Column | str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Jarque-Bera normality test (Jarque & Bera, Econ. Lett. 1980) per
    group — the gate behind the parametric branch of the k-group suite:
    q328's Bartlett and q325's Welch assume normality; JB quantifies how
    wrong that is from the skewness/kurtosis the data actually has.

    Engine-exactness: the scaled central moments

        ``M2 = n*S2 - S1^2``
        ``M3 = n^2*S3 - 3n*S1*S2 + 2*S1^3``
        ``M4 = n^3*S4 - 4n^2*S1*S3 + 6n*S1^2*S2 - 3*S1^4``

    are exact integer polynomials in the raw power sums (decimal(38,0)
    here == HUGEINT in DuckDB), and the n-powers CANCEL in the
    standardized ratios: ``g1 = M3 / M2^1.5`` and ``g2 = M4/M2^2 - 3``
    (since m_k = M_k / n^(k+1) with the same n exponent top and bottom).
    So skewness, excess kurtosis, and ``JB = n*(g1^2/6 + g2^2/24)`` are
    each ONE mirrored IEEE tree over exact integers — sqrt is correctly
    rounded by IEEE-754, no libm dependence — floor-published on the
    declared lattices.

    Magnitude bound (documented contract): M4 grows as ``n^4 * m4``, so
    the exact path needs ``n^4 * spread^4 < 1e38`` — for a bounded value
    lattice like l_quantity (spread <= 50) that is n up to ~2e7 rows PER
    GROUP; beyond it the decimal(38,0) cast fails LOUDLY (ANSI), never
    silently wrongly. For wider lattices, pre-shift the values by an
    integer pivot (central moments are shift-invariant) or coarsen the
    lattice at the call site.

    Scale posture: one map-side-combined groupBy over the corpus, then
    per-group column math — no windows, no joins.

    Output: per group — ``<group_col>, n, skew_x1e9, exkurt_x1e9,
    jb_x1e6`` (stats NULL when n < 2 or M2 <= 0, i.e. all values equal).
    """
    v = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "bigint"
    )
    base = df.filter(v.isNotNull() & F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("__g"), v.alias("__v")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    vd = dec(F.col("__v"))
    pg = base.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(vd).cast("decimal(38,0)").alias("__s1"),
        F.sum(vd * F.col("__v")).cast("decimal(38,0)").alias("__s2"),
        F.sum(vd * F.col("__v") * F.col("__v"))
        .cast("decimal(38,0)")
        .alias("__s3"),
        F.sum(vd * F.col("__v") * F.col("__v") * F.col("__v"))
        .cast("decimal(38,0)")
        .alias("__s4"),
    )
    nn = dec(F.col("n"))
    s1, s2, s3, s4 = (F.col(f"__s{i}") for i in (1, 2, 3, 4))
    m2 = (nn * s2 - s1 * s1).cast("decimal(38,0)")
    m3 = (nn * nn * s3 - F.lit(3).cast("decimal(38,0)") * nn * s1 * s2
          + F.lit(2).cast("decimal(38,0)") * s1 * s1 * s1).cast("decimal(38,0)")
    m4 = (
        nn * nn * nn * s4
        - F.lit(4).cast("decimal(38,0)") * nn * nn * s1 * s3
        + F.lit(6).cast("decimal(38,0)") * nn * s1 * s1 * s2
        - F.lit(3).cast("decimal(38,0)") * s1 * s1 * s1 * s1
    ).cast("decimal(38,0)")
    staged = pg.select(
        "__g", "n", m2.alias("__m2"), m3.alias("__m3"), m4.alias("__m4")
    )
    m2d = F.col("__m2").cast("double")
    skew = F.col("__m3").cast("double") / (m2d * F.sqrt(m2d))
    exk = F.col("__m4").cast("double") / (m2d * m2d) - F.lit(3.0)
    jb = F.col("n").cast("double") * (
        skew * skew / F.lit(6.0) + exk * exk / F.lit(24.0)
    )
    bad = (F.col("n") < 2) | (F.col("__m2") <= F.lit(0).cast("decimal(38,0)"))
    pub = lambda expr, s: F.when(  # noqa: E731
        bad, F.lit(None).cast("bigint")
    ).otherwise(F.floor(expr * F.lit(float(s)) + F.lit(0.5)).cast("bigint"))
    return staged.select(
        F.col("__g").alias(group_col),
        "n",
        pub(skew, 1_000_000_000).alias("skew_x1e9"),
        pub(exk, 1_000_000_000).alias("exkurt_x1e9"),
        pub(jb, scale).alias("jb_x1e6"),
    )


def winsorized_mean(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    tiebreak_col: str,
    *,
    winsor_pct: int = 5,
    scale: int = 100,
    sub_bucket_width: int = 1_000,
) -> DataFrame:
    """Per-group symmetric winsorized mean (Tukey & McLaughlin, Sankhya
    1963) — :func:`trimmed_mean`'s sibling that CLAMPS the tails to the
    cut order statistics instead of dropping them (keeps n constant, so
    downstream SE formulas stay honest; the robust-location estimate of
    choice when the tail rows are real but untrusted).

    Same exact machinery as trimmed_mean: per-group order statistics via
    the two-phase running count (sub-bucketed, never a one-task sort
    window), integer cut index ``k = n * winsor_pct div 100``, clamp
    values = the EXACT rank-(k+1) and rank-(n-k) order statistics
    (fetched as two rows of the ranked relation, broadcast back), and

        ``wsum = sum_{k < rank <= n-k} v  +  k*v_(k+1)  +  k*v_(n-k)``

    is an exact integer; the mean is ONE IEEE division, floor-published
    x1e6 on the original value scale.

    Output: ``(group_cols..., n, n_clamped, mean_x1e6)``.
    """
    vq = F.floor(F.col(value_col).cast("double") * scale + F.lit(0.5)).cast(
        "bigint"
    )
    base = df.select(
        *[F.col(c) for c in group_cols],
        vq.alias("__vq"),
        F.col(tiebreak_col).alias("__tb"),
    ).filter(F.col("__vq").isNotNull())
    from .sampling import two_phase_running_sum

    ranked = two_phase_running_sum(
        base,
        list(group_cols),
        [F.col("__vq"), F.col("__tb")],
        F.lit(1),
        F.expr(f"__vq div {int(sub_bucket_width)}"),
        out_col="__rank",
    )
    tot = base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n")
    )
    j = ranked.join(F.broadcast(tot), list(group_cols))
    k = F.expr(f"__n * {int(winsor_pct)} div 100")
    jk = j.withColumn("__k", k)
    cuts = (
        jk.filter(
            (F.col("__rank") == F.col("__k") + 1)
            | (F.col("__rank") == F.col("__n") - F.col("__k"))
        )
        .groupBy(*group_cols)
        .agg(
            F.max(
                F.when(F.col("__rank") == F.col("__k") + 1, F.col("__vq"))
            ).alias("__lo"),
            F.max(
                F.when(F.col("__rank") == F.col("__n") - F.col("__k"), F.col("__vq"))
            ).alias("__hi"),
        )
    )
    mid = (
        jk.filter(
            (F.col("__rank") > F.col("__k"))
            & (F.col("__rank") <= F.col("__n") - F.col("__k"))
        )
        .groupBy(*group_cols)
        .agg(
            F.max("__n").cast("bigint").alias("n"),
            F.max("__k").cast("bigint").alias("__kk"),
            F.sum(F.col("__vq").cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .alias("__mid"),
        )
    )
    out = mid.join(F.broadcast(cuts), list(group_cols))
    dec = "decimal(38,0)"
    wsum = (
        F.col("__mid")
        + F.col("__kk").cast(dec) * F.col("__lo")
        + F.col("__kk").cast(dec) * F.col("__hi")
    ).cast(dec)
    return out.select(
        *group_cols,
        "n",
        (F.lit(2) * F.col("__kk")).cast("bigint").alias("n_clamped"),
        F.floor(
            F.lit(1_000_000.0)
            * wsum.cast("double")
            / F.col("n").cast("double")
            / F.lit(float(scale))
        )
        .cast("bigint")
        .alias("mean_x1e6"),
    )


def cochran_armitage(
    df: DataFrame,
    score_col: Column | str,
    outcome_col: Column | str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Cochran-Armitage test for linear trend in proportions (Cochran
    Biometrics 1954; Armitage Biometrics 1955): does a binary outcome
    rate move monotonically with an ORDERED integer exposure score? The
    2xk companion to q312's Jonckheere-Terpstra (which orders a
    CONTINUOUS response) and the inferential upgrade of a per-category
    rate table.

    Fully exact arithmetic — no IEEE anywhere: with per-category
    integer counts ``n_i`` (rows at score s_i) and ``x_i`` (successes),
    ``N = sum n_i``, ``X = sum x_i``,

        ``A   = N*sum(s_i x_i) - X*sum(s_i n_i)``        (trend numerator)
        ``B   = N*sum(s_i^2 n_i) - (sum(s_i n_i))^2``    (score spread)
        ``Z^2 = A^2 * N / (X*(N-X) * B)``

    every quantity is an exact decimal(38,0) integer and the statistic
    publishes as ONE exact integer division on the x1e6 lattice.
    Magnitude contract: A^2*N <= s_max^2*N^5 must stay below 1e38
    (s_max = 5, N <= ~3e6 for the default scores; loud ANSI overflow
    beyond — the jarque_bera pattern).

    Scale posture: ONE map-side-combined global aggregate over the fact
    table (scores enter as expressions, categories never materialize).

    Output: ONE row — ``n, successes, trend_num`` (A, sign = direction
    of the trend) ``, chi2_x1e6`` (NULL when X = 0, X = N, or B = 0:
    degenerate outcome or single category).
    """
    s = (
        F.col(score_col) if isinstance(score_col, str) else score_col
    ).cast("bigint")
    y = (
        F.col(outcome_col) if isinstance(outcome_col, str) else outcome_col
    ).cast("boolean")
    dec = "decimal(38,0)"
    base = df.select(s.alias("__s"), y.alias("__y")).filter(
        F.col("__s").isNotNull() & F.col("__y").isNotNull()
    )
    agg = base.agg(
        F.count(F.lit(1)).cast(dec).alias("__n"),
        F.sum(F.when(F.col("__y"), 1).otherwise(0)).cast(dec).alias("__x"),
        F.sum(F.col("__s").cast(dec)).cast(dec).alias("__sn"),
        F.sum(F.col("__s").cast(dec) * F.col("__s")).cast(dec).alias("__s2n"),
        F.sum(F.when(F.col("__y"), F.col("__s")).otherwise(0).cast(dec))
        .cast(dec)
        .alias("__sx"),
    )
    a = (F.col("__n") * F.col("__sx") - F.col("__x") * F.col("__sn")).cast(
        dec
    )
    b = (
        F.col("__n") * F.col("__s2n") - F.col("__sn") * F.col("__sn")
    ).cast(dec)
    staged = agg.select(
        F.col("__n").cast("bigint").alias("n"),
        F.col("__x").cast("bigint").alias("successes"),
        a.alias("__a"),
        b.alias("__b"),
        (F.col("__x") * (F.col("__n") - F.col("__x"))).cast(dec).alias("__xq"),
    )
    return staged.select(
        "n",
        "successes",
        F.col("__a").cast("bigint").alias("trend_num"),
        F.when(
            (F.col("__xq") <= 0) | (F.col("__b") <= 0),
            F.lit(None).cast("bigint"),
        )
        .otherwise(
            F.expr(
                f"CAST(CAST(__a * __a AS {dec}) * CAST(n AS {dec})"
                f" * CAST({int(scale)} AS {dec}) AS {dec})"
                f" div CAST(__xq * __b AS {dec})"
            )
        )
        .alias("chi2_x1e6"),
    )


def ols2_closed_form(
    df: DataFrame,
    y_col: Column | str,
    x1_col: Column | str,
    x2_col: Column | str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Two-regressor OLS with intercept in closed form (normal
    equations via Cramer's rule on the centered system; Legendre 1805 /
    Gauss): coefficients, intercept, and R^2 from ONE map-side-combined
    scan of exact raw power sums — the distributed-regression primitive
    (a 1000-executor cluster reduces nine decimals, the driver does six
    float operations).

    With exact centered cross-moments (x n to clear means):

        ``S11 = n*Sx1x1 - Sx1^2``  (and S22, S12, S1y, S2y, Syy alike)
        ``b1  = (S1y*S22 - S2y*S12) / (S11*S22 - S12^2)``
        ``b2  = (S2y*S11 - S1y*S12) / (S11*S22 - S12^2)``
        ``b0  = (Sy - b1*Sx1 - b2*Sx2) / n``
        ``R^2 = (b1*S1y + b2*S2y) / Syy``

    The centered sums are exact DECIMAL(38,0) integers; the four
    published statistics are each ONE IEEE tree over their doubles (the
    determinant is evaluated in float from exact factors — both engines
    round identically).  Collinear regressors (det <= 0 after float
    rounding) and constant y publish NULLs.

    Magnitude contract: centered sums grow as n^2 * spread^2 — with
    cent-lattice y up to 1e9 and n up to ~3e8 rows the DECIMAL(38,0)
    bound holds; beyond, ANSI fails loudly (pre-scale the lattice).

    Input contract: y/x1/x2 already on integer lattices (cents, counts,
    discount points) — callers bin first, as everywhere in this repo.

    Output: one row — ``n, b1_x1e6, b2_x1e6, intercept_x1e6, r2_x1e6``.
    """
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    y = (F.col(y_col) if isinstance(y_col, str) else y_col).cast("bigint")
    x1 = (F.col(x1_col) if isinstance(x1_col, str) else x1_col).cast("bigint")
    x2 = (F.col(x2_col) if isinstance(x2_col, str) else x2_col).cast("bigint")
    base = df.select(
        y.alias("__y"), x1.alias("__x1"), x2.alias("__x2")
    ).filter(
        F.col("__y").isNotNull()
        & F.col("__x1").isNotNull()
        & F.col("__x2").isNotNull()
    )
    z = F.lit(0).cast("decimal(38,0)")
    sums = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.coalesce(F.sum(dec(F.col("__x1"))), z).cast("decimal(38,0)").alias("__sx1"),
        F.coalesce(F.sum(dec(F.col("__x2"))), z).cast("decimal(38,0)").alias("__sx2"),
        F.coalesce(F.sum(dec(F.col("__y"))), z).cast("decimal(38,0)").alias("__sy"),
        F.coalesce(F.sum(dec(F.col("__x1")) * F.col("__x1")), z)
        .cast("decimal(38,0)")
        .alias("__s11r"),
        F.coalesce(F.sum(dec(F.col("__x2")) * F.col("__x2")), z)
        .cast("decimal(38,0)")
        .alias("__s22r"),
        F.coalesce(F.sum(dec(F.col("__x1")) * F.col("__x2")), z)
        .cast("decimal(38,0)")
        .alias("__s12r"),
        F.coalesce(F.sum(dec(F.col("__x1")) * F.col("__y")), z)
        .cast("decimal(38,0)")
        .alias("__s1yr"),
        F.coalesce(F.sum(dec(F.col("__x2")) * F.col("__y")), z)
        .cast("decimal(38,0)")
        .alias("__s2yr"),
        F.coalesce(F.sum(dec(F.col("__y")) * F.col("__y")), z)
        .cast("decimal(38,0)")
        .alias("__syyr"),
    )
    nn = dec(F.col("n"))
    s11 = (nn * F.col("__s11r") - F.col("__sx1") * F.col("__sx1")).cast(
        "double"
    )
    s22 = (nn * F.col("__s22r") - F.col("__sx2") * F.col("__sx2")).cast(
        "double"
    )
    s12 = (nn * F.col("__s12r") - F.col("__sx1") * F.col("__sx2")).cast(
        "double"
    )
    s1y = (nn * F.col("__s1yr") - F.col("__sx1") * F.col("__sy")).cast(
        "double"
    )
    s2y = (nn * F.col("__s2yr") - F.col("__sx2") * F.col("__sy")).cast(
        "double"
    )
    syy = (nn * F.col("__syyr") - F.col("__sy") * F.col("__sy")).cast(
        "double"
    )
    det = s11 * s22 - s12 * s12
    b1 = (s1y * s22 - s2y * s12) / det
    b2 = (s2y * s11 - s1y * s12) / det
    b0 = (
        F.col("__sy").cast("double")
        - b1 * F.col("__sx1").cast("double")
        - b2 * F.col("__sx2").cast("double")
    ) / F.col("n").cast("double")
    r2 = (b1 * s1y + b2 * s2y) / syy
    bad = (
        (F.col("n") < 3)
        | (det <= F.lit(0.0))
        | (syy <= F.lit(0.0))
    )
    pub = lambda c: F.when(  # noqa: E731
        bad, F.lit(None).cast("bigint")
    ).otherwise(F.floor(c * F.lit(float(scale)) + F.lit(0.5)).cast("bigint"))
    return sums.select(
        "n",
        pub(b1).alias("b1_x1e6"),
        pub(b2).alias("b2_x1e6"),
        pub(b0).alias("intercept_x1e6"),
        pub(r2).alias("r2_x1e6"),
    )


def theil_atkinson(
    df: DataFrame,
    value_col: Column | str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Theil T index (Theil, "Economics and Information Theory" 1967)
    and Atkinson index at epsilon = 0.5 (Atkinson, J. Econ. Theory
    1970) over a positive integer-lattice value column — the
    decomposable / welfare-grounded companions to q232's Gini on the
    same revenue-concentration question.

        ``T   = (1/S) * [sum x*ln(x)] - ln(S/n)``      (since n*mu = S)
        ``A   = 1 - (sum sqrt(x) / n)^2 / (S/n)
              = 1 - (sum sqrt(x))^2 / (n*S)``

    Per-row transcendentals are fixed on declared lattices BEFORE the
    sums (the repo's ln discipline, q328 Bartlett): ``ln x`` rounds to
    9 decimals then scales to a 1e9-lattice BIGINT; ``sqrt x`` (IEEE
    correctly rounded) floors onto a 1e6 lattice.  Both sums are exact
    DECIMAL(38,0); each published index is ONE final tree (its single
    trailing ln also 9-digit-rounded, mirrored verbatim).

    Output: one row — ``n, total, theil_x1e6, atkinson_x1e6`` (NULL
    when n = 0; rows with x <= 0 are excluded by contract — both
    indices need positive values).
    """
    v = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "bigint"
    )
    base = df.select(v.alias("__x")).filter(
        F.col("__x").isNotNull() & (F.col("__x") > 0)
    )
    ln_i9 = F.floor(
        F.round(F.log(F.col("__x").cast("double")), 9) * F.lit(1e9)
        + F.lit(0.5)
    ).cast("decimal(38,0)")
    sq_i6 = F.floor(
        F.sqrt(F.col("__x").cast("double")) * F.lit(1e6) + F.lit(0.5)
    ).cast("decimal(38,0)")
    z = F.lit(0).cast("decimal(38,0)")
    agg = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.coalesce(F.sum(F.col("__x").cast("decimal(38,0)")), z)
        .cast("decimal(38,0)")
        .alias("__s"),
        F.coalesce(F.sum((F.col("__x").cast("decimal(38,0)") * ln_i9)), z)
        .cast("decimal(38,0)")
        .alias("__sxln"),
        F.coalesce(F.sum(sq_i6), z).cast("decimal(38,0)").alias("__ssq"),
    )
    s = F.col("__s").cast("double")
    n = F.col("n").cast("double")
    ln_mu = F.round(F.log(s / n), 9)
    theil = F.col("__sxln").cast("double") / (F.lit(1e9) * s) - ln_mu
    atk = F.lit(1.0) - (
        F.col("__ssq").cast("double") * F.col("__ssq").cast("double")
    ) / (F.lit(1e12) * n * s)
    bad = F.col("n") < 1
    pub = lambda c: F.when(  # noqa: E731
        bad, F.lit(None).cast("bigint")
    ).otherwise(F.floor(c * F.lit(float(scale)) + F.lit(0.5)).cast("bigint"))
    return agg.select(
        "n",
        F.col("__s").cast("bigint").alias("total"),
        pub(theil).alias("theil_x1e6"),
        pub(atk).alias("atkinson_x1e6"),
    )


def grubbs_extreme(
    df: DataFrame,
    value_col: Column | str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Grubbs' extreme-outlier statistic (Grubbs, Ann. Math. Stat.
    1950): ``G = max|x - mean| / s`` with the sample standard
    deviation, plus the exact count of points beyond 3 sample sigmas —
    the single-most-suspicious-point companion to q111's per-key MAD
    screen (MAD asks 'how many are odd', Grubbs asks 'how bad is the
    worst one').

    Exactness: the scaled deviation ``d_i = n*x_i - S`` is an exact
    integer, so ``G = max|d| / (n * s)`` with
    ``s = sqrt((n*Sxx - S^2) / (n*(n-1)))`` is ONE IEEE tree over exact
    scalars, and the 3-sigma membership is the EXACT integer predicate
    ``(n-1) * d_i^2 > 9 * n * (n*Sxx - S^2)`` — no float boundary
    cases.  Magnitude contract (the jarque_bera class): the predicate
    needs ``n^3 * spread^2 < 1e38`` — n up to ~4e6 at a 1e9-cent
    spread, ~2e8 after coarsening to 1e6 units; ANSI fails loudly
    beyond, never silently.

    Output: one row — ``n, g_x1e6, n_beyond_3s`` (NULL G when n < 3 or
    the variance is 0).
    """
    v = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "bigint"
    )
    base = df.select(v.alias("__x")).filter(F.col("__x").isNotNull())
    z = F.lit(0).cast("decimal(38,0)")
    tot = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.coalesce(F.sum(F.col("__x").cast("decimal(38,0)")), z)
        .cast("decimal(38,0)")
        .alias("__s"),
        F.coalesce(
            F.sum(F.col("__x").cast("decimal(38,0)") * F.col("__x")), z
        )
        .cast("decimal(38,0)")
        .alias("__sxx"),
    )
    joined = base.crossJoin(F.broadcast(tot))
    d = (
        F.col("n").cast("decimal(38,0)") * F.col("__x") - F.col("__s")
    ).cast("decimal(38,0)")
    m2 = (
        F.col("n").cast("decimal(38,0)") * F.col("__sxx")
        - F.col("__s") * F.col("__s")
    ).cast("decimal(38,0)")
    agg = joined.agg(
        F.max("n").alias("n"),
        F.max(F.abs(d)).alias("__maxd"),
        F.max(m2).alias("__m2"),
        F.sum(
            F.when(
                (F.col("n") - 1).cast("decimal(38,0)") * d * d
                > F.lit(9).cast("decimal(38,0)")
                * F.col("n").cast("decimal(38,0)")
                * m2,
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_beyond_3s"),
    )
    n = F.col("n").cast("double")
    s = F.sqrt(
        F.col("__m2").cast("double") / (n * (n - F.lit(1.0)))
    )
    g = F.col("__maxd").cast("double") / (n * s)
    bad = (
        F.col("n").isNull()
        | (F.col("n") < 3)
        | (F.col("__m2") <= F.lit(0).cast("decimal(38,0)"))
    )
    return agg.select(
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
        F.when(bad, F.lit(None).cast("bigint"))
        .otherwise(
            F.floor(g * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
        )
        .alias("g_x1e6"),
        F.when(bad, F.lit(None).cast("bigint"))
        .otherwise(F.col("n_beyond_3s"))
        .alias("n_beyond_3s"),
    )


def boxcox_grid(
    df: DataFrame,
    value_col: Column | str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Box-Cox profile log-likelihood over the standard lambda grid
    {-1, -0.5, 0, 0.5, 1} (Box & Cox, JRSS-B 1964): which power
    transform makes a positive heavy-tailed column most
    Gaussian-friendly — the transform-selection step upstream of every
    normality-assuming screen (q324/q325/q328).

        ``LL(lam) = -(n/2) * ln(var(y_lam)) + (lam - 1) * sum ln x``

    with ``y_lam = (x^lam - 1)/lam`` (``ln x`` at lam = 0).  Engine
    determinism: every power on the grid is an exact or
    IEEE-correctly-rounded tree (x-1, 2*(sqrt(x)-1), round-9 ln,
    2*(1 - 1/sqrt(x)), 1 - 1/x) — pow() is never called; each y snaps
    to a 1e6 lattice and each ln x to the 1e9 round-9 lattice BEFORE
    the exact integer sums; the final LL is ONE tree with its trailing
    ln also 9-digit-rounded.

    Output: one row per lambda — ``lam_x100, n, ll_x1e6`` (NULL when
    n < 2 or the transformed variance is 0).  Rows with x <= 0 are
    excluded by the Box-Cox contract.
    """
    dec = "decimal(38,0)"
    v = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "bigint"
    )
    base = df.select(v.alias("__x")).filter(
        F.col("__x").isNotNull() & (F.col("__x") > 0)
    )
    xd = F.col("__x").cast("double")
    y_by_lam = [
        (-100, F.lit(1.0) - F.lit(1.0) / xd),
        (-50, F.lit(2.0) * (F.lit(1.0) - F.lit(1.0) / F.sqrt(xd))),
        (0, F.round(F.log(xd), 9)),
        (50, F.lit(2.0) * (F.sqrt(xd) - F.lit(1.0))),
        (100, xd - F.lit(1.0)),
    ]
    rows = base.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(lam).alias("lam_x100"),
                        F.floor(y * F.lit(1e6) + F.lit(0.5))
                        .cast(dec)
                        .alias("yq"),
                    )
                    for lam, y in y_by_lam
                ]
            )
        ).alias("__s"),
        F.floor(F.round(F.log(xd), 9) * F.lit(1e9) + F.lit(0.5))
        .cast(dec)
        .alias("__lnx"),
    ).select(
        F.col("__s.lam_x100").alias("lam_x100"),
        F.col("__s.yq").alias("__yq"),
        "__lnx",
    )
    per = rows.groupBy("lam_x100").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__yq").cast(dec).alias("__sy"),
        F.sum((F.col("__yq") * F.col("__yq")).cast(dec))
        .cast(dec)
        .alias("__syy"),
        F.sum("__lnx").cast(dec).alias("__sln"),
    )
    nn = F.col("n").cast(dec)
    varnum = (nn * F.col("__syy") - F.col("__sy") * F.col("__sy")).cast(dec)
    # var = varnum / (n^2 * 1e12)  (MLE variance on the 1e6 y-lattice)
    var = varnum.cast("double") / (
        F.col("n").cast("double") * F.col("n").cast("double") * F.lit(1e12)
    )
    ll = -(F.col("n").cast("double") / F.lit(2.0)) * F.round(
        F.log(var), 9
    ) + (F.col("lam_x100").cast("double") / F.lit(100.0) - F.lit(1.0)) * (
        F.col("__sln").cast("double") / F.lit(1e9)
    )
    bad = (F.col("n") < 2) | (varnum <= F.lit(0).cast(dec))
    return per.select(
        F.col("lam_x100").cast("bigint").alias("lam_x100"),
        "n",
        F.when(bad, F.lit(None).cast("bigint"))
        .otherwise(
            F.floor(ll * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
        )
        .alias("ll_x1e6"),
    )


def partial_correlation(
    df: DataFrame,
    x_col: Column | str,
    y_col: Column | str,
    z_col: Column | str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """First-order partial correlation ``r_xy.z`` (Yule, Proc. R. Soc.
    1897): the x-y association with the confounder z partialled out,

        ``r_xy.z = (r_xy - r_xz*r_yz)
                   / sqrt((1 - r_xz^2) * (1 - r_yz^2))``

    — the screen that separates a real relationship from one the
    confounder manufactures (q277's Spearman and q316's tau answer the
    marginal question only).

    All three Pearson terms come from one map-side pass of exact
    DECIMAL(38,0) power sums (means cleared by n); each r and the
    partial are ONE mirrored IEEE tree.

    Output: one row — ``n, r_xy_x1e6, r_xz_x1e6, r_yz_x1e6,
    partial_x1e6`` (NULL when n < 3, any variance is 0, or either
    conditioning correlation is +-1).
    """
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    cols = {}
    for name, c in (("x", x_col), ("y", y_col), ("z", z_col)):
        cc = (F.col(c) if isinstance(c, str) else c).cast("bigint")
        cols[name] = cc
    base = df.select(
        cols["x"].alias("__x"), cols["y"].alias("__y"), cols["z"].alias("__z")
    ).filter(
        F.col("__x").isNotNull()
        & F.col("__y").isNotNull()
        & F.col("__z").isNotNull()
    )
    z0 = F.lit(0).cast("decimal(38,0)")
    s = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[
            F.coalesce(F.sum(dec(F.col(f"__{a}"))), z0)
            .cast("decimal(38,0)")
            .alias(f"__s{a}")
            for a in "xyz"
        ],
        *[
            F.coalesce(
                F.sum(dec(F.col(f"__{a}")) * F.col(f"__{b}")), z0
            )
            .cast("decimal(38,0)")
            .alias(f"__s{a}{b}")
            for a, b in ("xx", "yy", "zz", "xy", "xz", "yz")
        ],
    )
    nn = dec(F.col("n"))

    def cen(ab: str, a: str, b: str):
        return (
            nn * F.col(f"__s{ab}") - F.col(f"__s{a}") * F.col(f"__s{b}")
        ).cast("double")

    vx, vy, vz = cen("xx", "x", "x"), cen("yy", "y", "y"), cen("zz", "z", "z")
    cxy, cxz, cyz = cen("xy", "x", "y"), cen("xz", "x", "z"), cen("yz", "y", "z")
    ok = (vx > F.lit(0.0)) & (vy > F.lit(0.0)) & (vz > F.lit(0.0))
    r_xy = F.when(ok, cxy / F.sqrt(vx * vy))
    r_xz = F.when(ok, cxz / F.sqrt(vx * vz))
    r_yz = F.when(ok, cyz / F.sqrt(vy * vz))
    den = (F.lit(1.0) - r_xz * r_xz) * (F.lit(1.0) - r_yz * r_yz)
    partial = (r_xy - r_xz * r_yz) / F.sqrt(den)
    bad = (F.col("n") < 3) | ~ok
    pub = lambda c: F.when(  # noqa: E731
        bad, F.lit(None).cast("bigint")
    ).otherwise(F.floor(c * F.lit(float(scale)) + F.lit(0.5)).cast("bigint"))
    return s.select(
        "n",
        pub(r_xy).alias("r_xy_x1e6"),
        pub(r_xz).alias("r_xz_x1e6"),
        pub(r_yz).alias("r_yz_x1e6"),
        F.when(
            bad | (den <= F.lit(0.0)), F.lit(None).cast("bigint")
        )
        .otherwise(
            F.floor(partial * F.lit(float(scale)) + F.lit(0.5)).cast(
                "bigint"
            )
        )
        .alias("partial_x1e6"),
    )


def lins_ccc(
    df: DataFrame,
    x_col: Column | str,
    y_col: Column | str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Lin's concordance correlation coefficient (Lin, Biometrics
    1989): AGREEMENT between two paired measurements — penalizing both
    scatter and systematic bias, where Pearson forgives any linear
    recalibration.  The natural forecast-vs-actual agreement score.

    Multiplying numerator and denominator by n^2 clears every mean
    exactly:

        ``CCC = 2*(n*Sxy - Sx*Sy)
                / [(n*Sxx - Sx^2) + (n*Syy - Sy^2) + (Sx - Sy)^2]``

    — every term an exact DECIMAL(38,0) integer, CCC is ONE division.

    Output: one row — ``n, ccc_x1e6`` (NULL when n < 2 or the
    denominator is 0, i.e. both columns constant and equal).
    """
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    x = (F.col(x_col) if isinstance(x_col, str) else x_col).cast("bigint")
    y = (F.col(y_col) if isinstance(y_col, str) else y_col).cast("bigint")
    base = df.select(x.alias("__x"), y.alias("__y")).filter(
        F.col("__x").isNotNull() & F.col("__y").isNotNull()
    )
    z0 = F.lit(0).cast("decimal(38,0)")
    s = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.coalesce(F.sum(dec(F.col("__x"))), z0)
        .cast("decimal(38,0)")
        .alias("__sx"),
        F.coalesce(F.sum(dec(F.col("__y"))), z0)
        .cast("decimal(38,0)")
        .alias("__sy"),
        F.coalesce(F.sum(dec(F.col("__x")) * F.col("__x")), z0)
        .cast("decimal(38,0)")
        .alias("__sxx"),
        F.coalesce(F.sum(dec(F.col("__y")) * F.col("__y")), z0)
        .cast("decimal(38,0)")
        .alias("__syy"),
        F.coalesce(F.sum(dec(F.col("__x")) * F.col("__y")), z0)
        .cast("decimal(38,0)")
        .alias("__sxy"),
    )
    nn = dec(F.col("n"))
    num = (
        F.lit(2).cast("decimal(38,0)")
        * (nn * F.col("__sxy") - F.col("__sx") * F.col("__sy"))
    ).cast("decimal(38,0)")
    den = (
        (nn * F.col("__sxx") - F.col("__sx") * F.col("__sx"))
        + (nn * F.col("__syy") - F.col("__sy") * F.col("__sy"))
        + (F.col("__sx") - F.col("__sy")) * (F.col("__sx") - F.col("__sy"))
    ).cast("decimal(38,0)")
    ccc = num.cast("double") / den.cast("double")
    bad = (F.col("n") < 2) | (den <= F.lit(0).cast("decimal(38,0)"))
    return s.select(
        "n",
        F.when(bad, F.lit(None).cast("bigint"))
        .otherwise(
            F.floor(ccc * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
        )
        .alias("ccc_x1e6"),
    )


def cochran_c(
    df: DataFrame,
    group_col: str,
    value_col: Column | str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Cochran's C variance-outlier test (Cochran, Ann. Eugenics 1941):
    ``C = s2_max / sum_g s2_g`` — does ONE group carry an outlying
    share of the variance, the single-suspect companion to q328's
    omnibus Bartlett (Bartlett says 'variances differ somewhere',
    Cochran's C points at the largest).

    Per-group sample variances come from exact integers
    ``vn_g = n_g*Sxx_g - S_g^2`` with ``s2_g = vn_g / (n_g*(n_g-1))``;
    the max resolves deterministically on (s2 lattice value, group asc)
    and C is ONE IEEE tree.  Groups with n < 2 are excluded.

    Output: one row — ``n_groups, top_group, c_x1e6`` (NULL when fewer
    than 2 usable groups or all variances are 0).
    """
    v = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "bigint"
    )
    base = df.filter(v.isNotNull() & F.col(group_col).isNotNull()).select(
        F.col(group_col).cast("string").alias("__g"), v.alias("__v")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    pg = base.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum(dec(F.col("__v"))).cast("decimal(38,0)").alias("__s"),
        F.sum(dec(F.col("__v")) * F.col("__v"))
        .cast("decimal(38,0)")
        .alias("__sxx"),
    ).filter(F.col("__n") >= 2)
    s2 = (
        (dec(F.col("__n")) * F.col("__sxx") - F.col("__s") * F.col("__s"))
        .cast("double")
        / (
            F.col("__n").cast("double")
            * (F.col("__n").cast("double") - F.lit(1.0))
        )
    )
    # fix every group's s2 on a 1e-6 lattice so max/argmax ties are exact
    s2_i = F.floor(s2 * F.lit(1e6) + F.lit(0.5)).cast("decimal(38,0)")
    staged = pg.select("__g", s2_i.alias("__s2i"))
    agg = staged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.coalesce(F.sum("__s2i"), F.lit(0).cast("decimal(38,0)")).alias(
            "__tot"
        ),
    )
    # deterministic argmax: join back on the max lattice value, min group
    mx = staged.agg(
        F.max("__s2i").alias("__mxv")
    )
    top = (
        staged.crossJoin(F.broadcast(mx))
        .filter(F.col("__s2i") == F.col("__mxv"))
        .agg(F.min("__g").alias("top_group"), F.max("__mxv").alias("__mxv"))
    )
    out = agg.crossJoin(F.broadcast(top))
    c = F.col("__mxv").cast("double") / F.col("__tot").cast("double")
    bad = (F.col("n_groups") < 2) | (
        F.col("__tot") <= F.lit(0).cast("decimal(38,0)")
    )
    return out.select(
        "n_groups",
        F.when(bad, F.lit(None).cast("string"))
        .otherwise(F.col("top_group"))
        .alias("top_group"),
        F.when(bad, F.lit(None).cast("bigint"))
        .otherwise(
            F.floor(c * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
        )
        .alias("c_x1e6"),
    )


def bland_altman(
    df: DataFrame,
    x_col: Column | str,
    y_col: Column | str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Bland-Altman 95% limits of agreement (Bland & Altman, Lancet
    1986) for paired measurements: the bias ``mean(y - x)`` and
    ``bias +- 1.96 * sd(y - x)`` — the interval statement behind
    q375's single-number CCC (CCC says HOW WELL two measures agree;
    the limits say BY HOW MUCH they can disagree).

    Differences are exact integers; mean and sample sd come from exact
    DECIMAL(38,0) moments (means cleared by n); each published value is
    ONE IEEE tree with the 1.96 quantile as a literal.

    Output: one row — ``n, bias_x1e6, loa_lo_x1e6, loa_hi_x1e6`` (NULL
    limits when n < 2 or zero variance; bias NULL only when n = 0).
    """
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    x = (F.col(x_col) if isinstance(x_col, str) else x_col).cast("bigint")
    y = (F.col(y_col) if isinstance(y_col, str) else y_col).cast("bigint")
    base = df.select((y - x).alias("__d")).filter(F.col("__d").isNotNull())
    z = F.lit(0).cast("decimal(38,0)")
    s = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.coalesce(F.sum(dec(F.col("__d"))), z)
        .cast("decimal(38,0)")
        .alias("__s"),
        F.coalesce(F.sum(dec(F.col("__d")) * F.col("__d")), z)
        .cast("decimal(38,0)")
        .alias("__sdd"),
    )
    nn = F.col("n").cast("double")
    bias = F.col("__s").cast("double") / nn
    varnum = (
        dec(F.col("n")) * F.col("__sdd") - F.col("__s") * F.col("__s")
    ).cast("decimal(38,0)")
    sd = F.sqrt(
        varnum.cast("double") / (nn * (nn - F.lit(1.0)))
    )
    lo = bias - F.lit(1.96) * sd
    hi = bias + F.lit(1.96) * sd
    # <= 0, not < 0: zero variance (a constant difference column) must
    # publish NULL limits per the documented contract, not degenerate
    # loa_lo == loa_hi == bias (r9 ADVICE fix)
    bad = (F.col("n") < 2) | (varnum <= F.lit(0).cast("decimal(38,0)"))
    pub = lambda c: F.when(  # noqa: E731
        bad, F.lit(None).cast("bigint")
    ).otherwise(F.floor(c * F.lit(float(scale)) + F.lit(0.5)).cast("bigint"))
    return s.select(
        "n",
        F.when(F.col("n") < 1, F.lit(None).cast("bigint"))
        .otherwise(
            F.floor(bias * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
        )
        .alias("bias_x1e6"),
        pub(lo).alias("loa_lo_x1e6"),
        pub(hi).alias("loa_hi_x1e6"),
    )
