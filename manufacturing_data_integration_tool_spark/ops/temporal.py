"""Temporal joins Spark lacks as built-ins: as-of join (and its bounded
variant) as pure DataFrame compositions.

The classic need in manufacturing/event data: join each reading to the
most recent configuration/state row at or before its timestamp.

Implementation is the union + carry-forward-window composition, NOT a
cogrouped ``applyInPandas`` merge_asof: everything stays JVM-side, and the
cost profile is one union + one key-partitioned window — a single hash
shuffle on the join key, no Python, no per-group pandas materialization.
Each key's timeline sorts within its own task; skewed keys split via AQE
or salting upstream.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["asof_join", "range_join", "time_rollup", "rolling_time_agg", "group_trend", "longest_daily_streak", "interval_concurrency", "twap", "window_funnel", "holt_linear", "log_rank_test"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    left_ts: str,
    right_ts: str,
    right_value_cols: Optional[Sequence[str]] = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of left join: for every left row, attach the right row's
    values with the largest ``right_ts <= left_ts`` for the same key
    (ties at equal timestamps see the right row). Left rows with no prior
    right row get NULLs.

    Mechanics: tag and union both sides on (key, ts), then
    ``last(value, ignorenulls=True)`` over a key-partitioned window ordered
    by (ts, side) carries the latest right values forward onto each left
    row. One shuffle; scales with keys.
    """
    on = list(on)
    right_value_cols = list(
        right_value_cols
        if right_value_cols is not None
        else [c for c in right.columns if c not in on and c != right_ts]
    )
    out_names = {c: f"{c}{suffix}" if c in left.columns else c for c in right_value_cols}

    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(out_names[c]) for c in right_value_cols],
    )
    r_tag = right.select(
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns if c not in on],
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(out_names[c]) for c in right_value_cols],
    )
    u = l_tag.unionByName(r_tag)

    # right rows sort before left rows at equal __t -> asof is inclusive
    w = (
        Window.partitionBy(*[F.col(c) for c in on])
        .orderBy(F.col("__t"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in right_value_cols:
        u = u.withColumn(out_names[c], F.last(out_names[c], ignorenulls=True).over(w))
    return u.filter(F.col("__is_left") == 1).drop("__t", "__is_left")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    *,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join on integer time columns, scalable via binning.

    The naive plan for ``p.t BETWEEN i.start AND i.end`` is a (broadcast)
    nested-loop join — quadratic per key. Binning makes it an equi-join:
    each interval replicates into every bin it overlaps
    (``sequence(start div w, end div w)``), each point lands in exactly one
    bin, so every qualifying pair meets in exactly one bin — equi-join on
    (key, bin) + a residual BETWEEN filter, no duplicate matches, one hash
    shuffle. ``bin_width`` should approximate the typical interval length:
    too small replicates intervals; too big packs bins.
    """
    on = list(on)
    p = points.withColumn("__bin", F.expr(f"{point_col} div {bin_width}"))
    i = intervals.withColumn(
        "__bin", F.explode(F.sequence(F.expr(f"{start_col} div {bin_width}"), F.expr(f"{end_col} div {bin_width}")))
    )
    out = p.join(i, [*on, "__bin"], how).filter(
        (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) <= F.col(end_col))
    )
    return out.drop("__bin")


def time_rollup(
    events: DataFrame,
    *,
    buckets: Sequence[tuple[str, int]],
    time_col: str,
    aggs: Sequence,
) -> DataFrame:
    """Hypertable-style multi-resolution rollup in ONE pass.

    ``buckets`` is a coarse-to-fine list of (name, width) over an integer
    time column — e.g. ``[("day", DAY), ("hour", HOUR)]`` — compiled to a
    hierarchical ROLLUP: per-(day,hour), per-(day), and grand-total rows in
    a single shuffle with map-side partial aggregation (vs one job per
    resolution in a naive continuous-aggregate loop). Coarser rows carry
    NULL in the finer bucket columns, like a Timescale continuous
    aggregate's materialized hierarchy.
    """
    bucket_cols = [
        F.expr(f"{time_col} div {width}").alias(name) for name, width in buckets
    ]
    base = events.select(*bucket_cols, *[c for c in events.columns])
    return base.rollup(*[name for name, _ in buckets]).agg(*aggs)


def rolling_time_agg(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    window_size: int,
    aggs: Sequence[tuple[str, str]],
) -> DataFrame:
    """Per-key rolling aggregates over a trailing TIME interval.

    ``aggs`` is ``[(expr_sql, alias), ...]`` — e.g.
    ``[("count(*)", "n_1h"), ("sum(v)", "sum_1h")]`` — each evaluated over
    the frame ``[ts - window_seconds, ts]`` within the key's timeline.
    ``ts_col`` must be a NUMERIC epoch column (seconds, micros, nanos —
    any unit, as long as ``window_size`` is expressed in the same unit):
    integer RANGE frames are exact and engine-portable, and same-timestamp
    rows always share a frame — deterministic regardless of
    intra-partition order.

    One hash shuffle on ``key_col``; the sort is per-key within its task —
    no global ordering. This is the "rate over the last hour per device"
    primitive; for exact sums over floats, pre-cast the value to decimal so
    frame-internal accumulation order can't change the answer.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col))
        .rangeBetween(-window_size, 0)
    )
    out = df
    for expr_sql, alias in aggs:
        out = out.withColumn(alias, F.expr(expr_sql).over(w))
    return out


def group_trend(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
    *,
    y_scale: int = 10**4,
    per_x: float = 1.0,
    round_to: int = 6,
) -> DataFrame:
    """Per-group least-squares linear trend (slope + intercept) of
    ``y_col`` over ``x_col`` — drift/trend detection per device, user, or
    sensor. Spark 3.4+ ships ``regr_slope``, but its float co-moment sums
    accumulate in partition order, so two runs (or two engines) can differ
    in ulps; this implementation is deterministic by construction.

    ``x_col`` must already be an exact integer (e.g. epoch seconds);
    ``y_col`` is snapped to a ``1/y_scale`` grid. All five OLS sums
    (n, Σx, Σy, Σxy, Σx²) then accumulate as exact ``decimal(38,0)`` —
    associative, so partial aggregation order is irrelevant — and the
    closed-form slope/intercept is computed with a fixed double-precision
    expression tree from those exact sums: bit-identical on any engine.

    One map-side-combined groupBy shuffle carrying 5 numbers per key —
    the cheapest possible distributed regression. ``per_x`` rescales the
    slope's x-unit for readability (e.g. 86400.0 → per-day when x is in
    seconds). Groups with zero x-variance get NULL slope/intercept.

    Output: ``(key_col, n_obs, slope, intercept)``.
    """
    x = F.col(x_col).cast("decimal(38,0)")
    yq = F.floor(F.col(y_col).cast("double") * y_scale + F.lit(0.5)).cast(
        "decimal(38,0)"
    )
    agg = df.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(x).alias("__sx"),
        F.sum(yq).alias("__sy"),
        F.sum(x * yq).alias("__sxy"),
        F.sum(x * x).alias("__sxx"),
    )
    n = F.col("n_obs").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    sxx = F.col("__sxx").cast("double")
    denom = n * sxx - sx * sx
    slope_q = (n * sxy - sx * sy) / F.nullif(denom, F.lit(0.0))
    intercept_q = (sy - slope_q * sx) / n
    return agg.select(
        key_col,
        "n_obs",
        F.round(slope_q * F.lit(float(per_x)) / y_scale, round_to).alias("slope"),
        F.round(intercept_q / y_scale, round_to).alias("intercept"),
    )


def longest_daily_streak(
    df: DataFrame,
    key_col: str,
    ts_col: str,
) -> DataFrame:
    """Longest run of consecutive active days per key — the classic
    gaps-and-islands composition: distinct active days, then
    ``day - row_number`` is constant within a consecutive run (the
    island id), then one count per island and one top-1 per key.

    Two per-key operations (a distinct and a window) after one hash
    shuffle on ``key_col`` — partitions are active-day-sized, never raw
    event-sized, because the day-level distinct runs first. The longest
    island ties break on earliest start date, so the result is
    deterministic and oracle-able.

    Output: ``(key_col, n_days, n_streaks, longest_streak, best_start)``.
    """
    days = df.select(
        F.col(key_col), F.to_date(F.col(ts_col)).alias("__day")
    ).distinct()
    w = Window.partitionBy(key_col).orderBy("__day")
    islands = days.withColumn(
        "__isl", F.date_sub(F.col("__day"), F.row_number().over(w))
    )
    runs = islands.groupBy(key_col, "__isl").agg(
        F.count(F.lit(1)).alias("__len"), F.min("__day").alias("__start")
    )
    pick = Window.partitionBy(key_col).orderBy(
        F.col("__len").desc(), F.col("__start").asc()
    )
    return (
        runs.withColumn("__rn", F.row_number().over(pick))
        .groupBy(key_col)
        .agg(
            F.sum("__len").alias("n_days"),
            F.count(F.lit(1)).alias("n_streaks"),
            F.max(F.when(F.col("__rn") == 1, F.col("__len"))).alias(
                "longest_streak"
            ),
            F.max(F.when(F.col("__rn") == 1, F.col("__start"))).alias(
                "best_start"
            ),
        )
    )


def interval_concurrency(
    df: DataFrame,
    start_col: str,
    end_col: str,
    *,
    sub_bucket: Optional[Column] = None,
) -> DataFrame:
    """Sweep-line concurrency: for every day on which the count changes,
    how many intervals ``[start, end]`` (inclusive of both endpoint
    days) are simultaneously open — the classic "max concurrent
    sessions / open orders / in-flight shipments" question, computed as
    an event sweep (the interval-scheduling folklore algorithm; see
    also Arge et al.'s distribution sweeping) instead of a point-in-
    interval range join, which would be |intervals| x |days|.

    Shape: each interval contributes +1 at ``start`` and -1 at
    ``end + 1 day``; deltas are aggregated per day FIRST (map-side
    combined — the heavy input collapses to at most two rows per
    distinct calendar day), then the running sum over the small
    delta-day table uses :func:`~..ops.sampling.two_phase_running_sum`
    keyed by a date-monotone ``sub_bucket`` (default: calendar year), so
    even a centuries-wide axis never serializes through one window
    task. Intervals with ``end < start`` or NULL endpoints are dropped.

    Output: one row per change day — ``day``, ``delta`` (net opens minus
    closes that day), ``concurrent`` (open count effective that day).
    The overall maximum is ``max(concurrent)`` downstream.
    """
    from .sampling import two_phase_running_sum

    s, e = F.col(start_col).cast("date"), F.col(end_col).cast("date")
    iv = df.where(s.isNotNull() & e.isNotNull() & (e >= s)).select(
        s.alias("__s"), e.alias("__e")
    )
    deltas = (
        iv.select(F.col("__s").alias("day"), F.lit(1).alias("d"))
        .unionByName(
            iv.select(F.date_add("__e", 1).alias("day"), F.lit(-1).alias("d"))
        )
        .groupBy("day")
        .agg(F.sum("d").cast("bigint").alias("delta"))
    )
    sub = sub_bucket if sub_bucket is not None else F.year("day")
    run = two_phase_running_sum(
        deltas, [], [F.asc("day")], F.col("delta"), sub, out_col="concurrent"
    )
    return run.select("day", "delta", F.col("concurrent").cast("bigint").alias("concurrent"))


def twap(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    *,
    scale: int = 100,
    round_to: int = 6,
) -> DataFrame:
    """Time-weighted average price/value per (key, day) over irregular
    samples — the standard TWAP aggregation (each observation holds
    until the next one; the day's last observation holds until
    midnight), computed exactly on an integer lattice.

    Semantics: within each (key, day), order samples by timestamp (ties
    broken deterministically by value); sample i's weight is the number
    of SECONDS until the next sample (or until the end of the day for
    the last). ``twap = sum(value_q * dur_s) / sum(dur_s)`` where
    ``value_q = floor(value*scale + 0.5)`` — BIGINT products and sums
    (second-counts fit 17 bits/day; quantized values make the product
    exact), one floor-published division at the end.

    Scale posture: the lead() window partitions by (key, day) — bounded
    per-key-per-day sample counts keep every window task small, and the
    final aggregate is map-side combinable. No global window, no
    cross-day state.
    """
    keys = list(key_cols)
    ts = F.col(ts_col).cast("timestamp")
    day = ts.cast("date")
    vq = F.floor(F.col(value_col).cast("double") * F.lit(float(scale)) + F.lit(0.5)).cast(
        "bigint"
    )
    base = df.select(
        *keys,
        day.alias("day"),
        ts.cast("long").alias("__t"),
        vq.alias("__vq"),
    )
    w = Window.partitionBy(*keys, "day").orderBy(F.asc("__t"), F.asc("__vq"))
    day_end = F.date_add(F.col("day"), 1).cast("timestamp").cast("long")
    dur = F.coalesce(F.lead("__t").over(w), day_end) - F.col("__t")
    weighted = base.withColumn("__dur", dur.cast("bigint"))
    return (
        weighted.groupBy(*keys, "day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_samples"),
            F.sum(F.col("__vq") * F.col("__dur")).cast("bigint").alias("__wsum"),
            F.sum("__dur").cast("bigint").alias("__dtot"),
        )
        .select(
            *keys,
            "day",
            "n_samples",
            F.floor(
                F.col("__wsum").cast("double")
                / F.col("__dtot").cast("double")
                / F.lit(float(scale))
                * F.lit(10.0 ** round_to)
                + F.lit(0.5)
            ).cast("double").alias("__f"),
        )
        .select(
            *keys,
            "day",
            "n_samples",
            (F.col("__f") / F.lit(10.0 ** round_to)).alias("twap"),
        )
    )


def window_funnel(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    chain: Sequence[str],
    *,
    window: int,
) -> DataFrame:
    """Time-bounded ordered funnel (ClickHouse ``windowFunnel``
    semantics, non-strict order): a user reaches depth ``k`` when SOME
    chain ``t_1 < t_2 < ... < t_k`` of events typed ``chain[0..k-1]``
    exists with ``t_k - t_1 <= window`` (``window`` in the units of
    ``ts_col``, e.g. nanos).  Unlike the unbounded funnel (q134), a
    step-1 anchor only counts if the whole chain fits in the window —
    the metric marketing/conversion analyses actually want.

    Mechanics: stage 1 keeps every ``chain[0]`` event as an anchor
    ``(user, t1)``; each later stage joins the NEXT step's per-user
    events on ``(user)`` with the range predicate ``t_prev < t <= t1 +
    window`` and takes ``min(t)`` per anchor — greedy-earliest is
    optimal here (taking the earliest valid next step never shrinks the
    set of completable chains).  All joins are user-keyed equi-joins
    with range residuals; fan-out per user is bounded by per-user
    activity (documented skew: a bot user with 10^6 anchor events costs
    |anchors|x|steps| pairs inside ONE user partition — cap upstream
    with ``cap_per_group`` when user skew is real).

    Output: one row per depth ``1..len(chain)`` —
    ``(depth, step_type, n_users)`` where ``n_users`` counts users whose
    max reached depth is >= that depth (cumulative funnel counts).
    """
    chain = list(chain)
    if len(chain) < 2:
        raise ValueError("window_funnel needs a chain of >= 2 steps")
    base = events.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).cast("bigint").alias("t"),
        F.col(type_col).alias("ty"),
    )
    anchors = (
        base.filter(F.col("ty") == chain[0])
        .select("u", F.col("t").alias("t1"))
        .withColumn("t_prev", F.col("t1"))
    )
    # users reaching depth >= 1
    depth_users = [anchors.select("u").distinct()]
    cur = anchors
    for step in chain[1:]:
        nxt = base.filter(F.col("ty") == step).select(
            "u", F.col("t").alias("__tn")
        )
        cur = (
            cur.join(nxt, "u")
            .filter(
                (F.col("__tn") > F.col("t_prev"))
                & (F.col("__tn") <= F.col("t1") + F.lit(window))
            )
            .groupBy("u", "t1")
            .agg(F.min("__tn").alias("t_prev"))
        )
        depth_users.append(cur.select("u").distinct())
    parts = [
        d.agg(F.count(F.lit(1)).cast("bigint").alias("n_users")).select(
            F.lit(i + 1).cast("bigint").alias("depth"),
            F.lit(chain[i]).alias("step_type"),
            "n_users",
        )
        for i, d in enumerate(depth_users)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def holt_linear(
    daily: DataFrame,
    key_col: str,
    order_col: str,
    value_col: Column | str,
    *,
    alpha: float = 0.5,
    beta: float = 0.25,
    horizon: int = 7,
    scale: int = 1_000_000,
) -> DataFrame:
    """Holt's linear-trend double exponential smoothing (Holt 1957,
    reprinted IJF 2004) per key — the trend-aware upgrade of the
    EWMA-family forecasters (q243's seasonal-naive, q291's Croston):
    two COUPLED recursions

        ``l_t = alpha*y_t + (1-alpha)*(l_{t-1} + b_{t-1})``
        ``b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}``

    with the standard init ``l_1 = y_1, b_1 = 0``.

    Engine-exactness (the q188 EWMA lesson, extended to VECTOR state):
    the state rides as a 2-element ``array<double>`` ``[l, b]``, each
    series element enters as ``[y, 0.0]``, and BOTH engines run the
    identical left fold — Spark ``F.aggregate(slice(arr, 2, n-1),
    arr[0], merge)`` == DuckDB ``list_reduce(full list)`` (whose no-init
    convention takes element 1 as the initial accumulator — exactly the
    Holt init). ``alpha``/``beta`` default to exact binary fractions
    (0.5, 0.25) so every step is an exact IEEE op sequence; prototype
    verified bit-equal across engines. The repeated ``l_t``
    subexpression inside the merge lambda is written out identically on
    both sides.

    Scale posture: series collapse to per-key ordered day lists (one
    groupBy; series length is bounded by the calendar, not corpus
    size) — the standard fold-oracle shape, same as q169/q188.

    Output: per key — ``<key_col>, n_periods, level_x1e6, trend_x1e6,
    forecast_h_x1e6`` (forecast = l + horizon*b; NULL stats never arise
    for n >= 1; keys with no rows simply don't appear).
    """
    y = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "double"
    )
    a, b1 = float(alpha), float(beta)
    rows = daily.filter(
        y.isNotNull() & F.col(key_col).isNotNull() & F.col(order_col).isNotNull()
    ).select(
        F.col(key_col).alias("__k"),
        F.col(order_col).alias("__o"),
        y.alias("__y"),
    )
    per_k = rows.groupBy("__k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_periods"),
        F.transform(
            F.sort_array(F.collect_list(F.struct("__o", "__y"))),
            lambda s: F.array(s["__y"], F.lit(0.0)),
        ).alias("__arr"),
    )
    merge = (
        f"(acc, e) -> array("
        f"{a}D * e[0] + {1.0 - a}D * (acc[0] + acc[1]), "
        f"{b1}D * (({a}D * e[0] + {1.0 - a}D * (acc[0] + acc[1])) - acc[0]) "
        f"+ {1.0 - b1}D * acc[1])"
    )
    st = F.expr(
        f"aggregate(slice(__arr, 2, size(__arr) - 1), __arr[0], {merge})"
    )
    staged = per_k.select("__k", "n_periods", st.alias("__st"))
    lev = F.col("__st")[0]
    tr = F.col("__st")[1]
    pub = lambda e: F.floor(  # noqa: E731
        e * F.lit(float(scale)) + F.lit(0.5)
    ).cast("bigint")
    return staged.select(
        F.col("__k").alias(key_col),
        "n_periods",
        pub(lev).alias("level_x1e6"),
        pub(tr).alias("trend_x1e6"),
        pub(lev + F.lit(float(horizon)) * tr).alias("forecast_h_x1e6"),
    )


def log_rank_test(
    subjects: DataFrame,
    group_col: Column | str,
    t_col: str,
    event_col: str,
    *,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Two-arm log-rank test (Mantel 1966; Peto & Peto JRSS-A 1972) on a
    per-subject survival table — the inferential member of the survival
    family (q247 life table, q268 Kaplan-Meier, q299 Nelson-Aalen):
    does arm 1's time-to-failure distribution differ from arm 0's?

    Input: one row per subject — ``group_col`` (0/1 int), ``t_col``
    (integer end time, e.g. days of follow-up) and ``event_col``
    (true = failure observed at t, false = right-censored at t).

    Exact-arithmetic derivation: at each distinct failure time t the
    hypergeometric contribution of arm 1 is

        ``E-term  = d * n1 / n``
        ``V-term  = d * (n - d) * n1 * n0 / (n^2 * (n - 1))``

    with d total failures at t and n/n1/n0 the at-risk counts (suffix
    sums over the calendar-bounded day axis, the q247 pattern — the
    unpartitioned windows run over day-count rows, never subjects).
    Each term is floored onto the declared 1e9 lattice in decimal(38,0)
    (per-term floors, the q292 discipline; truncation < 1e-9 per
    distinct failure time), the sums are exact integers, and the
    statistic chi2 = (O1 - E1)^2 / V is ONE mirrored IEEE tree over the
    three published integers — both engines compute it from identical
    BIGINT inputs, so the hash cannot drift.

    Magnitude contract: per-term numerators reach d*(n-d)*n1*n0*1e9 <=
    N^4/16 * 1e9, so N (subjects) must stay below ~2e7 for
    decimal(38,0); beyond that ANSI overflow fails LOUDLY (the
    jarque_bera contract pattern).

    Output: ONE row — ``n_subjects_g1, n_subjects_g0, o1, e1_x1e9,
    var_x1e9, chi2_x1e6`` (chi2 NULL when V = 0: no comparable risk
    sets, e.g. one arm empty or a single failure time exhausting n).
    """
    g = (F.col(group_col) if isinstance(group_col, str) else group_col).cast(
        "int"
    )
    base = subjects.select(
        g.alias("__g"),
        F.col(t_col).cast("bigint").alias("__t"),
        F.col(event_col).cast("boolean").alias("__ev"),
    ).filter(
        F.col("__g").isin(0, 1)
        & F.col("__t").isNotNull()
        & F.col("__ev").isNotNull()
    )
    days = base.groupBy("__t").agg(
        F.sum(F.when(F.col("__g") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("__end1"),
        F.sum(F.when(F.col("__g") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("__end0"),
        F.sum(
            F.when(F.col("__ev") & (F.col("__g") == 1), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("__d1"),
        F.sum(
            F.when(F.col("__ev") & (F.col("__g") == 0), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("__d0"),
    )
    # at-risk suffix sums: the day axis is calendar-bounded, so this
    # unpartitioned window runs over tens-to-hundreds of rows, not data
    w = Window.orderBy(F.desc("__t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = days.select(
        "__t",
        "__d1",
        "__d0",
        F.sum("__end1").over(w).cast("bigint").alias("__n1"),
        F.sum("__end0").over(w).cast("bigint").alias("__n0"),
    )
    dec = "decimal(38,0)"
    ev_times = risk.filter((F.col("__d1") + F.col("__d0")) > 0)
    d = (F.col("__d1") + F.col("__d0")).cast(dec)
    n1, n0 = F.col("__n1").cast(dec), F.col("__n0").cast(dec)
    n = (n1 + n0).cast(dec)
    sc = F.lit(int(scale)).cast(dec)
    e_term = F.expr(
        f"CAST((CAST(__d1 + __d0 AS {dec}) * CAST(__n1 AS {dec})"
        f" * CAST({int(scale)} AS {dec})) AS {dec})"
        f" div CAST(__n1 + __n0 AS {dec})"
    )
    v_term = F.when(
        (F.col("__n1") + F.col("__n0")) > 1,
        F.expr(
            f"CAST((CAST(__d1 + __d0 AS {dec})"
            f" * (CAST(__n1 + __n0 AS {dec}) - CAST(__d1 + __d0 AS {dec}))"
            f" * CAST(__n1 AS {dec}) * CAST(__n0 AS {dec})"
            f" * CAST({int(scale)} AS {dec})) AS {dec})"
            f" div CAST(CAST(__n1 + __n0 AS {dec}) * CAST(__n1 + __n0 AS {dec})"
            f" * (CAST(__n1 + __n0 AS {dec}) - 1) AS {dec})"
        ),
    ).otherwise(F.lit(0).cast(dec))
    _ = (d, n1, n0, n, sc)  # documented identities of the SQL-expr terms
    sizes = base.groupBy().agg(
        F.sum(F.when(F.col("__g") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_subjects_g1"),
        F.sum(F.when(F.col("__g") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_subjects_g0"),
    )
    agg = ev_times.agg(
        F.coalesce(F.sum("__d1"), F.lit(0)).cast("bigint").alias("o1"),
        F.coalesce(F.sum(e_term), F.lit(0).cast(dec))
        .cast("bigint")
        .alias("e1_x1e9"),
        F.coalesce(F.sum(v_term), F.lit(0).cast(dec))
        .cast("bigint")
        .alias("var_x1e9"),
    )
    out = sizes.crossJoin(F.broadcast(agg))
    num = (
        F.col("o1").cast("double")
        - F.col("e1_x1e9").cast("double") / F.lit(1.0e9)
    )
    chi2 = (
        num * num / (F.col("var_x1e9").cast("double") / F.lit(1.0e9))
    )
    return out.select(
        "n_subjects_g1",
        "n_subjects_g0",
        "o1",
        "e1_x1e9",
        "var_x1e9",
        F.when(F.col("var_x1e9") <= 0, F.lit(None).cast("bigint"))
        .otherwise(
            F.floor(chi2 * F.lit(1_000_000.0) + F.lit(0.5)).cast("bigint")
        )
        .alias("chi2_x1e6"),
    )
