"""Inventory / supply-chain analytics as deterministic DataFrame
compositions: FIFO lot costing and ABC-XYZ classification.

These are the classic manufacturing planning queries a parts/orders
warehouse runs daily (the reference's domain is production-line ETL;
SURVEY §2.6 groups the aggregation-shaped analytics):

* FIFO cost-of-goods-sold — value consumed demand against supply lots in
  first-in-first-out order (standard inventory costing; IAS 2 / US GAAP
  both admit FIFO).  The sequential "walk the lots" formulation is a
  pure prefix-sum: a lot contributes ``clamp(demand - cum_before, 0,
  qty)`` units, so the whole allocation is one per-key cumulative-sum
  window plus arithmetic — no loop, no UDF.
* ABC-XYZ — Pareto revenue classes (A/B/C by cumulative share) crossed
  with demand-variability classes (X/Y/Z by coefficient of variation),
  the standard planning matrix (Dickie 1951's ABC analysis; XYZ from the
  German MRP literature).  Cumulative shares use the skew-safe two-phase
  running sum; CV classes compare ``n*Σq² - S²`` against ``k² * S²`` so
  the classification is EXACT integer arithmetic (no sqrt, no division).

Determinism: money is snapped to integer cents at the boundary, unit
costs are integer floor-divisions, every ordering carries a unique
tiebreak key, and ratios published as floats are single IEEE divisions
of exact integers — hash-identical on Spark and DuckDB.

Scale posture: FIFO's window partitions by part — per-part lot counts
are bounded by supplier/order fan-in (TPC-H: ~30 lines/part at every
SF), so no task streams an unbounded partition.  ABC's global ordering
never materializes a single-task window (two-phase sub-bucketed on the
revenue grid); XYZ collapses to per-(part, period) sums map-side first.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from ._materialize import materialize_once

from .sampling import two_phase_running_sum

__all__ = [
    "bullwhip_ratio",
    "fifo_cogs",
    "abc_xyz",
    "reorder_point",
    "oee_daily",
    "croston_sba",
    "CROSTON_SBA_FACTOR",
    "economic_order_qty",
    "newsvendor_stock",
]

# SBA bias correction 1 - alpha/2 for the default decay 7/10 (alpha =
# 0.3): the EXACT double literal both the Spark op and any SQL oracle
# embed — computed once here, never re-derived at runtime (a re-derived
# 1.0 - 0.3/2.0 can differ in the last ulp from a literal).
CROSTON_SBA_FACTOR = 0.85


def fifo_cogs(
    lots: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    qty_col: str,
    cost_cents_col: str,
    demand: Column,
) -> DataFrame:
    """FIFO allocation of ``demand`` units per key against supply lots.

    ``lots`` carries one row per supply lot with an integral quantity
    and a TOTAL lot cost in integer cents; ``order_cols`` must order
    lots first-in-first (include a unique tiebreak).  ``demand`` is a
    per-row Column evaluated against the lots frame (typically a
    broadcast-joined per-key figure; any expression of the key's own
    aggregates works — see q221).

    Mechanics: with ``cum_before`` = prefix quantity sum excluding the
    current lot, the lot's consumed units are

        consumed = LEAST(qty, GREATEST(demand - cum_before, 0))

    and FIFO COGS is ``sum(consumed * unit_cents)`` with ``unit_cents =
    cost_cents div qty`` (integer floor — the pennies lost to the floor
    stay lost on both engines, so the figure is exact and portable).

    Output: one row per key — ``(key_col, n_lots, total_qty,
    demand_qty, consumed_qty, fifo_cogs_cents, n_lots_touched)``.
    ``consumed_qty < demand_qty`` flags under-supply (demand exceeded
    stock).
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(*[F.asc(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    qty = F.col(qty_col).cast("bigint")
    unit_cents = F.expr(f"{cost_cents_col} div {qty_col}").cast("bigint")
    cum_before = F.coalesce(F.sum(qty).over(w), F.lit(0)).cast("bigint")
    consumed = F.least(
        qty, F.greatest(demand.cast("bigint") - cum_before, F.lit(0).cast("bigint"))
    )
    alloc = lots.select(
        F.col(key_col),
        qty.alias("__qty"),
        demand.cast("bigint").alias("__demand"),
        consumed.alias("__consumed"),
        (consumed * unit_cents).cast("bigint").alias("__cost"),
    )
    return alloc.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lots"),
        F.sum("__qty").cast("bigint").alias("total_qty"),
        F.max("__demand").cast("bigint").alias("demand_qty"),
        F.sum("__consumed").cast("bigint").alias("consumed_qty"),
        F.sum("__cost").cast("bigint").alias("fifo_cogs_cents"),
        F.sum(F.when(F.col("__consumed") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_lots_touched"),
    )


def abc_xyz(
    revenue: DataFrame,
    key_col: str,
    revenue_cents_col: str,
    periods: DataFrame,
    period_qty_col: str,
    *,
    a_cut: int = 80,
    b_cut: int = 95,
    x_cut_x100: int = 50,
    y_cut_x100: int = 100,
    sub_bucket_width: int = 10_000_000,
) -> DataFrame:
    """ABC-XYZ classification matrix.

    ``revenue``: one row per key with exact integer revenue cents.
    ``periods``: one row per (key, period) with integral demand qty —
    pre-aggregated by the caller so this op never sees raw rows.

    ABC: keys ordered by revenue DESC (key ASC tiebreak); class A while
    ``cum_rev * 100 <= a_cut * total_rev`` (cumulative INCLUDING the
    current key), B to ``b_cut``, C after — all-integer comparisons.
    The descending global order uses the two-phase running sum
    sub-bucketed on the negated-revenue grid (``sub_bucket_width``
    cents per bucket), so no single task streams the whole ranking.

    XYZ: with per-key period sums ``q_1..q_n``, ``S = Σq``, ``Q =
    Σq²``, the coefficient of variation satisfies ``CV <= k`` iff
    ``10000 * (n*Q - S²) <= k²x10000 * S²`` — population variance
    cross-multiplied onto the integer lattice (``x_cut_x100=50`` means
    CV <= 0.50 for X).  Keys with one period or zero total demand are
    class Z (variability unknowable).

    Output: one row per (abc_class, xyz_class) —
    ``(abc_class, xyz_class, n_keys, class_revenue_cents)``.
    """
    # r12 opt: rev feeds the two-phase ranking AND the grand total —
    # materialize once so the caller's fact-table aggregate runs once.
    rev = revenue.select(
        F.col(key_col).alias("__k"),
        F.col(revenue_cents_col).cast("bigint").alias("__rev"),
    ).transform(materialize_once)
    # constant stratum: the ranking is global. Catalyst folds the literal
    # partition key away, so the OFFSETS window (over the per-sub-bucket
    # subtotal table, ~|revenue range|/sub_bucket_width rows) runs
    # single-task — that is the two-phase design: the tiny table is the
    # thing that may sit in one task, the row-cardinality window below it
    # stays partitioned by sub-bucket. (The WindowExec warning it logs
    # refers to those few hundred rows, not the ranking.)
    ranked = two_phase_running_sum(
        rev.withColumn("__negrev", -F.col("__rev")).withColumn(
            "__all", F.lit(0)
        ),
        ["__all"],
        [F.col("__negrev"), F.col("__k")],
        F.col("__rev"),
        F.floor(F.col("__negrev") / F.lit(float(sub_bucket_width))).cast("bigint"),
        out_col="__cum",
    ).drop("__all")
    tot = rev.agg(F.sum("__rev").cast("bigint").alias("__tot"))
    abc = ranked.crossJoin(F.broadcast(tot)).select(
        "__k",
        "__rev",
        F.when(
            F.col("__cum") * 100 <= F.lit(a_cut) * F.col("__tot"), F.lit("A")
        )
        .when(F.col("__cum") * 100 <= F.lit(b_cut) * F.col("__tot"), F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
    )
    per = periods.select(
        F.col(key_col).alias("__k"),
        F.col(period_qty_col).cast("bigint").alias("__q"),
    )
    var = per.groupBy("__k").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum("__q").cast("bigint").alias("__s"),
        F.sum(F.col("__q") * F.col("__q")).cast("bigint").alias("__qq"),
    )
    nvar = F.col("__n") * F.col("__qq") - F.col("__s") * F.col("__s")
    s2 = F.col("__s") * F.col("__s")
    xyz = var.select(
        "__k",
        F.when(
            (F.col("__n") <= 1) | (F.col("__s") <= 0), F.lit("Z")
        )
        .when(nvar * 10_000 <= F.lit(x_cut_x100 * x_cut_x100) * s2, F.lit("X"))
        .when(nvar * 10_000 <= F.lit(y_cut_x100 * y_cut_x100) * s2, F.lit("Y"))
        .otherwise(F.lit("Z"))
        .alias("xyz_class"),
    )
    # left join: a key with revenue but no demand periods is Z
    return (
        abc.join(xyz, "__k", "left")
        .select(
            "abc_class",
            F.coalesce(F.col("xyz_class"), F.lit("Z")).alias("xyz_class"),
            "__rev",
        )
        .groupBy("abc_class", "xyz_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum("__rev").cast("bigint").alias("class_revenue_cents"),
        )
    )


def reorder_point(
    demand: DataFrame,
    key_col: str,
    ts_col: str,
    qty_col: str,
    *,
    lead_days: int = 7,
    z: float = 1.645,
) -> DataFrame:
    """Reorder point per key under the standard normal lead-time-demand
    model (Silver-Pyke-Peterson inventory texts):

        ROP = L * mu_daily + z * sqrt(L * sigma_daily^2)

    with mu/sigma estimated from the key's daily demand sums.  All
    moments are exact integers (``S``, ``Q = sum q^2``, ``n`` from one
    combiner-friendly groupBy pair); only the final expression touches
    floating point — ``(L*S)/n + z*sqrt(L*(n*Q - S^2))/n`` as one fixed
    IEEE tree, floor-published x1000.  Note sigma here is the
    POPULATION sd of observed demand days (zero-demand calendar days
    are not imputed — document the bias or gap-fill upstream with
    q110).

    Output: ``(key_col, n_days, sum_qty, var_units, rop_x1000)`` where
    ``var_units = n*Q - S^2`` (n^2-scaled variance, exact bigint).
    """
    daily = (
        demand.select(
            F.col(key_col).alias("__key"),
            F.to_date(F.col(ts_col)).alias("__day"),
            F.col(qty_col).cast("bigint").alias("__q"),
        )
        .groupBy("__key", "__day")
        .agg(F.sum("__q").cast("bigint").alias("q"))
    )
    m = daily.groupBy("__key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("q").cast("bigint").alias("sum_qty"),
        F.sum(F.col("q") * F.col("q")).cast("bigint").alias("__qq"),
    )
    var_units = (
        F.col("n_days") * F.col("__qq") - F.col("sum_qty") * F.col("sum_qty")
    ).cast("bigint")
    ss = F.col("sum_qty").cast("double")
    nn = F.col("n_days").cast("double")
    vv = F.col("var_units").cast("double")
    rop = (F.lit(float(lead_days)) * ss) / nn + F.lit(z) * F.sqrt(
        F.lit(float(lead_days)) * vv
    ) / nn
    return m.withColumn("var_units", var_units).select(
        F.col("__key").alias(key_col),
        "n_days",
        "sum_qty",
        "var_units",
        F.floor(rop * F.lit(1000.0)).cast("bigint").alias("rop_x1000"),
    )


def oee_daily(
    events: DataFrame,
    ts_col: str,
    type_col: str,
    *,
    error_type: str = "error",
    hours_per_day: int = 24,
) -> DataFrame:
    """Daily OEE (Overall Equipment Effectiveness, Nakajima 1988's TPM
    metric) from an event stream, treating the stream as the plant's
    activity log:

    * availability = active hours (hours with >= 1 good event) / 24;
    * performance  = the day's good-event rate per active hour vs the
      CORPUS-WIDE rate (capped at 1.0) — the 'ideal cycle time'
      surrogate when no engineering standard is configured;
    * quality      = good events / total events.

    All inputs are exact bigint counts (one groupBy day + one 1-row
    broadcast of the global rate); A/P/Q and OEE = A*P*Q are fixed IEEE
    trees over them, each floor-published x1e6.

    Output: one row per day — ``(day, n_events, n_errors,
    active_hours, a_x1e6, p_x1e6, q_x1e6, oee_x1e6)``.
    """
    base = events.select(
        F.to_date(F.col(ts_col)).alias("day"),
        F.hour(F.col(ts_col)).alias("__h"),
        (F.col(type_col) == error_type).alias("__err"),
    )
    daily = base.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.when(F.col("__err"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_errors"),
        F.count_distinct(
            F.when(~F.col("__err"), F.col("__h"))
        )
        .cast("bigint")
        .alias("active_hours"),
    )
    g = daily.agg(
        F.sum(F.col("n_events") - F.col("n_errors"))
        .cast("bigint")
        .alias("__g_good"),
        F.sum("active_hours").cast("bigint").alias("__g_hours"),
    )
    j = daily.crossJoin(F.broadcast(g))
    good = (F.col("n_events") - F.col("n_errors")).cast("double")
    ah = F.col("active_hours").cast("double")
    a = ah / F.lit(float(hours_per_day))
    p = F.when(F.col("active_hours") == 0, F.lit(0.0)).otherwise(
        F.least(
            F.lit(1.0),
            (good * F.col("__g_hours").cast("double"))
            / (ah * F.col("__g_good").cast("double")),
        )
    )
    q = good / F.col("n_events").cast("double")
    pub = lambda c, n: F.floor(c * F.lit(1_000_000.0)).cast("bigint").alias(n)  # noqa: E731
    return j.select(
        "day",
        "n_events",
        "n_errors",
        "active_hours",
        pub(a, "a_x1e6"),
        pub(p, "p_x1e6"),
        pub(q, "q_x1e6"),
        pub(a * p * q, "oee_x1e6"),
    )


def croston_sba(
    demand: DataFrame,
    key_col: str,
    period_col: str,
    qty_col: str,
    *,
    depth: int = 16,
    scale: int = 1_000_000,
) -> DataFrame:
    """Croston's method for intermittent demand (Croston 1972) with the
    Syntetos-Boylan bias correction (SBA; Syntetos & Boylan 2005) — the
    standard forecast for the 'lumpy'/'intermittent' quadrants q260
    classifies: smooth demand SIZES and inter-demand INTERVALS as two
    separate exponential averages, forecast = sizes / intervals per
    period, SBA = (1 - alpha/2) * that.

    ``demand`` carries one row per (key, period) WITH demand (zero
    periods absent — that is what makes the interval series meaningful);
    ``period_col`` is an integer period index (e.g. months since epoch).

    Both smoothings reuse :func:`~.stats.ewma_trailing` (depth-16
    trailing window, decay 7/10 => alpha = 0.3, exact integer weight
    table, one float division) — so the determinism contract is
    inherited wholesale. The interval series is ``period - lag(period)``
    per key (first observation has no interval and drops; keys with a
    single demand period yield no forecast row, deterministically).
    The final ratio/scaling is one fixed IEEE tree over the two
    published 6-dp averages, floor-published x1e6;
    :data:`CROSTON_SBA_FACTOR` is embedded as a literal on both engines.

    Scale posture: the lag window and the smoothing windows partition
    per key and the history is CALENDAR-bounded (one row per demand
    period, <= months-of-history rows per key) — no unbounded per-key
    sort; everything else is groupBy/join.

    Output: ``key_col, n_sizes, size_ewma, n_intervals, interval_ewma,
    croston_x1e6, sba_x1e6``.
    """
    from .stats import ewma_trailing

    d = demand.select(
        F.col(key_col).alias("__k"),
        F.col(period_col).cast("bigint").alias("__per"),
        F.col(qty_col).alias("__q"),
    )
    sizes = d.select(
        "__k",
        F.col("__per").alias("__ts"),
        F.col("__per").alias("__tb2"),
        "__q",
    )
    z = ewma_trailing(
        sizes, "__k", "__ts", "__q", tiebreak_col="__tb2", depth=depth
    ).select(
        F.col("__k").alias("__kz"),
        F.col("n_used").alias("n_sizes"),
        F.col("ewma").alias("size_ewma"),
    )
    w = Window.partitionBy("__k").orderBy("__per")
    iv = (
        d.select("__k", "__per")
        .withColumn("__iv", F.col("__per") - F.lag("__per").over(w))
        .filter(F.col("__iv").isNotNull())
    )
    p = ewma_trailing(
        iv.select(
            "__k",
            F.col("__per").alias("__ts"),
            F.col("__per").alias("__tb2"),
            "__iv",
        ),
        "__k",
        "__ts",
        "__iv",
        tiebreak_col="__tb2",
        depth=depth,
    ).select(
        F.col("__k").alias("__kp"),
        F.col("n_used").alias("n_intervals"),
        F.col("ewma").alias("interval_ewma"),
    )
    s = float(scale)
    joined = z.join(p, F.col("__kz") == F.col("__kp"), "inner")
    return joined.select(
        F.col("__kz").alias(key_col),
        "n_sizes",
        "size_ewma",
        "n_intervals",
        "interval_ewma",
        F.floor(
            (F.col("size_ewma") / F.col("interval_ewma")) * F.lit(s)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("croston_x1e6"),
        F.floor(
            F.lit(CROSTON_SBA_FACTOR)
            * (F.col("size_ewma") / F.col("interval_ewma"))
            * F.lit(s)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("sba_x1e6"),
    )


def economic_order_qty(
    df: DataFrame,
    key_col: str,
    demand_col: str,
    hold_cents_col: str,
    *,
    order_cost_cents: int = 500_000,
    scale: int = 1_000_000,
) -> DataFrame:
    """Economic order quantity (Harris 1913; the Wilson lot-size
    formula): ``EOQ = sqrt(2 D S / H)`` — the order size balancing
    fixed ordering cost against holding cost, the planning constant
    q227's reorder point triggers AGAINST.

    ``df`` carries one row per key with integral annual demand
    ``demand_col`` (units) and integral holding cost ``hold_cents_col``
    (cents per unit-year); ``order_cost_cents`` is the fixed cost per
    order. Publishes BOTH ``eoq2_units`` = ``(2 D S) div H`` (the EXACT
    integer square — engine-portable with no float at all) and
    ``eoq_x1e6`` = ``floor(sqrt(2DS/H) * 1e6 + 0.5)`` — safe because
    IEEE-754 requires sqrt correctly rounded (unlike ln/exp), so both
    engines see identical doubles from identical exact integers.

    Pure per-row projection: no shuffle, no window, no state.

    Output: ``key_col, demand_units, hold_cents, eoq2_units, eoq_x1e6``.
    """
    s = int(order_cost_cents)
    return df.select(
        F.col(key_col),
        F.col(demand_col).cast("bigint").alias("demand_units"),
        F.col(hold_cents_col).cast("bigint").alias("hold_cents"),
        F.expr(f"(2 * CAST({demand_col} AS BIGINT) * {s}) div "
               f"CAST({hold_cents_col} AS BIGINT)")
        .cast("bigint")
        .alias("eoq2_units"),
        F.floor(
            F.sqrt(
                F.expr(f"CAST(2 * CAST({demand_col} AS BIGINT) * {s} "
                       f"AS DOUBLE) / CAST({hold_cents_col} AS DOUBLE)")
            )
            * F.lit(float(scale))
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("eoq_x1e6"),
    )


def newsvendor_stock(
    demand: DataFrame,
    key_col: str,
    period_col: str,
    qty_col: str,
    *,
    cr_num: int = 4,
    cr_den: int = 5,
) -> DataFrame:
    """Newsvendor stocking level (Arrow-Harris-Marschak 1951): per key,
    the smallest historical demand quantile covering the critical ratio
    ``Cu / (Cu + Co) = cr_num/cr_den`` — stock so that the fraction of
    DEMAND periods fully served is at least the critical ratio (underage
    cost Cu vs overage cost Co; 4/5 = the 80% service point). The
    quantile is CONDITIONAL on demand occurring: ``demand`` carries only
    periods with demand (the q291 Croston convention), so for
    intermittent SKUs this is the per-demand-event service level, not a
    calendar-month guarantee — callers wanting the unconditional
    quantile must densify zero periods first.

    The quantile is the EXACT order statistic: rank periods by
    (qty asc, period asc) per key and take the first rank with
    ``rank * cr_den >= n * cr_num`` — pure integer comparison, no
    interpolation, no float. Per-key windows over CALENDAR-bounded
    histories (one row per period), so no unbounded single-task sort.

    Output: ``key_col, n_periods, stock_units`` (the order-statistic
    demand, exact).
    """
    if not (0 < cr_num < cr_den):
        raise ValueError("critical ratio must satisfy 0 < cr_num < cr_den")
    d = demand.select(
        F.col(key_col).alias("__k"),
        F.col(period_col).cast("bigint").alias("__per"),
        F.col(qty_col).cast("bigint").alias("__q"),
    )
    w = Window.partitionBy("__k").orderBy(F.asc("__q"), F.asc("__per"))
    wn = Window.partitionBy("__k")
    ranked = d.select(
        "__k",
        "__q",
        F.row_number().over(w).alias("__rk"),
        F.count(F.lit(1)).over(wn).cast("bigint").alias("__n"),
    )
    hit = ranked.filter(
        F.col("__rk") * F.lit(int(cr_den)) >= F.col("__n") * F.lit(int(cr_num))
    )
    return hit.groupBy("__k").agg(
        F.max("__n").alias("n_periods"),
        F.min("__q").alias("stock_units"),
    ).select(
        F.col("__k").alias(key_col), "n_periods", "stock_units"
    )


def bullwhip_ratio(
    upstream_daily: DataFrame,
    downstream_daily: DataFrame,
    key_col: str,
    qty_col: str = "qty",
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Bullwhip-effect measurement (Lee, Padmanabhan & Whang, Mgmt. Sci.
    1997; ratio form per Chen et al., Mgmt. Sci. 2000): per key, the
    variance of the UPSTREAM daily order signal over the variance of the
    DOWNSTREAM daily demand signal — BW > 1 means orders amplify demand
    noise up the chain (batching/forecast-chasing), the planning
    pathology every inventory op in this module exists to damp.

    Inputs are the two (key, day, qty) daily series (qty on an integer
    lattice); variance is over each series' ACTIVE days (documented
    contract — zero-fill upstream if calendar variance is wanted).
    With per-series exact sums, the ratio cross-multiplies into ONE
    division of exact decimals:

        ``BW = ((nU*S2U - S1U^2) * nD^2) / ((nD*S2D - S1D^2) * nU^2)``

    floor-published at 1e6 (NULL when either side has < 2 days or the
    downstream variance is 0).

    Scale posture: two map-side-combined groupBys + one key equi-join on
    the bounded key table.

    Output: per key — ``<key_col>, n_up_days, n_down_days, bw_x1e6``.
    """
    dec = "decimal(38,0)"

    def _sums(daily: DataFrame, prefix: str) -> DataFrame:
        q = F.col(qty_col).cast("bigint")
        return (
            daily.filter(q.isNotNull() & F.col(key_col).isNotNull())
            .select(F.col(key_col).alias("__k"), q.alias("__q"))
            .groupBy("__k")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias(f"__n{prefix}"),
                F.sum(F.col("__q").cast(dec)).cast(dec).alias(f"__s1{prefix}"),
                F.sum(F.col("__q").cast(dec) * F.col("__q"))
                .cast(dec)
                .alias(f"__s2{prefix}"),
            )
        )
    up = _sums(upstream_daily, "u")
    down = _sums(downstream_daily, "d")
    j = up.join(down, "__k")
    nu, nd = F.col("__nu").cast(dec), F.col("__nd").cast(dec)
    varu = (nu * F.col("__s2u") - F.col("__s1u") * F.col("__s1u")).cast(dec)
    vard = (nd * F.col("__s2d") - F.col("__s1d") * F.col("__s1d")).cast(dec)
    num = (varu * nd * nd).cast(dec)
    den = (vard * nu * nu).cast(dec)
    return j.select(
        F.col("__k").alias(key_col),
        F.col("__nu").alias("n_up_days"),
        F.col("__nd").alias("n_down_days"),
        F.when(
            (F.col("__nu") < 2)
            | (F.col("__nd") < 2)
            | (vard <= F.lit(0).cast(dec)),
            F.lit(None).cast("bigint"),
        )
        .otherwise(
            F.floor(
                num.cast("double") / den.cast("double") * F.lit(float(scale))
                + F.lit(0.5)
            ).cast("bigint")
        )
        .alias("bw_x1e6"),
    )
