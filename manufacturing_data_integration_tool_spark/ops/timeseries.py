"""Classical time-series diagnostics over a collapsed daily series.

The repo already screens daily series pointwise (DW q322, ACF q281,
CUSUM q171, changepoint q217, seasonal residuals q213/q253, Mann-Kendall
q228/q323).  This module adds the model-diagnostic layer a forecasting
pipeline runs BEFORE trusting a model family:

- :func:`ljung_box` — portmanteau whiteness test Q(h) (Ljung & Box,
  Biometrika 1978): are the first h autocorrelations jointly zero.
- :func:`periodogram_intensity` — discrete-Fourier power at candidate
  seasonal periods (Schuster, Terr. Magn. 1898), with the trig weights
  fixed DRIVER-SIDE on a 1e9 lattice so both engines sum identical
  integers (cos/sin are not IEEE-correctly-rounded, so in-engine trig
  is banned by the determinism contract).
- :func:`kpss_level` — KPSS level-stationarity statistic (Kwiatkowski,
  Phillips, Schmidt & Shin, J. Econometrics 1992) with Bartlett
  long-run variance at 7 lags, collapsed to ONE exact integer division.
- :func:`arch_lm` — Engle's ARCH(1) LM heteroskedasticity screen
  (Engle, Econometrica 1982) as n*r^2 of the lag-1 Pearson of squared
  residuals.

Series model: callers collapse raw rows to a (day, integer-lattice
value) daily table map-side (the q281/q322 discipline); these functions
assign the dense time index t = row_number() over the day axis.  The
daily table is BOUNDED (a few thousand rows for years of data), so
plain global windows over it are metadata-scale by contract — the same
posture as the tau-b marginal windows, NOT a window over raw data.

Determinism contract: all moments are exact DECIMAL(38,0) integers with
means cleared by multiplying through by n (never a float mean); where a
statistic sums per-lag float terms (Ljung-Box's r_k^2/(n-k)), each term
is fixed on a declared 1e15 lattice before an exact integer sum.  Each
published value is ONE final IEEE tree, floor-published at 1e6.

Magnitude contract (documented, ANSI-loud beyond): with daily totals up
to ~1e13 cents and ~4e3 days, the largest intermediate (KPSS's
``sum (n*C_t - t*S)^2``) stays under 1e38; coarsen the value lattice
upstream for longer/larger series.

Reference parity note: the reference tool (kshres31/
Manufacturing-Data-Integration-Tool) has no temporal layer; these
extend its per-row screens with the forecasting-governance tests, same
role as ops.ranktests for segments.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

_DEC = "decimal(38,0)"
_LB_GRID = 10**15
_TRIG_GRID = 10**9


def _indexed_daily(df: DataFrame, day_col: str, value_col: str) -> DataFrame:
    """Dense 1-based time index over the (bounded) daily table."""
    w = Window.orderBy(F.asc(day_col))
    return df.select(
        F.row_number().over(w).alias("__t"),
        F.col(value_col).cast("bigint").alias("__x"),
    )


def ljung_box(
    daily: DataFrame,
    day_col: str,
    value_col: str,
    *,
    max_lag: int = 7,
    scale: int = 1_000_000,
) -> DataFrame:
    """Ljung-Box portmanteau Q(h) over the classical fixed-mean sample
    ACF: ``Q = n(n+2) * sum_{k=1..h} r_k^2 / (n-k)``, chi^2(h) under
    whiteness.

    Exactness: with S = sum x, B = n*sum x^2 - S^2 and per-lag raw
    cross-moments over the t-aligned pairs (XY_k = sum x_t x_{t+k},
    H_k/T_k the head/tail sums), the fixed-mean autocovariance
    numerator clears all means exactly:

        ``A_k = n^2*XY_k - n*S*(H_k + T_k) + (n-k)*S^2``
        ``r_k = A_k / (n*B)``   (one double division of exact integers)

    Each ``r_k^2/(n-k)`` is fixed on the 1e15 lattice, summed as exact
    integers, and Q is ONE final tree.  Per-lag detail is published
    alongside (r1/r7) for triage.

    Output: one row — ``n_days, r1_x1e6, r7_x1e6, q_lb_x1e6`` (NULL
    stats when n <= max_lag or the series is constant, B <= 0).
    """
    idx = _indexed_daily(daily, day_col, value_col)
    tot = idx.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.coalesce(F.sum(F.col("__x").cast(_DEC)), F.lit(0).cast(_DEC))
        .cast(_DEC)
        .alias("__s"),
        F.coalesce(
            F.sum((F.col("__x").cast(_DEC) * F.col("__x")).cast(_DEC)),
            F.lit(0).cast(_DEC),
        )
        .cast(_DEC)
        .alias("__sxx"),
    )
    lags = F.explode(
        F.array(*[F.lit(k) for k in range(1, max_lag + 1)])
    ).alias("lag")
    left = idx.select(
        F.col("__t"), F.col("__x").alias("__xl"), lags
    ).withColumn("__t2", F.col("__t") + F.col("lag"))
    right = idx.select(
        F.col("__t").alias("__t2"), F.col("__x").alias("__xr")
    )
    # the lag side is the BOUNDED daily table — pin the broadcast so the
    # join never falls back to a shuffle when the upstream size estimate
    # grows with the raw input (the q207-class benign flip, pre-empted)
    pairs = left.join(F.broadcast(right), "__t2")
    per_lag = pairs.groupBy("lag").agg(
        F.sum((F.col("__xl").cast(_DEC) * F.col("__xr")).cast(_DEC))
        .cast(_DEC)
        .alias("__xy"),
        F.sum(F.col("__xl").cast(_DEC)).cast(_DEC).alias("__hk"),
        F.sum(F.col("__xr").cast(_DEC)).cast(_DEC).alias("__tk"),
    )
    pl = per_lag.crossJoin(F.broadcast(tot))
    n = F.col("__n").cast(_DEC)
    a_k = (
        n * n * F.col("__xy")
        - n * F.col("__s") * (F.col("__hk") + F.col("__tk"))
        + (n - F.col("lag")) * F.col("__s") * F.col("__s")
    ).cast(_DEC)
    b = (n * F.col("__sxx") - F.col("__s") * F.col("__s")).cast(_DEC)
    # Per-row guard: these run INSIDE the aggregate, before the final
    # NULL guard can short-circuit, and ANSI mode raises on /0 — a
    # constant series (b = 0) must yield NULLs, not an error.
    b_ok = b > F.lit(0).cast(_DEC)
    r_k = F.when(
        b_ok, a_k.cast("double") / (n.cast("double") * b.cast("double"))
    )
    q_term = F.when(
        b_ok,
        F.floor(
            r_k * r_k / (F.col("__n") - F.col("lag")).cast("double")
            * F.lit(float(_LB_GRID))
            + F.lit(0.5)
        ).cast(_DEC),
    ).otherwise(F.lit(0).cast(_DEC))
    r_pub = F.floor(r_k * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
    fin = pl.agg(
        F.max("__n").cast("bigint").alias("n_days"),
        F.max(F.when(F.col("lag") == 1, r_pub)).alias("__r1"),
        F.max(F.when(F.col("lag") == F.lit(max_lag), r_pub)).alias("__r7"),
        F.coalesce(F.sum(q_term), F.lit(0).cast(_DEC)).alias("__qs"),
        F.min(b).alias("__b"),
        F.min(F.col("__n") - F.col("lag")).cast("bigint").alias("__minnk"),
    )
    q = (
        F.col("n_days").cast("double")
        * (F.col("n_days").cast("double") + F.lit(2.0))
        * (F.col("__qs").cast("double") / F.lit(float(_LB_GRID)))
    )
    bad = (
        F.col("n_days").isNull()
        # explicit n <= max_lag guard (not just "the short lags had no
        # pairs"): for 1 < n <= max_lag the lags with zero pairs simply
        # vanish from per_lag, so __minnk alone stays positive and Q
        # would silently publish over fewer lags than requested — the
        # documented contract is NULL stats whenever n <= max_lag
        | (F.col("n_days") <= F.lit(int(max_lag)))
        | (F.col("__minnk") <= 0)
        | (F.col("__b") <= F.lit(0).cast(_DEC))
    )
    return fin.select(
        F.coalesce(F.col("n_days"), F.lit(0)).cast("bigint").alias(
            "n_days"
        ),
        F.when(bad, F.lit(None).cast("bigint"))
        .otherwise(F.col("__r1"))
        .alias("r1_x1e6"),
        F.when(bad, F.lit(None).cast("bigint"))
        .otherwise(F.col("__r7"))
        .alias(f"r{max_lag}_x1e6"),
        F.when(bad, F.lit(None).cast("bigint"))
        .otherwise(
            F.floor(q * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
        )
        .alias("q_lb_x1e6"),
    )


def trig_weights(periods: tuple[int, ...]) -> list[tuple[int, int, int, int]]:
    """Driver-side trig lattice: for each period p and phase
    k = 0..p-1, ``(p, k, floor(cos(2*pi*k/p)*1e9 + 0.5),
    floor(sin(2*pi*k/p)*1e9 + 0.5))``.  Computed ONCE in Python and
    inlined as literals into BOTH the Spark plan and the SQL oracle, so
    no engine evaluates transcendental functions on data (cos/sin are
    not IEEE-correctly-rounded; the lattice is the shared truth)."""
    rows = []
    for p in periods:
        for k in range(p):
            ang = 2.0 * math.pi * k / p
            rows.append(
                (
                    p,
                    k,
                    math.floor(math.cos(ang) * _TRIG_GRID + 0.5),
                    math.floor(math.sin(ang) * _TRIG_GRID + 0.5),
                )
            )
    return rows


def periodogram_intensity(
    daily: DataFrame,
    day_col: str,
    value_col: str,
    *,
    periods: tuple[int, ...] = (7, 30, 91),
    scale: int = 1_000_000,
) -> DataFrame:
    """Normalized discrete-Fourier intensity at candidate seasonal
    periods: for period p with lattice weights wc/ws at phase t mod p,

        ``C = sum_t x_t * wc(t mod p)``   (exact integers)
        ``Sn = sum_t x_t * ws(t mod p)``
        ``I(p) = [(n*C - S*Wc)^2 + (n*Sn - S*Ws)^2]
                 / (n^2 * (n*sum x^2 - S^2) * 1e18)``

    — the mean is cleared exactly by multiplying through by n (Wc/Ws
    are the weight totals), the two squared terms are IEEE doubles of
    exact DECIMAL(38,0) integers, and the 1e18 clears the squared trig
    lattice.  I(p) is the (single-sided, un-doubled) normalized line
    intensity: ≈ 1/n for white noise, → 1/2 for a pure sinusoid at p
    (the cos² projection averages half the variance; double the
    statistic for the textbook "fraction of variance" form — the
    oracle and tests pin THIS normalization, so the doc is the spec).

    Output: one row per period — ``(period, n_days, intensity_x1e6)``
    (NULL when the series is constant or shorter than 2 points).
    """
    spark = daily.sparkSession
    idx = _indexed_daily(daily, day_col, value_col)
    w = spark.createDataFrame(
        trig_weights(tuple(periods)),
        "period bigint, phase bigint, wc bigint, ws bigint",
    )
    per = F.explode(
        F.array(*[F.lit(int(p)) for p in periods])
    ).alias("period")
    tagged = idx.select(
        "__t", "__x", per
    ).withColumn("phase", (F.col("__t") - 1) % F.col("period"))
    joined = tagged.join(F.broadcast(w), ["period", "phase"])
    per_p = joined.groupBy("period").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(F.col("__x").cast(_DEC)).cast(_DEC).alias("__s"),
        F.sum((F.col("__x").cast(_DEC) * F.col("__x")).cast(_DEC))
        .cast(_DEC)
        .alias("__sxx"),
        F.sum((F.col("__x").cast(_DEC) * F.col("wc")).cast(_DEC))
        .cast(_DEC)
        .alias("__c"),
        F.sum((F.col("__x").cast(_DEC) * F.col("ws")).cast(_DEC))
        .cast(_DEC)
        .alias("__sn"),
        F.sum(F.col("wc").cast(_DEC)).cast(_DEC).alias("__wc"),
        F.sum(F.col("ws").cast(_DEC)).cast(_DEC).alias("__ws"),
    )
    n = F.col("n_days").cast(_DEC)
    cd = (n * F.col("__c") - F.col("__s") * F.col("__wc")).cast("double")
    sd = (n * F.col("__sn") - F.col("__s") * F.col("__ws")).cast("double")
    b = (n * F.col("__sxx") - F.col("__s") * F.col("__s")).cast(_DEC)
    nn = F.col("n_days").cast("double")
    intensity = (cd * cd + sd * sd) / (
        nn * nn * F.col("__b").cast("double") * F.lit(1e18)
    )
    per_p = per_p.withColumn("__b", b)
    return per_p.select(
        F.col("period").cast("bigint").alias("period"),
        "n_days",
        F.when(
            (F.col("n_days") < 2) | (F.col("__b") <= F.lit(0).cast(_DEC)),
            F.lit(None).cast("bigint"),
        )
        .otherwise(
            F.floor(intensity * F.lit(float(scale)) + F.lit(0.5)).cast(
                "bigint"
            )
        )
        .alias("intensity_x1e6"),
    )


def kpss_level(
    daily: DataFrame,
    day_col: str,
    value_col: str,
    *,
    bartlett_lags: int = 7,
    scale: int = 1_000_000,
) -> DataFrame:
    """KPSS level-stationarity statistic with Bartlett long-run
    variance at L lags.  Clearing every mean by n collapses the whole
    statistic to ONE exact integer division:

        ``NUM = sum_t (n*C_t - t*S)^2``      (C_t = inclusive cumsum)
        ``G_k = sum_t (n*x_t - S)(n*x_{t+k} - S)``
        ``eta = (L+1) * NUM / (n * [(L+1)*G_0 + 2*sum_k (L+1-k)*G_k])``

    (the Bartlett weights (1 - k/(L+1)) are cleared by (L+1)).  Under
    level stationarity eta concentrates near E[eta] ~ 0.17 (5% critical
    value 0.463, KPSS Table 1); a unit root drags it up with n.

    Output: one row — ``n_days, eta_x1e6`` (NULL when n <= L or the
    long-run variance denominator is <= 0).
    """
    idx = _indexed_daily(daily, day_col, value_col)
    w = Window.orderBy(F.asc("__t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run = idx.withColumn("__cum", F.sum("__x").over(w))
    tot = idx.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.coalesce(F.sum(F.col("__x").cast(_DEC)), F.lit(0).cast(_DEC))
        .cast(_DEC)
        .alias("__s"),
    )
    rt = run.crossJoin(F.broadcast(tot))
    dev = (
        F.col("__n").cast(_DEC) * F.col("__cum")
        - F.col("__t").cast(_DEC) * F.col("__s")
    ).cast(_DEC)
    num = rt.agg(
        F.max("__n").cast("bigint").alias("n_days"),
        F.max("__s").alias("__s"),
        F.coalesce(F.sum((dev * dev).cast(_DEC)), F.lit(0).cast(_DEC))
        .cast(_DEC)
        .alias("__num"),
    )
    el = F.explode(
        F.array(*[F.lit(k) for k in range(0, bartlett_lags + 1)])
    ).alias("lag")
    left = idx.select("__t", F.col("__x").alias("__xl"), el).withColumn(
        "__t2", F.col("__t") + F.col("lag")
    )
    right = idx.select(F.col("__t").alias("__t2"), F.col("__x").alias("__xr"))
    # the lag side is the BOUNDED daily table — pin the broadcast so the
    # join never falls back to a shuffle when the upstream size estimate
    # grows with the raw input (the q207-class benign flip, pre-empted)
    pairs = left.join(F.broadcast(right), "__t2").crossJoin(F.broadcast(tot))
    g_term = (
        (F.col("__n").cast(_DEC) * F.col("__xl") - F.col("__s"))
        * (F.col("__n").cast(_DEC) * F.col("__xr") - F.col("__s"))
    ).cast(_DEC)
    lp1 = bartlett_lags + 1
    wgt = F.when(F.col("lag") == 0, F.lit(lp1)).otherwise(
        F.lit(2) * (F.lit(lp1) - F.col("lag"))
    )
    den = pairs.agg(
        F.coalesce(
            F.sum((wgt.cast(_DEC) * g_term).cast(_DEC)), F.lit(0).cast(_DEC)
        )
        .cast(_DEC)
        .alias("__d")
    )
    fin = num.crossJoin(F.broadcast(den))
    eta = (
        F.lit(float(lp1))
        * F.col("__num").cast("double")
        / (F.col("n_days").cast("double") * F.col("__d").cast("double"))
    )
    return fin.select(
        F.coalesce(F.col("n_days"), F.lit(0)).cast("bigint").alias(
            "n_days"
        ),
        F.when(
            F.col("n_days").isNull()
            | (F.col("n_days") <= F.lit(bartlett_lags))
            | (F.col("__d") <= F.lit(0).cast(_DEC)),
            F.lit(None).cast("bigint"),
        )
        .otherwise(
            F.floor(eta * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
        )
        .alias("eta_x1e6"),
    )


def arch_lm(
    daily: DataFrame,
    day_col: str,
    value_col: str,
    *,
    var_lattice: int = 1_000_000,
    scale: int = 1_000_000,
) -> DataFrame:
    """Engle's ARCH(1) LM screen: volatility clustering as
    ``LM = n_pairs * r^2`` with r the lag-1 Pearson of SQUARED
    mean-residuals (lagged-pairs estimator, the q281 convention).

    Exactness: the squared residual is carried as the exact integer
    ``v_t = (n*x_t - S)^2 div (n^2 * var_lattice)`` — the mean cleared
    by n, the declared lattice keeping fourth-moment products inside
    DECIMAL(38,0) (identical truncation on both engines; pick
    var_lattice so v_t lands near 1e8: squared-deviation scale divided
    by the lattice).  The Pearson moments over (v_t, v_{t+1}) are exact
    integers; r is ONE IEEE tree.

    Output: one row — ``n_pairs, r_x1e6, lm_x1e6`` (NULL when fewer
    than 2 pairs or a zero-variance side).
    """
    idx = _indexed_daily(daily, day_col, value_col)
    tot = idx.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.coalesce(F.sum(F.col("__x").cast(_DEC)), F.lit(0).cast(_DEC))
        .cast(_DEC)
        .alias("__s"),
    )
    rt = idx.crossJoin(F.broadcast(tot))
    v = F.expr(
        "CAST((CAST(__n AS DECIMAL(38,0)) * __x - __s) "
        "* (CAST(__n AS DECIMAL(38,0)) * __x - __s) AS DECIMAL(38,0)) "
        f"div (CAST(__n AS DECIMAL(38,0)) * __n * {int(var_lattice)})"
    )
    # Spark's `div` yields LONG — lift back to DECIMAL(38,0) before any
    # product, or the second moments overflow int64 under ANSI.
    sq = rt.select("__t", v.cast(_DEC).alias("__v"))
    nxt = sq.select((F.col("__t") - 1).alias("__t"), F.col("__v").alias("__w"))
    pairs = sq.join(F.broadcast(nxt), "__t")
    s = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.coalesce(F.sum(F.col("__v")), F.lit(0).cast(_DEC))
        .cast(_DEC)
        .alias("__sv"),
        F.coalesce(F.sum(F.col("__w")), F.lit(0).cast(_DEC))
        .cast(_DEC)
        .alias("__sw"),
        F.coalesce(
            F.sum((F.col("__v") * F.col("__w")).cast(_DEC)),
            F.lit(0).cast(_DEC),
        ).alias("__svw"),
        F.coalesce(
            F.sum((F.col("__v") * F.col("__v")).cast(_DEC)),
            F.lit(0).cast(_DEC),
        ).alias("__svv"),
        F.coalesce(
            F.sum((F.col("__w") * F.col("__w")).cast(_DEC)),
            F.lit(0).cast(_DEC),
        ).alias("__sww"),
    )
    np_ = F.col("n_pairs").cast(_DEC)
    numr = (np_ * F.col("__svw") - F.col("__sv") * F.col("__sw")).cast(
        "double"
    )
    vx = (np_ * F.col("__svv") - F.col("__sv") * F.col("__sv")).cast(_DEC)
    vy = (np_ * F.col("__sww") - F.col("__sw") * F.col("__sw")).cast(_DEC)
    r = numr / F.sqrt(vx.cast("double") * vy.cast("double"))
    lm = F.col("n_pairs").cast("double") * r * r
    bad = (
        (F.col("n_pairs") < 2)
        | (vx <= F.lit(0).cast(_DEC))
        | (vy <= F.lit(0).cast(_DEC))
    )
    return s.select(
        "n_pairs",
        F.when(bad, F.lit(None).cast("bigint"))
        .otherwise(
            F.floor(r * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
        )
        .alias("r_x1e6"),
        F.when(bad, F.lit(None).cast("bigint"))
        .otherwise(
            F.floor(lm * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
        )
        .alias("lm_x1e6"),
    )


def pacf3(
    daily: DataFrame,
    day_col: str,
    value_col: str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Partial autocorrelations at lags 1..3 via the Durbin-Levinson
    recursion (Durbin, Rev. Int. Stat. Inst. 1960) unrolled in closed
    form — the AR-order diagnostic q281's raw ACF can't give (an AR(1)
    has geometric ACF at ALL lags but PACF that cuts off after lag 1):

        ``phi11 = r1``
        ``phi22 = (r2 - r1^2) / (1 - r1^2)``
        ``phi21 = r1 * (1 - r2) / (1 - r1^2)``
        ``phi33 = (r3 - phi21*r2 - phi22*r1)
                  / (1 - phi21*r1 - phi22*r2)``

    with the fixed-mean sample ACF ``r_k = A_k / (n*B)`` exactly as in
    :func:`ljung_box` (all means cleared by n; A_k, B exact
    DECIMAL(38,0)).  Each published phi is ONE mirrored IEEE tree over
    the three exact ratios.

    Output: one row — ``n_days, pacf1_x1e6, pacf2_x1e6, pacf3_x1e6``
    (NULL when n <= 3, the series is constant, or a recursion
    denominator is 0).
    """
    idx = _indexed_daily(daily, day_col, value_col)
    tot = idx.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.coalesce(F.sum(F.col("__x").cast(_DEC)), F.lit(0).cast(_DEC))
        .cast(_DEC)
        .alias("__s"),
        F.coalesce(
            F.sum((F.col("__x").cast(_DEC) * F.col("__x")).cast(_DEC)),
            F.lit(0).cast(_DEC),
        )
        .cast(_DEC)
        .alias("__sxx"),
    )
    lags = F.explode(F.array(*[F.lit(k) for k in (1, 2, 3)])).alias("lag")
    left = idx.select(
        F.col("__t"), F.col("__x").alias("__xl"), lags
    ).withColumn("__t2", F.col("__t") + F.col("lag"))
    right = idx.select(F.col("__t").alias("__t2"), F.col("__x").alias("__xr"))
    # the lag side is the BOUNDED daily table — pin the broadcast so the
    # join never falls back to a shuffle when the upstream size estimate
    # grows with the raw input (the q207-class benign flip, pre-empted)
    pairs = left.join(F.broadcast(right), "__t2")
    per_lag = pairs.groupBy("lag").agg(
        F.sum((F.col("__xl").cast(_DEC) * F.col("__xr")).cast(_DEC))
        .cast(_DEC)
        .alias("__xy"),
        F.sum(F.col("__xl").cast(_DEC)).cast(_DEC).alias("__hk"),
        F.sum(F.col("__xr").cast(_DEC)).cast(_DEC).alias("__tk"),
    )
    pl = per_lag.crossJoin(F.broadcast(tot))
    n = F.col("__n").cast(_DEC)
    a_k = (
        n * n * F.col("__xy")
        - n * F.col("__s") * (F.col("__hk") + F.col("__tk"))
        + (n - F.col("lag")) * F.col("__s") * F.col("__s")
    ).cast(_DEC)
    b = (n * F.col("__sxx") - F.col("__s") * F.col("__s")).cast(_DEC)
    b_ok = b > F.lit(0).cast(_DEC)
    r_k = F.when(
        b_ok, a_k.cast("double") / (n.cast("double") * b.cast("double"))
    )
    fin = pl.agg(
        F.max("__n").cast("bigint").alias("n_days"),
        F.max(F.when(F.col("lag") == 1, r_k)).alias("__r1"),
        F.max(F.when(F.col("lag") == 2, r_k)).alias("__r2"),
        F.max(F.when(F.col("lag") == 3, r_k)).alias("__r3"),
        F.min(b).alias("__b"),
    )
    r1, r2, r3 = F.col("__r1"), F.col("__r2"), F.col("__r3")
    d1 = F.lit(1.0) - r1 * r1
    phi22 = (r2 - r1 * r1) / d1
    phi21 = r1 * (F.lit(1.0) - r2) / d1
    d3 = F.lit(1.0) - phi21 * r1 - phi22 * r2
    phi33 = (r3 - phi21 * r2 - phi22 * r1) / d3
    bad = (
        F.col("n_days").isNull()
        | (F.col("n_days") <= 3)
        | (F.col("__b") <= F.lit(0).cast(_DEC))
    )
    pub = lambda c: F.when(  # noqa: E731
        bad, F.lit(None).cast("bigint")
    ).otherwise(F.floor(c * F.lit(float(scale)) + F.lit(0.5)).cast("bigint"))
    return fin.select(
        F.coalesce(F.col("n_days"), F.lit(0)).cast("bigint").alias(
            "n_days"
        ),
        pub(r1).alias("pacf1_x1e6"),
        F.when(bad | (d1 == F.lit(0.0)), F.lit(None).cast("bigint"))
        .otherwise(
            F.floor(phi22 * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
        )
        .alias("pacf2_x1e6"),
        F.when(
            bad | (d1 == F.lit(0.0)) | (d3 == F.lit(0.0)),
            F.lit(None).cast("bigint"),
        )
        .otherwise(
            F.floor(phi33 * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
        )
        .alias("pacf3_x1e6"),
    )


def engle_granger(
    joined: DataFrame,
    day_col: str,
    y_col: str,
    x_col: str,
    *,
    resid_lattice: int = 1_000_000,
    scale: int = 1_000_000,
) -> DataFrame:
    """Engle-Granger two-step cointegration screen (Engle & Granger,
    Econometrica 1987) between two integer-lattice daily series: (1)
    the static OLS ``y = a + b*x`` in closed form from exact moments,
    (2) a no-intercept Dickey-Fuller regression on the quantized
    residuals — is the spread between the two series mean-reverting
    (t_DF well below ~-3.4) or a random walk (spurious regression)?

    Determinism: a and b are each ONE IEEE tree over exact
    DECIMAL(38,0) centered moments (both engines produce bit-identical
    doubles), so the per-row residual ``y - (a + b*x)`` is a
    deterministic double; it snaps to the declared ``resid_lattice``
    BEFORE any sum, and the three DF moments (sum r_{t-1}*dr,
    sum r_{t-1}^2, sum dr^2) are exact integer sums.  With
    ``rho = Srd / Srr`` and ``SSE = Sdd - rho^2 * Srr``:

        ``t_DF = rho * sqrt(Srr) / sqrt(SSE / (T - 1))``

    Output: one row — ``n_days, b_x1e6, rho_x1e6, t_df_x1e6`` (NULL
    when n < 4, x is constant, or a degenerate SSE).
    """
    from pyspark.sql import Window

    w = Window.orderBy(F.asc(day_col))
    idx = joined.select(
        F.row_number().over(w).alias("__t"),
        F.col(y_col).cast("bigint").alias("__y"),
        F.col(x_col).cast("bigint").alias("__x"),
    )
    z = F.lit(0).cast(_DEC)
    dec = lambda c: c.cast(_DEC)  # noqa: E731
    sums = idx.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.coalesce(F.sum(dec(F.col("__x"))), z).cast(_DEC).alias("__sx"),
        F.coalesce(F.sum(dec(F.col("__y"))), z).cast(_DEC).alias("__sy"),
        F.coalesce(F.sum(dec(F.col("__x")) * F.col("__x")), z)
        .cast(_DEC)
        .alias("__sxxr"),
        F.coalesce(F.sum(dec(F.col("__x")) * F.col("__y")), z)
        .cast(_DEC)
        .alias("__sxyr"),
    )
    nn = F.col("__n").cast(_DEC)
    sxx = (nn * F.col("__sxxr") - F.col("__sx") * F.col("__sx")).cast(
        "double"
    )
    sxy = (nn * F.col("__sxyr") - F.col("__sx") * F.col("__sy")).cast(
        "double"
    )
    bb = F.when(sxx > F.lit(0.0), sxy / sxx)
    aa = (
        F.col("__sy").cast("double") - bb * F.col("__sx").cast("double")
    ) / F.col("__n").cast("double")
    coefs = sums.select(
        F.col("__n").alias("__n"),
        bb.alias("__bb"),
        aa.alias("__aa"),
        (sxx > F.lit(0.0)).alias("__xok"),
    )
    rt = idx.crossJoin(F.broadcast(coefs))
    resid = F.when(
        F.col("__xok"),
        F.floor(
            (
                F.col("__y").cast("double")
                - (
                    F.col("__aa")
                    + F.col("__bb") * F.col("__x").cast("double")
                )
            )
            * F.lit(float(resid_lattice))
            + F.lit(0.5)
        ).cast(_DEC),
    )
    r = rt.select("__t", resid.alias("__r"))
    nxt = r.select(
        (F.col("__t") - 1).alias("__t"), F.col("__r").alias("__rn")
    )
    pairs = r.join(F.broadcast(nxt), "__t").select(
        F.col("__r").alias("__rp"), (F.col("__rn") - F.col("__r")).alias("__dr")
    )
    df_m = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("__tn"),
        F.coalesce(F.sum((F.col("__rp") * F.col("__dr")).cast(_DEC)), z)
        .cast(_DEC)
        .alias("__srd"),
        F.coalesce(F.sum((F.col("__rp") * F.col("__rp")).cast(_DEC)), z)
        .cast(_DEC)
        .alias("__srr"),
        F.coalesce(F.sum((F.col("__dr") * F.col("__dr")).cast(_DEC)), z)
        .cast(_DEC)
        .alias("__sdd"),
    )
    out = df_m.crossJoin(F.broadcast(coefs))
    srr = F.col("__srr").cast("double")
    # guarded per-row: the division sits inside OR-condition operands
    # that ANSI evaluates before any CASE short-circuit
    rho = F.when(srr > F.lit(0.0), F.col("__srd").cast("double") / srr)
    sse = F.col("__sdd").cast("double") - rho * rho * srr
    t_df = (
        rho
        * F.sqrt(srr)
        / F.sqrt(sse / (F.col("__tn").cast("double") - F.lit(1.0)))
    )
    bad = (
        (F.col("__n") < 4)
        | ~F.col("__xok")
        | (F.col("__srr") <= z)
        | (F.col("__tn") < 2)
    )
    pub = lambda c: F.when(  # noqa: E731
        bad, F.lit(None).cast("bigint")
    ).otherwise(F.floor(c * F.lit(float(scale)) + F.lit(0.5)).cast("bigint"))
    return out.select(
        F.col("__n").cast("bigint").alias("n_days"),
        pub(F.col("__bb")).alias("b_x1e6"),
        F.when(bad | (sse <= F.lit(0.0)), F.lit(None).cast("bigint"))
        .otherwise(
            F.floor(rho * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
        )
        .alias("rho_x1e6"),
        F.when(bad | (sse <= F.lit(0.0)), F.lit(None).cast("bigint"))
        .otherwise(
            F.floor(t_df * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
        )
        .alias("t_df_x1e6"),
    )


def hurst_rs(
    daily: DataFrame,
    day_col: str,
    value_col: str,
    *,
    window_sizes: tuple[int, ...] = (16, 32, 64),
    scale: int = 1_000_000,
) -> DataFrame:
    """Hurst exponent by rescaled-range analysis (Hurst, Trans. ASCE
    1951; Mandelbrot & Wallis 1969): chunk the series into windows of
    size w, compute each chunk's rescaled range R/S (range of cumulative
    deviations over the chunk std), average per w, and fit
    ``log(R/S) ~ H * log(w)`` by OLS over the window sizes — H ~ 0.5
    is a random walk, H > 0.5 long-range persistence, H < 0.5 mean
    reversion.

    Determinism: within a chunk of length w, cumulative deviations are
    the exact integers ``w*C_j - j*S_c`` (chunk means cleared by w);
    ``R = (max - min)`` of those and ``w^2 * Var = w*(w*Sxx_c - S_c^2)``
    are exact, so each chunk's ``(R/S)`` is ONE IEEE tree, fixed on a
    1e6 lattice before the per-w integer mean (exact div).  The final
    H is the 2-3 point OLS slope over (ln w, ln avg-R/S) with every ln
    9-digit-rounded (the repo ln discipline).  Incomplete tail chunks
    are dropped; chunks with zero variance are skipped.

    Scale posture: chunk assignment is arithmetic on the dense index;
    per-chunk cumulatives ride a chunk-partitioned window (chunks are
    w rows — bounded by the largest window size).

    Output: one row — ``n_days, h_x1e6`` plus per-size diagnostics
    ``rs16_x1e6, rs32_x1e6, rs64_x1e6`` (NULL when fewer than 2 window
    sizes yield a usable average).
    """
    from pyspark.sql import Window

    idx = _indexed_daily(daily, day_col, value_col)
    sizes = F.explode(
        F.array(*[F.lit(int(wv)) for wv in window_sizes])
    ).alias("w")
    tagged = idx.select("__t", "__x", sizes).withColumn(
        "__chunk", F.expr("(__t - 1) div w")
    )
    cw = Window.partitionBy("w", "__chunk").orderBy(F.asc("__t"))
    run = tagged.withColumn(
        "__j", F.row_number().over(cw)
    ).withColumn(
        "__cum",
        F.sum("__x").over(
            cw.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # chunk totals first (the cumulative-deviation expression needs the
    # chunk sum per ROW, so totals join back onto the running frame)
    totals = run.groupBy("w", "__chunk").agg(
        F.count(F.lit(1)).cast("bigint").alias("__len"),
        F.sum(F.col("__x").cast(_DEC)).cast(_DEC).alias("__sc"),
        F.sum((F.col("__x").cast(_DEC) * F.col("__x")).cast(_DEC))
        .cast(_DEC)
        .alias("__sxxc"),
    )
    dev = run.join(F.broadcast(totals), ["w", "__chunk"]).select(
        "w",
        "__chunk",
        "__len",
        "__sc",
        "__sxxc",
        (
            F.col("__len").cast(_DEC) * F.col("__cum")
            - F.col("__j").cast(_DEC) * F.col("__sc")
        )
        .cast(_DEC)
        .alias("__d"),
    )
    chunks = dev.groupBy("w", "__chunk").agg(
        F.max("__len").alias("__len"),
        F.max("__sc").alias("__sc"),
        F.max("__sxxc").alias("__sxxc"),
        F.max("__d").alias("__dmax"),
        F.min("__d").alias("__dmin"),
    )
    # complete chunks with positive variance only
    lenc = F.col("__len").cast(_DEC)
    varn = (lenc * F.col("__sxxc") - F.col("__sc") * F.col("__sc")).cast(
        _DEC
    )
    good = chunks.filter(
        (F.col("__len") == F.col("w")) & (varn > F.lit(0).cast(_DEC))
    )
    # R = (dmax - dmin) / w  (deviations carry a factor w);
    # S = sqrt(varn / w^2) = sqrt(varn) / w  ->  R/S = (dmax-dmin)/sqrt(varn)
    rs = (
        (F.col("__dmax") - F.col("__dmin")).cast("double")
        / F.sqrt(varn.cast("double"))
    )
    rs_i = F.floor(rs * F.lit(1e6) + F.lit(0.5)).cast(_DEC)
    per_w = good.select("w", rs_i.alias("__rsi")).groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("__nc"),
        F.expr(
            "CAST(COALESCE(SUM(__rsi), 0) AS DECIMAL(38,0))"
            " div CAST(COUNT(*) AS DECIMAL(38,0))"
        )
        .cast("bigint")
        .alias("__rsavg"),
    )
    # 2-3 point OLS of ln(rsavg/1e6) on ln(w), each ln snapped to the
    # 1e9 round-9 lattice as a BIGINT so the tiny cross-point sums are
    # exact integers (a 3-double float sum is order-dependent)
    lw = F.floor(
        F.round(F.log(F.col("w").cast("double")), 9) * F.lit(1e9)
        + F.lit(0.5)
    ).cast(_DEC)
    lr = F.floor(
        F.round(F.log(F.col("__rsavg").cast("double") / F.lit(1e6)), 9)
        * F.lit(1e9)
        + F.lit(0.5)
    ).cast(_DEC)
    pts = per_w.filter(F.col("__rsavg") > 0).select(
        "w", "__rsavg", lw.alias("__lw"), lr.alias("__lr")
    )
    fit = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("__k"),
        F.sum("__lw").cast(_DEC).alias("__slw"),
        F.sum("__lr").cast(_DEC).alias("__slr"),
        F.sum((F.col("__lw") * F.col("__lr")).cast(_DEC))
        .cast(_DEC)
        .alias("__slwr"),
        F.sum((F.col("__lw") * F.col("__lw")).cast(_DEC))
        .cast(_DEC)
        .alias("__slww"),
        *[
            F.max(
                F.when(F.col("w") == int(wv), F.col("__rsavg"))
            ).alias(f"__rs{wv}")
            for wv in window_sizes
        ],
    )
    k = F.col("__k").cast(_DEC)
    h = (k * F.col("__slwr") - F.col("__slw") * F.col("__slr")).cast(
        "double"
    ) / (
        k * F.col("__slww") - F.col("__slw") * F.col("__slw")
    ).cast("double")
    nrow = idx.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    out = nrow.crossJoin(F.broadcast(fit))
    bad = (F.col("__k") < 2)
    cols = [
        "n_days",
        F.when(bad, F.lit(None).cast("bigint"))
        .otherwise(
            F.floor(h * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
        )
        .alias("h_x1e6"),
    ]
    for wv in window_sizes:
        cols.append(
            F.col(f"__rs{wv}").cast("bigint").alias(f"rs{wv}_x1e6")
        )
    return out.select(*cols)


def permutation_entropy3(
    daily: DataFrame,
    day_col: str,
    value_col: str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Normalized permutation entropy of order 3 (Bandt & Pompe, PRL
    2002): the complexity of the daily series as the entropy of its
    length-3 ordinal patterns — near 1 for noise, low for regular /
    strongly trending dynamics; robust to monotone transforms, unlike
    every moment-based screen in this module.

    Ties resolve by time order (the Bandt-Pompe convention): element
    ranks come from exact integer comparisons on (value, index) keys,
    so each window maps to one of 6 pattern ids with zero float ops.
    Pattern probabilities enter the entropy via per-pattern round-9-ln
    lattice terms (exact integer sum over <= 6 terms), normalized by
    the ln(6) literal fixed driver-side.

    Output: one row — ``n_windows, pe_x1e6`` (NULL when fewer than 1
    window).
    """
    ln6 = 1.791759469228055  # math.log(6.0), shared literal
    idx = _indexed_daily(daily, day_col, value_col)
    b1 = idx.select(
        (F.col("__t") - 1).alias("__t"), F.col("__x").alias("__b")
    )
    c1 = idx.select(
        (F.col("__t") - 2).alias("__t"), F.col("__x").alias("__c")
    )
    tri = (
        idx.join(F.broadcast(b1), "__t")
        .join(F.broadcast(c1), "__t")
        .select(F.col("__x").alias("__a"), "__b", "__c")
    )
    a, b, c = F.col("__a"), F.col("__b"), F.col("__c")
    ra = (b < a).cast("int") + (c < a).cast("int")
    rb = (a <= b).cast("int") + (c < b).cast("int")
    rc = (a <= c).cast("int") + (b <= c).cast("int")
    pat = (ra * 9 + rb * 3 + rc).alias("__pat")
    counts = tri.select(pat).groupBy("__pat").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    tot = counts.agg(
        F.coalesce(F.sum("__c"), F.lit(0)).cast("bigint").alias("__m")
    )
    full = counts.crossJoin(F.broadcast(tot))
    p = F.col("__c").cast("double") / F.col("__m").cast("double")
    term = F.floor(
        -p * F.round(F.log(p), 9) * F.lit(1e9) + F.lit(0.5)
    ).cast(_DEC)
    agg = full.agg(
        F.max("__m").cast("bigint").alias("n_windows"),
        F.coalesce(F.sum(term), F.lit(0).cast(_DEC)).alias("__h"),
    )
    pe = (
        F.col("__h").cast("double") / F.lit(1e9) / F.lit(ln6)
    )
    return agg.select(
        F.coalesce(F.col("n_windows"), F.lit(0))
        .cast("bigint")
        .alias("n_windows"),
        F.when(
            F.col("n_windows").isNull() | (F.col("n_windows") < 1),
            F.lit(None).cast("bigint"),
        )
        .otherwise(
            F.floor(pe * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
        )
        .alias("pe_x1e6"),
    )


def turning_points_test(
    daily: DataFrame,
    day_col: str,
    value_col: str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Turning-points randomness test (Kendall & Stuart, "The Advanced
    Theory of Statistics" vol. 3): the count T of STRICT interior local
    extrema against its i.i.d.-null moments

        ``E[T] = 2(n-2)/3,   Var[T] = (16n - 29)/90``

    — a pure-counting whiteness screen complementing q355's
    correlation-based Ljung-Box (a deterministic zig-zag passes LB at
    lag 7 but fails here, and vice versa for long smooth trends).
    Strict inequalities only (the classical test assumes a continuous
    law; tied neighbors simply contribute no turn — documented choice,
    identical in both engines).  T is an exact integer; z is ONE tree.

    Output: one row — ``n_days, n_turns, z_x1e6`` (NULL when n < 3).
    """
    idx = _indexed_daily(daily, day_col, value_col)
    b1 = idx.select(
        (F.col("__t") - 1).alias("__t"), F.col("__x").alias("__b")
    )
    c1 = idx.select(
        (F.col("__t") - 2).alias("__t"), F.col("__x").alias("__c")
    )
    tri = (
        idx.join(F.broadcast(b1), "__t")
        .join(F.broadcast(c1), "__t")
        .select(F.col("__x").alias("__a"), "__b", "__c")
    )
    turn = (
        ((F.col("__b") > F.col("__a")) & (F.col("__b") > F.col("__c")))
        | ((F.col("__b") < F.col("__a")) & (F.col("__b") < F.col("__c")))
    )
    t_cnt = tri.agg(
        F.coalesce(F.sum(F.when(turn, 1).otherwise(0)), F.lit(0))
        .cast("bigint")
        .alias("n_turns")
    )
    nrow = idx.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    out = nrow.crossJoin(F.broadcast(t_cnt))
    n = F.col("n_days").cast("double")
    z = (
        F.col("n_turns").cast("double")
        - F.lit(2.0) * (n - F.lit(2.0)) / F.lit(3.0)
    ) / F.sqrt((F.lit(16.0) * n - F.lit(29.0)) / F.lit(90.0))
    return out.select(
        "n_days",
        "n_turns",
        F.when(F.col("n_days") < 3, F.lit(None).cast("bigint"))
        .otherwise(
            F.floor(z * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
        )
        .alias("z_x1e6"),
    )


_EULER_GAMMA = 0.5772156649015329
_LN2 = 0.6931471805599453


def gumbel_pwm(
    daily: DataFrame,
    day_col: str,
    value_col: str,
    *,
    return_period: int = 12,
    scale: int = 1_000_000,
) -> DataFrame:
    """Gumbel (EV-I) fit to MONTHLY block maxima by probability-weighted
    moments (Greenwood et al., Water Resour. Res. 1979; Hosking 1986) —
    extreme-value capacity planning for the daily series: what peak
    should the next year's worst month be provisioned for.

        ``b0 = (1/m) * sum x_(i)``
        ``b1 = (1/(m(m-1))) * sum (i-1) * x_(i)``      (x sorted asc)
        ``beta = (2*b1 - b0) / ln 2``
        ``mu   = b0 - gamma * beta``                    (Euler gamma)
        ``x_T  = mu - beta * ln(-ln(1 - 1/T))``         (return level)

    Exactness: block maxima are exact integers; the rank weights come
    from a row_number over the BOUNDED monthly-maxima table (ties break
    on the month key — deterministic), so ``sum (i-1)*x_(i)`` is an
    exact DECIMAL(38,0); ln 2 / gamma / the T-quantile constant are
    driver-side literals, and each published value is ONE IEEE tree.

    Output: one row — ``n_blocks, block_max_avg (exact int div), beta
    _x1e6, mu_x1e6, rl_x1e6`` (NULL when m < 2 or beta <= 0 is fine —
    published as-is; only m < 2 nulls).
    """
    import math as _math

    from pyspark.sql import Window

    gq = -_math.log(-_math.log(1.0 - 1.0 / float(return_period)))
    blocks = (
        daily.select(
            F.date_trunc("month", F.col(day_col)).alias("__blk"),
            F.col(value_col).cast("bigint").alias("__x"),
        )
        .groupBy("__blk")
        .agg(F.max("__x").cast("bigint").alias("__mx"))
    )
    w = Window.orderBy(F.asc("__mx"), F.asc("__blk"))
    ranked = blocks.select(
        F.col("__mx"), (F.row_number().over(w) - F.lit(1)).alias("__i")
    )
    s = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        F.coalesce(F.sum(F.col("__mx").cast(_DEC)), F.lit(0).cast(_DEC))
        .cast(_DEC)
        .alias("__s"),
        F.coalesce(
            F.sum((F.col("__i").cast(_DEC) * F.col("__mx")).cast(_DEC)),
            F.lit(0).cast(_DEC),
        )
        .cast(_DEC)
        .alias("__s1"),
    )
    m = F.col("n_blocks").cast("double")
    b0 = F.col("__s").cast("double") / m
    b1 = F.col("__s1").cast("double") / (m * (m - F.lit(1.0)))
    beta = (F.lit(2.0) * b1 - b0) / F.lit(_LN2)
    mu = b0 - F.lit(_EULER_GAMMA) * beta
    rl = mu + beta * F.lit(gq)
    bad = F.col("n_blocks") < 2
    pub = lambda c: F.when(  # noqa: E731
        bad, F.lit(None).cast("bigint")
    ).otherwise(F.floor(c * F.lit(float(scale)) + F.lit(0.5)).cast("bigint"))
    return s.select(
        F.coalesce(F.col("n_blocks"), F.lit(0))
        .cast("bigint")
        .alias("n_blocks"),
        F.expr("CAST(__s div GREATEST(n_blocks, 1) AS BIGINT)").alias(
            "block_max_avg"
        ),
        pub(beta).alias("beta_x1e6"),
        pub(mu).alias("mu_x1e6"),
        pub(rl).alias("rl_x1e6"),
    )


def breusch_pagan(
    joined: DataFrame,
    day_col: str,
    y_col: str,
    x_col: str,
    *,
    resid_lattice: int = 1,
    u_lattice: int = 1_000_000_000,
    scale: int = 1_000_000,
) -> DataFrame:
    """Breusch-Pagan heteroskedasticity LM test (Breusch & Pagan,
    Econometrica 1979; Koenker's studentized form): after the static
    OLS ``y = a + b*x``, regress the SQUARED residuals on x —
    ``LM = n * R^2`` of that auxiliary regression, chi^2(1) under
    homoskedasticity.  The variance-structure companion to q367's
    level cointegration on the same two series.

    Determinism: (a, b) are bit-identical IEEE trees over exact
    moments (the q367 posture); residuals snap to ``resid_lattice``
    (default 1 — y is already on an integer lattice, sub-unit residual
    precision buys nothing); the squared residual is the exact integer
    ``r*r div u_lattice`` (pick u_lattice so u lands near 1e9 — its
    FOURTH moment must clear DECIMAL(38,0); identical truncation both
    engines); the auxiliary R^2 comes from exact DECIMAL(38,0) moments
    of (x, u).

    Output: one row — ``n_days, r2_aux_x1e6, lm_x1e6`` (NULL when
    n < 4, x constant, or the squared-residual column is constant).
    """
    from pyspark.sql import Window

    w = Window.orderBy(F.asc(day_col))
    idx = joined.select(
        F.row_number().over(w).alias("__t"),
        F.col(y_col).cast("bigint").alias("__y"),
        F.col(x_col).cast("bigint").alias("__x"),
    )
    z = F.lit(0).cast(_DEC)
    dec = lambda c: c.cast(_DEC)  # noqa: E731
    sums = idx.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.coalesce(F.sum(dec(F.col("__x"))), z).cast(_DEC).alias("__sx"),
        F.coalesce(F.sum(dec(F.col("__y"))), z).cast(_DEC).alias("__sy"),
        F.coalesce(F.sum(dec(F.col("__x")) * F.col("__x")), z)
        .cast(_DEC)
        .alias("__sxxr"),
        F.coalesce(F.sum(dec(F.col("__x")) * F.col("__y")), z)
        .cast(_DEC)
        .alias("__sxyr"),
    )
    nn = F.col("__n").cast(_DEC)
    sxx = (nn * F.col("__sxxr") - F.col("__sx") * F.col("__sx")).cast(
        "double"
    )
    sxy = (nn * F.col("__sxyr") - F.col("__sx") * F.col("__sy")).cast(
        "double"
    )
    bb = F.when(sxx > F.lit(0.0), sxy / sxx)
    aa = (
        F.col("__sy").cast("double") - bb * F.col("__sx").cast("double")
    ) / F.col("__n").cast("double")
    coefs = sums.select(
        F.col("__n").alias("__n"),
        bb.alias("__bb"),
        aa.alias("__aa"),
        (sxx > F.lit(0.0)).alias("__xok"),
    )
    rt = idx.crossJoin(F.broadcast(coefs))
    resid = F.when(
        F.col("__xok"),
        F.floor(
            (
                F.col("__y").cast("double")
                - (F.col("__aa") + F.col("__bb") * F.col("__x").cast("double"))
            )
            * F.lit(float(resid_lattice))
            + F.lit(0.5)
        ).cast(_DEC),
    )
    u = F.expr(
        f"CAST(__r * __r AS DECIMAL(38,0)) div {int(u_lattice)}"
    ).cast(_DEC)
    pairs = rt.select("__x", resid.alias("__r")).select(
        "__x", u.alias("__u")
    )
    m = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.coalesce(F.sum(dec(F.col("__x"))), z).cast(_DEC).alias("__px"),
        F.coalesce(F.sum(F.col("__u")), z).cast(_DEC).alias("__pu"),
        F.coalesce(F.sum(dec(F.col("__x")) * F.col("__x")), z)
        .cast(_DEC)
        .alias("__pxx"),
        F.coalesce(F.sum((F.col("__u") * F.col("__u")).cast(_DEC)), z)
        .cast(_DEC)
        .alias("__puu"),
        F.coalesce(F.sum((dec(F.col("__x")) * F.col("__u")).cast(_DEC)), z)
        .cast(_DEC)
        .alias("__pxu"),
    )
    nd = F.col("n_days").cast(_DEC)
    vx = (nd * F.col("__pxx") - F.col("__px") * F.col("__px")).cast(_DEC)
    vu = (nd * F.col("__puu") - F.col("__pu") * F.col("__pu")).cast(_DEC)
    cxu = (nd * F.col("__pxu") - F.col("__px") * F.col("__pu")).cast(_DEC)
    ok2 = (vx > z) & (vu > z)
    r2 = F.when(
        ok2,
        (cxu.cast("double") * cxu.cast("double"))
        / (vx.cast("double") * vu.cast("double")),
    )
    lm = F.col("n_days").cast("double") * r2
    bad = (F.col("n_days") < 4) | ~ok2
    pub = lambda c: F.when(  # noqa: E731
        bad, F.lit(None).cast("bigint")
    ).otherwise(F.floor(c * F.lit(float(scale)) + F.lit(0.5)).cast("bigint"))
    return m.select(
        F.col("n_days").cast("bigint").alias("n_days"),
        pub(r2).alias("r2_aux_x1e6"),
        pub(lm).alias("lm_x1e6"),
    )


def chow_test(
    joined: DataFrame,
    day_col: str,
    y_col: str,
    x_col: str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Chow structural-break F test (Chow, Econometrica 1960) of the
    simple regression ``y = a + b*x`` at the series midpoint: did the
    relationship's coefficients CHANGE between the first and second
    half — the regression-level complement to q217's mean-level
    changepoint.

        ``F = ((SSE_pooled - SSE_1 - SSE_2) / k)
             / ((SSE_1 + SSE_2) / (n - 2k))``,   k = 2

    Each SSE comes from exact centered DECIMAL(38,0) moments of its
    segment: ``SSE = (Syy_c - Sxy_c^2/Sxx_c) / n_seg`` — one IEEE tree
    per segment, mirrored verbatim.  The midpoint split is on the dense
    time index (first ``n div 2`` rows), identical in both engines.

    Output: one row — ``n_days, n_first, f_x1e6`` (NULL when either
    segment has < 3 points, any segment x is constant, or the pooled
    residual is 0).
    """
    from pyspark.sql import Window

    w = Window.orderBy(F.asc(day_col))
    idx = joined.select(
        F.row_number().over(w).alias("__t"),
        F.col(y_col).cast("bigint").alias("__y"),
        F.col(x_col).cast("bigint").alias("__x"),
    )
    nrow = idx.agg(F.count(F.lit(1)).cast("bigint").alias("__nall"))
    tagged = idx.crossJoin(F.broadcast(nrow)).select(
        F.when(F.col("__t") <= F.expr("__nall div 2"), F.lit(1))
        .otherwise(F.lit(2))
        .alias("__seg"),
        "__x",
        "__y",
    )
    z = F.lit(0).cast(_DEC)
    dec = lambda c: c.cast(_DEC)  # noqa: E731

    def moments(grouped):
        return grouped.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.coalesce(F.sum(dec(F.col("__x"))), z).cast(_DEC).alias("sx"),
            F.coalesce(F.sum(dec(F.col("__y"))), z).cast(_DEC).alias("sy"),
            F.coalesce(F.sum(dec(F.col("__x")) * F.col("__x")), z)
            .cast(_DEC)
            .alias("sxx"),
            F.coalesce(F.sum(dec(F.col("__y")) * F.col("__y")), z)
            .cast(_DEC)
            .alias("syy"),
            F.coalesce(F.sum(dec(F.col("__x")) * F.col("__y")), z)
            .cast(_DEC)
            .alias("sxy"),
        )

    def sse_cols(prefix=""):
        nn = F.col(f"{prefix}n").cast(_DEC)
        vx = (nn * F.col(f"{prefix}sxx") - F.col(f"{prefix}sx") * F.col(f"{prefix}sx")).cast("double")
        vy = (nn * F.col(f"{prefix}syy") - F.col(f"{prefix}sy") * F.col(f"{prefix}sy")).cast("double")
        cxy = (nn * F.col(f"{prefix}sxy") - F.col(f"{prefix}sx") * F.col(f"{prefix}sy")).cast("double")
        sse = F.when(
            vx > F.lit(0.0),
            (vy - cxy * cxy / vx) / F.col(f"{prefix}n").cast("double"),
        )
        return sse, vx

    per_seg = moments(tagged.groupBy("__seg"))
    seg1 = per_seg.filter(F.col("__seg") == 1).select(
        *[F.col(c).alias(f"a_{c}") for c in ("n", "sx", "sy", "sxx", "syy", "sxy")]
    )
    seg2 = per_seg.filter(F.col("__seg") == 2).select(
        *[F.col(c).alias(f"b_{c}") for c in ("n", "sx", "sy", "sxx", "syy", "sxy")]
    )
    pooled = moments(tagged.groupBy())
    out = (
        pooled.crossJoin(F.broadcast(seg1))
        .crossJoin(F.broadcast(seg2))
    )
    sse_p, vx_p = sse_cols("")
    sse_1, vx_1 = sse_cols("a_")
    sse_2, vx_2 = sse_cols("b_")
    k = F.lit(2.0)
    denom = (sse_1 + sse_2) / (
        F.col("n").cast("double") - F.lit(4.0)
    )
    f_stat = ((sse_p - sse_1 - sse_2) / k) / denom
    bad = (
        (F.col("a_n") < 3)
        | (F.col("b_n") < 3)
        | (vx_p <= F.lit(0.0))
        | (vx_1 <= F.lit(0.0))
        | (vx_2 <= F.lit(0.0))
        | (sse_1 + sse_2 <= F.lit(0.0))
        | (F.col("n") <= 4)
    )
    return out.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.col("a_n").cast("bigint").alias("n_first"),
        F.when(bad, F.lit(None).cast("bigint"))
        .otherwise(
            F.floor(f_stat * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
        )
        .alias("f_x1e6"),
    )


def granger_lag1(
    joined: DataFrame,
    day_col: str,
    y_col: str,
    x_col: str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Lag-1 Granger-causality screen (Granger, Econometrica 1969): does
    yesterday's x help predict today's y beyond yesterday's y?  With one
    lag the unrestricted regression ``y_t ~ y_{t-1} + x_{t-1}`` adds a
    single regressor, so the F(1, m-3) statistic collapses to the
    first-order partial correlation r = r(y_t, x_{t-1} | y_{t-1}):

        ``F = r^2 * (m - 3) / (1 - r^2)``   (m = n_days - 1 pairs)

    — the exact-moment machinery of ops.stats.partial_correlation applied
    to the lag-aligned daily table (the q373 pattern on the q367 axes:
    Engle-Granger asks whether the LEVELS share a trend, this asks
    whether one series' HISTORY improves the other's one-step forecast).

    All three Pearson terms come from exact DECIMAL(38,0) power sums over
    the lag pairs (means cleared by m); r and F are ONE mirrored IEEE
    tree.  The lag alignment is a broadcast self-join on the bounded
    daily table's dense index (same contract as ljung_box/arch_lm).

    Output: one row — ``n_pairs, r_partial_x1e6, f_x1e6`` (NULL stats
    when m < 4, any variance is zero, or a conditioning correlation is
    +-1).
    """
    w = Window.orderBy(F.asc(day_col))
    idx = joined.select(
        F.row_number().over(w).alias("__t"),
        F.col(y_col).cast("bigint").alias("__y"),
        F.col(x_col).cast("bigint").alias("__x"),
    )
    lagged = idx.select(
        (F.col("__t") + 1).alias("__t"),
        F.col("__y").alias("__a"),
        F.col("__x").alias("__b"),
    )
    pairs = idx.join(F.broadcast(lagged), "__t").select(
        F.col("__y").alias("__z"), "__a", "__b"
    )
    z = F.lit(0).cast(_DEC)
    dec = lambda c: c.cast(_DEC)  # noqa: E731
    s = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        *[
            F.coalesce(F.sum(expr), z).cast(_DEC).alias(name)
            for name, expr in (
                ("__sz", dec(F.col("__z"))),
                ("__sa", dec(F.col("__a"))),
                ("__sb", dec(F.col("__b"))),
                ("__szz", (dec(F.col("__z")) * F.col("__z")).cast(_DEC)),
                ("__saa", (dec(F.col("__a")) * F.col("__a")).cast(_DEC)),
                ("__sbb", (dec(F.col("__b")) * F.col("__b")).cast(_DEC)),
                ("__sza", (dec(F.col("__z")) * F.col("__a")).cast(_DEC)),
                ("__szb", (dec(F.col("__z")) * F.col("__b")).cast(_DEC)),
                ("__sab", (dec(F.col("__a")) * F.col("__b")).cast(_DEC)),
            )
        ],
    )
    m = F.col("m").cast(_DEC)
    czz = (m * F.col("__szz") - F.col("__sz") * F.col("__sz")).cast(_DEC)
    caa = (m * F.col("__saa") - F.col("__sa") * F.col("__sa")).cast(_DEC)
    cbb = (m * F.col("__sbb") - F.col("__sb") * F.col("__sb")).cast(_DEC)
    cza = (m * F.col("__sza") - F.col("__sz") * F.col("__sa")).cast(_DEC)
    czb = (m * F.col("__szb") - F.col("__sz") * F.col("__sb")).cast(_DEC)
    cab = (m * F.col("__sab") - F.col("__sa") * F.col("__sb")).cast(_DEC)
    d = lambda c: c.cast("double")  # noqa: E731
    ok_var = (czz > z) & (caa > z) & (cbb > z)
    r_za = F.when(ok_var, d(cza) / F.sqrt(d(czz) * d(caa)))
    r_zb = F.when(ok_var, d(czb) / F.sqrt(d(czz) * d(cbb)))
    r_ab = F.when(ok_var, d(cab) / F.sqrt(d(caa) * d(cbb)))
    den = (F.lit(1.0) - r_za * r_za) * (F.lit(1.0) - r_ab * r_ab)
    r_p = F.when(ok_var & (den > F.lit(0.0)), (r_zb - r_za * r_ab) / F.sqrt(den))
    one_minus = F.lit(1.0) - r_p * r_p
    f_stat = F.when(
        one_minus > F.lit(0.0),
        r_p * r_p * (F.col("m").cast("double") - F.lit(3.0)) / one_minus,
    )
    bad = (F.col("m") < 4) | ~ok_var | den.isNull() | (den <= F.lit(0.0))
    pub = lambda c: F.when(  # noqa: E731
        bad | c.isNull(), F.lit(None).cast("bigint")
    ).otherwise(F.floor(c * F.lit(float(scale)) + F.lit(0.5)).cast("bigint"))
    return s.select(
        F.col("m").cast("bigint").alias("n_pairs"),
        pub(r_p).alias("r_partial_x1e6"),
        pub(f_stat).alias("f_x1e6"),
    )


def pettitt_test(
    daily: DataFrame,
    day_col: str,
    value_col: str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Pettitt rank-based changepoint test (Pettitt, JRSS-C 1979): the
    nonparametric single-changepoint locator —

        ``U_t = sum_{i<=t} sum_{j>t} sign(x_i - x_j)``,
        ``K = max_t |U_t|``  over t = 1..n-1

    — the distribution-robust sibling of q217's CUSUM split (which uses
    means and is outlier-draggable).  Instead of the O(n^2) double sum,
    each row's TOTAL sign balance ``S_i = #(x_j < x_i) - #(x_j > x_i) =
    2*(rank_i - 1) + e_i - n`` (rank = 1 + strictly-smaller count, e_i =
    that value's multiplicity) comes from two rank windows over the
    BOUNDED daily table, and ``U_t`` is the running prefix sum of S_i in
    time order — exact integers throughout, ties handled by sign(0) = 0
    exactly.  The published ``stat_x1e6`` is the exponent argument
    ``6*K^2 / (n^3 + n^2)`` of Pettitt's approximate p-value
    ``p ~ 2*exp(-6K^2/(n^3+n^2))`` — monotone in p, so thresholding on
    it IS the test without either engine evaluating exp.

    Output: one row — ``n_days, t_star, k_stat, stat_x1e6`` where
    ``t_star`` is the SMALLEST prefix index attaining K (deterministic
    tie-break).  NULL stats when n < 2.
    """
    wt = Window.orderBy(F.asc(day_col))
    idx = daily.select(
        F.row_number().over(wt).alias("__t"),
        F.col(value_col).cast("bigint").alias("__x"),
    )
    wx = Window.orderBy(F.asc("__x"))
    n_w = Window.partitionBy(F.lit(1))
    ranked = idx.select(
        "__t",
        (
            F.lit(2) * (F.rank().over(wx) - F.lit(1))
            + F.count(F.lit(1)).over(Window.partitionBy("__x"))
            - F.count(F.lit(1)).over(n_w)
        )
        .cast("bigint")
        .alias("__s"),
        F.count(F.lit(1)).over(n_w).cast("bigint").alias("__n"),
    )
    run = Window.orderBy(F.asc("__t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    u = ranked.select(
        "__t",
        "__n",
        F.sum("__s").over(run).cast("bigint").alias("__u"),
    ).filter(F.col("__t") < F.col("__n"))
    fin = u.agg(
        F.max("__n").cast("bigint").alias("n_days"),
        F.max(F.abs(F.col("__u"))).cast("bigint").alias("k_stat"),
        F.min_by("__t", F.struct(F.abs(F.col("__u")).cast("bigint") * F.lit(-1), F.col("__t")))
        .cast("bigint")
        .alias("t_star"),
    )
    nn = F.col("n_days").cast("double")
    stat = (
        F.lit(6.0)
        * F.col("k_stat").cast("double")
        * F.col("k_stat").cast("double")
        / (nn * nn * nn + nn * nn)
    )
    bad = F.col("n_days").isNull() | (F.col("n_days") < 2)
    return fin.select(
        F.coalesce(F.col("n_days"), F.lit(0)).cast("bigint").alias("n_days"),
        F.when(bad, F.lit(None).cast("bigint")).otherwise(F.col("t_star")).alias("t_star"),
        F.when(bad, F.lit(None).cast("bigint")).otherwise(F.col("k_stat")).alias("k_stat"),
        F.when(bad, F.lit(None).cast("bigint"))
        .otherwise(F.floor(stat * F.lit(float(scale)) + F.lit(0.5)).cast("bigint"))
        .alias("stat_x1e6"),
    )


def diebold_mariano(
    daily: DataFrame,
    day_col: str,
    value_col: str,
    *,
    season: int = 7,
    err_lattice: int = 1_000,
    scale: int = 1_000_000,
) -> DataFrame:
    """Diebold-Mariano equal-predictive-accuracy test (Diebold &
    Mariano, JBES 1995) between the two benchmark forecasters q318
    scores descriptively (MASE/Theil-U2): seasonal-naive
    ``x_hat = x_{t-season}`` vs persistence ``x_hat = x_{t-1}``, squared
    loss, one-step horizon. The loss differential
    ``d_t = e1_t^2 - e2_t^2`` over the common support t > season gives

        ``DM = dbar / sqrt(s_d^2 / n) = S_d * sqrt((n-1) / V)``

    with S_d = sum d, V = n*sum d^2 - S_d^2 — ~N(0,1) under equal
    accuracy (h = 1, no autocorrelation correction needed beyond lag 0
    for one-step losses; the classical small-h form).

    Determinism/magnitude: raw errors are snapped to the declared
    ``err_lattice`` FIRST (floor(e / lattice) — floor of one IEEE
    division of exact integers, identical in both engines), so d_t and
    both moments are exact integers with headroom (|e| ~ 2.3e9 cents at
    sf0.1 -> e' ~ 2.3e6 -> n*sum d^2 ~ 1e28 << 1e38; coarsen the
    lattice upstream for larger deployments — the module magnitude
    contract). Lag alignment is the pinned-broadcast dense-index
    self-join. NULL stats when n < 2 or zero variance.

    Output: one row — ``n_pairs, sum_d, dm_x1e6`` (sum_d in squared
    lattice units, sign = which forecaster wins: negative means the
    seasonal-naive loss is smaller).
    """
    idx = _indexed_daily(daily, day_col, value_col)
    lag1 = idx.select(
        (F.col("__t") + 1).alias("__t"), F.col("__x").alias("__p1")
    )
    lags = idx.select(
        (F.col("__t") + season).alias("__t"), F.col("__x").alias("__ps")
    )
    trip = idx.join(F.broadcast(lag1), "__t").join(
        F.broadcast(lags), "__t"
    )
    snap = lambda e: F.floor(  # noqa: E731
        e.cast("double") / F.lit(float(err_lattice))
    ).cast("bigint")
    e1 = snap(F.col("__x") - F.col("__ps"))
    e2 = snap(F.col("__x") - F.col("__p1"))
    d = (e1.cast(_DEC) * e1 - e2.cast(_DEC) * e2).cast(_DEC)
    z = F.lit(0).cast(_DEC)
    s = trip.select(d.alias("__d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.coalesce(F.sum(F.col("__d")), z).cast(_DEC).alias("__sd"),
        F.coalesce(F.sum((F.col("__d") * F.col("__d")).cast(_DEC)), z)
        .cast(_DEC)
        .alias("__sdd"),
    )
    n = F.col("n_pairs").cast(_DEC)
    varnum = (n * F.col("__sdd") - F.col("__sd") * F.col("__sd")).cast(_DEC)
    dm = F.col("__sd").cast("double") * F.sqrt(
        (F.col("n_pairs").cast("double") - F.lit(1.0))
        / varnum.cast("double")
    )
    bad = (F.col("n_pairs") < 2) | (varnum <= z)
    return s.select(
        "n_pairs",
        F.when(F.col("n_pairs") < 1, F.lit(None).cast("bigint"))
        .otherwise(F.col("__sd").cast("bigint"))
        .alias("sum_d"),
        F.when(bad, F.lit(None).cast("bigint"))
        .otherwise(F.floor(dm * F.lit(float(scale)) + F.lit(0.5)).cast("bigint"))
        .alias("dm_x1e6"),
    )
