"""Unit tests for ops.timeseries (Ljung-Box, periodogram, KPSS, ARCH
LM): pure-Python brute-force twins on a synthetic weekly-seasonal
series; driver-scale parity against DuckDB lives in
tools/parity_check.py (q355-q358)."""

import datetime as dt
import math
import random

from pyspark.sql import Row

from manufacturing_data_integration_tool_spark.ops.timeseries import (
    arch_lm,
    kpss_level,
    ljung_box,
    periodogram_intensity,
    trig_weights,
)


def _weekly_series(n=120, seed=5):
    rng = random.Random(seed)
    xs = [rng.randint(100, 200) + (30 if t % 7 == 0 else 0) for t in range(n)]
    rows = [
        Row(d=dt.date(2020, 1, 1) + dt.timedelta(days=t), x=xs[t])
        for t in range(n)
    ]
    return xs, rows


def test_ljung_box_matches_brute_force(spark):
    xs, rows = _weekly_series()
    n = len(xs)
    out = ljung_box(spark.createDataFrame(rows), "d", "x").collect()[0]
    mean = sum(xs) / n
    den = sum((x - mean) ** 2 for x in xs)

    def r(k):
        return sum(
            (xs[t] - mean) * (xs[t + k] - mean) for t in range(n - k)
        ) / den

    q = n * (n + 2) * sum(r(k) ** 2 / (n - k) for k in range(1, 8))
    assert out["n_days"] == n
    assert abs(out["r1_x1e6"] - math.floor(r(1) * 1e6 + 0.5)) <= 1
    assert abs(out["r7_x1e6"] - math.floor(r(7) * 1e6 + 0.5)) <= 1
    # Q sums 7 lattice-rounded terms scaled by n(n+2) ~ 1.4e4
    assert abs(out["q_lb_x1e6"] - math.floor(q * 1e6 + 0.5)) <= 10


def test_periodogram_matches_brute_and_finds_weekly_line(spark):
    xs, rows = _weekly_series()
    n = len(xs)
    got = {
        r["period"]: r["intensity_x1e6"]
        for r in periodogram_intensity(
            spark.createDataFrame(rows), "d", "x", periods=(7, 30)
        ).collect()
    }
    wts = {(p, k): (wc, ws) for p, k, wc, ws in trig_weights((7, 30))}
    s = sum(xs)
    b = n * sum(x * x for x in xs) - s * s
    for p in (7, 30):
        c = sum(xs[t] * wts[(p, t % p)][0] for t in range(n))
        sn = sum(xs[t] * wts[(p, t % p)][1] for t in range(n))
        wc = sum(wts[(p, t % p)][0] for t in range(n))
        ws = sum(wts[(p, t % p)][1] for t in range(n))
        i_p = ((n * c - s * wc) ** 2 + (n * sn - s * ws) ** 2) / (
            n * n * b * 1e18
        )
        assert abs(got[p] - math.floor(i_p * 1e6 + 0.5)) <= 1
    assert got[7] > got[30]  # the planted weekly bump dominates


def test_kpss_matches_brute_force(spark):
    xs, rows = _weekly_series()
    n = len(xs)
    out = kpss_level(spark.createDataFrame(rows), "d", "x").collect()[0]
    s = sum(xs)
    num = sum(
        (n * sum(xs[: t + 1]) - (t + 1) * s) ** 2 for t in range(n)
    )

    def g(k):
        return sum((n * xs[t] - s) * (n * xs[t + k] - s) for t in range(n - k))

    lp1 = 8
    d = lp1 * g(0) + 2 * sum((lp1 - k) * g(k) for k in range(1, 8))
    eta = lp1 * num / (n * d)
    assert out["n_days"] == n
    assert abs(out["eta_x1e6"] - math.floor(eta * 1e6 + 0.5)) <= 1


def test_arch_lm_matches_brute_force(spark):
    xs, rows = _weekly_series()
    n = len(xs)
    out = arch_lm(
        spark.createDataFrame(rows), "d", "x", var_lattice=1
    ).collect()[0]
    s = sum(xs)
    vs = [((n * x - s) ** 2) // (n * n) for x in xs]
    pv, nv = vs[:-1], vs[1:]
    np_ = len(pv)
    sv, sw = sum(pv), sum(nv)
    svw = sum(a * b for a, b in zip(pv, nv))
    svv, sww = sum(a * a for a in pv), sum(b * b for b in nv)
    numr = np_ * svw - sv * sw
    vx, vy = np_ * svv - sv * sv, np_ * sww - sw * sw
    r = numr / math.sqrt(vx * vy)
    assert out["n_pairs"] == np_
    assert abs(out["r_x1e6"] - math.floor(r * 1e6 + 0.5)) <= 1
    assert abs(out["lm_x1e6"] - math.floor(np_ * r * r * 1e6 + 0.5)) <= 2


def test_timeseries_degenerate_inputs(spark):
    const = spark.createDataFrame(
        [
            Row(d=dt.date(2020, 1, 1) + dt.timedelta(days=t), x=5)
            for t in range(20)
        ]
    )
    assert ljung_box(const, "d", "x").collect()[0]["q_lb_x1e6"] is None
    assert kpss_level(const, "d", "x").collect()[0]["eta_x1e6"] is None
    assert (
        arch_lm(const, "d", "x", var_lattice=1).collect()[0]["lm_x1e6"]
        is None
    )
    assert all(
        r["intensity_x1e6"] is None
        for r in periodogram_intensity(
            const, "d", "x", periods=(7,)
        ).collect()
    )
    empty = spark.createDataFrame([], "d date, x long")
    assert ljung_box(empty, "d", "x").collect()[0]["n_days"] == 0
    assert kpss_level(empty, "d", "x").collect()[0]["eta_x1e6"] is None


def test_ljung_box_nulls_when_n_at_most_max_lag(spark):
    # documented contract: NULL stats whenever n <= max_lag — including
    # 1 < n <= max_lag where some lags simply have no pairs (r9 ADVICE:
    # previously Q was silently published over the surviving lags)
    short = spark.createDataFrame(
        [
            Row(d=dt.date(2020, 1, 1) + dt.timedelta(days=t), x=100 + 7 * t)
            for t in range(5)
        ]
    )
    row = ljung_box(short, "d", "x", max_lag=7).collect()[0]
    assert row["n_days"] == 5
    assert row["r1_x1e6"] is None
    assert row["r7_x1e6"] is None
    assert row["q_lb_x1e6"] is None
    # exactly max_lag days is still short; max_lag + 1 publishes
    row = ljung_box(short, "d", "x", max_lag=4).collect()[0]
    assert row["q_lb_x1e6"] is not None


def test_pacf3_matches_durbin_levinson_twin(spark):
    rng = random.Random(5)
    n = 200
    xs = [100]
    for _ in range(1, n):
        xs.append(int(0.6 * xs[-1] + rng.randint(20, 60)))
    rows = [
        Row(d=dt.date(2020, 1, 1) + dt.timedelta(days=t), x=xs[t])
        for t in range(n)
    ]
    from manufacturing_data_integration_tool_spark.ops.timeseries import (
        pacf3,
    )

    out = pacf3(spark.createDataFrame(rows), "d", "x").collect()[0]
    mean = sum(xs) / n
    den = sum((x - mean) ** 2 for x in xs)

    def r(k):
        return sum(
            (xs[t] - mean) * (xs[t + k] - mean) for t in range(n - k)
        ) / den

    r1, r2, r3 = r(1), r(2), r(3)
    p22 = (r2 - r1 * r1) / (1 - r1 * r1)
    p21 = r1 * (1 - r2) / (1 - r1 * r1)
    p33 = (r3 - p21 * r2 - p22 * r1) / (1 - p21 * r1 - p22 * r2)
    assert abs(out["pacf1_x1e6"] - math.floor(r1 * 1e6 + 0.5)) <= 1
    assert abs(out["pacf2_x1e6"] - math.floor(p22 * 1e6 + 0.5)) <= 1
    assert abs(out["pacf3_x1e6"] - math.floor(p33 * 1e6 + 0.5)) <= 1
    # AR(1)-ish: pacf1 large, pacf2/3 near zero
    assert out["pacf1_x1e6"] > 300_000
    assert abs(out["pacf2_x1e6"]) < 150_000


def test_engle_granger_matches_brute_and_flags_cointegration(spark):
    rng = random.Random(5)
    n = 200
    xs = [100]
    for _ in range(1, n):
        xs.append(int(0.6 * xs[-1] + rng.randint(20, 60)))
    ys = [3 * x + rng.randint(-5, 5) for x in xs]
    rows = [
        Row(
            d=dt.date(2020, 1, 1) + dt.timedelta(days=t),
            y=ys[t],
            x=xs[t],
        )
        for t in range(n)
    ]
    from manufacturing_data_integration_tool_spark.ops.timeseries import (
        engle_granger,
    )

    out = engle_granger(
        spark.createDataFrame(rows), "d", "y", "x"
    ).collect()[0]
    sx, sy = sum(xs), sum(ys)
    sxx = n * sum(x * x for x in xs) - sx * sx
    sxy = n * sum(a * b for a, b in zip(xs, ys)) - sx * sy
    b = sxy / sxx
    a = (sy - b * sx) / n
    res = [
        math.floor((y - (a + b * x)) * 1e6 + 0.5) for x, y in zip(xs, ys)
    ]
    rp = res[:-1]
    dr = [res[t + 1] - res[t] for t in range(n - 1)]
    srd = sum(p * d for p, d in zip(rp, dr))
    srr = sum(p * p for p in rp)
    sdd = sum(d * d for d in dr)
    rho = srd / srr
    sse = sdd - rho * rho * srr
    tdf = rho * math.sqrt(srr) / math.sqrt(sse / (len(rp) - 1))
    assert out["n_days"] == n
    assert abs(out["b_x1e6"] - math.floor(b * 1e6 + 0.5)) <= 1
    assert abs(out["rho_x1e6"] - math.floor(rho * 1e6 + 0.5)) <= 1
    assert abs(out["t_df_x1e6"] - math.floor(tdf * 1e6 + 0.5)) <= 1
    # white-noise spread: strongly mean-reverting
    assert out["t_df_x1e6"] < -5_000_000
    # constant x -> NULL
    crows = [
        Row(d=dt.date(2020, 1, 1) + dt.timedelta(days=t), y=t % 9, x=7)
        for t in range(20)
    ]
    out = engle_granger(
        spark.createDataFrame(crows), "d", "y", "x"
    ).collect()[0]
    assert out["t_df_x1e6"] is None


def test_hurst_rs_matches_brute_force(spark):
    rng = random.Random(5)
    n = 200
    xs = [100]
    for _ in range(1, n):
        xs.append(int(0.6 * xs[-1] + rng.randint(20, 60)))
    rows = [
        Row(d=dt.date(2020, 1, 1) + dt.timedelta(days=t), x=xs[t])
        for t in range(n)
    ]
    from manufacturing_data_integration_tool_spark.ops.timeseries import (
        hurst_rs,
    )

    out = hurst_rs(
        spark.createDataFrame(rows), "d", "x", window_sizes=(16, 32, 64)
    ).collect()[0]
    per_w = {}
    for w in (16, 32, 64):
        rss = []
        for c in range(n // w):
            chunk = xs[c * w : (c + 1) * w]
            s = sum(chunk)
            varn = w * sum(v * v for v in chunk) - s * s
            if varn <= 0:
                continue
            cum, devs = 0, []
            for j, v in enumerate(chunk, 1):
                cum += v
                devs.append(w * cum - j * s)
            rss.append(
                math.floor(
                    (max(devs) - min(devs)) / math.sqrt(varn) * 1e6 + 0.5
                )
            )
        if rss:
            per_w[w] = sum(rss) // len(rss)
    pts = [
        (
            math.floor(round(math.log(w), 9) * 1e9 + 0.5),
            math.floor(round(math.log(per_w[w] / 1e6), 9) * 1e9 + 0.5),
        )
        for w in per_w
        if per_w[w] > 0
    ]
    k = len(pts)
    slw = sum(p[0] for p in pts)
    slr = sum(p[1] for p in pts)
    slwr = sum(p[0] * p[1] for p in pts)
    slww = sum(p[0] * p[0] for p in pts)
    h = (k * slwr - slw * slr) / (k * slww - slw * slw)
    assert out["rs16_x1e6"] == per_w[16]
    assert out["rs32_x1e6"] == per_w[32]
    assert out["rs64_x1e6"] == per_w[64]
    assert abs(out["h_x1e6"] - math.floor(h * 1e6 + 0.5)) <= 1
    # constant series -> no usable chunks -> NULL
    const = spark.createDataFrame(
        [
            Row(d=dt.date(2020, 1, 1) + dt.timedelta(days=t), x=5)
            for t in range(40)
        ]
    )
    assert (
        hurst_rs(const, "d", "x", window_sizes=(16, 32)).collect()[0][
            "h_x1e6"
        ]
        is None
    )
