"""Unit tests for ops.stats.cochran_c / bland_altman and
ops.timeseries.breusch_pagan / chow_test: brute-force twins;
driver-scale parity in tools/parity_check.py (q378-q381)."""

import datetime as dt
import math
import random

from pyspark.sql import Row

from manufacturing_data_integration_tool_spark.ops.stats import (
    bland_altman,
    cochran_c,
)
from manufacturing_data_integration_tool_spark.ops.timeseries import (
    breusch_pagan,
    chow_test,
)


def test_cochran_c_points_at_the_variance_outlier(spark):
    rng = random.Random(17)
    rows, data = [], {}
    for g, spread in (("a", 5), ("b", 5), ("c", 30)):
        data[g] = []
        for _ in range(50):
            v = rng.randint(100 - spread, 100 + spread)
            rows.append(Row(g=g, v=v))
            data[g].append(v)
    out = cochran_c(spark.createDataFrame(rows), "g", "v").collect()[0]
    s2 = {}
    for g, vs in data.items():
        n, s, sxx = len(vs), sum(vs), sum(v * v for v in vs)
        s2[g] = math.floor((n * sxx - s * s) / (n * (n - 1)) * 1e6 + 0.5)
    c = max(s2.values()) / sum(s2.values())
    assert out["n_groups"] == 3 and out["top_group"] == "c"
    assert abs(out["c_x1e6"] - math.floor(c * 1e6 + 0.5)) <= 1
    # single usable group -> NULL
    one = spark.createDataFrame([Row(g="a", v=i) for i in range(5)])
    assert cochran_c(one, "g", "v").collect()[0]["c_x1e6"] is None


def test_breusch_pagan_detects_planted_heteroskedasticity(spark):
    rng = random.Random(17)
    n = 200
    xs = [rng.randint(10, 100) for _ in range(n)]
    ys = [5 * x + rng.randint(-x, x) for x in xs]  # var grows with x
    rows = [
        Row(d=dt.date(2020, 1, 1) + dt.timedelta(days=t), y=ys[t], x=xs[t])
        for t in range(n)
    ]
    out = breusch_pagan(
        spark.createDataFrame(rows),
        "d",
        "y",
        "x",
        resid_lattice=1_000_000,
        u_lattice=1_000_000,
    ).collect()[0]
    sx, sy = sum(xs), sum(ys)
    sxx = n * sum(x * x for x in xs) - sx * sx
    sxy = n * sum(a * b for a, b in zip(xs, ys)) - sx * sy
    b = sxy / sxx
    a = (sy - b * sx) / n
    res = [
        math.floor((y - (a + b * x)) * 1e6 + 0.5) for x, y in zip(xs, ys)
    ]
    us = [(r * r) // 10**6 for r in res]
    px, pu = sum(xs), sum(us)
    pxx = n * sum(x * x for x in xs) - px * px
    puu = n * sum(u * u for u in us) - pu * pu
    pxu = n * sum(x * u for x, u in zip(xs, us)) - px * pu
    r2 = (pxu * pxu) / (pxx * puu)
    assert out["n_days"] == n
    assert abs(out["r2_aux_x1e6"] - math.floor(r2 * 1e6 + 0.5)) <= 1
    assert abs(out["lm_x1e6"] - math.floor(n * r2 * 1e6 + 0.5)) <= 2
    assert out["lm_x1e6"] > 3_841_000  # > chi2(1) 5% critical value
    # constant x -> NULL
    crows = [
        Row(d=dt.date(2020, 1, 1) + dt.timedelta(days=t), y=t % 9, x=7)
        for t in range(20)
    ]
    assert (
        breusch_pagan(spark.createDataFrame(crows), "d", "y", "x")
        .collect()[0]["lm_x1e6"]
        is None
    )


def test_chow_detects_midpoint_break(spark):
    rng = random.Random(17)
    n = 240
    xs = [rng.randint(10, 100) for _ in range(n)]
    ys = [
        (3 * x if t < n // 2 else 8 * x) + rng.randint(-20, 20)
        for t, x in enumerate(xs)
    ]
    rows = [
        Row(d=dt.date(2020, 1, 1) + dt.timedelta(days=t), y=ys[t], x=xs[t])
        for t in range(n)
    ]
    out = chow_test(
        spark.createDataFrame(rows), "d", "y", "x"
    ).collect()[0]

    def sse(seg):
        m = len(seg)
        sx = sum(x for x, _ in seg)
        sy = sum(y for _, y in seg)
        vx = m * sum(x * x for x, _ in seg) - sx * sx
        vy = m * sum(y * y for _, y in seg) - sy * sy
        cxy = m * sum(x * y for x, y in seg) - sx * sy
        return (vy - cxy * cxy / vx) / m

    pool = list(zip(xs, ys))
    h = n // 2
    s_p, s_1, s_2 = sse(pool), sse(pool[:h]), sse(pool[h:])
    f = ((s_p - s_1 - s_2) / 2.0) / ((s_1 + s_2) / (n - 4.0))
    assert out["n_days"] == n and out["n_first"] == h
    assert abs(out["f_x1e6"] - math.floor(f * 1e6 + 0.5)) <= 2
    assert out["f_x1e6"] > 1_000_000_000  # unmistakable break
    # no-break series: F should be small
    ys2 = [3 * x + rng.randint(-20, 20) for x in xs]
    rows2 = [
        Row(d=dt.date(2020, 1, 1) + dt.timedelta(days=t), y=ys2[t], x=xs[t])
        for t in range(n)
    ]
    out2 = chow_test(
        spark.createDataFrame(rows2), "d", "y", "x"
    ).collect()[0]
    assert out2["f_x1e6"] < 5_000_000


def test_bland_altman_matches_brute(spark):
    rng = random.Random(17)
    xs = [rng.randint(100, 200) for _ in range(150)]
    ys = [x + 10 + rng.randint(-5, 5) for x in xs]
    out = bland_altman(
        spark.createDataFrame([Row(x=a, y=b) for a, b in zip(xs, ys)]),
        "x",
        "y",
    ).collect()[0]
    ds = [b - a for a, b in zip(xs, ys)]
    n = len(ds)
    bias = sum(ds) / n
    sd = math.sqrt(
        (n * sum(d * d for d in ds) - sum(ds) ** 2) / (n * (n - 1))
    )
    assert out["n"] == n
    assert abs(out["bias_x1e6"] - math.floor(bias * 1e6 + 0.5)) <= 1
    assert (
        abs(out["loa_lo_x1e6"] - math.floor((bias - 1.96 * sd) * 1e6 + 0.5))
        <= 1
    )
    assert (
        abs(out["loa_hi_x1e6"] - math.floor((bias + 1.96 * sd) * 1e6 + 0.5))
        <= 1
    )
    assert out["loa_lo_x1e6"] < out["bias_x1e6"] < out["loa_hi_x1e6"]
    empty = spark.createDataFrame([], "x long, y long")
    row = bland_altman(empty, "x", "y").collect()[0]
    assert row["bias_x1e6"] is None and row["loa_hi_x1e6"] is None


def test_bland_altman_constant_difference_nulls_limits(spark):
    # zero variance (constant y - x) publishes NULL limits per the
    # documented contract, with the bias still defined (r9 ADVICE fix:
    # the old varnum < 0 guard never fired and published lo == hi ==
    # bias instead)
    rows = [Row(x=a, y=a + 10) for a in range(50)]
    row = bland_altman(spark.createDataFrame(rows), "x", "y").collect()[0]
    assert row["n"] == 50
    assert row["bias_x1e6"] == 10_000_000
    assert row["loa_lo_x1e6"] is None
    assert row["loa_hi_x1e6"] is None
