"""Unit tests for ops.stats.partial_correlation / lins_ccc,
ops.timeseries.gumbel_pwm, and ops.evaluation.youden_threshold:
brute-force twins; driver-scale parity in tools/parity_check.py
(q373-q376); q377's partition pruning is plan-pinned in
test_plan_quality.py."""

import datetime as dt
import math
import random
from collections import defaultdict

from pyspark.sql import Row

from manufacturing_data_integration_tool_spark.ops.evaluation import (
    youden_threshold,
)
from manufacturing_data_integration_tool_spark.ops.stats import (
    lins_ccc,
    partial_correlation,
)
from manufacturing_data_integration_tool_spark.ops.timeseries import (
    gumbel_pwm,
)


def test_partial_correlation_removes_confounder(spark):
    rng = random.Random(13)
    zs = [rng.randint(1, 50) for _ in range(400)]
    xs = [z * 2 + rng.randint(-3, 3) for z in zs]
    ys = [z * 5 + rng.randint(-8, 8) for z in zs]
    out = partial_correlation(
        spark.createDataFrame(
            [Row(x=a, y=b, z=c) for a, b, c in zip(xs, ys, zs)]
        ),
        "x",
        "y",
        "z",
    ).collect()[0]
    n = len(zs)

    def pear(u, v):
        su, sv = sum(u), sum(v)
        return (n * sum(a * b for a, b in zip(u, v)) - su * sv) / math.sqrt(
            (n * sum(a * a for a in u) - su * su)
            * (n * sum(b * b for b in v) - sv * sv)
        )

    rxy, rxz, ryz = pear(xs, ys), pear(xs, zs), pear(ys, zs)
    part = (rxy - rxz * ryz) / math.sqrt(
        (1 - rxz * rxz) * (1 - ryz * ryz)
    )
    assert abs(out["r_xy_x1e6"] - math.floor(rxy * 1e6 + 0.5)) <= 1
    assert abs(out["partial_x1e6"] - math.floor(part * 1e6 + 0.5)) <= 1
    # the chain x <- z -> y: marginal r strong, partial near zero
    assert out["r_xy_x1e6"] > 800_000
    assert abs(out["partial_x1e6"]) < 200_000
    empty = spark.createDataFrame([], "x long, y long, z long")
    assert (
        partial_correlation(empty, "x", "y", "z").collect()[0][
            "partial_x1e6"
        ]
        is None
    )


def test_lins_ccc_penalizes_bias_pearson_forgives(spark):
    rng = random.Random(13)
    xs = [rng.randint(1, 100) for _ in range(300)]
    biased = [Row(x=a, y=a + 10) for a in xs]
    out = lins_ccc(spark.createDataFrame(biased), "x", "y").collect()[0]
    n = len(xs)
    ys = [a + 10 for a in xs]
    sx, sy = sum(xs), sum(ys)
    num = 2 * (n * sum(a * b for a, b in zip(xs, ys)) - sx * sy)
    den = (
        (n * sum(a * a for a in xs) - sx * sx)
        + (n * sum(b * b for b in ys) - sy * sy)
        + (sx - sy) ** 2
    )
    assert abs(out["ccc_x1e6"] - math.floor(num / den * 1e6 + 0.5)) <= 1
    assert out["ccc_x1e6"] < 1_000_000  # bias is charged
    perfect = lins_ccc(
        spark.createDataFrame([Row(x=a, y=a) for a in xs]), "x", "y"
    ).collect()[0]
    assert perfect["ccc_x1e6"] == 1_000_000


def test_gumbel_pwm_matches_brute_force(spark):
    rng = random.Random(13)
    rows = [
        Row(
            d=dt.date(2020, 1, 1) + dt.timedelta(days=t),
            x=rng.randint(100, 1000),
        )
        for t in range(400)
    ]
    out = gumbel_pwm(
        spark.createDataFrame(rows), "d", "x", return_period=12
    ).collect()[0]
    mx = defaultdict(int)
    for r in rows:
        mx[(r.d.year, r.d.month)] = max(mx[(r.d.year, r.d.month)], r.x)
    vals = sorted(mx.values())
    m = len(vals)
    b0 = sum(vals) / m
    b1 = sum(i * x for i, x in enumerate(vals)) / (m * (m - 1))
    beta = (2 * b1 - b0) / 0.6931471805599453
    mu = b0 - 0.5772156649015329 * beta
    rl = mu + beta * (-math.log(-math.log(1 - 1 / 12.0)))
    assert out["n_blocks"] == m
    assert abs(out["beta_x1e6"] - math.floor(beta * 1e6 + 0.5)) <= 1
    assert abs(out["mu_x1e6"] - math.floor(mu * 1e6 + 0.5)) <= 1
    assert abs(out["rl_x1e6"] - math.floor(rl * 1e6 + 0.5)) <= 1
    # the return level must sit above the location parameter
    assert out["rl_x1e6"] > out["mu_x1e6"]
    empty = spark.createDataFrame([], "d date, x long")
    assert gumbel_pwm(empty, "d", "x").collect()[0]["beta_x1e6"] is None


def test_youden_matches_exhaustive_threshold_search(spark):
    rng = random.Random(13)
    rows, data = [], []
    for _ in range(500):
        y = rng.random() < 0.4
        s = rng.randint(50, 100) if y else rng.randint(1, 70)
        rows.append(Row(s=s, y=y))
        data.append((s, y))
    out = youden_threshold(
        spark.createDataFrame(rows), "s", "y"
    ).collect()[0]
    p = sum(1 for s, y in data if y)
    n = len(data) - p
    best = None
    for t in sorted({s for s, _ in data}):
        tp = sum(1 for s, y in data if y and s >= t)
        fp = sum(1 for s, y in data if not y and s >= t)
        jn = n * tp - p * fp
        if best is None or jn > best[0] or (jn == best[0] and t < best[1]):
            best = (jn, t)
    assert out["n_pos"] == p and out["n_neg"] == n
    assert out["best_threshold"] == best[1]
    assert abs(out["j_x1e6"] - math.floor(best[0] / (p * n) * 1e6 + 0.5)) <= 1
    # single-class input -> NULL J
    one = spark.createDataFrame([Row(s=i, y=True) for i in range(5)])
    assert youden_threshold(one, "s", "y").collect()[0]["j_x1e6"] is None
