"""Unit tests for ops.stats.boxcox_grid, ops.timeseries
permutation_entropy3 / turning_points_test, and
ops.evaluation.info_gain_ranking: brute-force twins; driver-scale
parity in tools/parity_check.py (q369-q372)."""

import datetime as dt
import math
import random
from collections import Counter

from pyspark.sql import Row, functions as F

from manufacturing_data_integration_tool_spark.ops.evaluation import (
    info_gain_ranking,
)
from manufacturing_data_integration_tool_spark.ops.stats import boxcox_grid
from manufacturing_data_integration_tool_spark.ops.timeseries import (
    permutation_entropy3,
    turning_points_test,
)


def test_boxcox_matches_brute_and_prefers_log_for_lognormal(spark):
    rng = random.Random(11)
    vals = [max(1, int(math.exp(rng.gauss(6, 1)))) for _ in range(300)]
    out = {
        r["lam_x100"]: r
        for r in boxcox_grid(
            spark.createDataFrame([Row(x=v) for v in vals]), "x"
        ).collect()
    }
    n = len(vals)
    sln = sum(
        math.floor(round(math.log(v), 9) * 1e9 + 0.5) for v in vals
    )

    def yq(v, lam):
        if lam == -100:
            y = 1.0 - 1.0 / v
        elif lam == -50:
            y = 2.0 * (1.0 - 1.0 / math.sqrt(v))
        elif lam == 0:
            y = round(math.log(v), 9)
        elif lam == 50:
            y = 2.0 * (math.sqrt(v) - 1.0)
        else:
            y = float(v) - 1.0
        return math.floor(y * 1e6 + 0.5)

    for lam in (-100, -50, 0, 50, 100):
        ys = [yq(v, lam) for v in vals]
        varnum = n * sum(y * y for y in ys) - sum(ys) ** 2
        var = varnum / (n * n * 1e12)
        ll = -(n / 2.0) * round(math.log(var), 9) + (
            lam / 100.0 - 1.0
        ) * (sln / 1e9)
        assert abs(out[lam]["ll_x1e6"] - math.floor(ll * 1e6 + 0.5)) <= 1
    assert max(out, key=lambda lam: out[lam]["ll_x1e6"]) == 0
    # empty input: the lambda grid has nothing to group -> 0 rows
    empty = spark.createDataFrame([], "x long")
    assert boxcox_grid(empty, "x").count() == 0


def test_permutation_entropy_matches_brute_and_is_high_for_noise(spark):
    rng = random.Random(11)
    n = 150
    xs = [rng.randint(1, 100) for _ in range(n)]
    rows = [
        Row(d=dt.date(2020, 1, 1) + dt.timedelta(days=t), x=xs[t])
        for t in range(n)
    ]
    out = permutation_entropy3(
        spark.createDataFrame(rows), "d", "x"
    ).collect()[0]
    pats = Counter()
    for t in range(n - 2):
        a, b, c = xs[t], xs[t + 1], xs[t + 2]
        ra = (b < a) + (c < a)
        rb = (a <= b) + (c < b)
        rc = (a <= c) + (b <= c)
        pats[ra * 9 + rb * 3 + rc] += 1
    m = sum(pats.values())
    h = sum(
        math.floor(
            -(cv / m) * round(math.log(cv / m), 9) * 1e9 + 0.5
        )
        for cv in pats.values()
    )
    pe = h / 1e9 / 1.791759469228055
    assert out["n_windows"] == m
    assert abs(out["pe_x1e6"] - math.floor(pe * 1e6 + 0.5)) <= 1
    assert out["pe_x1e6"] > 900_000  # i.i.d. noise: near max entropy
    # strictly increasing series: single pattern -> entropy 0
    mono = spark.createDataFrame(
        [
            Row(d=dt.date(2020, 1, 1) + dt.timedelta(days=t), x=t)
            for t in range(30)
        ]
    )
    assert (
        permutation_entropy3(mono, "d", "x").collect()[0]["pe_x1e6"] == 0
    )


def test_turning_points_matches_brute(spark):
    rng = random.Random(11)
    n = 150
    xs = [rng.randint(1, 100) for _ in range(n)]
    rows = [
        Row(d=dt.date(2020, 1, 1) + dt.timedelta(days=t), x=xs[t])
        for t in range(n)
    ]
    out = turning_points_test(
        spark.createDataFrame(rows), "d", "x"
    ).collect()[0]
    t_brute = sum(
        1
        for t in range(n - 2)
        if (xs[t + 1] > xs[t] and xs[t + 1] > xs[t + 2])
        or (xs[t + 1] < xs[t] and xs[t + 1] < xs[t + 2])
    )
    z = (t_brute - 2 * (n - 2) / 3.0) / math.sqrt((16 * n - 29) / 90.0)
    assert out["n_days"] == n and out["n_turns"] == t_brute
    assert abs(out["z_x1e6"] - math.floor(z * 1e6 + 0.5)) <= 1
    # monotone series: zero turns, strongly negative z
    mono = spark.createDataFrame(
        [
            Row(d=dt.date(2020, 1, 1) + dt.timedelta(days=t), x=t)
            for t in range(60)
        ]
    )
    out = turning_points_test(mono, "d", "x").collect()[0]
    assert out["n_turns"] == 0 and out["z_x1e6"] < -5_000_000


def test_info_gain_ranks_the_predictive_feature_first(spark):
    rng = random.Random(11)
    rows, data = [], []
    for _ in range(400):
        f1 = rng.choice("ab")
        f2 = rng.choice("xyz")
        y = (f1 == "a" and rng.random() < 0.8) or (
            f1 == "b" and rng.random() < 0.2
        )
        rows.append(Row(f1=f1, f2=f2, y=bool(y)))
        data.append((f1, f2, bool(y)))
    out = {
        r["feature"]: r
        for r in info_gain_ranking(
            spark.createDataFrame(rows),
            F.col("y"),
            {"f1": F.col("f1"), "f2": F.col("f2")},
        ).collect()
    }

    def brute(fi):
        n = len(data)
        p = sum(1 for d in data if d[2])
        cells, pos = Counter(), Counter()
        for d in data:
            cells[d[fi]] += 1
            if d[2]:
                pos[d[fi]] += 1

        def hterm(num, nv):
            if 0 < num < nv:
                return -(num / nv) * round(math.log(num / nv), 9)
            return 0.0

        hcond = sum(
            math.floor(
                (cells[v] / n)
                * (
                    hterm(pos[v], cells[v])
                    + hterm(cells[v] - pos[v], cells[v])
                )
                * 1e9
                + 0.5
            )
            for v in cells
        )
        ig = hterm(p, n) + hterm(n - p, n) - hcond / 1e9
        gcond = sum(
            (cells[v] ** 2 - pos[v] ** 2 - (cells[v] - pos[v]) ** 2)
            * 10**9
            // cells[v]
            for v in cells
        )
        gg = (
            1.0
            - (p / n) ** 2
            - ((n - p) / n) ** 2
            - gcond / (1e9 * n)
        )
        return ig, gg, len(cells)

    for name, fi in (("f1", 0), ("f2", 1)):
        ig, gg, nl = brute(fi)
        assert out[name]["n_levels"] == nl
        assert (
            abs(out[name]["info_gain_x1e9"] - math.floor(ig * 1e9 + 0.5))
            <= 2
        )
        assert (
            abs(out[name]["gini_gain_x1e9"] - math.floor(gg * 1e9 + 0.5))
            <= 2
        )
    assert out["f1"]["info_gain_x1e9"] > out["f2"]["info_gain_x1e9"]
    assert out["f1"]["gini_gain_x1e9"] > out["f2"]["gini_gain_x1e9"]
