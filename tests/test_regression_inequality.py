"""Unit tests for ops.stats.ols2_closed_form / theil_atkinson /
grubbs_extreme and ops.similarity.map_recall_from_pages: brute-force
twins on micro-fixtures; driver-scale parity in tools/parity_check.py
(q359-q362)."""

import math
import random

from pyspark.sql import Row

from manufacturing_data_integration_tool_spark.ops.similarity import (
    map_recall_from_pages,
)
from manufacturing_data_integration_tool_spark.ops.stats import (
    grubbs_extreme,
    ols2_closed_form,
    theil_atkinson,
)


def test_ols2_recovers_planted_coefficients(spark):
    rng = random.Random(9)
    rows, data = [], []
    for _ in range(200):
        x1, x2 = rng.randint(1, 50), rng.randint(0, 10)
        y = 1000 + 30 * x1 - 70 * x2 + rng.randint(-50, 50)
        rows.append(Row(y=y, x1=x1, x2=x2))
        data.append((y, x1, x2))
    out = ols2_closed_form(
        spark.createDataFrame(rows), "y", "x1", "x2"
    ).collect()[0]
    # brute normal equations (pure python, exact ints then float solve)
    n = len(data)
    sy = sum(d[0] for d in data)
    sx1 = sum(d[1] for d in data)
    sx2 = sum(d[2] for d in data)
    s11 = n * sum(d[1] * d[1] for d in data) - sx1 * sx1
    s22 = n * sum(d[2] * d[2] for d in data) - sx2 * sx2
    s12 = n * sum(d[1] * d[2] for d in data) - sx1 * sx2
    s1y = n * sum(d[1] * d[0] for d in data) - sx1 * sy
    s2y = n * sum(d[2] * d[0] for d in data) - sx2 * sy
    syy = n * sum(d[0] * d[0] for d in data) - sy * sy
    det = s11 * s22 - s12 * s12
    b1 = (s1y * s22 - s2y * s12) / det
    b2 = (s2y * s11 - s1y * s12) / det
    b0 = (sy - b1 * sx1 - b2 * sx2) / n
    r2 = (b1 * s1y + b2 * s2y) / syy
    assert out["n"] == n
    assert abs(out["b1_x1e6"] - math.floor(b1 * 1e6 + 0.5)) <= 1
    assert abs(out["b2_x1e6"] - math.floor(b2 * 1e6 + 0.5)) <= 1
    assert abs(out["intercept_x1e6"] - math.floor(b0 * 1e6 + 0.5)) <= 1
    assert abs(out["r2_x1e6"] - math.floor(r2 * 1e6 + 0.5)) <= 1
    # sanity: near the planted model
    assert abs(out["b1_x1e6"] / 1e6 - 30) < 1
    assert abs(out["b2_x1e6"] / 1e6 + 70) < 2


def test_ols2_collinear_and_empty_are_null(spark):
    rng = random.Random(1)
    rows = [
        Row(y=rng.randint(1, 100), x1=i % 10, x2=2 * (i % 10))
        for i in range(50)
    ]
    out = ols2_closed_form(
        spark.createDataFrame(rows), "y", "x1", "x2"
    ).collect()[0]
    assert out["b1_x1e6"] is None and out["r2_x1e6"] is None
    empty = spark.createDataFrame([], "y long, x1 long, x2 long")
    out = ols2_closed_form(empty, "y", "x1", "x2").collect()[0]
    assert out["n"] == 0 and out["b1_x1e6"] is None


def test_theil_atkinson_match_brute_force(spark):
    rng = random.Random(9)
    vals = [rng.randint(1, 100000) for _ in range(300)]
    out = theil_atkinson(
        spark.createDataFrame([Row(x=v) for v in vals]), "x"
    ).collect()[0]
    n, s = len(vals), sum(vals)
    mu = s / n
    theil = sum((v / s) * (math.log(v) - math.log(mu)) for v in vals)
    atk = 1 - (sum(math.sqrt(v) for v in vals) / n) ** 2 / mu
    assert out["n"] == n and out["total"] == s
    assert abs(out["theil_x1e6"] - math.floor(theil * 1e6 + 0.5)) <= 2
    assert abs(out["atkinson_x1e6"] - math.floor(atk * 1e6 + 0.5)) <= 2
    # perfectly equal values -> both indices 0 (up to lattice slack)
    eq = theil_atkinson(
        spark.createDataFrame([Row(x=500)] * 40), "x"
    ).collect()[0]
    assert abs(eq["theil_x1e6"]) <= 1 and abs(eq["atkinson_x1e6"]) <= 1


def test_grubbs_matches_brute_and_exact_3s_count(spark):
    rng = random.Random(9)
    vals = [rng.randint(1, 1000) for _ in range(200)] + [50000]
    out = grubbs_extreme(
        spark.createDataFrame([Row(x=v) for v in vals]), "x"
    ).collect()[0]
    n, s = len(vals), sum(vals)
    mean = s / n
    sd = math.sqrt(sum((v - mean) ** 2 for v in vals) / (n - 1))
    g = max(abs(v - mean) for v in vals) / sd
    nb = sum(1 for v in vals if abs(v - mean) > 3 * sd)
    assert out["n"] == n
    assert abs(out["g_x1e6"] - math.floor(g * 1e6 + 0.5)) <= 1
    assert out["n_beyond_3s"] == nb and nb >= 1
    const = grubbs_extreme(
        spark.createDataFrame([Row(x=7)] * 10), "x"
    ).collect()[0]
    assert const["g_x1e6"] is None


def test_map_recall_matches_hand_computation(spark):
    # two queries: q1 page rel pattern 1,0,1 at ranks 1..3; q2 all miss
    pages = spark.createDataFrame(
        [
            Row(qid="q1", rank=1, rel=True),
            Row(qid="q1", rank=2, rel=False),
            Row(qid="q1", rank=3, rel=True),
            Row(qid="q2", rank=1, rel=False),
            Row(qid="q2", rank=2, rel=False),
        ]
    )
    total = spark.createDataFrame([Row(n_rel_total=4)])
    rows = {
        r["qid"]: r
        for r in map_recall_from_pages(
            pages, "qid", "rank", "rel", total, k=3
        ).collect()
    }
    # AP@3(q1) = (1/3) * (1/1 + 2/3); floor-div lattice arithmetic
    ap1 = (10**12 * 1 // 1 + 10**12 * 2 // 3) // 3
    assert rows["q1"]["n_hits"] == 2 and rows["q1"]["ap_x1e12"] == ap1
    assert rows["q1"]["recall_x1e12"] == 10**12 * 2 // 4
    assert rows["q2"]["ap_x1e12"] == 0 and rows["q2"]["recall_x1e12"] == 0
    assert rows["q1"]["map_x1e12"] == (ap1 + 0) // 2
    assert (
        rows["q1"]["mean_recall_x1e12"]
        == (10**12 * 2 // 4 + 0) // 2
    )
