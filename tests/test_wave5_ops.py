"""Unit tests for ops.ranktests.quade, ops.distances.fosd_check, and
ops.similarity.cluster_validity: brute-force twins on micro-fixtures;
driver-scale parity in tools/parity_check.py (q363-q365)."""

import math
import random

from pyspark.sql import Row

from manufacturing_data_integration_tool_spark.ops.distances import (
    fosd_check,
)
from manufacturing_data_integration_tool_spark.ops.ranktests import quade
from manufacturing_data_integration_tool_spark.ops.similarity import (
    cluster_validity,
)


def _avg_ranks(vals):
    sv = sorted(vals)
    out = []
    for v in vals:
        lo = sum(1 for x in sv if x < v)
        eq = sum(1 for x in sv if x == v)
        out.append(lo + (eq + 1) / 2.0)
    return out


def test_quade_matches_textbook_twin(spark):
    """5 blocks x 3 treatments with within-block and range ties: T must
    match the classical Quade computation with average ranks."""
    data = {
        1: [10, 12, 15],
        2: [5, 5, 9],
        3: [20, 28, 30],
        4: [1, 2, 2],
        5: [7, 11, 13],
    }
    rows = [
        Row(b=b, j=f"t{j}", v=vs[j]) for b, vs in data.items() for j in range(3)
    ]
    out = quade(spark.createDataFrame(rows), "b", "j", "v").collect()[0]
    b, k = len(data), 3
    ranges = {i: max(vs) - min(vs) for i, vs in data.items()}
    q_ranks = dict(zip(ranges.keys(), _avg_ranks(list(ranges.values()))))
    s = {}
    for i, vs in data.items():
        r = _avg_ranks(vs)
        for j in range(3):
            s[(i, j)] = q_ranks[i] * (r[j] - (k + 1) / 2.0)
    a = sum(x * x for x in s.values())
    bstat = sum(
        sum(s[(i, j)] for i in data) ** 2 for j in range(3)
    ) / b
    t = (b - 1) * bstat / (a - bstat)
    assert out["n_blocks"] == b and out["k_treatments"] == k
    assert abs(out["t_x1e6"] - math.floor(t * 1e6 + 0.5)) <= 1


def test_quade_incomplete_block_dropped_and_degenerate_null(spark):
    rows = [
        Row(b=1, j="a", v=1),
        Row(b=1, j="b", v=2),
        Row(b=2, j="a", v=3),  # incomplete: no b-treatment
        Row(b=3, j="a", v=5),
        Row(b=3, j="b", v=4),
    ]
    out = quade(spark.createDataFrame(rows), "b", "j", "v").collect()[0]
    assert out["n_blocks"] == 2  # block 2 dropped
    # all blocks internally constant -> denominator 0 -> NULL
    rows = [
        Row(b=i, j=t, v=7) for i in range(4) for t in ("a", "b", "c")
    ]
    out = quade(spark.createDataFrame(rows), "b", "j", "v").collect()[0]
    assert out["t_x1e6"] is None


def test_fosd_verdicts(spark):
    # b = a + 5 exactly: b dominates a... a's CDF is >= b's everywhere,
    # so F_a > F_b somewhere -> n_viol_a > 0, n_viol_b = 0 ->
    # b_dominates = 1 (b stochastically larger).
    a = [1, 3, 5, 7]
    rows = [Row(g="a", v=v) for v in a] + [Row(g="b", v=v + 5) for v in a]
    out = fosd_check(
        spark.createDataFrame(rows), "g", "a", "b", "v"
    ).collect()[0]
    assert out["b_dominates"] == 1 and out["a_dominates"] == 0
    assert out["n_viol_b"] == 0 and out["n_viol_a"] > 0
    # identical -> neither dominates
    rows = [Row(g=g, v=v) for g in ("a", "b") for v in a]
    out = fosd_check(
        spark.createDataFrame(rows), "g", "a", "b", "v"
    ).collect()[0]
    assert out["a_dominates"] == 0 and out["b_dominates"] == 0
    assert out["n_viol_a"] == 0 and out["n_viol_b"] == 0
    # crossing CDFs -> violations both ways, neither dominates
    rows = [Row(g="a", v=v) for v in (1, 10)] + [
        Row(g="b", v=v) for v in (5, 6)
    ]
    out = fosd_check(
        spark.createDataFrame(rows), "g", "a", "b", "v"
    ).collect()[0]
    assert out["n_viol_a"] > 0 and out["n_viol_b"] > 0
    assert out["a_dominates"] == 0 and out["b_dominates"] == 0
    # empty -> NULL flags
    empty = spark.createDataFrame([], "g string, v long")
    out = fosd_check(empty, "g", "a", "b", "v").collect()[0]
    assert out["a_dominates"] is None


def test_cluster_validity_matches_brute_force(spark):
    rng = random.Random(4)
    # two well-separated 3-d clusters + lattice-friendly components
    rows, pts = [], []
    for i in range(30):
        cell = i % 2
        base = 0.0 if cell == 0 else 5.0
        vec = [round(base + rng.uniform(-0.5, 0.5), 4) for _ in range(3)]
        rows.append(Row(cell=cell, embedding=vec))
        pts.append((cell, vec))
    out = cluster_validity(
        spark.createDataFrame(rows), "cell", "embedding"
    ).collect()[0]
    # brute on the same 1e6 lattice with the same per-term floor-div
    lat = 10**6
    q = [(c, [math.floor(x * lat + 0.5) for x in v]) for c, v in pts]
    cells = sorted({c for c, _ in q})
    w = 0
    for c in cells:
        for d in range(3):
            xs = [v[d] for cc, v in q if cc == c]
            n = len(xs)
            w += (n * sum(x * x for x in xs) - sum(xs) ** 2) // n
    sst = 0
    for d in range(3):
        xs = [v[d] for _, v in q]
        n = len(xs)
        sst += (n * sum(x * x for x in xs) - sum(xs) ** 2) // n
    b = sst - w
    n, k = len(q), len(cells)
    ch = (b / (k - 1)) / (w / (n - k))
    assert out["n_vecs"] == n and out["n_cells"] == k
    assert out["ss_within"] == w and out["ss_between"] == b
    assert abs(out["ch_x1e6"] - math.floor(ch * 1e6 + 0.5)) <= 1
    assert out["ch_x1e6"] > 10_000_000  # clearly separated clusters


def test_cluster_validity_single_cell_is_null(spark):
    rows = [Row(cell=0, embedding=[float(i), 1.0]) for i in range(5)]
    out = cluster_validity(
        spark.createDataFrame(rows), "cell", "embedding"
    ).collect()[0]
    assert out["n_cells"] == 1 and out["ch_x1e6"] is None
