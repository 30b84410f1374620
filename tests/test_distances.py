"""Unit tests for ops.distances (total-variation / Bhattacharyya /
Hellinger PMF distances; Wasserstein-1 / energy ECDF distances):
pure-Python brute-force twins on micro-fixtures; driver-scale parity
against DuckDB lives in tools/parity_check.py (q353/q354)."""

import bisect
import math
import random
from collections import Counter

from pyspark.sql import Row

from manufacturing_data_integration_tool_spark.ops.distances import (
    ecdf_distances_binned,
    pmf_distances,
)


def _two_samples(seed=3):
    rng = random.Random(seed)
    a = [rng.randint(1, 10) for _ in range(40)]
    b = [rng.randint(4, 14) for _ in range(33)]
    rows = [Row(g="a", v=v) for v in a] + [Row(g="b", v=v) for v in b]
    return a, b, rows


def test_pmf_distances_match_brute_force(spark):
    a, b, rows = _two_samples()
    out = pmf_distances(
        spark.createDataFrame(rows), "g", "a", "b", "v"
    ).collect()[0]
    na, nb = len(a), len(b)
    ca, cb = Counter(a), Counter(b)
    vals = sorted(set(a + b))
    tv = 0.5 * sum(abs(ca[v] / na - cb[v] / nb) for v in vals)
    bc = sum(math.sqrt((ca[v] / na) * (cb[v] / nb)) for v in vals)
    hel = math.sqrt(max(0.0, 1.0 - bc))
    assert out["n_a"] == na and out["n_b"] == nb
    assert abs(out["tv_x1e6"] - math.floor(tv * 1e6 + 0.5)) <= 1
    # BC sums |V| 1e-6-lattice terms: allow |V| ulps of lattice slack
    assert abs(out["bc_x1e6"] - math.floor(bc * 1e6 + 0.5)) <= len(vals)
    assert abs(out["hellinger_x1e6"] - math.floor(hel * 1e6 + 0.5)) <= len(
        vals
    )


def test_pmf_identical_samples_are_zero_distance(spark):
    rows = [Row(g=g, v=v) for g in ("a", "b") for v in (1, 2, 2, 5)]
    out = pmf_distances(
        spark.createDataFrame(rows), "g", "a", "b", "v"
    ).collect()[0]
    assert out["tv_x1e6"] == 0
    assert abs(out["bc_x1e6"] - 1_000_000) <= 3
    assert out["hellinger_x1e6"] <= 2000  # sqrt amplifies lattice error


def test_ecdf_distances_match_brute_force(spark):
    a, b, rows = _two_samples()
    out = ecdf_distances_binned(
        spark.createDataFrame(rows), "g", "a", "b", "v"
    ).collect()[0]
    na, nb = len(a), len(b)
    sa, sb = sorted(a), sorted(b)
    lo, hi = min(sa + sb), max(sa + sb)
    fa = lambda t: bisect.bisect_right(sa, t) / na  # noqa: E731
    fb = lambda t: bisect.bisect_right(sb, t) / nb  # noqa: E731
    w1 = sum(abs(fa(t) - fb(t)) for t in range(lo, hi))
    en = 2.0 * sum((fa(t) - fb(t)) ** 2 for t in range(lo, hi))
    assert abs(out["w1_x1e6"] - math.floor(w1 * 1e6 + 0.5)) <= 1
    assert abs(out["energy_x1e6"] - math.floor(en * 1e6 + 0.5)) <= 1


def test_ecdf_identical_samples_zero_and_shift_is_w1(spark):
    rows = [Row(g=g, v=v) for g in ("a", "b") for v in (2, 4, 4, 9)]
    out = ecdf_distances_binned(
        spark.createDataFrame(rows), "g", "a", "b", "v"
    ).collect()[0]
    assert out["w1_x1e6"] == 0 and out["energy_x1e6"] == 0
    # a = b + 3 exactly: W1 equals the shift
    rows = [Row(g="a", v=v + 3) for v in (2, 4, 4, 9)] + [
        Row(g="b", v=v) for v in (2, 4, 4, 9)
    ]
    out = ecdf_distances_binned(
        spark.createDataFrame(rows), "g", "a", "b", "v"
    ).collect()[0]
    assert out["w1_x1e6"] == 3_000_000


def test_distances_empty_inputs_null_row(spark):
    empty = spark.createDataFrame([], "g string, v long")
    row = pmf_distances(empty, "g", "a", "b", "v").collect()[0]
    assert row["tv_x1e6"] is None and row["hellinger_x1e6"] is None
    row = ecdf_distances_binned(empty, "g", "a", "b", "v").collect()[0]
    assert row["w1_x1e6"] is None and row["energy_x1e6"] is None
