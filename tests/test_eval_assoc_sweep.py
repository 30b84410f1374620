"""Unit tests for the round-6 evaluation / association / sweep-line ops:
ROC-AUC (Mann-Whitney), calibration bins, RRF fusion, pair lift, and
interval concurrency — hand-computed fixtures, not oracle round-trips
(the oracles cover q196-q200 separately)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from manufacturing_data_integration_tool_spark.ops.association import pair_lift
from manufacturing_data_integration_tool_spark.ops.evaluation import (
    calibration_bins,
    roc_auc,
)
from manufacturing_data_integration_tool_spark.ops.similarity import rrf_fuse
from manufacturing_data_integration_tool_spark.ops.temporal import (
    interval_concurrency,
)


def test_roc_auc_matches_hand_computed_pair_probability(spark):
    # positives {3, 5, 5, 8}, negatives {1, 5, 7}: of the 12 pos/neg
    # pairs, 6 wins + 2 half-credit ties -> AUC = 7/12
    rows = [(3, 1), (5, 1), (5, 1), (8, 1), (1, 0), (5, 0), (7, 0)]
    df = spark.createDataFrame(rows, "s long, y int")
    out = roc_auc(df, "s", "y").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_pos"], r["n_neg"]) == (4, 3)
    assert r["auc"] == pytest.approx(7 / 12, abs=1e-6)


def test_roc_auc_extremes_and_degenerate_groups(spark):
    rows = [
        ("sep", 10, 1), ("sep", 11, 1), ("sep", 1, 0), ("sep", 2, 0),
        ("rev", 1, 1), ("rev", 2, 1), ("rev", 10, 0), ("rev", 11, 0),
        ("deg", 5, 1), ("deg", 6, 1),
    ]
    df = spark.createDataFrame(rows, "g string, s long, y int")
    out = {r["g"]: r for r in roc_auc(df, "s", "y", group_cols=["g"]).collect()}
    assert out["sep"]["auc"] == 1.0
    assert out["rev"]["auc"] == 0.0
    assert out["deg"]["auc"] is None  # no negatives


def test_calibration_bins_integer_edges(spark):
    # scores 1..8, min=1 max=8: bin = least(2, (s-1)*3 div 8) for n_bins=3
    rows = [(1, 0), (2, 1), (3, 0), (5, 1), (5, 1), (5, 0), (7, 0), (8, 1)]
    df = spark.createDataFrame(rows, "s long, y int")
    out = {r["bin"]: r for r in calibration_bins(df, "s", "y", n_bins=3).collect()}
    assert out[0]["n"] == 3 and out[0]["n_pos"] == 1          # s in {1,2,3}
    assert out[1]["n"] == 3 and out[1]["n_pos"] == 2          # the three 5s
    assert out[2]["n"] == 2 and out[2]["mean_score"] == 7.5   # s in {7,8}
    assert out[1]["pos_rate"] == pytest.approx(2 / 3, abs=1e-6)


def test_rrf_fuse_scaled_integer_sums(spark):
    r1 = spark.createDataFrame([("d1", 1), ("d2", 2)], "doc_id string, rank long")
    r2 = spark.createDataFrame([("d2", 1), ("d3", 2)], "doc_id string, rank long")
    out = rrf_fuse([r1, r2], top=3).collect()
    c1, c2 = 10**12 // 61, 10**12 // 62
    got = {r["doc_id"]: r for r in out}
    assert [r["doc_id"] for r in out] == ["d2", "d1", "d3"]
    assert got["d2"]["rrf_scaled"] == c1 + c2 and got["d2"]["n_sources"] == 2
    assert got["d1"]["rrf_scaled"] == c1 and got["d1"]["fused_rank"] == 2
    assert got["d3"]["rrf_scaled"] == c2


def test_pair_lift_counts_support_lift_and_cap(spark):
    rows = [
        ("b1", "A"), ("b1", "B"),
        ("b2", "A"), ("b2", "B"), ("b2", "B"),   # duplicate item collapses
        ("b3", "A"), ("b3", "C"),
        # wide basket: dropped entirely by max_basket_items=3
        ("b4", "A"), ("b4", "B"), ("b4", "C"), ("b4", "D"),
    ]
    df = spark.createDataFrame(rows, "b string, i string")
    out = pair_lift(df, "b", "i", min_pair_count=2, max_basket_items=3).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["item_a"], r["item_b"], r["n_pair"]) == ("A", "B", 2)
    assert (r["n_a"], r["n_b"], r["n_baskets"]) == (3, 2, 3)
    assert r["support"] == pytest.approx(2 / 3, abs=1e-6)
    assert r["lift"] == pytest.approx(1.0)


def test_interval_concurrency_sweep(spark):
    d = dt.date
    rows = [
        (d(2024, 1, 1), d(2024, 1, 3)),
        (d(2024, 1, 2), d(2024, 1, 4)),
        (d(2024, 1, 6), d(2024, 1, 6)),
        (d(2024, 1, 9), d(2024, 1, 8)),   # end < start: dropped
        (None, d(2024, 1, 5)),            # NULL endpoint: dropped
    ]
    df = spark.createDataFrame(rows, "s date, e date")
    out = {r["day"]: r["concurrent"] for r in interval_concurrency(df, "s", "e").collect()}
    assert out[d(2024, 1, 1)] == 1
    assert out[d(2024, 1, 2)] == 2
    assert out[d(2024, 1, 4)] == 1   # first interval closed end-of-day 3
    assert out[d(2024, 1, 5)] == 0
    assert out[d(2024, 1, 6)] == 1
    assert out[d(2024, 1, 7)] == 0
    assert max(out.values()) == 2


def test_pr_curve_confusion_counts(spark):
    # same fixture as the AUC test: pos {3,5,5,8}, neg {1,5,7}
    rows = [(3, 1), (5, 1), (5, 1), (8, 1), (1, 0), (5, 0), (7, 0)]
    from manufacturing_data_integration_tool_spark.ops.evaluation import pr_curve

    df = spark.createDataFrame(rows, "s long, y int")
    out = {r["threshold"]: r for r in pr_curve(df, "s", "y").collect()}
    assert set(out) == {1, 3, 5, 7, 8}
    assert (out[1]["tp"], out[1]["fp"], out[1]["fn"]) == (4, 3, 0)
    assert out[1]["recall"] == 1.0
    assert (out[5]["tp"], out[5]["fp"], out[5]["fn"]) == (3, 2, 1)
    assert out[5]["precision"] == pytest.approx(3 / 5, abs=1e-6)
    assert (out[8]["tp"], out[8]["fp"]) == (1, 0)
    assert out[8]["precision"] == 1.0 and out[8]["recall"] == 0.25


def test_twap_holds_value_until_next_sample(spark):
    from manufacturing_data_integration_tool_spark.ops.temporal import twap

    rows = [
        ("k", "2024-03-01 00:00:00", 1.0),
        ("k", "2024-03-01 06:00:00", 3.0),
        ("k", "2024-03-01 18:00:00", 5.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts string, value double")
    out = twap(df, ["k"], "ts", "value").collect()
    assert len(out) == 1
    r = out[0]
    # 6h @ 1.0 + 12h @ 3.0 + 6h @ 5.0 over 24h = 3.0 exactly
    assert r["n_samples"] == 3
    assert r["twap"] == pytest.approx(3.0, abs=1e-6)


def test_bloom_no_false_negatives_and_mergeable(spark):
    from manufacturing_data_integration_tool_spark.ops.stats import (
        bloom_build,
        bloom_probe,
    )

    a = spark.createDataFrame([(f"m{i}",) for i in range(25)], "k string")
    b = spark.createDataFrame([(f"n{i}",) for i in range(25)], "k string")
    both = a.unionByName(b)
    # invariant 1: every built key probes positive (no false negatives)
    bloom = bloom_build(both, "k", m_words=8, k=4)
    probed = bloom_probe(both, "k", bloom, m_words=8, k=4)
    assert all(r["maybe_member"] for r in probed.collect())
    # invariant 2: the union filter equals the bit_or merge of the parts
    merged = (
        bloom_build(a, "k", m_words=8, k=4)
        .unionByName(bloom_build(b, "k", m_words=8, k=4))
        .groupBy("word_idx")
        .agg(F.bit_or("bits").alias("bits"))
    )
    assert sorted(map(tuple, bloom.collect())) == sorted(map(tuple, merged.collect()))
    # invariant 3: a near-saturated filter produces false positives
    # (the probabilistic side of the contract; no-false-negatives above
    # is the hard side)
    tiny = bloom_build(both, "k", m_words=1, k=4)
    others = spark.createDataFrame([(f"z{i}",) for i in range(20)], "k string")
    sat = sum(r["maybe_member"] for r in bloom_probe(
        others, "k", tiny, m_words=1, k=4).collect())
    assert sat >= 10  # 50 keys x 4 lanes over 32 bits: most probes collide


def test_bloom_prefilter_is_lossless_scalar_reduction(spark):
    """bloom_prefilter (r12): the scalar pre-shuffle variant must (a)
    keep EVERY true member (no false negatives — prefilter∘exact-join
    equals the plain join), (b) agree with bloom_probe's per-key verdict
    row for row, and (c) never shuffle the probe side before the bloom
    predicate (the 1-row map broadcast is the only join below it)."""
    from manufacturing_data_integration_tool_spark.ops.stats import (
        bloom_build,
        bloom_prefilter,
        bloom_probe,
    )

    members = spark.range(0, 300).selectExpr("id * 3 AS k")
    probe = spark.range(0, 2000).selectExpr("id AS k", "id % 7 AS v")
    bloom = bloom_build(members, "k", m_words=64, k=4)
    pre = bloom_prefilter(probe, "k", bloom, m_words=64, k=4)
    # (a) lossless: exact join after the prefilter == plain semi join
    want = sorted(
        map(tuple, probe.join(members.distinct(), "k", "left_semi").collect())
    )
    got = sorted(
        map(tuple, pre.join(members.distinct(), "k", "left_semi").collect())
    )
    assert got == want
    # (b) row-for-row agreement with bloom_probe's verdict
    verdict = {
        r["k"]: r["maybe_member"]
        for r in bloom_probe(probe, "k", bloom, m_words=64, k=4).collect()
    }
    kept = {r["k"] for r in pre.select("k").collect()}
    assert kept == {k for k, m in verdict.items() if m}
    # (c) no probe-side shuffle below the bloom predicate: the only
    # hash exchange in the prefilter plan is the filter BUILD's
    # word_idx groupBy, never one on the probe key
    import re

    plan = pre._jdf.queryExecution().executedPlan().toString()
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "word_idx" in m.group(1), plan[:2000]


def test_chisq_matches_hand_computed_2x2(spark):
    from manufacturing_data_integration_tool_spark.ops.stats import (
        chisq_independence,
    )

    rows = (
        [("x", "u")] * 10 + [("x", "v")] * 20 + [("y", "u")] * 30 + [("y", "v")] * 40
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = chisq_independence(df, "a", "b").collect()[0]
    assert (r["n"], r["n_a"], r["n_b"], r["dof"]) == (100, 2, 2, 1)
    # exp: 12/18/28/42 -> chi2 = 4*(1/12+1/18+1/28+1/42) = 200/252
    assert r["chi2"] == pytest.approx(200 / 252, abs=1e-6)


def test_kmv_jaccard_exact_when_sketch_holds_everything(spark):
    from manufacturing_data_integration_tool_spark.ops.stats import kmv_jaccard

    rows = [("A", "x"), ("A", "y"), ("A", "z"),
            ("B", "y"), ("B", "z"), ("B", "w"),
            ("C", "q")]
    df = spark.createDataFrame(rows, "g string, k string")
    out = {(r["group_a"], r["group_b"]): r
           for r in kmv_jaccard(df, "k", "g", k=256).collect()}
    # k=256 > all distinct hashes: estimates are EXACT Jaccard
    ab = out[("A", "B")]
    assert (ab["k_used"], ab["n_shared"]) == (4, 2)
    assert ab["jaccard_est"] == pytest.approx(0.5)
    assert out[("A", "C")]["n_shared"] == 0
    assert out[("A", "C")]["jaccard_est"] == 0.0
    assert len(out) == 3  # all unordered pairs


def test_hdr_quantiles_exact_on_small_values_and_bounded_error(spark):
    from manufacturing_data_integration_tool_spark.ops.stats import hdr_quantiles

    df = spark.createDataFrame([(i,) for i in range(1, 1001)], "v long")
    out = {r["quantile"]: r for r in
           hdr_quantiles(df, "v", (0.5, 0.9, 0.99, 1.0)).collect()}
    # values <= 3 significant digits (except 1000 whose bucket is itself):
    # bucket lower bounds ARE the exact order statistics
    assert out[0.5]["est"] == 500 and out[0.5]["target_rank"] == 500
    assert out[0.9]["est"] == 900
    assert out[0.99]["est"] == 990
    assert out[1.0]["est"] == 1000 and out[1.0]["n"] == 1000
    # long-tailed case: relative error of the bucket bound < 10^(1-3)
    big = spark.createDataFrame([(123_456_789,), (987_654_321,)], "v long")
    r99 = {r["quantile"]: r["est"] for r in
           hdr_quantiles(big, "v", (1.0,)).collect()}[1.0]
    assert r99 == 987_000_000  # top-3-digit truncation of the max
    assert abs(r99 - 987_654_321) / 987_654_321 < 10 ** (1 - 3)


def test_sorted_neighborhood_pairs_window_semantics(spark):
    from manufacturing_data_integration_tool_spark.ops.dedup import (
        sorted_neighborhood_pairs,
    )

    df = spark.createDataFrame(
        [("aa",), ("ab",), ("ac",), ("zz",)], "k string"
    )
    got = {
        (r["key_a"], r["key_b"], r["rank_gap"])
        for r in sorted_neighborhood_pairs(df, "k", "k", window=2).collect()
    }
    assert got == {
        ("aa", "ab", 1), ("aa", "ac", 2), ("ab", "ac", 1),
        ("ab", "zz", 2), ("ac", "zz", 1),
    }
    # bucket boundaries must not lose pairs even at bucket_size == window
    seq = spark.createDataFrame([(f"k{i:02d}",) for i in range(10)], "k string")
    n = sorted_neighborhood_pairs(
        seq, "k", "k", window=2, bucket_size=2
    ).count()
    assert n == 9 + 8  # all gap-1 and gap-2 pairs of a 10-chain


def test_rolling_corr_extremes(spark):
    from manufacturing_data_integration_tool_spark.ops.stats import rolling_corr

    rows = []
    for i in range(5):
        day = f"2024-05-{i+1:02d} 12:00:00"
        rows.append(("pos", day, float(i + 1), float(2 * i + 1)))
        rows.append(("neg", day, float(i + 1), float(10 - i)))
        rows.append(("flat", day, float(i + 1), 7.0))
    df = spark.createDataFrame(rows, "k string, ts string, x double, y double")
    out = {
        (r["k"], str(r["day"])): r
        for r in rolling_corr(df, "k", "ts", "x", "y", window_days=7).collect()
    }
    last = "2024-05-05"
    assert out[("pos", last)]["corr"] == pytest.approx(1.0)
    assert out[("neg", last)]["corr"] == pytest.approx(-1.0)
    assert out[("flat", last)]["corr"] is None          # zero y-variance
    assert out[("pos", "2024-05-01")]["corr"] is None   # single-day window
    assert out[("pos", last)]["n_days"] == 5


def test_multipass_er_union_dominates_single_passes(spark):
    """q210's union pair graph must contain every single-pass pair set
    (the rationale for multi-pass blocking)."""
    import __spark_entry__ as e
    from manufacturing_data_integration_tool_spark.ops import dedup as dd
    from manufacturing_data_integration_tool_spark.sources.readers import read_table

    sf = "/root/testdata/sf0.001"
    part = read_table(spark, sf, "part")
    names = part.select(F.col("p_name").alias("name")).distinct()
    prefix = {
        (r["key_a"], r["key_b"])
        for r in dd.fuzzy_key_pairs(part, "p_name", max_dist=3, block_chars=3)
        .select("key_a", "key_b").collect()
    }
    sn = {
        (r["key_a"], r["key_b"])
        for r in dd.sorted_neighborhood_pairs(names, "name", "name", window=5)
        .filter(F.levenshtein("key_a", "key_b") <= 3)
        .select("key_a", "key_b").collect()
    }
    clusters = e.q210_entity_clusters(spark, sf).collect()
    by_name = {r["name"]: r["cluster_id"] for r in clusters}
    for a, b in prefix | sn:
        assert by_name[a] == by_name[b], (a, b)


def test_snapshot_diff_classifies_all_four_states(spark):
    from manufacturing_data_integration_tool_spark.functions.merge import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, v string, x double",
    )
    new = spark.createDataFrame(
        [(1, "a", 99.0), (2, "B", 20.0), (4, "d", 40.0)],
        "k long, v string, x double",
    )
    out = {r["k"]: r["change_type"] for r in
           snapshot_diff(old, new, ["k"], compare_cols=["v"]).collect()}
    # x excluded from compare_cols -> k=1 counts as unchanged
    assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_mutual_best_match_requires_reciprocity(spark):
    """Chain a-b-c where b's best is a: (a,b) survives, (b,c) does not;
    mutual pairs are 1:1 by construction."""
    import __spark_entry__  # noqa: F401  (same helpers)
    from manufacturing_data_integration_tool_spark.ops.dedup import (
        sorted_neighborhood_pairs,
    )
    from pyspark.sql import Window

    # keys sorted: "cat", "cats", "catz", "zebra"; lev(cat,cats)=1,
    # lev(cats,catz)=1, lev(cat,catz)=1 -> best(cat)=cats(tie->cats),
    # best(cats)=cat (tie to smaller), best(catz)=cat but cat chose cats
    names = spark.createDataFrame(
        [("cat",), ("cats",), ("catz",), ("zebra",)], "name string"
    )
    sn = sorted_neighborhood_pairs(names, "name", "name", window=3)
    lev = F.levenshtein("key_a", "key_b")
    cands = sn.filter(lev <= 2).select(
        F.col("key_a").alias("a"), F.col("key_b").alias("b"), lev.alias("lev")
    )
    ends = cands.unionByName(
        cands.select(F.col("b").alias("a"), F.col("a").alias("b"), "lev")
    )
    w = Window.partitionBy("a").orderBy(F.asc("lev"), F.asc("b"))
    best = ends.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
    left = best.select(F.col("a").alias("x"), F.col("b").alias("y"), "lev")
    right = best.select(F.col("a").alias("y"), F.col("b").alias("x"))
    mutual = {
        (r["x"], r["y"])
        for r in left.join(right, ["x", "y"]).filter("x < y").collect()
    }
    assert mutual == {("cat", "cats")}


def test_hdr_quantiles_grouped_matches_per_group_global(spark):
    """Grouped HDR == the global op run per group."""
    from manufacturing_data_integration_tool_spark.ops.stats import hdr_quantiles

    rows = [("a", i) for i in range(1, 101)] + [("b", i * 10) for i in range(1, 51)]
    df = spark.createDataFrame(rows, "g string, v long")
    grouped = {
        (r["g"], r["quantile"]): (r["target_rank"], r["est"], r["n"])
        for r in hdr_quantiles(df, "v", (0.5, 0.9), group_cols=["g"]).collect()
    }
    for g in ("a", "b"):
        solo = {
            r["quantile"]: (r["target_rank"], r["est"], r["n"])
            for r in hdr_quantiles(
                df.filter(F.col("g") == g), "v", (0.5, 0.9)
            ).collect()
        }
        for q, want in solo.items():
            assert grouped[(g, q)] == want


def test_kfold_assignment_stable_and_partitions(spark):
    from manufacturing_data_integration_tool_spark.ops.sampling import kfold_assign

    df = spark.createDataFrame([(i,) for i in range(200)], "k long")
    a = {r["k"]: r["fold"] for r in kfold_assign(df, "k", k=5).collect()}
    # append stability: a subset re-run assigns identical folds
    b = {r["k"]: r["fold"] for r in
         kfold_assign(df.filter("k < 50"), "k", k=5).collect()}
    assert all(a[k] == b[k] for k in b)
    assert set(a.values()) == {0, 1, 2, 3, 4}
    # rough balance: no fold takes more than half
    from collections import Counter
    assert max(Counter(a.values()).values()) < 100


def test_psi_drift_identical_populations_is_zero(spark):
    """PSI of a population against itself is exactly 0 (every p == q, every
    ln term 0), and a shifted population yields a strictly positive PSI
    with one-sided buckets counted, not silently summed."""
    from manufacturing_data_integration_tool_spark.ops.evaluation import psi_drift

    rows = [(i % 5, s) for i in range(100) for s in (0, 1)]
    df = spark.createDataFrame(rows, "b int, cur int")
    out = psi_drift(df, F.col("b").cast("bigint"), F.col("cur") == 1).collect()[0]
    assert out["psi_x1e9"] == 0 and out["n_buckets"] == 5 and out["n_one_sided"] == 0

    # shift: ref uniform over {0..4}; cur concentrated on {3,4} with a
    # heavier share per bucket (0.5 vs 0.2) -> positive PSI over the
    # overlap, and buckets 0-2 become ref-only one-sided signals
    rows2 = [(i % 5, 0) for i in range(100)] + [(3 + i % 2, 1) for i in range(100)]
    df2 = spark.createDataFrame(rows2, "b int, cur int")
    out2 = psi_drift(df2, F.col("b").cast("bigint"), F.col("cur") == 1).collect()[0]
    assert out2["psi_x1e9"] > 0 and out2["n_one_sided"] == 3


def test_woe_iv_hand_computed_2x2(spark):
    """Two buckets, hand-computable: bucket 0 = 30 good / 10 bad, bucket
    1 = 20 good / 40 bad. WOE_0 = ln((10/50)/(30/50)) = ln(1/3); IV =
    (10/50-30/50)*ln(1/3) + (40/50-20/50)*ln(2) > 0. Zero-bad buckets
    publish NULL woe and contribute 0."""
    import math

    from manufacturing_data_integration_tool_spark.ops.evaluation import woe_iv

    rows = (
        [(0, 0)] * 30 + [(0, 1)] * 10 + [(1, 0)] * 20 + [(1, 1)] * 40 + [(2, 0)] * 5
    )
    df = spark.createDataFrame(rows, "b int, y int")
    out = {
        r["bucket"]: r
        for r in woe_iv(
            df, F.col("b").cast("bigint"), F.col("y") == 1
        ).collect()
    }
    woe0 = round(math.log((10 / 50) / (30 / 55)), 9)
    assert out[0]["woe_x1e9"] == math.floor(woe0 * 1e9 + 0.5)
    assert out[2]["woe_x1e9"] is None and out[2]["iv_term_x1e9"] == 0
    iv = out[0]["iv_x1e9"]
    assert iv == out[1]["iv_x1e9"] == out[2]["iv_x1e9"]  # broadcast, identical
    assert iv == sum(r["iv_term_x1e9"] for r in out.values())
    assert iv > 0


def test_target_encode_loo_excludes_own_row_and_nulls_singletons(spark):
    from manufacturing_data_integration_tool_spark.ops.evaluation import (
        target_encode_loo,
    )

    rows = [("a", 10), ("a", 20), ("a", 30), ("b", 7)]
    df = spark.createDataFrame(rows, "k string, t int")
    out = target_encode_loo(df, ["k"], F.col("t"), round_to=6)
    got = {(r["k"], r["t"]): r["te_loo"] for r in out.collect()}
    assert got[("a", 10)] == 25.0  # (20+30)/2
    assert got[("a", 20)] == 20.0
    assert got[("a", 30)] == 15.0
    assert got[("b", 7)] is None  # singleton key: no leave-one-out mean


def test_kaplan_meier_log_survival_matches_product(spark, sf_dir):
    """exp(log_surv) must equal the KM product of (1 - d/n) within the
    1e-9 lattice, survival is non-increasing, and at_risk is
    non-increasing in t."""
    import math

    import __spark_entry__ as entry

    rows = sorted(
        entry.q268_kaplan_meier(spark, sf_dir).collect(), key=lambda r: r["t_days"]
    )
    assert rows, "life table empty"
    prod = 1.0
    last_ls = 0
    last_risk = None
    for r in rows:
        assert last_risk is None or r["at_risk"] <= last_risk
        last_risk = r["at_risk"]
        if r["log_surv_x1e9"] is None:
            assert r["n_fail"] == r["at_risk"] or prod == 0.0
            prod = 0.0
            continue
        prod *= 1.0 - r["n_fail"] / r["at_risk"]
        assert r["log_surv_x1e9"] <= last_ls  # non-increasing log-survival
        last_ls = r["log_surv_x1e9"]
        assert abs(math.exp(r["log_surv_x1e9"] / 1e9) - prod) < 1e-6


def test_js_divergence_bounds_and_identity(spark):
    """JSD is 0 for identical distributions, positive otherwise, and
    bounded by ln 2 (x1e9)."""
    import math

    from manufacturing_data_integration_tool_spark.ops.text import (
        js_divergence_matrix,
    )

    rows = (
        [("a", "x y z")] * 5
        + [("b", "x y z")] * 5
        + [("c", "totally different words entirely")] * 5
    )
    df = spark.createDataFrame(rows, "source string, text string")
    out = {
        (r["grp_a"], r["grp_b"]): r["jsd_x1e9"]
        for r in js_divergence_matrix(df).collect()
    }
    assert out[("a", "b")] == 0  # identical corpora
    assert 0 < out[("a", "c")] <= math.log(2) * 1e9
    assert out[("a", "c")] == out[("b", "c")]  # symmetry via identical twins


def test_lang_source_mi_independence_and_bounds(spark, sf_dir):
    """MI >= 0, entropies positive, and 0 <= NMI <= 1e6 on the real
    documents table; an independent synthetic table yields MI == 0."""
    import __spark_entry__ as entry

    r = entry.q274_lang_source_mi(spark, sf_dir).collect()[0]
    assert r["mi_x1e9"] >= 0 and r["h_lang_x1e9"] > 0 and r["h_source_x1e9"] > 0
    assert 0 <= r["nmi_x1e6"] <= 1_000_000

    rows = [(l, s) for l in ("en", "de") for s in ("w", "b") for _ in range(25)]
    df = spark.createDataFrame(rows, "lang string, source string")
    from pyspark.sql import functions as FF

    cells = df.groupBy("lang", "source").agg(FF.count(FF.lit(1)).alias("n"))
    # perfectly independent 2x2 -> every cell ln term is ln(1) = 0
    assert all(r["n"] == 25 for r in cells.collect())


def test_cell_purity_bounds_and_totals(spark, sf_dir):
    """Purity in [1/n_labels, 1] scaled; per-cell n_top <= n_vecs; cells
    partition the embedding table exactly."""
    import __spark_entry__ as entry

    rows = entry.q273_cell_purity(spark, sf_dir).collect()
    assert rows
    emb_n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(r["n_vecs"] for r in rows) == emb_n
    for r in rows:
        assert 0 < r["n_top"] <= r["n_vecs"]
        assert 0 < r["purity_x1e6"] <= 1_000_000


def test_histogram_calibration_accounting(spark, sf_dir):
    """Train/test accounting must add up: scored + unscored test rows =
    the test arm's size; ECE and Brier live in [0, 1e12]."""
    import __spark_entry__ as entry

    r = entry.q275_histogram_calibration(spark, sf_dir).collect()[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert r["n_train"] + r["n_test_scored"] + r["n_test_unscored"] == docs
    assert 0 <= r["ece_x1e12"] <= 10**12
    assert 0 <= r["brier_x1e12"] <= 10**12
    assert 1 <= r["n_bins_scored"] <= 10


def test_ndcg_bounds_and_perfect_ranking(spark, sf_dir):
    """NDCG@10 is in (0, 1e6]; with every page doc relevant it is
    exactly 1e6 (DCG == IDCG by construction of the prefix weights)."""
    import __spark_entry__ as entry

    r = entry.q276_ndcg_bm25(spark, sf_dir).collect()[0]
    if r["n_rel"] and r["n_rel"] > 0:
        assert 0 < r["ndcg_x1e6"] <= 1_000_000
        assert r["dcg_x1e12"] <= r["idcg_x1e12"]
        if r["n_rel"] == 10:
            assert r["ndcg_x1e6"] == 1_000_000
    else:
        assert r["ndcg_x1e6"] is None


def test_simpson_screen_textbook_reversal(spark):
    """The classic reversal: treatment better WITHIN each stratum but
    worse pooled (stratum sizes confound). Each stratum sign is +1,
    pooled sign -1, flipped True everywhere."""
    from manufacturing_data_integration_tool_spark.ops.evaluation import (
        simpson_screen,
    )
    from pyspark.sql import functions as F

    rows = []
    # stratum s1: treated 81/87 (93%) vs control 234/270 (87%)
    rows += [("s1", True, True)] * 81 + [("s1", True, False)] * 6
    rows += [("s1", False, True)] * 234 + [("s1", False, False)] * 36
    # stratum s2: treated 192/263 (73%) vs control 55/80 (69%)
    rows += [("s2", True, True)] * 192 + [("s2", True, False)] * 71
    rows += [("s2", False, True)] * 55 + [("s2", False, False)] * 25
    df = spark.createDataFrame(rows, "g string, x boolean, y boolean")
    out = {r["stratum"]: r for r in simpson_screen(
        df, F.col("x"), F.col("y"), F.col("g")
    ).collect()}
    assert all(r["stratum_sign"] == 1 for r in out.values())
    assert all(r["pooled_sign"] == -1 for r in out.values())
    assert all(r["flipped"] for r in out.values())


def test_cochran_q_exact_small_table(spark, sf_dir):
    """Driver-shape check on real testdata plus an exact hand check of
    the cross-multiplied form on the published cells: Q = 2(3*SumCj^2 -
    T^2)/(3T - SumRi^2) recomputed in Python ints must match."""
    import __spark_entry__ as entry

    r = entry.q298_cochran_q(spark, sf_dir).collect()[0]
    cj2 = r["c_gopher"] ** 2 + r["c_flesch"] ** 2 + r["c_entropy"] ** 2
    den = 3 * r["t"] - r["sum_r2"]
    if den == 0:
        assert r["cochran_q_x1e6"] is None
    else:
        import math

        expect = math.floor(2 * (3 * cj2 - r["t"] ** 2) / den * 1e6 + 0.5)
        assert r["cochran_q_x1e6"] == expect
        assert r["cochran_q_x1e6"] >= 0


def test_brier_decomposition_murphy_identity(spark, sf_dir):
    """REL - RES + UNC must reproduce q275's Brier score up to the
    per-bin 1e-12 lattice rounding (<= 1 ulp per scored bin per
    component), and all three components are non-negative."""
    import __spark_entry__ as entry

    d = entry.q300_brier_decomposition(spark, sf_dir).collect()[0]
    b = entry.q275_histogram_calibration(spark, sf_dir).collect()[0]
    assert d["rel_x1e12"] >= 0 and d["res_x1e12"] >= 0 and d["unc_x1e12"] >= 0
    tol = 3 * d["n_bins_scored"] + 3  # lattice rounding headroom
    assert abs(d["brier_decomp_x1e12"] - b["brier_x1e12"]) <= tol
    assert d["n_test_scored"] == b["n_test_scored"]


def test_fs_weights_field_separation(spark, sf_dir):
    """On real pairs: weights exist for all three fields, counts are
    consistent (a <= n), and the published weight equals the Laplace
    log-ratio recomputed in Python on the published integer cells."""
    import math

    import __spark_entry__ as entry

    rows = entry.q301_fs_weights(spark, sf_dir).collect()
    assert {r["field"] for r in rows} == {"brand", "type", "size"}
    for r in rows:
        assert 0 <= r["a_match"] <= r["n_match"]
        assert 0 <= r["a_nonmatch"] <= r["n_nonmatch"]
        m_ratio = (r["a_match"] + 1) * (r["n_nonmatch"] + 2)
        u_ratio = (r["n_match"] + 2) * (r["a_nonmatch"] + 1)
        expect = math.floor(round(math.log(m_ratio / u_ratio), 9) * 1e9 + 0.5)
        assert r["weight_x1e9"] == expect


def test_fleiss_kappa_matches_textbook_float_form(spark):
    import math
    import random

    from manufacturing_data_integration_tool_spark.ops.evaluation import (
        fleiss_kappa_binary,
    )

    rng = random.Random(20260816)
    n = 3
    rs = [rng.randint(0, n) for _ in range(200)]
    df = spark.createDataFrame([(r,) for r in rs], "r int")
    out = fleiss_kappa_binary(df, "r", n).collect()[0]
    N = len(rs)
    # textbook float form: P_i = (sum_j n_ij^2 - n) / (n(n-1))
    p_bar = sum(
        (r * r + (n - r) * (n - r) - n) / (n * (n - 1)) for r in rs
    ) / N
    p1 = sum(rs) / (n * N)
    p_e = p1 * p1 + (1 - p1) * (1 - p1)
    kappa = (p_bar - p_e) / (1 - p_e)
    assert out["n_subjects"] == N and out["n_raters"] == n
    # exact cross-multiplied integers vs float recompute: 1 ulp slack
    assert abs(out["pbar_x1e9"] - math.floor(p_bar * 1e9 + 0.5)) <= 1
    assert abs(out["pe_x1e9"] - math.floor(p_e * 1e9 + 0.5)) <= 1
    assert abs(out["kappa_x1e6"] - math.floor(kappa * 1e6 + 0.5)) <= 1


def test_fleiss_kappa_degenerate_cases(spark):
    from manufacturing_data_integration_tool_spark.ops.evaluation import (
        fleiss_kappa_binary,
    )

    # unanimous same-way on every subject: P_e = 1 -> kappa undefined
    uni = spark.createDataFrame([(3,)] * 8, "r int")
    r = fleiss_kappa_binary(uni, "r", 3).collect()[0]
    assert r["pe_x1e9"] == 1_000_000_000 and r["kappa_x1e6"] is None
    # perfect agreement split across both categories: kappa = 1
    split = spark.createDataFrame([(3,)] * 4 + [(0,)] * 4, "r int")
    r2 = fleiss_kappa_binary(split, "r", 3).collect()[0]
    assert r2["kappa_x1e6"] == 1_000_000


def test_cochran_armitage_matches_textbook(spark):
    import math
    import random

    from manufacturing_data_integration_tool_spark.ops.stats import (
        cochran_armitage,
    )

    rng = random.Random(7)
    rows = []
    for s, p in [(1, 0.2), (2, 0.35), (3, 0.5), (4, 0.6), (5, 0.8)]:
        rows += [(s, rng.random() < p) for _ in range(60)]
    df = spark.createDataFrame(rows, "s bigint, y boolean")
    out = cochran_armitage(df, "s", "y").collect()[0]
    n = len(rows)
    x = sum(1 for _, y in rows if y)
    sn = sum(s for s, _ in rows)
    s2n = sum(s * s for s, _ in rows)
    sx = sum(s for s, y in rows if y)
    a = n * sx - x * sn
    b = n * s2n - sn * sn
    assert out["n"] == n and out["successes"] == x
    assert out["trend_num"] == a
    assert out["chi2_x1e6"] == a * a * n * 10**6 // (x * (n - x) * b)
    # sanity vs the float z^2 form
    z2 = (a / n) ** 2 / ((x / n) * (1 - x / n) * b / n)
    assert abs(out["chi2_x1e6"] / 1e6 - z2) < 1e-4
    # strong synthetic trend must be loudly significant
    assert out["chi2_x1e6"] > 30_000_000


def test_cochran_armitage_degenerate_null(spark):
    from manufacturing_data_integration_tool_spark.ops.stats import (
        cochran_armitage,
    )

    # all-success outcome and single-category score both NULL out
    allY = spark.createDataFrame([(1, True), (2, True)], "s bigint, y boolean")
    assert cochran_armitage(allY, "s", "y").collect()[0]["chi2_x1e6"] is None
    oneS = spark.createDataFrame(
        [(3, True), (3, False), (3, True)], "s bigint, y boolean"
    )
    assert cochran_armitage(oneS, "s", "y").collect()[0]["chi2_x1e6"] is None


def test_cmh_matches_bruteforce(spark):
    import math
    import random

    from manufacturing_data_integration_tool_spark.ops.evaluation import (
        cmh_test,
    )

    rng = random.Random(11)
    rows = []
    for k in range(4):
        base = 0.25 + 0.1 * k
        for _ in range(150):
            e = rng.random() < 0.4
            o = rng.random() < (base + (0.25 if e else 0.0))
            rows.append((k, e, o))
    df = spark.createDataFrame(rows, "k bigint, e boolean, o boolean")
    out = cmh_test(
        df, F.col("e"), F.col("o"), F.col("k"), strata_name="k"
    ).collect()[0]
    sum_a = e9 = v9 = r9 = s9 = 0
    for k in range(4):
        a = sum(1 for kk, e, o in rows if kk == k and e and o)
        b = sum(1 for kk, e, o in rows if kk == k and e and not o)
        c = sum(1 for kk, e, o in rows if kk == k and not e and o)
        d = sum(1 for kk, e, o in rows if kk == k and not e and not o)
        n = a + b + c + d
        sum_a += a
        e9 += (a + b) * (a + c) * 10**9 // n
        v9 += (a + b) * (c + d) * (a + c) * (b + d) * 10**9 // (n * n * (n - 1))
        r9 += a * d * 10**9 // n
        s9 += b * c * 10**9 // n
    assert out["n_strata"] == 4 and out["sum_a"] == sum_a
    assert out["e_x1e9"] == e9 and out["var_x1e9"] == v9
    chi2 = (sum_a - e9 / 1e9) ** 2 / (v9 / 1e9)
    assert out["cmh_chi2_x1e6"] == math.floor(chi2 * 1e6 + 0.5)
    assert out["mh_or_x1e6"] == math.floor(r9 / s9 * 1e6 + 0.5)
    # planted uplift: pooled OR must exceed 1, chi2 loudly significant
    assert out["mh_or_x1e6"] > 1_000_000
    assert out["cmh_chi2_x1e6"] > 10_000_000


def test_cmh_single_stratum_equals_unstratified(spark):
    from manufacturing_data_integration_tool_spark.ops.evaluation import (
        cmh_test,
    )

    rows = [(0, e, o) for e in (True, False) for o in (True, False)
            for _ in range(5)]
    df = spark.createDataFrame(rows, "k bigint, e boolean, o boolean")
    r = cmh_test(
        df, F.col("e"), F.col("o"), F.col("k"), strata_name="k"
    ).collect()[0]
    # balanced 2x2: a=b=c=d=5 -> OR exactly 1, chi2 exactly 0
    assert r["mh_or_x1e6"] == 1_000_000
    assert r["cmh_chi2_x1e6"] == 0


def test_cronbach_alpha_matches_textbook(spark):
    import math
    import random

    from manufacturing_data_integration_tool_spark.ops.evaluation import (
        cronbach_alpha,
    )

    rng = random.Random(5)
    rows = []
    for _ in range(150):
        latent = rng.random()
        rows.append(tuple(
            int(latent + 0.3 * rng.random() > 0.55) for _ in range(3)
        ))
    df = spark.createDataFrame(rows, "i0 int, i1 int, i2 int")
    out = cronbach_alpha(df, ["i0", "i1", "i2"]).collect()[0]
    n = len(rows)
    v = t = 0
    tot = [sum(r) for r in rows]
    for ix in range(3):
        s = sum(r[ix] for r in rows)
        q = sum(r[ix] * r[ix] for r in rows)
        v += n * q - s * s
    a_sum = sum(tot)
    b_sum = sum(x * x for x in tot)
    t = n * b_sum - a_sum * a_sum
    assert out["items_var_num"] == v and out["total_var_num"] == t
    alpha = 3.0 / 2.0 * (1.0 - v / t)
    assert out["alpha_x1e6"] == math.floor(alpha * 1e6 + 0.5)
    # latent-driven items must show strong positive reliability
    assert out["alpha_x1e6"] > 400_000


def test_cronbach_alpha_identical_items_is_one(spark):
    from manufacturing_data_integration_tool_spark.ops.evaluation import (
        cronbach_alpha,
    )

    rows = [(x, x, x, x) for x in (0, 1, 1, 0, 1, 0, 0, 1, 1, 1)]
    df = spark.createDataFrame(rows, "a int, b int, c int, d int")
    r = cronbach_alpha(df, ["a", "b", "c", "d"]).collect()[0]
    assert r["alpha_x1e6"] == 1_000_000  # perfectly parallel items
    # constant total score -> reliability undefined
    const = spark.createDataFrame([(1, 0), (0, 1), (1, 0)], "a int, b int")
    assert cronbach_alpha(const, ["a", "b"]).collect()[0][
        "alpha_x1e6"
    ] is None


def test_hosmer_lemeshow_matches_bruteforce(spark):
    import random

    from manufacturing_data_integration_tool_spark.ops.evaluation import (
        hosmer_lemeshow,
    )

    rng = random.Random(13)
    rows = []
    for b in range(8):
        p = 0.1 + 0.1 * b
        for _ in range(120):
            arm = rng.randint(0, 1)
            # test arm slightly miscalibrated in the top bins
            pp = p + (0.08 if arm == 1 and b >= 6 else 0.0)
            rows.append((b, int(rng.random() < pp), arm))
    df = spark.createDataFrame(rows, "bin bigint, y bigint, arm bigint")
    out = hosmer_lemeshow(df, "bin", "y", "arm", train_arm=0).collect()[0]
    hl = 0
    scored = degen = 0
    for b in range(8):
        ntr = sum(1 for bb, _, a in rows if bb == b and a == 0)
        ktr = sum(y for bb, y, a in rows if bb == b and a == 0)
        n = sum(1 for bb, _, a in rows if bb == b and a == 1)
        o = sum(y for bb, y, a in rows if bb == b and a == 1)
        if n > 0 and 0 < ktr < ntr:
            scored += 1
            hl += (o * ntr - n * ktr) ** 2 * 10**6 // (n * ktr * (ntr - ktr))
        else:
            degen += 1
    assert out["n_bins_scored"] == scored
    assert out["n_bins_degenerate"] == degen
    assert out["dof"] == max(scored - 2, 0)
    assert out["hl_x1e6"] == hl
    # float textbook recompute stays within per-bin truncation slack
    hl_f = 0.0
    for b in range(8):
        ntr = sum(1 for bb, _, a in rows if bb == b and a == 0)
        ktr = sum(y for bb, y, a in rows if bb == b and a == 0)
        n = sum(1 for bb, _, a in rows if bb == b and a == 1)
        o = sum(y for bb, y, a in rows if bb == b and a == 1)
        if n > 0 and 0 < ktr < ntr:
            e = n * ktr / ntr
            hl_f += (o - e) ** 2 / (e * (1 - ktr / ntr))
    assert abs(out["hl_x1e6"] / 1e6 - hl_f) < 1e-5 * scored + 1e-9


def test_hosmer_lemeshow_perfect_calibration_small(spark):
    from manufacturing_data_integration_tool_spark.ops.evaluation import (
        hosmer_lemeshow,
    )

    # identical arms -> O == E exactly in every bin -> HL == 0
    rows = []
    for b in range(4):
        for arm in (0, 1):
            rows += [(b, 1, arm)] * (b + 1) + [(b, 0, arm)] * (5 - b)
    df = spark.createDataFrame(rows, "bin bigint, y bigint, arm bigint")
    r = hosmer_lemeshow(df, "bin", "y", "arm").collect()[0]
    assert r["hl_x1e6"] == 0 and r["n_bins_scored"] == 4
