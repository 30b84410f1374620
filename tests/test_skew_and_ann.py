"""Skew helpers (salted join / two-stage agg) and the approximate-search
paths (IVF): results must equal their unsalted/exact twins."""

import pytest
from pyspark.sql import Row, functions as F

from manufacturing_data_integration_tool_spark.functions.skew import salted_join, two_stage_agg
from manufacturing_data_integration_tool_spark.ops.similarity import cosine_topk, ivf_topk
from manufacturing_data_integration_tool_spark.ops.text import (
    bpe_ish_token_count,
    winnowing_fingerprints,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share one hot key
    rows = [Row(k="hot" if i % 10 else f"cold{i}", v=float(i)) for i in range(1000)]
    return spark.createDataFrame(rows)


def test_salted_join_equals_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        [Row(k="hot", label="H")] + [Row(k=f"cold{i}", label=f"C{i}") for i in range(0, 1000, 10)]
    )
    plain = skewed.join(dim, "k").groupBy("k", "label").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    salted = salted_join(skewed, dim, ["k"], n_salts=8).groupBy("k", "label").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_two_stage_agg_equals_plain_groupby(spark, skewed):
    plain = {
        (r["k"],): (r["n"], r["s"], r["mx"])
        for r in skewed.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx"))
        .collect()
    }
    staged = {
        (r["k"],): (r["n"], r["s"], r["mx"])
        for r in two_stage_agg(
            skewed, ["k"], {"n": "count(*)", "s": "sum(v)", "mx": "max(v)"}, n_salts=8
        ).collect()
    }
    assert staged == plain


def test_two_stage_agg_rejects_non_decomposable(spark, skewed):
    with pytest.raises(ValueError, match="decomposable"):
        two_stage_agg(skewed, ["k"], {"a": "avg(v)"})


def test_ivf_full_probe_equals_exact(spark, sf_dir):
    """n_probe == n_clusters degenerates to exact search — must match the
    brute-force top-k exactly."""
    from manufacturing_data_integration_tool_spark.sources.readers import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    exact = {(r["query_id"], r["rank"]): r["vec_id"] for r in cosine_topk(emb, q, k=5).collect()}
    ivf = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in ivf_topk(emb, q, k=5, n_clusters=4, n_probe=4).collect()
    }
    assert ivf == exact


def test_ivf_partial_probe_high_recall(spark, sf_dir):
    from manufacturing_data_integration_tool_spark.sources.readers import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    exact = {(r["query_id"], r["vec_id"]) for r in cosine_topk(emb, q, k=10).collect()}
    approx = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk(emb, q, k=10, n_clusters=8, n_probe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_ivf_deterministic_full_probe_equals_exact_and_reruns_identical(spark, sf_dir):
    """The deterministic quantizer (q33's r6 route) keeps the IVF
    contracts: probing ALL cells degenerates to exact brute-force top-k,
    partial probing keeps useful recall, and two independent fits produce
    bit-identical centroids (no RNG, no partitioning sensitivity)."""
    from manufacturing_data_integration_tool_spark.ops.similarity import (
        fit_ivf_deterministic,
        ivf_search,
    )
    from manufacturing_data_integration_tool_spark.sources.readers import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    index = fit_ivf_deterministic(emb, dim=64, n_clusters=4, seed=42)
    exact = {(r["query_id"], r["rank"]): r["vec_id"] for r in cosine_topk(emb, q, k=5).collect()}
    full = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in ivf_search(index, q, k=5, n_probe=4).collect()
    }
    assert full == exact
    q5 = emb.filter(F.col("vec_id") < 5)
    index8 = fit_ivf_deterministic(emb, dim=64, n_clusters=8, seed=42)
    exact10 = {(r["query_id"], r["vec_id"]) for r in cosine_topk(emb, q5, k=10).collect()}
    approx = {
        (r["query_id"], r["vec_id"])
        for r in ivf_search(index8, q5, k=10, n_probe=3).collect()
    }
    recall = len(exact10 & approx) / len(exact10)
    assert recall >= 0.4, f"deterministic-IVF recall too low: {recall}"
    # determinism: refit (fresh lineage, repartitioned input) -> same centroids
    refit = fit_ivf_deterministic(emb.repartition(7), dim=64, n_clusters=8, seed=42)
    c1 = {r["__cell"]: r["__centroid"] for r in index8.centroids.collect()}
    c2 = {r["__cell"]: r["__centroid"] for r in refit.centroids.collect()}
    assert c1 == c2


def test_lsh_knn_candidates_agree_with_exact_on_votes(spark, sf_dir):
    """The candidates-routed knn_classify must (a) never silently widen
    beyond its candidate set and (b) agree with exact brute-force kNN on
    a solid majority of predictions at these LSH settings — the accuracy
    bound for the q121 production route."""
    from manufacturing_data_integration_tool_spark.ops.similarity import (
        hyperplane_query_candidates,
        knn_classify,
    )
    from manufacturing_data_integration_tool_spark.sources.readers import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    exact = {
        r["query_id"]: r["pred_label"]
        for r in knn_classify(corpus, queries, k=5).collect()
    }
    cand = hyperplane_query_candidates(
        corpus, queries, dim=64, n_tables=8, n_planes=4, seed=11
    )
    routed = {
        r["query_id"]: r["pred_label"]
        for r in knn_classify(corpus, queries, k=5, candidates=cand).collect()
    }
    assert set(routed) <= set(exact)
    agree = sum(1 for q, lbl in routed.items() if exact[q] == lbl)
    # The fixture embeddings are uniform-random (near-orthogonal), so the
    # exact top-5 is tie-heavy and LSH buckets carry little signal — the
    # pin is "well above the 10% 10-label base rate and stable", not
    # production recall (which pytest can't measure on random vectors).
    # Deterministic: seeded planes + fixed data give the same ratio every
    # run (0.52 at sf0.001).
    assert agree / len(exact) >= 0.45, f"LSH kNN agreement too low: {agree}/{len(exact)}"


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([Row(text="it's 42 degrees, isn't it?")])
    n = df.select(bpe_ish_token_count("text").alias("n")).collect()[0]["n"]
    # it|'s| 42| degrees|,| isn|'t| it|? -> 9
    assert n == 9


def test_winnowing_shared_substring_guarantee(spark):
    """Docs sharing a substring of length >= k + window - 1 must share a
    fingerprint; disjoint docs must not."""
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="aaaa unique shared-substring-block tail one"),
            Row(doc_id=2, text="zzzz other shared-substring-block tail two"),
            Row(doc_id=3, text="qqqq totally unrelated material here"),
        ]
    )
    fp = winnowing_fingerprints(docs, "text", "doc_id", k=8, window=4)
    a = {r["fp"] for r in fp.filter(F.col("doc_id") == 1).collect()}
    b = {r["fp"] for r in fp.filter(F.col("doc_id") == 2).collect()}
    c = {r["fp"] for r in fp.filter(F.col("doc_id") == 3).collect()}
    assert a & b
    assert not (a & c) and not (b & c)


def test_skyline_2d_matches_bruteforce_random_points(spark):
    """The two-phase sweep must equal the O(n^2) dominance definition on
    random point sets, including duplicate points (which never dominate
    each other and must survive with their multiplicity)."""
    import random

    from manufacturing_data_integration_tool_spark.functions.skyline import skyline_2d

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        rows = [
            (rng.randrange(0, 50), rng.randrange(0, 50)) for _ in range(300)
        ]
        pts = {}
        for x, y in rows:
            pts[(x, y)] = pts.get((x, y), 0) + 1

        def dominated(p):
            return any(
                q[0] <= p[0] and q[1] <= p[1] and q != p for q in pts
            )

        want = {p: n for p, n in pts.items() if not dominated(p)}
        df = spark.createDataFrame(rows, "x long, y long")
        got = {
            (r["x"], r["y"]): r["n_rows"]
            for r in skyline_2d(
                df, "x", "y", sub_bucket=F.expr("x div 8")
            ).collect()
        }
        assert got == want, f"seed={seed}"
    # grouped mode: per-group dominance — two groups of random points,
    # each group's frontier must equal its own brute-force skyline
    rng = random.Random(7)
    grows = [
        (f"g{i % 2}", rng.randrange(0, 40), rng.randrange(0, 40))
        for i in range(400)
    ]
    by_group = {}
    for gname, x, y in grows:
        by_group.setdefault(gname, {})
        by_group[gname][(x, y)] = by_group[gname].get((x, y), 0) + 1
    want_g = {}
    for gname, pts in by_group.items():
        for p, cnt in pts.items():
            if not any(
                q[0] <= p[0] and q[1] <= p[1] and q != p for q in pts
            ):
                want_g[(gname, p[0], p[1])] = cnt
    gdf = spark.createDataFrame(grows, "grp string, x long, y long")
    got_g = {
        (r["grp"], r["x"], r["y"]): r["n_rows"]
        for r in skyline_2d(
            gdf, "x", "y", sub_bucket=F.expr("x div 8"), group_cols=["grp"]
        ).collect()
    }
    assert got_g == want_g


def test_mmd2_quadratic_matches_numpy_moments(spark):
    import math
    import random

    from manufacturing_data_integration_tool_spark.ops.similarity import (
        mmd2_quadratic,
    )

    rng = random.Random(99)
    dim = 6
    rows = []
    for g, shift in [(0, 0.0), (1, 0.15)]:
        for _ in range(80):
            rows.append(
                (g, [rng.uniform(-0.4, 0.4) + shift for _ in range(dim)])
            )
    df = spark.createDataFrame(rows, "g int, v array<double>")
    out = mmd2_quadratic(df, "g", "v", dim=dim).collect()
    assert len(out) == 1
    r = out[0]
    # exact recompute on the same quantized lattice with per-cell floors
    cells = {}
    for g, v in rows:
        vq = [math.floor(x * 1e6 + 0.5) for x in v]
        for i in range(dim):
            for j in range(dim):
                key = (g, i, j)
                s, n = cells.get(key, (0, 0))
                cells[key] = (s + vq[i] * vq[j], n + 1)
    total = 0
    for i in range(dim):
        for j in range(dim):
            sa, na = cells[(0, i, j)]
            sb, nb = cells[(1, i, j)]
            dm = sa / na - sb / nb
            total += math.floor(dm * dm / 1e12 + 0.5)
    assert r["n_a"] == 80 and r["n_b"] == 80
    assert r["mmd2_x1e12"] == total
    # the planted mean shift must register
    assert r["mmd2_x1e12"] > 0


def test_mmd2_same_distribution_smaller_than_shifted(spark):
    import random

    from manufacturing_data_integration_tool_spark.ops.similarity import (
        mmd2_quadratic,
    )

    rng = random.Random(3)
    dim = 4
    rows = []
    for g, shift in [(0, 0.0), (1, 0.0), (2, 0.3)]:
        for _ in range(120):
            rows.append(
                (g, [rng.uniform(-0.3, 0.3) + shift for _ in range(dim)])
            )
    df = spark.createDataFrame(rows, "g int, v array<double>")
    out = {(r["g_a"], r["g_b"]): r["mmd2_x1e12"]
           for r in mmd2_quadratic(df, "g", "v", dim=dim).collect()}
    assert len(out) == 3
    # iid pair (0,1) must score far below the shifted pairs
    assert out[(0, 1)] * 10 < out[(0, 2)]
    assert out[(0, 1)] * 10 < out[(1, 2)]


def test_mrr_from_pages_by_hand(spark):
    from manufacturing_data_integration_tool_spark.ops.similarity import (
        mrr_from_pages,
    )

    rows = [
        # q1: first relevant at rank 2 -> rr = 5e11
        ("q1", 1, False), ("q1", 2, True), ("q1", 3, True),
        # q2: first relevant at rank 1 -> rr = 1e12
        ("q2", 1, True), ("q2", 2, False),
        # q3: nothing relevant -> rr = 0, NULL first rank
        ("q3", 1, False), ("q3", 2, False),
    ]
    df = spark.createDataFrame(rows, "qid string, rank bigint, rel boolean")
    out = {r["qid"]: r for r in mrr_from_pages(df, "qid", "rank", "rel").collect()}
    assert out["q1"]["first_rel_rank"] == 2
    assert out["q1"]["rr_x1e12"] == 500_000_000_000
    assert out["q2"]["rr_x1e12"] == 1_000_000_000_000
    assert out["q3"]["first_rel_rank"] is None
    assert out["q3"]["rr_x1e12"] == 0
    expect_mrr = (500_000_000_000 + 1_000_000_000_000 + 0) // 3
    assert all(r["mrr_x1e12"] == expect_mrr for r in out.values())
