"""Unit tests for ops.graph (connected components / dedup clusters) and
ops.sampling (deterministic hash sampling / splits)."""

import pytest
from pyspark.sql import functions as F

from manufacturing_data_integration_tool_spark.ops.graph import (
    connected_components,
    dedup_clusters,
)
from manufacturing_data_integration_tool_spark.ops.sampling import (
    hash_fraction_threshold,
    hash_sample,
    stratified_sample,
    train_holdout_split,
)


def _cc_map(rows):
    return {r["node"]: r["component"] for r in rows}


def test_connected_components_basic(spark):
    # two components: {1,2,3,4} (path), {10,11}; plus a self-loop ignored
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (5, 5)], ["src", "dst"]
    )
    got = _cc_map(connected_components(pairs).collect())
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_long_path(spark):
    # a 32-node path exercises multiple large/small-star rounds
    n = 32
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n)], ["src", "dst"])
    got = _cc_map(connected_components(pairs).collect())
    assert set(got.values()) == {0}
    assert set(got.keys()) == set(range(n + 1))


def test_connected_components_direction_invariant(spark):
    fwd = spark.createDataFrame([(7, 3), (3, 9), (2, 9)], ["src", "dst"])
    rev = spark.createDataFrame([(3, 7), (9, 3), (9, 2)], ["src", "dst"])
    assert _cc_map(connected_components(fwd).collect()) == _cc_map(
        connected_components(rev).collect()
    )


def test_dedup_clusters_survivors_and_singletons(spark):
    docs = spark.createDataFrame([(i, f"t{i}") for i in range(6)], ["doc_id", "text"])
    pairs = spark.createDataFrame([(1, 3), (3, 5)], ["doc_a", "doc_b"])
    rows = {r["doc_id"]: r for r in dedup_clusters(docs, pairs, "doc_id").collect()}
    assert len(rows) == 6
    assert rows[1]["cluster_id"] == 1 and rows[3]["cluster_id"] == 1
    assert rows[5]["cluster_id"] == 1
    assert rows[1]["is_survivor"] and not rows[3]["is_survivor"]
    # singletons survive as their own cluster
    for d in (0, 2, 4):
        assert rows[d]["cluster_id"] == d and rows[d]["is_survivor"]


def test_hash_fraction_threshold_bounds():
    assert hash_fraction_threshold(0.0) == "0" * 13
    assert hash_fraction_threshold(1.0) == "g"  # > every hex char
    assert hash_fraction_threshold(0.5) == "8" + "0" * 12
    with pytest.raises(ValueError):
        hash_fraction_threshold(1.5)


def test_hash_sample_deterministic_and_nested(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    s30 = set(r["k"] for r in hash_sample(df, "k", 0.3).collect())
    s30_again = set(r["k"] for r in hash_sample(df, "k", 0.3).collect())
    assert s30 == s30_again  # reproducible
    # monotone thresholds nest: every 30% row is also a 60% row
    s60 = set(r["k"] for r in hash_sample(df, "k", 0.6).collect())
    assert s30 <= s60
    # roughly the right rate
    assert 0.25 < len(s30) / 2000 < 0.35
    # different salt -> a different (independent) draw
    s30b = set(r["k"] for r in hash_sample(df, "k", 0.3, salt="x").collect())
    assert s30 != s30b


def test_hash_sample_partitioning_invariant(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "k")
    a = set(r["k"] for r in hash_sample(df, "k", 0.4).collect())
    b = set(r["k"] for r in hash_sample(df.repartition(7), "k", 0.4).collect())
    assert a == b


def test_stratified_sample_rates(spark):
    rows = [(i, "en" if i % 2 else "de") for i in range(2000)]
    df = spark.createDataFrame(rows, ["k", "lang"])
    out = stratified_sample(df, "lang", "k", {"en": 0.2, "de": 1.0}).collect()
    en = sum(1 for r in out if r["lang"] == "en")
    de = sum(1 for r in out if r["lang"] == "de")
    assert de == 1000  # fraction 1.0 keeps everything
    assert 0.12 < en / 1000 < 0.28
    # unlisted strata fall back to default (drop)
    df2 = df.withColumn("lang", df.lang.substr(1, 1))  # 'e'/'d' unlisted
    assert stratified_sample(df2, "lang", "k", {"en": 0.5}).count() == 0


def test_train_holdout_split_total_and_stability(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    out = train_holdout_split(df, "k", 0.25)
    counts = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts["train"] + counts["holdout"] == 1000
    assert 150 < counts["holdout"] < 350
    # growing the table never flips earlier rows
    bigger = train_holdout_split(
        spark.range(0, 2000).withColumnRenamed("id", "k"), "k", 0.25
    )
    small = {r["k"]: r["split"] for r in out.collect()}
    big = {r["k"]: r["split"] for r in bigger.collect() if r["k"] < 1000}
    assert small == big


def _uf_components(edges):
    """Reference union-find, driver-side, for property comparison."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_connected_components_matches_union_find_on_random_graphs(spark):
    """Property: the distributed large-star/small-star result equals a
    driver-side union-find on pseudo-random graphs of varied shape
    (fixed seeds — deterministic, no flaky sampling)."""
    import random

    for seed, n_nodes, n_edges in [(1, 30, 15), (2, 40, 60), (3, 25, 24), (4, 60, 30)]:
        rng = random.Random(seed)
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
        ]
        edges = [e for e in edges if e[0] != e[1]]
        if not edges:
            continue
        df = spark.createDataFrame(edges, ["src", "dst"])
        want = _uf_components(edges)
        # distributed star rounds (driver_threshold=0 forces them) AND the
        # driver union-find fast path must both match the reference
        got_dist = _cc_map(connected_components(df, driver_threshold=0).collect())
        got_drv = _cc_map(connected_components(df).collect())
        assert got_dist == want, f"distributed, seed={seed}"
        assert got_drv == want, f"driver path, seed={seed}"


def test_connected_components_empty_and_dedup_all_singletons(spark):
    import pyspark.sql.types as T

    schema = T.StructType(
        [T.StructField("src", T.LongType()), T.StructField("dst", T.LongType())]
    )
    empty = spark.createDataFrame([], schema)
    assert connected_components(empty).count() == 0
    docs = spark.createDataFrame([(i, "t") for i in range(4)], ["doc_id", "text"])
    rows = dedup_clusters(
        docs, empty.withColumnRenamed("src", "doc_a").withColumnRenamed("dst", "doc_b")
    ).collect()
    assert all(r["is_survivor"] and r["cluster_id"] == r["doc_id"] for r in rows)


def test_cap_per_group_limits_and_determinism(spark):
    from manufacturing_data_integration_tool_spark.ops.sampling import cap_per_group

    df = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(100)], ["id", "grp"]
    )
    capped = cap_per_group(df, "grp", "id", 7)
    counts = {r["grp"]: r["n"] for r in capped.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert all(n == 7 for n in counts.values()) and len(counts) == 3
    # groups under the cap survive whole
    small = cap_per_group(df.filter(F.col("id") < 9), "grp", "id", 7)
    assert small.count() == 9
    # survivors are partitioning-invariant
    a = {(r["id"], r["grp"]) for r in capped.collect()}
    b = {(r["id"], r["grp"]) for r in cap_per_group(df.repartition(13), "grp", "id", 7).collect()}
    assert a == b


def test_priority_sample_k_per_stratum_and_weight_bias(spark):
    from manufacturing_data_integration_tool_spark.ops.sampling import priority_sample

    rows = [(i, "s", 1000.0 if i < 50 else 1.0) for i in range(500)]
    df = spark.createDataFrame(rows, ["id", "strat", "w"])
    got = priority_sample(df, "id", "w", 40, strata_col="strat").collect()
    assert len(got) == 40
    heavy = sum(1 for r in got if r["w"] == 1000.0)
    # 50 heavy rows at 1000x weight should dominate a 40-row draw
    assert heavy >= 30
    # deterministic under repartitioning
    again = priority_sample(df.repartition(17), "id", "w", 40, strata_col="strat").collect()
    assert {r["id"] for r in got} == {r["id"] for r in again}


def test_semantic_dedup_drops_exact_dupes_keeps_distinct(spark):
    from manufacturing_data_integration_tool_spark.ops.dedup import semantic_dedup

    # 4 well-separated base directions in 8-dim, each duplicated 3x with the
    # same vector -> within every cluster the dupes score cosine 1.0
    base = [[1.0 if d == g else 0.0 for d in range(8)] for g in range(4)]
    rows = []
    for g, v in enumerate(base):
        for j in range(3):
            rows.append((g * 10 + j, v))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = semantic_dedup(
        df, id_col="vec_id", vec_col="embedding", n_clusters=4, threshold=0.99, seed=7
    )
    kept = sorted(r["vec_id"] for r in out.collect())
    # exactly the lowest id of each duplicate family survives
    assert kept == [0, 10, 20, 30]
    # deterministic hyperplane cells: exact duplicates land in the same
    # cell BY CONSTRUCTION (identical sign bits), so every dupe family
    # still collapses to its lowest id — regardless of how the seeded
    # planes partition the distinct directions
    out_hp = semantic_dedup(
        df, id_col="vec_id", vec_col="embedding", n_clusters=4,
        threshold=0.99, seed=7, cells="hyperplane", dim=8,
    )
    assert sorted(r["vec_id"] for r in out_hp.collect()) == [0, 10, 20, 30]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="dim"):
        semantic_dedup(df, id_col="vec_id", vec_col="embedding", cells="hyperplane")
    with _pytest.raises(ValueError, match="cells"):
        semantic_dedup(df, id_col="vec_id", vec_col="embedding", cells="grid")


def test_incremental_dedup_admits_only_new_content(spark):
    from manufacturing_data_integration_tool_spark.ops.dedup import incremental_dedup

    corpus = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(
        [(10, "alpha"), (11, "gamma"), (12, "gamma"), (13, "delta")],
        ["doc_id", "text"],
    )
    got = sorted(r["doc_id"] for r in incremental_dedup(batch, corpus).collect())
    # 'alpha' already in corpus; 'gamma' deduped within the batch to min id
    assert got == [11, 13]


def test_budget_fill_respects_budget_and_determinism(spark):
    from manufacturing_data_integration_tool_spark.ops.sampling import budget_fill

    rows = [(i, "s", 10) for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "strat", "sz"])
    got = budget_fill(df, "strat", "id", "sz", 250).collect()
    assert len(got) == 25  # 25 x 10 == 250 inclusive
    again = budget_fill(df.repartition(9), "strat", "id", "sz", 250).collect()
    assert {r["id"] for r in got} == {r["id"] for r in again}


def test_two_phase_running_sum_equals_naive_window(spark):
    """The skew-safe two-phase cumulative sum must be BYTE-IDENTICAL to
    the naive per-stratum window on every row — that equivalence is what
    keeps the plain running-sum oracle SQL valid."""
    from pyspark.sql import Window

    from manufacturing_data_integration_tool_spark.ops.sampling import (
        two_phase_running_sum,
    )

    rows = [(i, ["en", "de", "fr"][i % 3], (i * 7) % 23 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, ["id", "lang", "sz"]).repartition(7)
    got = {
        (r["lang"], r["id"]): r["run"]
        for r in two_phase_running_sum(
            df, ["lang"], [F.col("id")], F.col("sz"), F.expr("id div 16"), out_col="run"
        ).collect()
    }
    w = (
        Window.partitionBy("lang")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        (r["lang"], r["id"]): r["run"]
        for r in df.withColumn("run", F.sum(F.col("sz").cast("bigint")).over(w)).collect()
    }
    assert got == want


def test_budget_fill_null_stratum_and_key(spark):
    """NULL strata and NULL keys must survive the two-phase offsets join
    (null-safe equality) and admit deterministically, same as the naive
    form admitted them."""
    from manufacturing_data_integration_tool_spark.ops.sampling import budget_fill

    rows = [(i, None if i % 4 == 0 else "s", 10) for i in range(40)]
    df = spark.createDataFrame(rows, ["id", "strat", "sz"])
    got = budget_fill(df, "strat", "id", "sz", 70).collect()
    by_strat = {}
    for r in got:
        by_strat.setdefault(r["strat"], set()).add(r["id"])
    # each stratum fills its own budget: 7 rows of size 10
    assert len(by_strat[None]) == 7 and len(by_strat["s"]) == 7
    again = budget_fill(df.repartition(5), "strat", "id", "sz", 70).collect()
    assert {(r["strat"], r["id"]) for r in got} == {(r["strat"], r["id"]) for r in again}


def test_temperature_mix_upweights_low_resource(spark):
    from manufacturing_data_integration_tool_spark.ops.sampling import temperature_mix

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, ["id", "lang"])
    out = temperature_mix(df, "lang", "id", alpha=0.5, target_rows=400).collect()
    kept = {"big": 0, "small": 0}
    for r in out:
        kept[r["lang"]] += 1
    # alpha=0.5 shares: sqrt(900):sqrt(100) = 3:1 -> ~300 big / ~100 small;
    # proportional sampling would have kept only ~40 small rows
    assert kept["small"] >= 70
    assert 0.55 < kept["big"] / (kept["big"] + kept["small"]) < 0.85
    # determinism under repartitioning
    again = temperature_mix(df.repartition(11), "lang", "id", alpha=0.5, target_rows=400).collect()
    assert {r["id"] for r in out} == {r["id"] for r in again}


def test_two_phase_ntile_matches_single_window(spark):
    """two_phase_ntile must replicate SQL NTILE fill-order semantics
    exactly — compared against Spark's own ntile() over the (test-only)
    unpartitioned window, including the uneven-tile and N < n edges."""
    from pyspark.sql import Row, Window
    from manufacturing_data_integration_tool_spark.ops.sampling import two_phase_ntile

    rows = [Row(id=i, v=(i * 37) % 101) for i in range(57)]
    df = spark.createDataFrame(rows)
    for n_tiles in (4, 10, 57, 60):
        got = {
            r["id"]: r["tile"]
            for r in two_phase_ntile(
                df, n_tiles, [F.asc("v"), F.asc("id")], F.expr("v div 13")
            ).collect()
        }
        w = Window.orderBy(F.asc("v"), F.asc("id"))
        want = {
            r["id"]: r["t"]
            for r in df.withColumn("t", F.ntile(n_tiles).over(w)).collect()
        }
        assert got == want, n_tiles


def test_two_phase_ntile_validates(spark):
    from pyspark.sql import Row
    from manufacturing_data_integration_tool_spark.ops.sampling import two_phase_ntile

    df = spark.createDataFrame([Row(v=1)])
    import pytest

    with pytest.raises(ValueError):
        two_phase_ntile(df, 0, [F.asc("v")], F.expr("v"))


def _pagerank_python(edges, iterations=8, damping=0.85, scale=10**12):
    """Pure-Python integer twin of ops.graph.pagerank."""
    e = sorted(set(edges))
    nodes = sorted({a for a, _ in e} | {b for _, b in e})
    n = len(nodes)
    outdeg = {}
    for a, _ in e:
        outdeg[a] = outdeg.get(a, 0) + 1
    dnum, dden = int(round(damping * 1_000_000)), 1_000_000
    r = {v: scale // n for v in nodes}
    for _ in range(iterations):
        share = {v: r[v] // outdeg[v] for v in nodes if v in outdeg}
        in_mass = {v: 0 for v in nodes}
        for a, b in e:
            in_mass[b] += share[a]
        distributed = sum(share[a] * outdeg[a] for a in share)
        residue = (scale - (distributed * dnum) // dden) // n
        r = {v: (in_mass[v] * dnum) // dden + residue for v in nodes}
    # floor-based half-up publish, mirroring ops.graph.pagerank
    import math

    return {v: math.floor(r[v] / 1000.0 + 0.5) / (scale / 1000.0) for v in nodes}


def test_pagerank_matches_integer_python_twin(spark):
    import random

    from manufacturing_data_integration_tool_spark.ops.graph import pagerank

    rng = random.Random(7)
    edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(120)})
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=8).collect()}
    want = _pagerank_python(edges, iterations=8)
    assert got == want
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_pagerank_star_center_dominates(spark):
    from manufacturing_data_integration_tool_spark.ops.graph import pagerank

    # undirected star: center 0 <-> leaves 1..6
    edges = [(0, i) for i in range(1, 7)] + [(i, 0) for i in range(1, 7)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=10).collect()}
    assert got[0] > max(got[i] for i in range(1, 7)) * 3


def test_triangle_counts_known_graph(spark):
    from manufacturing_data_integration_tool_spark.ops.graph import triangle_counts

    # K4 on 1-4 (4 triangles, 3 per node) + pendant 5 + disjoint edge 6-7
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (4, 5),
        (6, 7),
        (2, 1),  # reversed duplicate must not double-count
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r.node: (r.degree, r.n_triangles) for r in triangle_counts(df).collect()}
    assert out == {
        1: (3, 3),
        2: (3, 3),
        3: (3, 3),
        4: (4, 3),
        5: (1, 0),
        6: (1, 0),
        7: (1, 0),
    }


def test_triangle_counts_star_has_none(spark):
    from manufacturing_data_integration_tool_spark.ops.graph import triangle_counts

    df = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    out = triangle_counts(df).collect()
    assert all(r.n_triangles == 0 for r in out)
    assert {r.degree for r in out} == {1, 5}


def test_mmr_rerank_prefers_diverse_results(spark):
    from manufacturing_data_integration_tool_spark.ops.similarity import mmr_rerank

    # docs 1,2 nearly identical vectors with top relevance; doc 3 slightly
    # less relevant but orthogonal -> MMR must pick 3 second, not 2
    rows = [
        (1, 1.00, [1.0, 0.0, 0.0]),
        (2, 0.99, [0.999, 0.01, 0.0]),
        (3, 0.90, [0.0, 1.0, 0.0]),
        (4, 0.10, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, score double, vec array<double>"
    )
    out = mmr_rerank(df, "doc_id", "score", "vec", k=3, lambda_=0.5)
    got = [r.doc_id for r in out.orderBy("mmr_rank").collect()]
    assert got == [1, 3, 4]
    # pure relevance (lambda=1) keeps the near-dup at rank 2
    out2 = mmr_rerank(df, "doc_id", "score", "vec", k=3, lambda_=1.0)
    assert [r.doc_id for r in out2.orderBy("mmr_rank").collect()] == [1, 2, 3]


def test_mmr_rerank_matches_pure_python_twin(spark, sf_dir):
    import numpy as np
    from pyspark.sql import functions as F

    from manufacturing_data_integration_tool_spark.ops.similarity import mmr_rerank
    from manufacturing_data_integration_tool_spark.ops.text import bm25_topk
    from manufacturing_data_integration_tool_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings")
    page = bm25_topk(docs, ["filter", "merge"], k=20)
    cand = page.join(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id"
    )
    got = [
        (r.doc_id, r.mmr_rank)
        for r in mmr_rerank(cand, "doc_id", "bm25", "embedding", k=8, lambda_=0.7)
        .orderBy("mmr_rank")
        .collect()
    ]
    rows = sorted(cand.select("doc_id", "bm25", "embedding").collect())
    ids = [r.doc_id for r in rows]
    rel = np.array([r.bm25 for r in rows])
    vecs = np.array([r.embedding for r in rows], dtype=np.float64)
    unit = vecs / np.linalg.norm(vecs, axis=1)[:, None]
    sims = unit @ unit.T
    picked, max_sim = [], np.zeros(len(ids))
    avail = np.ones(len(ids), dtype=bool)
    for rank in range(1, 9):
        mmr = 0.7 * rel - 0.3 * max_sim
        mmr[~avail] = -np.inf
        b = int(np.argmax(mmr))
        picked.append((ids[b], rank))
        avail[b] = False
        max_sim = np.maximum(max_sim, sims[b])
    assert got == picked


def test_mmr_rerank_guard_rails(spark):
    import pytest as _pytest

    from manufacturing_data_integration_tool_spark.ops.similarity import mmr_rerank

    df = spark.createDataFrame(
        [(i, 1.0, [float(i), 1.0]) for i in range(5)],
        "doc_id long, score double, vec array<double>",
    )
    with _pytest.raises(ValueError, match="max_candidates"):
        mmr_rerank(df, "doc_id", "score", "vec", k=2, max_candidates=3)
    with _pytest.raises(ValueError, match="lambda_"):
        mmr_rerank(df, "doc_id", "score", "vec", k=2, lambda_=1.5)
    # exact-sims path has its own tighter cap (|page|^2 driver collect):
    # raises under exact_sims=True, but the numpy path takes the same page
    with _pytest.raises(ValueError, match="exact_sims_max"):
        mmr_rerank(df, "doc_id", "score", "vec", k=2, exact_sims_max=3)
    out_np = mmr_rerank(
        df, "doc_id", "score", "vec", k=2, exact_sims=False, exact_sims_max=3
    )
    assert out_np.count() == 2
    # k larger than the page: returns the whole page, ranked
    out = mmr_rerank(df, "doc_id", "score", "vec", k=50)
    assert out.count() == 5


def test_triangle_counts_matches_bruteforce_random_graph(spark):
    import itertools
    import random

    from manufacturing_data_integration_tool_spark.ops.graph import triangle_counts

    rng = random.Random(1234)
    nodes = list(range(60))
    edges = [
        (a, b)
        for a, b in itertools.combinations(nodes, 2)
        if rng.random() < 0.12
    ]
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    expected = {}
    for n in nodes:
        if not adj[n]:
            continue
        tri = sum(
            1
            for v, w in itertools.combinations(sorted(adj[n]), 2)
            if w in adj[v]
        )
        expected[n] = (len(adj[n]), tri)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: (r.degree, r.n_triangles) for r in triangle_counts(df).collect()
    }
    assert got == expected


def test_weighted_percentile_matches_pure_python_random(spark):
    import random

    from manufacturing_data_integration_tool_spark.ops.sampling import (
        weighted_percentile,
    )

    rng = random.Random(77)
    rows = [
        (f"g{rng.randrange(3)}", rng.randrange(1, 50), float(rng.randrange(1, 9)))
        for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "grp string, v int, w double")

    def pure(frac):
        from collections import defaultdict

        agg = defaultdict(lambda: defaultdict(float))
        for g, v, w in rows:
            agg[g][v] += w
        out = {}
        for g, vw in agg.items():
            total = sum(vw.values())
            cum = 0.0
            for v in sorted(vw):
                cum += vw[v]
                if cum >= frac * total - 1e-12:
                    out[g] = v
                    break
        return out

    for frac in (0.25, 0.5, 0.9):
        got = {
            r.grp: r.wpct
            for r in weighted_percentile(df, ["grp"], "v", "w", fraction=frac).collect()
        }
        assert got == pure(frac), f"fraction {frac}"


def test_negative_samples_bijection_and_determinism(spark):
    from manufacturing_data_integration_tool_spark.ops.sampling import negative_samples

    df = spark.createDataFrame([(i,) for i in range(30)], "doc_id long")
    out = negative_samples(df, "doc_id", k=4).collect()
    # every anchor gets exactly k negatives; every doc serves as negative
    # exactly k times (each offset is a rotation = bijection)
    from collections import Counter

    anchors = Counter(r.anchor_id for r in out)
    negs = Counter(r.negative_id for r in out)
    assert set(anchors.values()) == {4} and len(anchors) == 30
    assert set(negs.values()) == {4} and len(negs) == 30
    assert all(r.anchor_id != r.negative_id for r in out)
    # deterministic under repartition
    out2 = negative_samples(df.repartition(7), "doc_id", k=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
    # different salt -> different pairing
    out3 = negative_samples(df, "doc_id", k=4, salt="other").collect()
    assert sorted(map(tuple, out)) != sorted(map(tuple, out3))


def test_negative_samples_tiny_corpus(spark):
    import pytest as _pytest

    from manufacturing_data_integration_tool_spark.ops.sampling import negative_samples

    one = spark.createDataFrame([(1,)], "doc_id long")
    assert negative_samples(one, "doc_id", k=2).count() == 0
    two = spark.createDataFrame([(1,), (2,)], "doc_id long")
    rows = negative_samples(two, "doc_id", k=2).collect()
    # N=2, s=1: offsets 1,2 -> one real partner and one self (filtered)
    assert all(r.anchor_id != r.negative_id for r in rows)
    assert len(rows) == 2
    with _pytest.raises(ValueError):
        negative_samples(two, "doc_id", k=0)


def test_recursive_cte_bfs_matches_python_twin(spark):
    """Spark 4 WITH RECURSIVE semantics pinned against a plain Python
    BFS: min-hop counts from the smallest node over a hand-built graph
    with a cycle and a disconnected component (which must NOT appear)."""
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (8, 9)]
    spark.createDataFrame(edges, "doc_a long, doc_b long").createOrReplaceTempView(
        "bfs_pairs"
    )
    got = {
        r["node"]: r["hops"]
        for r in spark.sql("""
            WITH RECURSIVE sym AS (
              SELECT doc_a AS src, doc_b AS dst FROM bfs_pairs
              UNION ALL SELECT doc_b, doc_a FROM bfs_pairs
            ),
            reach(node, hops) AS (
              SELECT (SELECT MIN(src) FROM sym), 0
              UNION ALL
              SELECT sym.dst, reach.hops + 1
              FROM reach JOIN sym ON sym.src = reach.node
              WHERE reach.hops < 3
            )
            SELECT node, CAST(MIN(hops) AS BIGINT) AS hops
            FROM reach GROUP BY node
        """).collect()
    }
    # BFS from node 1, hop-bounded at 3: 5 is 3 hops via 3->4->5
    assert got == {1: 0, 2: 1, 3: 1, 4: 2, 5: 3}


def test_leakage_safe_split_never_straddles_clusters(spark):
    """The q193 property: every near-dup cluster lands wholly in train or
    wholly in holdout — keyed on cluster_id, two connected docs cannot
    disagree; a doc-keyed split on the same fixture DOES straddle
    (negative control proving the property is not vacuous)."""
    from manufacturing_data_integration_tool_spark.ops.sampling import (
        train_holdout_split,
    )

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(200)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame(
        [(i, i + 100) for i in range(100)], ["doc_a", "doc_b"]
    )
    clusters = dedup_clusters(docs, pairs, "doc_id")
    out = train_holdout_split(clusters, "cluster_id", 0.25).select(
        "doc_id", "cluster_id", "split"
    )
    per_cluster = out.groupBy("cluster_id").agg(
        F.countDistinct("split").alias("n_splits")
    )
    assert per_cluster.filter(F.col("n_splits") > 1).count() == 0
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits == {"train", "holdout"}  # both sides populated
    # negative control: doc-keyed split DOES straddle some pair
    naive = train_holdout_split(clusters, "doc_id", 0.25)
    straddled = (
        naive.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert straddled > 0


# ---------------------------------------------------------------------------
# randomized differentials for the two-phase ranking primitive and FIFO
# (seeded, not hypothesis: each case costs a Spark round-trip)
# ---------------------------------------------------------------------------


def test_two_phase_running_sum_equals_plain_window_randomized(spark):
    """The primitive every global ranking here rides: per-stratum
    running sums from the sub-bucketed two-phase form must equal the
    naive single-window form on randomized inputs (sizes, duplicates,
    negative values, skewed strata)."""
    import random

    from pyspark.sql import Row, Window, functions as F
    from manufacturing_data_integration_tool_spark.ops.sampling import (
        two_phase_running_sum,
    )

    rng = random.Random(1234)
    for trial in range(3):
        rows = [
            Row(
                g=rng.choice(["a", "b", "c"]),
                k=i,
                v=rng.randint(-50, 50),
            )
            for i in range(rng.randint(1, 120))
        ]
        df = spark.createDataFrame(rows)
        got = {
            (r["g"], r["k"]): r["run"]
            for r in two_phase_running_sum(
                df,
                ["g"],
                [F.col("v"), F.col("k")],
                F.col("v"),
                # sub-bucket monotone along (v, k): the value grid
                F.floor(F.col("v") / F.lit(7.0)).cast("bigint"),
                out_col="run",
            ).collect()
        }
        w = (
            Window.partitionBy("g")
            .orderBy(F.asc("v"), F.asc("k"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        want = {
            (r["g"], r["k"]): r["run"]
            for r in df.withColumn(
                "run", F.sum("v").over(w).cast("bigint")
            ).collect()
        }
        assert got == want, f"trial {trial}"


def test_fifo_cogs_matches_python_walk_randomized(spark):
    import random

    from pyspark.sql import Row, functions as F
    from manufacturing_data_integration_tool_spark.ops.inventory import (
        fifo_cogs,
    )

    rng = random.Random(99)
    for trial in range(3):
        lots = [
            Row(
                k=rng.choice(["x", "y"]),
                d=i,
                qty=rng.randint(1, 9),
                cents=rng.randint(1, 500),
            )
            for i in range(rng.randint(1, 40))
        ]
        demand = rng.randint(0, 60)
        df = spark.createDataFrame(lots).withColumn(
            "__dem", F.lit(demand).cast("bigint")
        )
        got = {
            r["k"]: r
            for r in fifo_cogs(
                df, "k", ["d"], "qty", "cents", F.col("__dem")
            ).collect()
        }
        # python walk
        for key in {l.k for l in lots}:
            seq = sorted([l for l in lots if l.k == key], key=lambda l: l.d)
            remaining, cogs, consumed, touched = demand, 0, 0, 0
            for l in seq:
                take = min(l.qty, max(remaining, 0))
                unit = l.cents // l.qty
                cogs += take * unit
                consumed += take
                touched += 1 if take > 0 else 0
                remaining -= take
            r = got[key]
            assert r["fifo_cogs_cents"] == cogs, (trial, key)
            assert r["consumed_qty"] == consumed
            assert r["n_lots_touched"] == touched


def test_weighted_sample_ares_matches_python_twin(spark):
    """The A-Res selection must equal a brute-force Python recompute of
    the same md5-lane keys (identical fold), exclude non-positive
    weights, and return exactly k winners."""
    import hashlib
    import math

    from manufacturing_data_integration_tool_spark.ops.sampling import (
        weighted_sample_ares,
    )

    rows = [(i, (i * 7) % 13) for i in range(200)]  # weights 0..12, some 0
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = [
        (r["doc_id"], r["w"], r["ares_key"])
        for r in weighted_sample_ares(df, "doc_id", "w", 20).collect()
    ]
    assert len(got) == 20

    def key(i, w):
        h = hashlib.md5(f"{i}:wres".encode()).hexdigest()[:13]
        u = (int(h, 16) + 0.5) / float(1 << 52)
        return round(math.log(u), 9) / w

    want = sorted(
        ((i, w) for i, w in rows if w > 0), key=lambda t: (-key(*t), t[0])
    )[:20]
    assert [(i, w) for i, w, _ in got] == want
    for i, w, kx in got:
        assert kx == math.floor(key(i, w) * 1e9 + 0.5)
    assert all(w > 0 for _, w, _ in got)


def test_chao1_richness_hand_computed(spark):
    """corpus: 'a' x3, 'b' x2, 'c' x1, 'd' x1 -> D=4, f1=2, f2=1,
    chao1 = 4 + 2*1/(2*2) = 4.5."""
    from manufacturing_data_integration_tool_spark.ops.text import chao1_richness

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d"), (3, "a")], "doc_id long, text string"
    )
    out = chao1_richness(df).collect()[0]
    assert (out["n_distinct"], out["f1"], out["f2"]) == (4, 2, 1)
    assert out["chao1_x1e6"] == 4_500_000


def test_hits_scores_star_graph(spark):
    """On a star (hubs 1..4 all pointing at authority 10, hub 1 also at
    11): authority 10 must dominate 11, all scores sum to ~scale per
    side, and a second run is bit-identical."""
    from manufacturing_data_integration_tool_spark.ops.graph import hits_scores

    edges = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 10), (1, 11)], "src long, dst long"
    )
    h, a = hits_scores(edges, iterations=3)
    auth = {r["node"]: r["score"] for r in a.collect()}
    hub = {r["node"]: r["score"] for r in h.collect()}
    assert auth[10] > auth[11]
    assert hub[1] >= hub[2] == hub[3] == hub[4]  # hub 1 touches both
    for scores in (auth, hub):
        assert abs(sum(scores.values()) - 10**12) <= len(scores)  # L1 ~ scale
    h2, a2 = hits_scores(edges, iterations=3)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, a2.collect()))


def test_zorder_blocks_exact_grid(spark):
    """On a 4x4 integer plane with bits=2 the Morton keys are the
    textbook interleave: bucket == value (range 0..3 maps 1:1), so
    (x=1, y=0) -> z=1, (x=0, y=1) -> z=2, (x=3, y=3) -> z=15. With
    block_cells=4 each quadrant is one block whose bbox is the 2x2
    quadrant square (bbox_cells=4), never a full-width stripe."""
    from manufacturing_data_integration_tool_spark.ops.sampling import (
        zorder_blocks,
    )

    rows = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = {r["z_block"]: r for r in zorder_blocks(
        df, "x", "y", bits=2, block_cells=4
    ).collect()}
    assert sorted(out) == [0, 1, 2, 3]  # 16 cells / 4 per block
    for blk, r in out.items():
        assert r["n_rows"] == 4
        assert r["bbox_cells"] == 4  # tight 2x2 quadrant boxes
    # quadrant 0 is the low-left square, quadrant 3 the high-right
    assert (out[0]["x_lo"], out[0]["x_hi"], out[0]["y_lo"], out[0]["y_hi"]) == (0, 1, 0, 1)
    assert (out[3]["x_lo"], out[3]["x_hi"], out[3]["y_lo"], out[3]["y_hi"]) == (2, 3, 2, 3)


def test_link_prediction_scores_exact(spark):
    """Items {i1: (a,b), i2: (a,b), i3: (a,c), i4: (c,)}: pair (a,b)
    shares 2 items, deg_a=3, deg_b=2 -> jaccard = 2/3; (a,c) shares only
    1 item and drops below min_common=2. AA term for deg-2 items is
    floor(1e9/round(ln 2, 9) + 0.5) each."""
    import math

    from manufacturing_data_integration_tool_spark.ops.graph import (
        link_prediction_scores,
    )

    rows = [("i1", "a"), ("i1", "b"), ("i2", "a"), ("i2", "b"),
            ("i3", "a"), ("i3", "c"), ("i4", "c")]
    df = spark.createDataFrame(rows, "item string, node string")
    out = link_prediction_scores(
        df, "item", "node", min_common=2, top_k=10
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["node_a"], r["node_b"], r["n_common"]) == ("a", "b", 2)
    assert (r["deg_a"], r["deg_b"]) == (3, 2)
    assert r["jaccard_x1e6"] == 2 * 1_000_000 // 3
    term = math.floor(1e9 / round(math.log(2.0), 9) + 0.5)
    assert r["aa_x1e9"] == 2 * term


def test_link_prediction_hot_item_consistent_universe(spark):
    """A shared item ABOVE the cap must drop out of BOTH the
    intersection AND the degrees (the review-caught double-count):
    nodes a,b share cool items i1,i2 plus hot item h (3 nodes > cap=2).
    With the consistent universe deg_a = deg_b = n_common = 2 and
    jaccard = 1.0 exactly."""
    from manufacturing_data_integration_tool_spark.ops.graph import (
        link_prediction_scores,
    )

    rows = [("i1", "a"), ("i1", "b"), ("i2", "a"), ("i2", "b"),
            ("h", "a"), ("h", "b"), ("h", "c")]
    df = spark.createDataFrame(rows, "item string, node string")
    out = link_prediction_scores(
        df, "item", "node", hot_item_cap=2, min_common=2, top_k=10
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["node_a"], r["node_b"], r["n_common"]) == ("a", "b", 2)
    assert (r["deg_a"], r["deg_b"]) == (2, 2)  # hot item excluded from degrees
    assert r["jaccard_x1e6"] == 1_000_000  # identical eligible neighborhoods


def test_ipf_raking_matches_integer_twin_and_converges(spark):
    """Skewed 2x3 grid: the weight trajectory must match a pure-Python
    twin of the exact integer divisions step for step, and 4 iterations
    must land the weighted marginals within 1e-6 of uniform targets."""
    from pyspark.sql import Row
    from manufacturing_data_integration_tool_spark.ops.sampling import (
        ipf_raking,
    )

    counts = {("a", "x"): 8, ("a", "y"): 1, ("a", "z"): 1,
              ("b", "x"): 1, ("b", "y"): 4, ("b", "z"): 5}
    rows = [
        Row(r=r, c=c) for (r, c), n in counts.items() for _ in range(n)
    ]
    out = {
        (row["r"], row["c"]): row
        for row in ipf_raking(
            spark.createDataFrame(rows), "r", "c", iterations=4
        ).collect()
    }

    grid = 10**9
    n_tot = sum(counts.values())
    kr = len({r for r, _ in counts})
    kc = len({c for _, c in counts})
    w = {k: grid for k in counts}
    for _ in range(4):
        rs = {}
        for (r, c), n in counts.items():
            rs[r] = rs.get(r, 0) + n * w[(r, c)]
        for (r, c) in w:
            w[(r, c)] = (w[(r, c)] * n_tot * grid) // (kr * rs[r])
        cs = {}
        for (r, c), n in counts.items():
            cs[c] = cs.get(c, 0) + n * w[(r, c)]
        for (r, c) in w:
            w[(r, c)] = (w[(r, c)] * n_tot * grid) // (kc * cs[c])
    for k, n in counts.items():
        assert out[k]["n"] == n
        assert out[k]["weight_x1e9"] == w[k], (k, out[k], w[k])
    # convergence: the LAST-scaled axis (columns) is exact to the
    # lattice; the row axis converges geometrically — on this heavily
    # skewed micro-grid, 4 alternations land within ~1% and doubling
    # the iterations must tighten it further.
    for c in {c for _, c in counts}:
        got = sum(
            counts[k] * w[k] / grid for k in counts if k[1] == c
        )
        assert abs(got - n_tot / kc) < 1e-6 * n_tot
    row_gap = max(
        abs(
            sum(counts[k] * w[k] / grid for k in counts if k[0] == r)
            - n_tot / kr
        )
        for r in {r for r, _ in counts}
    )
    assert row_gap < 0.02 * n_tot
    out8 = {
        (row["r"], row["c"]): row["weight_x1e9"]
        for row in ipf_raking(
            spark.createDataFrame(rows), "r", "c", iterations=8
        ).collect()
    }
    row_gap8 = max(
        abs(
            sum(counts[k] * out8[k] / grid for k in counts if k[0] == r)
            - n_tot / kr
        )
        for r in {r for r, _ in counts}
    )
    assert row_gap8 < row_gap / 4


def test_degree_assortativity_matches_numpy_pearson(spark):
    """r recomputed as the numpy Pearson correlation of edge-end degrees
    over the symmetrized edge list must match the exact-integer
    pipeline; a star graph is perfectly disassortative (r = -1)."""
    import math

    import numpy as np

    from manufacturing_data_integration_tool_spark.ops.graph import (
        degree_assortativity,
    )

    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (2, 5), (5, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = degree_assortativity(df).collect()[0]
    sym = set()
    for u, v in edges:
        sym.add((u, v))
        sym.add((v, u))
    deg = {}
    for u, _ in sym:
        deg[u] = deg.get(u, 0) + 1
    xs = np.array([deg[u] for u, v in sorted(sym)], dtype=float)
    ys = np.array([deg[v] for u, v in sorted(sym)], dtype=float)
    r = np.corrcoef(xs, ys)[0, 1]
    assert out["n_nodes"] == len(deg)
    assert out["m_directed"] == len(sym)
    assert abs(out["r_x1e9"] - math.floor(r * 1e9 + 0.5)) <= 2

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    st = degree_assortativity(star).collect()[0]
    assert st["r_x1e9"] == -1_000_000_000

    # degree-regular graph (a 4-cycle): r undefined -> NULL
    cyc = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    assert degree_assortativity(cyc).collect()[0]["r_x1e9"] is None


def test_neyman_allocation_by_hand(spark):
    import math

    from manufacturing_data_integration_tool_spark.ops.sampling import (
        neyman_allocation,
    )

    # stratum a: high spread; stratum b: same size, low spread; c: constant
    vals = {"a": [0, 100, 0, 100], "b": [50, 52, 50, 52], "c": [7, 7, 7]}
    rows = [(g, v) for g, vs in vals.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r["g"]: r for r in neyman_allocation(
        df, ["g"], "v", budget=1000
    ).collect()}
    w = {}
    for g, vs in vals.items():
        n, s1, s2 = len(vs), sum(vs), sum(x * x for x in vs)
        w[g] = math.floor(math.sqrt(n * s2 - s1 * s1) * 1000 + 0.5)
        assert out[g]["n_rows"] == n
        assert out[g]["weight_x1e3"] == w[g]
    t = sum(w.values())
    for g in vals:
        assert out[g]["alloc_n"] == 1000 * w[g] // t
    # constant stratum gets zero budget; allocation never exceeds it
    assert out["c"]["alloc_n"] == 0
    assert sum(r["alloc_n"] for r in out.values()) <= 1000


def test_neyman_allocation_all_constant_is_null(spark):
    from manufacturing_data_integration_tool_spark.ops.sampling import (
        neyman_allocation,
    )

    df = spark.createDataFrame(
        [("a", 5), ("a", 5), ("b", 9)], "g string, v long"
    )
    rows = neyman_allocation(df, ["g"], "v", budget=100).collect()
    assert all(r["alloc_n"] is None for r in rows)  # T = 0 -> undefined


def test_label_propagation_separates_bridged_cliques(spark):
    """Two triangles joined by one bridge edge: connected components
    merges them into one cluster; 3-round deterministic LPA keeps them
    apart (neighbor-mode, ties to smallest label), and isolated nodes
    keep their own id. Hand-computed fixed point: {1,2,3}->1,
    {4,5,6}->3, 7->7."""
    from manufacturing_data_integration_tool_spark.ops.graph import (
        label_propagation,
    )

    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (4, 6), (5, 6)],
        "doc_a long, doc_b long",
    )
    got = {
        r["doc_id"]: r["community"]
        for r in label_propagation(
            nodes, edges, "doc_id", src="doc_a", dst="doc_b", rounds=3
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 3, 5: 3, 6: 3, 7: 7}
