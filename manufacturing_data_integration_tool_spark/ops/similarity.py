"""Similarity search over embedding columns (array<float>).

Greenfield LLM-pipeline capability (SURVEY.md §7.0). Two tiers:

* ``cosine_topk`` — brute-force exact top-k: broadcast the (small) query
  set, scan the corpus once, per-query top-k via a window. The corpus scan
  is embarrassingly parallel; the only shuffle is the per-query ranking.
  This is the correctness baseline and is fine whenever |queries| is small.
* ``lsh_ann_topk`` — approximate path for corpus-x-corpus or huge query
  sets: unit-normalize (cosine == L2 on the unit sphere), bucket with
  random hyperplane projections (``BucketedRandomProjectionLSH``), and only
  score within-bucket candidates. Candidate cost ~ bucket collisions, not
  |corpus| x |queries|.

All vector math is pure Column expressions (``zip_with``/``aggregate``,
double precision, fixed left-to-right accumulation) — deterministic and
JVM-side; no Python UDFs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from ._materialize import materialize_once

__all__ = [
    "mmd2_quadratic",
    "mrr_from_pages",
    "dot",
    "l2_norm",
    "cosine_similarity",
    "mmr_rerank",
    "cosine_topk",
    "knn_classify",
    "label_centroids",
    "centroid_similarity",
    "quantize_embeddings",
    "hyperplane_planes",
    "hyperplane_candidates",
    "hyperplane_query_candidates",
    "lsh_ann_topk",
    "rrf_fuse",
    "IvfIndex",
    "fit_ivf",
    "fit_ivf_deterministic",
    "ivf_search",
    "ivf_topk",
    "pca_fit",
    "pca_moments",
    "pca_project",
]


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns in double precision, accumulated
    left-to-right (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
    round_to: Optional[int] = 4,
    candidates: Optional[DataFrame] = None,
) -> DataFrame:
    """Top-k nearest corpus vectors per query vector (cosine).

    Scoring routes (same split as ``knn_classify``):

    - default: exact brute force — ``queries`` is broadcast, so it must
      be the small side by contract (a handful of probe vectors).
    - ``candidates=``: a (query_id, <id_col>) frame from a sub-quadratic
      cross-set generator (``hyperplane_query_candidates``, IVF cell
      joins). Scoring becomes two hash equi-joins over |candidates| rows
      — never a broadcast of either side — and the result is approximate
      top-k (best among candidates). This is the 100 TB route when the
      query set grows with the corpus.

    Self-matches (same id) are excluded when the id columns share a name.
    ``round_to`` rounds the similarity before ranking so orderings are
    stable across engines/partitionings; ties break on corpus id.
    """
    qid = query_id_col or id_col
    # norms once per vector row, not per (query, corpus) pair — same
    # float-op sequence as cosine_similarity, so oracles are unchanged
    q = queries.select(
        F.col(qid).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        l2_norm(F.col(vec_col)).alias("__nq"),
    )
    c = corpus.select(
        F.col(id_col), F.col(vec_col), l2_norm(F.col(vec_col)).alias("__nc")
    )
    if candidates is not None:
        pairs = candidates.select("query_id", id_col).join(c, id_col).join(
            q, "query_id"
        )
        if query_id_col is None:
            pairs = pairs.filter(F.col(id_col) != F.col("query_id"))
    else:
        pairs = c.crossJoin(F.broadcast(q)).filter(
            F.col(id_col) != F.col("query_id")
        )
    sim = F.try_divide(
        dot(F.col("__qv"), F.col(vec_col)), F.col("__nq") * F.col("__nc")
    )
    if round_to is not None:
        sim = F.round(sim, round_to)
    pairs = pairs.select("query_id", id_col, sim.alias("cosine_sim"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.col(id_col))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine_sim", "rank")
    )


def knn_classify(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: Optional[str] = None,
    round_to: Optional[int] = 4,
    candidates: Optional[DataFrame] = None,
) -> DataFrame:
    """Majority-vote k-NN classification over a labeled embedding corpus.

    The label rides along the corpus scan (one narrow extra column), so no
    join-back is needed after ranking: score -> per-query top-k window ->
    (query, label) vote counts -> per-query argmax window. Shuffle cost is
    the two windows over k*|queries| rows, never the corpus. Ties are
    deterministic: similarity rounds to ``round_to`` then breaks on corpus
    id; votes break on (count desc, label asc).

    Scoring routes:
    - default: ``queries`` is BROADCAST against the corpus scan — by
      contract the query set must be small (well under the broadcast
      threshold). Broadcasting a corpus-sized query set is impossible at
      scale; use the candidates route instead.
    - ``candidates=``: a (query_id, <id_col>) frame from a sub-quadratic
      cross-set generator (``hyperplane_query_candidates``, IVF cell
      joins). Scoring becomes two hash equi-joins (fetch corpus vector +
      label, fetch query vector) over |candidates| rows — never a
      broadcast of either side, AQE-skew-splittable. Result is then
      approximate kNN (top-k among candidates).

    Output: ``(query_id, pred_label, n_votes)``.
    """
    qid = query_id_col or id_col
    # norms projected BELOW the pairing join — once per vector row, not
    # once per candidate pair (same float-op sequence as
    # cosine_similarity: try_divide(dot, norm_q * norm_c), so oracle
    # parity is unchanged; saves 2/3 of the interpreted HOF work on
    # large candidate sets).
    q = queries.select(
        F.col(qid).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        l2_norm(F.col(vec_col)).alias("__nq"),
    )
    c = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        F.col(label_col),
        l2_norm(F.col(vec_col)).alias("__nc"),
    )
    sim = F.try_divide(
        dot(F.col("__qv"), F.col(vec_col)), F.col("__nq") * F.col("__nc")
    )
    if round_to is not None:
        sim = F.round(sim, round_to)
    if candidates is not None:
        cand = candidates.select("query_id", id_col)
        pairs = cand.join(c, id_col).join(q, "query_id")
        if query_id_col is None:
            pairs = pairs.filter(F.col(id_col) != F.col("query_id"))
    else:
        pairs = c.crossJoin(F.broadcast(q))
        if query_id_col is None:
            # leave-self-out only applies when queries ARE corpus rows (shared
            # id namespace); with a separate query id space an equal id is a
            # coincidence, and filtering it would wrongly discard a neighbor.
            pairs = pairs.filter(F.col(id_col) != F.col("query_id"))
    pairs = pairs.select("query_id", id_col, label_col, sim.alias("__sim"))
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("__sim"), F.col(id_col))
    topk = pairs.withColumn("__rn", F.row_number().over(w_rank)).filter(
        F.col("__rn") <= k
    )
    votes = topk.groupBy("query_id", label_col).agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    w_vote = Window.partitionBy("query_id").orderBy(
        F.desc("n_votes"), F.col(label_col)
    )
    return (
        votes.withColumn("__vr", F.row_number().over(w_vote))
        .filter(F.col("__vr") == 1)
        .select(
            "query_id",
            F.col(label_col).alias("pred_label"),
            F.col("n_votes").cast("long").alias("n_votes"),
        )
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    bits: int = 8,
    out_col: str = "codes",
) -> DataFrame:
    """Per-vector min/max scalar quantization to ``bits``-bit integer codes
    — the storage-compression primitive for embedding tables (an 8-bit code
    is 4x smaller than float32, 8x smaller than float64).

    ``code_i = floor((x_i - vmin) / scale + 0.5)`` with
    ``scale = (vmax - vmin) / (2^bits - 1)``; constant vectors get scale 1
    (all codes 0). Appends ``codes`` (array<int>), ``q_min``, ``q_scale``,
    and ``mean_abs_err`` (mean |x - dequant(x)|). Pure per-row Column math
    (``transform``/``aggregate`` under codegen): zero shuffle, and every
    arithmetic step is a single IEEE double op so results are bit-identical
    across engines.
    """
    if not 1 <= bits <= 16:
        raise ValueError(f"need 1 <= bits <= 16, got {bits=}")
    levels = (1 << bits) - 1
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    vmin = F.array_min(v)
    vmax = F.array_max(v)
    scale = F.when(vmax == vmin, F.lit(1.0)).otherwise((vmax - vmin) / levels)
    df = (
        df.withColumn("__v", v)
        .withColumn("q_min", vmin)
        .withColumn("q_scale", scale)
    )
    code = F.transform(
        F.col("__v"),
        lambda x: F.floor((x - F.col("q_min")) / F.col("q_scale") + F.lit(0.5)).cast(
            "int"
        ),
    )
    df = df.withColumn(out_col, code)
    abs_err_sum = F.aggregate(
        F.zip_with(
            F.col("__v"),
            F.col(out_col),
            lambda x, c: F.abs(x - (F.col("q_min") + c * F.col("q_scale"))),
        ),
        F.lit(0.0),
        lambda acc, e: acc + e,
    )
    return df.withColumn(
        "mean_abs_err", abs_err_sum / F.size(F.col("__v"))
    ).drop("__v")


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    *,
    scale: int = 10**7,
    round_to: int = 6,
) -> DataFrame:
    """Per-label element-wise centroids in long form
    ``(label, dim, n_vecs, centroid)`` — the IVF/cluster-stats support
    primitive (fit data for coarse quantizers, drift monitoring).

    One posexplode (rows = |vectors| x dim) + one groupBy (label, dim) with
    map-side combine — the shuffle carries |labels| x dim rows per
    partition, never the corpus. Each component is snapped to an integer
    grid (``floor(x * scale + 0.5)``) before summing: BIGINT addition is
    exact and order-independent, so the centroid is deterministic across
    engines and partitionings without decimal-cast rounding-mode concerns
    on full-mantissa floats.
    """
    e = df.select(F.col(label_col), F.posexplode(F.col(vec_col)).alias("dim", "__x"))
    q = F.floor(F.col("__x").cast("double") * scale + F.lit(0.5)).cast("long")
    return (
        e.withColumn("__q", q)
        .groupBy(label_col, "dim")
        .agg(F.count(F.lit(1)).alias("n_vecs"), F.sum("__q").alias("__qsum"))
        .select(
            label_col,
            F.col("dim").cast("long").alias("dim"),
            "n_vecs",
            F.round(
                F.col("__qsum") / (F.lit(float(scale)) * F.col("n_vecs")), round_to
            ).alias("centroid"),
        )
    )


def hyperplane_planes(
    dim: int, n_tables: int, n_planes: int, seed: int = 42
) -> list[list[list[float]]]:
    """Deterministic random-hyperplane set: ``n_tables`` bands of
    ``n_planes`` Gaussian vectors each, rounded to 6 decimals.

    The rounding keeps the plane constants short, exactly round-trippable
    through a SQL literal, and therefore bit-identical across engines — the
    whole point of this generator is that a DuckDB oracle can recompute the
    exact same buckets from the same literals.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    return [
        [[round(float(x), 6) for x in rng.standard_normal(dim)] for _ in range(n_planes)]
        for _ in range(n_tables)
    ]


def _plane_df(spark, dim: int, n_tables: int, n_planes: int, seed: int) -> DataFrame:
    """The deterministic plane set as a tiny (n_tables x n_planes)-row
    broadcastable DataFrame: (table, bit weight, plane vector)."""
    planes = hyperplane_planes(dim, n_tables, n_planes, seed)
    rows = [(t, 1 << j, planes[t][j]) for t in range(n_tables) for j in range(n_planes)]
    return spark.createDataFrame(rows, "__table int, __w int, __plane array<double>")


def _hyperplane_tagged(
    df: DataFrame, id_col: str, vec_col: str, plane_df: DataFrame
) -> DataFrame:
    """(id, table, bucket) tags: one bounded fan-out against the broadcast
    plane table, sign bits bit-packed by a map-side-combined groupBy.

    r13 NEGATIVE RESULT (kept for the record): a zero-shuffle rewrite —
    per-row bucket expressions over inlined plane LITERALS + one explode,
    removing the crossJoin and the groupBy exchange — was implemented,
    proven bit-identical, and measured 1.5-2.5x SLOWER in back-to-back
    worktree A/B (q121 2.45x, q52 1.81x, q140 1.66x, q91 1.49x; control
    q26 1.09x). The broadcast-join shape pipelines the plane arrays BY
    REFERENCE into the interpreted HOF dot, while 32 literal-array
    expressions per row re-evaluate inside one giant projection; and the
    exchange this would remove carries only (id, table, bucket) tag
    metadata — ~24 bytes x n_tables per vector, never the vectors — so
    the scale upside was small. The groupBy bit-pack stays."""
    bit = F.when(dot(F.col(vec_col), F.col("__plane")) >= 0, F.col("__w")).otherwise(
        F.lit(0)
    )
    return (
        df.select(F.col(id_col).alias("__id"), F.col(vec_col))
        .crossJoin(F.broadcast(plane_df))
        .select("__id", "__table", bit.alias("__bit"))
        .groupBy("__id", "__table")
        .agg(F.sum("__bit").alias("__bucket"))
    )


def hyperplane_query_candidates(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
    dim: int,
    n_tables: int = 8,
    n_planes: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Cross-set sign-LSH candidates: (query_id, id) pairs whose vectors
    share a hyperplane bucket in ANY table — the scale path for k-NN /
    similarity against a LARGE query set, where broadcasting the queries
    (``cosine_topk``/``knn_classify`` contract) is impossible.

    Both sides are bucketed with the SAME deterministic plane literals
    (``hyperplane_planes``), so candidates come from an ordinary shuffled
    equi-join on (table, bucket) — linear in collisions, never
    |corpus| x |queries|, AQE-skew-splittable, and SQL-expressible for the
    oracle. Self-pairs are kept only when the id namespaces differ
    (mirrors ``knn_classify``'s leave-self-out rule).

    Feed to ``knn_classify(candidates=...)`` or
    ``embedding_near_dups(candidates=...)`` for exact scoring.
    """
    qid = query_id_col or id_col
    plane_df = _plane_df(corpus.sparkSession, dim, n_tables, n_planes, seed)
    ct = _hyperplane_tagged(corpus, id_col, vec_col, plane_df)
    qt = _hyperplane_tagged(queries, qid, vec_col, plane_df).select(
        F.col("__id").alias("__qid"),
        F.col("__table").alias("__qtable"),
        F.col("__bucket").alias("__qbucket"),
    )
    pairs = ct.join(
        qt,
        (F.col("__table") == F.col("__qtable"))
        & (F.col("__bucket") == F.col("__qbucket")),
    )
    if query_id_col is None:
        pairs = pairs.filter(F.col("__id") != F.col("__qid"))
    return pairs.select(
        F.col("__qid").alias("query_id"), F.col("__id").alias(id_col)
    ).distinct()


def hyperplane_candidates(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    n_tables: int = 8,
    n_planes: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Sub-quadratic near-duplicate candidate pairs via sign-random-
    projection LSH (SimHash-for-vectors, Charikar STOC'02).

    Each vector gets one bucket id per table: ``n_planes`` sign bits of
    dot(v, plane) packed into an int. Candidates are pairs sharing a bucket
    in ANY table — generated by exploding (table, bucket) tags and
    equi-joining on them, so cost is sum of bucket-collision squares, never
    |corpus|^2, and the join is an ordinary shuffled hash join Catalyst/AQE
    can also skew-split. Planes are deterministic literals
    (``hyperplane_planes``), making the whole pipeline SQL-expressible:
    P(same bucket) = (1 - theta/pi)^n_planes per table, recall tuned by
    ``n_tables`` (more tables) and ``n_planes`` (fewer planes).

    Feed the output to ``ops.dedup.embedding_near_dups(candidates=...)`` for
    exact scoring of candidates only.

    Implementation note: the planes live in a 48-row broadcast DataFrame
    (table, bit weight, plane), NOT as inline array literals — a literal
    tree of n_tables x n_planes x dim constants measured 10x slower end to
    end purely from driver-side plan handling. One broadcast nested-loop
    over the tiny plane table computes dot signs, a (id, table) groupBy
    bit-packs the bucket ids (map-side combined), and the bucket self-join
    is an equi-join on (table, bucket).
    """
    plane_df = _plane_df(vectors.sparkSession, dim, n_tables, n_planes, seed)
    # r12 opt: both self-join sides reference the tag table — materialize
    # it once instead of re-running the n_tables x n_planes dot-product
    # pass over the full vector column per side. (id, table, bucket)
    # metadata rows only.
    tagged = _hyperplane_tagged(vectors, id_col, vec_col, plane_df).transform(materialize_once)
    a = tagged.alias("a")
    b = tagged.alias("b")
    return (
        a.join(
            b,
            (F.col("a.__table") == F.col("b.__table"))
            & (F.col("a.__bucket") == F.col("b.__bucket"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 0.5,
    num_hash_tables: int = 3,
    round_to: Optional[int] = 4,
) -> DataFrame:
    """Approximate top-k via random-hyperplane bucketing.

    Unit-normalizes both sides (so L2 distance is monotone in cosine), LSH-
    buckets with ``BucketedRandomProjectionLSH``, scores only candidate
    pairs from ``approxSimilarityJoin``, then ranks per query. Recall is
    tunable via ``num_hash_tables`` / ``bucket_length``.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    def unit(df: DataFrame, out: str) -> DataFrame:
        v = F.col(vec_col)
        n = l2_norm(v)
        arr = F.zip_with(v, v, lambda x, _: x.cast("double"))  # cast to array<double>
        unit_arr = F.transform(arr, lambda x: F.try_divide(x, n))
        return df.withColumn(out, array_to_vector(unit_arr))

    c = unit(corpus.select(id_col, vec_col), "__uv")
    q = unit(queries.select(F.col(id_col).alias("query_id"), F.col(vec_col)), "__uv")
    lsh = BucketedRandomProjectionLSH(
        inputCol="__uv", outputCol="__sig", bucketLength=bucket_length,
        numHashTables=num_hash_tables, seed=42,
    )
    model = lsh.fit(c)
    # L2 distance on unit vectors: d^2 = 2 - 2*cos  ->  d <= 2 covers all
    pairs = model.approxSimilarityJoin(c, q, 2.0, distCol="__d")
    sim = 1 - F.col("__d") * F.col("__d") / 2
    if round_to is not None:
        sim = F.round(sim, round_to)
    scored = pairs.select(
        F.col("datasetB.query_id").alias("query_id"),
        F.col(f"datasetA.{id_col}").alias(id_col),
        sim.alias("cosine_sim"),
    ).filter(F.col(id_col) != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine_sim", "rank")
    )


@dataclass
class IvfIndex:
    """A fitted IVF index: cell-assigned corpus + tiny centroid table.

    ``assigned`` is the corpus with its ``__cell`` column — in a real
    deployment write it out partitioned/bucketed by ``__cell`` (so probes
    become partition-pruned scans) and reuse it across query batches;
    ``centroids`` is n_clusters rows, always broadcast-sized.
    """

    assigned: DataFrame  # id_col, vec_col, __cell
    centroids: DataFrame  # __cell, __centroid
    id_col: str
    vec_col: str


def fit_ivf(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    seed: int = 42,
) -> IvfIndex:
    """Fit the IVF index ONCE: KMeans over the corpus, cells assigned in a
    single scan. Split from ``ivf_search`` so the (expensive, iterative)
    KMeans fit is not re-run per query batch — fit once, persist
    ``index.assigned``, search many times.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = corpus.select(id_col, vec_col).withColumn(
        "__v", array_to_vector(F.zip_with(vec_col, vec_col, lambda x, _: x.cast("double")))
    )
    km = KMeans(k=n_clusters, seed=seed, featuresCol="__v", predictionCol="__cell")
    model = km.fit(c)
    assigned = model.transform(c).select(id_col, vec_col, "__cell")

    # centroid table is n_clusters rows -> literal frame, broadcast join
    spark = corpus.sparkSession
    cent_rows = [(i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())]
    centroids = spark.createDataFrame(cent_rows, ["__cell", "__centroid"])
    return IvfIndex(assigned=assigned, centroids=centroids, id_col=id_col, vec_col=vec_col)


def fit_ivf_deterministic(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    n_clusters: int = 16,
    seed: int = 42,
    scale: int = 10**7,
) -> IvfIndex:
    """Fit an IVF index with a DETERMINISTIC coarse quantizer: cells are
    one table of ``ceil(log2 n_clusters)`` seeded sign-LSH planes
    (2^p disjoint cells from literal constants), centroids are the
    per-cell element-wise means on an exact integer grid
    (``floor(x*scale+0.5)`` summed as BIGINTs, ONE double division at
    the end — order-independent, so bit-identical on any engine/
    partitioning). Returns the same ``IvfIndex`` ``ivf_search`` probes.

    vs ``fit_ivf`` (Spark-ML KMeans): KMeans centroids adapt to data
    geometry (better recall per probe budget) but the fit is iterative
    and engine-private — any SQL oracle is rows-only. This quantizer
    trades some recall for full reproducibility: cells, centroids, probe
    ranking, and scores are all SQL-expressible (q33 carries a value
    oracle on it). Same search-time shape either way: the centroid table
    is <= 2^p rows (always broadcast), candidates are a cell equi-join.

    Caveat at extreme scale: a cell's per-dimension quantized sum must
    stay under 2^53 for the double division to be exact — at |x|<=1 and
    scale=1e7 that is ~9e8 vectors per cell; raise ``n_clusters`` (or
    lower ``scale``) past that."""
    n_planes = max(1, (int(n_clusters) - 1).bit_length())
    plane_df = _plane_df(corpus.sparkSession, dim, 1, n_planes, seed)
    tagged = _hyperplane_tagged(corpus, id_col, vec_col, plane_df)
    assigned = corpus.select(id_col, vec_col).join(
        tagged.select(F.col("__id").alias(id_col), F.col("__bucket").alias("__cell")),
        id_col,
    )
    e = assigned.select("__cell", F.posexplode(vec_col).alias("__dim", "__x"))
    qz = F.floor(F.col("__x").cast("double") * scale + F.lit(0.5)).cast("long")
    cent_long = (
        e.withColumn("__q", qz)
        .groupBy("__cell", "__dim")
        .agg(F.count(F.lit(1)).alias("__n"), F.sum("__q").alias("__qs"))
        .withColumn(
            "__c",
            F.col("__qs").cast("double") / (F.lit(float(scale)) * F.col("__n")),
        )
    )
    centroids = (
        cent_long.groupBy("__cell")
        .agg(F.array_sort(F.collect_list(F.struct("__dim", "__c"))).alias("__dc"))
        .select(
            "__cell",
            F.transform("__dc", lambda s: s["__c"]).alias("__centroid"),
        )
    )
    return IvfIndex(
        assigned=assigned, centroids=centroids, id_col=id_col, vec_col=vec_col
    )


def ivf_search(
    index: IvfIndex,
    queries: DataFrame,
    *,
    k: int = 10,
    n_probe: int = 4,
    query_id_col: Optional[str] = None,
    round_to: Optional[int] = 4,
) -> DataFrame:
    """Probe a fitted IVF index: each query scores only the corpus rows in
    its ``n_probe`` nearest cells. The candidate join is an equi-join on the
    cell id, so Catalyst shuffles/broadcasts it like any other key join;
    recall is tuned by ``n_probe`` (``n_probe == n_clusters`` degenerates to
    exact search)."""
    id_col, vec_col = index.id_col, index.vec_col
    qid = query_id_col or id_col
    q = queries.select(F.col(qid).alias("query_id"), F.col(vec_col).alias("__qv"))
    q_cells = (
        q.crossJoin(F.broadcast(index.centroids))
        .withColumn("__d", cosine_similarity(F.col("__qv"), F.col("__centroid")))
        .withColumn(
            "__cell_rank",
            F.row_number().over(Window.partitionBy("query_id").orderBy(F.desc("__d"), F.col("__cell"))),
        )
        .filter(F.col("__cell_rank") <= n_probe)
        .select("query_id", "__qv", "__cell")
    )

    pairs = index.assigned.join(F.broadcast(q_cells), "__cell")
    if query_id_col is None:
        # leave-self-out only when queries share the corpus id namespace
        # (see knn_classify) — a separate query id space makes an equal id
        # a coincidence, not the same vector.
        pairs = pairs.filter(F.col(id_col) != F.col("query_id"))
    sim = cosine_similarity(F.col("__qv"), F.col(vec_col))
    if round_to is not None:
        sim = F.round(sim, round_to)
    scored = pairs.select("query_id", id_col, sim.alias("cosine_sim"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine_sim", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    n_probe: int = 4,
    round_to: Optional[int] = 4,
    seed: int = 42,
) -> DataFrame:
    """One-shot convenience: ``fit_ivf`` + ``ivf_search``. For repeated
    query batches fit once and call ``ivf_search`` with the saved index."""
    index = fit_ivf(corpus, id_col=id_col, vec_col=vec_col, n_clusters=n_clusters, seed=seed)
    return ivf_search(index, queries, k=k, n_probe=n_probe, round_to=round_to)


_PCA_MOMENT_SCHEMA = "n long, s array<double>, g array<double>"


def pca_moments(df: DataFrame, vec_col: str = "embedding", *, fan_in: int = 256) -> DataFrame:
    """Reduce an embedding column to its (count, sum, Gram) moment row —
    the sufficient statistics for PCA — entirely Spark-side.

    Three levels, all Arrow-batched:

    1. per-partition partials via ``mapInPandas`` (one row per input
       partition, d + d^2 doubles each);
    2. partials grouped by ``spark_partition_id() % fan_in`` and summed
       with numpy in ``applyInPandas`` (<= fan_in rows survive, each
       combine task holds ~P/fan_in partials);
    3. a constant-key ``applyInPandas`` merges the <= fan_in rows to ONE.

    The driver never sees per-partition partials — at P input partitions
    and dimension d the old single-level collect shipped P*(d + d^2)
    doubles to the driver (~800 GB at P=1e5, d=1024); this ships d + d^2
    once. Level-2/3 shuffles carry <= P + fan_in tiny rows.

    Returns a DataFrame ``(n, s array<double>, g array<double>)`` with
    AT MOST one row (g row-major flattened). Empty input yields a 0-ROW
    frame, not an (n=0, [], []) row: both combine levels filter ``n > 0``
    and return empty frames, and an empty groupBy never invokes
    ``applyInPandas`` at all — callers must handle the 0-row case the way
    ``pca_fit`` does (raise or default), not index ``[0]`` blindly.
    """
    import numpy as np  # noqa: PLC0415

    def _partials(batches):
        import pandas as pd  # noqa: PLC0415

        n = 0
        s = None
        g = None
        for pdf in batches:
            x = np.asarray(pdf[vec_col].tolist(), dtype="float64")
            if x.size == 0:
                continue
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            g = x.T @ x if g is None else g + x.T @ x
        if n == 0:
            yield pd.DataFrame({"n": [], "s": [], "g": []})
            return
        yield pd.DataFrame(
            {"n": [n], "s": [s.tolist()], "g": [g.flatten().tolist()]}
        )

    def _combine(pdf):
        import pandas as pd  # noqa: PLC0415

        pdf = pdf[pdf["n"] > 0]
        if not len(pdf):
            return pd.DataFrame({"n": [], "s": [], "g": []})
        n = int(pdf["n"].sum())
        s = np.asarray(pdf["s"].tolist(), dtype="float64").sum(axis=0)
        g = np.asarray(pdf["g"].tolist(), dtype="float64").sum(axis=0)
        return pd.DataFrame({"n": [n], "s": [s.tolist()], "g": [g.tolist()]})

    parts = df.select(vec_col).mapInPandas(_partials, _PCA_MOMENT_SCHEMA)
    lvl1 = (
        parts.groupBy(
            F.pmod(F.spark_partition_id().cast("long"), F.lit(int(fan_in))).alias("__b")
        )
        .applyInPandas(lambda _, pdf: _combine(pdf), _PCA_MOMENT_SCHEMA)
    )
    one = (
        lvl1.groupBy(F.lit(0).alias("__b"))
        .applyInPandas(lambda _, pdf: _combine(pdf), _PCA_MOMENT_SCHEMA)
    )
    return one.select("n", "s", "g")


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    *,
    k: int = 8,
) -> tuple[list[float], list[list[float]], list[float]]:
    """Fit a PCA basis over an embedding column, distributed.

    The classic two-phase moment computation: every partition reduces to
    its (count, sum, Gram=X^T X) partials in one Arrow-batched
    ``mapInPandas`` pass (d x d doubles per partition, d = embedding dim),
    the partials tree-combine SPARK-SIDE down to one row (see
    ``pca_moments``), and the driver eigendecomposes the d x d covariance
    with numpy. Exactly one (count, sum, Gram) row ever reaches the
    driver — O(d^2) floats — however many input partitions exist; the
    corpus itself is touched exactly once regardless of size, which is
    how every distributed PCA (Spark MLlib included) scales.

    Sign convention: each component is flipped so its largest-magnitude
    coordinate is positive (eigenvector sign is otherwise arbitrary and
    would differ across BLAS builds).

    Returns ``(mean, components, explained_variance)`` — plain Python
    lists, ready to broadcast into ``pca_project``.
    """
    import numpy as np  # noqa: PLC0415

    parts = pca_moments(df, vec_col).collect()
    if not parts or not parts[0]["n"]:
        raise ValueError("pca_fit: empty input")
    assert len(parts) == 1, "pca_moments contract: at most one combined row"
    n = int(parts[0]["n"])
    d = len(parts[0]["s"])
    s = np.asarray(parts[0]["s"])
    g = np.asarray(parts[0]["g"]).reshape(d, d)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = []
    ev = []
    for i in order:
        v = evecs[:, i]
        if v[np.argmax(np.abs(v))] < 0:
            v = -v
        comps.append(v.tolist())
        ev.append(float(evals[i]))
    return mean.tolist(), comps, ev


def pca_project(
    df: DataFrame,
    mean: Sequence[float],
    components: Sequence[Sequence[float]],
    vec_col: str = "embedding",
    *,
    out_col: str = "pca",
    round_to: int = 6,
) -> DataFrame:
    """Project embeddings onto a fitted PCA basis (``pca_fit`` output).

    The basis enters the plan as literal arrays, so the projection is pure
    Column math — one ``zip_with``/``aggregate`` dot per component inside
    whole-stage codegen, zero shuffle, zero Python. Rounded so downstream
    comparisons are stable.
    """
    centered = F.zip_with(
        F.col(vec_col),
        F.array(*[F.lit(float(m)) for m in mean]),
        lambda x, m: x.cast("double") - m,
    )
    bound = df.withColumn("__centered", centered)
    projs = [
        F.round(
            dot(F.col("__centered"), F.array(*[F.lit(float(c)) for c in comp])), round_to
        )
        for comp in components
    ]
    return bound.withColumn(out_col, F.array(*projs)).drop("__centered")


def mmr_rerank(
    candidates: DataFrame,
    id_col: str,
    score_col: str,
    vec_col: str,
    *,
    k: int = 10,
    lambda_: float = 0.7,
    max_candidates: int = 10_000,
    exact_sims: bool = True,
    exact_sims_max: int = 512,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR'98): greedily pick ``k`` results maximizing
    ``λ·relevance − (1−λ)·max_similarity_to_already_picked`` — the
    standard diversification pass over a retrieval page, so ten near-dup
    hits don't fill the whole result list.

    CONTRACT: ``candidates`` is a RERANK PAGE, not a corpus — the top-N
    of an upstream retriever (BM25 / ANN), bounded by construction. MMR
    is inherently sequential (each pick conditions the next), so the
    page is collected to the driver and the k·|page| greedy loop runs
    driver-side; the collect is guarded by ``max_candidates`` and raises
    loudly on larger inputs instead of silently serializing a corpus.
    The heavy work (scoring the corpus down to the page) belongs to the
    upstream operator — that part is distributed.

    Deterministic ACROSS ENGINES with ``exact_sims=True`` (default):
    pairwise cosines compute Spark-side with the repo's left-fold
    ``dot``/``l2_norm`` Column ops — the exact IEEE op sequence a SQL
    oracle's ``list_reduce`` reproduces — and the greedy loop runs in
    pure Python floats (no BLAS: blocked SIMD accumulation orders are
    implementation-defined, which is why the old numpy path could never
    hash-match an oracle). Cost is page^2 fold evaluations AND a
    |page|^2/2-row pair collect into a both-directions driver dict, so
    the exact path carries its OWN, tighter cap: ``exact_sims_max``
    (default 512 -> <=131k collected pairs, ~MBs). Above it the call
    raises — a 10k page under ``max_candidates`` alone would collect
    ~50M pair rows / ~100M dict entries, multi-GB driver memory. For
    large pages pass ``exact_sims=False`` to use the numpy/BLAS path
    (collects only |page| rows, matmuls locally; same semantics,
    within-float-noise scores, not oracle-reproducible). ``mmr_score``
    publishes via floor(v*1e9+0.5)/1e9 — engine-neutral half-up, the
    q188 lesson. Ties broken by id ascending.

    Returns (id_col, mmr_rank, {score_col}, mmr_score).
    """
    if not 0.0 <= lambda_ <= 1.0:
        raise ValueError(f"lambda_ must be in [0, 1], got {lambda_}")
    n = candidates.count()
    if n > max_candidates:
        raise ValueError(
            f"mmr_rerank got {n} candidates > max_candidates={max_candidates}; "
            "MMR is a page reranker — cut the set with the upstream retriever "
            "or raise max_candidates explicitly"
        )
    if exact_sims and n > exact_sims_max:
        raise ValueError(
            f"mmr_rerank got {n} candidates > exact_sims_max={exact_sims_max}: "
            "the exact-sims path collects |page|^2/2 pairwise cosines to the "
            "driver, which is multi-GB at thousands of candidates. Pass "
            "exact_sims=False (numpy path, collects |page| rows) or raise "
            "exact_sims_max explicitly for a deliberately larger exact page"
        )
    import math

    import numpy as np

    spark = candidates.sparkSession
    out_schema = f"{id_col} long, mmr_rank long, {score_col} double, mmr_score double"
    if n == 0:
        return candidates.select(
            F.col(id_col),
            F.lit(0).cast("long").alias("mmr_rank"),
            F.col(score_col),
            F.lit(0.0).alias("mmr_score"),
        ).limit(0)

    if exact_sims:
        pg = candidates.select(
            F.col(id_col).alias("__id"),
            F.col(score_col).cast("double").alias("__rel"),
            F.col(vec_col).alias("__v"),
            l2_norm(F.col(vec_col)).alias("__n"),
        ).transform(materialize_once)
        rows = pg.select("__id", "__rel").orderBy("__id").collect()
        ids = [r["__id"] for r in rows]
        rel = {r["__id"]: float(r["__rel"]) for r in rows}
        a = pg.select(
            F.col("__id").alias("ia"), F.col("__v").alias("va"), F.col("__n").alias("na")
        )
        b = pg.select(
            F.col("__id").alias("ib"), F.col("__v").alias("vb"), F.col("__n").alias("nb")
        )
        # bounded-page BNLJ (the documented exception class): |page|^2
        # pairs, guarded by max_candidates above
        pairs = (
            a.crossJoin(F.broadcast(b))
            .filter(F.col("ia") < F.col("ib"))
            .select(
                "ia",
                "ib",
                F.try_divide(
                    dot(F.col("va"), F.col("vb")), F.col("na") * F.col("nb")
                ).alias("s"),
            )
        )
        sims: dict = {}
        for r in pairs.collect():
            sv = float(r["s"]) if r["s"] is not None else 0.0
            sims[(r["ia"], r["ib"])] = sv
            sims[(r["ib"], r["ia"])] = sv
        k = min(k, len(ids))
        lam = float(lambda_)
        oml = 1.0 - lam
        max_sim = {i: 0.0 for i in ids}
        avail = set(ids)
        out = []
        for rank in range(1, k + 1):
            best = None
            best_sc = None
            for i in ids:  # ascending id order -> ties pick smallest id
                if i not in avail:
                    continue
                sc = lam * rel[i] - oml * max_sim[i]
                if best is None or sc > best_sc:
                    best, best_sc = i, sc
            out.append(
                (
                    best,
                    rank,
                    rel[best],
                    math.floor(best_sc * 1e9 + 0.5) / 1e9,
                )
            )
            avail.discard(best)
            for i in ids:
                sv = sims.get((i, best), 0.0)
                if sv > max_sim[i]:
                    max_sim[i] = sv
        return spark.createDataFrame(out, out_schema)

    rows = (
        candidates.select(id_col, score_col, vec_col)
        .orderBy(F.asc(id_col))
        .collect()
    )
    ids = [r[0] for r in rows]
    rel_arr = np.array([float(r[1]) for r in rows])
    vecs = np.array([r[2] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0.0] = 1.0
    unit = vecs / norms[:, None]
    sims_m = unit @ unit.T
    k = min(k, len(ids))
    max_sim_a = np.zeros(len(ids))
    out = []
    avail_m = np.ones(len(ids), dtype=bool)
    for rank in range(1, k + 1):
        mmr = lambda_ * rel_arr - (1.0 - lambda_) * max_sim_a
        mmr[~avail_m] = -np.inf
        best = int(np.argmax(mmr))  # ties: first index = smallest id (sorted)
        out.append(
            (
                ids[best],
                rank,
                float(rel_arr[best]),
                math.floor(float(mmr[best]) * 1e9 + 0.5) / 1e9,
            )
        )
        avail_m[best] = False
        max_sim_a = np.maximum(max_sim_a, sims_m[best])
    return spark.createDataFrame(out, out_schema)


def centroid_similarity(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    *,
    scale: int = 10**6,
    round_to: int = 6,
) -> DataFrame:
    """Pairwise cosine similarity between per-label centroids — the
    class-confusability matrix an embedding-quality audit reads (two
    labels whose centroids sit at cos > 0.9 are candidates for merging
    or for label-noise review).

    Built on ``label_centroids`` (exact integer-grid component sums), so
    the centroid itself is deterministic; each centroid component then
    re-snaps to a ``1/scale`` grid and the dot/norm accumulations run on
    BIGINT (64 dims x (1e6)^2 = ~6.4e13 << 2^63 — exact, order-free).
    Only the final ``dot / (|a| * |b|)`` touches floating point, as one
    fixed expression over exact integers (sqrt is IEEE
    correctly-rounded, so engines agree).

    Scale posture: the |labels| x dim centroid table is tiny — the
    pairing is a broadcast self-join on ``dim``, and the quadratic term
    is |labels|^2, never |vectors|^2.

    Output: ``(label_a, label_b, n_a, n_b, cos_sim)`` for label_a <
    label_b.
    """
    cents = label_centroids(df, label_col, vec_col, scale=scale * 10, round_to=9)
    cq = cents.select(
        F.col(label_col).alias("lbl"),
        "dim",
        "n_vecs",
        F.floor(F.col("centroid").cast("double") * scale + F.lit(0.5))
        .cast("bigint")
        .alias("cq"),
    )
    a = cq.select(
        F.col("lbl").alias("label_a"),
        "dim",
        F.col("n_vecs").alias("n_a"),
        F.col("cq").alias("ca"),
    )
    b = cq.select(
        F.col("lbl").alias("label_b"),
        "dim",
        F.col("n_vecs").alias("n_b"),
        F.col("cq").alias("cb"),
    )
    pairs = a.join(F.broadcast(b), "dim").filter(F.col("label_a") < F.col("label_b"))
    agg = pairs.groupBy("label_a", "label_b").agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.sum(F.col("ca") * F.col("cb")).alias("__dot"),
        F.sum(F.col("ca") * F.col("ca")).alias("__na"),
        F.sum(F.col("cb") * F.col("cb")).alias("__nb"),
    )
    return agg.select(
        "label_a",
        "label_b",
        "n_a",
        "n_b",
        F.round(
            F.col("__dot").cast("double")
            / (
                F.sqrt(F.col("__na").cast("double"))
                * F.sqrt(F.col("__nb").cast("double"))
            ),
            round_to,
        ).alias("cos_sim"),
    )


def rrf_fuse(
    rankings: Sequence[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    *,
    k: int = 60,
    top: int = 10,
    scale: int = 10**12,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
    merge N retrieval rankings into one by summing ``1 / (k + rank)``
    per document. The standard hybrid-retrieval combiner (lexical BM25 +
    dense ANN) in RAG / training-data retrieval stacks — rank-based, so
    incomparable score scales never need calibrating.

    Determinism: the reciprocal is computed in SCALED INTEGER units,
    ``scale div (k + rank)`` (BIGINT floor division — identical on any
    engine), so the fused score is an exact integer sum; no float
    accumulation, ties broken by id. With the default ``scale=1e12`` and
    ``k=60`` the integer truncation perturbs a contribution by < 1e-12
    relative — far below any rank-1 vs rank-2 gap of the 1/(60+r) curve.

    Scale posture: inputs are top-k lists (bounded, typically <= 1000
    rows per query source), so the union + groupBy is tiny; the final
    ordering is an ``orderBy().limit()`` — TakeOrderedAndProject, no
    global sort — and the rank stamp windows over <= ``top`` rows.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    contrib = F.expr(f"CAST({scale} AS BIGINT) div ({k} + CAST({rank_col} AS BIGINT))")
    tagged = None
    for r in rankings:
        part = r.select(F.col(id_col).alias("__id"), contrib.alias("__c"))
        tagged = part if tagged is None else tagged.unionByName(part)
    fused = (
        tagged.groupBy("__id")
        .agg(
            F.sum("__c").cast("bigint").alias("rrf_scaled"),
            F.count(F.lit(1)).cast("bigint").alias("n_sources"),
        )
        .orderBy(F.desc("rrf_scaled"), F.asc("__id"))
        .limit(top)
    )
    w = Window.orderBy(F.desc("rrf_scaled"), F.asc("__id"))
    return fused.withColumn("fused_rank", F.row_number().over(w).cast("bigint")).select(
        F.col("__id").alias(id_col), "fused_rank", "rrf_scaled", "n_sources"
    )


def mmd2_quadratic(
    df: DataFrame,
    group_col: str,
    vec_col: str,
    *,
    dim: int,
    quant: int = 1_000_000,
    scale: int = 1_000_000_000_000,
) -> DataFrame:
    """Pairwise quadratic-kernel Maximum Mean Discrepancy between the
    embedding DISTRIBUTIONS of every group pair (Gretton et al., JMLR
    2012) — distribution-level drift for embedding columns, the
    second-moment upgrade of q252's norm health profile.

    Why this kernel: with k(x,y) = (x . y)^2 the (biased, V-statistic)
    MMD^2 collapses to ``||M_A - M_B||_F^2`` over the per-group
    second-moment matrices M = E[x x^T] — so the WHOLE statistic comes
    from ONE pass of per-group moment sums and NEVER touches a pair of
    rows. At 100 TB that is the difference between a linear moment
    aggregation and an impossible all-pairs kernel sum; RBF-kernel MMD
    has no such closed form (and exp() is libm-unportable anyway).

    Engine-exactness: vectors quantize onto the 1e-6 lattice (exact
    BIGINT products summed in decimal(38,0) — exact below 2^53 per
    cell, correctly-rounded and still deterministic beyond); each of
    the d^2 cells then contributes the MIRRORED IEEE tree
    ``floor((Sx/nx - Sy/ny)^2 / quant^2-lattice + 0.5)`` — per-cell
    integer floors (the q292 discipline), summed exactly, so group
    order and partitioning cannot move the hash.

    Scale posture: one flatMap-style explode of the d^2 outer product
    (linear in N*d^2) into a map-side-combined groupBy onto the
    |groups| x d^2 moment grid; the pair join runs on the tiny grid.

    Output: per group pair (g_a < g_b) — ``g_a, g_b, n_a, n_b,
    mmd2_x1e12`` (the x1e12 lattice is on ORIGINAL value units).
    """
    q = float(quant)
    vq = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(q) + F.lit(0.5)).cast(
            "bigint"
        ),
    )
    base = (
        df.filter(
            F.col(vec_col).isNotNull()
            & (F.size(vec_col) == dim)
            & F.col(group_col).isNotNull()
        )
        .select(F.col(group_col).alias("__g"), vq.alias("__vq"))
    )
    outer = F.flatten(
        F.transform(
            F.col("__vq"),
            lambda x, i: F.transform(
                F.col("__vq"),
                lambda y, j: F.struct(
                    i.alias("i"), j.alias("j"), (x * y).alias("p")
                ),
            ),
        )
    )
    cells = (
        base.select("__g", F.explode(outer).alias("__c"))
        .groupBy(
            "__g", F.col("__c.i").alias("i"), F.col("__c.j").alias("j")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("__c.p").cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .alias("s"),
        )
        # both sides of the pair join consume this |groups| x d^2 grid;
        # checkpoint so the N*d^2 moment pass runs ONCE, not twice
        .transform(materialize_once)
    )
    a = cells.select(
        F.col("__g").alias("g_a"),
        "i",
        "j",
        F.col("n").alias("n_a"),
        F.col("s").alias("__sa"),
    )
    b = cells.select(
        F.col("__g").alias("g_b"),
        "i",
        "j",
        F.col("n").alias("n_b"),
        F.col("s").alias("__sb"),
    )
    dm = (
        F.col("__sa").cast("double") / F.col("n_a").cast("double")
        - F.col("__sb").cast("double") / F.col("n_b").cast("double")
    )
    # per-cell sums live on the q^2 product lattice, so dm^2 is on q^4;
    # dividing by q^4/scale lands the published term on ORIGINAL units
    # x `scale` exactly
    lattice = q * q * q * q / float(scale)
    term = F.floor(dm * dm / F.lit(lattice) + F.lit(0.5)).cast("bigint")
    return (
        a.join(b, ["i", "j"])
        .filter(F.col("g_a") < F.col("g_b"))
        .groupBy("g_a", "g_b")
        .agg(
            F.max("n_a").cast("bigint").alias("n_a"),
            F.max("n_b").cast("bigint").alias("n_b"),
            F.sum(term).cast("bigint").alias("mmd2_x1e12"),
        )
    )


def mrr_from_pages(
    pages: DataFrame,
    qid_col: str,
    rank_col: str,
    rel_col: str,
    *,
    scale: int = 1_000_000_000_000,
) -> DataFrame:
    """Mean Reciprocal Rank from per-query ranked pages (Voorhees,
    TREC-8 1999) — the first-relevant-position member of the retrieval
    scorecard (q197 RRF, q276 NDCG): per query, the reciprocal of the
    FIRST relevant rank; queries whose page holds no relevant doc
    contribute 0 (standard MRR convention, counted via the NULL
    ``first_rel_rank``).

    Fully exact: reciprocals are scaled-integer floor divisions
    ``scale div rank`` (the q197 RRF trick) and the mean is ONE exact
    integer division by the query count — BIGINT end-to-end, zero IEEE.

    Scale posture: pages are bounded top-k lists (|queries| * k rows);
    everything here is grid-sized arithmetic with a broadcast 1-row
    summary.

    Output: one row per query — ``qid, first_rel_rank (NULL = no
    relevant doc on the page), rr_x1e12`` — plus the constant
    ``mrr_x1e12`` column (the mean over ALL queries).
    """
    per = (
        pages.select(
            F.col(qid_col).alias("qid"),
            F.col(rank_col).cast("bigint").alias("__rank"),
            F.col(rel_col).cast("boolean").alias("__rel"),
        )
        .groupBy("qid")
        .agg(
            F.min(F.when(F.col("__rel"), F.col("__rank")))
            .cast("bigint")
            .alias("first_rel_rank")
        )
    )
    rr = per.select(
        "qid",
        "first_rel_rank",
        F.when(F.col("first_rel_rank").isNull(), F.lit(0))
        .otherwise(
            F.expr(f"CAST({int(scale)} AS BIGINT) div first_rel_rank")
        )
        .cast("bigint")
        .alias("rr_x1e12"),
    )
    summ = rr.agg(
        F.expr(
            "CAST(CAST(COALESCE(SUM(rr_x1e12), 0) AS BIGINT)"
            " div COUNT(*) AS BIGINT)"
        ).alias("mrr_x1e12")
    )
    return rr.crossJoin(F.broadcast(summ)).orderBy("qid")


def map_recall_from_pages(
    pages: DataFrame,
    qid_col: str,
    rank_col: str,
    rel_col: str,
    total_rel: DataFrame,
    *,
    k: int = 10,
    scale: int = 1_000_000_000_000,
) -> DataFrame:
    """MAP@k and recall@k from per-query ranked pages (mean average
    precision; Buckley & Voorhees, SIGIR 2000) — the order-sensitive and
    coverage members of the retrieval scorecard, completing q349's MRR
    (first hit), q276's NDCG (graded gain), q197's RRF (fusion).

    Per query: ``AP@k = (1/k) * sum over relevant ranks r of P(r)``
    with ``P(r) = hits@r / r``, and ``recall@k = hits@k / R`` with R
    the corpus-wide relevant count (a 1-row broadcast, column
    ``n_rel_total``).  Fully exact: every precision is the scaled
    integer floor division ``scale*hits@r div r`` (the q349 idiom),
    AP divides the integer sum by k, the means divide by the query
    count — BIGINT end-to-end, zero IEEE.

    Scale posture: pages are bounded top-k lists; the cumulative-hits
    window partitions by query over <= k rows — grid-sized.

    Output: one row per query — ``qid, n_hits, ap_x1e12,
    recall_x1e12`` — plus the constant ``map_x1e12`` and
    ``mean_recall_x1e12`` columns (means over ALL queries).
    """
    from pyspark.sql import Window

    tagged = pages.select(
        F.col(qid_col).alias("qid"),
        F.col(rank_col).cast("bigint").alias("__rank"),
        F.col(rel_col).cast("boolean").alias("__rel"),
    ).withColumn(
        "__hits",
        F.sum(F.when(F.col("__rel"), 1).otherwise(0)).over(
            Window.partitionBy("qid")
            .orderBy(F.asc("__rank"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    term = F.when(
        F.col("__rel"),
        F.expr(f"CAST({int(scale)} AS BIGINT) * __hits div __rank"),
    ).otherwise(F.lit(0))
    per = tagged.groupBy("qid").agg(
        F.max("__hits").cast("bigint").alias("n_hits"),
        F.sum(term).cast("bigint").alias("__apsum"),
    )
    per = per.select(
        "qid",
        "n_hits",
        F.expr(f"CAST(__apsum div {int(k)} AS BIGINT)").alias("ap_x1e12"),
    )
    per = per.crossJoin(F.broadcast(total_rel)).select(
        "qid",
        "n_hits",
        "ap_x1e12",
        F.when(
            F.col("n_rel_total") <= 0, F.lit(None).cast("bigint")
        )
        .otherwise(
            F.expr(
                f"CAST({int(scale)} AS BIGINT) * n_hits div n_rel_total"
            ).cast("bigint")
        )
        .alias("recall_x1e12"),
    )
    summ = per.agg(
        F.expr(
            "CAST(CAST(COALESCE(SUM(ap_x1e12), 0) AS BIGINT)"
            " div COUNT(*) AS BIGINT)"
        ).alias("map_x1e12"),
        F.expr(
            "CAST(CAST(COALESCE(SUM(recall_x1e12), 0) AS BIGINT)"
            " div COUNT(*) AS BIGINT)"
        ).alias("mean_recall_x1e12"),
    )
    return per.crossJoin(F.broadcast(summ)).orderBy("qid")


def cluster_validity(
    assigned: DataFrame,
    cell_col: str,
    vec_col: str = "embedding",
    *,
    lattice: int = 1_000_000,
    scale: int = 1_000_000,
) -> DataFrame:
    """Calinski-Harabasz cluster-validity index (Calinski & Harabasz,
    Comm. Stat. 1974) over an existing cell/cluster assignment — the
    variance-ratio audit for the deterministic sign-LSH partitions the
    dedup/ANN stack runs on (q91 SemDeDup cells, q29/q33 buckets): is
    the between-cell scatter actually large relative to within-cell, or
    is the partition no better than noise?

        ``CH = (B / (k-1)) / (W / (N-k))``

    with W/B the within/between sums of squares.  Determinism: each
    vector component snaps to the declared integer lattice
    (``floor(x*1e6 + 0.5)``, the q88/q273 idiom) so all scatter
    moments are exact DECIMAL(38,0); per-(cell, dim) within terms and
    per-dim total terms are exact integer divisions
    ``(n*S2 - S1^2) div n`` (truncation < 1 lattice unit, identical on
    both engines), and ``B = SS_total - W`` exactly.  CH is ONE final
    IEEE tree.

    Scale posture: one posexplode + one (cell, dim) groupBy with
    map-side combine — the shuffle carries |cells| x dim rows, never
    the corpus; everything after is grid-sized.

    Output: one row — ``n_vecs, n_cells, ss_within, ss_between
    (lattice^2 units), ch_x1e6`` (NULL CH when k < 2, N <= k, or
    W <= 0).
    """
    dec = "decimal(38,0)"
    e = assigned.select(
        F.col(cell_col).alias("__cell"),
        F.posexplode(F.col(vec_col)).alias("__dim", "__x"),
    )
    q = F.floor(
        F.col("__x").cast("double") * F.lit(float(lattice)) + F.lit(0.5)
    ).cast(dec)
    per = (
        e.select("__cell", "__dim", q.alias("__q"))
        .groupBy("__cell", "__dim")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("__nc"),
            F.sum("__q").cast(dec).alias("__s1"),
            F.sum((F.col("__q") * F.col("__q")).cast(dec))
            .cast(dec)
            .alias("__s2"),
        )
    )
    w_cd = F.expr(
        "(CAST(__nc AS DECIMAL(38,0)) * __s2 - __s1 * __s1)"
        " div CAST(__nc AS DECIMAL(38,0))"
    ).cast(dec)
    within = per.agg(
        F.coalesce(F.sum(w_cd), F.lit(0).cast(dec)).alias("__w")
    )
    g = per.groupBy("__dim").agg(
        F.sum("__s1").cast(dec).alias("__t"),
        F.sum("__s2").cast(dec).alias("__s2t"),
        F.sum("__nc").cast("bigint").alias("__n"),
    )
    tot_d = F.expr(
        "(CAST(__n AS DECIMAL(38,0)) * __s2t - __t * __t)"
        " div CAST(__n AS DECIMAL(38,0))"
    ).cast(dec)
    sst = g.agg(
        F.coalesce(F.sum(tot_d), F.lit(0).cast(dec)).alias("__sst")
    )
    meta = assigned.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.countDistinct(F.col(cell_col)).cast("bigint").alias("n_cells"),
    )
    out = (
        meta.crossJoin(F.broadcast(within)).crossJoin(F.broadcast(sst))
    )
    b_ss = (F.col("__sst") - F.col("__w")).cast(dec)
    ch = (
        b_ss.cast("double") / (F.col("n_cells").cast("double") - F.lit(1.0))
    ) / (
        F.col("__w").cast("double")
        / (F.col("n_vecs").cast("double") - F.col("n_cells").cast("double"))
    )
    bad = (
        (F.col("n_cells") < 2)
        | (F.col("n_vecs") <= F.col("n_cells"))
        | (F.col("__w") <= F.lit(0).cast(dec))
    )
    return out.select(
        "n_vecs",
        "n_cells",
        F.col("__w").cast("bigint").alias("ss_within"),
        b_ss.cast("bigint").alias("ss_between"),
        F.when(bad, F.lit(None).cast("bigint"))
        .otherwise(
            F.floor(ch * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
        )
        .alias("ch_x1e6"),
    )
