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

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["dot", "l2_norm", "cosine_similarity", "cosine_topk", "lsh_ann_topk", "ivf_topk"]


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
) -> DataFrame:
    """Exact top-k nearest corpus vectors per query vector (cosine).

    ``queries`` is broadcast — it must be the small side. Self-matches
    (same id) are excluded when the id columns share a name. ``round_to``
    rounds the similarity before ranking so orderings are stable across
    engines/partitionings; ties break on corpus id.
    """
    qid = query_id_col or id_col
    q = queries.select(F.col(qid).alias("query_id"), F.col(vec_col).alias("__qv"))
    c = corpus.select(F.col(id_col), F.col(vec_col))
    pairs = c.crossJoin(F.broadcast(q)).filter(F.col(id_col) != F.col("query_id"))
    sim = cosine_similarity(F.col("__qv"), F.col(vec_col))
    if round_to is not None:
        sim = F.round(sim, round_to)
    pairs = pairs.select("query_id", id_col, sim.alias("cosine_sim"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.col(id_col))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine_sim", "rank")
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
    """IVF (inverted-file) approximate top-k: KMeans-partition the corpus,
    probe only the ``n_probe`` nearest cells per query.

    The scale shape: centroids are tiny (driver/broadcast), the corpus is
    scanned once to assign cells (then ideally written bucketed by cell),
    and each query scores only ~``n_probe/n_clusters`` of the corpus —
    the candidate join is an equi-join on the cell id, so Catalyst
    shuffles/broadcasts it like any other key join. Recall is tuned by
    ``n_probe``; ``n_probe == n_clusters`` degenerates to exact search.
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

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    q_cells = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("__d", cosine_similarity(F.col("__qv"), F.col("__centroid")))
        .withColumn(
            "__cell_rank",
            F.row_number().over(Window.partitionBy("query_id").orderBy(F.desc("__d"), F.col("__cell"))),
        )
        .filter(F.col("__cell_rank") <= n_probe)
        .select("query_id", "__qv", "__cell")
    )

    pairs = assigned.join(F.broadcast(q_cells), "__cell").filter(F.col(id_col) != F.col("query_id"))
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
