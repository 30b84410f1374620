"""Distributed connected components and dedup-cluster assignment.

Greenfield LLM-pipeline capability (no reference counterpart; SURVEY.md
§7.0). Near-dup detection (``ops.dedup``) emits *pairs*; an actual
deduplication pass needs *clusters* — the transitive closure of the pair
graph — and one survivor per cluster. This module closes that gap.

Algorithm: the alternating **large-star / small-star** method of Kiveris
et al., "Connected Components in MapReduce and Beyond" (ACM SoCC 2014) —
a public, shuffle-friendly algorithm that converges in O(log^2 n) rounds
on any graph (and 1-2 rounds on the tiny, dense clusters near-dup graphs
actually produce). No GraphFrames / graphx dependency: each phase is a
plain groupBy + join, so it inherits AQE, codegen, and tungsten for free.

Scale notes (100 TB posture):

* Each round is ONE groupBy (min over neighbors) + ONE equi-join, both
  hash-partitioned on node id — no global sort, no driver-side graph.
* The per-round convergence check is a 1-row aggregate (count + xor of
  ``xxhash64`` over edges) — a driver action per round is inherent to any
  fixed-point algorithm; rounds are O(log^2 n) bounded.
* ``localCheckpoint`` truncates the iterative lineage so the plan does not
  grow with rounds (re-derivable state would otherwise recompute the whole
  chain each action).
* Near-dup graphs are small relative to the corpus (edges exist only for
  near-duplicates), so this runs over the *pair table*, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["connected_components", "dedup_clusters"]


def _edge_checksum(edges: DataFrame) -> tuple[int, int]:
    """(count, order-independent xor-hash) of an edge set — one tiny action."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        # bit_xor: order-independent and can't overflow (a SUM of 64-bit
        # hashes overflows BIGINT almost immediately); edges are distinct,
        # so no duplicate self-cancellation either
        F.coalesce(F.bit_xor(F.xxhash64(F.col("src"), F.col("dst"))), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) + {u})."""
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = sym.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("__m")
    )
    return (
        sym.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("__m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges (big -> small); connect all small neighbors + self to the min."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).filter(F.col("src") != F.col("dst")).distinct()
    mins = oriented.groupBy("src").agg(F.min("dst").alias("__m"))
    nbrs = oriented.join(mins, "src").select(
        F.col("dst").alias("src"), F.col("__m").alias("dst")
    )
    selves = mins.select("src", F.col("__m").alias("dst"))
    return nbrs.union(selves).filter(F.col("src") != F.col("dst")).distinct()


def connected_components(
    pairs: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 25,
) -> DataFrame:
    """Connected components of an undirected pair graph.

    Returns ``(node, component)`` for every node that appears in ``pairs``,
    where ``component`` is the MINIMUM node id in the node's component (the
    canonical representative — deterministic, so oracle-able against a
    recursive-CTE min-reachable query). Isolated nodes never appear in a
    pair table; callers join back to the corpus and ``coalesce`` (see
    ``dedup_clusters``).

    Node ids must be orderable (int/long/string all work).
    """
    # Lazy checkpoints: the per-round checksum action is the thing that
    # materializes the round's edges, so each round costs ONE job, not two
    # (an eager checkpoint would run its own job first).
    edges = (
        pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    prev = _edge_checksum(edges)
    converged = False
    for _ in range(max_iter):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=False)
        cur = _edge_checksum(edges)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        # an unconverged edge set is NOT a star forest: the same node can
        # carry two component labels, and downstream joins fan out rows.
        # Refusing loudly beats silently corrupting a dedup pass.
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "alternating rounds; raise max_iter (components this deep are rare "
            "— alternation contracts diameter roughly logarithmically)"
        )
    # at the fixed point the edge set is a star forest: node -> component min
    comp = edges.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    roots = edges.select(F.col("dst").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return comp.union(roots).distinct()


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    *,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Assign every document a near-dup cluster id and survivor flag.

    ``pairs`` is any near-dup pair table (``ngram_jaccard_pairs``,
    ``minhash_candidates``, ``simhash_near_dups``, ``embedding_near_dups``
    output — anything with two id columns). The cluster id is the minimum
    doc id in the connected component; ``is_survivor`` marks the one kept
    document per cluster (and every singleton). Downstream dedup is then
    ``filter(is_survivor)`` — or group by ``cluster_id`` to pick survivors
    under a different policy (longest doc, highest quality, ...).

    The component join is on ids only (never text/payload columns), and the
    left join keeps singleton docs without a shuffle of the pair graph per
    doc — the pair/component side is small by construction.
    """
    comp = connected_components(pairs, src, dst, max_iter=max_iter)
    joined = docs.join(
        comp.withColumnRenamed("node", id_col), id_col, "left"
    )
    cluster = F.coalesce(F.col("component"), F.col(id_col))
    return joined.select(
        F.col(id_col),
        cluster.alias("cluster_id"),
        (cluster == F.col(id_col)).alias("is_survivor"),
    )
