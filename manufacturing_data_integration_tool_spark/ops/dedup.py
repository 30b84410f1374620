"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Greenfield LLM-pipeline capability (no reference counterpart; SURVEY.md
§7.0). Everything is pure Column expressions — no row-at-a-time Python
anywhere, and no pyspark.ml dependency (the banded MinHash is native
xxhash64 column math).

Scale notes (100 TB posture):

* exact dedup shuffles once on the dedup key (or content hash) — a plain
  hash partitioning that scales horizontally; representatives are picked
  with a per-key window, never a global sort.
* ``ngram_jaccard_pairs`` joins on exploded shingles. Hot shingles (stop
  phrases) blow up the join at scale, so shingles above a document-frequency
  cap are dropped first — standard candidate-pruning; AQE's skew-join
  handles residual imbalance.
* ``minhash_candidates`` is the scale path: banded MinHash signatures mean
  candidate generation is a bucket join (shuffle on band hash), never the
  all-pairs cross join.
* ``simhash_fingerprints`` reduces each doc to a 64-bit fingerprint with one
  explode + one groupBy — near-dup detection then joins on fingerprint (or
  rotated prefixes for Hamming distance ≤ k).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from ._materialize import materialize_once

__all__ = [
    "content_hash",
    "blocking_audit",
    "exact_dedup",
    "exact_dedup_by_content",
    "word_shingles",
    "shingles_from_tokens",
    "ngram_jaccard_pairs",
    "containment_pairs",
    "duplicate_span_coverage",
    "minhash_signatures",
    "minhash_band_tags",
    "minhash_candidates",
    "simhash_fingerprints",
    "simhash_near_dups",
    "embedding_near_dups",
    "semantic_dedup",
    "fuzzy_key_pairs",
    "soundex_code",
    "phonetic_key_pairs",
    "incremental_dedup",
    "segment_dedup",
    "source_overlap_matrix",
    "prefix_filtered_jaccard",
    "sorted_neighborhood_pairs",
]


def content_hash(col: Column | str, algo: str = "md5") -> Column:
    """Deterministic content fingerprint of a string column.

    ``md5``/``sha2`` travel well across engines (hex strings); ``xxhash64``
    is the cheap 64-bit JVM-side choice for pure-Spark dedup at scale.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = c.cast("string")
    if algo == "md5":
        return F.md5(c)
    if algo == "sha2":
        return F.sha2(c, 256)
    if algo == "xxhash64":
        return F.xxhash64(c)
    raise ValueError(f"unknown hash algo: {algo}")


def exact_dedup(
    df: DataFrame,
    keys: Sequence[str],
    *,
    tie_break: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Keep exactly one row per key combination.

    With ``tie_break`` columns the survivor is deterministic (first row by
    that ordering); without, this is ``dropDuplicates`` (arbitrary survivor,
    cheapest plan — partial aggregation map-side).
    """
    if not tie_break:
        return df.dropDuplicates(list(keys))
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*[F.col(c) for c in tie_break])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_dedup_by_content(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    algo: str = "md5",
) -> DataFrame:
    """Group rows by content hash; one output row per distinct content with
    the smallest id as representative and the group size.

    The groupBy shuffles on the hash — uniformly distributed by
    construction, so no skew even when the id or source columns are skewed.
    """
    h = content_hash(F.col(text_col), algo).alias("content_hash")
    return (
        df.select(h, F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def shingles_from_tokens(tok_col: Column | str, n: int = 3) -> Column:
    """Distinct word n-grams from an ALREADY-MATERIALIZED token-array column.

    The token column must be a bound attribute (i.e. produced by a prior
    ``select``/``withColumn``), not an inline expression: Spark does not
    common-subexpression-eliminate inside higher-order-function lambdas, so
    an inline token expression gets re-evaluated per element_at call —
    measured 20x slower at 260k grams.
    """
    toks = F.col(tok_col) if isinstance(tok_col, str) else tok_col
    k = F.size(toks) - F.lit(n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    return F.array_distinct(F.when(k > 0, grams).otherwise(F.array().cast("array<string>")))


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-grams of a lowercased raw-text column.

    Convenience form for tests/small frames. Hot paths should tokenize into
    a real column first and use ``shingles_from_tokens`` (see note there).
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != F.lit(""))
    k = F.size(toks) - F.lit(n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    return F.array_distinct(F.when(k > 0, grams).otherwise(F.array().cast("array<string>")))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: Optional[int | float] = None,
) -> DataFrame:
    """Candidate near-duplicate pairs with n-gram Jaccard >= threshold.

    Exact (set-based) Jaccard via an inverted-index join on shingles:
    explode distinct shingles, self-join on shingle, count intersections,
    then ``inter / (|A| + |B| - inter) >= t`` — evaluated with integer
    cross-multiplication so the comparison is exact (no float boundary).

    ``max_shingle_df`` drops shingles appearing in more than that many docs
    before the join — the standard hot-key guard at scale: a stop-phrase
    shingle with document frequency d contributes d^2 join rows, so ONE hot
    shingle at corpus scale is a quadratic blow-up. An ``int`` is an
    absolute cap; a ``float`` in (0, 1) is a corpus-relative cap
    ``max(1, floor(frac * n_docs))`` computed lazily (1-row aggregate
    broadcast back — no extra driver action). Production callers should
    always set this; set sizes are computed before the drop, so hot-shingle
    pruning only ever makes the threshold test stricter, never looser.
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit(""))
    base = df.select(F.col(id_col).alias("doc"), toks.alias("__tk")).select(
        "doc", shingles_from_tokens("__tk", n).alias("sh")
    )
    # join on the 64-bit shingle hash, not the string: long-key hash joins
    # beat string-key sort-merge by a wide margin, and xxhash64 collisions
    # among realistic shingle cardinalities are ~2^-40-level noise.
    # explode_outer, not explode: plain explode infers a size(sh)>0 filter
    # that the optimizer pushes below the projection, re-inlining the whole
    # shingle expression (measured 5x slower); the null-filter afterwards is
    # on the generated output and cannot be pushed down.
    inv = (
        base.select("doc", F.explode_outer("sh").alias("shingle"))
        .filter(F.col("shingle").isNotNull())
        .select("doc", F.xxhash64("shingle").alias("sh_h"))
        # r12 opt: the inverted index is referenced up to FOUR times below
        # (sizes, document frequencies, both self-join sides) and each
        # reference otherwise re-runs tokenize + shingle + explode over the
        # full text column (q26's plan showed 8 parquet scans). Materialize
        # it once — it is (long, long) metadata rows, never text, so the
        # checkpoint is the guide-§8 "lightweight proxy" the rest of the
        # operator should work from.
        .transform(materialize_once)
    )
    # |shingle set| per doc from the (pre-filter) inverted index, not from a
    # second pass over `base`: shingles are already distinct, so the row
    # count per doc IS the set size, and deriving it here scans the wide
    # text column once less (a narrow shuffle on doc replaces a full
    # re-tokenize — the right trade when the text column dominates scan IO).
    # Checkpointed too (tiny: one row per doc): it feeds the n_docs cap
    # aggregate plus both endpoint-size joins.
    sizes = inv.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh")).transform(materialize_once)
    if max_shingle_df is not None:
        # boundary discipline: a float must be a relative fraction in
        # (0, 1] (1.0 = cap at n_docs, i.e. keep everything); an int must
        # be an absolute cap >= 1. Anything else (0, negatives, float 2.0)
        # is an error — silently disabling or over-tightening the guard is
        # how quadratic blow-ups sneak back in.
        if isinstance(max_shingle_df, float):
            if not 0.0 < max_shingle_df <= 1.0:
                raise ValueError(
                    f"float max_shingle_df must be in (0, 1], got {max_shingle_df}"
                )
        elif int(max_shingle_df) < 1:
            raise ValueError(f"int max_shingle_df must be >= 1, got {max_shingle_df}")
        dfreq = inv.groupBy("sh_h").agg(F.count(F.lit(1)).alias("df"))
        if isinstance(max_shingle_df, float):
            # corpus-relative cap without a driver-side count(): the 1-row
            # doc-count aggregate broadcasts into the filter lazily.
            n_docs = sizes.agg(F.count(F.lit(1)).alias("__n_docs"))
            cap = F.greatest(
                F.lit(1).cast("long"),
                F.floor(F.lit(max_shingle_df) * F.col("__n_docs")).cast("long"),
            )
            hot = dfreq.crossJoin(F.broadcast(n_docs)).filter(F.col("df") > cap).select("sh_h")
        else:
            hot = dfreq.filter(F.col("df") > int(max_shingle_df)).select("sh_h")
        inv = inv.join(F.broadcast(hot), "sh_h", "left_anti")
    a = inv.alias("a")
    b = inv.alias("b")
    inter = (
        a.join(b, (F.col("a.sh_h") == F.col("b.sh_h")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    # integer threshold test: inter/(na+nb-inter) >= p/q  <=>  q*inter >= p*(na+nb-inter)
    from fractions import Fraction

    frac = Fraction(threshold).limit_denominator(10_000)
    p, q = frac.numerator, frac.denominator
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(
            F.lit(q) * F.col("inter")
            >= F.lit(p) * (F.col("n_a") + F.col("n_b") - F.col("inter"))
        )
        .select(
            "doc_a",
            "doc_b",
            "inter",
            F.col("n_a"),
            F.col("n_b"),
        )
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 8,
    window: int = 4,
    threshold: float = 0.8,
    max_fp_df: Optional[int | float] = None,
) -> DataFrame:
    """Asymmetric near-duplicate pairs by winnowing-fingerprint CONTAINMENT.

    Jaccard misses the "doc A is a chunk of doc B" case: a page embedded in
    a 100x larger aggregation page has tiny Jaccard but containment ~1.
    Broder's containment c(A, B) = |F(A) & F(B)| / |F(A)| over winnowing
    fingerprints (Schleimer et al., SIGMOD'03) catches exactly that —
    the standard truncation/quotation/aggregator-page dedup signal.

    Mechanics mirror ``ngram_jaccard_pairs``: inverted-index equi-join on
    the fingerprint (never all-pairs), intersection counts per pair, then
    an integer cross-multiplied threshold test on BOTH directions — a pair
    is emitted when ``max(c(A,B), c(B,A)) >= threshold``. ``max_fp_df``
    is the same hot-key guard (absolute int cap, or corpus-relative float
    fraction) — boilerplate fingerprints shared by d docs contribute d^2
    join rows, so production callers should always set it.

    Returns (doc_a, doc_b, inter, n_a, n_b, containment_a, containment_b)
    with doc_a < doc_b; ``containment_a`` is the fraction of doc_a's
    fingerprints found in doc_b (so containment_a ~ 1.0 means A inside B).

    100 TB posture: one explode, one groupBy for set sizes, one long-key
    equi-join confined by the df cap — identical shuffle budget to the
    Jaccard path, and the fingerprint density (~2/(window+1) per char) is
    tunable with k/window before anything shuffles.
    """
    from .text import winnowing_fingerprints

    # r12 opt: same multi-reference materialization as ngram_jaccard_pairs —
    # fps feeds sizes, document frequencies and both self-join sides; each
    # reference otherwise re-runs the winnowing char-gram explode over the
    # full text column. (long, long) metadata rows only.
    fps = (
        winnowing_fingerprints(df, text_col, id_col, k=k, window=window)
        .select(F.col(id_col).alias("doc"), F.xxhash64("fp").alias("fp_h"))
        .transform(materialize_once)
    )
    sizes = fps.groupBy("doc").agg(F.count(F.lit(1)).alias("n_fp")).transform(materialize_once)
    if max_fp_df is not None:
        if isinstance(max_fp_df, float):
            if not 0.0 < max_fp_df <= 1.0:
                raise ValueError(f"float max_fp_df must be in (0, 1], got {max_fp_df}")
        elif int(max_fp_df) < 1:
            raise ValueError(f"int max_fp_df must be >= 1, got {max_fp_df}")
        dfreq = fps.groupBy("fp_h").agg(F.count(F.lit(1)).alias("df"))
        if isinstance(max_fp_df, float):
            n_docs = sizes.agg(F.count(F.lit(1)).alias("__n_docs"))
            cap = F.greatest(
                F.lit(1).cast("long"),
                F.floor(F.lit(max_fp_df) * F.col("__n_docs")).cast("long"),
            )
            hot = dfreq.crossJoin(F.broadcast(n_docs)).filter(F.col("df") > cap).select("fp_h")
        else:
            hot = dfreq.filter(F.col("df") > int(max_fp_df)).select("fp_h")
        fps = fps.join(F.broadcast(hot), "fp_h", "left_anti")
    a = fps.alias("a")
    b = fps.alias("b")
    inter = (
        a.join(b, (F.col("a.fp_h") == F.col("b.fp_h")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    from fractions import Fraction

    frac = Fraction(threshold).limit_denominator(10_000)
    p, q = frac.numerator, frac.denominator
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_fp").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_fp").alias("n_b"))
    # q*inter >= p*min(n_a, n_b)  <=>  max-direction containment >= p/q
    # (set sizes come from the PRE-cap index, so hot-fp pruning only ever
    # tightens the test — same discipline as ngram_jaccard_pairs).
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.lit(q) * F.col("inter") >= F.lit(p) * F.least("n_a", "n_b"))
        .select(
            "doc_a",
            "doc_b",
            "inter",
            "n_a",
            "n_b",
            F.round(F.col("inter") / F.col("n_a"), 6).alias("containment_a"),
            F.round(F.col("inter") / F.col("n_b"), 6).alias("containment_b"),
        )
    )


def _md5_lane(col: Column, salt: int, lane: int) -> Column:
    """One of four independent 32-bit hash lanes from md5(col || US || salt):
    hex chars [1+8*lane, 8+8*lane) parsed as an unsigned 32-bit value (fits
    a signed BIGINT). md5 is byte-identical in every engine, so a SQL
    oracle recomputes the exact value — the property xxhash64 lacks
    (DuckDB does not expose it)."""
    h = F.md5(F.concat(col, F.lit("\x1f" + str(salt))))
    return F.conv(F.substring(h, 1 + 8 * lane, 8), 16, 10).cast("long")


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    num_hashes: int = 48,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """MinHash signature per document: ``num_hashes`` permutations
    simulated as ``min(h_i(shingle))`` over the doc's distinct shingles —
    one explode + ONE groupBy shuffle on the doc id, everything integer
    JVM-side. Returns (doc, sig: array<bigint>).

    ``hash_family``:
    - ``"xxhash64"`` (default, production): ``h_i = xxhash64(shingle_hash,
      i)`` — the cheapest 64-bit family Spark ships, but engine-private.
    - ``"md5_32"`` (portable): four 32-bit lanes per ``md5(shingle || US ||
      salt)``, ``ceil(num_hashes/4)`` md5 calls per shingle. ~4x the hash
      cost of xxhash64 and a 32-bit range, but byte-identical in DuckDB /
      any SQL engine — the family that lets banded-LSH output carry a full
      value oracle (q27/q71). Same asymptotics: one explode, one groupBy.
    """
    if hash_family not in ("xxhash64", "md5_32"):
        raise ValueError(f"unknown hash_family {hash_family!r}")
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit(""))
    base = df.select(F.col(id_col).alias("doc"), toks.alias("__tk")).select(
        "doc", shingles_from_tokens("__tk", n).alias("sh")
    )
    inv = (
        base.select("doc", F.explode_outer("sh").alias("shingle"))
        .filter(F.col("shingle").isNotNull())
    )
    if hash_family == "xxhash64":
        inv = inv.select("doc", F.xxhash64("shingle").alias("sh_h"))
        aggs = [
            F.min(F.xxhash64(F.col("sh_h"), F.lit(i))).alias(f"__mh{i}")
            for i in range(num_hashes)
        ]
    else:
        # project each salt's digest ONCE, then aggregate over cheap
        # substring/conv lane extractions of the bound columns — Spark
        # does not CSE identical md5 subtrees across separate aggregate
        # expressions, so inlining _md5_lane in the aggs evaluated every
        # salt's md5 4x (measured ~25% slower on q27 at sf0.1)
        n_salts = (num_hashes + 3) // 4
        inv = inv.select(
            "doc",
            *[
                F.md5(F.concat(F.col("shingle"), F.lit("\x1f" + str(s)))).alias(
                    f"__d{s}"
                )
                for s in range(n_salts)
            ],
        )
        aggs = [
            F.min(
                F.conv(
                    F.substring(F.col(f"__d{i // 4}"), 1 + 8 * (i % 4), 8), 16, 10
                ).cast("long")
            ).alias(f"__mh{i}")
            for i in range(num_hashes)
        ]
    sig = inv.groupBy("doc").agg(*aggs)
    return sig.select("doc", F.array(*[F.col(f"__mh{i}") for i in range(num_hashes)]).alias("sig"))


def minhash_band_tags(
    sigs: DataFrame,
    *,
    num_hashes: int = 48,
    bands: int = 12,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """(doc, __band, __bh) banding tags from a ``minhash_signatures``
    frame — the joinable form of the LSH index. Factored out so the
    batch self-join (``minhash_candidates``) and the streaming
    incremental index (``streaming.dedup_index``) bucket with EXACTLY
    the same keys: with xxhash64 the band key is the slice hash; with
    md5_32 it is the comma-joined slice itself — exact equality
    semantics (no band-hash collisions to reconcile) and trivially
    re-expressible in any SQL engine."""
    r = num_hashes // bands
    if r * bands != num_hashes:
        raise ValueError(f"bands={bands} must divide num_hashes={num_hashes}")
    if hash_family == "xxhash64":
        # long keys, not strings: long-key hash joins beat string keys
        # (see ngram_jaccard_pairs) and each family's key array is
        # homogeneous on its own
        band_keys = [
            F.xxhash64(F.slice(F.col("sig"), b * r + 1, r)) for b in range(bands)
        ]
    else:
        band_keys = [
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(F.col("sig"), b * r + 1, r), lambda x: x.cast("string")
                ),
            )
            for b in range(bands)
        ]
    return sigs.select(
        "doc", F.posexplode(F.array(*band_keys)).alias("__band", "__bh")
    )


def minhash_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    num_hashes: int = 48,
    bands: int = 12,
    max_distance: float = 0.4,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash-LSH (the scale
    path). Returns (doc_a, doc_b, jaccard_dist) with the signature-estimated
    distance (fraction of disagreeing minhashes).

    Banding is AND-within-band / OR-across-bands: a pair collides iff ALL
    ``r = num_hashes/bands`` minhashes agree in at least one band, so the
    collision probability is ``1 - (1 - j^r)^b`` — an S-curve with its knee
    at ``j* ≈ (1/b)^(1/r)`` (defaults: 12 bands x 4 rows -> j* ~ 0.54).
    Candidate generation is an equi-join on (band, band_hash): cost is the
    sum of bucket-collision squares, never |docs|^2. This replaces a
    ``pyspark.ml.MinHashLSH`` implementation whose one-minhash-per-table
    OR-only amplification admits candidates with probability ~= j per
    table — at corpus scale that is a near-cartesian candidate set for any
    corpus with shared stop phrases (measured 16x slower end-to-end at
    sf0.1 before the switch).
    """
    r = num_hashes // bands
    if r * bands != num_hashes:
        raise ValueError(f"bands={bands} must divide num_hashes={num_hashes}")
    # r12 opt: signatures feed the band tags AND both distance-join sides,
    # band tags feed both candidate-join sides — materialize each once
    # instead of re-running the shingle explode + 48-hash aggregation per
    # reference (the before-plan showed 4 full signature pipelines).
    # Both tables are (doc, longs) metadata, never text.
    sigs = minhash_signatures(
        df, id_col, text_col, n=n, num_hashes=num_hashes, hash_family=hash_family
    ).transform(materialize_once)
    tagged = minhash_band_tags(
        sigs, num_hashes=num_hashes, bands=bands, hash_family=hash_family
    ).transform(materialize_once)
    a = tagged.alias("a")
    b = tagged.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.__band") == F.col("b.__band"))
            & (F.col("a.__bh") == F.col("b.__bh"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    sa = sigs.select(F.col("doc").alias("doc_a"), F.col("sig").alias("__sa"))
    sb = sigs.select(F.col("doc").alias("doc_b"), F.col("sig").alias("__sb"))
    matches = F.aggregate(
        F.zip_with("__sa", "__sb", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    est_dist = F.lit(1.0) - matches.cast("double") / F.lit(float(num_hashes))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", est_dist.alias("jaccard_dist"))
        .filter(F.col("jaccard_dist") <= max_distance)
    )


def duplicate_span_coverage(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    span_tokens: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """ExactSubstr-lite: per-document duplicated-span statistics at fixed
    token-window granularity — the windowed approximation of suffix-array
    exact-substring dedup (Lee et al., ACL'22, "Deduplicating Training
    Data Makes Language Models Better"). A span is every ``span_tokens``-
    token sliding window (stride 1); a span is DUPLICATED when its text
    occurs >= ``min_count`` times corpus-wide (same-doc repeats count,
    as in ExactSubstr). Output per document: total token count, number
    of duplicated span starts, and ``dup_tokens`` — the number of tokens
    covered by the UNION of duplicated windows (overlaps merged), i.e.
    the mass substring-level dedup would remove.

    Where it sits in the family: q149/segment_dedup needs segment
    boundaries, q141/containment needs fingerprint sampling; this scans
    EVERY token position, so it catches boilerplate that crosses
    paragraph boundaries or is shorter than a segment.

    100 TB posture: one explode of |tokens| (pos, md5) rows — linear,
    hashes not span text — one map-side-combined groupBy on the hash,
    one equi-join back, and a per-doc window over DUPLICATED positions
    only (bounded by doc length, never the corpus). Interval union via
    ``min(span, pos - lag(pos))`` — the gaps-and-islands closed form, no
    per-row Python anywhere. All-integer output: trivially
    SQL-oracle-able.
    """
    if span_tokens < 2:
        raise ValueError(f"span_tokens must be >= 2, got {span_tokens}")
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit(""))
    base = (
        df.select(F.col(id_col).alias("doc"), toks.alias("__tk"))
        .select("doc", "__tk", F.size("__tk").alias("n_tokens"))
    )
    k = F.col("n_tokens") - F.lit(span_tokens - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
        lambda i: F.md5(
            F.concat_ws(
                " ", *[F.element_at(F.col("__tk"), i + j) for j in range(span_tokens)]
            )
        ),
    )
    span_hashes = F.when(k > 0, grams).otherwise(F.array().cast("array<string>"))
    # r12 opt: the positional span index feeds both the corpus-wide count
    # and the join back — materialize once so the md5-per-window explode
    # (the expensive part) runs a single time.
    win = (
        base.select("doc", F.posexplode(span_hashes).alias("__p0", "__h"))
        .select("doc", (F.col("__p0") + 1).alias("pos"), "__h")
        .transform(materialize_once)
    )
    hot = (
        win.groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .filter(F.col("__cnt") >= min_count)
        .select("__h")
    )
    dup = win.join(hot, "__h")
    wspec = Window.partitionBy("doc").orderBy("pos")
    prev = F.lag("pos").over(wspec)
    cover = F.when(prev.isNull(), F.lit(span_tokens)).otherwise(
        F.least(F.lit(span_tokens), F.col("pos") - prev)
    )
    per_doc = (
        dup.withColumn("__cov", cover)
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_dup_spans"),
            F.sum("__cov").alias("dup_tokens"),
        )
    )
    return (
        base.select("doc", "n_tokens")
        .join(per_doc, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce(F.col("n_dup_spans"), F.lit(0)).cast("long").alias("n_dup_spans"),
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long").alias("dup_tokens"),
        )
    )


def embedding_near_dups(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    round_to: int = 4,
    candidates: Optional[DataFrame] = None,
    allow_quadratic: bool = False,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine similarity >= threshold.

    **Production path**: pass ``candidates`` — an (id_a, id_b) frame from a
    sub-quadratic generator (``ops.similarity.hyperplane_candidates``,
    ``minhash_candidates``, or LSH/IVF bucket joins). Scoring then runs only
    on candidate pairs via two plain equi-joins to fetch the vectors —
    shuffle-or-broadcast hash joins, linear in |candidates|, never a
    cartesian.

    Without ``candidates`` this is the exact triangular self-join — O(n^2)
    pair scoring. That form exists as the oracle-able baseline and the
    recall verifier for the candidate generators; because it is a hard
    scale-killer on a full corpus, it must be opted into explicitly with
    ``allow_quadratic=True`` — a bare call raises so nobody reaches the
    all-pairs plan by default.
    """
    from .similarity import dot, l2_norm

    if candidates is None and not allow_quadratic:
        raise ValueError(
            "embedding_near_dups without candidates= is an O(n^2) all-pairs "
            "self-join. Pass candidates= from a sub-quadratic generator "
            "(hyperplane_candidates / minhash_candidates / IVF), or opt in "
            "explicitly with allow_quadratic=True for small/oracle use."
        )

    # norms are projected BELOW the join — computed once per vector row,
    # not once per pair (3x fewer array traversals than a per-pair
    # cosine_similarity; the division keeps the exact same float ops as
    # dot/(sqrt(na)*sqrt(nb)), so oracle parity is unchanged).
    a = vectors.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
        l2_norm(F.col(vec_col)).alias("__na"),
    )
    b = vectors.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
        l2_norm(F.col(vec_col)).alias("__nb"),
    )
    if candidates is not None:
        # accept either pair-column convention: (id_a, id_b) from the
        # similarity generators, (doc_a, doc_b) from minhash_candidates /
        # ngram_jaccard_pairs — the docstring promises both compose here.
        cand_cols = set(candidates.columns)
        if {"id_a", "id_b"} <= cand_cols:
            cand = candidates.select("id_a", "id_b")
        elif {"doc_a", "doc_b"} <= cand_cols:
            cand = candidates.select(
                F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")
            )
        else:
            raise ValueError(
                f"candidates needs (id_a, id_b) or (doc_a, doc_b); got {sorted(cand_cols)}"
            )
        pairs = cand.join(a, "id_a").join(b, "id_b")
    else:
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    sim = F.round(
        F.try_divide(dot(F.col("va"), F.col("vb")), F.col("__na") * F.col("__nb")),
        round_to,
    )
    return (
        pairs.select("id_a", "id_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def simhash_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    bits: int = 64,
    include_packed: bool = False,
) -> DataFrame:
    """64-bit SimHash per document, built from cross-engine-stable md5 bits.

    Each token hashes to md5; bit i of the fingerprint is the sign of
    ``sum over tokens of (2*bit_i(token) - 1)``. One explode + one groupBy
    with 64 integer sum aggregates — a single shuffle on doc id; everything
    stays JVM-side.

    ``include_packed`` additionally emits the fingerprint bit-packed into
    one BIGINT (``simhash_long``, bit string position i -> long bit 63-i;
    summing disjoint powers of two is exact in two's complement) so Hamming
    distance is a single ``bit_count(a XOR b)`` instead of 64 substring
    compares.

    Near-dup use: group or self-join on the fingerprint (Hamming-0), or
    ``simhash_near_dups`` for banded Hamming <= k.
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit(""))
    tok = df.select(F.col(id_col).alias("doc"), F.explode(toks).alias("tok"))
    tok = tok.withColumn("h", F.md5(F.col("tok")))
    # md5 hex -> per-bit +-1 contributions. The hex is parsed in FOUR
    # 8-char (32-bit) chunks, each one string->bigint conv, hoisted into
    # ONE projection; every aggregate expression is then two integer bit
    # ops on a chunk. (Four 32-bit parses replaced the earlier sixteen
    # 1-char nibble convs — same bit layout, 4x less string parsing per
    # row; chunk c holds bits 32c..32c+31 big-endian, so
    # bit i = (chunk[i div 32] >> (31 - i mod 32)) & 1.)
    n_chunks = (bits + 31) // 32
    tok = tok.select(
        "doc",
        *[
            F.conv(F.substring("h", 1 + 8 * c, 8), 16, 10)
            .cast("bigint")
            .alias(f"n{c}")
            for c in range(n_chunks)
        ],
    )
    aggs = []
    for i in range(bits):
        bit = (
            F.shiftright(F.col(f"n{i // 32}"), 31 - (i % 32))
            .bitwiseAND(F.lit(1))
            .cast("int")
        )
        aggs.append(F.sum(bit * 2 - 1).alias(f"b{i}"))
    sums = tok.groupBy("doc").agg(*aggs)
    fp = F.concat(*[F.when(F.col(f"b{i}") > 0, F.lit("1")).otherwise(F.lit("0")) for i in range(bits)])
    cols = ["doc", fp.alias("simhash")]
    if include_packed:
        packed = None
        for i in range(bits):
            term = F.when(
                F.col(f"b{i}") > 0,
                F.shiftleft(F.lit(1).cast("long"), bits - 1 - i),
            ).otherwise(F.lit(0).cast("long"))
            packed = term if packed is None else packed + term
        cols.append(packed.alias("simhash_long"))
    return sums.select(*cols)


def simhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_hamming: int = 3,
    bits: int = 64,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance <= ``max_hamming``.

    The classic sharded-fingerprint scheme (Manku et al., WWW'07): split the
    fingerprint into ``max_hamming + 1`` bands — by pigeonhole, any pair
    within the Hamming budget agrees EXACTLY on at least one whole band —
    so candidate generation is an equi-join on (band index, band substring),
    never all-pairs. Exact Hamming distance is then computed only for
    candidate pairs; everything is integer/string math, so the whole
    pipeline is deterministic and SQL-expressible (oracled as q55).
    """
    bands = max_hamming + 1
    width = bits // bands
    # trailing bits that don't divide evenly go to the last band
    widths = [width] * (bands - 1) + [bits - width * (bands - 1)]
    starts = [1 + width * i for i in range(bands)]
    fp = simhash_fingerprints(df, id_col, text_col, bits=bits, include_packed=True)
    # materialize the fingerprint table ONCE before the self-join: the
    # (explode + 64-agg groupBy) subtree is the dominant cost, and a
    # self-join would otherwise evaluate it on BOTH sides (broadcast
    # build + probe are different exchange types, so runtime exchange
    # reuse cannot collapse them). |fp| = one row per doc — tiny
    # relative to the token explode it snips off the plan. Lazy, same
    # pattern as the connected-components rounds (ops/graph.py).
    fp = fp.transform(materialize_once)
    band_arr = F.array(
        *[F.substring("simhash", starts[b], widths[b]) for b in range(bands)]
    )
    # the packed fingerprint rides along through the band join (no
    # post-hoc fp re-join); the distinct collapses multi-band collisions
    # of the same pair, and Hamming is ONE bit_count(xor) per candidate.
    tagged = fp.select(
        "doc", F.col("simhash_long"), F.posexplode(band_arr).alias("__band", "__sub")
    )
    a = tagged.alias("a")
    b = tagged.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.__band") == F.col("b.__band"))
            & (F.col("a.__sub") == F.col("b.__sub"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.simhash_long").alias("__fa"),
            F.col("b.simhash_long").alias("__fb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("__fa").bitwiseXOR(F.col("__fb")))
    return (
        cand.select("doc_a", "doc_b", ham.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def semantic_dedup(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    threshold: float = 0.95,
    seed: int = 42,
    round_to: int = 4,
    cells: str = "kmeans",
    dim: Optional[int] = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., arXiv:2303.09540):
    partition embeddings into cells, score cosine similarity ONLY within
    each cell, and drop the higher-id member of every >= ``threshold``
    pair. Returns the surviving rows of ``vectors``.

    ``cells`` picks the space partition:
    - ``"kmeans"`` (default, the paper's choice): Spark-ML KMeans —
      data-adaptive cells, best pair recall per cell budget, but the fit
      is iterative and engine-private (rows-only in any SQL oracle).
    - ``"hyperplane"``: one table of ``ceil(log2 n_clusters)`` seeded
      sign-LSH planes (``ops.similarity.hyperplane_planes``) — a
      DETERMINISTIC disjoint partition into 2^p cells from literal
      constants, so the whole dedup is SQL-expressible and value-
      oracle-able. Requires ``dim``. Recall per cell budget is lower
      than fitted KMeans cells (planes ignore data geometry); same
      confinement of the quadratic term.

    100 TB posture: the quadratic term is confined to single cells —
    pair generation is an equi-join on the cell id (shuffle-or-broadcast
    hash join), never the corpus cross join; with balanced cells the pair
    count is ~n^2/n_clusters, tuned by ``n_clusters``. The KMeans fit runs
    on a sample-sized driver loop inside Spark ML; in a real deployment
    fit once (``ops.similarity.fit_ivf``) and reuse the centroids across
    corpus snapshots.

    Recall/containment properties are pinned by pytest against the exact
    ``embedding_near_dups`` baseline (both cell modes).
    """
    if cells not in ("kmeans", "hyperplane"):
        raise ValueError(f"unknown cells mode {cells!r}")
    if cells == "hyperplane":
        if dim is None:
            raise ValueError("cells='hyperplane' requires dim=")
        from .similarity import _hyperplane_tagged, _plane_df

        n_planes = max(1, (int(n_clusters) - 1).bit_length())
        plane_df = _plane_df(vectors.sparkSession, dim, 1, n_planes, seed)
        tagged = _hyperplane_tagged(vectors, id_col, vec_col, plane_df)
        assigned = vectors.join(
            tagged.select(
                F.col("__id").alias(id_col), F.col("__bucket").alias("__cell")
            ),
            id_col,
        )
    else:
        from .similarity import fit_ivf

        index = fit_ivf(
            vectors, id_col=id_col, vec_col=vec_col, n_clusters=n_clusters, seed=seed
        )
        assigned = index.assigned  # id, vec, __cell
    # r12 opt: both self-join sides only need (cell, id) — materialize that
    # narrow projection once instead of re-running the cell assignment
    # (KMeans transform / hyperplane dot products over the full vector
    # column) per join side.
    cells_tbl = assigned.select(
        F.col("__cell"), F.col(id_col).alias("__sid")
    ).transform(materialize_once)
    a = cells_tbl.select("__cell", F.col("__sid").alias("id_a"))
    b = cells_tbl.select("__cell", F.col("__sid").alias("id_b"))
    cand = a.join(b, "__cell").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
    # score through embedding_near_dups so there is exactly ONE cosine
    # expression tree in the codebase — its float-op order is what the
    # q34-baseline parity tests pin.
    scored = embedding_near_dups(
        vectors,
        id_col=id_col,
        vec_col=vec_col,
        threshold=threshold,
        round_to=round_to,
        candidates=cand,
    )
    dupes = scored.select(F.col("id_b").alias(id_col)).distinct()
    return vectors.join(dupes, id_col, "left_anti")


def fuzzy_key_pairs(
    df: DataFrame,
    key_col: str,
    *,
    max_dist: int = 2,
    block_chars: int = 3,
    max_block: Optional[int] = 10_000,
) -> DataFrame:
    """Blocked edit-distance matching over a key vocabulary — the
    entity-resolution primitive (fuzzy product/supplier/domain names).

    Distinct keys are paired only within a blocking bucket (shared
    lowercase prefix), then filtered by exact ``levenshtein <= max_dist``:
    an equi-join on the block key, NEVER an all-pairs cross join. Cost is
    sum of per-block pair counts — tune ``block_chars`` so blocks stay
    bounded; at 100 TB block on a cheap canonical form (prefix, soundex,
    length bucket) with the same shape. The key table is DISTINCT keys
    (a vocabulary), typically orders of magnitude smaller than the corpus.
    """
    keys = df.select(F.col(key_col).cast("string").alias("k")).distinct()
    blocked = keys.withColumn("__blk", F.lower(F.substring("k", 1, block_chars)))
    if max_block is not None:
        # hot-block guard (same rationale as ngram_jaccard_pairs'
        # max_shingle_df): one pathological prefix must not quadratically
        # dominate the join — drop blocks above the cap; rerun those keys
        # with a finer blocking key if they matter.
        blk_w = Window.partitionBy("__blk")
        blocked = (
            blocked.withColumn("__blk_n", F.count(F.lit(1)).over(blk_w))
            .filter(F.col("__blk_n") <= F.lit(int(max_block)))
            .drop("__blk_n")
        )
    a = blocked.select(F.col("__blk"), F.col("k").alias("key_a"))
    b = blocked.select(F.col("__blk"), F.col("k").alias("key_b"))
    return (
        a.join(b, "__blk")
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn("dist", F.levenshtein("key_a", "key_b"))
        .filter(F.col("dist") <= max_dist)
        .select("key_a", "key_b", F.col("dist").cast("long").alias("dist"))
    )


def incremental_dedup(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    algo: str = "md5",
) -> DataFrame:
    """Admit only NEW content from an incoming batch: drop rows whose
    content hash already exists in the at-rest corpus, then keep one
    deterministic representative (min id) per hash within the batch.

    The continuous-ingest primitive: at 100 TB the corpus side is a
    hash-only projection (one narrow column off the corpus scan, or a
    pre-materialized hash index table), the anti-join shuffles on the
    uniformly-distributed hash, and within-batch dedup is a bounded
    per-hash window. Never ships text across the wire — hashes only.
    """
    h = content_hash(F.col(text_col), algo)
    seen = corpus.select(h.alias("__h")).distinct()
    tagged = batch.withColumn("__h", h)
    fresh = tagged.join(seen, "__h", "left_anti")
    w = Window.partitionBy("__h").orderBy(F.col(id_col))
    return (
        fresh.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk", "__h")
    )


def segment_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    delimiter: Optional[str] = None,
    tokens_per_segment: int = 32,
    min_segment_chars: int = 1,
) -> DataFrame:
    """Sub-document (paragraph / line-level) cross-corpus deduplication —
    the RefinedWeb / CCNet hygiene step exact whole-doc dedup misses:
    boilerplate paragraphs repeated across MANY distinct documents.

    Every document is cut into segments (on ``delimiter`` when the corpus
    has natural paragraph breaks, else fixed ``tokens_per_segment`` token
    windows), each segment is hashed, and only the FIRST occurrence
    corpus-wide (smallest ``(doc_id, position)``) keeps it; later copies are
    dropped and each document is re-assembled from its surviving segments.

    Output: one row per doc with at least one segment (docs whose text
    yields no segments drop out) —
    ``(id_col, n_segments, n_kept, dedup_text)`` where ``dedup_text`` joins
    surviving segments in original order (empty string when every segment
    was seen earlier).

    100 TB posture: the explode is linear in corpus size; first-occurrence
    election is one groupBy on the segment hash (md5 — uniformly
    distributed, skew-free regardless of how hot the boilerplate is: the
    per-hash state is a single min struct, map-side combined); re-assembly
    is one groupBy on ``id_col``. Text crosses the shuffle once (the
    re-assembly); the election itself ships only (hash, doc, pos).
    """
    if delimiter is not None:
        segs = F.filter(
            F.split(F.col(text_col), delimiter), lambda s: F.length(s) >= min_segment_chars
        )
        base = df.select(F.col(id_col), segs.alias("__segs"))
    else:
        # No natural paragraph breaks: cut the (materialized) token array
        # into fixed-size windows. The token column must be bound before the
        # HOF (no CSE inside lambdas — see shingles_from_tokens).
        toks = F.col("__toks")
        n_chunks = F.ceil(F.size(toks) / F.lit(tokens_per_segment)).cast("int")
        chunks = F.transform(
            F.sequence(F.lit(0), F.greatest(n_chunks, F.lit(1)) - 1),
            lambda i: F.concat_ws(
                " ", F.slice(toks, i * tokens_per_segment + 1, tokens_per_segment)
            ),
        )
        base = df.select(
            F.col(id_col),
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")).alias(
                "__toks"
            ),
        ).select(
            F.col(id_col),
            F.filter(chunks, lambda s: F.length(s) >= min_segment_chars).alias("__segs"),
        )
    exploded = base.select(
        F.col(id_col), F.posexplode("__segs").alias("__pos", "__seg")
    )
    hashed = exploded.select(
        F.col(id_col), "__pos", "__seg", F.md5(F.col("__seg")).alias("__h")
    )
    first = hashed.groupBy("__h").agg(
        F.min(F.struct(F.col(id_col).alias("d"), F.col("__pos").alias("p"))).alias("__first")
    )
    kept = hashed.join(first, "__h").withColumn(
        "__keep",
        (F.col("__first.d") == F.col(id_col)) & (F.col("__first.p") == F.col("__pos")),
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(F.col("__keep").cast("long")).alias("n_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("__keep"), F.struct(F.col("__pos"), F.col("__seg")))
                        )
                    ),
                    lambda s: s["__seg"],
                ),
            ).alias("dedup_text"),
        )
    )


def source_overlap_matrix(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    *,
    tokens_per_segment: int = 8,
) -> DataFrame:
    """Pairwise cross-source contamination matrix: how many distinct
    text segments each pair of sources shares — the audit a pipeline
    owner runs before mixing crawls (two mirrors of the same site look
    like two "sources" until this table says 90% overlap).

    Each document is cut into fixed ``tokens_per_segment`` token windows
    (the ``segment_dedup`` segmentation); the distinct (source, segment)
    inverted index self-joins on the segment hash with ``source_a <
    source_b``. Overlap coefficient = |A∩B| / min(|A|,|B|) — the
    containment-style measure that still fires when one source is much
    smaller than the other.

    100 TB posture: the index carries (group, 64-bit hash) only — text
    never crosses the shuffle; a segment's join fanout is bounded by
    |groups|² (sources are an operational handful, not data-scaled), so
    there is no hot-key quadratic in corpus size. One explode, one
    distinct, one equi-join, two tiny aggregates.

    Output: (source_a, source_b, inter, n_a, n_b, overlap_coef).
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit(""))
    base = df.select(F.col(group_col).alias("grp"), toks.alias("__tk"))
    n_segs = F.ceil(F.size("__tk") / F.lit(tokens_per_segment)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), F.greatest(n_segs, F.lit(1)) - 1),
        lambda i: F.concat_ws(
            " ", F.slice("__tk", i * tokens_per_segment + 1, tokens_per_segment)
        ),
    )
    inv = (
        base.select("grp", F.explode_outer(segs).alias("seg"))
        .filter(F.col("seg").isNotNull() & (F.length("seg") > 0))
        .select("grp", F.xxhash64("seg").alias("seg_h"))
        .distinct()
        # r12 opt: feeds sizes and both self-join sides — materialize the
        # (group, hash) index once instead of re-running the segment
        # explode per reference.
        .transform(materialize_once)
    )
    sizes = inv.groupBy("grp").agg(F.count(F.lit(1)).alias("n_segs"))
    a, b = inv.alias("a"), inv.alias("b")
    inter = (
        a.join(b, (F.col("a.seg_h") == F.col("b.seg_h")) & (F.col("a.grp") < F.col("b.grp")))
        .groupBy(F.col("a.grp").alias("source_a"), F.col("b.grp").alias("source_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("grp").alias("source_a"), F.col("n_segs").alias("n_a"))
    sb = sizes.select(F.col("grp").alias("source_b"), F.col("n_segs").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "inter",
            "n_a",
            "n_b",
            F.round(
                F.col("inter").cast("double")
                / F.least("n_a", "n_b").cast("double"),
                6,
            ).alias("overlap_coef"),
        )
    )


def prefix_filtered_jaccard(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard pairs via AllPairs/PPJoin PREFIX FILTERING
    (Bayardo et al. WWW'07; Xiao et al. WWW'08) — same output contract as
    ``ngram_jaccard_pairs`` (doc_a, doc_b, inter, n_a, n_b), different
    candidate generator with a much smaller join at high thresholds.

    Principle: order every shingle set by a GLOBAL canonical order
    (ascending document frequency, ties by hash — rarest first). If
    J(A,B) >= t then |A∩B| >= t·|A|, so the first
    ``|A| - ceil(t·|A|) + 1`` ordered elements of A must contain at least
    one common element (likewise for B) — the inverted index only ever
    joins on PREFIX tokens, and df-ascending ordering keeps corpus-hot
    shingles out of prefixes entirely (the hot-key quadratic that
    ``max_shingle_df`` merely truncates is avoided *losslessly* here).
    Candidates are then verified exactly with an integer
    cross-multiplied threshold test on the full sorted-hash arrays.

    At t=0.8 the prefix is ~20% of each set (25x fewer index pairs than
    the full inverted join); at low thresholds the prefix approaches the
    whole set and ``ngram_jaccard_pairs`` + df-cap is the better tool.

    100 TB posture: one df-table join + per-doc re-sort (the canonical
    order), prefix explode, long-key equi-join on prefix hashes, then a
    pair-bounded verification join that ships two hash arrays per
    candidate. No window, no cartesian, no driver action.
    """
    from fractions import Fraction

    frac = Fraction(threshold).limit_denominator(10_000)
    p, q = frac.numerator, frac.denominator

    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit(""))
    base = df.select(F.col(id_col).alias("doc"), toks.alias("__tk")).select(
        "doc", shingles_from_tokens("__tk", n).alias("sh")
    )
    inv = (
        base.select("doc", F.explode_outer("sh").alias("shingle"))
        .filter(F.col("shingle").isNotNull())
        .select("doc", F.xxhash64("shingle").alias("sh_h"))
        # r12 opt: inv feeds the document-frequency aggregate AND the
        # canonical-order join — materialize the (doc, hash) index once
        # instead of re-running the shingle explode per reference.
        .transform(materialize_once)
    )
    dfreq = inv.groupBy("sh_h").agg(F.count(F.lit(1)).alias("df"))
    # canonical per-doc array, rarest shingle first: array_sort on
    # struct(df, sh_h) orders by df then hash — one groupBy on doc.
    ordered = (
        inv.join(dfreq, "sh_h")
        .groupBy("doc")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "sh_h"))), lambda s: s.sh_h
            ).alias("arr")
        )
        .select(
            "doc",
            "arr",
            F.size("arr").cast("long").alias("n_sh"),
        )
        # materialize ONCE: this table feeds three plan branches (the
        # prefix index and both verification sides) — without a
        # checkpoint the whole shingle->df->sort pipeline would run 3x
        # (same rationale as the simhash band join). One row per doc.
        .transform(materialize_once)
    )
    # prefix length |A| - ceil(t|A|) + 1, with ceil(p*n/q) in exact ints
    ceil_tn = F.floor((F.lit(p) * F.col("n_sh") + F.lit(q) - 1) / F.lit(q))
    prefixes = ordered.select(
        "doc",
        F.col("n_sh"),
        F.explode(F.slice("arr", 1, (F.col("n_sh") - ceil_tn + 1).cast("int"))).alias(
            "sh_h"
        ),
    )
    cand = (
        prefixes.alias("a")
        .join(
            prefixes.alias("b"),
            (F.col("a.sh_h") == F.col("b.sh_h"))
            & (F.col("a.doc") < F.col("b.doc"))
            # PPJoin length filter: J >= t forces t <= min/max of the two
            # set sizes — prunes size-mismatched pairs BEFORE the distinct
            # and the array-carrying verification join (exact integer test)
            & (F.lit(q) * F.col("a.n_sh") >= F.lit(p) * F.col("b.n_sh"))
            & (F.lit(q) * F.col("b.n_sh") >= F.lit(p) * F.col("a.n_sh")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    fa = ordered.select(
        F.col("doc").alias("doc_a"), F.col("arr").alias("arr_a"), F.col("n_sh").alias("n_a")
    )
    fb = ordered.select(
        F.col("doc").alias("doc_b"), F.col("arr").alias("arr_b"), F.col("n_sh").alias("n_b")
    )
    return (
        cand.join(fa, "doc_a")
        .join(fb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("arr_a", "arr_b")).cast("long").alias("inter"),
            "n_a",
            "n_b",
        )
        .filter(
            F.lit(q) * F.col("inter")
            >= F.lit(p) * (F.col("n_a") + F.col("n_b") - F.col("inter"))
        )
    )


# American Soundex digit map: vowels+Y -> '.', H/W -> '-', consonants ->
# class digit. The markers make the H/W-transparency rule a regex
# collapse instead of a scan: 'd[-d]*d' -> 'd' merges codes separated
# only by H/W (and plain doubles), while '.' (a vowel) breaks the run,
# exactly the classic rule. RE2/Java-safe (no backreferences).
_SOUNDEX_MAP = ".123.12-.22455.12623.1-2.2"


def soundex_code(col: Column | str) -> Column:
    """American Soundex as explicit Column ops — NOT ``F.soundex``.

    The JVM builtin is a black box an external SQL oracle cannot
    reproduce; this expression chain (upper -> letters-only ->
    ``translate`` -> per-digit H/W-transparent run collapse -> marker
    strip -> first-letter-code drop -> pad) uses only functions every
    engine ships with identical semantics, so phonetic blocking joins
    hash-match a DuckDB twin. Classic algorithm (Knuth TAOCP vol. 3):
    Johnson/Jonson/Johnsen -> J525, Smith/Smyth/Smithe -> S530,
    Ashcraft -> A261 (H-transparency).

    Returns the 4-char code; NULL-ish/letterless inputs yield ''.
    """
    c = F.col(col) if isinstance(col, str) else col
    letters = F.regexp_replace(F.upper(c), "[^A-Z]", "")
    f0 = F.substring(letters, 1, 1)
    m = F.translate(letters, "ABCDEFGHIJKLMNOPQRSTUVWXYZ", _SOUNDEX_MAP)
    for d in "123456":
        m = F.regexp_replace(m, f"{d}[-{d}]*{d}", d)
    digits = F.regexp_replace(m, "[-.]", "")
    digits = F.when(
        F.substring(m, 1, 1).rlike("[1-6]"), F.substring(digits, 2, 1_000_000)
    ).otherwise(digits)
    return F.when(
        letters == F.lit(""), F.lit("")
    ).otherwise(F.concat(f0, F.substring(F.concat(digits, F.lit("000")), 1, 3)))


def phonetic_key_pairs(
    df: DataFrame,
    key_col: str,
    *,
    max_dist: int = 3,
    min_len: int = 4,
) -> DataFrame:
    """Entity-resolution candidate pairs under PHONETIC blocking: distinct
    keys that share a Soundex code, verified with ``levenshtein <=
    max_dist``. The complement of ``fuzzy_key_pairs``'s prefix blocking —
    prefix blocks miss leading-character typos ("Jonson"/"Johnson" share
    a block, "Onson" does not), Soundex blocks catch sound-alike variants
    whose spellings diverge early.

    Same scale posture as the prefix blocker: the vocabulary is DISTINCT
    keys (always << corpus), candidates come from an equi-join on the
    4-char Soundex code, and the edit-distance verify runs only within
    blocks. A degenerate block (many keys, one code) is the classic
    Soundex failure mode — ``min_len`` drops short keys, whose codes
    collapse worst.

    Value-oracled (r5): the code comes from ``soundex_code`` — explicit
    translate/regexp collapse ops a SQL oracle mirrors exactly — and the
    levenshtein verify is the standard unit-cost edit distance both
    engines implement identically. Also pinned by the block fixture in
    tests.

    Output: ``(key_a, key_b, code, dist)`` with ``key_a < key_b``.
    """
    keys = (
        df.select(F.col(key_col).alias("k"))
        .filter(F.length("k") >= min_len)
        .distinct()
        .withColumn("code", soundex_code(F.col("k")))
        .filter(F.col("code") != F.lit(""))
    )
    a = keys.select(F.col("k").alias("key_a"), "code")
    b = keys.select(F.col("k").alias("key_b"), "code")
    return (
        a.join(b, "code")
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn("dist", F.levenshtein("key_a", "key_b"))
        .filter(F.col("dist") <= max_dist)
        .select("key_a", "key_b", "code", "dist")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    key_col: str,
    *,
    window: int = 5,
    bucket_size: int = 64,
    sub_bucket: Optional[Column] = None,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez & Stolfo, SIGMOD'95):
    candidate pairs are records within ``window`` positions of each
    other in the GLOBAL ordering by ``(key, id)`` — the complementary
    blocking method to :func:`fuzzy_key_pairs`' shared-prefix blocks
    (a sliding window crosses prefix boundaries; a prefix block crosses
    sort-distance gaps; classic multi-pass ER runs both).

    Scale shape (the part naive SN gets wrong): the global position is
    NOT a single-task ``row_number() OVER (ORDER BY key)`` — it rides
    :func:`~..ops.sampling.two_phase_running_sum` with a key-prefix
    ``sub_bucket`` (monotone along the sort order), so ranking
    parallelizes. The neighborhood join is then an EQUI-join: each row
    probes its rank-bucket and the next (``bucket_size >= window``
    guarantees a window never spans more than two consecutive buckets),
    and the pair filter ``0 < rank_b - rank_a <= window`` runs on the
    bucketed candidates — never a cross join, never a rank-range theta
    join.

    Returns one row per candidate pair: ``id_a, id_b, key_a, key_b,
    rank_gap`` (ties in ``key`` order break by id, so ranks — and
    therefore pairs — are deterministic).
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    b = max(int(bucket_size), int(window))
    from .sampling import two_phase_running_sum

    keys = df.select(
        F.col(id_col).cast("string").alias("__id"),
        F.col(key_col).cast("string").alias("__k"),
    ).filter(F.col("__k").isNotNull())
    sub = sub_bucket if sub_bucket is not None else F.substring("__k", 1, 1)
    ranked = two_phase_running_sum(
        keys,
        [],
        [F.asc("__k"), F.asc("__id")],
        F.lit(1),
        sub,
        out_col="__rank",
    ).select("__id", "__k", "__rank")
    # both join sides consume the ranked relation — materialize it once
    ranked = ranked.transform(materialize_once)
    probe = ranked.select(
        F.col("__id").alias("id_a"),
        F.col("__k").alias("key_a"),
        F.col("__rank").alias("__ra"),
        F.explode(
            F.array(
                F.expr(f"__rank div {b}"), F.expr(f"__rank div {b} + 1")
            )
        ).alias("__rb"),
    )
    build = ranked.select(
        F.col("__id").alias("id_b"),
        F.col("__k").alias("key_b"),
        F.col("__rank").alias("__rbrank"),
        F.expr(f"__rank div {b}").alias("__rb"),
    )
    gap = F.col("__rbrank") - F.col("__ra")
    return (
        probe.join(build, "__rb")
        .filter((gap > 0) & (gap <= window))
        .select(
            "id_a",
            "id_b",
            "key_a",
            "key_b",
            gap.cast("bigint").alias("rank_gap"),
        )
    )


def blocking_audit(
    df: DataFrame,
    schemes: "dict[str, Column]",
    truth_key: Column,
) -> DataFrame:
    """Blocking-quality audit for entity resolution (Christen, TKDE 2012
    survey of indexing/blocking): for each candidate blocking scheme,
    measure what it would COST (candidate pairs to compare, biggest
    block) and what it would CATCH (coverage of ground-truth duplicate
    pairs, where truth = rows sharing ``truth_key``).

    Everything is counting arithmetic over grouped counts — no pair is
    ever materialized:

    * ``candidate_pairs`` = sum over blocks of C(c, 2) (exact bigint —
      c*(c-1) is always even);
    * ``true_pairs``      = same sum over ``truth_key`` groups;
    * ``true_covered``    = same sum over (truth_key, scheme_key) groups
      — a truth pair is covered iff both rows share the scheme key too;
    * ``reduction_x1e6``  = floor(1e6 * (1 - candidate_pairs /
      C(n, 2))), the survey's reduction ratio at fixed 1e-6 resolution.

    Scale posture: per scheme this is two combiner-friendly groupBy
    passes over the input plus three broadcast 1-row joins — no joins
    between row-cardinality frames, no windows, so a billion-row audit
    is a handful of shuffles whose reduce side is block-count sized.

    Output: one row per scheme —
    ``(scheme, n_rows, n_blocks_multi, max_block, candidate_pairs,
    true_pairs, true_covered, reduction_x1e6)``.
    """
    tagged = df.select(truth_key.alias("__truth"), *[
        col.alias(f"__k_{name}") for name, col in schemes.items()
    ])
    # C(c,2) = c*(c-1) >> 1 — pure bigint (c*(c-1) is always even); a
    # double division here would silently round past 2^53 pairs.
    pairs = lambda c: F.shiftright((c * (c - F.lit(1))).cast("bigint"), 1)  # noqa: E731
    totals = tagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    truth_tot = (
        tagged.groupBy("__truth")
        .agg(F.count(F.lit(1)).alias("__c"))
        .agg(F.sum(pairs(F.col("__c"))).cast("bigint").alias("true_pairs"))
    )
    out = None
    for name in schemes:
        k = f"__k_{name}"
        blocks = (
            tagged.groupBy(k)
            .agg(F.count(F.lit(1)).alias("__c"))
            .agg(
                F.sum(pairs(F.col("__c"))).cast("bigint").alias("candidate_pairs"),
                F.sum(F.when(F.col("__c") >= 2, 1).otherwise(0))
                .cast("bigint")
                .alias("n_blocks_multi"),
                F.max("__c").cast("bigint").alias("max_block"),
            )
        )
        covered = (
            tagged.groupBy("__truth", k)
            .agg(F.count(F.lit(1)).alias("__c"))
            .agg(F.sum(pairs(F.col("__c"))).cast("bigint").alias("true_covered"))
        )
        row = (
            totals.crossJoin(F.broadcast(blocks))
            .crossJoin(F.broadcast(covered))
            .crossJoin(F.broadcast(truth_tot))
            .select(
                F.lit(name).alias("scheme"),
                "n_rows",
                "n_blocks_multi",
                "max_block",
                "candidate_pairs",
                "true_pairs",
                F.coalesce(F.col("true_covered"), F.lit(0).cast("bigint")).alias(
                    "true_covered"
                ),
                F.floor(
                    F.lit(1_000_000.0)
                    * (
                        F.lit(1.0)
                        - F.col("candidate_pairs").cast("double")
                        / pairs(F.col("n_rows")).cast("double")
                    )
                )
                .cast("bigint")
                .alias("reduction_x1e6"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out
