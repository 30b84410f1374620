"""Text analysis over document tables: tokens, stats, quality, language ID.

Greenfield LLM-pipeline capability (SURVEY.md §7.0). All operators are
pure built-in Column expressions — split/explode/regexp/aggregate under
whole-stage codegen; no Python in the hot path, so every one of these
scales linearly with partitions.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from ._materialize import checkpoint_round, materialize_once

__all__ = [
    "tokenize",
    "token_count",
    "bpe_ish_token_count",
    "term_counts",
    "chunk_documents",
    "ngram_novelty",
    "normalize_text",
    "scrub_text",
    "strip_common_segments",
    "unigram_logprob",
    "vocab_coverage",
    "chao1_richness",
    "good_turing_counts",
    "rake_keywords",
    "burrows_delta",
    "RAKE_STOPWORDS",
    "js_divergence_matrix",
    "DEFAULT_SCRUB_PATTERNS",
    "repetition_stats",
    "with_repetition_cols",
    "fingerprint_contamination",
    "tfidf_top_terms",
    "build_vocab",
    "doc_quality",
    "lang_stats",
    "language_id",
    "winnowing_fingerprints",
    "DEFAULT_LANG_MARKERS",
    "BPE_ISH_PATTERN",
    "char_pair_counts",
    "bpe_train",
    "gopher_quality_flags",
    "char_entropy",
    "GOPHER_STOPWORDS",
    "frequent_terms",
    "bpe_encode",
    "bm25_topk",
    "bm25_topk_multi",
    "c4_line_filter",
    "encoding_screen",
    "unigram_drift",
    "bigram_doc_logprob",
    "token_pmi",
    "flesch_reading_ease",
    "kneser_ney_bigrams",
    "span_corruption_stats",
    "inverted_postings",
    "countmin_sketch",
    "countmin_probe_table",
    "countmin_estimate",
    "zipf_fit",
    "heaps_fit",
]

# GPT-2-flavored pre-tokenizer shape: contraction suffixes, space-prefixed
# letter runs, digit runs, punctuation runs, residual whitespace. Both Java
# regex (Spark) and RE2 (DuckDB) support this subset identically.
BPE_ISH_PATTERN = r"'(?:s|d|m|t|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def tokenize(col: Column | str) -> Column:
    """Lowercased whitespace tokens, empties removed (array<string>)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != F.lit(""))


def token_count(col: Column | str) -> Column:
    return F.size(tokenize(col))


def bpe_ish_token_count(col: Column | str, pattern: str = BPE_ISH_PATTERN) -> Column:
    """Token count under a BPE-style pre-tokenizer regex — the cheap proxy
    for LLM token budgeting (whitespace runs count as merge fodder like
    real byte-level BPE pre-tokenization)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(pattern)).cast("long")


def winnowing_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03 scheme):
    hash every k-char gram, keep the minimum hash of each sliding window,
    emit the distinct selected hashes — one row per (doc, fingerprint).

    Guarantees: any shared substring of length >= k + window - 1 between
    two documents yields at least one shared fingerprint, so plagiarism/
    near-dup lookup becomes an equi-join on ``fp``. md5 hex (lexicographic
    min) keeps the selection reproducible across engines.

    All built from bound-array higher-order functions — per-row compute,
    no shuffle until the caller joins/groups on fp.
    """
    lowered = F.lower(F.col(text_col))
    n_grams = F.greatest(F.length(lowered) - F.lit(k - 1), F.lit(0))
    base = df.select(F.col(id_col), lowered.alias("__txt"), n_grams.alias("__ng"))
    # k-gram hashes (projection-bound before the next HOF — see dedup notes)
    grams = base.select(
        id_col,
        "__ng",
        F.when(
            F.col("__ng") > 0,
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.col("__ng"), F.lit(1))),
                lambda i: F.md5(F.col("__txt").substr(i, F.lit(k))),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("__h"),
    )
    n_windows = F.greatest(F.size("__h") - F.lit(window - 1), F.lit(0))
    mins = grams.select(
        id_col,
        F.when(
            n_windows > 0,
            F.transform(
                F.sequence(F.lit(1), F.greatest(n_windows, F.lit(1))),
                lambda i: F.array_min(F.slice(F.col("__h"), i, window)),
            ),
        )
        .otherwise(F.col("__h"))  # short doc: all grams are fingerprints
        .alias("__mins"),
    )
    return (
        mins.select(id_col, F.explode_outer(F.array_distinct("__mins")).alias("fp"))
        .filter(F.col("fp").isNotNull())
    )


def term_counts(df: DataFrame, text_col: str = "text", min_count: int = 1) -> DataFrame:
    """Corpus-wide term frequencies. One explode + one groupBy on the term —
    partial aggregation combines map-side, so the shuffle carries at most
    |vocab| rows per partition regardless of corpus size."""
    out = (
        df.select(F.explode(tokenize(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("term_count"))
    )
    if min_count > 1:
        out = out.filter(F.col("term_count") >= min_count)
    return out


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    *,
    out_col: str = "text_norm",
    keep_chars: str = "a-z0-9",
) -> DataFrame:
    """Standard pre-tokenization cleanup: lowercase, strip characters
    outside ``keep_chars`` (replaced with spaces), collapse whitespace
    runs, trim — plus ``n_chars_removed`` accounting so a pipeline can
    monitor how destructive its normalization is.

    Pure per-row regexp expressions (codegen'd, zero shuffle). The
    character-class subset used here behaves identically under Java regex
    (Spark) and RE2 (DuckDB/Go engines), which is what makes the operator
    oracle-able; richer Unicode classes (\\p{{L}}) also exist in both if
    callers need them.
    """
    lowered = F.lower(F.col(text_col))
    stripped = F.regexp_replace(lowered, f"[^{keep_chars} ]+", " ")
    collapsed = F.trim(F.regexp_replace(stripped, r"\s+", " "))
    # removed-chars accounting BEFORE the output column lands: with
    # out_col == text_col (in-place normalization) a post-hoc
    # length(text) - length(out) would compare the normalized column to
    # itself and always report 0.
    removed = (F.length(F.col(text_col)) - F.length(collapsed)).cast("long")
    return df.withColumn("n_chars_removed", removed).withColumn(out_col, collapsed)


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    chunk_size: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """Split documents into overlapping word-window chunks — the
    context-window packing / RAG-passage primitive.

    Chunk ``k`` starts at token ``k * (chunk_size - overlap)`` and takes
    ``chunk_size`` tokens; a start is generated at every stride multiple
    below ``n_tokens``, so the final chunk may be shorter (and for
    ``n_tokens <= chunk_size`` there is more than one chunk only when a
    stride multiple still lands inside the doc). Empty docs yield no rows.

    Pure per-row compute (``sequence``/``transform``/``slice`` under
    whole-stage codegen): zero shuffle, output rows ~ n_tokens / stride
    per doc — linear in corpus size regardless of partition layout.

    Output: ``(id_col, chunk_idx, n_tokens, chunk_text)``.
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError(
            f"need 0 <= overlap < chunk_size, got {overlap=} {chunk_size=}"
        )
    stride = chunk_size - overlap
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(F.col("__toks")) - 1, F.lit(0)),
        F.lit(stride),
    )
    return (
        df.select(F.col(id_col), tokenize(text_col).alias("__toks"))
        .select(
            id_col,
            F.posexplode(
                F.transform(starts, lambda s: F.slice("__toks", s + 1, chunk_size))
            ).alias("chunk_idx", "__chunk"),
        )
        .filter(F.size("__chunk") > 0)
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.size("__chunk").cast("long").alias("n_tokens"),
            F.array_join("__chunk", " ").alias("chunk_text"),
        )
    )


def strip_common_segments(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    width: int = 8,
    min_df: int = 2,
) -> DataFrame:
    """Boilerplate / repeated-segment removal (the CCNet/RefinedWeb
    line-dedup idea, generalized to fixed token windows because the
    segmentation unit is a parameter of the pipeline, not the operator):
    split each doc into non-overlapping ``width``-token segments, count in
    how many DISTINCT documents each segment appears, drop segments seen in
    ``>= min_df`` docs, and reassemble the survivors in original order.

    Scale posture: one explode (rows ~ n_tokens / width), a df-count
    aggregate on ``xxhash64(segment)`` (map-side combined; hot boilerplate
    segments are exactly one reducer cell each), an equi-join of the
    segment stream against the segment-df table on the 8-byte hash (never
    the segment text), and one per-doc aggregate. The reassembly
    ``collect_list`` is bounded by doc length — per-doc state, not
    per-corpus.

    Output: ``(id_col, n_segments, n_removed, clean_text)`` — empty docs
    yield no row; a fully-boilerplate doc yields ``clean_text = ''``.
    """
    if width < 1 or min_df < 1:
        raise ValueError(f"need width >= 1 and min_df >= 1, got {width=} {min_df=}")
    n_segs = F.ceil(F.size("__toks") / F.lit(width)).cast("int")
    segs = (
        df.select(F.col(id_col), tokenize(text_col).alias("__toks"))
        .filter(F.size("__toks") > 0)
        .select(
            id_col,
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(n_segs, F.lit(1))),
                    lambda i: F.array_join(
                        F.slice("__toks", (i - F.lit(1)) * width + F.lit(1), width), " "
                    ),
                )
            ).alias("idx", "seg"),
        )
        .withColumn("__h", F.xxhash64("seg"))
    )
    seg_df = segs.groupBy("__h").agg(F.count_distinct(F.col(id_col)).alias("__df"))
    kept = F.when(F.col("__df") < min_df, F.struct("idx", "seg"))
    return (
        segs.join(seg_df, "__h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(F.when(F.col("__df") >= min_df, 1).otherwise(0))
            .cast("long")
            .alias("n_removed"),
            F.array_join(
                F.transform(F.array_sort(F.collect_list(kept)), lambda s: s["seg"]),
                " ",
            ).alias("clean_text"),
        )
    )


# Redaction patterns chosen from the Java-regex ∩ RE2 subset so the same
# pattern string runs identically on Spark and DuckDB (no backrefs, no
# lookaround). Order matters: URLs first (an email-shaped userinfo inside a
# URL must redact as part of the URL), then emails, then bare IPv4s.
DEFAULT_SCRUB_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"https?://[^\s]+", "<URL>"),
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def scrub_text(
    df: DataFrame,
    text_col: str = "text",
    *,
    out_col: str = "text_scrubbed",
    patterns: Sequence[tuple[str, str]] = DEFAULT_SCRUB_PATTERNS,
) -> DataFrame:
    """PII/URL scrubbing: sequentially replace each ``(pattern, token)``
    pair and count the matches it redacted — the pre-training privacy
    pass (emails, URLs, IP addresses by default).

    Pure per-row ``regexp_replace``/``regexp_count`` expressions under
    whole-stage codegen — zero shuffle, linear scan. Counts are taken on
    the text as it stands BEFORE that pattern's replacement (so an email
    already swallowed by the URL pass is not double-counted).

    Output: input columns + ``out_col`` + ``n_redactions`` (total).
    """
    cur = F.col(text_col)
    counts = []
    for pat, token in patterns:
        counts.append(F.regexp_count(cur, F.lit(pat)))
        cur = F.regexp_replace(cur, pat, token)
    total = counts[0] if counts else F.lit(0)
    for c in counts[1:]:
        total = total + c
    return df.withColumn(out_col, cur).withColumn(
        "n_redactions", total.cast("long")
    )


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    *,
    top_n: int = 100,
) -> DataFrame:
    """Cumulative token coverage of the top-``top_n`` vocabulary — the
    'how big a vocab do I need' curve for tokenizer design: rank terms by
    corpus frequency and report what fraction of all token occurrences the
    top-k terms cover.

    Scale posture (the r6 verdict's one remaining nit, fixed r7): the
    top-``top_n`` page is taken FIRST with ``orderBy().limit(top_n)`` —
    Spark plans that as TakeOrderedAndProject (per-partition top-n +
    driver merge, fully distributed) — and only the ≤``top_n``-row page
    flows through the unpartitioned rank/cumsum window. The distinct-term
    table of a web-scale corpus is 10^8-10^9 rows (typos, URLs, numerals);
    it never funnels through one task here. Same pattern as
    ``build_vocab`` below. The denominator is the full-vocabulary total,
    computed as a 1-row aggregate and broadcast. All math is integer
    until the one final division (ties broken by term asc, so ranks are
    deterministic across engines).

    Output: ``(rank, term, term_count, cum_coverage)``.
    """
    tc = term_counts(df, text_col)
    total = tc.agg(F.sum("term_count").alias("__total"))
    page = tc.orderBy(F.desc("term_count"), F.asc("term")).limit(top_n)
    w = Window.orderBy(F.desc("term_count"), F.asc("term"))
    ranked = page.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "term",
        "term_count",
        F.sum("term_count")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("__cum"),
    )
    return ranked.crossJoin(F.broadcast(total)).select(
        "rank",
        "term",
        "term_count",
        F.round(F.col("__cum") / F.col("__total"), 6).alias("cum_coverage"),
    )


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    round_to: int = 6,
) -> DataFrame:
    """Per-document mean unigram log-probability — the cheap LM-free
    perplexity proxy used for corpus quality filtering (a doc of globally
    rare tokens scores low, boilerplate scores high).

    Two shuffles total: corpus term counts (map-side combined, vocab-sized
    result broadcast back onto the token stream) and the per-doc mean. The
    per-token ``ln(p)`` rounds to 9 decimals BEFORE the exact-decimal sum:
    a libm ulp difference between engines vanishes at 9 decimals, and
    decimal addition keeps the sum partition-order-independent.

    Output: ``(id_col, n_tokens, avg_logprob)``.
    """
    toks = df.select(F.col(id_col), F.explode(tokenize(text_col)).alias("term"))
    tf = toks.groupBy("term").agg(F.count(F.lit(1)).alias("__n"))
    total = tf.agg(F.sum("__n").alias("__total"))
    probs = tf.crossJoin(F.broadcast(total)).select(
        "term",
        F.round(F.log(F.col("__n") / F.col("__total")), 9)
        .cast("decimal(24,12)")
        .alias("__logp"),
    )
    return (
        toks.join(F.broadcast(probs), "term")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            # cast the exact decimal sum to double BEFORE dividing: one
            # IEEE double division on both engines (Spark decimal division
            # would round at decimal scale first and could differ in ulps)
            F.round(
                F.sum("__logp").cast("double") / F.count(F.lit(1)), round_to
            ).alias("avg_logprob"),
        )
    )


def ngram_novelty(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 3,
    min_df: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's distinct word
    n-grams that appear in fewer than ``min_df`` documents — high novelty
    marks original text, low novelty marks boilerplate/near-dup fodder.

    Inverted-index shape (same scale posture as the Jaccard family): one
    shuffle on the gram for document frequencies, one broadcast-or-shuffle
    join back, one per-doc aggregate. Grams are distinct-per-doc so df
    counts are plain ``count(*)``.

    Output: ``(id_col, n_grams, n_common, novelty)``.
    """
    from .dedup import shingles_from_tokens

    grams = (
        df.select(F.col(id_col), tokenize(text_col).alias("__toks"))
        .select(
            F.col(id_col),
            F.explode(shingles_from_tokens("__toks", n)).alias("gram"),
        )
    )
    gram_df = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("__df"))
    return (
        grams.join(gram_df, "gram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("__df") >= min_df, 1).otherwise(0))
            .cast("long")
            .alias("n_common"),
            F.round(
                F.lit(1.0)
                - F.sum(F.when(F.col("__df") >= min_df, 1).otherwise(0))
                / F.count(F.lit(1)),
                round_to,
            ).alias("novelty"),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 3,
    idf: str = "log",
) -> DataFrame:
    """Top-k TF-IDF terms per document.

    tf is the in-document term count; document frequency comes from one
    explode + groupBy over distinct (doc, term); idf is smoothed:

    * ``idf="log"``: ``ln((N+1)/(df+1)) + 1`` (sklearn-style smooth idf)
    * ``idf="rational"``: ``(N+1)/(df+1)`` — no transcendental function, so
      the score is BIT-IDENTICAL across engines (Java's ``Math.log`` and C
      libm may differ in the last ulp); use this variant when hash-checking
      against another engine. Rankings differ from "log" only when tf
      varies within a doc — both are standard weightings.

    Ties break deterministically (score desc, term asc). The corpus size N
    and per-term df are broadcast back as a tiny dim (|vocab| rows); the
    only wide shuffles are the (doc, term) groupBy and the per-doc top-k
    window — both hash-partitioned, no global sort.
    """
    if idf not in ("log", "rational"):
        raise ValueError(f"idf must be 'log' or 'rational', got {idf!r}")
    terms = df.select(F.col(id_col).alias("doc"), F.explode(tokenize(text_col)).alias("term"))
    tf = terms.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    ratio = (F.col("n_docs") + F.lit(1)).cast("double") / (F.col("df") + F.lit(1)).cast(
        "double"
    )
    idf_col = (F.log(ratio) + F.lit(1.0)) if idf == "log" else ratio
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .select("doc", "term", "tf", "df", (F.col("tf") * idf_col).alias("tfidf"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("doc").alias(id_col), "term", "tf", "df", "tfidf", F.col("rank").cast("long").alias("rank")
        )
    )


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    *,
    max_size: int = 1000,
    min_count: int = 1,
) -> DataFrame:
    """Frequency-ranked vocabulary with contiguous ids 0..max_size-1.

    Counting is the scalable part (explode + map-side-combined groupBy);
    id assignment is a deliberate TakeOrderedAndProject: the top
    ``max_size`` rows (count desc, term asc — deterministic ties) are a
    BOUNDED set, so the row_number window that stamps ids runs over at most
    ``max_size`` rows, never the corpus. That is the correct shape at any
    scale — a vocabulary is driver-sized by definition.
    """
    counts = term_counts(df, text_col, min_count=min_count)
    top = counts.orderBy(F.desc("term_count"), F.asc("term")).limit(max_size)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("term_count"), F.asc("term"))
    return top.withColumn("token_id", (F.row_number().over(w) - 1).cast("long")).select(
        "token_id", "term", "term_count"
    )


def with_repetition_cols(
    df: DataFrame,
    text_col: str = "text",
    *,
    n: int = 3,
    round_to: int = 4,
) -> DataFrame:
    """Append ``n_grams`` / ``n_distinct_grams`` / ``dup_gram_frac`` as
    per-row columns — zero shuffle, zero joins, so it composes into
    STREAMING plans unchanged (a stats-table join would be an unbounded
    stream-stream join). Two projection boundaries bind the token and gram
    arrays (the measured no-CSE-inside-HOF-lambdas rule, see ops/dedup.py
    docstrings).

    The gram column is additionally a PUSHDOWN FENCE: a downstream
    ``filter(dup_gram_frac <= x)`` would otherwise be substituted through
    these projections by PushDownPredicates, inlining the token-array
    expression INTO the transform lambda — interpreted HOF evaluation then
    re-tokenizes the document once per gram (measured: a corpus pass went
    from ~3 s to >9 min at sf0.1). Wrapping the gram expression in a
    nondeterministic no-op (``element_at(shuffle(array(grams)), 1)`` — a
    one-element shuffle is the identity, so the value is unchanged and
    results stay deterministic; ``rand()``-based guards don't work because
    the optimizer folds comparisons against rand's known [0,1) range)
    makes the projection non-substitutable, so filters stop above it and
    evaluate the MATERIALIZED columns once per row."""
    base = df.withColumn("__tk", tokenize(text_col))
    grams = F.when(
        F.size("__tk") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("__tk") - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice("__tk", i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = base.withColumn("__g", F.element_at(F.shuffle(F.array(grams)), 1))
    n_grams = F.size("__g")
    n_distinct = F.size(F.array_distinct("__g"))
    frac = F.when(n_grams == 0, F.lit(0.0)).otherwise(
        F.round(F.lit(1.0) - n_distinct.cast("double") / n_grams.cast("double"), round_to)
    )
    return (
        g.withColumn("n_grams", n_grams.cast("long"))
        .withColumn("n_distinct_grams", n_distinct.cast("long"))
        .withColumn("dup_gram_frac", frac)
        .drop("__tk", "__g")
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 3,
    round_to: int = 4,
) -> DataFrame:
    """Intra-document repetition (Gopher/C4-style quality signal): the
    fraction of duplicate word n-grams inside each document. High values
    mean boilerplate/looping text a training pipeline usually drops."""
    return with_repetition_cols(df, text_col, n=n, round_to=round_to).select(
        F.col(id_col), "n_grams", "n_distinct_grams", "dup_gram_frac"
    )


def fingerprint_contamination(
    left: DataFrame,
    right: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
    max_fp_df: Optional[int] = None,
    min_shared: int = 1,
) -> DataFrame:
    """Cross-set contamination check: which ``left`` (train) documents
    share winnowing fingerprints with any ``right`` (eval/benchmark)
    document — the decontamination primitive for training corpora.

    Any shared substring of length >= k + window - 1 guarantees a shared
    fingerprint (winnowing property), so detection is an equi-join on
    ``fp``. ``max_fp_df`` drops fingerprints whose document frequency
    across BOTH sets exceeds the cap before the join — the same hot-key
    guard as n-gram Jaccard (a boilerplate fingerprint with df=d costs
    d_left x d_right join rows); the df is computed on the union so the
    cap is one number with one tiny aggregate.

    Returns one row per contaminated left doc: ``(id, n_shared_fps,
    n_matched_docs)`` with ``n_shared_fps >= min_shared``.
    """
    # r12 opt: with the df cap on, each side feeds the union df count AND
    # its semi-join — materialize the (id, fp) indexes once instead of
    # re-running the winnowing char-gram explode per reference.
    lf = (
        winnowing_fingerprints(left, text_col, id_col, k=k, window=window)
        .select(F.col(id_col).alias("__lid"), "fp")
        .transform(materialize_once)
    )
    rf = (
        winnowing_fingerprints(right, text_col, id_col, k=k, window=window)
        .select(F.col(id_col).alias("__rid"), "fp")
        .transform(materialize_once)
    )
    if max_fp_df is not None:
        df_counts = (
            lf.select("fp").unionAll(rf.select("fp"))
            .groupBy("fp")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= max_fp_df)
            .select("fp")
        )
        lf = lf.join(df_counts, "fp", "left_semi")
        rf = rf.join(df_counts, "fp", "left_semi")
    joined = lf.join(rf, "fp")
    out = joined.groupBy("__lid").agg(
        F.count_distinct("fp").alias("n_shared_fps"),
        F.count_distinct("__rid").alias("n_matched_docs"),
    )
    return out.filter(F.col("n_shared_fps") >= min_shared).select(
        F.col("__lid").alias(id_col), "n_shared_fps", "n_matched_docs"
    )


def _doc_quality_exprs(text_col: str, *, round_to: int = 4) -> "list[Column]":
    """Module-private aliased per-document quality expressions — the exact
    columns :func:`doc_quality` publishes, exposed so single-scan fused
    callers (q48's training-corpus filter) can ride them on an existing
    projection instead of joining ``doc_quality(docs)`` back by id."""
    toks = tokenize(text_col)
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    total_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return [
        F.length(F.col(text_col)).cast("long").alias("n_chars_actual"),
        n_tokens.cast("long").alias("n_tokens"),
        n_distinct.cast("long").alias("n_distinct_tokens"),
        F.round(F.try_divide(n_distinct.cast("double"), n_tokens.cast("double")), round_to).alias(
            "type_token_ratio"
        ),
        F.round(F.try_divide(total_len.cast("double"), n_tokens.cast("double")), round_to).alias(
            "mean_token_len"
        ),
    ]


def doc_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    round_to: int = 4,
) -> DataFrame:
    """Per-document quality metrics: length, token counts, type-token
    ratio, mean token length. Everything derives from one pass over the
    text column — no shuffle at all (narrow transformation)."""
    return df.select(
        F.col(id_col), *_doc_quality_exprs(text_col, round_to=round_to)
    )


def lang_stats(
    df: DataFrame,
    *,
    lang_col: str = "lang",
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """Per-language corpus stats (doc count, avg chars, avg tokens).

    Averages are computed from exact integer sums and divided once at the
    end — deterministic across partitionings (no float accumulation
    order-dependence)."""
    n_tok = token_count(text_col)
    return (
        df.groupBy(lang_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length(text_col)).alias("__chars"),
            F.sum(n_tok).alias("__toks"),
        )
        .select(
            F.col(lang_col),
            F.col("n_docs"),
            F.round(F.col("__chars").cast("double") / F.col("n_docs"), round_to).alias("avg_chars"),
            F.round(F.col("__toks").cast("double") / F.col("n_docs"), round_to).alias("avg_tokens"),
        )
    )


# Tiny marker vocabularies for the n-gram/stopword language-ID heuristic.
# Real pipelines plug in their own (or a trained model via mapInPandas);
# the operator shape — per-language hit counting + argmax — is what scales.
DEFAULT_LANG_MARKERS: Mapping[str, Sequence[str]] = {
    "en": ("the", "and", "of", "a", "to", "in"),
    "es": ("el", "la", "de", "y", "que", "en"),
    "de": ("der", "die", "das", "und", "ist", "von"),
    "fr": ("le", "la", "et", "les", "des", "un"),
    "zh": ("的", "是", "了", "在", "我", "有"),
}


def _langid_hit_exprs(
    text_col: str, markers: Mapping[str, Sequence[str]]
) -> "list[tuple[str, Column]]":
    """(lang, hit-count expression) per language, sorted by language name —
    the shared building block of :func:`language_id` and the single-scan
    fused callers (:func:`_langid_pred_expr`)."""
    toks = tokenize(text_col)
    out = []
    for lang in sorted(markers):
        marker_arr = F.array(*[F.lit(m) for m in markers[lang]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))
        out.append((lang, hits.cast("long")))
    return out


def _langid_argmax(hit_by_lang: "list[tuple[str, Column]]", default_lang: str) -> Column:
    """Argmax over per-language hit columns/expressions with the pinned
    tie-break (earlier language name wins; zero hits -> default) — the
    exact `when()`-chain :func:`language_id` publishes."""
    best = F.greatest(*[c for _, c in hit_by_lang])
    # reversed so earlier languages win ties (when() chains first-match)
    chain = None
    for lang, c in hit_by_lang:
        cond = c == best
        chain = F.when(cond, F.lit(lang)) if chain is None else chain.when(cond, F.lit(lang))
    return F.when(best > 0, chain).otherwise(F.lit(default_lang))


def _langid_pred_expr(
    text_col: str,
    markers: Mapping[str, Sequence[str]] = DEFAULT_LANG_MARKERS,
    *,
    default_lang: str = "unknown",
) -> Column:
    """Module-private INLINE ``predicted_lang`` expression (r13 optimization
    round): the exact argmax :func:`language_id` computes, as one narrow
    per-row Column, so callers that only need the prediction can ride it on
    an existing scan instead of joining ``language_id(docs)`` back onto
    ``docs`` by id — that join is a full-corpus self-join (2 scans + a
    doc_id shuffle or broadcast) carrying zero information at 100 TB.
    Value-identical to ``language_id(df)[\"predicted_lang\"]`` per row
    (pinned by tests/test_ops.py::test_langid_pred_expr_matches_op); the
    hit expressions are repeated inside greatest()/when() instead of bound
    once, which Spark's codegen subexpression elimination collapses."""
    hits = _langid_hit_exprs(text_col, markers)
    return _langid_argmax(hits, default_lang)


def language_id(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    markers: Mapping[str, Sequence[str]] = DEFAULT_LANG_MARKERS,
    *,
    default_lang: str = "unknown",
) -> DataFrame:
    """Heuristic language ID: count marker-token hits per language, take
    the argmax (ties break on language name order; zero hits -> default).

    Hit counting is ``size(array_intersect/filter)`` over the token array —
    a narrow per-row expression; the operator adds no shuffle."""
    hit_exprs = _langid_hit_exprs(text_col, markers)
    out = df.select(
        F.col(id_col), *[c.alias(f"hits_{lang}") for lang, c in hit_exprs]
    )
    bound = [(lang, F.col(f"hits_{lang}")) for lang, _ in hit_exprs]
    return out.withColumn("predicted_lang", _langid_argmax(bound, default_lang))


def char_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_count: int = 1,
) -> DataFrame:
    """Corpus-wide adjacent character-pair frequencies — BPE iteration
    zero's statistic (Sennrich et al., ACL'16), weighted by word frequency.

    Two stacked aggregates: words -> (word, count) collapses the corpus to
    its vocabulary FIRST (the shuffle carries |vocab|, not |tokens|), then
    each distinct word explodes into its ``len-1`` adjacent 2-grams with
    the word count as the weight. All higher-order-function/substring
    Column math — JVM-side, no Python.

    Returns (pair, pair_count). 100 TB posture: pass 1 is the classic
    word-count (map-side combined); pass 2 runs over the vocabulary — a
    few million rows however big the corpus is.
    """
    words = (
        df.select(F.explode(tokenize(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    pairs = words.select(
        F.explode(
            F.when(
                F.length("w") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.length("w") - 1, F.lit(1))),
                    lambda i: F.col("w").substr(i, F.lit(2)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pair"),
        "wc",
    )
    out = pairs.groupBy("pair").agg(F.sum("wc").alias("pair_count"))
    if min_count > 1:
        out = out.filter(F.col("pair_count") >= min_count)
    return out


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    *,
    n_merges: int = 10,
    batch_size: int = 16,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges over the corpus, distributed, with
    PROVABLY-GREEDY merge batching.

    The textbook greedy loop (Sennrich et al., ACL'16) re-expressed for
    Spark: the corpus collapses ONCE to the (word, count) vocabulary
    table; each ROUND (a) counts adjacent symbol pairs across the
    vocabulary weighted by word count — one explode + one map-side-combined
    aggregate, (b) collects the top-K pairs (one small driver probe) and
    selects a batch of up to ``batch_size`` merges that serial greedy
    would provably pick in exactly this order, (c) rewrites each word's
    symbol array with ALL batch pairs merged left-to-right in one pure
    ``F.aggregate`` fold — no Python in the loop body.

    Batch safety (identical output to batch_size=1, not an
    approximation): walk the (count desc, pair asc) list, batching pairs
    until the first pair that shares a symbol with an earlier batch
    member; let ``c_bound`` be that pair's count (or the first unbatched
    row's count). Every pair a batch merge can create or touch shares a
    symbol with a batch pair, so its count is <= c_bound; batch pairs are
    pairwise symbol-disjoint, so their counts are invariant under each
    other. Keeping only batch pairs with count STRICTLY above c_bound
    (plus the always-correct top-1) means nothing can overtake them
    between the batched steps — serial greedy picks exactly these pairs
    in this order. Ties inside the batch resolve lexicographically, the
    same order the sort already imposes.

    Returns the learned merge list [(left, right), ...] in order.

    100 TB posture: the corpus is touched once (word count); every round
    runs over the |vocab|-row table (~millions of rows at any corpus
    size), with a localCheckpoint every few rounds to stop lineage
    growth — same discipline as the connected-components loop
    (`ops/graph.py`). At production vocab sizes (30-50k merges) batching
    cuts driver round-trips and Spark jobs ~batch_size x vs the r4
    one-job-per-merge loop.
    """
    spark_df = (
        df.select(F.explode(tokenize(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
        .select(F.split("w", "").alias("syms"), "wc")
    )
    # Spark's split('abc', '') yields ['a','b','c'] (no trailing empty)
    vocab = spark_df.transform(checkpoint_round)
    merges: list[tuple[str, str]] = []
    batch_size = max(1, int(batch_size))
    rounds = 0
    # Adaptive probe (r7): c_bound is the count of the first conflicting
    # or unbatched probe row — when the count profile has a flat tail,
    # the strict-majority truncation collapses batches toward 1 even
    # with no symbol conflicts. Probing DEEPER lowers the no-conflict
    # bound (it becomes the k-th row's count), admitting more provably
    # safe merges per round, at the cost of a slightly larger driver
    # collect (still <= 64*batch_size rows). The batching invariant is
    # untouched — only how many candidate rows the driver sees.
    k_mult = 4
    while len(merges) < n_merges:
        pair_counts = (
            vocab.select(
                F.explode(
                    F.when(
                        F.size("syms") >= 2,
                        F.transform(
                            F.sequence(F.lit(0), F.greatest(F.size("syms") - 2, F.lit(0))),
                            lambda i: F.struct(
                                F.element_at("syms", i + 1).alias("l"),
                                F.element_at("syms", i + 2).alias("r"),
                            ),
                        ),
                    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
                ).alias("p"),
                "wc",
            )
            .groupBy("p")
            .agg(F.sum("wc").alias("c"))
        )
        k_probe = batch_size * k_mult
        top = (
            pair_counts.orderBy(F.desc("c"), F.asc("p.l"), F.asc("p.r"))
            .limit(k_probe)
            .collect()
        )
        if not top:
            break
        rows = [(r["p"]["l"], r["p"]["r"], int(r["c"])) for r in top]
        table_exhausted = len(rows) < k_probe
        want = min(batch_size, n_merges - len(merges))
        batch: list[tuple[str, str, int]] = []
        used: set[str] = set()
        c_bound = 0 if table_exhausted else rows[-1][2]
        for l, r, c in rows:
            if len(batch) >= want or l in used or r in used:
                c_bound = c
                break
            batch.append((l, r, c))
            used.add(l)
            used.add(r)
        # strict-majority truncation: only pairs whose count cannot be
        # matched by any pair outside the batch survive; the top-1 pick
        # is unconditionally greedy-correct.
        batch = [batch[0]] + [b for b in batch[1:] if b[2] > c_bound]
        merges.extend((l, r) for l, r, _ in batch)
        # adapt the probe depth to the realized batch: truncation-starved
        # rounds probe deeper next time; full batches decay back
        if len(batch) < max(1, want // 2):
            k_mult = min(k_mult * 2, 64)
        elif len(batch) >= want:
            k_mult = max(4, k_mult // 2)

        def _merged(hold: Column, s: Column) -> Column:
            """NULL unless (hold, s) is a batch pair; else the fused symbol."""
            expr = F.lit(None).cast("string")
            for bl, br, _ in reversed(batch):
                expr = F.when(
                    (hold == F.lit(bl)) & (s == F.lit(br)), F.lit(bl + br)
                ).otherwise(expr)
            return expr

        # left-to-right greedy merge as a fold: carry (out array, pending
        # symbol); when (pending, current) hits any batch pair emit the
        # fused symbol, else flush pending. NULL pending marks 'nothing
        # held'. Batch pairs are symbol-disjoint, so one fold applies all
        # of them exactly as consecutive single-pair folds would.
        fold = F.aggregate(
            "syms",
            F.struct(
                F.array().cast("array<string>").alias("out"),
                F.lit(None).cast("string").alias("hold"),
            ),
            lambda acc, s: F.when(
                _merged(acc["hold"], s).isNotNull(),
                F.struct(
                    F.concat(acc["out"], F.array(_merged(acc["hold"], s))).alias("out"),
                    F.lit(None).cast("string").alias("hold"),
                ),
            ).otherwise(
                F.struct(
                    F.when(
                        acc["hold"].isNotNull(), F.concat(acc["out"], F.array(acc["hold"]))
                    )
                    .otherwise(acc["out"])
                    .alias("out"),
                    s.alias("hold"),
                )
            ),
            lambda acc: F.when(
                acc["hold"].isNotNull(), F.concat(acc["out"], F.array(acc["hold"]))
            ).otherwise(acc["out"]),
        )
        vocab = vocab.select(fold.alias("syms"), "wc")
        rounds += 1
        if rounds % 4 == 0:
            vocab = vocab.transform(checkpoint_round)
    return merges


# Stopword set used by the Gopher-style "contains common English words"
# screen (Rae et al. 2021 use {the, be, to, of, and, that, have, with}).
GOPHER_STOPWORDS: Sequence[str] = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_stopword_hits: int = 2,
    stopwords: Sequence[str] = GOPHER_STOPWORDS,
    round_to: int = 4,
) -> DataFrame:
    """Gopher-style heuristic quality rules (Rae et al. 2021 §A1.1) as
    per-document boolean flags plus the underlying measurements.

    Rules: word count in [min_words, max_words]; mean word length in
    [min_mean_word_len, max_mean_word_len]; symbol-to-word ratio (``#`` and
    ellipsis) below max_symbol_word_ratio; share of words containing at
    least one alphabetic character above min_alpha_word_ratio; at least
    min_stopword_hits distinct common stopwords present.

    Zero shuffle: every measurement is a higher-order-function fold over
    the token array inside whole-stage codegen — this runs at scan speed
    over 100 TB and the flags feed a plain filter (pushed into the same
    stage). Output: measurements + one boolean per rule + ``passes_gopher``.
    """
    bound = df.select(F.col(id_col), F.col(text_col), tokenize(text_col).alias("__toks"))
    meas = _gopher_measure_exprs(
        text_col, F.col("__toks"), stopwords=stopwords, round_to=round_to
    )
    out = bound.select(
        F.col(id_col), *[v.alias(k) for k, v in meas.items()]
    )
    fl = _gopher_flag_exprs(
        min_words=min_words,
        max_words=max_words,
        min_mean_word_len=min_mean_word_len,
        max_mean_word_len=max_mean_word_len,
        max_symbol_word_ratio=max_symbol_word_ratio,
        min_alpha_word_ratio=min_alpha_word_ratio,
        min_stopword_hits=min_stopword_hits,
    )
    flags = out.select("*", *[v.alias(k) for k, v in fl.items()])
    return flags.select(
        "*",
        (
            F.col("ok_words")
            & F.col("ok_mean_word_len")
            & F.col("ok_symbol_ratio")
            & F.col("ok_alpha_ratio")
            & F.col("ok_stopwords")
        ).alias("passes_gopher"),
    )


def _gopher_measure_exprs(
    text_col: str,
    toks: Column,
    *,
    stopwords: Sequence[str],
    round_to: int,
) -> "dict[str, Column]":
    """Module-private: the five per-document Gopher measurement
    expressions (ROUNDED, exactly as published) keyed by output column
    name — shared by :func:`gopher_quality_flags` and the one-scan
    screen-battery fusion :func:`_screen_flags` so the two can never
    drift (r13 optimization round)."""
    n_words = F.size(toks)
    total_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    mean_len = F.try_divide(total_len.cast("double"), n_words.cast("double"))
    n_symbols = (
        F.regexp_count(F.col(text_col), F.lit(r"#"))
        + F.regexp_count(F.col(text_col), F.lit(r"\.\.\.|…"))
    )
    symbol_ratio = F.try_divide(n_symbols.cast("double"), n_words.cast("double"))
    n_alpha_words = F.size(F.filter(toks, lambda t: t.rlike(r"\p{L}")))
    alpha_ratio = F.try_divide(n_alpha_words.cast("double"), n_words.cast("double"))
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    stop_hits = F.size(F.array_intersect(F.array_distinct(toks), stop_arr))
    return {
        "n_words": n_words.cast("long"),
        "mean_word_len": F.round(mean_len, round_to),
        "symbol_word_ratio": F.round(symbol_ratio, round_to),
        "alpha_word_ratio": F.round(alpha_ratio, round_to),
        "stopword_hits": stop_hits.cast("long"),
    }


def _gopher_flag_exprs(
    *,
    min_words: int,
    max_words: int,
    min_mean_word_len: float,
    max_mean_word_len: float,
    max_symbol_word_ratio: float,
    min_alpha_word_ratio: float,
    min_stopword_hits: int,
) -> "dict[str, Column]":
    """Module-private: the five Gopher rule flags as expressions over the
    ROUNDED measurement columns by name (``n_words`` …) — shared by
    :func:`gopher_quality_flags` and :func:`_screen_flags`."""
    return {
        "ok_words": (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words),
        "ok_mean_word_len": (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len),
        "ok_symbol_ratio": F.col("symbol_word_ratio") <= max_symbol_word_ratio,
        "ok_alpha_ratio": F.col("alpha_word_ratio") >= min_alpha_word_ratio,
        "ok_stopwords": F.col("stopword_hits") >= min_stopword_hits,
    }


def char_entropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    round_to: int = 6,
) -> DataFrame:
    """Per-document Shannon entropy (nats) of the character distribution —
    the cheap gibberish / low-diversity screen (mashed-key junk scores low;
    natural prose sits in a narrow band per language).

    Zero shuffle and zero explode: the per-document character histogram is
    built row-locally with higher-order functions — ``array_distinct`` over
    the char array (alphabet-bounded, so the inner count loop is
    O(alphabet x n_chars) per row, alphabet <= a few dozen) — and the
    entropy sum folds over the distinct-char counts. Each per-char term
    ``p*ln(p)`` is quantized to 1e-12 and accumulated as an exact integer,
    so the sum is summation-order-free and a 1-ulp libm difference between
    engines cannot reach the 6-decimal output.
    """
    chars = F.col("__chars")
    bound = df.select(
        F.col(id_col), F.split(F.col(text_col), "").alias("__chars")
    )
    return bound.select(
        F.col(id_col),
        F.size(chars).cast("long").alias("n_chars"),
        _char_entropy_expr(chars, round_to=round_to).alias("char_entropy"),
    )


def _char_entropy_expr(chars: Column, *, round_to: int) -> Column:
    """Module-private: the rounded per-row character-entropy expression
    over a pre-split char array column — shared by :func:`char_entropy`
    and the one-scan screen-battery fusion :func:`_screen_flags`."""
    n = F.size(chars)

    def _term(k: Column) -> Column:
        p = k.cast("double") / n.cast("double")
        return F.round(p * F.log(p) * F.lit(1e12)).cast("long")

    per_char = F.transform(
        F.array_distinct(chars),
        lambda c: F.size(F.filter(chars, lambda x: x == c)),
    )
    ent = -(
        F.aggregate(per_char, F.lit(0).cast("long"), lambda acc, k: acc + _term(k)).cast(
            "double"
        )
        / F.lit(1e12)
    )
    return F.round(F.when(n > 0, ent).otherwise(F.lit(0.0)), round_to)


def frequent_terms(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1000,
    *,
    force_local_threshold: Optional[int] = None,
    n_partitions: Optional[int] = None,
) -> DataFrame:
    """EXACT support-threshold heavy hitters (every term with global count
    >= ``min_count``) with pigeonhole candidate pruning — the long-tail
    vocabulary never crosses the wire.

    Phase 1 (no shuffle): each partition counts its own tokens in one
    Arrow-batched ``mapInPandas`` pass (per-partition imperative state is
    the one job built-ins can't express) and emits only terms with local
    count >= ceil(min_count / P). Pigeonhole guarantees the survivors are
    a superset of every global heavy hitter: a term with global count >=
    min_count must reach that local bar in at least one of the P
    partitions. Phase 2: the candidate set (tiny by construction) is
    re-counted EXACTLY with a plain map-side-combined groupBy after a
    semi-join, and filtered to >= min_count — so the output is exact and
    oracle-equal to ``GROUP BY term HAVING count >= m``, while the shuffle
    carries only candidate terms instead of the full long-tail vocabulary.

    The pigeonhole bar needs the RUNTIME partition count P: a bar derived
    from an underestimate of P is too high and silently drops heavy
    hitters. The count is NOT probed via ``df.rdd`` (the
    ``sources/readers.py`` rule: under AQE that materializes query
    stages); instead phase 1 emits one marker row per partition alongside
    the candidates, the candidate set is checkpointed (it must
    materialize anyway for the broadcast), and the marker count is read
    off the tiny checkpointed frame. If the assumed P (defaultParallelism
    floor, or ``n_partitions``) proves too low, phase 1 re-runs once with
    the measured P — the bar is sound by construction, never by luck.

    100 TB posture: phase 1 is scan-speed with O(local vocab) memory per
    task; phase 2's semi-join broadcasts while the candidate set fits and
    degrades to a hash join on the (uniform) term otherwise.

    Output: ``(term, n)`` — exact global counts of the heavy hitters.
    """
    spark = df.sparkSession
    toks = df.select(F.explode(tokenize(text_col)).alias("term"))

    def _phase1(local_bar: int) -> DataFrame:
        def _local_counts(batches):
            import pandas as pd  # noqa: PLC0415
            from pyspark import TaskContext  # noqa: PLC0415

            counts: dict[str, int] = {}
            for pdf in batches:
                for t, c in pdf["term"].value_counts().items():
                    counts[t] = counts.get(t, 0) + int(c)
            heavy = [t for t, c in counts.items() if c >= local_bar]
            pid = TaskContext.get().partitionId()
            # one NULL-term marker row per partition: the runtime P probe
            yield pd.DataFrame(
                {"term": heavy + [None], "pid": [pid] * (len(heavy) + 1)}
            )

        return toks.mapInPandas(_local_counts, "term string, pid int").localCheckpoint(
            eager=True
        )

    p_assumed = max(1, int(n_partitions or spark.sparkContext.defaultParallelism))
    for _ in range(3):
        local_bar = (
            int(force_local_threshold)
            if force_local_threshold is not None
            else max(1, -(-int(min_count) // p_assumed))
        )
        phase1 = _phase1(local_bar)
        p_actual = phase1.filter(F.col("term").isNull()).count()
        if force_local_threshold is not None or local_bar == 1 or p_actual <= p_assumed:
            break
        p_assumed = p_actual  # bar was too high — rerun with measured P
    else:
        raise RuntimeError(
            "frequent_terms: partition count kept growing across reruns; "
            "pass n_partitions= explicitly"
        )

    candidates = phase1.filter(F.col("term").isNotNull()).select("term").distinct()
    return (
        toks.join(F.broadcast(candidates), "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= F.lit(int(min_count)))
    )


def bpe_encode(
    df: DataFrame,
    merges: Sequence[tuple[str, str]],
    alphabet: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply learned BPE merges (``bpe_train`` output) to a corpus —
    the tokenizer-apply half of the tokenizer story (train -> encode ->
    ``pack_sequences``).

    Encoding applies each merge in learned order, left-to-right within
    every word — exactly the trainer's rewrite rule, so encode(train
    corpus) reproduces the trained vocabulary states. Token ids are
    deterministic: sorted base alphabet first, then merged symbols in
    merge order; characters outside the alphabet map to id -1 (the UNK
    convention callers can re-map).

    The kernel is an Arrow-batched ``mapInPandas`` (a per-symbol Python
    loop is genuinely inexpressible as Column ops for realistic merge
    counts); the merge table and alphabet broadcast with the closure.
    Zero shuffle — encoding is embarrassingly parallel, scan-speed at
    100 TB.

    Output: ``(id_col, n_tokens, token_ids array<int>)``.
    """
    merge_list = [tuple(m) for m in merges]
    vocab: dict[str, int] = {}
    for ch in sorted(set(alphabet)):
        vocab[ch] = len(vocab)
    for left, right in merge_list:
        sym = left + right
        if sym not in vocab:
            vocab[sym] = len(vocab)

    def _encode(batches):
        import pandas as pd  # noqa: PLC0415

        def enc_word(word: str) -> list[int]:
            syms = list(word)
            for left, right in merge_list:
                out: list[str] = []
                i = 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return [vocab.get(s, -1) for s in syms]

        for pdf in batches:
            ids = [
                [t for w in str(txt).lower().split() for t in enc_word(w)]
                for txt in pdf[text_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_tokens": [len(x) for x in ids],
                    "token_ids": ids,
                }
            )

    schema = f"{id_col} long, n_tokens long, token_ids array<int>"
    return df.select(id_col, text_col).mapInPandas(_encode, schema)


def bm25_topk(
    df: DataFrame,
    query_terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 20,
) -> DataFrame:
    """Okapi BM25 retrieval: top-k documents for a bag-of-terms query.

    score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    with the rational idf (N - df + 0.5) / (df + 0.5) — Robertson's idf
    without the log, so every factor is plain IEEE arithmetic (correctly
    rounded, engine-independent; ln is the one op where JVM and C libm may
    drift an ulp). Per-term contributions are rounded then summed as EXACT
    decimals, so partial-aggregation order cannot change the total, and
    the final ordering key is that exact decimal — deterministic top-k
    (ties broken by id) on any engine.

    100 TB posture: the explode is pre-filtered to the query terms, so the
    per-doc tf table is |query| rows per matching doc, never the corpus
    vocabulary; df/N/avgdl are a tiny broadcast; the top-k is a
    distributed TakeOrderedAndProject (no single-task global sort), and
    the rank stamp runs over <= k collected rows.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})
    toks = tokenize(text_col)
    base = df.select(F.col(id_col).alias("doc"), toks.alias("__tk"))
    lengths = base.select("doc", F.size("__tk").cast("long").alias("dl"))
    stats = lengths.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_dl"),
    )
    # dl rides the exploded rows and folds back out as max() per group
    # (constant within a (doc, term) group), so the per-doc tf table never
    # needs a join back against the full-corpus lengths table — that join
    # shuffled every doc's length for a tf table of only matching docs.
    tf = (
        base.select("doc", F.size("__tk").cast("long").alias("dl"), F.explode("__tk").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    avgdl = F.col("total_dl").cast("double") / F.col("n_docs").cast("double")
    idf = (F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5)) / (
        F.col("df").cast("double") + F.lit(0.5)
    )
    norm = (F.col("tf").cast("double") * F.lit(k1 + 1.0)) / (
        F.col("tf").cast("double")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / avgdl)
    )
    contrib = F.round(idf * norm, 9).cast("decimal(24,12)")
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc")
        .agg(
            F.sum(contrib).alias("__score_exact"),
            F.count(F.lit(1)).alias("n_query_terms_hit"),
        )
        .orderBy(F.desc("__score_exact"), F.asc("doc"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("__score_exact"), F.asc("doc"))
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).select(
        F.col("doc").alias(id_col),
        "rank",
        "n_query_terms_hit",
        F.round(F.col("__score_exact").cast("double"), 6).alias("bm25"),
    )


def bm25_topk_multi(
    df: DataFrame,
    queries: Sequence[tuple[str, Sequence[str]]],
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 20,
) -> DataFrame:
    """Okapi BM25 top-k for a BATTERY of bag-of-terms queries in one corpus
    pass. Per-qid output is identical to calling ``bm25_topk`` once per
    query: every per-(doc, term) contribution is the same rounded decimal,
    per-query sums are exact decimals (order-free), and the per-qid total
    order (score desc, doc asc) is the same — only the plan is shared.

    Sharing: tokenize / lengths / corpus stats / tf / df are computed ONCE
    over the union of all query term sets instead of once per query (a
    5-query battery previously re-tokenized the corpus 10x). Per-query
    scoring attaches a tiny broadcast (qid, term) table to the shared tf.

    100 TB posture: the grouped top-k is TWO-PHASE — a per-(qid, doc-hash
    bucket) row_number bounds every sort partition, then the global per-qid
    rank runs over <= n_buckets * k survivors — so no single task ever
    sorts a whole query's matching corpus. Both window shuffles move only
    (qid, doc, exact-score) metadata rows, never text.
    """
    if not queries:
        raise ValueError("queries must be non-empty")
    if len({qid for qid, _ in queries}) != len(queries):
        # a repeated qid would silently merge two queries' term sets into
        # one ranking, breaking the documented per-qid equivalence with
        # bm25_topk (r12 ADVICE)
        raise ValueError("duplicate qid in queries")
    battery: list[tuple[str, list[str]]] = []
    union_terms: set[str] = set()
    for qid, qt in queries:
        if not qt:
            raise ValueError("query_terms must be non-empty")
        tset = sorted({t.lower() for t in qt})
        battery.append((qid, tset))
        union_terms.update(tset)
    all_terms = sorted(union_terms)

    toks = tokenize(text_col)
    base = df.select(F.col(id_col).alias("doc"), toks.alias("__tk"))
    lengths = base.select("doc", F.size("__tk").cast("long").alias("dl"))
    stats = lengths.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_dl"),
    )
    tf = (
        base.select("doc", F.size("__tk").cast("long").alias("dl"), F.explode("__tk").alias("term"))
        .filter(F.col("term").isin(all_terms))
        .groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
    )
    # df(term) over the union term set equals the single-query df for every
    # term of every battery member (df depends only on the corpus + term)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = df.sparkSession.createDataFrame(
        [(qid, t) for qid, tset in battery for t in tset], "qid string, term string"
    )
    avgdl = F.col("total_dl").cast("double") / F.col("n_docs").cast("double")
    idf = (F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5)) / (
        F.col("df").cast("double") + F.lit(0.5)
    )
    norm = (F.col("tf").cast("double") * F.lit(k1 + 1.0)) / (
        F.col("tf").cast("double")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / avgdl)
    )
    contrib = F.round(idf * norm, 9).cast("decimal(24,12)")
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("qid", "doc")
        .agg(
            F.sum(contrib).alias("__score_exact"),
            F.count(F.lit(1)).alias("n_query_terms_hit"),
        )
    )
    # two-phase grouped top-k: any global top-k member has < k better rows
    # in its own bucket, so it survives phase 1; phase 2 ranks survivors in
    # the identical total order, giving the exact single-query ranks 1..k.
    order = [F.desc("__score_exact"), F.asc("doc")]
    w_local = Window.partitionBy("qid", "__b").orderBy(*order)
    w_global = Window.partitionBy("qid").orderBy(*order)
    pages = (
        scored.withColumn("__b", F.pmod(F.xxhash64("doc"), F.lit(64)))
        .withColumn("__r", F.row_number().over(w_local))
        .filter(F.col("__r") <= F.lit(k))
        .withColumn("rank", F.row_number().over(w_global).cast("long"))
        .filter(F.col("rank") <= F.lit(k))
    )
    return pages.select(
        "qid",
        F.col("doc").alias(id_col),
        "rank",
        "n_query_terms_hit",
        F.round(F.col("__score_exact").cast("double"), 6).alias("bm25"),
    )


def c4_line_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    line_sep: Optional[str] = None,
    tokens_per_line: int = 12,
    min_words: int = 5,
    blocklist: Sequence[str] = ("javascript", "cookies", "lorem"),
    drop_braces: bool = True,
    require_terminal_punct: bool = False,
) -> DataFrame:
    """C4-style LINE-level cleaning (Raffel et al. 2020 §2.2): drop lines
    that are too short, contain a blocklisted word, contain curly braces
    (code leakage), or (optionally) lack terminal punctuation — then
    re-assemble each document from its surviving lines, in order.

    Lines come from ``line_sep`` (a split regex, e.g. ``'\\n'``) when the
    corpus has natural breaks, else fixed ``tokens_per_line`` token
    windows (for pre-flattened corpora). All rules evaluate as
    higher-order-function folds over the line array — zero shuffle, the
    whole operator runs inside whole-stage codegen at scan speed, so it
    holds at any corpus size with no partition-layout caveats.

    Output: ``(id_col, n_lines, n_kept, clean_text)`` — one row per doc,
    including docs where every line was dropped (``clean_text = ''``).
    """
    block = F.array(*[F.lit(w) for w in blocklist])

    def _keep(line: Column) -> Column:
        words = F.filter(F.split(F.lower(line), r"\s+"), lambda t: t != F.lit(""))
        cond = F.size(words) >= F.lit(min_words)
        cond = cond & ~F.exists(words, lambda w: F.array_contains(block, w))
        if drop_braces:
            cond = cond & ~line.contains("{") & ~line.contains("}")
        if require_terminal_punct:
            cond = cond & line.rlike(r'[.!?"]\s*$')
        return cond

    if line_sep is not None:
        lines = F.filter(F.split(F.col(text_col), line_sep), lambda s: F.length(s) > 0)
        out = df.select(F.col(id_col), lines.alias("__lines"))
    else:
        # token-window lines: bind the token array to a real column before
        # the HOF (no CSE inside lambdas — see shingles_from_tokens).
        base_tk = F.col("__tk")
        n_lines = F.ceil(F.size(base_tk) / F.lit(tokens_per_line)).cast("int")
        windows = F.transform(
            F.sequence(F.lit(0), F.greatest(n_lines, F.lit(1)) - 1),
            lambda i: F.concat_ws(
                " ", F.slice(base_tk, i * tokens_per_line + 1, tokens_per_line)
            ),
        )
        out = (
            df.select(F.col(id_col), tokenize(text_col).alias("__tk"))
            .select(
                id_col,
                F.filter(windows, lambda s: F.length(s) > 0).alias("__lines"),
            )
        )
    kept = F.filter(F.col("__lines"), _keep)
    return out.select(
        id_col,
        F.size("__lines").cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        F.array_join(kept, " " if line_sep is None else "\n").alias("clean_text"),
    )


def encoding_screen(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Byte/char-level encoding hygiene profile — the mojibake/control-char
    screen a web-scale ingest runs before any tokenizer sees the bytes.

    Per document: char vs UTF-8 byte length (multi-byte detection),
    whitespace / alphabetic / digit ratios, U+FFFD replacement-character
    and C0/C1-control counts, and an ``ok_encoding`` flag (no replacement
    chars, no control chars). Counts use length-difference over
    ``replace``/``regexp_replace`` with explicit byte-range classes so
    Java regex and RE2 agree. Pure per-row Column expressions: zero
    shuffle, scan-speed at any scale.
    """
    t = F.col(text_col)
    n_chars = F.length(t)

    def _n(cls: str) -> Column:
        return (n_chars - F.length(F.regexp_replace(t, cls, ""))).cast("long")

    n_repl = (n_chars - F.length(F.regexp_replace(t, "�", ""))).cast("long")
    n_ctrl = _n(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")
    ratio = lambda c: F.round(
        F.when(n_chars > 0, c.cast("double") / n_chars.cast("double")).otherwise(0.0), 4
    )
    n_ws = _n(r"[ \t\r\n]")
    n_alpha = _n("[a-zA-Z]")
    n_digit = _n("[0-9]")
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        F.octet_length(t).cast("long").alias("n_bytes"),
        (F.octet_length(t) == n_chars).alias("ascii_width"),
        n_ws.alias("n_ws"),
        ratio(n_ws).alias("ws_ratio"),
        ratio(n_alpha).alias("alpha_ratio"),
        ratio(n_digit).alias("digit_ratio"),
        n_repl.alias("n_replacement"),
        n_ctrl.alias("n_control"),
        ((n_repl == 0) & (n_ctrl == 0)).alias("ok_encoding"),
    )


def unigram_drift(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group distribution-drift monitor: add-1-smoothed KL divergence
    of each group's unigram distribution from the corpus distribution —
    the standard check that one crawl/source/day has not drifted away
    from the mix the model was tuned on.

    KL(g ‖ corpus) = Σ_t p_g(t) · ln(p_g(t) / p_c(t)) over the FULL corpus
    vocabulary (terms absent from the group contribute their smoothed
    floor mass). Per-term contributions are rounded to 9 decimals and
    summed as exact decimals so partial-aggregation order cannot move the
    total; ``ln`` is the only libm call (same cross-engine posture as the
    DSIR scorer).

    100 TB posture: one explode + one (group, term) map-side-combined
    aggregate; the vocabulary × groups completion is a broadcast of the
    per-group totals (|G| rows) against the vocab table — |V|·|G| rows,
    linear in vocabulary size, never in corpus size.
    """
    toks = df.select(
        F.col(group_col).alias("grp"), F.explode(tokenize(text_col)).alias("term")
    )
    cgt = toks.groupBy("grp", "term").agg(F.count(F.lit(1)).alias("c_gt"))
    vocab = cgt.groupBy("term").agg(F.sum("c_gt").alias("c_t"))
    totals = cgt.groupBy("grp").agg(F.sum("c_gt").alias("t_g"))
    corpus = vocab.agg(
        F.sum("c_t").alias("t_all"), F.count(F.lit(1)).alias("v")
    )
    full = (
        vocab.crossJoin(F.broadcast(totals))
        .join(cgt, ["grp", "term"], "left")
        .na.fill({"c_gt": 0})
        .crossJoin(F.broadcast(corpus))
    )
    p_g = (F.col("c_gt") + 1).cast("double") / (F.col("t_g") + F.col("v")).cast("double")
    p_c = (F.col("c_t") + 1).cast("double") / (F.col("t_all") + F.col("v")).cast("double")
    contrib = F.round(p_g * F.log(p_g / p_c), 9).cast("decimal(24,12)")
    return (
        full.groupBy(F.col("grp").alias(group_col))
        .agg(
            F.max("t_g").alias("n_tokens"),
            F.sum((F.col("c_gt") > 0).cast("long")).alias("n_terms"),
            F.round(F.sum(contrib).cast("double"), 6).alias("kl_divergence"),
        )
    )


def bigram_doc_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    train_predicate: Column,
    cutoff: float = -9.0,
) -> DataFrame:
    """CCNet-style LM quality filter: score every document's mean bigram
    log-probability under an add-half bigram model trained on the subset
    selected by ``train_predicate``, and flag admission at ``cutoff``.

    P(w2|w1) = (2·c12 + 1) / (2·c1 + V) in integer-exact form (one IEEE
    division of two exact BIGINTs); unseen bigrams/unigrams hit the
    smoothed floor, exactly how a held-out scorer behaves. Per-bigram
    ``ln`` terms are rounded to 9 decimals and summed as exact decimals —
    order-free totals. Docs with < 2 tokens have no bigrams and drop out.

    100 TB posture: the LM is two map-side-combined aggregates over the
    training subset; scoring is one explode + two hash joins on the
    bigram/unigram keys (both uniformly distributed strings) + one per-doc
    aggregate. Nothing is quadratic and no window is unpartitioned.
    """
    toks = tokenize(text_col)
    base = df.select(
        F.col(id_col).alias("doc"), train_predicate.alias("__train"), toks.alias("__tk")
    )
    grams = base.select(
        "doc",
        "__train",
        F.explode_outer(
            F.when(
                F.size("__tk") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("__tk") - F.lit(1)),
                    lambda i: F.concat_ws(" ", F.slice("__tk", i, 2)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bg"),
    ).filter(F.col("bg").isNotNull())
    unis = base.filter("__train").select(F.explode("__tk").alias("w"))
    c1 = unis.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    c12 = (
        grams.filter("__train").groupBy("bg").agg(F.count(F.lit(1)).alias("c12"))
    )
    vocab = c1.agg(F.count(F.lit(1)).alias("__v"))
    scored = (
        grams.withColumn("w1", F.substring_index(F.col("bg"), " ", 1))
        .join(c12, "bg", "left")
        .join(c1.withColumnRenamed("w", "w1"), "w1", "left")
        .na.fill({"c12": 0, "c1": 0})
        .crossJoin(F.broadcast(vocab))
    )
    p = (F.lit(2) * F.col("c12") + F.lit(1)).cast("double") / (
        F.lit(2) * F.col("c1") + F.col("__v")
    ).cast("double")
    logp = F.round(F.log(p), 9).cast("decimal(24,12)")
    return (
        scored.groupBy(F.col("doc").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            # cast the EXACT decimal sum to double BEFORE dividing — a
            # decimal/long division would pick engine-specific result
            # scales; double/long is one IEEE op, identical everywhere.
            F.round(F.sum(logp).cast("double") / F.count(F.lit(1)), 6).alias(
                "avg_logp"
            ),
        )
        .withColumn("admitted", F.col("avg_logp") >= F.lit(cutoff))
    )


def token_pmi(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    vocab_size: int = 100,
    min_pair_count: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Pointwise mutual information of within-document token co-occurrence
    over the top-``vocab_size`` tokens by document frequency — the
    collocation/association miner behind phrase detection and
    feature-correlation audits (Church & Hanks, CL 1990).

    PMI here is document-level: ``pmi(a,b) = ln(df_ab * N / (df_a *
    df_b))`` with document frequencies (distinct per doc), all exact
    integers until the single final ``ln``.

    Scale posture: the vocabulary is a top-K aggregate (tiny, broadcast
    both into the token filter and the df lookup), so the pair self-join
    is bounded — each document contributes at most C(|vocab ∩ doc|, 2)
    pairs, never C(doc_len, 2). One shuffle keyed on ``id_col`` for the
    per-doc pairing, one combiner-friendly count shuffle on the pair; a
    boilerplate-hot pair is a single counter, not a hot partition.

    Output: ``(token_a, token_b, df_a, df_b, df_ab, pmi)`` for pairs with
    ``df_ab >= min_pair_count``.
    """
    # r12 opt: the distinct (doc, token) index feeds the vocab top-K AND
    # the vocab-filtered join — materialize it once instead of re-running
    # the tokenize + explode + distinct per reference. Same for the
    # vocab-filtered table, which feeds both pair-join sides (bounded:
    # |docs| x vocab_size rows).
    dt = (
        df.select(
            F.col(id_col).alias("doc"), F.explode(tokenize(text_col)).alias("tok")
        )
        .distinct()
        .transform(materialize_once)
    )
    vocab = (
        dt.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.col("df").desc(), F.col("tok").asc())
        .limit(vocab_size)
    )
    n_docs = df.select(F.col(id_col)).distinct().count()
    vt = dt.join(F.broadcast(vocab), "tok").transform(materialize_once)
    a = vt.select("doc", F.col("tok").alias("token_a"), F.col("df").alias("df_a"))
    b = vt.select("doc", F.col("tok").alias("token_b"), F.col("df").alias("df_b"))
    pairs = (
        a.join(b, "doc")
        .filter(F.col("token_a") < F.col("token_b"))
        .groupBy("token_a", "token_b", "df_a", "df_b")
        .agg(F.count(F.lit(1)).alias("df_ab"))
        .filter(F.col("df_ab") >= min_pair_count)
    )
    pmi = F.round(
        F.log(
            F.col("df_ab").cast("double")
            * F.lit(float(n_docs))
            / (F.col("df_a").cast("double") * F.col("df_b").cast("double"))
        ),
        round_to,
    )
    return pairs.select("token_a", "token_b", "df_a", "df_b", "df_ab",
                        pmi.alias("pmi"))


def inverted_postings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    vocab_size: int = 50,
    max_postings: int = 100,
) -> DataFrame:
    """Build the posting lists of a search index for the top-``vocab_size``
    tokens: per token, the document frequency and the first
    ``max_postings`` doc ids in ascending order.

    "First N ids" is a TOP-K, and top-k is associative — so the collect
    runs TWO-LEVEL: per (token, id-bucket) sort+cap first (every
    aggregation buffer is ≤ ``max_postings`` ids), then merge the ≤64
    capped bucket arrays and cap again. A stopword that posts in every
    document never materializes a corpus-sized buffer the way a naive
    ``collect_list`` per token would. ``df`` (the full count) is an exact
    ``count`` beside the capped arrays, so ranking stays exact while
    storage stays bounded; sorted-then-capped arrays are collect-order
    independent, so the output hash-matches a SQL oracle.

    One distinct + two combiner-friendly token shuffles. Output:
    ``(tok, df, postings array<id>)``.
    """
    dt = df.select(
        F.col(id_col).alias("id"), F.explode(tokenize(text_col)).alias("tok")
    ).distinct()
    # bucket on a HASH of the id: pmod over the raw id assumes numeric —
    # a string doc id would coerce to NULL and collapse every posting
    # into one bucket, silently voiding the bounded-buffer guarantee.
    bucketed = dt.groupBy(
        "tok", F.pmod(F.xxhash64(F.col("id")), F.lit(64)).alias("__b")
    ).agg(
        F.count(F.lit(1)).alias("__n"),
        F.slice(F.sort_array(F.collect_list("id")), 1, max_postings).alias("__p"),
    )
    agg = bucketed.groupBy("tok").agg(
        F.sum("__n").alias("df"),
        F.slice(F.sort_array(F.flatten(F.collect_list("__p"))), 1, max_postings)
        .alias("postings"),
    )
    return (
        agg.orderBy(F.col("df").desc(), F.col("tok").asc())
        .limit(vocab_size)
        .select("tok", "df", "postings")
    )


def countmin_sketch(
    df: DataFrame,
    text_col: str = "text",
    *,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan, J.Alg'05) of corpus term
    frequencies as a ``(row, col, cnt)`` long table — ``depth * width``
    counters, mergeable across shards/days by plain summation of the
    (row, col) cells (the property that makes CMS the streaming/rollup
    counterpart to q154's exact heavy hitters).

    Unlike the HLL/GK sketches (q74/q100, engine-private binary state),
    this sketch is DETERMINISTIC and engine-portable: row ``r``'s hash is
    the r-th 32-bit lane of ``md5(token)`` mod ``width`` — the md5-lane
    trick (`ops/dedup._md5_lane`), byte-identical in any SQL engine, so
    both the sketch and every estimate carry a full value oracle.
    ``depth <= 4`` keeps it one md5 per token (4 lanes per digest).

    100 TB posture: one explode to (token, row, col) — ``depth`` rows per
    token occurrence, hashes not strings after the md5 — and ONE
    map-side-combined groupBy over at most ``depth * width`` cells; the
    shuffle carries the sketch size per partition, never the corpus.
    Estimates are then O(1) lookups (``countmin_estimate``).
    """
    if not 1 <= depth <= 4:
        raise ValueError(f"depth must be in [1, 4] (4 lanes per md5), got {depth}")
    if width < 2:
        raise ValueError(f"width must be >= 2, got {width}")
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit(""))
    tok = (
        df.select(F.explode(toks).alias("__tok"))
        .select("__tok", F.md5("__tok").alias("__h"))
    )
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                F.pmod(
                    F.conv(F.substring("__h", 1 + 8 * r, 8), 16, 10).cast("long"),
                    F.lit(width),
                ).alias("col"),
            )
            for r in range(depth)
        ]
    )
    return (
        tok.select(F.explode(cells).alias("__c"))
        .groupBy(F.col("__c.row").alias("row"), F.col("__c.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_probe_table(
    terms: Sequence[str], *, depth: int = 4, width: int = 2048
) -> list[tuple[str, int, int]]:
    """Driver-side (term, row, col) probe cells for ``countmin_estimate``
    — computed with the SAME md5-lane hash the sketch uses, so the probe
    table can be inlined as literals into both the Spark plan and a SQL
    oracle (the planes52 pattern: one helper feeds both engines)."""
    import hashlib

    out = []
    for t in terms:
        h = hashlib.md5(t.encode()).hexdigest()
        for r in range(depth):
            out.append((t, r, int(h[8 * r : 8 * r + 8], 16) % width))
    return out


def countmin_estimate(
    sketch: DataFrame,
    terms: Sequence[str],
    *,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Point-frequency estimates from a ``countmin_sketch`` table:
    ``est(t) = min over rows of counter[r][h_r(t)]`` — the classic CMS
    guarantee ``exact <= est <= exact + eps*N`` with probability
    ``1 - (1/2)^depth`` (never an undercount). The probe cells enter as a
    ``depth * |terms|``-row literal table; the SKETCH is the broadcast
    side of the left join (bounded at ``depth * width`` cells by
    construction — the one frame in this module that is always
    broadcast-safe). Empty cells count 0 (left join + coalesce)."""
    spark = sketch.sparkSession
    probes = spark.createDataFrame(
        countmin_probe_table(terms, depth=depth, width=width),
        "term string, row int, col long",
    )
    joined = probes.join(
        F.broadcast(sketch.withColumnRenamed("cnt", "__cnt")),
        ["row", "col"],
        "left",
    )
    return (
        joined.groupBy("term")
        .agg(F.min(F.coalesce(F.col("__cnt"), F.lit(0))).alias("cm_estimate"))
        .select("term", F.col("cm_estimate").cast("long").alias("cm_estimate"))
    )


def _flesch_count_exprs(text_col: str) -> "tuple[Column, Column, Column]":
    """Module-private: the three exact Flesch regex counts (words,
    sentences floored at 1, syllable groups) — shared by
    :func:`flesch_reading_ease` and :func:`_screen_flags`.

    r13 per-task-work optimization (guide §1.2 step 2): counts come from
    ``regexp_count`` instead of ``size(regexp_extract_all(...))`` — the
    same non-overlapping-match count under the same Java regex semantics
    (bit-identical integers), without materializing an array of every
    word/vowel-group per document just to take its length."""
    lower = F.lower(F.col(text_col))
    words = F.regexp_count(lower, F.lit("[a-z]+")).cast("bigint")
    sents = F.greatest(
        F.lit(1).cast("bigint"),
        F.regexp_count(F.col(text_col), F.lit("[.!?]+")).cast("bigint"),
    )
    syll = F.regexp_count(lower, F.lit("[aeiouy]+")).cast("bigint")
    return words, sents, syll


def flesch_reading_ease(
    df: DataFrame,
    text_col: str,
    *,
    id_cols: Sequence[str] = ("doc_id",),
) -> DataFrame:
    """Per-document Flesch Reading Ease (Flesch 1948) from three regex
    counts — the readability screen corpus-quality pipelines run next
    to the Gopher/C4 rules:

        score = 206.835 - 1.015 * (words / sentences)
                        - 84.6  * (syllables / words)

    with words = ``[a-z]+`` runs of the lowercased text, sentences =
    ``[.!?]+`` runs (floored at 1), and syllables approximated by vowel
    groups ``[aeiouy]+`` — the standard cheap heuristic; it
    over/under-counts silent-e words but is deterministic and
    engine-portable (no dictionary). Documents with zero words are
    dropped (the score is undefined).

    The three counts are exact integers; the score is one fixed IEEE
    expression over them, published floor-scaled x1000 (bigint) so any
    engine hashes identically. Pure column expressions — zero shuffle,
    zero UDF.

    Output: ``(id_cols..., n_words, n_sentences, n_syllables,
    flesch_x1000)``.
    """
    words, sents, syll = _flesch_count_exprs(text_col)
    base = df.select(
        *id_cols,
        words.alias("n_words"),
        sents.alias("n_sentences"),
        syll.alias("n_syllables"),
    ).filter(F.col("n_words") > 0)
    w = F.col("n_words").cast("double")
    s = F.col("n_sentences").cast("double")
    y = F.col("n_syllables").cast("double")
    score = (
        F.lit(206.835) - F.lit(1.015) * (w / s) - F.lit(84.6) * (y / w)
    )
    return base.withColumn(
        "flesch_x1000", F.floor(score * F.lit(1000.0)).cast("bigint")
    )


def _screen_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_words: int = 50,
    min_stopword_hits: int = 2,
    flesch_min_x1000: int = 50_000,
    entropy_min: Optional[float] = None,
) -> DataFrame:
    """Module-private ONE-SCAN fusion of the document quality-screen
    battery (r13 optimization round; same shared-scan pattern as
    ``bm25_topk_multi``): the Gopher rule pass, the Flesch readability
    cut, and optionally the char-entropy cut, computed in a single
    projection over one corpus scan instead of 2-3 independent full-text
    scans joined back on ``id_col``.

    Output is BIT-IDENTICAL to the op-composed construction the
    q257/q278/q298/q339 agreement family used (pinned by
    tests/test_ops.py::test_screen_flags_matches_op_composition):

    * ``__a`` = ``gopher_quality_flags(...).passes_gopher`` — built from
      the same :func:`_gopher_measure_exprs` / :func:`_gopher_flag_exprs`
      the operator itself uses;
    * ``__b`` = the ``a.join(flesch, id, "left")`` + ``coalesce(__b,
      False)`` semantics: ``flesch_x1000 >= flesch_min_x1000`` where the
      doc has at least one Flesch word, ``False`` where
      :func:`flesch_reading_ease` would have dropped the row (zero
      ``[a-z]+`` words — the score is undefined there, so the comparison
      is never evaluated);
    * ``__c`` (when ``entropy_min`` is not None) =
      ``char_entropy(...).char_entropy >= entropy_min`` via the shared
      :func:`_char_entropy_expr` (emitted for every doc, as the op does).

    100 TB posture: the family's previous shape paid 2-3 full corpus
    text scans plus an id-keyed join per extra screen; this is one scan,
    zero joins, zero shuffles before the callers' tiny aggregates.
    """
    cols = [
        F.col(id_col),
        F.col(text_col),
        tokenize(text_col).alias("__toks"),
    ]
    if entropy_min is not None:
        cols.append(F.split(F.col(text_col), "").alias("__chars"))
    bound = df.select(*cols)
    meas = _gopher_measure_exprs(
        text_col, F.col("__toks"), stopwords=GOPHER_STOPWORDS, round_to=4
    )
    fw, fs, fy = _flesch_count_exprs(text_col)
    sel = [
        F.col(id_col),
        *[v.alias(k) for k, v in meas.items()],
        fw.alias("__fw"),
        fs.alias("__fs"),
        fy.alias("__fy"),
    ]
    if entropy_min is not None:
        sel.append(
            _char_entropy_expr(F.col("__chars"), round_to=6).alias("__ent")
        )
    m = bound.select(*sel)
    fl = _gopher_flag_exprs(
        min_words=min_words,
        max_words=100_000,
        min_mean_word_len=3.0,
        max_mean_word_len=10.0,
        max_symbol_word_ratio=0.1,
        min_alpha_word_ratio=0.8,
        min_stopword_hits=min_stopword_hits,
    )
    passes = (
        fl["ok_words"]
        & fl["ok_mean_word_len"]
        & fl["ok_symbol_ratio"]
        & fl["ok_alpha_ratio"]
        & fl["ok_stopwords"]
    )
    wd = F.col("__fw").cast("double")
    sd = F.col("__fs").cast("double")
    yd = F.col("__fy").cast("double")
    score = F.lit(206.835) - F.lit(1.015) * (wd / sd) - F.lit(84.6) * (yd / wd)
    fx1000 = F.floor(score * F.lit(1000.0)).cast("bigint")
    out = [
        F.col(id_col),
        passes.alias("__a"),
        F.when(F.col("__fw") > 0, fx1000 >= F.lit(flesch_min_x1000))
        .otherwise(F.lit(False))
        .alias("__b"),
    ]
    if entropy_min is not None:
        out.append((F.col("__ent") >= F.lit(entropy_min)).alias("__c"))
    return m.select(*out)


def kneser_ney_bigrams(
    df: DataFrame,
    text_col: str,
    *,
    discount: float = 0.75,
    min_count: int = 5,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities (Kneser & Ney,
    ICASSP 1995; Chen & Goodman 1998's benchmark smoother) over word
    bigrams of the corpus:

        P(w2|w1) = max(c(w1 w2) - D, 0) / c(w1 .)
                 + D * N1+(w1 .) / c(w1 .)  *  N1+(. w2) / T

    where ``N1+(w1 .)`` counts distinct continuations of ``w1``,
    ``N1+(. w2)`` counts distinct left contexts of ``w2`` (the
    continuation probability that makes KN the strongest fixed-order
    smoother), and ``T`` is the total number of distinct bigram types.

    Mechanics: one bigram count aggregate (map-side combinable — THE
    canonical big-data agg), two vocabulary-sized re-aggregations of the
    count table for the context/continuation statistics, one 1-row
    broadcast for ``T``.  Only bigrams with ``c >= min_count`` are
    PUBLISHED, but every statistic is computed over the full table, so
    the filter changes the output size, never the probabilities.

    Determinism: all counts exact bigints; the probability is one fixed
    IEEE tree over them (``discount`` must be exactly representable —
    0.75 is), floor-published x1e9.

    Output: ``(w1, w2, c, c_w1, n_follow, n_cont, t_types, pkn_x1e9)``.
    """
    ws = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
    toks = df.select(ws.alias("__ws")).filter(F.size("__ws") >= 2)
    big = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("__ws"), 1, F.size("__ws") - 1).alias("w1"),
                F.slice(F.col("__ws"), 2, F.size("__ws") - 1).alias("w2"),
            )
        ).alias("__b")
    ).select(F.col("__b.w1").alias("w1"), F.col("__b.w2").alias("w2"))
    bc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    ctx = bc.groupBy("w1").agg(
        F.sum("c").cast("bigint").alias("c_w1"),
        F.count(F.lit(1)).cast("bigint").alias("n_follow"),
    )
    cont = bc.groupBy("w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cont")
    )
    tt = bc.agg(F.count(F.lit(1)).cast("bigint").alias("t_types"))
    d = float(discount)
    pub = bc.filter(F.col("c") >= min_count)
    joined = (
        pub.join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tt))
    )
    cc = F.col("c").cast("double")
    cw = F.col("c_w1").cast("double")
    nf = F.col("n_follow").cast("double")
    nc = F.col("n_cont").cast("double")
    t = F.col("t_types").cast("double")
    pkn = (cc - F.lit(d)) / cw + (F.lit(d) * nf / cw) * (nc / t)
    return joined.select(
        "w1",
        "w2",
        "c",
        "c_w1",
        "n_follow",
        "n_cont",
        "t_types",
        F.floor(pkn * F.lit(1_000_000_000.0)).cast("bigint").alias("pkn_x1e9"),
    )


def span_corruption_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    group_cols: Sequence[str] = (),
    start_mod: int = 20,
    span_len: int = 3,
    salt: str = "span",
) -> DataFrame:
    """T5-style span-corruption masking statistics (Raffel et al., JMLR
    2020): deterministic span starts from the portable md5 lane —
    position ``p`` of document ``d`` STARTS a corruption span iff
    ``u52(d || '_' || p, salt) % start_mod == 0`` — each span covering
    ``span_len`` tokens; overlapping spans merge (union semantics, like
    the sampled-until-budget procedure they approximate). With the
    defaults ~5% of positions start a 3-token span => ~14% of tokens
    masked, T5's working point.

    Mechanics: tokenize, posexplode, then TWO lag windows per document
    (masked = start OR lag(start,1) OR lag(start,2); a span begins where
    masked rises) — per-document partitions are token-count-bounded, so
    the windows never see more than one document per task. Counts are
    exact bigints; the mask ratio is one IEEE division floor-published
    x1e6.

    Output: one row per group (or one global row with ``group_cols=()``)
    — ``(group_cols..., n_docs, n_tokens, n_masked, n_spans,
    mask_ratio_x1e6)``.
    """
    from .sampling import _u52

    ws = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
    toks = df.select(
        F.col(id_col).alias("__id"),
        *[F.col(c) for c in group_cols],
        F.posexplode(ws).alias("__pos0", "__tok"),
    ).select(
        "__id",
        *group_cols,
        (F.col("__pos0") + 1).cast("bigint").alias("__p"),
    )
    key = F.concat(
        F.col("__id").cast("string"), F.lit("_"), F.col("__p").cast("string")
    )
    started = toks.withColumn(
        "__s", (_u52(key, salt) % start_mod == 0)
    )
    w = Window.partitionBy("__id").orderBy(F.asc("__p"))
    lags = [F.coalesce(F.lag("__s", j).over(w), F.lit(False)) for j in range(1, span_len)]
    masked = F.col("__s")
    for lg in lags:
        masked = masked | lg
    m = started.withColumn("__m", masked)
    m2 = m.withColumn(
        "__sp",
        F.col("__m")
        & ~F.coalesce(F.lag("__m", 1).over(w), F.lit(False)),
    )
    per_doc = m2.groupBy("__id", *group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("__nt"),
        F.sum(F.when(F.col("__m"), 1).otherwise(0)).cast("bigint").alias("__nm"),
        F.sum(F.when(F.col("__sp"), 1).otherwise(0)).cast("bigint").alias("__ns"),
    )
    return per_doc.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("__nt").cast("bigint").alias("n_tokens"),
        F.sum("__nm").cast("bigint").alias("n_masked"),
        F.sum("__ns").cast("bigint").alias("n_spans"),
        F.floor(
            F.lit(1_000_000.0)
            * F.sum("__nm").cast("double")
            / F.sum("__nt").cast("double")
        )
        .cast("bigint")
        .alias("mask_ratio_x1e6"),
    )


def chao1_richness(
    df: DataFrame,
    text_col: str = "text",
    *,
    group_cols: Sequence[str] = (),
    round_to: int = 6,
) -> DataFrame:
    """Chao1 species-richness estimate of the vocabulary (Chao 1984;
    the standard 'how many words exist that I have NOT seen yet'
    lower-bound estimator, bias-corrected form):

        chao1 = D + f1*(f1-1) / (2*(f2+1))

    where D = observed distinct terms, f1/f2 = singleton/doubleton term
    counts. The question it answers for a corpus: is the vocabulary
    curve saturating (f1 small vs D — more data adds little) or still
    climbing (f1 large — the corpus undersamples its domain)?

    Everything is exact BIGINT counting (two map-side-combined
    groupBys: term counts, then frequency-of-frequency) until the one
    IEEE division; published floor-quantized. The bias-corrected form
    is defined for f2 = 0, so no smoothing caveats.

    Output: ``group_cols + (n_distinct, f1, f2, chao1_x1e6)``.
    """
    g = list(group_cols)
    toks = df.select(*g, F.explode(tokenize(text_col)).alias("__t"))
    tc = toks.groupBy(*g, "__t").agg(F.count(F.lit(1)).alias("__c"))
    agg = tc.groupBy(*g).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sum(F.when(F.col("__c") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("f1"),
        F.sum(F.when(F.col("__c") == 2, 1).otherwise(0))
        .cast("bigint")
        .alias("f2"),
    )
    chao = F.col("n_distinct").cast("double") + (
        (F.col("f1") * (F.col("f1") - 1)).cast("double")
        / (F.lit(2) * (F.col("f2") + 1)).cast("double")
    )
    p = float(10**round_to)
    return agg.select(
        *g,
        "n_distinct",
        "f1",
        "f2",
        F.floor(chao * F.lit(p) + F.lit(0.5)).cast("bigint").alias(
            f"chao1_x1e{round_to}"
        ),
    )


def js_divergence_matrix(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    *,
    ln_round: int = 9,
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between each pair of groups'
    add-1-smoothed unigram distributions — the SYMMETRIC, bounded
    (<= ln 2) companion to :func:`unigram_drift`'s one-vs-corpus KL:
    which sources actually speak the same language, as a matrix a mix
    planner can threshold (Lin, IEEE-IT 1991).

        JSD(a,b) = 0.5·KL(a‖m) + 0.5·KL(b‖m),  m = (p_a + p_b)/2

    smoothed over the CORPUS vocabulary (same V for every pair, so the
    matrix is comparable across cells). Per-term contributions round to
    ``ln_round`` decimals and sum as exact decimals — the same
    cross-engine posture as ``unigram_drift``; the published divergence
    floor-quantizes to the 1e-9 lattice.

    Scale posture: one (group, term) aggregate; the completion is vocab
    x pairs — |V|·|G|²/2 rows, linear in vocabulary for a bounded group
    set, never in corpus size; the two count joins are term-keyed hash
    joins.

    Output: ``(grp_a, grp_b, jsd_x1e9)`` for ``grp_a < grp_b``.
    """
    toks = df.select(
        F.col(group_col).alias("grp"), F.explode(tokenize(text_col)).alias("term")
    )
    cgt = toks.groupBy("grp", "term").agg(F.count(F.lit(1)).alias("c"))
    vocab = cgt.select("term").distinct()
    totals = cgt.groupBy("grp").agg(F.sum("c").alias("t"))
    nv = vocab.agg(F.count(F.lit(1)).alias("v"))
    pairs = (
        totals.select(F.col("grp").alias("ga"), F.col("t").alias("ta"))
        .crossJoin(
            totals.select(F.col("grp").alias("gb"), F.col("t").alias("tb"))
        )
        .filter(F.col("ga") < F.col("gb"))
    )
    ca = cgt.select(
        F.col("term").alias("term"), F.col("grp").alias("ga"), F.col("c").alias("ca")
    )
    cb = cgt.select(
        F.col("term").alias("term"), F.col("grp").alias("gb"), F.col("c").alias("cb")
    )
    full = (
        vocab.crossJoin(F.broadcast(pairs))
        .join(ca, ["term", "ga"], "left")
        .join(cb, ["term", "gb"], "left")
        .na.fill({"ca": 0, "cb": 0})
        .crossJoin(F.broadcast(nv))
    )
    pa = (F.col("ca") + 1).cast("double") / (F.col("ta") + F.col("v")).cast("double")
    pb = (F.col("cb") + 1).cast("double") / (F.col("tb") + F.col("v")).cast("double")
    m = (pa + pb) * F.lit(0.5)
    contrib = F.round(
        F.lit(0.5) * pa * F.log(pa / m) + F.lit(0.5) * pb * F.log(pb / m),
        ln_round,
    ).cast("decimal(24,12)")
    return (
        full.groupBy(F.col("ga").alias("grp_a"), F.col("gb").alias("grp_b"))
        .agg(
            (F.sum(contrib) * F.lit(1_000_000_000)).cast("bigint").alias("jsd_x1e9")
        )
    )


# RAKE's phrase delimiters: a small closed-class English stopword set.
# Module-level so the DuckDB oracle builds its IN (...) list from the SAME
# literals the Spark filter ships (the planes52 pattern for word lists).
RAKE_STOPWORDS = (
    "a", "an", "and", "are", "as", "at", "be", "been", "but", "by", "can",
    "did", "do", "does", "for", "from", "had", "has", "have", "he", "i",
    "in", "is", "it", "its", "no", "not", "of", "on", "or", "she", "that",
    "the", "their", "these", "they", "this", "those", "to", "was", "we",
    "were", "will", "with", "you",
)


def rake_keywords(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    group_cols: Sequence[str] = ("source",),
    top_k: int = 12,
    max_phrase_len: int = 6,
    scale: int = 1_000_000,
    sub_buckets: int = 16,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010, "Automatic Keyword
    Extraction from Individual Documents"): candidate phrases are the
    maximal token runs between stopwords/punctuation; each word scores
    ``degree/freq`` (degree = summed length of phrases containing it,
    freq = occurrence count) and a phrase scores the sum over its words.

    Determinism contract: NO regex word boundaries (``\\b`` differs
    between Java regex and RE2 on edge cases) — tokens come from the
    plain whitespace split, are normalized by stripping ``[^a-z0-9]``
    (identical char-class semantics in both engines), and a token is a
    delimiter iff it normalizes empty or hits :data:`RAKE_STOPWORDS`.
    Phrase ids are a running delimiter count per document (gaps-and-
    islands). Scores stay integer end-to-end: each word contributes
    ``(degree * scale) div freq`` — the PER-TERM floor that makes the
    phrase sum order-free — so both engines publish identical BIGINTs.

    Scale posture: per-document windows only (bounded by doc length),
    word stats are one map-side-combined groupBy, and the per-group
    top-k runs TWO-PHASE (rank within (group, hash-bucket) first, then
    a final window over <= top_k * sub_buckets rows) — no task ever
    sorts a group's full phrase vocabulary.

    Output: ``group_cols + (phrase, n_words, occurrences, score_x1e6)``,
    the top ``top_k`` phrases per group by (score desc, phrase asc).
    """
    g = list(group_cols)
    toks = df.select(
        *g,
        F.col(id_col).alias("__doc"),
        F.posexplode(F.split(F.lower(F.col(text_col)), r"\s+")).alias(
            "__pos", "__raw"
        ),
    ).select(
        *g,
        "__doc",
        "__pos",
        F.regexp_replace(F.col("__raw"), "[^a-z0-9]", "").alias("__w"),
    )
    delim = (F.col("__w") == "") | F.col("__w").isin(*RAKE_STOPWORDS)
    run = Window.partitionBy("__doc").orderBy("__pos")
    tagged = toks.withColumn(
        "__pid",
        F.sum(F.when(delim, 1).otherwise(0)).over(
            run.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).filter(~delim)
    phrases = (
        tagged.groupBy(*g, "__doc", "__pid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__w"))),
                    lambda s: s["__w"],
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
        )
        .filter(F.col("n_words") <= max_phrase_len)
    )
    # word stats over every phrase OCCURRENCE (classic RAKE counting)
    words = phrases.select(
        *g, "n_words", F.explode(F.split("phrase", " ")).alias("__w")
    )
    stats = words.groupBy(*g, "__w").agg(
        F.count(F.lit(1)).cast("bigint").alias("__freq"),
        F.sum("n_words").cast("bigint").alias("__deg"),
    )
    distinct = phrases.groupBy(*g, "phrase", "n_words").agg(
        F.count(F.lit(1)).cast("bigint").alias("occurrences")
    )
    members = distinct.select(
        *g, "phrase", "n_words", "occurrences",
        F.explode(F.split("phrase", " ")).alias("__w"),
    )
    scored = (
        members.join(stats, on=[*g, "__w"])
        .groupBy(*g, "phrase", "n_words", "occurrences")
        .agg(
            F.sum(F.expr(f"(__deg * {int(scale)}) div __freq"))
            .cast("bigint")
            .alias("score_x1e6")
        )
    )
    order = [F.desc("score_x1e6"), F.asc("phrase")]
    if sub_buckets > 1:
        pre = F.row_number().over(
            Window.partitionBy(
                *g, F.pmod(F.xxhash64(F.col("phrase")), F.lit(sub_buckets))
            ).orderBy(*order)
        )
        scored = (
            scored.withColumn("__pre", pre)
            .filter(F.col("__pre") <= top_k)
            .drop("__pre")
        )
    rk = F.row_number().over(Window.partitionBy(*g).orderBy(*order))
    return (
        scored.withColumn("__rk", rk)
        .filter(F.col("__rk") <= top_k)
        .select(*g, "phrase", "n_words", "occurrences", "score_x1e6")
    )


def good_turing_counts(
    df: DataFrame,
    text_col: str = "text",
    *,
    group_cols: Sequence[str] = ("lang",),
    max_r: int = 10,
    scale: int = 1_000_000,
    ngram: int = 1,
) -> DataFrame:
    """Good-Turing frequency re-estimation table (Good 1953; the
    count-of-counts smoothing behind Katz backoff): for each observed
    term count ``r`` up to ``max_r``, publish ``N_r`` (how many distinct
    terms occur exactly r times) and the adjusted count
    ``r* = (r+1) * N_{r+1} / N_r``. Small r* / r ratios mean the corpus
    still has heavy unseen mass (the LM cousin of q271's Chao1 richness).

    Everything is exact BIGINT: two map-side-combined groupBys (term
    counts, then frequency-of-frequencies), a self-join on ``r+1`` over
    the <= max_r-row table, and ``(r+1) * N_{r+1} * scale div N_r``
    integer division — no floats anywhere.

    Output: ``group_cols + (r, n_r, n_r_next, r_star_x1e6)`` for
    ``1 <= r <= max_r`` (rows where ``N_r > 0``; ``n_r_next``/``r_star``
    are 0 when no term occurs exactly r+1 times).
    """
    if ngram not in (1, 2):
        raise ValueError("ngram must be 1 or 2")
    g = list(group_cols)
    if ngram == 1:
        toks = df.select(*g, F.explode(tokenize(text_col)).alias("__t"))
    else:
        # bigram TYPES — the larger type space keeps the low-r tail
        # populated on corpora whose unigram vocabulary saturates
        base = df.select(*g, tokenize(text_col).alias("__ws")).filter(
            F.size("__ws") >= 2
        )
        toks = base.select(
            *g,
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("__ws"), 1, F.size("__ws") - 1).alias("a"),
                    F.slice(F.col("__ws"), 2, F.size("__ws") - 1).alias("b"),
                )
            ).alias("__p"),
        ).select(
            *g,
            F.concat(F.col("__p.a"), F.lit(" "), F.col("__p.b")).alias("__t"),
        )
    tc = toks.groupBy(*g, "__t").agg(F.count(F.lit(1)).alias("__c"))
    foff = (
        tc.groupBy(*g, F.col("__c").alias("r"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_r"))
        .filter(F.col("r") <= max_r + 1)
    )
    cur = foff.filter(F.col("r") <= max_r)
    nxt = foff.select(
        *g, (F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r_next")
    )
    joined = cur.join(nxt, on=[*g, "r"], how="left").na.fill(
        {"n_r_next": 0}
    )
    return joined.select(
        *g,
        F.col("r").cast("bigint").alias("r"),
        "n_r",
        F.col("n_r_next").cast("bigint").alias("n_r_next"),
        F.expr(f"((r + 1) * n_r_next * {int(scale)}) div n_r")
        .cast("bigint")
        .alias("r_star_x1e6"),
    )


def burrows_delta(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    *,
    top_n: int = 30,
) -> DataFrame:
    """Burrows' Delta stylometric distance between groups (Burrows 2002,
    "'Delta': a Measure of Stylistic Difference"): over the corpus's
    ``top_n`` most frequent words, z-score each group's relative word
    frequency across groups, and Delta(a, b) = mean |z_a - z_b| — the
    standard authorship/style-drift distance (two sources with the same
    function-word profile write alike, whatever they write about).

    Determinism: relative frequencies snap to the 1e-9 integer grid
    (``(count * 1e9) div total``) on the FULL group x top-word lattice
    (missing words count 0 — required, or absent words silently shrink
    a pair's distance). Per-word std uses exact decimal moments and one
    fixed IEEE tree ending in sqrt (correctly rounded by IEEE-754 —
    safe, unlike ln/exp). Each pair-word term
    ``|f_a - f_b| / std`` floors onto the 1e-9 lattice BEFORE the sum
    (order-free), and zero-variance words contribute 0 via the EXACT
    integer check ``g * s2 == s1^2`` — never a float-zero division.

    Scale posture: the top-n selection is ``orderBy().limit()``
    (TakeOrderedAndProject); everything after runs on the tiny
    (groups x top_n) lattice — broadcast joins end to end.

    Output: one row per unordered group pair —
    ``(group_a, group_b, n_words, delta_x1e9)`` where delta is the mean
    per-NON-DEGENERATE-word term, floor-published x1e9 (``n_words``
    counts the words actually averaged).
    """
    g = group_col
    toks = df.select(F.col(g).alias("__g"), F.explode(tokenize(text_col)).alias("__t"))
    counts = toks.groupBy("__g", "__t").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    totals = toks.groupBy("__g").agg(
        F.count(F.lit(1)).cast("bigint").alias("__tot")
    )
    topw = (
        toks.groupBy("__t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__gc"))
        .orderBy(F.desc("__gc"), F.asc("__t"))
        .limit(top_n)
        .select("__t")
    )
    lattice = (
        totals.crossJoin(F.broadcast(topw))
        .join(counts, ["__g", "__t"], "left")
        .na.fill({"__c": 0})
        .select(
            "__g",
            "__t",
            F.expr("(__c * 1000000000) div __tot").cast("bigint").alias("__f"),
        )
    )
    wstats = lattice.groupBy("__t").agg(
        F.count(F.lit(1)).cast("bigint").alias("__gn"),
        F.sum("__f").cast("bigint").alias("__s1"),
        F.sum(F.col("__f").cast("decimal(38,0)") * F.col("__f")).alias("__s2"),
    )
    a = lattice.select(
        F.col("__g").alias("group_a"), "__t", F.col("__f").alias("__fa")
    )
    b = lattice.select(
        F.col("__g").alias("group_b"), "__t", F.col("__f").alias("__fb")
    )
    std_sql = (
        "sqrt((CAST(__s2 AS DOUBLE) - CAST(__s1 AS DOUBLE) * CAST(__s1 AS DOUBLE)"
        " / CAST(__gn AS DOUBLE)) / (CAST(__gn AS DOUBLE) - 1.0))"
    )
    term_sql = (
        f"CAST(floor(abs(CAST(__fa - __fb AS DOUBLE)) / ({std_sql})"
        " * 1000000000.0 + 0.5) AS BIGINT)"
    )
    # zero-variance words are EXCLUDED (their z is undefined), matching
    # the documented 'mean over non-degenerate words' — the exact
    # integer check, never a float-zero comparison
    nondeg = (
        "NOT (CAST(__gn AS DECIMAL(38,0)) * __s2 = "
        "CAST(__s1 AS DECIMAL(38,0)) * CAST(__s1 AS DECIMAL(38,0)))"
    )
    pairs = (
        a.join(b, "__t")
        .filter(F.col("group_a") < F.col("group_b"))
        .join(F.broadcast(wstats), "__t")
        .filter(F.expr(nondeg))
        .select("group_a", "group_b", F.expr(term_sql).alias("__term"))
    )
    return pairs.groupBy("group_a", "group_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.expr("CAST(sum(__term) div count(1) AS BIGINT)").alias(
            "delta_x1e9"
        ),
    )


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    *,
    group_cols: Sequence[str] = ("lang",),
    top_n: int = 200,
    min_count: int = 2,
    sub_buckets: int = 16,
) -> DataFrame:
    """Zipf rank-frequency fit per group (Zipf 1949): OLS slope of
    ``ln(freq)`` on ``ln(rank)`` over the top-``top_n`` vocabulary — the
    standard corpus-health check that word frequencies decay ~1/rank
    (slope near -1 for natural language; a flat or cliff-shaped profile
    flags boilerplate floods or template spam).

    The fit uses the vocabulary HEAD by design: the Zipf law holds in the
    head while the tail is censored by corpus size, and fitting the head
    keeps the rank assignment a BOUNDED top-n problem — candidates are
    pre-ranked within (group, hash-bucket) and only ``top_n *
    sub_buckets`` rows reach the final window (the rake_keywords two-phase
    discipline), so no task ever sorts a group's full vocabulary.
    Ranks are exact (freq desc, word asc — deterministic tie-break); the
    slope comes from :func:`~.stats.loglog_slope`, so every ln lands on
    the 1e-9 lattice and all moments are exact decimal.

    Output: ``group_cols + (n_used, slope_x1e6)``.
    """
    from .stats import loglog_slope

    g = list(group_cols)
    vocab = (
        df.select(*g, F.explode(tokenize(text_col)).alias("__w"))
        .groupBy(*g, "__w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__freq"))
        .filter(F.col("__freq") >= min_count)
    )
    order = [F.desc("__freq"), F.asc("__w")]
    if sub_buckets > 1:
        pre = F.row_number().over(
            Window.partitionBy(
                *g, F.pmod(F.xxhash64(F.col("__w")), F.lit(sub_buckets))
            ).orderBy(*order)
        )
        vocab = vocab.withColumn("__pre", pre).filter(
            F.col("__pre") <= top_n
        ).drop("__pre")
    rk = F.row_number().over(Window.partitionBy(*g).orderBy(*order))
    head = vocab.withColumn("__rank", rk).filter(F.col("__rank") <= top_n)
    return loglog_slope(
        head, F.col("__rank").cast("double"), F.col("__freq").cast("double"),
        group_cols=g,
    )


def heaps_fit(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    group_cols: Sequence[str] = ("lang",),
    sub_bucket_div: int = 1024,
) -> DataFrame:
    """Heaps'-law fit per group (Heaps 1978; Herdan 1960): OLS slope of
    ``ln(cumulative distinct vocabulary)`` on ``ln(cumulative tokens)``
    over the corpus in ``id_col`` order — the vocabulary-growth exponent
    beta in ``V(n) ~ k * n^beta`` (natural text sits near 0.5; beta -> 0
    flags a saturated/templated corpus, beta -> 1 flags token soup).

    Construction is exact and shuffle-lean: per-(group, doc) token
    counts and per-(group, word) FIRST-occurrence docs are two map-side
    groupBys; both cumulative axes (tokens seen, new words introduced)
    run through :func:`~.sampling.two_phase_running_sum` on the shared
    doc axis (sub-bucketed — no one-task-per-group window); the fit is
    :func:`~.stats.loglog_slope` on the (V(d), n(d)) points, one per
    document, all lattice/exact-decimal discipline inherited.

    Output: ``group_cols + (n_used, slope_x1e6)`` — slope is beta.
    """
    from .sampling import two_phase_running_sum
    from .stats import loglog_slope

    g = list(group_cols)
    toks = df.select(
        *g, F.col(id_col).cast("bigint").alias("__doc"),
        F.explode(tokenize(text_col)).alias("__w"),
    )
    per_doc = toks.groupBy(*g, "__doc").agg(
        F.count(F.lit(1)).cast("bigint").alias("__nt")
    )
    first_seen = toks.groupBy(*g, "__w").agg(F.min("__doc").alias("__doc"))
    new_words = first_seen.groupBy(*g, "__doc").agg(
        F.count(F.lit(1)).cast("bigint").alias("__nv")
    )
    both = per_doc.join(new_words, [*g, "__doc"], "left").na.fill(
        {"__nv": 0}
    )
    sub = F.expr(f"__doc div {int(sub_bucket_div)}")
    cum_t = two_phase_running_sum(
        both, g, [F.asc("__doc")], F.col("__nt"), sub, out_col="__cum_t"
    )
    cum_v = two_phase_running_sum(
        cum_t, g, [F.asc("__doc")], F.col("__nv"), sub, out_col="__cum_v"
    )
    return loglog_slope(
        cum_v,
        F.col("__cum_t").cast("double"),
        F.col("__cum_v").cast("double"),
        group_cols=g,
    )
