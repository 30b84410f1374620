"""Text analysis over document tables: tokens, stats, quality, language ID.

Greenfield LLM-pipeline capability (SURVEY.md §7.0). All operators are
pure built-in Column expressions — split/explode/regexp/aggregate under
whole-stage codegen; no Python in the hot path, so every one of these
scales linearly with partitions.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "tokenize",
    "token_count",
    "term_counts",
    "doc_quality",
    "lang_stats",
    "language_id",
    "DEFAULT_LANG_MARKERS",
]


def tokenize(col: Column | str) -> Column:
    """Lowercased whitespace tokens, empties removed (array<string>)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != F.lit(""))


def token_count(col: Column | str) -> Column:
    return F.size(tokenize(col))


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
    toks = tokenize(text_col)
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    total_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("long").alias("n_chars_actual"),
        n_tokens.cast("long").alias("n_tokens"),
        n_distinct.cast("long").alias("n_distinct_tokens"),
        F.round(F.try_divide(n_distinct.cast("double"), n_tokens.cast("double")), round_to).alias(
            "type_token_ratio"
        ),
        F.round(F.try_divide(total_len.cast("double"), n_tokens.cast("double")), round_to).alias(
            "mean_token_len"
        ),
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
    toks = tokenize(text_col)
    langs = sorted(markers)
    hit_cols = []
    for lang in langs:
        marker_arr = F.array(*[F.lit(m) for m in markers[lang]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))
        hit_cols.append(hits.cast("long").alias(f"hits_{lang}"))
    out = df.select(F.col(id_col), *hit_cols)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    pred = F.lit(default_lang)
    # reversed so earlier languages win ties (when() chains first-match)
    chain = None
    for lang in langs:
        cond = F.col(f"hits_{lang}") == best
        chain = F.when(cond, F.lit(lang)) if chain is None else chain.when(cond, F.lit(lang))
    pred = F.when(best > 0, chain).otherwise(F.lit(default_lang))
    return out.withColumn("predicted_lang", pred)
