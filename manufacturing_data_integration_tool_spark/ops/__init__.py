"""LLM-data-pipeline operators (greenfield Spark design, SURVEY.md §7.0).

The reference (kshres31/Manufacturing-Data-Integration-Tool) has no
counterpart for these; they are the north-star extensions a large-scale
training-data pipeline needs: deduplication, similarity search, text
analysis, and multimodal column handling — each designed for the 100 TB
posture (no per-row Python in hot paths, broadcast small sides, bounded
shuffles, LSH instead of all-pairs joins).
"""

from .dedup import (
    content_hash,
    embedding_near_dups,
    exact_dedup,
    exact_dedup_by_content,
    minhash_candidates,
    ngram_jaccard_pairs,
    semantic_dedup,
    simhash_fingerprints,
    simhash_near_dups,
    word_shingles,
)
from .graph import connected_components, dedup_clusters
from .sampling import (
    cap_per_group,
    hash_fraction_threshold,
    hash_sample,
    priority_sample,
    stratified_sample,
    train_holdout_split,
)
from .multimodal import (
    assemble_multimodal,
    decode_binary_column,
    extract_features,
    media_schema,
    resize_media,
    sample_frames,
)
from .temporal import asof_join, range_join, rolling_time_agg, time_rollup
from .similarity import (
    IvfIndex,
    cosine_similarity,
    cosine_topk,
    fit_ivf,
    hyperplane_candidates,
    ivf_search,
    ivf_topk,
    knn_classify,
    label_centroids,
    lsh_ann_topk,
    quantize_embeddings,
)
from .text import (
    bpe_ish_token_count,
    build_vocab,
    chunk_documents,
    ngram_novelty,
    unigram_logprob,
    doc_quality,
    fingerprint_contamination,
    language_id,
    lang_stats,
    normalize_text,
    repetition_stats,
    term_counts,
    tfidf_top_terms,
    token_count,
    tokenize,
    winnowing_fingerprints,
)

__all__ = [
    "content_hash",
    "embedding_near_dups",
    "exact_dedup",
    "exact_dedup_by_content",
    "minhash_candidates",
    "ngram_jaccard_pairs",
    "semantic_dedup",
    "simhash_fingerprints",
    "simhash_near_dups",
    "word_shingles",
    "connected_components",
    "dedup_clusters",
    "cap_per_group",
    "hash_fraction_threshold",
    "hash_sample",
    "priority_sample",
    "stratified_sample",
    "train_holdout_split",
    "asof_join",
    "range_join",
    "rolling_time_agg",
    "time_rollup",
    "assemble_multimodal",
    "extract_features",
    "resize_media",
    "sample_frames",
    "decode_binary_column",
    "media_schema",
    "IvfIndex",
    "cosine_similarity",
    "cosine_topk",
    "fit_ivf",
    "hyperplane_candidates",
    "ivf_search",
    "ivf_topk",
    "knn_classify",
    "label_centroids",
    "lsh_ann_topk",
    "quantize_embeddings",
    "bpe_ish_token_count",
    "chunk_documents",
    "build_vocab",
    "doc_quality",
    "fingerprint_contamination",
    "ngram_novelty",
    "normalize_text",
    "unigram_logprob",
    "repetition_stats",
    "tfidf_top_terms",
    "language_id",
    "lang_stats",
    "term_counts",
    "token_count",
    "tokenize",
    "winnowing_fingerprints",
]
