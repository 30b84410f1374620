from .corpus_pipeline import corpus_ingest_transform, start_corpus_stream
from .file_pipeline import (
    start_file_stream,
    windowed_event_counts,
    windowed_term_counts,
    sessionized_counts,
)
from .stateful import running_ewma, running_user_stats, streaming_dedup, user_value_peaks
from .cdc import apply_cdc_stream
from .sketches import accumulate_countmin_stream
from .dedup_index import accumulate_minhash_index_stream
from .joins import interval_join

__all__ = [
    "interval_join",
    "windowed_term_counts",
    "running_ewma",
    "apply_cdc_stream",
    "accumulate_countmin_stream",
    "accumulate_minhash_index_stream",
    "corpus_ingest_transform",
    "start_corpus_stream",
    "start_file_stream",
    "windowed_event_counts",
    "sessionized_counts",
    "running_user_stats",
    "streaming_dedup",
    "user_value_peaks",
]
