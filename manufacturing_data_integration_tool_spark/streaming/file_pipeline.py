"""Structured Streaming front-end for the ETL pipeline.

The reference's batch-of-files loop + archive-on-success
(``src/main.py:34-55``, ``src/etl_processor.py:160-179``) is exactly the
contract of a Structured Streaming **file source** with
``cleanSource='archive'``: new files appear, each micro-batch runs
validate -> project -> sinks via ``foreachBatch``, and consumed files are
moved aside by the engine with exactly-once bookkeeping in the checkpoint —
no hand-rolled success tracking.

Event-time analytics (watermark + tumbling/session windows) are greenfield
capability for the ``events`` stream (SURVEY.md §2.9): the reference has no
real-time surface.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..config import IntegrationConfig
from ..pipeline import project_to_target
from ..plans.validator import validate
from ..sources.archive import archive_file
from ..sources.sinks import shape_errors_for_sink


def ensure_event_time(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Streaming watermarks demand TIMESTAMP (LTZ); parquet written as
    TIMESTAMP_NTZ fails analysis with EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE.
    Cast in place — the naive wall-clock becomes a session-tz instant, and
    windows/gaps/watermark horizons are offset-invariant, so results are
    unchanged. Batch paths keep NTZ untouched (window() accepts it)."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def start_file_stream(
    spark: SparkSession,
    input_dir: str,
    config: IntegrationConfig,
    output_dir: str,
    *,
    checkpoint_dir: str,
    archive_dir: Optional[str] = None,
    available_now: bool = True,
    lookup_values: Optional[Mapping[str, Any]] = None,
    max_files_per_trigger: Optional[int] = 128,
) -> StreamingQuery:
    """Stream CSVs from ``input_dir`` through validation into parquet sinks.

    ``available_now=True`` drains everything currently present then stops —
    deterministic for tests and batch-style backfills; ``False`` keeps
    watching the directory like a daemonized version of the reference CLI.

    ``max_files_per_trigger`` defaults to 128 so the per-batch archive step
    (which collects the DISTINCT file list of the batch to the driver for
    renames) is bounded by construction, not by assumption — a backlogged
    inbox drains over several batches instead of one unbounded batch.
    Pass ``None`` to remove the bound.
    """
    schema = T.StructType([T.StructField(c, T.StringType(), True) for c in config.source_columns])
    reader = (
        spark.readStream.option("header", config.source.has_header)
        .option("sep", config.source.delimiter)
        .schema(schema)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.csv(input_dir).withColumn("FileSource", F.input_file_name())

    # NOTE we archive explicitly per micro-batch rather than via
    # ``cleanSource='archive'``: Spark's source cleaner only runs at the
    # *next* trigger, so an ``availableNow`` drain would leave the final
    # batch's files in the inbox forever (an inbox that never empties grows
    # unboundedly). The checkpoint log already remembers processed files, so
    # moving them after the batch commits is safe.
    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        result = validate(batch_df, config, lookup_values=lookup_values)
        annotated = result.annotated.persist()
        try:
            project_to_target(result.valid, config).write.mode("append").parquet(
                f"{output_dir}/quality_data"
            )
            shape_errors_for_sink(result.errors).write.mode("append").parquet(
                f"{output_dir}/validation_errors"
            )
            if archive_dir:
                files = [
                    r[0]
                    for r in annotated.select("FileSource").distinct().collect()
                    if r[0]
                ]
                for uri in sorted(files):
                    path = uri[len("file:"):] if uri.startswith("file:") else uri
                    archive_file(spark, path, archive_dir, enabled=True)
        finally:
            annotated.unpersist()

    writer = stream.writeStream.foreachBatch(process_batch).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    *,
    window_duration: str = "1 hour",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: Optional[str] = "value",
) -> DataFrame:
    """Tumbling-window counts with late-data tolerance. Works on both batch
    and streaming DataFrames (watermark is a no-op in batch). ``value_col``
    adds a sum when present; pass None (or a missing name) to skip it."""
    src = events
    if events.isStreaming:
        src = ensure_event_time(events, ts_col).withWatermark(ts_col, watermark)
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col and value_col in events.columns:
        aggs.append(F.sum(value_col).alias("total_value"))
    out = src.groupBy(F.window(F.col(ts_col), window_duration).alias("w"), F.col(group_col)).agg(*aggs)
    cols = [F.col("w.start").alias("window_start"), F.col(group_col), F.col("n_events")]
    if len(aggs) > 1:
        cols.append(F.col("total_value"))
    return out.select(*cols)


def sessionized_counts(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Session windows per user (gap-based). Streaming-native stateful op;
    in batch mode Spark computes the same sessions analytically."""
    src = events
    if events.isStreaming:
        src = ensure_event_time(events, ts_col).withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap).alias("s"), F.col(user_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            F.col(user_col),
            "n_events",
        )
    )


def windowed_term_counts(
    src: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Trending-terms source: per-(event-time window, token) counts with
    a watermark — the streaming half of a "what's trending this hour"
    dashboard (the consumer ranks the emitted finalized windows; ranking
    inside the stream would need complete-mode state over every token).

    The token explode multiplies rows BEFORE the stateful aggregate, but
    state is bounded by (windows in the watermark horizon) x (distinct
    tokens seen in them), and append mode emits each window once, when
    the watermark closes it — late rows beyond the watermark are dropped
    rather than reopening state (the documented trade).
    """
    from ..ops.text import tokenize

    return (
        ensure_event_time(src, ts_col)
        .withWatermark(ts_col, watermark)
        .select(F.col(ts_col), F.explode(tokenize(text_col)).alias("tok"))
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col("tok"))
        .count()
        .select(
            F.col("w.start").alias("window_start"),
            F.col("tok"),
            F.col("count").alias("n"),
        )
    )
