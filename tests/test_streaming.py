"""Structured Streaming file pipeline + event-time windows (SURVEY.md §2.9)."""

import shutil
import time

from pyspark.sql import functions as F

from manufacturing_data_integration_tool_spark import load_config
from manufacturing_data_integration_tool_spark.sources.readers import read_table
from manufacturing_data_integration_tool_spark.streaming import (
    sessionized_counts,
    start_file_stream,
    windowed_event_counts,
)


def test_file_stream_drains_and_archives(spark, golden_csv, mapping_config_path, tmp_path):
    cfg = load_config(mapping_config_path)
    inbox = tmp_path / "in"
    inbox.mkdir()
    for i in range(2):
        shutil.copy(golden_csv, inbox / f"prod_{i}.csv")

    q = start_file_stream(
        spark,
        str(inbox),
        cfg,
        str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        archive_dir=str(tmp_path / "arch"),
        available_now=True,
    )
    q.awaitTermination(120)

    qd = spark.read.parquet(str(tmp_path / "out" / "quality_data"))
    errs = spark.read.parquet(str(tmp_path / "out" / "validation_errors"))
    assert qd.count() == 12  # 6 valid x 2 files
    assert errs.count() == 8
    # cleanSource=archive moves consumed files (async; allow a beat)
    deadline = time.time() + 30
    while time.time() < deadline and list(inbox.glob("*.csv")):
        time.sleep(1)
    assert list(inbox.glob("*.csv")) == []


def test_windowed_event_counts_batch_parity(spark, sf_dir):
    events = read_table(spark, sf_dir, "events")
    out = windowed_event_counts(events, window_duration="1 hour")
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == events.count()
    # window starts align to the hour
    row = out.orderBy("window_start").first()
    assert row["window_start"].minute == 0 and row["window_start"].second == 0


def test_streaming_windowed_counts_from_rate_files(spark, sf_dir, tmp_path):
    """The same windowed agg runs as a real stream over parquet files."""
    events_dir = tmp_path / "events_stream"
    read_table(spark, sf_dir, "events").drop("ts_ns").write.parquet(str(events_dir))
    schema = spark.read.parquet(str(events_dir)).schema
    stream = spark.readStream.schema(schema).parquet(str(events_dir))
    agg = windowed_event_counts(stream, window_duration="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode emits only watermark-closed windows; all but the last
    # couple of hours must be present
    got = spark.sql("select sum(n_events) n from win_counts").collect()[0]["n"]
    assert got is not None and got > 0


def test_sessionized_counts_batch(spark, sf_dir):
    events = read_table(spark, sf_dir, "events")
    sess = sessionized_counts(events, gap="30 minutes")
    assert sess.agg(F.sum("n_events")).collect()[0][0] == events.count()
    assert {"session_start", "session_end", "user_id", "n_events"} == set(sess.columns)
