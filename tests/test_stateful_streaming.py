"""Stateful streaming ops: dropDuplicatesWithinWatermark dedup and the
applyInPandasWithState running-stats operator, driven by real file streams."""

import time

from pyspark.sql import functions as F

from manufacturing_data_integration_tool_spark.sources.readers import read_table
from manufacturing_data_integration_tool_spark.streaming import (
    running_user_stats,
    streaming_dedup,
)


def _drain(query, timeout=120):
    query.awaitTermination(timeout)
    if query.isActive:
        query.stop()


def test_streaming_dedup_drops_redelivered_rows(spark, sf_dir, tmp_path):
    src_dir = tmp_path / "events_in"
    ev = read_table(spark, sf_dir, "events").drop("ts_ns").limit(200)
    # write 200 events, then re-deliver the SAME files (limit over a
    # repartitioned source is not deterministic across actions, so the
    # second copy must come from the first write, not a second limit)
    ev.write.parquet(str(src_dir / "a"))
    spark.read.parquet(str(src_dir / "a")).write.parquet(str(src_dir / "b"))

    schema = spark.read.parquet(str(src_dir / "a")).schema
    stream = spark.readStream.schema(schema).option("recursiveFileLookup", "true").parquet(
        str(src_dir)
    )
    deduped = streaming_dedup(stream, ["event_id"], ts_col="ts", watermark="10 days")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    got = spark.sql("select count(*) n, count(distinct event_id) d from dedup_out").collect()[0]
    assert got["n"] == 200  # 400 delivered, 200 unique survive
    assert got["d"] == 200


def test_running_user_stats_available_now_terminates(spark, sf_dir, tmp_path):
    """With the default NoTimeout, an availableNow drain must TERMINATE on
    its own (no stop() rescue): pending ProcessingTime timers used to keep
    the query alive firing empty batches forever — the q384 hang."""
    src_dir = tmp_path / "events_in"
    ev = read_table(spark, sf_dir, "events").drop("ts_ns").limit(100)
    ev.write.parquet(str(src_dir))
    schema = spark.read.parquet(str(src_dir)).schema
    stream = spark.readStream.schema(schema).parquet(str(src_dir))
    q = (
        running_user_stats(stream, ts_col="ts")
        .writeStream.format("memory")
        .queryName("stats_term")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_term"))
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(120)
    assert finished, "availableNow drain did not terminate (timer leak)"
    assert not q.isActive


def test_running_user_stats_stateful(spark, sf_dir, tmp_path):
    src_dir = tmp_path / "events_in"
    ev = read_table(spark, sf_dir, "events").drop("ts_ns").limit(300)
    ev.write.parquet(str(src_dir))
    # expectations must come from the rows actually written (limit over a
    # repartitioned source is not deterministic across actions)
    written = spark.read.parquet(str(src_dir))
    expected = (
        written.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    )
    exp = {r["user_id"]: (r["n"], r["tv"]) for r in expected}

    schema = spark.read.parquet(str(src_dir)).schema
    stream = spark.readStream.schema(schema).parquet(str(src_dir))
    stats = running_user_stats(stream, ts_col="ts")
    q = (
        stats.writeStream.format("memory")
        .queryName("stats_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    # last update per user must equal the batch aggregate
    rows = spark.sql(
        "select user_id, max_by(n_events, n_events) n, max_by(total_value, n_events) tv "
        "from stats_out group by user_id"
    ).collect()
    got = {r["user_id"]: (r["n"], r["tv"]) for r in rows}
    assert set(got) == set(exp)
    for uid, (n, tv) in exp.items():
        assert got[uid][0] == n
        assert abs(got[uid][1] - tv) < 1e-6


def test_user_value_peaks_transform_with_state(spark, sf_dir, tmp_path):
    """Spark 4 transformWithStateInPandas: per-user running peak with
    ValueState — final peak per user must equal the batch max, and
    n_peaks must be the count of strictly-increasing prefix maxima in
    file order is NOT deterministic, so only the final peak is pinned."""
    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas needs protobuf (absent in container)",
    )
    from manufacturing_data_integration_tool_spark.streaming import user_value_peaks

    src_dir = tmp_path / "events_in"
    ev = read_table(spark, sf_dir, "events").drop("ts_ns").limit(300)
    ev.write.parquet(str(src_dir))
    written = spark.read.parquet(str(src_dir))
    exp = {
        r["user_id"]: r["mx"]
        for r in written.groupBy("user_id").agg(F.max("value").alias("mx")).collect()
    }

    schema = written.schema
    stream = spark.readStream.schema(schema).parquet(str(src_dir))
    peaks = user_value_peaks(stream)
    q = (
        peaks.writeStream.format("memory")
        .queryName("peaks_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    rows = spark.sql(
        "select user_id, max(peak_value) pk, max(n_peaks) np from peaks_out group by user_id"
    ).collect()
    got = {r["user_id"]: r["pk"] for r in rows}
    assert got == exp
    assert all(r["np"] >= 1 for r in rows)


def test_user_value_peaks_raises_eagerly_without_protobuf(spark, sf_dir):
    """Driver-side guard: missing protobuf must fail fast with a clear
    message, not crash the streaming Python worker mid-query."""
    import pytest

    try:
        import google.protobuf  # noqa: F401

        pytest.skip("protobuf installed; eager-guard path not reachable")
    except ImportError:
        pass
    from manufacturing_data_integration_tool_spark.streaming import user_value_peaks

    ev = read_table(spark, sf_dir, "events").drop("ts_ns")
    with pytest.raises(RuntimeError, match="protobuf"):
        user_value_peaks(ev)


def test_running_ewma_matches_python_recursion(spark, sf_dir, tmp_path):
    from manufacturing_data_integration_tool_spark.streaming import running_ewma

    src_dir = tmp_path / "events_ewma"
    ev = read_table(spark, sf_dir, "events").drop("ts_ns").limit(300)
    ev.write.parquet(str(src_dir))
    written = spark.read.parquet(str(src_dir)).select(
        "user_id", "ts", "event_id", "value"
    ).collect()

    # pure-Python recursion over (ts, event_id)-ordered history per user
    alpha = 0.3
    hist = {}
    for r in sorted(written, key=lambda r: (r["ts"], r["event_id"])):
        n, s = hist.get(r["user_id"], (0, 0.0))
        x = float(r["value"])
        s = x if n == 0 else alpha * x + (1.0 - alpha) * s
        hist[r["user_id"]] = (n + 1, s)

    schema = spark.read.parquet(str(src_dir)).schema
    stream = spark.readStream.schema(schema).parquet(str(src_dir))
    out = running_ewma(stream, ts_col="ts", alpha=alpha)
    q = (
        out.writeStream.format("memory")
        .queryName("ewma_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_ewma"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    rows = spark.sql(
        "select user_id, max_by(n_events, n_events) n, max_by(ewma, n_events) e "
        "from ewma_out group by user_id"
    ).collect()
    got = {r["user_id"]: (r["n"], r["e"]) for r in rows}
    assert set(got) == set(hist)
    for u, (n, s) in hist.items():
        assert got[u][0] == n
        assert abs(got[u][1] - s) < 1e-9
