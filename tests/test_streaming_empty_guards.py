"""Zero-output-stream guards for the driver's streaming value queries
(r10 ADVICE): an events table that streams zero rows must yield an EMPTY
result frame with the contracted schema — not a schema-inference crash on
a never-created / data-less sink directory. Exercised end-to-end by
pointing q384/q385/q394 at a synthetic sf_dir whose events.parquet has
the production schema but no rows."""

import pytest

import __spark_entry__ as entry


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory) -> str:
    base = tmp_path_factory.mktemp("sf_empty")
    empty_events = spark.createDataFrame(
        [],
        "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double, props string",
    )
    empty_events.coalesce(1).write.parquet(str(base / "events.parquet"))
    return str(base)


def test_q384_running_stats_empty_stream(spark, empty_sf_dir):
    out = entry.q384_streaming_running_stats(spark, empty_sf_dir)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "user_id", "n_events", "total_cents", "last_seen_us",
    ]


def test_q385_interval_join_empty_stream(spark, empty_sf_dir):
    out = entry.q385_streaming_interval_join(spark, empty_sf_dir)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "user_id", "click_id", "purchase_id",
    ]


def test_q394_streaming_dedup_empty_stream(spark, empty_sf_dir):
    out = entry.q394_streaming_dedup(spark, empty_sf_dir)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "event_id", "user_id", "event_type", "cents", "ts_us",
    ]


def test_q396_session_window_empty_stream(spark, empty_sf_dir):
    out = entry.q396_streaming_session_window(spark, empty_sf_dir)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "user_id", "session_start_us", "session_end_us", "n_events",
    ]
