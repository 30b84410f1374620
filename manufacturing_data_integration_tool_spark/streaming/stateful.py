"""Custom stateful streaming operators (SURVEY.md §2.9 greenfield surface).

Two tiers, both designed for unbounded state discipline at scale:

* ``streaming_dedup`` — built-in ``dropDuplicatesWithinWatermark``: state is
  bounded by the watermark horizon, keys expire automatically. This is the
  streaming twin of ``ops.dedup.exact_dedup`` and the right default for
  at-least-once sources that can re-deliver (e.g. file redelivery, Kafka
  reprocessing).
* ``running_user_stats`` — ``applyInPandasWithState``: an Arrow-batched
  per-key state machine for semantics the built-in aggregations can't
  express (here: running count + sum + last-seen timestamp with idle-state
  timeout eviction). The Python boundary is crossed per key-batch, not
  per row, and state is partitioned by the grouping key — horizontal scale
  comes from the shuffle, exactly like a groupBy.
"""

from __future__ import annotations

from typing import Iterator, Tuple

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = [
    "streaming_dedup",
    "running_user_stats",
    "RUNNING_STATS_SCHEMA",
    "user_value_peaks",
    "PEAK_SCHEMA",
]


def streaming_dedup(
    events: DataFrame,
    keys: list[str],
    *,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once-per-key emission within the watermark horizon.

    State size is bounded: a key's dedup record is dropped once the
    watermark passes it (unbounded plain ``dropDuplicates`` state is the
    classic streaming OOM at scale)."""
    from .file_pipeline import ensure_event_time

    return (
        ensure_event_time(events, ts_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(keys)
    )


RUNNING_STATS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_seen_us", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("last_us", T.LongType()),
    ]
)


def _make_stats_fn(idle_timeout_ms: int | None):
    def _stats_fn(
        key: Tuple, pdf_iter: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if state.hasTimedOut:
            # idle key: emit final snapshot and evict the state
            (n, total, last_us) = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total], "last_seen_us": [last_us]}
            )
            return

        n, total, last_us = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
            last_us = max(last_us, int(pdf["t_us"].max()))
        state.update((n, total, last_us))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total], "last_seen_us": [last_us]}
        )

    return _stats_fn


def running_user_stats(
    events: DataFrame, *, ts_col: str = "ts", idle_timeout_ms: int | None = None
) -> DataFrame:
    """Running per-user count/sum (``applyInPandasWithState``). Expects
    ``user_id``, ``value`` and an event-time column; emits one updated row
    per user per micro-batch.

    ``idle_timeout_ms`` arms ProcessingTimeTimeout state eviction (an idle
    key emits a final snapshot and is removed) — the right setting for a
    CONTINUOUS stream where dormant keys must not hold state forever. The
    default is NoTimeout: a drain-and-stop run (``availableNow``) with
    pending processing-time timers never terminates — Spark keeps firing
    no-data batches waiting for the timers to come due (observed: 750+
    empty micro-batches against a 4-file source), so timers are opt-in."""
    if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
        # timezone-free epoch micros for NTZ storage (unix_micros only
        # accepts TIMESTAMP; the naive wall-clock maps to epoch directly)
        t_us = F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
        ).cast("bigint")
    else:
        t_us = F.unix_micros(F.col(ts_col))
    src = events.select(
        "user_id",
        F.col("value").cast("double").alias("value"),
        t_us.alias("t_us"),
    )
    return src.groupBy("user_id").applyInPandasWithState(
        _make_stats_fn(idle_timeout_ms),
        outputStructType=RUNNING_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if idle_timeout_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )


PEAK_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("peak_value", T.DoubleType()),
        T.StructField("n_peaks", T.LongType()),
    ]
)


def user_value_peaks(events: DataFrame, *, ttl_ms: int | None = None) -> DataFrame:
    """Per-user running-peak detector on Spark 4's
    ``transformWithStateInPandas`` — the successor API to
    ``applyInPandasWithState`` (SPARK-49564 "State API v2"): typed state
    handles (ValueState here), optional per-state TTL, and timer support,
    with state partitioned by the grouping key exactly like a shuffle.

    Emits one row per input micro-batch per user whose batch contained a
    new all-time-high ``value``: ``(user_id, peak_value, n_peaks)`` where
    ``n_peaks`` counts how many times the peak has been raised. State per
    key is ONE (double, long) pair — bounded regardless of stream length,
    and evicted by TTL when ``ttl_ms`` is set (dormant users cost nothing).

    The Python boundary is crossed per key-batch (Arrow), not per row;
    horizontal scale comes from the key shuffle. Scale posture matches
    ``running_user_stats`` with the newer, TTL-capable state store API.

    Requires ``protobuf`` (the State API v2 Python worker speaks protobuf
    to the state server); raises eagerly driver-side when it is missing —
    this container ships without it, so the operator is exercised by a
    skippable test and ``running_user_stats`` stays the in-container path.
    """
    try:
        import google.protobuf  # noqa: F401, PLC0415
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise RuntimeError(
            "user_value_peaks needs the 'protobuf' package "
            "(transformWithStateInPandas state-server protocol); install "
            "protobuf or use running_user_stats (applyInPandasWithState)."
        ) from exc
    from pyspark.sql.streaming import StatefulProcessor  # noqa: PLC0415

    class PeakProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._state = handle.getValueState(
                "peak", "peak double, n bigint", ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd  # noqa: PLC0415

            peak, n = (None, 0)
            if self._state.exists():
                peak, n = self._state.get()
            raised = False
            for pdf in rows:
                for v in pdf["value"]:
                    fv = float(v)
                    if peak is None or fv > peak:
                        peak, n = fv, n + 1
                        raised = True
            if raised:
                self._state.update((peak, n))
                yield pd.DataFrame(
                    {"user_id": [key[0]], "peak_value": [peak], "n_peaks": [n]}
                )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        PeakProcessor(),
        outputStructType=PEAK_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


EWMA_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)

_EWMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)


def running_ewma(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    alpha: float = 0.3,
    id_col: str = "event_id",
) -> DataFrame:
    """Streaming per-user EWMA — the stream twin of the batch
    ``ops.stats.ewma_trailing`` smoother, as the textbook recursion
    ``s = alpha*x + (1-alpha)*s`` over per-key state
    (``applyInPandasWithState``).

    Within each micro-batch the rows are applied in ``(event time, id)``
    order, so a replay that delivers the same files in the same batching
    reproduces the same state (the batch-parity test pins this against a
    pure-Python recursion). Unlike the batch operator there is no depth
    truncation — the state is O(1) per key (count + current smoothed
    value), the streaming advantage.

    Emits one updated ``(user_id, n_events, ewma)`` row per key per
    micro-batch.
    """
    a = float(alpha)

    def _ewma_fn(
        key: Tuple, pdf_iter: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        n, s = state.get if state.exists else (0, 0.0)
        # A key's micro-batch rows can arrive split across several Arrow
        # chunks in arbitrary order (default ~10k rows/chunk); sorting
        # each chunk independently would make the EWMA order-dependent
        # for hot keys. Materialize the key's whole micro-batch and sort
        # ONCE — memory is bounded by the key's per-batch volume, which
        # any per-key sorted fold needs anyway.
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(["t_us", "__id"])
            for x in pdf["value"].to_list():
                s = x if n == 0 else a * x + (1.0 - a) * s
                n += 1
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "ewma": [s]}
        )

    if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
        t_us = F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
        ).cast("bigint")
    else:
        t_us = F.unix_micros(F.col(ts_col))
    src = events.select(
        "user_id",
        F.col("value").cast("double").alias("value"),
        t_us.alias("t_us"),
        F.col(id_col).alias("__id"),
    )
    return src.groupBy("user_id").applyInPandasWithState(
        _ewma_fn,
        outputStructType=EWMA_SCHEMA,
        stateStructType=_EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
