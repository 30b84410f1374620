"""Stream-stream time-bounded joins with watermark-driven state eviction.

The one Structured Streaming join shape a large pipeline cannot live
without: correlate two UNBOUNDED event streams (click -> purchase,
order -> shipment, sensor -> alarm) where a match is only valid inside a
time window after the left event. Spark buffers both sides in join
state; the BOTH-side watermarks plus the event-time range condition are
what let it EVICT state — without them the state store grows without
bound and the job eventually dies. This module packages the correct
recipe so callers can't forget either half.

100 TB posture: state per key is bounded by (watermark + upper bound)
worth of events, independent of stream length; the join itself is the
same hash-partitioned-by-key exchange as a batch equi-join, so skew
tooling (AQE skew splits) applies unchanged. The SAME builder applied to
two batch DataFrames degenerates to the plain equi-join + range filter,
which is the batch==stream parity contract pinned in
``tests/test_streaming.py``.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["interval_join"]


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    left_ts: str,
    right_ts: str,
    lower: str = "INTERVAL 0 SECONDS",
    upper: str = "INTERVAL 1 HOUR",
    watermark: str = "2 hours",
    how: str = "inner",
    extra_condition: Optional[Column] = None,
) -> DataFrame:
    """Join ``left`` and ``right`` on equality of ``on`` plus the event-time
    interval ``left_ts + lower < right_ts <= left_ts + upper``.

    Works on two STREAMING frames (watermarks are applied to both sides —
    required for state eviction, and for any outer ``how``) and, with the
    identical call, on two BATCH frames (watermarks are skipped; the plan
    is the plain equi-join + range predicate), so batch==stream parity is
    testable with one pipeline definition.

    ``on`` columns must exist on both sides with the same names; the
    timestamp columns must be distinct names (they both survive into the
    output, which the interval predicate requires). ``lower``/``upper``
    are SQL INTERVAL literals; ``watermark`` is the max expected event
    lateness. Outer joins emit the unmatched side only after the
    watermark passes ``upper`` — that is Spark's contract, not this
    wrapper's choice.

    State bound, precisely: each side buffers rows until its watermark
    clears ``other_ts`` range ± the interval — O(rate x (watermark +
    interval)) rows per key, forever, regardless of stream length.
    """
    if left_ts == right_ts:
        raise ValueError(
            "left_ts and right_ts must be distinct column names "
            f"(both was {left_ts!r}) — the interval predicate needs both "
            "in scope after the join"
        )
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    # dataset aliases make the key equality and the duplicate-key drop
    # SELF-JOIN SAFE: when both sides derive from the same parent frame,
    # bare left[c] == right[c] shares attribute ids — the equality can
    # collapse to trivially-true and the drop can remove the LEFT key
    # (observed as null keys on outer-join unmatched rows). Qualified
    # references resolve per side regardless of shared lineage.
    left, right = left.alias("__ij_l"), right.alias("__ij_r")
    cond = (
        (F.col(right_ts) > F.col(left_ts) + F.expr(lower))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(upper))
    )
    for c in on:
        cond = cond & (F.col(f"__ij_l.{c}") == F.col(f"__ij_r.{c}"))
    if extra_condition is not None:
        cond = cond & extra_condition
    out = left.join(right, cond, how)
    # equality keys appear on both sides under distinct qualifiers; keep
    # the left one and drop the right duplicate so downstream code sees
    # each key once (matches batch-join-with-name-list ergonomics)
    for c in on:
        out = out.drop(F.col(f"__ij_r.{c}"))
    return out
