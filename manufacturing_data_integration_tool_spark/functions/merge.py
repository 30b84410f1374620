"""Batch MERGE/upsert semantics as one equi-join (SCD1 snapshot apply).

Greenfield LLM-pipeline capability: corpus snapshots are re-built by
applying change batches (new crawls, takedown/deletion lists, metadata
fixes) to the at-rest table. Table formats (Delta/Iceberg) provide MERGE
as DML; this is the same semantics expressed as a pure DataFrame transform
so it runs on plain parquet and stays oracle-able as ANSI SQL.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["merge_upsert", "snapshot_diff"]


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    *,
    delete_col: Optional[str] = None,
    insert_unmatched: bool = True,
) -> DataFrame:
    """Apply ``source`` onto ``target`` with MERGE semantics, keyed on
    ``keys``:

    * matched -> source's non-key columns overwrite the target's (SCD1);
      a NULL in the source still overwrites (it's a value, not 'absent') —
      per-column conditional update is a projection tweak, not a new plan.
    * matched and ``source[delete_col]`` true -> row is dropped;
    * source-only -> inserted when ``insert_unmatched`` (classic upsert);
    * target-only -> kept unchanged.

    Exactly ONE full-outer shuffle join on the keys — the minimum data
    movement any MERGE needs without table-format min/max file pruning.
    ``source`` must be key-unique (enforce upstream with
    ``ops.dedup.exact_dedup``); duplicate source keys would fan out
    matched rows, which is the same constraint Delta's MERGE enforces at
    runtime. 100 TB posture: the join inherits AQE skew splitting; with a
    small change batch the optimizer (or a ``broadcast()`` hint upstream)
    turns the full-outer into a cheap broadcast-able shape only when
    ``insert_unmatched`` is False (full-outer can't broadcast) — the
    normal nightly-apply case shuffles once on the snapshot's natural key,
    which a bucketed snapshot layout makes shuffle-free on the big side.

    Output column order: keys, then target's non-key columns.
    """
    keys = list(keys)
    non_keys = [c for c in target.columns if c not in keys]
    src_cols = set(source.columns)
    for k in keys:
        if k not in src_cols:
            raise ValueError(f"source is missing key column {k!r}")
    # USING-style join coalesces the key columns; side membership comes
    # from per-side literal markers (non-key columns may legitimately be
    # NULL, so they can't be the membership test)
    t2 = target.withColumn("__t_present", F.lit(1)).alias("t")
    s2 = source.withColumn("__s_present", F.lit(1)).alias("s")
    joined = t2.join(s2, keys, "full_outer")
    in_t = F.col("__t_present").isNotNull()
    in_s = F.col("__s_present").isNotNull()
    deleted = (
        in_s & F.coalesce(F.col(f"s.{delete_col}"), F.lit(False))
        if delete_col is not None
        else F.lit(False)
    )
    keep = ~deleted & (in_t | (in_s & F.lit(bool(insert_unmatched))))
    out_cols = [F.col(k) for k in keys]
    for c in non_keys:
        if c in src_cols:
            out_cols.append(
                F.when(in_s, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            )
        else:
            out_cols.append(F.col(f"t.{c}").alias(c))
    return joined.filter(keep).select(*out_cols)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    *,
    compare_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Classify every key between two snapshots of the same table:
    ``added`` / ``removed`` / ``changed`` / ``unchanged`` — the audit
    companion to :func:`merge_upsert` (what DID the nightly apply
    change?), and the generic CDC-extraction primitive when the upstream
    system only hands over full snapshots.

    Content equality is a canonical md5 over ``compare_cols`` (default:
    all shared non-key columns, in ``old``'s column order) with
    NULL-safe encoding: each value is cast to string and NULL maps to a
    ``chr(0)`` sentinel, fields joined on a ``chr(31)`` separator — the
    same engine-portable framing the dedup family uses, so the whole
    diff carries a SQL oracle.

    Exactly ONE full-outer shuffle join on the keys (the minimum any
    snapshot diff needs); hashes are computed map-side before the join,
    so the shuffle carries (key, 32-byte hash), never the payload.
    Output: key columns + ``change_type`` + ``old_hash`` / ``new_hash``
    (NULL on the absent side).
    """
    keys = list(keys)
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in keys]
    if not compare_cols:
        raise ValueError("no compare columns")

    def _hash(df: DataFrame, out: str) -> DataFrame:
        parts = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
            for c in compare_cols
        ]
        return df.select(
            *keys, F.md5(F.concat_ws("\x1f", *parts)).alias(out)
        )

    o = _hash(old, "old_hash")
    n = _hash(new, "new_hash")
    joined = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") == F.col("new_hash"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(*keys, change.alias("change_type"), "old_hash", "new_hash")
