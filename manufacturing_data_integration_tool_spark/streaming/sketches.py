"""Streaming sketch accumulation: mergeable sketches maintained across
micro-batches.

Greenfield LLM-pipeline capability: corpus-wide statistics (term
frequencies here, distinct counts by the same pattern) that must stay
current as crawl batches land, WITHOUT rescanning the corpus. The
Count-Min sketch's merge rule is plain cell summation
(``ops.text.countmin_sketch``), so ``foreachBatch`` can fold each
micro-batch's sketch into a persisted cell table and the result is
EXACTLY the sketch of the full corpus — order-independent, restart-safe
(checkpointed source offsets + atomic directory swap).

100 TB posture: the persisted state is ``depth * width`` cells — KBs —
so unlike a CDC snapshot merge (rewrite scales with the snapshot) every
micro-batch does O(batch) scan work plus an O(sketch) rewrite, forever.
This is the property that makes sketches the streaming-rollup
counterpart to exact recounts.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, functions as F

from ..ops.text import countmin_sketch

__all__ = ["accumulate_countmin_stream", "accumulate_bloom_stream"]


def accumulate_countmin_stream(
    docs: DataFrame,
    sketch_path: str,
    *,
    text_col: str = "text",
    depth: int = 4,
    width: int = 2048,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Start a stream folding each micro-batch's Count-Min sketch into
    the parquet cell table at ``sketch_path``.

    Each micro-batch: ``countmin_sketch(batch)`` -> union with the
    persisted (row, col, cnt) table -> one (row, col) sum -> write to
    staging -> rename-swap (readers see the old or the new sketch,
    never a partial write). Because CMS merge is cell addition, the
    accumulated table is bit-identical to the batch sketch of all rows
    seen so far, however the input was micro-batched — pinned by
    ``tests/test_streaming.py``.

    Returns the StreamingQuery. ``trigger_available_now`` drains pending
    input then stops; pass False for a continuous stream.
    """
    target = Path(sketch_path)
    staging = target.with_name(target.name + ".staging")
    backup = target.with_name(target.name + ".previous")

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        delta = countmin_sketch(batch, text_col, depth=depth, width=width)
        if target.exists():
            current = spark.read.parquet(str(target))
            merged = (
                current.unionByName(delta)
                .groupBy("row", "col")
                .agg(F.sum("cnt").alias("cnt"))
            )
        else:
            merged = delta
        # materialize BEFORE touching the live dir (the plan reads it)
        merged.write.mode("overwrite").parquet(str(staging))
        if backup.exists():
            shutil.rmtree(backup)
        if target.exists():
            target.rename(backup)
        staging.rename(target)
        if backup.exists():
            shutil.rmtree(backup)

    writer = (
        docs.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def accumulate_bloom_stream(
    keys: DataFrame,
    filter_path: str,
    *,
    key_col: str = "doc_id",
    m_words: int = 256,
    k: int = 4,
    salt: int = 0,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Start a stream folding each micro-batch's Bloom filter
    (``ops.stats.bloom_build``) into the persisted (word_idx, bits)
    table at ``filter_path`` — the membership-index sibling of the
    Count-Min accumulator above: merge is per-word ``bit_or``, which is
    idempotent AND commutative, so the accumulated filter is
    bit-identical to the batch filter of every key seen so far however
    the input was micro-batched — and at-least-once redelivery of a
    batch is a no-op by construction (OR-ing the same bits twice).

    The standing use: a contamination / already-ingested membership
    index that each new crawl batch both probes (``bloom_probe``
    against the persisted table) and extends — KBs of state forever,
    the same swap-rename crash discipline as the CMS accumulator.
    """
    from ..ops.stats import bloom_build

    target = Path(filter_path)
    staging = target.with_name(target.name + ".staging")
    backup = target.with_name(target.name + ".previous")

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        delta = bloom_build(batch, key_col, m_words=m_words, k=k, salt=salt)
        if target.exists():
            current = spark.read.parquet(str(target))
            merged = (
                current.unionByName(delta)
                .groupBy("word_idx")
                .agg(F.bit_or("bits").alias("bits"))
            )
        else:
            merged = delta
        merged.write.mode("overwrite").parquet(str(staging))
        if backup.exists():
            shutil.rmtree(backup)
        if target.exists():
            target.rename(backup)
        staging.rename(target)
        if backup.exists():
            shutil.rmtree(backup)

    writer = (
        keys.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
