"""Data-layout keys for scan pruning at rest (Z-order / Morton curves).

Greenfield scale capability (no reference counterpart). Parquet data
skipping works off per-row-group min/max statistics: sorting the corpus by
ONE column clusters that column's ranges but leaves every other filter
column shuffled across row groups. A Morton (Z-order) interleave of two
key columns keeps BOTH columns' ranges locally tight, so
``df.repartitionByRange(zorder_key_2d(a, b)).sortWithinPartitions(...)``
written to parquet lets filters on either column prune row groups — the
open-source answer to Delta/Iceberg table OPTIMIZE ZORDER, expressed as a
plain column.

Everything here is bit arithmetic on JVM-side Column expressions
(``shiftleft``/``|``/``&`` loops unrolled at plan-build time) — zero
Python per row, fully codegen'd.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, functions as F

__all__ = [
    "write_range_sorted",
    "interleave_bits_16",
    "zorder_key_2d",
    "write_zordered",
    "write_bucketed",
    "compact_small_files",
]


def _spread_16(c: Column) -> Column:
    """Spread the low 16 bits of ``c`` so bit i lands at position 2*i.

    Classic magic-number bit spreading (public-domain Morton-code idiom),
    unrolled into 4 shift/mask expression pairs.
    """
    x = c.cast("bigint").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in (
        (8, 0x00FF00FF),
        (4, 0x0F0F0F0F),
        (2, 0x33333333),
        (1, 0x55555555),
    ):
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def interleave_bits_16(a: Column | str, b: Column | str) -> Column:
    """Bit-interleave the low 16 bits of two integer columns (a even bits,
    b odd bits) into one 32-bit Morton code."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return _spread_16(ca).bitwiseOR(F.shiftleft(_spread_16(cb), 1))


def zorder_key_2d(
    a: Column | str,
    b: Column | str,
    *,
    a_min: int = 0,
    a_max: int = 65535,
    b_min: int = 0,
    b_max: int = 65535,
) -> Column:
    """Z-order sort key over two integer-ish columns.

    Values are affinely rescaled into [0, 65535] (16 bits per dimension —
    65536 distinct cells per axis is far finer than row-group granularity)
    then bit-interleaved. Sort/range-partition by this key before writing
    parquet and min/max stats stay tight on BOTH columns.

    Bounds are explicit (not computed) so the key is a pure per-row
    expression — at 100 TB take them from table-level stats you already
    track; stale-but-ordered bounds only soften clustering, never break
    correctness.
    """
    ca = (F.col(a) if isinstance(a, str) else a).cast("double")
    cb = (F.col(b) if isinstance(b, str) else b).cast("double")

    def scale(c: Column, lo: int, hi: int) -> Column:
        if hi <= lo:
            raise ValueError(f"bad bounds: [{lo}, {hi}]")
        unit = (c - F.lit(float(lo))) / F.lit(float(hi - lo))
        clamped = F.least(F.greatest(unit, F.lit(0.0)), F.lit(1.0))
        return F.floor(clamped * F.lit(65535.0)).cast("bigint")

    return interleave_bits_16(scale(ca, a_min, a_max), scale(cb, b_min, b_max))


def write_zordered(
    df,
    path: str,
    a: str,
    b: str,
    *,
    n_files: int,
    a_min: int = 0,
    a_max: int = 65535,
    b_min: int = 0,
    b_max: int = 65535,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on the 2-D Z-order of (a, b).

    ``repartitionByRange`` on the z-key gives each output file a contiguous
    Morton range; ``sortWithinPartitions`` tightens row-group stats inside
    the file. Readers filtering on EITHER column then skip most row groups
    via parquet min/max pushdown. One range shuffle — the same cost as any
    sorted write — and the z-key itself is dropped from the stored schema.
    """
    z = zorder_key_2d(a, b, a_min=a_min, a_max=a_max, b_min=b_min, b_max=b_max)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def write_bucketed(
    df,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    *,
    sort_cols: Optional[Sequence[str]] = None,
    mode: str = "overwrite",
    path: Optional[str] = None,
) -> None:
    """Persist ``df`` as a BUCKETED table on ``bucket_cols`` — the at-rest
    layout that makes repeated large-large joins and aggregations on the
    bucket key SHUFFLE-FREE: both sides pre-hashed into the same bucket
    scheme means SortMergeJoin reads co-located buckets with no Exchange
    (verified by ``test_bucketed_join_has_no_exchange``).

    This is the 100 TB answer for the engine's recurring join keys
    (orderkey between orders/lineitem, doc_id between corpus tables): pay
    ONE shuffle at write time, amortize it over every downstream join.
    Bucketing requires the session catalog (``saveAsTable``) — plain
    ``.parquet(path)`` files can't carry bucket metadata; pass ``path``
    to control the physical location as an external table.
    """
    w = df.write.mode(mode).format("parquet")
    if path is not None:
        w = w.option("path", path)
    if sort_cols:
        w = w.bucketBy(n_buckets, *bucket_cols).sortBy(*sort_cols)
    else:
        w = w.bucketBy(n_buckets, *bucket_cols)
    w.saveAsTable(table)


def compact_small_files(
    spark,
    src_path: str,
    dest_path: str,
    *,
    target_file_bytes: int = 512 * 1024 * 1024,
    mode: str = "overwrite",
) -> int:
    """Rewrite a parquet directory into ~``target_file_bytes`` files and
    return the output file count chosen.

    Streaming appends and fine-grained partitioned writes accumulate
    thousands of small files; at scale the metadata listing and per-file
    open cost dominate scans (the classic small-files problem). This
    measures the directory's on-disk bytes via the Hadoop FileSystem API
    (driver-side metadata only, no data read), picks
    ``ceil(bytes / target)`` output files, and rewrites with a
    ``repartition(n)`` round-robin shuffle — one pass, uniformly sized
    outputs, no driver materialization.
    """
    jvm = spark._jvm
    jsc = spark._jsc
    conf = jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = p.getFileSystem(conf)
    total = fs.getContentSummary(p).getLength()
    n_files = max(1, -(-int(total) // int(target_file_bytes)))
    (
        spark.read.parquet(src_path)
        .repartition(n_files)
        .write.mode(mode)
        .parquet(dest_path)
    )
    return n_files


def write_range_sorted(
    df: DataFrame,
    order_cols: Sequence[str],
    path: str,
    *,
    n_files: int = 8,
    descending: bool = False,
    mode: str = "overwrite",
) -> None:
    """Write a GLOBALLY range-sorted parquet layout — the curriculum-
    ordering / merge-friendly layout: file i's last key <= file i+1's
    first key, and rows inside each file are sorted.

    ``repartitionByRange`` samples the ordering key to build balanced
    range boundaries (a tiny sampling job — never a global sort), then
    each of the ``n_files`` partitions sorts LOCALLY and writes one file.
    A curriculum trainer can then stream part files in name order and see
    quality-ascending (or descending) data; a downstream merge join can
    treat the directory as pre-sorted runs. Cost at any scale: one
    sampling pass + one shuffle + per-partition sorts — no single-task
    global sort anywhere.

    Footer min/max stats also become perfectly disjoint on the leading
    key, so range predicates prune whole files (same data-skipping payoff
    as Z-order, specialized to one dimension).
    """
    cols = [
        (F.col(c).desc() if descending else F.col(c).asc()) for c in order_cols
    ]
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .parquet(path)
    )
