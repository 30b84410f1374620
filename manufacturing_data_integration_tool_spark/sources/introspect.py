"""Storage-layout introspection: distributed parquet FOOTER audits.

At 100 TB a lakehouse's health lives in its file footers: row-group
sizing (too small → task-scheduling overhead; too large → no skipping
granularity), zone-map (min/max statistics) coverage (missing stats →
no predicate skipping at the scan), and per-column compression ratios
(a 1.0× column wants a different encoding). The reference tool has no
storage layer at all (it row-loops CSVs — `src/data_processor.py`);
this module is the Spark-native capability a 1000-executor deployment
needs to AUDIT the layout levers `functions/layout.py` writes
(Z-order, range-sort, compaction, bucketing).

Scale posture: the audit never reads data pages. File paths are
parallelized into a DataFrame and `mapInPandas` tasks open ONLY the
footer of each file (a few KB regardless of file size — pyarrow reads
the tail), so auditing a million-file table costs a million footer
fetches spread across the cluster, not a scan. Aggregation to
per-table rows happens in Spark, keyed by table name, so the driver
sees one row per table, never one per file or per row group.

All published byte/row counters are exact integers straight from the
thrift footer (`RowGroup.total_byte_size` breakdown per column chunk:
``total_compressed_size`` / ``total_uncompressed_size``), so an
independent footer reader (e.g. DuckDB's ``parquet_metadata()``)
reproduces them bit-for-bit; the compression ratio is published on an
integer x1000 lattice to stay engine-portable.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["parquet_footer_audit"]

# One output row per (file, row group): small enough to aggregate in
# Spark, granular enough to audit row-group sizing per group.
_FOOTER_SCHEMA = (
    "table_name string, file_path string, row_group_id int, "
    "rg_rows bigint, n_chunks bigint, n_chunks_with_minmax bigint, "
    "compressed_bytes bigint, uncompressed_bytes bigint"
)


def _read_footers(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched kernel: one input row = one parquet file path;
    output = one row per row group, straight from the footer. Data
    pages are never touched."""
    import pyarrow.parquet as pq

    for pdf in batches:
        out: list[dict] = []
        for table_name, path in zip(pdf["table_name"], pdf["file_path"]):
            md = pq.ParquetFile(path).metadata
            for i in range(md.num_row_groups):
                rg = md.row_group(i)
                comp = unc = with_stats = 0
                for j in range(rg.num_columns):
                    chunk = rg.column(j)
                    comp += chunk.total_compressed_size
                    unc += chunk.total_uncompressed_size
                    st = chunk.statistics
                    if st is not None and st.has_min_max:
                        with_stats += 1
                out.append(
                    {
                        "table_name": table_name,
                        "file_path": path,
                        "row_group_id": i,
                        "rg_rows": rg.num_rows,
                        "n_chunks": rg.num_columns,
                        "n_chunks_with_minmax": with_stats,
                        "compressed_bytes": comp,
                        "uncompressed_bytes": unc,
                    }
                )
        yield pd.DataFrame(
            out,
            columns=[
                "table_name",
                "file_path",
                "row_group_id",
                "rg_rows",
                "n_chunks",
                "n_chunks_with_minmax",
                "compressed_bytes",
                "uncompressed_bytes",
            ],
        )


def parquet_footer_audit(
    spark: SparkSession,
    files: Sequence[tuple[str, str]],
) -> DataFrame:
    """Audit parquet physical layout from footers only.

    ``files`` is ``[(table_name, file_path), ...]`` — typically the
    result of listing a table's directory (driver-side metadata, like
    every file-listing Spark itself performs). Returns one row per
    table: row-group count/sizing, zone-map (min/max) coverage over
    column chunks, exact compressed/uncompressed byte totals, and the
    compression ratio on an integer x1000 lattice.
    """
    paths_df = spark.createDataFrame(
        list(files), "table_name string, file_path string"
    )
    # One footer read per task slot: tiny lists stay in one partition,
    # million-file tables fan out.
    n_parts = max(1, min(len(files), spark.sparkContext.defaultParallelism))
    per_group = paths_df.repartition(n_parts).mapInPandas(
        _read_footers, _FOOTER_SCHEMA
    )
    return (
        per_group.groupBy("table_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_row_groups"),
            F.sum("rg_rows").cast("bigint").alias("n_rows"),
            F.min("rg_rows").cast("bigint").alias("min_rg_rows"),
            F.max("rg_rows").cast("bigint").alias("max_rg_rows"),
            F.sum("n_chunks").cast("bigint").alias("n_chunks"),
            F.sum("n_chunks_with_minmax")
            .cast("bigint")
            .alias("n_chunks_with_minmax"),
            F.sum("compressed_bytes").cast("bigint").alias("compressed_bytes"),
            F.sum("uncompressed_bytes")
            .cast("bigint")
            .alias("uncompressed_bytes"),
        )
        .withColumn(
            # exact integer division (`div` here, `//` in the oracle):
            # never a double, so engines agree bit-for-bit
            "compression_x1000",
            F.expr(
                "(uncompressed_bytes * 1000L) div compressed_bytes"
            ).cast("bigint"),
        )
        .orderBy("table_name")
    )
