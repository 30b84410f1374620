"""parquet_footer_audit: distributed footer reads vs pyarrow/DuckDB truth.

The audit must agree bit-for-bit with an independent footer reader on
files it did not write, including multi-row-group files and column
chunks written WITHOUT min/max statistics (the zone-map-coverage case
the audit exists to flag).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from manufacturing_data_integration_tool_spark.sources.introspect import (
    parquet_footer_audit,
)


@pytest.fixture(scope="module")
def layout_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("layout")
    # multi-row-group file with a ragged tail (min_rg_rows != max_rg_rows)
    big = pa.table(
        {
            "k": list(range(250)),
            "v": [f"row-{i:05d}" for i in range(250)],
        }
    )
    pq.write_table(big, d / "facts.parquet", row_group_size=100)
    # single-group file with statistics disabled on one column: its
    # chunks must count toward n_chunks but NOT n_chunks_with_minmax
    small = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    pq.write_table(
        small,
        d / "dims.parquet",
        write_statistics=["a"],
    )
    return d


def test_footer_audit_matches_duckdb_metadata(spark, layout_dir):
    files = [
        ("dims", str(layout_dir / "dims.parquet")),
        ("facts", str(layout_dir / "facts.parquet")),
    ]
    got = parquet_footer_audit(spark, files).toPandas()

    con = duckdb.connect()
    want = con.execute(
        f"""
        WITH rg AS (
          SELECT regexp_extract(file_name, '([^/]+)[.]parquet$', 1)
                   AS table_name,
                 file_name, row_group_id,
                 any_value(row_group_num_rows) AS rg_rows,
                 COUNT(*) AS chunks,
                 SUM(CASE WHEN stats_min_value IS NOT NULL
                           AND stats_max_value IS NOT NULL
                          THEN 1 ELSE 0 END) AS with_minmax,
                 SUM(total_compressed_size) AS comp,
                 SUM(total_uncompressed_size) AS unc
          FROM parquet_metadata('{layout_dir}/*.parquet')
          GROUP BY 1, 2, 3
        )
        SELECT table_name,
               CAST(COUNT(*) AS BIGINT) AS n_row_groups,
               CAST(SUM(rg_rows) AS BIGINT) AS n_rows,
               CAST(MIN(rg_rows) AS BIGINT) AS min_rg_rows,
               CAST(MAX(rg_rows) AS BIGINT) AS max_rg_rows,
               CAST(SUM(chunks) AS BIGINT) AS n_chunks,
               CAST(SUM(with_minmax) AS BIGINT) AS n_chunks_with_minmax,
               CAST(SUM(comp) AS BIGINT) AS compressed_bytes,
               CAST(SUM(unc) AS BIGINT) AS uncompressed_bytes,
               CAST((SUM(unc) * 1000) // SUM(comp) AS BIGINT)
                 AS compression_x1000
        FROM rg GROUP BY 1 ORDER BY 1
        """
    ).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )


def test_footer_audit_flags_layout_facts(spark, layout_dir):
    files = [
        ("dims", str(layout_dir / "dims.parquet")),
        ("facts", str(layout_dir / "facts.parquet")),
    ]
    rows = {
        r["table_name"]: r
        for r in parquet_footer_audit(spark, files).collect()
    }
    facts, dims = rows["facts"], rows["dims"]
    # 250 rows at row_group_size=100 -> groups of 100/100/50
    assert facts["n_row_groups"] == 3
    assert facts["n_rows"] == 250
    assert (facts["min_rg_rows"], facts["max_rg_rows"]) == (50, 100)
    assert facts["n_chunks"] == 6  # 2 leaf columns x 3 groups
    # stats written for both columns -> full zone-map coverage
    assert facts["n_chunks_with_minmax"] == 6
    # dims: stats disabled on column b -> half coverage
    assert dims["n_chunks"] == 2
    assert dims["n_chunks_with_minmax"] == 1
    assert dims["compression_x1000"] >= 1  # exact integer lattice
