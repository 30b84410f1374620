from .readers import read_source_csv, read_source_jsonl, read_tables, TABLE_NAMES
from .sinks import write_errors, write_valid, jdbc_writer_options
from .archive import archive_file
from .introspect import parquet_footer_audit

__all__ = [
    "parquet_footer_audit",
    "read_source_csv",
    "read_source_jsonl",
    "read_tables",
    "TABLE_NAMES",
    "write_errors",
    "write_valid",
    "jdbc_writer_options",
    "archive_file",
]
