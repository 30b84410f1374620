"""Deterministic synthetic-corpus source via Spark 4's Python DataSource API.

Greenfield scale tooling (no reference counterpart): load-testing a 100 TB
pipeline needs a corpus you can conjure at any size WITHOUT first writing
100 TB to disk. This registers a `synthetic_docs` format whose reader
emits documents straight from per-partition generators — each partition is
an independent, seeded stream, so the same (n_rows, n_partitions, seed)
produce byte-identical data on any cluster layout, and generation scales
linearly with executors (no driver materialization, no shuffle).

The row shape mirrors the driver's ``documents`` table (doc_id, text,
lang, source, n_chars) so every text/dedup/sampling operator runs on
synthetic data unchanged.

Usage::

    register_synthetic_docs(spark)
    df = (spark.read.format("synthetic_docs")
          .option("n_rows", 1_000_000).option("n_partitions", 256)
          .option("seed", 42).load())

Determinism: the text is driven by ``hashlib.md5`` counters (not
``random``), so rows depend only on (seed, doc_id) — re-running a failed
task regenerates identical rows, which is what makes a generated source
safe under Spark's task-retry model.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_LANGS = ("en", "en", "en", "de", "es", "fr", "zh")
_SOURCES = tuple(f"src{i}" for i in range(20))
_WORDS = (
    "the fast key order sort table scan merge part spark group query row "
    "data slow small filter cache join shuffle stage task block write read "
    "plan cost hash range index batch stream state window split"
).split()


class _DocsPartition(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class _DocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.seed = int(options.get("seed", 42))

    def partitions(self) -> Sequence[InputPartition]:
        per = -(-self.n_rows // self.n_partitions)  # ceil
        return [
            _DocsPartition(i * per, min((i + 1) * per, self.n_rows), self.seed)
            for i in range(self.n_partitions)
            if i * per < self.n_rows
        ]

    def read(self, partition: _DocsPartition) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            h = hashlib.md5(f"{partition.seed}:{doc_id}".encode()).digest()
            n_words = 8 + h[0] % 120
            words = [
                _WORDS[hashlib.md5(f"{partition.seed}:{doc_id}:{w}".encode()).digest()[0] % len(_WORDS)]
                for w in range(n_words)
            ]
            text = " ".join(words)
            yield (
                doc_id,
                text,
                _LANGS[h[1] % len(_LANGS)],
                _SOURCES[h[2] % len(_SOURCES)],
                len(text),
            )


class SyntheticDocsSource(DataSource):
    """``spark.read.format("synthetic_docs")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"

    def reader(self, schema) -> DataSourceReader:
        return _DocsReader(self.options)


def register_synthetic_docs(spark) -> None:
    """Register the format on this session (idempotent)."""
    spark.dataSource.register(SyntheticDocsSource)
