"""Deterministic sampling & split operators for training-data pipelines.

Greenfield LLM-pipeline capability (no reference counterpart; SURVEY.md
§7.0). Training corpora are built by *mixing*: per-language / per-source
rates, reproducible train/holdout splits, fixed-seed downsampling. Spark's
``df.sample`` is seed-dependent on partitioning (non-reproducible across
repartitions) — these operators instead key the decision on a CONTENT hash
of a stable id, so the same row gets the same verdict on any cluster
layout, any engine, any day.

Mechanism: ``md5(key || ':' || salt)`` is uniform on hex strings; keeping
rows whose first 13 hex chars compare ``<`` a precomputed hex threshold
selects an expected ``fraction`` of rows with 52-bit resolution. Pure
string comparison — byte-identical across Spark and any SQL engine with
md5, which is what makes these oracle-able.

Scale notes (100 TB posture): every operator here is a stateless per-row
filter/projection — NO shuffle, NO state, trivially pushed past column
pruning; at 100 TB a stratified sample is exactly one scan.
"""

from __future__ import annotations

from typing import Mapping, Optional

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "hash_fraction_threshold",
    "hash_sample",
    "stratified_sample",
    "train_holdout_split",
]

_HEX_DIGITS = 13  # 13 hex chars = 52 bits: exactly representable in a double


def hash_fraction_threshold(fraction: float) -> str:
    """Hex-string threshold selecting ``fraction`` of uniform md5 prefixes.

    ``fraction >= 1.0`` returns ``"g"``, which compares greater than every
    hex character — an always-keep sentinel ('0'-'9' < 'a'-'f' < 'g' in
    ASCII, and the comparison is decided on the first character).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction >= 1.0:
        return "g"
    return format(int(fraction * (16**_HEX_DIGITS)), "x").zfill(_HEX_DIGITS)


def _bucket(key: Column | str, salt: str) -> Column:
    c = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(F.concat(c.cast("string"), F.lit(":" + salt))), 1, _HEX_DIGITS)


def bucket_sql(key_sql: str, salt: str) -> str:
    """The ANSI-SQL rendering of the same bucket — for oracle parity."""
    return f"substr(md5(CAST({key_sql} AS VARCHAR) || ':{salt}'), 1, {_HEX_DIGITS})"


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    *,
    salt: str = "",
) -> DataFrame:
    """Keep an expected ``fraction`` of rows, keyed on ``key_col``.

    Reproducible: the same (key, salt) is kept or dropped forever,
    independent of partitioning, cluster size, or engine. Different salts
    give independent draws (e.g. re-sampling epochs).
    """
    return df.filter(_bucket(key_col, salt) < F.lit(hash_fraction_threshold(fraction)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    fractions: Mapping[str, float],
    *,
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the 'data mixing' primitive.

    ``fractions`` maps stratum value -> keep rate (e.g. per-language rates
    when balancing a multilingual corpus); strata not listed fall back to
    ``default_fraction`` (0.0 = drop). One scan, one per-row comparison
    against a CASE-selected threshold: no shuffle, no per-stratum pass.
    """
    thr: Column = F.lit(hash_fraction_threshold(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == F.lit(value), F.lit(hash_fraction_threshold(frac))
        ).otherwise(thr)
    return df.filter(_bucket(key_col, salt) < thr)


def train_holdout_split(
    df: DataFrame,
    key_col: str,
    holdout_fraction: float = 0.1,
    *,
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Tag every row 'train' or 'holdout', reproducibly.

    Contamination-safe by construction: membership depends only on
    (key, salt), so re-runs, backfills, and incremental appends can never
    move a document across the split boundary.
    """
    thr = hash_fraction_threshold(holdout_fraction)
    return df.withColumn(
        split_col,
        F.when(_bucket(key_col, salt) < F.lit(thr), F.lit("holdout")).otherwise(
            F.lit("train")
        ),
    )
