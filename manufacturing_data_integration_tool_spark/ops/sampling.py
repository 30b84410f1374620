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

from typing import Mapping, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from ._materialize import checkpoint_round

__all__ = [
    "neyman_allocation",
    "hash_fraction_threshold",
    "hash_sample",
    "stratified_sample",
    "train_holdout_split",
    "cap_per_group",
    "priority_sample",
    "two_phase_running_sum",
    "kfold_assign",
    "two_phase_ntile",
    "budget_fill",
    "pack_sequences",
    "temperature_mix",
    "dsir_admission",
    "weighted_percentile",
    "negative_samples",
    "weighted_sample_ares",
    "zorder_blocks",
    "ipf_raking",
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


def _u52(key: Column | str, salt: str) -> Column:
    """Uniform 52-bit integer from the portable md5 bucket.

    ``conv(hex, 16, 10)`` is the Spark rendering; the oracle twin is
    ``CAST('0x' || substr(md5(..)) AS BIGINT)`` (see ``u52_sql``). 52 bits
    fit a double exactly, so downstream float math is engine-identical.
    """
    return F.conv(_bucket(key, salt), 16, 10).cast("bigint")


def u52_sql(key_sql: str, salt: str) -> str:
    """ANSI-ish SQL twin of ``_u52`` (DuckDB-compatible hex cast)."""
    return f"CAST('0x' || {bucket_sql(key_sql, salt)} AS BIGINT)"


def kfold_assign(
    df: DataFrame,
    key_col: str,
    k: int = 5,
    *,
    salt: str = "fold",
    fold_col: str = "fold",
) -> DataFrame:
    """Reproducible k-fold cross-validation assignment: fold =
    ``u52(key, salt) mod k``. Same contract as
    :func:`train_holdout_split` — membership depends only on
    (key, salt), so appends/re-runs can never move a key across folds,
    and every row of a key lands in the same fold (group-k-fold when
    keyed on the leakage unit, e.g. the near-dup cluster id from
    q193's pipeline). Zero shuffle: one narrow projection.

    The mod-k draw is uniform to within 1 part in 2^52/k — negligible
    fold-size skew for any practical k.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    return df.withColumn(
        fold_col, F.pmod(_u52(key_col, salt), F.lit(k)).cast("bigint")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str | Sequence[str],
    key_col: str,
    cap: int,
    *,
    salt: str = "cap",
) -> DataFrame:
    """Deterministic per-group quota — at most ``cap`` rows per group.

    The web-corpus "max N documents per domain/source" primitive: rows
    within a group are ranked by their content-hash bucket (a reproducible
    shuffle of the group), and rank > cap is dropped. Same survivors on any
    cluster layout or engine.

    100 TB posture: ONE hash shuffle on the group key + a bounded per-group
    window — no global sort. Groups larger than executor memory are fine
    (window spills); a pathological mega-group is exactly the case the cap
    exists to neuter, and rank <= cap lets the window stop early under
    AQE's skew splitting.
    """
    groups = [group_col] if isinstance(group_col, str) else list(group_col)
    w = Window.partitionBy(*groups).orderBy(_bucket(key_col, salt), F.col(key_col))
    return (
        df.withColumn("__cap_rk", F.row_number().over(w))
        .filter(F.col("__cap_rk") <= F.lit(int(cap)))
        .drop("__cap_rk")
    )


def priority_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str | Column,
    k: int,
    *,
    strata_col: Optional[str] = None,
    salt: str = "prio",
) -> DataFrame:
    """Weighted sample WITHOUT replacement: top-``k`` rows by priority
    ``w / u`` (priority sampling, Duffield-Lund-Thorup JACM'07) — rows with
    larger weight are proportionally more likely to survive, deterministically.

    ``u = (h + 0.5) / 2^52`` with ``h`` the portable 52-bit md5 bucket of
    ``key_col`` — exact in a double, so ``w / u`` is ONE correctly-rounded
    IEEE division and the ranking is bit-identical across Spark and any
    SQL engine with md5 (the oracle requirement). No ``ln``/``pow`` — libm
    ulp drift can't flip a rank.

    With ``strata_col``, k rows per stratum (per-language / per-source
    quotas weighted by quality score). 100 TB posture: one shuffle on the
    stratum key (or a single-partition top-k for the global case — prefer
    strata at scale); rank <= k is a bounded window, never a global sort
    of the corpus.
    """
    w_col = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = (_u52(key_col, salt).cast("double") + F.lit(0.5)) / F.lit(float(1 << 52))
    prio = w_col.cast("double") / u
    parts = [strata_col] if strata_col else []
    win = Window.partitionBy(*parts).orderBy(F.desc_nulls_last(prio), F.col(key_col))
    return (
        df.withColumn("__prio_rk", F.row_number().over(win))
        .filter(F.col("__prio_rk") <= F.lit(int(k)))
        .drop("__prio_rk")
    )


def two_phase_running_sum(
    df: DataFrame,
    strata_cols: Sequence[str],
    order_cols: Sequence[Column],
    size: Column,
    sub_bucket: Column,
    *,
    out_col: str = "__running",
) -> DataFrame:
    """Per-stratum cumulative sum WITHOUT a one-task-per-stratum window.

    A naive ``Window.partitionBy(stratum)`` running sum streams the whole
    hottest stratum (tens of TB of ``en`` at 100 TB corpus scale) through
    a single task — a hard scale-killer. This computes the SAME cumulative
    total in two phases, provided ``sub_bucket`` is monotone non-decreasing
    along the ``order_cols`` ordering (e.g. a prefix of the string ordering
    key, or ``id div N`` for an integer ordering key) — the per-stratum
    order is then exactly the concatenation of per-sub-bucket orders:

    1. Aggregate per-(stratum, sub-bucket) size subtotals — a tiny,
       map-side-combined table (|strata| x |sub-buckets| rows).
    2. Window the tiny table into per-sub-bucket starting offsets and
       broadcast it back onto the rows.
    3. Run the running sum per (stratum, sub-bucket); add the offset.
       ``offset + running-within-bucket`` equals the global per-stratum
       running total byte-for-byte, so a plain single-window ORACLE SQL
       stays valid.

    Cost: one extra tiny aggregate + broadcast; the wide window now
    partitions on (stratum, sub-bucket), so the widest task handles
    ~1/|sub-buckets| of the hottest stratum. Returns ``df`` plus
    ``out_col`` (bigint cumulative total including the current row).
    """
    d = df.withColumn("__tprs_sub", sub_bucket)
    subs = d.groupBy(*strata_cols, "__tprs_sub").agg(
        F.sum(size.cast("bigint")).alias("__subtotal")
    )
    off_w = (
        Window.partitionBy(*strata_cols)
        .orderBy(F.asc_nulls_first("__tprs_sub"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = subs.withColumn(
        "__offset", F.coalesce(F.sum("__subtotal").over(off_w), F.lit(0))
    ).select(
        *[F.col(c).alias(f"__o_{c}") for c in strata_cols],
        F.col("__tprs_sub").alias("__o_sub"),
        "__offset",
    )
    cond = F.col("__tprs_sub").eqNullSafe(F.col("__o_sub"))
    for c in strata_cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"__o_{c}"))
    w = (
        Window.partitionBy(*strata_cols, "__tprs_sub")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = (F.sum(size.cast("bigint")).over(w) + F.col("__offset")).alias(out_col)
    drop = ["__tprs_sub", "__o_sub", "__offset"] + [f"__o_{c}" for c in strata_cols]
    return (
        d.join(F.broadcast(offsets), cond)
        .withColumn(out_col, running)
        .drop(*drop)
    )


def two_phase_ntile(
    df: DataFrame,
    n_tiles: int,
    order_cols: Sequence[Column],
    sub_bucket: Column,
    *,
    rank_col: str = "__rank",
    out_col: str = "tile",
) -> DataFrame:
    """Exact global ``NTILE(n)`` WITHOUT a single-task global sort.

    ``NTILE() OVER (ORDER BY ...)`` with no PARTITION BY drags the entire
    table through ONE window task — the equi-depth-histogram /
    decile-bucketing shape that silently serializes at scale. Same cure as
    :func:`two_phase_running_sum`: a global rank is just a running COUNT,
    so with a ``sub_bucket`` monotone non-decreasing along ``order_cols``
    (value-range prefix of the leading order key), per-bucket row counts
    broadcast back as rank offsets and the wide window partitions on the
    sub-bucket.

    The tile is then pure integer math replicating SQL NTILE semantics
    exactly (first ``N mod n`` tiles get ``ceil(N/n)`` rows): with
    ``q = N div n``, ``r = N mod n``,

        tile(rank) = (rank-1) div (q+1) + 1              if rank <= r*(q+1)
                     r + (rank - r*(q+1) - 1) div q + 1  otherwise

    so a plain ``NTILE(n) OVER (ORDER BY ...)`` oracle stays valid —
    PROVIDED ``order_cols`` is a total order (break ties down to a unique
    key), else both engines' outputs are ambiguous.

    Returns ``df`` plus ``rank_col`` (1-based global rank, bigint) and
    ``out_col`` (1..n_tiles, bigint). Cost: one tiny per-bucket count
    aggregate + two 1-row/broadcast joins; the widest window task holds one
    sub-bucket, not the table.
    """
    if n_tiles < 1:
        raise ValueError(f"n_tiles must be >= 1, got {n_tiles}")
    ranked = two_phase_running_sum(
        df, [], order_cols, F.lit(1), sub_bucket, out_col=rank_col
    )
    tot = df.agg(F.count(F.lit(1)).cast("bigint").alias("__n_total"))
    # all-integer math (bigint `div`/`%`), no float path anywhere
    q_ = F.expr(f"__n_total div {int(n_tiles)}")
    r_ = F.col("__n_total") % F.lit(int(n_tiles)).cast("bigint")
    rank = F.col(rank_col)
    head = r_ * (q_ + 1)
    tile = F.when(
        rank <= head, F.expr(f"({rank_col} - 1) div (__n_total div {int(n_tiles)} + 1) + 1")
    ).otherwise(
        r_
        + F.expr(
            f"({rank_col} - (__n_total % {int(n_tiles)}) * (__n_total div {int(n_tiles)} + 1) - 1)"
            f" div (__n_total div {int(n_tiles)})"
        )
        + 1
    )
    return (
        ranked.join(F.broadcast(tot))
        .withColumn(out_col, tile.cast("bigint"))
        .drop("__n_total")
    )


def budget_fill(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    size_col: str,
    budget: int,
    *,
    salt: str = "fill",
    bucket_chars: int = 2,
) -> DataFrame:
    """Fill a per-stratum size budget (e.g. N tokens per language) in a
    deterministic pseudo-random order: rows are ranked by their md5 bucket
    within the stratum and admitted while the running size total stays
    within ``budget`` (inclusive).

    The 'give me 1B tokens per language, sampled fairly, reproducibly'
    primitive. Admission depends only on (key, salt, sizes), so re-runs
    and engine swaps admit identical rows.

    100 TB posture: the running sum goes through
    :func:`two_phase_running_sum`, sub-bucketed on the first
    ``bucket_chars`` hex chars of the md5 ordering bucket (16^bucket_chars
    sub-buckets per stratum — prefix of the ordering key, so trivially
    monotone). No single task ever streams a whole stratum; admissions are
    byte-identical to the naive single-window form, so the plain
    running-sum oracle SQL stays valid. Plan pinned by
    ``tests/test_plan_quality.py``.
    """
    bkt = _bucket(key_col, salt)
    d = df.withColumn("__bkt", bkt)
    r = two_phase_running_sum(
        d,
        [strata_col],
        [F.col("__bkt"), F.col(key_col)],
        F.col(size_col),
        F.substring(F.col("__bkt"), 1, int(bucket_chars)),
        out_col="__running",
    )
    return (
        r.filter(F.col("__running") <= F.lit(int(budget)))
        .drop("__bkt", "__running")
    )


def temperature_mix(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    *,
    alpha: float = 0.5,
    target_rows: int,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-based mixture re-weighting (multilingual-LM alpha
    sampling): target share of stratum s is n_s^alpha / sum(n^alpha) —
    alpha < 1 up-weights low-resource strata — and each stratum is then
    hash-sampled at min(1, target_rows * share / n_s).

    Unlike ``stratified_sample`` the per-stratum fractions are COMPUTED
    (one tiny counts aggregate broadcast back, not literals), so the keep
    test is the integer form ``u52 < round(frac, 9) * 2^52``: the md5
    uniform is exact in a double and the rounding step absorbs cross-
    engine libm ulp drift in ``pow``. One counts pass + one scan: the
    counts side is |strata| rows, always broadcast.
    """
    n_col = F.count(F.lit(1)).cast("double")
    counts = df.groupBy(strata_col).agg(n_col.alias("__n"))
    w = F.pow(F.col("__n"), F.lit(float(alpha)))
    shares = counts.withColumn("__w", w).withColumn(
        "__share", F.col("__w") / F.sum("__w").over(Window.partitionBy())
    )
    frac = F.round(
        F.least(F.lit(1.0), F.lit(float(target_rows)) * F.col("__share") / F.col("__n")),
        9,
    )
    limits = shares.select(F.col(strata_col).alias("__stratum"), frac.alias("__frac"))
    keep = _u52(key_col, salt).cast("double") < F.col("__frac") * F.lit(float(1 << 52))
    # null-safe join: a NULL stratum is a real group in the counts table,
    # and an inner equi-join would silently drop every NULL-stratum row.
    return (
        df.join(
            F.broadcast(limits),
            F.col(strata_col).eqNullSafe(F.col("__stratum")),
        )
        .filter(keep)
        .drop("__frac", "__stratum")
    )


def pack_sequences(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    size_col: str,
    seq_len: int,
    *,
    salt: str = "pack",
    bucket_chars: int = 2,
) -> DataFrame:
    """Greedy sequential packing of documents into fixed-size training
    sequences: per stratum, documents are laid out in the deterministic
    md5 order and the token stream is cut every ``seq_len`` tokens; each
    document is labeled with the sequence it STARTS in (``seq_id``) and
    its token offset within that sequence (``seq_offset``).

    This is the 'build 4k-token training sequences out of the corpus'
    primitive. Assigning the whole doc to its start bin keeps the op a
    pure projection over the running sum — the boundary-splitting variant
    (real pipelines chop the crossing document) is a downstream explode of
    the same two columns, not a different shuffle shape.

    Reproducible on any cluster layout (order is content-hashed, ties
    broken on the key) and skew-safe: the running sum is the TWO-PHASE
    form — the wide window partitions on (stratum, md5-prefix sub-bucket),
    so no task streams a whole stratum (same guarantee as
    :func:`budget_fill`, pinned by the q148 plan test).
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    bkt = _bucket(key_col, salt)
    d = df.withColumn("__bkt", bkt)
    r = two_phase_running_sum(
        d,
        [strata_col],
        [F.col("__bkt"), F.col(key_col)],
        F.col(size_col),
        F.substring(F.col("__bkt"), 1, int(bucket_chars)),
        out_col="__running",
    )
    start = F.col("__running") - F.col(size_col)
    return (
        r.withColumn("seq_id", F.expr(f"(__running - {size_col}) div {int(seq_len)}"))
        .withColumn("seq_offset", start % F.lit(int(seq_len)).cast("bigint"))
        .drop("__bkt", "__running")
    )


def dsir_admission(
    df: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    salt: str = "dsir",
    round_to: int = 6,
) -> DataFrame:
    """Importance-resampled admission toward a target domain — the DSIR
    recipe (Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling"): score every document by how much more likely
    its tokens are under the target-domain unigram LM than under the
    background (whole-corpus) LM, then admit with probability
    ``min(1, exp(score))`` using the portable md5 u52 coin.

    ``is_target`` is any boolean Column marking the in-domain subset (a
    source label, a hand-curated seed set, ...). Both LMs use add-one
    smoothing over the background vocabulary, per-term log-ratios round to
    9 decimals and accumulate as exact decimals (summation-order-free, the
    ``unigram_logprob`` discipline), and the admission threshold is an
    integer u52 comparison — reproducible on any engine with md5.

    100 TB posture: ONE pass over the token stream computes both LMs
    (background count + conditional target count in the same groupBy,
    map-side combined); the vocabulary-sized log-ratio table joins back
    onto tokens (broadcast while it fits, plain equi-join on the term
    otherwise); the per-doc reduce is one more map-side-combinable
    groupBy. No driver-side state, no Python in the hot path.

    Output: ``(id_col, n_tokens, score, weight, admitted)``.
    """
    toks = df.select(
        F.col(id_col),
        is_target.alias("__t"),
        F.explode(F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit(""))).alias(
            "term"
        ),
    )
    counts = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("cb"),
        F.sum(F.col("__t").cast("long")).alias("ct"),
    )
    totals = counts.agg(
        F.sum("cb").alias("tb"),
        F.sum("ct").alias("tt"),
        F.count(F.lit(1)).alias("v"),
    )
    logr = counts.crossJoin(F.broadcast(totals)).select(
        "term",
        F.round(
            F.log(
                (F.col("ct") + F.lit(1)).cast("double")
                / (F.col("tt") + F.col("v")).cast("double")
            )
            - F.log(
                (F.col("cb") + F.lit(1)).cast("double")
                / (F.col("tb") + F.col("v")).cast("double")
            ),
            9,
        )
        .cast("decimal(24,12)")
        .alias("__logr"),
    )
    scored = (
        toks.join(F.broadcast(logr), "term")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum("__logr").cast("double") / F.count(F.lit(1)), round_to
            ).alias("score"),
        )
    )
    weight = F.round(F.least(F.lit(1.0), F.exp(F.col("score"))), 9)
    thresh = F.round(weight * F.lit(4503599627370496.0)).cast("long")  # 2^52
    return scored.select(
        F.col(id_col),
        "n_tokens",
        "score",
        weight.alias("weight"),
        (_u52(id_col, salt) < thresh).alias("admitted"),
    )


def weighted_percentile(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    weight_col: str,
    *,
    fraction: float = 0.5,
    out_col: str = "wpct",
) -> DataFrame:
    """Exact WEIGHTED percentile per group (lower weighted-quantile rule):
    the smallest value whose cumulative weight reaches ``fraction`` of the
    group's total — e.g. the quantity-weighted median price, where a line
    selling 50 units counts 50x a line selling one.

    Two-phase for scale: weights are first COLLAPSED per (group, value) —
    a map-side-combined aggregate, so the subsequent cumulative-weight
    window runs over *distinct values per group* (bounded by the value
    domain), not over the raw rows. The threshold test uses integer cross
    multiplication on exact decimal weights — no float boundary: a value
    qualifies when ``q * cum_w >= p * total_w`` (fraction = p/q).

    The remaining per-group window is ordered by value over that
    collapsed table; for the common "few groups × bounded value domain"
    shape its widest task holds one group's distinct values. Groups whose
    distinct-value count itself scales with the data need the
    ``two_phase_running_sum`` sub-bucket treatment instead.

    Output: one row per group — (*group_cols, total_w, {out_col}).
    """
    from fractions import Fraction

    frac = Fraction(fraction).limit_denominator(10_000)
    p, q = frac.numerator, frac.denominator
    gcols = [F.col(c) for c in group_cols]
    collapsed = (
        df.groupBy(*gcols, F.col(value_col).alias("__v"))
        .agg(F.sum(F.col(weight_col).cast("decimal(28,4)")).alias("__w"))
    )
    w = Window.partitionBy(*gcols).orderBy(F.asc("__v"))
    cum = collapsed.withColumn(
        "__cw", F.sum("__w").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    totals = collapsed.groupBy(*gcols).agg(F.sum("__w").alias("__tw"))
    hit = (
        cum.join(totals, list(group_cols))
        .filter(F.lit(q) * F.col("__cw") >= F.lit(p) * F.col("__tw"))
        .groupBy(*gcols)
        .agg(F.min("__v").alias(out_col), F.max("__tw").alias("__tw2"))
    )
    return hit.select(
        *group_cols, F.col("__tw2").cast("double").alias("total_w"), out_col
    )


def negative_samples(
    df: DataFrame,
    id_col: str,
    *,
    k: int = 4,
    salt: str = "neg",
) -> DataFrame:
    """Deterministic contrastive NEGATIVE sampling: for every anchor row,
    ``k`` pseudo-random partner rows drawn corpus-wide — the negatives
    feeding a contrastive/embedding training batch builder.

    Mechanism (shuffled round-robin pairing): rows are ranked in the
    pseudo-random total order ``md5(id || ':' || salt)`` (engine-portable
    like every sampler here), and anchor at rank r takes partners at
    ranks ``(r - 1 + j·s) mod N + 1`` for ``j = 1..k`` with stride
    ``s = max(1, N div (k+1))``. Each offset is a rotation of a random
    permutation, so negatives are uniform-ish, content-independent, and
    REPRODUCIBLE on any engine/cluster layout — and every row serves as
    anchor exactly once and as negative at most k+? times (a rotation is
    a bijection: exactly once per offset).

    100 TB posture: the global rank rides :func:`two_phase_running_sum`
    (md5-prefix sub-buckets, no single-task sort); pairing is ONE
    equi-join on the unique rank key after a k-way offset explode —
    fanout exactly k, no skew (ranks are unique), no shuffle wider than
    the pairing join. Self-pairs (possible when N <= k·s wraps) are
    filtered; N=1 yields zero rows.

    Output: ``(anchor_id, neg_idx 1..k, negative_id)``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    base = df.select(F.col(id_col), h.alias("__h"))
    ranked = two_phase_running_sum(
        base,
        [],
        [F.asc("__h"), F.asc(id_col)],
        F.lit(1),
        F.substring("__h", 1, 2),
        out_col="__r",
    ).select(id_col, "__r")
    n = base.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    stride = F.greatest(F.lit(1).cast("bigint"), F.expr(f"__n div {int(k) + 1}"))
    anchors = (
        ranked.crossJoin(F.broadcast(n))
        .select(
            F.col(id_col).alias("anchor_id"),
            "__r",
            "__n",
            F.explode(F.sequence(F.lit(1), F.lit(int(k)))).alias("neg_idx"),
        )
        .select(
            "anchor_id",
            F.col("neg_idx").cast("long").alias("neg_idx"),
            ((F.col("__r") - 1 + F.col("neg_idx") * stride) % F.col("__n") + 1).alias(
                "__pr"
            ),
        )
    )
    partners = ranked.select(F.col(id_col).alias("negative_id"), F.col("__r").alias("__pr"))
    return (
        anchors.join(partners, "__pr")
        .filter(F.col("negative_id") != F.col("anchor_id"))
        .select("anchor_id", "neg_idx", "negative_id")
    )


def weighted_sample_ares(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    *,
    salt: str = "wres",
    ln_round: int = 9,
    key_out: str = "ares_key",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement via
    Efraimidis-Spirakis A-Res (IPL 2006): each row draws u ~ U(0,1) and
    the k largest u^(1/w) win — one pass, fully distributed, and
    probability-correct for any positive integer weights. This is the
    standard way to draw a quality- or size-weighted corpus subset
    without a sequential reservoir.

    Implemented in log space (maximizing ln(u)/w is maximizing u^(1/w))
    with the repo's portable randomness: u = (md5-lane u52 + 0.5) / 2^52
    — exact integers into one IEEE division — and ln(u) rounded to
    ``ln_round`` decimals (q86 pattern) before the division by the
    BIGINT weight, so the selection ORDER is the same double sequence on
    any engine; ties broken by ``key_col`` for a total order. Rows with
    weight <= 0 are excluded (zero-weight rows have zero inclusion
    probability by definition).

    Scale posture: the top-k is ``orderBy().limit(k)`` —
    TakeOrderedAndProject, per-partition top-k + driver merge of k-row
    heaps; no global sort, no shuffle of the corpus.

    Output: ``key_col, weight_col, key_out`` (the selection key,
    floor-published x1e9 as BIGINT) — the k winners.
    """
    u = (
        _u52(F.col(key_col), salt).cast("double") + F.lit(0.5)
    ) / F.lit(float(1 << 52))
    key = F.round(F.log(u), ln_round) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col) > 0)
        .select(key_col, weight_col, key.alias("__k"))
        .orderBy(F.desc("__k"), F.asc(key_col))
        .limit(k)
        .select(
            key_col,
            weight_col,
            F.floor(F.col("__k") * F.lit(1e9) + F.lit(0.5))
            .cast("bigint")
            .alias(key_out),
        )
    )


def zorder_interleave_sql(
    xb: str, yb: str, bits: int, *, int_div: str = "div"
) -> str:
    """SQL expression interleaving the low ``bits`` bits of ``xb``
    (even positions) and ``yb`` (odd positions) into a Morton/Z value.

    Pure BIGINT arithmetic — ``(v div 2^i) % 2`` bit probes and
    power-of-two multipliers. ONE generator for both engines (only the
    integer-division token differs), so the Spark expression and the
    DuckDB oracle can never drift: ``int_div='div'`` for Spark,
    :func:`zorder_interleave_duckdb` passes ``'//'``."""
    return " + ".join(
        f"(({xb} {int_div} {1 << i}) % 2) * {1 << (2 * i)}"
        f" + (({yb} {int_div} {1 << i}) % 2) * {1 << (2 * i + 1)}"
        for i in range(bits)
    )


def zorder_interleave_duckdb(xb: str, yb: str, bits: int) -> str:
    """DuckDB spelling of :func:`zorder_interleave_sql` (same generator)."""
    return zorder_interleave_sql(xb, yb, bits, int_div="//")


def zorder_blocks(
    df: DataFrame,
    x_col: Column | str,
    y_col: Column | str,
    *,
    bits: int = 6,
    block_cells: int = 16,
) -> DataFrame:
    """Z-order (Morton-curve) data-layout audit: range-bucketize two
    integer dimensions into a ``2^bits x 2^bits`` grid, interleave the
    bucket bits into a Morton key, and report each ``block_cells``-cell
    run of the curve with its bounding box — the min/max file statistics
    a writer clustering on this key would publish for data skipping.

    This is the layout step behind Delta/Iceberg ``ZORDER BY``: rows
    sorted by the Morton key land in files whose per-file (x, y) ranges
    are small SQUARES instead of full-width stripes, so a predicate on
    EITHER dimension prunes ~sqrt(files) instead of none. The z-key
    assignment here is what you'd feed ``repartitionByRange`` before the
    write at 100 TB; the block aggregate is the audit that the resulting
    bounding boxes are tight (``bbox_cells`` near ``block_cells``, not
    near the full grid).

    Everything is exact BIGINT arithmetic: bucket =
    ``((v - vmin) * 2^bits) div (vmax - vmin + 1)`` (in [0, 2^bits) by
    construction), Morton key = sum of ``(bucket div 2^i) % 2`` bit
    probes — no floats anywhere, so any SQL engine reproduces the keys
    bit-for-bit.

    Scale posture: one 1-row min/max aggregate broadcast back over the
    scan, then a single map-side-combinable groupBy on ``z_block``
    (at most ``4^bits / block_cells`` groups). No window, no sort.

    Output: ``z_block, n_rows, x_lo, x_hi, y_lo, y_hi, bbox_cells``.
    """
    if bits < 1 or bits > 15:
        raise ValueError("bits must be in [1, 15]")
    if block_cells < 1:
        raise ValueError("block_cells must be >= 1")
    side = 1 << bits
    x = (F.col(x_col) if isinstance(x_col, str) else x_col).cast("bigint")
    y = (F.col(y_col) if isinstance(y_col, str) else y_col).cast("bigint")
    base = df.select(x.alias("__x"), y.alias("__y"))
    mm = base.agg(
        F.min("__x").alias("__xmin"),
        F.max("__x").alias("__xmax"),
        F.min("__y").alias("__ymin"),
        F.max("__y").alias("__ymax"),
    )
    b = base.crossJoin(F.broadcast(mm)).select(
        F.expr(f"((__x - __xmin) * {side}) div (__xmax - __xmin + 1)")
        .cast("bigint")
        .alias("__xb"),
        F.expr(f"((__y - __ymin) * {side}) div (__ymax - __ymin + 1)")
        .cast("bigint")
        .alias("__yb"),
    )
    z = b.select(
        "__xb",
        "__yb",
        F.expr(zorder_interleave_sql("__xb", "__yb", bits))
        .cast("bigint")
        .alias("__z"),
    )
    return (
        z.groupBy(F.expr(f"__z div {block_cells}").cast("bigint").alias("z_block"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("__xb").alias("x_lo"),
            F.max("__xb").alias("x_hi"),
            F.min("__yb").alias("y_lo"),
            F.max("__yb").alias("y_hi"),
        )
        .select(
            "z_block",
            "n_rows",
            "x_lo",
            "x_hi",
            "y_lo",
            "y_hi",
            (
                (F.col("x_hi") - F.col("x_lo") + 1)
                * (F.col("y_hi") - F.col("y_lo") + 1)
            )
            .cast("bigint")
            .alias("bbox_cells"),
        )
    )


def ipf_raking(
    df: DataFrame,
    row_col: str,
    col_col: str,
    *,
    iterations: int = 4,
    grid: int = 10**9,
) -> DataFrame:
    """Iterative proportional fitting / raking (Deming & Stephan, Ann.
    Math. Stat. 1940) of per-cell weights so the WEIGHTED corpus matches
    UNIFORM target marginals on both axes — the 2-D generalization of
    q62/q147's single-axis training-mix rebalancing: reweight documents
    so every language gets an equal share AND every source gets an equal
    share simultaneously (one axis alone distorts the other; raking
    alternates row and column scalings until both hold).

    Determinism contract: weights live on an integer ``1/grid`` lattice
    (start = ``grid`` == weight 1.0); each half-iteration's scale factor
    application is the exact integer division
    ``w' = (w * N * grid) div (k_axis * axis_sum)`` with ``axis_sum`` the
    current weighted axis total in decimal(38,0) — both engines truncate
    identically, so the full 2*iterations-step trajectory is
    reproducible bit-for-bit and the oracle simply unrolls the same
    chain as chained CTEs (the q283 fixed-iteration pattern).

    Scale posture: the corpus collapses to the bounded ``|rows| x |cols|``
    cell table FIRST (one map-side groupBy — the only pass over data);
    every iteration then works on the tiny cell table with broadcast
    1-row/axis aggregates. ``iterations`` is an analysis constant;
    raking on a 100-cell grid is ~converged at 4.

    Output: one row per observed cell —
    ``(row_col, col_col, n, weight_x1e9)``.
    """
    r, c = F.col(row_col), F.col(col_col)
    base = df.filter(r.isNotNull() & c.isNotNull()).select(
        r.alias("__r"), c.alias("__c")
    )
    dec = "decimal(38,0)"
    cells = base.groupBy("__r", "__c").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n")
    )
    tot = cells.agg(
        F.sum("__n").cast(dec).alias("__nt"),
        F.countDistinct("__r").cast(dec).alias("__kr"),
        F.countDistinct("__c").cast(dec).alias("__kc"),
    )
    cur = cells.crossJoin(F.broadcast(tot)).withColumn(
        "__w", F.lit(grid).cast(dec)
    )
    for _ in range(iterations):
        rs = cur.groupBy("__r").agg(
            F.sum(F.col("__n").cast(dec) * F.col("__w")).cast(dec).alias("__rs")
        )
        cur = cur.join(F.broadcast(rs), "__r").withColumn(
            "__w",
            F.expr(
                f"CAST(__w * __nt * {grid} AS DECIMAL(38,0))"
                " div CAST(__kr * __rs AS DECIMAL(38,0))"
            ),
        ).drop("__rs")
        cs = cur.groupBy("__c").agg(
            F.sum(F.col("__n").cast(dec) * F.col("__w")).cast(dec).alias("__cs")
        )
        cur = cur.join(F.broadcast(cs), "__c").withColumn(
            "__w",
            F.expr(
                f"CAST(__w * __nt * {grid} AS DECIMAL(38,0))"
                " div CAST(__kc * __cs AS DECIMAL(38,0))"
            ),
        ).drop("__cs")
        # cur is referenced twice per half-step (axis aggregate + join
        # back), so the lazy plan quadruples per iteration — checkpoint
        # the tiny cell table each round (the pagerank/HITS rule) to keep
        # analysis linear in `iterations`.
        cur = cur.transform(checkpoint_round)
    return cur.select(
        F.col("__r").alias(row_col),
        F.col("__c").alias(col_col),
        F.col("__n").alias("n"),
        F.col("__w").cast("bigint").alias("weight_x1e9"),
    )


def neyman_allocation(
    df: DataFrame,
    strata_cols: Sequence[str],
    value_col: Column | str,
    *,
    budget: int = 10_000,
    std_scale: int = 1_000,
) -> DataFrame:
    """Neyman optimal stratified-sample allocation (Neyman, JRSS 1934):
    split a sampling ``budget`` across strata proportionally to
    ``N_h * S_h`` — variance-optimal for estimating the population mean,
    the design step that should precede q57's proportional stratified
    draw whenever strata have very different spreads (a uniform-rate
    sample wastes budget on low-variance strata).

    Exactness: for a full-population stratum the weight COLLAPSES —
    ``N_h * S_h = N_h * sqrt(K_h)/N_h = sqrt(K_h)`` with
    ``K_h = n_h*S2_h - S1_h^2`` an exact decimal(38,0) integer — so each
    stratum weight is one IEEE sqrt of an exact integer, quantized to
    the declared 1e-3 lattice (``t_h = floor(sqrt(K_h)*std_scale +
    0.5)``, per-term floors, the q292 pattern), the total is an exact
    integer sum, and the allocation ``n_h = budget * t_h div T`` is an
    exact integer division — floor allocation, so ``sum n_h <= budget``
    (documented; the <= 9-unit remainder is the price of engine-portable
    integer math).

    Scale posture: ONE map-side-combined groupBy to the strata grid,
    then grid-sized arithmetic with a broadcast 1-row total.

    Output: per stratum — ``strata_cols..., n_rows, weight_x1e3,
    alloc_n`` (alloc NULL when every stratum is constant: T = 0).
    """
    v = (F.col(value_col) if isinstance(value_col, str) else value_col).cast(
        "bigint"
    )
    g = list(strata_cols)
    dec = "decimal(38,0)"
    base = df.filter(v.isNotNull()).select(*g, v.alias("__v"))
    pg = base.groupBy(*g).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("__v").cast(dec)).cast(dec).alias("__s1"),
        F.sum(F.col("__v").cast(dec) * F.col("__v")).cast(dec).alias("__s2"),
    )
    k = (
        F.col("n_rows").cast(dec) * F.col("__s2")
        - F.col("__s1") * F.col("__s1")
    ).cast(dec)
    t = F.floor(
        F.sqrt(k.cast("double")) * F.lit(float(std_scale)) + F.lit(0.5)
    ).cast("bigint")
    weighted = pg.select(*g, "n_rows", t.alias("weight_x1e3"))
    tot = weighted.agg(
        F.sum("weight_x1e3").cast("bigint").alias("__t")
    )
    return weighted.crossJoin(F.broadcast(tot)).select(
        *g,
        "n_rows",
        "weight_x1e3",
        F.when(F.col("__t") <= 0, F.lit(None).cast("bigint"))
        .otherwise(
            F.expr(f"CAST({int(budget)} AS BIGINT) * weight_x1e3 div __t")
        )
        .alias("alloc_n"),
    )
