"""Two-sample distribution distances (PMF- and ECDF-integral families).

Drift between two data segments is already screened pointwise (KS q231,
CvM q314, AD q315, Kuiper q352) and information-theoretically (JSD q272,
PSI q265).  This module adds the METRIC view — actual distances with
units, the quantities a mix planner thresholds or tracks over time:

- :func:`pmf_distances` — total-variation distance (the largest
  probability mass any event can disagree by; Levin-Peres-Wilmer,
  "Markov Chains and Mixing Times", ch. 4) plus the Bhattacharyya
  coefficient and Hellinger distance (Bhattacharyya, Bull. Calcutta
  Math. Soc. 1943; Hellinger 1909) over the empirical PMFs of a binned
  value column.
- :func:`ecdf_distances_binned` — Wasserstein-1 / earth-mover distance
  (the ``integral |F_a - F_b| dt`` closed form on the line; Vallender,
  Theory Probab. Appl. 1974) and the Cramér/energy distance
  ``D^2 = 2 * integral (F_a - F_b)^2 dt`` (Székely & Rizzo, InterStat
  2004 — the two-sample energy distance collapses to this single
  integral in one dimension) over a BOUNDED integer grid.

Determinism contract (repo-wide discipline): counts collapse to the
pooled distinct-value table map-side; every summand is either an exact
BIGINT/DECIMAL(38,0) integer (TV, W1, energy numerators) or a per-value
integer fixed on a declared lattice BEFORE summation (Bhattacharyya's
``floor(sqrt(ca*cb) * 1e6 + 0.5)`` — sqrt is correctly rounded by
IEEE-754, so the lattice point is identical on both engines and the SUM
is integer; float summation order never enters).  Each published value
is ONE final IEEE tree, floor-published at 1e6.

Scale posture: :func:`pmf_distances` is one groupBy over the value axis
(distinct-value table, never raw rows); :func:`ecdf_distances_binned`
additionally needs the gap to the next grid value, which uses a plain
``lead`` window over the distinct-value table — valid under the module's
BOUNDED-grid contract (callers bin continuous axes first), the same
posture as the tau-b marginal windows (`ranktests._concordance_core`).

Magnitude contract: the energy numerator ``sum X(v)^2 * gap`` with
``X <= n*m`` stays inside DECIMAL(38,0) for pooled N up to ~3e7 at a
50-step grid; the ANSI decimal cast fails loudly beyond, never silently.

Reference parity note: the reference tool (kshres31/
Manufacturing-Data-Integration-Tool, src/data_validator.py) has no
distribution layer; these extend its per-row screens to segment-level
governance, like ops.ranktests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_DEC = "decimal(38,0)"
_BC_GRID = 1_000_000


def pmf_distances(
    df: DataFrame,
    group_col: str,
    label_a: str,
    label_b: str,
    value_col: Column | str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Total-variation distance, Bhattacharyya coefficient, and Hellinger
    distance between the empirical PMFs of ``value_col`` in the two
    groups.

    With per-value counts ``ca, cb`` and totals ``n = sum ca``,
    ``m = sum cb``:

        ``TV  = sum_v |m*ca - n*cb| / (2*n*m)``       (exact numerator)
        ``BC  = [sum_v floor(sqrt(ca*cb)*1e6 + 0.5)] / (1e6 * sqrt(n*m))``
        ``H   = sqrt(max(0, 1 - BC))``

    TV's numerator is an exact DECIMAL(38,0) integer; BC fixes each
    term on the declared 1e6 lattice before the integer sum (sqrt is
    correctly rounded, so both engines land on the same lattice point);
    H clamps at 0 against BC's <=1e-6 upward lattice error.  Each
    published value ONE IEEE tree, floor-published at 1e6.

    Output: one row — ``n_a, n_b, tv_x1e6, bc_x1e6, hellinger_x1e6``
    (NULL when either group is empty).
    """
    g = F.col(group_col)
    v = (
        F.col(value_col) if isinstance(value_col, str) else value_col
    ).cast("bigint")
    base = df.filter(v.isNotNull() & g.isin([label_a, label_b])).select(
        F.when(g == F.lit(label_a), F.lit(0)).otherwise(F.lit(1)).alias("__s"),
        v.alias("__v"),
    )
    vals = base.groupBy("__v").agg(
        F.sum(F.when(F.col("__s") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("__ca"),
        F.sum(F.when(F.col("__s") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("__cb"),
    )
    tot = vals.agg(
        F.sum("__ca").cast("bigint").alias("__n"),
        F.sum("__cb").cast("bigint").alias("__m"),
    )
    full = vals.crossJoin(F.broadcast(tot))
    tv_term = F.abs(
        F.col("__m").cast(_DEC) * F.col("__ca")
        - F.col("__n").cast(_DEC) * F.col("__cb")
    ).cast(_DEC)
    bc_term = F.floor(
        F.sqrt((F.col("__ca").cast(_DEC) * F.col("__cb")).cast("double"))
        * F.lit(float(_BC_GRID))
        + F.lit(0.5)
    ).cast(_DEC)
    agg = full.agg(
        F.max("__n").alias("n_a"),
        F.max("__m").alias("n_b"),
        F.coalesce(F.sum(tv_term), F.lit(0).cast(_DEC)).alias("__tv"),
        F.coalesce(F.sum(bc_term), F.lit(0).cast(_DEC)).alias("__bc"),
    )
    n = F.col("n_a").cast("double")
    m = F.col("n_b").cast("double")
    tv = F.col("__tv").cast("double") / (F.lit(2.0) * n * m)
    bc = F.col("__bc").cast("double") / (
        F.lit(float(_BC_GRID)) * F.sqrt(n * m)
    )
    hel = F.sqrt(F.greatest(F.lit(1.0) - bc, F.lit(0.0)))
    bad = (
        F.col("n_a").isNull()
        | F.col("n_b").isNull()
        | (F.col("n_a") < 1)
        | (F.col("n_b") < 1)
    )
    pub = lambda c: F.floor(c * F.lit(float(scale)) + F.lit(0.5)).cast(  # noqa: E731
        "bigint"
    )
    return agg.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.when(bad, F.lit(None).cast("bigint"))
        .otherwise(pub(tv))
        .alias("tv_x1e6"),
        F.when(bad, F.lit(None).cast("bigint"))
        .otherwise(pub(bc))
        .alias("bc_x1e6"),
        F.when(bad, F.lit(None).cast("bigint"))
        .otherwise(pub(hel))
        .alias("hellinger_x1e6"),
    )


def ecdf_distances_binned(
    df: DataFrame,
    group_col: str,
    label_a: str,
    label_b: str,
    value_col: Column | str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Wasserstein-1 (earth-mover) and Cramér/energy distance between
    the two groups' value distributions over a BOUNDED integer grid.

    On the line both are single ECDF integrals (Vallender 1974; Székely
    & Rizzo 2004): with the exact integer ``X(v) = m*cum_a - n*cum_b``
    (inclusive cumulatives) and ``gap(v) = next_value - v``,

        ``W1  = [sum_v |X(v)| * gap(v)] / (n*m)``
        ``D^2 = 2 * [sum_v X(v)^2 * gap(v)] / (n^2 * m^2)``

    (the last grid value has gap 0 — both ECDFs are 1 beyond it).  Both
    numerators are exact DECIMAL(38,0) integer sums; each published
    value is ONE division, floor-published at 1e6.  ``energy_x1e6``
    publishes D^2 (the squared-distance form used in two-sample energy
    tests); ``w1`` is in VALUE-AXIS units (scale-dependent by design).

    Module contract: the value axis is a bounded analysis grid (e.g.
    quantity 1..50) — the gap comes from a plain ``lead`` window over
    the distinct-value table, metadata-sized under the contract (same
    posture as the tau-b marginal windows).

    Output: one row — ``n_a, n_b, w1_x1e6, energy_x1e6`` (NULL when
    either group is empty).
    """
    from pyspark.sql import Window

    # Same per-value core as ranktests._two_sample_x, rebuilt inline
    # because the gap computation needs the value column retained (that
    # helper drops it) and the bounded-grid contract makes plain windows
    # over the distinct-value table legitimate here.
    g = F.col(group_col)
    v = (
        F.col(value_col) if isinstance(value_col, str) else value_col
    ).cast("bigint")
    base = df.filter(v.isNotNull() & g.isin([label_a, label_b])).select(
        F.when(g == F.lit(label_a), F.lit(0)).otherwise(F.lit(1)).alias("__s"),
        v.alias("__v"),
    )
    vals = base.groupBy("__v").agg(
        F.count(F.lit(1)).cast("bigint").alias("__t"),
        F.sum(F.when(F.col("__s") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("__ta"),
    )
    w = Window.orderBy(F.asc("__v")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run = vals.withColumn("__h", F.sum("__t").over(w)).withColumn(
        "__cza", F.sum("__ta").over(w)
    )
    run = run.withColumn(
        "__gap",
        F.coalesce(
            F.lead("__v", 1).over(Window.orderBy(F.asc("__v")))
            - F.col("__v"),
            F.lit(0),
        ).cast("bigint"),
    )
    tot = vals.agg(
        F.sum("__ta").cast("bigint").alias("__n"),
        (F.sum("__t") - F.sum("__ta")).cast("bigint").alias("__m"),
    )
    full = run.crossJoin(F.broadcast(tot))
    x = (
        F.col("__m").cast(_DEC) * F.col("__cza")
        - F.col("__n").cast(_DEC) * (F.col("__h") - F.col("__cza"))
    ).cast(_DEC)
    agg = full.agg(
        F.max("__n").alias("n_a"),
        F.max("__m").alias("n_b"),
        F.coalesce(
            F.sum(F.abs(x) * F.col("__gap").cast(_DEC)), F.lit(0).cast(_DEC)
        ).alias("__sw"),
        F.coalesce(
            F.sum(x * x * F.col("__gap").cast(_DEC)), F.lit(0).cast(_DEC)
        ).alias("__se"),
    )
    n = F.col("n_a").cast("double")
    m = F.col("n_b").cast("double")
    w1 = F.col("__sw").cast("double") / (n * m)
    en = F.lit(2.0) * F.col("__se").cast("double") / (n * n * m * m)
    bad = (
        F.col("n_a").isNull()
        | F.col("n_b").isNull()
        | (F.col("n_a") < 1)
        | (F.col("n_b") < 1)
    )
    pub = lambda c: F.floor(c * F.lit(float(scale)) + F.lit(0.5)).cast(  # noqa: E731
        "bigint"
    )
    return agg.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.when(bad, F.lit(None).cast("bigint"))
        .otherwise(pub(w1))
        .alias("w1_x1e6"),
        F.when(bad, F.lit(None).cast("bigint"))
        .otherwise(pub(en))
        .alias("energy_x1e6"),
    )


def fosd_check(
    df: DataFrame,
    group_col: str,
    label_a: str,
    label_b: str,
    value_col: Column | str,
) -> DataFrame:
    """First-order stochastic dominance check (Hadar & Russell, AER
    1969) between the two groups' value distributions — the ORDER
    verdict the distance family (q231 KS, q352 Kuiper, q354 W1) doesn't
    state: does one segment's distribution sit entirely to the right of
    the other's, or do the CDFs cross?

    A dominates B (A stochastically larger) iff ``F_a(v) <= F_b(v)``
    for every v — iff the exact integer ``X(v) = m*cum_a - n*cum_b``
    never exceeds 0.  Everything here is integer counting over the
    pooled distinct-value table: zero float operations, zero lattices.

    Output: one row — ``n_a, n_b, n_values, n_viol_a (values where
    F_a > F_b), n_viol_b (values where F_b > F_a), a_dominates,
    b_dominates`` (dominance flags are strict: the other direction must
    have at least one violation, so identical samples publish 0/0;
    flags NULL when either group is empty).
    """
    g = F.col(group_col)
    v = (
        F.col(value_col) if isinstance(value_col, str) else value_col
    ).cast("bigint")
    base = df.filter(v.isNotNull() & g.isin([label_a, label_b])).select(
        F.when(g == F.lit(label_a), F.lit(0)).otherwise(F.lit(1)).alias("__s"),
        v.alias("__v"),
    )
    vals = base.groupBy("__v").agg(
        F.count(F.lit(1)).cast("bigint").alias("__t"),
        F.sum(F.when(F.col("__s") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("__ta"),
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.asc("__v")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run = vals.withColumn("__h", F.sum("__t").over(w)).withColumn(
        "__cza", F.sum("__ta").over(w)
    )
    tot = vals.agg(
        F.sum("__ta").cast("bigint").alias("__n"),
        (F.sum("__t") - F.sum("__ta")).cast("bigint").alias("__m"),
    )
    full = run.crossJoin(F.broadcast(tot))
    x = (
        F.col("__m").cast(_DEC) * F.col("__cza")
        - F.col("__n").cast(_DEC) * (F.col("__h") - F.col("__cza"))
    ).cast(_DEC)
    agg = full.agg(
        F.max("__n").alias("n_a"),
        F.max("__m").alias("n_b"),
        F.count(F.lit(1)).cast("bigint").alias("n_values"),
        F.coalesce(
            F.sum(F.when(x > F.lit(0).cast(_DEC), 1).otherwise(0)), F.lit(0)
        )
        .cast("bigint")
        .alias("n_viol_a"),
        F.coalesce(
            F.sum(F.when(x < F.lit(0).cast(_DEC), 1).otherwise(0)), F.lit(0)
        )
        .cast("bigint")
        .alias("n_viol_b"),
    )
    bad = (
        F.col("n_a").isNull()
        | F.col("n_b").isNull()
        | (F.col("n_a") < 1)
        | (F.col("n_b") < 1)
    )
    flag = lambda cond: F.when(  # noqa: E731
        bad, F.lit(None).cast("bigint")
    ).otherwise(F.when(cond, 1).otherwise(0).cast("bigint"))
    return agg.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        "n_values",
        "n_viol_a",
        "n_viol_b",
        flag(
            (F.col("n_viol_a") == 0) & (F.col("n_viol_b") > 0)
        ).alias("a_dominates"),
        flag(
            (F.col("n_viol_b") == 0) & (F.col("n_viol_a") > 0)
        ).alias("b_dominates"),
    )
