"""Nonparametric rank tests and ECDF-distance statistics.

The round-8 corpus-governance wave (Kruskal-Wallis q304, Dunn q307,
Brown-Forsythe q308, Cliff's delta q309) covered the k-group location /
spread / effect-size story.  This module completes the classical
nonparametric toolbox a data-quality team actually reaches for:

- :func:`wilcoxon_signed_rank` — paired before/after shift (Wilcoxon 1945)
- :func:`friedman` — k treatments x n blocks rank ANOVA (Friedman 1937)
- :func:`page_trend` — ordered-treatment trend across blocks (Page, JASA
  1963), Friedman's ordered-alternative sibling
- :func:`jonckheere_terpstra` — ordered-alternative trend across ordered
  groups (Jonckheere 1954; Terpstra 1952)
- :func:`mood_median` — k-group median test (Mood 1950), composed from the
  exact global lower median and :func:`~.stats.chisq_independence`
- :func:`cvm_two_sample` — two-sample Cramér-von Mises ECDF distance
  (Anderson, Ann. Math. Stat. 1962)
- :func:`ad_two_sample` — two-sample Anderson-Darling (Pettitt,
  Biometrika 1976; tie handling per Scholz & Stephens, JASA 1987)
- :func:`kendall_tau_b_binned` — Kendall tau-b + Goodman-Kruskal gamma
  over a bounded categorical grid (Kendall 1945; Goodman & Kruskal 1954)

Determinism contract (the repo-wide discipline): every count, rank-sum and
dominance/concordance count is an exact BIGINT/DECIMAL(38,0) (midranks in
DOUBLED units stay integral under ties); each published statistic is ONE
fixed IEEE tree over those exact scalars, floor-published on the 1e6
lattice and mirrored verbatim by the DuckDB oracles.  Where a statistic
needs per-point division inside a sum (Anderson-Darling's 1/(H(N-H))
weight), each term is an exact integer division on a declared lattice and
the SUM is integer — float summation order never matters.

Scale posture: raw rows always collapse to distinct-value (or bounded
grid) tables first; cumulative counts run through
:func:`~.sampling.two_phase_running_sum`; group axes densify over the
shared value axis via constant-key broadcast equi-joins (never a
cartesian); pairwise group combines join ON THE VALUE KEY and reduce
map-side, so k(k-1)/2 outputs stay driver-sized at any corpus size.

Reference parity note: the reference tool (kshres31/
Manufacturing-Data-Integration-Tool, src/data_validator.py) stops at
per-rule row screens; these operators are the statistical-governance layer
above it (does a source/lang/priority segment DIFFER), same role as the
round-8 q303-q309 family they extend.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ._materialize import materialize_once

from .sampling import two_phase_running_sum

__all__ = [
    "wilcoxon_signed_rank",
    "friedman",
    "page_trend",
    "mood_scale_test",
    "kendall_w",
    "jonckheere_terpstra",
    "mood_median",
    "cvm_two_sample",
    "ad_two_sample",
    "kendall_tau_b_binned",
    "ordinal_association_binned",
    "mann_whitney_u",
    "kuiper_two_sample",
]


def _as_bigint(value_col: Column | str) -> Column:
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    return c.cast("bigint")


_DEC = "decimal(38,0)"


def wilcoxon_signed_rank(
    df: DataFrame,
    diff_col: Column | str,
    *,
    sub_bucket: Column | None = None,
    scale: int = 1_000_000,
) -> DataFrame:
    """Wilcoxon signed-rank test (Wilcoxon, Biometrics Bulletin 1945) on a
    column of PAIRED integer differences: did the location shift between
    the two halves of each pair — the paired sibling of q196's
    Mann-Whitney and q304's Kruskal-Wallis.

    Zeros are dropped (the standard Wilcoxon reduction); |d| is ranked
    with DOUBLED midranks (a |d| bucket of ``t`` rows after ``below``
    smaller rows has doubled midrank ``2*below + t + 1``), so the
    positive-rank sum ``W2+ = sum of doubled midranks over d > 0`` is an
    exact DECIMAL(38,0).  Under H0, ``E[W2+] = n(n+1)/2`` exactly and
    ``Var(W2+) = (2n(n+1)(2n+1) - sum(t^3 - t)) / 12`` (tie-corrected,
    Pratt's zero-drop convention) — so

        ``z = (2*W2+ - n(n+1)) / sqrt((2n(n+1)(2n+1) - tie3) / 3)``

    is ONE IEEE tree over exact integers (numerator doubled once more to
    stay integral), floor-published at 1e6, sign preserved.

    Scale posture: rows collapse to the distinct-|d| table (map-side);
    the cumulative below-count runs two-phase; no all-pairs work.

    Output: one row — ``n_pairs, n_pos, n_neg, w2_plus, z_x1e6``. z is
    NULL only when ``n_pairs = 0`` (after the zero drop the tie-corrected
    variance ``2n(n+1)(2n+1) - tie3`` is strictly positive for any
    n >= 1, even when every |d| is equal, so the ``varnum <= 0`` branch
    of the guard is unreachable and exists only as belt-and-braces).
    """
    d = _as_bigint(diff_col)
    base = df.select(d.alias("__d")).filter(
        F.col("__d").isNotNull() & (F.col("__d") != 0)
    )
    absd = base.groupBy(F.abs(F.col("__d")).alias("__a")).agg(
        F.count(F.lit(1)).cast("bigint").alias("__t"),
        F.sum(F.when(F.col("__d") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("__tp"),
    )
    sub = sub_bucket if sub_bucket is not None else F.expr("__a div 65536")
    run = two_phase_running_sum(
        absd, [], [F.asc("__a")], F.col("__t"), sub, out_col="__ci"
    )
    dmid = (
        F.lit(2) * (F.col("__ci") - F.col("__t")) + F.col("__t") + F.lit(1)
    ).cast(_DEC)
    agg = run.agg(
        F.coalesce(F.sum("__t"), F.lit(0)).cast("bigint").alias("n_pairs"),
        F.coalesce(F.sum("__tp"), F.lit(0)).cast("bigint").alias("n_pos"),
        F.coalesce(F.sum(F.col("__tp").cast(_DEC) * dmid), F.lit(0).cast(_DEC))
        .cast(_DEC)
        .alias("__w2p"),
        F.coalesce(
            F.sum(
                F.col("__t").cast(_DEC) * F.col("__t") * F.col("__t")
                - F.col("__t")
            ),
            F.lit(0).cast(_DEC),
        )
        .cast(_DEC)
        .alias("__tie3"),
    )
    n = F.col("n_pairs").cast(_DEC)
    num = (F.lit(2).cast(_DEC) * F.col("__w2p") - n * (n + F.lit(1))).cast(
        "double"
    )
    varnum = (
        F.lit(2).cast(_DEC) * n * (n + F.lit(1)) * (F.lit(2) * n + F.lit(1))
        - F.col("__tie3")
    ).cast("double")
    z = num / F.sqrt(varnum / F.lit(3.0))
    return agg.select(
        "n_pairs",
        "n_pos",
        (F.col("n_pairs") - F.col("n_pos")).cast("bigint").alias("n_neg"),
        F.col("__w2p").cast("bigint").alias("w2_plus"),
        F.when(
            (F.col("n_pairs") < 1) | (varnum <= F.lit(0.0)),
            F.lit(None).cast("bigint"),
        )
        .otherwise(
            F.floor(z * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
        )
        .alias("z_x1e6"),
    )


def _block_doubled_midranks(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: Column | str,
) -> tuple[DataFrame, DataFrame]:
    """Shared randomized-block rank core for :func:`friedman` and
    :func:`page_trend`: one summed value per (block, treatment),
    COMPLETE blocks only (all k treatments present; k is the 1-row
    broadcast ``kg`` — stays lazy, no driver action at plan time), and
    within-block DOUBLED midranks ``dmid = 2*#{smaller} + #{equal} + 1``
    from a block-keyed self-join (blocks have exactly k rows, an
    analysis constant, so the fan-out is k-fold on the tiny cell
    table). Returns ``(ranked(__b, __j, __dmid), kg(__k))``."""
    v = _as_bigint(value_col)
    base0 = df.filter(
        v.isNotNull()
        & F.col(block_col).isNotNull()
        & F.col(treatment_col).isNotNull()
    ).select(
        F.col(block_col).alias("__b"),
        F.col(treatment_col).alias("__j"),
        v.alias("__v"),
    )
    cell = base0.groupBy("__b", "__j").agg(
        F.sum("__v").cast("bigint").alias("__v")
    )
    kg = cell.agg(F.countDistinct("__j").cast("bigint").alias("__k"))
    complete = (
        cell.groupBy("__b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__kb"))
        .crossJoin(F.broadcast(kg))
        .filter(F.col("__kb") == F.col("__k"))
        .select("__b")
    )
    rows = cell.join(complete, "__b")
    other = rows.select(
        F.col("__b").alias("__ob"), F.col("__v").alias("__ov")
    )
    ranked = (
        rows.join(other, rows["__b"] == other["__ob"])
        .groupBy("__b", "__j")
        .agg(
            (
                F.lit(2) * F.sum(F.when(F.col("__ov") < F.col("__v"), 1).otherwise(0))
                + F.sum(F.when(F.col("__ov") == F.col("__v"), 1).otherwise(0))
                + F.lit(1)
            )
            .cast("bigint")
            .alias("__dmid")
        )
    )
    return ranked, kg


def friedman(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: Column | str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Friedman rank test (Friedman, JASA 1937): do k treatments differ
    when measured once per block — the rank ANOVA for randomized blocks
    (here: does the event mix differ across event types, blocking by day,
    so day-level traffic level cancels out).

    Contract: one value per (block, treatment) — duplicates are SUMMED
    (the natural semantics for count metrics); only COMPLETE blocks
    (all k treatments present, k = the global distinct-treatment count)
    enter the test, the textbook requirement.

    Within-block DOUBLED midranks come from a block-keyed self-join
    (``dmid = 2*#{smaller in block} + #{equal in block} + 1``) — blocks
    have exactly k rows, an analysis constant, so the join fans out k-fold
    only on the tiny per-block table.  With ``R2_j`` the per-treatment
    doubled rank-sum, ``A1' = sum dmid^2``, ``C1' = n*k*(k+1)^2`` (all
    exact integers; the doubled units absorb the /4), the tie-general
    statistic (Conover, Practical Nonparametric Statistics, eq. 5.8.8)

        ``Q = (k-1) * sum_j (R2_j - n*(k+1))^2 / (A1' - C1')``

    is ONE division of exact decimals, floor-published at 1e6 (NULL when
    every block is fully tied: A1' = C1').

    Output: one row — ``n_blocks, k_treatments, q_x1e6``.
    """
    ranked, kg = _block_doubled_midranks(
        df, block_col, treatment_col, value_col
    )
    nrow = ranked.select("__b").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("__n")
    )
    per_j = (
        ranked.groupBy("__j")
        .agg(F.sum(F.col("__dmid").cast(_DEC)).cast(_DEC).alias("__r2j"))
        .crossJoin(F.broadcast(nrow))
        .crossJoin(F.broadcast(kg))
    )
    dev = F.col("__r2j") - F.col("__n").cast(_DEC) * (
        F.col("__k").cast(_DEC) + F.lit(1).cast(_DEC)
    )
    s = per_j.agg(
        F.max("__n").alias("n_blocks"),
        F.max("__k").alias("k_treatments"),
        F.sum(dev * dev).cast(_DEC).alias("__s"),
    )
    a1 = ranked.agg(
        F.sum(F.col("__dmid").cast(_DEC) * F.col("__dmid"))
        .cast(_DEC)
        .alias("__a1")
    )
    g = s.crossJoin(F.broadcast(a1))
    kd = F.col("k_treatments").cast(_DEC)
    c1 = (
        F.col("n_blocks").cast(_DEC)
        * kd
        * (kd + F.lit(1)) * (kd + F.lit(1))
    )
    den = (F.col("__a1") - c1).cast("double")
    q = (
        (F.col("k_treatments").cast("double") - F.lit(1.0))
        * F.col("__s").cast("double")
        / den
    )
    return g.select(
        F.col("n_blocks").cast("bigint").alias("n_blocks"),
        F.col("k_treatments").cast("bigint").alias("k_treatments"),
        F.when(
            (F.col("n_blocks") < 1) | (den <= F.lit(0.0)),
            F.lit(None).cast("bigint"),
        )
        .otherwise(
            F.floor(q * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
        )
        .alias("q_x1e6"),
    )


def page_trend(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: Column | str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Page's L trend test (Page, JASA 1963): is there a MONOTONE trend
    across the k ordered treatments, blocking nuisance variation — the
    ordered-alternative sibling of :func:`friedman` exactly as
    :func:`jonckheere_terpstra` is Kruskal-Wallis's (e.g. does daily
    traffic trend across the week, blocking by week).

    Treatments are ordered by their column value; the Page coefficient
    ``c_j = 1..k`` is the treatment's dense rank (a tiny broadcast
    table), so any dense/sparse integer or orderable labels work.
    ``L2 = sum_j c_j * R2_j`` over DOUBLED within-block midranks (shared
    :func:`_block_doubled_midranks` core) is an exact integer;
    ``E[L2] = n*k*(k+1)^2 / 2`` and ``Var(L2) = n*k^2*(k+1)*(k^2-1)/36``
    are the classical Page moments (the test's standard no-tie form —
    midranks make L well-defined under ties; fully-tied blocks
    contribute exactly E[L2]/n each, biasing z toward 0, never away),
    and z is ONE mirrored IEEE tree, sign = trend direction along the
    treatment order.

    Output: one row — ``n_blocks, k_treatments, l2, z_x1e6`` (z NULL
    when n < 1 or k < 2).
    """
    ranked, kg = _block_doubled_midranks(
        df, block_col, treatment_col, value_col
    )
    # c_j = dense rank of the treatment label (k rows — broadcast)
    from pyspark.sql import Window

    cj = (
        ranked.select("__j")
        .distinct()
        .withColumn(
            "__cj",
            F.dense_rank().over(Window.orderBy(F.asc("__j"))).cast("bigint"),
        )
    )
    nrow = ranked.select("__b").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("__n")
    )
    agg = (
        ranked.join(F.broadcast(cj), "__j")
        .agg(
            F.sum(F.col("__cj").cast(_DEC) * F.col("__dmid"))
            .cast(_DEC)
            .alias("__l2")
        )
        .crossJoin(F.broadcast(nrow))
        .crossJoin(F.broadcast(kg))
    )
    n = F.col("__n").cast(_DEC)
    k = F.col("__k").cast(_DEC)
    e_l2 = n * k * (k + F.lit(1)) * (k + F.lit(1))
    var36 = (
        n * k * k * (k + F.lit(1)) * (k * k - F.lit(1))
    ).cast("double")
    z = (
        (F.lit(2).cast(_DEC) * F.col("__l2") - e_l2).cast("double")
        / (F.lit(2.0) * F.sqrt(var36 / F.lit(36.0)))
    )
    return agg.select(
        F.col("__n").cast("bigint").alias("n_blocks"),
        F.col("__k").cast("bigint").alias("k_treatments"),
        F.col("__l2").cast("bigint").alias("l2"),
        F.when(
            (F.col("__n") < 1) | (var36 <= F.lit(0.0)),
            F.lit(None).cast("bigint"),
        )
        .otherwise(
            F.floor(z * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
        )
        .alias("z_x1e6"),
    )


def _group_value_cumulatives(
    df: DataFrame,
    group_col: str,
    value_col: Column | str,
    sub_bucket: Column | None,
) -> tuple[DataFrame, DataFrame]:
    """Shared densified-lattice core for the dominance-count family
    (:func:`jonckheere_terpstra` here; same construction as
    :func:`~.stats.cliffs_delta_pairwise`): every group crossed with the
    SHARED distinct-value axis via a constant-key broadcast equi-join
    (k rows broadcast — a BroadcastHashJoin, never a cartesian), zero
    counts filled, per-group inclusive cumulative counts two-phase.

    Returns ``(full, gv)``: ``full`` = (__g, __v, __ngv, __ci, __ng) on
    the dense lattice; ``gv`` = the sparse (__g, __v, __ngv) table.
    """
    v = _as_bigint(value_col)
    base = df.filter(v.isNotNull() & F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("__g"), v.alias("__v")
    )
    gv = base.groupBy("__g", "__v").agg(
        F.count(F.lit(1)).cast("bigint").alias("__ngv")
    )
    vals = gv.select("__v").distinct().withColumn("__one", F.lit(1))
    groups = gv.select("__g").distinct().withColumn("__one", F.lit(1))
    lattice = (
        vals.join(F.broadcast(groups), "__one")
        .drop("__one")
        .join(gv, ["__g", "__v"], "left")
        .na.fill({"__ngv": 0})
    )
    sub = sub_bucket if sub_bucket is not None else F.expr("__v div 65536")
    run = two_phase_running_sum(
        lattice, ["__g"], [F.asc("__v")], F.col("__ngv"), sub, out_col="__ci"
    )
    totals = gv.groupBy("__g").agg(F.sum("__ngv").cast("bigint").alias("__ng"))
    full = run.join(F.broadcast(totals), "__g")
    return full, gv


def jonckheere_terpstra(
    df: DataFrame,
    group_order_col: Column | str,
    value_col: Column | str,
    *,
    sub_bucket: Column | None = None,
    scale: int = 1_000_000,
) -> DataFrame:
    """Jonckheere-Terpstra ordered-alternative trend test (Terpstra 1952;
    Jonckheere, Biometrika 1954): is a value's distribution
    monotonically shifted across k ORDERED groups (e.g. does order value
    trend across the 1-URGENT..5-LOW priority ladder) — strictly more
    powerful than Kruskal-Wallis when the alternative is ordered.

    ``J = sum over ordered group pairs a<b of U_ab`` with
    ``U_ab = #{x_a < y_b} + #{x_a = y_b}/2``.  In DOUBLED units each
    pair's dominance count comes off the shared densified value lattice:
    ``2*U_ab = sum_v n_b(v) * (2*cum_a(v) - n_a(v))`` (``cum_a``
    inclusive), one decimal(38,0) sum — the :func:`~.stats
    .cliffs_delta_pairwise` machinery pointed at the LOWER triangle.
    Under H0, ``E[2J] = (N^2 - sum n_j^2)/2`` and the tie-corrected
    variance (Hollander & Wolfe, Nonparametric Statistical Methods,
    eq. 6.19) assembles from six exact integer sums:

        ``72*Var(J) = A + 2*B/(N(N-1)(N-2)) + 9*E3*U3/(N(N-1))`` with
        ``A  = N(N-1)(2N+5) - sum n(n-1)(2n+5) - sum t(t-1)(2t+5)``,
        ``B  = [sum n(n-1)(n-2)] * [sum t(t-1)(t-2)]``,
        ``E3*U3 = [sum n(n-1)] * [sum t(t-1)]``

    (group sums over n_j, tie sums over pooled value multiplicities t);
    ``z = (2*(2J) - (N^2 - sum n_j^2)) / (4*sqrt(Var))`` is ONE IEEE
    tree, floor-published at 1e6, sign preserved (positive = value grows
    with the group order).

    Output: one row — ``n_total, n_groups, j2, z_x1e6`` (z NULL when
    k < 2 or Var <= 0).
    """
    g = (
        F.col(group_order_col)
        if isinstance(group_order_col, str)
        else group_order_col
    ).cast("bigint")
    src = df.select(g.alias("__gk"), (_as_bigint(value_col)).alias("__val"))
    full, gv = _group_value_cumulatives(src, "__gk", F.col("__val"), sub_bucket)
    a = full.select(
        F.col("__v").alias("__va"),
        F.col("__g").alias("__ga"),
        F.col("__ngv").alias("__na_v"),
        F.col("__ci").alias("__ca"),
    )
    b = gv.select(
        F.col("__v").alias("__vb"),
        F.col("__g").alias("__gb"),
        F.col("__ngv").alias("__nb_v"),
    )
    contrib = F.col("__nb_v").cast(_DEC) * (
        F.lit(2) * F.col("__ca") - F.col("__na_v")
    ).cast(_DEC)
    j2 = (
        a.join(b, a["__va"] == b["__vb"])
        .filter(F.col("__ga") < F.col("__gb"))
        .agg(F.coalesce(F.sum(contrib), F.lit(0).cast(_DEC)).alias("__j2"))
    )
    dec = lambda c: c.cast(_DEC)  # noqa: E731
    ng = gv.groupBy("__g").agg(F.sum("__ngv").cast("bigint").alias("__nj"))
    gsum = ng.agg(
        F.sum("__nj").cast("bigint").alias("n_total"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(dec(F.col("__nj")) * F.col("__nj")).cast(_DEC).alias("__sn2"),
        F.sum(
            dec(F.col("__nj"))
            * (F.col("__nj") - 1)
            * (F.lit(2) * F.col("__nj") + 5)
        )
        .cast(_DEC)
        .alias("__e1"),
        F.sum(dec(F.col("__nj")) * (F.col("__nj") - 1) * (F.col("__nj") - 2))
        .cast(_DEC)
        .alias("__e2"),
        F.sum(dec(F.col("__nj")) * (F.col("__nj") - 1))
        .cast(_DEC)
        .alias("__e3"),
    )
    vt = gv.groupBy("__v").agg(F.sum("__ngv").cast("bigint").alias("__t"))
    tsum = vt.agg(
        F.sum(
            dec(F.col("__t")) * (F.col("__t") - 1) * (F.lit(2) * F.col("__t") + 5)
        )
        .cast(_DEC)
        .alias("__u1"),
        F.sum(dec(F.col("__t")) * (F.col("__t") - 1) * (F.col("__t") - 2))
        .cast(_DEC)
        .alias("__u2"),
        F.sum(dec(F.col("__t")) * (F.col("__t") - 1)).cast(_DEC).alias("__u3"),
    )
    out = gsum.crossJoin(F.broadcast(tsum)).crossJoin(F.broadcast(j2))
    nn = F.col("n_total").cast(_DEC)
    a_term = (
        nn * (nn - F.lit(1)) * (F.lit(2) * nn + F.lit(5))
        - F.col("__e1")
        - F.col("__u1")
    ).cast("double")
    nd = F.col("n_total").cast("double")
    var = (
        a_term / F.lit(72.0)
        + (F.col("__e2").cast("double") * F.col("__u2").cast("double"))
        / (F.lit(36.0) * nd * (nd - F.lit(1.0)) * (nd - F.lit(2.0)))
        + (F.col("__e3").cast("double") * F.col("__u3").cast("double"))
        / (F.lit(8.0) * nd * (nd - F.lit(1.0)))
    )
    num = (
        F.lit(2).cast(_DEC) * F.col("__j2") - (nn * nn - F.col("__sn2"))
    ).cast("double")
    z = num / (F.lit(4.0) * F.sqrt(var))
    return out.select(
        "n_total",
        "n_groups",
        F.col("__j2").cast("bigint").alias("j2"),
        F.when(
            (F.col("n_groups") < 2) | (var <= F.lit(0.0)),
            F.lit(None).cast("bigint"),
        )
        .otherwise(
            F.floor(z * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
        )
        .alias("z_x1e6"),
    )


def mood_median(
    df: DataFrame,
    group_col: str,
    value_col: Column | str,
    *,
    sub_bucket: Column | None = None,
) -> DataFrame:
    """Mood's median test (Mood, Introduction to the Theory of Statistics
    1950): classify every row as above / not-above the GRAND median and
    chi-square the k x 2 contingency — the blunt-but-assumption-free
    k-group location screen (less powerful than Kruskal-Wallis, immune
    to shape differences).

    The grand median is the exact LOWER median (smallest v with
    ``2*cum >= N``, two-phase cumulative — the q308 convention); the
    contingency test composes :func:`~.stats.chisq_independence`
    unchanged (per-cell integer-lattice quantization, integer sum, one
    published division).

    Output: one row — ``grand_median, n, n_groups, dof, chi2``
    (``dof = (k-1)`` since the flag axis is binary; chi2 is the
    floor-published 6-decimal double from chisq_independence).
    """
    from .stats import chisq_independence

    v = _as_bigint(value_col)
    base = df.filter(v.isNotNull() & F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("__g"), v.alias("__v")
    )
    vals = base.groupBy("__v").agg(F.count(F.lit(1)).cast("bigint").alias("__t"))
    sub = sub_bucket if sub_bucket is not None else F.expr("__v div 65536")
    run = two_phase_running_sum(
        vals, [], [F.asc("__v")], F.col("__t"), sub, out_col="__ci"
    )
    tot = vals.agg(F.sum("__t").cast("bigint").alias("__n"))
    med = (
        run.crossJoin(F.broadcast(tot))
        .filter(F.lit(2) * F.col("__ci") >= F.col("__n"))
        .agg(F.min("__v").alias("__med"))
    )
    flagged = base.crossJoin(F.broadcast(med)).select(
        "__g",
        F.when(F.col("__v") > F.col("__med"), F.lit("above"))
        .otherwise(F.lit("not_above"))
        .alias("__side"),
    )
    chi = chisq_independence(flagged, "__g", "__side")
    return chi.crossJoin(F.broadcast(med)).select(
        F.col("__med").cast("bigint").alias("grand_median"),
        "n",
        F.col("n_a").alias("n_groups"),
        "dof",
        "chi2",
    )


def _two_sample_x(df, group_col, value_col, label_a, label_b, sub_bucket):
    """Shared two-sample ECDF core: per pooled distinct value v, the
    exact integer ``X(v) = m*cum_a(v) - n*cum_b(v)`` (n = |a|, m = |b|,
    cumulatives inclusive) whose square drives both CvM and AD, plus the
    pooled multiplicity ``t(v)`` and pooled cumulative ``H(v)``.

    Returns the per-value frame with columns
    ``(__t, __ta, __h, __x, __n, __m)`` — |values| rows, group axis
    densified by construction (both cumulatives are evaluated at every
    pooled v); ``__ta`` is the per-value sample-a multiplicity (used by
    the rank-score tests, e.g. Mood's scale test).
    """
    g = F.col(group_col)
    v = _as_bigint(value_col)
    base = df.filter(
        v.isNotNull() & g.isin([label_a, label_b])
    ).select(
        F.when(g == F.lit(label_a), F.lit(0)).otherwise(F.lit(1)).alias("__s"),
        v.alias("__v"),
    )
    vals = base.groupBy("__v").agg(
        F.count(F.lit(1)).cast("bigint").alias("__t"),
        F.sum(F.when(F.col("__s") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("__ta"),
    )
    sub = sub_bucket if sub_bucket is not None else F.expr("__v div 65536")
    run = two_phase_running_sum(
        vals, [], [F.asc("__v")], F.col("__t"), sub, out_col="__h"
    )
    run = two_phase_running_sum(
        run, [], [F.asc("__v")], F.col("__ta"), sub, out_col="__cza"
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
    return full.select("__t", "__ta", "__h", x.alias("__x"), "__n", "__m")


def cvm_two_sample(
    df: DataFrame,
    group_col: str,
    label_a: str,
    label_b: str,
    value_col: Column | str,
    *,
    sub_bucket: Column | None = None,
    scale: int = 1_000_000,
) -> DataFrame:
    """Two-sample Cramér-von Mises ECDF distance (Anderson, Ann. Math.
    Stat. 1962): ``T = nm/(n+m)^2 * sum over pooled points of
    (F_n - G_m)^2`` — the whole-distribution drift test that weights the
    body where KS (q231) only sees the single largest gap.

    With per-value exact ``X(v) = m*cum_a - n*cum_b`` (so
    ``F_n - G_m = X/(nm)`` at v) and pooled multiplicity t(v),
    ``T = [sum_v t*X^2] / (n*m*(n+m)^2)`` — the numerator is one exact
    DECIMAL(38,0) sum, T is ONE division, floor-published at 1e6.

    Output: one row — ``n_a, n_b, t_x1e6`` (NULL when either sample is
    empty).
    """
    per_v = _two_sample_x(df, group_col, value_col, label_a, label_b, sub_bucket)
    s = per_v.agg(
        F.max("__n").alias("n_a"),
        F.max("__m").alias("n_b"),
        F.coalesce(
            F.sum(F.col("__t").cast(_DEC) * F.col("__x") * F.col("__x")),
            F.lit(0).cast(_DEC),
        ).alias("__s"),
    )
    n = F.col("n_a").cast("double")
    m = F.col("n_b").cast("double")
    t = F.col("__s").cast("double") / (n * m * (n + m) * (n + m))
    return s.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.when(
            F.col("n_a").isNull()
            | F.col("n_b").isNull()
            | (F.col("n_a") < 1)
            | (F.col("n_b") < 1),
            F.lit(None).cast("bigint"),
        )
        .otherwise(
            F.floor(t * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
        )
        .alias("t_x1e6"),
    )


_AD_GRID = 1_000_000


def ad_two_sample(
    df: DataFrame,
    group_col: str,
    label_a: str,
    label_b: str,
    value_col: Column | str,
    *,
    sub_bucket: Column | None = None,
    scale: int = 1_000_000,
) -> DataFrame:
    """Two-sample Anderson-Darling statistic (Pettitt, Biometrika 1976;
    discrete/tied form per Scholz & Stephens, JASA 1987, k = 2, without
    continuity adjustment): the tail-sensitive companion to
    :func:`cvm_two_sample` — the 1/(H(N-H)) weight makes it the screen
    that catches tail-only contamination CvM's body weighting smooths
    over.

    For k = 2 the Scholz-Stephens inner sum collapses (since
    ``N*M_a - n*H = -(N*M_b - m*H) = X``, the same exact integer as
    CvM's): ``A2 = [sum over pooled v with H < N of
    t * X^2 / (H*(N-H))] / (n*m)``.  Each term's division is the exact
    integer ``(t * X^2 * GRID) div (H*(N-H))`` on the declared 1e6
    lattice (truncation < 1/GRID per term, identical on both engines),
    the sum is a DECIMAL(38,0) integer sum — float order never enters —
    and A2 is ONE published division.

    Output: one row — ``n_a, n_b, a2_x1e6`` (NULL when either sample is
    empty).
    """
    per_v = _two_sample_x(df, group_col, value_col, label_a, label_b, sub_bucket)
    nn = F.col("__n") + F.col("__m")
    term = F.expr(
        f"CAST(__t * __x * __x * {_AD_GRID} AS DECIMAL(38,0)) "
        "div CAST(__h * ((__n + __m) - __h) AS DECIMAL(38,0))"
    )
    s = per_v.filter(F.col("__h") < nn).agg(
        F.max("__n").alias("n_a"),
        F.max("__m").alias("n_b"),
        F.coalesce(F.sum(term), F.lit(0).cast(_DEC)).alias("__sq"),
    )
    a2 = F.col("__sq").cast("double") / (
        F.col("n_a").cast("double")
        * F.col("n_b").cast("double")
        * F.lit(float(_AD_GRID))
    )
    return s.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.when(
            F.col("n_a").isNull()
            | F.col("n_b").isNull()
            | (F.col("n_a") < 1)
            | (F.col("n_b") < 1),
            F.lit(None).cast("bigint"),
        )
        .otherwise(
            F.floor(a2 * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
        )
        .alias("a2_x1e6"),
    )


def kendall_tau_b_binned(
    df: DataFrame,
    x_col: Column | str,
    y_col: Column | str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Kendall tau-b rank correlation + Goodman-Kruskal gamma over a
    BOUNDED categorical grid (Kendall, Biometrika 1945 for the tie-aware
    tau-b; Goodman & Kruskal, JASA 1954): the ordinal-association
    companion to q277's Spearman — tau-b reads directly as a probability
    difference of concordance vs discordance.

    Module contract: x and y are integers with BOUNDED distinct counts
    (grid axes are analysis parameters — quantity 1..50, discount points
    0..10; callers bin continuous columns first, as with Cliff's delta).
    Rows collapse to the |x|*|y| cell table; the grid densifies by a
    constant-key broadcast equi-join; concordant/discordant pair counts
    come from exact 2-D inclusive prefix sums by inclusion-exclusion —
    ``#{x'>x, y'>y} = T - R(x) - C(y) + P(x,y)`` — never a pairwise
    cell join, so the shuffle is one groupBy plus bounded-partition
    windows (each window partition holds one grid row/column).

    With ``2*n0 = N(N-1)``, ``2*n1 = sum_x t_x(t_x-1)``,
    ``2*n2 = sum_y t_y(t_y-1)`` (exact BIGINTs),

        ``tau_b = 2*(C - D) / (sqrt(2n0 - 2n1) * sqrt(2n0 - 2n2))``
        ``gamma = (C - D) / (C + D)``

    each ONE IEEE tree, floor-published at 1e6.

    Output: one row — ``n, n_conc, n_disc, tau_b_x1e6, gamma_x1e6``
    (tau NULL when either axis is constant; gamma NULL when C + D = 0).
    """
    out = _concordance_core(df, x_col, y_col)
    n = F.col("n").cast(_DEC)
    two_n0 = n * (n - F.lit(1))
    dx = (two_n0 - F.col("__t1")).cast("double")
    dy = (two_n0 - F.col("__t2")).cast("double")
    cd = (F.col("__cc") - F.col("__dd")).cast("double")
    tau = F.lit(2.0) * cd / (F.sqrt(dx) * F.sqrt(dy))
    gamma = cd / (F.col("__cc") + F.col("__dd")).cast("double")
    pub = lambda col: F.floor(col * F.lit(float(scale)) + F.lit(0.5)).cast(  # noqa: E731
        "bigint"
    )
    return out.select(
        "n",
        F.col("__cc").cast("bigint").alias("n_conc"),
        F.col("__dd").cast("bigint").alias("n_disc"),
        F.when(
            (dx <= F.lit(0.0)) | (dy <= F.lit(0.0)), F.lit(None).cast("bigint")
        )
        .otherwise(pub(tau))
        .alias("tau_b_x1e6"),
        F.when(
            (F.col("__cc") + F.col("__dd")) <= F.lit(0).cast(_DEC),
            F.lit(None).cast("bigint"),
        )
        .otherwise(pub(gamma))
        .alias("gamma_x1e6"),
    )


def ordinal_association_binned(
    df: DataFrame,
    x_col: Column | str,
    y_col: Column | str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Asymmetric ordinal association over a BOUNDED categorical grid:
    Somers' D in both directions (Somers, Am. Sociol. Rev. 1962) and
    Stuart's tau-c (Stuart, Biometrika 1953) — the directional /
    rectangular-table companions to :func:`kendall_tau_b_binned` (q316),
    sharing its exact prefix-sum concordance core and grid contract.

    With C/D the concordant/discordant pair counts, ``2*n0 = N(N-1)``,
    ``t1 = sum_x t_x(t_x-1)``, ``t2 = sum_y t_y(t_y-1)`` (exact), and
    ``m = min(r, c)`` the smaller level count:

        ``somers_dyx = 2*(C - D) / (2n0 - t1)``  (Y response: X-ties out)
        ``somers_dxy = 2*(C - D) / (2n0 - t2)``  (X response: Y-ties out)
        ``tau_c      = 2*m*(C - D) / (N^2 * (m - 1))``

    each ONE IEEE tree over exact integers, floor-published at 1e6.

    Output: one row — ``n, x_levels, y_levels, somers_dyx_x1e6,
    somers_dxy_x1e6, tau_c_x1e6`` (each D NULL when its conditioning
    axis is constant; tau_c NULL when min(r, c) < 2 or N < 2).
    """
    out = _concordance_core(df, x_col, y_col)
    n = F.col("n").cast(_DEC)
    two_n0 = n * (n - F.lit(1))
    dx = (two_n0 - F.col("__t1")).cast("double")
    dy = (two_n0 - F.col("__t2")).cast("double")
    cd = (F.col("__cc") - F.col("__dd")).cast("double")
    m = F.least(F.col("__r"), F.col("__c")).cast("bigint")
    dyx = F.lit(2.0) * cd / dx
    dxy = F.lit(2.0) * cd / dy
    tau_c = (
        F.lit(2.0)
        * m.cast("double")
        * cd
        / (
            F.col("n").cast("double")
            * F.col("n").cast("double")
            * (m.cast("double") - F.lit(1.0))
        )
    )
    pub = lambda col: F.floor(col * F.lit(float(scale)) + F.lit(0.5)).cast(  # noqa: E731
        "bigint"
    )
    return out.select(
        "n",
        F.col("__r").cast("bigint").alias("x_levels"),
        F.col("__c").cast("bigint").alias("y_levels"),
        F.when(dx <= F.lit(0.0), F.lit(None).cast("bigint"))
        .otherwise(pub(dyx))
        .alias("somers_dyx_x1e6"),
        F.when(dy <= F.lit(0.0), F.lit(None).cast("bigint"))
        .otherwise(pub(dxy))
        .alias("somers_dxy_x1e6"),
        F.when(
            (m < F.lit(2)) | (F.col("n") < F.lit(2)),
            F.lit(None).cast("bigint"),
        )
        .otherwise(pub(tau_c))
        .alias("tau_c_x1e6"),
    )


def _concordance_core(
    df: DataFrame, x_col: Column | str, y_col: Column | str
) -> DataFrame:
    """Shared exact concordance core for the bounded-grid ordinal
    statistics (:func:`kendall_tau_b_binned`,
    :func:`ordinal_association_binned`): one row with ``n`` (BIGINT row
    count), ``__cc``/``__dd`` (DECIMAL(38,0) concordant/discordant pair
    counts via 2-D inclusive prefix sums and inclusion-exclusion —
    never a pairwise cell join), ``__t1``/``__t2`` (doubled tie terms
    ``sum t(t-1)`` per axis), and ``__r``/``__c`` (distinct level counts
    per axis, BIGINT)."""
    from pyspark.sql import Window

    x = _as_bigint(x_col)
    y = _as_bigint(y_col)
    base = df.select(x.alias("__x"), y.alias("__y")).filter(
        F.col("__x").isNotNull() & F.col("__y").isNotNull()
    )
    cells = base.groupBy("__x", "__y").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    xs = cells.select("__x").distinct().withColumn("__one", F.lit(1))
    ys = cells.select("__y").distinct().withColumn("__one", F.lit(1))
    grid = (
        xs.join(F.broadcast(ys), "__one")
        .drop("__one")
        .join(cells, ["__x", "__y"], "left")
        .na.fill({"__c": 0})
    )
    # 2-D inclusive prefix P(x,y) via two chained bounded-partition
    # windows: per-x running over y, then per-y running over x of that.
    w_y = (
        Window.partitionBy("__x")
        .orderBy(F.asc("__y"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_x = (
        Window.partitionBy("__y")
        .orderBy(F.asc("__x"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    g2 = grid.withColumn("__cy", F.sum("__c").over(w_y))
    g2 = g2.withColumn("__p", F.sum("__cy").over(w_x))
    g2 = g2.withColumn("__cxy", F.sum("__c").over(w_x))
    rmarg = cells.groupBy("__x").agg(F.sum("__c").cast("bigint").alias("__rt"))
    w_r = Window.orderBy(F.asc("__x")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rmarg = rmarg.withColumn("__rcum", F.sum("__rt").over(w_r))
    cmarg = cells.groupBy("__y").agg(F.sum("__c").cast("bigint").alias("__ct"))
    w_c = Window.orderBy(F.asc("__y")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cmarg = cmarg.withColumn("__ccum", F.sum("__ct").over(w_c))
    tot = cells.agg(F.sum("__c").cast("bigint").alias("__nt"))
    full = (
        g2.join(F.broadcast(rmarg), "__x")
        .join(F.broadcast(cmarg), "__y")
        .crossJoin(F.broadcast(tot))
    )
    se = (
        F.col("__nt") - F.col("__rcum") - F.col("__ccum") + F.col("__p")
    )
    sw = (F.col("__ccum") - F.col("__ct")) - (F.col("__p") - F.col("__cxy"))
    agg = full.agg(
        F.max("__nt").cast("bigint").alias("n"),
        F.coalesce(
            F.sum(F.col("__c").cast(_DEC) * se.cast(_DEC)), F.lit(0).cast(_DEC)
        ).alias("__cc"),
        F.coalesce(
            F.sum(F.col("__c").cast(_DEC) * sw.cast(_DEC)), F.lit(0).cast(_DEC)
        ).alias("__dd"),
    )
    tx = rmarg.agg(
        F.sum(F.col("__rt").cast(_DEC) * (F.col("__rt") - 1))
        .cast(_DEC)
        .alias("__t1"),
        F.count(F.lit(1)).cast("bigint").alias("__r"),
    )
    ty = cmarg.agg(
        F.sum(F.col("__ct").cast(_DEC) * (F.col("__ct") - 1))
        .cast(_DEC)
        .alias("__t2"),
        F.count(F.lit(1)).cast("bigint").alias("__c"),
    )
    return agg.crossJoin(F.broadcast(tx)).crossJoin(F.broadcast(ty))


def mood_scale_test(
    df: DataFrame,
    group_col: str,
    label_a: str,
    label_b: str,
    value_col: Column | str,
    *,
    sub_bucket: Column | None = None,
    scale: int = 1_000_000,
) -> DataFrame:
    """Mood's two-sample SCALE (dispersion) test (Mood, Ann. Math. Stat.
    1954) — the rank-based companion to q308/q328's variance-homogeneity
    F tests: scores grow quadratically with distance from the center of
    the pooled ranking, so a dispersion difference shifts the sample-a
    score sum even when the medians agree. (Distinct from Mood's MEDIAN
    test, q313, which is a location screen.)

    Tie handling keeps everything integral on the x4 lattice: with
    doubled midranks ``2*rbar = 2H - t + 1``, the per-observation score
    ``(rbar - (N+1)/2)^2`` is ``D^2/4`` with the exact integer
    ``D = 2H - t - N``. Then

        ``T4    = sum_v ta * D^2``          (4x the Mood statistic)
        ``St    = sum_v t * D^2``           (4x the total score sum)
        ``S4t   = sum_v t * D^4``           (16x the total score-square sum)
        ``num1  = N*T4 - n*St``             (4N x the centered statistic)
        ``K     = N*S4t - St^2``            (16N x the score variance sum)
        ``z = num1 * sqrt(N-1) / (sqrt(n*m) * sqrt(K))``

    — every pre-sqrt quantity an exact decimal(38,0) integer (== DuckDB
    HUGEINT), the z a single mirrored IEEE tree (sqrt is correctly
    rounded by IEEE-754). Magnitude contract: ``N*S4t <= N^6 < 1e38``
    holds to N ~ 2e6 pooled rows; beyond that the decimal cast fails
    loudly (ANSI), never silently — coarsen the value lattice upstream.

    Scale posture: rows collapse to the pooled distinct-value table
    map-side; cumulatives ride two_phase_running_sum; no all-pairs work.

    Output: one row — ``n_a, n_b, t4_stat, z_x1e6`` (z NULL when either
    sample is empty or K <= 0, i.e. a single pooled distinct value).
    """
    per_v = _two_sample_x(df, group_col, value_col, label_a, label_b, sub_bucket)
    nn = F.col("__n") + F.col("__m")
    d = (F.lit(2).cast(_DEC) * F.col("__h") - F.col("__t") - nn).cast(_DEC)
    s4 = (d * d).cast(_DEC)
    agg = per_v.agg(
        F.max("__n").alias("n_a"),
        F.max("__m").alias("n_b"),
        F.coalesce(F.sum(F.col("__ta").cast(_DEC) * s4), F.lit(0).cast(_DEC))
        .cast(_DEC)
        .alias("__t4"),
        F.coalesce(F.sum(F.col("__t").cast(_DEC) * s4), F.lit(0).cast(_DEC))
        .cast(_DEC)
        .alias("__st"),
        F.coalesce(
            F.sum(F.col("__t").cast(_DEC) * s4 * s4), F.lit(0).cast(_DEC)
        )
        .cast(_DEC)
        .alias("__s4t"),
    )
    nb = (F.col("n_a") + F.col("n_b")).cast(_DEC)
    num1 = (nb * F.col("__t4") - F.col("n_a").cast(_DEC) * F.col("__st")).cast(
        _DEC
    )
    k = (nb * F.col("__s4t") - F.col("__st") * F.col("__st")).cast(_DEC)
    z = (
        num1.cast("double")
        * F.sqrt((nb - F.lit(1).cast(_DEC)).cast("double"))
        / (
            F.sqrt((F.col("n_a").cast(_DEC) * F.col("n_b")).cast("double"))
            * F.sqrt(k.cast("double"))
        )
    )
    return agg.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("__t4").cast("bigint").alias("t4_stat"),
        F.when(
            F.col("n_a").isNull()
            | F.col("n_b").isNull()
            | (F.col("n_a") < 1)
            | (F.col("n_b") < 1)
            | (k <= F.lit(0).cast(_DEC)),
            F.lit(None).cast("bigint"),
        )
        .otherwise(
            F.floor(z * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
        )
        .alias("z_x1e6"),
    )


def kendall_w(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: Column | str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Kendall's coefficient of concordance W (Kendall & Babington
    Smith, Ann. Math. Stat. 1939) — the STANDARDIZED effect size for the
    randomized-block rank design :func:`friedman` tests: W in [0, 1]
    says HOW strongly the blocks (judges) agree on the treatment
    ordering, where Friedman's Q only says whether they agree at all
    (no-ties identity: Q = m(k-1)W — pinned by pytest).

    Tie-corrected form (Siegel & Castellan): with per-treatment doubled
    rank-sums ``R2_j`` (so ``dev2 = R2_j - m(k+1)`` is exact),
    ``S4 = sum_j dev2^2 = 4S``, and the per-block tie term
    ``T = sum_b sum_{tied groups} (t^3 - t)``,

        ``W = 12S / (m^2(k^3-k) - m*T)  =  3*S4 / (m^2(k^3-k) - m*T)``

    — numerator and denominator exact decimal(38,0) integers, ONE
    division, floor-published at 1e6 (NULL when the denominator <= 0:
    every block fully tied). Tied rows share a within-block dmid, so the
    tie groups are exactly the (block, dmid) multiplicities.

    Scale posture: identical to :func:`friedman` — the self-join fans
    out k-fold on the (block, treatment) cell table only.

    Output: one row — ``n_blocks, k_treatments, w_x1e6``.
    """
    ranked, kg = _block_doubled_midranks(
        df, block_col, treatment_col, value_col
    )
    ranked = ranked.transform(materialize_once)
    nrow = ranked.select("__b").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("__n")
    )
    per_j = (
        ranked.groupBy("__j")
        .agg(F.sum(F.col("__dmid").cast(_DEC)).cast(_DEC).alias("__r2j"))
        .crossJoin(F.broadcast(nrow))
        .crossJoin(F.broadcast(kg))
    )
    dev = F.col("__r2j") - F.col("__n").cast(_DEC) * (
        F.col("__k").cast(_DEC) + F.lit(1).cast(_DEC)
    )
    s = per_j.agg(
        F.max("__n").alias("n_blocks"),
        F.max("__k").alias("k_treatments"),
        F.sum(dev * dev).cast(_DEC).alias("__s4"),
    )
    ties = (
        ranked.groupBy("__b", "__dmid")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__t"))
        .agg(
            F.coalesce(
                F.sum(
                    F.col("__t").cast(_DEC) * F.col("__t") * F.col("__t")
                    - F.col("__t")
                ),
                F.lit(0).cast(_DEC),
            )
            .cast(_DEC)
            .alias("__tt")
        )
    )
    g = s.crossJoin(F.broadcast(ties))
    m = F.col("n_blocks").cast(_DEC)
    kd = F.col("k_treatments").cast(_DEC)
    den = (
        m * m * (kd * kd * kd - kd) - m * F.col("__tt")
    ).cast(_DEC)
    w = (
        F.lit(3.0)
        * F.col("__s4").cast("double")
        / den.cast("double")
    )
    return g.select(
        F.col("n_blocks").cast("bigint").alias("n_blocks"),
        F.col("k_treatments").cast("bigint").alias("k_treatments"),
        F.when(
            (F.col("n_blocks") < 1) | (den.cast("double") <= F.lit(0.0)),
            F.lit(None).cast("bigint"),
        )
        .otherwise(
            F.floor(w * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
        )
        .alias("w_x1e6"),
    )


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    label_a: str,
    label_b: str,
    value_col: Column | str,
    *,
    sub_bucket: Column | None = None,
    scale: int = 1_000_000,
) -> DataFrame:
    """Mann-Whitney U / Wilcoxon rank-sum test (Mann & Whitney, Ann.
    Math. Stat. 1947; Wilcoxon 1945) with the normal approximation and
    the standard tie correction — the unpaired two-sample location
    screen completing the family around :func:`wilcoxon_signed_rank`
    (paired) and :func:`mood_median` (k-group median); its point
    estimate U/(n*m) is the common-language effect size behind q309's
    Cliff's delta (delta = 2*U/(n*m) - 1).

    Tie handling stays integral in DOUBLED rank units: with inclusive
    pooled cumulative H and multiplicity t at value v, the doubled
    midrank is ``2*rbar = 2H - t + 1``, so

        ``2W  = sum_v ta * (2H - t + 1)``     (doubled a-rank-sum)
        ``2U  = 2W - n*(n+1)``
        ``num = 2U - n*m``                     (doubled centered U)
        ``K   = n*m*((N+1)*N*(N-1) - sum_v (t^3 - t))``
        ``z   = num * sqrt(3*N*(N-1)) / sqrt(K)``

    — every pre-sqrt quantity an exact DECIMAL(38,0) integer (== DuckDB
    HUGEINT), z ONE mirrored IEEE tree. Magnitude contract:
    ``K <= N^5 < 1e38`` holds to N ~ 4e7 pooled rows; beyond that the
    ANSI decimal cast fails loudly — coarsen upstream.

    Scale posture: rows collapse to the pooled distinct-value table
    map-side; cumulatives ride two_phase_running_sum; no all-pairs work.

    Output: one row — ``n_a, n_b, u2_stat, z_x1e6`` (z NULL when either
    sample is empty or K <= 0, i.e. a single pooled distinct value).
    """
    per_v = _two_sample_x(df, group_col, value_col, label_a, label_b, sub_bucket)
    two_r = (
        F.lit(2).cast(_DEC) * F.col("__h") - F.col("__t") + F.lit(1)
    ).cast(_DEC)
    t3 = (
        F.col("__t").cast(_DEC) * F.col("__t") * F.col("__t")
        - F.col("__t")
    ).cast(_DEC)
    agg = per_v.agg(
        F.max("__n").alias("n_a"),
        F.max("__m").alias("n_b"),
        F.coalesce(
            F.sum(F.col("__ta").cast(_DEC) * two_r), F.lit(0).cast(_DEC)
        ).alias("__w2"),
        F.coalesce(F.sum(t3), F.lit(0).cast(_DEC)).alias("__tie"),
    )
    n = F.col("n_a").cast(_DEC)
    m = F.col("n_b").cast(_DEC)
    nn = n + m
    u2 = F.col("__w2") - n * (n + F.lit(1))
    num = (u2 - n * m).cast(_DEC)
    k = (n * m * ((nn + 1) * nn * (nn - 1) - F.col("__tie"))).cast(_DEC)
    z = (
        num.cast("double")
        * F.sqrt(F.lit(3.0) * nn.cast("double") * (nn.cast("double") - 1.0))
        / F.sqrt(k.cast("double"))
    )
    return agg.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        u2.cast("bigint").alias("u2_stat"),
        F.when(
            F.col("n_a").isNull()
            | F.col("n_b").isNull()
            | (F.col("n_a") < 1)
            | (F.col("n_b") < 1)
            | (k <= F.lit(0).cast(_DEC)),
            F.lit(None).cast("bigint"),
        )
        .otherwise(
            F.floor(z * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
        )
        .alias("z_x1e6"),
    )


def kuiper_two_sample(
    df: DataFrame,
    group_col: str,
    label_a: str,
    label_b: str,
    value_col: Column | str,
    *,
    sub_bucket: Column | None = None,
    scale: int = 1_000_000,
) -> DataFrame:
    """Two-sample Kuiper statistic ``V = D+ + D-`` (Kuiper, Proc. KNAW
    1960) — the cyclic-sensitive / equal-tail-weight refinement of q231's
    Kolmogorov-Smirnov D: KS sees only the single largest signed ECDF
    gap, Kuiper adds the largest gap in the OTHER direction, making it
    sensitive to distributions that cross (e.g. a variance change with
    matched medians) and invariant to cyclic shifts of the value axis.

    With the shared exact integer ``X(v) = m*cum_a(v) - n*cum_b(v)``
    from :func:`_two_sample_x`:

        ``D+ = max(0, max_v X) / (n*m)``
        ``D- = max(0, -min_v X) / (n*m)``
        ``V  = D+ + D-``

    — maxima over exact integers (order-free), each published value ONE
    division, floor-published at 1e6.

    Output: one row — ``n_a, n_b, d_plus_x1e6, d_minus_x1e6, v_x1e6``
    (NULL when either sample is empty).
    """
    per_v = _two_sample_x(df, group_col, value_col, label_a, label_b, sub_bucket)
    agg = per_v.agg(
        F.max("__n").alias("n_a"),
        F.max("__m").alias("n_b"),
        F.coalesce(
            F.greatest(F.max("__x"), F.lit(0).cast(_DEC)),
            F.lit(0).cast(_DEC),
        ).alias("__dp"),
        F.coalesce(
            F.greatest(-F.min("__x"), F.lit(0).cast(_DEC)),
            F.lit(0).cast(_DEC),
        ).alias("__dm"),
    )
    nm = F.col("n_a").cast("double") * F.col("n_b").cast("double")
    bad = (
        F.col("n_a").isNull()
        | F.col("n_b").isNull()
        | (F.col("n_a") < 1)
        | (F.col("n_b") < 1)
    )
    pub = lambda c: F.floor(  # noqa: E731
        c.cast("double") / nm * F.lit(float(scale)) + F.lit(0.5)
    ).cast("bigint")
    return agg.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.when(bad, F.lit(None).cast("bigint"))
        .otherwise(pub(F.col("__dp")))
        .alias("d_plus_x1e6"),
        F.when(bad, F.lit(None).cast("bigint"))
        .otherwise(pub(F.col("__dm")))
        .alias("d_minus_x1e6"),
        F.when(bad, F.lit(None).cast("bigint"))
        .otherwise(pub(F.col("__dp") + F.col("__dm")))
        .alias("v_x1e6"),
    )


def quade(
    df: DataFrame,
    block_col: str,
    treatment_col: str,
    value_col: Column | str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Quade test (Quade, JASA 1979) for k treatments in b randomized
    blocks — Friedman's (q311) block-weighted refinement: blocks with a
    LARGER sample range carry proportionally more rank weight, which
    recovers power Friedman gives away when block-to-block scale varies
    (exactly the daily-traffic situation the event tables have).

    With within-block doubled midranks ``2r_ij``, block ranges
    ``R_i = max_j v_ij - min_j v_ij`` (exact integers on the summed
    cell values), across-block doubled range midranks ``2Q_i``, and

        ``s4_ij = (2Q_i) * (2r_ij - (k+1)) = 4 * Q_i*(r_ij - (k+1)/2)``

    every s4 is an exact integer even under ties, and Quade's
    ``T = (b-1)*B / (A-B)`` with ``A = sum s^2``,
    ``B = (1/b) * sum_j (sum_i s_ij)^2`` collapses (the 16s cancel) to

        ``T = (b-1) * Bsum / (b*A16 - Bsum)``

    with ``A16 = sum s4^2`` and ``Bsum = sum_j (sum_i s4_ij)^2`` both
    exact DECIMAL(38,0) — ONE final division, F(k-1, (b-1)(k-1)) under
    the null.  Complete blocks only (the friedman contract).

    Scale posture: the within-block self-join fans out k-fold on the
    (block, treatment) cell table (k is an analysis constant); range
    midranks ride :func:`~.sampling.two_phase_running_sum` over the
    distinct-range table — no all-pairs work on blocks.

    Output: one row — ``n_blocks, k_treatments, t_x1e6`` (NULL when
    b < 2 or the denominator b*A16 - Bsum <= 0, e.g. every block
    internally constant).
    """
    v = _as_bigint(value_col)
    base0 = df.filter(
        v.isNotNull()
        & F.col(block_col).isNotNull()
        & F.col(treatment_col).isNotNull()
    ).select(
        F.col(block_col).alias("__b"),
        F.col(treatment_col).alias("__j"),
        v.alias("__v0"),
    )
    cell = base0.groupBy("__b", "__j").agg(
        F.sum("__v0").cast("bigint").alias("__v")
    )
    kg = cell.agg(
        F.countDistinct("__j").cast("bigint").alias("__k")
    )
    per_b = cell.groupBy("__b").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c"),
        F.max("__v").cast("bigint").alias("__vmax"),
        F.min("__v").cast("bigint").alias("__vmin"),
    )
    complete = (
        per_b.crossJoin(F.broadcast(kg))
        .filter(F.col("__c") == F.col("__k"))
        .select("__b", (F.col("__vmax") - F.col("__vmin")).alias("__rng"))
    )
    rws = cell.join(complete.select("__b"), "__b")
    ranked = (
        rws.alias("a")
        .join(rws.alias("x"), F.col("a.__b") == F.col("x.__b"))
        .groupBy(F.col("a.__b").alias("__b"), F.col("a.__j").alias("__j"))
        .agg(
            (
                F.lit(2)
                * F.sum(
                    F.when(F.col("x.__v") < F.col("a.__v"), 1).otherwise(0)
                )
                + F.sum(
                    F.when(F.col("x.__v") == F.col("a.__v"), 1).otherwise(0)
                )
                + F.lit(1)
            )
            .cast("bigint")
            .alias("__dmid")
        )
    )
    rgv = complete.groupBy("__rng").agg(
        F.count(F.lit(1)).cast("bigint").alias("__t")
    )
    run = two_phase_running_sum(
        rgv,
        [],
        [F.asc("__rng")],
        F.col("__t"),
        F.expr("__rng div 65536"),
        out_col="__ci",
    )
    dmidq = (
        F.lit(2) * (F.col("__ci") - F.col("__t")) + F.col("__t") + F.lit(1)
    ).cast("bigint")
    qb = complete.join(
        run.select("__rng", dmidq.alias("__dmidq")), "__rng"
    ).select("__b", "__dmidq")
    s4 = (
        F.col("__dmidq").cast(_DEC)
        * (F.col("__dmid").cast(_DEC) - (F.col("__k") + F.lit(1)))
    ).cast(_DEC)
    tagged = (
        ranked.join(qb, "__b")
        .crossJoin(F.broadcast(kg))
        .select("__b", "__j", s4.alias("__s4"))
    )
    perj = tagged.groupBy("__j").agg(
        F.sum("__s4").cast(_DEC).alias("__b4j")
    )
    a16 = tagged.agg(
        F.countDistinct("__b").cast("bigint").alias("n_blocks"),
        F.coalesce(F.sum((F.col("__s4") * F.col("__s4")).cast(_DEC)),
                   F.lit(0).cast(_DEC)).alias("__a16"),
    )
    bsum = perj.agg(
        F.coalesce(
            F.sum((F.col("__b4j") * F.col("__b4j")).cast(_DEC)),
            F.lit(0).cast(_DEC),
        ).alias("__bsum")
    )
    out = a16.crossJoin(F.broadcast(bsum)).crossJoin(F.broadcast(kg))
    b = F.col("n_blocks").cast(_DEC)
    den = (b * F.col("__a16") - F.col("__bsum")).cast(_DEC)
    t = (
        (b - F.lit(1)).cast("double")
        * F.col("__bsum").cast("double")
        / den.cast("double")
    )
    return out.select(
        F.coalesce(F.col("n_blocks"), F.lit(0))
        .cast("bigint")
        .alias("n_blocks"),
        F.col("__k").cast("bigint").alias("k_treatments"),
        F.when(
            F.col("n_blocks").isNull()
            | (F.col("n_blocks") < 2)
            | (den <= F.lit(0).cast(_DEC)),
            F.lit(None).cast("bigint"),
        )
        .otherwise(
            F.floor(t * F.lit(float(scale)) + F.lit(0.5)).cast("bigint")
        )
        .alias("t_x1e6"),
    )


_AB_GRID = 1_000_000


def ansari_bradley(
    df: DataFrame,
    group_col: str,
    label_a: str,
    label_b: str,
    value_col: Column | str,
    *,
    sub_bucket: Column | None = None,
    scale: int = 1_000_000,
) -> DataFrame:
    """Ansari-Bradley two-sample dispersion test (Ansari & Bradley,
    Ann. Math. Stat. 1960) with exact tie handling: scores
    ``s(R) = min(R, N+1-R)`` grow toward the CENTER of the pooled
    ranking, so a more dispersed sample collects a smaller score sum —
    the center-out companion to q333's Mood scale test (whose scores
    grow quadratically outward; AB is the classical linear-score
    alternative, less tail-dominated).

    Tie blocks are handled exactly: a block occupying ranks
    ``l = H-t+1 .. H`` contributes the closed-form doubled integer

        ``S2 = (a+b)(b-a+1)  [ranks below the fold k = (N+1) div 2]
             + 2(N+1)(d-c+1) - (c+d)(d-c+1)  [ranks above]``

    (each piece an arithmetic series — exact even when the block
    STRADDLES the center, where the midrank-of-score shortcut is
    wrong).  Per-value divisions by t are plain integer floor divisions
    — identical truncation on both engines (< 1 doubled-score unit per
    distinct value, negligible against Var ~ N^3/48), and the division
    results stay within int64 (Spark's ``div`` returns LONG):

        ``A2  = sum_v (ta * S2) div t``      (~ 2*A)
        ``St2 = sum_v S2``                    (= 2 * sum s)
        ``SQ4 = sum_v (S2^2) div t``          (~ 4*sum s^2)
        ``z = (A2 - n*St2/N)
              / sqrt(n*m*(N*SQ4 - St2^2) / (N^2 (N-1)))``

    — ONE mirrored IEEE tree over exact scalars.  Magnitude contract:
    ``S2^2 div t <= t*N^2`` must fit int64 — pooled N up to ~2e6 at
    full tie density; ANSI fails loudly beyond (coarsen upstream).

    Output: one row — ``n_a, n_b, ab2_stat (~ 2A, floor-div lattice),
    z_x1e6`` (NULL when either sample is empty or the score variance
    is <= 0).
    """
    per_v = _two_sample_x(df, group_col, value_col, label_a, label_b, sub_bucket)
    nn = (F.col("__n") + F.col("__m")).cast(_DEC)
    h = F.col("__h").cast(_DEC)
    t = F.col("__t").cast(_DEC)
    l = h - t + F.lit(1)
    k = F.expr(
        "CAST((CAST(__n AS DECIMAL(38,0)) + __m + 1) AS DECIMAL(38,0))"
        " div 2"
    ).cast(_DEC)
    b_top = F.least(h, k)
    c_lo = F.greatest(l, k + F.lit(1))
    t1 = F.when(
        l <= b_top,
        ((l + b_top) * (b_top - l + F.lit(1))).cast(_DEC),
    ).otherwise(F.lit(0).cast(_DEC))
    t2 = F.when(
        c_lo <= h,
        (
            F.lit(2).cast(_DEC) * (nn + F.lit(1)) * (h - c_lo + F.lit(1))
            - (c_lo + h) * (h - c_lo + F.lit(1))
        ).cast(_DEC),
    ).otherwise(F.lit(0).cast(_DEC))
    s2 = (t1 + t2).cast(_DEC)
    a_term = F.expr("CAST(__ta AS DECIMAL(38,0))") * s2
    agg = per_v.select(
        "__t",
        "__ta",
        "__n",
        "__m",
        s2.alias("__s2"),
        (a_term.cast(_DEC)).alias("__an"),
    ).agg(
        F.max("__n").alias("n_a"),
        F.max("__m").alias("n_b"),
        F.coalesce(
            F.sum(
                F.expr("__an div CAST(__t AS DECIMAL(38,0))").cast(_DEC)
            ),
            F.lit(0).cast(_DEC),
        )
        .cast(_DEC)
        .alias("__a2g"),
        F.coalesce(F.sum("__s2"), F.lit(0).cast(_DEC))
        .cast(_DEC)
        .alias("__st2"),
        F.coalesce(
            F.sum(
                F.expr(
                    "(CAST(__s2 AS DECIMAL(38,0)) * __s2)"
                    " div CAST(__t AS DECIMAL(38,0))"
                ).cast(_DEC)
            ),
            F.lit(0).cast(_DEC),
        )
        .cast(_DEC)
        .alias("__sq4g"),
    )
    n = F.col("n_a").cast("double")
    m = F.col("n_b").cast("double")
    nd = n + m
    a2 = F.col("__a2g").cast("double")
    st2 = F.col("__st2").cast("double")
    sq4 = F.col("__sq4g").cast("double")
    num = a2 - n * st2 / nd
    varr = (
        n * m * (nd * sq4 - st2 * st2) / (nd * nd * (nd - F.lit(1.0)))
    )
    bad0 = (
        F.col("n_a").isNull()
        | F.col("n_b").isNull()
        | (F.col("n_a") < 1)
        | (F.col("n_b") < 1)
    )
    return agg.select(
        F.coalesce(F.col("n_a"), F.lit(0)).cast("bigint").alias("n_a"),
        F.coalesce(F.col("n_b"), F.lit(0)).cast("bigint").alias("n_b"),
        F.col("__a2g").cast("bigint").alias("ab2_stat"),
        F.when(bad0, F.lit(None).cast("bigint"))
        .otherwise(
            F.when(
                varr <= F.lit(0.0), F.lit(None).cast("bigint")
            ).otherwise(
                F.floor(
                    num / F.sqrt(varr) * F.lit(float(scale)) + F.lit(0.5)
                ).cast("bigint")
            )
        )
        .alias("z_x1e6"),
    )
