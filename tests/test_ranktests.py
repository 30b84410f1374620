"""Unit tests for ops.ranktests (Wilcoxon signed-rank, Friedman,
Jonckheere-Terpstra, Mood's median, CvM, Anderson-Darling, Kendall
tau-b): pure-Python / brute-force twins on micro-fixtures pin the
semantics; driver-scale parity against DuckDB lives in
tools/parity_check.py (q310-q316)."""

import itertools
import math
from collections import Counter

from pyspark.sql import Row
from pyspark.sql import functions as F

from manufacturing_data_integration_tool_spark.ops.ranktests import (
    ad_two_sample,
    cvm_two_sample,
    friedman,
    jonckheere_terpstra,
    kendall_tau_b_binned,
    mood_median,
    wilcoxon_signed_rank,
)


def _avg_ranks(vals):
    sv = sorted(vals)
    rank = {}
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        rank[sv[i]] = (i + 1 + j) / 2.0
        i = j
    return rank


def test_wilcoxon_matches_textbook_twin(spark):
    """Paired diffs with ties and zeros: z recomputed with average ranks
    and the tie-corrected normal approximation must match the doubled-
    rank integer pipeline exactly (one shared IEEE tree)."""
    diffs = [3, -1, 2, 2, 0, -4, 5, 2, -2, 6, 1, 0, -3, 7]
    df = spark.createDataFrame([Row(d=d) for d in diffs])
    out = wilcoxon_signed_rank(df, "d").collect()[0]

    nz = [d for d in diffs if d != 0]
    n = len(nz)
    rank = _avg_ranks([abs(d) for d in nz])
    wp = sum(rank[abs(d)] for d in nz if d > 0)
    cnt = Counter(abs(d) for d in nz)
    tie3 = sum(t**3 - t for t in cnt.values())
    sigma = math.sqrt(n * (n + 1) * (2 * n + 1) / 24.0 - tie3 / 48.0)
    z = (wp - n * (n + 1) / 4.0) / sigma
    assert out["n_pairs"] == n
    assert out["n_pos"] == sum(1 for d in nz if d > 0)
    assert out["n_neg"] == sum(1 for d in nz if d < 0)
    assert out["w2_plus"] == round(2 * wp)
    assert abs(out["z_x1e6"] - math.floor(z * 1e6 + 0.5)) <= 1


def test_wilcoxon_empty_after_zero_drop_is_null(spark):
    df = spark.createDataFrame([Row(d=0), Row(d=0)])
    out = wilcoxon_signed_rank(df, "d").collect()[0]
    assert out["n_pairs"] == 0 and out["z_x1e6"] is None


def test_friedman_matches_conover_twin(spark):
    """3 treatments x 5 blocks with within-block ties, plus one
    INCOMPLETE block that must be excluded: Q recomputed with the
    tie-general Conover formula on average ranks must match."""
    data = {  # block -> {treatment: value}
        1: {"a": 10, "b": 12, "c": 15},
        2: {"a": 7, "b": 7, "c": 9},
        3: {"a": 20, "b": 18, "c": 18},
        4: {"a": 5, "b": 6, "c": 8},
        5: {"a": 11, "b": 11, "c": 11},
        6: {"a": 99},  # incomplete -> dropped
    }
    rows = [
        Row(b=b, j=j, v=v) for b, tv in data.items() for j, v in tv.items()
    ]
    out = friedman(
        spark.createDataFrame(rows), "b", "j", "v"
    ).collect()[0]

    k = 3
    blocks = {b: tv for b, tv in data.items() if len(tv) == k}
    nb = len(blocks)
    a1 = 0.0
    rj = Counter()
    for tv in blocks.values():
        rank = _avg_ranks(list(tv.values()))
        for j, v in tv.items():
            r = rank[v]
            rj[j] += r
            a1 += r * r
    c1 = nb * k * (k + 1) ** 2 / 4.0
    s = sum((r - nb * (k + 1) / 2.0) ** 2 for r in rj.values())
    q = (k - 1) * s / (a1 - c1)
    assert out["n_blocks"] == nb and out["k_treatments"] == k
    assert abs(out["q_x1e6"] - math.floor(q * 1e6 + 0.5)) <= 1


def test_friedman_all_blocks_fully_tied_is_null(spark):
    rows = [
        Row(b=b, j=j, v=5) for b in (1, 2, 3) for j in ("a", "b", "c")
    ]
    out = friedman(
        spark.createDataFrame(rows), "b", "j", "v"
    ).collect()[0]
    assert out["q_x1e6"] is None


def _jt_brute(groups):
    """Brute-force J (ties count half) + H&W tie-corrected z."""
    keys = sorted(groups)
    j_stat = 0.0
    for a, b in itertools.combinations(keys, 2):
        for x in groups[a]:
            for y in groups[b]:
                j_stat += 1.0 if x < y else (0.5 if x == y else 0.0)
    allv = [v for k in keys for v in groups[k]]
    n = len(allv)
    njs = [len(groups[k]) for k in keys]
    cnt = Counter(allv)
    ej = (n * n - sum(m * m for m in njs)) / 4.0
    a_t = (
        n * (n - 1) * (2 * n + 5)
        - sum(m * (m - 1) * (2 * m + 5) for m in njs)
        - sum(t * (t - 1) * (2 * t + 5) for t in cnt.values())
    )
    b_t = sum(m * (m - 1) * (m - 2) for m in njs) * sum(
        t * (t - 1) * (t - 2) for t in cnt.values()
    )
    c_t = sum(m * (m - 1) for m in njs) * sum(
        t * (t - 1) for t in cnt.values()
    )
    var = (
        a_t / 72.0
        + b_t / (36.0 * n * (n - 1) * (n - 2))
        + c_t / (8.0 * n * (n - 1))
    )
    z = (j_stat - ej) / math.sqrt(var)
    return j_stat, z


def test_jonckheere_matches_brute_force(spark):
    """Ordered groups with cross-group ties: J (doubled) and the
    tie-corrected z must match an O(n^2) pair-counting twin. The
    variance formula itself is pinned by a permutation test in the
    module's development history (mean exact, var within MC error)."""
    groups = {
        1: [40, 35, 38, 43, 44, 41],
        2: [38, 40, 47, 44, 40, 42],
        3: [48, 40, 45, 43, 46, 44],
    }
    rows = [Row(g=g, v=v) for g, vs in groups.items() for v in vs]
    out = jonckheere_terpstra(
        spark.createDataFrame(rows), "g", "v"
    ).collect()[0]
    j_stat, z = _jt_brute(groups)
    assert out["n_total"] == 18 and out["n_groups"] == 3
    assert out["j2"] == round(2 * j_stat)
    assert abs(out["z_x1e6"] - math.floor(z * 1e6 + 0.5)) <= 1


def test_jonckheere_single_group_is_null(spark):
    rows = [Row(g=1, v=v) for v in (1, 2, 3)]
    out = jonckheere_terpstra(
        spark.createDataFrame(rows), "g", "v"
    ).collect()[0]
    assert out["n_groups"] == 1 and out["z_x1e6"] is None


def test_mood_median_matches_contingency_twin(spark):
    """Grand LOWER median (2*cum >= N) and the k x 2 chi-square must
    match a direct contingency computation."""
    data = {"a": [1, 2, 3, 4, 10], "b": [5, 6, 7, 8, 9]}
    rows = [Row(g=g, v=v) for g, vs in data.items() for v in vs]
    out = mood_median(spark.createDataFrame(rows), "g", "v").collect()[0]

    allv = sorted(v for vs in data.values() for v in vs)
    n = len(allv)
    med = allv[(n + 1) // 2 - 1]  # lower median: rank ceil(n/2)
    assert out["grand_median"] == med
    obs = {}
    for g, vs in data.items():
        above = sum(1 for v in vs if v > med)
        obs[(g, "above")] = above
        obs[(g, "not_above")] = len(vs) - above
    rtot = {g: len(vs) for g, vs in data.items()}
    ctot = Counter()
    for (g, side), o in obs.items():
        ctot[side] += o
    chi2 = sum(
        (o * n - rtot[g] * ctot[side]) ** 2 / (n * rtot[g] * ctot[side])
        for (g, side), o in obs.items()
        if ctot[side] > 0
    )
    assert out["n"] == n and out["n_groups"] == 2 and out["dof"] == 1
    assert abs(out["chi2"] - round(chi2, 6)) <= 2e-6


def test_cvm_matches_ecdf_twin_and_rank_identity(spark):
    """No-ties fixture: the ECDF-sum form must equal Anderson's rank
    identity T = U/(nm*N) - (4nm-1)/(6N); with ties, the ECDF twin."""
    a = [1, 4, 6, 9, 12]
    b = [2, 3, 7, 11, 15, 18]
    rows = [Row(g="A", v=v) for v in a] + [Row(g="B", v=v) for v in b]
    out = cvm_two_sample(
        spark.createDataFrame(rows), "g", "A", "B", "v"
    ).collect()[0]
    n, m = len(a), len(b)
    pooled = sorted(a + b)
    fa = [sum(1 for x in a if x <= z) / n for z in pooled]
    gb = [sum(1 for x in b if x <= z) / m for z in pooled]
    t_ecdf = n * m / (n + m) ** 2 * sum((f - g) ** 2 for f, g in zip(fa, gb))
    assert out["n_a"] == n and out["n_b"] == m
    assert abs(out["t_x1e6"] - math.floor(t_ecdf * 1e6 + 0.5)) <= 1
    # Anderson (1962) rank identity (valid without ties)
    ranks_a = [pooled.index(x) + 1 for x in sorted(a)]
    ranks_b = [pooled.index(x) + 1 for x in sorted(b)]
    u = n * sum((r - i - 1) ** 2 for i, r in enumerate(ranks_a)) + m * sum(
        (r - i - 1) ** 2 for i, r in enumerate(ranks_b)
    )
    t_rank = u / (n * m * (n + m)) - (4 * n * m - 1) / (6 * (n + m))
    assert abs(t_ecdf - t_rank) < 1e-12


def test_ad_matches_pettitt_rank_form(spark):
    """No-ties fixture: the distinct-value lattice form must equal
    Pettitt's order-statistic form A2 = (1/nm) sum_i (N*M_i - n*i)^2
    / (i*(N-i)); the operator's per-term 1e6-lattice floors keep it
    within the declared truncation bound."""
    a = [3, 8, 14, 21, 27]
    b = [1, 6, 11, 17, 24, 30, 33]
    rows = [Row(g="A", v=v) for v in a] + [Row(g="B", v=v) for v in b]
    out = ad_two_sample(
        spark.createDataFrame(rows), "g", "A", "B", "v"
    ).collect()[0]
    n, m = len(a), len(b)
    nn = n + m
    pooled = sorted(a + b)
    a2 = 0.0
    for i in range(1, nn):  # i = 1..N-1
        mi = sum(1 for x in a if x <= pooled[i - 1])
        a2 += (nn * mi - n * i) ** 2 / (i * (nn - i))
    a2 /= n * m
    assert out["n_a"] == n and out["n_b"] == m
    # 11 pooled terms, each floored on the 1e6 lattice -> bounded drift
    assert abs(out["a2_x1e6"] - math.floor(a2 * 1e6 + 0.5)) <= 12


def test_kendall_tau_b_matches_pairwise_brute(spark):
    """Grid data with heavy ties on both axes: C, D, tau-b and gamma
    must match the O(n^2) sign-pair twin."""
    xy = [
        (1, 1), (1, 2), (2, 1), (2, 2), (2, 3), (3, 1),
        (3, 3), (3, 3), (4, 2), (4, 4), (5, 4), (5, 5), (1, 5),
    ]
    rows = [Row(x=x, y=y) for x, y in xy]
    out = kendall_tau_b_binned(
        spark.createDataFrame(rows), "x", "y"
    ).collect()[0]
    c = d = 0
    for (x1, y1), (x2, y2) in itertools.combinations(xy, 2):
        s = (x1 - x2) * (y1 - y2)
        if s > 0:
            c += 1
        elif s < 0:
            d += 1
    n = len(xy)
    tx = Counter(x for x, _ in xy)
    ty = Counter(y for _, y in xy)
    n0 = n * (n - 1) / 2.0
    n1 = sum(t * (t - 1) / 2.0 for t in tx.values())
    n2 = sum(t * (t - 1) / 2.0 for t in ty.values())
    tau = (c - d) / math.sqrt((n0 - n1) * (n0 - n2))
    gamma = (c - d) / (c + d)
    assert out["n"] == n
    assert out["n_conc"] == c and out["n_disc"] == d
    assert abs(out["tau_b_x1e6"] - math.floor(tau * 1e6 + 0.5)) <= 1
    assert abs(out["gamma_x1e6"] - math.floor(gamma * 1e6 + 0.5)) <= 1


def test_kendall_constant_axis_is_null_tau(spark):
    rows = [Row(x=1, y=i) for i in range(5)]
    out = kendall_tau_b_binned(
        spark.createDataFrame(rows), "x", "y"
    ).collect()[0]
    assert out["tau_b_x1e6"] is None and out["gamma_x1e6"] is None


def test_page_trend_matches_textbook_twin(spark):
    """4 blocks x 3 ordered treatments with one tie and one incomplete
    block: L and z recomputed with average ranks and the classical Page
    moments must match the doubled-rank integer pipeline."""
    from manufacturing_data_integration_tool_spark.ops.ranktests import (
        page_trend,
    )

    data = {  # block -> {treatment(int-ordered): value}
        1: {1: 3, 2: 5, 3: 9},
        2: {1: 4, 2: 4, 3: 7},   # tie within block
        3: {1: 10, 2: 12, 3: 11},
        4: {1: 1, 2: 6, 3: 8},
        5: {1: 99},              # incomplete -> dropped
    }
    rows = [
        Row(b=b, j=j, v=v) for b, tv in data.items() for j, v in tv.items()
    ]
    out = page_trend(
        spark.createDataFrame(rows), "b", "j", "v"
    ).collect()[0]

    k = 3
    blocks = {b: tv for b, tv in data.items() if len(tv) == k}
    n = len(blocks)
    l_stat = 0.0
    for tv in blocks.values():
        rank = _avg_ranks(list(tv.values()))
        for j, v in tv.items():
            l_stat += j * rank[v]  # c_j = dense rank of j = j here
    e_l = n * k * (k + 1) ** 2 / 4.0
    var_l = n * k * k * (k + 1) * (k * k - 1) / 144.0
    z = (l_stat - e_l) / math.sqrt(var_l)
    assert out["n_blocks"] == n and out["k_treatments"] == k
    assert out["l2"] == round(2 * l_stat)
    assert abs(out["z_x1e6"] - math.floor(z * 1e6 + 0.5)) <= 1


def test_page_trend_perfect_monotone_is_max(spark):
    """Perfectly increasing treatments in every block: L hits its
    maximum n*sum(j*j) and z is positive."""
    from manufacturing_data_integration_tool_spark.ops.ranktests import (
        page_trend,
    )

    rows = [
        Row(b=b, j=j, v=10 * j) for b in (1, 2, 3) for j in (1, 2, 3, 4)
    ]
    out = page_trend(
        spark.createDataFrame(rows), "b", "j", "v"
    ).collect()[0]
    # max L = n * sum j*j = 3 * 30 = 90 -> L2 = 180
    assert out["l2"] == 180
    assert out["z_x1e6"] > 0


def test_randomized_differential_rank_tests(spark):
    """Randomized (fixed-seed) differential check: Wilcoxon, JT, and
    tau-b against their O(n^2) brute twins over several draws with
    heavy ties — the property-style net under the single-fixture
    tests."""
    import random

    rng = random.Random(20260815)
    for trial in range(3):
        # Wilcoxon
        diffs = [rng.randint(-4, 4) for _ in range(25)]
        nz = [d for d in diffs if d != 0]
        if nz:
            out = wilcoxon_signed_rank(
                spark.createDataFrame([Row(d=d) for d in diffs]), "d"
            ).collect()[0]
            rank = _avg_ranks([abs(d) for d in nz])
            wp = sum(rank[abs(d)] for d in nz if d > 0)
            cnt = Counter(abs(d) for d in nz)
            n = len(nz)
            tie3 = sum(t**3 - t for t in cnt.values())
            var = n * (n + 1) * (2 * n + 1) / 24.0 - tie3 / 48.0
            assert out["w2_plus"] == round(2 * wp), (trial, diffs)
            if var > 0:
                z = (wp - n * (n + 1) / 4.0) / math.sqrt(var)
                assert abs(out["z_x1e6"] - math.floor(z * 1e6 + 0.5)) <= 1

        # Jonckheere-Terpstra
        groups = {
            g: [rng.randint(0, 9) for _ in range(rng.randint(3, 7))]
            for g in (1, 2, 3, 4)
        }
        rows = [Row(g=g, v=v) for g, vs in groups.items() for v in vs]
        out = jonckheere_terpstra(
            spark.createDataFrame(rows), "g", "v"
        ).collect()[0]
        j_stat, z = _jt_brute(groups)
        assert out["j2"] == round(2 * j_stat), (trial, groups)
        assert abs(out["z_x1e6"] - math.floor(z * 1e6 + 0.5)) <= 1

        # Kendall tau-b on a tight tied grid
        xy = [
            (rng.randint(1, 4), rng.randint(1, 3)) for _ in range(30)
        ]
        out = kendall_tau_b_binned(
            spark.createDataFrame([Row(x=x, y=y) for x, y in xy]), "x", "y"
        ).collect()[0]
        c = d = 0
        for (x1, y1), (x2, y2) in itertools.combinations(xy, 2):
            s = (x1 - x2) * (y1 - y2)
            c += 1 if s > 0 else 0
            d += 1 if s < 0 else 0
        assert out["n_conc"] == c and out["n_disc"] == d, (trial, xy)


def test_cvm_ad_degenerate_inputs_match_oracle_row_shape(spark):
    """r8 advisor note: the q314/q315 oracles used to aggregate with
    GROUP BY, which returns 0 rows on empty/degenerate input while the
    Spark side's global .agg() always emits 1 row. Both engines must now
    emit exactly one row and identical values on (a) empty input and
    (b) a single pooled distinct value (the AD H < N filter removes
    every row)."""
    import duckdb

    import __spark_entry__ as entry

    oracles = entry.oracle_sql()

    def duck(sql, lineitem_rows, documents_rows):
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE lineitem (l_returnflag VARCHAR, l_quantity DOUBLE)"
        )
        con.executemany(
            "INSERT INTO lineitem VALUES (?, ?)", lineitem_rows
        ) if lineitem_rows else None
        con.execute("CREATE TABLE documents (lang VARCHAR, n_chars BIGINT)")
        con.executemany(
            "INSERT INTO documents VALUES (?, ?)", documents_rows
        ) if documents_rows else None
        return con.execute(sql).fetchall()

    # (a) empty input
    empty_li = spark.createDataFrame(
        [], "l_returnflag string, l_quantity double"
    )
    empty_doc = spark.createDataFrame([], "lang string, n_chars bigint")
    s_cvm = cvm_two_sample(
        empty_li.select(
            F.when(F.col("l_returnflag") == "R", "a").otherwise("b").alias("g"),
            F.col("l_quantity").cast("bigint").alias("v"),
        ),
        "g", "a", "b", "v",
    ).collect()
    d_cvm = duck(oracles["q314_cvm_quantity_drift"], [], [])
    assert len(s_cvm) == 1 and len(d_cvm) == 1
    assert tuple(s_cvm[0]) == d_cvm[0] == (None, None, None)

    s_ad = ad_two_sample(
        empty_doc.select(
            F.when(F.col("lang") == "en", "a").otherwise("b").alias("g"),
            F.col("n_chars").alias("v"),
        ),
        "g", "a", "b", "v",
    ).collect()
    d_ad = duck(oracles["q315_ad_lang_tails"], [], [])
    assert len(s_ad) == 1 and len(d_ad) == 1
    assert tuple(s_ad[0]) == d_ad[0] == (None, None, None)

    # (b) single pooled distinct value: AD's H < N filter drops every
    # row -> n_a/n_b NULL on both engines; CvM keeps the row (X = 0
    # everywhere -> t = 0)
    li_rows = [("R", 5.0)] * 3 + [("A", 5.0)] * 2
    doc_rows = [("en", 7)] * 3 + [("zh", 7)] * 2
    one_li = spark.createDataFrame(
        li_rows, "l_returnflag string, l_quantity double"
    )
    one_doc = spark.createDataFrame(doc_rows, "lang string, n_chars bigint")
    s_cvm = cvm_two_sample(
        one_li.select(
            F.when(F.col("l_returnflag") == "R", "a").otherwise("b").alias("g"),
            F.col("l_quantity").cast("bigint").alias("v"),
        ),
        "g", "a", "b", "v",
    ).collect()
    d_cvm = duck(oracles["q314_cvm_quantity_drift"], li_rows, [])
    assert len(s_cvm) == 1 and len(d_cvm) == 1
    assert tuple(s_cvm[0]) == d_cvm[0]

    s_ad = ad_two_sample(
        one_doc.select(
            F.when(F.col("lang") == "en", "a").otherwise("b").alias("g"),
            F.col("n_chars").alias("v"),
        ),
        "g", "a", "b", "v",
    ).collect()
    d_ad = duck(oracles["q315_ad_lang_tails"], doc_rows, [])
    assert len(s_ad) == 1 and len(d_ad) == 1
    assert tuple(s_ad[0]) == d_ad[0] == (None, None, None)


def test_mood_scale_matches_score_twin(spark):
    """Mood scale z recomputed from textbook per-observation scores
    (r - (N+1)/2)^2 with average midranks must match the x4-lattice
    two-phase pipeline."""
    a = [1, 4, 4, 9, 12, 30, 2]
    b = [5, 5, 6, 7, 8, 8]
    rows = [Row(g="A", v=v) for v in a] + [Row(g="B", v=v) for v in b]
    from manufacturing_data_integration_tool_spark.ops.ranktests import (
        mood_scale_test,
    )

    out = mood_scale_test(
        spark.createDataFrame(rows), "g", "A", "B", "v"
    ).collect()[0]
    n, m = len(a), len(b)
    nn = n + m
    pooled = sorted(a + b)
    rank = _avg_ranks(pooled)
    score = lambda v: (rank[v] - (nn + 1) / 2.0) ** 2
    t_stat = sum(score(v) for v in a)
    all_scores = [score(v) for v in pooled]
    abar = sum(all_scores) / nn
    var = (
        n * m / (nn * (nn - 1.0)) * sum((s - abar) ** 2 for s in all_scores)
    )
    z = (t_stat - n * abar) / math.sqrt(var)
    assert out["n_a"] == n and out["n_b"] == m
    assert out["t4_stat"] == round(4 * t_stat)
    assert abs(out["z_x1e6"] - math.floor(z * 1e6 + 0.5)) <= 1


def test_mood_scale_single_value_is_null(spark):
    from manufacturing_data_integration_tool_spark.ops.ranktests import (
        mood_scale_test,
    )

    rows = [Row(g="A", v=7)] * 3 + [Row(g="B", v=7)] * 2
    out = mood_scale_test(
        spark.createDataFrame(rows), "g", "A", "B", "v"
    ).collect()[0]
    assert out["z_x1e6"] is None


def test_kendall_w_friedman_identity_and_ties(spark):
    """No ties: Q = m(k-1)W must hold exactly between the two operators;
    perfect agreement across blocks gives W = 1; a tied fixture matches
    the Siegel-Castellan tie-corrected twin."""
    from manufacturing_data_integration_tool_spark.ops.ranktests import (
        friedman,
        kendall_w,
    )

    # perfect agreement, no ties -> W = 1
    rows = [
        Row(b=f"b{i}", j=f"t{jj}", v=jj * 10 + i) for i in range(4)
        for jj in range(1, 4)
    ]
    df = spark.createDataFrame(rows)
    w = kendall_w(df, "b", "j", "v").collect()[0]
    assert w["n_blocks"] == 4 and w["k_treatments"] == 3
    assert w["w_x1e6"] == 1_000_000
    q = friedman(df, "b", "j", "v").collect()[0]
    m, k = 4, 3
    assert abs(q["q_x1e6"] - m * (k - 1) * w["w_x1e6"]) <= m * (k - 1)

    # tied fixture vs the textbook tie-corrected W
    vals = {
        ("b1", "t1"): 5, ("b1", "t2"): 5, ("b1", "t3"): 9,
        ("b2", "t1"): 1, ("b2", "t2"): 7, ("b2", "t3"): 7,
        ("b3", "t1"): 3, ("b3", "t2"): 8, ("b3", "t3"): 4,
    }
    df2 = spark.createDataFrame(
        [Row(b=b, j=j, v=v) for (b, j), v in vals.items()]
    )
    out = kendall_w(df2, "b", "j", "v").collect()[0]
    blocks = ["b1", "b2", "b3"]
    treats = ["t1", "t2", "t3"]
    rsum = dict.fromkeys(treats, 0.0)
    tt = 0.0
    for b in blocks:
        r = _avg_ranks([vals[(b, j)] for j in treats])
        from collections import Counter as _C

        cnt = _C(vals[(b, j)] for j in treats)
        tt += sum(t**3 - t for t in cnt.values())
        for j in treats:
            rsum[j] += r[vals[(b, j)]]
    m, k = 3, 3
    s = sum((rsum[j] - m * (k + 1) / 2.0) ** 2 for j in treats)
    w_ref = 12 * s / (m * m * (k**3 - k) - m * tt)
    assert abs(out["w_x1e6"] - math.floor(w_ref * 1e6 + 0.5)) <= 1


def test_ordinal_association_matches_pairwise_brute(spark):
    """Somers' D (both directions) and Stuart's tau-c on a rectangular
    tied grid must match the O(n^2) sign-pair twin."""
    import random

    from manufacturing_data_integration_tool_spark.ops.ranktests import (
        ordinal_association_binned,
    )

    rng = random.Random(7)
    xy = [(rng.randint(1, 5), rng.randint(1, 4)) for _ in range(60)]
    out = ordinal_association_binned(
        spark.createDataFrame([Row(x=x, y=y) for x, y in xy]), "x", "y"
    ).collect()[0]
    c = d = 0
    for (x1, y1), (x2, y2) in itertools.combinations(xy, 2):
        s = (x1 - x2) * (y1 - y2)
        if s > 0:
            c += 1
        elif s < 0:
            d += 1
    n = len(xy)
    tx = Counter(x for x, _ in xy)
    ty = Counter(y for _, y in xy)
    n0 = n * (n - 1) / 2.0
    n1 = sum(t * (t - 1) / 2.0 for t in tx.values())
    n2 = sum(t * (t - 1) / 2.0 for t in ty.values())
    m = min(len(tx), len(ty))
    assert out["n"] == n
    assert out["x_levels"] == len(tx) and out["y_levels"] == len(ty)
    for got, exp in [
        (out["somers_dyx_x1e6"], (c - d) / (n0 - n1)),
        (out["somers_dxy_x1e6"], (c - d) / (n0 - n2)),
        (out["tau_c_x1e6"], 2.0 * m * (c - d) / (n * n * (m - 1))),
    ]:
        assert abs(got - math.floor(exp * 1e6 + 0.5)) <= 1


def test_ordinal_association_constant_axis_nulls(spark):
    from manufacturing_data_integration_tool_spark.ops.ranktests import (
        ordinal_association_binned,
    )

    rows = [Row(x=1, y=i) for i in range(5)]
    out = ordinal_association_binned(
        spark.createDataFrame(rows), "x", "y"
    ).collect()[0]
    # x constant: pairs untied on x do not exist -> D_{Y|X} undefined;
    # D_{X|Y} is defined (0); tau-c undefined (min level count 1).
    assert out["somers_dyx_x1e6"] is None
    assert out["somers_dxy_x1e6"] == 0
    assert out["tau_c_x1e6"] is None


def test_mann_whitney_matches_brute_force(spark):
    """U (via 2U), and the tie-corrected z, against the O(n*m)
    pair-count twin."""
    import random

    from manufacturing_data_integration_tool_spark.ops.ranktests import (
        mann_whitney_u,
    )

    rng = random.Random(11)
    a = [rng.randint(1, 12) for _ in range(25)]
    b = [rng.randint(3, 15) for _ in range(31)]
    rows = [Row(g="a", v=v) for v in a] + [Row(g="b", v=v) for v in b]
    out = mann_whitney_u(
        spark.createDataFrame(rows), "g", "a", "b", "v"
    ).collect()[0]
    u = sum(
        (1.0 if x > y else 0.5 if x == y else 0.0) for x in a for y in b
    )
    na, nb = len(a), len(b)
    nn = na + nb
    tie = sum(t**3 - t for t in Counter(a + b).values())
    var = na * nb / 12.0 * ((nn + 1) - tie / (nn * (nn - 1)))
    z = (u - na * nb / 2.0) / math.sqrt(var)
    assert out["n_a"] == na and out["n_b"] == nb
    assert out["u2_stat"] == int(round(2 * u))
    assert abs(out["z_x1e6"] - math.floor(z * 1e6 + 0.5)) <= 1


def test_mann_whitney_empty_and_degenerate(spark):
    from manufacturing_data_integration_tool_spark.ops.ranktests import (
        mann_whitney_u,
    )

    empty = spark.createDataFrame([], "g string, v long")
    row = mann_whitney_u(empty, "g", "a", "b", "v").collect()[0]
    assert row["z_x1e6"] is None
    # single pooled distinct value: K = 0 -> z NULL, U = n*m/2 exactly
    rows = [Row(g="a", v=4)] * 3 + [Row(g="b", v=4)] * 5
    row = mann_whitney_u(
        spark.createDataFrame(rows), "g", "a", "b", "v"
    ).collect()[0]
    assert row["z_x1e6"] is None and row["u2_stat"] == 3 * 5


def test_kuiper_matches_brute_ecdf(spark):
    import bisect
    import random

    from manufacturing_data_integration_tool_spark.ops.ranktests import (
        kuiper_two_sample,
    )

    rng = random.Random(13)
    a = [rng.randint(1, 12) for _ in range(25)]
    b = [rng.randint(3, 15) for _ in range(31)]
    rows = [Row(g="a", v=v) for v in a] + [Row(g="b", v=v) for v in b]
    out = kuiper_two_sample(
        spark.createDataFrame(rows), "g", "a", "b", "v"
    ).collect()[0]
    sa, sb = sorted(a), sorted(b)
    na, nb = len(a), len(b)
    gaps = [
        bisect.bisect_right(sa, v) / na - bisect.bisect_right(sb, v) / nb
        for v in sorted(set(a + b))
    ]
    dp, dm = max([0.0] + gaps), max([0.0] + [-g for g in gaps])
    assert abs(out["d_plus_x1e6"] - math.floor(dp * 1e6 + 0.5)) <= 1
    assert abs(out["d_minus_x1e6"] - math.floor(dm * 1e6 + 0.5)) <= 1
    assert abs(out["v_x1e6"] - math.floor((dp + dm) * 1e6 + 0.5)) <= 2


def test_kuiper_empty_is_null_row(spark):
    from manufacturing_data_integration_tool_spark.ops.ranktests import (
        kuiper_two_sample,
    )

    empty = spark.createDataFrame([], "g string, v long")
    row = kuiper_two_sample(empty, "g", "a", "b", "v").collect()[0]
    assert row["v_x1e6"] is None


def test_ansari_bradley_matches_tieblock_twin(spark):
    """Randomized tied samples incl. center-straddling blocks: the
    doubled-score lattice statistic and z must match the per-block
    closed-form twin."""
    import random

    from manufacturing_data_integration_tool_spark.ops.ranktests import (
        ansari_bradley,
    )

    rng = random.Random(21)

    def brute(a, b):
        pooled = sorted(a + b)
        n_p = len(pooled)
        cnt = Counter(pooled)
        a2g = sq4g = st2 = 0
        pos = 0
        for v in sorted(cnt):
            t = cnt[v]
            lo, hi = pos + 1, pos + t
            s2 = 2 * sum(min(r, n_p + 1 - r) for r in range(lo, hi + 1))
            ta = sum(1 for x in a if x == v)
            a2g += (ta * s2) // t
            sq4g += (s2 * s2) // t
            st2 += s2
            pos = hi
        n, m = len(a), len(b)
        num = a2g - n * st2 / n_p
        var = n * m * (n_p * sq4g - st2 * st2) / (
            n_p * n_p * (n_p - 1)
        )
        return a2g, num / math.sqrt(var)

    for trial in range(3):
        a = [rng.randint(1, 12) for _ in range(20 + trial * 7)]
        b = [rng.randint(4, 9) for _ in range(25 + trial * 3)]
        rows = [Row(g="a", v=v) for v in a] + [Row(g="b", v=v) for v in b]
        out = ansari_bradley(
            spark.createDataFrame(rows), "g", "a", "b", "v"
        ).collect()[0]
        a2g, z = brute(a, b)
        assert out["ab2_stat"] == a2g
        assert abs(out["z_x1e6"] - math.floor(z * 1e6 + 0.5)) <= 1
    # clearly more dispersed sample a: strongly negative z
    a = [rng.choice([1, 2, 19, 20]) for _ in range(30)]
    b = [rng.choice([9, 10, 11]) for _ in range(30)]
    rows = [Row(g="a", v=v) for v in a] + [Row(g="b", v=v) for v in b]
    out = ansari_bradley(
        spark.createDataFrame(rows), "g", "a", "b", "v"
    ).collect()[0]
    assert out["z_x1e6"] < -3_000_000
    # degenerate: empty input / single pooled value -> NULL z
    empty = spark.createDataFrame([], "g string, v long")
    assert (
        ansari_bradley(empty, "g", "a", "b", "v").collect()[0]["z_x1e6"]
        is None
    )
    const = spark.createDataFrame(
        [Row(g="a", v=5)] * 3 + [Row(g="b", v=5)] * 4
    )
    assert (
        ansari_bradley(const, "g", "a", "b", "v").collect()[0]["z_x1e6"]
        is None
    )
