"""Unit tests for ops.inventory (FIFO costing, ABC-XYZ) and
ops.stats.wilson_rate_ci: hand-computed micro-fixtures pin the
semantics; driver-scale parity vs DuckDB lives in q220-q222."""

import math

import pytest
from pyspark.sql import Row, functions as F

from manufacturing_data_integration_tool_spark.ops.inventory import (
    abc_xyz,
    fifo_cogs,
)
from manufacturing_data_integration_tool_spark.ops.stats import wilson_rate_ci


def _lots(spark):
    rows = [
        # part A: two lots in ship order — demand 6 of 8 total
        Row(k="A", d=1, ok=1, ln=1, qty=5, cents=500),   # unit 100
        Row(k="A", d=2, ok=2, ln=1, qty=3, cents=600),   # unit 200
        # part B: demand exceeds stock
        Row(k="B", d=1, ok=3, ln=1, qty=4, cents=400),   # unit 100
    ]
    return spark.createDataFrame(rows)


def test_fifo_cogs_walks_lots_in_order(spark):
    lots = _lots(spark).withColumn(
        "__dem", F.when(F.col("k") == "A", 6).otherwise(20).cast("bigint")
    )
    out = {
        r["k"]: r
        for r in fifo_cogs(
            lots, "k", ["d", "ok", "ln"], "qty", "cents", F.col("__dem")
        ).collect()
    }
    a = out["A"]
    # 5 units @100 from lot 1 + 1 unit @200 from lot 2
    assert a["fifo_cogs_cents"] == 5 * 100 + 1 * 200
    assert a["consumed_qty"] == 6 and a["n_lots_touched"] == 2
    assert a["total_qty"] == 8 and a["demand_qty"] == 6
    b = out["B"]
    # under-supply: everything consumed, demand recorded as asked
    assert b["consumed_qty"] == 4 and b["demand_qty"] == 20
    assert b["fifo_cogs_cents"] == 400


def test_fifo_cogs_zero_demand_touches_nothing(spark):
    lots = _lots(spark).withColumn("__dem", F.lit(0).cast("bigint"))
    for r in fifo_cogs(
        lots, "k", ["d", "ok", "ln"], "qty", "cents", F.col("__dem")
    ).collect():
        assert r["consumed_qty"] == 0 and r["n_lots_touched"] == 0
        assert r["fifo_cogs_cents"] == 0


def test_abc_xyz_matrix_by_hand(spark):
    rev = spark.createDataFrame(
        [
            Row(k=1, rc=800),
            Row(k=2, rc=100),
            Row(k=3, rc=60),
            Row(k=4, rc=40),
        ]
    )
    per = spark.createDataFrame(
        [
            # k=1 steady -> CV 0 -> X
            Row(k=1, q=10),
            Row(k=1, q=10),
            Row(k=1, q=10),
            # k=2: S=30, Q=500 -> CV = 5/15 = 1/3 -> X
            Row(k=2, q=10),
            Row(k=2, q=20),
            # k=3 one period -> Z; k=4 no periods -> Z via left join
            Row(k=3, q=7),
        ]
    )
    out = {
        (r["abc_class"], r["xyz_class"]): (r["n_keys"], r["class_revenue_cents"])
        for r in abc_xyz(rev, "k", "rc", per, "q").collect()
    }
    # cum shares: 800 (80% -> A), 900 (90% -> B), 960/1000 -> C, C
    assert out == {("A", "X"): (1, 800), ("B", "X"): (1, 100), ("C", "Z"): (2, 100)}


def test_abc_xyz_cv_boundary_is_inclusive(spark):
    # CV exactly 0.5: q = [10, 30] -> S=40, Q=1000, nQ-S^2=400,
    # 10000*400 == 2500*1600 -> X (<=)
    rev = spark.createDataFrame([Row(k=1, rc=10)])
    per = spark.createDataFrame([Row(k=1, q=10), Row(k=1, q=30)])
    r = abc_xyz(rev, "k", "rc", per, "q").collect()[0]
    assert r["xyz_class"] == "X"


def test_wilson_rate_ci_matches_python_twin(spark):
    rows = [Row(g="m", ok=i < 3) for i in range(10)]  # k=3, n=10
    out = wilson_rate_ci(
        spark.createDataFrame(rows), ["g"], F.col("ok")
    ).collect()[0]
    assert out["n"] == 10 and out["k"] == 3
    z, n, k = 1.96, 10.0, 3.0
    z2 = z * z
    p = k / n
    denom = 1.0 + z2 / n
    center = (p + z2 / (2.0 * n)) / denom
    half = z * math.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n)) / denom
    assert out["rate_lo"] == math.floor((center - half) * 1e9) / 1e9
    assert out["rate_hi"] == math.floor((center + half) * 1e9) / 1e9
    # Wilson never collapses to a point at k=0
    rows0 = [Row(g="z", ok=False) for _ in range(5)]
    out0 = wilson_rate_ci(
        spark.createDataFrame(rows0), ["g"], F.col("ok")
    ).collect()[0]
    assert out0["rate_hi"] > 0.0


def test_reorder_point_matches_python_twin(spark):
    import datetime as dt
    from manufacturing_data_integration_tool_spark.ops.inventory import (
        reorder_point,
    )

    # supplier with daily demand 10, 20, 30
    rows = [
        Row(k=1, ts=dt.datetime(2024, 1, d + 1), q=q)
        for d, q in enumerate([10, 20, 30])
    ]
    r = reorder_point(
        spark.createDataFrame(rows), "k", "ts", "q"
    ).collect()[0]
    n, s, qq = 3, 60, 100 + 400 + 900
    assert r["n_days"] == n and r["sum_qty"] == s
    assert r["var_units"] == n * qq - s * s  # 4200 - 3600 = 600
    rop = (7.0 * s) / n + 1.645 * math.sqrt(7.0 * (n * qq - s * s)) / n
    assert r["rop_x1000"] == math.floor(rop * 1000.0)


def test_mann_kendall_monotone_and_tied_series(spark):
    import datetime as dt
    from manufacturing_data_integration_tool_spark.ops.stats import (
        mann_kendall_trend,
    )

    rows = []
    # "up": strictly increasing 6-day series -> S = C(6,2) = 15
    for d in range(6):
        rows.append(Row(k="up", ts=dt.datetime(2024, 1, d + 1), v=float(d)))
    # "flat": all equal -> S = 0, var18 fully tie-corrected to 0
    for d in range(4):
        rows.append(Row(k="flat", ts=dt.datetime(2024, 1, d + 1), v=7.0))
    out = {
        r["k"]: r
        for r in mann_kendall_trend(
            spark.createDataFrame(rows), "k", "ts", "v"
        ).collect()
    }
    up = out["up"]
    assert up["s_stat"] == 15 and up["n_days"] == 6
    var18 = 6 * 5 * 17  # no ties
    assert up["var18"] == var18
    z = (15.0 - 1.0) / math.sqrt(var18 / 18.0)
    assert up["z_x1e6"] == math.floor(z * 1e6)
    assert up["trend"] == ("increasing" if z > 1.96 else "no_trend")
    flat = out["flat"]
    assert flat["s_stat"] == 0 and flat["var18"] == 0
    assert flat["z_x1e6"] == 0 and flat["trend"] == "no_trend"


def test_fixed_width_reader_parses_golden_layout(spark):
    from manufacturing_data_integration_tool_spark.sources.readers import (
        read_source_fixed_width,
    )
    import __spark_entry__ as e

    df = read_source_fixed_width(
        spark,
        "tests/fixtures/production_golden_9rows.fwf",
        e._FWF_COLSPECS,
        with_lineage=False,
    )
    rows = df.collect()
    assert len(rows) == 9
    assert rows[0]["line_id"] == "LINE001"
    assert rows[0]["batch_number"] == "BATCH20240215001"
    assert rows[0]["defect_count"] == "0"
    # the golden fixture's missing values surface as NULL, like CSV
    import csv

    with open("tests/fixtures/production_golden_9rows.csv") as f:
        csv_rows = list(csv.DictReader(f))
    for spark_row, csv_row in zip(rows, csv_rows):
        for col in df.columns:
            expect = (csv_row[col] or "").strip() or None
            assert spark_row[col] == expect, (col, spark_row, csv_row)


def test_span_corruption_matches_md5_twin(spark):
    import hashlib
    import re as _re
    from manufacturing_data_integration_tool_spark.ops.text import (
        span_corruption_stats,
    )

    texts = {
        1: "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        2: "one two three",
        3: "  12345  ",  # zero words -> dropped entirely
    }
    rows = [Row(doc_id=k, text=v) for k, v in texts.items()]
    out = span_corruption_stats(
        spark.createDataFrame(rows), "text", "doc_id"
    ).collect()[0]
    # python twin with the same md5 lane
    nt = nm = ns = nd = 0
    for did, text in texts.items():
        ws = _re.findall(r"[a-z]+", text.lower())
        n = len(ws)
        if n == 0:
            continue
        nd += 1
        s = [
            int(hashlib.md5(f"{did}_{p}:span".encode()).hexdigest()[:13], 16)
            % 20
            == 0
            for p in range(1, n + 1)
        ]
        m = [
            s[i] or (i >= 1 and s[i - 1]) or (i >= 2 and s[i - 2])
            for i in range(n)
        ]
        nt += n
        nm += sum(m)
        ns += sum(
            1 for i in range(n) if m[i] and (i == 0 or not m[i - 1])
        )
    assert (out["n_docs"], out["n_tokens"], out["n_masked"], out["n_spans"]) == (
        nd,
        nt,
        nm,
        ns,
    )
    assert out["mask_ratio_x1e6"] == math.floor(1e6 * nm / nt)


def test_oee_daily_by_hand(spark):
    import datetime as dt
    from manufacturing_data_integration_tool_spark.ops.inventory import (
        oee_daily,
    )

    d1, d2 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)
    rows = [
        # day 1: 3 good events in 2 distinct hours + 1 error
        Row(ts=d1.replace(hour=1), ty="view"),
        Row(ts=d1.replace(hour=1, minute=30), ty="click"),
        Row(ts=d1.replace(hour=5), ty="view"),
        Row(ts=d1.replace(hour=7), ty="error"),
        # day 2: 2 good events in 2 hours, no errors
        Row(ts=d2.replace(hour=3), ty="view"),
        Row(ts=d2.replace(hour=9), ty="click"),
    ]
    out = {
        str(r["day"]): r
        for r in oee_daily(
            spark.createDataFrame(rows), "ts", "ty"
        ).collect()
    }
    r1 = out["2024-01-01"]
    assert (r1["n_events"], r1["n_errors"], r1["active_hours"]) == (4, 1, 2)
    # global: good=5, hours=4 -> rate 1.25/h; day1 rate 1.5 -> perf capped
    a = 2.0 / 24.0
    p = min(1.0, (3.0 * 4.0) / (2.0 * 5.0))
    q = 3.0 / 4.0
    assert r1["a_x1e6"] == math.floor(a * 1e6)
    assert r1["p_x1e6"] == math.floor(p * 1e6)
    assert r1["q_x1e6"] == math.floor(q * 1e6)
    assert r1["oee_x1e6"] == math.floor(a * p * q * 1e6)
    r2 = out["2024-01-02"]
    assert r2["n_errors"] == 0 and r2["q_x1e6"] == 1_000_000
    # day2 rate 1.0 < global 1.25 -> performance below 1
    assert r2["p_x1e6"] == math.floor((2.0 * 4.0) / (2.0 * 5.0) * 1e6)


def test_xml_reader_matches_csv_golden(spark):
    """Cross-format equivalence: the XML re-encoding of the golden
    fixture must parse to the same 9 rows as the CSV source."""
    import csv
    from manufacturing_data_integration_tool_spark import load_config
    from manufacturing_data_integration_tool_spark.sources.readers import (
        read_source_xml,
    )

    cfg = load_config("tests/fixtures/mapping_config.xml")
    df = read_source_xml(
        spark,
        "tests/fixtures/production_golden_9rows.xml",
        cfg,
        with_lineage=False,
    )
    rows = df.collect()
    assert len(rows) == 9
    with open("tests/fixtures/production_golden_9rows.csv") as f:
        csv_rows = list(csv.DictReader(f))
    for spark_row, csv_row in zip(rows, csv_rows):
        for col in df.columns:
            expect = csv_row[col] if csv_row[col] not in (None, "") else None
            assert spark_row[col] == expect, (col, spark_row, csv_row)


def test_theil_sen_median_slope_by_hand(spark):
    """Known series: per-type daily values with one outlier; the
    Theil-Sen slope must be the lower median of pairwise slopes."""
    import __spark_entry__ as e

    out = {
        r["event_type"]: r
        for r in e.q242_theil_sen(spark, "/root/testdata/sf0.001").collect()
    }
    for r in out.values():
        # the rational and its published float must agree
        import math

        assert r["slope_x1e6"] == math.floor(
            1e6 * r["slope_num"] / r["slope_den"]
        )
        assert r["n_pairs"] == r["n_days"] * (r["n_days"] - 1) // 2


def test_demand_intermittency_partitions_parts(spark):
    import __spark_entry__ as e
    import duckdb

    rows = e.q260_demand_intermittency(
        spark, "/root/testdata/sf0.001"
    ).collect()
    classes = {r["demand_class"] for r in rows}
    assert classes <= {"smooth", "intermittent", "erratic", "lumpy"}
    n_parts = sum(r["n_parts"] for r in rows)
    want = duckdb.sql(
        "select count(distinct l_partkey) from "
        "read_parquet('/root/testdata/sf0.001/lineitem.parquet')"
    ).fetchone()[0]
    assert n_parts == want  # every part classified exactly once


def test_abc_migration_classes_are_closed(spark):
    import __spark_entry__ as e

    rows = e.q261_abc_migration(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r["class_from"] in {"A", "B", "C"}
        assert r["class_to"] in {"A", "B", "C"}
        assert r["n_transitions"] > 0


def test_croston_sba_steady_vs_intermittent(spark):
    """Steady demand (every period, qty 10) forecasts ~10/period; the
    same sizes every 5 periods forecast ~2/period; SBA = 0.85x Croston;
    single-demand keys yield no row (no interval history)."""
    from manufacturing_data_integration_tool_spark.ops.inventory import (
        croston_sba,
    )

    rows = (
        [("steady", p, 10.0) for p in range(20)]
        + [("lumpy", p, 10.0) for p in range(0, 20, 5)]
        + [("once", 7, 10.0)]
    )
    df = spark.createDataFrame(rows, "k string, per long, qty double")
    out = {r["k"]: r for r in croston_sba(df, "k", "per", "qty").collect()}
    assert "once" not in out
    assert out["steady"]["croston_x1e6"] == 10_000_000  # 10 / 1
    assert abs(out["lumpy"]["croston_x1e6"] - 2_000_000) <= 1  # 10 / 5
    for r in out.values():
        assert abs(r["sba_x1e6"] - 0.85 * r["croston_x1e6"]) <= 1


def test_economic_order_qty_exact(spark):
    """D=1000, S=500000 cents, H=2000 cents -> EOQ^2 = 2*1000*500000/2000
    = 500000 exactly; EOQ = sqrt(500000) ~ 707.106781."""
    from manufacturing_data_integration_tool_spark.ops.inventory import (
        economic_order_qty,
    )

    df = spark.createDataFrame([("p1", 1000, 2000)],
                               "k string, d long, h long")
    r = economic_order_qty(df, "k", "d", "h").collect()[0]
    assert r["eoq2_units"] == 500_000
    assert r["eoq_x1e6"] == 707_106_781  # floor(sqrt(5e5)*1e6 + 0.5)


def test_newsvendor_stock_order_statistic(spark):
    """Demands 10,20,30,40,50 at cr=4/5: first rank with rk*5 >= n*4 is
    rank 4 -> stock 40. Two periods at cr=4/5: rank 2 -> the max."""
    from manufacturing_data_integration_tool_spark.ops.inventory import (
        newsvendor_stock,
    )

    rows = [("p1", i, q) for i, q in enumerate([30, 10, 50, 20, 40])]
    rows += [("p2", 0, 7), ("p2", 1, 9)]
    df = spark.createDataFrame(rows, "k string, per long, qty long")
    out = {r["k"]: r for r in newsvendor_stock(
        df, "k", "per", "qty"
    ).collect()}
    assert (out["p1"]["n_periods"], out["p1"]["stock_units"]) == (5, 40)
    assert (out["p2"]["n_periods"], out["p2"]["stock_units"]) == (2, 9)


def test_orc_reader_matches_csv_golden(spark):
    """Cross-format equivalence: the ORC re-encoding of the golden
    fixture must read back as the same 9 all-string rows as the CSV
    source, pinned to the declared column set."""
    import csv
    from manufacturing_data_integration_tool_spark import load_config
    from manufacturing_data_integration_tool_spark.sources.readers import (
        read_source_orc,
    )

    cfg = load_config("tests/fixtures/mapping_config.xml")
    df = read_source_orc(
        spark,
        "tests/fixtures/production_golden_9rows.orc",
        cfg,
        with_lineage=False,
    )
    assert df.columns == list(cfg.source_columns)
    assert all(f.dataType.simpleString() == "string" for f in df.schema)
    key = lambda r: (r["line_id"] or "", r["timestamp"] or "")  # noqa: E731
    rows = sorted(df.collect(), key=key)
    with open("tests/fixtures/production_golden_9rows.csv") as f:
        csv_rows = sorted(
            list(csv.DictReader(f)),
            key=lambda r: (r["line_id"] or "", r["timestamp"] or ""),
        )
    assert len(rows) == 9
    for spark_row, csv_row in zip(rows, csv_rows):
        for col in df.columns:
            expect = csv_row[col] if csv_row[col] not in (None, "") else None
            assert spark_row[col] == expect, (col, spark_row, csv_row)


def test_schema_drift_report_flags_rename_and_extra(spark):
    """Drift fixture = golden CSV with humidity_pct renamed to humidity
    plus an appended extra_note: the report must show exactly one
    missing_in_file (the declared name), two undeclared (the new name
    and the extra), and every other declared column ok."""
    from manufacturing_data_integration_tool_spark import load_config
    from manufacturing_data_integration_tool_spark.sources.readers import (
        schema_drift_report,
    )

    cfg = load_config("tests/fixtures/mapping_config.xml")
    file_cols = (
        spark.read.option("header", True)
        .csv("tests/fixtures/production_drift_9rows.csv")
        .columns
    )
    rows = {
        r["column_name"]: r
        for r in schema_drift_report(spark, file_cols, cfg).collect()
    }
    assert rows["humidity_pct"]["status"] == "missing_in_file"
    assert rows["humidity"]["status"] == "undeclared"
    assert rows["extra_note"]["status"] == "undeclared"
    ok = [c for c, r in rows.items() if r["status"] == "ok"]
    assert sorted(ok) == sorted(
        c for c in cfg.source_columns if c != "humidity_pct"
    )
    assert len(rows) == len(set(file_cols) | set(cfg.source_columns))


def test_bullwhip_ratio_matches_numpy_variance_ratio(spark):
    """BW recomputed as the numpy population-variance ratio must match
    the cross-multiplied exact-integer division; amplified upstream
    noise gives BW > 1, a constant downstream gives NULL."""
    import math

    import numpy as np

    from manufacturing_data_integration_tool_spark.ops.inventory import (
        bullwhip_ratio,
    )

    up = [("s1", f"2024-01-0{i}", q) for i, q in enumerate([10, 50, 5, 80, 2], 1)]
    down = [("s1", f"2024-01-0{i}", q) for i, q in enumerate([25, 30, 28, 31, 27], 1)]
    up += [("s2", f"2024-01-0{i}", 7) for i in range(1, 4)]
    down += [("s2", f"2024-01-0{i}", 7) for i in range(1, 4)]
    u = spark.createDataFrame(up, "k string, day string, qty long")
    d = spark.createDataFrame(down, "k string, day string, qty long")
    out = {r["k"]: r for r in bullwhip_ratio(u, d, "k", "qty").collect()}

    bw = np.var([10, 50, 5, 80, 2]) / np.var([25, 30, 28, 31, 27])
    assert out["s1"]["n_up_days"] == 5 and out["s1"]["n_down_days"] == 5
    assert abs(out["s1"]["bw_x1e6"] - math.floor(bw * 1e6 + 0.5)) <= 1
    assert out["s1"]["bw_x1e6"] > 1_000_000
    # constant downstream -> zero variance -> NULL (never inf)
    assert out["s2"]["bw_x1e6"] is None
