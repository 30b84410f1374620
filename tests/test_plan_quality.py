"""Plan-quality regression guards: the properties that make the engine
viable at 100 TB must be visible in the physical plans, not just intended.

Each test inspects the formatted/simple explain output of a real query:
filters reach the parquet scan, only needed columns are read, small sides
broadcast, top-k never global-sorts, and no row-at-a-time Python appears
in validation plans.
"""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

import __spark_entry__ as entry
from manufacturing_data_integration_tool_spark import load_config, validate


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_range_filter_pushed_to_scan(spark):
    plan = plan_of(entry.q02_range_filter(spark, "/root/testdata/sf0.001"))
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(l_quantity,5.0)" in plan
    # column pruning: only the 5 projected columns are read
    assert "l_shipdate" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_semi_join_broadcasts_dim(spark):
    plan = plan_of(entry.q10_lookup_semi_join(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_anti_join_broadcasts_dim(spark):
    plan = plan_of(entry.q09_referential_anti_join(spark, "/root/testdata/sf0.001"))
    assert "Broadcast" in plan and "LeftAnti" in plan


def test_topk_uses_take_ordered_not_global_sort(spark):
    plan = plan_of(entry.q12_top_k(spark, "/root/testdata/sf0.001"))
    assert "TakeOrderedAndProject" in plan


def test_validation_plan_has_no_python_eval(spark, golden_csv, mapping_config_path):
    """Rules must stay JVM-side Column expressions — a BatchEvalPython /
    ArrowEvalPython node in the validation plan means someone snuck a
    Python UDF into the hot path."""
    cfg = load_config(mapping_config_path)
    df = spark.read.csv(golden_csv, header=True)
    res = validate(df, cfg)
    plan = plan_of(res.annotated)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_zscore_uses_broadcast_not_window(spark):
    """Two-pass global stats must broadcast the 1-row aggregate; an
    unpartitioned Window node would be the single-task bottleneck."""
    plan = plan_of(entry.q08_zscore_outliers(spark, "/root/testdata/sf0.001"))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "Window" not in plan
