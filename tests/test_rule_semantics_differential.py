"""Differential test: compiled Column rules vs a Python model of the
reference's row-loop semantics (src/data_validator.py:137-202), over an
edge-value corpus.

The model below re-states the reference's verified behavior (SURVEY.md §2.2):
range = float(value) w/ NUMERIC on failure, inclusive bounds, min before max;
regex = re.match (start-anchored); not_null = NaN or whitespace-only.

Known engine divergences are pinned explicitly in KNOWN_DIVERGENT — Python's
float() grammar accepts forms ('inf', 'nan', '1_000', hex-less exotica) that
Spark's ANSI double cast rejects; those rows get NUMERIC from Spark where the
reference would range-compare the parsed float. Everything else must match
exactly.
"""

import math
import re

from pyspark.sql import functions as F
from pyspark.sql import types as T

from manufacturing_data_integration_tool_spark.config import Rule
from manufacturing_data_integration_tool_spark.plans.rules import CompileContext, compile_field_errors

CORPUS = [
    None, "", " ", "  \t ", "0", "-0", "5", "5.5", "05.50", ".5", "5.",
    "+7", "-10", "-10.0001", "200", "200.0", "200.00001", "1e2", "1E2",
    "1e-2", "2e3", "9999999999", "-9999999999", "0.0000001",
    "abc", "5abc", "abc5", "5 5", "5,5", "--5", "++5", "5..5", "e5",
    " 5 ", "\t42\n", "١٢٣", "₅", "x", "NULL", "None",
    # Python-float-only grammar (divergent by design):
    "inf", "-inf", "Infinity", "nan", "NaN", "1_000",
]

# Python's float() accepts these; Spark's double cast rejects them -> the
# engine reports NUMERIC where the reference would parse and range-compare.
# ('nan'/'NaN' are NOT here: both engines parse them and NaN passes bounds.
# '١٢٣': Python float() accepts Unicode decimal digits; Spark is ASCII-only.)
KNOWN_DIVERGENT = {"inf", "-inf", "1_000", "١٢٣"}

LO, HI = -10.0, 200.0


def reference_range_model(value):
    """The reference's range-rule control flow for a present value."""
    try:
        num = float(value)
    except (TypeError, ValueError):
        return "NUMERIC"
    if num < LO:
        return "RANGE"
    if num > HI:
        return "RANGE"
    # NaN compares False both ways -> passes in the reference
    return None


def reference_regex_model(value, pattern):
    return None if re.match(pattern, str(value)) else "REGEX"


def reference_not_null_model(value):
    if isinstance(value, str) and value.strip() == "":
        return "NOT_NULL"
    return None


def _spark_errors(spark, rule, required=False):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(CORPUS)],
        T.StructType([T.StructField("i", T.IntegerType()), T.StructField("v", T.StringType())]),
    )
    col = compile_field_errors("v", F.col("v"), T.StringType(), required, [rule], CompileContext())
    rows = df.select("i", col.alias("errs")).collect()
    return {r["i"]: [e["error_type"] for e in r["errs"]] for r in rows}


def test_range_rule_matches_reference_model(spark):
    got = _spark_errors(spark, Rule("range", {"min": LO, "max": HI}))
    mismatches = []
    for i, v in enumerate(CORPUS):
        if v is None:
            assert got[i] == []  # missing + not-required -> all rules skipped
            continue
        expected = reference_range_model(v)
        actual = got[i][0] if got[i] else None
        if v in KNOWN_DIVERGENT:
            # Python float() parses these; Spark's double cast does not ->
            # Spark reports NUMERIC. Pin the divergence so it stays loud.
            assert actual in ("NUMERIC", expected), (v, actual, expected)
        elif actual != expected:
            mismatches.append((v, expected, actual))
    assert mismatches == []


def test_regex_rule_matches_reference_model(spark):
    pattern = "LINE[0-9]{3}$"  # unanchored start in config -> engine must anchor
    got = _spark_errors(spark, Rule("regex", {"pattern": pattern}))
    for i, v in enumerate(CORPUS):
        if v is None:
            assert got[i] == []
            continue
        expected = reference_regex_model(v, pattern)
        actual = got[i][0] if got[i] else None
        assert actual == expected, (v, expected, actual)


def test_not_null_rule_matches_reference_model(spark):
    got = _spark_errors(spark, Rule("not_null", {}))
    for i, v in enumerate(CORPUS):
        if v is None:
            assert got[i] == []
            continue
        expected = reference_not_null_model(v)
        actual = got[i][0] if got[i] else None
        assert actual == expected, (v, expected, actual)


def test_required_short_circuit_on_missing(spark):
    """required + missing -> exactly REQUIRED_FIELD_MISSING, no rule errors
    (reference src/data_validator.py:114-127)."""
    got = _spark_errors(spark, Rule("range", {"min": LO, "max": HI}), required=True)
    for i, v in enumerate(CORPUS):
        if v is None:
            assert got[i] == ["REQUIRED_FIELD_MISSING"]
