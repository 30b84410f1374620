"""End-to-end golden test: the reference's 9-row fixture CSV must produce
exactly the reference's verified output (SURVEY.md §5 / FIXTURES.md A2):

- 6 valid rows (indices 0,1,2,4,5,7), 3 invalid (3,6,8)
- row 3: RANGE on temperature_c (300.0 > 200.0)
- row 6: LOOKUP on product_code ('INVALID-CODE')
- row 8: REQUIRED_FIELD_MISSING on timestamp AND REGEX on line_id
- row 4 (missing optional humidity_pct) and row 5 (repeated batch_number,
  different timestamp) and row 7 (OP9999) stay valid in reference-compat
  mode (unique-daily / referential_integrity are declared-only there).
"""

import pytest

from manufacturing_data_integration_tool_spark import load_config, validate


@pytest.fixture(scope="module")
def golden_result(spark, golden_csv, mapping_config_path):
    cfg = load_config(mapping_config_path)
    # all-string read: validation semantics (NUMERIC-on-cast-failure etc.)
    # operate on raw text exactly like the reference's row loop
    df = spark.read.csv(golden_csv, header=True, inferSchema=False)
    return validate(df, cfg)


def test_valid_invalid_counts(golden_result):
    assert golden_result.valid.count() == 6
    assert golden_result.invalid.count() == 3


def test_error_inventory(golden_result):
    errs = {
        (r.batch_number, r.field_name, r.error_type)
        for r in golden_result.errors.collect()
    }
    assert errs == {
        ("BATCH20240215004", "temperature_c", "RANGE"),
        ("BATCH20240215006", "product_code", "LOOKUP"),
        ("BAD-BATCH", "timestamp", "REQUIRED_FIELD_MISSING"),
        ("BAD-BATCH", "line_id", "REGEX"),
    }


def test_error_messages_match_reference_format(golden_result):
    msgs = {r.error_type: r.error_message for r in golden_result.errors.collect()}
    assert msgs["RANGE"] == "temperature_c=300.0 exceeds maximum 200.0"
    assert msgs["LOOKUP"] == "product_code='INVALID-CODE' not found in Production.Products"
    assert msgs["REQUIRED_FIELD_MISSING"] == "Required field 'timestamp' is empty"
    assert "does not match required format: Format: LINE001" in msgs["REGEX"]


def test_valid_rows_identity(golden_result):
    batches = {r.batch_number for r in golden_result.valid.collect()}
    assert batches == {
        "BATCH20240215001",  # appears twice (rows 0 and 5) — both valid:
        "BATCH20240215002",  # dup key is (timestamp,line_id,batch_number)
        "BATCH20240215003",
        "BATCH20240215005",  # missing optional humidity_pct
        "BATCH20240215007",  # OP9999 passes regex; referential is compat-off
    }


def test_extensions_flag_catches_declared_only_rules(spark, golden_csv, mapping_config_path):
    """With extensions=True the declared-only rules fire: unique-daily on the
    repeated batch_number, referential on OP9999, zscore stays quiet (no
    |z|>3 in 9 rows)."""
    cfg = load_config(mapping_config_path)
    df = spark.read.csv(golden_csv, header=True, inferSchema=False)
    ops = spark.createDataFrame(
        [("OP0001",), ("OP0002",), ("OP0003",), ("OP0004",)], "operator_id string"
    )
    res = validate(df, cfg, extensions=True, dim_tables={"Production.Operators": ops})
    errs = {(r.field_name, r.error_type) for r in res.errors.collect()}
    assert ("batch_number", "UNIQUE") in errs
    assert ("operator_id", "REFERENTIAL") in errs
    assert not any(t == "OUTLIER" for _, t in errs)
    # rows 0 and 5 now both invalid (same batch_number same day), row 7 invalid
    assert res.invalid.count() == 3 + 3
