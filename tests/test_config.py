"""Config IR parsing — pinned to the reference parser's quirks
(src/xml_parser.py:102-156)."""

from manufacturing_data_integration_tool_spark.config import load_config, spark_type_for
from pyspark.sql import types as T


def test_field_mappings(mapping_config_path):
    cfg = load_config(mapping_config_path)
    assert [m.source for m in cfg.fields] == [
        "timestamp",
        "line_id",
        "batch_number",
        "product_code",
        "temperature_c",
        "pressure_kpa",
        "humidity_pct",
        "operator_id",
        "defect_count",
    ]
    by_src = {m.source: m for m in cfg.fields}
    assert by_src["timestamp"].target == "RecordTimestamp"
    assert by_src["humidity_pct"].required is False
    assert all(m.required for s, m in by_src.items() if s != "humidity_pct")


def test_range_param_int_float_coercion(mapping_config_path):
    """min/max parse int when no '.', float otherwise (xml_parser.py:115-119)."""
    cfg = load_config(mapping_config_path)
    by_src = {m.source: m for m in cfg.fields}
    temp_range = by_src["temperature_c"].rule("range")
    assert temp_range.params["min"] == -10.0 and isinstance(temp_range.params["min"], float)
    defect_range = by_src["defect_count"].rule("range")
    assert defect_range.params["min"] == 0 and isinstance(defect_range.params["min"], int)
    outlier = by_src["temperature_c"].rule("outlier_detection")
    assert outlier.params["threshold"] == 3.0 and isinstance(outlier.params["threshold"], float)


def test_global_rules_and_etl(mapping_config_path):
    cfg = load_config(mapping_config_path)
    kinds = [g.kind for g in cfg.global_rules]
    assert kinds == ["duplicate_check", "referential_integrity"]
    assert cfg.global_rules[0].params["fields"] == "timestamp,line_id,batch_number"
    assert cfg.etl.batch_size == 1000
    assert cfg.etl.archive_processed_files is True
    assert cfg.source.delimiter == ","
    assert cfg.target.target_table == "Production.QualityData"
    assert cfg.timestamp_field() == "timestamp"


def test_spark_type_mapping():
    assert isinstance(spark_type_for("datetime"), T.TimestampType)
    assert isinstance(spark_type_for("varchar(20)"), T.StringType)
    assert isinstance(spark_type_for("decimal(5,2)"), T.DoubleType)
    assert isinstance(spark_type_for("decimal!(5,2)"), T.DecimalType)
    assert isinstance(spark_type_for("int"), T.LongType)
