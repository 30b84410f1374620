"""XML mapping-config parser -> plain-Python IR.

The XML dialect is the reference engine's declarative "query language"
(reference: ``config/mapping_config.xml``, parsed by ``src/xml_parser.py:65-156``).
This module reproduces the same IR shape (field mappings with per-field
validation rules, global rules, source/target/etl settings) so any config
written for the reference runs unchanged on the Spark engine.

Everything here is driver-side pure Python: configs are tiny, so no Spark
reader is involved (SURVEY.md S3).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Mapping, Optional, Sequence

from pyspark.sql import types as T

__all__ = [
    "Rule",
    "FieldMapping",
    "GlobalRule",
    "SourceSettings",
    "TargetSettings",
    "EtlSettings",
    "IntegrationConfig",
    "load_config",
    "parse_config_xml",
    "spark_type_for",
]


@dataclass(frozen=True)
class Rule:
    """One per-field validation rule (reference ``src/xml_parser.py:12-19``)."""

    kind: str
    params: Mapping[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class FieldMapping:
    """Source->target column mapping plus its rule list
    (reference ``src/xml_parser.py:22-36``)."""

    source: str
    target: str
    data_type: str
    required: bool
    rules: tuple[Rule, ...] = ()

    def rule(self, kind: str) -> Optional[Rule]:
        for r in self.rules:
            if r.kind == kind:
                return r
        return None


@dataclass(frozen=True)
class GlobalRule:
    """Dataset-wide rule (reference ``src/xml_parser.py:146-156``)."""

    kind: str
    params: Mapping[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class SourceSettings:
    name: str = ""
    file_path: str = ""
    delimiter: str = ","
    has_header: bool = True
    kind: str = "CSV"


@dataclass(frozen=True)
class TargetSettings:
    name: str = ""
    connection_string: str = ""
    target_table: str = ""
    kind: str = ""


@dataclass(frozen=True)
class EtlSettings:
    batch_size: int = 1000
    error_handling: str = "continue"
    log_level: str = "detailed"
    archive_processed_files: bool = False


@dataclass(frozen=True)
class IntegrationConfig:
    fields: tuple[FieldMapping, ...]
    global_rules: tuple[GlobalRule, ...] = ()
    source: SourceSettings = SourceSettings()
    target: TargetSettings = TargetSettings()
    etl: EtlSettings = EtlSettings()

    @property
    def source_columns(self) -> list[str]:
        return [m.source for m in self.fields]

    def timestamp_field(self) -> Optional[str]:
        """First datetime-typed source field — used as the event-time anchor
        for ``unique scope="daily"`` style rules."""
        for m in self.fields:
            if m.data_type.lower().startswith(("datetime", "timestamp", "date")):
                return m.source
        return None


def _coerce_rule_params(kind: str, params: dict[str, Any]) -> dict[str, Any]:
    """Numeric coercion quirks pinned to the reference parser
    (``src/xml_parser.py:114-121``): range min/max become int when the literal
    has no '.', float otherwise; any ``threshold`` becomes float; date_range
    bounds stay strings."""
    out = dict(params)
    if kind == "range":
        for key in ("min", "max"):
            if key in out:
                raw = str(out[key])
                out[key] = float(raw) if "." in raw else int(raw)
    if "threshold" in out:
        out["threshold"] = float(out["threshold"])
    return out


def parse_config_xml(xml_text: str) -> IntegrationConfig:
    root = ET.fromstring(xml_text)

    src_el = root.find("SourceSystem")
    source = SourceSettings()
    if src_el is not None:
        source = SourceSettings(
            name=src_el.get("name", ""),
            file_path=(src_el.findtext("FilePath") or "").strip(),
            delimiter=src_el.findtext("Delimiter") or ",",
            has_header=(src_el.findtext("HasHeader") or "true").strip().lower() == "true",
            kind=src_el.get("type", "CSV"),
        )

    tgt_el = root.find("TargetSystem")
    target = TargetSettings()
    if tgt_el is not None:
        target = TargetSettings(
            name=tgt_el.get("name", ""),
            connection_string=(tgt_el.findtext("ConnectionString") or "").strip(),
            target_table=(tgt_el.findtext("TargetTable") or "").strip(),
            kind=tgt_el.get("type", ""),
        )

    mappings: list[FieldMapping] = []
    fm_el = root.find("FieldMappings")
    if fm_el is not None:
        for f_el in fm_el.findall("Field"):
            rules = []
            for v_el in f_el.findall("Validation"):
                kind = v_el.get("rule", "")
                params = {k: v for k, v in v_el.attrib.items() if k != "rule"}
                rules.append(Rule(kind=kind, params=_coerce_rule_params(kind, params)))
            mappings.append(
                FieldMapping(
                    source=f_el.get("source", ""),
                    target=f_el.get("target", f_el.get("source", "")),
                    data_type=f_el.get("dataType", "varchar"),
                    required=(f_el.get("required", "false").lower() == "true"),
                    rules=tuple(rules),
                )
            )

    global_rules: list[GlobalRule] = []
    gv_el = root.find("GlobalValidations")
    if gv_el is not None:
        for v_el in gv_el.findall("Validation"):
            kind = v_el.get("rule", "")
            params = {k: v for k, v in v_el.attrib.items() if k != "rule"}
            global_rules.append(GlobalRule(kind=kind, params=params))

    etl = EtlSettings()
    etl_el = root.find("ETLConfig")
    if etl_el is not None:
        etl = EtlSettings(
            batch_size=int(etl_el.findtext("BatchSize") or 1000),
            error_handling=(etl_el.findtext("ErrorHandling") or "continue").strip(),
            log_level=(etl_el.findtext("LogLevel") or "detailed").strip(),
            archive_processed_files=(etl_el.findtext("ArchiveProcessedFiles") or "false").strip().lower()
            == "true",
        )

    return IntegrationConfig(
        fields=tuple(mappings),
        global_rules=tuple(global_rules),
        source=source,
        target=target,
        etl=etl,
    )


def load_config(path: str | Path) -> IntegrationConfig:
    p = Path(path)
    if not p.exists():
        raise FileNotFoundError(f"Config file not found: {p}")
    return parse_config_xml(p.read_text())


def spark_type_for(data_type: str) -> T.DataType:
    """Map declared config types to Spark types.

    ``decimal(p,s)`` maps to DoubleType by default — runtime-faithful to the
    reference, which reads CSV through pandas float64 inference (SURVEY.md
    §1.2) — but a true DecimalType is honored when ``decimal!`` is declared.
    """
    dt = data_type.strip().lower()
    if dt.startswith(("datetime", "timestamp")):
        return T.TimestampType()
    if dt.startswith("date"):
        return T.DateType()
    if dt.startswith(("varchar", "char", "string", "text")):
        return T.StringType()
    if dt.startswith("decimal!"):
        inner = dt.split("(", 1)[1].rstrip(")")
        p, s = (int(x) for x in inner.split(","))
        return T.DecimalType(p, s)
    if dt.startswith(("decimal", "numeric", "double", "float", "real")):
        return T.DoubleType()
    if dt.startswith(("bigint", "long", "int", "smallint", "tinyint")):
        return T.LongType()
    if dt.startswith(("bool", "bit")):
        return T.BooleanType()
    if dt.startswith(("binary", "blob", "varbinary")):
        return T.BinaryType()
    return T.StringType()
