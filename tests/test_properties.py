"""Property-based tests (hypothesis) for driver-side pure functions —
no Spark jobs, so examples are cheap and shrinking works."""

import re

from hypothesis import given, settings, strategies as st

from manufacturing_data_integration_tool_spark.config import (
    _coerce_rule_params,
    parse_config_xml,
)
from manufacturing_data_integration_tool_spark.plans.rules import anchored


@given(st.text(min_size=1).filter(lambda p: _compilable(p)))
@settings(max_examples=200, deadline=None)
def test_anchored_matches_re_match_semantics(pattern):
    """rlike(anchored(p)) must equal re.match(p) semantics: anchoring never
    changes which strings a start-match accepts."""
    probe = "LINE123 and more"
    try:
        py_match = re.match(pattern, probe) is not None
        search_anchored = re.search(anchored(pattern), probe) is not None
    except re.error:
        return
    assert py_match == search_anchored


def _compilable(p: str) -> bool:
    try:
        re.compile(p)
        re.compile(anchored(p))
        return True
    except re.error:
        return False


@given(
    st.one_of(
        st.integers(min_value=-10**9, max_value=10**9),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
    )
)
@settings(max_examples=200, deadline=None)
def test_range_param_coercion_matches_reference(v):
    """Reference parser quirk (src/xml_parser.py:114-121): min/max become
    int when the literal has no '.', float otherwise."""
    raw = str(v)
    out = _coerce_rule_params("range", {"min": raw})
    if "." in raw:
        assert isinstance(out["min"], float) and out["min"] == float(raw)
    else:
        assert isinstance(out["min"], int) and out["min"] == int(raw)


@given(
    st.text(
        # XML normalizes \t\r\n in attribute values to spaces (spec), and
        # control chars are not well-formed — exclude both; <>&"' need
        # escaping we don't do in this fixture
        alphabet=st.characters(
            blacklist_characters="<>&\"'\t\r\n",
            blacklist_categories=("Cc", "Cs"),
        ),
        max_size=20,
    )
)
@settings(max_examples=100, deadline=None)
def test_config_field_roundtrip(name):
    """Any XML-attribute-safe source name survives parse; required flag
    parses case-insensitively."""
    if not name.strip():
        return
    xml = f"""
    <ETLMapping>
      <FieldMappings>
        <Field source="{name}" target="T" dataType="varchar(10)" required="TRUE">
          <Validation rule="not_null"/>
        </Field>
      </FieldMappings>
    </ETLMapping>
    """
    cfg = parse_config_xml(xml)
    assert cfg.fields[0].source == name
    assert cfg.fields[0].required is True
    assert cfg.fields[0].rules[0].kind == "not_null"
