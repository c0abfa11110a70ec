"""Property-based parity vs the reference's pure functions (hypothesis).

These run the reference implementation directly (read-only import) against
the engine's reimplementations over generated inputs — name sanitization,
table naming, and the uuid5 record hash.
"""

from __future__ import annotations

import sys

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, "/root/reference/src")
ref_flat = pytest.importorskip("transmog.flattening")

from transmog_spark.plans.schema_walk import sanitize_name, table_name  # noqa: E402

names = st.text(max_size=40)


@given(names)
@settings(max_examples=500, deadline=None)
def test_sanitize_name_matches_reference(name):
    assert sanitize_name(name) == ref_flat._sanitize_name(name)


@given(st.text(max_size=20), st.text(max_size=20), st.text(max_size=20))
@settings(max_examples=200, deadline=None)
def test_table_name_matches_reference(entity, arr, path):
    assert table_name(entity, arr, path) == ref_flat._get_table_name(entity, arr, path)


json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**53), max_value=2**53),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=30),
)
json_records = st.dictionaries(
    st.text(min_size=1, max_size=12),
    st.one_of(json_scalars, st.lists(json_scalars, max_size=4)),
    min_size=1,
    max_size=6,
)


@given(json_records)
@settings(max_examples=200, deadline=None)
def test_uuid5_hash_matches_reference(record):
    """Engine's canonicalization (UDF body, run here directly) must equal the
    reference's _hash_value for arbitrary JSON records."""
    import json
    import uuid

    from transmog_spark.config import TRANSMOG_NAMESPACE

    # the pandas UDF body (functions/ids.py uuid5_from_json._one) inlined:
    spark_json = json.dumps(record, ensure_ascii=False)  # what to_json emits
    canonical = json.dumps(json.loads(spark_json), sort_keys=True, ensure_ascii=False)
    engine_id = str(uuid.uuid5(TRANSMOG_NAMESPACE, canonical.strip().lower()))

    assert engine_id == ref_flat._hash_value(record)
