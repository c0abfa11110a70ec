"""ID-strategy tests (reference test_flattening_ids.py / _id_strategy.py).

The ``hash`` strategy must be byte-parity with the reference:
uuid5(TRANSMOG_NAMESPACE, json.dumps(record, sort_keys=True,
ensure_ascii=False).strip().lower()) — flattening.py:49-65.
"""

from __future__ import annotations

import json
import uuid

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from transmog_spark.config import TRANSMOG_NAMESPACE, EngineConfig, ValidationError
from transmog_spark.operators.flatten import flatten


def _ref_hash(value) -> str:
    """The reference's _hash_value (flattening.py:49-65), verbatim semantics."""
    if isinstance(value, (dict, list)):
        normalized = json.dumps(value, sort_keys=True, ensure_ascii=False).strip().lower()
    else:
        normalized = str(value).strip().lower()
    return str(uuid.uuid5(TRANSMOG_NAMESPACE, normalized))


def test_hash_id_uuid5_parity(spark):
    record = {"a": 1, "b": "Hello World", "c": None, "d": 2.5}
    df = spark.createDataFrame(
        [(1, "Hello World", None, 2.5)], "a long, b string, c string, d double"
    )
    res = flatten(df, "t", EngineConfig(id_generation="hash", time_field=None))
    got = res.main.collect()[0]._id
    assert got == _ref_hash(record)


def test_hash_id_unicode_parity(spark):
    record = {"name": "Čapek Ünïcode", "n": 3}
    df = spark.createDataFrame([Row(name="Čapek Ünïcode", n=3)])
    res = flatten(df, "t", EngineConfig(id_generation="hash", time_field=None))
    assert res.main.collect()[0]._id == _ref_hash(record)


def test_hash_id_deterministic_and_key_order_insensitive(spark):
    # same logical record, different field order -> same id (sort_keys)
    d1 = spark.createDataFrame([Row(a=1, b="x")])
    d2 = spark.createDataFrame([Row(b="x", a=1)])
    cfg = EngineConfig(id_generation="hash", time_field=None)
    i1 = flatten(d1, "t", cfg).main.collect()[0]._id
    i2 = flatten(d2, "t", cfg).main.collect()[0]._id
    assert i1 == i2 == _ref_hash({"a": 1, "b": "x"})


def test_composite_id_missing_field_equals_none(spark):
    # reference test_flattening_ids.py:303-312: {'a':1} ≡ {'a':1,'b':None}
    cfg = EngineConfig(id_generation=["a", "b"], time_field=None)
    d1 = spark.createDataFrame([Row(a=1, other="x")])
    d2 = spark.createDataFrame([(1, None, "y")], "a long, b string, other string")
    i1 = flatten(d1, "t", cfg).main.collect()[0]._id
    i2 = flatten(d2, "t", cfg).main.collect()[0]._id
    assert i1 == i2 == _ref_hash({"a": 1, "b": None})


def test_random_ids_unique_per_record(spark):
    df = spark.range(50).select(F.col("id").alias("a"))
    res = flatten(df, "t", EngineConfig(id_generation="random", time_field=None))
    ids = [r._id for r in res.main.collect()]
    assert len(set(ids)) == 50
    uuid.UUID(ids[0])  # well-formed


def test_natural_id_missing_field_raises(spark):
    df = spark.createDataFrame([Row(a=1)])
    with pytest.raises(ValidationError):
        flatten(df, "t", EngineConfig(id_generation="natural", id_field="nope", time_field=None))


def test_natural_id_empty_value_raises(spark):
    df = spark.createDataFrame([Row(k="", a=1)])
    with pytest.raises(ValidationError):
        flatten(df, "t", EngineConfig(id_generation="natural", id_field="k", time_field=None))


def test_natural_id_child_fallback_uuid4(spark):
    # child items lacking the natural id get a uuid4 (flattening.py:253-258)
    df = spark.createDataFrame([Row(k="r1", items=[Row(v=1), Row(v=2)])])
    cfg = EngineConfig(id_generation="natural", id_field="k", time_field=None)
    res = flatten(df, "t", cfg)
    rows = res.tables["t_items"].collect()
    assert all(r._parent_id == "r1" for r in rows)
    ids = [r.k for r in rows]
    assert len(set(ids)) == 2
    for i in ids:
        uuid.UUID(i)


def test_spark_native_strategies_deterministic(spark):
    for strat in ("xxhash64", "sha256"):
        cfg = EngineConfig(id_generation=strat, time_field=None)
        df = spark.createDataFrame([Row(a=1, b="x"), Row(a=2, b="y")])
        r1 = sorted(r._id for r in flatten(df, "t", cfg).main.collect())
        r2 = sorted(r._id for r in flatten(df, "t", cfg).main.collect())
        assert r1 == r2 and len(set(r1)) == 2
