"""Flatten-family tests mirroring the reference unit suites.

Reference models: tests/unit/test_flattening_core.py, _arrays.py,
_hierarchy.py, _metadata.py, test_naming_conventions.py (see SURVEY.md §5).
Each test pins a semantic the reference exhibits [verified], re-expressed
over DataFrames.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transmog_spark.config import ArrayMode, ConfigurationError, EngineConfig
from transmog_spark.operators.flatten import flatten
from transmog_spark.plans.schema_walk import sanitize_name, table_name

NO_META = dict(id_generation="natural", time_field=None)


def _df(spark, rows, schema=None):
    return spark.createDataFrame(rows, schema=schema)


# ---------------------------------------------------------------------------
# F1: struct flatten / path naming (reference test_flattening_core.py:44-51)
# ---------------------------------------------------------------------------

def test_nested_paths_underscore_joined(spark):
    df = _df(
        spark,
        [Row(rid=1, user=Row(profile=Row(name="Ada", age=36), active=True))],
    )
    cfg = EngineConfig(id_field="rid", **NO_META)
    out = flatten(df, "t", cfg).main
    assert set(out.columns) == {"rid", "user_profile_name", "user_profile_age", "user_active"}
    r = out.collect()[0]
    assert r.user_profile_name == "Ada" and r.user_profile_age == 36 and r.user_active


def test_deep_nesting_and_max_depth_truncation(spark):
    # 5-deep struct; max_depth=3 silently truncates below (flattening.py:311-312)
    df = _df(spark, [Row(rid=1, a=Row(b=Row(c=Row(d=Row(e="deep")))))])
    full = flatten(df, "t", EngineConfig(id_field="rid", **NO_META)).main
    assert "a_b_c_d_e" in full.columns
    cut = flatten(df, "t", EngineConfig(id_field="rid", max_depth=3, **NO_META)).main
    assert "a_b_c_d_e" not in cut.columns


def test_collision_later_field_wins(spark):
    # reference test_naming_conventions.py:120-134: 'user_name' then
    # user.name -> the later (nested) assignment wins via dict.update
    schema = T.StructType(
        [
            T.StructField("rid", T.LongType()),
            T.StructField("user_name", T.StringType()),
            T.StructField(
                "user", T.StructType([T.StructField("name", T.StringType())])
            ),
        ]
    )
    df = _df(spark, [(1, "direct_field", ("nested_field",))], schema)
    out = flatten(df, "t", EngineConfig(id_field="rid", **NO_META)).main
    assert out.columns.count("user_name") == 1
    assert out.collect()[0].user_name == "nested_field"


# ---------------------------------------------------------------------------
# F6/F7: null-like handling + stringify (test_flattening_null_handling.py,
# test_stringify_values.py)
# ---------------------------------------------------------------------------

def test_null_like_normalized(spark):
    df = _df(
        spark,
        [Row(rid=1, s="", f=float("nan"), g=float("inf"), ok="x")],
    )
    out = flatten(df, "t", EngineConfig(id_field="rid", **NO_META)).main
    r = out.collect()[0]
    assert r.s is None and r.f is None and r.g is None and r.ok == "x"


def test_stringify_values(spark):
    df = _df(spark, [Row(rid=1, i=7, f=1.5, b=True, arr=[1, 2])])
    cfg = EngineConfig(id_field="rid", stringify_values=True, **NO_META)
    r = flatten(df, "t", cfg).main.collect()[0]
    # booleans render 'True' like Python str(), not Spark 'true'
    assert r.i == "7" and r.f == "1.5" and r.b == "True"
    assert r.arr == ["1", "2"]


# ---------------------------------------------------------------------------
# F2-F5: array modes (test_flattening_arrays.py)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def org_df(spark):
    """3-level org chart like the reference conftest complex_nested_data."""
    return spark.createDataFrame(
        [
            Row(
                cid=1,
                name="acme",
                tags=["a", "b"],
                departments=[
                    Row(dname="eng", teams=[Row(tname="core", size=3), Row(tname="ml", size=2)]),
                    Row(dname="ops", teams=[Row(tname="sre", size=1)]),
                ],
            ),
            Row(cid=2, name="beta", tags=["c"], departments=[]),
        ]
    )


def test_smart_mode_keeps_primitive_arrays_extracts_structs(spark, org_df):
    cfg = EngineConfig(id_field="cid", **NO_META)
    res = flatten(org_df, "company", cfg)
    assert "tags" in res.main.columns  # primitive array stays native
    assert set(res.tables) == {"company_departments", "company_teams"}


def test_child_table_naming_resets_at_array_boundary(spark, org_df):
    # teams nested inside departments[] names from the item-local path:
    # company_teams, NOT company_departments_teams (flattening.py:226-230
    # [verified]; docs/arrays.md is stale)
    res = flatten(org_df, "company", EngineConfig(id_field="cid", **NO_META))
    assert "company_teams" in res.tables
    assert "company_departments_teams" not in res.tables
    teams = res.tables["company_teams"].collect()
    assert sorted(t.tname for t in teams) == ["core", "ml", "sre"]


def test_parent_id_root_anchored_at_all_depths(spark, org_df):
    # I6 [verified]: _parent_id of grandchild rows is the ROOT id
    res = flatten(org_df, "company", EngineConfig(id_field="cid", **NO_META))
    teams = res.tables["company_teams"]
    assert set(r._parent_id for r in teams.collect()) == {"1"}
    depts = res.tables["company_departments"]
    assert set(r._parent_id for r in depts.collect()) == {"1"}


def test_separate_mode_primitive_value_rows(spark, org_df):
    cfg = EngineConfig(id_field="cid", array_mode="separate", **NO_META)
    res = flatten(org_df, "company", cfg)
    assert "tags" not in res.main.columns
    tags = res.tables["company_tags"]
    assert "value" in tags.columns
    got = sorted((r._parent_id, r.value) for r in tags.collect())
    assert got == [("1", "a"), ("1", "b"), ("2", "c")]


def test_inline_mode_serializes_arrays(spark, org_df):
    cfg = EngineConfig(id_field="cid", array_mode=ArrayMode.INLINE, **NO_META)
    res = flatten(org_df, "company", cfg)
    assert not res.tables
    r = res.main.where(F.col("cid") == 1).collect()[0]
    assert r.tags == '["a","b"]'
    assert "eng" in r.departments and "core" in r.departments


def test_skip_mode_drops_arrays(spark, org_df):
    cfg = EngineConfig(id_field="cid", array_mode="skip", **NO_META)
    res = flatten(org_df, "company", cfg)
    assert not res.tables
    assert "tags" not in res.main.columns and "departments" not in res.main.columns


def test_empty_arrays_produce_no_child_rows(spark, org_df):
    res = flatten(org_df, "company", EngineConfig(id_field="cid", **NO_META))
    depts = res.tables["company_departments"]
    assert depts.where(F.col("_parent_id") == "2").count() == 0


# ---------------------------------------------------------------------------
# I5: metadata annotation (test_flattening_metadata.py)
# ---------------------------------------------------------------------------

def test_timestamp_metadata_format_and_run_constant(spark):
    df = _df(spark, [Row(a=1), Row(a=2)])
    res = flatten(df, "t", EngineConfig(id_generation="random"))
    rows = res.main.collect()
    stamps = {r._timestamp for r in rows}
    assert len(stamps) == 1  # run-constant extract_time (api.py:238-239)
    datetime.strptime(stamps.pop(), "%Y-%m-%d %H:%M:%S.%f")  # reference format


def test_time_field_none_disables_timestamp(spark):
    df = _df(spark, [Row(a=1)])
    res = flatten(df, "t", EngineConfig(id_generation="random", time_field=None))
    assert "_timestamp" not in res.main.columns


def test_children_share_run_timestamp(spark, org_df):
    cfg = EngineConfig(id_field="cid", id_generation="natural")
    res = flatten(org_df, "company", cfg, run_ts="2024-01-01 00:00:00.000000")
    for tbl in res.tables.values():
        vals = {r._timestamp for r in tbl.select("_timestamp").collect()}
        assert vals == {"2024-01-01 00:00:00.000000"}


# ---------------------------------------------------------------------------
# naming / config (test_naming_conventions.py, test_config.py)
# ---------------------------------------------------------------------------

def test_sanitize_name_rules():
    # reference flattening.py:419-446
    assert sanitize_name("user name") == "user_name"
    assert sanitize_name("user-name") == "user_name"
    assert sanitize_name("a!!b??c") == "a_b_c"
    assert sanitize_name("9lives") == "col_9lives"
    assert sanitize_name("___") == "unnamed_field"
    assert sanitize_name("") == "unnamed_field"


def test_table_name_composition():
    assert table_name("e", "arr", "") == "e_arr"
    assert table_name("e", "arr", "meta") == "e_meta_arr"


def test_config_validation_errors():
    with pytest.raises(ConfigurationError):
        EngineConfig(batch_size=0)
    with pytest.raises(ConfigurationError):
        EngineConfig(max_depth=0)
    with pytest.raises(ConfigurationError):
        EngineConfig(id_generation="bogus")
    with pytest.raises(ConfigurationError):
        EngineConfig(id_generation=[])
    with pytest.raises(ConfigurationError):
        EngineConfig(id_field="x", parent_field="x")
