"""Reference-shaped convenience API.

The reference's entry point is ``tm.flatten(data, name=...)`` where ``data``
is a dict, list of dicts, JSON/JSONL string, or a file path
(/root/reference/src/transmog/api.py:182-281, input classification at
:231-236). This module reproduces that surface on Spark: records are
round-tripped through ``spark.read.json`` so schema inference mirrors the
reference's dynamic per-batch inference (SURVEY.md §1.2), then flattened by
the schema-driven engine.

Scale note: this path is for reference-API compatibility and small inputs —
at 100 TB you already have a DataFrame/table and call
``transmog_spark.flatten(df, ...)`` directly.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import SparkSession

from transmog_spark.config import ConfigurationError, EngineConfig
from transmog_spark.operators.flatten import FlattenResult, flatten
from transmog_spark.sources.readers import read_data, read_file


def infer_schema(records: list[dict[str, Any]]):
    """Reference-style dynamic schema inference (SURVEY.md §1.2).

    Field order = first-seen key order across records (dict insertion order,
    NOT alphabetical — collision semantics F10 depend on it); type = first
    non-null value per field (bool -> boolean, int -> long, float -> double,
    str -> string; arrow_base.py:304-345); all-null fields -> string.
    ``spark.read.json`` can't be used here: it sorts keys alphabetically,
    which silently flips the reference's later-assignment-wins collisions.
    """
    from pyspark.sql import types as T

    def leaf_type(v: Any) -> T.DataType | None:
        if v is None:
            return None
        if isinstance(v, bool):
            return T.BooleanType()
        if isinstance(v, int):
            return T.LongType()
        if isinstance(v, float):
            return T.DoubleType()
        return T.StringType()

    def merge_into(fields: dict[str, T.DataType | None], rec: dict[str, Any]) -> None:
        for k, v in rec.items():
            cur = fields.get(k)
            if isinstance(cur, dict) or (cur is None and isinstance(v, dict)):
                sub = cur if isinstance(cur, dict) else {}
                if isinstance(v, dict):
                    merge_into(sub, v)
                fields[k] = sub
                continue
            if cur is not None:
                # numeric widening: a field seen as int then float (in any
                # order) becomes double — matches the arrow-level union the
                # reference's writers produce for mixed numeric batches
                if (
                    isinstance(cur, T.LongType)
                    and isinstance(v, float)
                    and not isinstance(v, bool)
                ):
                    fields[k] = T.DoubleType()
                continue  # otherwise first non-null wins
            if isinstance(v, dict):
                sub2: dict[str, Any] = {}
                merge_into(sub2, v)
                fields[k] = sub2
            elif isinstance(v, list):
                elem: T.DataType | None = None
                for item in v:
                    if isinstance(item, dict):
                        sub3: dict[str, Any] = {}
                        merge_into(sub3, item)
                        elem = to_struct(sub3)
                        break
                    t = leaf_type(item)
                    if t is not None:
                        elem = t
                        break
                fields[k] = T.ArrayType(elem or T.StringType())
            else:
                fields[k] = leaf_type(v)

    def to_struct(fields: dict[str, Any]) -> T.StructType:
        out = []
        for name, t in fields.items():
            if isinstance(t, dict):
                t = to_struct(t)
            out.append(T.StructField(name, t or T.StringType(), True))
        return T.StructType(out)

    fields: dict[str, Any] = {}
    for rec in records:
        merge_into(fields, rec)
    return to_struct(fields)


def _coerce(v: Any, dt) -> Any:
    """Coerce python values to the inferred type (int -> float for double
    fields etc.) so createDataFrame's verifier accepts mixed numerics."""
    from pyspark.sql import types as T

    if v is None:
        return None
    if isinstance(dt, T.StructType):
        if not isinstance(v, dict):
            return None
        return {f.name: _coerce(v.get(f.name), f.dataType) for f in dt.fields}
    if isinstance(dt, T.ArrayType):
        if not isinstance(v, list):
            return None
        return [_coerce(x, dt.elementType) for x in v]
    if isinstance(dt, T.DoubleType):
        return float(v) if isinstance(v, (int, float)) and not isinstance(v, bool) else v
    if isinstance(dt, T.LongType):
        # a float can still reach a long field through paths the widening
        # doesn't cover (array elements); integral floats coerce losslessly
        if isinstance(v, float) and v.is_integer():
            return int(v)
        return v
    if isinstance(dt, T.StringType) and not isinstance(v, str):
        return json.dumps(v, ensure_ascii=False) if isinstance(v, (dict, list)) else str(v)
    return v


def records_to_df(spark: SparkSession, records: list[dict[str, Any]]):
    """DataFrame from raw dicts with reference-parity schema inference."""
    schema = infer_schema(records)
    rows = [
        {f.name: _coerce(r.get(f.name), f.dataType) for f in schema.fields}
        for r in records
    ]
    return spark.createDataFrame(rows, schema)


def flatten_records(
    data: dict | list | str | bytes | os.PathLike,
    entity_name: str = "entity",
    config: EngineConfig | None = None,
    spark: SparkSession | None = None,
) -> FlattenResult:
    """``tm.flatten``-shaped entry point over raw Python/JSON input."""
    if spark is None:
        spark = SparkSession.getActiveSession()
        if spark is None:
            raise ConfigurationError("No active SparkSession; pass spark=...")

    if isinstance(data, dict):
        df = records_to_df(spark, [data])
    elif isinstance(data, list):
        bad = [r for r in data if not isinstance(r, dict)]
        if bad:
            # reference raises ConfigurationError per non-dict record
            # (api.py:258-261)
            raise ConfigurationError(f"Records must be dicts, got {type(bad[0]).__name__}")
        df = records_to_df(spark, data)
    elif isinstance(data, (str, bytes)):
        text = data.decode("utf-8") if isinstance(data, bytes) else data
        if "\n" not in text and os.path.exists(text):
            df = read_file(spark, text)
        else:
            df = read_data(spark, text)
    elif isinstance(data, os.PathLike):
        df = read_file(spark, os.fspath(data))
    else:
        raise ConfigurationError(f"Unsupported input type: {type(data).__name__}")

    return flatten(df, entity_name, config)
