"""ID / lineage column builders (reference operators I1-I6, SURVEY.md §2.3).

Strategies:

* ``random``   — ``uuid()`` expression, JVM-side (reference I1: uuid4/record).
* ``hash``     — reference-parity uuid5: canonical JSON of the record
                 (sorted keys, nulls kept), ``.strip().lower()``, then
                 ``uuid5(TRANSMOG_NAMESPACE, s)``. Reference:
                 flattening.py:49-65. Implemented as a *vectorized pandas
                 UDF* (Arrow batches; the only Python in the engine's hot
                 path, and only when byte-parity ids are requested).
* composite    — list of field names; missing fields hash as None so
                 ``{"a":1}`` ≡ ``{"a":1,"b":None}`` (flattening.py:68-86).
* ``natural``  — use an existing column; root rows must be non-null/non-empty
                 (flattening.py:114-125), child items fall back to uuid4
                 (flattening.py:253-258).
* ``xxhash64`` / ``sha256`` — Spark-native deterministic ids for 100 TB scale
                 (no Python, codegen'd); engine extension, no reference analog.
"""

from __future__ import annotations

import json
import uuid

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from transmog_spark.config import TRANSMOG_NAMESPACE, EngineConfig, ValidationError


@pandas_udf(T.StringType())
def uuid5_from_json(js: pd.Series) -> pd.Series:
    """uuid5(TRANSMOG_NAMESPACE, canonical(json)) — reference-parity hash id.

    Input is Spark ``to_json`` output (ignoreNullFields=false); the UDF
    re-serializes with ``sort_keys=True`` so key order matches the
    reference's ``json.dumps(value, sort_keys=True, ensure_ascii=False)``
    (flattening.py:58-64) regardless of Spark struct field order.
    """

    def _one(s: str | None) -> str | None:
        if s is None:
            return None
        canonical = json.dumps(json.loads(s), sort_keys=True, ensure_ascii=False)
        return str(uuid.uuid5(TRANSMOG_NAMESPACE, canonical.strip().lower()))

    return js.map(_one)


def canonical_json(struct_col: Column, *, keep_nulls: bool = True) -> Column:
    """JSON of a struct (key order fixed by the UDF re-serialization).

    ``keep_nulls`` matters for parity: the reference hashes the ROOT from
    the raw record dict (None values serialize as null -> keep_nulls=True)
    but hashes CHILD items from the flattened dict where null-like keys were
    dropped under include_nulls=False (flattening.py:394-409) ->
    keep_nulls=config.include_nulls for children.
    """
    return F.to_json(struct_col, {"ignoreNullFields": "false" if keep_nulls else "true"})


def record_struct(df: DataFrame, exclude: set[str]) -> Column:
    """Struct of all data columns (metadata excluded) for whole-record hashing."""
    cols = [c for c in df.columns if c not in exclude]
    return F.struct(*[F.col(c).alias(c) for c in cols])


def id_column(
    df: DataFrame,
    config: EngineConfig,
    *,
    is_child: bool = False,
    item_struct: Column | None = None,
    item_schema: T.StructType | None = None,
    keep_nulls: bool = True,
) -> Column | None:
    """Build the ``_id`` column for a record set per the configured strategy.

    ``item_struct``/``item_schema``: for child tables, the struct to hash —
    per reference semantics this is the *flattened* item (nested arrays
    removed), see flattening.py:231-238 where ``metadata_dict = flattened``.
    Returns None for ``natural`` at the root (existing column used, I4).
    """
    strategy = config.id_generation
    meta = {config.id_field, config.parent_field}
    if config.time_field:
        meta.add(config.time_field)
    item_names = set(item_schema.names) if item_schema is not None else None

    if isinstance(strategy, list):
        # Composite-field id: struct of the named fields; absent columns -> null
        # (missing-field ≡ None, reference flattening.py:68-86).
        fields = []
        for f in strategy:
            if item_struct is not None:
                c = item_struct.getField(f) if f in (item_names or set()) else F.lit(None)
            else:
                c = F.col(f) if f in df.columns else F.lit(None)
            fields.append(c.alias(f))
        return uuid5_from_json(canonical_json(F.struct(*fields), keep_nulls=True))

    if strategy == "random":
        return F.expr("uuid()")
    if strategy == "hash":
        target = item_struct if item_struct is not None else record_struct(df, meta)
        return uuid5_from_json(canonical_json(target, keep_nulls=keep_nulls))
    if strategy == "xxhash64":
        target = item_struct if item_struct is not None else record_struct(df, meta)
        return F.lower(F.hex(F.xxhash64(F.to_json(target))))
    if strategy == "sha256":
        target = item_struct if item_struct is not None else record_struct(df, meta)
        return F.sha2(F.to_json(target), 256)
    if strategy == "natural":
        if is_child:
            # Child array items lacking the natural id fall back to uuid4
            # (reference flattening.py:253-258).
            nat = None
            if item_struct is not None and config.id_field in (item_names or set()):
                nat = item_struct.getField(config.id_field)
            elif item_struct is None and config.id_field in df.columns:
                nat = F.col(config.id_field)
            base = nat.cast("string") if nat is not None else F.lit(None).cast("string")
            return F.coalesce(F.when(base == "", None).otherwise(base), F.expr("uuid()"))
        return None  # root keeps the existing column
    raise ValidationError(f"Invalid id_generation strategy: {strategy}")


def validate_natural_ids(df: DataFrame, id_field: str) -> None:
    """Eagerly verify natural ids exist and are non-empty on root records.

    Reference raises ValidationError per offending record
    (flattening.py:114-125); here one distributed count covers the table.
    """
    if id_field not in df.columns:
        raise ValidationError(
            f"Strategy 'natural' requires field '{id_field}' in record, "
            f"but it was not found. Available fields: {df.columns}"
        )
    col = F.col(id_field)
    bad = df.where(col.isNull() | (col.cast("string") == "")).limit(1).count()
    if bad:
        raise ValidationError(
            f"Strategy 'natural' requires non-empty '{id_field}' on every record"
        )
