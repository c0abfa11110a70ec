"""Null-like normalization and stringify projections.

Reference semantics (/root/reference/src/transmog/flattening.py:25-41,
394-409): ``None``, ``""``, ``NaN`` and ``±Inf`` are all null-like. By
default they are dropped from the per-record dict; with
``include_nulls=True`` they are emitted as ``None`` (note ``""`` also
becomes ``None``, verified against the reference).

Columnar deviation (SURVEY.md §7.6): a DataFrame cannot drop a *cell*, so
both modes normalize null-likes to SQL NULL. Writers then render NULL per
format (CSV: empty string — matching the reference's writers/base.py:10-26).

Everything here is a Column expression — whole-stage codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def normalize_null_like(col: Column, dtype: T.DataType) -> Column:
    """Map null-like values (''/NaN/Inf) to NULL, preserving 0/False.

    Reference: flattening.py:25-41 (``is_null_like``).
    """
    if isinstance(dtype, T.StringType):
        return F.when(col == "", F.lit(None).cast(dtype)).otherwise(col)
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        bad = F.isnan(col) | (F.abs(col) == float("inf"))
        return F.when(bad, F.lit(None).cast(dtype)).otherwise(col)
    return col


def normalize_array_items(col: Column, elem_type: T.DataType) -> Column:
    """Element-wise null-like normalization for simple arrays."""
    if isinstance(elem_type, T.StringType):
        return F.transform(col, lambda x: F.when(x == "", None).otherwise(x))
    if isinstance(elem_type, (T.DoubleType, T.FloatType)):
        return F.transform(
            col,
            lambda x: F.when(F.isnan(x) | (F.abs(x) == float("inf")), None).otherwise(x),
        )
    return col


def stringify(col: Column, dtype: T.DataType) -> Column:
    """Cast a leaf to string; booleans render 'True'/'False' like Python str().

    Reference: flattening.py:396-398 (str() casting; nulls stay null).
    Spark casts booleans to 'true'/'false'; the reference uses Python
    ``str(True)`` = 'True'. We match the reference.
    """
    if isinstance(dtype, T.BooleanType):
        return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(
            F.when(col, F.lit("True")).otherwise(F.lit("False"))
        )
    return col.cast("string")


def stringify_array_items(col: Column, elem_type: T.DataType) -> Column:
    """Element-wise stringify for simple arrays (flattening.py:241-249)."""
    if isinstance(elem_type, T.BooleanType):
        return F.transform(
            col,
            lambda x: F.when(x.isNull(), F.lit(None).cast("string")).otherwise(
                F.when(x, F.lit("True")).otherwise(F.lit("False"))
            ),
        )
    return F.transform(col, lambda x: x.cast("string"))
