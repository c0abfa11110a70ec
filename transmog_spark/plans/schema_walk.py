"""Plan-time schema walk — the analog of the reference's ``flatten_json``.

The reference recurses over every *record* (flattening.py:281-411, once per
row, pure Python). Here the same decision tree runs exactly once over the
DataFrame *schema* on the driver, emitting Column expressions that Catalyst
compiles into whole-stage-codegen'd selects — zero per-row Python.

Semantics reproduced (citations into /root/reference/src/transmog/):

* F1  underscore-joined paths          flattening.py:321-342
* F3  SMART classification             flattening.py:187-278 (plan-time:
      ArrayType(StructType) == "any dict item" => complex)
* F4  INLINE -> to_json                flattening.py:347-348
* F5  SKIP                             flattening.py:345-346
* F8  name sanitization                flattening.py:419-446
* F9  child-table naming with path     flattening.py:449-462; the path
      RESETS at each array boundary    flattening.py:226-230 [verified]
* F10 collision: later field wins      flattening.py:338 via dict.update —
      assignments into the select map overwrite in schema-field order
* max_depth truncation                 flattening.py:311-312
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from transmog_spark.config import ArrayMode, EngineConfig
from transmog_spark.functions.nulls import (
    normalize_array_items,
    normalize_null_like,
    stringify,
    stringify_array_items,
)


def sanitize_name(name: str) -> str:
    """SQL-safe names: symbol runs -> single '_', strip, digit prefix -> col_.

    Reference: flattening.py:419-446 (same rules, reimplemented).
    """
    out: list[str] = []
    last_underscore = False
    for ch in name.replace(" ", "_").replace("-", "_"):
        if ch.isalnum() or ch == "_":
            out.append(ch)
            last_underscore = ch == "_"
        elif not last_underscore:
            out.append("_")
            last_underscore = True
    s = "".join(out).strip("_")
    if s and s[0].isdigit():
        s = f"col_{s}"
    return s or "unnamed_field"


def table_name(entity: str, array_name: str, parent_path: str) -> str:
    """Child-table naming (reference flattening.py:449-462)."""
    if not parent_path:
        return f"{entity}_{array_name}"
    return f"{entity}_{parent_path}_{array_name}"


@dataclass
class ArraySpec:
    """One array column destined for a child table.

    ``access`` is the Column that reaches the array from the *current
    level's* DataFrame (root df or an exploded item). ``parent_path`` is the
    dict path since the last array boundary (F9: resets per boundary).
    """

    array_name: str  # sanitized leaf key
    parent_path: str  # sanitized, '_'-joined dict path within this level
    access: Column
    element_type: T.DataType


@dataclass
class LevelPlan:
    """Select list + child arrays for one nesting level."""

    exprs: dict[str, Column] = field(default_factory=dict)  # final name -> col (ordered)
    arrays: list[ArraySpec] = field(default_factory=list)


def walk_struct(
    fields: list[T.StructField],
    accessor,  # name -> Column for this level's fields
    config: EngineConfig,
    prefix: list[str],
    depth: int,
    plan: LevelPlan,
) -> None:
    """Recursive driver-side walk; mutates ``plan`` in schema-field order.

    ``prefix`` is the sanitized dict-path within the current level (resets
    at array boundaries, per F9).
    """
    for f in fields:
        name = sanitize_name(f.name)
        col = accessor(f.name)
        path = prefix + [name]
        final = "_".join(path)
        dt = f.dataType

        if isinstance(dt, T.StructType):
            if depth + 1 > config.max_depth:
                continue  # silent truncation (flattening.py:311-312)
            if not dt.fields:
                continue  # empty dicts skipped (flattening.py:304-309)
            walk_struct(
                dt.fields,
                lambda n, c=col: c.getField(n),
                config,
                path,
                depth + 1,
                plan,
            )
            continue

        if isinstance(dt, T.ArrayType):
            _handle_array(name, path, col, dt, config, plan)
            continue

        if isinstance(dt, T.MapType):
            # No reference analog (dict keys always become columns there).
            # Engine extension: maps inline as JSON strings.
            plan.exprs[final] = F.to_json(col)
            continue

        leaf = normalize_null_like(col, dt)
        if config.stringify_values:
            leaf = stringify(leaf, dt)
        plan.exprs[final] = leaf  # overwrite == collision F10


def _handle_array(
    name: str,
    path: list[str],
    col: Column,
    dt: T.ArrayType,
    config: EngineConfig,
    plan: LevelPlan,
) -> None:
    mode = config.array_mode
    final = "_".join(path)
    elem = dt.elementType

    if mode is ArrayMode.SKIP:
        return
    if mode is ArrayMode.INLINE:
        plan.exprs[final] = F.to_json(col)
        return

    complex_elem = isinstance(elem, T.StructType)
    if mode is ArrayMode.SMART and not complex_elem:
        # simple array stays native (flattening.py:349-373); SMART keeps
        # empty arrays out via null normalization of elements only.
        arr = normalize_array_items(col, elem)
        if config.stringify_values:
            arr = stringify_array_items(arr, elem)
        plan.exprs[final] = arr
        return

    # SEPARATE always extracts; SMART extracts struct elements.
    plan.arrays.append(
        ArraySpec(
            array_name=name,
            parent_path="_".join(path[:-1]),
            access=col,
            element_type=elem,
        )
    )


def plan_level(
    fields: list[T.StructField],
    accessor,
    config: EngineConfig,
) -> LevelPlan:
    plan = LevelPlan()
    walk_struct(fields, accessor, config, [], 0, plan)
    return plan
