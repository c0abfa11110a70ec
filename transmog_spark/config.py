"""Engine configuration.

Mirrors the reference's ``TransmogConfig`` surface
(/root/reference/src/transmog/config.py:9-113) but drives *plan-time*
construction of Spark DataFrame transforms instead of per-record recursion.

Differences from the reference (documented deviations, SURVEY.md §7.6):

* ``batch_size`` is kept for API compatibility but maps to partitioning
  hints, not a row buffer (Spark batches natively).
* ``include_nulls=False`` cannot drop *cells* in a columnar engine; null-like
  values (None/''/NaN/Inf) are normalized to SQL NULL either way. The flag
  still controls (a) whether null items of extracted primitive arrays become
  child ``value`` rows and (b) whether nulls participate in child hash-id
  canonicalization (parity with flattening.py:394-409).
* Extra Spark-native id strategies ``xxhash64`` / ``sha256`` are accepted for
  scale (deterministic, JVM-side, no Python); ``hash`` keeps byte-parity with
  the reference via a vectorized pandas UDF (uuid5).
"""

from __future__ import annotations

import enum
import uuid
from dataclasses import dataclass, field

# Namespace UUID used by the reference for deterministic uuid5 ids
# (/root/reference/src/transmog/flattening.py:22). A published constant of
# the reference's public API surface, reproduced for id parity.
TRANSMOG_NAMESPACE = uuid.UUID("a9b8c7d6-e5f4-1234-abcd-0123456789ab")

# Timestamp format of the reference's ``_timestamp`` metadata column
# (/root/reference/src/transmog/flattening.py:130-136).
TIMESTAMP_FORMAT = "%Y-%m-%d %H:%M:%S.%f"


class ConfigurationError(ValueError):
    """Invalid engine configuration (reference: exceptions.py)."""


class ValidationError(ValueError):
    """Invalid data for the configured strategy (e.g. missing natural id)."""


class ArrayMode(enum.Enum):
    """Array handling strategy (reference: types.py ArrayMode).

    SMART    -- arrays of structs -> child tables; primitive arrays stay
                native columns (decided at *plan time* from the schema).
    SEPARATE -- every array -> child table; primitive items become
                ``value`` rows.
    INLINE   -- arrays serialized to JSON string columns.
    SKIP     -- arrays dropped.
    """

    SMART = "smart"
    SEPARATE = "separate"
    INLINE = "inline"
    SKIP = "skip"


_SPARK_NATIVE_ID_STRATEGIES = {"xxhash64", "sha256"}
_VALID_ID_STRATEGIES = {"random", "natural", "hash"} | _SPARK_NATIVE_ID_STRATEGIES


@dataclass
class EngineConfig:
    """Configuration for the PySpark flatten/feature engine.

    Field-for-field mirror of the reference's TransmogConfig
    (config.py:9-113) plus Spark-scale extensions.
    """

    array_mode: ArrayMode = ArrayMode.SMART
    include_nulls: bool = False
    stringify_values: bool = False
    max_depth: int = 100

    id_generation: str | list[str] = "random"
    id_field: str = "_id"
    parent_field: str = "_parent_id"
    time_field: str | None = "_timestamp"

    # Spark-scale knobs (no reference analog)
    batch_size: int = 1000  # kept for API compat; hints repartitioning only
    shuffle_partitions: int | None = None  # override spark.sql.shuffle.partitions
    salt_buckets: int = 0  # >0 enables key salting for skewed joins
    # natural-id validation is an EAGER distributed scan (reference raises
    # per record, flattening.py:114-125); at 10^12 rows turn it off and
    # rely on upstream contracts
    validate_natural: bool = True

    def __post_init__(self) -> None:
        # Validation semantics mirror reference config.py:63-113.
        if isinstance(self.array_mode, str):
            self.array_mode = ArrayMode(self.array_mode.lower())
        if self.batch_size < 1:
            raise ConfigurationError("Batch size must be at least 1")
        if self.max_depth < 1:
            raise ConfigurationError("Max depth must be at least 1")
        if not isinstance(self.include_nulls, bool):
            raise ConfigurationError(
                f"include_nulls must be a boolean, got {type(self.include_nulls).__name__}"
            )
        if not isinstance(self.stringify_values, bool):
            raise ConfigurationError(
                f"stringify_values must be a boolean, got {type(self.stringify_values).__name__}"
            )
        if isinstance(self.id_generation, str):
            if self.id_generation not in _VALID_ID_STRATEGIES:
                raise ConfigurationError(
                    f"id_generation must be one of {sorted(_VALID_ID_STRATEGIES)} "
                    f"or a list of field names, got {self.id_generation!r}"
                )
        elif isinstance(self.id_generation, list):
            if not self.id_generation:
                raise ConfigurationError("id_generation list cannot be empty")
            if not all(isinstance(f, str) for f in self.id_generation):
                raise ConfigurationError("id_generation list must contain only strings")
        else:
            raise ConfigurationError(
                f"id_generation must be a string or list, got {type(self.id_generation).__name__}"
            )

        fields_to_check = [f for f in (self.id_field, self.parent_field, self.time_field) if f]
        if len(fields_to_check) != len(set(fields_to_check)):
            raise ConfigurationError(
                f"Metadata field names must be unique: id={self.id_field}, "
                f"parent={self.parent_field}, time={self.time_field}"
            )
