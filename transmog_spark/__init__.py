"""transmog_spark — a PySpark-native flatten + point-in-time feature engine.

From-scratch reimplementation of the capabilities of scottdraper8/transmog
(nested-structure flattening with lineage) re-expressed as Catalyst-friendly
DataFrame transforms, extended into the feature-engineering operators a
100 TB training-data pipeline needs: as-of joins, windowed features,
sessionization, dedup (exact/MinHash/SimHash/embedding), ANN similarity
search, and text analysis.
"""

from transmog_spark.api import flatten_records
from transmog_spark.config import ArrayMode, ConfigurationError, EngineConfig, ValidationError
from transmog_spark.operators.flatten import FlattenResult, flatten
from transmog_spark.session import get_spark
from transmog_spark.streaming.pipeline import flatten_stream

__all__ = [
    "ArrayMode",
    "ConfigurationError",
    "EngineConfig",
    "FlattenResult",
    "ValidationError",
    "flatten",
    "flatten_records",
    "flatten_stream",
    "get_spark",
]

__version__ = "0.1.0"
