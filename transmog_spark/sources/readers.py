"""Sources / scans (reference S1-S8, SURVEY.md §2.1).

The reference's iterator zoo (iterators.py, orjson/ijson/json5/hjson paths)
collapses onto Spark's distributed JSON scan:

* S2/S3 JSON file (object or array-of-objects) -> ``spark.read.json(path,
  multiLine=True)`` — already streaming/splittable, constant driver memory.
* S4 JSONL/NDJSON -> ``spark.read.json(path)`` (default line mode).
* S7 in-memory strings -> ``createDataFrame`` + schema inference via
  ``spark.read.json(rdd-less dataset)``.
* S8 format sniffer -> extension dispatch + the same >=2-parsed-lines
  heuristic for bare strings (iterators.py:79-104,403-425).

JSON5/HJSON (S5/S6) need lenient parsers Spark lacks; the optional
json5/hjson libs are preferred when importable, with a vendored spec
parser (lenient_json.py) as fallback, applied as a driver-side pre-parse
(these formats are small-config-file territory, not 100 TB inputs).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def detect_string_format(text: str) -> str:
    """'json' or 'jsonl' (reference heuristic iterators.py:403-425).

    Parse up to the first 5 non-blank lines as standalone JSON; >=2
    successes and >=2 candidate lines => jsonl.
    """
    stripped = text.strip()
    if not stripped:
        return "json"
    lines = [ln for ln in stripped.splitlines() if ln.strip()]
    if len(lines) < 2:
        return "json"
    hits = 0
    for ln in lines[:5]:
        try:
            json.loads(ln)
            hits += 1
        except (ValueError, TypeError):
            pass
    return "jsonl" if hits >= 2 else "json"


def detect_path_format(path: str) -> str:
    """Extension dispatch (reference iterators.py:79-104)."""
    ext = os.path.splitext(path)[1].lower()
    return {
        ".jsonl": "jsonl",
        ".ndjson": "jsonl",
        ".json5": "json5",
        ".hjson": "hjson",
        ".json": "json",
        ".parquet": "parquet",
        ".orc": "orc",
        ".csv": "csv",
        ".avro": "avro",
    }.get(ext, "json")


def read_file(spark: SparkSession, path: str, fmt: str | None = None, **options) -> DataFrame:
    """Read any supported source into a DataFrame."""
    fmt = fmt or detect_path_format(path)
    if fmt == "json":
        return spark.read.options(**options).json(path, multiLine=True)
    if fmt == "jsonl":
        return spark.read.options(**options).json(path)
    if fmt in {"json5", "hjson"}:
        return _read_lenient(spark, path, fmt)
    if fmt == "csv":
        options.setdefault("header", "true")
        options.setdefault("inferSchema", "true")
        return spark.read.options(**options).csv(path)
    return spark.read.options(**options).format(fmt).load(path)


def read_data(spark: SparkSession, text: str) -> DataFrame:
    """In-memory JSON/JSONL string source (reference S7)."""
    fmt = detect_string_format(text)
    if fmt == "jsonl":
        lines = [ln for ln in text.splitlines() if ln.strip()]
    else:
        records = json.loads(text)
        if isinstance(records, dict):
            records = [records]
        lines = [json.dumps(r, ensure_ascii=False) for r in records]
    return spark.read.json(spark.sparkContext.parallelize(lines))


def _read_lenient(spark: SparkSession, path: str, fmt: str) -> DataFrame:
    """JSON5/HJSON; driver-side parse (small-config-file formats).

    Prefers the optional ``json5``/``hjson`` packages (the parsers the
    reference requires, iterators.py:266-319); falls back to the vendored
    spec parser in ``lenient_json`` so these formats work everywhere —
    unlike the reference, a missing package is not fatal.
    """
    with open(path, encoding="utf-8") as fh:
        text = fh.read()
    try:
        if fmt == "json5":
            import json5 as lenient  # type: ignore[import-not-found]
        else:
            import hjson as lenient  # type: ignore[import-not-found]
        data = lenient.loads(text)
    except ImportError:
        from transmog_spark.sources.lenient_json import loads

        data = loads(text, mode=fmt)
    if isinstance(data, dict):
        data = [data]
    return spark.read.json(
        spark.sparkContext.parallelize([json.dumps(r) for r in data])
    )
