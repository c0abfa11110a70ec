"""Snapshot-versioned parquet tables: Iceberg's read model, from scratch.

The production target (north rule) is an Iceberg catalog —
``sources/tables.py`` switches to it when configured. This module gives
the parquet fallback the part of Iceberg the training-data tier actually
leans on: **named immutable snapshots with time travel**, so a training
run can pin its input ("train on snapshot 7") and reproduce it bit-for-
bit later while ingest keeps appending, and an audit can ask "what did
the corpus look like when shard manifest X was cut?".

Layout (all under the table root):

    data/gen-{version}-{token}/part-*.parquet   -- immutable data dirs
    snapshots/v{version}.json                   -- manifest per snapshot

A manifest lists the data DIRS visible in that snapshot (append = parent
dirs + the new dir; overwrite = the new dir only). The manifest file is
the single commit point, written via tmp-file + ``os.rename`` (atomic on
POSIX): a crash mid-write leaves data dirs that no manifest references —
invisible to every reader, garbage-collected by ``expire_snapshots``.
Optimistic single-writer concurrency: two racing commits compute the
same next version; ``os.link``-style exclusive create (``O_EXCL``) makes
the loser fail loudly instead of clobbering.

Scale shape: manifests hold directory names, not file lists — O(commits)
driver-side metadata regardless of data volume; reads hand Spark the dir
list and planning/pruning proceed as for any multi-path parquet scan.
Readers never list ``data/`` (which may contain uncommitted dirs), only
the manifest's dirs.

No reference analog; engine-tier infrastructure (SURVEY.md §2.10).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_SNAP_DIR = "snapshots"
_DATA_DIR = "data"


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(root, _SNAP_DIR, f"v{version}.json")


def snapshot_log(root: str) -> list[dict]:
    """All committed snapshots, ascending by version."""
    snap_dir = os.path.join(root, _SNAP_DIR)
    if not os.path.isdir(snap_dir):
        return []
    out = []
    for name in os.listdir(snap_dir):
        if name.startswith("v") and name.endswith(".json"):
            with open(os.path.join(snap_dir, name)) as fh:
                out.append(json.load(fh))
    return sorted(out, key=lambda m: m["version"])


def _resolve(root: str, version: int | None, as_of_ms: int | None) -> dict:
    log = snapshot_log(root)
    if not log:
        raise FileNotFoundError(f"no snapshots under {root}")
    if version is not None:
        for m in log:
            if m["version"] == version:
                return m
        raise ValueError(f"snapshot v{version} not found under {root}")
    if as_of_ms is not None:
        eligible = [m for m in log if m["timestamp_ms"] <= as_of_ms]
        if not eligible:
            raise ValueError(f"no snapshot at or before {as_of_ms} under {root}")
        return eligible[-1]
    return log[-1]


def snapshot_write(df: DataFrame, root: str, *, mode: str = "append") -> int:
    """Commit ``df`` as a new snapshot; returns the new version.

    ``mode='append'`` adds the rows to the previous snapshot's view;
    ``mode='overwrite'`` replaces the view. Either way every prior
    snapshot stays readable until ``expire_snapshots``.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    log = snapshot_log(root)
    parent = log[-1] if log else None
    version = (parent["version"] + 1) if parent else 1
    gen = f"gen-{version}-{uuid.uuid4().hex[:8]}"
    data_path = os.path.join(root, _DATA_DIR, gen)
    df.write.mode("error").parquet(data_path)

    dirs = [gen]
    if mode == "append" and parent is not None:
        dirs = parent["dirs"] + dirs
    manifest = {
        "version": version,
        "parent": parent["version"] if parent else None,
        "mode": mode,
        "timestamp_ms": int(time.time() * 1000),
        "dirs": dirs,
    }
    os.makedirs(os.path.join(root, _SNAP_DIR), exist_ok=True)
    final = _manifest_path(root, version)
    tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    # exclusive link = optimistic lock: a racing writer of the same
    # version fails with FileExistsError instead of clobbering
    os.link(tmp, final)
    os.unlink(tmp)
    return version


def snapshot_read(
    spark: SparkSession,
    root: str,
    *,
    version: int | None = None,
    as_of_ms: int | None = None,
) -> DataFrame:
    """Read a snapshot: latest by default, a pinned ``version``, or time
    travel to the newest snapshot committed at/before ``as_of_ms``."""
    m = _resolve(root, version, as_of_ms)
    paths = [os.path.join(root, _DATA_DIR, d) for d in m["dirs"]]
    return spark.read.parquet(*paths)


def expire_snapshots(root: str, *, keep_last: int = 1) -> dict:
    """Drop all but the newest ``keep_last`` manifests and delete data
    dirs no surviving snapshot references (including uncommitted orphans
    from crashed writes). Returns {"kept": [...], "deleted_dirs": n}."""
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    log = snapshot_log(root)
    keep, drop = log[-keep_last:], log[:-keep_last]
    for m in drop:
        os.unlink(_manifest_path(root, m["version"]))
    live = {d for m in keep for d in m["dirs"]}
    data_dir = os.path.join(root, _DATA_DIR)
    deleted = 0
    if os.path.isdir(data_dir):
        for d in os.listdir(data_dir):
            if d not in live:
                shutil.rmtree(os.path.join(data_dir, d))
                deleted += 1
    return {"kept": [m["version"] for m in keep], "deleted_dirs": deleted}


def snapshot_diff(
    spark: SparkSession,
    root: str,
    v_old: int,
    v_new: int,
    *,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """What changed between two snapshots, per source: (source, n_added,
    n_removed, n_old, n_new) — the ingest-audit companion to time travel
    ("snapshot 9 added 40M docs to src2 and dropped 1.2M from src5; does
    that match the crawler logs?").

    Scale shape: append-mode snapshots share their parent data dirs, so
    the diff prunes to the SYMMETRIC-DIFFERENCE dirs — added docs are
    read only from dirs new-but-not-old and removed docs only from dirs
    old-but-not-new, never a full two-snapshot anti-join. Overwrite-mode
    snapshots share nothing and degrade to the honest full compare using
    a left-anti join on ``id_col`` in each direction.
    """
    from pyspark.sql import functions as F

    mo, mn = _resolve(root, v_old, None), _resolve(root, v_new, None)
    old_dirs, new_dirs = set(mo["dirs"]), set(mn["dirs"])

    def read(dirs: set[str]) -> DataFrame | None:
        if not dirs:
            return None
        paths = [os.path.join(root, _DATA_DIR, d) for d in sorted(dirs)]
        return spark.read.parquet(*paths).select(
            F.col(id_col).alias("__id"), F.col(source_col).alias("source")
        )

    only_new, only_old = read(new_dirs - old_dirs), read(old_dirs - new_dirs)
    shared = bool(old_dirs & new_dirs)

    def minus(a: DataFrame | None, b: DataFrame | None) -> DataFrame | None:
        """(id, source) pairs in a but not b — keyed on BOTH so a doc that
        moved source shows as removed from the old ledger and added to the
        new one; when the snapshots share dirs the shared part cancels, so
        only the symmetric-difference frames compare."""
        if a is None:
            return None
        if b is None and shared:
            return a  # everything in the extra dirs is net change
        other = b if b is not None else a.limit(0)
        return a.join(other, ["__id", "source"], "left_anti")

    def counts(d: DataFrame | None, name: str) -> DataFrame:
        if d is None:
            return spark.createDataFrame([], f"source string, {name} long")
        return d.groupBy("source").agg(F.count(F.lit(1)).alias(name))

    added = counts(minus(only_new, only_old), "n_added")
    removed = counts(minus(only_old, only_new), "n_removed")

    def totals(m: dict, name: str) -> DataFrame:
        paths = [os.path.join(root, _DATA_DIR, d) for d in m["dirs"]]
        return (
            spark.read.parquet(*paths)
            .groupBy(F.col(source_col).alias("source"))
            .agg(F.count(F.lit(1)).alias(name))
        )

    out = (
        totals(mo, "n_old")
        .join(totals(mn, "n_new"), "source", "full")
        .join(added, "source", "left")
        .join(removed, "source", "left")
    )
    z = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
    return out.select("source", z("n_added"), z("n_removed"), z("n_old"), z("n_new"))
