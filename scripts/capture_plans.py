#!/usr/bin/env python
"""Capture .explain("formatted") for named queries into plans/<tag>/.

Usage::

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/capture_plans.py \
        r06 before semdedup dup_spans ...

Writes plans/<tag>/<query>_<suffix>.txt per query. Plan-only (no
execution) except where a query's build step runs bounded driver
aggregations (centroid/codebook training, index materialization) by
design.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    tag, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from transmog_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", flush=True)


if __name__ == "__main__":
    main()
