#!/usr/bin/env python
"""Optimization-round measurement harness (guide §1) — NOT the driver bench.

Per query: one untimed warm execution, then best-of-N split timings of

* ``build``  — Python plan construction (the ``fn()`` call itself, i.e.
  py4j expression-tree building + any driver-side model/index memo hits),
* ``exec``   — noop-sink execution of a PRE-BUILT DataFrame (Catalyst
  analysis/optimization/physical planning + stage execution),
* ``total``  — fn() + noop, the exact quantity bench.py times.

Usage::

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
        python bench_extra.py semdedup dup_spans ...

Prints one JSON line per query. bench.py stays the frozen driver contract;
this file exists so per-query optimization work can cite phase-resolved
numbers (OPTIMIZATION_r06.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    names = sys.argv[1:]

    from transmog_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    def _force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(name)
        _force(fn(spark, sf_dir))  # warm: codegen/JIT + memoized builds
        best_b = best_e = best_t = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            _force(df)
            t2 = time.perf_counter()
            best_b = min(best_b, t1 - t0)
            best_e = min(best_e, t2 - t1)
            best_t = min(best_t, t2 - t0)
        print(
            json.dumps(
                {
                    "query": name,
                    "build": round(best_b, 3),
                    "exec": round(best_e, 3),
                    "total": round(best_t, 3),
                }
            ),
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
