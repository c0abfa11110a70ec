#!/usr/bin/env python
"""N-vs-4N scaling evidence for the edit-distance similarity join
(operators/editsim.py:fuzzy_pairs).

Same proxy methodology as scripts/scaling_bench.py (fresh JVM per
parallelism level, fixed 64-partition cluster posture, best-of-N
interleaved rounds): the subject is the session's novel join shape —
PassJoin segment blocking (seg + probe key explode, ~20 hashed keys/row
at d=1), one wide self-join on 60-bit block keys, candidate distinct,
and the exact levenshtein verify join — over a deterministic synthetic
short-key table where 1/8 of keys have a planted 1-deletion mutant (the
candidate/verify population) and the rest are hashed word-pool draws
(diverse blocks, bounded bucket sizes).

Usage:
  python scripts/fuzzy_scaling_bench.py [--rows N] [--levels 4,16] [--rounds 2]
  python scripts/fuzzy_scaling_bench.py --child CPUS ROWS PARTS   (internal)

Writes BENCH/fuzzy_scaling.md and BENCH/fuzzy_scaling.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu apple berry cedar dune ember flint grove"
).split()


def synth_keys(spark, n_rows: int, partitions: int):
    """Deterministic short keys (~14-20 chars): two hashed pool words + a
    hashed digit suffix; every 8th row also emits a 1-deletion mutant at
    id + n_rows (the planted near-duplicate population)."""
    from pyspark.sql import functions as F

    pool = F.array(*[F.lit(w) for w in WORDS])

    def w(tag):
        return F.element_at(
            pool,
            (F.pmod(F.xxhash64(F.lit(tag), F.col("id")), F.lit(len(WORDS))) + 1).cast(
                "int"
            ),
        )

    key = F.concat(
        w("a"),
        F.lit("-"),
        w("b"),
        F.lit("-"),
        F.pmod(F.xxhash64(F.lit("n"), F.col("id")), F.lit(997)).cast("string"),
    )
    base = spark.range(0, n_rows, 1, partitions).select(
        F.col("id").alias("doc_id"), key.alias("key")
    )
    mut = base.where(F.col("doc_id") % 8 == 0).select(
        (F.col("doc_id") + n_rows).alias("doc_id"),
        F.expr("substring(key, 2)").alias("key"),
    )
    return base.unionByName(mut)


def child(cpus: int, n_rows: int, partitions: int) -> None:
    from transmog_spark.operators.editsim import fuzzy_pairs
    from transmog_spark.session import get_spark

    spark = get_spark(f"local[{cpus}]", shuffle_partitions=partitions)
    path = f"/tmp/transmog_fuzzy_scaling_{n_rows}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        synth_keys(spark, n_rows, partitions).write.mode("overwrite").parquet(path)
    keys = spark.read.parquet(path)
    out = fuzzy_pairs(keys, "doc_id", "key", max_dist=1)

    walls = []
    for _ in range(4):
        t0 = time.perf_counter()
        out.write.format("noop").mode("overwrite").save()
        walls.append(time.perf_counter() - t0)
    best = min(walls)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "rows": n_rows,
                "walls_sec": [round(x, 3) for x in walls],
                "best_sec": round(best, 3),
                "rows_per_sec": round(n_rows / best, 1),
            }
        )
    )


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "--child":
        child(int(args[1]), int(args[2]), int(args[3]))
        return

    rows = 2_000_000
    levels = (4, 16)
    rounds = 2
    partitions = 64
    it = iter(args)
    for a in it:
        if a == "--rows":
            rows = int(next(it))
        elif a == "--levels":
            levels = tuple(int(x) for x in next(it).split(","))
        elif a == "--rounds":
            rounds = int(next(it))
        elif a == "--partitions":
            partitions = int(next(it))

    results: dict[int, dict] = {}
    for r in range(rounds):
        for cpus in levels:
            proc = subprocess.run(
                [sys.executable, __file__, "--child", str(cpus), str(rows), str(partitions)],
                capture_output=True,
                text=True,
                cwd=REPO,
            )
            line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
            if not line:
                print(proc.stderr[-2000:], file=sys.stderr)
                raise SystemExit(f"child local[{cpus}] produced no output")
            rec = json.loads(line)
            prev = results.get(cpus)
            if prev is None or rec["best_sec"] < prev["best_sec"]:
                results[cpus] = rec
            print(f"round {r + 1} local[{cpus}]: {rec}")

    lo, hi = min(levels), max(levels)
    eff = (results[hi]["rows_per_sec"] / results[lo]["rows_per_sec"]) / (hi / lo)
    summary = {
        "subject": "fuzzy_pairs (PassJoin edit-distance similarity join, d=1)",
        "rows": rows,
        "partitions": partitions,
        "levels": {str(c): results[c] for c in levels},
        "efficiency": round(eff, 3),
        "generated": datetime.now(timezone.utc).isoformat(),
    }
    with open(os.path.join(REPO, "BENCH", "fuzzy_scaling.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    with open(os.path.join(REPO, "BENCH", "fuzzy_scaling.md"), "w") as fh:
        fh.write(
            "# Edit-distance similarity join scaling (local[%d] vs local[%d])\n\n"
            "Subject: `fuzzy_pairs` at d=1 — PassJoin segment+probe key explode\n"
            "(~20 hashed 8-byte keys/row), one wide self-join on the block key,\n"
            "candidate distinct, exact levenshtein verify — over %s\n"
            "pre-materialized short keys (1/8 carry a planted 1-deletion\n"
            "mutant). Fixed %d partitions at both levels, fresh JVM per level,\n"
            "best of %d interleaved rounds x 4 executions.\n\n"
            "| level | best wall (s) | rows/s |\n|---|---|---|\n"
            % (lo, hi, f"{rows:,}", partitions, rounds)
        )
        for c in levels:
            fh.write(
                f"| local[{c}] | {results[c]['best_sec']} | "
                f"{results[c]['rows_per_sec']:,} |\n"
            )
        fh.write(
            f"\n**Scaling efficiency ({lo}->{hi} cores): {eff:.3f}**\n\n"
            "The join shuffles only 8-byte hashed block keys + ids; verify\n"
            "joins short strings keyed by id. Compare against the host's\n"
            "memory-bandwidth ceiling (BENCH/BASELINE.md) before attributing\n"
            "loss to the engine.\n"
        )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
