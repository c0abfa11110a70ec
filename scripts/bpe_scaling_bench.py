#!/usr/bin/env python
"""N-vs-4N scaling evidence for the BPE encode path (operators/bpe.py).

Same proxy methodology as scripts/scaling_bench.py (fresh JVM per
parallelism level, fixed 64-partition cluster posture, best-of-N walls):
the subject here is the Arrow-batched pandas-UDF encoder — the one
Python-side hot path in the engine — over a deterministic synthetic
corpus with a Zipf-ish vocabulary (80% draws from a 64-word common pool,
20% "rare" words with hashed numeric suffixes, ~260k distinct). A
map-only stage with per-batch word caching should scale ~linearly with
cores: each task owns a Python worker, there is no shuffle and no shared
state, so any efficiency loss is Arrow/IPC overhead or host contention,
not algorithm.

Usage:
  python scripts/bpe_scaling_bench.py [--docs N] [--levels 4,16] [--rounds 2]
  python scripts/bpe_scaling_bench.py --child CPUS DOCS PARTS   (internal)

Writes BENCH/bpe_scaling.md and BENCH/bpe_scaling.json (never touches
BENCH/BASELINE.md).
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

COMMON = (
    "the of and to in is that it for was with as on at by an be this have "
    "from or one had not but what all were when we there can said use each "
    "which she do how their if will up other about out many then them these "
    "so some her would make like him into time has look two more write go see"
).split()


def synth_docs(spark, n_docs: int, partitions: int, words_per_doc: int = 40):
    """Deterministic text corpus, generated JVM-side (no RNG, no Python)."""
    from pyspark.sql import functions as F

    common = F.array(*[F.lit(w) for w in COMMON])

    def word(j):
        h1 = F.pmod(F.xxhash64(F.col("id"), F.lit(j)), F.lit(len(COMMON)))
        base = F.element_at(common, (h1 + 1).cast("int"))
        h2 = F.pmod(F.xxhash64(F.lit("r"), F.col("id"), F.lit(j)), F.lit(3))
        rare = F.concat(
            base,
            F.pmod(F.xxhash64(F.lit("s"), F.col("id"), F.lit(j)), F.lit(65521)).cast(
                "string"
            ),
        )
        return F.when(h2 == 0, rare).otherwise(base)

    text = F.concat_ws(" ", *[word(j) for j in range(words_per_doc)])
    return spark.range(0, n_docs, 1, partitions).select(
        F.col("id").alias("doc_id"), text.alias("text")
    )


def child(cpus: int, n_docs: int, partitions: int) -> None:
    from transmog_spark.operators.bpe import bpe_tokenize, seed_merges
    from transmog_spark.session import get_spark

    spark = get_spark(f"local[{cpus}]", shuffle_partitions=partitions)
    # materialize the input OUTSIDE the timed region: generating it inline
    # (80 xxhash64 calls/doc, JVM-side) is bandwidth-bound on this host
    # (BENCH/membw.json: 0.533 scaling 4->16) and would measure the bus,
    # not the encoder — the subject is scan + pretokenize + Python encode
    path = f"/tmp/transmog_bpe_scaling_{n_docs}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        synth_docs(spark, n_docs, partitions).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    out = bpe_tokenize(docs, list(seed_merges()))

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
                "docs": n_docs,
                "walls_sec": [round(w, 3) for w in walls],
                "best_sec": round(best, 3),
                "docs_per_sec": round(n_docs / best, 1),
            }
        )
    )


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "--child":
        child(int(args[1]), int(args[2]), int(args[3]))
        return

    docs = 1_000_000
    levels = (4, 16)
    rounds = 2
    partitions = 64
    it = iter(args)
    for a in it:
        if a == "--docs":
            docs = int(next(it))
        elif a == "--levels":
            levels = tuple(int(x) for x in next(it).split(","))
        elif a == "--rounds":
            rounds = int(next(it))
        elif a == "--partitions":
            partitions = int(next(it))

    results: dict[int, dict] = {}
    # interleave levels across rounds so host bursts hit both equally
    for r in range(rounds):
        for cpus in levels:
            proc = subprocess.run(
                [sys.executable, __file__, "--child", str(cpus), str(docs), str(partitions)],
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
    thr_lo = results[lo]["docs_per_sec"]
    thr_hi = results[hi]["docs_per_sec"]
    factor = hi / lo
    eff = (thr_hi / thr_lo) / factor
    summary = {
        "subject": "bpe_tokenize (Arrow pandas-UDF encode, map-only)",
        "docs": docs,
        "partitions": partitions,
        "levels": {str(c): results[c] for c in levels},
        "efficiency": round(eff, 3),
        "generated": datetime.now(timezone.utc).isoformat(),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "bpe_scaling.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    with open(os.path.join(REPO, "BENCH", "bpe_scaling.md"), "w") as fh:
        fh.write(
            "# BPE encode scaling (local[%d] vs local[%d])\n\n"
            "Subject: `bpe_tokenize` — parquet scan + pre-tokenize (JVM regex) +\n"
            "Arrow-batched pandas-UDF BPE encode + md5 token-stream digest over a\n"
            "pre-materialized corpus (input synthesis excluded: it is\n"
            "bandwidth-bound and would measure the host bus, BENCH/membw.json),\n"
            "%s docs x 40 words (1/3 rare-suffixed, ~2M distinct vocabulary),\n"
            "fixed %d partitions at both levels, fresh JVM per level, best of\n"
            "%d interleaved rounds x 4 executions.\n\n"
            "| level | best wall (s) | docs/s |\n|---|---|---|\n"
            % (lo, hi, f"{docs:,}", partitions, rounds)
        )
        for c in levels:
            fh.write(
                f"| local[{c}] | {results[c]['best_sec']} | "
                f"{results[c]['docs_per_sec']:,} |\n"
            )
        fh.write(
            f"\n**Scaling efficiency ({lo}->{hi} cores): {eff:.3f}**\n\n"
            "Map-only Python stage: each task owns its Python worker, no\n"
            "shuffle, no shared state — the loss vs 1.0 is Arrow/IPC overhead\n"
            "plus host contention (see BENCH/BASELINE.md for the host's own\n"
            "bandwidth scaling ceiling). On a real cluster N->4N executors\n"
            "also bring 4x memory channels and 4x Python workers, so this\n"
            "local proxy is a lower bound.\n"
        )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
