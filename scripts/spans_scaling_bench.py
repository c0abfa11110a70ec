#!/usr/bin/env python
"""N-vs-4N scaling evidence for substring span dedup (operators/spans.py).

Same proxy methodology as scripts/scaling_bench.py / bpe_scaling_bench.py
(fresh JVM per parallelism level, fixed 64-partition cluster posture,
best-of-N interleaved walls): the subject is ``strip_duplicate_spans`` —
posexplode n-grams → 8-byte hash partial-count → long-keyed flag join →
per-doc window island merge → HOF token filter — over a deterministic
synthetic corpus where 1/4 of documents embed one of two 16-word
boilerplate blocks (the duplicated-span population) amid common/rare
filler words. This is the shuffle-heaviest operator family in the engine
(two wide exchanges of (id, pos, hash) longs + the per-doc window sort),
so it measures the engine's shuffle path, not a map-only best case.

Usage:
  python scripts/spans_scaling_bench.py [--docs N] [--levels 4,16] [--rounds 2]
  python scripts/spans_scaling_bench.py --child CPUS DOCS PARTS   (internal)

Writes BENCH/spans_scaling.md and BENCH/spans_scaling.json (never touches
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
    "which she do how their if will up other about out many then them these"
).split()

BOILER_A = "subscribe to our newsletter for the latest updates and offers today now".split()
BOILER_B = "all rights reserved terms of service apply privacy policy cookie notice here".split()


def synth_docs(spark, n_docs: int, partitions: int, words_per_doc: int = 60):
    """Deterministic corpus, generated JVM-side: every 4th doc splices a
    16-word boilerplate block (two variants alternate) into the filler
    stream at a hashed offset — the duplicated spans the subject must
    find; filler words are common-pool draws with 1/3 rare suffixes so
    filler n-grams stay (mostly) unique."""
    from pyspark.sql import functions as F

    common = F.array(*[F.lit(w) for w in COMMON])
    boiler_a = F.array(*[F.lit(w) for w in (BOILER_A + BOILER_A[:4])])
    boiler_b = F.array(*[F.lit(w) for w in (BOILER_B + BOILER_B[:4])])
    n_fill = words_per_doc - 20

    def filler(j):
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

    fill = F.array(*[filler(j) for j in range(n_fill)])
    cut = (F.pmod(F.xxhash64(F.lit("o"), F.col("id")), F.lit(n_fill - 1)) + 1).cast(
        "int"
    )
    block = F.when(F.pmod(F.col("id"), F.lit(8)) == 0, boiler_a).otherwise(boiler_b)
    toks = F.when(
        F.pmod(F.col("id"), F.lit(4)) == 0,
        F.concat(F.slice(fill, 1, cut), block, F.slice(fill, cut + 1, n_fill)),
    ).otherwise(fill)
    return spark.range(0, n_docs, 1, partitions).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", toks).alias("text")
    )


def child(cpus: int, n_docs: int, partitions: int) -> None:
    from transmog_spark.operators.spans import strip_duplicate_spans
    from transmog_spark.session import get_spark

    spark = get_spark(f"local[{cpus}]", shuffle_partitions=partitions)
    # input pre-materialized outside the timed region (same rationale as
    # bpe_scaling_bench: inline synthesis is bandwidth-bound and would
    # measure the host bus, not the operator)
    path = f"/tmp/transmog_spans_scaling_{n_docs}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        synth_docs(spark, n_docs, partitions).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    out = strip_duplicate_spans(docs, n=8, min_count=2)

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
    eff = (results[hi]["docs_per_sec"] / results[lo]["docs_per_sec"]) / (hi / lo)
    summary = {
        "subject": "strip_duplicate_spans (n-gram span dedup, shuffle-heavy)",
        "docs": docs,
        "partitions": partitions,
        "levels": {str(c): results[c] for c in levels},
        "efficiency": round(eff, 3),
        "generated": datetime.now(timezone.utc).isoformat(),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "spans_scaling.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    with open(os.path.join(REPO, "BENCH", "spans_scaling.md"), "w") as fh:
        fh.write(
            "# Span dedup scaling (local[%d] vs local[%d])\n\n"
            "Subject: `strip_duplicate_spans` — posexplode 8-grams, 8-byte-hash\n"
            "partial count, long-keyed flag join, per-doc window island merge,\n"
            "HOF token filter — over %s pre-materialized docs x 60 words (1/4\n"
            "embed a 16-word boilerplate block; ~53 grams/doc on the wire as\n"
            "(id, pos, hash) longs). Fixed %d partitions at both levels, fresh\n"
            "JVM per level, best of %d interleaved rounds x 4 executions.\n\n"
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
            "This is the engine's shuffle-heaviest family (two wide exchanges\n"
            "+ a per-doc window sort), so it bounds the engine's scaling from\n"
            "below the map-only subjects (bpe_scaling, pack_concat). Compare\n"
            "against the host's own memory-bandwidth scaling ceiling in\n"
            "BENCH/BASELINE.md before attributing loss to the engine.\n"
        )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
