#!/usr/bin/env python
"""N-vs-4N scaling evidence for PMI co-occurrence (operators/cooc.py).

Same proxy methodology as scripts/nb_scaling_bench.py (fresh JVM per
parallelism level, fixed 64-partition cluster posture, best-of-N walls):
the subject is ``cooc_pairs`` — per-row shifted-zip pair generation
(docs × words × window pair rows), the canonicalized (tok_a, tok_b)
map-side-combined count shuffle (the dominant cost: pair keys over a wide
vocabulary combine poorly, so this is a genuinely shuffle-bound subject,
the spans/lines family), the unigram count pass, and the broadcast
scoring joins — over a deterministic corpus mixing a hot common-word pool
(heavy pair keys, exercises the combiner) with a 65521-word wide
vocabulary (near-unique pair keys, exercises the wire).

Usage:
  python scripts/cooc_scaling_bench.py [--docs N] [--levels 4,16] [--rounds 2]
  python scripts/cooc_scaling_bench.py --child CPUS DOCS PARTS   (internal)

Writes BENCH/cooc_scaling.md and BENCH/cooc_scaling.json (never touches
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

WORDS_PER_DOC = 32


def synth_docs(spark, n_docs: int, partitions: int):
    """Deterministic corpus: each word 50/50 a hot common word or a wide-
    vocabulary token (w{h}, 65521-word space) — hot pair keys for the
    map-side combiner AND near-unique pair keys for the shuffle wire."""
    from pyspark.sql import functions as F

    common = F.array(*[F.lit(w) for w in COMMON])

    def word(j: int):
        h1 = F.pmod(F.xxhash64(F.col("id"), F.lit(j)), F.lit(len(COMMON)))
        base = F.element_at(common, (h1 + 1).cast("int"))
        ww = F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.lit("ww"), F.col("id"), F.lit(j)), F.lit(65521))
            .cast("string"),
        )
        pick = F.pmod(F.xxhash64(F.lit("p"), F.col("id"), F.lit(j)), F.lit(2))
        return F.when(pick == 0, ww).otherwise(base)

    text = F.concat_ws(" ", F.array(*[word(j) for j in range(WORDS_PER_DOC)]))
    return spark.range(0, n_docs, 1, partitions).select(
        F.col("id").alias("doc_id"), text.alias("text")
    )


def child(cpus: int, n_docs: int, partitions: int, hashed: bool = False) -> None:
    from transmog_spark.operators.cooc import cooc_pairs
    from transmog_spark.session import get_spark

    spark = get_spark(f"local[{cpus}]", shuffle_partitions=partitions)
    # input pre-materialized outside the timed region (inline synthesis is
    # bandwidth-bound and would measure the host bus, not the operator)
    path = f"/tmp/transmog_cooc_scaling_{n_docs}_{partitions}_{WORDS_PER_DOC}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        synth_docs(spark, n_docs, partitions).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    out = cooc_pairs(docs, window=2, min_count=2, k=100, hashed_wire=hashed)

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
                "hashed_wire": hashed,
                "walls_sec": [round(w, 3) for w in walls],
                "best_sec": round(best, 3),
                "docs_per_sec": round(n_docs / best, 1),
            }
        )
    )


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "--child":
        child(int(args[1]), int(args[2]), int(args[3]), len(args) > 4)
        return

    docs = 2_000_000
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
                [
                    sys.executable, __file__, "--child",
                    str(cpus), str(docs), str(partitions),
                ],
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
        "subject": "cooc_pairs (shifted-zip pair gen, canonical pair-count shuffle, broadcast scoring)",
        "docs": docs,
        "partitions": partitions,
        "levels": {str(c): results[c] for c in levels},
        "efficiency": round(eff, 3),
        "generated": datetime.now(timezone.utc).isoformat(),
    }
    with open(os.path.join(REPO, "BENCH", "cooc_scaling.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    with open(os.path.join(REPO, "BENCH", "cooc_scaling.md"), "w") as fh:
        fh.write(
            "# PMI co-occurrence scaling (local[%d] vs local[%d])\n\n"
            "Subject: `cooc_pairs` window=2 over %s pre-materialized docs\n"
            "x %d words (50/50 hot common pool / 65521-word wide vocab):\n"
            "~%dM canonicalized pair rows through one map-side-combined\n"
            "count shuffle + unigram pass + broadcast scoring joins.\n"
            "Fresh JVM per level, fixed %d partitions, best-of-4 walls,\n"
            "best-of-%d interleaved rounds.\n\n"
            % (
                lo, hi, f"{docs:,}", WORDS_PER_DOC,
                round(docs * (WORDS_PER_DOC * 2 - 3) / 1e6), partitions, rounds,
            )
        )
        fh.write("| level | best wall (s) | docs/s |\n|---|---|---|\n")
        for c in (lo, hi):
            rec = results[c]
            fh.write(
                f"| local[{c}] | {rec['best_sec']} | {rec['docs_per_sec']:,} |\n"
            )
        fh.write(
            f"\n**Scaling efficiency {lo}->{hi}: {round(eff, 3)}** "
            f"(1.0 = perfect {hi // lo}x)\n"
        )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
