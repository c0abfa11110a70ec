#!/usr/bin/env python
"""N-vs-4N scaling evidence for line-level dedup (operators/lines.py).

Same proxy methodology as scripts/spans_scaling_bench.py (fresh JVM per
parallelism level, fixed 64-partition cluster posture, best-of-N
interleaved walls): the subject is ``strip_duplicated_lines`` —
posexplode lines → 8-byte trimmed-line hash → corpus-wide partial count
→ long-keyed flag join → per-doc collect_list → HOF line filter + md5
fingerprint — over a deterministic synthetic corpus where 1/3 of
documents embed one of two boilerplate lines (the duplicated-line
population, CCNet/RefinedWeb shape) amid unique-ish filler lines. Wire
shape: ~12 (id, pos, hash) long rows per doc — the same exchange family
as span dedup but at line granularity.

Usage:
  python scripts/lines_scaling_bench.py [--docs N] [--levels 4,16] [--rounds 2]
  python scripts/lines_scaling_bench.py --child CPUS DOCS PARTS   (internal)

Writes BENCH/lines_scaling.md and BENCH/lines_scaling.json (never touches
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

BOILER_A = "subscribe to our newsletter for the latest updates and offers"
BOILER_B = "all rights reserved terms of service apply privacy policy"

LINES_PER_DOC = 12
WORDS_PER_LINE = 8


def synth_docs(spark, n_docs: int, partitions: int):
    """Deterministic corpus, generated JVM-side: every 3rd doc replaces
    one line (hashed position) with a boilerplate line (two variants
    alternate) — the corpus-wide duplicated lines the subject must strip;
    filler lines mix common words with 1/3 rare suffixes so they stay
    (mostly) unique."""
    from pyspark.sql import functions as F

    common = F.array(*[F.lit(w) for w in COMMON])

    def word(line_i: int, j: int):
        h1 = F.pmod(
            F.xxhash64(F.col("id"), F.lit(line_i), F.lit(j)), F.lit(len(COMMON))
        )
        base = F.element_at(common, (h1 + 1).cast("int"))
        h2 = F.pmod(
            F.xxhash64(F.lit("r"), F.col("id"), F.lit(line_i), F.lit(j)), F.lit(3)
        )
        rare = F.concat(
            base,
            F.pmod(
                F.xxhash64(F.lit("s"), F.col("id"), F.lit(line_i), F.lit(j)),
                F.lit(65521),
            ).cast("string"),
        )
        return F.when(h2 == 0, rare).otherwise(base)

    def line(line_i: int):
        return F.concat_ws(
            " ", F.array(*[word(line_i, j) for j in range(WORDS_PER_LINE)])
        )

    lines = F.array(*[line(i) for i in range(LINES_PER_DOC)])
    pos = F.pmod(F.xxhash64(F.lit("o"), F.col("id")), F.lit(LINES_PER_DOC)).cast(
        "int"
    )
    boiler = F.when(F.pmod(F.col("id"), F.lit(6)) == 0, F.lit(BOILER_A)).otherwise(
        F.lit(BOILER_B)
    )
    with_boiler = F.transform(
        lines,
        lambda x, i: F.when(
            (F.pmod(F.col("id"), F.lit(3)) == 0) & (i == pos), boiler
        ).otherwise(x),
    )
    return spark.range(0, n_docs, 1, partitions).select(
        F.col("id").alias("doc_id"),
        F.concat_ws("\n", with_boiler).alias("text"),
    )


def child(cpus: int, n_docs: int, partitions: int) -> None:
    from transmog_spark.operators.lines import strip_duplicated_lines
    from transmog_spark.session import get_spark

    spark = get_spark(f"local[{cpus}]", shuffle_partitions=partitions)
    # input pre-materialized outside the timed region (inline synthesis is
    # bandwidth-bound and would measure the host bus, not the operator);
    # cache key includes every parameter that shapes the corpus/layout so
    # a rerun with different --partitions (or edited shape constants)
    # regenerates instead of silently reusing a stale layout
    path = (
        f"/tmp/transmog_lines_scaling_{n_docs}_{partitions}"
        f"_{LINES_PER_DOC}x{WORDS_PER_LINE}"
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        synth_docs(spark, n_docs, partitions).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    out = strip_duplicated_lines(docs, min_count=2, min_chars=4)

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
        "subject": "strip_duplicated_lines (line-level dedup, shuffle + window)",
        "docs": docs,
        "partitions": partitions,
        "levels": {str(c): results[c] for c in levels},
        "efficiency": round(eff, 3),
        "generated": datetime.now(timezone.utc).isoformat(),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "lines_scaling.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    with open(os.path.join(REPO, "BENCH", "lines_scaling.md"), "w") as fh:
        fh.write(
            "# Line dedup scaling (local[%d] vs local[%d])\n\n"
            "Subject: `strip_duplicated_lines` — posexplode lines, 8-byte\n"
            "trimmed-line hash, corpus-wide partial count, long-keyed flag\n"
            "join, per-doc collect_list + HOF filter + md5 fingerprint — over\n"
            "%s pre-materialized docs x 12 lines (1/3 embed a corpus-wide\n"
            "boilerplate line; ~12 (id, pos, hash) longs/doc on the wire).\n"
            "Fixed %d partitions at both levels, fresh JVM per level, best of\n"
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
            "Same exchange family as span dedup (BENCH/spans_scaling.md) at\n"
            "line granularity; the reassembly join additionally ships full\n"
            "document text once. Compare against the host's memory-bandwidth\n"
            "scaling ceiling in BENCH/BASELINE.md before attributing loss to\n"
            "the engine.\n"
        )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
