#!/usr/bin/env python
"""Skew evidence for the BM25 term-keyed join (operators/corpus.py:bm25_scores).

Stopword terms are Zipf-hot on the ``tf.join(dfreq, "term")`` shuffle: in a
boilerplate-heavy corpus every document contributes a tf row for every
boilerplate term, so a handful of join keys concentrate most of the rows.
At 100 TB the per-term dfreq side is itself too large to broadcast
(billions of distinct tokens), so the join is sort-merge and the hot keys
become straggler partitions — exactly what AQE skew-join splitting exists
for.

Two measurements, both on a corpus where ONE mega-hot term (x16
occurrences, like a real stopword) appears in every document:

1. **isolated term join** — tf and dfreq are materialized to parquet
   (mirroring bm25's two partial-agg groupBys), then ONLY the term-keyed
   join + score projection is timed. This is the stage skew actually hits;
   with 1 of ~N·2 join keys carrying ~33% of the rows, the skew-off plan
   serializes that partition in one task.
2. **end-to-end bm25** — the full operator. Earlier rounds of this bench
   measured speedup ≈ 0.9-1.0 end-to-end: the explode + groupBy stages
   dominate the wall and hide the join-stage straggler at local scale.
   Recorded as context, not as the skew claim.

Hot-key count must be << shuffle partitions for skew to exist at all — 16
hot keys over 16 partitions balances naturally (measured: 0.91 i.e.
none). The sort-merge shape is forced (broadcast disabled, the at-scale
vocabulary regime); AQE skew thresholds are scaled to bench data volume
(16 MB / advisory 8 MB vs the 256 MB production default) so the splitter
engages locally — the mechanics are identical, only the byte thresholds
differ. Partition coalescing is disabled for both variants to isolate the
skew effect.

Interleaved best-of-N in one JVM (plan/codegen warm); verifies the two
variants are row-identical, then writes BENCH/skew_bm25.json + .md.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python scripts/bm25_skew_bench.py \
           [--docs N] [--runs 4]
(48g driver heap: the join sorts millions of rows locally; the default
16g spills and the spill noise swamps the skew signal)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BM25_K1, BM25_B = 1.5, 0.75


def main() -> None:
    args = sys.argv[1:]
    n_docs = int(args[args.index("--docs") + 1]) if "--docs" in args else 3_000_000
    runs = int(args[args.index("--runs") + 1]) if "--runs" in args else 4

    from pyspark.sql import functions as F

    from transmog_spark.operators.corpus import bm25_scores
    from transmog_spark.operators.text import ws_tokens
    from transmog_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark(
        f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            # at-scale shape: dfreq (per-term) side too big to broadcast
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
            # isolate the skew effect from coalescing differences
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
            # engage the splitter at bench volume (prod default: 256m/0.2×64m)
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16m",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
        },
    )

    # ONE mega-hot term ("the" x16) + 2 unique terms per doc -> 1 of the
    # ~2·N join keys carries 1/3 of all tf rows
    boiler = " ".join(["the"] * 16)
    corpus = spark.range(0, n_docs, 1, cpus * 2).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit(boiler),
            F.concat(F.lit("u"), F.col("id")),
            F.concat(F.lit("v"), F.col("id")),
        ).alias("text"),
    )

    # --- materialize bm25's pre-join intermediates (same shapes as the
    # operator's two partial-agg groupBys) -------------------------------
    tmp = tempfile.mkdtemp(prefix="bm25skew-")
    base = corpus.select("doc_id", ws_tokens(F.col("text")).alias("__t"))
    exploded = base.select(
        "doc_id", F.size("__t").alias("dl"), F.explode("__t").alias("term")
    )
    tf = exploded.groupBy("doc_id", "dl", "term").agg(F.count(F.lit(1)).alias("tf"))
    tf.write.parquet(f"{tmp}/tf")
    tf_r = spark.read.parquet(f"{tmp}/tf")
    dfreq = tf_r.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dfreq.write.parquet(f"{tmp}/dfreq")
    dfreq_r = spark.read.parquet(f"{tmp}/dfreq")
    n_total = float(n_docs)
    avgdl = 18.0  # constant by construction: 16 boilerplate + 2 unique

    def join_df():
        j = tf_r.join(dfreq_r, "term")
        idf = F.log((n_total - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
        denom = F.col("tf") + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / avgdl)
        return j.select(
            "doc_id", "term", "tf", F.round(idf * F.col("tf") * (BM25_K1 + 1.0) / denom, 4).alias("bm25")
        )

    def set_skew(on: bool) -> None:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(on).lower())

    def timed(mk) -> float:
        t0 = time.perf_counter()
        mk().write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    # row-identity fingerprints (cheap aggregate), plus plan warm-up
    def fingerprint(mk):
        return (
            mk()
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum(F.hash("doc_id", "term", "tf", "bm25").cast("long")).alias("h"),
            )
            .collect()[0]
        )

    set_skew(False)
    fp_off = fingerprint(join_df)
    set_skew(True)
    fp_on = fingerprint(join_df)
    assert (fp_off.rows, fp_off.h) == (fp_on.rows, fp_on.h), (fp_off, fp_on)

    walls: dict[str, list[float]] = {
        "join_skew_off": [], "join_skew_on": [],
        "e2e_skew_off": [], "e2e_skew_on": [],
    }
    e2e = lambda: bm25_scores(corpus)  # noqa: E731
    set_skew(False)
    timed(e2e)  # warm the e2e plan shape too
    for _ in range(runs):
        set_skew(False)
        walls["join_skew_off"].append(timed(join_df))
        set_skew(True)
        walls["join_skew_on"].append(timed(join_df))
    for _ in range(max(1, runs // 2)):
        set_skew(False)
        walls["e2e_skew_off"].append(timed(e2e))
        set_skew(True)
        walls["e2e_skew_on"].append(timed(e2e))

    best = {k: min(v) for k, v in walls.items()}
    join_speedup = best["join_skew_off"] / best["join_skew_on"]
    e2e_speedup = best["e2e_skew_off"] / best["e2e_skew_on"]
    shutil.rmtree(tmp, ignore_errors=True)
    summary = {
        "metric": "bm25_term_join_skewjoin_speedup",
        "docs": n_docs,
        "hot_terms": 1,
        "hot_row_share": 1 / 3,
        "rows_identical": True,
        "join_rows": fp_on.rows,
        "cpus": cpus,
        "walls": walls,
        "best_sec": best,
        "join_speedup": round(join_speedup, 3),
        "e2e_speedup": round(e2e_speedup, 3),
        "measured_at": datetime.now(timezone.utc).isoformat(),
    }
    with open(f"{REPO}/BENCH/skew_bm25.json", "w") as f:
        json.dump(summary, f, indent=2)
    with open(f"{REPO}/BENCH/skew_bm25.md", "w") as f:
        f.write(
            "# BENCH — BM25 term-join skew (AQE skewJoin)\n\n"
            f"Boilerplate-heavy corpus ({n_docs:,} docs, one mega-hot term x16 "
            "occurrences + 2 unique terms/doc -> 1 join key carries 1/3 of the "
            f"{fp_on.rows:,} tf rows), sort-merge forced (broadcast off, "
            f"at-scale vocabulary shape), local[{cpus}], interleaved "
            f"best-of-{runs}; skew thresholds scaled to bench volume "
            "(16m/8m vs the 256m production default — same mechanics):\n\n"
            + "| measurement | skew off (s) | skew on (s) | speedup |\n|---|---|---|---|\n"
            + f"| isolated term join (the stage skew hits) | {best['join_skew_off']} "
            f"| {best['join_skew_on']} | **{join_speedup:.2f}x** |\n"
            + f"| end-to-end bm25 (explode+groupBys dominate) | {best['e2e_skew_off']} "
            f"| {best['e2e_skew_on']} | {e2e_speedup:.2f}x |\n"
            + "\nRow-identical outputs under both settings. At production scale "
            "the join stage's weight grows with corpus size while the "
            "per-partition agg cost stays map-side — the isolated number is "
            "the one that matters at 100 TB.\n"
        )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
