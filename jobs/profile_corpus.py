#!/usr/bin/env python
"""Corpus profiling job (spark-submit entry point): the telemetry pass a
training-data team runs before (and after) every curation change.

Composes the engine's bounded-state/profile operators — all of them
oracle-gated individually — into one read of the corpus plus a handful of
sketch-sized aggregates, and writes a profile directory:

* ``<out>/source_stats/``    — per-source doc counts + whitespace-token
                               totals/means (the mixing denominators).
* ``<out>/token_quantiles/`` — per-source p50/p90/p99 token counts from
                               the mergeable HDR sketch (rel err <= 1/k;
                               sketch-only — the exact-quantile rider is
                               a corpus sort and belongs in QA runs).
* ``<out>/lang_mix/``        — per-source × lang doc counts (n-gram
                               heuristic lang-ID).
* ``<out>/quality/``         — per-source mean quality score + low-quality
                               rate (score < --quality-floor).
* ``<out>/heavy_terms/``     — Count-Min heavy hitters at --cms-threshold
                               (boilerplate candidates for line dedup).
* ``<out>/vocab_drift/``     — per-source unigram KL divergence vs the
                               blended corpus (the domain-shift monitor:
                               compare across snapshots to spot a source
                               whose scrape quality changed).
* ``<out>/mixture_weights/`` — α-sampling (temperature) mixture table:
                               natural share, target share q ∝ p^α, and the
                               fractional-epoch multiplier that realizes it
                               (feed straight into epoch_mixture).
* ``<out>/entropy/``         — (``--entropy`` only) per-source mean char/
                               token Shannon entropy + low-token-entropy
                               rate (template-spam screen telemetry); its
                               cost is a second tokenizing pass, hence
                               opt-in.
* ``<out>/ngram_diversity/`` — (``--diversity`` only) per-source
                               distinct-n/total-n ratios for n=1..3 (the
                               mirror/template detector); same opt-in
                               reasoning.
* ``<out>/dedup_stats/``     — (``--dedup-report`` only) per-source near-dup
                               drop rates; ``<out>/dup_size_hist/`` the
                               cluster-size distribution. The one optional
                               section whose cost is corpus-shaped (a full
                               MinHash-LSH pass), hence opt-in.
* ``<out>/_PROFILE.json``    — corpus-level scalars: doc count, token sum,
                               HLL distinct-token estimate, parameters.

Every section is a small table (sources × constants, sketch-sized), so the
job's output is readable regardless of corpus size; the corpus itself is
scanned a bounded number of times and never collected.

Cluster usage:

    spark-submit --master yarn --deploy-mode cluster \
      --num-executors 100 --executor-cores 4 --executor-memory 16g \
      --py-files transmog_spark.zip \
      jobs/profile_corpus.py \
      --input catalog.db.documents --output /warehouse/profiles/2026-08-18

Local smoke:

    python jobs/profile_corpus.py \
      --input /root/testdata/sf0.001/documents.parquet --output /tmp/profile
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="document table (catalog ref or parquet path)")
    p.add_argument("--output", required=True, help="profile directory")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--source-col", default="source")
    p.add_argument("--hdr-k", type=int, default=32)
    p.add_argument("--hll-p", type=int, default=12)
    p.add_argument("--cms-width", type=int, default=4096)
    p.add_argument("--cms-threshold", type=int, default=1000)
    p.add_argument("--quality-floor", type=float, default=0.5)
    p.add_argument("--mix-alpha", type=float, default=0.3)
    p.add_argument(
        "--entropy",
        action="store_true",
        help="write per-source entropy telemetry (extra tokenizing pass)",
    )
    p.add_argument("--entropy-floor", type=float, default=1.5)
    p.add_argument(
        "--diversity",
        action="store_true",
        help="write per-source n-gram diversity ratios (extra gram pass)",
    )
    p.add_argument(
        "--dedup-report",
        action="store_true",
        help="add near-dup telemetry sections (runs MinHash LSH over the "
        "corpus — the one optional section whose cost is corpus-shaped, "
        "off by default)",
    )
    p.add_argument("--dedup-threshold", type=float, default=0.5)
    p.add_argument("--dedup-num-hashes", type=int, default=16)
    p.add_argument("--dedup-bands", type=int, default=4)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    return p.parse_args(argv)


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv)
    from transmog_spark.operators.sketch import (
        cms_heavy_hitters,
        hdr_histogram,
        hdr_quantiles,
        hll_estimate,
        hll_registers,
    )
    from transmog_spark.operators.text import lang_id, quality_score, ws_tokens
    from transmog_spark.session import get_spark
    from transmog_spark.sources.tables import read_table

    spark = get_spark(
        app_name="transmog_profile", shuffle_partitions=args.shuffle_partitions
    )
    docs = read_table(spark, args.input)
    sid, txt, src = args.id_col, args.text_col, args.source_col
    out = args.output
    os.makedirs(out, exist_ok=True)

    # one narrow projection feeds the per-source sections — persisted, so
    # the expensive text-derived columns (tokenize, lang-ID, quality) are
    # computed in ONE corpus pass instead of once per output action; the
    # persisted rows are tiny (two ids, two longs, a string, a double)
    base = docs.select(
        F.col(sid),
        F.col(src),
        F.size(ws_tokens(F.col(txt))).cast("long").alias("n_tok"),
        lang_id(F.col(txt)).alias("lang"),
        quality_score(F.col(txt)).alias("q"),
    ).persist()

    base.groupBy(src).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("sum_tokens"),
        F.round(F.avg("n_tok"), 2).alias("mean_tokens"),
    ).write.mode("overwrite").parquet(os.path.join(out, "source_stats"))

    # sketch-only quantile read: hdr_value_quantiles' exact-quantile rider
    # is a per-source sort of the whole corpus — the QA shape, not the
    # routine profile pass (same reasoning as the estimate-only HLL below)
    hdr_quantiles(
        hdr_histogram(base, "n_tok", k=args.hdr_k, group_by=[src]),
        [0.5, 0.9, 0.99],
        k=args.hdr_k,
        group_by=[src],
    ).write.mode("overwrite").parquet(os.path.join(out, "token_quantiles"))

    base.groupBy(src, "lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    ).write.mode("overwrite").parquet(os.path.join(out, "lang_mix"))

    base.groupBy(src).agg(
        F.round(F.avg("q"), 4).alias("mean_quality"),
        F.round(
            F.avg(F.when(F.col("q") < args.quality_floor, 1.0).otherwise(0.0)), 4
        ).alias("low_quality_rate"),
    ).write.mode("overwrite").parquet(os.path.join(out, "quality"))

    # reuses the persisted narrow projection: the weights table costs one
    # |sources|-row aggregate, not another corpus scan
    from transmog_spark.operators.corpus import alpha_mixture_weights

    alpha_mixture_weights(base, src, alpha=args.mix_alpha).write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "mixture_weights"))

    cms_heavy_hitters(
        docs, sid, txt, width=args.cms_width, threshold=args.cms_threshold
    ).write.mode("overwrite").parquet(os.path.join(out, "heavy_terms"))

    from transmog_spark.operators.lm import vocab_kl

    vocab_kl(docs, text_col=txt, source_col=src).write.mode("overwrite").parquet(
        os.path.join(out, "vocab_drift")
    )

    if args.entropy:
        from transmog_spark.operators.text import entropy_profile

        ent = entropy_profile(docs, sid, txt)
        ent.join(docs.select(sid, src), sid).groupBy(src).agg(
            F.round(F.avg("char_entropy"), 4).alias("mean_char_entropy"),
            F.round(F.avg("token_entropy"), 4).alias("mean_token_entropy"),
            F.round(
                F.avg(
                    F.when(
                        F.col("token_entropy") < args.entropy_floor, 1.0
                    ).otherwise(0.0)
                ),
                4,
            ).alias("low_entropy_rate"),
        ).write.mode("overwrite").parquet(os.path.join(out, "entropy"))

    if args.diversity:
        from transmog_spark.operators.cooc import ngram_diversity

        ngram_diversity(docs, sid, txt, src).write.mode("overwrite").parquet(
            os.path.join(out, "ngram_diversity")
        )

    # optional near-dup telemetry: per-source drop rates + cluster-size
    # distribution (the CCNet/FineWeb per-dump dedup report). The pairs
    # frame is persisted so the two sections share ONE LSH pass.
    if args.dedup_report:
        from transmog_spark.operators.dedup import (
            cluster_size_histogram,
            dedup_report,
            minhash_near_duplicates,
        )

        pairs = minhash_near_duplicates(
            docs,
            sid,
            txt,
            num_hashes=args.dedup_num_hashes,
            bands=args.dedup_bands,
            threshold=args.dedup_threshold,
        ).persist()
        dedup_report(
            docs.select(sid, src), pairs, id_col=sid, group_col=src
        ).write.mode("overwrite").parquet(os.path.join(out, "dedup_stats"))
        cluster_size_histogram(pairs).write.mode("overwrite").parquet(
            os.path.join(out, "dup_size_hist")
        )
        pairs.unpersist()

    totals = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("sum_tokens")
    ).collect()[0]
    # estimate-only HLL (2^p-row register table): hll_distinct's exact
    # countDistinct rider is a vocabulary-wide shuffle that belongs in QA
    # runs, not in the routine profile pass
    hll = hll_estimate(hll_registers(docs, sid, txt, p=args.hll_p), p=args.hll_p).collect()[0]
    summary = {
        "n_docs": int(totals["n_docs"]),
        "sum_tokens": int(totals["sum_tokens"] or 0),
        "distinct_tokens_hll": float(hll["hll_est"]),
        "hll_registers_present": int(hll["n_present"]),
        "params": {
            "hdr_k": args.hdr_k,
            "hll_p": args.hll_p,
            "cms_width": args.cms_width,
            "cms_threshold": args.cms_threshold,
            "quality_floor": args.quality_floor,
            "mix_alpha": args.mix_alpha,
        },
        "sections": [
            "source_stats",
            "token_quantiles",
            "lang_mix",
            "quality",
            "heavy_terms",
            "vocab_drift",
            "mixture_weights",
        ]
        + (["entropy"] if args.entropy else [])
        + (["ngram_diversity"] if args.diversity else [])
        + (["dedup_stats", "dup_size_hist"] if args.dedup_report else []),
    }
    tmp = os.path.join(out, "_PROFILE.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(summary, fh, indent=2)
    os.replace(tmp, os.path.join(out, "_PROFILE.json"))
    base.unpersist()
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
