"""Rounds-to-converge: min-label propagation vs large-star/small-star.

Chain (path) graphs are the worst case for label propagation — it needs
~diameter rounds — while star contraction converges in O(log n) rounds.
Near-clique graphs (the realistic near-dup shape) favor propagation's
cheaper per-round plan. This script measures both on both shapes and
writes BENCH/cc_rounds.md.

Usage: python scripts/cc_rounds_bench.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from transmog_spark.operators.dedup import (  # noqa: E402
    _propagate_components,
    _star_components,
)
from transmog_spark.session import get_spark  # noqa: E402


def chain_edges(spark, n):
    return (
        spark.range(n)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )


def clique_edges(spark, n_cliques, size):
    """n_cliques disjoint near-cliques of `size` nodes (star within clique)."""
    base = spark.range(n_cliques * (size - 1))
    c = (F.col("id") / (size - 1)).cast("long")
    m = F.col("id") % (size - 1)
    return base.select(
        (c * size).alias("src"), (c * size + m + 1).alias("dst")
    )


def run(name, edges, max_iter=64):
    sym = (
        edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    out = {}
    for algo, fn in (("label", _propagate_components), ("star", _star_components)):
        t0 = time.perf_counter()
        labels, rounds, converged, _ = fn(sym, max_iter)
        n = labels.count()
        wall = time.perf_counter() - t0
        out[algo] = (rounds, converged, n, wall)
        print(f"{name:28s} {algo:6s} rounds={rounds:3d} converged={converged} "
              f"nodes={n} wall={wall:.2f}s", flush=True)
    return out


def main():
    spark = get_spark("local[8]", shuffle_partitions=8)
    rows = []
    for n in (64, 512, 4096):
        r = run(f"chain_{n}", chain_edges(spark, n))
        rows.append((f"{n}-hop chain", r))
    r = run("cliques_2000x5", clique_edges(spark, 2000, 5))
    rows.append(("2000 near-cliques (size 5)", r))

    with open(os.path.join(os.path.dirname(__file__), "..", "BENCH", "cc_rounds.md"), "w") as fh:
        fh.write("# Connected components: rounds to converge (label vs star)\n\n")
        fh.write("`duplicate_components` offers two bodies behind one contract\n")
        fh.write("(operators/dedup.py): min-label propagation (diameter rounds)\n")
        fh.write("and alternating large-star/small-star (Kiveris et al., O(log n)\n")
        fh.write("rounds). Measured on local[8] (rounds are host-independent;\n")
        fh.write("walls are indicative only):\n\n")
        fh.write("| graph | label rounds | label wall | star rounds | star wall |\n")
        fh.write("|---|---|---|---|---|\n")
        for name, r in rows:
            lr, lc, _, lw = r["label"]
            sr, sc, _, sw = r["star"]
            lrs = str(lr) if lc else f">{lr} (DNF)"
            fh.write(f"| {name} | {lrs} | {lw:.2f}s | {sr} | {sw:.2f}s |\n")
        fh.write(
            "\nTakeaway: for high-diameter graphs star is the only viable\n"
            "path (label propagation's rounds grow linearly with diameter —\n"
            "at trillion-edge scale each round is a full shuffle of the edge\n"
            "list). For near-clique duplicate clusters — the shape LSH pair\n"
            "generation actually emits — label propagation converges in 2-3\n"
            "rounds and its per-round plan (one join + one partial-agg\n"
            "groupBy) is cheaper than star's two groupBy+join rounds, so it\n"
            "stays the default; `algorithm='star'` is the documented switch\n"
            "for unknown/adversarial graph shapes.\n"
        )
    print("wrote BENCH/cc_rounds.md")


if __name__ == "__main__":
    main()
