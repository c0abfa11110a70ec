"""Bloom-filter membership over a corpus — incremental exact-dedup scale path.

The streaming/incremental form of ``dedupe_exact``: a new batch probing a
10^12-row historical corpus cannot join it per trigger, but a Bloom filter
of the historical content hashes is a few KB of longs — broadcast it and
membership is a per-row expression. False positives exist (tunable via
bits-per-key), false negatives do not, which is exactly the dedup
contract: ``maybe_seen = 0`` rows are certainly new and can be admitted
without any join; the (rare) positives go through the exact verification
join. Bloom 1970 (CACM 13-7); the standard two-tier admission filter of
production dedup pipelines.

Cross-engine determinism: the ``k`` bit positions come from seeded 60-bit
md5 hashes (`functions.hashing.md5_long` — the engine's DuckDB-shared
hash) mod ``63·n_longs`` (63 usable bits per long word — bit 63 would
overflow DuckDB's checked signed shift and flip the sign on the JVM); the filter is the per-word ``bit_or`` of
``1 << (pos % 63)`` — every operation is exact integer/bit arithmetic, so
filter words and verdicts are bit-identical in the DuckDB mirror
(``oracle.bloom_dedup_sql``).

Scale shape: the build is one explode (k longs/doc) + one
map-side-combined ``bit_or`` groupBy bounded at ``n_longs`` output rows;
the probe broadcasts the filter frame (≤ n_longs rows) and aggregates k
bit-tests per doc — no corpus shuffle on either side. Size ``n_longs`` at
~10 bits/key for ~1% false positives (n_longs ≈ historical_docs / 6.4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from transmog_spark.functions.hashing import md5_long


def _positions(col: Column, *, n_longs: int, k: int, seed: str) -> Column:
    """Array of the k seeded bit positions (longs in [0, 63·n_longs))."""
    m = 63 * n_longs
    return F.array(
        *[
            md5_long(F.concat(F.lit(f"{seed}{j}#"), col.cast("string"))) % m
            for j in range(k)
        ]
    )


def bloom_build(
    df: DataFrame,
    col: str = "text",
    *,
    n_longs: int = 1024,
    k: int = 4,
    seed: str = "bf",
) -> DataFrame:
    """Build the filter: (word_idx int, bits long), one row per long word
    that has at least one bit set (absent word ≡ all-zero word)."""
    pos = df.select(
        F.explode(_positions(F.col(col), n_longs=n_longs, k=k, seed=seed)).alias(
            "__pos"
        )
    )
    return (
        pos.select(
            F.expr("__pos div 63").cast("int").alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(__pos % 63 AS INT))"
            ).alias("__b"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__b").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    col: str = "text",
    *,
    id_col: str = "doc_id",
    n_longs: int = 1024,
    k: int = 4,
    seed: str = "bf",
) -> DataFrame:
    """Probe: (``id_col``, maybe_seen int) — 1 iff ALL k bits are set.

    ``maybe_seen = 0`` is definitive (never seen); ``1`` needs the exact
    verification join. The filter side is explicitly broadcast (≤ n_longs
    rows); the probe is one explode + one per-id min aggregation.
    """
    pos = df.select(
        F.col(id_col),
        F.explode(_positions(F.col(col), n_longs=n_longs, k=k, seed=seed)).alias(
            "__pos"
        ),
    ).select(
        id_col,
        F.expr("__pos div 63").cast("int").alias("word_idx"),
        F.expr("CAST(__pos % 63 AS INT)").alias("__bit"),
    )
    probed = pos.join(F.broadcast(bloom), "word_idx", "left").select(
        id_col,
        F.coalesce(
            F.expr("shiftright(bits, __bit) & CAST(1 AS BIGINT)"), F.lit(0)
        ).alias("__set"),
    )
    return probed.groupBy(id_col).agg(
        F.min("__set").cast("int").alias("maybe_seen")
    )
