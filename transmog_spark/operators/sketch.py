"""Count-Min-Sketch token counting and heavy-hitter detection (Cormode &
Muthukrishnan 2005, "An improved data stream summary: the count-min
sketch and its applications").

The sketch is a ``depth × width`` counter grid: every token occurrence
increments, for each row ``d``, the cell ``hash_d(term) mod width``; the
estimate for a term is the MIN over rows of its cells. Guarantees:
estimates never UNDERcount (pure overestimate from collisions), and with
depth d / width w the overestimate exceeds εN with probability ≤ e^-d
(ε = e/w) — so a 4×4096 grid (128 KiB of longs) answers "is this token
hot?" over any corpus size. That bounded state is the point at 100 TB:
the grid is the only shuffle-reduced aggregate a streaming admission
filter or a skew-salting decision needs, where an exact per-term count
table is vocabulary-sized and a full sort is corpus-sized.

Hash rows are the engine's 60-bit md5 over ``"{d}#" || term`` — no RNG,
bit-reproducible in the DuckDB oracle (``oracle.cms_heavy_hitters_sql``).

Scale shape: one token-explode pass with map-side-combined term rollup
(the occurrence-stream and rollup formulations are identical by
commutativity of +, so the grid is built from the vocabulary-sized count
table rather than re-scanning the corpus ``depth`` times); the grid
itself broadcasts to probe any candidate set. No driver actions beyond
the broadcast, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transmog_spark.functions.hashing import md5_long
from transmog_spark.operators.text import ws_tokens


def _term_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return (
        df.select(F.explode(ws_tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("exact"))
    )


def cms_sketch(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """The counter grid: (d, bucket, cnt) — at most ``depth × width``
    rows regardless of corpus size."""
    counts = _term_counts(df, id_col, text_col)
    rows = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(
                    md5_long(F.concat(F.lit(f"{d}#"), F.col("term"))), width
                ).alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    return (
        counts.select(F.explode(rows).alias("__r"), "exact")
        .groupBy(F.col("__r.d").alias("d"), F.col("__r.bucket").alias("bucket"))
        .agg(F.sum("exact").alias("cnt"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    depth: int = 4,
    width: int = 256,
    threshold: int = 100,
) -> DataFrame:
    """Terms whose CMS estimate reaches ``threshold``: (term, cms_est,
    exact, overcount). The estimate is min-over-rows of the broadcast
    grid's probed cells; ``exact`` rides along from the same rollup so the
    overestimate-only guarantee is visible (``overcount = cms_est - exact
    >= 0`` always — pinned by tests). The threshold decision is made on
    the SKETCH estimate, as a bounded-state consumer would make it, so
    recall is exact (no underestimates) and false positives are the
    documented collision overcounts.
    """
    counts = _term_counts(df, id_col, text_col)
    sketch = cms_sketch(df, id_col, text_col, depth=depth, width=width)
    probes = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(
                    md5_long(F.concat(F.lit(f"{d}#"), F.col("term"))), width
                ).alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    probed = counts.select(
        "term", "exact", F.explode(probes).alias("__p")
    ).join(
        F.broadcast(sketch),
        (F.col("__p.d") == F.col("d")) & (F.col("__p.bucket") == F.col("bucket")),
    )
    return (
        probed.groupBy("term", "exact")
        .agg(F.min("cnt").alias("cms_est"))
        .where(F.col("cms_est") >= threshold)
        .select(
            "term",
            "cms_est",
            "exact",
            (F.col("cms_est") - F.col("exact")).alias("overcount"),
        )
    )
