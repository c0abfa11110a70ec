"""Line-level exact dedup — corpus-wide duplicated-line removal.

CCNet (Wenzek et al. 2020, arXiv:1911.00359) deduplicates web text at
paragraph granularity by hashing normalized paragraphs and dropping every
occurrence past the corpus-wide count threshold; RefinedWeb (Penedo et
al. 2023, arXiv:2306.01116) applies the same filter line-by-line to strip
boilerplate (nav bars, cookie banners, footers) that exact document-level
dedup never sees. The reference library has no corpus-level text
operators at all (its scope is per-record flattening —
src/transmog/core/flattening.py); this is engine-tier surface for the
training-data pipeline.

Semantics here: a *line* is a ``sep``-separated segment (default
``\\n``; any literal string — corpora that encode paragraph breaks
differently pass their own); its dedup key is the 60-bit md5 of the
whitespace-trimmed form; a line is *duplicated* when its key occurs >=
``min_count`` times corpus-wide (including within one document, as in
CCNet) and the trimmed form has >= ``min_chars`` characters (blank
lines are never candidates and never removed).
Removal drops every occurrence of a duplicated line — the boilerplate
reading — rather than keeping one canonical copy; keep-first would need
a global occurrence order, which a distributed corpus does not have.

Scale shape: the line stream ships (id, pos, 8-byte hash) longs — never
line text; the corpus-wide count is one map-side-combined groupBy on the
hash; flagging is one hash-shuffled join of longs (AQE skew absorbs hot
boilerplate lines); reassembly is a per-document ``collect_list`` of
removed positions (state bounded by lines-per-document) plus one
higher-order filter over the split array. No driver actions, no UDFs,
no cross joins — the same posture as span dedup (operators/spans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from transmog_spark.functions.hashing import md5_long


def duplicated_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_count: int = 2,
    min_chars: int = 1,
    sep: str = "\n",
) -> DataFrame:
    """Corpus-wide duplicated-line inventory.

    Returns (line_md5, n_docs, n_occurrences) for every trimmed line of
    >= ``min_chars`` chars whose 60-bit hash occurs >= ``min_count``
    times across the corpus. n_docs <= n_occurrences (a line can repeat
    inside one document). Deterministic in both engines (oracle:
    ``oracle.duplicated_lines_sql``).

    Scale shape: two-level aggregation — (hash, doc) partial counts are
    map-side combined before the per-hash rollup, so the shuffle carries
    at most one row per (line, document) pair, never one per occurrence.
    """
    cand = _line_candidates(df, id_col, text_col, min_chars=min_chars, sep=sep)
    per_doc = cand.groupBy("__lh", id_col).agg(F.count(F.lit(1)).alias("__c"))
    return (
        per_doc.groupBy("__lh")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__c").alias("n_occurrences"),
        )
        .where(F.col("n_occurrences") >= min_count)
        .select(
            F.col("__lh").alias("line_md5"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_occurrences").cast("long").alias("n_occurrences"),
        )
    )


def strip_duplicated_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_count: int = 2,
    min_chars: int = 1,
    sep: str = "\n",
) -> DataFrame:
    """Apply line dedup: per document, drop every occurrence of a
    corpus-duplicated line and fingerprint what remains.

    Returns (``id_col``, n_lines, n_removed, clean_md5) — clean_md5 is
    the md5 hex of the surviving lines (original, untrimmed) rejoined
    with ``sep`` in document order (md5 of the empty string when nothing
    survives), so full texts never have to be hash-compared across
    engines. Blank and sub-``min_chars`` lines always survive.
    """
    cand = _line_candidates(df, id_col, text_col, min_chars=min_chars, sep=sep)
    dup = (
        cand.groupBy("__lh")
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") >= min_count)
        .select("__lh")
    )
    removed = cand.join(dup, "__lh").select(id_col, "__p")
    per_doc = removed.groupBy(id_col).agg(
        F.collect_list("__p").alias("__rm")
    )
    out = df.join(per_doc, id_col, "left")
    lines = F.split(F.col(text_col), _sep_regex(sep), -1)
    rm = F.coalesce(F.col("__rm"), F.expr("CAST(array() AS array<int>)"))
    kept = F.filter(lines, lambda l, i: ~F.array_contains(rm, i))
    return out.select(
        F.col(id_col),
        F.size(lines).cast("int").alias("n_lines"),
        (F.size(lines) - F.size(kept)).cast("int").alias("n_removed"),
        F.md5(F.concat_ws(sep, kept)).alias("clean_md5"),
    )


def _sep_regex(sep: str) -> str:
    """The literal separator as a Java regex (F.split takes a pattern):
    \\Q…\\E quoting handles any metacharacters in the separator."""
    return "\\Q" + sep + "\\E"


def _line_candidates(
    df: DataFrame, id_col: str, text_col: str, *, min_chars: int, sep: str
) -> DataFrame:
    """(id, position, 60-bit hash) of every dedup-eligible line."""
    lines = F.split(F.col(text_col), _sep_regex(sep), -1)
    ex = df.select(
        F.col(id_col), F.posexplode(lines).alias("__p", "__l")
    )
    norm = F.trim(F.col("__l"))
    return ex.where(F.length(norm) >= min_chars).select(
        id_col,
        F.col("__p").cast("int").alias("__p"),
        md5_long(norm).alias("__lh"),
    )


def strip_repeated_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_chars: int = 1,
    sep: str = "\n",
) -> DataFrame:
    """WITHIN-document repeated-line removal, keeping the first occurrence
    — the complement of the corpus-wide ops above: a nav line repeated 40
    times inside ONE page never has to clear a corpus count threshold, and
    keep-first is well-defined here because a single document HAS a global
    order (exactly what the distributed corpus lacks, see module note).

    A later line is dropped when its whitespace-trimmed form equals that
    of an earlier line; blank and sub-``min_chars`` lines always survive
    (same trimmed form ⇒ same length, so eligibility is consistent across
    occurrences).

    Returns (``id_col``, text, n_lines, n_removed) with ``text`` rebuilt
    from the surviving original lines in order.

    Scale shape: pure per-row Column expressions — zero shuffle, zero
    state. The higher-order ``array_position`` scan is O(L²) per document
    in lines-per-doc L (and Catalyst re-inlines the trimmed array per
    element — the known lambda-aliasing behavior); L is tens for web
    documents, so this is a few thousand comparisons per row, the right
    trade against any shuffle. Corpus-scale duplication stays with the
    hash-join ops above.
    """
    lines = F.split(F.col(text_col), _sep_regex(sep), -1)

    def norm_arr():
        return F.transform(
            F.split(F.col(text_col), _sep_regex(sep), -1), lambda x: F.trim(x)
        )

    kept = F.filter(
        lines,
        lambda x, i: (F.length(F.trim(x)) < min_chars)
        | (F.array_position(norm_arr(), F.trim(x)) == i + 1),
    )
    # Two-step select: the output column is NAMED "text", and Spark 4's
    # lateral column alias resolution would otherwise rebind the
    # F.col(text_col) references inside sibling expressions of the SAME
    # select to the freshly aliased CLEANED text (observed: n_removed
    # re-filtered the already-cleaned doc). Stage the survivors first.
    staged = df.select(
        F.col(id_col),
        kept.alias("__tm_kept"),
        F.size(lines).cast("int").alias("n_lines"),
    )
    return staged.select(
        F.col(id_col),
        F.array_join("__tm_kept", sep).alias("text"),
        "n_lines",
        (F.col("n_lines") - F.size("__tm_kept")).cast("int").alias("n_removed"),
    )
