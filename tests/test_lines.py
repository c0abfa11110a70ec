"""Line-level exact dedup (operators/lines.py) — CCNet/RefinedWeb
boilerplate-line removal semantics."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from transmog_spark.operators.lines import (
    duplicated_lines,
    strip_duplicated_lines,
)


def _docs(spark):
    # "COOKIE BANNER" appears in 3 docs (d1 twice — intra-doc repeats
    # count); " nav " trimmed form repeats across d1/d3; blank and short
    # lines are never candidates.
    rows = [
        ("d1", "COOKIE BANNER\nreal content one\n  COOKIE BANNER  \n\nx"),
        ("d2", "real content two\nCOOKIE BANNER\nunique line here"),
        ("d3", "real content three\n nav \nx"),
        ("d4", "nav\nanother unique line"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_duplicated_lines_counts(spark):
    out = {
        r["line_md5"]: r
        for r in duplicated_lines(
            _docs(spark), min_count=2, min_chars=3
        ).collect()
    }
    assert len(out) == 2  # COOKIE BANNER and nav
    by_occ = sorted((r["n_docs"], r["n_occurrences"]) for r in out.values())
    assert by_occ == [(2, 2), (2, 3)]  # nav in d3+d4; banner 3x over d1+d2


def test_min_chars_excludes_short_lines(spark):
    # 'x' (1 char) appears in d1 and d3 but is below min_chars=3
    out = duplicated_lines(_docs(spark), min_count=2, min_chars=3)
    assert out.count() == 2
    # lowering min_chars makes it a candidate
    out1 = duplicated_lines(_docs(spark), min_count=2, min_chars=1)
    assert out1.count() == 3


def test_strip_removes_every_occurrence(spark):
    out = {
        r["doc_id"]: r
        for r in strip_duplicated_lines(
            _docs(spark), min_count=2, min_chars=3
        ).collect()
    }
    assert out["d1"]["n_lines"] == 5
    assert out["d1"]["n_removed"] == 2  # both banner occurrences drop
    expected_d1 = "real content one\n\nx"
    assert out["d1"]["clean_md5"] == hashlib.md5(
        expected_d1.encode()
    ).hexdigest()
    assert out["d2"]["n_removed"] == 1
    assert out["d3"]["n_removed"] == 1  # ' nav ' (trimmed key) drops
    assert out["d4"]["n_removed"] == 1
    expected_d2 = "real content two\nunique line here"
    assert out["d2"]["clean_md5"] == hashlib.md5(
        expected_d2.encode()
    ).hexdigest()


def test_strip_everything_gives_empty_md5(spark):
    df = spark.createDataFrame(
        [("a", "same line"), ("b", "same line")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r
        for r in strip_duplicated_lines(df, min_count=2).collect()
    }
    empty = hashlib.md5(b"").hexdigest()
    for r in out.values():
        assert r["n_lines"] == 1 and r["n_removed"] == 1
        assert r["clean_md5"] == empty


def test_no_duplicates_is_identity_fingerprint(spark):
    df = spark.createDataFrame(
        [("a", "only one\ntext"), ("b", "entirely different\nlines")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in strip_duplicated_lines(df, min_count=2).collect()
    }
    assert all(r["n_removed"] == 0 for r in out.values())
    assert out["a"]["clean_md5"] == hashlib.md5(b"only one\ntext").hexdigest()


def test_custom_separator(spark):
    # regex metacharacters in the separator must be treated literally
    df = spark.createDataFrame(
        [("a", "dup seg || uniq one || dup seg"), ("b", "uniq two || x")],
        ["doc_id", "text"],
    )
    dup = duplicated_lines(df, min_count=2, sep=" || ").collect()
    assert len(dup) == 1 and dup[0]["n_occurrences"] == 2
    out = {
        r["doc_id"]: r
        for r in strip_duplicated_lines(df, min_count=2, sep=" || ").collect()
    }
    assert out["a"]["n_lines"] == 3 and out["a"]["n_removed"] == 2
    assert out["a"]["clean_md5"] == hashlib.md5(b"uniq one").hexdigest()


def test_blank_lines_never_removed(spark):
    df = spark.createDataFrame(
        [("a", "x\n\n\ny"), ("b", "p\n\n\nq")], ["doc_id", "text"]
    )
    out = strip_duplicated_lines(df, min_count=2, min_chars=1)
    assert all(r["n_removed"] == 0 for r in out.collect())


def test_strip_repeated_lines_keep_first(spark):
    from transmog_spark.operators.lines import strip_repeated_lines

    df = spark.createDataFrame(
        [
            (1, "nav bar\nbody text one\nnav bar\nbody text two\nnav bar"),
            (2, "alpha\n  alpha  \nbeta"),   # trimmed-form match removed
            (3, "xy\n\nxy\n\nxy"),           # short + blank lines always kept
            (4, "unique only"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_removed"])
        for r in strip_repeated_lines(df, min_chars=4).collect()
    }
    assert out[1] == ("nav bar\nbody text one\nbody text two", 5, 2)
    assert out[2] == ("alpha\nbeta", 3, 1)   # '  alpha  ' == 'alpha' trimmed
    assert out[3] == ("xy\n\nxy\n\nxy", 5, 0)  # all below min_chars
    assert out[4] == ("unique only", 1, 0)


def test_strip_repeated_lines_preserves_original_text_of_survivors(spark):
    from transmog_spark.operators.lines import strip_repeated_lines

    # the FIRST occurrence survives verbatim (untrimmed), later trimmed
    # duplicates go
    df = spark.createDataFrame(
        [(1, "  padded  \npadded\nother line")], "doc_id long, text string"
    )
    r = strip_repeated_lines(df, min_chars=4).collect()[0]
    assert r["text"] == "  padded  \nother line"
    assert r["n_removed"] == 1
