"""PII detection/redaction: span correctness and ordering semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from transmog_spark.operators.pii import pii_profile, pii_redact


def _profile(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return pii_profile(df).collect()[0]


def _redact(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(pii_redact(F.col("text")).alias("r")).collect()[0]["r"]


def test_counts_each_type(spark):
    r = _profile(
        spark,
        "mail a.b+c@ex-site.org or b@x.io, ssn 123-45-6789, "
        "call 555 123 4567 or 555-123-4567, ip 10.0.0.1",
    )
    assert (r.n_email, r.n_ssn, r.n_phone, r.n_ipv4) == (2, 1, 2, 1)
    assert r.n_pii == 6


def test_counts_scan_original_text_independently(spark):
    # ssn also matches the phone shape-family? no: phone needs 3-3-4 digit
    # groups; ssn is 3-2-4 — disjoint. But an ipv4 INSIDE no other match
    # double-counts nothing.
    r = _profile(spark, "nothing here")
    assert (r.n_email, r.n_ssn, r.n_phone, r.n_ipv4, r.n_pii) == (0, 0, 0, 0, 0)


def test_redaction_order_email_wins(spark):
    # digits inside an email must not later fire as phone/ipv4: the email
    # sentinel replaces them first
    out = _redact(spark, "x 555.123.4567@ex.com y")
    assert out == "x <EMAIL> y"


def test_redaction_sentinels(spark):
    out = _redact(spark, "a@b.co 111-22-3333 555-123-4567 1.2.3.4")
    assert out == "<EMAIL> <SSN> <PHONE> <IPV4>"


def test_redaction_preserves_non_pii(spark):
    s = "version 1.2 has 333-44 digits and user at example dot com"
    assert _redact(spark, s) == s


def test_pii_pseudonymize_stable_surrogates(spark):
    from pyspark.sql import functions as F

    from transmog_spark.operators.pii import pii_pseudonymize

    df = spark.createDataFrame(
        [
            (1, "mail a@b.org and again a@b.org plus c@d.net"),
            (2, "other doc a@b.org here"),
            (3, "call 555-123-4567 or 555-123-4567 from 10.0.0.1"),
            (4, "no pii at all"),
            (5, "a@b.org leads"),   # match at string start
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r["p"]
        for r in df.select(
            "doc_id", pii_pseudonymize(F.col("text"), salt="s").alias("p")
        ).collect()
    }
    # same entity -> same surrogate, within AND across docs
    import re
    t1 = re.findall(r"<EMAIL:[0-9a-f]{8}>", rows[1])
    assert len(t1) == 3 and t1[0] == t1[1] and t1[0] != t1[2]
    assert t1[0] in rows[2]
    # distinct types get distinct surrogates; repeats stable
    t3 = re.findall(r"<PHONE:[0-9a-f]{8}>", rows[3])
    assert len(t3) == 2 and t3[0] == t3[1]
    assert "<IPV4:" in rows[3]
    assert rows[4] == "no pii at all"
    assert rows[5].startswith("<EMAIL:") and rows[5].endswith("> leads")
    # salt rotation changes the mapping
    alt = (
        df.where(F.col("doc_id") == 1)
        .select(pii_pseudonymize(F.col("text"), salt="other").alias("p"))
        .collect()[0]["p"]
    )
    assert t1[0] not in alt
