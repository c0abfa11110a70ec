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
