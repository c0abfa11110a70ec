"""DoReMi-lite domain weights: direction, normalization, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from transmog_spark.operators.lm import domain_weights

EN = "the cat and the dog sat on the mat and we saw it in the day"
DE = "der hund und die katze ist nicht ein zu der die das und ist"


def _docs(spark):
    # two domains: 'good' docs look like the EN target, 'noisy' docs do not
    rows = []
    for i in range(40):
        rows.append((i, f"{EN} extra{i % 5}", "good"))
    for i in range(40, 80):
        rows.append((i, f"{DE} wort{i % 5}", "noisy"))
    # the target predicate marks the EN-looking half
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_target_like_domain_upweighted(spark):
    d = _docs(spark)
    got = {
        r["source"]: r
        for r in domain_weights(
            d, target=F.col("doc_id") < 40
        ).collect()
    }
    assert set(got) == {"good", "noisy"}
    assert got["good"]["n_docs"] == 40 and got["noisy"]["n_docs"] == 40
    # the domain matching the target distribution gets the larger weight
    assert got["good"]["mean_log_ratio"] > got["noisy"]["mean_log_ratio"]
    assert got["good"]["weight"] > got["noisy"]["weight"]
    # weights normalize to ~1 (4-decimal grid)
    assert abs(got["good"]["weight"] + got["noisy"]["weight"] - 1.0) < 2e-4


def test_temperature_flattens(spark):
    d = _docs(spark)
    sharp = {r["source"]: r["weight"]
             for r in domain_weights(d, target=F.col("doc_id") < 40,
                                     temperature=1.0).collect()}
    flat = {r["source"]: r["weight"]
            for r in domain_weights(d, target=F.col("doc_id") < 40,
                                    temperature=10.0).collect()}
    assert abs(flat["good"] - flat["noisy"]) < abs(sharp["good"] - sharp["noisy"])


def test_partition_invariant(spark):
    d1 = _docs(spark).repartition(1)
    d16 = _docs(spark).repartition(16)
    a = sorted(map(tuple, domain_weights(d1, target=F.col("doc_id") < 40).collect()))
    b = sorted(map(tuple, domain_weights(d16, target=F.col("doc_id") < 40).collect()))
    assert a == b
