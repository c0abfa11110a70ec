"""Bigram-LM perplexity scoring: value parity vs a pure-Python reference."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from transmog_spark.operators.lm import LM_K, bigram_array, lm_score


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_lm(docs: dict[int, str], train_pct: int = 80, k: float = LM_K):
    """Reference implementation, deliberately independent of the Spark code."""
    toks = {d: [t for t in txt.lower().split() if t] for d, txt in docs.items()}
    grams = {d: [f"{a} {b}" for a, b in zip(t, t[1:])] for d, t in toks.items()}
    train = [d for d in docs if _md5_60(str(d)) % 100 < train_pct]
    bc: dict[str, int] = {}
    vocab = set()
    for d in train:
        vocab.update(toks[d])
        for g in grams[d]:
            bc[g] = bc.get(g, 0) + 1
    cc: dict[str, int] = {}
    for g, c in bc.items():
        w1 = g.split(" ", 1)[0]
        cc[w1] = cc.get(w1, 0) + c
    v = len(vocab)
    out = {}
    for d, gs in grams.items():
        if not gs:
            continue
        slp = 0
        oov = 0
        for g in gs:
            c2 = bc.get(g, 0)
            c1 = cc.get(g.split(" ", 1)[0], 0)
            if c2 == 0:
                oov += 1
            slp += round(math.log((c2 + k) / (c1 + k * v)) * 10000)
        avg = slp / 10000.0 / len(gs)
        out[d] = (len(gs), oov, round(avg, 4), round(math.exp(-avg), 2))
    return out


DOCS = {
    0: "the cat sat on the mat",
    1: "the cat sat on the hat",
    2: "the dog sat on the mat",
    3: "a completely different sentence here",
    4: "the cat the cat the cat",
    5: "xyzzy plugh quux",          # all-OOV candidate
    6: "single",                     # < 2 tokens -> absent
    7: "",                           # empty -> absent
    8: "The CAT sat",               # case folding
}


def test_bigram_array_basics(spark):
    df = spark.createDataFrame([("a b c d",), ("a",), ("",)], "t string")
    got = df.select(
        bigram_array(F.filter(F.split(F.lower("t"), r"\s+"), lambda x: x != "")).alias("g")
    ).collect()
    assert list(got[0]["g"]) == ["a b", "b c", "c d"]
    assert list(got[1]["g"]) == []
    assert list(got[2]["g"]) == []


def test_lm_score_matches_reference(spark):
    df = spark.createDataFrame(
        [(d, t) for d, t in DOCS.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["n_oov"], r["avg_logp"], r["ppl"])
        for r in lm_score(df).collect()
    }
    exp = _py_lm(DOCS)
    assert got == exp
    assert 6 not in got and 7 not in got  # no-bigram docs absent
    # repeated in-model bigrams must score higher than the OOV doc
    if 5 in got and 0 in got:
        assert got[0][2] > got[5][2]


def test_lm_score_train_split_is_deterministic(spark):
    df = spark.createDataFrame(
        [(d, t) for d, t in DOCS.items()], "doc_id long, text string"
    )
    a = {r["doc_id"]: r["avg_logp"] for r in lm_score(df).collect()}
    b = {r["doc_id"]: r["avg_logp"] for r in lm_score(df).collect()}
    assert a == b


def test_lm_score_full_train_no_oov_for_trained_docs(spark):
    # train_pct=100: every doc is in the model, so no bigram is OOV
    df = spark.createDataFrame(
        [(d, t) for d, t in DOCS.items()], "doc_id long, text string"
    )
    got = lm_score(df, train_pct=100).agg(F.sum("n_oov")).collect()[0][0]
    assert got == 0


def _py_importance(docs: dict[int, tuple[str, bool]], k: float = LM_K):
    """Independent reference for importance_weights: two add-k bigram LMs
    (target subset vs whole corpus), exact e4-integer arithmetic."""
    toks = {d: [t for t in txt.lower().split() if t] for d, (txt, _) in docs.items()}
    grams = {d: [f"{a} {b}" for a, b in zip(t, t[1:])] for d, t in toks.items()}

    def model(ids):
        bc: dict[str, int] = {}
        vocab = set()
        for d in ids:
            vocab.update(toks[d])
            for g in grams[d]:
                bc[g] = bc.get(g, 0) + 1
        cc: dict[str, int] = {}
        for g, c in bc.items():
            w1 = g.split(" ", 1)[0]
            cc[w1] = cc.get(w1, 0) + c
        return bc, cc, len(vocab)

    mt = model([d for d, (_, tgt) in docs.items() if tgt])
    mr = model(list(docs))

    def score(gs, m):
        bc, cc, v = m
        return sum(
            round(math.log((bc.get(g, 0) + k) / (cc.get(g.split(" ", 1)[0], 0) + k * v)) * 10000)
            for g in gs
        )

    def e4(slp, n):
        return (-1 if slp < 0 else 1) * ((abs(slp) * 2 + n) // (2 * n))

    out = {}
    for d, gs in grams.items():
        if not gs:
            continue
        n = len(gs)
        t_e4, r_e4 = e4(score(gs, mt), n), e4(score(gs, mr), n)
        out[d] = (n, t_e4 / 10000.0, r_e4 / 10000.0, (t_e4 - r_e4) / 10000.0)
    return out


def test_importance_weights_matches_reference(spark):
    docs = {
        0: ("the cat sat on the mat", True),
        1: ("the cat sat on the hat", True),
        2: ("the dog sat on the mat", False),
        3: ("a completely different sentence here", False),
        4: ("the cat the cat the cat", True),
        5: ("xyzzy plugh quux", False),
        6: ("single", True),
    }
    from transmog_spark.operators.lm import importance_weights

    df = spark.createDataFrame(
        [(d, t, tgt) for d, (t, tgt) in docs.items()],
        "doc_id long, text string, tgt boolean",
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logp_target"], r["avg_logp_raw"], r["log_ratio"])
        for r in importance_weights(df, target=F.col("tgt")).collect()
    }
    assert got == _py_importance(docs)
    # target-like docs must out-rank the anti-target token soup
    assert got[0][3] > got[5][3]


def test_lm_score_ppl_orders_quality(spark):
    # a natural-ish doc made of common bigrams must have lower perplexity
    # than token soup, when both are scored against the same model
    rows = [(i, "the cat sat on the mat and the dog ran") for i in range(20)]
    rows.append((100, "qq zz pp ww rr tt yy uu ii oo"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["ppl"] for r in lm_score(df, train_pct=90).collect()}
    assert got[0] < got[100]


def test_lm_score_degenerate_model_stays_finite(spark):
    """Empty/degenerate train split (vocab_size = 0): the denominator is
    clamped so scoring degrades to the uniform add-k model — finite avg_logp
    and ppl, never an Inf that silently overflows the scaled-integer sum."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "beta gamma alpha beta")],
        "doc_id long, text string",
    )
    empty = df.where(F.lit(False))
    from transmog_spark.operators.lm import ngram_lm_counts

    model = ngram_lm_counts(empty, train_pct=100)
    rows = lm_score(df, model=model).collect()
    assert len(rows) == 2
    for r in rows:
        assert math.isfinite(r["avg_logp"]) and math.isfinite(r["ppl"])
        assert r["n_oov"] == r["n_bigrams"]  # everything OOV under no model


def test_importance_resample_weighted_and_deterministic(spark):
    """Efraimidis-Spirakis keys: huge-ratio docs are always drawn, the
    sample is without replacement, exact-n, and replays identically."""
    from transmog_spark.operators.lm import importance_resample

    rows = [(i, 0.0) for i in range(200)] + [(1000 + i, 8.0) for i in range(5)]
    w = spark.createDataFrame(rows, "doc_id long, log_ratio double")
    got = importance_resample(w, "doc_id", n=20, seed=3).collect()
    assert len(got) == 20
    ids = [r["doc_id"] for r in got]
    assert len(set(ids)) == 20  # without replacement
    # weight exp(8) ~ 3000x: all five hot docs must be in a 20-draw
    assert {1000, 1001, 1002, 1003, 1004} <= set(ids)
    # ranks are 1..n ordered by key desc
    ranks = sorted(r["rank"] for r in got)
    assert ranks == list(range(1, 21))
    again = [r["doc_id"] for r in importance_resample(w, "doc_id", n=20, seed=3).collect()]
    assert set(again) == set(ids)
    # a different seed draws a different cold-doc subset
    other = {r["doc_id"] for r in importance_resample(w, "doc_id", n=20, seed=4).collect()}
    assert other != set(ids)


def test_vocab_kl_hand_computed(spark):
    from transmog_spark.operators.lm import vocab_kl

    df = spark.createDataFrame(
        [(1, "x x y", "a"), (2, "y", "b")],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in vocab_kl(df).collect()}
    # corpus: x:2 y:2 (T=4); a: x:2 y:1 (T_a=3); b: y:1
    a = out["a"]
    assert (a.n_tokens, a.n_types) == (3, 2)
    # e4 grid: 2*round(ln(8/6)*1e4) + 1*round(ln(4/6)*1e4) = 5754 - 4055
    assert a.kl == pytest.approx(1699 / 3 / 10000, abs=1e-4)
    b = out["b"]
    assert (b.n_tokens, b.n_types) == (1, 1)
    assert b.kl == pytest.approx(0.6931, abs=1e-4)  # ln 2


def test_vocab_kl_zero_for_identical_distributions(spark):
    from transmog_spark.operators.lm import vocab_kl

    df = spark.createDataFrame(
        [(1, "x y", "c"), (2, "x y", "d")],
        "doc_id long, text string, source string",
    )
    for r in vocab_kl(df).collect():
        assert r.kl == 0.0
        assert (r.n_tokens, r.n_types) == (2, 2)


def test_vocab_kl_partitioning_independent(spark):
    from transmog_spark.operators.lm import vocab_kl

    rows = [(i, f"t{i % 7} t{i % 3} common", f"s{i % 4}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    one = sorted(map(tuple, vocab_kl(df).collect()))
    many = sorted(map(tuple, vocab_kl(df.repartition(13)).collect()))
    assert one == many  # exact long sums: no addition-order drift


def _bucket_df(spark, rows, **kw):
    from transmog_spark.operators.lm import ppl_buckets

    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = ppl_buckets(df, "doc_id", "text", group_col="source", **kw)
    return {r.doc_id: (r.source, r.bucket, r.ppl) for r in out.collect()}


def test_ppl_buckets_exact_tertiles(spark):
    """Per-source equal-count split; head = lowest perplexity; ntile sizes
    larger-first; <2-token docs absent; exact path vs a hand-derived rank."""
    # one source, 7 scoreable docs -> ntile(3) sizes 3/2/2; doc 99 absent
    rows = [
        (0, "the cat sat on the mat", "a"),
        (1, "the cat sat on the hat", "a"),
        (2, "the dog sat on the mat", "a"),
        (3, "a completely different sentence here", "a"),
        (4, "the cat the cat the cat", "a"),
        (5, "xyzzy plugh quux", "a"),
        (6, "the cat sat on the mat again", "a"),
        (99, "single", "a"),
    ]
    got = _bucket_df(spark, rows, train_pct=100)
    assert 99 not in got
    assert len(got) == 7
    from collections import Counter

    sizes = Counter(b for _, b, _ in got.values())
    assert sizes == {"head": 3, "middle": 2, "tail": 2}
    # bucket order must follow perplexity: max ppl in head <= min ppl in
    # middle <= ... (ties broken by id cannot cross a ppl inversion)
    by_bucket = {
        lab: sorted(p for _, b, p in got.values() if b == lab)
        for lab in ("head", "middle", "tail")
    }
    assert by_bucket["head"][-1] <= by_bucket["middle"][0] + 1e-9
    assert by_bucket["middle"][-1] <= by_bucket["tail"][0] + 1e-9


def test_ppl_buckets_group_isolation_and_labels(spark):
    """Buckets are assigned within each source independently; custom label
    count respected."""
    rows = []
    for s, base in (("a", 0), ("b", 100)):
        rows += [
            (base + 0, "the cat sat on the mat", s),
            (base + 1, "the cat sat on the hat", s),
            (base + 2, "xyzzy plugh quux", s),
            (base + 3, "a completely different sentence here", s),
        ]
    got = _bucket_df(spark, rows, train_pct=100, labels=("keep", "drop"))
    from collections import Counter

    for s in ("a", "b"):
        sizes = Counter(b for src, b, _ in got.values() if src == s)
        assert sizes == {"keep": 2, "drop": 2}


def test_ppl_buckets_approx_agrees_on_separated_data(spark):
    """The no-sort percentile-cutoff path assigns every doc a valid label
    and matches the exact path when scores are well separated."""
    rows = [
        (0, "the cat sat on the mat", "a"),
        (1, "the cat sat on the hat", "a"),
        (2, "the dog sat on the mat", "a"),
        (3, "a completely different sentence here", "a"),
        (4, "the cat the cat the cat", "a"),
        (5, "xyzzy plugh quux", "a"),
    ]
    exact = _bucket_df(spark, rows, train_pct=100)
    approx = _bucket_df(spark, rows, train_pct=100, cutoffs="approx")
    assert set(approx) == set(exact)
    assert all(b in ("head", "middle", "tail") for _, b, _ in approx.values())
    # count-split (ntile) and value-threshold buckets may disagree AT the
    # boundaries; the contract is monotonicity — walking docs by ascending
    # perplexity, the bucket index never decreases — plus the extremes:
    order = {"head": 0, "middle": 1, "tail": 2}
    by_ppl = sorted(approx.values(), key=lambda t: t[2])
    idx = [order[b] for _, b, _ in by_ppl]
    assert idx == sorted(idx)
    assert idx[0] == 0  # best doc always in head
    # on a tiny stratum the lowest cutoff can equal the stratum minimum
    # (documented value-threshold semantics) — but buckets never collapse
    # to one when scores differ:
    assert len(set(idx)) >= 2


def test_ppl_buckets_validation(spark):
    from transmog_spark.operators.lm import ppl_buckets

    df = spark.createDataFrame(
        [(0, "a b", "s")], "doc_id long, text string, source string"
    )
    with pytest.raises(ValueError):
        ppl_buckets(df, labels=("only",))
    with pytest.raises(ValueError):
        ppl_buckets(df, cutoffs="nope")


# ---------------------------------------------------------------------------
# kn_score (interpolated Kneser-Ney)
# ---------------------------------------------------------------------------


def _py_kn(docs: dict[int, str], train_pct: int = 80, D: float = 0.75, k: float = LM_K):
    """Independent pure-Python interpolated-KN reference."""
    toks = {d: [t for t in txt.lower().split() if t] for d, txt in docs.items()}
    grams = {d: [f"{a} {b}" for a, b in zip(t, t[1:])] for d, t in toks.items()}
    train = [d for d in docs if _md5_60(str(d)) % 100 < train_pct]
    bc: dict[str, int] = {}
    vocab = set()
    for d in train:
        vocab.update(toks[d])
        for g in grams[d]:
            bc[g] = bc.get(g, 0) + 1
    c1: dict[str, int] = {}
    n1fwd: dict[str, int] = {}
    n1bwd: dict[str, int] = {}
    for g, c in bc.items():
        w1, w2 = g.split(" ")
        c1[w1] = c1.get(w1, 0) + c
        n1fwd[w1] = n1fwd.get(w1, 0) + 1
        n1bwd[w2] = n1bwd.get(w2, 0) + 1
    v, types = max(len(vocab), 1), len(bc)
    out = {}
    for d, gs in grams.items():
        if not gs:
            continue
        slp, oov = 0, 0
        for g in gs:
            w1, w2 = g.split(" ")
            c2 = bc.get(g, 0)
            cw1 = c1.get(w1, 0)
            if c2 == 0:
                oov += 1
            pcont = (n1bwd.get(w2, 0) + k) / (types + k * v)
            if cw1 > 0:
                p = max(c2 - D, 0.0) / cw1 + (D * n1fwd[w1] / cw1) * pcont
            else:
                p = pcont
            slp += round(math.log(p) * 10000)
        n = len(gs)
        sign = -1 if slp < 0 else 1
        avg_e4 = sign * ((abs(slp) * 2 + n) // (2 * n))
        avg = avg_e4 / 10000.0
        out[d] = (n, oov, avg, round(math.exp(-avg), 2))
    return out


def test_kn_score_matches_reference(spark):
    from transmog_spark.operators.lm import kn_score

    df = spark.createDataFrame(
        [(d, t) for d, t in DOCS.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["n_oov"], r["avg_logp"], r["ppl"])
        for r in kn_score(df).collect()
    }
    assert got == _py_kn(DOCS)
    assert 6 not in got and 7 not in got


def test_kn_continuation_beats_raw_frequency(spark):
    """The Francisco effect: 'francisco' has a HIGH raw unigram count but
    appears after only one context; 'day' is rarer per-context but
    completes many contexts, so P_KN(unseen-context -> day) must exceed
    P_KN(unseen-context -> francisco)."""
    from transmog_spark.operators.lm import kn_lm_counts, kn_score

    corpus = [
        (i, "san francisco") for i in range(10)
    ] + [
        (100, "nice day"), (101, "good day"), (102, "bad day"),
        (103, "long day"), (104, "rainy day"),
    ]
    # score docs whose CONTEXT is unseen -> pure continuation probability
    probe = [(200, "zzz francisco"), (201, "zzz day")]
    train = spark.createDataFrame(corpus, "doc_id long, text string")
    model = kn_lm_counts(train, train_pct=100)
    scored = {
        r["doc_id"]: r["avg_logp"]
        for r in kn_score(
            spark.createDataFrame(probe, "doc_id long, text string"), model=model
        ).collect()
    }
    assert scored[201] > scored[200]


def test_kn_degenerate_model_stays_finite(spark):
    from transmog_spark.operators.lm import kn_score

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta gamma delta")],
        "doc_id long, text string",
    )
    # train split that matches nothing -> every context unseen, pure pcont
    out = kn_score(df, train_pct=0).collect()
    assert len(out) == 2
    for r in out:
        assert math.isfinite(r["avg_logp"]) and math.isfinite(r["ppl"])
        assert r["n_oov"] == r["n_bigrams"]
