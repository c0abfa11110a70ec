"""Multinomial Naive-Bayes classifier: value parity vs a pure-Python
reference, prediction sanity on a separable corpus, and edge cases."""

from __future__ import annotations

import hashlib
import math

import pytest

from transmog_spark.operators.nb import NB_K, nb_classify, nb_model


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_nb(docs: dict[int, tuple[str, str]], train_pct: int = 80, k: float = NB_K):
    """Independent reference: docs = {id: (label, text)}. Returns
    {id: (pred_label, score, margin, n_tok)} on the same 1e-4 grid."""
    toks = {d: [t for t in txt.lower().split() if t] for d, (_, txt) in docs.items()}
    train = [d for d in docs if _md5_60(str(d)) % 100 < train_pct]
    if not train:
        return {}
    tc: dict[tuple[str, str], int] = {}
    nd: dict[str, int] = {}
    vocab = set()
    for d in train:
        lab = docs[d][0]
        nd[lab] = nd.get(lab, 0) + 1
        for t in toks[d]:
            vocab.add(t)
            tc[(lab, t)] = tc.get((lab, t), 0) + 1
    v = max(len(vocab), 1)
    nt = {lab: sum(c for (l, _), c in tc.items() if l == lab) for lab in nd}
    big_d = sum(nd.values())
    prior = {lab: round(math.log(n / big_d) * 10000) for lab, n in nd.items()}
    unk = {lab: round(math.log(k / (nt[lab] + k * v)) * 10000) for lab in nd}
    lp = {
        (lab, t): round(math.log((c + k) / (nt[lab] + k * v)) * 10000)
        for (lab, t), c in tc.items()
    }
    out = {}
    for d in docs:
        scores = {}
        for lab in nd:
            s = prior[lab] + len(toks[d]) * unk[lab]
            for t in toks[d]:
                if (lab, t) in lp:
                    s += lp[(lab, t)] - unk[lab]
            scores[lab] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        best = ranked[0]
        margin = (best[1] - ranked[1][1]) / 10000.0 if len(ranked) > 1 else None
        out[d] = (best[0], best[1] / 10000.0, margin, len(toks[d]))
    return out


DOCS = {
    0: ("news", "the election results were announced yesterday evening"),
    1: ("news", "the council voted on the new budget proposal"),
    2: ("news", "reporters covered the election and the budget vote"),
    3: ("code", "def foo return x plus y end def"),
    4: ("code", "import module class method return self value"),
    5: ("code", "for loop index in range return index"),
    6: ("news", "the budget vote was covered by reporters"),
    7: ("code", "class foo def method return none"),
    8: ("news", ""),                      # zero tokens -> priors only
    9: ("code", "xyzzy plugh quux"),      # all-OOV at score time (if held out)
    10: ("news", "The ELECTION budget VOTE"),  # case folding
}


def _df(spark, docs=DOCS):
    return spark.createDataFrame(
        [(d, lab, txt) for d, (lab, txt) in docs.items()],
        "doc_id long, source string, text string",
    )


def test_nb_matches_pure_python(spark):
    got = {
        r["doc_id"]: (r["pred_label"], r["score"], r["margin"], r["n_tok"])
        for r in nb_classify(_df(spark)).collect()
    }
    want = _py_nb(DOCS)
    assert set(got) == set(DOCS)
    for d in DOCS:
        gl, gs, gm, gn = got[d]
        wl, ws, wm, wn = want[d]
        assert gl == wl, (d, got[d], want[d])
        assert gs == pytest.approx(ws, abs=1e-9)
        if wm is None:
            assert gm is None
        else:
            assert gm == pytest.approx(wm, abs=1e-9)
        assert gn == wn


def test_nb_separable_corpus_predicts_right(spark):
    """With train_pct=100 every doc's own vocabulary dominates — the two
    sublanguages share no tokens, so prediction must match the true label
    for every doc with at least one token."""
    out = {
        r["doc_id"]: r["pred_label"]
        for r in nb_classify(_df(spark), train_pct=100).collect()
    }
    for d, (lab, txt) in DOCS.items():
        if [t for t in txt.lower().split() if t]:
            assert out[d] == lab, (d, out[d], lab)


def test_nb_zero_token_doc_scores_on_priors(spark):
    out = {r["doc_id"]: r for r in nb_classify(_df(spark), train_pct=100).collect()}
    r = out[8]
    assert r["n_tok"] == 0
    # priors: 6 news / 11 docs vs 5 code / 11 — news wins
    assert r["pred_label"] == "news"
    assert r["score"] == pytest.approx(round(math.log(6 / 11) * 10000) / 10000.0)


def test_nb_single_class_margin_null(spark):
    docs = {d: ("only", txt) for d, (_, txt) in DOCS.items()}
    rows = nb_classify(_df(spark, docs), train_pct=100).collect()
    assert len(rows) == len(docs)
    assert all(r["pred_label"] == "only" and r["margin"] is None for r in rows)


def test_nb_empty_train_split_empty_result(spark):
    assert nb_classify(_df(spark), train_pct=0).count() == 0


def test_nb_pretrained_model_reuse(spark):
    """Train once, score a different frame — the production shape. Scores
    must equal the self-trained run on the union corpus restricted to the
    same model."""
    df = _df(spark)
    model = nb_model(df, train_pct=100)
    fresh = spark.createDataFrame(
        [(100, "?", "the election budget vote"), (101, "?", "def return class import")],
        "doc_id long, source string, text string",
    )
    out = {r["doc_id"]: r["pred_label"] for r in
           nb_classify(fresh, model=model).collect()}
    assert out == {100: "news", 101: "code"}


def test_nb_confusion_matches_pure_python(spark):
    from transmog_spark.operators.nb import nb_confusion

    got = {
        (r["label"], r["pred_label"]): (r["n"], r["n_label"], r["frac"])
        for r in nb_confusion(_df(spark)).collect()
    }
    preds = _py_nb(DOCS)
    held = [d for d in DOCS if _md5_60(str(d)) % 100 >= 80]
    cm: dict[tuple[str, str], int] = {}
    for d in held:
        key = (DOCS[d][0], preds[d][0])
        cm[key] = cm.get(key, 0) + 1
    totals: dict[str, int] = {}
    for (lab, _), n in cm.items():
        totals[lab] = totals.get(lab, 0) + n
    assert set(got) == set(cm)
    for key, n in cm.items():
        nl = totals[key[0]]
        frac = ((n * 20000 + nl) // (2 * nl)) / 10000.0
        assert got[key] == (n, nl, frac), (key, got[key], (n, nl, frac))
    # row-normalized: each true label's fracs describe a distribution
    for lab, nl in totals.items():
        s = sum(n for (l, _), n in cm.items() if l == lab)
        assert s == nl


def test_nb_gate_filters_on_target_and_margin(spark):
    from transmog_spark.operators.nb import nb_gate

    preds = _py_nb(DOCS, train_pct=100)
    want = {
        d for d, (lab, sc, mg, _) in preds.items()
        if lab == "code" and (mg is None or mg >= 1.0)
    }
    got = {
        r["doc_id"]
        for r in nb_gate(
            _df(spark), target="code", min_margin=1.0, train_pct=100
        ).collect()
    }
    assert got == want and got  # non-empty by construction


def test_nb_gate_single_class_keeps_all(spark):
    from transmog_spark.operators.nb import nb_gate

    docs = {d: ("only", txt) for d, (_, txt) in DOCS.items()}
    rows = nb_gate(
        _df(spark, docs), target="only", min_margin=99.0, train_pct=100
    ).collect()
    assert len(rows) == len(docs)  # NULL margin -> no runner-up -> kept
