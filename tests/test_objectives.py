"""span_corruption (T5/UL2 objective prep) unit tests."""

from __future__ import annotations

import pytest


def _reconstruct(input_ids, target_ids, base=32000):
    spans, cur = {}, None
    for t in target_ids:
        if t >= base:
            cur = t
            spans[cur] = []
        else:
            spans[cur].append(t)
    out = []
    for t in input_ids:
        out.extend(spans[t] if t >= base else [t])
    return out


def test_span_corruption_reconstruction_and_shape(spark):
    from transmog_spark.operators.objectives import span_corruption

    df = spark.createDataFrame(
        [(i, list(range(i * 100, i * 100 + 40))) for i in range(1, 9)]
        + [(99, [])],
        "doc_id long, tokens array<int>",
    )
    rows = {
        r["doc_id"]: r
        for r in span_corruption(
            df, noise_density=0.3, span_len=3, seed="t"
        ).collect()
    }
    saw_spans = 0
    for i in range(1, 9):
        r = rows[i]
        # sentinels ascend in document order, one per span, same set in
        # input and target
        in_sent = [t for t in r["input_ids"] if t >= 32000]
        tgt_sent = [t for t in r["target_ids"] if t >= 32000]
        assert in_sent == sorted(in_sent) == tgt_sent
        assert len(in_sent) == r["n_spans"]
        saw_spans += r["n_spans"]
        # the defining invariant: substituting each sentinel's target span
        # back into the input reproduces the original sequence exactly
        assert _reconstruct(r["input_ids"], r["target_ids"]) == list(
            range(i * 100, i * 100 + 40)
        )
        # corrupted_frac = corrupted tokens / n_tok
        corrupted = sum(1 for t in r["target_ids"] if t < 32000)
        assert r["corrupted_frac"] == round(corrupted / 40, 4)
    assert saw_spans > 0  # noise 0.3 over 320 tokens must flag something
    # empty doc passes through empty
    assert rows[99]["input_ids"] == [] and rows[99]["target_ids"] == []
    assert rows[99]["corrupted_frac"] == 0.0


def test_span_corruption_determinism_and_validation(spark):
    from transmog_spark.operators.objectives import span_corruption

    df = spark.createDataFrame(
        [(1, list(range(60)))], "doc_id long, tokens array<int>"
    )
    a = span_corruption(df, seed="s").collect()[0]
    b = span_corruption(df, seed="s").collect()[0]
    assert a == b
    c = span_corruption(df, seed="other").collect()[0]
    assert (a["input_ids"] != c["input_ids"]) or (a["n_spans"] != c["n_spans"])
    with pytest.raises(ValueError):
        span_corruption(df, noise_density=0.0)
    with pytest.raises(ValueError):
        span_corruption(df, span_len=0)


def test_span_corruption_merges_overlapping_spans(spark):
    from transmog_spark.operators.objectives import span_corruption

    # high noise forces overlapping flagged starts; merged spans must be
    # disjoint: target spans never repeat a token position
    df = spark.createDataFrame(
        [(1, list(range(50)))], "doc_id long, tokens array<int>"
    )
    r = span_corruption(df, noise_density=0.9, span_len=5, seed="m").collect()[0]
    corrupted = [t for t in r["target_ids"] if t < 32000]
    assert len(corrupted) == len(set(corrupted))  # disjoint spans
    assert _reconstruct(r["input_ids"], r["target_ids"]) == list(range(50))


def test_mlm_mask_semantics(spark):
    from transmog_spark.operators.objectives import mlm_mask

    df = spark.createDataFrame(
        [(1, list(range(1000, 1400))), (2, [])],
        "doc_id long, tokens array<int>",
    )
    rows = {
        r["doc_id"]: r
        for r in mlm_mask(df, mask_rate=0.15, seed="q").collect()
    }
    r = rows[1]
    orig = list(range(1000, 1400))
    assert len(r["input_ids"]) == len(r["labels"]) == 400
    masked_pos = [i for i, y in enumerate(r["labels"]) if y != -100]
    assert r["n_masked"] == len(masked_pos)
    # rate concentrates near 15% over 400 draws
    assert 0.07 < len(masked_pos) / 400 < 0.25
    n_mask_tok = n_rand = n_keep = 0
    for i in range(400):
        x, y = r["input_ids"][i], r["labels"][i]
        if y == -100:
            assert x == orig[i]  # unselected positions untouched
        else:
            assert y == orig[i]  # label is the original token
            if x == 32001:
                n_mask_tok += 1
            elif x == orig[i]:
                n_keep += 1
            else:
                n_rand = n_rand + 1
    assert n_mask_tok > n_rand and n_mask_tok > n_keep  # 80/10/10 shape
    assert rows[2]["input_ids"] == [] and rows[2]["n_masked"] == 0
    # determinism
    again = {r["doc_id"]: r for r in mlm_mask(df, mask_rate=0.15, seed="q").collect()}
    assert again[1] == r
    import pytest
    with pytest.raises(ValueError):
        mlm_mask(df, mask_rate=0.0)


def _conv_df(spark, rows):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("conv_id", T.LongType()),
            T.StructField(
                "turns",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("role", T.StringType()),
                            T.StructField("content", T.StringType()),
                        ]
                    )
                ),
            ),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_sft_render_masking_semantics(spark):
    from transmog_spark.functions.hashing import md5_long  # noqa: F401
    from transmog_spark.operators.objectives import sft_render

    df = _conv_df(
        spark,
        [
            (1, [("system", "You are helpful"), ("user", "hi there"),
                 ("assistant", "hello friend")]),
            (2, [("user", ""), ("assistant", "ok")]),
            (3, [("tool", "weird role content")]),
        ],
    )
    out = {r.conv_id: r for r in sft_render(df).collect()}

    r1 = out[1]
    # layout: [sys][3 toks][eot] [usr][2][eot] [ast][2][eot]
    assert r1.n_tok == 13 and r1.n_turns == 3
    assert r1.input_ids[0] == 32010 and r1.input_ids[4] == 32013
    assert r1.input_ids[5] == 32011 and r1.input_ids[9] == 32012
    # loss = assistant content (2) + assistant EOT
    assert r1.n_loss == 3
    assert r1.labels[:10] == [-100] * 10
    assert r1.labels[10:] == r1.input_ids[10:]
    assert r1.labels[-1] == 32013

    r2 = out[2]
    # empty user content renders marker+EOT only; assistant 'ok' + EOT loss
    assert r2.n_tok == 5 and r2.n_loss == 2
    assert r2.input_ids[:3] == [32011, 32013, 32012]

    r3 = out[3]
    # unknown role -> unk marker, never loss
    assert r3.input_ids[0] == 32009 and r3.n_loss == 0
    assert all(l == -100 for l in r3.labels)


def test_sft_render_tokens_match_hash_tokenizer(spark):
    import hashlib

    from transmog_spark.operators.objectives import sft_render

    df = _conv_df(spark, [(1, [("assistant", "Spark ENGINE spark")])])
    r = sft_render(df).collect()[0]

    def tid(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % 32768

    assert r.input_ids == [32012, tid("spark"), tid("engine"), tid("spark"), 32013]
    # all content + EOT carry loss for the assistant turn
    assert r.labels[1:] == r.input_ids[1:]


def test_fim_transform_reconstruction_and_rates(spark):
    from transmog_spark.operators.objectives import fim_transform

    rows = [(i, list(range(i % 17))) for i in range(1, 400)]
    df = spark.createDataFrame(rows, ["doc_id", "tokens"])
    out = fim_transform(df, fim_rate=1.0, seed="t").collect()
    for r in out:
        assert r.fim_applied
        ids = r.input_ids
        # PSM framing: [PRE] pre [SUF] suf [MID] mid, all three markers once
        assert ids[0] == 32020
        s, m = ids.index(32021), ids.index(32022)
        pre, suf, mid = ids[1:s], ids[s + 1 : m], ids[m + 1 :]
        # reconstruction: pre + mid + suf == original tokens
        orig = dict(rows)[r.doc_id]
        assert pre + mid + suf == orig, r.doc_id
        assert r.n_tok == len(orig) and len(ids) == len(orig) + 3

    # rate 0 -> verbatim passthrough
    out0 = fim_transform(df, fim_rate=0.0, seed="t").collect()
    assert all(not r.fim_applied and r.input_ids == dict(rows)[r.doc_id] for r in out0)

    # intermediate rate: seeded fraction, deterministic, seed-sensitive
    a = {r.doc_id: r.fim_applied for r in fim_transform(df, fim_rate=0.5, seed="x").collect()}
    a2 = {r.doc_id: r.fim_applied for r in fim_transform(df, fim_rate=0.5, seed="x").collect()}
    b = {r.doc_id: r.fim_applied for r in fim_transform(df, fim_rate=0.5, seed="y").collect()}
    assert a == a2 and a != b
    frac = sum(a.values()) / len(a)
    assert 0.35 < frac < 0.65
    import pytest

    with pytest.raises(ValueError):
        fim_transform(df, fim_rate=1.5)


def test_ul2_mixture_modes_and_framing(spark):
    from transmog_spark.operators.objectives import ul2_mixture

    rows = [(i, list(range(20))) for i in range(1, 300)]
    df = spark.createDataFrame(rows, ["doc_id", "tokens"])
    out = ul2_mixture(df, seed="u").collect()
    assert len(out) == 299  # every doc exactly one mode
    by_mode = {}
    for r in out:
        by_mode.setdefault(r.mode, []).append(r)
    # shares roughly honored (seeded hash, 299 docs)
    assert 0.35 < len(by_mode["R"]) / 299 < 0.65
    assert 0.12 < len(by_mode["S"]) / 299 < 0.40
    assert 0.12 < len(by_mode["X"]) / 299 < 0.40
    for r in by_mode["R"]:
        assert r.input_ids[0] == 32030
    for r in by_mode["X"]:
        assert r.input_ids[0] == 32032
        # X corrupts more: its target (sentinels + corrupted tokens) is
        # on average much longer than R's at noise 0.5 vs 0.15
    x_t = sum(len(r.target_ids) for r in by_mode["X"]) / len(by_mode["X"])
    r_t = sum(len(r.target_ids) for r in by_mode["R"]) / len(by_mode["R"])
    assert x_t > r_t
    for r in by_mode["S"]:
        # prefix-LM invariant: [S] + prefix / target reconstructs the doc
        assert r.input_ids[0] == 32031
        assert r.input_ids[1:] + r.target_ids == list(range(20))
    import pytest

    with pytest.raises(ValueError):
        ul2_mixture(df, shares=(0.5, 0.2, 0.2))
