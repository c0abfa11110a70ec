"""Window-operator tests vs hand-computed pandas (lag/lead, ffill/bfill,
gap sessionize, session aggregates)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
import pytest
from pyspark.sql import functions as F

from transmog_spark.operators.windows import (
    sessionize,
    session_aggregates,
    with_bfill,
    with_ffill,
    with_lag_lead,
    with_rolling_agg,
)

T0 = datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def ts_df(spark):
    import random

    rng = random.Random(11)
    rows = []
    for i in range(400):
        k = f"u{rng.randrange(8)}"
        ts = T0 + timedelta(seconds=rng.randrange(100_000))
        v = float(rng.randrange(50)) if rng.random() > 0.3 else None
        rows.append((k, ts, v, i))
    return spark.createDataFrame(rows, "k string, ts timestamp, v double, rid long")


def _pdf(ts_df):
    return ts_df.toPandas().sort_values(["k", "ts", "rid"], kind="mergesort")


def test_lag_lead_matches_pandas(ts_df):
    out = with_lag_lead(ts_df, "k", ["ts", "rid"], ["v"]).toPandas()
    out = out.sort_values(["k", "ts", "rid"], kind="mergesort")
    pdf = _pdf(ts_df)
    g = pdf.groupby("k")["v"]
    exp_lag, exp_lead = g.shift(1), g.shift(-1)
    assert out["v_lag1"].reset_index(drop=True).equals(exp_lag.reset_index(drop=True))
    assert out["v_lead1"].reset_index(drop=True).equals(exp_lead.reset_index(drop=True))


def test_ffill_bfill_match_pandas(ts_df):
    out = with_bfill(
        with_ffill(ts_df, "k", ["ts", "rid"], ["v"]), "k", ["ts", "rid"], ["v"]
    ).toPandas()
    out = out.sort_values(["k", "ts", "rid"], kind="mergesort").reset_index(drop=True)
    pdf = _pdf(ts_df).reset_index(drop=True)
    assert out["v_ffill"].equals(pdf.groupby("k")["v"].ffill())
    assert out["v_bfill"].equals(pdf.groupby("k")["v"].bfill())


def test_sessionize_gap_semantics(spark):
    gap = 600.0
    rows = [
        # u1: 3 events in one session, then a >gap jump -> new session
        ("u1", T0, 0), ("u1", T0 + timedelta(seconds=300), 1),
        ("u1", T0 + timedelta(seconds=899), 2),
        ("u1", T0 + timedelta(seconds=1500), 3),
        # exact-gap boundary: delta == gap is NOT a new session (> comparison)
        ("u2", T0, 4), ("u2", T0 + timedelta(seconds=600), 5),
        ("u2", T0 + timedelta(seconds=1201), 6),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, rid long")
    out = sessionize(df, "k", ["ts", "rid"], gap_seconds=gap)
    got = {r.rid: r.session_index for r in out.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 0, 5: 0, 6: 1}
    sids = {r.rid: r.session_id for r in out.collect()}
    assert sids[0] == "u1#0" and sids[3] == "u1#1"


def test_sessionize_matches_pandas_on_random(ts_df):
    gap = 1800.0
    out = sessionize(ts_df, "k", ["ts", "rid"], gap_seconds=gap).toPandas()
    out = out.sort_values(["k", "ts", "rid"], kind="mergesort").reset_index(drop=True)
    pdf = _pdf(ts_df).reset_index(drop=True)
    new = (
        pdf.groupby("k")["ts"].diff().dt.total_seconds().gt(gap)
        | pdf.groupby("k")["ts"].diff().isna()
    )
    exp = new.groupby(pdf["k"]).cumsum() - 1
    assert out["session_index"].astype("int64").equals(exp.astype("int64"))


def test_session_aggregates(spark):
    rows = [
        ("u1", T0, 1.0, 0),
        ("u1", T0 + timedelta(seconds=100), 2.0, 1),
        ("u1", T0 + timedelta(seconds=10_000), 5.0, 2),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double, rid long")
    s = sessionize(df, "k", ["ts", "rid"], gap_seconds=600)
    agg = session_aggregates(s, "k", "ts", agg_cols={"v": ["sum", "mean", "max"]})
    got = {r.session_id: (r.session_len, r.session_v_sum, r.session_v_mean, r.session_v_max)
           for r in agg.collect()}
    assert got == {"u1#0": (2, 3.0, 1.5, 2.0), "u1#1": (1, 5.0, 5.0, 5.0)}


def test_rolling_agg_semantics(spark):
    rows = [
        ("u1", T0, 1.0, 0),
        ("u1", T0 + timedelta(seconds=1800), 2.0, 1),
        ("u1", T0 + timedelta(seconds=3600), 4.0, 2),   # 1h frame: rows 0..2
        ("u1", T0 + timedelta(seconds=3601), 8.0, 3),   # row 0 aged out
        # peer pair at the same microsecond: inclusive frame sees both,
        # strict frame sees neither peer (zero-leakage posture)
        ("u2", T0, 1.0, 4),
        ("u2", T0, 2.0, 5),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double, rid long")
    out = with_rolling_agg(
        df, "k", "ts", {"v": ["sum", "count"]},
        windows_seconds={"1h": 3600.0}, prior_prefix="prior_",
    )
    got = {r.rid: (r.v_sum_1h, r.v_count_1h, r.prior_v_sum_1h) for r in out.collect()}
    assert got == {
        0: (1.0, 1, None),
        1: (3.0, 2, 1.0),
        2: (7.0, 3, 3.0),        # trailing window is inclusive of -3600s
        3: (14.0, 3, 6.0),       # row 0 (t=0) outside (t-3600, t]
        4: (3.0, 2, None),       # peer at same us included (inclusive)...
        5: (3.0, 2, None),       # ...but excluded from the strict frame
    }


def test_rolling_agg_matches_bruteforce(ts_df):
    # brute-force reference: pandas .rolling has different endpoint/peer
    # semantics than a RANGE frame (closed='right', positional peers), so
    # compute the [t-2h, t] per-key sums directly
    out = with_rolling_agg(
        ts_df, "k", "ts", {"v": ["sum"]}, windows_seconds={"2h": 7200.0}
    ).toPandas()
    out = out.sort_values(["k", "ts", "rid"], kind="mergesort").reset_index(drop=True)
    pdf = _pdf(ts_df).reset_index(drop=True)
    lo = pdf["ts"] - pd.Timedelta(seconds=7200)
    exp = [
        pdf.loc[(pdf["k"] == r.k) & (pdf["ts"] >= lo[i]) & (pdf["ts"] <= r.ts), "v"].sum(
            min_count=1
        )
        for i, r in pdf.iterrows()
    ]
    got = out["v_sum_2h"].reset_index(drop=True)
    pd.testing.assert_series_equal(got, pd.Series(exp, dtype="float64"), check_names=False)


def test_rolling_agg_single_sort(ts_df):
    """Two trailing windows + the strictly-prior twins share ONE
    Exchange + ONE Sort (materialized order key, one pass)."""
    out = with_rolling_agg(
        ts_df, "k", "ts", {"v": ["sum", "count"]},
        windows_seconds={"1h": 3600.0, "1d": 86400.0}, prior_prefix="prior_",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re as _re

    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert len(_re.findall(r"\bSort \[", plan)) == 1, plan


def test_window_family_single_sort(spark, ts_df):
    """Plan check: one window family -> exactly one shuffle on the key
    (lag+lead+ffill over the same (key, order) reuse one Sort/Exchange)."""
    out = with_ffill(
        with_lag_lead(ts_df, "k", ["ts", "rid"], ["v"]), "k", ["ts", "rid"], ["v"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # hashpartitioning on k should appear exactly once among exchanges
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan
