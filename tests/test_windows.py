"""Window-operator tests: pandas oracles + hypothesis property tests
(SURVEY.md §5.2-5)."""

import datetime as dt

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lyssandra_spark.operators import windows as W

T0 = dt.datetime(2024, 1, 1)


def _df(spark, rows, cols):
    return spark.createDataFrame(pd.DataFrame(rows, columns=cols))


def test_lag_lead_identity(spark):
    rows = [("c1", i, float(i * 10)) for i in range(20)]
    df = _df(spark, rows, ["conv_id", "turn_idx", "v"]).repartition(4)
    out = W.with_lead(W.with_lag(df, "v"), "v").toPandas().sort_values("turn_idx")
    assert out["lag1_v"].iloc[0] is None or pd.isna(out["lag1_v"].iloc[0])
    assert (out["lag1_v"].iloc[1:].to_numpy() == out["v"].iloc[:-1].to_numpy()).all()
    assert (out["lead1_v"].iloc[:-1].to_numpy() == out["v"].iloc[1:].to_numpy()).all()


def test_sessionize_oracle(spark):
    # gaps at turn 3 (2h) and turn 7 (45min) with 30min threshold
    mins = [0, 5, 10, 130, 135, 140, 145, 195, 200]
    rows = [("c1", i, T0 + dt.timedelta(minutes=m)) for i, m in enumerate(mins)]
    df = _df(spark, rows, ["conv_id", "turn_idx", "ts"]).repartition(3)
    out = (
        W.sessionize(df, gap_seconds=1800)
        .toPandas().sort_values("turn_idx")["session_id"].tolist()
    )
    assert out == [0, 0, 0, 1, 1, 1, 1, 2, 2]


def test_ffill_bfill_oracle(spark):
    vals = [None, "a", None, None, "b", None]
    rows = [("c1", i, v) for i, v in enumerate(vals)]
    df = _df(spark, rows, ["conv_id", "turn_idx", "x"]).repartition(2)
    f = W.ffill(df, "x").toPandas().sort_values("turn_idx")["x"].tolist()
    b = W.bfill(df, "x").toPandas().sort_values("turn_idx")["x"].tolist()
    assert f == [None, "a", "a", "a", "b", "b"]
    assert b == ["a", "a", "b", "b", "b", None]


def test_rolling_oracle(spark):
    rows = [("c1", i, float(i)) for i in range(10)]
    df = _df(spark, rows, ["conv_id", "turn_idx", "v"])
    out = W.rolling(df, "v", 3, aggs=("sum", "count")).toPandas().sort_values("turn_idx")
    exp = pd.Series(range(10), dtype=float).rolling(3, min_periods=1).sum()
    assert np.allclose(out["sum_v_3"].to_numpy(), exp.to_numpy())
    assert out["count_v_3"].tolist() == [1, 2, 3, 3, 3, 3, 3, 3, 3, 3]


def test_rolling_range_oracle(spark):
    """Time-RANGE frame vs brute force: the trailing 30s window is by
    timestamp VALUE — boundary-inclusive at exactly -30s, ts-tied rows are
    peers (both see each other regardless of input order), and row
    position is irrelevant. Partition-invariant."""
    offs = [0, 10, 30, 31, 100, 100]  # 30 hits the boundary; two ties at 100
    rows = [("c1", i, T0 + dt.timedelta(seconds=o), float(i))
            for i, o in enumerate(offs)] + [("c2", 0, T0, 5.0)]
    df = _df(spark, rows, ["conv_id", "turn_idx", "ts", "v"]).repartition(3)
    out = W.rolling_range(df, "v", 30, aggs=("sum", "count")).toPandas()
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts", "v"])
    for _, r in out.iterrows():
        lo = r["ts"] - dt.timedelta(seconds=30)
        sel = pdf[(pdf.conv_id == r["conv_id"])
                  & (pdf.ts >= lo) & (pdf.ts <= r["ts"])]
        assert r["sum_v_30s"] == sel["v"].sum(), (r["conv_id"], r["turn_idx"])
        assert r["count_v_30s"] == len(sel)
    # the boundary row (+30) must include the t=0 row; +31 must not
    byidx = out[out.conv_id == "c1"].set_index("turn_idx")
    assert byidx.loc[2, "count_v_30s"] == 3 and byidx.loc[3, "count_v_30s"] == 3

    # fractional windows must not produce dotted column names (a '.' in
    # an unquoted reference parses as nested-field access downstream)
    frac = W.rolling_range(df, "v", 0.5, aggs=("count",))
    assert "count_v_0_5s" in frac.columns
    assert frac.select("count_v_0_5s").count() == len(rows)
    # tied peers both see each other
    assert byidx.loc[4, "count_v_30s"] == 2 and byidx.loc[5, "count_v_30s"] == 2


def test_dedup_and_topk(spark):
    rows = [
        ("c1", 0, T0, "old"), ("c1", 0, T0 + dt.timedelta(seconds=1), "new"),
        ("c1", 1, T0, "only"), ("c2", 0, T0, "x"),
    ]
    df = _df(spark, rows, ["conv_id", "turn_idx", "ts", "v"])
    out = W.dedup_latest(df, ["conv_id", "turn_idx"], "ts").toPandas()
    assert len(out) == 3
    assert out.set_index(["conv_id", "turn_idx"]).loc[("c1", 0), "v"] == "new"

    rows2 = [("g1", i, float(i)) for i in range(10)] + [("g2", i, float(-i)) for i in range(4)]
    df2 = _df(spark, rows2, ["g", "i", "score"])
    top = W.topk(df2, "g", "score", 3).toPandas()
    assert sorted(top[top.g == "g1"]["score"]) == [7.0, 8.0, 9.0]
    assert sorted(top[top.g == "g2"]["score"]) == [-2.0, -1.0, 0.0]


def test_salted_agg_equals_plain(spark, sf_dir):
    from lyssandra_spark.sources import synth

    t = synth.transcripts(spark, sf_dir)
    plain = (
        t.groupBy("conv_id")
        .agg(F.count("*").alias("n"), F.sum(F.length("text")).alias("chars"),
             F.max("turn_idx").alias("max_turn"))
    )
    salted = W.salted_agg(
        t, "conv_id",
        {"n": ("count", "turn_idx"), "chars": ("sum", F.length("text")),
         "max_turn": ("max", "turn_idx")},
        n_buckets=8,
    )
    # salted_agg aggs take column names; pass an expression-compatible form
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


@settings(max_examples=12, deadline=None)
@given(
    gaps=st.lists(st.integers(min_value=1, max_value=7200), min_size=1, max_size=40),
    thresh=st.integers(min_value=60, max_value=3600),
)
def test_sessionize_property(spark, gaps, thresh):
    """session count == 1 + number of gaps > threshold; ids monotone."""
    ts, cur = [], T0
    for g in gaps:
        cur = cur + dt.timedelta(seconds=g)
        ts.append(cur)
    rows = [("c", i, t) for i, t in enumerate(ts)]
    df = _df(spark, rows, ["conv_id", "turn_idx", "ts"])
    out = (
        W.sessionize(df, gap_seconds=thresh)
        .toPandas().sort_values("turn_idx")["session_id"].tolist()
    )
    expected_sessions = 1 + sum(1 for g in gaps[1:] if g > thresh)
    assert out[0] == 0
    assert len(set(out)) == expected_sessions
    assert all(b - a in (0, 1) for a, b in zip(out, out[1:]))


@settings(max_examples=12, deadline=None)
@given(vals=st.lists(st.one_of(st.none(), st.integers(0, 9)), min_size=1, max_size=30))
def test_ffill_idempotent_property(spark, vals):
    rows = [("c", i, v) for i, v in enumerate(vals)]
    df = _df(spark, rows, ["conv_id", "turn_idx", "x"])
    once = W.ffill(df, "x")
    twice = W.ffill(once, "x")
    norm = lambda xs: [None if pd.isna(x) else int(x) for x in xs]  # noqa: E731
    a = norm(once.toPandas().sort_values("turn_idx")["x"].tolist())
    b = norm(twice.toPandas().sort_values("turn_idx")["x"].tolist())
    assert a == b
    # oracle
    exp, last = [], None
    for v in vals:
        last = v if v is not None else last
        exp.append(last)
    assert a == exp
