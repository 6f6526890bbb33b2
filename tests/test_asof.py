"""As-of join correctness: both strategies vs a brute-force pandas oracle,
all directions, tolerance, and strategy-equivalence (SURVEY.md §2.B B1/B2)."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lyssandra_spark.operators.asof import asof_join

T0 = dt.datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def facts(spark):
    rows = []
    rng = np.random.default_rng(7)
    for key in ["a", "b", "c", "nodim"]:
        for i in range(50):
            rows.append((key, i, T0 + dt.timedelta(minutes=int(rng.integers(0, 10000)))))
    pdf = pd.DataFrame(rows, columns=["k", "seq", "ts"])
    return spark.createDataFrame(pdf).repartition(5), pdf


@pytest.fixture(scope="module")
def dim(spark):
    rows = []
    for key, n in [("a", 5), ("b", 3), ("c", 1)]:
        for v in range(n):
            rows.append((key, v + 1, T0 + dt.timedelta(minutes=1500 * v + 10), f"val-{key}-{v+1}"))
    pdf = pd.DataFrame(rows, columns=["k", "version", "valid_from", "payload"])
    return spark.createDataFrame(pdf), pdf


def _oracle(fpdf, dpdf, direction, tol_minutes=None):
    out = []
    for _, f in fpdf.iterrows():
        cand = dpdf[dpdf.k == f.k]
        if direction == "backward":
            cand = cand[cand.valid_from <= f.ts].sort_values("valid_from")
            pick = cand.iloc[-1] if len(cand) else None
            if pick is not None and tol_minutes is not None and (
                f.ts - pick.valid_from
            ) > dt.timedelta(minutes=tol_minutes):
                pick = None
        elif direction == "forward":
            cand = cand[cand.valid_from >= f.ts].sort_values("valid_from")
            pick = cand.iloc[0] if len(cand) else None
            if pick is not None and tol_minutes is not None and (
                pick.valid_from - f.ts
            ) > dt.timedelta(minutes=tol_minutes):
                pick = None
        else:  # nearest
            c = cand.copy()
            if len(c) == 0:
                pick = None
            else:
                c["d"] = (c.valid_from - f.ts).abs()
                c = c.sort_values(["d", "valid_from"])
                pick = c.iloc[0]
                if tol_minutes is not None and pick.d > dt.timedelta(minutes=tol_minutes):
                    pick = None
        out.append(None if pick is None else int(pick.version))
    return out


def _got(df, fpdf):
    g = df.select("k", "seq", "version").toPandas()
    g = g.set_index(["k", "seq"]).reindex(
        pd.MultiIndex.from_frame(fpdf[["k", "seq"]])
    )["version"]
    return [None if pd.isna(v) else int(v) for v in g]


@pytest.mark.parametrize("strategy", ["broadcast", "union"])
@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_vs_oracle(spark, facts, dim, strategy, direction):
    fdf, fpdf = facts
    ddf, dpdf = dim
    got = asof_join(fdf, ddf, on="k", ts_col="ts", valid_col="valid_from",
                    direction=direction, strategy=strategy)
    assert _got(got, fpdf) == _oracle(fpdf, dpdf, direction)


@pytest.mark.parametrize("strategy", ["broadcast", "union"])
def test_asof_tolerance(spark, facts, dim, strategy):
    fdf, fpdf = facts
    ddf, dpdf = dim
    got = asof_join(fdf, ddf, on="k", ts_col="ts", valid_col="valid_from",
                    direction="backward", strategy=strategy,
                    tolerance=F.expr("INTERVAL 500 MINUTES"))
    assert _got(got, fpdf) == _oracle(fpdf, dpdf, "backward", tol_minutes=500)


@pytest.mark.parametrize("strategy", ["broadcast", "union"])
def test_asof_tolerance_nulls_all_dim_columns(spark, facts, dim, strategy):
    """Out-of-tolerance matches must null EVERY dim value column, not only
    the ones processed before valid_from in column order (ADVICE.md high)."""
    fdf, _ = facts
    ddf, _ = dim
    got = asof_join(fdf, ddf, on="k", ts_col="ts", valid_col="valid_from",
                    direction="backward", strategy=strategy,
                    tolerance=F.expr("INTERVAL 500 MINUTES")).toPandas()
    # every dim column is null exactly where version is null
    for c in ("valid_from", "payload"):
        assert (got[c].isna() == got["version"].isna()).all(), c
    # and some rows ARE out of tolerance (the test is not vacuous)
    assert got["version"].isna().any()


@pytest.mark.parametrize("strategy", ["broadcast", "union"])
def test_asof_duplicate_valid_from_no_inflation(spark, facts, strategy):
    """Dim rows duplicated on (key, valid_from) must not inflate fact rows,
    and both strategies must pick the same (deterministic) winner."""
    fdf, fpdf = facts
    rows = []
    for key in ["a", "b"]:
        for v in range(3):
            vf = T0 + dt.timedelta(minutes=1500 * v + 10)
            rows.append((key, 10 * (v + 1), vf, f"dup1-{key}-{v}"))
            rows.append((key, 10 * (v + 1) + 1, vf, f"dup2-{key}-{v}"))
    ddf = spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "version", "valid_from", "payload"])
    )
    outs = {}
    for s in ("broadcast", "union"):
        out = asof_join(fdf, ddf, on="k", ts_col="ts", valid_col="valid_from",
                        direction="backward", strategy=s)
        assert out.count() == len(fpdf), f"row inflation under {s}"
        outs[s] = (
            out.select("k", "seq", "version", "payload")
            .toPandas().sort_values(["k", "seq"]).reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs["broadcast"], outs["union"])


def test_asof_nearest(spark, facts, dim):
    fdf, fpdf = facts
    ddf, dpdf = dim
    got = asof_join(fdf, ddf, on="k", ts_col="ts", valid_col="valid_from",
                    direction="nearest")
    assert _got(got, fpdf) == _oracle(fpdf, dpdf, "nearest")


def test_asof_inner_drops_unmatched(spark, facts, dim):
    fdf, fpdf = facts
    ddf, _ = dim
    got = asof_join(fdf, ddf, on="k", ts_col="ts", valid_col="valid_from", how="inner")
    assert got.where(F.col("k") == "nodim").count() == 0
    assert got.where(F.col("version").isNull()).count() == 0


def test_asof_keyless_global_dim(spark, facts):
    fdf, fpdf = facts
    ddf = spark.createDataFrame(
        pd.DataFrame({
            "version": [1, 2],
            "valid_from": [T0, T0 + dt.timedelta(minutes=5000)],
        })
    )
    got = asof_join(fdf, ddf, on=None, ts_col="ts", valid_col="valid_from")
    g = got.toPandas()
    exp = np.where(g.ts < T0 + dt.timedelta(minutes=5000), 1, 2)
    assert (g.version.to_numpy() == exp).all()


def test_asof_zero_leakage_audit(spark, facts, dim):
    """Anti-join audit: no fact may carry a version with valid_from > ts."""
    fdf, _ = facts
    ddf, _ = dim
    got = asof_join(fdf, ddf, on="k", ts_col="ts", valid_col="valid_from")
    assert got.where(F.col("valid_from") > F.col("ts")).count() == 0


def test_broadcast_plan_has_no_fact_shuffle(spark, facts, dim):
    """The broadcast strategy must not shuffle the fact table."""
    fdf, _ = facts
    ddf, _ = dim
    got = asof_join(fdf, ddf, on="k", ts_col="ts", valid_col="valid_from")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_asof_auto_strategy(spark, facts, dim):
    fdf, fpdf = facts
    ddf, dpdf = dim
    got = asof_join(fdf, ddf, on="k", ts_col="ts", valid_col="valid_from",
                    strategy="auto")
    assert _got(got, fpdf) == _oracle(fpdf, dpdf, "backward")
    # small dim -> auto picks broadcast
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # force the union path with a tiny threshold
    spark.conf.set("lyssandra.asof.broadcastRowLimit", "2")
    try:
        got2 = asof_join(fdf, ddf, on="k", ts_col="ts", valid_col="valid_from",
                         strategy="auto")
        assert _got(got2, fpdf) == _oracle(fpdf, dpdf, "backward")
        plan2 = got2._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan2
    finally:
        spark.conf.unset("lyssandra.asof.broadcastRowLimit")


@pytest.mark.parametrize("strategy", ["broadcast", "union"])
def test_asof_nearest_with_tolerance(spark, facts, dim, strategy):
    """nearest composes backward+forward; tolerance must reject far
    matches on BOTH sides under either strategy."""
    fdf, fpdf = facts
    ddf, dpdf = dim
    got = asof_join(fdf, ddf, on="k", ts_col="ts", valid_col="valid_from",
                    direction="nearest", strategy=strategy,
                    tolerance=F.expr("INTERVAL 400 MINUTES"))
    assert _got(got, fpdf) == _oracle(fpdf, dpdf, "nearest", tol_minutes=400)
