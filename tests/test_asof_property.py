"""Property-based as-of join test: random fact/dim tables vs a brute-force
pandas oracle, both physical strategies (SURVEY.md §5.2-5)."""

import datetime as dt

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from lyssandra_spark.operators.asof import asof_join

T0 = dt.datetime(2024, 1, 1)


@st.composite
def tables(draw):
    keys = ["a", "b", "c"]
    n_facts = draw(st.integers(5, 25))
    facts = [
        (draw(st.sampled_from(keys)), i,
         T0 + dt.timedelta(minutes=draw(st.integers(0, 500))))
        for i in range(n_facts)
    ]
    n_dim = draw(st.integers(0, 10))
    dim = [
        (draw(st.sampled_from(keys)), j,
         T0 + dt.timedelta(minutes=draw(st.integers(0, 500))))
        for j in range(n_dim)
    ]
    # dedup dim on (key, valid_from): as-of semantics need unique validity
    seen = {}
    for kk, j, v in dim:
        seen[(kk, v)] = j
    dim = [(kk, j, v) for (kk, v), j in seen.items()]
    return facts, dim


@settings(max_examples=10, deadline=None)
@given(tables())
def test_asof_backward_matches_bruteforce(spark, tabs):
    facts, dim = tabs
    fpdf = pd.DataFrame(facts, columns=["k", "seq", "ts"])
    dpdf = pd.DataFrame(dim, columns=["k", "version", "valid_from"])
    fdf = spark.createDataFrame(fpdf)
    ddf = spark.createDataFrame(
        dpdf, schema="k string, version long, valid_from timestamp"
    )

    def oracle():
        out = {}
        for _, f in fpdf.iterrows():
            c = dpdf[(dpdf.k == f.k) & (dpdf.valid_from <= f.ts)]
            if len(c):
                c = c.sort_values(["valid_from", "version"])
                out[f.seq] = int(c.iloc[-1]["version"])
            else:
                out[f.seq] = None
        return out

    exp = oracle()
    for strategy in ("broadcast", "union"):
        got = asof_join(fdf, ddf, on="k", ts_col="ts", valid_col="valid_from",
                        direction="backward", strategy=strategy)
        g = got.select("seq", "version").toPandas().set_index("seq")["version"]
        for seq, v in exp.items():
            gv = g.get(seq)
            gv = None if pd.isna(gv) else int(gv)
            assert gv == v, f"{strategy}: seq {seq}: {gv} != {v}"
