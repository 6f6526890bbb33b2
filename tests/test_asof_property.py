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


@st.composite
def tie_tables(draw):
    """Tables engineered to hit nearest-direction edge cases: dims on an
    even-minute grid so odd-minute facts are EXACTLY equidistant between
    two dim rows; facts before the first / after the last dim (one-sided
    nulls); keys with no dim rows at all."""
    keys = ["a", "b", "nodim"]
    n_facts = draw(st.integers(5, 20))
    facts = [
        (draw(st.sampled_from(keys)), i,
         T0 + dt.timedelta(minutes=draw(st.integers(-3, 43))))
        for i in range(n_facts)
    ]
    dim = []
    j = 0
    for k in ("a", "b"):
        for m in draw(st.sets(st.integers(0, 20), max_size=8)):
            dim.append((k, 100 + j, T0 + dt.timedelta(minutes=2 * m)))
            j += 1
    return facts, dim


@settings(max_examples=10, deadline=None)
@given(tie_tables())
def test_asof_nearest_ties_match_duckdb(spark, tabs):
    """Pin the 'nearest' tie semantics (equal distances -> BACKWARD wins;
    one-sided nulls -> the non-null side) against the DuckDB ASOF
    composition used by the driver oracle, for both physical strategies.
    If the nearest composition in asof_join ever changes its tiebreak,
    this fails before the driver's hash compare does."""
    import duckdb

    facts, dim = tabs
    fpdf = pd.DataFrame(facts, columns=["k", "seq", "ts"])
    dpdf = pd.DataFrame(dim, columns=["k", "version", "valid_from"])
    if len(dpdf) == 0:
        dpdf = pd.DataFrame({"k": pd.Series(dtype="object"),
                             "version": pd.Series(dtype="int64"),
                             "valid_from": pd.Series(dtype="datetime64[us]")})
    con = duckdb.connect()
    con.register("f", fpdf)
    con.register("d", dpdf)
    exp = {
        int(r[0]): (None if r[1] is None or pd.isna(r[1]) else int(r[1]))
        for r in con.execute("""
            WITH b AS (
              SELECT f.seq, f.ts, d.version AS bk, d.valid_from AS bv
              FROM f ASOF LEFT JOIN d ON f.k = d.k AND f.ts >= d.valid_from),
            fw AS (
              SELECT f.seq, d.version AS fk, d.valid_from AS fv
              FROM f ASOF LEFT JOIN d ON f.k = d.k AND f.ts <= d.valid_from)
            SELECT b.seq,
                   CASE WHEN fv IS NULL OR (bv IS NOT NULL AND
                             epoch(b.ts) - epoch(bv) <= epoch(fv) - epoch(b.ts))
                        THEN bk ELSE fk END AS version
            FROM b JOIN fw ON fw.seq = b.seq
        """).fetchall()
    }

    fdf = spark.createDataFrame(fpdf)
    ddf = spark.createDataFrame(
        dpdf, schema="k string, version long, valid_from timestamp"
    )
    for strategy in ("broadcast", "union"):
        out = asof_join(
            fdf, ddf, on="k", ts_col="ts", valid_col="valid_from",
            direction="nearest", strategy=strategy,
        ).select("seq", "version").collect()
        got = {
            int(r["seq"]): (None if r["version"] is None else int(r["version"]))
            for r in out
        }
        assert got == exp, f"strategy={strategy}"
