"""Driver-mimic: run every queries() entry against its oracle_sql() via
DuckDB and compare row count, column names, and order-insensitive values
(SURVEY.md §5.2-4). Uses sf0.001 for speed; the driver runs sf0.01.
"""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].map(
                lambda v: None if v is None or (isinstance(v, float) and math.isnan(v))
                else round(float(v), 9)
            )
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        else:
            df[c] = df[c].map(lambda v: None if pd.isna(v) else v)
    return df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)


ORACLED = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, sf_dir, ddb, name):
    qs = entry_mod.queries()
    sdf = qs[name](spark, sf_dir).toPandas()
    odf = ddb.execute(entry_mod.oracle_sql()[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns), f"{name}: column mismatch"
    assert len(sdf) == len(odf), f"{name}: rowcount {len(sdf)} vs {len(odf)}"
    a, b = _canon(sdf), _canon(odf)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False,
                                  rtol=1e-6, atol=1e-9, obj=name)


def test_rows_only_queries_run(spark, sf_dir):
    qs = entry_mod.queries()
    for name in set(qs) - set(ORACLED):
        df = qs[name](spark, sf_dir)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_leakage_audit_zero(spark, sf_dir):
    out = entry_mod.queries()["leakage_audit"](spark, sf_dir).first()
    assert out["n_leaks"] == 0 and out["n_rows"] > 0
