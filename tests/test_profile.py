"""One-pass table profiler + catalog sort-order layout."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lyssandra_spark.operators.profile import profile_table


def test_profile_table_known_values(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 2, 3, 4, None],
                "name": ["a", "b", "b", None, None],
            }
        ).astype({"k": "Int64"})
    )
    prof = profile_table(df).toPandas()
    m = {(r.column, r.metric): r.value for r in prof.itertuples()}
    assert m[("*", "rows")] == "5"
    assert m[("k", "nulls")] == "1" and m[("k", "non_null")] == "4"
    assert m[("name", "nulls")] == "2"
    assert m[("k", "min")] == "1" and m[("k", "max")] == "4"
    assert m[("name", "min")] == "a" and m[("name", "max")] == "b"
    assert float(m[("k", "mean")]) == pytest.approx(2.5)
    assert float(m[("k", "p50")]) in (2.0, 3.0)  # approx median of 1..4
    assert ("name", "mean") not in m  # non-numeric: no moments
    assert int(m[("name", "approx_distinct")]) == 2

    with pytest.raises(ValueError, match="unknown columns"):
        profile_table(df, columns=["nope"])


def test_profile_single_pass_plan(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cols = ["l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"]
    prof = profile_table(li, columns=cols).toPandas()
    # every column profiled, exact null counts vs direct computation
    want_nulls = {
        c: li.where(F.col(c).isNull()).count() for c in cols
    }
    got_nulls = {
        r.column: int(r.value)
        for r in prof.itertuples() if r.metric == "nulls"
    }
    assert got_nulls == want_nulls
    rows = int(prof[(prof.column == "*")].value.iloc[0])
    assert rows == li.count()


def test_catalog_sort_by_layout(spark, tmp_path):
    from lyssandra_spark.sources.catalog import ParquetCatalog

    cat = ParquetCatalog(spark, str(tmp_path / "wh"))
    e = spark.range(1000).select(
        F.col("id"), (F.col("id") * 7919 % 1000).alias("shuffled")
    ).repartition(4)
    cat.write(e, "t", mode="overwrite", sort_by=["shuffled"])
    assert cat.snapshots("t")[-1]["sort_by"] == ["shuffled"]
    # rows come back complete, and within every parquet file the sort
    # column is monotone (tight row-group min/max stats)
    back = cat.read("t")
    assert back.count() == 1000
    import glob
    import os

    files = glob.glob(os.path.join(str(tmp_path / "wh"), "t", "snap=1", "*.parquet"))
    assert files
    for f in files:
        vals = pd.read_parquet(f)["shuffled"].tolist()
        assert vals == sorted(vals)

    with pytest.raises(ValueError, match="sort_by columns"):
        cat.write(e, "t2", sort_by=["missing"])


def test_profile_map_columns_dont_crash(spark):
    df = spark.createDataFrame(
        [(1, {"a": 1.0}), (2, None)], "k long, m map<string,double>"
    )
    prof = profile_table(df).toPandas()
    m = {(r.column, r.metric): r.value for r in prof.itertuples()}
    assert m[("m", "nulls")] == "1" and m[("m", "non_null")] == "1"
    # unorderable/unhashable metrics are skipped for maps, present for k
    assert ("m", "min") not in m and ("m", "approx_distinct") not in m
    assert ("k", "min") in m


def test_profile_nested_map_columns_dont_crash(spark):
    """A map NESTED inside a struct or array is just as unorderable/
    unhashable as a top-level one — those columns must also fall back to
    count/nulls-only instead of crashing the whole one-pass profile."""
    df = spark.createDataFrame(
        [
            (1, {"tags": {"a": 1.0}}, [{"b": 2.0}], {"deep": [{"c": 3}]}),
            (2, None, None, None),
        ],
        "k long, s struct<tags:map<string,double>>, "
        "am array<map<string,double>>, "
        "sd struct<deep:array<map<string,int>>>",
    )
    prof = profile_table(df).toPandas()
    m = {(r.column, r.metric): r.value for r in prof.itertuples()}
    for c in ("s", "am", "sd"):
        assert m[(c, "nulls")] == "1" and m[(c, "non_null")] == "1"
        assert (c, "min") not in m and (c, "approx_distinct") not in m
    # a plain struct WITHOUT a nested map keeps its full metric set
    df2 = spark.createDataFrame(
        [(1, (1, "x")), (2, (2, "y"))], "k long, s struct<a:long,b:string>"
    )
    m2 = {
        (r.column, r.metric): r.value
        for r in profile_table(df2).toPandas().itertuples()
    }
    assert ("s", "min") in m2 and ("s", "approx_distinct") in m2


def test_profile_diff_flags_drift_and_schema_changes(spark):
    from lyssandra_spark.operators.profile import profile_diff

    v1 = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 3], "v": [1.0, 2.0, 3.0]})
    )
    v2 = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 3, 4], "v": [1.0, 2.0, 3.0, 100.0],
                      "extra": ["a", "b", "c", "d"]})
    )
    diff = profile_diff(profile_table(v1), profile_table(v2)).toPandas()
    m = {(r.column, r.metric): r for r in diff.itertuples()}

    row = m[("*", "rows")]
    assert row.before == "3" and row.after == "4" and row.changed
    assert m[("v", "max")].changed          # 3.0 -> 100.0
    assert not m[("k", "min")].changed      # stable metric flagged stable
    # schema evolution: the new column appears one-sided
    assert m[("extra", "non_null")].before is None
    assert m[("extra", "non_null")].changed


def test_profile_diff_one_sided_null_valued_metric_is_changed(spark):
    """A column that appears with ALL-NULL values (broken upstream join)
    emits null-valued metric rows; its one-sided presence must still be
    flagged changed — eqNullSafe(absent, null-valued) alone would not."""
    from lyssandra_spark.operators.profile import profile_diff

    v1 = spark.createDataFrame(pd.DataFrame({"k": [1, 2]}))
    v2 = spark.createDataFrame(
        [(1, None), (2, None)], "k long, broken double"
    )
    diff = profile_diff(profile_table(v1), profile_table(v2)).toPandas()
    m = {(r.column, r.metric): r for r in diff.itertuples()}
    # 'broken' min/max/mean are null-valued AND one-sided: changed
    for metric in ("min", "max", "mean"):
        assert m[("broken", metric)].changed, metric
        assert m[("broken", metric)].before is None
