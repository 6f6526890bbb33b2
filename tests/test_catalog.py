"""Catalog adapter: snapshots, time-travel, hidden partitioning."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lyssandra_spark.sources.catalog import ParquetCatalog


@pytest.fixture()
def cat(spark, tmp_path):
    return ParquetCatalog(spark, str(tmp_path / "warehouse"))


def test_write_read_roundtrip(spark, cat, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    cat.write(df, "events_copy", mode="overwrite")
    back = cat.read("events_copy")
    assert back.count() == df.count()
    assert sorted(back.columns) == sorted(df.columns)


def test_hidden_partitioning(spark, cat, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    cat.write(
        df, "events_part", mode="overwrite",
        partition_by={"ts_day": "date_trunc('day', ts)",
                      "user_bucket": "pmod(hash(user_id), 4)"},
    )
    back = cat.read("events_part")
    # derived partition columns are hidden on read (Iceberg-transform style)
    assert "ts_day" not in back.columns and "user_bucket" not in back.columns
    assert back.count() == df.count()
    withp = cat.read("events_part", keep_partition_cols=True)
    assert "ts_day" in withp.columns


def test_snapshot_time_travel_append(spark, cat, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    s1 = cat.write(df.where(F.col("user_id") < 5), "ev", mode="overwrite")
    s2 = cat.write(df.where(F.col("user_id") >= 5), "ev", mode="append")
    assert [s1, s2] == [1, 2]
    assert cat.read("ev", as_of=s1).count() == df.where(F.col("user_id") < 5).count()
    assert cat.read("ev").count() == df.count()
    # a later overwrite resets the chain
    s3 = cat.write(df.limit(10), "ev", mode="overwrite")
    assert cat.read("ev").count() == 10
    assert cat.read("ev", as_of=s2).count() == df.count()  # history preserved
    assert "ev" in cat.tables()
