"""End-to-end feature materialization through the catalog sink (B18) and
partition-pruned read-back."""

import glob
import os

from pyspark.sql import functions as F

from lyssandra_spark.plans.pipeline import coded_transcripts, materialize_features
from lyssandra_spark.sources.catalog import ParquetCatalog


def test_materialize_and_prune(spark, sf_dir, tmp_path):
    wh = str(tmp_path / "wh")
    snap = materialize_features(spark, sf_dir, wh)
    assert snap == 1
    cat = ParquetCatalog(spark, wh)
    back = cat.read("turn_features")
    exp = coded_transcripts(spark, sf_dir, algo="bomp", k=5).drop("text")
    assert back.count() == exp.count()
    assert "text" not in back.columns and "code_idx" in back.columns

    # partition pruning: a ts_day filter must prune partitions at scan time
    withp = cat.read("turn_features", keep_partition_cols=True)
    one_day = withp.select("ts_day").first()["ts_day"]
    q = withp.where(F.col("ts_day") == one_day)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(ts_day" in plan
    assert q.count() > 0


def test_skeleton_cache_write_once(spark, sf_dir):
    """flagship_skeleton's oracle parquet is written once per fingerprint:
    a second invocation must NOT rewrite it (so an oracle-first driver
    ordering reads stable bytes), and the DuckDB oracle read works after
    each invocation."""
    import duckdb

    from lyssandra_spark.plans.pipeline import (
        SKELETON_ORACLE_SQL,
        SKELETON_PATH,
        flagship_skeleton,
    )

    n1 = flagship_skeleton(spark, sf_dir).count()
    oracle1 = duckdb.sql(SKELETON_ORACLE_SQL).df()
    mtimes1 = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(SKELETON_PATH, "*.parquet"))
    }
    assert mtimes1, "skeleton parquet missing after first run"

    n2 = flagship_skeleton(spark, sf_dir).count()
    oracle2 = duckdb.sql(SKELETON_ORACLE_SQL).df()
    mtimes2 = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(SKELETON_PATH, "*.parquet"))
    }
    assert mtimes2 == mtimes1, "second invocation rewrote the cached parquet"
    assert n1 == n2 == len(oracle1) == len(oracle2)


def test_materialize_once_refreshes_on_fingerprint_change(spark, tmp_path):
    from lyssandra_spark.plans.pipeline import materialize_once

    path = str(tmp_path / "cache_tbl")
    materialize_once(lambda: spark.range(3), path, "fp-a")
    assert spark.read.parquet(path).count() == 3
    # same fingerprint: builder must not even be called
    materialize_once(lambda: (_ for _ in ()).throw(AssertionError("rebuilt")),
                     path, "fp-a")
    # changed fingerprint: rewritten with the new content
    materialize_once(lambda: spark.range(5), path, "fp-b")
    assert spark.read.parquet(path).count() == 5
