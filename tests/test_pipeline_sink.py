"""End-to-end feature materialization through the catalog sink (B18) and
partition-pruned read-back."""

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
