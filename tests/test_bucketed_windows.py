"""Skew-proof bucketed window variants must EXACTLY equal the plain ones,
including on the hot conversation (B16)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lyssandra_spark.operators import windows as W
from lyssandra_spark.sources import synth


@pytest.fixture(scope="module")
def hot(spark, sf_dir):
    t = synth.transcripts(spark, sf_dir)
    # hot conversation (~1400 turns) + a few normal ones
    return t.where(
        (F.col("conv_id") == "conv-0-0") | (F.col("conv_id").isin("conv-1-0", "conv-2-0"))
    ).withColumn("v", F.length("text").cast("double")).cache()


def _sorted(df, cols):
    return (
        df.select("conv_id", "turn_idx", *cols)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("bucket_size", [64, 257, 4096])
def test_lag_bucketed_equals_plain(spark, hot, bucket_size):
    plain = W.with_lag(hot, "v", n=3)
    buck = W.with_lag_bucketed(hot, "v", n=3, bucket_size=bucket_size)
    pd.testing.assert_frame_equal(
        _sorted(plain, ["lag3_v"]), _sorted(buck, ["lag3_v"])
    )


@pytest.mark.parametrize("bucket_size", [64, 300])
def test_rolling_bucketed_equals_plain(spark, hot, bucket_size):
    plain = W.rolling(hot, "v", 5)
    buck = W.rolling_bucketed(hot, "v", 5, bucket_size=bucket_size)
    cols = ["avg_v_5", "sum_v_5", "count_v_5"]
    pd.testing.assert_frame_equal(_sorted(plain, cols), _sorted(buck, cols))


def test_bucketed_partitions_are_bounded(spark, hot):
    """The window partition key includes the bucket: no partition holds
    more than bucket_size + lookback rows."""
    buck = W.with_lag_bucketed(hot, "v", n=2, bucket_size=64)
    plan = buck._jdf.queryExecution().executedPlan().toString()
    assert "__bkt" in plan  # partitioning includes the bucket column


def test_lookback_must_fit(spark, hot):
    with pytest.raises(ValueError):
        W.with_lag_bucketed(hot, "v", n=64, bucket_size=64)


@pytest.mark.parametrize("bucket_size", [64, 257, 4096])
def test_sessionize_bucketed_equals_plain(spark, hot, bucket_size):
    """Segmented-scan sessionize == plain unbounded cumsum, incl. the hot
    conversation and session boundaries that land on bucket boundaries."""
    plain = W.sessionize(hot, 1800, part="conv_id", ts_col="ts")
    buck = W.sessionize_bucketed(hot, 1800, part="conv_id", ts_col="ts",
                                 order_col="turn_idx", bucket_size=bucket_size)
    pd.testing.assert_frame_equal(
        _sorted(plain, ["session_id"]), _sorted(buck, ["session_id"])
    )


@pytest.mark.parametrize("bucket_size", [64, 300])
def test_ffill_bucketed_equals_plain(spark, hot, bucket_size):
    """Bucketed forward-fill == plain, incl. null runs that span multiple
    buckets (role has ~5% nulls; also null out a long stretch)."""
    src = hot.withColumn(
        "role2",
        F.when((F.col("turn_idx") > 100) & (F.col("turn_idx") < 600),
               F.lit(None).cast("string")).otherwise(F.col("role")),
    )
    plain = W.ffill(src, "role2", part="conv_id", order="turn_idx")
    buck = W.ffill_bucketed(src, "role2", part="conv_id",
                            order_col="turn_idx", bucket_size=bucket_size)
    pd.testing.assert_frame_equal(
        _sorted(plain, ["role2"]), _sorted(buck, ["role2"])
    )


def test_sessionize_bucketed_partition_bounded(spark, hot):
    buck = W.sessionize_bucketed(hot, 1800, bucket_size=64)
    plan = buck._jdf.queryExecution().executedPlan().toString()
    assert "__bkt" in plan
