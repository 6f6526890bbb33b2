"""Property-based tests for the segmented-scan window variants: random
gap patterns, null patterns, and bucket sizes must be EXACTLY equal to the
plain single-partition-per-key operators (SURVEY.md §5.2-5, B16)."""

import datetime as dt

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from lyssandra_spark.operators import windows as W

T0 = dt.datetime(2024, 1, 1)


@st.composite
def transcripts(draw):
    n_keys = draw(st.integers(1, 3))
    rows = []
    for k in range(n_keys):
        n = draw(st.integers(1, 60))
        t = 0
        for i in range(n):
            # random gaps, some crossing the session threshold (30 min)
            t += draw(st.sampled_from([1, 5, 29, 31, 200]))
            val = draw(st.one_of(st.none(), st.integers(0, 9)))
            rows.append((f"k{k}", i, T0 + dt.timedelta(minutes=t),
                         None if val is None else str(val)))
    bucket = draw(st.sampled_from([1, 2, 7, 16, 4096]))
    return rows, bucket


def _pdf(rows):
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts", "v"])


@settings(max_examples=12, deadline=None)
@given(transcripts())
def test_sessionize_bucketed_property(spark, case):
    rows, bucket = case
    df = spark.createDataFrame(_pdf(rows)).repartition(3)
    plain = (
        W.sessionize(df, 1800, part="conv_id", ts_col="ts")
        .select("conv_id", "turn_idx", "session_id").toPandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    buck = (
        W.sessionize_bucketed(df, 1800, part="conv_id", ts_col="ts",
                              order_col="turn_idx", bucket_size=bucket)
        .select("conv_id", "turn_idx", "session_id").toPandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain, buck)


@settings(max_examples=12, deadline=None)
@given(transcripts())
def test_ffill_bucketed_property(spark, case):
    rows, bucket = case
    df = spark.createDataFrame(_pdf(rows)).repartition(3)
    plain = (
        W.ffill(df, "v", part="conv_id", order="turn_idx")
        .select("conv_id", "turn_idx", "v").toPandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    buck = (
        W.ffill_bucketed(df, "v", part="conv_id", order_col="turn_idx",
                         bucket_size=bucket)
        .select("conv_id", "turn_idx", "v").toPandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain, buck)
