"""B20 surface completion: grouped-agg pandas UDFs (rms/gini mixed with
built-ins in one agg) and the ParseTranscript UDTF via LATERAL join."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lyssandra_spark.operators.grouped import (
    gini_udf,
    rms_udf,
    session_signal_stats,
)


def test_grouped_agg_udf_matches_algebraic_rewrite(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet").where(
        F.col("value").isNotNull()
    )
    # Spark forbids mixing grouped-agg pandas UDFs with built-in
    # aggregates in one agg() — so the parity check runs them as two
    # aggregations joined on the key
    udf_side = e.groupBy("user_id").agg(rms_udf(F.col("value")).alias("rms_udf"))
    builtin_side = e.groupBy("user_id").agg(
        F.sqrt(F.avg(F.col("value") * F.col("value"))).alias("rms_builtin")
    )
    got = udf_side.join(builtin_side, "user_id").toPandas()
    assert len(got) > 0
    assert np.allclose(got.rms_udf, got.rms_builtin, rtol=1e-12, equal_nan=True)


def test_gini_known_values(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["eq"] * 4 + ["skew"] * 4 + ["zero"] * 2,
                "v": [5.0, 5.0, 5.0, 5.0, 0.0, 0.0, 0.0, 10.0, 0.0, 0.0],
            }
        )
    )
    got = (
        df.groupBy("k").agg(gini_udf(F.col("v")).alias("g"))
        .toPandas().set_index("k")["g"]
    )
    assert got["eq"] == pytest.approx(0.0)          # perfect equality
    assert got["skew"] == pytest.approx(0.75)       # one holder of all mass
    assert got["zero"] == pytest.approx(0.0)        # all-zero group

    # numpy cross-check on a random group
    rng = np.random.default_rng(3)
    v = rng.random(200)
    one = spark.createDataFrame(pd.DataFrame({"k": ["x"] * 200, "v": v}))
    g = one.groupBy("k").agg(gini_udf(F.col("v")).alias("g")).collect()[0]["g"]
    a = np.sort(v)
    n = len(a)
    want = 2 * (np.arange(1, n + 1) * a).sum() / (n * a.sum()) - (n + 1) / n
    assert g == pytest.approx(want, rel=1e-12)


def test_session_signal_stats_single_shuffle(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = session_signal_stats(e, value_col="value", keys="user_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # UDF + built-ins share one agg
    pdf = out.toPandas()
    assert {"n", "mean_v", "rms_v", "gini_v"} <= set(pdf.columns)
    assert (pdf.gini_v.dropna() >= 0).all() and (pdf.gini_v.dropna() <= 1).all()


def test_parse_transcript_udtf(spark):
    from lyssandra_spark.functions.transcripts import parse_transcripts

    raws = pd.DataFrame(
        {
            "conv_id": ["c1", "c2", "c3", "c4"],
            "raw": [
                "user: hi there assistant: hello! user: bye",
                "system:  boot  tool: ran ok assistant:",
                "no markers at all here",
                None,
            ],
        }
    )
    out = (
        parse_transcripts(spark, spark.createDataFrame(raws))
        .toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    c1 = out[out.conv_id == "c1"]
    assert list(c1.role) == ["user", "assistant", "user"]
    assert list(c1.text) == ["hi there", "hello!", "bye"]
    assert list(c1.turn_idx) == [0, 1, 2]
    c2 = out[out.conv_id == "c2"]
    assert list(c2.role) == ["system", "tool", "assistant"]
    assert list(c2.text) == ["boot", "ran ok", ""]  # empty turn kept
    c3 = out[out.conv_id == "c3"]
    assert list(c3.role) == ["unknown"]
    assert list(c3.text) == ["no markers at all here"]
    assert (out.conv_id == "c4").sum() == 0  # null blob yields nothing


def test_grouped_agg_udfs_skip_nulls_like_builtins(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"k": ["a", "a", "a"], "v": [3.0, None, 4.0]})
    )
    got = session_signal_stats(df, value_col="v", keys="k").collect()[0]
    assert got["n"] == 2                      # non-null count
    assert got["mean_v"] == pytest.approx(3.5)
    assert got["rms_v"] == pytest.approx((12.5) ** 0.5)  # sqrt((9+16)/2)
    assert got["gini_v"] is not None and not np.isnan(got["gini_v"])


def test_parse_transcript_preamble_never_dropped(spark):
    from lyssandra_spark.functions.transcripts import parse_transcripts

    raws = pd.DataFrame(
        {"conv_id": ["c1"],
         "raw": ["imported context here user: question assistant: answer"]}
    )
    out = (
        parse_transcripts(spark, spark.createDataFrame(raws))
        .toPandas().sort_values("turn_idx")
    )
    assert list(out.role) == ["unknown", "user", "assistant"]
    assert list(out.text) == ["imported context here", "question", "answer"]
    assert list(out.turn_idx) == [0, 1, 2]
