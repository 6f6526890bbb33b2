"""Edge-case robustness: nulls, empties, single-row groups, odd partitioning."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lyssandra_spark.operators.encode import sparse_code
from lyssandra_spark.operators.windows import rolling, sessionize, with_lag
from lyssandra_spark.sources import synth


@pytest.fixture(scope="module")
def versions(sf_dir):
    return synth.build_dict_versions(sf_dir, n_atoms=64)


def test_encode_null_and_empty_text(spark, versions):
    pdf = pd.DataFrame(
        {
            "conv_id": ["c"] * 4,
            "turn_idx": [0, 1, 2, 3],
            "ts": [dt.datetime(2024, 1, 15)] * 4,
            "text": [None, "", "ok some words here", "ab"],  # ab < ngram size
        }
    )
    out = (
        sparse_code(spark.createDataFrame(pdf), versions, algo="bomp", k=3)
        .toPandas()
        .sort_values("turn_idx")
        .reset_index(drop=True)
    )
    # null/empty/too-short text -> zero embedding -> empty code, err 0
    assert out["nnz"].tolist()[:2] == [0, 0]
    assert out["nnz"][3] == 0  # 2 chars < 4-byte ngram window
    assert out["nnz"][2] > 0
    # expected version derived from the boundaries, not hardcoded
    import datetime as _dt

    from lyssandra_spark.sources import synth as _synth

    ts = _dt.datetime(2024, 1, 15)
    exp_ver = sum(
        1 for b in _synth.VERSION_BOUNDARIES if _dt.datetime.fromisoformat(b) <= ts
    )
    assert (out["dict_version"] == exp_ver).all()


def test_encode_empty_dataframe(spark, versions):
    df = spark.createDataFrame(
        [], "conv_id string, turn_idx int, ts timestamp, text string"
    )
    out = sparse_code(df, versions, algo="bomp", k=3)
    assert out.count() == 0


def test_encode_many_empty_partitions(spark, versions):
    pdf = pd.DataFrame(
        {
            "conv_id": ["c"],
            "turn_idx": [0],
            "ts": [dt.datetime(2024, 1, 15)],
            "text": ["single row many partitions"],
        }
    )
    df = spark.createDataFrame(pdf).repartition(16)
    out = sparse_code(df, versions, algo="bomp", k=3).toPandas()
    assert len(out) == 1 and out["nnz"][0] > 0


def test_windows_single_row_groups(spark):
    pdf = pd.DataFrame(
        {
            "conv_id": [f"c{i}" for i in range(5)],
            "turn_idx": [0] * 5,
            "ts": [dt.datetime(2024, 1, 1, i) for i in range(5)],
            "v": [float(i) for i in range(5)],
        }
    )
    df = spark.createDataFrame(pdf)
    out = rolling(
        with_lag(sessionize(df, 1800), "v"), "v", 3
    ).toPandas()
    assert (out["session_id"] == 0).all()
    assert out["lag1_v"].isna().all()
    assert (out["count_v_3"] == 1).all()


def test_unicode_text_embedding_stable(spark, versions):
    pdf = pd.DataFrame(
        {
            "conv_id": ["c"] * 3,
            "turn_idx": [0, 1, 2],
            "ts": [dt.datetime(2024, 1, 15)] * 3,
            "text": ["héllo wörld ünïcode", "日本語のテキスト🎉", "mixed ascii と 漢字"],
        }
    )
    a = sparse_code(spark.createDataFrame(pdf), versions, k=3).toPandas()
    b = sparse_code(spark.createDataFrame(pdf).repartition(3), versions, k=3).toPandas()
    a = a.sort_values("turn_idx").reset_index(drop=True)
    b = b.sort_values("turn_idx").reset_index(drop=True)
    assert a["recon_err"].tolist() == b["recon_err"].tolist()
    assert (a["nnz"] > 0).all()


def test_encode_block_empty_version_list():
    """No dictionary history at all: every row must get the null code
    (dict_version=-1, empty CSR), not crash (code-review regression)."""
    import numpy as np

    from lyssandra_spark.operators.encode import encode_block

    r = encode_block(["some text here"] * 5, np.arange(5, dtype=np.int64),
                     [], algo="bomp", k=3)
    assert (r["dict_version"] == -1).all()
    assert r["nnz"].tolist() == [0] * 5
    assert len(r["code_idx"]) == 0


def test_vectorized_topk_empty_queries(spark, sf_dir):
    from pyspark.sql import functions as F

    from lyssandra_spark.operators.similarity import cosine_topk_vectorized

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = cosine_topk_vectorized(e, e.where(F.col("vec_id") < 0), k=5)
    assert out.count() == 0
    assert set(out.columns) == {"qid", "vec_id", "cos_sim", "rk"}


def test_decode_wav_degenerate_clips():
    """Empty and very short PCM data must not crash the FFT or emit NaN."""
    import math

    from lyssandra_spark.functions.multimodal import decode_wav, synth_wav

    rate, n, rms, zcr, bands = decode_wav(synth_wav(7, n_samples=0))
    assert (n, rms, bands) == (0, None, None)
    for short in (1, 3, 15):
        rate, n, rms, zcr, bands = decode_wav(synth_wav(7, n_samples=short))
        assert n == short
        assert all(not math.isnan(b) for b in bands)


def test_rolling_count_is_row_count_with_nulls(spark):
    """window_lag_lead_rolling's roll_n5 counts ROWS (count(*)), so null
    values inside the frame must not reduce it (latent oracle divergence
    found in code review — current testdata has no null values)."""
    import pandas as pd

    from lyssandra_spark.plans.queries import window_lag_lead_rolling

    # build a tiny events-like table with nulls, write it, and point the
    # query at it via a temp sf_dir layout
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        pdf = pd.DataFrame({
            "event_id": range(6),
            "user_id": [1] * 6,
            "ts": pd.date_range("2024-01-01", periods=6, freq="1min"),
            "value": [1.0, None, 3.0, None, 5.0, 6.0],
        })
        spark.createDataFrame(pdf).write.parquet(f"{d}/events.parquet")
        out = window_lag_lead_rolling(spark, d).toPandas().sort_values("event_id")
        assert out["roll_n5"].tolist() == [1, 2, 3, 4, 5, 5]
