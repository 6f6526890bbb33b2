"""GPT-3-style quality classifier: featurizer known values, planted
separability, map-only plans, composition with the curation filters."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lyssandra_spark.operators.quality import (
    FEATURE_NAMES,
    featurize_documents,
    quality_scores,
    train_quality_classifier,
)


def _docs(spark, texts, offset=0):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": [offset + i for i in range(len(texts))],
                      "text": texts})
    )


def test_featurize_known_values(spark):
    texts = [
        "Hello world",          # 2 tokens, 10 letters, 1 upper, 1 space
        "",                     # empty: all zeros
        "123 456!",             # digits + punct
        None,                   # null text == empty text
    ]
    out = (
        featurize_documents(_docs(spark, texts))
        .toPandas().set_index("doc_id").sort_index()
    )
    f0 = dict(zip(FEATURE_NAMES, out.loc[0, "features"]))
    assert f0["log1p_n_chars"] == pytest.approx(np.log1p(11))
    assert f0["log1p_n_tokens"] == pytest.approx(np.log1p(2))
    assert f0["mean_token_len"] == pytest.approx(5.0)
    assert f0["punct_frac"] == 0.0
    assert f0["digit_frac"] == 0.0
    assert f0["upper_frac"] == pytest.approx(1 / 10)
    assert f0["ws_frac"] == pytest.approx(1 / 11)

    assert list(out.loc[1, "features"]) == [0.0] * len(FEATURE_NAMES)
    assert list(out.loc[3, "features"]) == [0.0] * len(FEATURE_NAMES)

    f2 = dict(zip(FEATURE_NAMES, out.loc[2, "features"]))
    assert f2["digit_frac"] == pytest.approx(6 / 8)
    assert f2["punct_frac"] == pytest.approx(1 / 8)
    assert f2["upper_frac"] == 0.0  # no letters -> safe denominator

    # every vector has the documented fixed length
    assert all(len(v) == len(FEATURE_NAMES) for v in out["features"])


def test_classifier_separates_planted_negatives(spark, sf_dir):
    """Brown 2020 App. A shape: positives = the documents table,
    negatives = deterministic derived junk (digit-interleaved reversed
    text — destroys token/char statistics). Train accuracy and held-out
    score separation must both be strong."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    junk = d.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat_ws(
            "7", F.reverse(F.col("text")), F.lit("qz8 xj3 vv99 !!###")
        ).alias("text"),
    )
    w, acc = train_quality_classifier(d, junk)
    assert len(w) == len(FEATURE_NAMES) + 1
    assert acc > 0.9, acc

    scored = quality_scores(d.unionByName(junk), w).toPandas()
    pos = scored[scored.doc_id < 100000].quality_score
    neg = scored[scored.doc_id >= 100000].quality_score
    assert pos.mean() > neg.mean() + 0.5
    # determinism: identical weights on a repartitioned union — the
    # sufficient statistics are additive, so only float order can move;
    # scores must agree to float tolerance
    w2, _ = train_quality_classifier(d.repartition(7), junk.repartition(5))
    assert np.allclose(w, w2, rtol=1e-8)


def test_quality_scoring_is_map_only_and_composes(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    w = np.arange(len(FEATURE_NAMES) + 1, dtype=float) / 10.0
    scored = quality_scores(d, w)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan

    # composition: the score column feeds quantile_filter directly
    from lyssandra_spark.operators.split import quantile_filter

    kept = quantile_filter(scored, "quality_score", 0.5)
    n = scored.count()
    assert 0.4 * n <= kept.count() <= 0.6 * n

    with pytest.raises(ValueError, match="expected"):
        quality_scores(d, np.ones(3))
