"""DSIR importance resampling (Xie et al. 2023): numpy oracle parity
for model fitting and log-weights (hashing taken from Spark, all
probability math recomputed independently), neutral-model zero
weights, directional shift toward the target domain, Gumbel top-k
determinism / partitioning-independence / softmax bias."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lyssandra_spark.operators.dsir import (
    dsir_logweights,
    dsir_resample,
    fit_hashed_ngram_model,
    hashed_ngram_buckets,
)

M = 97  # small prime so collisions actually occur in tests


def _docs(spark, texts, offset=0):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": [offset + i for i in range(len(texts))],
                      "text": texts})
    )


def _bucket_lists(spark, texts, m=M, ngram=2):
    """The Spark-side hashing, collected — the shared primitive both
    the operator and the oracle build on."""
    rows = (
        _docs(spark, texts)
        .select("doc_id", hashed_ngram_buckets("text", m, ngram).alias("b"))
        .orderBy("doc_id")
        .collect()
    )
    return [list(r["b"]) for r in rows]


def _oracle_logp(bucket_lists, m=M, alpha=1.0):
    counts = np.zeros(m)
    for bl in bucket_lists:
        for b in bl:
            counts[b] += 1
    return np.log((counts + alpha) / (counts.sum() + alpha * m))


RAW = [
    "the stock market fell sharply on tuesday",
    "quarterly earnings beat analyst expectations",
    "the recipe calls for two cups of flour",
    "bake at 350 degrees until golden brown",
    "the defendant was found not guilty",
    "",
]
TARGET = [
    "the theorem follows from the inductive hypothesis",
    "we prove the lemma by contradiction",
    "the proof of the theorem is by induction",
]


def test_bucket_structure(spark):
    bl = _bucket_lists(spark, ["a b c", "a", "", None], m=M, ngram=2)
    assert len(bl[0]) == 5  # 3 unigrams + 2 bigrams
    assert len(bl[1]) == 1  # 1 unigram, no bigram
    assert bl[2] == []      # empty doc
    assert bl[3] == []      # NULL text == empty doc (coalesced), NOT null
    assert all(0 <= b < M for doc in bl for b in doc)
    # unigram-only mode drops the bigrams but keeps the same unigrams
    bl1 = _bucket_lists(spark, ["a b c"], m=M, ngram=1)
    assert bl1[0] == bl[0][:3]


def test_fit_matches_numpy_oracle(spark):
    bl = _bucket_lists(spark, RAW)
    got = fit_hashed_ngram_model(_docs(spark, RAW), m=M, alpha=0.5)
    want = _oracle_logp(bl, alpha=0.5)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # a proper distribution: logsumexp == 0
    assert math.isclose(np.logaddexp.reduce(got), 0.0, abs_tol=1e-9)


def test_logweights_match_numpy_oracle(spark):
    lt = _oracle_logp(_bucket_lists(spark, TARGET))
    lr = _oracle_logp(_bucket_lists(spark, RAW))
    out = (
        dsir_logweights(_docs(spark, RAW), lt, lr, text_col="text")
        .orderBy("doc_id")
        .collect()
    )
    ratio = lt - lr
    for row, bl in zip(out, _bucket_lists(spark, RAW)):
        want = float(sum(ratio[b] for b in bl))
        assert row["dsir_logw"] == pytest.approx(want, rel=1e-12)
    # the empty doc scores exactly 0
    assert out[-1]["dsir_logw"] == 0.0
    # NULL text scores exactly 0 too (not NULL -> not silently
    # unsampleable), and resample can still select it
    nul = dsir_logweights(_docs(spark, [None, "x"]), lt, lr).collect()
    assert all(r["dsir_logw"] == 0.0 for r in nul if r["doc_id"] == 0)


def test_identical_models_give_zero_weights(spark):
    lp = fit_hashed_ngram_model(_docs(spark, RAW), m=M)
    out = dsir_logweights(_docs(spark, RAW), lp, lp).collect()
    assert all(r["dsir_logw"] == 0.0 for r in out)


def test_weights_favor_target_domain(spark):
    lt = fit_hashed_ngram_model(_docs(spark, TARGET), m=M)
    lr = fit_hashed_ngram_model(_docs(spark, RAW + TARGET), m=M)
    mixed = RAW + ["we prove the theorem by induction"]
    out = {
        r["doc_id"]: r["dsir_logw"]
        for r in dsir_logweights(_docs(spark, mixed), lt, lr).collect()
    }
    math_doc = out[len(mixed) - 1]
    assert all(math_doc > out[i] for i in range(len(RAW)))


def test_model_shape_mismatch_rejected(spark):
    with pytest.raises(ValueError, match="same m"):
        dsir_logweights(_docs(spark, RAW), np.zeros(4), np.zeros(5))
    with pytest.raises(ValueError, match="alpha"):
        fit_hashed_ngram_model(_docs(spark, RAW), alpha=0.0)
    with pytest.raises(ValueError, match="ngram"):
        hashed_ngram_buckets("text", m=M, ngram=3)


def test_resample_deterministic_and_partitioning_independent(spark):
    df = _docs(spark, [f"doc number {i} filler words" for i in range(60)])
    scored = df.withColumn("dsir_logw", F.lit(0.0))
    a = sorted(r["doc_id"] for r in dsir_resample(scored, 10).collect())
    b = sorted(
        r["doc_id"]
        for r in dsir_resample(scored.repartition(7), 10).collect()
    )
    assert a == b and len(a) == 10
    # a different salt namespace draws a different sample
    c = sorted(
        r["doc_id"]
        for r in dsir_resample(scored, 10, salt="other-v1").collect()
    )
    assert c != a
    # selected rows are a subset of the input with all columns intact
    cols = dsir_resample(scored, 10).columns
    assert cols == scored.columns


def test_resample_follows_weights(spark):
    # 40 heavy docs (logw=6) vs 160 light (logw=0): softmax mass is
    # ~99% on the heavy block, so 20 draws land mostly heavy
    n_heavy, n_light = 40, 160
    df = _docs(spark, ["x"] * (n_heavy + n_light)).withColumn(
        "dsir_logw",
        F.when(F.col("doc_id") < n_heavy, F.lit(6.0)).otherwise(F.lit(0.0)),
    )
    got = [r["doc_id"] for r in dsir_resample(df, 20).collect()]
    heavy = sum(1 for i in got if i < n_heavy)
    assert heavy >= 16
    # temperature -> infinity flattens the distribution: expect a mix
    flat = [
        r["doc_id"]
        for r in dsir_resample(df, 20, temperature=1e6).collect()
    ]
    assert sum(1 for i in flat if i < n_heavy) < 16


def test_resample_null_and_nan_never_win(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["a", "b", "c", "d"],
            "dsir_logw": [1.0, None, float("nan"), 0.5],
        }
    )
    df = spark.createDataFrame(pdf)
    got = sorted(r["doc_id"] for r in dsir_resample(df, 2).collect())
    assert got == [0, 3]


def test_incremental_counts_match_one_shot_fit(spark, tmp_path):
    """The raw-corpus model maintained through refresh_aggregate over
    per-batch dsir_bucket_counts equals the one-shot fit — the
    never-re-tokenize-history path."""
    from lyssandra_spark.operators.dsir import (
        dsir_bucket_counts,
        fit_from_counts,
    )
    from lyssandra_spark.operators.incremental import refresh_aggregate
    from lyssandra_spark.sources.catalog import ParquetCatalog

    cat = ParquetCatalog(spark, str(tmp_path / "dsir"))
    b1, b2 = RAW[:3], RAW[3:]
    cat.write(dsir_bucket_counts(_docs(spark, b1), m=M), "bcounts",
              mode="overwrite")
    refresh_aggregate(cat, "bcounts", "bagg", keys="bucket", sum_cols="n")
    cat.write(dsir_bucket_counts(_docs(spark, b2, offset=3), m=M),
              "bcounts", mode="append")
    refresh_aggregate(cat, "bcounts", "bagg", keys="bucket", sum_cols="n")
    got = fit_from_counts(cat.read("bagg"), m=M, n_col="sum_n")
    want = fit_hashed_ngram_model(_docs(spark, RAW), m=M)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # counts built with a different m are rejected loudly
    with pytest.raises(ValueError, match="different m"):
        fit_from_counts(cat.read("bagg"), m=7, n_col="sum_n")


def test_resample_weight_monotonicity(spark):
    """Raising one document's log-weight (same salt, same k) can only
    help it: a document already in the sample stays in after its
    weight increases — the Gumbel key is weight + fixed noise, so its
    key rises while every other key is unchanged."""
    df = _docs(spark, [f"doc {i} words" for i in range(50)])
    base = df.withColumn(
        "dsir_logw",
        F.when(F.col("doc_id") % 3 == 0, F.lit(1.0)).otherwise(F.lit(0.0)),
    )
    picked = {r["doc_id"] for r in dsir_resample(base, 12).collect()}
    target = sorted(picked)[0]
    boosted = df.withColumn(
        "dsir_logw",
        F.when(F.col("doc_id") == target, F.lit(50.0)).otherwise(
            F.when(F.col("doc_id") % 3 == 0, F.lit(1.0)).otherwise(
                F.lit(0.0)
            )
        ),
    )
    picked2 = {r["doc_id"] for r in dsir_resample(boosted, 12).collect()}
    assert target in picked2


def test_random_corpus_oracle_sweep(spark):
    """Randomized corpora x (m, ngram, alpha): fit + logweights always
    match the independent numpy oracle."""
    import random

    rnd = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "x9", "qq", "zz7"]
    for trial in range(3):
        texts = [
            " ".join(rnd.choices(vocab, k=rnd.randrange(0, 9)))
            for _ in range(12)
        ]
        m = rnd.choice([31, 64, 101])
        ngram = rnd.choice([1, 2])
        alpha = rnd.choice([0.1, 1.0])
        bl = _bucket_lists(spark, texts, m=m, ngram=ngram)
        got = fit_hashed_ngram_model(
            _docs(spark, texts), m=m, ngram=ngram, alpha=alpha
        )
        want = _oracle_logp(bl, m=m, alpha=alpha)
        np.testing.assert_allclose(got, want, rtol=1e-12)
        ratio = want - _oracle_logp(bl[:6], m=m, alpha=alpha)
        out = (
            dsir_logweights(
                _docs(spark, texts), want,
                _oracle_logp(bl[:6], m=m, alpha=alpha),
                ngram=ngram,
            )
            .orderBy("doc_id")
            .collect()
        )
        for row, doc in zip(out, bl):
            assert row["dsir_logw"] == pytest.approx(
                float(sum(ratio[b] for b in doc)), rel=1e-10, abs=1e-12
            )


def test_resample_plan_is_takeordered(spark):
    df = _docs(spark, ["a"] * 10).withColumn("dsir_logw", F.lit(0.0))
    plan = (
        dsir_resample(df, 3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_resample_threshold_method(spark):
    """The corpus-scale path: approximately k rows, heavy weights
    dominate, and the plan is a filter — NOT a per-task k-heap."""
    n, k = 400, 100
    df = _docs(spark, ["words here"] * n).withColumn(
        "dsir_logw",
        F.when(F.col("doc_id") < 120, F.lit(8.0)).otherwise(F.lit(0.0)),
    )
    got = dsir_resample(df, k, method="threshold")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" not in plan
    rows = got.collect()
    assert abs(len(rows) - k) <= n // 10  # sketch-approximate size
    heavy = sum(1 for r in rows if r["doc_id"] < 120)
    assert heavy >= 0.8 * len(rows)
    assert got.columns == df.columns
    # k >= n short-circuits to the whole frame; exact/threshold agree
    # on the degenerate everything case
    assert dsir_resample(df, n + 5, method="threshold").count() == n
    with pytest.raises(ValueError, match="method"):
        dsir_resample(df, 5, method="nope")


def test_resample_auto_routes_to_threshold_above_exact_limit(spark):
    """The auto cutover is deliberately conservative (exact_limit
    default 100k — a per-task k-row heap is per CONCURRENT task): above
    it the default path must be the sketch+filter plan, never
    TakeOrdered."""
    import inspect

    sig = inspect.signature(dsir_resample)
    assert sig.parameters["exact_limit"].default == 100_000

    df = spark.range(200_000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97).cast("double").alias("dsir_logw"),
    )
    got = dsir_resample(df, 150_000)  # method="auto", k > exact_limit
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" not in plan
    n = got.count()
    assert abs(n - 150_000) <= 15_000  # sketch-approximate cut
    # and under the limit the exact heap plan still serves
    plan_small = (
        dsir_resample(df, 50)._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan_small
