"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
NeurIPS 2023). Select raw-corpus documents that look like a small
high-quality TARGET corpus, by importance weights between two hashed
bag-of-n-grams language models — the published, widely-replicated
recipe for domain-targeted pretraining-data selection.

The pipeline, Spark-first:

1. :func:`hashed_ngram_buckets` — per-document unigram+bigram word
   n-grams hashed into ``m`` buckets (Xie et al. use m=10,000). Pure
   JVM array expressions over the shared
   :func:`~lyssandra_spark.functions.textstats.word_tokens` tokenizer:
   no Python, no shuffle, pipelined into the scan.
2. :func:`fit_hashed_ngram_model` — a smoothed categorical over the
   ``m`` buckets for one corpus. ONE explode + groupBy(bucket) count:
   natural-language bucket skew is absorbed by map-side partial
   aggregation (a hot bucket crosses the wire once per task), and the
   driver collect is bounded by ``m`` rows — NOT by corpus size. At
   100 TB this is one shuffle of at most m rows per task.
3. :func:`dsir_logweights` — per-document log importance weight
   ``sum_b count_b * (log p_target[b] - log p_raw[b])``. The m-entry
   log-ratio table ships as ONE array literal (data payload, not plan
   nodes) and the per-doc sum is a JVM ``aggregate`` fold with
   ``F.get`` lookups — map-only, zero shuffle, zero Python; scoring
   100 TB is a single pass pipelined into the scan.
4. :func:`dsir_resample` — sample k documents WITHOUT replacement with
   probability proportional to exp(logweight / temperature) via the
   Gumbel top-k trick (Vieira 2014; Kool et al. 2019): add i.i.d.
   Gumbel noise to each log-weight and take the global top-k. The
   noise derives from the same deterministic
   :func:`~lyssandra_spark.operators.split._unit_hash` every sampler
   in this package uses — key-consistent, reproducible across
   runs/partitionings, salt-namespaced — and the top-k is Spark's
   TakeOrderedAndProject (per-partition top-k, k rows to the driver
   merge; never a full sort of the corpus).

Determinism: everything here is a pure function of (corpus bytes,
parameters, salt). There is no RNG state; re-running any step on a
repartitioned input returns identical results (the per-doc fold sums
in document n-gram order, which partitioning cannot change).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lyssandra_spark.functions.textstats import word_tokens
from lyssandra_spark.operators.split import _unit_hash

__all__ = [
    "hashed_ngram_buckets",
    "dsir_bucket_counts",
    "fit_hashed_ngram_model",
    "fit_from_counts",
    "dsir_logweights",
    "dsir_resample",
]


def hashed_ngram_buckets(
    text_col: str = "text", m: int = 10_000, ngram: int = 2
) -> Column:
    """``array<int>`` of hashed word-n-gram bucket ids for one document.

    Buckets are ``pmod(xxhash64(tok_1, ..., tok_n), m)`` over the
    shared lowercased-alnum :func:`word_tokens`; ``ngram=2`` emits
    unigrams AND bigrams (the paper's feature set), ``ngram=1``
    unigrams only. Order within the array follows document order
    (unigrams first), which makes downstream float folds
    partitioning-independent. Pure JVM; a document with fewer tokens
    than ``n`` simply contributes no n-grams at that order.
    """
    if m < 1:
        raise ValueError(f"m ({m}) must be >= 1")
    if ngram not in (1, 2):
        raise ValueError(f"ngram ({ngram}) must be 1 or 2")
    toks = word_tokens(text_col)
    uni = F.transform(toks, lambda t: F.pmod(F.xxhash64(t), F.lit(m)))
    if ngram == 1:
        out = uni
    else:
        n = F.size(toks)
        # zip token i with i+1; slice lengths clamp to 0 for short docs
        bi = F.zip_with(
            F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.pmod(F.xxhash64(a, b), F.lit(m)),
        )
        out = F.concat(uni, bi)
    # NULL text tokenizes to a NULL array, which would poison every
    # downstream fold to NULL (an unsampleable -inf in dsir_resample)
    # while text='' scores 0.0 — coalesce so both degenerate classes
    # behave identically: no n-grams, weight 0
    return F.coalesce(out.cast("array<int>"), F.array().cast("array<int>"))


def dsir_bucket_counts(
    df: DataFrame,
    text_col: str = "text",
    m: int = 10_000,
    ngram: int = 2,
) -> DataFrame:
    """``(bucket, n)`` hashed-n-gram occurrence counts for ONE corpus
    or batch — the SUM-MERGEABLE aggregate behind the raw-corpus model
    (the :func:`~lyssandra_spark.operators.dedup.paragraph_counts`
    pattern). Persist per-batch outputs to a catalog table and maintain
    corpus-wide totals with :func:`~lyssandra_spark.operators
    .incremental.refresh_aggregate` (``keys="bucket", sum_cols="n"``):
    re-fitting the raw model after a new shard then folds only the
    delta's <= m count rows instead of re-tokenizing 100 TB of history
    (:func:`fit_from_counts` on the maintained table). One explode +
    one count shuffle with map-side partials; at most m rows cross the
    wire per upstream task."""
    return (
        df.select(
            F.explode(hashed_ngram_buckets(text_col, m, ngram)).alias(
                "bucket"
            )
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


def fit_from_counts(
    counts: DataFrame,
    m: int = 10_000,
    alpha: float = 1.0,
    bucket_col: str = "bucket",
    n_col: str = "n",
) -> np.ndarray:
    """The smoothed categorical from a ``(bucket, n)`` counts frame —
    :func:`dsir_bucket_counts` output, or a refresh_aggregate-maintained
    table (pass ``n_col="sum_n"``). Bounded driver collect (<= m rows).
    """
    if alpha <= 0:
        raise ValueError(f"alpha ({alpha}) must be > 0 (smoothing)")
    rows = counts.select(bucket_col, n_col).collect()
    vec = np.zeros(m, dtype=np.float64)
    for r in rows:
        b = r[bucket_col]
        if not (0 <= b < m):
            raise ValueError(
                f"bucket id {b} out of range for m={m} — counts were "
                "built with a different m"
            )
        vec[b] = r[n_col]
    total = vec.sum()
    return np.log((vec + alpha) / (total + alpha * m))


def fit_hashed_ngram_model(
    df: DataFrame,
    text_col: str = "text",
    m: int = 10_000,
    ngram: int = 2,
    alpha: float = 1.0,
) -> np.ndarray:
    """Fit the smoothed hashed-n-gram categorical for one corpus.

    Returns an ``m``-vector of log-probabilities
    ``log((count_b + alpha) / (total + alpha * m))`` (add-alpha
    smoothing, so unseen buckets keep finite mass and the importance
    ratio never divides by zero — the paper's setup). The driver-side
    object is bounded by ``m`` (default 10k doubles), independent of
    corpus size; the single shuffle carries at most ``m`` rows per
    upstream task thanks to map-side partial counts. Equivalent by
    construction to ``fit_from_counts(dsir_bucket_counts(df))`` — use
    that pair when the raw corpus grows in batches.
    """
    return fit_from_counts(
        dsir_bucket_counts(df, text_col, m, ngram), m, alpha
    )


def dsir_logweights(
    df: DataFrame,
    logp_target: np.ndarray,
    logp_raw: np.ndarray,
    text_col: str = "text",
    ngram: int = 2,
    out_col: str = "dsir_logw",
) -> DataFrame:
    """Append each document's log importance weight under the two
    fitted models: ``sum over n-gram occurrences of
    (logp_target[bucket] - logp_raw[bucket])``.

    The m-entry log-ratio ships as one array LITERAL (~8 B per bucket
    of plan payload, a single node — not m expression nodes) and the
    per-document sum is a JVM ``aggregate`` fold over the bucket
    array with ``F.get`` — map-only, no shuffle, no Python, pipelined
    into the scan alongside any other projection. Documents with no
    tokens — empty AND null text — score 0.0 (an empty product of
    ratios; see the coalesce in :func:`hashed_ngram_buckets`).
    """
    lt = np.asarray(logp_target, dtype=np.float64)
    lr = np.asarray(logp_raw, dtype=np.float64)
    if lt.shape != lr.shape or lt.ndim != 1:
        raise ValueError(
            f"model shapes differ: {lt.shape} vs {lr.shape} — both models "
            "must be fit with the same m"
        )
    m = int(lt.shape[0])
    ratio = F.lit([float(v) for v in (lt - lr)])
    buckets = hashed_ngram_buckets(text_col, m, ngram)
    score = F.aggregate(
        buckets, F.lit(0.0), lambda acc, b: acc + F.get(ratio, b)
    )
    return df.withColumn(out_col, score)


def dsir_resample(
    df: DataFrame,
    k: int,
    logw_col: str = "dsir_logw",
    key_cols="doc_id",
    salt: str = "dsir-gumbel-v1",
    temperature: float = 1.0,
    method: str = "auto",
    exact_limit: int = 100_000,
    accuracy: int = 10_000,
) -> DataFrame:
    """Gumbel top-k resampling: k documents without replacement, with
    probability proportional to ``exp(logw / temperature)``.

    Adding i.i.d. Gumbel(0,1) noise to each ``logw`` and taking the
    top-k is exactly sampling k items without replacement from the
    softmax distribution (Vieira 2014; Kool et al. 2019) — the
    "resampling" half of DSIR. The noise is
    ``-log(-log(u))`` with ``u`` the package-wide deterministic
    ``_unit_hash(key_cols, salt)``: no RNG state, reproducible across
    runs and partitionings, key-consistent (every row of a leakage key
    draws the same noise), and ``salt``-namespaced independent of
    split/sample/mix decisions. ``u`` is clamped away from {0, 1} so
    the log never produces an infinity. Ties (impossible up to hash
    granularity) break on the key hash itself, keeping the output a
    pure function of input + parameters.

    Two physical strategies, because "top-k" changes shape with k:

    - ``method="exact"`` — ``TakeOrderedAndProject``: each task keeps
      a k-row heap, the driver merges them. EXACTLY k rows, no
      shuffle — but per-task memory is O(k) PER CONCURRENT TASK (a
      100k-row heap of wide rows x 32 task slots is already GBs of
      executor memory), so the ``auto`` cutover to the threshold plan
      is deliberately conservative at 100k; pass ``method="exact"``
      with a larger ``exact_limit`` only when the rows are narrow and
      exactly-k matters more than the heap footprint.
    - ``method="threshold"`` — the corpus-scale path (resampling 1% of
      10^11 documents cannot heap 10^9 rows per task): one
      ``approx_percentile`` sketch pass finds the (1 - k/n) quantile
      of the Gumbel key, then a map-only ``>=`` filter keeps the top
      mass — :func:`~lyssandra_spark.operators.split.quantile_filter`
      composition, same plan shape as the CCNet keep filter. Returns
      APPROXIMATELY k rows (sketch ``accuracy``), which is what a
      training-mixture budget needs at that scale; the selected-set
      semantics (softmax without replacement) are unchanged since the
      key is the same — only the cut is approximate.
    - ``method="auto"`` (default) — exact for ``k <= exact_limit``,
      threshold above.

    Null/NaN log-weights never win under either method (they map to
    -inf before the noise is added).
    """
    if k < 1:
        raise ValueError(f"k ({k}) must be >= 1")
    if temperature <= 0:
        raise ValueError(f"temperature ({temperature}) must be > 0")
    if method not in ("auto", "exact", "threshold"):
        raise ValueError(f"unknown method {method!r}")
    u = _unit_hash(key_cols, salt)
    eps = 1e-12
    u = F.least(F.greatest(u, F.lit(eps)), F.lit(1.0 - eps))
    gumbel = -F.log(-F.log(u))
    w = F.col(logw_col).cast("double")
    w = F.when(F.isnan(w) | w.isNull(), F.lit(-math.inf)).otherwise(w)
    key = (w / F.lit(float(temperature))) + gumbel
    if method == "auto":
        method = "exact" if k <= exact_limit else "threshold"
    if method == "exact":
        return (
            df.withColumn("__dsir_key", key)
            .orderBy(F.col("__dsir_key").desc(), _unit_hash(key_cols, salt))
            .limit(k)
            .drop("__dsir_key")
        )
    from lyssandra_spark.operators.split import quantile_filter

    n = df.count()
    if n == 0:
        return df
    if k >= n:
        return df
    return quantile_filter(
        df.withColumn("__dsir_key", key), "__dsir_key",
        keep_frac=k / n, accuracy=accuracy,
    ).drop("__dsir_key")
