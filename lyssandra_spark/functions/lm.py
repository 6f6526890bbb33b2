"""Character n-gram language-model quality scoring (CCNet-style filter).

Production curation pipelines rank documents by LM likelihood and drop
the gibberish tail (Wenzek et al. 2020, "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data", uses a 5-gram KenLM; this
module is the deterministic, dependency-free analogue: a character
n-gram multinomial trained ON the corpus itself, add-alpha smoothed).

Spark-first shape — both phases are pure JVM, no Python crossing:

- :func:`train_char_lm`: one explode + count aggregation (map-side
  partials absorb hot n-grams exactly like
  :func:`~lyssandra_spark.functions.textstats.token_frequencies`), top-K
  vocabulary via TakeOrderedAndProject, log-probs computed as columns.
  The model IS a small DataFrame (ngram, logp) — at K=50k it broadcasts
  everywhere a join needs it.
- :func:`score_char_lm`: explode each doc's n-grams, BROADCAST-join the
  model, average log-prob per doc (unseen n-grams get the smoothed OOV
  log-prob). One shuffle, keyed on the doc id, carrying (id, logp) only.

Scores are average log-probabilities (higher = more natural text);
``exp(-score)`` is per-char perplexity if a perplexity axis is wanted.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["char_ngrams", "normalize_for_lm", "train_char_lm", "score_char_lm"]


def normalize_for_lm(text_col: str = "text") -> Column:
    """Lowercase + collapse whitespace runs — the text the LM sees."""
    return F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")


def char_ngrams(norm_col: str, n: int = 3) -> Column:
    """Column expr: all overlapping character ``n``-grams of an ALREADY
    normalized text column (see :func:`normalize_for_lm`). Documents
    shorter than ``n`` chars yield an empty array.

    ``norm_col`` must be a plain column REFERENCE, not an expression:
    Spark does not common-subexpression-eliminate inside higher-order
    lambdas, so embedding the normalization here would re-run it once
    per character position — measured O(len^2): a 20 KB document took
    21 s. Callers project the normalization once (one extra column in
    the scan) and pass its name; the transform is then O(len * n).
    """
    if n < 1:
        raise ValueError(f"n ({n}) must be >= 1")
    return F.expr(
        f"CASE WHEN length({norm_col}) < {n} THEN array() "
        f"ELSE transform(sequence(1, length({norm_col}) - {n} + 1), "
        f"i -> substring({norm_col}, i, {n})) END"
    )


def train_char_lm(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    top_k: int = 50_000,
    alpha: float = 0.5,
) -> tuple[DataFrame, float]:
    """Train the corpus character-``n``-gram multinomial.

    Returns ``(model, oov_logp)``: ``model`` is (ngram, logp) for the
    ``top_k`` most frequent n-grams with add-``alpha`` smoothing over an
    open vocabulary, ``oov_logp`` the shared log-prob of any unseen
    n-gram (``log(alpha / (total + alpha * (V + 1)))`` where
    ``V = min(top_k, n_distinct)`` — the vocabulary the model actually
    holds plus one pooled OOV bucket, so a corpus with fewer than
    ``top_k`` distinct n-grams is not over-smoothed into probability
    mass well below 1).
    The corpus is aggregated EXACTLY once: the n-gram counts are
    persisted for the two bounded reads (grand total + top-K), both are
    collected to the driver (at most ``top_k`` rows + one scalar), the
    cache is released, and the returned model is a small LOCAL DataFrame
    — scoring never re-touches the training corpus.
    """
    if alpha <= 0:
        raise ValueError(f"alpha ({alpha}) must be > 0")
    grams = df.select(
        normalize_for_lm(text_col).alias("__norm")
    ).select(F.explode(char_ngrams("__norm", n)).alias("ngram"))
    counts = grams.groupBy("ngram").agg(F.count("*").alias("cnt")).persist()
    try:
        total = counts.agg(F.sum("cnt")).collect()[0][0] or 0
        top = (
            counts.orderBy(F.col("cnt").desc(), F.col("ngram"))
            .limit(top_k).collect()
        )
    finally:
        counts.unpersist()
    # vocabulary size = what the model holds (len(top) == min(top_k,
    # n_distinct)) + 1 pooled OOV bucket; using top_k unconditionally
    # would over-smooth any corpus with fewer distinct n-grams than
    # top_k (probabilities summing far below 1)
    denom = float(total) + alpha * (len(top) + 1)
    model = df.sparkSession.createDataFrame(
        [(r["ngram"], math.log((r["cnt"] + alpha) / denom)) for r in top],
        "ngram string, logp double",
    )
    oov_logp = math.log(alpha / denom)
    return model, oov_logp


def score_char_lm(
    df: DataFrame,
    model: DataFrame,
    oov_logp: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Score documents under a trained model: (id, n_ngrams, lm_score)
    where lm_score is the mean n-gram log-prob (higher = more natural).
    Documents with no n-grams (shorter than ``n``) get no row. ``n``
    must match the model's training n (the join simply finds nothing
    otherwise and every gram scores as OOV).

    Plan: explode -> broadcast-hash-join(model) -> groupBy(id) — one
    shuffle carrying (id, logp)."""
    g = df.select(
        id_col, normalize_for_lm(text_col).alias("__norm")
    ).select(id_col, F.explode(char_ngrams("__norm", n)).alias("ngram"))
    return (
        g.join(F.broadcast(model), "ngram", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_ngrams"),
            F.round(
                F.avg(F.coalesce(F.col("logp"), F.lit(oov_logp))), 6
            ).alias("lm_score"),
        )
    )
