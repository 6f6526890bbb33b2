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

__all__ = ["char_ngrams", "train_char_lm", "score_char_lm"]


def char_ngrams(text_col: str = "text", n: int = 3) -> Column:
    """Column expr: all overlapping character ``n``-grams of the
    lowercased text (whitespace runs collapsed so formatting doesn't
    shift the distribution). Documents shorter than ``n`` chars yield an
    empty array."""
    if n < 1:
        raise ValueError(f"n ({n}) must be >= 1")
    norm = f"regexp_replace(lower({text_col}), '\\\\s+', ' ')"
    return F.expr(
        f"CASE WHEN length({norm}) < {n} THEN array() "
        f"ELSE transform(sequence(1, length({norm}) - {n} + 1), "
        f"i -> substring({norm}, i, {n})) END"
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
    n-gram (``log(alpha / (total + alpha * (top_k + 1)))``).
    The count aggregation is the one shuffle; everything after operates
    on at most ``top_k`` rows (and one scalar total to the driver).
    """
    if alpha <= 0:
        raise ValueError(f"alpha ({alpha}) must be > 0")
    grams = df.select(F.explode(char_ngrams(text_col, n)).alias("ngram"))
    counts = grams.groupBy("ngram").agg(F.count("*").alias("cnt"))
    top = counts.orderBy(F.col("cnt").desc(), F.col("ngram")).limit(top_k)
    total = counts.agg(F.sum("cnt")).collect()[0][0] or 0
    denom = float(total) + alpha * (top_k + 1)
    model = top.select(
        "ngram",
        F.log((F.col("cnt") + F.lit(alpha)) / F.lit(denom)).alias("logp"),
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
    g = df.select(id_col, F.explode(char_ngrams(text_col, n)).alias("ngram"))
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
