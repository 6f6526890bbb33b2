"""GPT-3-style document quality classifier (Brown et al. 2020,
"Language Models are Few-Shot Learners", Appendix A: a linear classifier
trained to separate a curated positive corpus from raw web text, whose
score then gates — or Pareto-samples — the training set).

Spark-first shape:

- :func:`featurize_documents` — a fixed 10-dim per-document feature
  vector, ALL pure-JVM map-only expressions (length/token stats, the
  Gopher repetition ratios via
  :func:`~lyssandra_spark.functions.textstats.repetition_exprs`,
  char-class fractions). One projection over the scan, zero shuffles,
  zero Python.
- :func:`train_quality_classifier` — closed-form ridge on the union of
  (positive, +1) and (negative, -1) featurized docs, via
  :func:`~lyssandra_spark.operators.pooling.ridge_probe`'s
  sample-additive sufficient statistics: one map-only pass, an 11x11
  driver solve — nothing driver-side grows with corpus size.
- :func:`quality_scores` — score any corpus with the trained weights:
  the dot product is a JVM ``zip_with``/``aggregate`` fold over a
  literal weight array, so scoring 100 TB is again map-only (and the
  output column feeds
  :func:`~lyssandra_spark.operators.split.quantile_filter` /
  :func:`~lyssandra_spark.operators.split.stratified_sample` directly —
  the CCNet/GPT-3 keep-or-sample step).

This is deliberately the linear-probe flavor (deterministic,
dependency-free); swapping in better features (e.g. the char-n-gram LM
score) is adding a column to the feature array.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lyssandra_spark.functions.textstats import repetition_exprs, word_tokens
from lyssandra_spark.operators.pooling import linear_score, ridge_probe

__all__ = [
    "FEATURE_NAMES",
    "featurize_documents",
    "train_quality_classifier",
    "quality_scores",
]

FEATURE_NAMES = [
    "log1p_n_chars",
    "log1p_n_tokens",
    "mean_token_len",
    "dup_word_ratio",
    "max_tok_frac",
    "dup_2gram_ratio",
    "punct_frac",
    "digit_frac",
    "upper_frac",
    "ws_frac",
]


def featurize_documents(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, features: array<double> of len(FEATURE_NAMES)) — one map-only
    projection (see module docstring). Null text featurizes as empty
    text (all-zero-ish features), so scoring never drops rows."""
    base = df.select(
        id_col,
        F.coalesce(F.col(text_col), F.lit("")).alias("__text"),
        F.coalesce(
            word_tokens(text_col), F.array().cast("array<string>")
        ).alias("__toks"),
    )
    t = F.col("__text")
    n_chars = F.length(t)
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")

    def char_frac(pattern: str):
        # chars REMOVED by deleting the class = chars IN the class
        return (
            n_chars - F.length(F.regexp_replace(t, pattern, ""))
        ) / safe_chars

    e = repetition_exprs()
    n_tok = e["n_tokens"]
    safe_tok = F.greatest(n_tok, F.lit(1)).cast("double")
    # total alnum chars / tokens (tokens are alnum runs of the lowercased
    # text, so this is the exact mean token length)
    tok_chars = F.aggregate(
        "__toks", F.lit(0), lambda acc, x: acc + F.length(x)
    )
    n_letters = n_chars - F.length(F.regexp_replace(t, r"(?U)\p{L}", ""))
    n_upper = n_chars - F.length(F.regexp_replace(t, r"(?U)\p{Lu}", ""))
    feats = F.array(
        F.log1p(n_chars),
        F.log1p(n_tok),
        tok_chars / safe_tok,
        e["dup_word_ratio"],
        e["max_tok_frac"],
        e["dup_2gram_ratio"],
        char_frac(r"(?U)[^\p{L}\p{N}\s]"),
        char_frac(r"(?U)\p{N}"),
        n_upper / F.greatest(n_letters, F.lit(1)).cast("double"),
        char_frac(r"(?U)\s"),
    ).cast("array<double>")
    return base.select(id_col, feats.alias("features"))


def train_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 1e-3,
) -> tuple[np.ndarray, float]:
    """Ridge weights separating curated ``positive`` docs (+1) from raw
    ``negative`` docs (-1); returns ``(w, train_accuracy)`` with
    ``len(w) == len(FEATURE_NAMES) + 1`` (bias last). One map-only
    featurize + sufficient-statistics pass per corpus."""
    pos = featurize_documents(positive, id_col, text_col).withColumn(
        "label", F.lit(1.0)
    )
    neg = featurize_documents(negative, id_col, text_col).withColumn(
        "label", F.lit(-1.0)
    )
    return ridge_probe(
        pos.unionByName(neg),
        dim=len(FEATURE_NAMES),
        feature_col="features",
        lam=lam,
    )


def quality_scores(
    df: DataFrame,
    w: np.ndarray,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "quality_score",
) -> DataFrame:
    """(id, ``out_col``): the classifier margin w.x + b per document —
    higher = more like the curated corpus. Map-only (weights are a
    literal array in the plan); feed the score to ``quantile_filter``
    (hard gate) or — squashed to a probability — to
    ``probabilistic_keep`` (the GPT-3 soft-sampling move: keep
    stochastically in proportion to the score, no cliff)."""
    w = np.asarray(w, dtype=float)
    if len(w) != len(FEATURE_NAMES) + 1:
        raise ValueError(
            f"w has {len(w)} entries; expected {len(FEATURE_NAMES) + 1} "
            "(features + bias — train_quality_classifier's output)"
        )
    feats = featurize_documents(df, id_col, text_col)
    score = linear_score("features", w)
    return feats.select(id_col, F.round(score, 6).alias(out_col))
