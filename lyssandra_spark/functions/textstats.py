"""Text-quality statistics for training-data curation (SURVEY.md §2 LLM ops).

Pipeline staples beyond the basic length/punct/stopword scores:

- :func:`repetition_features` — Gopher/MassiveText-style repetition
  filters (duplicate-word ratio, most-frequent-token fraction,
  duplicate-2-gram ratio; Rae et al. 2021, "Scaling Language Models:
  Methods, Analysis & Insights from Training Gopher", Table A1's
  repetition thresholds). Deliberately MAP-ONLY: every feature is a higher-order array
  expression over the tokenized text, so the plan is a projection over
  the parquet scan — zero shuffles, embarrassingly parallel at 10^12
  docs. Every per-document expression is O(n log n) in the document's
  token count (``array_distinct``/``array_sort`` plus linear scans), so
  a book-length doc in a web corpus is a proportionally slower row, not
  a straggler — in particular the most-frequent-token count is a
  run-length scan over ``array_sort``, NOT the naive O(distinct x
  n_tokens) nested filter (which at 10^6 tokens / 10^5 distinct would
  be ~10^11 comparisons inside one row on one core).
- :func:`ngram_contamination` — benchmark decontamination: for each
  document, the fraction of its distinct word n-grams that appear in a
  benchmark/eval set (the n-gram-overlap scan of Brown et al. 2020,
  "Language Models are Few-Shot Learners", Appendix C, which uses
  13-grams; n is a parameter here). The benchmark gram set is DISTINCT + broadcast
  (eval suites are tiny next to a training corpus); the corpus side is
  one explode + broadcast-hash-join + groupBy(doc) — the corpus shuffles
  once, on doc_id, with the gram column already dropped.
- :func:`token_frequencies` — corpus vocabulary statistics; one shuffle
  with map-side partial counts absorbing natural-language token skew.

All expressions are pure JVM (no Python crossing anywhere).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "word_tokens",
    "bpe_like_tokens",
    "repetition_exprs",
    "repetition_features",
    "ngram_contamination",
    "token_frequencies",
    "token_count_features",
]


def word_tokens(text_col: str = "text") -> Column:
    """Lowercased alnum word tokens (the tokenizer every text op shares)."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda x: x != ""
    )


def repetition_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition scores (the Gopher/MassiveText-style
    filters a curation pipeline thresholds on):

    - ``dup_word_ratio``: 1 - distinct/total tokens — high for pages that
      loop a small vocabulary;
    - ``max_tok_frac``: occurrences of the single most frequent token over
      total tokens — catches keyword-stuffed spam;
    - ``dup_2gram_ratio``: 1 - distinct/total word 2-grams — catches
      copy-pasted phrase loops that unigram stats miss.

    Map-only and O(n log n) per document (see module docstring); empty
    documents emit 0 for every ratio.
    """
    toks = word_tokens(text_col)
    out = df.select(id_col, toks.alias("__toks"))
    e = repetition_exprs()
    return out.select(
        id_col, *[c.alias(name) for name, c in e.items()]
    )


def repetition_exprs() -> dict[str, Column]:
    """The repetition scores as raw Column exprs over a PRE-PROJECTED
    ``__toks`` array column (same contract as :func:`char_ngrams` /
    ``shingle_set``: project the tokens once, then reference them) —
    exposed so composite featurizers (the quality classifier) can build
    these alongside other per-doc stats in ONE map-only projection
    instead of paying an id-join against :func:`repetition_features`.
    Keys double as the canonical output column names.
    """
    n = F.size("__toks")
    safe_n = F.greatest(n, F.lit(1))
    # most-frequent-token count as a run-length scan over the SORTED
    # tokens: equal tokens are adjacent after array_sort, so one linear
    # aggregate carrying (prev, current-run, best-run) finds the max
    # count in O(n) after the O(n log n) sort — never the O(distinct x n)
    # nested filter (a 10^6-token book would be a single-core straggler)
    max_cnt = F.expr(
        "aggregate(array_sort(__toks), "
        "named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best', 0), "
        "(acc, x) -> named_struct("
        "  'prev', x, "
        "  'run', IF(x <=> acc.prev, acc.run + 1, 1), "
        "  'best', GREATEST(acc.best, IF(x <=> acc.prev, acc.run + 1, 1))), "
        "acc -> acc.best)"
    )
    g2 = F.expr(
        "CASE WHEN size(__toks) < 2 THEN array() "
        "ELSE transform(sequence(0, size(__toks) - 2), "
        "i -> concat_ws(' ', __toks[i], __toks[i+1])) END"
    )
    return {
        "n_tokens": n.cast("long"),
        "dup_word_ratio": F.round(
            (n - F.size(F.array_distinct("__toks"))) / safe_n, 4
        ),
        "max_tok_frac": F.round(
            F.coalesce(max_cnt, F.lit(0)) / safe_n, 4
        ),
        "dup_2gram_ratio": F.round(
            (F.size(g2) - F.size(F.array_distinct(g2)))
            / F.greatest(F.size(g2), F.lit(1)),
            4,
        ),
    }


def ngram_contamination(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination scan: per document, how many of its
    distinct word ``n``-grams appear in the benchmark set.

    Returns (id, n_grams, n_contaminated, contamination_rate) for every
    document with at least one n-gram. ``bench`` is any DataFrame with
    ``text_col``; its distinct gram set is broadcast (an eval suite is
    MBs against a 100 TB corpus), so the corpus-side plan is
    scan -> explode -> broadcast-hash-join -> groupBy(id): exactly one
    shuffle, carrying only (id, hit) rows.
    """
    if n < 1:
        raise ValueError(f"n ({n}) must be >= 1")

    def grams() -> Column:
        # operates on the frame's `__toks` column (both sides below
        # project their tokens under that name before calling this)
        return F.array_distinct(
            F.expr(
                f"CASE WHEN size(__toks) < {n} THEN array() "
                f"ELSE transform(sequence(0, size(__toks) - {n}), "
                f"i -> concat_ws(' ', slice(__toks, i + 1, {n}))) END"
            )
        )

    d = docs.select(id_col, word_tokens(text_col).alias("__toks"))
    dg = d.select(id_col, F.explode(grams()).alias("gram"))
    bg = (
        bench.select(word_tokens(text_col).alias("__toks"))
        .select(F.explode(grams()).alias("gram"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        dg.join(F.broadcast(bg), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.coalesce(F.sum("__hit"), F.lit(0)).cast("long")
            .alias("n_contaminated"),
        )
        .withColumn(
            "contamination_rate",
            F.round(F.col("n_contaminated") / F.col("n_grams"), 4),
        )
    )


def token_frequencies(
    df: DataFrame,
    text_col: str = "text",
    k: int | None = None,
    min_count: int = 1,
) -> DataFrame:
    """Corpus-wide token frequencies (the vocabulary builder's first
    pass): (token, count), most frequent first.

    Plan at 100 TB: tokenize map-only, explode, then ONE shuffle keyed on
    token — and the inevitable skew of natural language ("the" is a
    billion-row key) is absorbed by map-side partial aggregation: every
    task pre-counts its own tokens, so the hot token crosses the wire as
    at most one row PER TASK, not one row per occurrence. ``k`` caps the
    result via TakeOrderedAndProject (per-partition top-k, k rows to the
    driver-side merge — never a full sort of the vocabulary).
    """
    if min_count < 1:
        raise ValueError(f"min_count ({min_count}) must be >= 1")
    freqs = (
        df.select(F.explode(word_tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("count"))
        .where(F.col("count") >= min_count)
    )
    ordered = freqs.orderBy(F.col("count").desc(), F.col("token"))
    return ordered.limit(k) if k is not None else ordered


def bpe_like_tokens(text_col: str = "text") -> Column:
    """GPT-2-style pre-tokenizer segments (the "BPE-ish regex" count):
    common contractions, optionally-space-prefixed letter runs, digit
    runs, punctuation runs, residual whitespace. This is the SEGMENTATION
    stage of a byte-pair tokenizer — counts track real BPE token counts
    far better than whitespace words (punctuation and numbers split off)
    while staying a pure JVM ``regexp_extract_all`` (no vocab, no Python).
    Unicode-aware via Java's \\p{L}/\\p{N} classes.

    This is the zero-vocab FALLBACK; for counts under an actually
    trained tokenizer, :mod:`lyssandra_spark.functions.bpe` learns
    merge ranks from the corpus and applies them in a vectorized
    Arrow pass (``train_bpe`` / ``bpe_token_counts``).
    """
    # (?U) = UNICODE_CHARACTER_CLASS: without it Java's \s is ASCII-only
    # and an NBSP (ubiquitous in web HTML) would surface as a punctuation
    # token instead of separating two. Caveat stated honestly: Java's
    # \p{L}/\p{N} and Python's \w classes disagree on No/Nl characters
    # (superscripts '²', fractions '½', Roman numerals) — 'x²' is two
    # segments here and one under a Python [^\W\d_]+ oracle; that is a
    # segmentation convention, and the pytest oracle pins parity on
    # Nd-digit/letter/punct/whitespace inputs including NBSP and CJK.
    pat = (
        r"(?U)'s|'t|'re|'ve|'m|'ll|'d"
        r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
    )
    toks = F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))
    # drop pure-whitespace segments: they separate tokens, they aren't one
    return F.filter(toks, lambda t: t.rlike(r"(?U)\S"))


def token_count_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Both token-counting conventions side by side (SURVEY LLM ops:
    "whitespace + a BPE-ish regex"): (id, n_ws_tokens, n_bpe_tokens,
    bpe_per_ws). Map-only projection. ``bpe_per_ws`` (fertility proxy)
    rises with punctuation/number density — a useful quality signal on
    its own."""
    # filter-out-empties instead of trim+split: Spark's trim only strips
    # ASCII spaces, so leading/trailing unicode whitespace would leave
    # phantom '' segments and overcount vs Python's str.split()
    ws = F.size(
        F.filter(F.split(F.col(text_col), r"(?U)\s+"), lambda x: x != "")
    )
    bpe = F.size(bpe_like_tokens(text_col))
    return df.select(
        id_col,
        ws.cast("long").alias("n_ws_tokens"),
        bpe.cast("long").alias("n_bpe_tokens"),
        F.round(bpe / F.greatest(ws, F.lit(1)), 4).alias("bpe_per_ws"),
    )
