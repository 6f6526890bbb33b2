"""Repetition quality filters + benchmark decontamination (textstats)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lyssandra_spark.functions.textstats import (
    ngram_contamination,
    repetition_features,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )


def test_repetition_features_known_values(spark):
    texts = [
        "spam spam spam spam",            # one token repeated 4x
        "a b c d",                        # all distinct
        "x y x y x y",                    # 2-gram loop
        "",                               # empty: all ratios 0
        "word",                           # single token: no 2-grams
    ]
    out = (
        repetition_features(_docs(spark, texts))
        .toPandas().set_index("doc_id").sort_index()
    )
    assert out.loc[0, "n_tokens"] == 4
    assert out.loc[0, "dup_word_ratio"] == 0.75   # 1 - 1/4
    assert out.loc[0, "max_tok_frac"] == 1.0
    assert out.loc[0, "dup_2gram_ratio"] == 0.6667  # round(1 - 1/3, 4)

    assert out.loc[1, "dup_word_ratio"] == 0.0
    assert out.loc[1, "max_tok_frac"] == 0.25
    assert out.loc[1, "dup_2gram_ratio"] == 0.0

    # x y x y x y: 6 tokens 2 distinct; 5 bigrams, 2 distinct (xy, yx)
    assert out.loc[2, "dup_word_ratio"] == 0.6667  # round(1 - 2/6, 4)
    assert out.loc[2, "max_tok_frac"] == 0.5
    assert out.loc[2, "dup_2gram_ratio"] == 0.6  # 1 - 2/5

    assert (out.loc[3, ["dup_word_ratio", "max_tok_frac", "dup_2gram_ratio"]]
            == 0.0).all()
    assert out.loc[4, "max_tok_frac"] == 1.0
    assert out.loc[4, "dup_2gram_ratio"] == 0.0


def test_repetition_features_map_only_plan(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        repetition_features(d)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # per-doc filters must not shuffle


def test_repetition_features_long_doc_linear(spark):
    """A book-length doc (100k tokens, ~100k distinct) must profile in
    seconds: the most-frequent-token count is a run-length scan over
    array_sort, not the O(distinct x n_tokens) nested filter (which at
    this shape is ~10^10 comparisons on one core — minutes, a straggler).
    """
    import time

    n_uniq, n_dup = 100_000, 7
    text = " ".join(f"w{i}" for i in range(n_uniq)) + " dup" * n_dup
    docs = _docs(spark, [text])
    t0 = time.monotonic()
    out = repetition_features(docs).toPandas().set_index("doc_id")
    wall = time.monotonic() - t0
    n = n_uniq + n_dup
    assert out.loc[0, "n_tokens"] == n
    assert out.loc[0, "max_tok_frac"] == round(n_dup / n, 4)
    assert out.loc[0, "dup_word_ratio"] == round((n_dup - 1) / n, 4)
    # generous for co-tenant noise; the quadratic formulation takes minutes
    assert wall < 60, f"long-doc repetition profile took {wall:.1f}s"
    plan = (
        repetition_features(docs)._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "Exchange" not in plan  # still map-only


def test_ngram_contamination_planted(spark):
    bench_text = "one two three four five six seven eight nine ten"
    texts = [
        bench_text,                                    # the benchmark doc
        "one two three four five six seven eight tail words here now",
        "zz yy xx ww vv uu tt ss rr qq pp oo",          # disjoint vocab
        "short doc",                                    # < n tokens: no row
    ]
    docs = _docs(spark, texts)
    out = ngram_contamination(
        docs, docs.where(F.col("doc_id") == 0), n=8
    ).toPandas().set_index("doc_id").sort_index()

    assert 3 not in out.index                   # too short for any 8-gram
    assert out.loc[0, "contamination_rate"] == 1.0
    # doc 1 shares exactly the 8-gram 'one..eight' (its first gram)
    assert out.loc[1, "n_contaminated"] == 1
    assert out.loc[1, "n_grams"] == 5
    assert out.loc[1, "contamination_rate"] == 0.2
    assert out.loc[2, "n_contaminated"] == 0
    assert out.loc[2, "contamination_rate"] == 0.0


def test_ngram_contamination_broadcasts_bench(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = ngram_contamination(d, d.where(F.col("doc_id") % 20 == 0), n=8)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    with pytest.raises(ValueError, match="n \\(0\\)"):
        ngram_contamination(d, d, n=0)


def test_token_frequencies_duckdb_parity_and_plan(spark, sf_dir):
    import duckdb

    from lyssandra_spark.functions.textstats import token_frequencies

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = token_frequencies(d, k=50, min_count=2).toPandas()
    want = duckdb.connect().execute(f"""
        WITH t AS (
          SELECT unnest(list_filter(
                   string_split_regex(lower(text), '[^a-z0-9]+'),
                   x -> x <> '')) AS token
          FROM read_parquet('{sf_dir}/documents.parquet'))
        SELECT token, count(*) AS count FROM t
        GROUP BY token HAVING count(*) >= 2
        ORDER BY count DESC, token LIMIT 50
    """).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # plan: partial count before the exchange (hot tokens cross the wire
    # once per task), and top-k never sorts the full vocabulary
    plan = (
        token_frequencies(d, k=50)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_count" in plan or "partial count" in plan.lower()
    assert "TakeOrderedAndProject" in plan

    with pytest.raises(ValueError, match="min_count"):
        token_frequencies(d, min_count=0)


def test_bpe_like_token_counts_match_python_re(spark, sf_dir):
    import re

    from lyssandra_spark.functions.textstats import token_count_features

    texts = [
        "I can't wait — it's 2024, version 3.5 costs $12.99!",
        "hello world",
        "",
        "  spaced   out  ",
        "snake_case __dunder__ a_b",  # '_' is punctuation on BOTH sides
        "unicode café naïve 北京 123",
        "web nbsp thin spaces",  # unicode whitespace separates
    ]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got = (
        token_count_features(docs)
        .toPandas().set_index("doc_id").sort_index()
    )
    # python oracle: the same GPT-2-style pre-tokenizer pattern. Punct
    # class is (?:[^\s\w]|_)+ — python \w includes '_' where Java
    # \p{L}/\p{N} don't, so the naive [^\s\w]+ would silently DROP
    # underscores while the JVM side segments them via [^\s\p{L}\p{N}]+
    pat = re.compile(
        r"'s|'t|'re|'ve|'m|'ll|'d"
        r"| ?[^\W\d_]+| ?\d+| ?(?:[^\s\w]|_)+|\s+",
        re.UNICODE,
    )
    for i, t in enumerate(texts):
        segs = [s for s in pat.findall(t) if s.strip()]
        assert got.loc[i, "n_bpe_tokens"] == len(segs), (t, segs)
        ws = len(t.split())
        assert got.loc[i, "n_ws_tokens"] == ws
    # punctuation-dense text has higher fertility than plain words
    assert got.loc[0, "bpe_per_ws"] > got.loc[1, "bpe_per_ws"]

    # map-only plan over the real table
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        token_count_features(d)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
