"""Chunking + sequence packing: known values, DuckDB oracle parity,
map-only plan, exactly-once / budget / determinism invariants, and
hypothesis coverage/reconstruction properties."""

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lyssandra_spark.operators.chunk import chunk_documents, pack_sequences


def _docs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )


def test_chunk_known_values(spark):
    toks10 = " ".join(f"t{i}" for i in range(10))
    out = (
        chunk_documents(_docs(spark, [toks10, "a b c d", ""]),
                        chunk_tokens=4, overlap=1)
        .toPandas().sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    )
    d0 = out[out.doc_id == 0]
    # stride 3: starts 0,3,6 -> windows [0:4) [3:7) [6:10)
    assert list(d0.chunk_text) == [
        "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9"]
    assert list(d0.n_chunk_tokens) == [4, 4, 4]
    # consecutive chunks share exactly `overlap` tokens
    for a, b in zip(list(d0.chunk_text), list(d0.chunk_text)[1:]):
        assert a.split()[-1:] == b.split()[:1]
    # n == chunk_tokens -> single chunk; empty doc -> no rows
    assert list(out[out.doc_id == 1].chunk_text) == ["a b c d"]
    assert (out.doc_id == 2).sum() == 0


def test_chunk_tail_shorter_but_complete(spark):
    out = (
        chunk_documents(_docs(spark, ["a b c d e f g"]), chunk_tokens=4,
                        overlap=2)
        .toPandas().sort_values("chunk_idx")
    )
    # stride 2, n=7: starts 0,2,4 (ceil((7-4)/2)=2) -> last window [4:7) len 3
    assert list(out.chunk_text) == ["a b c d", "c d e f", "e f g"]
    assert list(out.start_tok) == [0, 2, 4]
    # every token position is covered through the final token
    assert out.chunk_text.iloc[-1].split()[-1] == "g"


def test_chunk_validation(spark):
    d = _docs(spark, ["x"])
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(d, chunk_tokens=0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(d, chunk_tokens=4, overlap=4)


def test_chunk_map_only_plan(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        chunk_documents(d, chunk_tokens=64, overlap=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # chunking must never shuffle


def test_chunk_duckdb_oracle_parity(spark, sf_dir):
    ct, ov = 32, 8
    stride = ct - ov
    got = (
        chunk_documents(
            spark.read.parquet(f"{sf_dir}/documents.parquet"),
            chunk_tokens=ct, overlap=ov,
        )
        .toPandas()
        .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    want = con.execute(f"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS toks
          FROM read_parquet('{sf_dir}/documents.parquet')),
        n AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
        c AS (SELECT doc_id, toks, n,
                CASE WHEN n <= {ct} THEN 1
                     ELSE 1 + CAST(ceil((n - {ct}) * 1.0 / {stride}) AS INTEGER)
                END AS n_chunks FROM n),
        e AS (SELECT doc_id, toks, unnest(range(n_chunks)) AS i FROM c)
        SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
               CAST(i * {stride} AS BIGINT) AS start_tok,
               CAST(len(toks[i*{stride}+1 : i*{stride}+{ct}]) AS BIGINT)
                 AS n_chunk_tokens,
               array_to_string(toks[i*{stride}+1 : i*{stride}+{ct}], ' ')
                 AS chunk_text
        FROM e ORDER BY doc_id, chunk_idx
    """).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@settings(max_examples=10, deadline=None)
@given(
    n_toks=st.integers(0, 60),
    chunk_tokens=st.integers(1, 12),
    overlap_frac=st.floats(0.0, 0.99),
)
def test_chunk_coverage_and_reconstruction_property(
    spark, n_toks, chunk_tokens, overlap_frac
):
    """For ANY (n, chunk_tokens, overlap): every token position is covered,
    chunk i starts at i*stride, consecutive chunks agree on their overlap,
    and dropping each chunk's first `overlap` tokens (except chunk 0)
    reconstructs the exact token stream."""
    overlap = int(overlap_frac * chunk_tokens)  # 0 <= overlap < chunk_tokens
    stride = chunk_tokens - overlap
    toks = [f"w{i}" for i in range(n_toks)]
    out = (
        chunk_documents(
            _docs(spark, [" ".join(toks)]),
            chunk_tokens=chunk_tokens, overlap=overlap,
        )
        .toPandas().sort_values("chunk_idx")
    )
    if n_toks == 0:
        assert len(out) == 0
        return
    covered = set()
    rebuilt = []
    for _, r in out.iterrows():
        got = r.chunk_text.split()
        s = int(r.start_tok)
        assert s == int(r.chunk_idx) * stride
        assert got == toks[s:s + chunk_tokens]
        covered.update(range(s, s + len(got)))
        rebuilt.extend(got if r.chunk_idx == 0 else got[overlap:])
    assert covered == set(range(n_toks))
    assert rebuilt == toks


@settings(max_examples=8, deadline=None)
@given(
    sizes=st.lists(st.integers(1, 40), min_size=1, max_size=60),
    budget=st.integers(1, 50),
)
def test_pack_invariants_property(spark, sizes, budget):
    """For ANY token-count multiset and budget: every doc packed exactly
    once, every non-oversize bin within budget, every oversize doc alone
    and truly over budget."""
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [f"d{i}" for i in range(len(sizes))],
                      "n_tokens": sizes})
    )
    out = pack_sequences(docs, budget=budget, n_shards=3).toPandas()
    assert len(out) == len(sizes) and out.doc_id.is_unique
    norm = out[~out.oversize]
    if len(norm):
        assert (norm.groupby("bin_id").n_tokens.sum() <= budget).all()
    over = out[out.oversize]
    assert (over.n_tokens > budget).all() and over.bin_id.is_unique
    assert set(out[out.n_tokens > budget].index) == set(over.index)


def _pack_input(spark, n=400, seed_mod=97):
    # deterministic skewed token counts in [1, 300]
    return spark.range(n).select(
        F.concat(F.lit("doc"), F.col("id")).alias("doc_id"),
        (F.pmod(F.col("id") * 131 + 7, F.lit(seed_mod)) * 3 + 1).alias("n_tokens"),
    )


def test_pack_budget_and_oversize(spark):
    budget = 256
    out = pack_sequences(_pack_input(spark), budget=budget, n_shards=8).toPandas()
    assert len(out) == 400 and out.doc_id.is_unique
    # every non-oversize bin's token sum respects the budget
    norm = out[~out.oversize]
    sums = norm.groupby("bin_id").n_tokens.sum()
    assert (sums <= budget).all()
    # oversize docs (n_tokens > budget) are alone in their bins, flagged
    over = out[out.oversize]
    assert (over.n_tokens > budget).all()
    assert (out[out.n_tokens > budget].oversize).all()
    assert over.bin_id.is_unique
    # packing is useful: mean fill of closed bins beats half-full
    if len(norm):
        n_bins = norm.bin_id.nunique()
        lower_bound = norm.n_tokens.sum() / budget
        assert n_bins <= 2 * lower_bound + 8 * 1  # BFD <= (11/9)OPT (+1/shard)


def test_pack_deterministic_across_partitioning(spark):
    docs = _pack_input(spark)
    a = pack_sequences(docs, budget=200, n_shards=4).toPandas()
    b = pack_sequences(docs.repartition(13), budget=200, n_shards=4).toPandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_pack_null_token_counts_fail_loudly(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["a", "b"], "n_tokens": [5.0, None]})
    )
    with pytest.raises(Exception, match="null n_tokens"):
        pack_sequences(docs, budget=10, n_shards=1).collect()
    neg = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["a"], "n_tokens": [-3]})
    )
    with pytest.raises(Exception, match="negative n_tokens"):
        pack_sequences(neg, budget=10, n_shards=1).collect()


def test_pack_validation_and_empty(spark):
    docs = _pack_input(spark, n=0)
    assert pack_sequences(docs, budget=10).count() == 0
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(docs, budget=0)
    with pytest.raises(ValueError, match="n_shards"):
        pack_sequences(docs, n_shards=0)
