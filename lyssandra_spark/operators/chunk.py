"""Document chunking and token-budget sequence packing (LLM training-data
preparation ops beyond the reference surface; SURVEY.md §2 LLM table).

- :func:`chunk_documents` — split each document's token stream into
  fixed-size overlapping windows (the context-window chunker every
  pretraining / RAG ingestion pipeline runs). MAP-ONLY: tokenize +
  window-slice are higher-order array expressions over one scan, so the
  plan is a projection with zero shuffles — embarrassingly parallel at
  10^12 documents. Exactly SQL-expressible; pytest checks parity against
  a DuckDB oracle (the driver registry is at its 50-row cap).

- :func:`pack_sequences` — bin-pack documents into training sequences
  under a token budget (sequence packing: filling each training example
  to ~budget tokens instead of padding; Krell et al. 2021, "Efficient
  Sequence Packing without Cross-contamination", which also uses
  shortest-pack-first/best-fit histogram packing — the same family as
  the best-fit-decreasing used here). Packing is inherently
  sequential, so the distributed shape is SHARDED independence: each doc
  is hash-routed to one of ``n_shards`` independent shards (pure JVM
  expression, one shuffle on the shard key), and best-fit-decreasing
  runs per shard inside ``applyInPandas``. Shards never coordinate, so
  the job is one keyed shuffle + embarrassingly parallel pandas groups;
  at 100 TB you pick ``n_shards`` so a shard's (id, n_tokens) pairs fit
  an executor (the text itself never enters this operator — join the
  assignment back by id). Deterministic: shard routing is xxhash64 and
  the in-shard order is (n_tokens desc, id), independent of input
  partitioning.
"""

from __future__ import annotations

import bisect

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lyssandra_spark.functions.textstats import word_tokens

__all__ = ["chunk_documents", "pack_sequences"]


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Fixed-size overlapping token windows per document.

    Chunk ``i`` covers tokens ``[i*stride, i*stride + chunk_tokens)`` with
    ``stride = chunk_tokens - overlap``; the last chunk may be shorter but
    always reaches the final token (``n_chunks = 1 + ceil((n - chunk_tokens)
    / stride)`` for ``n > chunk_tokens``, else 1). Documents with zero
    tokens produce no rows. Output: (id, chunk_idx, start_tok,
    n_chunk_tokens, chunk_text) where ``start_tok`` is the chunk's first
    token's 0-based position in the document's token stream (the offset a
    retrieval index needs to map a hit back into the source) and
    chunk_text re-joins tokens with single spaces (tokenizer-normalized
    text, same convention as every textstats op).
    """
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens ({chunk_tokens}) must be >= 1")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be in [0, chunk_tokens ({chunk_tokens}))"
        )
    stride = chunk_tokens - overlap
    t = df.select(id_col, word_tokens(text_col).alias("__toks"))
    n = F.size("__toks")
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.lit(1) + F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice("__toks", i * stride + 1, chunk_tokens),
    )
    return (
        t.where(n > 0)
        .select(id_col, F.posexplode(chunks).alias("chunk_idx", "__chunk"))
        .select(
            id_col,
            "chunk_idx",
            (F.col("chunk_idx").cast("long") * stride).alias("start_tok"),
            F.size("__chunk").cast("long").alias("n_chunk_tokens"),
            F.concat_ws(" ", "__chunk").alias("chunk_text"),
        )
    )


_PACK_SCHEMA_SUFFIX = [
    T.StructField("shard", T.IntegerType(), False),
    T.StructField("bin_idx", T.LongType(), False),
    T.StructField("bin_id", T.StringType(), False),
    T.StructField("oversize", T.BooleanType(), False),
]


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    ntok_col: str = "n_tokens",
    budget: int = 2048,
    n_shards: int = 64,
) -> DataFrame:
    """Best-fit-decreasing sequence packing under a token budget.

    Returns one row per input doc: (id, n_tokens, shard, bin_idx, bin_id,
    oversize). All docs sharing a ``bin_id`` form one training sequence;
    their token counts sum to <= ``budget`` unless the doc alone exceeds
    the budget, in which case it gets a dedicated bin with
    ``oversize=true`` (caller chooses truncate/split policy — this
    operator never silently drops tokens). BFD sorts each shard by
    (n_tokens desc, id) and places each doc in the fullest bin that still
    fits (ties broken by lowest bin index), so the assignment is a pure
    function of the shard's contents: stable across input partitioning,
    repartitioning, and executor counts. Best-fit-decreasing carries the
    same (11/9)·OPT + 1 bin guarantee as first-fit-decreasing but needs only
    O(log n_bins) comparisons per doc via a bisect-indexed capacity list —
    no O(n_docs x n_bins) scan, so even a single giant shard degrades
    gracefully.

    ``ntok_col`` should be a REAL tokenizer count when the downstream
    budget is a real context window:
    :func:`lyssandra_spark.functions.bpe.bpe_token_counts` (trained
    merges) produces exactly that; the pure-JVM ``bpe_like_tokens``
    segmentation count is the cheap proxy.
    """
    if budget < 1:
        raise ValueError(f"budget ({budget}) must be >= 1")
    if n_shards < 1:
        raise ValueError(f"n_shards ({n_shards}) must be >= 1")

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("n_tokens", T.LongType(), False),
        ]
        + _PACK_SCHEMA_SUFFIX
    )

    def pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf["__nt"].isna().any():
            bad = pdf.loc[pdf["__nt"].isna(), id_col].iloc[0]
            raise ValueError(
                f"pack_sequences: null {ntok_col} (e.g. {id_col}={bad!r}) — "
                "filter or impute token counts before packing"
            )
        if (pdf["__nt"] < 0).any():
            bad = pdf.loc[pdf["__nt"] < 0, id_col].iloc[0]
            raise ValueError(
                f"pack_sequences: negative {ntok_col} (e.g. {id_col}={bad!r})"
            )
        pdf = pdf.sort_values(
            ["__nt", id_col], ascending=[False, True], kind="mergesort"
        )
        shard = int(pdf["__shard"].iloc[0])
        # Best fit via a sorted (remaining_capacity, bin_idx) list:
        # bisect finds the tightest bin that fits in O(log n_bins)
        # comparisons per doc (inserts are C-level memmoves), so a single
        # giant shard degrades gracefully instead of O(n_docs * n_bins).
        # The operator only ever sees (id, n_tokens), never text, so
        # shard size is a row-count concern, not a bytes concern.
        caps: list[tuple[int, int]] = []  # sorted (remaining, bin_idx)
        n_bins = 0
        assign: list[int] = []
        oversize: list[bool] = []
        for nt in pdf["__nt"].to_numpy():
            nt = int(nt)
            if nt > budget:
                assign.append(n_bins)  # dedicated bin, never reopened
                oversize.append(True)
                n_bins += 1
                continue
            i = bisect.bisect_left(caps, (nt, -1))
            if i < len(caps):  # tightest fit; capacity ties -> lowest idx
                cap, b = caps.pop(i)
            else:
                cap, b = budget, n_bins
                n_bins += 1
            if cap - nt > 0:
                bisect.insort(caps, (cap - nt, b))
            assign.append(b)
            oversize.append(False)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].to_numpy(),
                "n_tokens": pdf["__nt"].to_numpy(),
                "shard": shard,
                "bin_idx": assign,
                "bin_id": [f"{shard}:{b}" for b in assign],
                "oversize": oversize,
            }
        )

    routed = df.select(
        id_col,
        F.col(ntok_col).cast("long").alias("__nt"),
        F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n_shards))
        .cast("int")
        .alias("__shard"),
    )
    return routed.groupBy("__shard").applyInPandas(pack_shard, out_schema)
