"""Trainable byte-pair-encoding token counts (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units"; the
GPT-2 tokenizer of Radford et al. 2019 is the same algorithm over a
regex pre-tokenization).

:mod:`~lyssandra_spark.functions.textstats`'s ``bpe_like_tokens`` is the
zero-vocab, pure-JVM PROXY (pre-tokenizer segmentation only); this
module is the real thing — learned merges, so ``pack_sequences`` can
budget against counts that track an actual trained tokenizer.

Spark-first shape, in the only place Python is genuinely required:

- :func:`train_bpe` — the corpus is touched EXACTLY once, for word
  frequencies (explode + one count shuffle with map-side partials
  absorbing Zipf skew, then TakeOrderedAndProject for the top
  ``max_words`` — never a full vocabulary sort). Merge learning then
  runs DRIVER-SIDE over that bounded word-count table, which is how
  production BPE trainers work (HuggingFace tokenizers / SentencePiece
  train on word counts, not the raw corpus): O(max_words * n_merges),
  independent of corpus size. 100 TB costs the same one scan as 100 MB.
- :func:`bpe_token_counts` — apply is a broadcast of the merge ranks +
  one vectorized ``mapInArrow`` pass (Arrow-batched, never row-at-a-time
  UDF). Within each partition a per-WORD memo dict makes the greedy
  merge loop run once per *distinct* word, not per occurrence — under
  Zipf that is a >90% hit rate, so the hot path is a dict lookup.

Conventions (stated because counts are only comparable under them):
symbols are CHARACTERS by default, or UTF-8 BYTES with ``level="byte"``
(GPT-2 proper is byte-level: no unknown symbol can ever exist, and
multibyte characters merge back together only if the data earns it —
bytes are aliased to latin-1 characters internally, which is exactly
GPT-2's bytes-to-unicode trick restricted to what counting needs).
``level`` is part of the tokenizer's identity: train and apply must use
the same one. Pre-tokenization is the GPT-2-style regex (Python ``re``
flavor on both the train and apply paths, so they always agree; the JVM
``bpe_like_tokens`` proxy documents its own Java-regex divergences),
merges never cross pre-token boundaries, and ties in pair frequency
break lexicographically so training is deterministic.
"""

from __future__ import annotations

import re
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["PRETOKEN_RE", "pretokenize", "train_bpe", "bpe_token_counts"]

# per-partition apply-memo bound: past this many distinct words the memo
# stops admitting entries (Zipf means the hot words are already in, so
# the hit rate is preserved; the worst case — adversarial high-entropy
# text like base64 blobs or random ids — degrades to uncached encoding
# instead of unbounded Python-worker memory growth)
_MEMO_CAP = 1_000_000

# Python-re flavor of the GPT-2-style pre-tokenizer (see
# textstats.bpe_like_tokens for the JVM flavor and the documented
# Java-vs-Python unicode class divergences). Whitespace segments are
# dropped: they separate tokens, they aren't one.
# The punctuation alternative is `(?:[^\w\s]|_)+`, NOT `[^\s\w]+`:
# Python's \w includes '_' (Java's \p{L}/\p{N} do not), so without the
# explicit `|_` underscores would match NO alternative and silently
# vanish from snake_case/code-heavy text — undercounting tokens and
# diverging from the JVM proxy, which correctly treats '_' as
# punctuation.
PRETOKEN_RE = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[^\W\d_]+| ?\d+| ?(?:[^\w\s]|_)+|\s+",
    re.UNICODE,
)


def pretokenize(text: str) -> list[str]:
    """GPT-2-style pre-token segments of one text, whitespace dropped."""
    if not text:
        return []
    return [s for s in PRETOKEN_RE.findall(text) if not s.isspace()]


def _to_syms(word: str, level: str) -> tuple[str, ...]:
    """A pre-token as its BPE symbol tuple: characters, or UTF-8 bytes
    aliased to latin-1 characters (each byte b is the one-char string
    chr(b) — lossless, keeps every symbol a plain str so the trainer,
    merge table, and encoder are level-agnostic)."""
    if level == "byte":
        return tuple(word.encode("utf-8").decode("latin-1"))
    return tuple(word)


def _check_level(level: str) -> None:
    if level not in ("char", "byte"):
        raise ValueError(f"level must be 'char' or 'byte', got {level!r}")


def _merge_word(
    word: tuple[str, ...], pair: tuple[str, str]
) -> tuple[str, ...]:
    a, b = pair
    out = []
    i = 0
    while i < len(word):
        if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(word[i])
            i += 1
    return tuple(out)


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 1_000,
    max_words: int = 50_000,
    level: str = "char",
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the ranked
    merge list (rank = list index, lower merges first).

    One corpus scan: pre-tokenize (mapInArrow, Python re so train and
    apply segment identically), explode, count, keep the ``max_words``
    most frequent words (map-side partial counts + per-partition top-k;
    the truncation is the standard trainer move — tail words are too
    rare to move pair statistics — and is logged in no silent way: it is
    THE documented contract). Merge learning is then driver-side over
    the bounded (word, count) table, exactly Sennrich Alg. 1 with
    deterministic lexicographic tie-breaks. ``level="byte"`` learns
    merges over UTF-8 bytes (GPT-2 proper) instead of characters; the
    scan and driver loop are identical — only the initial symbol
    decomposition changes (see :func:`_to_syms`).
    """
    _check_level(level)
    if n_merges < 0:
        raise ValueError(f"n_merges ({n_merges}) must be >= 0")
    if max_words < 1:
        raise ValueError(f"max_words ({max_words}) must be >= 1")

    out_schema = T.StructType([T.StructField("word", T.StringType(), False)])

    def seg(it: Iterator) -> Iterator:
        import pyarrow as pa

        for batch in it:
            words: list[str] = []
            for t in batch.column(0).to_pylist():
                if t:
                    words.extend(pretokenize(t))
            yield pa.RecordBatch.from_arrays(
                [pa.array(words, pa.string())], names=["word"]
            )

    counts = (
        df.select(F.col(text_col).cast("string"))
        .mapInArrow(seg, out_schema)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word"))
        .limit(max_words)
        .collect()
    )
    # the UTF-8/latin-1 alias is injective, so distinct words map to
    # distinct symbol tuples at either level
    vocab: dict[tuple[str, ...], int] = {
        _to_syms(r["word"], level): r["cnt"] for r in counts
    }
    # incremental trainer state: exact pair counts + an inverted index
    # pair -> words containing it. Each merge then touches ONLY the words
    # holding the merged pair (a shrinking fraction after the first few
    # merges) instead of recounting all pairs over the whole vocabulary —
    # the standard trainer optimization, ~an order of magnitude off the
    # naive O(n_merges * vocab) driver loop at the 50k x 1k defaults.
    # Counts stay bit-equal to full recomputation (oracle-tested), so
    # merge selection (max count, lexicographic tie-break) is unchanged.
    pc: dict[tuple[str, str], int] = {}
    index: dict[tuple[str, str], set] = {}
    for w, f in vocab.items():
        for i in range(len(w) - 1):
            p = (w[i], w[i + 1])
            pc[p] = pc.get(p, 0) + f
            index.setdefault(p, set()).add(w)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pc:
            break
        # deterministic: max count, ties broken lexicographically
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for w in list(index.get(best, ())):
            f = vocab.get(w)
            if f is None:
                continue  # stale index entry: w was already rewritten
            for i in range(len(w) - 1):
                p = (w[i], w[i + 1])
                pc[p] -= f
                if pc[p] <= 0:
                    del pc[p]
            nw = _merge_word(w, best)
            del vocab[w]
            # if nw already exists its own pair contributions are already
            # counted; adding f on top is exactly the merged frequency
            vocab[nw] = vocab.get(nw, 0) + f
            for i in range(len(nw) - 1):
                p = (nw[i], nw[i + 1])
                pc[p] = pc.get(p, 0) + f
                index.setdefault(p, set()).add(nw)
        index.pop(best, None)
        pc.pop(best, None)  # defensive: count is 0 by now; never reselect
    return merges


def _encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> int:
    """Greedy BPE apply to one pre-token: repeatedly merge the
    lowest-rank adjacent pair. Returns the token COUNT (the engine's
    packing/budgeting currency; the tokens themselves are internal)."""
    syms = list(word)
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return len(syms)


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "n_bpe_tokens",
    level: str = "char",
) -> DataFrame:
    """Per-document REAL BPE token counts under a trained merge list:
    (id, ``out_col``). The merge ranks broadcast (a vocab is KBs–MBs);
    the pass is one map-only ``mapInArrow`` with a per-partition
    distinct-word memo — Zipf makes almost every word a cache hit, so
    the greedy merge loop runs roughly once per distinct word per
    partition, not once per occurrence. The memo is bounded
    (``_MEMO_CAP`` distinct words): a high-cardinality partition
    (random ids, code, base64) stops caching past the cap instead of
    growing Python-worker memory without bound. ``level`` must match
    the one the merges were trained with (``level="byte"`` counts
    tokens over UTF-8 byte symbols — GPT-2 proper).
    """
    _check_level(level)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    if len(ranks) != len(merges):
        raise ValueError("merges contains duplicate pairs")
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(ranks)
    id_field = df.schema[id_col]
    out_schema = T.StructType(
        [id_field, T.StructField(out_col, T.LongType(), False)]
    )

    def count(it: Iterator) -> Iterator:
        import pyarrow as pa

        R = bc.value
        memo: dict[str, int] = {}
        byte_level = level == "byte"
        for batch in it:
            ids = batch.column(0)
            ns = []
            for t in batch.column(1).to_pylist():
                total = 0
                for w in pretokenize(t or ""):
                    n = memo.get(w)
                    if n is None:
                        syms = (
                            w.encode("utf-8").decode("latin-1")
                            if byte_level else w
                        )
                        n = _encode_word(syms, R)
                        if len(memo) < _MEMO_CAP:
                            memo[w] = n
                    total += n
                ns.append(total)
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(ns, pa.int64())], names=[id_col, out_col]
            )

    return df.select(id_col, F.col(text_col).cast("string")).mapInArrow(
        count, out_schema
    )
