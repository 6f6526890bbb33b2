"""Real BPE training + token counts vs an independent textbook oracle."""

from collections import Counter

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lyssandra_spark.functions.bpe import (
    bpe_token_counts,
    pretokenize,
    train_bpe,
)

CORPUS = [
    "low lower lowest low low",
    "new newer newest new",
    "the lowest newest low",
    "wider wide widest the the the",
]


def _docs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )


# -- independent textbook oracle (Sennrich et al. 2016, Alg. 1) --------
# deliberately a DIFFERENT formulation from the library: words kept as
# lists in a flat list (not a dict of tuples), merges applied by rank
# order at encode time (not the greedy lowest-rank loop) — the two are
# equivalent for BPE, so agreement is meaningful.

def _syms(w, level):
    return list(w.encode("utf-8").decode("latin-1")) if level == "byte" else list(w)


def _oracle_train(texts, n_merges, level="char"):
    wc = Counter(w for t in texts for w in pretokenize(t))
    words = [(_syms(w, level), c) for w, c in sorted(wc.items())]
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, c in words:
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        merges.append(best)
        a, b = best
        for syms, _ in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [a + b]
                else:
                    i += 1
    return merges


def _oracle_encode_count(text, merges, level="char"):
    total = 0
    for w in pretokenize(text):
        syms = _syms(w, level)
        for a, b in merges:  # rank order == greedy lowest-rank
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [a + b]
                else:
                    i += 1
        total += len(syms)
    return total


def test_train_bpe_matches_textbook_oracle(spark):
    got = train_bpe(_docs(spark, CORPUS), n_merges=15)
    want = _oracle_train(CORPUS, 15)
    assert got == want
    # sanity on content: frequent subwords are learned early
    assert ("l", "o") in got[:6] or ("lo", "w") in got[:6]


def test_byte_level_bpe_matches_oracle_on_multibyte(spark):
    """level='byte' (GPT-2 proper): symbols are UTF-8 bytes, so
    multibyte characters start split and merge only if the data earns
    it — textbook-oracle parity on accented/multibyte text, and the
    untrained byte count equals the UTF-8 byte length of the
    pre-tokens (not the character count)."""
    corpus = [
        "héllo héllo héllo naïve café",
        "naïve café héllo — déjà vu déjà vu",
        "日本語 テスト 日本語 héllo",
    ]
    docs = _docs(spark, corpus)
    got = train_bpe(docs, n_merges=12, level="byte")
    want = _oracle_train(corpus, 12, level="byte")
    assert got == want
    # merges exist that glue a multibyte character's bytes together:
    # every learned symbol is a latin-1 byte string
    assert all(all(ord(ch) < 256 for ch in a + b) for a, b in got)

    counts = dict(
        bpe_token_counts(docs, got, level="byte")
        .collect()
    )
    for i, t in enumerate(corpus):
        assert counts[i] == _oracle_encode_count(t, got, level="byte"), i
    # zero merges: count == total UTF-8 bytes of the pre-tokens
    zero = dict(bpe_token_counts(docs, [], level="byte").collect())
    for i, t in enumerate(corpus):
        want_bytes = sum(len(w.encode("utf-8")) for w in pretokenize(t))
        assert zero[i] == want_bytes, i
    # and char level counts characters, strictly fewer on this corpus
    zc = dict(bpe_token_counts(docs, [], level="char").collect())
    assert all(zc[i] < zero[i] for i in range(len(corpus)))

    # level is part of tokenizer identity: unknown levels fail loudly
    with pytest.raises(ValueError, match="level"):
        train_bpe(docs, n_merges=1, level="bytes")
    with pytest.raises(ValueError, match="level"):
        bpe_token_counts(docs, got, level="Byte")


def test_pretokenize_keeps_underscores():
    """Python's \\w includes '_' (Java's \\p{L}/\\p{N} don't), so a naive
    [^\\s\\w]+ punctuation class makes '_' match NO alternative and
    silently vanish — snake_case text would be undercounted. '_' must
    segment as punctuation, like the JVM proxy."""
    from lyssandra_spark.functions.bpe import pretokenize

    assert pretokenize("foo_bar") == ["foo", "_", "bar"]
    assert pretokenize("a _ b") == ["a", " _", " b"]
    assert pretokenize("__init__") == ["__", "init", "__"]
    # no character of the input is ever silently dropped
    assert "".join(pretokenize("x_y z")) + " " == "x_y z "  # ws segments dropped
    assert sum(len(s) for s in pretokenize("a_b")) == 3


def test_bpe_token_counts_match_oracle(spark):
    texts = CORPUS + [
        "",  # empty
        "unicode café 北京 naïve — $12.99!",
        "it's can't we'll they'd",
        "completely unseen zyxwvut qqq",
        "snake_case_name and __dunder__ and a_b",  # '_' must not vanish
    ]
    merges = train_bpe(_docs(spark, CORPUS), n_merges=20)
    got = (
        bpe_token_counts(_docs(spark, texts), merges)
        .toPandas().set_index("doc_id").sort_index()
    )
    for i, t in enumerate(texts):
        assert got.loc[i, "n_bpe_tokens"] == _oracle_encode_count(t, merges), t


def test_bpe_zero_merges_and_monotonicity(spark):
    texts = ["the lowest newest low low", "wider and wider"]
    docs = _docs(spark, texts)
    # zero merges: every pre-token splits to characters
    c0 = bpe_token_counts(docs, []).toPandas().set_index("doc_id")
    for i, t in enumerate(texts):
        assert c0.loc[i, "n_bpe_tokens"] == sum(
            len(w) for w in pretokenize(t)
        )
    # more merges never increases any document's count
    m5 = train_bpe(docs, n_merges=5)
    m25 = train_bpe(docs, n_merges=25)
    assert m25[:5] == m5  # training is deterministic and prefix-stable
    c5 = bpe_token_counts(docs, m5).toPandas().set_index("doc_id")
    c25 = bpe_token_counts(docs, m25).toPandas().set_index("doc_id")
    assert (c25.n_bpe_tokens <= c5.n_bpe_tokens).all()
    assert (c5.n_bpe_tokens <= c0.n_bpe_tokens).all()


def test_bpe_validation_and_plan(spark, sf_dir):
    docs = _docs(spark, CORPUS)
    with pytest.raises(ValueError, match="n_merges"):
        train_bpe(docs, n_merges=-1)
    with pytest.raises(ValueError, match="max_words"):
        train_bpe(docs, max_words=0)
    with pytest.raises(ValueError, match="duplicate"):
        bpe_token_counts(docs, [("a", "b"), ("a", "b")])

    # apply is ONE map-only Arrow pass — no shuffle anywhere
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = train_bpe(docs, n_merges=10)
    plan = (
        bpe_token_counts(d, merges)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    # and the real table runs end to end with sane outputs
    out = bpe_token_counts(d.limit(50), merges).toPandas()
    assert (out.n_bpe_tokens >= 0).all() and len(out) == 50


def test_bpe_counts_feed_sequence_packing(spark):
    """The advertised composition: real token counts budget the packer."""
    from lyssandra_spark.operators.chunk import pack_sequences

    docs = _docs(spark, CORPUS)
    merges = train_bpe(docs, n_merges=10)
    counts = bpe_token_counts(docs, merges)
    packed = pack_sequences(counts, budget=64, id_col="doc_id",
                            ntok_col="n_bpe_tokens")
    pdf = packed.toPandas()
    assert set(pdf.doc_id) == set(range(len(CORPUS)))  # exactly once
    per_bin = pdf.groupby("bin_id").n_tokens.sum()  # packer's output name
    assert (per_bin <= 64).all()


def test_train_bpe_incremental_equals_naive_property(spark):
    """Property sweep: the incremental pair-count/inverted-index trainer
    must be BIT-EQUAL to the naive full-recount formulation on adversarial
    small-alphabet corpora (heavy count ties exercise the lexicographic
    tie-break; repeated merges into existing words exercise the
    frequency-fold path). Deterministic seeds, many shapes."""
    import random

    rng = random.Random(99)
    for trial in range(12):
        alpha = "ab" if trial % 3 == 0 else "abc"
        texts = [
            " ".join(
                "".join(rng.choice(alpha) for _ in range(rng.randint(1, 5)))
                for _ in range(rng.randint(1, 6))
            )
            for _ in range(rng.randint(1, 8))
        ]
        n_merges = rng.randint(0, 12)
        got = train_bpe(_docs(spark, texts), n_merges=n_merges)
        want = _oracle_train(texts, n_merges)
        assert got == want, (trial, texts, n_merges)
