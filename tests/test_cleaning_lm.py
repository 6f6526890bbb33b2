"""PII redaction, Unicode normalization, and char-n-gram LM scoring."""

import math
import unicodedata
from collections import Counter

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lyssandra_spark.functions.cleaning import normalize_text, redact_pii
from lyssandra_spark.functions.lm import score_char_lm, train_char_lm


def _docs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )


def test_redact_pii_known_values(spark):
    texts = [
        "mail me at jane.doe+x@example.co.uk today",
        "server at 192.168.1.100 responded",
        "card 4111 1111 1111 1111 declined",
        "call +1 (555) 123-4567 or 555-123-4567",
        "no identifiers in this one",
    ]
    out = (
        redact_pii(_docs(spark, texts))
        .toPandas().set_index("doc_id").sort_index()
    )
    assert out.loc[0, "text"] == "mail me at <EMAIL> today"
    assert out.loc[1, "text"] == "server at <IP> responded"
    assert out.loc[2, "text"] == "card <CARD> declined"
    assert "<PHONE>" in out.loc[3, "text"]
    assert "4567" not in out.loc[3, "text"]
    assert out.loc[4, "text"] == texts[4]
    assert list(out.pii_redactions) == [1, 1, 1, 2, 0]


def test_redact_pii_map_only_plan(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = redact_pii(d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_normalize_text_matches_unicodedata(spark):
    texts = [
        "café society",               # precomposed é
        "café society",              # decomposed e + combining acute
        "ﬁnancial ﬂow",          # fi / fl ligatures (NFKC folds)
        "num break",                  # nbsp (NFKC -> space)
        "ctrl\x07char\tand\nnewline",
    ]
    out = (
        normalize_text(_docs(spark, texts), form="NFKC")
        .toPandas().set_index("doc_id").sort_index()
    )
    # both é encodings converge; ligatures fold; python unicodedata agrees
    assert out.loc[0, "text"] == out.loc[1, "text"] == "café society"
    want2 = unicodedata.normalize("NFKC", texts[2])
    assert out.loc[2, "text"] == want2 == "financial flow"
    assert out.loc[3, "text"] == "num break"
    # bell stripped; tab/newline survive the control strip but collapse
    assert out.loc[4, "text"] == "ctrlchar and newline"

    with pytest.raises(ValueError, match="form"):
        normalize_text(_docs(spark, ["x"]), form="NFX")


def test_char_lm_numpy_crosscheck(spark):
    texts = ["abcabc", "abcxyz"]
    docs = _docs(spark, texts)
    model, oov = train_char_lm(docs, n=3, top_k=4, alpha=0.5)
    got_model = {r["ngram"]: r["logp"] for r in model.collect()}

    # python oracle: trigram counts over whitespace-collapsed lowercased text
    cnt = Counter()
    for t in texts:
        for i in range(len(t) - 2):
            cnt[t[i:i + 3]] += 1
    total = sum(cnt.values())
    denom = total + 0.5 * (4 + 1)
    top4 = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    for g, c in top4:
        assert got_model[g] == pytest.approx(math.log((c + 0.5) / denom))
    assert len(got_model) == 4
    assert oov == pytest.approx(math.log(0.5 / denom))

    scored = score_char_lm(docs, model, oov, n=3).toPandas().set_index("doc_id")
    for i, t in enumerate(texts):
        grams = [t[j:j + 3] for j in range(len(t) - 2)]
        want = sum(got_model.get(g, oov) for g in grams) / len(grams)
        assert scored.loc[i, "lm_score"] == pytest.approx(round(want, 6))
        assert scored.loc[i, "n_ngrams"] == len(grams)


def test_char_lm_small_corpus_probability_mass(spark):
    """Corpus with far fewer distinct n-grams than top_k: the smoothing
    denominator must use the REALIZED vocabulary (min(top_k, n_distinct)
    + 1 OOV bucket), so probability mass stays <= 1 instead of the
    top_k-denominator's mass << 1 over-smoothing."""
    docs = _docs(spark, ["ababab"])  # trigrams: aba x2, bab x2
    model, oov = train_char_lm(docs, n=3, top_k=50_000, alpha=0.5)
    rows = model.collect()
    assert len(rows) == 2
    mass = sum(math.exp(r["logp"]) for r in rows) + math.exp(oov)
    assert mass == pytest.approx(1.0)  # (2.5 + 2.5 + 0.5) / 5.5
    got = {r["ngram"]: r["logp"] for r in rows}
    assert got["aba"] == pytest.approx(math.log(2.5 / 5.5))


def test_char_lm_separates_gibberish(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    # deterministic gibberish: reverse each doc's chars and strip vowels'
    # structure by interleaving digits — destroys natural trigrams
    gib = d.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat_ws("7", F.reverse(F.col("text")), F.lit("qzxjv")).alias("text"),
    )
    corpus = d.unionByName(gib)
    model, oov = train_char_lm(d, n=3, top_k=5000)  # train on CLEAN docs
    scored = score_char_lm(corpus, model, oov, n=3)
    pdf = scored.toPandas()
    nat = pdf[pdf.doc_id < 100000].lm_score.mean()
    g = pdf[pdf.doc_id >= 100000].lm_score.mean()
    assert nat > g + 0.5, f"natural {nat:.3f} vs gibberish {g:.3f}"

    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # the model must broadcast


def test_redact_pii_placeholder_in_input_and_empty_patterns(spark):
    texts = ["wrap addresses in an <EMAIL> tag", "x@y.io plus <EMAIL> literal"]
    out = redact_pii(_docs(spark, texts)).toPandas().set_index("doc_id")
    # pre-existing literal tags don't count; only real insertions do
    assert out.loc[0, "pii_redactions"] == 0
    assert out.loc[1, "pii_redactions"] == 1
    # explicit empty pattern list is a no-op, not a default fallback
    noop = redact_pii(_docs(spark, texts), patterns=[]).toPandas()
    assert list(noop.text) == texts
    assert list(noop.pii_redactions) == [0, 0]


def test_char_lm_long_document_is_linear(spark):
    # the normalization is projected ONCE, not re-evaluated per char
    # position — a 30k-char doc must extract n-grams in seconds, not
    # minutes (the O(len^2) formulation took 21s at 20k chars)
    import time

    long_doc = ("the quick brown fox jumps over the lazy dog " * 700)[:30000]
    docs = _docs(spark, [long_doc])
    t0 = time.time()
    model, oov = train_char_lm(docs, n=3, top_k=1000)
    n = score_char_lm(docs, model, oov, n=3).collect()[0]["n_ngrams"]
    assert n == len(" ".join(long_doc.split())) - 2
    assert time.time() - t0 < 30
