"""End-to-end curation pipeline composition: the full data-prep flow a
training run ships, built ONLY from this repo's operators —

    normalize -> redact PII -> exact dedup -> repetition + LM quality
    -> stratified keep -> chunk -> pack

Asserts the stages compose (schemas flow, no column collisions), the
flow is deterministic across partitionings, and every surviving chunk
traces back to a surviving document.
"""

import pandas as pd
from pyspark.sql import functions as F

from lyssandra_spark.functions.cleaning import normalize_text, redact_pii
from lyssandra_spark.functions.lm import score_char_lm, train_char_lm
from lyssandra_spark.functions.textstats import repetition_features
from lyssandra_spark.operators.chunk import chunk_documents, pack_sequences
from lyssandra_spark.operators.dedup import exact_dedup
from lyssandra_spark.operators.split import stratified_sample


def _run_pipeline(spark, docs):
    # 1. clean
    d = normalize_text(docs, form="NFKC")
    d = redact_pii(d)
    # 2. exact dedup (lowest doc_id survives)
    d = exact_dedup(d).select("doc_id", "text", "pii_redactions")
    # 3. quality: repetition filters + corpus LM score
    rep = repetition_features(d)
    model, oov = train_char_lm(d, n=3, top_k=5000)
    lm = score_char_lm(d, model, oov, n=3)
    # every deduped doc must get a score row (all corpus texts exceed the
    # 3-char n-gram minimum) — an inner join below would silently drop
    # any doc the scorer lost, so pin the row counts first
    assert lm.count() == d.count() == rep.count()
    d = (
        d.join(rep.select("doc_id", "dup_word_ratio"), "doc_id")
        .join(lm.select("doc_id", "lm_score"), "doc_id")
        .withColumn(
            "band",
            F.when(F.col("dup_word_ratio") > 0.7, "junk").otherwise("keep"),
        )
    )
    # 4. keep all good docs, drop the repetition junk
    d = stratified_sample(d, "band", {"keep": 1.0}, "doc_id")
    # 5. chunk + pack
    chunks = chunk_documents(d, chunk_tokens=32, overlap=4)
    packed = pack_sequences(
        chunks.withColumnRenamed("chunk_idx", "cid").select(
            F.concat_ws("#", "doc_id", "cid").alias("doc_id"),
            F.col("n_chunk_tokens").alias("n_tokens"),
        ),
        budget=64, n_shards=4,
    )
    return d, chunks, packed


def test_curation_pipeline_composes(spark, sf_dir):
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    junk = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [990001, 990002],
                "text": ["spam " * 60, "contact a@b.io or c@d.io " + "buy " * 50],
            }
        )
    )
    # a SURVIVING doc that carries PII: low repetition, real sentence —
    # redaction must be visible in ITS kept text (asserting on chunk_text
    # would be vacuous: the tokenizer drops '@' anyway)
    pii_doc = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [990003],
                "text": ["please write to grace.hopper@navy.mil about the "
                         "compiler design meeting next week thanks"],
            }
        )
    )
    docs = base.unionByName(junk).unionByName(pii_doc)

    kept, chunks, packed = _run_pipeline(spark, docs)
    kept_pdf = kept.toPandas()

    # repetition junk was banded and dropped; real docs survive
    assert not set(kept_pdf.doc_id) & {990001, 990002}
    assert len(kept_pdf) > 0.9 * base.count()
    # the surviving PII doc is redacted, counted, and chunked redacted
    surv = kept_pdf[kept_pdf.doc_id == 990003]
    assert len(surv) == 1
    assert "<EMAIL>" in surv.text.iloc[0] and "navy.mil" not in surv.text.iloc[0]
    assert surv.pii_redactions.iloc[0] == 1
    pii_chunks = chunks.where(F.col("doc_id") == 990003).toPandas()
    assert len(pii_chunks) >= 1
    assert not pii_chunks.chunk_text.str.contains("navy").any()

    # every packed sequence element is a chunk of a surviving doc
    packed_pdf = packed.toPandas()
    assert packed_pdf.doc_id.str.split("#").str[0].astype(int).isin(
        set(kept_pdf.doc_id)
    ).all()
    sums = packed_pdf[~packed_pdf.oversize].groupby("bin_id").n_tokens.sum()
    assert (sums <= 64).all()

    # end-to-end determinism across input partitioning
    kept2, _, packed2 = _run_pipeline(spark, docs.repartition(13))
    assert set(kept2.toPandas().doc_id) == set(kept_pdf.doc_id)
    a = packed_pdf.sort_values("doc_id").reset_index(drop=True)
    b = packed2.toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_all_curation_ops_handle_empty_input(spark):
    """Every curation operator degrades to an empty (or scaffold-only)
    result on an empty corpus — no obscure numpy/arrow errors."""
    from lyssandra_spark.functions.textstats import (
        ngram_contamination,
        token_count_features,
        token_frequencies,
    )
    from lyssandra_spark.operators.graph import (
        connected_components,
        retain_best_per_cluster,
    )
    from lyssandra_spark.operators.profile import profile_table

    empty = spark.createDataFrame([], "doc_id long, text string")
    no_edges = spark.createDataFrame([], "id_a long, id_b long")

    assert repetition_features(empty).count() == 0
    assert token_count_features(empty).count() == 0
    assert token_frequencies(empty, k=5).count() == 0
    assert ngram_contamination(empty, empty).count() == 0
    assert chunk_documents(empty).count() == 0
    assert redact_pii(empty).count() == 0
    assert normalize_text(empty).count() == 0
    assert exact_dedup(empty).count() == 0
    assert stratified_sample(empty, "text", {"x": 1.0}, "doc_id").count() == 0
    assert connected_components(no_edges).count() == 0
    assert retain_best_per_cluster(
        empty.withColumnRenamed("text", "quality"), no_edges
    ).count() == 0
    model, oov = train_char_lm(empty)
    assert model.count() == 0
    assert score_char_lm(empty, model, oov).count() == 0
    # profiler returns the metric scaffold (rows row + per-column rows)
    assert profile_table(empty).count() > 0
