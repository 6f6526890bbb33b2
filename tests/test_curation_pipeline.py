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


def test_incremental_curation_pipeline(spark, sf_dir, tmp_path_factory):
    """The DAILY flow, built only from this repo's incremental operators:
    each arriving batch is near-dup-indexed against the persisted
    signature table (dedup_new_batch), its pairs fold into the persisted
    component labels (update_components), retention re-derives from
    labels alone (retain_best_with_labels — no graph pass), per-day
    stats maintain incrementally (refresh_aggregate), the BM25 search
    index folds only the day's delta (refresh_postings) and serves
    queries identical to a full-corpus build, and the month-end
    compact + expire reclaims the snapshot chain without changing reads.
    Final retention must equal the all-at-once batch pipeline."""
    from lyssandra_spark.operators.dedup import minhash_lsh_pairs
    from lyssandra_spark.operators.graph import (
        connected_components,
        retain_best_per_cluster,
        retain_best_with_labels,
    )
    from lyssandra_spark.operators.incremental import (
        dedup_new_batch,
        refresh_aggregate,
        update_components,
    )
    from lyssandra_spark.operators.search import (
        bm25_topk,
        bm25_topk_indexed,
        refresh_postings,
    )
    from lyssandra_spark.sources.catalog import ParquetCatalog

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .withColumn("quality", (F.xxhash64("doc_id") % 1000) / 1000.0)
    )
    # plant near-dups: every 6th doc gets a tweaked twin; days are
    # hash-routed independently, so a large fraction of twin pairs (in
    # expectation ~2/3) straddle batch boundaries — enough to exercise
    # the cross-batch path, though no individual pair is guaranteed to.
    twins = docs.where(F.col("doc_id") % 6 == 0).select(
        (F.col("doc_id") + 70000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail tweak")).alias("text"),
        F.col("quality"),
    )
    corpus = docs.unionByName(twins).cache()

    cat = ParquetCatalog(spark, str(tmp_path_factory.mktemp("inc_cur")))
    kw = dict(n_perm=32, bands=8, threshold=0.3, ngram_bytes=8)
    day = F.pmod(F.xxhash64("doc_id", F.lit("route")), F.lit(3))
    for r in range(3):
        batch = corpus.where(day == r)
        pairs, _ = dedup_new_batch(
            cat, "sigs", batch, batch_id=f"day{r}", **kw
        )
        update_components(cat, "labels", pairs)
        cat.write(batch.withColumn("day", F.lit(r)), "docs", mode="append")
        refresh_aggregate(cat, "docs", "daily_stats", keys="day",
                          sum_cols="quality")
        refresh_postings(cat, "docs", "postings")

    # retention from the PERSISTED labels == the one-shot batch pipeline
    kept_inc = retain_best_with_labels(
        corpus, cat.read("labels"), score_col="quality"
    )
    full_pairs = minhash_lsh_pairs(corpus, **kw)
    kept_full = retain_best_per_cluster(
        corpus, full_pairs, score_col="quality"
    )
    a = kept_inc.select("doc_id").toPandas().sort_values("doc_id")
    b = kept_full.select("doc_id").toPandas().sort_values("doc_id")
    assert a.doc_id.tolist() == b.doc_id.tolist()
    assert len(a) < corpus.count()  # something was actually deduped

    # labels agree with a from-scratch CC over all pairs
    want = {
        r["id"]: r["component"]
        for r in connected_components(full_pairs).collect()
    }
    got = {r["id"]: r["component"] for r in cat.read("labels").collect()}
    assert got == want

    # incremental stats == direct aggregation
    stats = cat.read("daily_stats").toPandas().set_index("day")
    direct = (
        corpus.withColumn("day", day).groupBy("day")
        .agg(F.sum("quality").alias("sum_quality"),
             F.count("*").alias("n_rows"))
        .toPandas().set_index("day")
    )
    for d_ in range(3):
        assert stats.loc[d_, "n_rows"] == direct.loc[d_, "n_rows"]
        assert abs(stats.loc[d_, "sum_quality"]
                   - direct.loc[d_, "sum_quality"]) < 1e-6

    # month-end maintenance: compact + expire; reads unchanged — the
    # postings chain compacts like any other catalog table, and the
    # refresh watermark/n_docs meta must SURVIVE the audit-only
    # compaction snapshot (latest_meta lookup)
    n_before = cat.read("docs").count()
    cat.compact("docs")
    assert cat.expire("docs")  # reclaimed something
    assert cat.read("docs").count() == n_before
    n_post = cat.read("postings").count()
    cat.compact("postings")
    assert cat.read("postings").count() == n_post

    # the incrementally-maintained, freshly-compacted search index
    # answers queries exactly like a from-scratch full-corpus BM25
    # (and never re-reads the text)
    q = spark.createDataFrame(
        [(1, "table scan value"), (2, "spark merge batch")],
        "qid long, qtext string",
    )
    gi = (
        bm25_topk_indexed(cat, "postings", q, k=5).toPandas()
        .sort_values(["qid", "rk"]).reset_index(drop=True)
    )
    gf = (
        bm25_topk(corpus.select("doc_id", "text"), q, k=5).toPandas()
        .sort_values(["qid", "rk"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(gi, gf)
    # the SOURCE was compacted above (chain reset), so the next refresh
    # is the documented one-time full rebuild; the one after that is a
    # clean no-op — and queries still match throughout
    s_rebuild = refresh_postings(cat, "docs", "postings")
    assert refresh_postings(cat, "docs", "postings") == s_rebuild
    gi2 = (
        bm25_topk_indexed(cat, "postings", q, k=5).toPandas()
        .sort_values(["qid", "rk"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(gi2, gf)
    corpus.unpersist()


def test_dsir_composes_with_samplers(spark, sf_dir):
    """The DSIR score column feeds the deterministic samplers exactly
    like the quality-classifier score: quantile_filter gates on it,
    probabilistic_keep soft-samples on its sigmoid, and dsir_resample
    draws a fixed-size corpus — all leakage-key-consistent."""
    from lyssandra_spark.operators.dsir import (
        dsir_logweights,
        dsir_resample,
        fit_hashed_ngram_model,
    )
    from lyssandra_spark.operators.split import (
        probabilistic_keep,
        quantile_filter,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).limit(300)
    target = docs.where(F.col("doc_id") % 5 == 0)
    lt = fit_hashed_ngram_model(target, m=512)
    lr = fit_hashed_ngram_model(docs, m=512)
    scored = dsir_logweights(docs, lt, lr)

    kept = quantile_filter(scored, "dsir_logw", keep_frac=0.5)
    n = docs.count()
    assert 0 < kept.count() <= n

    soft = probabilistic_keep(
        scored,
        F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("dsir_logw"))),
        "doc_id",
    )
    assert 0 < soft.count() <= n

    sample = dsir_resample(scored, k=50)
    assert sample.count() == 50
    # resampled rows carry the original columns and are a subset
    ids = {r["doc_id"] for r in sample.select("doc_id").collect()}
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert ids <= all_ids
