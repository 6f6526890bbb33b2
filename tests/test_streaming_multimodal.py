"""Streaming (batch==stream parity) and multimodal plumbing tests."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lyssandra_spark.functions.multimodal import attach_fake_media, decode_image_features
from lyssandra_spark.sources import synth
from lyssandra_spark.streaming import stream as ST


@pytest.fixture(scope="module")
def tpath(spark, sf_dir, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("stream") / "transcripts")
    synth.transcripts(spark, sf_dir).limit(2000).coalesce(4).write.parquet(p)
    return p


def _run_stream(spark, sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if sdf.isStreaming and _has_agg(sdf) else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def _has_agg(sdf):
    return "Aggregate" in sdf._jdf.queryExecution().analyzed().toString()


def test_streaming_encode_matches_batch(spark, tpath):
    batch_df = spark.read.parquet(tpath)
    versions = synth.build_dict_versions("/root/testdata/sf0.001", n_atoms=128)
    sdf = ST.read_transcript_stream(spark, tpath, batch_df.schema)
    coded_stream = ST.encode_stream(
        sdf.select("conv_id", "turn_idx", "ts", "text"), versions, algo="bomp", k=5,
        drop_text=True,
    )
    got = _run_stream(spark, coded_stream, "enc_stream").toPandas()
    from lyssandra_spark.operators.encode import sparse_code

    exp = sparse_code(
        batch_df.select("conv_id", "turn_idx", "ts", "text"), versions,
        algo="bomp", k=5, drop_text=True,
    ).toPandas()
    got = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    exp = exp.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["dict_version"] == exp["dict_version"]).all()
    assert np.allclose(got["recon_err"], exp["recon_err"], rtol=1e-9)
    for i in range(0, len(got), 97):
        assert np.array_equal(
            np.asarray(got["code_idx"][i]), np.asarray(exp["code_idx"][i])
        )


def test_streaming_session_agg_matches_batch(spark, tpath):
    batch_df = spark.read.parquet(tpath)
    sdf = ST.read_transcript_stream(spark, tpath, batch_df.schema)
    got = _run_stream(spark, ST.session_agg_stream(sdf), "sess_stream").toPandas()
    # batch oracle: same session_window aggregation, batch mode
    exp = (
        batch_df.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "conv_id")
        .agg(F.count("*").alias("n_turns"))
        .select("conv_id", F.col("sw.start").alias("session_start"),
                F.col("n_turns"))
        .toPandas()
    )
    g = got[["conv_id", "session_start", "n_turns"]].sort_values(
        ["conv_id", "session_start"]).reset_index(drop=True)
    e = exp.sort_values(["conv_id", "session_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, e, check_dtype=False)


def test_multimodal_fake_decode(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    media = attach_fake_media(docs)
    feats = decode_image_features(media, fake=True).toPandas()
    assert len(feats) == 200
    assert (feats["n_bytes"] > 0).all()
    assert feats["feature"].map(len).eq(8).all()
    # deterministic across partitionings
    feats2 = decode_image_features(
        attach_fake_media(docs).repartition(7), fake=True
    ).toPandas()
    a = feats.sort_values("media_id").reset_index(drop=True)
    b = feats2.sort_values("media_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_multimodal_codec_formats_raise(spark, sf_dir):
    """PNG (needs PIL, absent) raises through the real-decode path."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(5)
    media = attach_fake_media(docs)  # mime=image/png, opaque bytes
    with pytest.raises(Exception, match="NotImplementedError|PIL"):
        decode_image_features(media, fake=False).collect()


def test_multimodal_real_bmp_decode(spark, sf_dir):
    """REAL BMP round-trip: synthesized container bytes -> pure-numpy
    header parse + grayscale + nearest resize; values match a local
    decode of the same bytes exactly."""
    import numpy as np

    from lyssandra_spark.functions.multimodal import (
        attach_bmp_media, decode_bmp, synth_bmp,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    feats = decode_image_features(attach_bmp_media(docs)).toPandas()
    assert len(feats) == 50
    assert feats["feature"].map(len).eq(8).all()
    for _, r in feats.sample(5, random_state=0).iterrows():
        mid = int(r["media_id"])
        w, h = mid % 64 + 16, mid % 48 + 16
        ew, eh, emp, efeat = decode_bmp(synth_bmp(mid, w, h), (2, 4))
        assert (r["width"], r["height"]) == (ew, eh)
        assert abs(r["mean_pixel"] - emp) < 1e-9
        np.testing.assert_allclose(list(r["feature"]), efeat)


def test_multimodal_real_wav_decode(spark, sf_dir):
    """REAL WAV decode: PCM16 parse, RMS ~ known sine amplitude, FFT band
    energy peaks in the band containing the synthesized pitch."""
    import numpy as np

    from lyssandra_spark.functions.multimodal import (
        attach_wav_media, decode_audio_features, decode_wav, synth_wav,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    feats = decode_audio_features(attach_wav_media(docs)).toPandas()
    assert len(feats) == 50
    assert (feats["sample_rate"] == 16000).all()
    # 0.6 sin + 0.25 harmonic -> rms = sqrt(0.6^2/2 + 0.25^2/2) ~ 0.4596
    assert feats["rms"].between(0.40, 0.52).all()
    for _, r in feats.sample(5, random_state=1).iterrows():
        mid = int(r["media_id"])
        rate, n, rms, zcr, bands = decode_wav(
            synth_wav(mid, n_samples=2048 + mid % 2048)
        )
        assert (r["sample_rate"], r["n_samples"]) == (rate, n)
        assert abs(r["rms"] - rms) < 1e-12
        np.testing.assert_allclose(list(r["band_energy"]), bands)


def test_stateful_sessionize_matches_batch(spark, tpath):
    from lyssandra_spark.operators.windows import sessionize

    batch_df = spark.read.parquet(tpath)
    sdf = ST.read_transcript_stream(spark, tpath, batch_df.schema)
    got = _run_stream(
        spark, ST.stateful_sessionize_stream(sdf), "state_sess"
    ).toPandas()
    exp = (
        sessionize(batch_df, 1800, part="conv_id", ts_col="ts")
        .select("conv_id", "turn_idx", "session_id")
        .toPandas()
    )
    g = got[["conv_id", "turn_idx", "session_id"]].sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    e = exp.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, e, check_dtype=False)


def test_multimodal_video_frame_sampling(spark, sf_dir):
    """REAL video frame-sampling: BMV1 container walk + BMP decode of every
    Nth frame; counts and values match a local decode of the same bytes."""
    import numpy as np

    from lyssandra_spark.functions.multimodal import (
        _iter_video_frames, attach_video_media, decode_bmp,
        sample_video_frames, synth_video,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    frames = sample_video_frames(attach_video_media(docs), every_nth=3).toPandas()
    # every video contributes ceil(n_frames / 3) sampled frames
    got_counts = frames.groupby("media_id").size()
    for mid, cnt in got_counts.items():
        n_frames = int(mid) % 10 + 6
        assert cnt == -(-n_frames // 3), (mid, cnt, n_frames)
    assert (frames["frame_idx"] % 3 == 0).all()
    # spot-check values against a local decode of the same container
    r = frames[frames["frame_idx"] == 3].iloc[0]
    mid = int(r["media_id"])
    for fidx, _, frame in _iter_video_frames(synth_video(mid, mid % 10 + 6)):
        if fidx == 3:
            w, h, mp, feat = decode_bmp(frame, (2, 4))
    assert (r["width"], r["height"]) == (w, h)
    assert abs(r["mean_pixel"] - mp) < 1e-9
    np.testing.assert_allclose(list(r["feature"]), feat)


def test_streaming_dedup_matches_batch(spark, sf_dir, tmp_path_factory):
    """Streaming dropDuplicatesWithinWatermark == batch dedup on a
    re-ingested (duplicated) transcript table: one row per (conv, turn)."""
    p = str(tmp_path_factory.mktemp("stream_dup") / "dup")
    dup = synth.transcripts(spark, sf_dir, with_dups=True).limit(3000)
    dup.coalesce(3).write.parquet(p)
    batch_df = spark.read.parquet(p)
    sdf = ST.read_transcript_stream(spark, p, batch_df.schema)
    got = _run_stream(spark, ST.dedup_stream(sdf), "dedup_stream").toPandas()
    exp_n = batch_df.select("conv_id", "turn_idx").distinct().count()
    assert len(got) == exp_n
    assert not got.duplicated(["conv_id", "turn_idx"]).any()


def test_stream_foreachbatch_catalog_sink(spark, tpath, tmp_path_factory):
    """B18+B21 composed: streamed encode lands in the snapshot catalog via
    foreachBatch, one append snapshot per micro-batch, and the catalog
    read-back equals the batch encode of the same input."""
    from lyssandra_spark.operators.encode import sparse_code
    from lyssandra_spark.sources.catalog import ParquetCatalog

    root = tmp_path_factory.mktemp("stream_cat")
    cat = ParquetCatalog(spark, str(root / "wh"))
    versions = synth.build_dict_versions("/root/testdata/sf0.001", n_atoms=128)
    # 4 files => 4 micro-batches at maxFilesPerTrigger=1 (tpath itself is a
    # single file: limit() collapses to one partition before the write)
    src = str(root / "src")
    spark.read.parquet(tpath).repartition(4).write.parquet(src)
    batch_df = spark.read.parquet(src)
    sdf = ST.read_transcript_stream(spark, src, batch_df.schema, max_files=1)
    coded = ST.encode_stream(
        sdf.select("conv_id", "turn_idx", "ts", "text"), versions,
        algo="bomp", k=5, drop_text=True,
    )
    q = ST.stream_to_catalog(coded, cat, "turn_codes", str(root / "ckpt"))
    assert q.awaitTermination(180), "stream did not finish within timeout"

    snaps = cat.snapshots("turn_codes")
    assert len(snaps) >= 2, "expected one append snapshot per micro-batch"
    assert all(s["mode"] == "append" for s in snaps)
    # micro-batch ids stamped for replay audits: all present, all distinct
    bids = [s["meta"]["stream_batch_id"] for s in snaps]
    assert len(set(bids)) == len(bids)

    got = cat.read("turn_codes").toPandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    exp = sparse_code(
        batch_df.select("conv_id", "turn_idx", "ts", "text"), versions,
        algo="bomp", k=5, drop_text=True,
    ).toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["dict_version"].to_numpy() == exp["dict_version"].to_numpy()).all()
    assert np.allclose(got["recon_err"], exp["recon_err"], rtol=1e-9)

    # time-travel still works on streamed snapshots: snapshot 1 is a prefix
    first = cat.read("turn_codes", as_of=1).count()
    assert 0 < first < len(got)

    # exactly-once sink: wipe the checkpoint and replay the WHOLE stream —
    # every micro-batch re-fires with its original batch_id, and the
    # idempotent foreachBatch skip must leave the catalog untouched
    import shutil
    shutil.rmtree(str(root / "ckpt"))
    q2 = ST.stream_to_catalog(coded, cat, "turn_codes", str(root / "ckpt"))
    assert q2.awaitTermination(180)
    assert cat.snapshots("turn_codes") == snaps, "replayed batches re-appended"
    assert cat.read("turn_codes").count() == len(got)

    # ...but the skip key is the (checkpoint, batch_id) PAIR: a brand-new
    # query (fresh checkpoint path) into the same table restarts batch
    # numbering at 0, and ITS batches are new data that must be appended —
    # keying on batch_id alone would silently drop them
    q3 = ST.stream_to_catalog(coded, cat, "turn_codes", str(root / "ckpt2"))
    assert q3.awaitTermination(180)
    snaps3 = cat.snapshots("turn_codes")
    assert len(snaps3) == 2 * len(snaps), "fresh-checkpoint query was dropped"
    assert cat.read("turn_codes").count() == 2 * len(got)


def test_streaming_text_quality_matches_batch(spark, sf_dir, tmp_path_factory):
    """The stateless curation projections (repetition filters) and the
    broadcast-join LM scorer lift to Structured Streaming UNCHANGED —
    same operator call, stream in, batch-identical rows out (B21)."""
    from lyssandra_spark.functions.lm import score_char_lm, train_char_lm
    from lyssandra_spark.functions.textstats import repetition_features

    src = str(tmp_path_factory.mktemp("txtq") / "docs")
    spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).repartition(3).write.parquet(src)  # file stream needs a DIRECTORY
    batch = spark.read.parquet(src)
    sdf = ST.read_transcript_stream(
        spark, src, batch.schema, max_files=1
    ).select("doc_id", "text")

    got_rep = _run_stream(spark, repetition_features(sdf), "rep_stream")
    exp_rep = repetition_features(batch).toPandas()
    g = got_rep.toPandas().sort_values("doc_id").reset_index(drop=True)
    e = exp_rep.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(g, e)

    # model trained on the batch table (static local DF) scores the
    # stream through the identical broadcast-join operator
    model, oov = train_char_lm(batch, n=3, top_k=2000)
    got_lm = _run_stream(spark, score_char_lm(sdf, model, oov, n=3),
                         "lm_stream")
    g2 = got_lm.toPandas().sort_values("doc_id").reset_index(drop=True)
    e2 = (
        score_char_lm(batch, model, oov, n=3)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(g2, e2)


def test_streaming_bpe_counts_match_batch(spark, sf_dir, tmp_path_factory):
    """Trained-BPE token counting is a broadcast + map-only Arrow pass,
    so it lifts to Structured Streaming UNCHANGED: merges trained on the
    batch corpus, the identical bpe_token_counts call on a stream
    produces batch-identical counts (B21 for the packing-budget path)."""
    from lyssandra_spark.functions.bpe import bpe_token_counts, train_bpe

    src = str(tmp_path_factory.mktemp("bpe_stream") / "docs")
    spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).limit(300).repartition(3).write.parquet(src)
    batch = spark.read.parquet(src)
    sdf = ST.read_transcript_stream(
        spark, src, batch.schema, max_files=1
    ).select("doc_id", "text")

    merges = train_bpe(batch, n_merges=50, max_words=5_000)
    got = (
        _run_stream(spark, bpe_token_counts(sdf, merges), "bpe_stream")
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    exp = (
        bpe_token_counts(batch, merges)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
    assert (exp.n_bpe_tokens > 0).any()


def test_streaming_postings_maintenance_matches_batch(
    spark, sf_dir, tmp_path_factory
):
    """BM25 index maintenance runs AS A STREAM: each micro-batch lands
    in the docs catalog table and folds into the postings index via
    foreachBatch (refresh_postings) — the final index equals one
    build_postings over everything, and indexed queries equal the
    full-corpus bm25_topk. Micro-batch boundaries are just another
    sharding of the append chain."""
    from lyssandra_spark.operators.search import (
        bm25_topk,
        bm25_topk_indexed,
        build_postings,
        refresh_postings,
    )
    from lyssandra_spark.sources.catalog import ParquetCatalog

    corpus = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).limit(200)
    src = str(tmp_path_factory.mktemp("post_stream") / "docs")
    corpus.repartition(3).write.parquet(src)

    cat = ParquetCatalog(spark, str(tmp_path_factory.mktemp("post_cat")))

    def fold(batch_df, batch_id):
        if batch_df.rdd.isEmpty():
            return
        cat.write(batch_df, "docs", mode="append")
        refresh_postings(cat, "docs", "postings")

    sdf = ST.read_transcript_stream(
        spark, src, corpus.schema, max_files=1
    )
    q = (
        sdf.writeStream.foreachBatch(fold)
        .option("checkpointLocation",
                str(tmp_path_factory.mktemp("post_ckpt")))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = (
        cat.read("postings").toPandas()
        .sort_values(["doc_id", "term"]).reset_index(drop=True)
    )
    want = (
        build_postings(corpus).toPandas()
        .sort_values(["doc_id", "term"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[list(want.columns)], want)

    qdf = spark.createDataFrame(
        [(1, "table scan value"), (2, "spark merge batch")],
        "qid long, qtext string",
    )
    gi = (
        bm25_topk_indexed(cat, "postings", qdf, k=5).toPandas()
        .sort_values(["qid", "rk"]).reset_index(drop=True)
    )
    gf = (
        bm25_topk(corpus, qdf, k=5).toPandas()
        .sort_values(["qid", "rk"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(gi, gf)


def test_streaming_incremental_dedup_pipeline(spark, sf_dir, tmp_path_factory):
    """The daily incremental dedup pipeline runs AS A STREAM: each
    micro-batch near-dup-indexes against the persisted signature table
    and folds its pairs into the persisted component labels via
    foreachBatch — final labels equal one batch run over everything
    (the incremental invariant holds for ANY batching, so micro-batch
    boundaries are just another sharding)."""
    from lyssandra_spark.operators.dedup import minhash_lsh_pairs
    from lyssandra_spark.operators.graph import connected_components
    from lyssandra_spark.operators.incremental import (
        dedup_new_batch,
        update_components,
    )
    from lyssandra_spark.sources.catalog import ParquetCatalog

    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).limit(240)
    twins = base.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 90000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" twin tail")).alias("text"),
    )
    corpus = base.unionByName(twins)
    src = str(tmp_path_factory.mktemp("inc_stream") / "docs")
    corpus.repartition(3).write.parquet(src)

    cat = ParquetCatalog(spark, str(tmp_path_factory.mktemp("inc_cat")))
    kw = dict(n_perm=32, bands=8, threshold=0.3, ngram_bytes=8)

    def fold(batch_df, batch_id):
        if batch_df.rdd.isEmpty():
            return
        pairs, _ = dedup_new_batch(
            cat, "sigs", batch_df, batch_id=f"mb{batch_id}", **kw
        )
        update_components(cat, "labels", pairs)

    sdf = ST.read_transcript_stream(
        spark, src, corpus.schema, max_files=1
    )
    q = (
        sdf.writeStream.foreachBatch(fold)
        .option("checkpointLocation",
                str(tmp_path_factory.mktemp("inc_ckpt")))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    want = {
        r["id"]: r["component"]
        for r in connected_components(
            minhash_lsh_pairs(corpus, **kw)
        ).collect()
    }
    got = {r["id"]: r["component"] for r in cat.read("labels").collect()}
    assert got == want and len(got) > 0
    # the signature index holds each doc exactly once across micro-batches
    assert cat.read("sigs").count() == corpus.count()
    assert cat.read("sigs").groupBy("doc_id").count().where(
        F.col("count") > 1
    ).count() == 0


def test_streaming_online_semdedup(spark, sf_dir, tmp_path_factory):
    """Online semantic dedup runs AS A STREAM: each micro-batch is
    admitted against the persisted exemplar index via foreachBatch
    (semdedup_new_batch). The kept set depends on arrival order by
    design (first wins), so the pinned invariants are the order-free
    ones: every vector decided exactly once, no two retained vectors
    of a cell are >= threshold similar (greedy maximality), every
    dropped vector points at a retained exemplar of its cell that
    really is >= threshold similar, and a planted exact twin never
    survives alongside its original."""
    from lyssandra_spark.operators.semdedup import semdedup_new_batch
    from lyssandra_spark.sources.catalog import ParquetCatalog

    thr = 0.999
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    ).limit(300)
    twins = base.where(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 90000).alias("vec_id"), "embedding"
    )
    corpus = base.unionByName(twins)
    src = str(tmp_path_factory.mktemp("sd_stream") / "vecs")
    corpus.repartition(3).write.parquet(src)

    cat = ParquetCatalog(spark, str(tmp_path_factory.mktemp("sd_cat")))

    def fold(batch_df, batch_id):
        if batch_df.rdd.isEmpty():
            return
        semdedup_new_batch(
            cat, "sd", batch_df, threshold=thr, n_clusters=8,
            sample_rows=64, batch_id=f"mb{batch_id}",
        )

    sdf = ST.read_transcript_stream(spark, src, corpus.schema, max_files=1)
    q = (
        sdf.writeStream.foreachBatch(fold)
        .option("checkpointLocation",
                str(tmp_path_factory.mktemp("sd_ckpt")))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    rows = cat.read("sd").collect()
    assert len(rows) == corpus.count()
    assert len({r["vec_id"] for r in rows}) == len(rows)

    by_cell = {}
    emb = {}
    kept = {}
    for r in rows:
        v = np.asarray(r["embedding"], dtype=float)
        n = np.linalg.norm(v)
        emb[r["vec_id"]] = v / n if n > 0 else v
        kept[r["vec_id"]] = r["keep"]
        by_cell.setdefault(r["cell"], []).append(r)
    for cell, members in by_cell.items():
        ks = [m for m in members if m["keep"]]
        for i in range(len(ks)):
            for j in range(i + 1, len(ks)):
                a, b = emb[ks[i]["vec_id"]], emb[ks[j]["vec_id"]]
                if np.linalg.norm(a) > 0 and np.linalg.norm(b) > 0:
                    assert a @ b < thr
        for m in members:
            if not m["keep"]:
                assert kept[m["dup_of"]]
                assert emb[m["vec_id"]] @ emb[m["dup_of"]] >= thr
                assert m["dup_of"] in {x["vec_id"] for x in members}

    # an exact twin never survives alongside its original
    for r in rows:
        if r["vec_id"] >= 90000:
            assert not (kept[r["vec_id"]] and kept[r["vec_id"] - 90000])
