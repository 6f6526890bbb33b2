"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Engine: ``lyssandra_spark`` (see SURVEY.md). Relational / text /
similarity operators carry DuckDB oracles; the sparse-coding kernel
operators (Batch-OMP / FISTA / LLC point-in-time encode — not
SQL-expressible) are rows-only here and carry a numpy-oracle parity
gate in tests/ instead (pytest -x -q).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from lyssandra_spark.plans import queries as Q  # noqa: E402
from lyssandra_spark.plans.pipeline import (  # noqa: E402
    SKELETON_ORACLE_SQL,
    coded_transcripts,
    flagship,
    flagship_skeleton,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Sessionized, point-in-time Batch-OMP sparse-code features over
    synthetic transcripts: dedup -> sessionize -> embed -> as-of
    dictionary -> encode -> lag feature -> per-session aggregate.
    """
    return flagship(spark, "/root/testdata/sf0.001")


def _encode_summary(algo: str, **kw):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        coded = coded_transcripts(spark, sf_dir, algo=algo, **kw)
        return (
            coded.groupBy("dict_version")
            .agg(
                F.count("*").alias("n_turns"),
                F.round(F.avg("nnz"), 4).alias("avg_nnz"),
                F.round(F.avg("recon_err"), 6).alias("avg_recon_err"),
                F.round(F.max("recon_err"), 6).alias("max_recon_err"),
            )
            .orderBy("dict_version")
        )

    return run


def _leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join audit: rows whose code used a version newer than ts.

    MUST return exactly one row with n_leaks = 0 (zero temporal leakage).
    """
    from lyssandra_spark.sources import synth

    coded = coded_transcripts(spark, sf_dir, algo="bomp", k=5)
    vdf = synth.dictionary_versions(
        spark, synth.build_dict_versions(sf_dir, n_atoms=128)
    ).select(F.col("version").alias("dict_version"), "valid_from")
    joined = coded.join(F.broadcast(vdf), "dict_version", "left")
    return joined.select(
        F.sum((F.col("valid_from") > F.col("ts")).cast("long")).alias("n_leaks"),
        F.count("*").alias("n_rows"),
    )


def _minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs over documents + planted near-dups."""
    from lyssandra_spark.operators.dedup import minhash_lsh_pairs

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    near = (
        d.where(F.col("doc_id") % 5 == 0)
        .withColumn("doc_id", F.col("doc_id") + 1000000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" tail tweak")))
    )
    return minhash_lsh_pairs(
        d.unionByName(near), n_perm=64, bands=16, threshold=0.4
    ).orderBy("id_a", "id_b")


def _simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lyssandra_spark.operators.dedup import simhash

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    return simhash(d)


def _ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH ANN top-k (approximate; rows-only — recall gate lives in tests)."""
    from lyssandra_spark.operators.similarity import cosine_topk_lsh

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return cosine_topk_lsh(e, e.where(F.col("vec_id") < 10), k=5,
                           n_planes=4, n_tables=12)


def _ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lyssandra_spark.operators.similarity import ivf_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ivf_topk(e, e.where(F.col("vec_id") < 10), k=5, n_cells=8, nprobe=4)


def _dict_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-epoch distributed dictionary learning; per-epoch metrics."""
    import tempfile

    from lyssandra_spark.operators.learn import DictLearner
    from lyssandra_spark.sources import synth

    t = synth.transcripts(spark, sf_dir).orderBy("conv_id", "turn_idx").limit(2000)
    with tempfile.TemporaryDirectory() as d:
        _, hist = DictLearner(n_atoms=64, k=5, n_epochs=2).fit(t, d)
    return spark.createDataFrame(
        [(h["epoch"], h["rmse"], h["n_rows"], h["avg_nnz"]) for h in hist],
        "epoch int, rmse double, n_rows long, avg_nnz double",
    )


def _multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL multimodal decode: BMP images, WAV audio, and BMV1 video
    synthesized as honest container bytes, decoded with pure-numpy header
    parsing (BGR->gray + nearest resize; PCM16 + FFT band energies;
    every-4th-frame sampling). One row per (modality, media_id[, frame])
    with the leading feature value."""
    from lyssandra_spark.functions.multimodal import (
        attach_bmp_media, attach_video_media, attach_wav_media,
        decode_audio_features, decode_image_features, sample_video_frames,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    img = decode_image_features(attach_bmp_media(d)).select(
        F.lit("image").alias("modality"), "media_id",
        F.lit(0).cast("int").alias("item_idx"),
        F.round("mean_pixel", 4).alias("stat"),
        F.round(F.element_at("feature", 1), 6).alias("feat0"),
    )
    aud = decode_audio_features(attach_wav_media(d)).select(
        F.lit("audio").alias("modality"), "media_id",
        F.lit(0).cast("int").alias("item_idx"),
        F.round("rms", 4).alias("stat"),
        F.round(F.element_at("band_energy", 1), 6).alias("feat0"),
    )
    vid = sample_video_frames(
        attach_video_media(d.where(F.col("doc_id") % 5 == 0)), every_nth=4
    ).select(
        F.lit("video").alias("modality"),
        "media_id",
        F.col("frame_idx").alias("item_idx"),
        F.round("mean_pixel", 4).alias("stat"),
        F.round(F.element_at("feature", 1), 6).alias("feat0"),
    )
    return img.unionByName(aud).unionByName(vid)


def _embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding cosine near-dup pairs with planted scaled copies
    (cosine(v, 1.5v) = 1, so every planted pair must surface; the recall
    gate lives in tests/test_dedup.py)."""
    from lyssandra_spark.operators.dedup import embedding_neardup_pairs

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    planted = (
        e.where(F.col("vec_id") % 10 == 0)
        .withColumn("vec_id", F.col("vec_id") + 1000000)
        .withColumn("embedding", F.transform("embedding", lambda x: x * 1.5))
    )
    return embedding_neardup_pairs(
        e.unionByName(planted), n_planes=12, min_cosine=0.95
    ).orderBy("id_a", "id_b")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Exactly 50 entries (the driver records at most 50 CORRECTNESS rows —
    r01 silently dropped registrations 51-53). The engine-defining ops
    (kernels, flagship, leakage, LLM-pipeline ops) are registered FIRST so
    any cap hits the relational long tail, never them.
    """
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    # kernel-backed (rows-only; numpy parity gate lives in tests/)
    out["encode_batch_omp"] = _encode_summary("bomp", k=5)
    out["encode_fista_lasso"] = _encode_summary("fista", lam=0.1)
    out["encode_llc"] = _encode_summary("llc", knn=5)
    out["flagship_session_features"] = lambda spark, sf_dir: flagship(spark, sf_dir)
    out["flagship_skeleton"] = lambda spark, sf_dir: flagship_skeleton(spark, sf_dir)
    out["leakage_audit"] = _leakage_audit
    out["dictionary_learning"] = _dict_learn
    # training-data-pipeline ops (rows-only; quality gates live in tests/)
    out["dedup_minhash_lsh"] = _minhash_lsh
    out["simhash_documents"] = _simhash_docs
    out["embedding_neardup_pairs"] = _embedding_neardup
    out["ann_lsh_topk"] = _ann_lsh
    out["ann_ivf_topk"] = _ann_ivf
    out["multimodal_decode"] = _multimodal
    # relational / window / text / similarity registry (mostly oracled)
    out.update(Q.SPARK_QUERIES)
    assert len(out) <= 50, f"{len(out)} queries registered; driver caps at 50"
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    out = dict(Q.ORACLE_SQL)
    out["flagship_skeleton"] = SKELETON_ORACLE_SQL
    return out
