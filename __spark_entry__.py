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
    ORACLE_CACHE,
    SKELETON_ORACLE_SQL,
    coded_transcripts,
    flagship,
    flagship_skeleton,
    materialize_once,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Sessionized, point-in-time Batch-OMP sparse-code features over
    synthetic transcripts: dedup -> sessionize -> embed -> as-of
    dictionary -> encode -> lag feature -> per-session aggregate.
    """
    return flagship(spark, "/root/testdata/sf0.001")


def _encode_summary(spark: SparkSession, sf_dir: str, algo: str, **kw) -> DataFrame:
    coded = coded_transcripts(spark, sf_dir, algo=algo, **kw)
    return (
        coded.groupBy("dict_version")
        .agg(
            F.count("*").alias("n_turns"),
            F.round(F.avg("nnz"), 4).alias("avg_nnz"),
            F.round(F.avg("recon_err"), 6).alias("avg_recon_err"),
            F.round(F.max("recon_err"), 6).alias("max_recon_err"),
        )
        .withColumn("algo", F.lit(algo))
        .select("algo", "dict_version", "n_turns", "avg_nnz",
                "avg_recon_err", "max_recon_err")
    )


def _encode_kernel_summaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(algo, dict_version) encode summaries for all three sparse-coding
    kernels — Batch-OMP (A2), FISTA/LASSO (A3), LLC (A4) — plus the
    two-epoch distributed K-SVD/online dictionary-learning run (A5/A6) as
    ``algo='ksvd_learn'`` legs (dict_version=epoch, n_turns=n_rows,
    avg_recon_err=rmse), all in one result. The learning legs were merged
    here in round 8 (the r7 consolidation pattern) to free a registry slot
    under the driver's 50-row cap. Rows-only (kernels aren't
    SQL-expressible); the numpy-parity gates live in
    tests/test_encode_parity.py, tests/test_kernels.py, and
    tests/test_learn_resume.py."""
    out = _encode_summary(spark, sf_dir, "bomp", k=5)
    out = out.unionByName(_encode_summary(spark, sf_dir, "fista", lam=0.1))
    out = out.unionByName(_encode_summary(spark, sf_dir, "llc", knn=5))
    learn = _dict_learn(spark, sf_dir).select(
        F.lit("ksvd_learn").alias("algo"),
        F.col("epoch").alias("dict_version"),
        F.col("n_rows").alias("n_turns"),
        F.round("avg_nnz", 4).alias("avg_nnz"),
        F.round("rmse", 6).alias("avg_recon_err"),
        F.lit(None).cast("double").alias("max_recon_err"),
    )
    return out.unionByName(learn).orderBy("algo", "dict_version")


def _leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed-dictionary temporal-leakage audit (two dictionaries).

    Each conversation is routed to one of TWO dictionary histories
    ('main' / 'aux' — different atoms AND different version boundaries),
    encoded with ``dict_id_col`` so as-of version resolution happens per
    (dict_id, ts). The audit joins back to the SCD-2 dimension on
    (dict_id, dict_version) and counts rows whose code used a version
    newer than its ts, per key. MUST return one row per dict_id with
    n_leaks = 0, and (at sf>=0.01) n_versions > 1 for both keys — i.e.
    multi-version point-in-time resolution is exercised per key, with
    zero leakage.
    """
    from lyssandra_spark.operators.encode import sparse_code
    from lyssandra_spark.sources import synth

    main = synth.build_dict_versions(sf_dir, n_atoms=128)
    # aux: different atoms (seed) AND different validity boundaries, so a
    # row routed to the wrong history is caught by version mismatch too
    aux = synth.build_dict_versions(
        sf_dir, n_atoms=128, seed=202, dict_id="aux",
        boundaries=["2023-01-01 00:00:00", "2024-01-01 02:00:00",
                    "2024-01-01 14:00:00"],
    )
    t = synth.transcripts(spark, sf_dir).withColumn(
        "dict_id",
        F.when(F.pmod(F.xxhash64("conv_id"), F.lit(2)) == 0, "main").otherwise("aux"),
    )
    coded = sparse_code(t, main + aux, algo="bomp", k=5, dict_id_col="dict_id")
    vdf = synth.dictionary_versions(spark, main + aux).select(
        "dict_id", F.col("version").alias("dict_version"), "valid_from"
    )
    joined = coded.join(F.broadcast(vdf), ["dict_id", "dict_version"], "left")
    return (
        joined.groupBy("dict_id")
        .agg(
            F.sum((F.col("valid_from") > F.col("ts")).cast("long")).alias("n_leaks"),
            F.count("*").alias("n_rows"),
            F.countDistinct("dict_version").alias("n_versions"),
        )
        .orderBy("dict_id")
    )


def _minhash_lsh_pairs_df(spark: SparkSession, sf_dir: str) -> DataFrame:
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


def _ann_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ten ANN strategies in one result (union, `variant` column):

    - 'lsh': multi-table hyperplane LSH (merged from the former
      ann_lsh_topk row — round-8 registry consolidation; the recall
      gate lives in tests/test_similarity.py);
    - 'ivf': sample-trained IVF, nprobe cell scan;
    - 'ivf_refined': one FULL-CORPUS distributed Lloyd pass
      (kmeans_refine — constant-size per-partition stats), exercising the
      distributed-training path, not just the 2048-row driver sample;
    - 'ivf_wide': n_cells=96 > MAX_EXPR_CELLS, so cell assignment and
      probe selection run through the broadcast assign_cells_arrow path
      (the production-index-width plan) instead of in-plan literals;
    - 'pq_adc': product quantization (8 subspaces x 8-bit codes) + ADC
      lookup-table scan + exact re-rank — the 64x-compressed
      representation that makes ANN feasible at 100 TB;
    - 'pq_refined': same PQ pipeline with one FULL-CORPUS distributed
      per-subspace Lloyd pass (pq_refine — constant-size stats), so
      codebook quality is not bounded by the 2048-row driver sample;
    - 'ivf_indexed' / 'pq_adc_indexed': the PERSISTED index paths
      (refresh_* trains once into a snapshot catalog — round-8 defaults:
      one full-corpus refine pass + drift metrics recorded — then the
      *_topk_indexed serve reads the index alone, never re-training or
      re-scanning the corpus; indexed == per-call is pytest-pinned in
      tests/test_ann_index.py);
    - 'pq_adc_dist' (round 9): the NO-COLLECT distributed serve plan for
      corpus-scale query tables — executor-side LUT build via
      cogroup(...).applyInArrow, block nested-loop over hashed code
      blocks; bit-identical to the collected path (pytest-pinned), the
      plan that replaced the former hard max_queries ceiling;
    - 'ivfpq_indexed' (round 9): the IVF-PQ HYBRID (Jegou 2011 IVFADC)
      — coarse cells prune each query's ADC scan to its nprobe cells
      (static cell-IN pushdown over the sort-by-cell layout) and PQ
      codes over normalized-vector RESIDUALS compress what remains;
      serve == numpy-oracle pytest-pinned, recall gated vs brute force.
    """
    import shutil

    from lyssandra_spark.operators.ann_index import (
        ivf_topk_indexed, ivfpq_topk_indexed, pq_topk_indexed,
        refresh_ivf_index, refresh_ivfpq_index, refresh_pq_index,
    )
    from lyssandra_spark.operators.similarity import (
        cosine_topk_lsh, ivf_topk, pq_topk,
    )
    from lyssandra_spark.sources.catalog import ParquetCatalog

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.where(F.col("vec_id") < 10)
    lsh = cosine_topk_lsh(e, q, k=5, n_planes=4, n_tables=12).withColumn(
        "variant", F.lit("lsh")
    )
    base = ivf_topk(e, q, k=5, n_cells=8, nprobe=4).withColumn(
        "variant", F.lit("ivf")
    )
    ref = ivf_topk(e, q, k=5, n_cells=8, nprobe=4, refine_iters=1).withColumn(
        "variant", F.lit("ivf_refined")
    )
    wide = ivf_topk(e, q, k=5, n_cells=96, nprobe=24).withColumn(
        "variant", F.lit("ivf_wide")
    )
    pq = pq_topk(e, q, k=5).withColumn("variant", F.lit("pq_adc"))
    pqr = pq_topk(e, q, k=5, refine_iters=1).withColumn(
        "variant", F.lit("pq_refined")
    )
    # persisted-index legs: fresh single-snapshot warehouse per run (a
    # derived cache, not history — the probe_wh convention)
    wh = os.path.join(ORACLE_CACHE, "ann_wh")
    shutil.rmtree(wh, ignore_errors=True)
    cat = ParquetCatalog(spark, wh)
    cat.write(e, "vecs", mode="overwrite")
    refresh_ivf_index(cat, "vecs", "ivf_idx", n_cells=8)
    refresh_pq_index(cat, "vecs", "pq_idx", m=8, n_codes=32)
    ivf_idx = ivf_topk_indexed(cat, "ivf_idx", q, k=5, nprobe=4).withColumn(
        "variant", F.lit("ivf_indexed")
    )
    pq_idx = pq_topk_indexed(cat, "pq_idx", q, k=5).withColumn(
        "variant", F.lit("pq_adc_indexed")
    )
    pq_dist = pq_topk_indexed(
        cat, "pq_idx", q, k=5, distributed=True, corpus_blocks=4
    ).withColumn("variant", F.lit("pq_adc_dist"))
    refresh_ivfpq_index(cat, "vecs", "ivfpq_idx", n_cells=8, m=8,
                        n_codes=32)
    ivfpq = ivfpq_topk_indexed(
        cat, "ivfpq_idx", q, k=5, nprobe=4
    ).withColumn("variant", F.lit("ivfpq_indexed"))
    return (
        lsh.unionByName(base).unionByName(ref).unionByName(wide)
        .unionByName(pq).unionByName(pqr).unionByName(ivf_idx)
        .unionByName(pq_idx).unionByName(pq_dist).unionByName(ivfpq)
    )


def _semdedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas 2023) semantic dedup over embeddings + planted
    scaled copies (cosine(v, 2v) = 1, so every plant lands in a
    duplicate group). Rows-only: the trained clustering (hash-sample +
    Lloyd) isn't DuckDB-expressible; the EXACT-parity gate vs an
    independent numpy union-find oracle lives in tests/test_semdedup.py.
    Output is deterministic across partitionings by operator contract
    (id-sorted sub-clustering, id tie-breaks)."""
    from lyssandra_spark.operators.semdedup import semdedup

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    planted = (
        e.where(F.col("vec_id") % 10 == 0)
        .withColumn("vec_id", F.col("vec_id") + 1000000)
        .withColumn("embedding", F.transform("embedding", lambda x: x * 2.0))
    )
    out = semdedup(e.unionByName(planted), n_clusters=16, threshold=0.95)
    return out.select(
        "vec_id", "cell", "sd_group",
        F.round("centroid_sim", 6).alias("centroid_sim"), "keep",
    ).orderBy("vec_id")


def _dsir_fit_score_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie 2023) end-to-end: fit target + raw hashed-n-gram
    models (one m-bounded shuffle each), score every document with the
    map-only log-ratio fold, Gumbel-top-k resample (softmax without
    replacement, deterministic hash noise). Output = the selected docs
    with their rounded log-weights. Rows-only: xxhash64 n-gram
    bucketing isn't DuckDB-expressible; the numpy-oracle parity and
    property gates live in tests/test_dsir.py."""
    from lyssandra_spark.operators.dsir import (
        dsir_logweights,
        dsir_resample,
        fit_hashed_ngram_model,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    target = d.where(F.col("doc_id") % 7 == 0)  # the curated domain
    lt = fit_hashed_ngram_model(target, m=2048)
    lr = fit_hashed_ngram_model(d, m=2048)
    picked = dsir_resample(dsir_logweights(d, lt, lr), k=60)
    return picked.select(
        "doc_id", F.round("dsir_logw", 6).alias("dsir_logw")
    ).orderBy("doc_id")


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


POOL_PATH = os.path.join(ORACLE_CACHE, "session_codes")

# Max-pooling of per-turn sparse codes is pure SQL once the CSR arrays are
# data: zip-unnest (code_idx, code_val), per-atom max within the session,
# turn counts from the un-exploded table (empty-code turns still count).
# Atoms absent from a session emit no row (sparse-max semantics — see
# pool_codes docstring); the Spark side filters its densified zeros to
# mirror that. Exact compare is safe: max() moves input doubles, it never
# does arithmetic on them, and both engines read the identical parquet.
POOL_ORACLE_SQL = f"""
    WITH t AS (SELECT * FROM read_parquet('{POOL_PATH}/*.parquet')),
    counts AS (SELECT conv_id, session_id, count(*) AS n_pooled
               FROM t GROUP BY conv_id, session_id),
    pairs AS (SELECT conv_id, session_id,
                     UNNEST(code_idx) AS atom, UNNEST(code_val) AS v FROM t),
    atom AS (SELECT conv_id, session_id, atom, max(v) AS pooled_val
             FROM pairs GROUP BY conv_id, session_id, atom)
    SELECT a.conv_id, a.session_id, a.atom, a.pooled_val, c.n_pooled
    FROM atom a JOIN counts c USING (conv_id, session_id)
"""


def _pooled_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared input for the pooling + probe queries: the flagship's coded
    sessions materialized once per fingerprint (so DuckDB reads identical
    CSR bytes), max-pooled to one length-128 vector per session by the
    real pool_codes operator."""
    from lyssandra_spark.operators.pooling import pool_codes

    materialize_once(
        lambda: coded_transcripts(spark, sf_dir, algo="bomp", k=5).select(
            "conv_id", "session_id", "code_idx", "code_val"
        ),
        POOL_PATH, f"pool-v1|{sf_dir}",
    )
    src = spark.read.parquet(POOL_PATH)
    return pool_codes(src, n_atoms=128, part=("conv_id", "session_id"))


def _session_code_pooling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session max-pooling of sparse codes (A9 analogue), hash-checked.

    The Spark side runs the real pool_codes operator (dense length-128
    output) and re-sparsifies via posexplode + a semi-join against the
    group's CSR support set — the EXACT atom set the oracle's zip-unnest
    emits. (A `pooled_val != 0.0` filter would be equivalent only while
    the encoder never stores an exact-zero coefficient; FISTA
    soft-thresholding could, so the support semi-join mirrors the oracle
    by construction instead of by assumption.)
    """
    pooled = _pooled_sessions(spark, sf_dir)
    support = (
        spark.read.parquet(POOL_PATH)
        .select("conv_id", "session_id",
                F.explode("code_idx").alias("atom"))
        .distinct()
    )
    return pooled.select(
        "conv_id", "session_id",
        F.posexplode("pooled").alias("atom", "pooled_val"),
        "n_pooled",
    ).join(support, ["conv_id", "session_id", "atom"], "left_semi")


def _ridge_probe_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed closed-form ridge probe on pooled session codes (the
    A9 classify analogue), planted-separable: labels come from a seeded
    linear rule on the pooled features (threshold = the EXACT median
    score, so labels are reproducible across partitionings), so the probe
    must recover high training accuracy. One output row
    (n_groups, dim, train_acc); the XtX/Xty sufficient statistics and the
    accuracy pass are both distributed (constant driver memory)."""
    import shutil

    import numpy as np

    from lyssandra_spark.operators.pooling import ridge_probe
    from lyssandra_spark.sources.catalog import ParquetCatalog

    pooled = _pooled_sessions(spark, sf_dir)
    # route the feature table through the snapshot catalog (B17+B18 inside
    # a driver row): fresh single-snapshot warehouse each run (the input is
    # a derived cache, not history worth keeping — rmtree bounds the disk),
    # probe runs on the read-back
    wh = os.path.join(ORACLE_CACHE, "probe_wh")
    shutil.rmtree(wh, ignore_errors=True)
    cat = ParquetCatalog(spark, wh)
    cat.write(pooled, "pooled_sessions", mode="overwrite")
    pooled = cat.read("pooled_sessions")
    wstar = np.random.default_rng(31).standard_normal(128)
    score = F.aggregate(
        F.zip_with(F.col("pooled"), F.array(*[F.lit(float(v)) for v in wstar]),
                   lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    scored = pooled.withColumn("score", score).cache()
    # exact median (not approxQuantile): the threshold — hence the labels
    # and the reported accuracy — must not depend on partition layout
    thr = scored.agg(F.expr("percentile(score, 0.5)")).collect()[0][0]
    labeled = scored.withColumn(
        "label", F.when(F.col("score") >= thr, 1.0).otherwise(-1.0)
    )
    w, acc = ridge_probe(labeled, dim=128, lam=1e-4)
    n = labeled.count()
    scored.unpersist()
    return spark.createDataFrame(
        [(n, 128, round(acc, 4))], "n_groups long, dim int, train_acc double"
    )


MINHASH_PAIRS_PATH = os.path.join(ORACLE_CACHE, "minhash_pairs")

# Connected components are SQL-expressible as a recursive closure: the
# DuckDB CTE computes every (vertex, reachable vertex) pair and takes the
# min — fine at oracle scale (139 edges), while the Spark side runs the
# distributed O(diameter)-round min-label propagation that works at
# 10^12 edges. Both read the identical Spark-materialized pair parquet.
MINHASH_CLUSTERS_ORACLE_SQL = f"""
    WITH RECURSIVE p AS (
      SELECT * FROM read_parquet('{MINHASH_PAIRS_PATH}/*.parquet')),
    e AS (SELECT id_a AS u, id_b AS v FROM p
          UNION ALL SELECT id_b, id_a FROM p),
    reach(id, r) AS (
      SELECT u, u FROM e
      UNION
      SELECT reach.id, e.v FROM reach JOIN e ON e.u = reach.r),
    comp AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
    SELECT c.id AS doc_id, c.cluster_id,
           count(*) OVER (PARTITION BY c.cluster_id) AS n_members
    FROM comp c
"""


def _minhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup DEDUP CLUSTERS, hash-checked: the full
    shingle -> minhash -> band -> bucket-join pair pipeline runs inside
    (pairs materialized once per fingerprint), then distributed
    connected components turn pairs into per-doc cluster labels (the
    canonical-representative decision every dedup retention policy
    needs). Oracle = DuckDB recursive-CTE reachability over the same
    pair parquet."""
    from pyspark.sql import Window

    from lyssandra_spark.operators.graph import connected_components

    materialize_once(
        lambda: _minhash_lsh_pairs_df(spark, sf_dir).select("id_a", "id_b"),
        MINHASH_PAIRS_PATH, f"mhpairs-v1|{sf_dir}",
    )
    e = spark.read.parquet(MINHASH_PAIRS_PATH)
    cc = connected_components(e)
    w = Window.partitionBy("cluster_id")
    return (
        cc.select(F.col("id").alias("doc_id"),
                  F.col("component").alias("cluster_id"))
        .withColumn("n_members", F.count("*").over(w))
    )


SIMHASH_PATH = os.path.join(ORACLE_CACHE, "doc_simhashes")

# Pigeonhole banding has exact recall at hamming <= max_hamming, so the
# brute-force all-pairs filter IS the oracle (600 rows -> 180k pairs at
# sf0.01 — trivial for DuckDB; the Spark side never builds that product).
# xor/bit_count are two's-complement bitwise in both engines; DuckDB's
# bit_count returns TINYINT while Spark's returns INT, hence the CAST
# (same reason SKELETON_ORACLE_SQL casts session_id).
SIMHASH_ORACLE_SQL = f"""
    WITH s AS (SELECT * FROM read_parquet('{SIMHASH_PATH}/*.parquet'))
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def _simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming <= 3) via pigeonhole banding,
    hash-checked against a DuckDB brute-force oracle over Spark-
    materialized simhashes (exact copies planted so pairs exist at
    hamming 0; light edits plant low-nonzero-hamming pairs)."""
    from lyssandra_spark.operators.dedup import simhash, simhash_pairs_from_hashes

    def build():
        d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        exact = d.where(F.col("doc_id") % 7 == 0).withColumn(
            "doc_id", F.col("doc_id") + 1000000
        )
        tweaked = (
            d.where(F.col("doc_id") % 11 == 0)
            .withColumn("doc_id", F.col("doc_id") + 2000000)
            .withColumn("text", F.concat(F.col("text"), F.lit(" addendum")))
        )
        return simhash(d.unionByName(exact).unionByName(tweaked))

    materialize_once(build, SIMHASH_PATH, f"simhash-v1|{sf_dir}")
    sh = spark.read.parquet(SIMHASH_PATH)
    return simhash_pairs_from_hashes(sh, max_hamming=3)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Exactly 50 entries (the driver records at most 50 CORRECTNESS rows —
    r01 silently dropped registrations 51-53). The engine-defining ops
    (kernels, flagship, leakage, LLM-pipeline ops) are registered FIRST so
    any cap hits the relational long tail, never them.
    """
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    # kernel-backed (rows-only; numpy parity gate lives in tests/).
    # All three encode kernels share ONE summary row (algo column) so the
    # 50-slot cap leaves room for the oracled pipeline ops below.
    out["encode_kernel_summaries"] = _encode_kernel_summaries  # + ksvd_learn legs (r8)
    out["flagship_session_features"] = lambda spark, sf_dir: flagship(spark, sf_dir)
    out["flagship_skeleton"] = lambda spark, sf_dir: flagship_skeleton(spark, sf_dir)
    out["leakage_audit"] = _leakage_audit
    # training-data-pipeline ops (quality gates live in tests/; the simhash
    # operator's driver coverage is the ORACLED simhash_neardup_pairs row,
    # which materializes and verifies the same signatures end-to-end).
    # Round-8 consolidation: ann_lsh_topk merged into ann_topk_variants
    # (variant='lsh') and dictionary_learning into encode_kernel_summaries
    # (algo='ksvd_learn'), funding the semdedup + dsir rows below.
    out["dedup_minhash_clusters"] = _minhash_clusters
    out["simhash_neardup_pairs"] = _simhash_pairs
    out["embedding_neardup_pairs"] = _embedding_neardup
    out["ann_topk_variants"] = _ann_variants  # lsh / ivf / ivf_refined / ivf_wide / pq_adc / pq_refined / ivf_indexed / pq_adc_indexed / pq_adc_dist / ivfpq_indexed
    out["semdedup_embeddings"] = _semdedup_embeddings
    out["dsir_fit_score_sample"] = _dsir_fit_score_sample
    out["multimodal_decode"] = _multimodal
    out["session_code_pooling"] = _session_code_pooling
    out["ridge_probe_accuracy"] = _ridge_probe_accuracy
    # relational / window / text / similarity registry (mostly oracled)
    out.update(Q.SPARK_QUERIES)
    assert len(out) <= 50, f"{len(out)} queries registered; driver caps at 50"
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    out = dict(Q.ORACLE_SQL)
    out["flagship_skeleton"] = SKELETON_ORACLE_SQL
    out["session_code_pooling"] = POOL_ORACLE_SQL
    out["simhash_neardup_pairs"] = SIMHASH_ORACLE_SQL
    out["dedup_minhash_clusters"] = MINHASH_CLUSTERS_ORACLE_SQL
    return out
