"""Persisted ANN indexes (operators/ann_index.py): indexed results must
equal the per-call operators bit-for-bit under the same artifacts,
incremental delta assignment must equal a full rebuild when the trained
artifacts coincide, and the serving plans must never re-scan or
re-train over the corpus."""

import re

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lyssandra_spark.operators import similarity as S
from lyssandra_spark.operators.ann_index import (
    ivf_topk_indexed,
    pq_topk_indexed,
    refresh_ivf_index,
    refresh_pq_index,
)
from lyssandra_spark.sources.catalog import ParquetCatalog


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def _sorted(df):
    return (
        df.toPandas().sort_values(["qid", "rk"]).reset_index(drop=True)
    )


def test_ivf_indexed_matches_per_call(spark, emb, tmp_path):
    """ivf_topk_indexed == ivf_topk bit-for-bit: identical ordered
    sample (the full 500-row table fits under sample_rows) -> identical
    centroids -> identical cells, probes, and rankings. The serving
    plan reads the index table only — the source table never appears."""
    cat = ParquetCatalog(spark, str(tmp_path))
    cat.write(emb, "vecs", mode="overwrite")
    sid = refresh_ivf_index(cat, "vecs", "ivf")
    q = emb.where(F.col("vec_id") < 6)

    got = _sorted(ivf_topk_indexed(cat, "ivf", q, k=5, nprobe=4))
    want = _sorted(S.ivf_topk(emb, q, k=5, nprobe=4))
    pd.testing.assert_frame_equal(got, want)

    # no new source snapshot -> refresh is a no-op (same index snapshot)
    assert refresh_ivf_index(cat, "vecs", "ivf") == sid

    # catalog scans carry the snap partition column; the index scan is
    # recognizable by its cell column, the source table by label. (Path
    # substrings are unreliable: Location strings truncate at
    # spark.sql.maxMetadataStringLength.)
    plan = (
        ivf_topk_indexed(cat, "ivf", q, k=5, nprobe=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    cat_scans = [
        ln for ln in plan.splitlines() if "FileScan" in ln and "snap#" in ln
    ]
    assert len(cat_scans) == 1 and "cell#" in cat_scans[0]  # index only —
    # the source table (label column) is never re-scanned at query time
    assert not any("label#" in ln for ln in cat_scans)

    # divergent refresh spec fails loudly instead of mixing cell spaces
    with pytest.raises(ValueError, match="spec"):
        refresh_ivf_index(cat, "vecs", "ivf", n_cells=8)


def test_ivf_incremental_equals_full_rebuild(spark, emb, tmp_path):
    """Delta snapshots assigned under the FROZEN centroids == one-shot
    rebuild over the full corpus, provided both train on the same
    sample (batch 1 holds the lowest `sample_rows` ids). Also pins the
    re-ingest guard (appending old rows advances the watermark without
    duplicating index rows)."""
    b1 = emb.where(F.col("vec_id") < 250)
    b2 = emb.where(F.col("vec_id") >= 250)
    kw = dict(n_cells=8, sample_rows=64, seed=23)

    cat = ParquetCatalog(spark, str(tmp_path))
    cat.write(b1, "vecs", mode="overwrite")
    s1 = refresh_ivf_index(cat, "vecs", "ivf", **kw)
    cat.write(b2, "vecs", mode="append")
    s2 = refresh_ivf_index(cat, "vecs", "ivf", **kw)
    assert s2 > s1

    cat.write(emb, "vecs_full", mode="overwrite")
    refresh_ivf_index(cat, "vecs_full", "ivf_full", **kw)

    ci = cat.latest_meta("ivf", "centroids")["centroids"]
    cf = cat.latest_meta("ivf_full", "centroids")["centroids"]
    assert ci == cf  # same ordered sample -> identical training

    gi = (
        cat.read("ivf").select("vec_id", "cell").toPandas()
        .sort_values("vec_id").reset_index(drop=True)
    )
    gf = (
        cat.read("ivf_full").select("vec_id", "cell").toPandas()
        .sort_values("vec_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(gi, gf)

    # re-ingesting batch 1 wholesale: watermark advances, no dup rows
    n_rows = cat.read("ivf").count()
    cat.write(b1, "vecs", mode="append")
    s3 = refresh_ivf_index(cat, "vecs", "ivf", **kw)
    assert s3 > s2
    assert cat.read("ivf").count() == n_rows

    q = emb.where(F.col("vec_id") % 97 == 0)
    pd.testing.assert_frame_equal(
        _sorted(ivf_topk_indexed(cat, "ivf", q, k=5, nprobe=3)),
        _sorted(ivf_topk_indexed(cat, "ivf_full", q, k=5, nprobe=3)),
    )


def test_pq_indexed_matches_per_call(spark, emb, tmp_path):
    """pq_topk_indexed == pq_topk bit-for-bit under identical codebooks,
    and the ADC scan's parquet read prunes to (id, code) — the true
    vectors never cross that scan (the 64x-bandwidth point of PQ)."""
    cat = ParquetCatalog(spark, str(tmp_path))
    cat.write(emb, "vecs", mode="overwrite")
    sid = refresh_pq_index(cat, "vecs", "pq", m=8, n_codes=32)
    q = emb.where(F.col("vec_id") < 6)

    got = _sorted(pq_topk_indexed(cat, "pq", q, k=5, rerank=48))
    want = _sorted(S.pq_topk(emb, q, k=5, rerank=48, m=8, n_codes=32))
    pd.testing.assert_frame_equal(got, want)

    assert refresh_pq_index(cat, "vecs", "pq", m=8, n_codes=32) == sid

    plan = (
        pq_topk_indexed(cat, "pq", q, k=5, rerank=48)
        ._jdf.queryExecution().executedPlan().toString()
    )
    cat_scans = [
        ln for ln in plan.splitlines() if "FileScan" in ln and "snap#" in ln
    ]
    # both catalog scans hit the index table (code column present as a
    # read or pruned column); the raw source (label) never re-scanned
    assert cat_scans and not any("label#" in ln for ln in cat_scans)
    # the scan feeding the ADC mapInArrow reads code WITHOUT embedding —
    # the columnar prune PQ exists for
    code_scans = [
        ln for ln in plan.splitlines()
        if "ReadSchema" in ln and "code:array<int>" in ln
        and "embedding" not in ln
    ]
    assert code_scans, "no column-pruned (id, code) scan in the plan"


def test_pq_incremental_equals_full_rebuild(spark, emb, tmp_path):
    """Frozen-codebook delta quantization == one-shot rebuild when both
    train on the same ordered sample; indexed rankings coincide."""
    b1 = emb.where(F.col("vec_id") < 250)
    b2 = emb.where(F.col("vec_id") >= 250)
    kw = dict(m=8, n_codes=16, sample_rows=64, seed=29)

    cat = ParquetCatalog(spark, str(tmp_path))
    cat.write(b1, "vecs", mode="overwrite")
    refresh_pq_index(cat, "vecs", "pq", **kw)
    cat.write(b2, "vecs", mode="append")
    refresh_pq_index(cat, "vecs", "pq", **kw)

    cat.write(emb, "vecs_full", mode="overwrite")
    refresh_pq_index(cat, "vecs_full", "pq_full", **kw)

    assert (
        cat.latest_meta("pq", "codebooks")["codebooks"]
        == cat.latest_meta("pq_full", "codebooks")["codebooks"]
    )
    gi = (
        cat.read("pq").select("vec_id", "code").toPandas()
        .sort_values("vec_id").reset_index(drop=True)
    )
    gf = (
        cat.read("pq_full").select("vec_id", "code").toPandas()
        .sort_values("vec_id").reset_index(drop=True)
    )
    assert gi.vec_id.tolist() == gf.vec_id.tolist()
    assert [list(c) for c in gi.code] == [list(c) for c in gf.code]

    q = emb.where(F.col("vec_id") % 97 == 0)
    pd.testing.assert_frame_equal(
        _sorted(pq_topk_indexed(cat, "pq", q, k=5, rerank=48)),
        _sorted(pq_topk_indexed(cat, "pq_full", q, k=5, rerank=48)),
    )


def test_ann_index_rebuild_on_source_overwrite(spark, emb, tmp_path):
    """A destructive source overwrite kills the watermark chain: the
    next refresh retrains + reassigns from scratch instead of folding
    deltas onto a stale cell space."""
    cat = ParquetCatalog(spark, str(tmp_path))
    cat.write(emb, "vecs", mode="overwrite")
    refresh_ivf_index(cat, "vecs", "ivf", n_cells=8, sample_rows=64)
    c_old = cat.latest_meta("ivf", "centroids")["centroids"]

    # overwrite with a DIFFERENT row subset (shifted ids, so the first
    # sample_rows embeddings change) -> the sample differs -> retrain
    shifted = emb.where(F.col("vec_id") >= 250).withColumn(
        "vec_id", F.col("vec_id") - 250
    )
    cat.write(shifted, "vecs", mode="overwrite")
    refresh_ivf_index(cat, "vecs", "ivf", n_cells=8, sample_rows=64)
    c_new = cat.latest_meta("ivf", "centroids")["centroids"]
    assert c_new != c_old
    assert cat.read("ivf").count() == 250


def test_ivf_missing_index_raises(spark, emb, tmp_path):
    cat = ParquetCatalog(spark, str(tmp_path))
    cat.write(emb.limit(10), "t", mode="overwrite")
    with pytest.raises(ValueError, match="centroids"):
        ivf_topk_indexed(cat, "nope_" + "t", emb.limit(1))


def test_ann_index_survives_audit_compaction(spark, emb, tmp_path):
    """compact()+expire() of already-indexed source snapshots must not
    retrain or reassign: the refresh is watermark-only (append), the
    frozen centroids/codebooks survive, and a later delta still folds
    incrementally. Covers both IVF and PQ (shared chain-state path,
    separate delta-None branches)."""
    b1a = emb.where(F.col("vec_id") < 150)
    b1b = emb.where((F.col("vec_id") >= 150) & (F.col("vec_id") < 250))
    b2 = emb.where(F.col("vec_id") >= 250)
    ivf_kw = dict(n_cells=8, sample_rows=64, seed=23)
    pq_kw = dict(m=8, n_codes=16, sample_rows=64, seed=29)

    cat = ParquetCatalog(spark, str(tmp_path))
    cat.write(b1a, "vecs", mode="overwrite")
    cat.write(b1b, "vecs", mode="append")  # a real chain, so compact() rewrites
    s1 = refresh_ivf_index(cat, "vecs", "ivf", **ivf_kw)
    refresh_pq_index(cat, "vecs", "pq", **pq_kw)
    c_before = cat.latest_meta("ivf", "centroids")["centroids"]
    books_before = cat.latest_meta("pq", "codebooks")["codebooks"]

    cat.compact("vecs")
    cat.expire("vecs")
    s2 = refresh_ivf_index(cat, "vecs", "ivf", **ivf_kw)
    assert s2 > s1
    assert cat.snapshots("ivf")[-1]["mode"] == "append"  # no rebuild
    refresh_pq_index(cat, "vecs", "pq", **pq_kw)
    assert cat.snapshots("pq")[-1]["mode"] == "append"
    assert cat.read("ivf").count() == 250
    assert cat.read("pq").count() == 250

    # post-compaction delta folds under the FROZEN artifacts
    cat.write(b2, "vecs", mode="append")
    refresh_ivf_index(cat, "vecs", "ivf", **ivf_kw)
    refresh_pq_index(cat, "vecs", "pq", **pq_kw)
    assert cat.snapshots("ivf")[-1]["mode"] == "append"
    assert cat.snapshots("pq")[-1]["mode"] == "append"
    assert cat.latest_meta("ivf", "centroids")["centroids"] == c_before
    assert cat.latest_meta("pq", "codebooks")["codebooks"] == books_before
    assert cat.read("ivf").count() == 500
    assert cat.read("pq").count() == 500

    # and the index still equals a one-shot rebuild over the full corpus
    cat.write(emb, "vecs_full", mode="overwrite")
    refresh_ivf_index(cat, "vecs_full", "ivf_full", **ivf_kw)
    gi = (
        cat.read("ivf").select("vec_id", "cell").toPandas()
        .sort_values("vec_id").reset_index(drop=True)
    )
    gf = (
        cat.read("ivf_full").select("vec_id", "cell").toPandas()
        .sort_values("vec_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(gi, gf)
