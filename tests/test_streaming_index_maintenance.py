"""Structured-Streaming parity for the round-7 stateful generators:
each incremental index (SimHash, embedding-LSH, online SemDeDup, the
persisted IVF index) is maintained from a ``foreachBatch`` sink — the
same composition as test_streaming_postings_maintenance_matches_batch —
and the stream-fed index must equal the batch-operator result.

For the PAIR generators the invariant is exact and order-free (the
union of per-micro-batch pairs == one full-corpus recompute, each pair
emitted once). For the ORDER-DEPENDENT online SemDeDup the stream's
arrival order is recovered from the snapshot chain itself and checked
against the independent greedy oracle in that order. For the IVF index
the frozen-artifact contract is checked directly: every corpus row
present exactly once, every assignment equal to tag_cell under the
frozen manifest centroids."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lyssandra_spark.operators import dedup as DD
from lyssandra_spark.sources.catalog import ParquetCatalog
from lyssandra_spark.streaming import stream as ST


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).limit(240)
    exact = base.where(F.col("doc_id") % 7 == 0).withColumn(
        "doc_id", F.col("doc_id") + 70000
    )
    return base.unionByName(exact).cache()


@pytest.fixture(scope="module")
def vecs(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(300)
    dup = e.where(F.col("vec_id") % 9 == 0).withColumn(
        "vec_id", F.col("vec_id") + 5000
    )
    return e.unionByName(dup).cache()


def _stream_fold(spark, corpus, tmp, fold):
    """Land ``corpus`` as parquet files and drain them through a
    one-file-per-micro-batch foreachBatch sink running ``fold``."""
    src = str(tmp / "src")
    corpus.repartition(3).write.parquet(src)

    def safe_fold(batch_df, batch_id):
        if batch_df.rdd.isEmpty():
            return
        fold(batch_df, batch_id)

    sdf = ST.read_transcript_stream(spark, src, corpus.schema, max_files=1)
    q = (
        sdf.writeStream.foreachBatch(safe_fold)
        .option("checkpointLocation", str(tmp / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_streaming_simhash_maintenance_matches_batch(
    spark, docs, tmp_path_factory
):
    """simhash_new_batch under foreachBatch: per-micro-batch pairs land
    in a catalog table; their union == one simhash_neardup_pairs over
    everything (exact — the pigeonhole argument is per-pair, so
    micro-batch boundaries are just another sharding), and the index
    holds one 8-byte hash per doc."""
    from lyssandra_spark.operators.incremental import simhash_new_batch

    tmp = tmp_path_factory.mktemp("sh_stream")
    cat = ParquetCatalog(spark, str(tmp / "wh"))
    kw = dict(max_hamming=3, ngram_bytes=8)

    def fold(batch_df, batch_id):
        pairs, _ = simhash_new_batch(
            cat, "sh_index", batch_df, batch_id=f"mb{batch_id}", **kw
        )
        cat.write(pairs, "sh_pairs", mode="append")

    _stream_fold(spark, docs, tmp, fold)

    got = cat.read("sh_pairs").toPandas()
    full = DD.simhash_neardup_pairs(docs, **kw).toPandas()
    key = lambda df: set(zip(df.id_a, df.id_b, df.hamming))  # noqa: E731
    assert key(got) == key(full) and len(full) > 0
    assert not got.duplicated(["id_a", "id_b"]).any()
    assert cat.read("sh_index").count() == docs.count()


def test_streaming_emblsh_maintenance_matches_batch(
    spark, vecs, tmp_path_factory
):
    """embneardup_new_batch under foreachBatch == one
    embedding_neardup_pairs recompute (bit-identical stacked plane
    draw), pairs unique across micro-batches."""
    from lyssandra_spark.operators.incremental import embneardup_new_batch

    tmp = tmp_path_factory.mktemp("el_stream")
    cat = ParquetCatalog(spark, str(tmp / "wh"))
    kw = dict(dim=64, n_planes=12, min_cosine=0.9, seed=11, n_tables=4)

    def fold(batch_df, batch_id):
        pairs, _ = embneardup_new_batch(
            cat, "el_index", batch_df, batch_id=f"mb{batch_id}", **kw
        )
        cat.write(pairs, "el_pairs", mode="append")

    _stream_fold(spark, vecs, tmp, fold)

    got = cat.read("el_pairs").toPandas()
    full = DD.embedding_neardup_pairs(vecs, **kw).toPandas()
    key = lambda df: set(zip(df.id_a, df.id_b, df.cosine.round(9)))  # noqa: E731
    assert key(got) == key(full) and len(full) > 0
    assert not got.duplicated(["id_a", "id_b"]).any()
    assert cat.read("el_index").count() == vecs.count()


def test_streaming_semdedup_admission_matches_greedy_oracle(
    spark, vecs, tmp_path_factory
):
    """semdedup_new_batch under foreachBatch: the stream-fed exemplar
    index equals the independent greedy oracle REPLAYED IN THE STREAM'S
    OWN ARRIVAL ORDER (recovered from the snapshot chain — each
    snapshot is one micro-batch, ids processed id-sorted within it; the
    online contract is order-dependent by design, so the oracle must
    consume the same order), and the mutual-exemplar invariant holds:
    no two kept rows in one cell are >= threshold similar."""
    from lyssandra_spark.operators.semdedup import semdedup_new_batch

    thr = 0.97
    C = np.asarray(
        [r["embedding"] for r in
         vecs.orderBy(F.xxhash64("vec_id"), "vec_id").limit(8).collect()],
        dtype=np.float64,
    )
    tmp = tmp_path_factory.mktemp("sd_stream")
    cat = ParquetCatalog(spark, str(tmp / "wh"))

    def fold(batch_df, batch_id):
        semdedup_new_batch(
            cat, "sd", batch_df, threshold=thr, batch_id=f"mb{batch_id}",
            centroids=C if not cat.snapshots("sd") else None,
        )

    _stream_fold(spark, vecs, tmp, fold)

    full = cat.read("sd").toPandas()
    assert len(full) == vecs.count()
    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in vecs.collect()
    }

    # greedy oracle in the stream's own arrival order
    arrived = []
    for s in cat.snapshots("sd"):
        ids = sorted(
            r["vec_id"]
            for r in cat.read_snapshot("sd", s["id"]).select("vec_id")
            .collect()
        )
        arrived += ids
    kept: dict[int, list] = {}
    want = {}
    for rid in arrived:
        x = emb[rid]
        cell = int(((x[None, :] - C) ** 2).sum(1).argmin())
        nx = np.linalg.norm(x)
        keep, dup_of = True, None
        exem = kept.setdefault(cell, [])
        if nx > 0 and exem:
            sims = np.stack([u for _, u in exem]) @ (x / nx)
            j = int(sims.argmax())
            if sims[j] >= thr:
                keep, dup_of = False, exem[j][0]
        if keep and nx > 0:
            exem.append((rid, x / nx))
        want[rid] = (keep, dup_of)
    got = {
        r.vec_id: (bool(r.keep), None if pd.isna(r.dup_of) else int(r.dup_of))
        for r in full.itertuples()
    }
    assert got == want
    assert sum(1 for k, _ in want.values() if not k) > 0  # dups exist

    # mutual-exemplar invariant (order-free): kept rows of one cell are
    # pairwise below threshold
    for cell, exem in kept.items():
        if len(exem) < 2:
            continue
        U = np.stack([u for _, u in exem])
        G = U @ U.T
        np.fill_diagonal(G, 0.0)
        assert G.max() < thr, f"cell {cell}"


def test_streaming_ivf_index_maintenance(spark, vecs, tmp_path_factory):
    """refresh_ivf_index under foreachBatch (write the micro-batch to
    the source table, fold the index): the final index holds every
    corpus row exactly once, every row's cell equals tag_cell under the
    FROZEN manifest centroids (delta assignment correct no matter how
    the stream sharded the corpus), and indexed queries serve from the
    index alone."""
    from lyssandra_spark.operators.ann_index import (
        ivf_topk_indexed,
        refresh_ivf_index,
    )
    from lyssandra_spark.operators.similarity import tag_cell

    tmp = tmp_path_factory.mktemp("ivf_stream")
    cat = ParquetCatalog(spark, str(tmp / "wh"))
    kw = dict(n_cells=8, sample_rows=64, seed=23)

    def fold(batch_df, batch_id):
        cat.write(batch_df, "vecs", mode="append")
        refresh_ivf_index(cat, "vecs", "ivf", **kw)

    _stream_fold(spark, vecs, tmp, fold)

    idx = cat.read("ivf").select("vec_id", "cell").toPandas()
    assert len(idx) == vecs.count()
    assert idx.vec_id.is_unique

    C = np.asarray(
        cat.latest_meta("ivf", "centroids")["centroids"], dtype=np.float64
    )
    want = tag_cell(
        vecs.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        ),
        C, "emb",
    ).select("vec_id", "cell").toPandas()
    pd.testing.assert_frame_equal(
        idx.sort_values("vec_id").reset_index(drop=True),
        want.sort_values("vec_id").reset_index(drop=True),
    )

    # drift metrics accumulated per micro-batch; the baseline is the
    # bootstrap batch's and a same-distribution stream never drifts
    from lyssandra_spark.operators.ann_index import needs_retrain

    assert needs_retrain(cat, "ivf", threshold=3.0) is False

    q = vecs.where(F.col("vec_id") < 5)
    got = ivf_topk_indexed(cat, "ivf", q, k=3, nprobe=4).toPandas()
    assert (got.groupby("qid").size() == 3).all()


def test_streaming_drift_triggered_rebuild(spark, vecs, tmp_path_factory):
    """Round-9: the full maintain -> detect -> retrain loop under real
    micro-batches. The stream's later files carry a deliberately
    DRIFTED distribution (scaled + offset embeddings the bootstrap
    centroids never saw); the foreachBatch body folds each micro-batch
    with auto_retrain, so the index must REBUILD mid-stream. Pinned:
    (a) at least one auto rebuild beyond the bootstrap actually fired;
    (b) the final index holds every row exactly once with every cell ==
    tag_cell under the FINAL manifest centroids (rebuild reassigned
    history; post-rebuild deltas froze the same centroids); (c) the
    stream-fed chain is bit-identical to replaying the SAME micro-batch
    sequence through plain batch calls — streaming adds no
    nondeterminism (refine_iters=0, the bit-exact contract)."""
    import os
    import time

    from lyssandra_spark.operators.ann_index import (
        ivf_topk_indexed,
        refresh_ivf_index,
    )
    from lyssandra_spark.operators.similarity import tag_cell

    tmp = tmp_path_factory.mktemp("ivf_drift_stream")
    src = str(tmp / "src")
    normal = vecs.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    drifted = normal.select(
        (F.col("vec_id") + 100_000).alias("vec_id"),
        F.transform(
            "embedding", lambda v: v * F.lit(25.0) + F.lit(40.0)
        ).alias("embedding"),
    )
    normal.repartition(3).write.parquet(src)
    before = set(os.listdir(src))
    drifted.repartition(2).write.mode("append").parquet(src)
    # the file source drains oldest-first: pin the drifted files firmly
    # AFTER the normal ones (append already wrote them later; the bump
    # makes it robust to coarse timestamps)
    now = time.time()
    for name in set(os.listdir(src)) - before:
        if name.endswith(".parquet"):
            os.utime(os.path.join(src, name), (now + 3600, now + 3600))

    kw = dict(n_cells=8, sample_rows=64, seed=23, refine_iters=0,
              auto_retrain=4.0)
    cat = ParquetCatalog(spark, str(tmp / "wh"))

    def fold(batch_df, batch_id):
        if batch_df.rdd.isEmpty():
            return
        cat.write(batch_df, "vecs", mode="append")
        refresh_ivf_index(cat, "vecs", "ivf", **kw)

    sdf = ST.read_transcript_stream(spark, src, normal.schema, max_files=1)
    q = (
        sdf.writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    # (a) the drifted micro-batch forced a rebuild beyond the bootstrap
    overwrites = [
        s for s in cat.snapshots("ivf") if s["mode"] == "overwrite"
    ]
    assert len(overwrites) >= 2, "auto_retrain never fired in-stream"

    # (b) complete, unique, and consistent under the FINAL centroids
    corpus = normal.unionByName(drifted)
    idx = cat.read("ivf").select("vec_id", "cell").toPandas()
    assert len(idx) == corpus.count()
    assert idx.vec_id.is_unique
    C = np.asarray(
        cat.latest_meta("ivf", "centroids")["centroids"], dtype=np.float64
    )
    want = tag_cell(
        corpus.withColumnRenamed("embedding", "emb"), C, "emb"
    ).select("vec_id", "cell").toPandas()
    pd.testing.assert_frame_equal(
        idx.sort_values("vec_id").reset_index(drop=True),
        want.sort_values("vec_id").reset_index(drop=True),
    )

    # (c) replay the recovered micro-batch sequence through plain batch
    # calls: identical final centroids and assignments
    cat2 = ParquetCatalog(spark, str(tmp / "wh2"))
    for s in cat.snapshots("vecs"):
        cat2.write(
            cat.read_snapshot("vecs", s["id"]), "vecs", mode="append"
        )
        refresh_ivf_index(cat2, "vecs", "ivf", **kw)
    assert (
        cat2.latest_meta("ivf", "centroids")["centroids"]
        == cat.latest_meta("ivf", "centroids")["centroids"]
    )
    idx2 = (
        cat2.read("ivf").select("vec_id", "cell").toPandas()
        .sort_values("vec_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        idx.sort_values("vec_id").reset_index(drop=True), idx2
    )

    # the rebuilt index serves drifted-region queries from the index
    got = ivf_topk_indexed(
        cat, "ivf", drifted.where(F.col("vec_id") < 100_005), k=3, nprobe=4
    ).toPandas()
    assert (got.groupby("qid").size() == 3).all()


def test_streaming_semdedup_auto_rebootstrap(spark, tmp_path_factory):
    """Round-9: the online-SemDeDup maintain -> detect -> rebootstrap
    loop under real micro-batches. Later files carry an orthogonal
    direction the bootstrap clustering never saw; every admission runs
    with auto_rebootstrap, so the clustering must refresh mid-stream.
    Pinned: (a) a rebootstrap overwrite (no batch_id — rebootstraps are
    not batches) landed beyond the bootstrap; (b) every input row has
    exactly one decision row; (c) replaying the SAME micro-batch
    sequence through plain batch calls yields identical decisions,
    cells, and final centroids — streaming adds no nondeterminism."""
    import os
    import time

    from lyssandra_spark.operators.semdedup import semdedup_new_batch

    rng = np.random.default_rng(13)

    def _dirs(axes, n_per, id0):
        rows = []
        rid = id0
        for ax in axes:
            base = np.zeros(8)
            base[ax] = 1.0
            for v in base + rng.normal(size=(n_per, 8)) * 0.05:
                rows.append((rid, [float(x) for x in v]))
                rid += 1
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    tmp = tmp_path_factory.mktemp("sd_reboot_stream")
    src = str(tmp / "src")
    normal = _dirs([0, 1], 40, 0)
    drifted = _dirs([4, 5], 40, 10_000)
    normal.repartition(2).write.parquet(src)
    before = set(os.listdir(src))
    drifted.repartition(2).write.mode("append").parquet(src)
    now = time.time()
    for name in set(os.listdir(src)) - before:
        if name.endswith(".parquet"):
            os.utime(os.path.join(src, name), (now + 3600, now + 3600))

    kw = dict(threshold=0.95, n_clusters=4, sample_rows=256,
              auto_rebootstrap=2.0)
    cat = ParquetCatalog(spark, str(tmp / "wh"))

    def fold(batch_df, batch_id):
        if batch_df.rdd.isEmpty():
            return
        semdedup_new_batch(cat, "sd", batch_df,
                           batch_id=f"mb{batch_id}", **kw)

    sdf = ST.read_transcript_stream(spark, src, normal.schema, max_files=1)
    q = (
        sdf.writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    snaps = cat.snapshots("sd")
    reboots = [
        s for s in snaps
        if s["mode"] == "overwrite" and "batch_id" not in s.get("meta", {})
    ]
    assert reboots, "auto_rebootstrap never fired in-stream"

    full = cat.read("sd").toPandas()
    assert len(full) == normal.count() + drifted.count()
    assert full.vec_id.is_unique
    assert (~full.keep).sum() > 0  # tight clusters produced drops

    # replay the recovered micro-batch sequence as plain batch calls
    cat2 = ParquetCatalog(spark, str(tmp / "wh2"))
    for s in snaps:
        if "batch_id" not in s.get("meta", {}):
            continue  # rebootstrap overwrites are not batches
        batch = cat.read_snapshot("sd", s["id"]).select(
            "vec_id", "embedding"
        )
        semdedup_new_batch(cat2, "sd", batch,
                           batch_id=s["meta"]["batch_id"], **kw)
    replay = cat2.read("sd").toPandas()
    key = lambda df: {  # noqa: E731
        int(r.vec_id): (bool(r.keep),
                        None if pd.isna(r.dup_of) else int(r.dup_of),
                        int(r.cell))
        for r in df.itertuples()
    }
    assert key(full) == key(replay)
    assert (
        cat.latest_meta("sd", "centroids")["centroids"]
        == cat2.latest_meta("sd", "centroids")["centroids"]
    )
