"""IVF-PQ hybrid index (operators/ann_index.py, Jegou 2011 IVFADC):
the serve path must match a from-artifacts numpy oracle bit-for-bit in
its candidate math, assignments must match the assignment oracle,
recall is gated against brute force, the ADC scan's plan must prune to
the probed cells WITHOUT the embedding column, and the incremental /
drift / auto-retrain contracts mirror the flat twins."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lyssandra_spark.operators.ann_index import (
    _unit_anchors,
    ivfpq_topk_indexed,
    needs_retrain,
    refresh_ivfpq_index,
)
from lyssandra_spark.sources.catalog import ParquetCatalog


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def _hash_ranked_ids(emb):
    return [
        r["vec_id"]
        for r in emb.select("vec_id")
        .orderBy(F.xxhash64("vec_id"), "vec_id").collect()
    ]


def _artifacts(cat, table):
    C = np.asarray(cat.latest_meta(table, "centroids")["centroids"],
                   dtype=np.float64)
    books = np.asarray(cat.latest_meta(table, "ivfpq_books")["ivfpq_books"],
                       dtype=np.float64)
    return C, books


def _oracle_serve(corpus, C, books, qrows, k, nprobe, rerank):
    """Pure-numpy replay of ivfpq_topk_indexed's serve semantics from
    the frozen artifacts."""
    m, _, dsub = books.shape
    A = _unit_anchors(C)
    cids = np.asarray(sorted(corpus), dtype=np.int64)
    X = np.stack([corpus[i] for i in cids])
    d2 = ((X * X).sum(1)[:, None] - 2.0 * (X @ C.T)
          + (C * C).sum(1)[None, :])
    cells = d2.argmin(1)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
    R = (Xn - A[cells]).reshape(len(X), m, dsub)
    codes = np.stack([
        (-2.0 * (R[:, j, :] @ books[j].T)
         + (books[j] * books[j]).sum(1)[None, :]).argmin(1)
        for j in range(m)
    ], axis=1)
    out = {}
    for qid, qv in qrows:
        qv = np.asarray(qv, dtype=np.float64)
        qn = qv / max(np.linalg.norm(qv), 1e-300)
        dq = ((qv * qv).sum() - 2.0 * (C @ qv)
              + (C * C).sum(1))
        probe = set(np.argsort(dq, kind="stable")[:nprobe])
        sel = np.asarray([
            j for j in range(len(cids))
            if cells[j] in probe and cids[j] != qid
        ])
        approx = np.array([
            float(qn @ A[cells[j]])
            + sum(float(qn.reshape(m, dsub)[s] @ books[s, codes[j, s]])
                  for s in range(m))
            for j in sel
        ])
        order = np.lexsort((cids[sel], -approx))[:rerank]
        cand = cids[sel][order]
        cos = np.array([
            float(qn @ (corpus[i] / max(np.linalg.norm(corpus[i]), 1e-300)))
            for i in cand
        ])
        top = np.lexsort((cand, -cos))[:k]
        out[qid] = {int(cand[t]): float(cos[t]) for t in top}
    return out


def test_ivfpq_serve_matches_numpy_oracle(spark, emb, tmp_path):
    cat = ParquetCatalog(spark, str(tmp_path))
    cat.write(emb, "vecs", mode="overwrite")
    refresh_ivfpq_index(cat, "vecs", "pqidx", n_cells=8, m=8, n_codes=16,
                        refine_iters=0)
    C, books = _artifacts(cat, "pqidx")
    corpus = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.select("vec_id", "embedding").collect()
    }
    qrows = [(i, corpus[i]) for i in range(6)]
    q = emb.where(F.col("vec_id") < 6)

    got = ivfpq_topk_indexed(cat, "pqidx", q, k=5, nprobe=4,
                             rerank=48).toPandas()
    want = _oracle_serve(corpus, C, books, qrows, k=5, nprobe=4, rerank=48)
    for qid, grp in got.groupby("qid"):
        w = want[qid]
        assert set(grp.vec_id) == set(w)
        for _, r in grp.iterrows():
            assert abs(r.cos_sim - w[r.vec_id]) < 1e-9
        # rk ordering consistent: cos desc, id asc
        g = grp.sort_values("rk")
        pairs = list(zip(-g.cos_sim.round(12), g.vec_id))
        assert pairs == sorted(pairs)
    assert set(got.qid) == set(range(6))

    # assignments: every index row's (cell, code) == the numpy oracle
    A = _unit_anchors(C)
    idx = cat.read("pqidx").select("vec_id", "cell", "code").toPandas()
    for _, r in idx.sample(n=60, random_state=3).iterrows():
        x = corpus[r.vec_id]
        d2 = ((x * x).sum() - 2.0 * (C @ x) + (C * C).sum(1))
        assert r.cell == int(d2.argmin())
        xn = x / max(np.linalg.norm(x), 1e-300)
        res = (xn - A[r.cell]).reshape(8, -1)
        for j in range(8):
            dj = ((books[j] - res[j]) ** 2).sum(1)
            assert r.code[j] == int(dj.argmin())


def test_ivfpq_recall_and_pruned_plan(spark, emb, tmp_path):
    from lyssandra_spark.operators.similarity import cosine_topk_bruteforce

    cat = ParquetCatalog(spark, str(tmp_path))
    cat.write(emb, "vecs", mode="overwrite")
    refresh_ivfpq_index(cat, "vecs", "pqidx", n_cells=8, m=8, n_codes=16,
                        refine_iters=0)
    q = emb.where(F.col("vec_id") < 20)

    served = ivfpq_topk_indexed(cat, "pqidx", q, k=5, nprobe=4, rerank=64)
    exact = cosine_topk_bruteforce(emb, q, k=5)
    g = served.toPandas().groupby("qid").vec_id.apply(set)
    e = exact.toPandas().groupby("qid").vec_id.apply(set)
    recall = np.mean([len(g[i] & e[i]) / 5 for i in e.index])
    assert recall >= 0.6, recall  # nprobe=4 of 8 cells, residual codes

    plan = (
        ivfpq_topk_indexed(cat, "pqidx", q, k=5, nprobe=4, rerank=64)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the ADC scan reads (id, code, cell) with the probed-cell predicate
    # PUSHED into the parquet scan — and never the embedding column
    code_scans = [
        ln for ln in plan.splitlines()
        if "ReadSchema" in ln and "code:array<int>" in ln
        and "embedding" not in ln
    ]
    assert code_scans, "no column-pruned (id, code, cell) scan"
    assert any("In(cell" in ln for ln in plan.splitlines()), \
        "probed-cell filter not pushed to the scan"


def test_ivfpq_incremental_equals_rebuild(spark, emb, tmp_path):
    ranked = _hash_ranked_ids(emb)
    b1 = emb.where(F.col("vec_id").isin(ranked[:250]))
    b2 = emb.where(~F.col("vec_id").isin(ranked[:250]))
    kw = dict(n_cells=8, m=8, n_codes=16, sample_rows=64, seed=31,
              refine_iters=0)

    cat = ParquetCatalog(spark, str(tmp_path))
    cat.write(b1, "vecs", mode="overwrite")
    s1 = refresh_ivfpq_index(cat, "vecs", "idx", **kw)
    cat.write(b2, "vecs", mode="append")
    s2 = refresh_ivfpq_index(cat, "vecs", "idx", **kw)
    assert s2 > s1

    cat.write(emb, "vecs_full", mode="overwrite")
    refresh_ivfpq_index(cat, "vecs_full", "idx_full", **kw)

    assert (cat.latest_meta("idx", "centroids")["centroids"]
            == cat.latest_meta("idx_full", "centroids")["centroids"])
    assert (cat.latest_meta("idx", "ivfpq_books")["ivfpq_books"]
            == cat.latest_meta("idx_full", "ivfpq_books")["ivfpq_books"])
    gi = (cat.read("idx").select("vec_id", "cell", "code").toPandas()
          .sort_values("vec_id").reset_index(drop=True))
    gf = (cat.read("idx_full").select("vec_id", "cell", "code").toPandas()
          .sort_values("vec_id").reset_index(drop=True))
    assert gi.vec_id.tolist() == gf.vec_id.tolist()
    assert gi.cell.tolist() == gf.cell.tolist()
    assert [list(c) for c in gi.code] == [list(c) for c in gf.code]

    with pytest.raises(ValueError, match="spec"):
        refresh_ivfpq_index(cat, "vecs", "idx", n_cells=4, m=8,
                            n_codes=16, sample_rows=64, seed=31,
                            refine_iters=0)


def test_ivfpq_drift_flips_and_auto_retrains(spark, tmp_path):
    """The IVF-PQ drift measure is the NORMALIZED-vector residual
    reconstruction error, so the drift that flips it is DIRECTIONAL
    (new regions of the sphere the residual codebooks never saw) —
    scale/offset drift normalizes away by design. Base: two tight
    direction clusters (small baseline error); drifted: an orthogonal
    direction (residual lands far from every trained codeword)."""
    rng = np.random.default_rng(7)

    def _dirs(axes, n_per):
        out = []
        for ax in axes:
            v = np.zeros(8)
            v[ax] = 1.0
            out.append(v + rng.normal(size=(n_per, 8)) * 0.05)
        return np.vstack(out)

    base = _dirs([0, 1], 60)
    far = _dirs([4], 120)

    def _df(mat, id0):
        return spark.createDataFrame(
            [(id0 + i, [float(v) for v in row])
             for i, row in enumerate(mat)],
            "vec_id long, embedding array<double>",
        )

    kw = dict(n_cells=4, m=4, n_codes=8, sample_rows=64, seed=31,
              refine_iters=0)
    cat = ParquetCatalog(spark, str(tmp_path))
    cat.write(_df(base, 0), "vecs", mode="overwrite")
    refresh_ivfpq_index(cat, "vecs", "idx", **kw)
    assert needs_retrain(cat, "idx", threshold=3.0,
                         drift_key="ivfpq_drift") is False

    cat.write(_df(far, 1000), "vecs", mode="append")
    refresh_ivfpq_index(cat, "vecs", "idx", **kw)
    assert needs_retrain(cat, "idx", threshold=3.0,
                         drift_key="ivfpq_drift") is True

    # one-call loop: next drifted batch folds, drifts, and rebuilds
    cat.write(_df(_dirs([5], 120), 2000), "vecs", mode="append")
    refresh_ivfpq_index(cat, "vecs", "idx", auto_retrain=3.0, **kw)
    assert cat.snapshots("idx")[-1]["mode"] == "overwrite"
    assert needs_retrain(cat, "idx", threshold=3.0,
                         drift_key="ivfpq_drift") is False
    assert cat.read("idx").count() == 360


def test_ivfpq_distributed_serve_matches_collected(spark, emb, tmp_path):
    """The no-collect distributed IVF-PQ serve == the collected path
    bit-for-bit; the auto-route engages over max_queries; the plan
    keeps BOTH the static probed-cell pushdown AND the cogrouped Arrow
    stage; the collect fence holds (only the artifact-bounded probed-
    cell set may be collected)."""
    import lyssandra_spark.operators.ann_index as AI

    cat = ParquetCatalog(spark, str(tmp_path))
    cat.write(emb, "vecs", mode="overwrite")
    refresh_ivfpq_index(cat, "vecs", "pqidx", n_cells=8, m=8, n_codes=16,
                        refine_iters=0)
    q = emb.where(F.col("vec_id") < 25)

    want = ivfpq_topk_indexed(cat, "pqidx", q, k=5, nprobe=4, rerank=48)
    got = ivfpq_topk_indexed(
        cat, "pqidx", q, k=5, nprobe=4, rerank=48, distributed=True,
        corpus_blocks=5, query_chunk=7,
    )
    sort = lambda df: (df.toPandas()  # noqa: E731
                       .sort_values(["qid", "rk"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(sort(got), sort(want))

    # auto-route: 500 queries over max_queries=40
    want_all = sort(ivfpq_topk_indexed(cat, "pqidx", emb, k=3, nprobe=4,
                                       rerank=32))
    got_all = sort(ivfpq_topk_indexed(cat, "pqidx", emb, k=3, nprobe=4,
                                      rerank=32, max_queries=40,
                                      corpus_blocks=3))
    pd.testing.assert_frame_equal(got_all, want_all)

    # loud refusal still available
    with pytest.raises(ValueError, match="max_queries"):
        ivfpq_topk_indexed(cat, "pqidx", emb, k=3, max_queries=40,
                           distributed=False)

    # fence: the query frame is never driver-collected on the forced
    # path (the probed-cell union is the one allowed, n_cells-bounded
    # collect and goes through DataFrame.collect, not the helper)
    orig = AI._collect_bounded_queries
    AI._collect_bounded_queries = lambda *a, **kw: (_ for _ in ()).throw(
        AssertionError("distributed ivfpq path collected the queries")
    )
    try:
        built = ivfpq_topk_indexed(
            cat, "pqidx", q, k=5, nprobe=4, rerank=48, distributed=True,
            corpus_blocks=5,
        )
        assert built.count() == want.count()
    finally:
        AI._collect_bounded_queries = orig

    plan = (
        ivfpq_topk_indexed(cat, "pqidx", q, k=5, nprobe=4, rerank=48,
                           distributed=True, corpus_blocks=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "FlatMapCoGroups" in plan
    assert any("In(cell" in ln for ln in plan.splitlines()), \
        "probed-cell pushdown lost in the distributed plan"
    code_scans = [
        ln for ln in plan.splitlines()
        if "ReadSchema" in ln and "code:array<int>" in ln
        and "embedding" not in ln
    ]
    assert code_scans

    got_empty = ivfpq_topk_indexed(cat, "pqidx", emb.limit(0), k=5,
                                   distributed=True, corpus_blocks=2)
    assert got_empty.count() == 0


def test_release_serve_caches(spark, emb, tmp_path):
    """Every distributed IVF-PQ serve caches one probed-query frame;
    release_serve_caches() frees them all (a long-lived serving driver
    would otherwise accumulate one per query batch until LRU pressure —
    round-9 advice), and a released result still evaluates identically
    (the cache is lineage-preserving, not a checkpoint)."""
    import lyssandra_spark.operators.ann_index as AI

    AI.release_serve_caches()  # clean slate from earlier tests
    cat = ParquetCatalog(spark, str(tmp_path))
    cat.write(emb, "vecs", mode="overwrite")
    refresh_ivfpq_index(cat, "vecs", "pqidx", n_cells=8, m=8, n_codes=16,
                        refine_iters=0)
    q = emb.where(F.col("vec_id") < 25)
    got = ivfpq_topk_indexed(cat, "pqidx", q, k=5, nprobe=4, rerank=48,
                             distributed=True, corpus_blocks=3)
    before = got.toPandas().sort_values(["qid", "rk"]).reset_index(drop=True)
    assert len(AI._SERVE_CACHES) == 1
    cached = AI._SERVE_CACHES[0]
    assert cached.storageLevel.useMemory
    assert AI.release_serve_caches() == 1
    assert not AI._SERVE_CACHES
    assert not cached.storageLevel.useMemory
    # the already-built plan still evaluates identically post-release
    after = got.toPandas().sort_values(["qid", "rk"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)
    # idempotent
    assert AI.release_serve_caches() == 0
