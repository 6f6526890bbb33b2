"""BM25 retrieval: python-oracle parity, ranking sanity, plan shape."""

import math
import re
from collections import Counter

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lyssandra_spark.operators.search import bm25_topk, build_postings


def _tok(t):
    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


def _oracle(docs, queries, k, k1=1.2, b=0.75):
    """Independent BM25: plain dict/Counter formulation."""
    toks = {d: _tok(t) for d, t in docs.items()}
    n = len(docs)
    # standard Okapi avgdl: over ALL docs (zero-token docs count as 0)
    lens = {d: len(ts) for d, ts in toks.items()}
    avg = sum(lens.values()) / n
    tfs = {d: Counter(ts) for d, ts in toks.items()}
    dfs = Counter(t for d in toks for t in set(toks[d]))
    out = {}
    for qid, qt in queries.items():
        scores = {}
        for d in docs:
            s = 0.0
            for t in set(_tok(qt)):
                tf = tfs[d].get(t, 0)
                if not tf:
                    continue
                idf = math.log(1 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
                s += idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * lens[d] / avg)
                )
            if s > 0:
                scores[d] = round(s, 6)
        out[qid] = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return out


def _frames(spark, docs, queries):
    d = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    q = spark.createDataFrame(
        [(i, t) for i, t in queries.items()], "qid long, qtext string"
    )
    return d, q


def test_bm25_matches_python_oracle(spark):
    docs = {
        0: "the quick brown fox jumps over the lazy dog",
        1: "a fast brown fox is quick and clever",
        2: "dogs and cats living together in harmony",
        3: "spark shuffles partitions across the cluster",
        4: "quick quick quick repetition saturates term frequency",
        5: "",  # empty doc: never retrieved, still counted in N
    }
    queries = {10: "quick fox", 11: "lazy dogs", 12: "cluster partitions",
               13: "quick quick fox"}  # repeated term counts once
    d, q = _frames(spark, docs, queries)
    got = bm25_topk(d, q, k=3).toPandas()
    want = _oracle(docs, queries, k=3)
    for qid, pairs in want.items():
        g = got[got.qid == qid].sort_values("rk")
        assert list(g.doc_id) == [p[0] for p in pairs], (qid, pairs)
        for (_, row), (_, s) in zip(g.iterrows(), pairs):
            assert row.bm25 == pytest.approx(s, abs=2e-6)
    # repeated-term query == its set-of-terms twin
    a = got[got.qid == 10].reset_index(drop=True)[["doc_id", "bm25"]]
    c = got[got.qid == 13].reset_index(drop=True)[["doc_id", "bm25"]]
    pd.testing.assert_frame_equal(a, c)


def test_bm25_on_documents_table_and_plan(spark, sf_dir):
    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text").limit(120).cache()
    )
    pdf = d.toPandas()
    docs = dict(zip(pdf.doc_id, pdf.text))
    # queries drawn from real doc contents (first 4 tokens of 3 docs)
    queries = {
        int(i): " ".join(_tok(docs[i])[:4])
        for i in list(docs)[:3]
    }
    q = spark.createDataFrame(
        [(i, t) for i, t in queries.items()], "qid long, qtext string"
    )
    got = bm25_topk(d, q, k=5).toPandas()
    want = _oracle(docs, queries, k=5)
    for qid, pairs in want.items():
        g = got[got.qid == qid].sort_values("rk")
        assert list(g.doc_id) == [p[0] for p in pairs]

    plan = bm25_topk(d, q, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # query terms broadcast
    post_plan = (
        build_postings(d)._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_count" in post_plan or "partial count" in post_plan.lower()
    d.unpersist()

    with pytest.raises(ValueError, match="k \\(0\\)"):
        bm25_topk(d, q, k=0)
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        bm25_topk(empty, q)


def test_incremental_postings_equal_full_rebuild(spark, sf_dir, tmp_path):
    """refresh_postings folding two batches == build_postings over the
    full corpus (bit-equal rows, N counts zero-token docs), and
    bm25_topk_indexed == bm25_topk over the same corpus — while its plan
    reads ONLY the postings table, never the docs table."""
    from lyssandra_spark.operators.search import (
        bm25_topk_indexed,
        refresh_postings,
    )
    from lyssandra_spark.sources.catalog import ParquetCatalog

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    b1 = d.where(F.col("doc_id") < 60)
    # batch 2 includes a zero-token doc: it lands a SENTINEL row (term
    # NULL, tf 0) so the postings id set is the doc universe and N /
    # avgdl stay exact under every re-ingest pattern
    b2 = d.where((F.col("doc_id") >= 60) & (F.col("doc_id") < 90)).unionByName(
        spark.createDataFrame([(999999, "!!! ...")], "doc_id long, text string")
    )
    cat = ParquetCatalog(spark, str(tmp_path))
    cat.write(b1, "docs", mode="overwrite")
    s1 = refresh_postings(cat, "docs", "postings")
    cat.write(b2, "docs", mode="append")
    s2 = refresh_postings(cat, "docs", "postings")
    assert s2 > s1

    full = b1.unionByName(b2)
    raw = cat.read("postings").toPandas()
    # exactly one sentinel: the zero-token doc, term NULL / tf 0 / len 0
    sent = raw[raw.term.isna()]
    assert list(sent.doc_id) == [999999]
    assert list(sent.tf) == [0] and list(sent.doc_len) == [0]
    got = (
        raw[raw.term.notna()]
        .sort_values(["doc_id", "term"]).reset_index(drop=True)
    )
    want = (
        build_postings(full).toPandas()
        .sort_values(["doc_id", "term"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[list(want.columns)], want)
    assert cat.snapshots("postings")[-1]["meta"]["n_docs"] == full.count()

    q = spark.createDataFrame(
        [(1, "table scan value"), (2, "spark merge batch")],
        "qid long, qtext string",
    )
    gi = (
        bm25_topk_indexed(cat, "postings", q, k=5).toPandas()
        .sort_values(["qid", "rk"]).reset_index(drop=True)
    )
    gc = (
        bm25_topk(full, q, k=5).toPandas()
        .sort_values(["qid", "rk"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(gi, gc)

    # the indexed plan scans the postings chain, never the corpus text
    plan = (
        bm25_topk_indexed(cat, "postings", q, k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "postings" in plan
    assert "docs/snap" not in plan

    # no new source snapshot -> no-op, same postings snapshot id
    assert refresh_postings(cat, "docs", "postings") == s2

    # wholesale re-ingest: watermark advances, postings rows unchanged
    cat.write(b1, "docs", mode="append")
    n_rows = cat.read("postings").count()
    s4 = refresh_postings(cat, "docs", "postings")
    assert s4 > s2
    assert cat.read("postings").count() == n_rows
    assert cat.snapshots("postings")[-1]["meta"]["n_docs"] == full.count()

    # re-ingesting ONLY the zero-token doc: its sentinel makes it
    # visible to the anti-join, so N stays exact (round-6 verdict noted
    # the pre-sentinel path double-counted N here)
    cat.write(
        spark.createDataFrame([(999999, "!!! ...")], "doc_id long, text string"),
        "docs", mode="append",
    )
    s5 = refresh_postings(cat, "docs", "postings")
    assert s5 > s4
    assert cat.read("postings").count() == n_rows
    assert cat.snapshots("postings")[-1]["meta"]["n_docs"] == full.count()

    # spec drift fails loudly; source overwrite triggers a full rebuild
    with pytest.raises(ValueError, match="spec"):
        refresh_postings(cat, "docs", "postings", text_col="body")
    cat.write(b2, "docs", mode="overwrite")
    refresh_postings(cat, "docs", "postings")
    assert (
        cat.snapshots("postings")[-1]["meta"]["n_docs"] == b2.count()
    )
    raw2 = cat.read("postings").toPandas()
    assert list(raw2[raw2.term.isna()].doc_id) == [999999]  # sentinel survives rebuild
    rebuilt = (
        raw2[raw2.term.notna()]
        .sort_values(["doc_id", "term"]).reset_index(drop=True)
    )
    want2 = (
        build_postings(b2).toPandas()
        .sort_values(["doc_id", "term"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(rebuilt[list(want2.columns)], want2)


def test_rrf_fusion_known_values(spark):
    """RRF (Cormack 2009): a doc ranked mid in BOTH lists beats docs top
    in only one (1/(60+3)+1/(60+3) > 1/(60+1)); exact hand-computed
    scores; missing-from-one-list convention; deterministic ties."""
    from lyssandra_spark.operators.search import rrf_fuse

    r1 = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (1, 30, 3)], "qid long, doc_id long, rk int"
    )
    r2 = spark.createDataFrame(
        [(1, 40, 1), (1, 50, 2), (1, 30, 3)], "qid long, doc_id long, rk int"
    )
    got = (
        rrf_fuse([r1, r2], k=10).toPandas()
        .sort_values("rk").reset_index(drop=True)
    )
    # doc 30: 2/(60+3) = 0.03174603; doc 10/40: 1/61; doc 20/50: 1/62
    assert got.loc[0, "doc_id"] == 30
    assert got.loc[0, "rrf_score"] == pytest.approx(2 / 63, abs=1e-8)
    # 10 and 40 tie exactly -> lower id first
    assert list(got.doc_id[1:3]) == [10, 40]
    assert got.loc[1, "rrf_score"] == pytest.approx(1 / 61, abs=1e-8)
    assert list(got.doc_id[3:5]) == [20, 50]

    with pytest.raises(ValueError, match="non-empty"):
        rrf_fuse([])
    with pytest.raises(ValueError, match="k \\(0\\)"):
        rrf_fuse([r1], k=0)


def test_rrf_hybrid_bm25_composition(spark, sf_dir):
    """Hybrid shape end-to-end: fuse two real BM25 rankings (different
    length-normalization b) — fusion output is a valid bounded ranking
    and every fused doc came from an input list."""
    from lyssandra_spark.operators.search import rrf_fuse

    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text").limit(80)
    )
    q = spark.createDataFrame(
        [(1, "table scan value"), (2, "spark merge batch")],
        "qid long, qtext string",
    )
    ra = bm25_topk(d, q, k=5, b=0.75)
    rb = bm25_topk(d, q, k=5, b=0.0)  # no length normalization
    fused = rrf_fuse([ra, rb], k=5).toPandas()
    assert set(fused.qid) <= {1, 2}
    assert (fused.groupby("qid").rk.max() <= 5).all()
    src_docs = set(ra.toPandas().doc_id) | set(rb.toPandas().doc_id)
    assert set(fused.doc_id) <= src_docs


def test_bm25_tokenless_corpus_and_rrf_c_guard(spark):
    from lyssandra_spark.operators.search import rrf_fuse

    tokenless = spark.createDataFrame(
        [(1, None), (2, ""), (3, "!!! ... ###")], "doc_id long, text string"
    )
    q = spark.createDataFrame([(1, "anything")], "qid long, qtext string")
    with pytest.raises(ValueError, match="tokenizes to any term"):
        bm25_topk(tokenless, q)

    r = spark.createDataFrame([(1, 10, 0)], "qid long, doc_id long, rk int")
    with pytest.raises(ValueError, match="c \\(0\\)"):
        rrf_fuse([r], c=0)  # 0-based rank + c=0 would null out the top doc


def test_postings_survive_audit_compaction(spark, sf_dir, tmp_path):
    """compact()+expire() of the corpus after a refresh must cost the
    postings index NOTHING: the compaction is audit-only (watermark-only
    append), later deltas fold incrementally (append, never a rescan of
    the compacted blob), and a compaction that swallowed an unindexed
    delta triggers the full rebuild (overwrite) with exact results."""
    from lyssandra_spark.operators.search import refresh_postings
    from lyssandra_spark.sources.catalog import ParquetCatalog

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    b1 = d.where(F.col("doc_id") < 60)
    b2 = d.where((F.col("doc_id") >= 60) & (F.col("doc_id") < 90))
    b3 = d.where((F.col("doc_id") >= 90) & (F.col("doc_id") < 120))
    cat = ParquetCatalog(spark, str(tmp_path))
    cat.write(b1, "docs", mode="overwrite")
    refresh_postings(cat, "docs", "postings")
    cat.write(b2, "docs", mode="append")
    s2 = refresh_postings(cat, "docs", "postings")
    n_rows = cat.read("postings").count()

    cat.compact("docs")
    cat.expire("docs")
    s3 = refresh_postings(cat, "docs", "postings")
    assert s3 > s2
    head = cat.snapshots("postings")[-1]
    assert head["mode"] == "append"  # watermark-only, NOT a rebuild
    assert head["meta"]["n_docs"] == b1.count() + b2.count()
    assert cat.read("postings").count() == n_rows

    # post-compaction delta: incremental append, rows == one-shot build
    cat.write(b3, "docs", mode="append")
    refresh_postings(cat, "docs", "postings")
    head = cat.snapshots("postings")[-1]
    assert head["mode"] == "append"
    full = b1.unionByName(b2).unionByName(b3)
    assert head["meta"]["n_docs"] == full.count()
    got = (
        cat.read("postings").where(F.col("term").isNotNull()).toPandas()
        .sort_values(["doc_id", "term"]).reset_index(drop=True)
    )
    want = (
        build_postings(full).toPandas()
        .sort_values(["doc_id", "term"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[list(want.columns)], want)

    # compaction swallowing an UNINDEXED delta -> full rebuild, exact
    b4 = d.where((F.col("doc_id") >= 120) & (F.col("doc_id") < 150))
    cat.write(b4, "docs", mode="append")
    cat.compact("docs")
    cat.expire("docs")
    refresh_postings(cat, "docs", "postings")
    head = cat.snapshots("postings")[-1]
    assert head["mode"] == "overwrite"  # rebuild
    assert head["meta"]["n_docs"] == full.count() + b4.count()


def test_hybrid_search_indexed_composition(spark, sf_dir, tmp_path):
    """hybrid_search_indexed == the manual rrf_fuse(bm25_topk_indexed,
    ann serve) composition, entirely from persisted indexes; a query
    carrying a doc's own words AND its own embedding puts that doc in
    the hybrid top-k."""
    import numpy as np

    from lyssandra_spark.operators.ann_index import (
        ivf_topk_indexed,
        refresh_ivf_index,
    )
    from lyssandra_spark.operators.search import (
        bm25_topk_indexed,
        hybrid_search_indexed,
        refresh_postings,
        rrf_fuse,
    )
    from lyssandra_spark.sources.catalog import ParquetCatalog

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text").limit(150).cache()
    )
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    rng = np.random.default_rng(5)
    emb = spark.createDataFrame(
        [(i, [float(v) for v in rng.normal(size=16)]) for i in sorted(ids)],
        "doc_id long, embedding array<double>",
    ).cache()

    cat = ParquetCatalog(spark, str(tmp_path))
    cat.write(docs, "docs", mode="overwrite")
    refresh_postings(cat, "docs", "post")
    cat.write(emb, "vecs", mode="overwrite")
    refresh_ivf_index(cat, "vecs", "ann", id_col="doc_id", n_cells=8,
                      sample_rows=256, refine_iters=0)

    emb_by_id = {r["doc_id"]: r["embedding"] for r in emb.collect()}
    probe_ids = sorted(ids)[:3]
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.where(F.col("doc_id").isin(probe_ids)).collect()
    }
    # qids offset from doc ids: the ANN serve's qid==id self-mask must
    # not hide the query's own doc (it is a DIFFERENT table here)
    queries = spark.createDataFrame(
        [(500_000 + i, " ".join(texts[i].split()[:8]), emb_by_id[i])
         for i in probe_ids],
        "qid long, qtext string, qemb array<double>",
    )

    got = hybrid_search_indexed(
        cat, "post", "ann", queries, k=5, ann_method="ivf",
        ann_kwargs=dict(nprobe=8),
    ).toPandas().sort_values(["qid", "rk"]).reset_index(drop=True)

    lex = bm25_topk_indexed(cat, "post", queries.select("qid", "qtext"),
                            k=5)
    ann = ivf_topk_indexed(
        cat, "ann",
        queries.select(F.col("qid").alias("doc_id"),
                       F.col("qemb").alias("embedding")),
        k=5, nprobe=8,
    )
    want = rrf_fuse([lex, ann], k=5).toPandas().sort_values(
        ["qid", "rk"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)

    # the doc whose words + embedding the query carries must surface
    for qid, grp in got.groupby("qid"):
        assert (qid - 500_000) in set(grp.doc_id), \
            f"query {qid} lost its own doc"

    with pytest.raises(ValueError, match="ann_method"):
        hybrid_search_indexed(cat, "post", "ann", queries,
                              ann_method="hnsw")


def test_bm25_no_broadcast_queries_matches(spark, sf_dir):
    """broadcast_queries=False (the corpus-scale query batch setting):
    shuffle-join plan, identical results on both the per-call and the
    indexed path."""
    from lyssandra_spark.operators.search import bm25_topk

    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text").limit(200)
    )
    q = spark.createDataFrame(
        [(1, "table scan value"), (2, "spark merge batch")],
        "qid long, qtext string",
    )
    a = bm25_topk(d, q, k=10).toPandas().sort_values(
        ["qid", "rk"]).reset_index(drop=True)
    b = bm25_topk(d, q, k=10, broadcast_queries=False).toPandas() \
        .sort_values(["qid", "rk"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
