"""Physical-plan quality gates (SURVEY.md §4.2): pushdown, pruning,
broadcast, shuffle counts, codegen. These assert the plans we DESIGNED for,
not just whatever passed — a regression that adds a shuffle or loses a
pushdown fails here before it costs anything at scale."""

import pytest
from pyspark.sql import functions as F

from lyssandra_spark.operators.encode import sparse_code
from lyssandra_spark.operators.windows import ffill, rolling, sessionize, with_lag
from lyssandra_spark.sources import synth


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _n_shuffles(df) -> int:
    return _plan(df).count("Exchange")


def test_filter_and_projection_pushdown(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.where(F.col("l_shipdate") < "1996-01-01").select("l_orderkey", "l_quantity")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in plan
    # column pruning: scan schema must contain ONLY the 3 referenced columns
    rs = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in rs and "l_quantity" in rs and "l_shipdate" in rs
    assert "l_extendedprice" not in rs and "l_comment" not in rs


def test_encode_plan_is_shuffle_free(spark, sf_dir):
    """The flagship encode is map-only: scan -> project -> mapInArrow.
    No Exchange anywhere — the property that makes it embarrassingly
    parallel at 10^12 rows."""
    t = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("event_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.col("ts"),
        F.col("event_type").alias("text"),
    )
    versions = synth.build_dict_versions(sf_dir, n_atoms=32)
    coded = sparse_code(t, versions, algo="bomp", k=3, drop_text=True)
    assert _n_shuffles(coded) == 0
    assert "MapInArrow" in _plan(coded) or "ArrowEvalPython" in _plan(coded) \
        or "PythonMapInArrow" in _plan(coded)


def test_window_chain_shares_one_shuffle(spark, sf_dir):
    """sessionize + ffill + lag + rolling all partition by conv_id: the
    optimizer must reuse ONE Exchange for the whole chain (same
    partitioning), not shuffle per operator."""
    t = synth.transcripts(spark, sf_dir).limit(5000)
    chained = rolling(
        ffill(
            with_lag(
                sessionize(t, 1800, part="conv_id", ts_col="ts"),
                "role", part="conv_id", order="turn_idx"),
            "role", part="conv_id", order="turn_idx"),
        "turn_idx", 5, part="conv_id", order="turn_idx")
    # the limit itself introduces exchanges; count only those on conv_id
    plan = _plan(chained)
    n_conv_exchanges = plan.count("hashpartitioning(conv_id")
    assert n_conv_exchanges <= 1, plan[:2000]


def test_small_dim_join_broadcasts(spark, sf_dir):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    j = c.join(n, c.c_nationkey == n.n_nationkey)
    assert "BroadcastHashJoin" in _plan(j)


def test_six_way_join_chain_broadcasts_dims(spark, sf_dir):
    """The TPC-H Q5-shaped 6-way join chain (fact-fact joins + three
    explicitly-broadcast small dims) keeps its broadcast-chain plan —
    this pins the shape the retired q5_region_revenue driver row used
    to cover (its correctness overlaps q3/join_customer_nation_region;
    the slot went to an oracled LLM-pipeline row in round 6)."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet").where(
        F.col("r_name") == "ASIA"
    )
    out = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"))
    )
    plan = _plan(out)
    assert plan.count("BroadcastHashJoin") >= 3, plan[:3000]
    rows = out.collect()
    assert all(row.revenue > 0 for row in rows)


def test_agg_has_partial_and_codegen(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    agg = li.groupBy("l_returnflag").agg(F.sum("l_quantity"))
    plan = _plan(agg)
    # map-side partial aggregation before the exchange (partial + final)
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan


def test_salted_agg_spreads_hot_key(spark, sf_dir):
    from lyssandra_spark.operators.windows import salted_agg

    t = synth.transcripts(spark, sf_dir)
    out = salted_agg(t, "conv_id", {"n": ("count", "turn_idx")}, n_buckets=8)
    plan = _plan(out)
    # phase 1 groups by (conv_id, salt): the first exchange partitions on both
    assert "hashpartitioning(conv_id" in plan and "salt" in plan


def test_exact_dedup_single_shuffle_partial_agg(spark, sf_dir):
    """exact_dedup is one pass — a single Exchange on the text hash — AND
    the winner/count aggregates partial-merge map-side (two aggregate
    stages around the exchange), so a 10^7-copy duplicate class is reduced
    per input partition before the shuffle instead of serializing one task
    (the old row_number window put every copy of a hot text on one task)."""
    from lyssandra_spark.operators.dedup import exact_dedup

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    out = exact_dedup(d)
    plan = _plan(out)
    assert _n_shuffles(out) == 1, plan[:2000]
    # partial + final aggregate stages (min_by's struct buffer routes
    # through ObjectHashAggregate; count alone would be HashAggregate)
    assert plan.count("Aggregate") >= 2 and "partial" in plan.lower(), plan[:2000]
    assert "Window" not in plan, plan[:2000]


def test_exact_dedup_mega_duplicate_class(spark):
    """Equality gate for the skew-proof form: a planted mega-duplicate
    class (one text repeated 20k times across many partitions) must
    produce exactly the window-form answer — one winner row (lowest key)
    with the full copy count — and the plan must stay window-free."""
    from pyspark.sql import Window

    from lyssandra_spark.operators.dedup import exact_dedup

    n_copies = 20000
    base = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("unique text "), F.col("id")).alias("text"),
    )
    mega = spark.range(n_copies).select(
        (F.col("id") + 10000).alias("doc_id"),
        F.lit("the boilerplate page everyone copies").alias("text"),
    )
    df = base.unionByName(mega).repartition(16)
    out = exact_dedup(df).cache()
    # reference: the historical window form, computed inline
    w = Window.partitionBy("__h").orderBy("doc_id")
    ref = (
        df.withColumn("__h", F.md5("text"))
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("n_copies", F.count("*").over(Window.partitionBy("__h")))
        .where(F.col("__rn") == 1)
        .drop("__h", "__rn")
    )
    got = {tuple(r) for r in out.collect()}
    want = {tuple(r) for r in ref.collect()}
    assert got == want
    hot = out.where(F.col("text").startswith("the boilerplate")).collect()
    assert len(hot) == 1 and hot[0]["doc_id"] == 10000
    assert hot[0]["n_copies"] == n_copies
    out.unpersist()


def test_minhash_lsh_banded_exchange_excludes_signature(spark, sf_dir):
    """The banded self-join must not carry the sig array through its
    shuffle: the exploded exchange's output schema is (id, band, bh) only;
    signatures re-join for surviving pairs."""
    from lyssandra_spark.operators.dedup import minhash_lsh_pairs

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    out = minhash_lsh_pairs(d, n_perm=32, bands=8)
    plan = _plan(out)
    # every exchange partitioned on (band, bh) must not ship a sig column
    for chunk in plan.split("Exchange hashpartitioning(")[1:]:
        header = chunk.splitlines()[0]
        if header.startswith("band"):
            assert "sig" not in header, header


def test_embedding_neardup_bucket_exchange_excludes_embedding(spark, sf_dir):
    """Multi-table bucket candidate generation must not carry the 8*dim-byte
    embedding through its shuffles: exchanges partitioned on (tbl, bucket)
    ship (id, tbl, bucket) only; embeddings re-join for deduped survivors."""
    from lyssandra_spark.operators.dedup import embedding_neardup_pairs

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = embedding_neardup_pairs(e, n_planes=8, n_tables=3, min_cosine=0.9)
    plan = _plan(out)
    for chunk in plan.split("Exchange hashpartitioning(")[1:]:
        header = chunk.splitlines()[0]
        if header.startswith("tbl"):
            assert "emb" not in header, header


def test_pool_codes_partial_aggregation_and_key_shuffles(spark, sf_dir):
    """pool_codes shuffles only on the group keys (atom stage partitions by
    (keys, i), group stage by keys) with map-side partial aggregation —
    never on the exploded pair stream itself."""
    from lyssandra_spark.operators.pooling import pool_codes

    src = spark.range(2000).select(
        F.concat(F.lit("c"), (F.col("id") % 50).cast("string")).alias("conv_id"),
        (F.col("id") % 3).cast("int").alias("session_id"),
        F.array(F.lit(1), F.lit(2)).alias("code_idx"),
        F.array(F.lit(0.5), F.lit(1.5)).alias("code_val"),
    )
    out = pool_codes(src, n_atoms=8, part=("conv_id", "session_id"))
    plan = _plan(out)
    assert "partial_max" in plan or "partial_count" in plan
    # every exchange keys on conv_id (+ session_id / i) — nothing else
    for chunk in plan.split("Exchange hashpartitioning(")[1:]:
        header = chunk.splitlines()[0]
        assert header.startswith("conv_id"), header


def test_ivf_arrow_assignment_single_crossing_no_literal_blowup(spark, sf_dir):
    """assign_cells_arrow at a production cell count: exactly one Python
    crossing, centroids travel as a broadcast (zero centroid literals in
    the plan), plan size independent of n_cells."""
    import numpy as np

    from lyssandra_spark.operators.similarity import assign_cells_arrow

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    rng = np.random.default_rng(1)
    plan_sizes = []
    for n_cells in (64, 4096):
        C = rng.standard_normal((n_cells, 64))
        out = assign_cells_arrow(e, C, "emb", nprobe=4)
        plan = _plan(out)
        assert plan.count("PythonMapInArrow") + plan.count("MapInArrow") == 1
        plan_sizes.append(len(plan))
    # 64x more centroids must not grow the plan (broadcast, not literals)
    assert abs(plan_sizes[1] - plan_sizes[0]) < 200, plan_sizes


def test_pq_rerank_broadcasts_candidates_not_corpus(spark):
    """pq_topk's exact re-rank must broadcast the bounded candidate set;
    the corpus side stays an unshuffled scan (no Exchange on the corpus
    id between the parquet scan and the re-rank join)."""
    from lyssandra_spark.operators.similarity import pq_topk

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = pq_topk(e, e.where(F.col("vec_id") < 4), k=3, rerank=16)
    plan = _plan(out)
    assert plan.count("BroadcastHashJoin") >= 2, plan[:3000]
