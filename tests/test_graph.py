"""Connected components: vs a python union-find oracle, worst-case chain
convergence, partition invariance."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lyssandra_spark.operators.graph import connected_components


def _uf_oracle(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical representative = min id in component
    comp = {}
    for v in list(parent):
        comp[v] = find(v)
    return comp


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = connected_components(df, **kw).collect()
    return {r["id"]: r["component"] for r in got}


def test_cc_matches_union_find_random(spark):
    rng = np.random.default_rng(11)
    edges = [
        (int(a), int(b))
        for a, b in zip(rng.integers(0, 120, 300), rng.integers(0, 120, 300))
        if a != b
    ]
    got = _run(spark, edges)
    exp = _uf_oracle(edges)
    assert got == exp


def test_cc_chain_worst_case(spark):
    """A single path graph (maximum diameter for its size): min-label
    propagation still converges within max_iter because the min label
    hops one step per round along the chain — 24 edges, default cap."""
    edges = [(i, i + 1) for i in range(24)]
    got = _run(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 25


def test_cc_deep_chain_star_fallback(spark):
    """A chain DEEPER than the min-label round cap: min-label alone would
    raise at max_iter, but the large-star/small-star fallback contracts
    the remaining path in O(log^2 n) rounds and converges to the same
    min-id labels (this used to be the documented failure mode)."""
    edges = [(i, i + 1) for i in range(80)]
    got = _run(spark, edges, max_iter=5)
    assert set(got.values()) == {0}
    assert len(got) == 81


def test_cc_pure_star_matches_union_find(spark):
    """max_iter=0 runs pure star contraction — must equal the union-find
    oracle on random multi-component graphs, including isolated chains
    and partition invariance."""
    rng = np.random.default_rng(17)
    edges = [
        (int(a), int(b))
        for a, b in zip(rng.integers(0, 150, 260), rng.integers(0, 150, 260))
        if a != b
    ] + [(1000 + i, 1001 + i) for i in range(30)]  # planted deep chain
    exp = _uf_oracle(edges)
    got = _run(spark, edges, max_iter=0)
    assert got == exp
    df = spark.createDataFrame(edges, "id_a long, id_b long").repartition(7)
    got_r = {r["id"]: r["component"]
             for r in connected_components(df, max_iter=0).collect()}
    assert got_r == exp


def test_cc_components_and_partition_invariance(spark):
    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (3, 1)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    a = {r["id"]: r["component"]
         for r in connected_components(df).collect()}
    b = {r["id"]: r["component"]
         for r in connected_components(df.repartition(7)).collect()}
    assert a == b == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_cc_empty_edges(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_cc_nonconvergence_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(10)],
                               "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=2, fallback="raise")


def test_dedup_retention_keep_best_per_cluster(spark):
    """End-to-end retention composition: near-dup pairs -> connected
    components -> keep the highest-quality doc per cluster (ties by
    lowest doc_id). This is the full dedup decision a training-data
    pipeline ships: cluster labels from the graph pass + one
    dedup_latest window."""
    from lyssandra_spark.operators.windows import dedup_latest

    docs = spark.createDataFrame(
        [(1, 0.9), (2, 0.95), (3, 0.2), (10, 0.5), (11, 0.5), (42, 0.7)],
        "doc_id long, quality double",
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    from lyssandra_spark.operators.graph import retain_best_per_cluster

    kept = retain_best_per_cluster(docs, edges)
    rows = kept.collect()
    # doc 42 is isolated -> survives as its own cluster; {10, 11} tie on
    # quality -> lowest id wins; {1,2,3} -> highest quality (2) wins
    assert {r["doc_id"] for r in rows} == {2, 10, 42}
    assert set(kept.columns) == {"doc_id", "quality", "component"}
    # the inlined historical composition (dedup_latest over cc labels)
    # stays equivalent
    cc = connected_components(edges)
    labeled = docs.join(
        cc.withColumnRenamed("id", "doc_id"), "doc_id", "left"
    ).withColumn("component", F.coalesce("component", "doc_id"))
    manual = dedup_latest(
        labeled.withColumn("neg_id", -F.col("doc_id")),
        ["component"], ["quality", "neg_id"],
    )
    assert {r["doc_id"] for r in manual.collect()} == {2, 10, 42}
