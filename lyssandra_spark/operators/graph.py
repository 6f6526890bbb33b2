"""Connected components over near-duplicate pair edges.

The missing last step of every dedup pipeline: pair emitters (MinHash
LSH, SimHash banding, embedding LSH) produce EDGES, but retention
decisions need CLUSTERS — "keep one doc per component". This operator
turns an (id_a, id_b) edge table into (id, component) labels, where the
component id is the minimum vertex id reachable (a deterministic
canonical representative).

Algorithm: min-label propagation — every vertex repeatedly takes the
minimum label among itself and its neighbors until a fixpoint. Each
iteration is ONE keyed shuffle (join labels to the symmetric edge list +
groupBy min), so total cost is O(component diameter) shuffles. Near-dup
components are shallow (dups of dups of one original), so this converges
in a handful of rounds. For adversarially deep graphs (the long-chain
duplicate structure) the operator now FALLS BACK, after ``max_iter``
stalled rounds, to the large-star/small-star contraction (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC 2014):
alternating rounds where every vertex hangs its larger neighbors
(large-star) / its smaller neighbors and itself (small-star) onto its
minimum neighbor. Both operations preserve connectivity, every
component contracts to a star centered at its minimum id in
O(log^2 n) rounds regardless of diameter, and each round is a constant
number of keyed shuffles over a (shrinking) edge set — so a 10^12-edge
chain completes instead of raising. The per-iteration convergence
checks are scalar aggregates (changed-label count; edge-set
count + hash-sum), never a label collect.

Iterative DataFrame loops grow the logical plan without bound;
``localCheckpoint`` truncates lineage each round (on a real cluster with
unreliable executors, set a checkpoint dir and use ``checkpoint``
instead — the loop structure is identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "connected_components",
    "retain_best_per_cluster",
    "retain_best_with_labels",
]


def _canon(e: DataFrame) -> DataFrame:
    """Canonical undirected edge set: (u, v) with u < v, distinct."""
    return (
        e.select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _star_components(sym: DataFrame, labels: DataFrame,
                     max_rounds: int = 50) -> DataFrame:
    """Large-star/small-star contraction (Kiveris et al., SoCC 2014).

    Seeded with the min-label progress: each (id, component) label is an
    edge to an already-known reachable vertex, so prior rounds' work
    shortcuts chains here too. Every component contracts to a star
    centered at its minimum id in O(log^2 n) alternating rounds; the
    fixpoint test is two scalar aggregates (edge count + xxhash64 sum)
    per round — a star graph is a fixpoint of both operations.
    """
    def _digest(edge_df: DataFrame):
        # order-free edge-set fingerprint; the hash sum rides decimal(38,0)
        # so it cannot overflow under ANSI mode at any edge count
        row = edge_df.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    verts = labels.select("id")
    e = _canon(
        sym.unionByName(
            labels.select(F.col("id").alias("u"), F.col("component").alias("v"))
        )
    ).localCheckpoint(eager=True)
    before = _digest(e)
    for _ in range(max_rounds):
        # large-star: every vertex u connects its LARGER neighbors to
        # m(u) = min(neighbors(u) + {u})
        s = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = s.groupBy("u").agg(F.min("v").alias("__mn"))
        m = m.select("u", F.least("u", "__mn").alias("m"))
        ls = (
            s.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        e = _canon(ls).localCheckpoint(eager=True)
        # small-star: orient edges larger -> smaller; every vertex u
        # connects its smaller neighbors AND itself to their minimum
        o = e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        m2 = o.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            o.join(m2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(m2.select("u", F.col("m").alias("v")))
        )
        e = _canon(ss).localCheckpoint(eager=True)
        after = _digest(e)
        if before == after:
            # at the star fixpoint each non-center vertex has exactly one
            # (smaller) neighbor: the component center
            nbrs = e.select(F.col("u").alias("id"), F.col("v").alias("nbr")) \
                .unionByName(
                    e.select(F.col("v").alias("id"), F.col("u").alias("nbr"))
                )
            lab = nbrs.groupBy("id").agg(F.min("nbr").alias("__mn"))
            lab = lab.select("id", F.least("id", "__mn").alias("component"))
            # vertices whose component fully contracted away keep self-label
            return verts.join(lab, "id", "left").select(
                "id", F.coalesce("component", F.col("id")).alias("component")
            )
        before = after
    raise RuntimeError(
        f"star contraction did not reach a fixpoint in {max_rounds} rounds"
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    fallback: str = "star",
) -> DataFrame:
    """Label every vertex of the (undirected) edge table with the minimum
    vertex id in its connected component.

    Returns (id, component); only vertices that appear in ``edges`` are
    labeled (an isolated doc is its own trivial cluster and never needed
    the graph pass). If ``max_iter`` min-label rounds don't reach the
    fixpoint (an adversarially deep component — near-dup graphs normally
    converge in a handful of rounds), ``fallback='star'`` (default)
    switches to the large-star/small-star contraction, which finishes in
    O(log^2 n) further rounds regardless of diameter;
    ``fallback='raise'`` restores the historical fail-loudly behaviour.
    ``max_iter=0`` with the default fallback runs pure star contraction.
    """
    if fallback not in ("star", "raise"):
        raise ValueError(f"fallback {fallback!r}")
    # materialize the symmetric edge list once — every iteration joins it,
    # and without this each round re-reads + re-unions the source edges
    sym = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).unionByName(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    ).localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("u").alias("id")).distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(
                labels.select(F.col("id").alias("v"),
                              F.col("component").alias("vcomp")),
                "v",
            )
            .groupBy("u")
            .agg(F.min("vcomp").alias("nmin"))
        )
        # carry the previous label through the select so the convergence
        # probe is a filter+count on the checkpointed result — not an
        # extra labels-vs-new_labels shuffle join per round
        stepped = (
            labels.join(neighbor_min,
                        labels["id"] == neighbor_min["u"], "left")
            .select(
                "id",
                F.col("component").alias("prev"),
                F.least(F.col("component"),
                        F.coalesce(F.col("nmin"), F.col("component"))
                        ).alias("component"),
            )
            .localCheckpoint(eager=True)  # truncate iterative lineage
        )
        changed = stepped.where(F.col("component") != F.col("prev")).count()
        labels = stepped.drop("prev")
        if changed == 0:
            return labels
    if fallback == "star":
        return _star_components(sym, labels)
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "unexpectedly deep component chain; raise max_iter or use the "
        "default fallback='star' (large-star/small-star contraction)"
    )


def retain_best_per_cluster(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "quality",
    src: str = "id_a",
    dst: str = "id_b",
    **cc_kwargs,
) -> DataFrame:
    """The full near-dup retention decision a training pipeline ships:
    pairs -> connected components -> keep the best-scoring doc per
    cluster (ties broken by lowest id, deterministically; the id tie-break
    negates the column, so ids must be numeric — pass a numeric surrogate
    for string ids).

    Docs absent from ``pairs`` are their own singleton cluster and always
    survive. Returns ``docs``' rows (all columns) plus a ``component``
    label, one row per retained cluster. Scale shape: the graph pass
    touches only ids (never text/scores), then ONE keyed window over the
    cluster label — and near-dup clusters are small by construction
    (max_bucket-capped candidate generation upstream), so the window's
    per-key row count is bounded.
    """
    cc = connected_components(pairs, src=src, dst=dst, **cc_kwargs)
    return retain_best_with_labels(docs, cc, id_col=id_col,
                                   score_col=score_col)


def retain_best_with_labels(
    docs: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "quality",
) -> DataFrame:
    """Retention decision from PRE-COMPUTED ``(id, component)`` labels —
    the incremental pipeline's last stage: ``dedup_new_batch`` emits the
    batch's pairs, :func:`~lyssandra_spark.operators.incremental.update_components`
    folds them into the persisted label table, and this function turns
    the CURRENT labels into "keep the best doc per cluster" — no graph
    pass at all, so the daily retention refresh costs one broadcast-ish
    join + one bounded keyed window. Semantics are identical to
    :func:`retain_best_per_cluster` (which now delegates here after
    running CC): docs absent from ``labels`` are singleton clusters and
    always survive; ties break deterministically by lowest id (numeric
    ids — same caveat as retain_best_per_cluster).
    """
    from lyssandra_spark.operators.windows import dedup_latest

    labeled = docs.join(
        labels.withColumnRenamed("id", id_col), id_col, "left"
    ).withColumn("component", F.coalesce("component", F.col(id_col)))
    ranked = labeled.withColumn("__neg_id", -F.col(id_col))
    return dedup_latest(
        ranked, ["component"], [score_col, "__neg_id"]
    ).drop("__neg_id")
