"""SemDeDup (Abbas et al. 2023): independent numpy oracle parity on
fixed centroids, planted exact/near duplicates, keep-rule semantics
(lowest centroid similarity wins), threshold edges, zero-norm rows,
oversized-cell sub-clustering, partitioning independence."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lyssandra_spark.operators.semdedup import semdedup

CENTROIDS = np.array([[1.0, 0.0], [0.0, 1.0]])


def _vecs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": [r[0] for r in rows],
                "embedding": [list(map(float, r[1])) for r in rows],
            }
        )
    )


def _oracle(rows, C, threshold):
    """Independent recompute: assign to nearest centroid (euclidean),
    union >=threshold cosine pairs within a cell, keep the lowest
    centroid-cosine member (ties: smallest id)."""
    ids = np.array([r[0] for r in rows])
    X = np.array([r[1] for r in rows], dtype=float)
    cell = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1).argmin(1)
    nrm = np.linalg.norm(X, axis=1)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    keep, group = {}, {}
    for c in np.unique(cell):
        sel = np.where(cell == c)[0]
        ok = sel[nrm[sel] > 0]
        Xn = X[ok] / nrm[ok, None]
        csim = Xn @ Cn[c]
        # union-find over threshold pairs
        parent = {int(i): int(i) for i in ok}

        def find(i):
            while parent[i] != i:
                i = parent[i]
            return i

        for a in range(len(ok)):
            for b in range(a + 1, len(ok)):
                if Xn[a] @ Xn[b] >= threshold:
                    ra, rb = find(int(ok[a])), find(int(ok[b]))
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        comps = {}
        for a, i in enumerate(ok):
            comps.setdefault(find(int(i)), []).append((csim[a], int(i)))
        for members in comps.values():
            gid = min(ids[i] for _, i in members)
            best = min(members, key=lambda t: (t[0], ids[t[1]]))
            for s, i in members:
                group[ids[i]] = gid
                keep[ids[i]] = i == best[1]
        for i in sel[nrm[sel] == 0]:  # zero-norm: own singleton
            group[ids[i]] = ids[i]
            keep[ids[i]] = True
    return group, keep


ROWS = [
    (0, (1.0, 0.01)),
    (1, (1.0, 0.011)),    # near-dup of 0
    (2, (0.9, 0.4)),      # same cell, below threshold
    (3, (0.02, 1.0)),
    (4, (0.021, 1.0)),    # near-dup of 3, other cell
    (5, (0.5, 0.9)),      # cell 1, distinct
    (6, (0.0, 0.0)),      # zero-norm
    (7, (2.0, 0.02)),     # scaled copy of 0's direction -> cosine dup
]


def test_matches_numpy_oracle(spark):
    got = {
        r["vec_id"]: r
        for r in semdedup(
            _vecs(spark, ROWS), threshold=0.999, centroids=CENTROIDS
        ).collect()
    }
    grp, keep = _oracle(ROWS, CENTROIDS, 0.999)
    assert {i: r["sd_group"] for i, r in got.items()} == grp
    assert {i: r["keep"] for i, r in got.items()} == keep
    # planted structure: {0,1,7} one group, {3,4} one group, one keeper each
    assert got[0]["sd_group"] == got[1]["sd_group"] == got[7]["sd_group"] == 0
    assert got[3]["sd_group"] == got[4]["sd_group"] == 3
    assert sum(got[i]["keep"] for i in (0, 1, 7)) == 1
    assert sum(got[i]["keep"] for i in (3, 4)) == 1
    assert got[2]["keep"] and got[5]["keep"] and got[6]["keep"]


def test_keeper_is_lowest_centroid_sim(spark):
    # 0 and 1 are cosine-identical; 1 points slightly further from the
    # cell-0 centroid -> lower centroid sim -> 1 is kept
    rows = [(0, (1.0, 0.0)), (1, (0.98, 0.199)), (2, (0.99, 0.1))]
    got = {
        r["vec_id"]: r
        for r in semdedup(
            _vecs(spark, rows), threshold=0.98, centroids=CENTROIDS
        ).collect()
    }
    grp, keep = _oracle(rows, CENTROIDS, 0.98)
    assert {i: r["keep"] for i, r in got.items()} == keep
    kept = [i for i, r in got.items() if r["keep"] and r["sd_group"] == 0]
    assert kept == [1]


def test_threshold_above_one_keeps_everything(spark):
    got = semdedup(
        _vecs(spark, ROWS), threshold=1.0001, centroids=CENTROIDS
    ).collect()
    assert all(r["keep"] for r in got)
    assert all(r["sd_group"] == r["vec_id"] for r in got)


def test_oversized_cell_subclustering_still_catches_exact_dups(spark):
    # 30 rows in one cell, max_cell=8 forces the in-worker split;
    # exact duplicates share a vector so they always co-assign
    rng = np.random.default_rng(5)
    base = [(i, tuple(rng.normal(size=2) + np.array([10, 0]))) for i in range(28)]
    rows = base + [(100, base[0][1]), (101, base[3][1])]
    got = {
        r["vec_id"]: r
        for r in semdedup(
            _vecs(spark, rows),
            threshold=1.0 - 1e-12,
            centroids=np.array([[10.0, 0.0], [0.0, 10.0]]),
            max_cell=8,
        ).collect()
    }
    assert got[100]["sd_group"] == got[0]["sd_group"] == 0
    assert got[101]["sd_group"] == got[3]["sd_group"] == 3
    assert sum(got[i]["keep"] for i in (0, 100)) == 1
    assert sum(got[i]["keep"] for i in (3, 101)) == 1


def test_partitioning_independent(spark):
    df = _vecs(spark, ROWS)
    a = sorted(
        map(tuple, semdedup(df, threshold=0.999, centroids=CENTROIDS)
            .select("vec_id", "sd_group", "keep").collect())
    )
    b = sorted(
        map(tuple, semdedup(df.repartition(5), threshold=0.999,
                            centroids=CENTROIDS)
            .select("vec_id", "sd_group", "keep").collect())
    )
    assert a == b


def test_partitioning_independent_oversized_cell(spark):
    """The sub-clustering path must also be arrival-order-free: the
    seeded centroid choice is positional, so rows are id-sorted before
    _local_subcells ever sees them."""
    rng = np.random.default_rng(11)
    rows = [
        (i, tuple(rng.normal(size=2) + np.array([10, 0])))
        for i in range(40)
    ] + [(100 + i, tuple(rng.normal(size=2) + np.array([10, 0])))
         for i in range(8)]
    kw = dict(threshold=0.995,
              centroids=np.array([[10.0, 0.0], [0.0, 10.0]]), max_cell=12)
    df = _vecs(spark, rows)
    a = sorted(map(tuple, semdedup(df, **kw)
                   .select("vec_id", "sd_group", "keep").collect()))
    b = sorted(map(tuple, semdedup(df.repartition(7), **kw)
                   .select("vec_id", "sd_group", "keep").collect()))
    c = sorted(map(tuple,
                   semdedup(df.orderBy(F.col("vec_id").desc()), **kw)
                   .select("vec_id", "sd_group", "keep").collect()))
    assert a == b == c


def test_trained_centroids_path_runs(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200)
    out = semdedup(emb, n_clusters=4, threshold=0.95, sample_rows=64)
    rows = out.collect()
    assert len(rows) == 200
    assert all(r["keep"] in (True, False) for r in rows)
    # one keeper per group
    kept = {}
    for r in rows:
        kept.setdefault((r["cell"], r["sd_group"]), 0)
        kept[(r["cell"], r["sd_group"])] += int(r["keep"])
    assert all(v == 1 for v in kept.values())


def test_param_validation(spark):
    df = _vecs(spark, ROWS[:2])
    with pytest.raises(ValueError, match="threshold"):
        semdedup(df, threshold=0.0, centroids=CENTROIDS)
    with pytest.raises(ValueError, match="max_cell"):
        semdedup(df, max_cell=1, centroids=CENTROIDS)


def test_random_corpus_oracle_sweep(spark):
    """Randomized embeddings x thresholds: batch semdedup always
    matches the independent numpy oracle exactly."""
    rng = np.random.default_rng(3)
    for trial, thr in enumerate((0.8, 0.95, 0.999)):
        n = 24
        base = rng.normal(size=(n, 2)) * 2
        # plant duplicates: scaled copies of random rows
        for j in range(4):
            src = rng.integers(0, n)
            base = np.vstack([base, base[src] * rng.uniform(0.5, 2.0)])
        rows = [(i, tuple(v)) for i, v in enumerate(base)]
        got = sorted(
            map(
                tuple,
                semdedup(
                    _vecs(spark, rows), threshold=thr, centroids=CENTROIDS
                ).select("vec_id", "sd_group", "keep").collect(),
            )
        )
        grp, keep = _oracle(rows, CENTROIDS, thr)
        want = sorted((i, grp[i], keep[i]) for i, _ in rows)
        assert got == want, f"trial {trial} thr {thr}"


# ---------------------------------------------------------------- online


def _online_oracle(rows, C, threshold):
    """Independent greedy recompute of the online contract: process
    rows in arrival order (batch order, id order within a batch); a
    row is dropped iff >= threshold cosine to an already-RETAINED row
    of its cell; dup_of = the retained row with max similarity."""
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    kept = {}  # cell -> list of (id, unit vec)
    out = {}
    for rid, v in rows:
        x = np.asarray(v, dtype=float)
        cell = int(((x[None, :] - C) ** 2).sum(1).argmin())
        nx = np.linalg.norm(x)
        keep, dup_of = True, None
        exem = kept.setdefault(cell, [])
        if nx > 0 and exem:
            sims = np.stack([u for _, u in exem]) @ (x / nx)
            j = int(sims.argmax())
            if sims[j] >= threshold:
                keep, dup_of = False, exem[j][0]
        if keep and nx > 0:
            exem.append((rid, x / nx))
        out[rid] = (keep, dup_of)
    return out


ONLINE_ROWS = [
    (0, (1.0, 0.0)),
    (1, (1.0, 0.001)),    # dup of 0
    (2, (0.7, 0.7)),
    (3, (0.0, 1.0)),
    (10, (0.999, 0.002)),  # dup of 0 (arrives batch 2)
    (11, (0.0, 0.0)),      # zero-norm: always kept
    (12, (0.01, 1.0)),     # dup of 3
    (20, (0.7, 0.701)),    # dup of 2 (arrives batch 3)
    (21, (-1.0, 0.05)),
]


def _catalog(spark, tmp_path, name):
    from lyssandra_spark.sources.catalog import ParquetCatalog

    return ParquetCatalog(spark, str(tmp_path / name))


def test_shares_ivf_index_clustering(spark, sf_dir, tmp_path):
    """One clustering serves search AND dedup: semdedup run under the
    persisted IVF index's centroids assigns every vector the same cell
    the index did."""
    from lyssandra_spark.operators.ann_index import refresh_ivf_index
    from lyssandra_spark.sources.catalog import ParquetCatalog

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200)
    cat = ParquetCatalog(spark, str(tmp_path / "ivf_share"))
    cat.write(emb, "vecs", mode="overwrite")
    refresh_ivf_index(cat, "vecs", "ivf", n_cells=8, sample_rows=64)
    C = np.asarray(
        cat.latest_meta("ivf", "centroids")["centroids"], dtype=np.float64
    )
    idx_cells = {
        r["vec_id"]: r["cell"] for r in cat.read("ivf").collect()
    }
    sd_cells = {
        r["vec_id"]: r["cell"]
        for r in semdedup(emb, threshold=0.95, centroids=C).collect()
    }
    assert sd_cells == idx_cells


def test_online_matches_oracle_and_batch_split_invariant(spark, tmp_path):
    from lyssandra_spark.operators.semdedup import semdedup_new_batch

    thr = 0.9999
    want = _online_oracle(ONLINE_ROWS, CENTROIDS, thr)

    # three id-ordered batches, sequentially
    cat = _catalog(spark, tmp_path, "seq")
    got = {}
    for lo, hi in ((0, 10), (10, 20), (20, 30)):
        batch = [r for r in ONLINE_ROWS if lo <= r[0] < hi]
        dec, _ = semdedup_new_batch(
            cat, "sd", _vecs(spark, batch), threshold=thr,
            centroids=CENTROIDS if lo == 0 else None,
        )
        for r in dec.collect():
            got[r["vec_id"]] = (r["keep"], r["dup_of"])
    assert got == want

    # the union processed as ONE batch gives the same decisions
    cat1 = _catalog(spark, tmp_path, "one")
    dec, _ = semdedup_new_batch(
        cat1, "sd", _vecs(spark, ONLINE_ROWS), threshold=thr,
        centroids=CENTROIDS,
    )
    got1 = {r["vec_id"]: (r["keep"], r["dup_of"]) for r in dec.collect()}
    assert got1 == want

    # exemplar view: every dropped row points at a kept row in its cell
    full = cat.read("sd").collect()
    keep_ids = {r["vec_id"] for r in full if r["keep"]}
    for r in full:
        if not r["keep"]:
            assert r["dup_of"] in keep_ids


def test_online_random_batch_splits_match_oracle(spark, tmp_path):
    """Random id-ordered batch boundaries never change the decisions:
    every split of the same arrival order equals the greedy oracle."""
    import random

    from lyssandra_spark.operators.semdedup import semdedup_new_batch

    rnd = random.Random(13)
    rng = np.random.default_rng(13)
    rows = []
    for i in range(30):
        if i >= 3 and rnd.random() < 0.3:
            src = rnd.randrange(0, i)  # near-copy of an earlier row
            v = np.asarray(rows[src][1]) * rnd.uniform(0.9, 1.1)
        else:
            v = rng.normal(size=2) * 3
        rows.append((i, tuple(float(x) for x in v)))
    thr = 0.98
    want = _online_oracle(rows, CENTROIDS, thr)

    for trial in range(2):
        cuts = sorted(rnd.sample(range(1, 30), rnd.randrange(1, 4)))
        bounds = [0] + cuts + [30]
        cat = _catalog(spark, tmp_path, f"rsplit{trial}")
        got = {}
        for k in range(len(bounds) - 1):
            batch = rows[bounds[k]:bounds[k + 1]]
            dec, _ = semdedup_new_batch(
                cat, "sd", _vecs(spark, batch), threshold=thr,
                centroids=CENTROIDS if k == 0 else None,
            )
            for r in dec.collect():
                got[r["vec_id"]] = (r["keep"], r["dup_of"])
        assert got == want, f"trial {trial} bounds {bounds}"


def test_online_retry_and_reingest(spark, tmp_path):
    from lyssandra_spark.operators.semdedup import semdedup_new_batch

    cat = _catalog(spark, tmp_path, "retry")
    b1 = [r for r in ONLINE_ROWS if r[0] < 10]
    _, s1 = semdedup_new_batch(
        cat, "sd", _vecs(spark, b1), threshold=0.9999,
        centroids=CENTROIDS, batch_id="b1",
    )
    # retry with the same batch_id replays the same snapshot, no append
    dec, s1b = semdedup_new_batch(
        cat, "sd", _vecs(spark, b1), threshold=0.9999, batch_id="b1",
    )
    assert s1b == s1 and len(cat.snapshots("sd")) == 1
    assert {r["vec_id"] for r in dec.collect()} == {r[0] for r in b1}
    # re-ingesting already-indexed ids (new batch_id) decides nothing
    dec2, _ = semdedup_new_batch(
        cat, "sd", _vecs(spark, b1), threshold=0.9999, batch_id="b2",
    )
    assert dec2.count() == 0


def test_online_spec_drift_and_frozen_centroids(spark, tmp_path):
    from lyssandra_spark.operators.semdedup import semdedup_new_batch

    cat = _catalog(spark, tmp_path, "drift")
    b1 = [r for r in ONLINE_ROWS if r[0] < 10]
    semdedup_new_batch(
        cat, "sd", _vecs(spark, b1), threshold=0.9, centroids=CENTROIDS
    )
    with pytest.raises(ValueError, match="semdedup_params"):
        semdedup_new_batch(
            cat, "sd", _vecs(spark, ONLINE_ROWS), threshold=0.8
        )
    with pytest.raises(ValueError, match="frozen at bootstrap"):
        semdedup_new_batch(
            cat, "sd", _vecs(spark, ONLINE_ROWS), threshold=0.9,
            centroids=CENTROIDS,
        )


# ---------------------------------------------------------------- round 9
# drift-ACT path: semdedup_rebootstrap / auto_rebootstrap


def _dir_clusters(rng, dim, axes, n_per, noise=0.05):
    """Rows clustered around unit axes — the drift-test corpus shape."""
    out = []
    for ax in axes:
        base = np.zeros(dim)
        base[ax] = 1.0
        out.append(base + rng.normal(size=(n_per, dim)) * noise)
    return np.vstack(out)


def _mat_df(spark, mat, id0):
    return spark.createDataFrame(
        [(id0 + i, [float(v) for v in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<double>",
    )


def _boundary_oracle(batches_with_C, thr):
    """Greedy online oracle ACROSS a rebootstrap boundary: each batch
    is admitted under ITS centroid set; the retained exemplar set is
    global, re-bucketed per batch under the centroids current at that
    point (cells from raw vectors, squared-L2 argmin, stable ties)."""
    kept = []  # (id, raw vector) in admission order
    out = {}
    for rows, C in batches_with_C:
        C = np.asarray(C, dtype=float)
        for rid, v in sorted(rows):
            x = np.asarray(v, dtype=float)
            cell = int(((x[None, :] - C) ** 2).sum(1).argmin())
            nx = np.linalg.norm(x)
            exem = []
            for kid, kv in kept:
                kcell = int(((kv[None, :] - C) ** 2).sum(1).argmin())
                if kcell == cell:
                    kn = np.linalg.norm(kv)
                    exem.append((kid, kv / kn if kn > 0 else kv))
            keep, dup_of = True, None
            if nx > 0 and exem:
                sims = np.stack([u for _, u in exem]) @ (x / nx)
                j = int(sims.argmax())
                if sims[j] >= thr:
                    keep, dup_of = False, exem[j][0]
            if keep and nx > 0:
                kept.append((rid, x))
            out[rid] = (keep, dup_of)
    return out


def test_rebootstrap_refreshes_clustering_preserves_decisions(
    spark, tmp_path
):
    """semdedup_rebootstrap: decisions (keep/dup_of/max_sim) are
    HISTORY and survive byte-for-byte; cells are reassigned under the
    new centroids (numpy-checked); the drift baseline is fresh (the
    signal the drifted batch raised is cleared); the params identity
    survives so the chain keeps accepting batches."""
    from lyssandra_spark.operators.ann_index import needs_retrain
    from lyssandra_spark.operators.semdedup import (
        semdedup_new_batch,
        semdedup_rebootstrap,
    )

    rng = np.random.default_rng(17)
    thr = 0.95
    kw = dict(n_clusters=4, sample_rows=256, threshold=thr)
    cat = _catalog(spark, tmp_path, "rb")

    semdedup_new_batch(
        cat, "sd", _mat_df(spark, _dir_clusters(rng, 6, [0, 1], 50), 0),
        **kw,
    )
    semdedup_new_batch(
        cat, "sd", _mat_df(spark, _dir_clusters(rng, 6, [3], 50), 1000),
        **kw,
    )
    assert needs_retrain(cat, "sd", threshold=2.0) is True  # drifted

    before = {
        r["vec_id"]: (r["keep"], r["dup_of"], r["max_sim"])
        for r in cat.read("sd").collect()
    }
    c_old = cat.latest_meta("sd", "centroids")["centroids"]

    semdedup_rebootstrap(cat, "sd")

    snaps = cat.snapshots("sd")
    assert snaps[-1]["mode"] == "overwrite"
    c_new = np.asarray(
        cat.latest_meta("sd", "centroids")["centroids"], dtype=float
    )
    assert c_new.tolist() != c_old
    # fresh baseline: the exemplars' own error under the new clustering
    assert needs_retrain(cat, "sd", threshold=2.0) is False
    d = cat.latest_meta("sd", "semdedup_drift")["semdedup_drift"]
    assert d["mean_qerr"] == d["baseline_qerr"]

    after = cat.read("sd").collect()
    assert len(after) == len(before)
    for r in after:
        assert before[r["vec_id"]] == (r["keep"], r["dup_of"], r["max_sim"])
        x = np.asarray(r["embedding"], dtype=float)
        want_cell = int(((x[None, :] - c_new) ** 2).sum(1).argmin())
        assert r["cell"] == want_cell

    # the chain still accepts batches under the same params
    dec, _ = semdedup_new_batch(
        cat, "sd", _mat_df(spark, _dir_clusters(rng, 6, [3], 5), 2000),
        **kw,
    )
    assert dec.count() == 5


def test_auto_rebootstrap_one_call_and_cross_boundary_parity(
    spark, tmp_path
):
    """auto_rebootstrap closes the maintain-or-rebootstrap loop in ONE
    call (the drifted batch lands, then the clustering refreshes), the
    batch's decisions equal the plain greedy run (the rebootstrap can
    never rewrite history), and the NEXT batch's admissions equal the
    cross-boundary greedy oracle (old centroids before the boundary,
    new after, exemplar set carried over)."""
    from lyssandra_spark.operators.ann_index import needs_retrain
    from lyssandra_spark.operators.semdedup import semdedup_new_batch

    rng = np.random.default_rng(23)
    thr = 0.95
    kw = dict(n_clusters=4, sample_rows=256, threshold=thr)

    b1 = _dir_clusters(rng, 6, [0, 1], 40)
    b2 = _dir_clusters(rng, 6, [3, 4], 40)  # drifted region
    b3 = _dir_clusters(rng, 6, [3, 4, 0], 15)  # post-boundary arrivals
    rows1 = [(i, list(map(float, v))) for i, v in enumerate(b1)]
    rows2 = [(1000 + i, list(map(float, v))) for i, v in enumerate(b2)]
    rows3 = [(2000 + i, list(map(float, v))) for i, v in enumerate(b3)]

    cat = _catalog(spark, tmp_path, "auto")
    semdedup_new_batch(cat, "sd", _mat_df(spark, b1, 0), **kw)
    c_old = np.asarray(
        cat.latest_meta("sd", "centroids")["centroids"], dtype=float
    )

    dec2, s2 = semdedup_new_batch(
        cat, "sd", _mat_df(spark, b2, 1000), auto_rebootstrap=2.0, **kw
    )
    # the rebootstrap fired inside the call: head is an overwrite with a
    # fresh sub-threshold baseline...
    assert cat.snapshots("sd")[-1]["mode"] == "overwrite"
    assert cat.snapshots("sd")[-1]["id"] > s2
    assert needs_retrain(cat, "sd", threshold=2.0) is False
    c_new = np.asarray(
        cat.latest_meta("sd", "centroids")["centroids"], dtype=float
    )
    # ...and the batch's decisions are exactly the plain greedy ones
    # under the OLD clustering (history is history)
    want12 = _boundary_oracle([(rows1, c_old), (rows2, c_old)], thr)
    got2 = {r["vec_id"]: (r["keep"], r["dup_of"]) for r in dec2.collect()}
    assert got2 == {i: want12[i] for i, _ in rows2}

    # the next batch admits under the NEW clustering with the carried
    # exemplar set — the cross-boundary oracle
    dec3, _ = semdedup_new_batch(cat, "sd", _mat_df(spark, b3, 2000), **kw)
    want = _boundary_oracle(
        [(rows1, c_old), (rows2, c_old), (rows3, c_new)], thr
    )
    got3 = {r["vec_id"]: (r["keep"], r["dup_of"]) for r in dec3.collect()}
    assert got3 == {i: want[i] for i, _ in rows3}
    assert sum(1 for k, _ in got3.values() if not k) > 0  # dups found


def test_rebootstrap_arms_disarmed_baseline(spark, tmp_path):
    """A chain bootstrapped with drift_metrics=False must stay LOUDLY
    disarmed — later batches write no self-seeded baseline (the round-9
    ADVICE fix), needs_retrain raises, auto_rebootstrap refuses — until
    semdedup_rebootstrap re-arms it with an honest baseline."""
    from lyssandra_spark.operators.ann_index import needs_retrain
    from lyssandra_spark.operators.semdedup import (
        semdedup_new_batch,
        semdedup_rebootstrap,
    )

    rng = np.random.default_rng(31)
    kw = dict(n_clusters=4, sample_rows=256, threshold=0.95)
    cat = _catalog(spark, tmp_path, "arm")

    semdedup_new_batch(
        cat, "sd", _mat_df(spark, _dir_clusters(rng, 6, [0, 1], 40), 0),
        drift_metrics=False, **kw,
    )
    # default drift_metrics=True on the next batch: NO record appears
    # (a baseline seeded from this possibly-drifted batch would disarm
    # the signal silently)
    semdedup_new_batch(
        cat, "sd", _mat_df(spark, _dir_clusters(rng, 6, [3], 40), 1000),
        **kw,
    )
    assert cat.latest_meta("sd", "semdedup_drift") is None
    with pytest.raises(ValueError, match="no drift metrics"):
        needs_retrain(cat, "sd")
    with pytest.raises(ValueError, match="baseline"):
        semdedup_new_batch(
            cat, "sd",
            _mat_df(spark, _dir_clusters(rng, 6, [3], 5), 2000),
            auto_rebootstrap=2.0, **kw,
        )
    with pytest.raises(ValueError, match="drift_metrics"):
        semdedup_new_batch(
            cat, "sd",
            _mat_df(spark, _dir_clusters(rng, 6, [3], 5), 3000),
            drift_metrics=False, auto_rebootstrap=2.0, **kw,
        )

    semdedup_rebootstrap(cat, "sd")  # re-arms with an honest baseline
    assert needs_retrain(cat, "sd", threshold=2.0) is False
    d0 = cat.latest_meta("sd", "semdedup_drift")["semdedup_drift"]

    semdedup_new_batch(
        cat, "sd", _mat_df(spark, _dir_clusters(rng, 6, [3], 10), 4000),
        **kw,
    )
    d1 = cat.latest_meta("sd", "semdedup_drift")["semdedup_drift"]
    assert d1["baseline_qerr"] == d0["baseline_qerr"]  # carried forward
