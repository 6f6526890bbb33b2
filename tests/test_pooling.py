"""Pooling + linear probe (the encode -> pool -> classify pipeline shape).

Pooling is checked against a pandas oracle; the ridge probe must separate
a planted linearly-separable labeling of pooled sparse codes.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lyssandra_spark.operators.pooling import pool_codes, ridge_probe

N_ATOMS = 16


@pytest.fixture(scope="module")
def coded(spark):
    """Small synthetic CSR-coded table: 40 groups x 6 turns."""
    rng = np.random.default_rng(3)
    rows = []
    for g in range(40):
        for t in range(6):
            nnz = int(rng.integers(1, 5))
            idx = np.sort(rng.choice(N_ATOMS, size=nnz, replace=False))
            val = np.round(rng.standard_normal(nnz), 6)
            rows.append((f"conv-{g}", g % 3, [int(i) for i in idx],
                         [float(v) for v in val]))
    pdf = pd.DataFrame(rows, columns=["conv_id", "session_id", "code_idx", "code_val"])
    return spark.createDataFrame(pdf).repartition(5), pdf


@pytest.mark.parametrize("mode", ["max", "mean"])
def test_pool_matches_pandas_oracle(spark, coded, mode):
    sdf, pdf = coded
    got = pool_codes(sdf, N_ATOMS, mode=mode).toPandas()
    got = got.set_index(["conv_id", "session_id"]).sort_index()
    for (cid, sid), grp in pdf.groupby(["conv_id", "session_id"]):
        dense = np.zeros((len(grp), N_ATOMS))
        for r, (_, row) in enumerate(grp.iterrows()):
            dense[r, row.code_idx] = row.code_val
        exp = dense.max(axis=0) if mode == "max" else dense.sum(axis=0) / len(grp)
        # max over all-zero atom = 0 in the oracle; pooled skips zeros, so
        # negative-only atoms pool to the (negative) max of present values
        if mode == "max":
            present = dense != 0
            exp = np.where(
                present.any(axis=0),
                np.where(present, dense, -np.inf).max(axis=0),
                0.0,
            )
        np.testing.assert_allclose(
            got.loc[(cid, sid), "pooled"], exp, rtol=1e-9, atol=1e-12
        )


def test_pool_partition_invariant(spark, coded):
    sdf, _ = coded
    a = pool_codes(sdf.repartition(2), N_ATOMS).toPandas()
    b = pool_codes(sdf.repartition(13), N_ATOMS).toPandas()
    a = a.sort_values(["conv_id", "session_id"]).reset_index(drop=True)
    b = b.sort_values(["conv_id", "session_id"]).reset_index(drop=True)
    for x, y in zip(a["pooled"], b["pooled"]):
        np.testing.assert_allclose(list(x), list(y))


def test_ridge_probe_separates_planted_labels(spark, coded):
    """Labels planted from a fixed linear rule on pooled codes must be
    recoverable by the distributed closed-form probe (acc ~ 1)."""
    sdf, _ = coded
    pooled = pool_codes(sdf, N_ATOMS, mode="max")
    rng = np.random.default_rng(11)
    w_true = rng.standard_normal(N_ATOMS)
    wcol = F.array(*[F.lit(float(v)) for v in w_true])
    score = F.aggregate(
        F.zip_with("pooled", wcol, lambda a, b: a * b), F.lit(0.0),
        lambda acc, v: acc + v,
    )
    labeled = pooled.withColumn(
        "label", F.when(score >= 0, 1.0).otherwise(-1.0)
    )
    w, acc = ridge_probe(labeled, dim=N_ATOMS, lam=1e-6)
    assert acc >= 0.95, acc
    assert w.shape == (N_ATOMS + 1,)


def test_ridge_probe_stats_are_partition_invariant(spark, coded):
    sdf, _ = coded
    pooled = pool_codes(sdf, N_ATOMS).withColumn(
        "label", F.when(F.col("session_id") == 0, 1.0).otherwise(-1.0)
    )
    w1, a1 = ridge_probe(pooled.repartition(2), dim=N_ATOMS)
    w2, a2 = ridge_probe(pooled.repartition(9), dim=N_ATOMS)
    np.testing.assert_allclose(w1, w2, rtol=1e-9, atol=1e-12)
    assert a1 == a2


def test_pool_keeps_all_empty_code_groups(spark):
    """A group whose rows ALL have empty code arrays must pool to the zero
    vector, not vanish (explode drops its pairs entirely)."""
    pdf = pd.DataFrame({
        "conv_id": ["a", "a", "b"],
        "session_id": [0, 0, 0],
        "code_idx": [[], [], [1, 2]],
        "code_val": [[], [], [0.5, -0.5]],
    })
    got = pool_codes(spark.createDataFrame(pdf), 4).toPandas()
    assert len(got) == 2
    a = got[got.conv_id == "a"].iloc[0]
    assert list(a["pooled"]) == [0.0, 0.0, 0.0, 0.0]
    assert a["n_pooled"] == 2
