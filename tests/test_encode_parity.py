"""Distributed == local parity and zero-leakage tests (SURVEY.md §5.2-2/3).

The Spark mapInArrow path must produce feature vectors allclose
(rtol=1e-6, atol=1e-8) to the single-node numpy oracle at every
(conv_id, turn_idx, ts), match dict_version exactly, and never use a
dictionary version newer than ts.
"""

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lyssandra_spark.functions import kernels as K
from lyssandra_spark.functions.embed import embed_texts
from lyssandra_spark.operators.encode import encode_block, sparse_code
from lyssandra_spark.sources import synth


@pytest.fixture(scope="module")
def versions(sf_dir):
    return synth.build_dict_versions(sf_dir, n_atoms=128)


@pytest.fixture(scope="module")
def tdf(spark, sf_dir):
    return synth.transcripts(spark, sf_dir).cache()


def _spark_codes(spark, tdf, versions, algo, **kw):
    coded = sparse_code(tdf, versions, algo=algo, **kw)
    return coded.select(
        "conv_id", "turn_idx", "ts", "text", "dict_version",
        "code_idx", "code_val", "recon_err", "nnz",
    ).toPandas()


def _oracle(pdf, versions, algo, **kw):
    ts_us = pdf["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
    return encode_block(pdf["text"].tolist(), ts_us, versions, algo=algo, **kw)


@pytest.mark.parametrize("algo,kw", [
    ("bomp", {"k": 5}),
    ("fista", {"lam": 0.1}),
    ("llc", {"knn": 5}),
])
def test_spark_matches_numpy_oracle(spark, tdf, versions, algo, kw):
    got = _spark_codes(spark, tdf.limit(800).repartition(7), versions, algo, **kw)
    got = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    ora = _oracle(got, versions, algo, **kw)

    assert (got["dict_version"].to_numpy() == ora["dict_version"]).all()
    assert (got["nnz"].to_numpy() == ora["nnz"]).all()
    assert np.allclose(got["recon_err"].to_numpy(), ora["recon_err"],
                       rtol=1e-6, atol=1e-8)
    off = ora["offsets"]
    for i in range(len(got)):
        oi = ora["code_idx"][off[i]: off[i + 1]]
        ov = ora["code_val"][off[i]: off[i + 1]]
        assert np.array_equal(np.asarray(got["code_idx"][i]), oi), f"row {i}"
        assert np.allclose(np.asarray(got["code_val"][i]), ov,
                           rtol=1e-6, atol=1e-8), f"row {i}"


def test_parity_across_parallelism(spark, tdf, versions):
    """Same result under different partition counts (batch-boundary invariance)."""
    a = _spark_codes(spark, tdf.limit(500).coalesce(1), versions, "bomp", k=5)
    b = _spark_codes(spark, tdf.limit(500).repartition(13), versions, "bomp", k=5)
    a = a.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = b.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert (a["dict_version"] == b["dict_version"]).all()
    for i in range(len(a)):
        assert np.array_equal(np.asarray(a["code_idx"][i]), np.asarray(b["code_idx"][i]))
        assert np.allclose(np.asarray(a["code_val"][i]), np.asarray(b["code_val"][i]),
                           rtol=1e-9, atol=1e-11)


def test_sparsity_and_reconstruction(spark, tdf, versions):
    got = _spark_codes(spark, tdf.limit(300), versions, "bomp", k=5)
    assert (got["nnz"] <= 5).all()
    # codes reconstruct the embeddings: err computed in-kernel must equal
    # an independent recomputation here
    X = embed_texts(got["text"].tolist()).T
    vmap = {v.version: v.D for v in versions}
    for i in range(len(got)):
        D = vmap[got["dict_version"][i]]
        z = np.zeros(D.shape[1])
        z[np.asarray(got["code_idx"][i], dtype=int)] = np.asarray(got["code_val"][i])
        err = np.linalg.norm(X[:, i] - D @ z)
        assert abs(err - got["recon_err"][i]) < 1e-8


def test_zero_leakage_version_assignment(spark, versions):
    """Adversarial fixture: version boundary mid-conversation; every turn
    must be coded under the version valid as-of its ts, never a newer one."""
    b2 = dt.datetime.fromisoformat(synth.VERSION_BOUNDARIES[1])
    rows = []
    for i in range(40):
        rows.append((
            "adv-1", i, "user", f"turn number {i} spark window join",
            None, b2 + dt.timedelta(minutes=i - 20),
        ))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    df = spark.createDataFrame(pdf)
    got = _spark_codes(spark, df, versions, "bomp", k=5)
    got = got.sort_values("turn_idx").reset_index(drop=True)
    ts_us = got["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
    for i in range(len(got)):
        expected_version = 1 if ts_us[i] < versions[1].valid_from_us else 2
        assert got["dict_version"][i] == expected_version
    # turns before the boundary must equal encoding under v1 EXACTLY
    pre = got[got["dict_version"] == 1]
    X = embed_texts(pre["text"].tolist()).T
    Z1 = K.batch_omp(versions[0].D, X, k=5, G=versions[0].G)
    for j, (_, r) in enumerate(pre.iterrows()):
        nz = np.nonzero(np.abs(Z1[:, j]) > 1e-12)[0]
        assert np.array_equal(np.asarray(r["code_idx"], dtype=int), nz)
        assert np.allclose(np.asarray(r["code_val"]), Z1[nz, j], rtol=1e-9)
    # and must NOT all equal encoding under v2 (the test has teeth)
    Z2 = K.batch_omp(versions[1].D, X, k=5, G=versions[1].G)
    assert not np.allclose(Z1, Z2)


def test_ts_before_any_version_gets_null_code(spark, versions):
    pdf = pd.DataFrame(
        [("old-1", 0, "user", "ancient text", None,
          dt.datetime(2020, 1, 1))],
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
    )
    got = _spark_codes(spark, spark.createDataFrame(pdf), versions, "bomp", k=5)
    assert got["dict_version"][0] == -1 and got["nnz"][0] == 0


def test_text_passthrough_equality(spark, tdf, versions):
    """Per-row invariant: the engine never reorders/clobbers payload columns
    under stable (conv_id, turn_idx) ordering (BASELINE.json input_hint)."""
    src = tdf.limit(400)
    coded = sparse_code(src, versions, algo="bomp", k=5)
    a = src.select("conv_id", "turn_idx", "text").sort("conv_id", "turn_idx").toPandas()
    b = coded.select("conv_id", "turn_idx", "text").sort("conv_id", "turn_idx").toPandas()
    pd.testing.assert_frame_equal(a, b)


def test_keyed_dictionaries(spark, sf_dir):
    """Multiple dict_id histories: each row coded under the as-of version
    of ITS dictionary; unknown dict_id -> null code."""
    import datetime as dt

    from lyssandra_spark.sources.synth import DictVersion

    rng = np.random.default_rng(3)
    def mk(did, ver, day, seed):
        D = K.normalize_cols(np.random.default_rng(seed).standard_normal((64, 32)))
        us = int(dt.datetime(2024, 1, day, tzinfo=dt.timezone.utc).timestamp() * 1e6)
        return DictVersion(did, ver, us, D, D.T @ D)

    versions = [mk("da", 1, 1, 10), mk("da", 2, 10, 11),
                mk("db", 1, 5, 20)]
    rows = [
        ("c", 0, "alpha text one", dt.datetime(2024, 1, 3), "da"),   # da v1
        ("c", 1, "alpha text one", dt.datetime(2024, 1, 12), "da"),  # da v2
        ("c", 2, "alpha text one", dt.datetime(2024, 1, 12), "db"),  # db v1
        ("c", 3, "alpha text one", dt.datetime(2024, 1, 2), "db"),   # before db v1
        ("c", 4, "alpha text one", dt.datetime(2024, 1, 12), "dx"),  # unknown
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text", "ts", "dict_id"])
    out = (
        sparse_code(spark.createDataFrame(pdf), versions, k=3, dict_id_col="dict_id")
        .toPandas().sort_values("turn_idx").reset_index(drop=True)
    )
    assert out["dict_version"].tolist() == [1, 2, 1, -1, -1]
    # same text, same ts, different dict -> different codes (rows 1 vs 2)
    assert not np.array_equal(
        np.asarray(out["code_val"][1]), np.asarray(out["code_val"][2])
    )
    # numpy oracle agreement for row 0 under da v1
    X = embed_texts([rows[0][2]]).T
    Z = K.batch_omp(versions[0].D, X, k=3, G=versions[0].G)
    nz = np.nonzero(np.abs(Z[:, 0]) > 1e-12)[0]
    assert np.array_equal(np.asarray(out["code_idx"][0], dtype=int), nz)


def test_encode_block_version_order_invariant(versions):
    """encode_block must resolve as-of versions correctly even when the
    caller passes the version list out of valid_from order (the internal
    searchsorted sorts; ADVICE.md regression)."""
    texts = [f"turn number {i} payload words" for i in range(40)]
    lo = min(v.valid_from_us for v in versions)
    hi = max(v.valid_from_us for v in versions)
    ts_us = np.linspace(lo - 10, hi + 10_000_000, 40).astype(np.int64)
    a = encode_block(texts, ts_us, list(versions), algo="bomp", k=5)
    b = encode_block(texts, ts_us, list(reversed(versions)), algo="bomp", k=5)
    np.testing.assert_array_equal(a["dict_version"], b["dict_version"])
    np.testing.assert_allclose(a["code_val"], b["code_val"])
    np.testing.assert_array_equal(a["code_idx"], b["code_idx"])


def test_embed_buffer_block_invariance_bit_exact():
    """Cache-blocked embed accumulation is BIT-identical for any block
    size: bincount weights are exactly +-1.0 whose float64 partial sums
    are exact integers, so chunking cannot change the output."""
    import numpy as np

    from lyssandra_spark.functions.embed import embed_buffer

    rng = np.random.default_rng(7)
    texts = [
        "".join(chr(97 + int(c)) for c in rng.integers(0, 26, size=int(ln)))
        for ln in rng.integers(0, 500, size=3000)
    ]
    enc = [t.encode() for t in texts]
    off = np.zeros(len(enc) + 1, np.int64)
    np.cumsum([len(e) for e in enc], out=off[1:])
    data = np.frombuffer(b"".join(enc), np.uint8)
    ref = embed_buffer(data, off, block=10**9)  # unblocked
    for blk in (1, 17, 256, 1024, 2999):
        got = embed_buffer(data, off, block=blk)
        assert np.array_equal(got, ref), f"block={blk} diverged"
