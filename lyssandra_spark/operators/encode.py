"""Point-in-time sparse-coding encode operator (the engine's flagship op).

Semantics (north rule): for each transcript turn, embed ``text`` and sparse
code it against the dictionary version valid **as of** ``ts`` (strict
``valid_from <= ts`` — zero temporal leakage by construction).

Spark-first design:

- the dictionary history (all versions + precomputed Grams) is tiny
  (n_atoms x dim ~ 64 KB/version) => ``SparkContext.broadcast`` once; each
  task resolves versions with a vectorized ``np.searchsorted`` over the
  batch's timestamps — no join, no shuffle, the scan stays pipelined.
- the Python crossing is a single ``mapInArrow``: one Arrow RecordBatch in,
  one out; the whole batch is encoded as one vectorized numpy call
  (Batch-OMP amortizes G across every sample of every batch of every task).
- per-sample independence of the kernels (kernels.py) makes the result
  invariant to partitioning / batch boundaries — distributed == local
  allclose is structural, not accidental.
- output codes are CSR-per-row (``code_idx:array<int>, code_val:array<double>``):
  k nonzeros instead of n_atoms floats — at 10^12 turns this is the
  difference between 40 TB and 1 PB of feature storage.

The same `_encode_block` body is the numpy oracle used by the parity tests.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from lyssandra_spark.functions import kernels as K
from lyssandra_spark.functions.embed import arrow_string_buffer, embed_buffer, embed_texts
from lyssandra_spark.sources.synth import DictVersion

__all__ = ["sparse_code", "encode_block"]


def encode_block(
    texts: list,
    ts_us: np.ndarray,
    versions: list[DictVersion],
    algo: str = "bomp",
    k: int = 5,
    lam: float = 0.1,
    knn: int = 5,
    embed_dim: int = 64,
    precomputed_X: np.ndarray | None = None,
    fista_iter: int = 500,
    fista_tol: float = 1e-10,
    dict_ids=None,
) -> dict[str, np.ndarray]:
    """Encode one batch of turns. Pure numpy — usable with or without Spark.

    Returns dict with: dict_version (int32, -1 if no valid version),
    code_idx/code_val (flattened CSR + offsets), recon_err, nnz.
    """
    n = len(ts_us)
    X = precomputed_X if precomputed_X is not None else embed_texts(texts, dim=embed_dim).T
    if dict_ids is not None:
        # keyed dictionaries: resolve per (dict_id, ts); rows with unknown
        # dict_id get no version (-1)
        by_id: dict = {}
        for i, v in enumerate(versions):
            by_id.setdefault(v.dict_id, []).append(i)
        for did in by_id:  # searchsorted needs per-dict ascending valid_from
            by_id[did].sort(key=lambda i: versions[i].valid_from_us)
        vidx = np.full(n, -1, dtype=np.int64)
        ids = np.asarray(dict_ids)
        ts_arr = np.asarray(ts_us, dtype=np.int64)
        for did, idxs in by_id.items():
            rows = np.nonzero(ids == did)[0]
            if rows.size == 0:
                continue
            vf = np.asarray([versions[i].valid_from_us for i in idxs], dtype=np.int64)
            local = np.searchsorted(vf, ts_arr[rows], side="right") - 1
            ok = local >= 0
            vidx[rows[ok]] = np.asarray(idxs)[local[ok]]
    elif not versions:
        # no dictionary history at all -> every row gets the null code
        vidx = np.full(n, -1, dtype=np.int64)
    else:
        # sort by valid_from here rather than trusting caller ordering —
        # searchsorted silently returns wrong as-of versions on an
        # unsorted list (ADVICE.md); order maps back through `order`.
        valid_from = np.asarray([v.valid_from_us for v in versions], dtype=np.int64)
        order = np.argsort(valid_from, kind="stable")
        pos = (
            np.searchsorted(valid_from[order], np.asarray(ts_us, dtype=np.int64),
                            side="right")
            - 1
        )
        vidx = np.where(pos >= 0, order[np.maximum(pos, 0)], -1)

    ver_out = np.full(n, -1, dtype=np.int32)
    err = np.zeros(n, dtype=np.float64)
    n_atoms = versions[0].D.shape[1] if versions else 0

    if algo == "bomp":
        # sparse CSR assembly: batch_omp_sparse returns (support, zI, nsel,
        # eps) so no (n, n_atoms) dense code matrix is ever written — the
        # dense scatter + nonzero re-scan is ~3 KB/turn of DRAM traffic at
        # 128 atoms, the largest single stream in the encode hot path.
        kk = min(k, n_atoms) if n_atoms else k
        idx_buf = np.zeros((n, kk), dtype=np.int32)
        val_buf = np.zeros((n, kk), dtype=np.float64)
        cnt = np.zeros(n, dtype=np.int32)
        pos = np.arange(kk)[None, :]
        for vi in np.unique(vidx):
            rows = np.nonzero(vidx == vi)[0]
            if vi < 0:
                continue  # ts before first valid_from: no dictionary yet
            v = versions[vi]
            support, zI, nsel, eps = K.batch_omp_sparse(v.D, X[:, rows], k=k, G=v.G)
            valid = (pos < nsel[:, None]) & (np.abs(zI) > 1e-12)
            sup = np.where(valid, support.T, np.iinfo(np.int32).max).astype(np.int64)
            order = np.argsort(sup, axis=1, kind="stable")  # ascending atom idx
            idx_buf[rows] = np.take_along_axis(sup, order, axis=1).astype(np.int32)
            val_buf[rows] = np.take_along_axis(np.where(valid, zI, 0.0), order, axis=1)
            cnt[rows] = valid.sum(axis=1).astype(np.int32)
            ver_out[rows] = v.version
            err[rows] = np.sqrt(eps)
        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(cnt, out=offsets[1:])
        keep = pos < cnt[:, None]  # row-major mask => CSR order
        return {
            "dict_version": ver_out,
            "offsets": offsets,
            "code_idx": idx_buf[keep],
            "code_val": val_buf[keep],
            "recon_err": err,
            "nnz": cnt,
        }

    if algo == "llc":
        # sparse CSR assembly (mirrors the bomp branch): llc_sparse returns
        # (order, w, err) so no (n, n_atoms) dense code matrix is written —
        # the dense scatter + nonzero re-scan was ~30% of the LLC encode.
        kk = min(knn, n_atoms) if n_atoms else knn
        idx_buf = np.zeros((n, kk), dtype=np.int32)
        val_buf = np.zeros((n, kk), dtype=np.float64)
        cnt = np.zeros(n, dtype=np.int32)
        pos = np.arange(kk)[None, :]
        for vi in np.unique(vidx):
            rows = np.nonzero(vidx == vi)[0]
            if vi < 0:
                continue  # ts before first valid_from: no dictionary yet
            v = versions[vi]
            order, w, eps = K.llc_sparse(v.D, X[:, rows], knn=knn)
            valid = np.abs(w) > 1e-12
            sup = np.where(valid, order.T, np.iinfo(np.int32).max).astype(np.int64)
            o2 = np.argsort(sup, axis=1, kind="stable")  # ascending atom idx
            idx_buf[rows] = np.take_along_axis(sup, o2, axis=1).astype(np.int32)
            val_buf[rows] = np.take_along_axis(np.where(valid, w, 0.0), o2, axis=1)
            cnt[rows] = valid.sum(axis=1).astype(np.int32)
            ver_out[rows] = v.version
            err[rows] = eps
        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(cnt, out=offsets[1:])
        keep = pos < cnt[:, None]  # row-major mask => CSR order
        return {
            "dict_version": ver_out,
            "offsets": offsets,
            "code_idx": idx_buf[keep],
            "code_val": val_buf[keep],
            "recon_err": err,
            "nnz": cnt,
        }

    Zfull = np.zeros((n, n_atoms), dtype=np.float64)  # sample-major for CSR pass
    for vi in np.unique(vidx):
        rows = np.nonzero(vidx == vi)[0]
        if vi < 0:
            continue  # ts before first valid_from: no dictionary yet -> null code
        v = versions[vi]
        Xb = X[:, rows]
        if algo == "omp":
            Z = K.omp(v.D, Xb, k=k)
        elif algo == "fista":
            Z = K.fista_lasso(v.D, Xb, lam=lam, n_iter=fista_iter, tol=fista_tol)
        else:
            raise ValueError(f"unknown algo {algo!r}")
        ver_out[rows] = v.version
        err[rows] = K.recon_error(v.D, Xb, Z)
        Zfull[rows, :] = Z.T

    # vectorized CSR extraction: np.nonzero on the sample-major matrix yields
    # (sample, atom) pairs sorted by sample then ascending atom index
    nz_s, nz_a = np.nonzero(np.abs(Zfull) > 1e-12)
    nnz = np.bincount(nz_s, minlength=n).astype(np.int32)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(nnz, out=offsets[1:])
    return {
        "dict_version": ver_out,
        "offsets": offsets,
        "code_idx": nz_a.astype(np.int32),
        "code_val": Zfull[nz_s, nz_a],
        "recon_err": err,
        "nnz": nnz,
    }


_OUT_FIELDS = [
    T.StructField("dict_version", T.IntegerType(), False),
    T.StructField("code_idx", T.ArrayType(T.IntegerType()), False),
    T.StructField("code_val", T.ArrayType(T.DoubleType()), False),
    T.StructField("recon_err", T.DoubleType(), False),
    T.StructField("nnz", T.IntegerType(), False),
]


def sparse_code(
    df: DataFrame,
    versions: list[DictVersion],
    algo: str = "bomp",
    k: int = 5,
    lam: float = 0.1,
    knn: int = 5,
    text_col: str = "text",
    ts_col: str = "ts",
    embed_dim: int = 64,
    fista_iter: int = 500,
    fista_tol: float = 1e-10,
    drop_text: bool = False,
    dict_id_col: str | None = None,
) -> DataFrame:
    """Append point-in-time sparse-code feature columns to a transcript DataFrame.

    Input: any DataFrame with ``text_col`` (string) and ``ts_col`` (timestamp).
    Output: input columns + (dict_version, code_idx, code_val, recon_err, nnz).

    ``drop_text=True`` omits the text column from the OUTPUT batches: the
    text is consumed as input but never serialized back Python->JVM. At
    10^12 turns the payload round-trip dominates the Arrow crossing cost
    (~500 B text vs ~80 B codes per turn) — callers that don't need the
    text downstream should always set this.
    """
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(versions)
    in_schema = df.schema
    text_pos = in_schema.fieldNames().index(text_col)
    ts_pos = in_schema.fieldNames().index(ts_col)
    did_pos = in_schema.fieldNames().index(dict_id_col) if dict_id_col else None
    out_fields = [
        f for i, f in enumerate(in_schema.fields)
        if not (drop_text and i == text_pos)
    ] + _OUT_FIELDS
    out_schema = T.StructType(out_fields)

    def encode_batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        vers = bc.value
        for batch in it:
            n = batch.num_rows
            if n == 0:
                continue
            tarr = batch.column(text_pos)
            ts_us = batch.column(ts_pos).cast(pa.int64()).to_numpy(zero_copy_only=False)
            # zero-copy embed straight from the Arrow string buffers (no
            # per-row Python objects); falls back to python strings only
            # for null-bearing or non-string columns
            buf = arrow_string_buffer(tarr)
            if buf is not None:
                X = embed_buffer(buf[0], buf[1], dim=embed_dim).T
                texts = None
            else:
                X = None
                texts = tarr.to_pylist()
            dids = (
                batch.column(did_pos).to_pylist() if did_pos is not None else None
            )
            r = encode_block(
                texts, ts_us, vers, algo=algo, k=k, lam=lam, knn=knn,
                embed_dim=embed_dim, fista_iter=fista_iter, fista_tol=fista_tol,
                precomputed_X=X, dict_ids=dids,
            )
            off = pa.array(r["offsets"], type=pa.int32())
            keep = [
                c for i, c in enumerate(batch.columns)
                if not (drop_text and i == text_pos)
            ]
            arrays = keep + [
                pa.array(r["dict_version"], type=pa.int32()),
                pa.ListArray.from_arrays(off, pa.array(r["code_idx"], type=pa.int32())),
                pa.ListArray.from_arrays(off, pa.array(r["code_val"], type=pa.float64())),
                pa.array(r["recon_err"], type=pa.float64()),
                pa.array(r["nnz"], type=pa.int32()),
            ]
            yield pa.RecordBatch.from_arrays(
                arrays, names=[f.name for f in out_schema.fields]
            )

    return df.mapInArrow(encode_batches, out_schema)
