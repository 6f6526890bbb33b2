"""Distributed dictionary learning with resumable epoch checkpoints
(SURVEY.md §2.A A5-A7, §3.2.4; north rule: "resumable from checkpoint with
per-partition lineage + metrics").

Algorithm (the sample-additive reformulation of K-SVD — Mairal 2009 online
dictionary learning in batch form; classic K-SVD's sequential atom sweep is
not sample-partitionable, documented deviation per SURVEY.md §7):

  for epoch e = 1..E:
    1. ENCODE  (distributed): Z = batch_omp(D_e, X) via mapInArrow
    2. AGGREGATE (distributed, map-side partial): per-partition sufficient
       statistics (A_p = Z_p Z_p^T, B_p = X_p Z_p^T, n_p, err_p) — an
       associative+commutative combine, shipped as flattened arrays and
       summed; equivalent to treeAggregate but stays in the DataFrame API
    3. UPDATE (driver, numpy): D_{e+1} = odl_update_dict(D_e, A, B);
       dead atoms replaced deterministically
    4. CHECKPOINT: write dictionary_epoch_{e} parquet + append per-partition
       lineage rows (stage, partition_id, rows_in, metrics, fingerprint)

Resume: `fit` scans the checkpoint dir for the last complete epoch and
continues from it — re-running after a kill is byte-identical to an
uninterrupted run (tested in tests/test_learn_resume.py).

Scale notes: sufficient statistics are (n_atoms^2 + n_atoms*dim + 2)
doubles per partition (~260 KB at 128x64) regardless of row count, so the
aggregation is shuffle-free except the final single-row collect; the
encode pass streams; nothing driver-side grows with data size.
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from lyssandra_spark.functions import kernels as K
from lyssandra_spark.functions.embed import arrow_string_buffer, embed_buffer, embed_texts

__all__ = ["DictLearner"]

_STATS_SCHEMA = T.StructType([
    T.StructField("partition_id", T.IntegerType(), False),
    T.StructField("n_rows", T.LongType(), False),
    T.StructField("sq_err", T.DoubleType(), False),
    T.StructField("sum_nnz", T.LongType(), False),
    T.StructField("A_flat", T.ArrayType(T.DoubleType()), False),
    T.StructField("B_flat", T.ArrayType(T.DoubleType()), False),
])


def _epoch_stats(df: DataFrame, D: np.ndarray, k: int, text_col: str,
                 embed_dim: int) -> DataFrame:
    """One distributed encode+accumulate pass. Returns per-partition stats."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((D, D.T @ D))
    text_pos = 0  # the stats pass projects df down to just text_col
    m = D.shape[1]
    d = D.shape[0]

    def stats(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        Dv, G = bc.value
        A = np.zeros((m, m))
        B = np.zeros((d, m))
        n_rows = 0
        sq_err = 0.0
        sum_nnz = 0
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        for batch in it:
            if batch.num_rows == 0:
                continue
            tarr = batch.column(text_pos)
            buf = arrow_string_buffer(tarr)
            if buf is not None:
                X = embed_buffer(buf[0], buf[1], dim=embed_dim).T
            else:
                X = embed_texts(tarr.to_pylist(), dim=embed_dim).T
            Z = K.batch_omp(Dv, X, k=k, G=G)
            a, b = K.odl_accumulate(X, Z)
            A += a
            B += b
            n_rows += X.shape[1]
            sq_err += float(np.sum((X - Dv @ Z) ** 2))
            sum_nnz += int((np.abs(Z) > 1e-12).sum())
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([pid], pa.int32()),
                pa.array([n_rows], pa.int64()),
                pa.array([sq_err], pa.float64()),
                pa.array([sum_nnz], pa.int64()),
                pa.array([A.ravel()], pa.list_(pa.float64())),
                pa.array([B.ravel()], pa.list_(pa.float64())),
            ],
            names=[f.name for f in _STATS_SCHEMA.fields],
        )

    return df.select(text_col).mapInArrow(stats, _STATS_SCHEMA)


class DictLearner:
    """Resumable distributed dictionary learner over a transcript DataFrame."""

    def __init__(self, n_atoms: int = 128, k: int = 5, embed_dim: int = 64,
                 n_epochs: int = 5, seed: int = 42, text_col: str = "text"):
        self.n_atoms = n_atoms
        self.k = k
        self.embed_dim = embed_dim
        self.n_epochs = n_epochs
        self.seed = seed
        self.text_col = text_col

    # --- checkpoint layout: <dir>/epoch_e.npz + <dir>/lineage.jsonl ---

    def _last_complete_epoch(self, ckpt_dir: str) -> int:
        """Last epoch with a checkpoint on disk; -1 if none (fresh run).

        epoch_0.npz (the saved init) counts: a kill between the init
        checkpoint and epoch-1 completion resumes from the SAVED init
        rather than re-running init_dictionary.
        """
        last = -1
        for e in range(0, self.n_epochs + 1):
            if os.path.exists(os.path.join(ckpt_dir, f"epoch_{e}.npz")):
                last = e
            else:
                break
        return last

    def _load(self, ckpt_dir: str, epoch: int) -> np.ndarray:
        with np.load(os.path.join(ckpt_dir, f"epoch_{epoch}.npz")) as z:
            return z["D"]

    def _save(self, ckpt_dir: str, epoch: int, D: np.ndarray) -> None:
        tmp = os.path.join(ckpt_dir, f".epoch_{epoch}.tmp.npz")
        np.savez(tmp, D=D)
        os.replace(tmp, os.path.join(ckpt_dir, f"epoch_{epoch}.npz"))

    def _lineage(self, ckpt_dir: str, rows: list[dict]) -> None:
        with open(os.path.join(ckpt_dir, "lineage.jsonl"), "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    def init_dictionary(self, df: DataFrame) -> np.ndarray:
        """Deterministic init: top-(4*n_atoms) rows by text order.

        The explicit orderBy makes the sample independent of partitioning
        and scan order (a bare limit() is nondeterministic); Spark executes
        sort+limit as TakeOrderedAndProject, so this never global-sorts.
        """
        sample = (
            df.select(self.text_col)
            .orderBy(self.text_col)
            .limit(4 * self.n_atoms)
            .toPandas()[self.text_col]
            .tolist()
        )
        X = embed_texts(sample, dim=self.embed_dim).T
        return K.init_dict(X, self.n_atoms, seed=self.seed)

    def fit(self, df: DataFrame, ckpt_dir: str) -> tuple[np.ndarray, list[dict]]:
        """Run (or resume) the learning loop; returns (D, epoch metric rows).

        df must be deterministic and re-readable (a table / checkpointed
        DataFrame): each epoch re-scans it.
        """
        os.makedirs(ckpt_dir, exist_ok=True)
        start = self._last_complete_epoch(ckpt_dir)
        if start >= 0:
            D = self._load(ckpt_dir, start)
        else:
            D = self.init_dictionary(df)
            self._save(ckpt_dir, 0, D)
            start = 0
        history: list[dict] = []
        for epoch in range(start + 1, self.n_epochs + 1):
            t0 = time.time()
            pdf = _epoch_stats(df, D, self.k, self.text_col, self.embed_dim).toPandas()
            m, d = self.n_atoms, self.embed_dim
            A = np.add.reduce([np.asarray(a).reshape(m, m) for a in pdf["A_flat"]])
            B = np.add.reduce([np.asarray(b).reshape(d, m) for b in pdf["B_flat"]])
            n_rows = int(pdf["n_rows"].sum())
            rmse = float(np.sqrt(pdf["sq_err"].sum() / max(n_rows, 1)))
            D = K.odl_update_dict(D, A, B, n_iter=1)
            # dead-atom replacement: deterministic re-seed per epoch
            usage = np.diag(A)
            dead = np.nonzero(usage < 1e-12)[0]
            if dead.size:
                rng = np.random.default_rng(self.seed + epoch)
                D[:, dead] = K.normalize_cols(
                    rng.standard_normal((self.embed_dim, dead.size))
                )
            self._save(ckpt_dir, epoch, D)
            lineage = [
                {
                    "stage": f"epoch_{epoch}",
                    "partition_id": int(r.partition_id),
                    "rows_in": int(r.n_rows),
                    "sq_err": float(r.sq_err),
                    "sum_nnz": int(r.sum_nnz),
                    "t_start": t0,
                    "t_end": time.time(),
                }
                for r in pdf.itertuples()
            ]
            self._lineage(ckpt_dir, lineage)
            history.append(
                {"epoch": epoch, "rmse": rmse, "n_rows": n_rows,
                 "avg_nnz": float(pdf["sum_nnz"].sum() / max(n_rows, 1)),
                 "dead_atoms": int(dead.size), "sec": round(time.time() - t0, 3)}
            )
        return D, history
