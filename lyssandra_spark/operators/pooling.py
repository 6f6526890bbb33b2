"""Code pooling + linear probe — the engine's analogue of the reference's
encode -> spatial-pyramid-pool -> linear-SVM pipeline (Lyssandra
``lyssa/feature_extract`` + ``classify``; checkout empty at survey time —
recast per the north rule: per-session pooling of per-turn sparse codes
into fixed vectors, then a distributed closed-form ridge probe).

Spark-first shapes:

- :func:`pool_codes` is pure DataFrame ops: explode the CSR pair
  (code_idx, code_val), two-stage groupBy (atom-level then group-level),
  densify via ``map_from_entries`` + ``transform(sequence(...))`` — all
  JVM-side, shuffles only on the group keys.
- :func:`ridge_probe` never collects features: per-partition sufficient
  statistics (X^T X, X^T y — associative and commutative, constant size
  in row count) stream through one ``mapInArrow`` pass and a driver-side
  (dim+1)^2 solve. Same distribution pattern as dictionary learning
  (operators/learn.py), because it is the same math shape.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["pool_codes", "ridge_probe", "linear_score"]


def linear_score(feature_col: str, w) -> "F.Column":
    """Column expr: the linear-model margin ``w . x + b`` over an
    array<double> feature column, weights as a LITERAL array in the plan
    (bias last) — a pure JVM zip_with/aggregate fold, so scoring is
    map-only at any corpus size. The ONE definition of the classifier
    margin: ridge_probe's accuracy pass and the quality classifier's
    scorer both use it (two copies would let bias/cast semantics drift).
    """
    w = np.asarray(w, dtype=float)
    wcol = F.array(*[F.lit(float(v)) for v in w[:-1]])
    return F.aggregate(
        F.zip_with(
            F.col(feature_col).cast("array<double>"), wcol,
            lambda a, b: a * b,
        ),
        F.lit(float(w[-1])),
        lambda acc, v: acc + v,
    )


def pool_codes(
    df: DataFrame,
    n_atoms: int,
    part=("conv_id", "session_id"),
    idx_col: str = "code_idx",
    val_col: str = "code_val",
    mode: str = "max",
) -> DataFrame:
    """Pool per-turn sparse codes into one dense vector per group.

    mode='max' mirrors the reference's max-pooling (the standard choice
    for sparse codes); 'mean' averages with zeros counted, i.e. divides
    the atom-sum by the group's turn count.

    Sparse-max semantics: 'max' is the max over the values PRESENT in the
    CSR pairs. An atom that appears only with negative coefficients in a
    group pools to that negative max — NOT to 0, as dense max-pooling
    (where absent turns contribute an explicit 0) would give. This matches
    max-pooling over the support and is the documented contract; callers
    wanting the dense behaviour should apply ``greatest(pooled[i], 0)``
    downstream (sparse codes from OMP/LLC are sign-ambiguous, so clamping
    by default would silently discard information).

    Returns one row per group: part columns + ``pooled: array<double>``
    (length n_atoms) + ``n_pooled: long``.
    """
    if mode not in ("max", "mean"):
        raise ValueError(f"mode {mode!r}")
    part = list(part)
    # per-group turn count BEFORE exploding (zeros matter for mean)
    counts = df.groupBy(*part).agg(F.count("*").alias("n_pooled"))
    pairs = df.select(
        *part,
        F.explode(F.arrays_zip(F.col(idx_col).alias("i"),
                               F.col(val_col).alias("v"))).alias("p"),
    ).select(*part, F.col("p.i").alias("i"), F.col("p.v").alias("v"))
    agg = F.max("v") if mode == "max" else F.sum("v")
    atom = pairs.groupBy(*part, "i").agg(agg.alias("pv"))
    grouped = atom.groupBy(*part).agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("i", "pv")))
        ).alias("__m")
    )
    # LEFT join from counts: a group whose every row has an EMPTY code
    # array contributes no exploded pairs, so `grouped` misses it — it
    # must still pool to the zero vector, not silently disappear.
    out = counts.join(grouped, part, "left")
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(n_atoms - 1)),
        lambda i: F.coalesce(
            F.element_at("__m", i.cast("int"))
            / (F.col("n_pooled") if mode == "mean" else F.lit(1)),
            F.lit(0.0),
        ),
    )
    return out.select(*part, dense.alias("pooled"), "n_pooled")


_STATS_SCHEMA = T.StructType([
    T.StructField("xtx", T.ArrayType(T.DoubleType()), False),
    T.StructField("xty", T.ArrayType(T.DoubleType()), False),
    T.StructField("n", T.LongType(), False),
])


def ridge_probe(
    df: DataFrame,
    dim: int,
    feature_col: str = "pooled",
    label_col: str = "label",
    lam: float = 1e-3,
) -> tuple[np.ndarray, float]:
    """Closed-form ridge classifier on pooled features, distributed.

    Labels are +-1 (any binary column cast accordingly). Returns
    ``(w, train_accuracy)`` where ``w`` has dim+1 entries (bias last).
    Sufficient statistics are sample-additive => one map-only pass +
    driver solve of a (dim+1)x(dim+1) system; nothing driver-side grows
    with row count.
    """
    d1 = dim + 1
    src = df.select(
        F.col(feature_col).cast("array<double>").alias("x"),
        F.col(label_col).cast("double").alias("y"),
    )

    def stats(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        xtx = np.zeros((d1, d1))
        xty = np.zeros(d1)
        n = 0
        for batch in it:
            if batch.num_rows == 0:
                continue
            flat = batch.column(0).flatten().to_numpy(zero_copy_only=False)
            X = flat.reshape(batch.num_rows, -1)  # fixed-length vectors
            y = batch.column(1).to_numpy(zero_copy_only=False)
            Xb = np.concatenate([X, np.ones((len(X), 1))], axis=1)
            xtx += Xb.T @ Xb
            xty += Xb.T @ y
            n += len(X)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([xtx.ravel()], pa.list_(pa.float64())),
                pa.array([xty], pa.list_(pa.float64())),
                pa.array([n], pa.int64()),
            ],
            names=["xtx", "xty", "n"],
        )

    pdf = src.mapInArrow(stats, _STATS_SCHEMA).toPandas()
    XtX = np.add.reduce([np.asarray(a).reshape(d1, d1) for a in pdf["xtx"]])
    Xty = np.add.reduce([np.asarray(b) for b in pdf["xty"]])
    n = int(pdf["n"].sum())
    w = np.linalg.solve(XtX + lam * n * np.eye(d1), Xty)

    # training accuracy, computed distributed (no feature collect)
    score = linear_score(feature_col, w)
    acc_row = (
        df.select(
            (
                (F.when(score >= 0, 1.0).otherwise(-1.0)
                 == F.col(label_col).cast("double"))
            ).cast("double").alias("hit")
        )
        .agg(F.avg("hit").alias("acc"))
        .collect()[0]
    )
    return w, float(acc_row["acc"])
