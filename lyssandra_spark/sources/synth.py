"""Deterministic synthetic inputs derived from /root/testdata (FIXTURES.md §B).

Transcripts — the north-rule input table
``(conv_id, turn_idx, role, text, tool, ts)`` — are generated **inside
Spark** with every per-turn value a pure function of
``xxhash64(conv_id, turn_idx, salt)``. No sequential RNG anywhere, so the
result is identical under any partitioning / parallelism / re-run — the
same property that lets the generator scale to 10^12 turns on a real
cluster (it is an `explode` over a conversations dim, embarrassingly
parallel, no shuffle except the broadcast join to the documents
vocabulary).

Dictionary versions (the SCD-2 as-of dimension) are built driver-side with
the seeded numpy kernels — dictionaries are small (n_atoms x dim ~ 64 KB)
and always broadcast.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lyssandra_spark.functions import kernels as K

__all__ = [
    "transcripts",
    "dictionary_versions",
    "DictVersion",
    "EPOCH_V1",
    "VERSION_BOUNDARIES",
]

# Logical-clock validity boundaries (never wall-clock): v1 covers everything,
# v2/v3 fall inside the synthesized transcripts' actual ts range so version
# changes land mid-conversation for many conv_ids (the adversarial leakage
# setup). Transcript bases are each user's MIN event ts (+2h per extra
# conversation), which concentrates on 2024-01-01 at every sf — boundaries
# at 08:00/20:00 that day split real conversations across all 3 versions,
# so the driver-visible encode summaries exercise multi-version
# point-in-time resolution, not just v1.
EPOCH_V1 = "2023-01-01 00:00:00"
VERSION_BOUNDARIES = [EPOCH_V1, "2024-01-01 08:00:00", "2024-01-01 20:00:00"]

HOT_TURNS = 1400  # ~100x the median conversation length (skew fixture, B16)


def transcripts(
    spark: SparkSession,
    sf_dir: str,
    with_dups: bool = False,
    events_per_conv: int = 10,
) -> DataFrame:
    """Synthesize the transcript fact table from events + documents.

    - one conversation per (user_id, chunk of ~events_per_conv events)
    - n_turns = 8 + hash % 13 per conversation; conversation 'conv-0-0'
      is the hot one (HOT_TURNS turns) for skew tests
    - ts strictly increasing within conv: base + 60s/turn, +1h extra gap
      every 12 turns (sessionize fixture: gap > 30min)
    - role cycles user/assistant/tool with ~5% NULLs (backfill fixture)
    - tool set only on role='tool' rows
    - text joined from the documents vocabulary by hashed dense doc index
    - with_dups: union an exact duplicate of ~20% of rows (idempotent
      re-ingest fixture for dedup, B7)
    """
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    documents = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = documents.count()

    convs = (
        events.groupBy("user_id")
        .agg(F.min("ts").alias("user_base_ts"), F.count("*").alias("n_ev"))
        .select(
            "user_id",
            "user_base_ts",
            F.greatest(
                F.lit(1), (F.col("n_ev") / events_per_conv).cast("int")
            ).alias("n_convs"),
        )
        .select(
            "user_id",
            "user_base_ts",
            F.explode(F.sequence(F.lit(0), F.col("n_convs") - 1)).alias("conv_seq"),
        )
        .select(
            F.concat_ws("-", F.lit("conv"), "user_id", "conv_seq").alias("conv_id"),
            (F.col("user_base_ts") + F.make_interval(hours=F.col("conv_seq") * 2)).alias(
                "conv_base_ts"
            ),
            F.when(
                (F.col("user_id") == 0) & (F.col("conv_seq") == 0), F.lit(HOT_TURNS)
            )
            .otherwise(
                8 + F.pmod(F.xxhash64("user_id", "conv_seq", F.lit("nturns")), 13)
            )
            .cast("int")
            .alias("n_turns"),
        )
    )

    h = lambda salt: F.xxhash64("conv_id", "turn_idx", F.lit(salt))  # noqa: E731
    turns = (
        convs.select(
            "conv_id",
            "conv_base_ts",
            F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
        )
        .withColumn("turn_idx", F.col("turn_idx").cast("int"))
        .withColumn(
            "ts",
            F.col("conv_base_ts")
            + F.make_interval(
                mins=F.col("turn_idx"), hours=(F.col("turn_idx") / 12).cast("int")
            ),
        )
        .withColumn(
            "role",
            F.when(F.pmod(h("rolenull"), 100) < 5, F.lit(None).cast("string")).otherwise(
                F.element_at(
                    F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
                    (F.pmod(F.col("turn_idx"), 3) + 1).cast("int"),
                )
            ),
        )
        .withColumn(
            "tool",
            F.when(
                F.col("role") == "tool",
                F.concat(F.lit("tool-"), F.pmod(h("tool"), 5).cast("string")),
            ),
        )
        .withColumn("doc_idx", F.pmod(h("text"), F.lit(n_docs)).cast("long"))
    )

    out = (
        turns.join(
            F.broadcast(documents.select(F.col("doc_id").alias("doc_idx"), "text")),
            "doc_idx",
            "left",
        )
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    )
    if with_dups:
        dup = out.where(F.pmod(F.xxhash64("conv_id", "turn_idx", F.lit("dup")), 100) < 20)
        out = out.unionByName(dup)
    return out


@dataclass(frozen=True)
class DictVersion:
    """One SCD-2 dictionary version: D is (dim, n_atoms), unit-norm columns."""

    dict_id: str
    version: int
    valid_from_us: int  # microseconds since epoch (logical clock)
    D: np.ndarray
    G: np.ndarray  # precomputed Gram D^T D (Batch-OMP amortization)


def _ts_to_us(ts_str: str) -> int:
    import datetime as dt

    d = dt.datetime.fromisoformat(ts_str).replace(tzinfo=dt.timezone.utc)
    return int(d.timestamp() * 1_000_000)


def build_dict_versions(
    sf_dir: str,
    n_atoms: int = 128,
    boundaries: list[str] | None = None,
    seed: int = 101,
    dict_id: str = "main",
) -> list[DictVersion]:
    """Driver-side deterministic dictionary history from the embeddings fixture.

    v1 = init_dict on the embeddings matrix; v_{i+1} = one approximate-K-SVD
    refinement sweep of v_i on the same data (so versions are related but
    measurably different — codes under the wrong version fail allclose,
    which is what makes the leakage tests sharp).
    """
    boundaries = boundaries or VERSION_BOUNDARIES
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    X = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float64).T  # (dim, n)
    D = K.init_dict(X, n_atoms, seed=seed)
    out: list[DictVersion] = []
    for i, b in enumerate(boundaries):
        if i > 0:
            Z = K.batch_omp(D, X, k=5)
            D, _ = K.ksvd_update(D, X, Z)
            D = K.replace_dead_atoms(D, X, Z, seed=seed + i)
        out.append(
            DictVersion(
                dict_id=dict_id,
                version=i + 1,
                valid_from_us=_ts_to_us(b),
                D=D.copy(),
                G=(D.T @ D),
            )
        )
    return out


def dict_versions_from_df(df: DataFrame) -> list[DictVersion]:
    """Rebuild the broadcastable DictVersion list from the SCD-2 dimension
    table (the inverse of :func:`dictionary_versions`) — Grams recomputed.

    This is how a production run loads the dictionary history: the
    dimension lives as DATA in the catalog (snapshot/time-travel-able),
    not as code; encode broadcasts whatever history the table holds.
    """
    rows = df.select("dict_id", "version", "valid_from", "atoms").collect()
    out = []
    for r in sorted(rows, key=lambda r: r["version"]):
        # ascontiguousarray: atoms round-trip as rows, so .T alone would be
        # a non-contiguous view; BLAS then takes a different GEMM path for
        # D.T @ D and the Gram (hence codes/residuals) would differ from
        # the originally-built version in the last ulp. Restoring the
        # original memory layout keeps the round-trip bit-identical.
        D = np.ascontiguousarray(
            np.asarray(r["atoms"], dtype=np.float64).T  # (dim, n_atoms)
        )
        ts = r["valid_from"]
        import datetime as dt

        us = int(ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
        out.append(DictVersion(r["dict_id"], int(r["version"]), us, D, D.T @ D))
    return out


def dictionary_versions(
    spark: SparkSession, versions: list[DictVersion]
) -> DataFrame:
    """Materialize the SCD-2 dimension as a DataFrame (atoms = list of columns)."""
    schema = T.StructType(
        [
            T.StructField("dict_id", T.StringType(), False),
            T.StructField("version", T.IntegerType(), False),
            T.StructField("valid_from", T.TimestampType(), False),
            T.StructField("atoms", T.ArrayType(T.ArrayType(T.DoubleType())), False),
        ]
    )
    import datetime as dt

    rows = [
        (
            v.dict_id,
            v.version,
            dt.datetime.fromtimestamp(v.valid_from_us / 1e6, dt.timezone.utc).replace(
                tzinfo=None
            ),
            [list(map(float, v.D[:, j])) for j in range(v.D.shape[1])],
        )
        for v in versions
    ]
    return spark.createDataFrame(rows, schema)
