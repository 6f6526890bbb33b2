"""Flagship end-to-end pipeline (SURVEY.md §2.D).

ingest -> dedup (B7) -> sessionize (B4) -> point-in-time sparse-code
(A10 embed + B1 as-of + A2 Batch-OMP, all inside one mapInArrow crossing)
-> lag-1 code feature (B3) -> per-session aggregate (B9).

One pipeline that touches every load-bearing operator class; `entry()` in
__spark_entry__.py runs it at sf0.001.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lyssandra_spark.operators.encode import sparse_code
from lyssandra_spark.operators.windows import dedup_latest, sessionize, with_lag
from lyssandra_spark.sources import synth

__all__ = ["flagship", "flagship_skeleton", "coded_transcripts",
           "SKELETON_ORACLE_SQL", "ORACLE_CACHE", "materialize_once"]

# Test-contract artifact directory (NOT a production sink): Spark-side
# queries materialize deterministic inputs here so the DuckDB oracle can
# read the IDENTICAL bytes. Derived from the package location — no
# hard-coded /root/repo — so the repo can be relocated; the oracle SQL
# constants below interpolate the same value, keeping both in lockstep.
ORACLE_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".oracle_cache",
)


def materialize_once(build, path: str, fingerprint: str) -> None:
    """Write ``build()`` (a DataFrame) to parquet at ``path``, once per
    content fingerprint.

    The oracle-cache parquets are pure functions of (sf_dir, generator
    version); rewriting them on every query invocation made the oracle
    read execution-order-coupled (spark had to run strictly before the
    oracle SQL). A sidecar ``.fp`` file records what the parquet holds:
    matching fingerprint + existing dir => skip the write entirely, so a
    second invocation — or an oracle-first driver ordering after ANY
    prior run at the same sf — reads stable bytes. Scope: this removes
    rewrites of an already-valid cache; it is NOT a cross-process lock —
    two processes cold-writing the same path concurrently still race
    (the driver contract is single-process, so that case doesn't arise
    there).
    """
    fp_file = path + ".fp"
    try:
        with open(fp_file) as f:
            if f.read() == fingerprint and os.path.isdir(path):
                return
    except OSError:
        pass
    build().write.mode("overwrite").parquet(path)
    with open(fp_file, "w") as f:
        f.write(fingerprint)


def coded_transcripts(
    spark: SparkSession, sf_dir: str, algo: str = "bomp", **kw
) -> DataFrame:
    """Synthetic transcripts -> dedup -> sessionize -> point-in-time codes."""
    t = synth.transcripts(spark, sf_dir, with_dups=True)
    t = dedup_latest(t, ["conv_id", "turn_idx"], ["ts", "role"])
    t = sessionize(t, gap_seconds=1800, part="conv_id", ts_col="ts")
    versions = synth.build_dict_versions(sf_dir, n_atoms=128)
    return sparse_code(t, versions, algo=algo, **kw)


def materialize_features(
    spark: SparkSession, sf_dir: str, warehouse: str,
    table: str = "turn_features", n_buckets: int = 16,
) -> int:
    """Write the coded feature table through the catalog with the
    10^12-turn layout: ts-day range partitions + conv_id hash buckets
    (Iceberg ``days(ts)`` + ``bucket(conv_id)`` analogue). Returns the
    snapshot id."""
    from lyssandra_spark.sources.catalog import ParquetCatalog

    coded = coded_transcripts(spark, sf_dir, algo="bomp", k=5).drop("text")
    cat = ParquetCatalog(spark, warehouse)
    return cat.write(
        coded, table, mode="overwrite",
        partition_by={
            "ts_day": "date_format(ts, 'yyyy-MM-dd')",
            "conv_bucket": f"pmod(hash(conv_id), {n_buckets})",
        },
    )


SKELETON_PATH = os.path.join(ORACLE_CACHE, "transcripts_skel")
# bump when synth.transcripts generation changes — forces a cache rewrite
_SKEL_GEN = "skel-v1"

SKELETON_ORACLE_SQL = f"""
    WITH t AS (SELECT * FROM read_parquet('{SKELETON_PATH}/*.parquet')),
    d AS (SELECT conv_id, turn_idx, ts FROM (
        SELECT conv_id, turn_idx, ts,
               row_number() OVER (PARTITION BY conv_id, turn_idx
                                  ORDER BY ts DESC, role DESC) AS rn
        FROM t) x WHERE rn = 1),
    g AS (SELECT conv_id, ts,
            CASE WHEN epoch(ts) - epoch(lag(ts) OVER
                   (PARTITION BY conv_id ORDER BY ts)) > 1800.0
                 THEN 1 ELSE 0 END AS flag
          FROM d),
    s AS (SELECT conv_id, ts,
            sum(flag) OVER (PARTITION BY conv_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS session_id
          FROM g)
    SELECT conv_id, CAST(session_id AS INTEGER) AS session_id,
           count(*) AS n_turns, min(ts) AS session_start, max(ts) AS session_end
    FROM s GROUP BY conv_id, session_id
"""


def flagship_skeleton(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship's relational skeleton — dedup -> sessionize ->
    per-session aggregates — hash-checkable against a DuckDB oracle.

    The sparse-code values of the full flagship aren't SQL-expressible,
    but this structure is; to give both engines the identical input, the
    synthesized transcripts are materialized to parquet (Spark-side write,
    deterministic content) and BOTH sides read that file — the oracle via
    read_parquet of SKELETON_PATH, which is deliberately NOT a parameter:
    SKELETON_ORACLE_SQL is a static string, so a configurable path would
    silently diverge from the oracle. The write is once-per-fingerprint
    (see :func:`materialize_once`): after any prior run at the same sf,
    the parquet is stable on disk, so the oracle SQL can run before OR
    after the Spark callable. First-ever run at an sf still requires
    spark-before-oracle (the driver runs them side-by-side at sf0.01).
    This also exercises the sink path (B18) inside a hash-checked query.
    """
    path = SKELETON_PATH
    materialize_once(
        lambda: synth.transcripts(spark, sf_dir, with_dups=True),
        path, f"{_SKEL_GEN}|{sf_dir}",
    )
    t2 = spark.read.parquet(path)
    t2 = dedup_latest(t2, ["conv_id", "turn_idx"], ["ts", "role"])
    t2 = sessionize(t2, gap_seconds=1800, part="conv_id", ts_col="ts")
    return t2.groupBy("conv_id", "session_id").agg(
        F.count("*").alias("n_turns"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session sparse-code feature aggregates with a lag-1 drift feature."""
    coded = coded_transcripts(spark, sf_dir, algo="bomp", k=5)
    coded = with_lag(coded, "recon_err", part="conv_id", order="turn_idx")
    return (
        coded.groupBy("conv_id", "session_id", "dict_version")
        .agg(
            F.count("*").alias("n_turns"),
            F.avg("nnz").alias("avg_nnz"),
            F.avg("recon_err").alias("avg_recon_err"),
            F.avg(F.abs(F.col("recon_err") - F.col("lag1_recon_err"))).alias(
                "avg_err_drift"
            ),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("conv_id", "session_id", "dict_version")
    )
