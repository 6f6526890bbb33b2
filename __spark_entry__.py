"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Engine: ``lyssandra_spark`` (see SURVEY.md). Relational / text /
similarity operators carry DuckDB oracles; the sparse-coding kernel
operators (Batch-OMP / FISTA / LLC point-in-time encode — not
SQL-expressible) are rows-only here and carry a numpy-oracle parity
gate in tests/ instead (pytest -x -q).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from lyssandra_spark.plans import queries as Q  # noqa: E402
from lyssandra_spark.plans.pipeline import coded_transcripts, flagship  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Sessionized, point-in-time Batch-OMP sparse-code features over
    synthetic transcripts: dedup -> sessionize -> embed -> as-of
    dictionary -> encode -> lag feature -> per-session aggregate.
    """
    return flagship(spark, "/root/testdata/sf0.001")


def _encode_summary(algo: str, **kw):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        coded = coded_transcripts(spark, sf_dir, algo=algo, **kw)
        return (
            coded.groupBy("dict_version")
            .agg(
                F.count("*").alias("n_turns"),
                F.round(F.avg("nnz"), 4).alias("avg_nnz"),
                F.round(F.avg("recon_err"), 6).alias("avg_recon_err"),
                F.round(F.max("recon_err"), 6).alias("max_recon_err"),
            )
            .orderBy("dict_version")
        )

    return run


def _leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join audit: rows whose code used a version newer than ts.

    MUST return exactly one row with n_leaks = 0 (zero temporal leakage).
    """
    from lyssandra_spark.sources import synth

    coded = coded_transcripts(spark, sf_dir, algo="bomp", k=5)
    vdf = synth.dictionary_versions(
        spark, synth.build_dict_versions(sf_dir, n_atoms=128)
    ).select(F.col("version").alias("dict_version"), "valid_from")
    joined = coded.join(F.broadcast(vdf), "dict_version", "left")
    return joined.select(
        F.sum((F.col("valid_from") > F.col("ts")).cast("long")).alias("n_leaks"),
        F.count("*").alias("n_rows"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = dict(Q.SPARK_QUERIES)
    # kernel-backed (rows-only; numpy parity gate lives in tests/)
    out["encode_batch_omp"] = _encode_summary("bomp", k=5)
    out["encode_fista_lasso"] = _encode_summary("fista", lam=0.1)
    out["encode_llc"] = _encode_summary("llc", knn=5)
    out["flagship_session_features"] = lambda spark, sf_dir: flagship(spark, sf_dir)
    out["leakage_audit"] = _leakage_audit
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return dict(Q.ORACLE_SQL)
