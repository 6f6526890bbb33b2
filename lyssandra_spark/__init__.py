"""lyssandra_spark — PySpark-native point-in-time sparse-coding feature engine.

Public API (see OPERATORS.md for the full inventory):

    from lyssandra_spark import get_spark, sparse_code, asof_join
    from lyssandra_spark.sources.synth import build_dict_versions

    spark = get_spark()
    versions = build_dict_versions(sf_dir)
    coded = sparse_code(transcripts_df, versions, algo="bomp", k=5)
"""

from lyssandra_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"


def __getattr__(name):
    # lazy re-exports so importing the package doesn't pull Spark-heavy deps
    if name == "sparse_code":
        from lyssandra_spark.operators.encode import sparse_code

        return sparse_code
    if name == "asof_join":
        from lyssandra_spark.operators.asof import asof_join

        return asof_join
    if name == "DictLearner":
        from lyssandra_spark.operators.learn import DictLearner

        return DictLearner
    if name == "ParquetCatalog":
        from lyssandra_spark.sources.catalog import ParquetCatalog

        return ParquetCatalog
    raise AttributeError(name)
