"""spark-submit entry point for the flagship feature pipeline.

The north rule requires the engine to run "via spark-submit --py-files on
a multi-executor cluster" (BASELINE.json:north_rule) — this script is that
job. It contains NO logic of its own: it builds the SparkSession from
whatever master/conf spark-submit provides (local[N] here; YARN/K8s on a
real cluster), imports the engine from the shipped ``--py-files`` archive,
runs ingest -> dedup -> sessionize -> point-in-time sparse-code ->
per-session aggregate, writes the feature table through the catalog with
the 10^12-turn layout (ts-day range partitions + conv_id hash buckets),
and prints one JSON summary line.

Cluster usage (multi-executor):

    cd /root/repo && python scripts/make_pyfiles.py /tmp/lyssandra_spark.zip
    spark-submit --master yarn --deploy-mode cluster \
        --num-executors 4N --executor-cores C \
        --py-files /tmp/lyssandra_spark.zip \
        scripts/run_pipeline.py --sf-dir s3://bucket/transcripts --out ...

Sandbox usage (what tests/test_submit.py actually executes — note the
test runs it from a scratch cwd with no PYTHONPATH, so the import below
only resolves if --py-files really ships the package):

    spark-submit --master local[4] --py-files lyssandra_spark.zip \
        scripts/run_pipeline.py --sf-dir /root/testdata/sf0.001 --out /tmp/x
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", required=True, help="input parquet dir")
    ap.add_argument("--out", required=True, help="catalog warehouse dir")
    ap.add_argument("--algo", default="bomp", choices=["bomp", "fista", "llc"])
    ap.add_argument("--table", default="turn_features")
    ap.add_argument("--n-buckets", type=int, default=16)
    args = ap.parse_args(argv)

    # No .master() here — spark-submit owns deployment (local[N] in the
    # sandbox, YARN/K8s with N or 4N executors on a real cluster).
    spark = (
        SparkSession.builder.appName("lyssandra-flagship")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    # Import AFTER getOrCreate so a missing --py-files archive fails with
    # the honest ModuleNotFoundError on the driver, same as executors would.
    from lyssandra_spark.plans.pipeline import coded_transcripts
    from lyssandra_spark.sources.catalog import ParquetCatalog

    coded = coded_transcripts(spark, args.sf_dir, algo=args.algo, k=5).drop("text")
    cat = ParquetCatalog(spark, args.out)
    snap = cat.write(
        coded, args.table, mode="overwrite",
        partition_by={
            "ts_day": "date_format(ts, 'yyyy-MM-dd')",
            "conv_bucket": f"pmod(hash(conv_id), {args.n_buckets})",
        },
    )
    back = cat.read(args.table)
    print(json.dumps({
        "job": "lyssandra-flagship",
        "snapshot": snap,
        "table": args.table,
        "rows": back.count(),
        "cols": len(back.columns),
        "defaultParallelism": spark.sparkContext.defaultParallelism,
    }), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
