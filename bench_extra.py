#!/usr/bin/env python
"""Round-10 noop-sink isolation benches (guide §1.4) — NOT the driver bench.

Decomposes the encode legs into scan / Arrow-crossing / embed / kernel so
optimization work targets the real cost, and provides per-leg isolation for
the non-encode queries. Same session config and env contract as bench.py
($SPARK_GRAFT_SF_DIR, $SPARK_GRAFT_CPUS); prints one JSON line.

Usage: python bench_extra.py [encode|queries|all]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(timings, name, fn, reps=2):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    timings[name] = round(best, 3)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    from pyspark.sql import functions as F

    from lyssandra_spark.functions.embed import embed_column
    from lyssandra_spark.operators.encode import sparse_code
    from lyssandra_spark.plans import queries as Q
    from lyssandra_spark.session import get_spark
    from lyssandra_spark.sources import synth

    spark = get_spark(app="lyssandra-bench-extra", cores=CPUS)
    sc = spark.sparkContext
    timings: dict[str, float] = {}

    t = synth.transcripts(spark, SF_DIR).repartition(CPUS * 2).cache()
    n_turns = t.count()
    versions = synth.build_dict_versions(SF_DIR, n_atoms=128)
    tmin = t.select("conv_id", "turn_idx", "ts", "text")

    if mode in ("encode", "all"):
        sc.setJobDescription("isolate: cache scan only")
        _timed(timings, "scan_cache_noop", lambda: _force(tmin))
        sc.setJobDescription("isolate: identity mapInArrow (Arrow round-trip)")
        _timed(timings, "arrow_identity", lambda: _force(
            tmin.mapInArrow(lambda it: it, tmin.schema)))
        sc.setJobDescription("isolate: embed only")
        _timed(timings, "embed_only", lambda: _force(
            embed_column(tmin.select("conv_id", "turn_idx", "text"),
                         drop_text=True)))
        for algo, kw in (
            ("bomp", dict(k=5)),
            ("fista", dict(lam=0.1, fista_iter=100, fista_tol=1e-7)),
            ("llc", dict(knn=5)),
        ):
            sc.setJobDescription(f"isolate: encode {algo}")
            _timed(timings, f"encode_{algo}", lambda a=algo, k=kw: _force(
                sparse_code(tmin, versions, algo=a, drop_text=True, **k)))
        sc.setJobDescription(None)

    if mode in ("queries", "all"):
        for name in ("agg_pricing_summary", "knn_cosine_topk"):
            sc.setJobDescription(f"isolate: {name}")
            _timed(timings, name, lambda n=name: _force(
                Q.SPARK_QUERIES[n](spark, SF_DIR)))
        sc.setJobDescription("isolate: asof_backward broadcast")
        _timed(timings, "asof_backward", lambda: _force(
            Q.asof_backward_latest_order(spark, SF_DIR)))
        sc.setJobDescription(None)

    t.unpersist()
    spark.stop()
    print(json.dumps({
        "metric": "r10 noop isolation benches", "unit": "sec",
        "queries": timings, "sf": SF_DIR, "n_turns": n_turns, "cores": CPUS,
    }))


if __name__ == "__main__":
    main()
