#!/usr/bin/env python
"""Dump .explain('formatted') for every bench.py query path (guide §1).

Usage: python scripts/dump_plans_r10.py <outdir-suffix: before|after> [names...]
Writes plans/r10/<query>_<suffix>.txt.
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
suffix = sys.argv[1]
only = set(sys.argv[2:])

from pyspark.sql import functions as F  # noqa: E402

from lyssandra_spark.operators.encode import sparse_code  # noqa: E402
from lyssandra_spark.operators.windows import (  # noqa: E402
    dedup_latest, ffill, rolling, sessionize,
)
from lyssandra_spark.plans import queries as Q  # noqa: E402
from lyssandra_spark.session import get_spark  # noqa: E402
from lyssandra_spark.sources import synth  # noqa: E402

spark = get_spark(app="plan-dump", cores=8)
t = synth.transcripts(spark, SF_DIR)
tmin = t.select("conv_id", "turn_idx", "ts", "text")
versions = synth.build_dict_versions(SF_DIR, n_atoms=128)

paths = {
    "encode_batch_omp": lambda: sparse_code(
        tmin, versions, algo="bomp", k=5, drop_text=True),
    "encode_fista": lambda: sparse_code(
        tmin, versions, algo="fista", lam=0.1, fista_iter=100,
        fista_tol=1e-7, drop_text=True),
    "encode_llc": lambda: sparse_code(
        tmin, versions, algo="llc", knn=5, drop_text=True),
    "window_suite": lambda: rolling(
        ffill(
            sessionize(
                dedup_latest(t, ["conv_id", "turn_idx"], ["ts"]),
                1800, part="conv_id", ts_col="ts"),
            "role", part="conv_id", order="turn_idx"),
        "turn_idx", 5, part="conv_id", order="turn_idx")
    .select("conv_id", "turn_idx", "session_id", "role", "avg_turn_idx_5"),
    "asof_backward": lambda: Q.asof_backward_latest_order(spark, SF_DIR),
    "agg_pricing": lambda: Q.SPARK_QUERIES["agg_pricing_summary"](spark, SF_DIR),
    "knn_cosine": lambda: Q.SPARK_QUERIES["knn_cosine_topk"](spark, SF_DIR),
}

outdir = os.path.join(REPO, "plans", "r10")
os.makedirs(outdir, exist_ok=True)
for name, fn in paths.items():
    if only and name not in only:
        continue
    df = fn()
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
        f.write(plan)
    print(f"wrote {name}_{suffix}.txt ({len(plan)} bytes)")
spark.stop()
