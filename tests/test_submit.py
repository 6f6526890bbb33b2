"""Real `spark-submit --py-files` deployment (north-rule requirement).

Executes the actual spark-submit binary on scripts/run_pipeline.py with
the package shipped ONLY via a --py-files zip: the subprocess runs from a
scratch cwd with PYTHONPATH stripped, so the import inside the job proves
the archive is what delivered the engine (exactly how a multi-executor
cluster submit ships code to executors).
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_SMOKE = "/root/testdata/sf0.001"


def _spark_submit() -> str:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def test_make_pyfiles_deterministic(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        from make_pyfiles import build
    finally:
        sys.path.pop(0)
    z1, z2 = str(tmp_path / "a.zip"), str(tmp_path / "b.zip")
    build(z1)
    build(z2)
    with open(z1, "rb") as f1, open(z2, "rb") as f2:
        assert f1.read() == f2.read()  # byte-identical re-build
    names = zipfile.ZipFile(z1).namelist()
    assert "lyssandra_spark/__init__.py" in names
    assert "lyssandra_spark/operators/asof.py" in names
    assert not any("__pycache__" in n for n in names)


def test_spark_submit_pyfiles_end_to_end(tmp_path, spark):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        from make_pyfiles import build
    finally:
        sys.path.pop(0)
    zip_path = str(tmp_path / "lyssandra_spark.zip")
    build(zip_path)

    out_dir = str(tmp_path / "warehouse")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.driver.memory=4g",
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "run_pipeline.py"),
            "--sf-dir", SF_SMOKE,
            "--out", out_dir,
        ],
        cwd=str(tmp_path),  # scratch cwd: repo import only via --py-files
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary_lines = [
        ln for ln in proc.stdout.splitlines() if ln.startswith('{"job"')
    ]
    assert len(summary_lines) == 1, proc.stdout[-2000:]
    summary = json.loads(summary_lines[0])
    assert summary["table"] == "turn_features"
    assert summary["rows"] > 0
    assert summary["defaultParallelism"] == 4

    # The catalog the job wrote is readable from this process and has the
    # 10^12-turn layout columns and the coded-feature schema (sans text).
    from lyssandra_spark.plans.pipeline import coded_transcripts
    from lyssandra_spark.sources.catalog import ParquetCatalog

    cat = ParquetCatalog(spark, out_dir)
    back = cat.read("turn_features")
    # hidden partitioning: layout columns exist on disk but stay out of
    # the logical schema unless asked for (Iceberg analogue)
    assert {"ts_day", "conv_bucket"}.isdisjoint(back.columns)
    layout = cat.read("turn_features", keep_partition_cols=True)
    assert {"ts_day", "conv_bucket"} <= set(layout.columns)
    assert "text" not in back.columns
    expected = coded_transcripts(spark, SF_SMOKE, algo="bomp", k=5).count()
    assert summary["rows"] == expected == back.count()
