"""Transcript/dictionary generator invariants (FIXTURES.md §B1-B2)."""

import numpy as np
from pyspark.sql import functions as F

from lyssandra_spark.sources import synth


def test_transcript_schema_and_keys(spark, sf_dir):
    t = synth.transcripts(spark, sf_dir)
    assert [f.name for f in t.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]
    n = t.count()
    assert n > 1000
    # (conv_id, turn_idx) unique
    assert t.select("conv_id", "turn_idx").distinct().count() == n


def test_ts_monotone_within_conv(spark, sf_dir):
    t = synth.transcripts(spark, sf_dir)
    from lyssandra_spark.operators.windows import with_lag

    bad = (
        with_lag(t, "ts", part="conv_id", order="turn_idx")
        .where(F.col("lag1_ts").isNotNull() & (F.col("ts") <= F.col("lag1_ts")))
        .count()
    )
    assert bad == 0


def test_hot_conversation_skew(spark, sf_dir):
    t = synth.transcripts(spark, sf_dir)
    counts = t.groupBy("conv_id").count()
    hot = counts.where(F.col("conv_id") == "conv-0-0").first()["count"]
    med = counts.approxQuantile("count", [0.5], 0.0)[0]
    assert hot >= 50 * med


def test_role_nulls_and_tool_consistency(spark, sf_dir):
    t = synth.transcripts(spark, sf_dir).cache()
    n = t.count()
    nulls = t.where(F.col("role").isNull()).count()
    assert 0.01 * n < nulls < 0.12 * n
    assert t.where((F.col("role") != "tool") & F.col("tool").isNotNull()).count() == 0
    assert t.where((F.col("role") == "tool") & F.col("tool").isNull()).count() == 0
    t.unpersist()


def test_deterministic_across_partitioning(spark, sf_dir):
    a = synth.transcripts(spark, sf_dir)
    b = synth.transcripts(spark, sf_dir).repartition(17)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_dups_variant(spark, sf_dir):
    base = synth.transcripts(spark, sf_dir)
    dup = synth.transcripts(spark, sf_dir, with_dups=True)
    assert dup.count() > base.count()
    assert dup.distinct().count() == base.count()


def test_dictionary_versions(spark, sf_dir):
    vers = synth.build_dict_versions(sf_dir, n_atoms=128)
    assert [v.version for v in vers] == [1, 2, 3]
    assert vers[0].valid_from_us < vers[1].valid_from_us < vers[2].valid_from_us
    for v in vers:
        assert v.D.shape == (64, 128)
        nrm = np.linalg.norm(v.D, axis=0)
        assert np.allclose(nrm, 1.0, atol=1e-9)
        assert np.allclose(v.G, v.D.T @ v.D)
    # versions differ materially
    assert np.abs(vers[0].D - vers[1].D).max() > 1e-3
    # deterministic rebuild
    vers2 = synth.build_dict_versions(sf_dir, n_atoms=128)
    for a, b in zip(vers, vers2):
        assert np.array_equal(a.D, b.D)
    df = synth.dictionary_versions(spark, vers)
    assert df.count() == 3
    row = df.where(F.col("version") == 1).first()
    got = np.asarray(row["atoms"]).T
    assert np.allclose(got, vers[0].D, atol=1e-12)
