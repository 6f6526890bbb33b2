"""Deterministic hash splitting: key-consistency, partition invariance,
fraction accuracy, disjoint+exhaustive coverage, salt independence."""

import pytest
from pyspark.sql import functions as F

from lyssandra_spark.operators.split import hash_split
from lyssandra_spark.sources import synth


def test_split_is_keyed_and_partition_invariant(spark, sf_dir):
    t = synth.transcripts(spark, sf_dir)
    s1 = hash_split(t, "conv_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    # every row of a conversation gets the SAME split (the leakage unit)
    per_conv = s1.groupBy("conv_id").agg(
        F.countDistinct("split").alias("n_splits")
    )
    assert per_conv.where(F.col("n_splits") != 1).count() == 0
    # identical assignment under a different partitioning
    s2 = hash_split(t.repartition(13), "conv_id",
                    {"train": 0.8, "val": 0.1, "test": 0.1})
    a = {r["conv_id"]: r["split"]
         for r in s1.select("conv_id", "split").distinct().collect()}
    b = {r["conv_id"]: r["split"]
         for r in s2.select("conv_id", "split").distinct().collect()}
    assert a == b


def test_split_fractions_and_exhaustiveness(spark):
    df = spark.range(20000).select(F.col("id").alias("k"))
    out = hash_split(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"]
              for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}  # exhaustive, disjoint
    assert sum(counts.values()) == 20000
    assert abs(counts["train"] / 20000 - 0.8) < 0.02
    assert abs(counts["val"] / 20000 - 0.1) < 0.01
    assert abs(counts["test"] / 20000 - 0.1) < 0.01


def test_split_growth_stability(spark):
    """New keys joining the corpus never move old keys between splits —
    the property that keeps train/val uncontaminated across snapshots."""
    small = spark.range(5000).select(F.col("id").alias("k"))
    grown = spark.range(15000).select(F.col("id").alias("k"))
    fr = {"train": 0.9, "holdout": 0.1}
    a = {r["k"]: r["split"] for r in hash_split(small, "k", fr).collect()}
    b = {r["k"]: r["split"] for r in hash_split(grown, "k", fr).collect()}
    assert all(b[k] == v for k, v in a.items())


def test_split_salt_independence_and_validation(spark):
    df = spark.range(4000).select(F.col("id").alias("k"))
    fr = {"a": 0.5, "b": 0.5}
    s1 = {r["k"]: r["split"] for r in hash_split(df, "k", fr, salt="s1").collect()}
    s2 = {r["k"]: r["split"] for r in hash_split(df, "k", fr, salt="s2").collect()}
    flipped = sum(1 for k in s1 if s1[k] != s2[k])
    assert 0.3 < flipped / len(s1) < 0.7  # independent re-deal
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(df, "k", {"a": 0.5, "b": 0.6})
    with pytest.raises(ValueError, match="non-empty"):
        hash_split(df, "k", {})


def test_split_plan_is_scan_pipelined(spark, sf_dir):
    """The split is a pure expression: no Exchange, no Python crossing."""
    t = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = hash_split(t, "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_stratified_sample_fractions_and_key_consistency(spark):
    from lyssandra_spark.operators.split import stratified_sample

    # 3 rows per key so key-consistency is observable; stratum is a
    # property of the key (as in real curation: quality band per doc)
    n_keys = 6000
    df = (
        spark.range(n_keys)
        .select(F.col("id").alias("k"),
                (F.pmod("id", F.lit(3))).cast("string").alias("band"))
        .crossJoin(spark.range(3).select(F.col("id").alias("row_idx")))
    )
    fr = {"0": 1.0, "1": 0.3, "2": 0.0}
    kept = stratified_sample(df, "band", fr, "k").toPandas()

    per_key = kept.groupby("k").size()
    assert (per_key == 3).all()  # whole key survives or drops together

    kept_keys = kept.drop_duplicates("k")
    counts = kept_keys.groupby("band").size()
    assert counts.get("0", 0) == n_keys / 3          # keep-all stratum exact
    assert "2" not in counts.index                   # keep-none stratum empty
    frac1 = counts.get("1", 0) / (n_keys / 3)
    assert 0.25 < frac1 < 0.35                       # binomial tolerance

    # unlisted strata use `default` (drop by default)
    assert stratified_sample(df, "band", {"0": 1.0}, "k").toPandas()[
        "band"].unique().tolist() == ["0"]

    # deterministic across partitionings
    a = set(stratified_sample(df, "band", fr, "k").toPandas().k)
    b = set(stratified_sample(df.repartition(17), "band", fr, "k").toPandas().k)
    assert a == b

    import pytest as _pt
    with _pt.raises(ValueError, match=r"\[0, 1\]"):
        stratified_sample(df, "band", {"0": 1.5}, "k")


def test_stratified_sample_plan_and_split_independence(spark, sf_dir):
    from lyssandra_spark.operators.split import stratified_sample

    t = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = stratified_sample(t, "lang", {"en": 0.5}, "doc_id", default=0.5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan

    # sampling must not correlate with the train/test split: among kept
    # docs, the train fraction stays ~the split fraction
    kept = hash_split(out, "doc_id", {"train": 0.5, "test": 0.5}).toPandas()
    if len(kept) > 100:
        tr = (kept.split == "train").mean()
        assert 0.4 < tr < 0.6


def test_quantile_filter(spark):
    from lyssandra_spark.operators.split import quantile_filter

    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") * 1.0).alias("score")
    )
    top = quantile_filter(df, "score", 0.25).toPandas()
    # kept fraction ~ target (sketch accuracy tolerance)
    assert 0.23 < len(top) / 10_000 < 0.27
    assert top.score.min() >= 7000  # truly the top of the distribution
    bottom = quantile_filter(df, "score", 0.25, higher_is_better=False)
    assert bottom.agg(F.max("score")).collect()[0][0] <= 3000

    # keep_frac=1.0 keeps everything non-null; nulls never survive
    withnull = df.withColumn(
        "score", F.when(F.col("id") % 2 == 0, F.col("score"))
    )
    assert quantile_filter(withnull, "score", 1.0).count() == 5000
    kept = quantile_filter(withnull, "score", 0.5)
    assert kept.where(F.col("score").isNull()).count() == 0

    import pytest as _pt
    with _pt.raises(ValueError, match="keep_frac"):
        quantile_filter(df, "score", 0.0)
    # empty / all-null input keeps nothing
    empty = spark.createDataFrame([], "id long, score double")
    assert quantile_filter(empty, "score", 0.5).count() == 0


def test_quantile_filter_nan_and_ties_guard(spark):
    from lyssandra_spark.operators.split import quantile_filter

    df = spark.range(100).select(
        F.col("id"),
        F.when(F.col("id") == 99, F.lit(float("nan")))
        .otherwise(F.col("id") * 1.0).alias("score"),
    )
    top = quantile_filter(df, "score", 0.1).toPandas()
    # NaN sorts above every number in Spark — it must NOT ride the filter
    assert not top.score.isna().any()
    assert (top.score >= 88).all() and len(top) <= 12


def test_quantile_filter_per_stratum(spark):
    """CCNet semantics proper (Wenzek et al. 2020 threshold PER
    language): strata with disjoint score scales must each keep
    ~keep_frac — the global cutoff would keep the whole top-scale
    stratum and drop the whole bottom-scale one."""
    from lyssandra_spark.operators.split import quantile_filter

    # 3 strata x 1000 rows; per-stratum uniform scores on DISJOINT bands:
    # en in [0,1), de in [100,101), null-stratum in [10000,10001)
    df = spark.range(3000).select(
        F.col("id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "de").alias("lang"),
        (
            F.when(F.col("id") % 3 == 0, 0)
            .when(F.col("id") % 3 == 1, 100)
            .otherwise(10_000)
            + (F.col("id") % 1000) / 1000.0
        ).alias("score"),
    )
    kept = quantile_filter(df, "score", 0.3, strata_col="lang")
    pdf = kept.toPandas()
    counts = pdf.fillna({"lang": "<null>"}).groupby("lang").size()
    for stratum in ("en", "de", "<null>"):
        assert 270 <= counts[stratum] <= 330, counts.to_dict()
    # each stratum's survivors are the top of ITS band
    assert pdf[pdf.lang == "en"].score.min() >= 0.65
    assert pdf[pdf.lang == "de"].score.min() >= 100.65
    # the global cutoff drops the bottom-band language entirely
    glob = quantile_filter(df, "score", 0.3).toPandas()
    assert (glob.lang.fillna("<null>") == "<null>").all()

    # per-stratum NaN/null scores never survive, same as the global path
    withbad = df.withColumn(
        "score",
        F.when(F.col("id") < 3, F.lit(float("nan")))
        .when(F.col("id") < 6, F.lit(None).cast("double"))
        .otherwise(F.col("score")),
    )
    kb = quantile_filter(withbad, "score", 0.5, strata_col="lang").toPandas()
    assert not kb.score.isna().any()

    # cutoffs ride a broadcast join (one small row per stratum)
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # output schema is unchanged (no leaked helper columns)
    assert kept.columns == df.columns


def test_mix_sources_proportions_and_determinism(spark):
    """Training-mixture assembly: output proportions ~ weights, the
    scarcest source is taken WHOLE (never upsampled), zero-weight
    sources are excluded, and the decision is deterministic + map-only."""
    from lyssandra_spark.operators.split import mix_sources

    web = spark.range(20_000).select(F.col("id").alias("doc_id"))
    code = spark.range(40_000, 50_000).select(F.col("id").alias("doc_id"))
    books = spark.range(90_000, 94_000).select(F.col("id").alias("doc_id"))
    srcs = {"web": web, "code": code, "books": books}
    w = {"web": 0.5, "code": 0.3, "books": 0.2}
    out = mix_sources(srcs, w, key_cols="doc_id")
    pdf = out.toPandas()
    got = pdf.groupby("source").size()
    # T = min(20000/.5, 10000/.3, 4000/.2) = 20000 -> books taken whole
    assert got["books"] == 4_000
    total = len(pdf)
    for k in w:
        assert abs(got[k] / total - w[k]) < 0.02, got.to_dict()

    # deterministic under repartitioning: identical kept id sets
    out2 = mix_sources(
        {k: v.repartition(7) for k, v in srcs.items()}, w, key_cols="doc_id"
    )
    assert set(pdf.doc_id) == {r["doc_id"] for r in out2.collect()}

    # zero-weight source contributes nothing
    w0 = {"web": 0.7, "code": 0.3, "books": 0.0}
    out0 = mix_sources(srcs, w0, key_cols="doc_id").toPandas()
    assert "books" not in set(out0.source)

    # map-only plan: hash filters + union, no shuffle
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_mix_sources_key_consistency_and_validation(spark):
    from lyssandra_spark.operators.split import mix_sources

    # every conv has 4 rows; the sampling unit must be the conv
    conv = spark.range(2_000).select(
        (F.col("id") % 500).alias("conv_id"), F.col("id")
    )
    other = spark.range(10_000, 12_000).select(
        (F.col("id") % 500 + 1000).alias("conv_id"), F.col("id")
    )
    out = mix_sources(
        {"a": conv, "b": other}, {"a": 0.5, "b": 0.5}, key_cols="conv_id"
    ).toPandas()
    sizes = out.groupby("conv_id").size()
    assert (sizes == 4).all()  # conversations survive or drop together

    with pytest.raises(ValueError, match="same corpora"):
        mix_sources({"a": conv}, {"a": 0.5, "b": 0.5}, "conv_id")
    with pytest.raises(ValueError, match="non-negative"):
        mix_sources({"a": conv, "b": other}, {"a": 1.2, "b": -0.2}, "conv_id")
    with pytest.raises(ValueError, match="sum to > 0"):
        mix_sources({"a": conv}, {"a": 0.0}, "conv_id")
    empty = conv.where(F.lit(False))
    with pytest.raises(ValueError, match="zero rows"):
        mix_sources({"a": conv, "b": empty}, {"a": 0.5, "b": 0.5}, "conv_id")
    # learned weights can arrive NaN/inf: loud named error, not a bare
    # empty-min() crash three stack frames later
    with pytest.raises(ValueError, match="finite"):
        mix_sources({"a": conv, "b": other},
                    {"a": float("nan"), "b": 0.5}, "conv_id")
    with pytest.raises(ValueError, match="finite"):
        mix_sources({"a": conv, "b": other},
                    {"a": float("inf"), "b": 0.5}, "conv_id")
    # the tag column must not silently overwrite existing data
    tagged = conv.withColumn("source", F.lit("orig"))
    with pytest.raises(ValueError, match="source"):
        mix_sources({"a": tagged, "b": other},
                    {"a": 0.5, "b": 0.5}, "conv_id")
    # empty key list would hash to a per-source constant: rejected
    with pytest.raises(ValueError, match="at least one column"):
        mix_sources({"a": conv, "b": other}, {"a": 0.5, "b": 0.5}, [])
    # zero-weight sources never pay a count() scan: a corpus that would
    # EXPLODE if counted (rdd with a poison pill) passes through untouched
    class _Boom:
        def count(self_inner):
            raise AssertionError("zero-weight source was counted")
        @property
        def columns(self_inner):
            return ["conv_id", "id"]
    out = mix_sources(
        {"a": conv, "boom": _Boom()}, {"a": 1.0, "boom": 0.0}, "conv_id"
    )
    assert out.count() > 0


def test_probabilistic_keep_tracks_per_row_probability(spark):
    """Continuous soft-sampling (the GPT-3 Pareto-style keep): realized
    keep rate per probability band ~ the band's probability, NaN/null
    probabilities never keep, out-of-range values clamp, decisions are
    key-consistent and deterministic."""
    from lyssandra_spark.operators.split import probabilistic_keep

    n = 30_000
    df = spark.range(n).select(
        F.col("id").alias("k"),
        ((F.col("id") % 3) * 0.4).alias("p"),  # bands: 0.0 / 0.4 / 0.8
    )
    kept = probabilistic_keep(df, "p", "k").toPandas()
    rates = kept.groupby("p").size() / (n / 3)
    assert rates.get(0.0, 0) == 0                 # p=0 keeps nothing
    assert abs(rates[0.4] - 0.4) < 0.03
    assert abs(rates[0.8] - 0.8) < 0.03

    # clamping + null/NaN
    edge = spark.createDataFrame(
        [(1, 7.5), (2, -3.0), (3, None), (4, float("nan"))],
        "k long, p double",
    )
    got = probabilistic_keep(edge, "p", "k").toPandas()
    assert got.k.tolist() == [1]  # >1 clamps to keep-always; rest drop

    # deterministic across partitionings; key-consistent on multi-row keys
    a = set(probabilistic_keep(df, "p", "k").toPandas().k)
    b = set(probabilistic_keep(df.repartition(13), "p", "k").toPandas().k)
    assert a == b
    multi = df.crossJoin(spark.range(3).select(F.col("id").alias("r")))
    per_key = (
        probabilistic_keep(multi, "p", "k").toPandas().groupby("k").size()
    )
    assert (per_key == 3).all()

    # map-only plan
    plan = (
        probabilistic_keep(df, "p", "k")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan
