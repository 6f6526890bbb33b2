"""Deterministic, leakage-safe dataset splitting (train/val/test).

The split decision every training-data pipeline ships last: assign each
GROUP (conversation, document, user — whatever the leakage unit is) to
exactly one named split, such that

- the same key always lands in the same split — across runs, partition
  layouts, cluster sizes, and data growth (new rows of an old
  conversation join its existing split: no train/val contamination when
  the corpus is re-snapshotted);
- fractions are honored in expectation via a salted 64-bit hash mapped
  to [0, 1) — no RNG state, no shuffle, no driver coordination: the
  assignment is a pure JVM expression that pipelines into the scan.

``sample()``/``randomSplit`` cannot give this: they are seed- and
partitioning-sensitive and split ROWS, not leakage units.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "hash_split",
    "split_column",
    "stratified_sample",
    "probabilistic_keep",
    "quantile_filter",
    "mix_sources",
]

_DENOM = float(1 << 63)


def _unit_hash(key_cols, *salts: str) -> Column:
    """Shared [0, 1) hash of the leakage-key columns: xxhash64 of
    (keys, salts), shifted unsigned into [0, 2^63) (drops one bit;
    2^-63 granularity is far below any practical fraction). EVERY
    deterministic decision in this module derives from this ONE
    expression — the cross-operator salt-namespacing and key-consistency
    guarantees the docstrings promise depend on all of them agreeing on
    it. Empty key columns are rejected: the hash would be a constant,
    silently keeping or dropping entire inputs wholesale."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if not keys:
        raise ValueError("key_cols must name at least one column")
    return F.shiftrightunsigned(
        F.xxhash64(*[F.col(k) for k in keys], *[F.lit(s) for s in salts]), 1
    ).cast("double") / F.lit(_DENOM)


def split_column(
    key_cols, fractions: dict[str, float], salt: str = "split-v1"
) -> Column:
    """Column expression assigning a split name from hashed key columns.

    ``fractions`` maps split name -> fraction; must sum to 1 (1e-9
    tolerance). The unit interval is carved in the dict's insertion
    order; ``salt`` namespaces independent splits of the same table
    (bump it to re-deal).
    """
    if not fractions:
        raise ValueError("fractions must be non-empty")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1 (got {total})")
    if any(v < 0 for v in fractions.values()):
        raise ValueError("fractions must be non-negative")
    u = _unit_hash(key_cols, salt)
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def hash_split(
    df: DataFrame,
    key_cols,
    fractions: dict[str, float] | None = None,
    salt: str = "split-v1",
    out_col: str = "split",
) -> DataFrame:
    """Append a deterministic ``split`` column (default 98/1/1
    train/val/test) keyed on ``key_cols`` — see :func:`split_column`."""
    if fractions is None:  # explicit None check: {} must reach validation
        fractions = {"train": 0.98, "val": 0.01, "test": 0.01}
    return df.withColumn(out_col, split_column(key_cols, fractions, salt))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    key_cols,
    default: float = 0.0,
    salt: str = "sample-v1",
) -> DataFrame:
    """Deterministic per-stratum downsampling (quality-band / language
    rebalancing — the curation step after scoring: keep 100% of high
    quality, 10% of mid, 1% of boilerplate).

    ``fractions`` maps a ``strata_col`` VALUE to its keep-fraction in
    [0, 1]; strata not listed keep ``default``. Same leakage-key
    guarantees as :func:`split_column` — the sampling unit is the KEY
    (all rows of a conversation/doc survive or drop together, stable
    across runs, partitionings, and corpus growth), the decision is a
    pure JVM expression pipelined into the scan (no shuffle, no RNG
    state), and ``salt`` namespaces it: by default it differs from the
    split salt, so sampling is independent of train/val/test assignment
    (the same hash would correlate "kept" with "train").

    ``df.sampleBy`` cannot give this: it is seed/partitioning-sensitive
    and samples rows, not leakage units.
    """
    if not fractions:
        raise ValueError("fractions must be non-empty")
    bad = {k: v for k, v in fractions.items() if not 0.0 <= float(v) <= 1.0}
    if bad or not 0.0 <= default <= 1.0:
        raise ValueError(
            f"keep-fractions must be in [0, 1]: {bad or {'default': default}}"
        )
    u = _unit_hash(key_cols, salt)
    pairs = [c for k, v in fractions.items() for c in (F.lit(k), F.lit(float(v)))]
    thresh = F.coalesce(
        F.create_map(*pairs)[F.col(strata_col)], F.lit(float(default))
    )
    return df.where(u < thresh)


def probabilistic_keep(
    df: DataFrame,
    prob_col,
    key_cols,
    salt: str = "keep-v1",
) -> DataFrame:
    """Keep each leakage key with ITS OWN probability — the continuous
    soft-sampling between :func:`stratified_sample`'s discrete bands and
    :func:`quantile_filter`'s hard gate. This is the GPT-3 move (Brown
    et al. 2020, Appendix A): documents are kept stochastically in
    proportion to a quality-classifier score, so high scorers are
    favored WITHOUT a cliff that discards every borderline document.

    ``prob_col`` is a column name or Column of keep-probabilities;
    values are clamped to [0, 1] (a raw classifier margin should be
    squashed first — e.g. ``1 / (1 + exp(-margin))``). Same guarantees
    as every sampler here: the decision is ``_unit_hash(keys, salt) <
    p`` — a pure JVM expression pipelined into the scan (no RNG state,
    no shuffle), key-consistent (all rows of a key share the hash; note
    they must also share the probability, which holds when the score is
    a per-key property), deterministic across runs/partitionings, and
    ``salt``-namespaced independent of split/sample/mix decisions. Null
    and NaN probabilities never keep (Spark orders NaN above every
    number, so an unguarded clamp would turn NaN into keep-always —
    the same trap quantile_filter documents).
    """
    p = (F.col(prob_col) if isinstance(prob_col, str) else prob_col).cast(
        "double"
    )
    p = F.when(F.isnan(p), F.lit(0.0)).otherwise(p)  # null stays null
    clamped = F.least(F.greatest(p, F.lit(0.0)), F.lit(1.0))
    return df.where(_unit_hash(key_cols, salt) < clamped)


def quantile_filter(
    df: DataFrame,
    score_col: str,
    keep_frac: float,
    higher_is_better: bool = True,
    accuracy: int = 10_000,
    strata_col: str | None = None,
) -> DataFrame:
    """Keep the best-scoring ``keep_frac`` of rows by an approximate
    score quantile (the CCNet-style move: score every document with a
    cheap model, keep the top fraction — Wenzek et al. 2020 keep
    perplexity terciles).

    ``strata_col`` selects the CCNet semantics proper: Wenzek et al.
    threshold PER LANGUAGE, because LM likelihood scales differ across
    languages — one global cutoff over a multilingual corpus keeps whole
    high-likelihood languages and drops whole low-likelihood ones. With
    ``strata_col`` set, each stratum gets its own cutoff (one
    ``groupBy(strata).agg(approx_percentile)`` sketch pass; the
    per-stratum cutoffs — one row per language, broadcast-small by
    construction — are broadcast-joined back, null-safe so a null
    stratum is its own stratum). Without it, one global cutoff (a single
    aggregation job, one scalar to the driver) and the filter is a plain
    pushdown-friendly predicate on a second scan.

    Null and NaN scores never survive in either mode (Spark orders NaN
    above every number, so an unguarded ``>= cut`` would pass every NaN
    — e.g. a log(0) perplexity artifact — through every quality filter
    forever). The cutoff is approximate (sketch ``accuracy``), so the
    kept fraction is approximate too — exactness is not possible in one
    pass without a full sort, and curation thresholds don't need it.
    Heavily TIED scores add over-keep no accuracy fixes: ``>= cut``
    keeps every row tied at the cutoff value, so with discrete scores
    (integer ratings, a dominant modal value) the kept fraction can far
    exceed ``keep_frac`` — break ties upstream (e.g. add a tiny hash
    jitter) if the volume bound matters more than score fidelity.
    """
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac ({keep_frac}) must be in (0, 1]")
    valid = F.col(score_col).isNotNull()
    if isinstance(df.schema[score_col].dataType, (T.FloatType, T.DoubleType)):
        valid = valid & ~F.isnan(score_col)
    clean = df.where(valid)
    if keep_frac == 1.0:
        return clean
    q = 1.0 - keep_frac if higher_is_better else keep_frac
    if strata_col is not None:
        cuts = (
            clean.groupBy(F.col(strata_col).alias("__stratum"))
            .agg(
                F.percentile_approx(
                    score_col, F.lit(q), F.lit(accuracy)
                ).alias("__cut")
            )
        )
        pred = (
            F.col(score_col) >= F.col("__cut")
            if higher_is_better
            else F.col(score_col) <= F.col("__cut")
        )
        return (
            clean.join(
                F.broadcast(cuts),
                F.col(strata_col).eqNullSafe(F.col("__stratum")),
            )
            .where(pred)
            .drop("__stratum", "__cut")
        )
    cut = clean.agg(
        F.percentile_approx(score_col, F.lit(q), F.lit(accuracy))
    ).collect()[0][0]
    if cut is None:  # all-null/NaN or empty input
        return df.where(F.lit(False))
    pred = (
        F.col(score_col) >= cut if higher_is_better else F.col(score_col) <= cut
    )
    return clean.where(pred)


def mix_sources(
    sources: dict,
    weights: dict,
    key_cols,
    salt: str = "mix-v1",
    source_col: str = "source",
) -> "DataFrame":
    """Deterministic training-mixture assembly: downsample each named
    corpus so the EXPECTED output proportions equal ``weights``, and
    union them with a ``source`` tag — the "N% web, M% code, K% books"
    recipe every LM data pipeline ships (mixture reweighting as in Brown
    et al. 2020 Table 2.2 / Gao et al. 2020 The Pile; this is the
    static-weights operator — learned weights just change the dict).

    Duplication-free by construction (no source is ever upsampled): the
    output total is the largest T with ``weights[s] * T <= n_s`` for
    every source, i.e. ``T = min(n_s / w_s)`` — the scarcest source is
    taken whole and the rest are hash-downsampled to match. Sampling is
    the same leakage-key-consistent pure-JVM xxhash64 predicate as
    :func:`stratified_sample` (all rows of a key survive or drop
    together; stable across runs, partitionings, and executor counts;
    ``salt`` namespaces it from split/sample decisions).

    Cost at 100 TB: one count() per positive-weight source — a
    column-pruned full-scan job, cheap on parquet because row-group
    metadata answers it without materializing columns, but a scan job
    nonetheless (cache or catalog-stat the sources if counts are hot) —
    then map-only filters + a plan-level union: no shuffle anywhere.
    Proportions are enforced at KEY granularity (leakage consistency:
    all rows of a key survive or drop together), so realized ROW
    proportions drift from ``weights`` when rows-per-key distributions
    differ across sources — size by rows-per-key if that matters.
    Sources must share a schema up to column order (unionByName;
    missing-column drift fails loudly rather than null-filling a corpus).
    """
    import math

    if set(sources) != set(weights):
        raise ValueError(
            f"sources {sorted(sources)} and weights {sorted(weights)} "
            "must name the same corpora"
        )
    if not sources:
        raise ValueError("sources must be non-empty")
    # learned/computed weights can arrive as NaN/inf — without the finite
    # check a NaN slips through every comparison (NaN < 0 is False) and
    # surfaces later as a bare empty-min() error with no hint
    bad = {
        k: w for k, w in weights.items()
        if not math.isfinite(w) or w < 0
    }
    if bad:
        raise ValueError(f"weights must be finite and non-negative: {bad}")
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("weights must sum to > 0")
    # the tag column must not shadow existing data (same policy as the
    # catalog's reserved `snap` name: loud beats silent overwrite)
    clash = sorted(k for k, df in sources.items() if source_col in df.columns)
    if clash:
        raise ValueError(
            f"sources {clash} already have a {source_col!r} column — "
            "pass a different source_col instead of silently overwriting it"
        )
    norm = {k: w / total_w for k, w in weights.items()}
    positive = {k for k, w in norm.items() if w > 0}
    # zero-weight sources contribute nothing: never pay their count() scan
    counts = {k: sources[k].count() for k in positive}
    for k in positive:
        if counts[k] == 0:
            raise ValueError(
                f"source {k!r} has weight {weights[k]} but zero rows"
            )
    # largest duplication-free total honoring the weights
    T = min(counts[k] / norm[k] for k in positive)
    out = None
    for k in sorted(positive):
        frac = min(1.0, (norm[k] * T) / counts[k])
        u = _unit_hash(key_cols, salt, k)
        piece = (
            sources[k].where(u < F.lit(frac))
            .withColumn(source_col, F.lit(k))
        )
        out = piece if out is None else out.unionByName(piece)
    return out
