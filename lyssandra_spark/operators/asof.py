"""As-of (point-in-time) join — the primitive Spark SQL lacks (SURVEY.md §2.B B1/B2).

For each fact row, attach the dimension row with the latest
``valid_col <= ts`` (backward), earliest ``valid_col >= ts`` (forward), or
closest in either direction (nearest), per equi-key, with an optional
tolerance that rejects matches further than a given interval away.

Two physical strategies, chosen explicitly (our one planner-like decision,
made above Catalyst on purpose):

- ``broadcast``: turn the dimension into half-open validity intervals via
  ``lead(valid_col)`` and broadcast-hash-join facts on the equi-keys with
  the range predicate as the join residual. Right when the dimension is
  small (SCD-2 dims almost always are). No shuffle of the fact table at
  all — at 10^12 fact rows this is the only acceptable plan.
- ``union``: tag fact and dim rows, union them, and take
  ``last(<dim col>, ignorenulls=True)`` over a window partitioned by key,
  ordered by (ts, is_dim DESC). Right when the dimension is itself huge
  (per-key histories that don't fit in a broadcast). One shuffle of
  facts+dims on the key — the same cost as any keyed join, with no
  interval blow-up.

Zero-leakage is structural: the backward predicate is strictly
``valid <= ts``; nothing later than ts can ever attach.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def _with_suffix(dim: DataFrame, keys: list[str], suffix: str) -> tuple[DataFrame, list[str]]:
    val_cols = [c for c in dim.columns if c not in keys]
    renamed = dim
    for c in val_cols:
        renamed = renamed.withColumnRenamed(c, c + suffix)
    return renamed, [c + suffix for c in val_cols]


def asof_join(
    facts: DataFrame,
    dim: DataFrame,
    on: list[str] | str | None,
    ts_col: str = "ts",
    valid_col: str = "valid_from",
    direction: str = "backward",
    tolerance: Column | None = None,
    strategy: str = "broadcast",
    suffix: str = "",
    how: str = "left",
    _dedup_dim: bool = True,
) -> DataFrame:
    """Point-in-time join of ``facts`` to ``dim``.

    Args:
        on: equi-key column name(s) shared by both sides; None/[] for a
            global (keyless) dimension — broadcast strategy only.
        ts_col: fact-side event-time column.
        valid_col: dim-side validity-start column (same type as ts_col).
        direction: 'backward' | 'forward' | 'nearest'.
        tolerance: optional Column interval (e.g. ``F.expr("INTERVAL 1 DAY")``);
            matches further than this from ts are rejected (become nulls).
        strategy: 'broadcast' | 'union' (union supports backward/forward,
            keyed dims only).
        suffix: appended to dim value columns to avoid collisions.
        how: 'left' (keep unmatched facts with nulls) or 'inner'.
    """
    keys = [on] if isinstance(on, str) else list(on or [])
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction {direction!r}")

    # Precondition for well-defined as-of semantics: one dim row per
    # (key, valid_col). Duplicates would make the broadcast strategy's
    # lead()-built intervals overlap (each matching fact row duplicated,
    # nondeterministic lead over tied sort keys) while the union strategy
    # returns one arbitrary row — the two strategies would disagree.
    # Enforce it here with a deterministic tiebreak (max xxhash64 of the
    # value columns) so both strategies see the identical deduped dim.
    # `_dedup_dim=False` is internal: the nearest composition recurses with
    # an already-deduped dim, and re-running the window would shuffle the
    # dim three times for nothing.
    if _dedup_dim:
        dim_val_cols = [c for c in dim.columns if c not in keys and c != valid_col]
        tiebreak = F.xxhash64(*dim_val_cols) if dim_val_cols else F.lit(0)
        wd = Window.partitionBy(*keys, valid_col).orderBy(tiebreak.desc())
        dim = (
            dim.withColumn("__rn", F.row_number().over(wd))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )

    if strategy == "auto":
        # one cheap planner-like decision: broadcast when the dim is small
        # enough to ship to every executor (bounded count probe — stops
        # scanning at the threshold), else the shuffle-based union strategy.
        limit = int(
            facts.sparkSession.conf.get("lyssandra.asof.broadcastRowLimit", "2000000")
        )
        probed = dim.limit(limit + 1).count()
        strategy = "broadcast" if (probed <= limit or not keys) else "union"

    if direction == "nearest":
        # compose: backward + forward, pick the closer non-null match
        b = asof_join(facts, dim, keys, ts_col, valid_col, "backward",
                      tolerance, strategy, suffix="__b", how="left",
                      _dedup_dim=False)
        f_ = asof_join(b, dim, keys, ts_col, valid_col, "forward",
                       tolerance, strategy, suffix="__f", how="left",
                       _dedup_dim=False)
        val_cols = [c for c in dim.columns if c not in keys]
        sec = lambda c: F.col(c).cast("timestamp").cast("double")  # noqa: E731
        db = F.abs(sec(ts_col) - sec(valid_col + "__b"))
        df_ = F.abs(sec(valid_col + "__f") - sec(ts_col))
        use_b = F.col(valid_col + "__f").isNull() | (
            F.col(valid_col + "__b").isNotNull() & (db <= df_)
        )
        out = f_
        for c in val_cols:
            out = out.withColumn(
                c + suffix, F.when(use_b, F.col(c + "__b")).otherwise(F.col(c + "__f"))
            )
        out = out.drop(*[c + "__b" for c in val_cols], *[c + "__f" for c in val_cols])
        if how == "inner":
            out = out.where(F.col(valid_col + suffix).isNotNull())
        return out

    if strategy == "broadcast":
        return _asof_broadcast(facts, dim, keys, ts_col, valid_col, direction,
                               tolerance, suffix, how)
    if strategy == "union":
        if not keys:
            raise ValueError("union strategy requires equi keys")
        return _asof_union(facts, dim, keys, ts_col, valid_col, direction,
                           tolerance, suffix, how)
    raise ValueError(f"strategy {strategy!r}")


def _asof_broadcast(facts, dim, keys, ts_col, valid_col, direction,
                    tolerance, suffix, how) -> DataFrame:
    dimr, _ = _with_suffix(dim, keys, suffix)
    # rename dim keys so join resolution is unambiguous even when the same
    # dim participates twice in one plan (the 'nearest' composition)
    for kcol in keys:
        dimr = dimr.withColumnRenamed(kcol, f"__dimkey_{kcol}")
    v = valid_col + suffix
    dkeys = [f"__dimkey_{kcol}" for kcol in keys]
    w = Window.partitionBy(*dkeys).orderBy(v) if keys else Window.orderBy(v)
    if direction == "backward":
        ival = dimr.withColumn("__valid_to", F.lead(v).over(w))
        cond = (F.col(ts_col) >= F.col(v)) & (
            F.col("__valid_to").isNull() | (F.col(ts_col) < F.col("__valid_to"))
        )
        if tolerance is not None:
            cond = cond & (F.col(ts_col) <= F.col(v) + tolerance)
    else:  # forward: earliest valid >= ts  <=>  prev_valid < ts <= valid
        ival = dimr.withColumn("__valid_prev", F.lag(v).over(w))
        cond = (F.col(ts_col) <= F.col(v)) & (
            F.col("__valid_prev").isNull() | (F.col(ts_col) > F.col("__valid_prev"))
        )
        if tolerance is not None:
            cond = cond & (F.col(v) <= F.col(ts_col) + tolerance)
    for kcol in keys:
        cond = cond & (F.col(kcol) == F.col(f"__dimkey_{kcol}"))
    joined = facts.join(F.broadcast(ival), cond, how)
    drop = ["__valid_to" if direction == "backward" else "__valid_prev"]
    drop += [f"__dimkey_{kcol}" for kcol in keys]
    return joined.drop(*drop)


def _asof_union(facts, dim, keys, ts_col, valid_col, direction,
                tolerance, suffix, how) -> DataFrame:
    dimr, val_cols = _with_suffix(dim, keys, suffix)
    v = valid_col + suffix
    f_tagged = facts.withColumn("__is_dim", F.lit(0))
    for c in val_cols:
        f_tagged = f_tagged.withColumn(c, F.lit(None).cast(dimr.schema[c].dataType))
    d_tagged = dimr.withColumn("__is_dim", F.lit(1)).withColumn(ts_col, F.col(v))
    for c in facts.columns:
        if c not in keys and c != ts_col:
            d_tagged = d_tagged.withColumn(c, F.lit(None).cast(facts.schema[c].dataType))
    cols = facts.columns + val_cols + ["__is_dim"]
    u = f_tagged.select(*cols).unionByName(d_tagged.select(*cols))
    if direction == "backward":
        # dim sorts BEFORE facts at equal ts (valid_from <= ts is inclusive)
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(ts_col).asc(), F.col("__is_dim").desc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = u
        for c in val_cols:
            filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(ts_col).asc(), F.col("__is_dim").asc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        filled = u
        for c in val_cols:
            filled = filled.withColumn(c, F.first(c, ignorenulls=True).over(w))
    out = filled.where(F.col("__is_dim") == 0).drop("__is_dim")
    if tolerance is not None:
        # Materialize the far-predicate ONCE from the original valid col
        # before nulling anything: the loop below nulls every dim value
        # column including `v` itself, and a predicate re-evaluated against
        # an already-nulled `v` would keep out-of-tolerance matches in all
        # columns processed after it.
        far = (
            (F.col(ts_col) > F.col(v) + tolerance)
            if direction == "backward"
            else (F.col(v) > F.col(ts_col) + tolerance)
        )
        out = out.withColumn("__far", F.coalesce(far, F.lit(False)))
        for c in val_cols:
            out = out.withColumn(
                c, F.when(F.col("__far"), F.lit(None)).otherwise(F.col(c))
            )
        out = out.drop("__far")
    if how == "inner":
        out = out.where(F.col(v).isNotNull())
    return out
