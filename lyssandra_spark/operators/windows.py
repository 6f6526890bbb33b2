"""Windowed feature-engineering operators (SURVEY.md §2.B B3-B8, B16).

All are thin, composable DataFrame -> DataFrame functions over
``pyspark.sql.Window`` — Catalyst/Tungsten execute them JVM-side with
whole-stage codegen; there is no Python in any of these paths.

Skew note (B16): ``Window.partitionBy(key)`` puts an entire key on one
task, and AQE does NOT split skewed window partitions (it only splits
skewed shuffle-join/agg partitions). For genuinely hot keys (the 10^6-turn
conversation), use :func:`salted_agg` for aggregations (two-phase: partial
per salt -> final). Window ops with BOUNDED lookback (lag-n, rolling-n)
have skew-proof variants (:func:`with_lag_bucketed`,
:func:`rolling_bucketed`) that split each key into
(key, order div bucket_size) partitions with n overlap rows — exact same
results (tested), bounded task size regardless of key skew.
UNBOUNDED-lookback ops (sessionize's running cumsum, ffill's
last-non-null) have segmented-scan variants
(:func:`sessionize_bucketed`, :func:`ffill_bucketed`): a local pass per
(key, bucket) plus a one-row-per-bucket per-key summary window — exact
same results (tested), so no key ever serializes a task longer than
bucket_size rows even at 10^12-turn scale.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "with_lag",
    "with_lead",
    "sessionize",
    "sessionize_bucketed",
    "ffill",
    "ffill_bucketed",
    "bfill",
    "rolling",
    "rolling_range",
    "dedup_latest",
    "topk",
    "with_salt",
    "salted_agg",
    "with_lag_bucketed",
    "rolling_bucketed",
]


def _w(part, order):
    part = [part] if isinstance(part, str) else list(part)
    order = [order] if isinstance(order, str) else list(order)
    return Window.partitionBy(*part).orderBy(*order)


def with_lag(df: DataFrame, cols, n: int = 1, part="conv_id", order="turn_idx",
             prefix: str = "lag") -> DataFrame:
    """Previous-turn value(s) within a conversation (B3)."""
    w = _w(part, order)
    cols = [cols] if isinstance(cols, str) else list(cols)
    for c in cols:
        df = df.withColumn(f"{prefix}{n}_{c}", F.lag(c, n).over(w))
    return df


def with_lead(df: DataFrame, cols, n: int = 1, part="conv_id", order="turn_idx",
              prefix: str = "lead") -> DataFrame:
    w = _w(part, order)
    cols = [cols] if isinstance(cols, str) else list(cols)
    for c in cols:
        df = df.withColumn(f"{prefix}{n}_{c}", F.lead(c, n).over(w))
    return df


def sessionize(df: DataFrame, gap_seconds: int = 1800, part="conv_id",
               ts_col: str = "ts", out_col: str = "session_id") -> DataFrame:
    """Split each partition into sessions on ts gaps > gap_seconds (B4).

    Classic two-window form: gap flag via lag, then a running sum of flags
    (both over the same partitioning+ordering => one shuffle, one sort).
    session_id is 0-based within the partition key.
    """
    w = _w(part, ts_col)
    # cast via TIMESTAMP: parquet NTZ timestamps can't cast directly to double
    sec = F.col(ts_col).cast("timestamp").cast("double")
    gap = sec - F.lag(sec).over(w)
    flag = F.when(gap > F.lit(float(gap_seconds)), 1).otherwise(0)
    return df.withColumn(
        out_col,
        F.sum(flag).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"),
    )


def ffill(df: DataFrame, cols, part="conv_id", order="turn_idx") -> DataFrame:
    """Forward-fill nulls from the last non-null value within the key (B5)."""
    w = _w(part, order).rowsBetween(Window.unboundedPreceding, 0)
    cols = [cols] if isinstance(cols, str) else list(cols)
    for c in cols:
        df = df.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return df


def bfill(df: DataFrame, cols, part="conv_id", order="turn_idx") -> DataFrame:
    """Backward-fill nulls from the next non-null value within the key (B5)."""
    w = _w(part, order).rowsBetween(0, Window.unboundedFollowing)
    cols = [cols] if isinstance(cols, str) else list(cols)
    for c in cols:
        df = df.withColumn(c, F.first(c, ignorenulls=True).over(w))
    return df


def rolling(df: DataFrame, col: str, n: int, part="conv_id", order="turn_idx",
            aggs=("avg", "sum", "count")) -> DataFrame:
    """Rolling aggregates over the last n rows (inclusive) per key (B6)."""
    w = _w(part, order).rowsBetween(-(n - 1), 0)
    for a in aggs:
        df = df.withColumn(f"{a}_{col}_{n}", getattr(F, a)(col).over(w))
    return df


def rolling_range(df: DataFrame, col: str, seconds: float, part="conv_id",
                  order: str = "ts", aggs=("avg", "sum", "count")) -> DataFrame:
    """Time-based rolling aggregates: every row in the trailing
    ``seconds``-wide window ending at the current row's timestamp,
    inclusive, per key (B6 RANGE frame) — "the last 30 minutes", not "the
    last 5 rows".

    The frame runs on exact integer microseconds (``unix_micros``), never
    float epoch seconds, so the window boundary is bit-deterministic and
    engine-portable (a double epoch at 2024 magnitudes cannot represent
    microseconds exactly, and boundary rows would flicker across engines).
    Per SQL RANGE semantics, rows tied on ``order`` are peers and all fall
    inside each other's frame. Output columns ``{agg}_{col}_{seconds}s``,
    with non-identifier characters in the seconds label mapped to ``_``
    (0.5 -> ``avg_v_0_5s``) so the names stay dot-free and safely
    referencable without backticks. Single keyed shuffle, fully JVM-side; like all value-range frames this
    puts each key on one task — for hot keys compose with the bucketing
    strategy of :func:`rolling_bucketed` (the context overlap is
    ``seconds`` of rows instead of n rows).
    """
    part = [part] if isinstance(part, str) else list(part)
    us = int(round(seconds * 1_000_000))
    w = (
        Window.partitionBy(*part)
        .orderBy(F.unix_micros(F.col(order).cast("timestamp")))
        .rangeBetween(-us, 0)
    )
    label = re.sub(r"[^0-9a-zA-Z]", "_", f"{seconds:g}") + "s"
    for a in aggs:
        df = df.withColumn(f"{a}_{col}_{label}", getattr(F, a)(col).over(w))
    return df


def dedup_latest(df: DataFrame, keys, order, desc: bool = True) -> DataFrame:
    """Keep one row per key: latest by `order` (idempotent re-ingest, B7).

    Ties broken deterministically by the full order column list.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    order = [order] if isinstance(order, str) else list(order)
    ob = [F.col(c).desc() if desc else F.col(c).asc() for c in order]
    w = Window.partitionBy(*keys).orderBy(*ob)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def topk(df: DataFrame, keys, order, k: int, desc: bool = True) -> DataFrame:
    """Top-k rows per key by `order` (B8), rank column `rk` retained."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    order = [order] if isinstance(order, str) else list(order)
    ob = [F.col(c).desc() if desc else F.col(c).asc() for c in order]
    w = Window.partitionBy(*keys).orderBy(*ob)
    return (
        df.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )


def with_lag_bucketed(
    df: DataFrame, col: str, n: int = 1, part="conv_id",
    order_col: str = "turn_idx", bucket_size: int = 4096,
    prefix: str = "lag",
) -> DataFrame:
    """Skew-proof lag for bounded-lookback windows over hot keys (B16).

    ``Window.partitionBy(key)`` puts a whole key on ONE task; AQE never
    splits a skewed window partition, so a 10^6-turn conversation
    serializes. This variant partitions by (key, order div bucket_size):
    the last `n` rows of each bucket are duplicated into the next bucket
    as context rows, the window runs per (key, bucket) — bounded task
    size regardless of key skew — and context rows are dropped after
    providing lag values. Result is EXACTLY equal to :func:`with_lag`
    (tested), requires `order_col` to be a dense integer per key, and
    lookback n must be < bucket_size.
    """
    if n >= bucket_size:
        raise ValueError("lookback must be smaller than bucket_size")
    part = [part] if isinstance(part, str) else list(part)
    bucket = (F.col(order_col) / bucket_size).cast("long")
    main = df.withColumn("__bkt", bucket).withColumn("__ctx", F.lit(False))
    ctx = (
        df.where(F.pmod(F.col(order_col), F.lit(bucket_size)) >= bucket_size - n)
        .withColumn("__bkt", bucket + 1)
        .withColumn("__ctx", F.lit(True))
    )
    u = main.unionByName(ctx)
    w = Window.partitionBy(*part, "__bkt").orderBy(order_col)
    out = (
        u.withColumn(f"{prefix}{n}_{col}", F.lag(col, n).over(w))
        .where(~F.col("__ctx"))
        .drop("__bkt", "__ctx")
    )
    return out


def rolling_bucketed(
    df: DataFrame, col: str, n: int, part="conv_id",
    order_col: str = "turn_idx", bucket_size: int = 4096,
    aggs=("avg", "sum", "count"),
) -> DataFrame:
    """Skew-proof rolling window (last n rows) via the same overlap trick.

    Context rows = previous n-1 rows of each bucket boundary; exact
    equality with :func:`rolling` (tested)."""
    if n - 1 >= bucket_size:
        raise ValueError("frame must be smaller than bucket_size")
    part = [part] if isinstance(part, str) else list(part)
    bucket = (F.col(order_col) / bucket_size).cast("long")
    main = df.withColumn("__bkt", bucket).withColumn("__ctx", F.lit(False))
    ctx = (
        df.where(F.pmod(F.col(order_col), F.lit(bucket_size)) >= bucket_size - (n - 1))
        .withColumn("__bkt", bucket + 1)
        .withColumn("__ctx", F.lit(True))
    )
    u = main.unionByName(ctx)
    w = (
        Window.partitionBy(*part, "__bkt")
        .orderBy(order_col)
        .rowsBetween(-(n - 1), 0)
    )
    out = u
    for a in aggs:
        out = out.withColumn(f"{a}_{col}_{n}", getattr(F, a)(col).over(w))
    return out.where(~F.col("__ctx")).drop("__bkt", "__ctx")


def sessionize_bucketed(
    df: DataFrame, gap_seconds: int = 1800, part="conv_id",
    ts_col: str = "ts", order_col: str = "turn_idx",
    bucket_size: int = 4096, out_col: str = "session_id",
) -> DataFrame:
    """Skew-proof sessionize for UNBOUNDED-lookback cumsum (B16).

    Plain :func:`sessionize` puts a whole key on one task (and AQE never
    splits a skewed window partition), so a 10^6-turn conversation
    serializes. This is the classic segmented scan: a local pass per
    (key, order_col div bucket_size) computes within-bucket gap flags and
    their running sum, then ONE ROW PER BUCKET (first/last ts, flag count)
    flows through a per-key window — thousands of rows, not billions — to
    produce each bucket's session-id offset (internal flags of earlier
    buckets + boundary-gap flags), joined back and added. EXACTLY equal to
    :func:`sessionize` (tested, incl. the hot conversation); requires
    `order_col` to be ts-monotone integers per key (turn_idx is).
    """
    part = [part] if isinstance(part, str) else list(part)
    sec = F.col(ts_col).cast("timestamp").cast("double")
    b = df.withColumn("__bkt", (F.col(order_col) / bucket_size).cast("long"))
    wl = Window.partitionBy(*part, "__bkt").orderBy(order_col)
    gap = sec - F.lag(sec).over(wl)
    flag = F.when(gap > F.lit(float(gap_seconds)), 1).otherwise(0)
    local = b.withColumn(
        "__lsid", F.sum(flag).over(wl.rowsBetween(Window.unboundedPreceding, 0))
    )
    summaries = local.groupBy(*part, "__bkt").agg(
        F.min(sec).alias("__first"),
        F.max(sec).alias("__last"),
        F.max("__lsid").alias("__nflags"),
    )
    ws = Window.partitionBy(*part).orderBy("__bkt")
    bflag = F.when(
        (F.col("__first") - F.lag("__last").over(ws)) > F.lit(float(gap_seconds)),
        1,
    ).otherwise(0)
    offsets = summaries.withColumn("__bflag", bflag).select(
        *part,
        "__bkt",
        (
            F.coalesce(
                F.sum("__nflags").over(
                    ws.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
            + F.sum("__bflag").over(ws.rowsBetween(Window.unboundedPreceding, 0))
        ).alias("__off"),
    )
    out = local.join(offsets, [*part, "__bkt"])
    return out.withColumn(
        out_col, (F.col("__lsid") + F.col("__off")).cast("int")
    ).drop("__bkt", "__lsid", "__off")


def ffill_bucketed(
    df: DataFrame, cols, part="conv_id", order_col: str = "turn_idx",
    bucket_size: int = 4096,
) -> DataFrame:
    """Skew-proof forward-fill (B16), same segmented-scan shape as
    :func:`sessionize_bucketed`: fill within (key, bucket) locally, carry
    each bucket's last non-null through a one-row-per-bucket per-key
    window, coalesce. EXACTLY equal to :func:`ffill` (tested); requires
    integer `order_col` per key.
    """
    part = [part] if isinstance(part, str) else list(part)
    cols = [cols] if isinstance(cols, str) else list(cols)
    b = df.withColumn("__bkt", (F.col(order_col) / bucket_size).cast("long"))
    wl = (
        Window.partitionBy(*part, "__bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = b
    for c in cols:
        local = local.withColumn(c, F.last(c, ignorenulls=True).over(wl))
    summaries = local.groupBy(*part, "__bkt").agg(
        *[
            F.max_by(c, F.when(F.col(c).isNotNull(), F.col(order_col))).alias(
                f"__blast_{c}"
            )
            for c in cols
        ]
    )
    ws = Window.partitionBy(*part).orderBy("__bkt")
    carries = summaries.select(
        *part,
        "__bkt",
        *[
            F.last(f"__blast_{c}", ignorenulls=True)
            .over(ws.rowsBetween(Window.unboundedPreceding, -1))
            .alias(f"__carry_{c}")
            for c in cols
        ],
    )
    out = local.join(carries, [*part, "__bkt"])
    for c in cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.col(f"__carry_{c}")))
    return out.drop("__bkt", *[f"__carry_{c}" for c in cols])


def with_salt(df: DataFrame, n_buckets: int = 16, cols=("conv_id", "turn_idx"),
              out_col: str = "salt") -> DataFrame:
    """Deterministic salt bucket from a hash of `cols` (B16)."""
    return df.withColumn(
        out_col, F.pmod(F.xxhash64(*cols), F.lit(n_buckets)).cast("int")
    )


def salted_agg(df: DataFrame, keys, aggs: dict[str, tuple[str, str]],
               n_buckets: int = 16, salt_cols=("conv_id", "turn_idx")) -> DataFrame:
    """Two-phase aggregation for skewed keys (B16).

    Phase 1 groups by (keys + salt) — the hot key's rows spread over
    n_buckets tasks; phase 2 merges the partials. `aggs` maps output name
    -> (fn, col) where fn is one of sum/count/min/max (re-aggregable fns;
    avg is expressed as sum+count by the caller).

    Result is exactly equal to the unsalted groupBy (tested vs oracle).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    salted = with_salt(df, n_buckets, cols=salt_cols)
    partial_exprs, final_exprs = [], []
    for name, (fn, col) in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count(col).alias(f"__p_{name}"))
            final_exprs.append(F.sum(f"__p_{name}").alias(name))
        elif fn in ("sum", "min", "max"):
            partial_exprs.append(getattr(F, fn)(col).alias(f"__p_{name}"))
            final_exprs.append(getattr(F, fn)(f"__p_{name}").alias(name))
        else:
            raise ValueError(f"non-reaggregable fn {fn!r}")
    return (
        salted.groupBy(*keys, "salt").agg(*partial_exprs)
        .groupBy(*keys).agg(*final_exprs)
    )
