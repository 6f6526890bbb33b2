"""One-pass table profiling (the ANALYZE TABLE / data-quality report a
pipeline runs before trusting a new drop of data).

:func:`profile_table` computes, for every requested column, in ONE
aggregation pass over the table (a single job, no per-column scans):
count / nulls / approx distinct (HLL) / min / max, plus mean / stddev
and approximate quantiles for numeric columns. The plan is one global
aggregate — partial aggregation map-side, a one-row result — so
profiling a 100 TB table costs exactly one scan, and the output is a
small long-format DataFrame (column, metric, value) ready to diff
against yesterday's profile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["profile_table", "profile_diff"]

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def _contains_map(dt: T.DataType) -> bool:
    """True if the type IS or CONTAINS a MapType anywhere (struct field,
    array element, map key/value): such columns are neither orderable
    (min/max) nor hashable (approx_count_distinct) in Spark SQL — at any
    nesting depth — and would crash the whole one-pass profile."""
    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75),
    rsd: float = 0.05,
) -> DataFrame:
    """Profile ``columns`` (default: all) in one aggregation pass.

    Returns a long-format DataFrame (column, metric, value) with value
    stringified (mixed types in one report column); numeric metrics are
    rendered with repr-level precision. ``rsd`` is the HLL relative
    standard deviation for approx_count_distinct; quantiles use
    ``approx_percentile`` (both are the mergeable-sketch aggregates —
    the only kind that can share the single pass).
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = list(columns) if columns is not None else list(fields)
    unknown = [c for c in cols if c not in fields]
    if unknown:
        raise ValueError(f"unknown columns: {unknown}")

    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs.append(F.count(c).alias(f"{c}::non_null"))
        if _contains_map(fields[c]):
            # maps — top-level OR nested inside a struct/array — are
            # neither orderable (min/max) nor hashable
            # (approx_count_distinct) in Spark SQL: count/nulls only,
            # instead of crashing the whole one-pass profile
            continue
        aggs += [
            F.approx_count_distinct(c, rsd).alias(f"{c}::approx_distinct"),
            F.min(c).cast("string").alias(f"{c}::min"),
            F.max(c).cast("string").alias(f"{c}::max"),
        ]
        if isinstance(fields[c], _NUMERIC):
            aggs += [
                F.avg(c).alias(f"{c}::mean"),
                F.stddev(c).alias(f"{c}::stddev"),
                F.percentile_approx(
                    c, F.array(*[F.lit(q) for q in quantiles])
                ).alias(f"{c}::quantiles"),
            ]
    row = df.agg(*aggs).collect()[0].asDict()

    n_rows = row.pop("__rows")
    out = [("*", "rows", str(n_rows))]
    for k, v in row.items():
        c, metric = k.split("::", 1)
        if metric == "non_null":
            out.append((c, "nulls", str(n_rows - v)))
            out.append((c, "non_null", str(v)))
        elif metric == "quantiles":
            qs = list(v) if v is not None else []
            for q, qv in zip(quantiles, qs):
                out.append((c, f"p{int(q * 100)}", repr(qv)))
        else:
            out.append((c, metric, None if v is None else repr(v)
                        if isinstance(v, float) else str(v)))
    return df.sparkSession.createDataFrame(
        out, "column string, metric string, value string"
    )


def profile_diff(before: DataFrame, after: DataFrame) -> DataFrame:
    """Diff two :func:`profile_table` outputs — the drift report a daily
    pipeline alerts on ("yesterday's drop vs today's"): one row per
    (column, metric) with both values and a ``changed`` flag. A metric
    present on only one side (schema evolution: a column appeared or
    vanished) surfaces with the other side null and ``changed=true``.
    Profiles are tiny long-format frames (a few rows per column), so
    this is a metadata-scale full-outer join — the 100 TB work already
    happened inside the two one-pass profiles."""
    # presence flags, not just values: a metric can legitimately carry a
    # NULL value (an all-null column's min/max), and eqNullSafe(absent,
    # null-valued) would otherwise report a one-sided schema change as
    # changed=false
    a = before.select(
        "column", "metric", F.col("value").alias("before"),
        F.lit(True).alias("__in_a"),
    )
    b = after.select(
        "column", "metric", F.col("value").alias("after"),
        F.lit(True).alias("__in_b"),
    )
    return (
        a.join(b, ["column", "metric"], "full_outer")
        .withColumn(
            "changed",
            ~F.col("before").eqNullSafe(F.col("after"))
            | ~F.coalesce("__in_a", F.lit(False))
            | ~F.coalesce("__in_b", F.lit(False)),
        )
        .drop("__in_a", "__in_b")
    )
