"""Per-group pandas operators (SURVEY.md §2.B B20-iii/iv: applyInPandas
and grouped-agg pandas UDFs).

For operators that genuinely need the whole group as one numpy/pandas
object (sequence statistics, per-entity model fits). Each group must fit
in one worker's memory — at 10^12 turns that is exactly the hot-key
hazard, so the operator composes with salting upstream, or callers use
the window-based equivalents for unboundedly long keys. Grouped-AGG
pandas UDFs (:func:`rms_udf`, :func:`gini_udf`) are the lighter-weight
crossing: they return ONE scalar per group in an ordinary ``agg()``
(one shuffle, hash-aggregate plan shape). Two engine contracts to know:
they do NOT partial-aggregate map-side, and Spark refuses to mix them
with non-pandas aggregates in the same ``agg()``
([INVALID_PANDAS_UDF_PLACEMENT]) — so prefer an algebraic built-in
rewrite (rms == sqrt(avg(x*x))) when one exists, and when you do need a
UDF aggregate, run ALL of that agg's columns through pandas UDFs (as
:func:`session_signal_stats` does). The UDF form earns its keep for
genuinely non-algebraic per-group scalars like Gini.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, LongType

__all__ = ["group_sequence_stats", "rms_udf", "gini_udf", "session_signal_stats"]


# explicit DataType (not a DDL string): decoration happens at import
# time, before any SparkSession exists to parse "double"
@pandas_udf(DoubleType())
def rms_udf(v: pd.Series) -> float:
    """Grouped-agg pandas UDF (B20-iv): root-mean-square of the group.

    Algebraic — exists as a parity/contract subject; production code
    should prefer ``sqrt(avg(v * v))`` which partial-aggregates map-side
    (the pytest pins exact agreement between the two). Nulls are skipped,
    matching built-in aggregate semantics (a NaN-poisoning UDF would
    silently diverge from the builtin on any group with a null)."""
    a = v.dropna().to_numpy(dtype=np.float64)
    return float(np.sqrt(np.mean(a * a))) if len(a) else None


@pandas_udf(DoubleType())
def gini_udf(v: pd.Series) -> float:
    """Grouped-agg pandas UDF (B20-iv): Gini coefficient of the group's
    non-negative values — a genuinely non-algebraic per-group scalar (it
    needs the full sorted group, so no map-side partial exists; this IS
    the honest use case for a grouped-agg UDF). Nulls are skipped,
    matching built-in aggregate semantics."""
    a = np.sort(v.dropna().to_numpy(dtype=np.float64))
    n = len(a)
    if n == 0:
        return None
    s = a.sum()
    if s <= 0:
        return 0.0
    # G = (2 * sum(i * x_i) / (n * sum(x)) ) - (n + 1) / n, i = 1..n
    return float(2.0 * (np.arange(1, n + 1) * a).sum() / (n * s) - (n + 1) / n)


@pandas_udf(LongType())
def _count_udf(v: pd.Series) -> int:
    return int(v.count())  # non-null count, matching builtin count(col)


@pandas_udf(DoubleType())
def _mean_udf(v: pd.Series) -> float:
    return float(v.mean()) if len(v) else None


def session_signal_stats(
    df: DataFrame, value_col: str = "value", keys=("user_id",),
) -> DataFrame:
    """Per-key value-signal summary via grouped-agg pandas UDFs in one
    ``agg()`` — one hash-aggregate shuffle. All four aggregates are
    pandas UDFs because Spark disallows mixing grouped-agg pandas UDFs
    with built-in aggregates (see module docstring).

    Returns (keys..., n, mean_v, rms_v, gini_v)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    v = F.col(value_col)
    return df.groupBy(*keys).agg(
        _count_udf(v).alias("n"),
        _mean_udf(v).alias("mean_v"),
        rms_udf(v).alias("rms_v"),
        gini_udf(v).alias("gini_v"),
    )


def group_sequence_stats(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    label_col: str = "event_type",
) -> DataFrame:
    """Per-key sequence statistics computed group-at-a-time in pandas.

    Returns (key, n_rows, mean_gap_sec, max_gap_sec, n_label_changes):
    ordering inside the group is (ts, then any tie column ignored — gaps
    use sorted ts), label changes counted on the ts-sorted sequence.
    """
    out_schema = (
        f"{key} long, n_rows long, mean_gap_sec double, "
        f"max_gap_sec double, n_label_changes long"
    )

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, label_col], kind="mergesort")
        ts = pdf[ts_col].astype("datetime64[us]").astype(np.int64).to_numpy() / 1e6
        gaps = np.diff(ts)
        labels = pdf[label_col].to_numpy()
        changes = int((labels[1:] != labels[:-1]).sum()) if len(labels) > 1 else 0
        return pd.DataFrame(
            {
                key: [pdf[key].iloc[0]],
                "n_rows": [len(pdf)],
                "mean_gap_sec": [round(float(gaps.mean()), 4) if len(gaps) else None],
                "max_gap_sec": [round(float(gaps.max()), 4) if len(gaps) else None],
                "n_label_changes": [changes],
            }
        )

    return df.select(key, ts_col, label_col).groupBy(key).applyInPandas(
        stats, out_schema
    )
