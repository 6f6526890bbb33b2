"""Per-group pandas operators (SURVEY.md §2.B B20-iii: applyInPandas).

For operators that genuinely need the whole group as one numpy/pandas
object (sequence statistics, per-entity model fits). Each group must fit
in one worker's memory — at 10^12 turns that is exactly the hot-key
hazard, so the operator composes with salting upstream, or callers use
the window-based equivalents for unboundedly long keys.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["group_sequence_stats"]


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
