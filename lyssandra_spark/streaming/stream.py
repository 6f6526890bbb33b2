"""Structured Streaming surface (SURVEY.md §2.B B21 — stretch scope).

The encode kernels are state-free per turn (fixed dictionary history), so
the SAME `sparse_code` operator lifts to a streaming DataFrame unchanged —
mapInArrow is supported on streams. Windowed/sessionized aggregations use
the built-in `window`/`session_window` with watermarks for late turns.

Batch == stream parity is the test: running the stream with
`Trigger.AvailableNow` over the same parquet input must produce exactly
the batch results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lyssandra_spark.operators.encode import sparse_code
from lyssandra_spark.sources.synth import DictVersion

__all__ = ["read_transcript_stream", "encode_stream", "session_agg_stream",
           "tumbling_agg_stream", "dedup_stream", "stream_to_catalog"]


def read_transcript_stream(
    spark: SparkSession, path: str, schema, max_files: int = 4
) -> DataFrame:
    """File-source stream over a transcript parquet directory."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def encode_stream(sdf: DataFrame, versions: list[DictVersion], **kw) -> DataFrame:
    """Point-in-time sparse coding on a stream — identical operator as batch."""
    return sparse_code(sdf, versions, **kw)


def session_agg_stream(
    sdf: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-conversation session aggregates via session_window + watermark."""
    # watermarks need tz-aware TIMESTAMP (parquet NTZ is cast; session tz UTC)
    sdf = sdf.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        sdf.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), F.col("conv_id"))
        .agg(
            F.count("*").alias("n_turns"),
            F.min("turn_idx").alias("first_turn"),
            F.max("turn_idx").alias("last_turn"),
        )
        .select(
            "conv_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_turns", "first_turn", "last_turn",
        )
    )


def stateful_sessionize_stream(sdf: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Custom stateful sessionizer: per-conversation session ids assigned
    with applyInPandasWithState (state = last ts + running session id,
    carried across triggers). Matches the batch `sessionize` exactly when
    turns arrive in ts order (tested with one availableNow trigger)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "conv_id string, turn_idx int, ts timestamp, session_id int"
    state_schema = "last_ts double, last_session int"

    def fn(key, pdfs, state: GroupState):
        last_ts, last_session = state.get if state.exists else (None, 0)
        rows = pd.concat(list(pdfs)).sort_values(["ts", "turn_idx"])
        sess = []
        for t in rows["ts"]:
            tsec = t.timestamp()
            if last_ts is not None and tsec - last_ts > gap_seconds:
                last_session += 1
            sess.append(last_session)
            last_ts = tsec
        state.update((last_ts, last_session))
        rows = rows.assign(session_id=sess)
        yield rows[["conv_id", "turn_idx", "ts", "session_id"]]

    src = sdf.select(
        "conv_id", "turn_idx", F.col("ts").cast("timestamp").alias("ts")
    )
    return src.groupBy("conv_id").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def dedup_stream(
    sdf: DataFrame, keys=("conv_id", "turn_idx"), ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming idempotent re-ingest (B7 on a stream): drop duplicate
    (conv_id, turn_idx) arrivals with bounded state via
    ``dropDuplicatesWithinWatermark`` — duplicates arriving within the
    watermark window are suppressed, and state for keys older than the
    watermark is evicted (the property that keeps this runnable forever at
    ingest scale; a plain dropDuplicates on a stream retains ALL keys)."""
    sdf = sdf.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return sdf.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def tumbling_agg_stream(
    sdf: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window turn counts with late-data watermark."""
    sdf = sdf.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        sdf.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), F.col("role"))
        .agg(F.count("*").alias("n_turns"))
        .select(F.col("w.start").alias("win_start"), "role", "n_turns")
    )


def stream_to_catalog(
    sdf: DataFrame, catalog, table: str, checkpoint: str,
    trigger_available_now: bool = True,
):
    """Sink a stream into the snapshot catalog (B18 + B21 composed).

    Each micro-batch lands as one append-mode catalog snapshot via
    ``foreachBatch`` — so a streaming ingest gets the same manifest,
    time-travel, and read-back surface as batch writes. Delivery is
    exactly-once into the catalog: each snapshot's manifest entry stamps
    the (checkpoint, micro-batch id) pair, and the sink SKIPS a batch
    whose pair already appears in ``catalog.snapshots(table)`` — the
    standard idempotent-foreachBatch transaction pattern, so an
    at-least-once replay after a failure between the write and the
    checkpoint commit cannot double-append (the manifest scan is a tiny
    driver-side JSON read, not a data read). The key is the PAIR, not the
    batch id alone: Structured Streaming numbers batches per checkpoint,
    so a new query (fresh checkpoint) into an existing table starts at
    batch 0 again — keying on the id alone would silently drop its data,
    and two queries sharing a table would collide. Corollary: replay
    detection only spans restarts from the SAME checkpoint path (which is
    the only case the engine itself replays). Returns the started
    StreamingQuery; callers own awaitTermination.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        seen = {
            (s.get("meta", {}).get("stream_checkpoint"),
             s.get("meta", {}).get("stream_batch_id"))
            for s in catalog.snapshots(table)
        }
        if (checkpoint, batch_id) in seen:
            return  # replayed micro-batch: already committed, skip
        catalog.write(batch_df, table, mode="append",
                      meta={"stream_batch_id": batch_id,
                            "stream_checkpoint": checkpoint})

    w = sdf.writeStream.foreachBatch(sink).option("checkpointLocation", checkpoint)
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
