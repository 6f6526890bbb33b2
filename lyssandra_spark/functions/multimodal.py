"""Multimodal column plumbing (image/audio/video as opaque binary columns).

The Spark-side machinery — schema, partition-size-aware batching, Arrow
UDF signatures, typed metadata structs — is real and tested; the actual
media decoding is STUBBED: the sandbox has no image/audio libraries, so
`decode_image` raises NotImplementedError unless `fake=True`, in which
case a deterministic fake decoder (hash-derived pixel stats) stands in so
the full pipeline shape can be exercised end-to-end.

Pattern for 100 TB media tables:
- media bytes live in their own column (parquet binary; on a real lake,
  usually a pointer column + object-store fetch inside the UDF)
- decode / feature-extract runs in `mapInPandas` with a SMALL
  maxRecordsPerBatch (media rows are MBs, not KBs — batch by bytes, not
  rows) and returns fixed-schema feature structs
- downstream joins/apply are ordinary columnar ops on the features
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["attach_fake_media", "decode_image_features", "IMAGE_FEATURE_SCHEMA"]

IMAGE_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_bytes", T.IntegerType(), False),
    T.StructField("mean_pixel", T.DoubleType(), True),
    T.StructField("feature", T.ArrayType(T.DoubleType()), True),
])


def attach_fake_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic opaque binary column (stand-in for image bytes)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(
            F.concat(F.lit("IMGv1:"), F.md5(F.col(id_col).cast("string")),
                     F.repeat(F.md5(F.concat(F.lit("px"), F.col(id_col).cast("string"))), 8)),
            "utf-8",
        ).alias("media_bytes"),
        F.struct(
            F.lit("image/png").alias("mime"),
            (F.pmod(F.xxhash64(id_col), 512) + 32).cast("int").alias("width"),
            (F.pmod(F.xxhash64(id_col, F.lit("h")), 512) + 32).cast("int").alias("height"),
        ).alias("media_meta"),
    )


def _fake_decode(buf: bytes, width: int, height: int, dim: int = 8):
    """Deterministic fake decoder: hash-derived pixel statistics."""
    arr = np.frombuffer(buf, dtype=np.uint8).astype(np.float64)
    mean_pixel = float(arr.mean()) if len(arr) else None
    feat = [float(arr[i::dim].sum() % 255.0) for i in range(dim)] if len(arr) else None
    return mean_pixel, feat


def decode_image_features(
    df: DataFrame, fake: bool = True, feature_dim: int = 8,
    bytes_per_batch: int = 64 << 20,
) -> DataFrame:
    """Decode media_bytes -> typed feature struct via mapInPandas.

    With fake=False this raises NotImplementedError from the workers — the
    real decoder needs PIL/libvips, absent in this sandbox. The Spark
    plumbing (schema, batching, UDF signature) is identical either way.
    """

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real image decode requires PIL/libvips (not in sandbox); "
                    "run with fake=True for the deterministic stand-in"
                )
            out = {"media_id": [], "width": [], "height": [], "n_bytes": [],
                   "mean_pixel": [], "feature": []}
            # flush in sub-batches bounded by BYTES (media rows are large)
            acc_bytes = 0
            for mid, buf, meta in zip(pdf["media_id"], pdf["media_bytes"],
                                      pdf["media_meta"]):
                mp, feat = _fake_decode(buf, meta["width"], meta["height"],
                                        feature_dim)
                out["media_id"].append(mid)
                out["width"].append(meta["width"])
                out["height"].append(meta["height"])
                out["n_bytes"].append(len(buf))
                out["mean_pixel"].append(mp)
                out["feature"].append(feat)
                acc_bytes += len(buf)
                if acc_bytes >= bytes_per_batch:
                    yield pd.DataFrame(out)
                    out = {k: [] for k in out}
                    acc_bytes = 0
            if out["media_id"]:
                yield pd.DataFrame(out)

    return df.mapInPandas(decode, IMAGE_FEATURE_SCHEMA)
