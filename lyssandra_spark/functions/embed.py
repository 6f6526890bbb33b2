"""Deterministic text embedder (SURVEY.md §2.A A10).

The reference's front-end turns images into descriptors
(``lyssa/feature_extract/`` — SIFT/patches); ours turns transcript turn
text into fixed-dim float vectors. No external models: signed feature
hashing of character 4-grams (rolling FNV-style hash over the lowercased
UTF-8 bytes), L2-normalized. dim defaults to 64 to match the
``embeddings`` testdata fixture.

Fully vectorized: the whole Arrow batch is embedded as a handful of numpy
passes over the raw concatenated string buffer — zero per-row (and zero
per-token) Python. The hash is position-exact and salt-free, so the
embedding is identical across workers, batch boundaries, and re-runs.

Entry points with IDENTICAL math:

- :func:`embed_buffer` — core: (utf8 bytes, offsets) -> (n, dim) float64.
- :func:`embed_texts`  — python-strings convenience (oracle path / tests).
- :func:`embed_udf`    — scalar-iterator pandas_udf returning array<double>.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd

__all__ = ["embed_buffer", "embed_texts", "embed_udf", "EMBED_DIM", "NGRAM"]

EMBED_DIM = 64
NGRAM = 4
_FNV = np.uint32(16777619)


def rolling_hashes(data: np.ndarray, ngram: int = NGRAM) -> np.ndarray:
    """FNV-style rolling hash of every `ngram`-byte window (uint32).

    Shared with the document-fingerprinting operator: same hash, different
    aggregation.
    """
    nwin = len(data) - ngram + 1
    if nwin <= 0:
        return np.empty(0, dtype=np.uint32)
    b = data.astype(np.uint32)
    h = np.full(nwin, 2166136261, dtype=np.uint32)
    for j in range(ngram):
        h = (h * _FNV) ^ b[j : j + nwin]
    return h


def _lowercase_ascii(data: np.ndarray) -> np.ndarray:
    out = data.copy()
    mask = (out >= 65) & (out <= 90)
    out[mask] += 32
    return out


def _embed_accumulate(
    data: np.ndarray, offsets: np.ndarray, dim: int, ngram: int
) -> np.ndarray:
    """Unnormalized signed feature-hash accumulation for one row chunk."""
    n = len(offsets) - 1
    # normalize sliced-array views: offsets may not start at 0 and the data
    # buffer may be shared beyond offsets[-1]
    data = np.asarray(data, dtype=np.uint8)[offsets[0] : offsets[-1]]
    offsets = offsets - offsets[0]
    if len(data) < ngram:
        return np.zeros((n, dim), dtype=np.float64)
    b = _lowercase_ascii(data)
    h = rolling_hashes(b, ngram)
    nwin = len(h)
    # per-byte string id is a step function of position -> windows that
    # cross a string boundary are exactly those whose first and last byte
    # disagree; no searchsorted, no gathers
    byte_tid = np.repeat(np.arange(n, dtype=np.int32), np.diff(offsets))
    tid = byte_tid[:nwin]
    valid = tid == byte_tid[ngram - 1 : ngram - 1 + nwin]
    idx = (h % np.uint32(dim)).astype(np.int32)
    sign = 1.0 - 2.0 * ((h >> np.uint32(31)) & np.uint32(1)).astype(np.float64)
    acc = np.bincount(tid * np.int32(dim) + idx, weights=sign * valid, minlength=n * dim)
    return acc.reshape(n, dim)


def embed_buffer(
    data: np.ndarray, offsets: np.ndarray, dim: int = EMBED_DIM,
    ngram: int = NGRAM, block: int | None = None,
) -> np.ndarray:
    """Embed n strings stored as one concatenated utf-8 buffer.

    Args:
        data: uint8 array, the concatenated string bytes.
        offsets: int array of length n+1; string i is data[offsets[i]:offsets[i+1]].
        block: rows per accumulation chunk (default LYSSANDRA_EMBED_BLOCK
            or 256). Chunking keeps the per-window temporaries (hash, sign,
            product, tid — ~28 B per byte of text, i.e. ~25 MB for a 10k-row
            Arrow batch) L2-resident instead of streaming through the DRAM
            bus that 32 workers share — the same cache-blocking lever that
            moved Batch-OMP from DRAM-bound to compute-bound. Results are
            BIT-identical for any block: the bincount weights are exactly
            +-1.0, whose float64 partial sums are exact integers, so the
            accumulation order cannot change the output.

    Feature hashing: for every character `ngram` window fully inside one
    string, bucket = h % dim, sign = +1 if bit31(h) else -1; rows are
    L2-normalized (empty/too-short strings stay zero vectors).
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    if n == 0:
        return np.zeros((0, dim), dtype=np.float64)
    if block is None:
        block = int(os.environ.get("LYSSANDRA_EMBED_BLOCK", "256"))
    if block < 1:
        block = n
    if block >= n:
        out = _embed_accumulate(data, offsets, dim, ngram)
    else:
        out = np.empty((n, dim), dtype=np.float64)
        for i0 in range(0, n, block):
            i1 = min(i0 + block, n)
            out[i0:i1] = _embed_accumulate(data, offsets[i0 : i1 + 1], dim, ngram)
    nrm = np.linalg.norm(out, axis=1)
    nz = nrm > 1e-13
    out[nz] /= nrm[nz, None]
    return out


def embed_texts(texts, dim: int = EMBED_DIM, ngram: int = NGRAM) -> np.ndarray:
    """Embed an iterable of python strings -> (n, dim) float64 (oracle path)."""
    parts = []
    lens = []
    for t in texts:
        if t is None or (isinstance(t, float) and np.isnan(t)):
            e = b""
        else:
            e = str(t).encode("utf-8")
        parts.append(e)
        lens.append(len(e))
    offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    data = np.frombuffer(b"".join(parts), dtype=np.uint8)
    return embed_buffer(data, offsets, dim=dim, ngram=ngram)


def arrow_string_buffer(arr) -> tuple[np.ndarray, np.ndarray] | None:
    """Zero-copy (data, offsets) view of a pyarrow string array, or None.

    Nulls are treated as empty strings (their offset range is empty or
    ignored via the offsets themselves).
    """
    import pyarrow as pa

    if not pa.types.is_string(arr.type):
        return None
    if arr.null_count:
        return None  # caller falls back to the python-strings path
    bufs = arr.buffers()
    if bufs[1] is None or bufs[2] is None:
        return None
    off = np.frombuffer(bufs[1], dtype=np.int32)[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    return data, off.astype(np.int64)


def embed_column(df, text_col: str = "text", out_col: str = "embedding",
                 dim: int = EMBED_DIM, drop_text: bool = False):
    """Heavy-path standalone embedder: one mapInArrow crossing, zero-copy
    string-buffer input, columnar list output (no pandas object series)."""
    import pyarrow as pa
    from pyspark.sql import types as T

    in_schema = df.schema
    text_pos = in_schema.fieldNames().index(text_col)
    out_fields = [
        f for i, f in enumerate(in_schema.fields)
        if not (drop_text and i == text_pos)
    ] + [T.StructField(out_col, T.ArrayType(T.DoubleType()), False)]
    out_schema = T.StructType(out_fields)

    def gen(it):
        for batch in it:
            if batch.num_rows == 0:
                continue
            tarr = batch.column(text_pos)
            buf = arrow_string_buffer(tarr)
            if buf is not None:
                X = embed_buffer(buf[0], buf[1], dim=dim)
            else:
                X = embed_texts(tarr.to_pylist(), dim=dim)
            off = pa.array(
                np.arange(0, (batch.num_rows + 1) * dim, dim, dtype=np.int32)
            )
            keep = [
                c for i, c in enumerate(batch.columns)
                if not (drop_text and i == text_pos)
            ]
            yield pa.RecordBatch.from_arrays(
                keep + [pa.ListArray.from_arrays(off, pa.array(X.ravel(), pa.float64()))],
                names=[f.name for f in out_schema.fields],
            )

    return df.mapInArrow(gen, out_schema)


def embed_udf(dim: int = EMBED_DIM):
    """Return a scalar-iterator pandas_udf: string -> array<double>(dim)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _embed(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            vecs = embed_texts(s.tolist(), dim=dim)
            yield pd.Series(list(vecs))

    return _embed
