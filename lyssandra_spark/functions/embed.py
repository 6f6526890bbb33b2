"""Deterministic text embedder (SURVEY.md §2.A A10).

The reference's front-end turns images into descriptors
(``lyssa/feature_extract/`` — SIFT/patches); ours turns transcript turn
text into fixed-dim float vectors. No external models: feature hashing of
word unigrams + bigrams with a stable hash (crc32), signed, L2-normalized.
dim defaults to 64 to match the ``embeddings`` testdata fixture.

Two entry points with IDENTICAL math:

- :func:`embed_texts` — numpy batch (the oracle; also the UDF body).
- :func:`embed_udf` — scalar pandas_udf returning ``array<float>``
  (vectorized Arrow path; no per-row Python crossing the JVM boundary).
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd

__all__ = ["embed_texts", "embed_udf", "EMBED_DIM"]

EMBED_DIM = 64
_TOKEN_RE = re.compile(r"[a-z0-9]+")


def _token_hashes(text: str) -> list[int]:
    """Stable 32-bit hashes of unigram + bigram tokens of a lowercased text."""
    toks = _TOKEN_RE.findall(text.lower()) if text else []
    hs = [zlib.crc32(t.encode("utf-8")) for t in toks]
    hs += [
        zlib.crc32((toks[i] + " " + toks[i + 1]).encode("utf-8"))
        for i in range(len(toks) - 1)
    ]
    return hs


def embed_texts(texts, dim: int = EMBED_DIM) -> np.ndarray:
    """Embed an iterable of strings -> (n, dim) float64, rows L2-normalized.

    Feature hashing: index = h % dim, sign = +1 if bit 31 of h else -1.
    Empty/None text -> zero vector. Deterministic (crc32, no salt).
    """
    texts = list(texts)
    out = np.zeros((len(texts), dim), dtype=np.float64)
    for i, t in enumerate(texts):
        if t is None or (isinstance(t, float) and np.isnan(t)):
            continue
        hs = _token_hashes(str(t))
        if not hs:
            continue
        h = np.asarray(hs, dtype=np.int64)
        idx = (h % dim).astype(np.int64)
        sign = np.where((h >> 31) & 1, 1.0, -1.0)
        np.add.at(out[i], idx, sign)
        nrm = np.linalg.norm(out[i])
        if nrm > 1e-13:
            out[i] /= nrm
    return out


def embed_udf(dim: int = EMBED_DIM):
    """Return a scalar-iterator pandas_udf: string -> array<double>(dim).

    Iterator form so per-worker setup (none needed here, but the dictionary
    cache in encode.py uses the same pattern) is paid once per task.
    """
    from typing import Iterator

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _embed(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            vecs = embed_texts(s.tolist(), dim=dim)
            yield pd.Series(list(vecs))

    return _embed
