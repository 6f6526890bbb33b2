"""Text cleaning for training-data curation: PII redaction + Unicode
normalization.

- :func:`redact_pii` — regex redaction of the classic identifier shapes
  (emails, phone-like digit groups, IPv4s, 13-19-digit card-like runs).
  Pure JVM ``regexp_replace`` chain: map-only, zero shuffles, pipelined
  into the scan. Pattern-based redaction is a RECALL tool, not a privacy
  guarantee — it catches the formats it names and nothing else; the
  honest contract is "these patterns are gone", stated per placeholder.
- :func:`normalize_text` — Unicode NFC/NFKC/NFD/NFKD normalization in
  one ``mapInArrow`` pass (Spark SQL has no Unicode-normalization
  builtin). The Arrow C++ kernel (``utf8_normalize``) is used when a
  driver-side probe confirms it agrees with Python's ``unicodedata`` —
  this sandbox's pyarrow 16.1 build decomposes but never RE-composes, so
  its "NFC"/"NFKC" are actually NFD/NFKD; on such builds the batch is
  normalized with ``unicodedata`` instead (string-at-a-time inside the
  Arrow batch — slower, but correct beats vectorized-and-wrong).
  Composes with an optional JVM-side control-char strip + whitespace
  collapse.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["redact_pii", "normalize_text", "PII_PATTERNS"]

# (name, regex, replacement) — Java regex syntax (JVM-side regexp_replace).
# Order matters: emails before phone-ish so the user@host digits don't get
# half-eaten; card-like before phone-ish so long digit runs aren't split.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("card", r"\b\d(?:[ -]?\d){12,18}\b", "<CARD>"),
    ("phone",
     r"(?<![\w.])\+?\d{1,3}[ .-]?\(?\d{2,4}\)?[ .-]?\d{3,4}[ .-]?\d{3,4}\b",
     "<PHONE>"),
]


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str | None = None,
    patterns: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """Replace every match of each named pattern with its placeholder.

    Map-only expression chain; ``out_col`` defaults to replacing
    ``text_col`` in place. Also appends ``pii_redactions`` — the total
    number of placeholders INSERTED (placeholder occurrences after minus
    before, so text that already mentions a literal tag like "<EMAIL>"
    doesn't inflate the count) — so a curation pipeline can filter or
    audit PII-dense documents without a second scan. An explicit empty
    ``patterns`` list is a no-op (0 redactions), not a fallback to the
    defaults.
    """
    out_col = out_col or text_col
    if patterns is None:
        patterns = PII_PATTERNS
    orig = F.col(text_col)
    col = orig
    for _, pat, repl in patterns:
        col = F.regexp_replace(col, pat, repl)
    n_redacted = F.lit(0)
    for p in {repl for _, _, repl in patterns}:
        def occurrences(c):
            return (F.length(c) - F.length(F.replace(c, F.lit(p), F.lit("")))) / len(p)
        n_redacted = n_redacted + occurrences(col) - occurrences(orig)
    # count FIRST: both expressions reference the original text column,
    # so the redacted text must not shadow it before the count resolves
    return df.withColumn(
        "pii_redactions", n_redacted.cast("long")
    ).withColumn(out_col, col)


def normalize_text(
    df: DataFrame, text_col: str = "text", form: str = "NFKC",
    collapse_whitespace: bool = True,
) -> DataFrame:
    """Unicode-normalize ``text_col`` in place (NFC/NFKC/NFD/NFKD) with
    Arrow's vectorized kernel; optionally strip control characters and
    collapse whitespace runs JVM-side afterwards."""
    import unicodedata

    import pyarrow as pa
    import pyarrow.compute as pc

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"form ({form!r}) must be NFC/NFKC/NFD/NFKD")
    idx = df.columns.index(text_col)  # raises for unknown column

    # probe the native kernel against the stdlib ground truth (composed
    # forms are broken in some utf8proc builds — they never re-compose)
    probe = "café ﬁn"  # decomposed é + fi ligature
    arrow_ok = (
        pc.utf8_normalize(pa.array([probe]), form=form).to_pylist()[0]
        == unicodedata.normalize(form, probe)
    )

    def norm(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            col = batch.column(idx)
            if arrow_ok:
                arr = pc.utf8_normalize(col, form=form)
            else:
                arr = pa.array(
                    [None if s is None else unicodedata.normalize(form, s)
                     for s in col.to_pylist()],
                    type=col.type,
                )
            yield batch.set_column(idx, batch.schema.field(idx), arr)

    out = df.mapInArrow(norm, df.schema)
    if collapse_whitespace:
        cleaned = F.trim(
            F.regexp_replace(
                F.regexp_replace(F.col(text_col), r"[\p{Cntrl}&&[^\n\t]]", ""),
                r"\s+", " ",
            )
        )
        out = out.withColumn(text_col, cleaned)
    return out
