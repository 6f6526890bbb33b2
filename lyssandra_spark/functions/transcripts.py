"""Raw-transcript ingestion UDTF (SURVEY.md §2.B B20: the UDTF corner of
the UDF/UDAF/UDTF surface).

Real transcript dumps often arrive as one raw text blob per conversation
("user: hi assistant: hello ..."), not as turn rows. Turning one input
row into N output rows with schema is exactly what a table function is
for: :class:`ParseTranscript` is a Spark 4 Python UDTF applied via a SQL
``LATERAL`` join, so parsing runs distributed, streams row-by-row
(constant memory per conversation), and composes with any downstream
DataFrame op.

Cost note: UDTF ``eval`` is a per-row Python crossing — the engine's
slow path, acceptable here because raw-blob parsing is a one-time ingest
step over irregular input that array expressions can't express cleanly.
Enable ``spark.sql.execution.pythonUDTF.arrow.enabled`` to batch the
crossing with Arrow. Everything downstream of ingestion stays on the
vectorized paths.
"""

from __future__ import annotations

import re
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

__all__ = ["ParseTranscript", "parse_transcripts", "ROLE_MARKER"]

# role markers at a word boundary: "user:", "assistant:", "system:", "tool:"
ROLE_MARKER = re.compile(r"\b(user|assistant|system|tool)\s*:", re.IGNORECASE)


@udtf(returnType="turn_idx int, role string, text string")
class ParseTranscript:
    """Yield (turn_idx, role, text) turn rows from one raw transcript blob.

    Text between consecutive role markers belongs to the earlier marker's
    turn; whitespace is trimmed; empty turns (marker immediately followed
    by another marker) are kept with text '' so turn indices stay aligned
    with the marker sequence. Ingestion never silently drops text: a
    non-empty blob with NO markers yields one (0, 'unknown', blob) row,
    and non-blank text BEFORE the first marker becomes a leading
    (0, 'unknown', preamble) turn. A null or blank blob yields nothing.
    """

    def eval(self, raw: str):
        if raw is None or not raw.strip():
            return
        marks = list(ROLE_MARKER.finditer(raw))
        if not marks:
            yield 0, "unknown", raw.strip()
            return
        idx = 0
        preamble = raw[: marks[0].start()].strip()
        if preamble:
            yield idx, "unknown", preamble
            idx += 1
        for i, m in enumerate(marks):
            end = marks[i + 1].start() if i + 1 < len(marks) else len(raw)
            yield idx, m.group(1).lower(), raw[m.end():end].strip()
            idx += 1


def parse_transcripts(
    spark: SparkSession, df: DataFrame, raw_col: str = "raw",
    id_col: str = "conv_id",
) -> DataFrame:
    """LATERAL-join :class:`ParseTranscript` over ``df``: one row per
    parsed turn, keyed by ``id_col`` — (id, turn_idx, role, text).

    The temp-view name is unique per call (two pipelines sharing a
    SparkSession must not clobber each other's registration between the
    view create and the query analysis) and identifiers are
    backtick-quoted so non-simple column names survive the SQL round
    trip. The query plan holds the view by resolved reference, so
    dropping it immediately after analysis is safe.
    """
    view = f"__raw_transcripts_{uuid.uuid4().hex}"
    spark.udtf.register("parse_transcript", ParseTranscript)
    df.createOrReplaceTempView(view)
    try:
        return spark.sql(
            f"SELECT t.`{id_col}`, p.turn_idx, p.role, p.text "
            f"FROM {view} t, LATERAL parse_transcript(t.`{raw_col}`) p"
        )
    finally:
        spark.catalog.dropTempView(view)
