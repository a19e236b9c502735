"""Text chunking as a Python UDTF (SURVEY.md §2.11 UDTF surface;
§2.12 training-data ops).

Context chunking — fixed-size windows with overlap — is the
row-expanding step of every RAG / training-data pipeline, and the
natural demonstration of Spark 4's table-function surface: one input
row yields many output rows, used via ``LATERAL`` in SQL.

The UDTF class is created inside a factory so cloudpickle ships it BY
VALUE (same discipline as every executor-side closure in this repo —
module-level classes pickle by reference and would require
`core2_spark` on executor sys.path).

Chunking itself is also expressible as pure column algebra
(sequence + transform), which is what the DuckDB oracle does — the
UDTF form exists to exercise the surface, and because real chunkers
(sentence-aware, token-budgeted) outgrow column algebra immediately.
"""

from __future__ import annotations


def make_chunk_udtf(chunk_size: int = 200, step: int = 150):
    """Build a UDTF yielding (chunk_idx, chunk, n_chars) rows: windows
    of ``chunk_size`` chars starting every ``step`` chars (overlap =
    chunk_size - step)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk string, n_chars int")
    class ChunkText:
        def eval(self, text: str):
            if text is None:
                return
            i = idx = 0
            while i < len(text):
                piece = text[i : i + chunk_size]
                yield idx, piece, len(piece)
                idx += 1
                i += step

    return ChunkText
