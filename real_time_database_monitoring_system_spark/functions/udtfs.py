"""Python UDTF surface (Spark 4, Arrow-optimized): the table-valued
function API for users who extend the engine in SQL.

Repo stance unchanged: hot-path chunking is the EXPRESSION plan
(`pipeline.chunk_documents` — whole-stage codegen, zero Python), and
the equivalence test pins the UDTF to it. The UDTF exists because a
complete engine exposes the extension surface the reference's users
would reach for (custom table functions over cursor loops,
`myapp/views.py` per-row Python post-processing): `useArrow=True`
batches rows over Arrow instead of pickling one at a time.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(
    returnType="chunk_id int, start bigint, chunk_tokens bigint, chunk_text string",
    useArrow=True,
)
class ChunkText:
    """LATERAL-joinable token-window chunker: same stride/window
    semantics as `pipeline.chunk_documents` (starts every `stride`
    tokens while start < n_tokens; tail chunk may be short; empty
    docs emit nothing)."""

    def eval(self, text: str, window: int, stride: int):
        if window is None or stride is None or window <= 0 or stride <= 0:
            raise ValueError("window and stride must be positive")
        toks = [t for t in (text or "").split() if t]
        start = 0
        chunk_id = 0
        while start < len(toks):
            chunk = toks[start : start + window]
            yield chunk_id, start, len(chunk), " ".join(chunk)
            chunk_id += 1
            start += stride


def register_udtfs(spark: SparkSession) -> list[str]:
    """Register the UDTF surface for SQL use; returns the names."""
    spark.udtf.register("chunk_text", ChunkText)
    return ["chunk_text"]
