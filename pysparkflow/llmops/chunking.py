"""Document chunking: fixed-size overlapping character windows.

The retrieval/embedding-prep step of an LLM data pipeline: each document
becomes ceil(len/stride) chunks of ``size`` chars starting every
``stride`` chars (overlap = size - stride). Chunk boundaries derive only
from the text length, so the op is deterministic and map-only:
``sequence()`` builds each document's offset list ON ITS EXECUTOR and
``explode`` fans it out — no driver loop, no shuffle, output partitions
inherit the scan's.

Token-window chunking is the same plan with the offset arithmetic moved
to token counts (llmops/textstats.py tokenizers); character windows keep
the oracle exactly replayable (substr semantics are engine-portable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    size: int = 200,
    stride: int = 150,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode each document into overlapping chunks. Returns
    (id_col, chunk_idx, chunk_len, chunk_md5) — the fingerprint, not the
    text, so downstream exact-dedup over chunks needs no text shuffle."""
    if stride <= 0 or size <= 0:
        raise ValueError(f"size and stride must be positive, got {size}, {stride}")
    n = F.length(F.col(text_col))
    idx = F.explode(
        F.sequence(F.lit(0), F.floor((n - 1) / stride).cast("long"))
    ).alias("chunk_idx")
    chunk = F.substring(
        F.col(text_col), F.col("chunk_idx") * stride + 1, size
    )
    return (
        docs.filter(n > 0)
        .select(F.col(id_col), F.col(text_col), idx)
        .select(
            id_col,
            "chunk_idx",
            F.length(chunk).alias("chunk_len"),
            F.md5(chunk).alias("chunk_md5"),
        )
    )
