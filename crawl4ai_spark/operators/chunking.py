"""Chunking strategies — document → chunk rows, all native.

Semantic contract: ``crawl4ai/chunking_strategy.py`` — RegexChunking
(:38-61, split by patterns, default blank-line), FixedLengthWordChunking
(:146-170, word groups of n), SlidingWindowChunking (:174-221, window +
step), OverlappingWindowChunking (:224-255, window with overlap).

Each operator returns (id, chunk_index, chunk) rows via split/posexplode
— chunking 100 TB of text is a pure map stage, no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def regex_chunking(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", pattern: str = r"\n\n"
) -> DataFrame:
    """Split on a regex (default paragraph breaks); drops chunks that are
    empty or whitespace-only (note: ``trim`` strips spaces only)."""
    chunks = F.filter(F.split(F.col(text_col), pattern), lambda c: c.rlike(r"\S"))
    return docs.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_index", "chunk")
    )


def fixed_length_word_chunking(
    docs: DataFrame, chunk_size: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Consecutive word groups of ``chunk_size``."""
    base = docs.select(F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("toks"))
    n_chunks = F.ceil(F.size("toks") / F.lit(chunk_size)).cast("int")
    base = base.withColumn("idx", F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))))
    chunks = F.transform(
        F.col("idx"), lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i * chunk_size + 1, chunk_size))
    )
    return base.select(F.col(id_col), F.posexplode(chunks).alias("chunk_index", "chunk")).where(
        F.trim("chunk") != ""
    )


def sliding_window_chunking(
    docs: DataFrame,
    window_size: int,
    step: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Word windows of ``window_size`` advancing by ``step`` (overlap =
    window_size − step). Mirrors SlidingWindowChunking; short docs yield
    one whole-text chunk."""
    base = docs.select(F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("toks"))
    n = F.size("toks")
    last_start = F.greatest(n - window_size, F.lit(0))
    n_windows = F.floor(last_start / F.lit(step)).cast("int") + 1
    starts = F.transform(F.sequence(F.lit(0), n_windows - 1), lambda i: i * step)
    windows = F.transform(
        F.col("starts"), lambda s: F.concat_ws(" ", F.slice(F.col("toks"), s + 1, window_size))
    )
    return (
        base.withColumn("starts", starts)
        .select(F.col(id_col), F.posexplode(windows).alias("chunk_index", "chunk"))
        .where(F.trim("chunk") != "")
    )


def overlapping_window_chunking(
    docs: DataFrame,
    window_size: int,
    overlap: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    return sliding_window_chunking(
        docs, window_size, max(window_size - overlap, 1), id_col, text_col
    )
