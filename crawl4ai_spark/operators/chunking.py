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


def sentence_chunking(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Sentence rows (NlpSentenceChunking contract,
    ``chunking_strategy.py:65-88``). nltk punkt is unavailable in this
    environment, so the split is a regex — break after sentence-ending
    punctuation followed by whitespace — with the same strip/drop-empty
    surface; a documented deviation from punkt's abbreviation handling."""
    sents = F.filter(
        F.transform(
            F.split(F.col(text_col), r"(?<=[.!?])\s+"), lambda c: F.trim(c)
        ),
        lambda c: c != "",
    )
    return docs.select(F.col(id_col), F.posexplode(sents).alias("chunk_index", "chunk"))


def _floor_units(budget: float, rate: float) -> int:
    """Largest m with m*rate <= budget (float-exact for rate=0.75)."""
    m = max(int(budget / rate), 0)
    while (m + 1) * rate <= budget:
        m += 1
    while m > 0 and m * rate > budget:
        m -= 1
    return m


def token_budget_chunking(
    docs: DataFrame,
    chunk_token_threshold: int,
    overlap: int = 0,
    word_token_rate: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-budget chunking (reference ``utils.chunk_documents``
    ``utils.py:76-158``) applied per document.

    With a uniform per-word contribution ``r`` the reference's deque
    algebra has a closed form: each loop iteration pops
    ``C = floor(T/r)`` words, re-queues the last ``o = floor(V/r)`` as
    overlap but EMITS only the first ``C−o`` (the reference excludes the
    re-queued words from the yielded chunk, so emitted chunks are
    adjacent ``s = C−o``-word segments — kept verbatim for parity), and
    the loop runs while ``remaining·r >= T``; the remainder is the final
    chunk. Pure native array slicing — map-only, no shuffle, no Python.
    """
    cap = _floor_units(chunk_token_threshold, word_token_rate)
    if cap < 1:
        raise ValueError("chunk_token_threshold must cover at least one word")
    ov = min(_floor_units(overlap, word_token_rate), cap - 1) if overlap > 0 else 0
    seg = cap - ov
    rmin = cap if cap * word_token_rate >= chunk_token_threshold else cap + 1

    base = docs.select(F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("toks"))
    n = F.size("toks")
    k = (
        F.when(n >= rmin, F.floor((n - rmin) / seg).cast("int") + 1)
        .otherwise(F.lit(0))
    )
    base = base.withColumn("k", k)
    idx = F.sequence(F.lit(0), F.col("k"))
    chunks = F.transform(
        idx,
        lambda i: F.when(
            i < F.col("k"),
            F.concat_ws(" ", F.slice("toks", i * seg + 1, seg)),
        ).otherwise(
            F.concat_ws(
                " ",
                F.slice(
                    "toks",
                    F.col("k") * seg + 1,
                    F.greatest(n - F.col("k") * seg, F.lit(0)),
                ),
            )
        ),
    )
    return (
        base.select(F.col(id_col), F.posexplode(chunks).alias("chunk_index", "chunk"))
        .where(F.trim("chunk") != "")
    )


def merge_token_chunks(
    texts: list[str],
    target_size: int,
    overlap: int = 0,
    word_token_ratio: float = 1.0,
) -> list[str]:
    """Merge many small texts into ~``target_size``-token chunks
    (reference ``utils.merge_chunks`` ``utils.py:160-224`` semantics:
    pre-allocated chunk count from the scaled total, per-token fill with
    unscaled size counting, optional tail-overlap copy on advance)."""
    token_lists = []
    total = 0
    for t in texts:
        toks = (t or "").split()
        count = int(len(toks) * word_token_ratio)
        if count:
            token_lists.append(toks)
            total += count
    if not total:
        return []
    n_chunks = max(1, -(-total // target_size))
    chunks: list[list[str]] = [[] for _ in range(n_chunks)]
    cur, size = 0, 0
    for tok in (t for toks in token_lists for t in toks):
        if size >= target_size and cur < n_chunks - 1:
            if overlap > 0:
                carried = chunks[cur][-overlap:]
                cur += 1
                chunks[cur].extend(carried)
                size = len(carried)
            else:
                cur += 1
                size = 0
        chunks[cur].append(tok)
        size += 1
    return [" ".join(c) for c in chunks if c]


def merge_chunks_grouped(
    chunks_df: DataFrame,
    target_size: int,
    overlap: int = 0,
    word_token_ratio: float = 1.0,
    group_col: str = "doc_id",
    order_col: str = "chunk_index",
    chunk_col: str = "chunk",
) -> DataFrame:
    """Distributed merge: within each group (document), merge its ordered
    chunks back into ~target_size-token chunks via ``applyInPandas`` —
    one group per pandas call, groups spread across executors."""
    import pandas as pd

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        merged = merge_token_chunks(
            list(pdf[chunk_col]), target_size, overlap, word_token_ratio
        )
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]] * len(merged),
                "chunk_index": range(len(merged)),
                "chunk": merged,
            }
        )

    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    # carry the group column's actual type through (URL-keyed corpora
    # group by string; hard-coding long would fail or silently cast)
    out_schema = StructType(
        [
            StructField(group_col, chunks_df.schema[group_col].dataType),
            StructField("chunk_index", IntegerType()),
            StructField("chunk", StringType()),
        ]
    )
    return chunks_df.groupBy(group_col).applyInPandas(merge, out_schema)


def _texttile_segments(
    words: list[str],
    pseudo_size: int = 20,
    block_size: int = 5,
) -> list[tuple[int, int]]:
    """TextTiling boundaries (Hearst 1997, the algorithm underneath the
    reference's TopicSegmentationChunking / nltk TextTilingTokenizer —
    ``chunking_strategy.py:92-142``; nltk is unavailable, so this is a
    compact clean-room implementation of the published method):

    1. group words into pseudo-sentences of ``pseudo_size``;
    2. cosine similarity of the ``block_size`` pseudo-sentences on each
       side of every gap (term-frequency vectors);
    3. depth score per gap = rise to the nearest peak on each side;
    4. cut where depth > mean + std/2 of depth scores, at local maxima.

    Returns [(start_word, end_word)] spans covering the document.
    """
    from collections import Counter
    from math import sqrt

    pseudo = [words[i : i + pseudo_size] for i in range(0, len(words), pseudo_size)]
    if len(pseudo) < 2 * block_size + 1:
        return [(0, len(words))] if words else []
    counts = [Counter(p) for p in pseudo]

    def block(counters):
        total: Counter = Counter()
        for c in counters:
            total.update(c)
        return total

    def cosine(a: Counter, b: Counter) -> float:
        common = set(a) & set(b)
        num = sum(a[t] * b[t] for t in common)
        den = sqrt(sum(v * v for v in a.values())) * sqrt(sum(v * v for v in b.values()))
        return num / den if den else 0.0

    sims = [
        cosine(
            block(counts[max(0, g - block_size) : g]),
            block(counts[g : g + block_size]),
        )
        for g in range(1, len(pseudo))
    ]
    depths = []
    for i, s in enumerate(sims):
        left = s
        for j in range(i, -1, -1):
            if sims[j] < left:
                break
            left = sims[j]
        right = s
        for j in range(i, len(sims)):
            if sims[j] < right:
                break
            right = sims[j]
        depths.append((left - s) + (right - s))
    mean = sum(depths) / len(depths)
    std = (sum((d - mean) ** 2 for d in depths) / len(depths)) ** 0.5
    cutoff = mean + std / 2.0
    cuts = [
        i + 1  # gap i sits after pseudo-sentence i+1
        for i, d in enumerate(depths)
        if d > cutoff
        and (i == 0 or depths[i - 1] <= d)
        and (i == len(depths) - 1 or depths[i + 1] <= d)
    ]
    spans, start = [], 0
    for cut in cuts:
        spans.append((start * pseudo_size, cut * pseudo_size))
        start = cut
    spans.append((start * pseudo_size, len(words)))
    return [s for s in spans if s[1] > s[0]]


def topic_segmentation_chunking(
    docs: DataFrame,
    pseudo_size: int = 20,
    block_size: int = 5,
    n_keywords: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, chunk_index, chunk, keywords) topic segments per document —
    the TopicSegmentationChunking surface (segments + per-segment
    keywords by term frequency, stopwords excluded). Per-document work in
    one Arrow batch pass; embarrassingly parallel."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from crawl4ai_spark.operators.textstats import LANG_STOPWORDS

    stop = {w for panel in LANG_STOPWORDS.values() for w in panel}

    def segments_of(text: str):
        words = (text or "").split()
        out = []
        for start, end in _texttile_segments(words, pseudo_size, block_size):
            seg = words[start:end]
            from collections import Counter

            freq = Counter(w.lower().strip(".,!?;:\"()[]{}") for w in seg)
            for s in list(freq):
                if s in stop or len(s) <= 2:
                    del freq[s]
            keywords = [w for w, _ in sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:n_keywords]]
            out.append((" ".join(seg), keywords))
        return out

    def _udf(text):
        return pd.Series([segments_of(t) for t in text])

    _udf.__annotations__ = {"text": pd.Series, "return": pd.Series}
    udf = pandas_udf("array<struct<chunk: string, keywords: array<string>>>")(_udf)

    return (
        docs.select(F.col(id_col), F.posexplode(udf(F.col(text_col))).alias("chunk_index", "seg"))
        .select(F.col(id_col), "chunk_index", F.col("seg.chunk").alias("chunk"), F.col("seg.keywords").alias("keywords"))
    )
