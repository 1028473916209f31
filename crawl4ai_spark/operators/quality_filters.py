"""Publication-grounded training-data quality filters.

Two public filter batteries every large-scale LLM data pipeline runs and
the reference (a crawler) stops short of — implemented Spark-first so a
curation pass can gate documents before the (more expensive) dedup
shuffles:

- **Gopher quality + repetition signals** (Rae et al. 2021, appendix A
  — the thresholds replicated by Dolma/DataTrove/RedPajama): word-count
  and word-shape gates, symbol/bullet/ellipsis ratios, stop-word
  presence, duplicate-line fractions, and the top/duplicated n-gram
  character fractions.
- **C4 line-level cleaning** (Raffel et al. 2020 §2.2): keep lines that
  end in terminal punctuation and have ≥ ``min_line_words`` words, drop
  lines mentioning javascript, drop whole documents containing
  "lorem ipsum" or "{", require ≥ ``min_sentences`` sentences.

Scale shape: the scalar signals are pure map-side column algebra (zero
shuffles). The repetition family needs per-(doc, key) frequencies; all
kinds (lines + every n-gram size) share ONE exploded frame and therefore
ONE hash shuffle keyed by (doc_id, kind, key), followed by a per-doc
rollup — the same repartition-before-explode discipline as
``dedup.kgram_rows``. No windows, no driver collects, no Python UDFs.

Character-fraction definitions (documented because every public
implementation approximates the paper differently): for a gram/line g
with per-doc frequency c(g) and character length len(g),
``top_ngram_char_fraction(n)`` = c(g*)·len(g*) / len(text) for the most
frequent n-gram g* (ties: longer gram; 0 when nothing repeats — a
singleton gram is not repetition), and
``dup_char_fraction`` = Σ_{c(g)≥2} c(g)·len(g) / len(text), capped at
1.0 (overlapping occurrences are intentionally double-counted — a
deterministic, engine-portable upper bound of the paper's character
coverage). Lines use their trimmed text; blank lines are ignored.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Gopher's "stop words present" gate (Rae et al. 2021 A1.1)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

# paper defaults (A1); keys match gopher_signals output columns
GOPHER_THRESHOLDS: dict[str, tuple[float, float]] = {
    # column: (min, max) — inclusive bounds, NaN-free by construction
    "word_count": (50, 100_000),
    "mean_word_length": (3.0, 10.0),
    "symbol_word_ratio": (0.0, 0.1),
    "bullet_line_fraction": (0.0, 0.9),
    "ellipsis_line_fraction": (0.0, 0.3),
    "alpha_word_fraction": (0.8, 1.0),
    "stopword_count": (2, float("inf")),
    "dup_line_fraction": (0.0, 0.3),
    "dup_line_char_fraction": (0.0, 0.2),
    "top_2gram_char_fraction": (0.0, 0.2),
    "top_3gram_char_fraction": (0.0, 0.18),
    "top_4gram_char_fraction": (0.0, 0.16),
    "dup_5gram_char_fraction": (0.0, 0.15),
    "dup_6gram_char_fraction": (0.0, 0.14),
    "dup_7gram_char_fraction": (0.0, 0.13),
    "dup_8gram_char_fraction": (0.0, 0.12),
    "dup_9gram_char_fraction": (0.0, 0.11),
    "dup_10gram_char_fraction": (0.0, 0.10),
}

_TOP_NS = (2, 3, 4)
_DUP_NS = (5, 6, 7, 8, 9, 10)
_BULLET_PREFIXES = ("-", "*", "•", "‣", "▪")


def _words(text_col: Column) -> Column:
    """Lowercased whitespace words, empty-safe (the n-gram alphabet)."""
    return F.filter(
        F.split(F.lower(F.trim(text_col)), r"\s+"), lambda w: F.length(w) > 0
    )


def _lines(text_col: Column) -> Column:
    """Trimmed non-blank lines. Splits on universal newlines
    (``\\r\\n|\\r|\\n``) — crawled web text is frequently CRLF and
    occasionally CR-only, and a stray ``\\r`` (F.trim strips spaces
    only) would defeat every line-suffix gate (terminal punctuation,
    ellipsis) and corrupt duplicate-line keys."""
    return F.filter(
        F.transform(F.split(text_col, r"\r\n|\r|\n"), lambda l: F.trim(l)),
        lambda l: F.length(l) > 0,
    )


def gopher_scalar_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The map-only Gopher signals (everything except the repetition
    family) — zero shuffles, pure column algebra over words and lines.
    NULL text is treated as empty (size(split(NULL)) is -1 and NULL
    poisons every downstream verdict otherwise)."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    words = _words(text)
    lines = _lines(text)
    n_words = F.size(words)
    n_lines = F.size(lines)
    safe_words = F.greatest(n_words, F.lit(1)).cast("double")
    safe_lines = F.greatest(n_lines, F.lit(1)).cast("double")
    word_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    ).cast("double")
    symbol_count = (
        F.regexp_count(text, F.lit(r"#"))
        + F.regexp_count(text, F.lit(r"\.\.\."))
        + F.regexp_count(text, F.lit("…"))
    )
    bullet_lines = F.size(
        F.filter(
            lines,
            lambda l: F.substring(l, 1, 1).isin(list(_BULLET_PREFIXES)),
        )
    )
    ellipsis_lines = F.size(
        F.filter(lines, lambda l: l.endswith("...") | l.endswith("…"))
    )
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[a-z]")))
    stop_arr = F.lit(list(GOPHER_STOPWORDS))
    stopword_count = F.size(F.array_intersect(words, stop_arr))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("word_count"),
        F.round(word_chars / safe_words, 6).alias("mean_word_length"),
        F.round(symbol_count / safe_words, 6).alias("symbol_word_ratio"),
        F.round(bullet_lines / safe_lines, 6).alias("bullet_line_fraction"),
        F.round(ellipsis_lines / safe_lines, 6).alias("ellipsis_line_fraction"),
        F.round(alpha_words / safe_words, 6).alias("alpha_word_fraction"),
        stopword_count.alias("stopword_count"),
    )


def _repetition_base(
    docs: DataFrame, id_col: str, text_col: str, shuffle_parts: int | None
) -> DataFrame:
    """(doc_id, _text, text_chars), repartitioned by doc_id on the RAW
    text — the exchange must sit BELOW the tokenizers so the regex work
    runs on ``shuffle_parts`` cores instead of the scan's few splits, and
    so every downstream per-doc aggregation inherits the partitioning
    (zero further exchanges — see ``gopher_repetition_signals``)."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        text.alias("_text"),
        F.length(text).cast("double").alias("text_chars"),
    )
    if shuffle_parts:
        base = base.repartition(shuffle_parts, "doc_id")
    return base


def _line_rows(base: DataFrame) -> DataFrame:
    """(doc_id, text_chars, kind='line', key, key_chars) per non-blank
    trimmed line; the key is the line's xxhash64 (the signals only ever
    need per-key counts and lengths, never the text back)."""
    return base.select(
        "doc_id",
        "text_chars",
        F.lit("line").alias("kind"),
        F.explode(_lines(F.col("_text"))).alias("line_str"),
    ).select(
        "doc_id",
        "text_chars",
        "kind",
        F.xxhash64("line_str").alias("key"),
        F.length("line_str").cast("long").alias("key_chars"),
    )


def _gram_rows(base: DataFrame) -> DataFrame:
    """(doc_id, text_chars, kind='g2'..'g10', key, key_chars) for every
    n-gram size, off ONE token explode.

    Shape (the kgram_rows lessons, all measured on this battery):
    tokens explode ONCE and every gram size derives from the same window
    ``lead`` columns (building 9 per-doc struct arrays and flattening
    them cost ~2× in expression allocations). Each TOKEN is hashed and
    measured exactly once at the explode; the window leads carry only
    that (hash, length) pair — 12 bytes instead of the token string —
    and a size-n gram's key is the chained ``xxhash64`` of its n token
    hashes while its char length is the lead-length sum + (n−1) spaces.
    This removes the per-gram string build (concat_ws allocated up to
    ~100 B × 9 grams × every token position; the round-4 profile's
    dominant map-side cost) and downstream frequency rows carry 16 bytes
    per gram.

    The leads and gram structs are built as SQL text (selectExpr /
    expr), not Column trees: the ~250 expression nodes cost one py4j
    round-trip each when composed in Python (~0.45 s of DRIVER time per
    query build, round-5 profile) but parse JVM-side in one call as
    strings. Catalyst still collapses the identical OVER specs into a
    single Window operator."""
    max_n = max((*_TOP_NS, *_DUP_NS))
    toks = base.select(
        "doc_id", "text_chars", F.posexplode(_words(F.col("_text"))).alias("pos", "t")
    ).selectExpr(
        "doc_id", "text_chars", "pos", "xxhash64(t) AS h0", "length(t) AS l0"
    )
    over = "OVER (PARTITION BY doc_id ORDER BY pos)"
    led = toks.selectExpr(
        "doc_id",
        "text_chars",
        "h0",
        "l0",
        *[
            e
            for i in range(1, max_n)
            for e in (
                f"lead(h0, {i}) {over} AS h{i}",
                f"lead(l0, {i}) {over} AS l{i}",
            )
        ],
    )
    structs = []
    for n in (*_TOP_NS, *_DUP_NS):
        # a valid size-n gram has a non-null last lead (leads are
        # contiguous, so the earlier ones are then non-null too)
        key = "xxhash64(" + ", ".join(f"h{i}" for i in range(n)) + ")"
        chars = " + ".join(f"l{i}" for i in range(n)) + f" + {n - 1}"
        structs.append(
            f"named_struct('kind', 'g{n}', "
            f"'key', if(h{n - 1} IS NOT NULL, {key}, CAST(NULL AS BIGINT)), "
            f"'key_chars', CAST({chars} AS BIGINT))"
        )
    return (
        led.select(
            "doc_id",
            "text_chars",
            F.expr("explode(array(" + ", ".join(structs) + "))").alias("kk"),
        )
        .where("kk.key IS NOT NULL")
        .selectExpr(
            "doc_id",
            "text_chars",
            "kk.kind AS kind",
            "kk.key AS key",
            "kk.key_chars AS key_chars",
        )
    )


def _per_kind_signals(rows: DataFrame) -> DataFrame:
    """(doc_id, kind, line_dup_frac, dup_frac, top_frac) from keyed rows.

    Both aggregations are pure hash aggregates: the top-key argmax is a
    plain ``max`` over ``(c << 31) | key_chars`` packed longs instead of
    ``max_by(_, struct(c, key_chars))`` — the struct ordering buffer is
    not fixed-width, which silently demoted the whole rollup to a
    SortAggregate with an extra full Sort+Exchange sandwich (measured on
    this battery). The packed ordering is the same lexicographic
    (frequency, length); key_chars < 2^31 is guaranteed (a key's length
    is bounded by its document, and Spark strings cap at 2 GiB) and
    c < 2^32 likewise (occurrences are bounded by document length).

    SQL-text expressions for the same reason as ``_gram_rows``: one
    py4j call per aggregate instead of one per expression node."""
    freq = rows.groupBy("doc_id", "kind", "key").agg(
        F.expr("count(*) AS c"),
        F.expr("first(key_chars) AS key_chars"),
        F.expr("first(text_chars) AS text_chars"),
    )
    # cover of the most frequent key (ties: longer key; further ties all
    # share the same c·len cover, so the argmax choice is moot). A key
    # must actually REPEAT to count — cover 0 when max c == 1, else every
    # short doc's longest singleton gram reads as "repetition" and
    # spuriously trips the 0.2/0.18/0.16 gates
    per_kind = freq.groupBy("doc_id", "kind").agg(
        F.expr("first(text_chars) AS text_chars"),
        F.expr("sum(c) AS n_total"),
        F.expr("count(*) AS n_distinct"),
        F.expr(
            "max(if(c >= 2, shiftleft(c, 31) + key_chars, "
            "CAST(NULL AS BIGINT))) AS _top_packed"
        ),
        F.expr(
            "CAST(sum(if(c >= 2, c * key_chars, CAST(NULL AS BIGINT))) "
            "AS DOUBLE) AS dup_chars"
        ),
    )
    top_cover = (
        f"CAST(shiftrightunsigned(_top_packed, 31) "
        f"* (_top_packed & {(1 << 31) - 1}) AS DOUBLE)"
    )
    safe_text = "greatest(text_chars, 1.0D)"
    return per_kind.selectExpr(
        "doc_id",
        "kind",
        "round((n_total - n_distinct) / CAST(greatest(n_total, 1) AS DOUBLE), 6)"
        " AS line_dup_frac",
        f"round(least(coalesce(dup_chars, 0.0D) / {safe_text}, 1.0D), 6)"
        " AS dup_frac",
        f"round(least(coalesce({top_cover}, 0.0D) / {safe_text}, 1.0D), 6)"
        " AS top_frac",
    )


def gopher_repetition_signals(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shuffle_parts: int | None = None,
) -> DataFrame:
    """Duplicate-line and n-gram character-fraction signals (module
    docstring definitions). ONE slim-row exchange per branch total: the
    raw docs repartition by doc_id (``_repetition_base``) is the only
    shuffle the exploded data ever sees — hashpartitioning(doc_id)
    satisfies every downstream ClusteredDistribution, so the
    (doc, kind, key) frequency aggregation and the per-(doc, kind)
    rollup both run exchange-free on the 10–20× larger exploded rows
    (lines and grams are aggregated as SEPARATE branches precisely
    because a union would erase the partitioning and force a full
    exploded-row shuffle — measured 2× on this battery). The final pivot
    to one row per doc exchanges only docs × 10 kinds tiny rows."""
    base = _repetition_base(docs, id_col, text_col, shuffle_parts)
    kinded = _per_kind_signals(_line_rows(base)).unionByName(
        _per_kind_signals(_gram_rows(base))
    )
    def pick(kind: str, src: str, out: str) -> Column:
        return F.expr(
            f"coalesce(max(if(kind = '{kind}', {src}, CAST(NULL AS DOUBLE))),"
            f" 0.0D) AS {out}"
        )

    agg_cols = [
        pick("line", "line_dup_frac", "dup_line_fraction"),
        pick("line", "dup_frac", "dup_line_char_fraction"),
        *[pick(f"g{n}", "top_frac", f"top_{n}gram_char_fraction") for n in _TOP_NS],
        *[pick(f"g{n}", "dup_frac", f"dup_{n}gram_char_fraction") for n in _DUP_NS],
    ]
    return kinded.groupBy("doc_id").agg(*agg_cols)


def gopher_signals(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shuffle_parts: int | None = None,
) -> DataFrame:
    """All Gopher signals, one row per input doc (docs with no
    words/lines get zero repetition signals via the left join)."""
    scalars = gopher_scalar_signals(docs, id_col, text_col)
    reps = gopher_repetition_signals(docs, id_col, text_col, shuffle_parts)
    out = scalars.join(reps, "doc_id", "left")
    rep_cols = [c for c in reps.columns if c != "doc_id"]
    return out.select(
        *[c for c in scalars.columns],
        *[F.coalesce(F.col(c), F.lit(0.0)).alias(c) for c in rep_cols],
    )


def gopher_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    thresholds: dict[str, tuple[float, float]] | None = None,
    shuffle_parts: int | None = None,
) -> DataFrame:
    """Signals + ``gopher_pass`` verdict + ``fail_reasons`` (comma-joined
    signal names outside their (min, max) band — a string, not an array,
    so downstream oracles/sinks never face unsortable array columns)."""
    th = thresholds or GOPHER_THRESHOLDS
    sig = gopher_signals(docs, id_col, text_col, shuffle_parts)
    fails = []
    for c, (lo, hi) in sorted(th.items()):
        bad = f"`{c}` < {float(lo)!r}D"
        if hi != float("inf"):
            bad = f"({bad} OR `{c}` > {float(hi)!r}D)"
        fails.append(f"if({bad}, '{c}', CAST(NULL AS STRING))")
    reasons = (
        "array_join(filter(array("
        + ", ".join(fails)
        + "), x -> x IS NOT NULL), ',')"
    )
    return sig.select(
        "*",
        F.expr(reasons).alias("fail_reasons"),
    ).withColumn("gopher_pass", F.col("fail_reasons") == "")


# ── C4 (Raffel et al. 2020 §2.2) ─────────────────────────────────────────

_C4_TERMINALS = (".", "!", "?", '"', "”", "'")


def c4_line_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_words: int = 3,
    min_sentences: int = 5,
) -> DataFrame:
    """C4 line-level cleaning as pure column algebra (zero shuffles):
    keep lines ending in terminal punctuation with ≥ ``min_line_words``
    words and no 'javascript'; flag documents containing 'lorem ipsum'
    or '{' (dropped wholesale by C4) or fewer than ``min_sentences``
    sentences after cleaning. Returns every doc with the cleaned text and
    per-doc stats; filter on ``c4_keep`` for the kept corpus. NULL text
    is treated as empty."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = _lines(text)
    is_kept = (
        lambda l: F.substring(l, -1, 1).isin(list(_C4_TERMINALS))
        & (F.size(F.split(l, r"\s+")) >= min_line_words)
        & ~F.lower(l).contains("javascript")
    )
    kept = F.filter(lines, is_kept)
    clean = F.array_join(kept, "\n")
    lower = F.lower(text)
    n_sentences = F.regexp_count(clean, F.lit(r"[.!?]"))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        clean.alias("clean_text"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_lines_kept"),
        lower.contains("lorem ipsum").alias("has_lorem_ipsum"),
        text.contains("{").alias("has_brace"),
        n_sentences.alias("n_sentences"),
    ).withColumn(
        "c4_keep",
        (~F.col("has_lorem_ipsum"))
        & (~F.col("has_brace"))
        & (F.col("n_sentences") >= min_sentences)
        & (F.col("n_lines_kept") > 0),
    )
