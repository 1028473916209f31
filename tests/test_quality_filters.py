"""Gopher quality/repetition signals + C4 line filters — hand-computed
fixtures plus a brute-force Python recomputation over the sf0.001
documents corpus (the operator's Counter-free distributed algebra must
equal the obvious single-process implementation)."""

import os
import re
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.quality_filters import (
    GOPHER_STOPWORDS,
    GOPHER_THRESHOLDS,
    c4_line_filter,
    gopher_filter,
    gopher_signals,
)

from tests.conftest import spark  # noqa: F401

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):  # noqa: F811
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat. the cat sat again."),
            (2, "a a a a a a a a a a"),
            (3, "x y\nx y\nz q r"),
            (4, ""),
            (5, "- item one\n- item two\n- item three\nplain tail line..."),
        ],
        "doc_id long, text string",
    )


def test_scalar_signals_hand_computed(docs):
    rows = {r.doc_id: r for r in gopher_signals(docs).collect()}
    r1 = rows[1]
    assert r1.word_count == 10
    assert r1.mean_word_length == round(33 / 10, 6)
    assert r1.stopword_count == 1  # {'the'} — distinct panel hits
    assert r1.alpha_word_fraction == 1.0
    r5 = rows[5]
    assert r5.bullet_line_fraction == 0.75
    assert r5.ellipsis_line_fraction == 0.25
    r4 = rows[4]
    assert r4.word_count == 0 and r4.mean_word_length == 0.0


def test_repetition_signals_hand_computed(docs):
    rows = {r.doc_id: r for r in gopher_signals(docs).collect()}
    r1 = rows[1]
    # "the cat" ×2 (len 7) covers 14 of 42 chars; "the cat sat" ×2 (len
    # 11) covers 22/42; no 4-gram repeats -> 0 (singletons don't count)
    assert r1.top_2gram_char_fraction == round(14 / 42, 6)
    assert r1.top_3gram_char_fraction == round(22 / 42, 6)
    assert r1.top_4gram_char_fraction == 0.0
    assert r1.dup_5gram_char_fraction == 0.0
    r2 = rows[2]
    assert r2.top_2gram_char_fraction == 1.0  # 9×"a a" ≫ 19 chars, capped
    assert r2.dup_9gram_char_fraction == 1.0
    assert r2.dup_10gram_char_fraction == 0.0  # the single 10-gram never repeats
    r3 = rows[3]
    assert r3.dup_line_fraction == round(1 / 3, 6)
    assert r3.dup_line_char_fraction == round(6 / 13, 6)


def test_gopher_filter_reasons(docs):
    rows = {r.doc_id: r for r in gopher_filter(docs).collect()}
    assert not rows[2].gopher_pass
    reasons = rows[2].fail_reasons.split(",")
    assert "top_2gram_char_fraction" in reasons and "word_count" in reasons
    assert rows[2].fail_reasons == ",".join(sorted(reasons))  # stable order


def _py_words(text):
    return [w for w in re.split(r"\s+", text.strip().lower()) if w]


def _py_lines(text):
    return [l.strip() for l in re.split(r"\r\n|\r|\n", text) if l.strip()]


def _r6(x, _ndigits=6):
    """Spark F.round semantics (HALF_UP, 6dp) — Python round() is HALF_EVEN."""
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def _py_signals(text):
    """Single-process reference implementation of every signal."""
    words, lines = _py_words(text), _py_lines(text)
    tc = max(len(text), 1)
    out = {
        "word_count": len(words),
        "mean_word_length": _r6(sum(map(len, words)) / max(len(words), 1), 6),
        "symbol_word_ratio": _r6(            (text.count("#") + len(re.findall(r"\.\.\.", text)) + text.count("…"))
            / max(len(words), 1),
            6,
        ),
        "bullet_line_fraction": _r6(            sum(l[0] in "-*•‣▪" for l in lines) / max(len(lines), 1), 6
        ),
        "ellipsis_line_fraction": _r6(            sum(l.endswith("...") or l.endswith("…") for l in lines) / max(len(lines), 1), 6
        ),
        "alpha_word_fraction": _r6(            sum(bool(re.search("[a-z]", w)) for w in words) / max(len(words), 1), 6
        ),
        "stopword_count": len(set(words) & set(GOPHER_STOPWORDS)),
    }
    cnt = Counter(lines)
    out["dup_line_fraction"] = _r6((len(lines) - len(cnt)) / max(len(lines), 1), 6)
    out["dup_line_char_fraction"] = _r6(        min(sum(c * len(l) for l, c in cnt.items() if c >= 2) / tc, 1.0), 6
    )
    for n in (2, 3, 4):
        grams = Counter(
            " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
        )
        top = max(grams.items(), key=lambda kv: (kv[1], len(kv[0])), default=("", 0))
        cover = top[1] * len(top[0]) if top[1] >= 2 else 0
        out[f"top_{n}gram_char_fraction"] = _r6(min(cover / tc, 1.0), 6)
    for n in (5, 6, 7, 8, 9, 10):
        grams = Counter(
            " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
        )
        dup = sum(c * len(g) for g, c in grams.items() if c >= 2)
        out[f"dup_{n}gram_char_fraction"] = _r6(min(dup / tc, 1.0), 6)
    return out


def test_signals_match_python_reference_on_corpus(spark):  # noqa: F811
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    got = {r.doc_id: r.asDict() for r in gopher_signals(docs).collect()}
    assert set(got) == set(texts)
    for doc_id, text in texts.items():
        want = _py_signals(text)
        have = got[doc_id]
        for k, v in want.items():
            assert have[k] == pytest.approx(v, abs=1e-6), (doc_id, k, have[k], v)


def test_c4_line_filter_hand_computed(spark):  # noqa: F811
    docs = spark.createDataFrame(
        [
            (1, "Good line stays here.\nshort.\nno terminal punct\nHas javascript inside.\nAnother keeper line!"),
            (2, "lorem ipsum is here. with sentences. one. two. five words each line."),
            (3, "Uses a { brace. More text here. And more. And more. Final one."),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in c4_line_filter(docs).collect()}
    r1 = rows[1]
    assert r1.clean_text == "Good line stays here.\nAnother keeper line!"
    assert r1.n_lines == 5 and r1.n_lines_kept == 2
    assert not r1.c4_keep  # only 2 sentences survive (< 5)
    assert rows[2].has_lorem_ipsum and not rows[2].c4_keep
    assert rows[3].has_brace and not rows[3].c4_keep


def test_c4_keep_requires_five_sentences(spark):  # noqa: F811
    ok = "One good sentence here. Two good ones now. Three arrive here. Four is plenty. Five seals it."
    docs = spark.createDataFrame([(1, ok)], "doc_id long, text string")
    r = c4_line_filter(docs).collect()[0]
    assert r.n_sentences == 5 and r.c4_keep


def test_thresholds_cover_all_signal_columns(docs):
    sig_cols = set(gopher_signals(docs).columns) - {"doc_id"}
    assert set(GOPHER_THRESHOLDS) == sig_cols


def test_decontaminate_flags_planted_overlap(spark):  # noqa: F811
    """GPT-3-style n-gram decontamination: a training doc embedding a
    verbatim benchmark span is flagged; disjoint docs are not; counts
    are the number of distinct shared n-grams."""
    from crawl4ai_spark.operators.dedup import decontaminate

    bench = spark.createDataFrame(
        [(100, "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # contains a verbatim 14-token benchmark span -> two 13-grams
            (1, "intro words then alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november and a tail"),
            # shares only 12 consecutive tokens -> no 13-gram overlap
            (2, "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima XXX"),
            (3, "completely unrelated text about nothing shared with benchmarks whatsoever here today"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in decontaminate(train, bench, n=13).collect()}
    assert out[1].contaminated and out[1].n_contaminated_grams == 2
    assert not out[2].contaminated and out[2].n_contaminated_grams == 0
    assert not out[3].contaminated
    assert set(out) == {1, 2, 3}  # clean docs still present


def test_decontaminate_auto_join_strategy(spark):  # noqa: F811
    """broadcast_bench=None auto-selects: a benchmark gram set beyond
    max_broadcast_grams must NOT be force-broadcast (driver safety), and
    the hash-join fallback returns identical answers."""
    from crawl4ai_spark.operators.dedup import decontaminate

    bench = spark.createDataFrame(
        [(100, "one two three four five six seven eight nine ten")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "prefix one two three four five suffix words here"),
            (2, "nothing shared at all in this training document text"),
        ],
        "doc_id long, text string",
    )
    forced = decontaminate(train, bench, n=3, broadcast_bench=True)
    # cap of 1 distinct gram -> auto falls back to the shuffle hash join
    auto = decontaminate(train, bench, n=3, max_broadcast_grams=1)
    assert "BroadcastHashJoin" in forced._jdf.queryExecution().executedPlan().toString()
    rows_f = sorted(map(tuple, forced.collect()))
    rows_a = sorted(map(tuple, auto.collect()))
    assert rows_f == rows_a
    assert rows_f[0][1] > 0  # doc 1 contaminated either way


def test_redact_pii_replaces_and_counts(spark):  # noqa: F811
    from crawl4ai_spark.operators.regex_extract import redact_pii

    docs = spark.createDataFrame(
        [
            (1, "mail john.doe+x@test.com or call (415) 555-1234, server 10.0.0.1"),
            (2, "clean text, nothing to hide"),
            (3, "card 4111111111111111 iban DE44500105175407324931"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in redact_pii(docs).collect()}
    assert "[EMAIL]" in rows[1].redacted_text
    assert "[IPV4]" in rows[1].redacted_text
    assert "@" not in rows[1].redacted_text
    assert rows[1].n_redactions == 3
    assert rows[2].redacted_text == "clean text, nothing to hide"
    assert rows[2].n_redactions == 0
    assert rows[3].redacted_text == "card [CREDIT_CARD] iban [IBAN]"
    assert rows[3].n_redactions == 2


def test_crlf_documents_survive_line_gates(spark):  # noqa: F811
    """CRLF web text must behave exactly like LF text: trailing \\r would
    otherwise defeat the terminal-punct/ellipsis suffix gates and corrupt
    duplicate-line keys (round-4 review finding)."""
    lf = "One good sentence here. \nTwo good ones now.\nOne good sentence here. \nFour is plenty.\nFive seals it."
    crlf = lf.replace("\n", "\r\n")
    docs = spark.createDataFrame([(1, lf), (2, crlf)], "doc_id long, text string")
    c4 = {r.doc_id: r for r in c4_line_filter(docs).collect()}
    assert c4[1].n_lines_kept == c4[2].n_lines_kept == 5
    assert c4[1].c4_keep and c4[2].c4_keep
    sig = {r.doc_id: r for r in gopher_signals(docs).collect()}
    assert sig[1].dup_line_fraction == sig[2].dup_line_fraction > 0


def test_null_text_rows_get_empty_verdicts(spark):  # noqa: F811
    docs = spark.createDataFrame([(1, None), (2, "the and of to in it go on at we. " * 10)], "doc_id long, text string")
    g = {r.doc_id: r for r in gopher_filter(docs).collect()}
    assert g[1].word_count == 0 and g[1].gopher_pass is False
    assert g[1].alpha_word_fraction == 0.0
    c4 = {r.doc_id: r for r in c4_line_filter(docs).collect()}
    assert c4[1].clean_text == "" and c4[1].c4_keep is False


def test_redact_pii_counts_only_real_replacements(spark):  # noqa: F811
    from crawl4ai_spark.operators.regex_extract import redact_pii

    docs = spark.createDataFrame(
        [(1, "forward [EMAIL] to bob@x.com")], "doc_id long, text string"
    )
    r = redact_pii(docs).collect()[0]
    assert r.n_redactions == 1  # the literal [EMAIL] in the input is not a replacement
    assert r.redacted_text == "forward [EMAIL] to [EMAIL]"


def test_signals_match_python_reference_adversarial(spark):  # noqa: F811
    """Adversarial fixture battery (one Spark round trip): CRLF/CR mixes,
    tabs, unicode bullets/ellipsis, boundary repetition counts, symbol
    runs, whitespace-only and single-token docs — every signal must equal
    the single-process reference."""
    cases = [
        "",
        " ",
        "\n\n\n",
        "\r\n\r\n",
        "x",
        "hi",
        "the the the the the",
        "a b. a b. a b.\r\na b. tail here.",
        "word " * 60,
        ("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 " * 3).strip(),
        "- one\r\n- two\r\n• three\n‣ four\n▪ five\nplain...",
        "ends with dots...\nends with ell…\nno suffix",
        "### ## # hashes ... and … more ...",
        "tab\tseparated\ttokens stay one line",
        "línea acentuada única aquí\nlínea acentuada única aquí",
        "123 456 789 numeric only words",
        "mixedCASE Words LOWER lower",
        ("repeat me " * 12).strip(),
        "one two three four five six seven eight nine ten eleven twelve",
        "x y\rx y\rz",  # bare CR IS a line break (universal newlines)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "doc_id long, text string"
    )
    got = {r.doc_id: r.asDict() for r in gopher_signals(docs).collect()}
    for i, text in enumerate(cases):
        want = _py_signals(text)
        for k, v in want.items():
            assert got[i][k] == pytest.approx(v, abs=1e-6), (i, k, got[i][k], v, text)


def _sb_reference(corpus: dict, alpha=0.4):
    """Independent pure-Python Stupid Backoff (Brants 2007) re-derivation
    for the pytest pin: same cleaned-terms tokenization, same
    natural-max-order positions."""
    import math
    import re as _re

    tok = lambda s: [w for w in _re.sub(r"[^a-z0-9 ]", "", s.lower()).strip().split() if len(w) > 2]
    docs = {k: tok(v) for k, v in corpus.items()}
    c1, c2, c3 = Counter(), Counter(), Counter()
    for ws in docs.values():
        c1.update(ws)
        c2.update(zip(ws, ws[1:]))
        c3.update(zip(ws, ws[1:], ws[2:]))
    n = sum(c1.values())
    out = {}
    for k, ws in docs.items():
        if not ws:
            out[k] = (0, None)
            continue
        logs = []
        for i, w in enumerate(ws):
            s_uni = c1[w] / n
            if i >= 2 and (ws[i - 2], ws[i - 1], w) in c3:
                s = c3[(ws[i - 2], ws[i - 1], w)] / c2[(ws[i - 2], ws[i - 1])]
            elif i >= 1 and (ws[i - 1], w) in c2:
                s = c2[(ws[i - 1], w)] / c1[ws[i - 1]] * (alpha if i >= 2 else 1.0)
            else:
                pen = alpha ** min(i, 2)
                s = pen * s_uni
            logs.append(math.log10(s))
        out[k] = (len(ws), round(sum(logs) / len(logs), 6))
    return out


def test_stupid_backoff_matches_python_reference(spark):
    """stupid_backoff_scores ≡ an independent in-test implementation on a
    corpus that exercises every backoff branch: seen trigrams, bigram
    backoff at pos>=2, unigram double-backoff, natural lower orders at
    pos 0/1, repeated docs, and an empty doc."""
    from crawl4ai_spark.operators.lm_score import stupid_backoff_scores

    corpus = {
        0: "the cat sat on the mat",
        1: "the cat sat on the hat",
        2: "the dog sat quietly near the mat",
        3: "cat mat dog hat quietly",
        4: "zebra unique tokens appear once here",
        5: "the cat sat on the mat",  # exact repeat: boosts trigram counts
        6: "",  # empty: n_tokens 0, NULL score
        7: "on on on",
    }
    want = _sb_reference(corpus)
    docs = spark.createDataFrame(
        [(k, v) for k, v in corpus.items()], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.lm_logscore)
        for r in stupid_backoff_scores(docs).collect()
    }
    assert got == want
