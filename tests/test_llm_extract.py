"""LLM extraction / filter orchestration (extraction/llm_extract.py) —
the Spark plumbing is real; the model is the deterministic
contract-faithful fake."""
import json
import uuid

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.extraction.llm_extract import (
    build_extract_prompt,
    llm_extract,
    llm_fit_markdown,
    parse_blocks,
    rule_based_completion_factory,
    split_and_parse_json_objects,
    strip_markdown_fences,
    extract_tag,
)
from tests.conftest import spark  # noqa: F401


# ── parsing ladder ────────────────────────────────────────────────────────

def test_strip_markdown_fences():
    assert strip_markdown_fences("```json\n[1, 2]\n```") == "[1, 2]"
    assert strip_markdown_fences("plain") == "plain"


def test_extract_tag_longest_occurrence():
    s = "<blocks>[1]</blocks> noise <blocks>[1, 2, 3]</blocks>"
    assert extract_tag(s, "blocks") == "[1, 2, 3]"
    assert extract_tag("no tag here", "blocks") == ""


def test_split_and_parse_json_objects_salvage():
    parsed, unparsed = split_and_parse_json_objects(
        '[{"a": 1}, {"b": oops}, {"c": 3}]'
    )
    assert parsed == [{"a": 1}, {"c": 3}]
    assert unparsed == ['{"b": oops}']


def test_parse_blocks_ladder():
    # happy path: <blocks> tag
    good = '<blocks>[{"index": 0, "tags": ["t"], "content": "x"}]</blocks>'
    blocks = parse_blocks(good)
    assert blocks == [{"index": 0, "tags": ["t"], "content": "x", "error": False}]
    # force_json: fenced dict with a single list value unwraps
    fj = '```json\n{"news": [{"h": "a"}, {"h": "b"}]}\n```'
    assert [b["h"] for b in parse_blocks(fj, force_json_response=True)] == ["a", "b"]
    # single non-list object wraps
    assert parse_blocks('{"id": 7}', force_json_response=True) == [
        {"id": 7, "error": False}
    ]
    # empty → error block
    assert parse_blocks("")[0]["error"] is True
    # malformed → balanced-brace salvage + error remainder
    bad = '<blocks>[{"ok": 1}, {"broken": }]</blocks>'
    out = parse_blocks(bad)
    assert {"ok": 1, "error": False} in out
    assert out[-1]["error"] is True and "broken" in out[-1]["content"]


def test_build_extract_prompt_variable_surface():
    p = build_extract_prompt(
        "http://x.test/", 'He said "hi"\nbye', "get quotes",
        {"type": "object"}, "schema",
    )
    assert "http://x.test/" in p
    assert '\\"hi\\"' in p and "\\n" in p  # escape_json_string applied
    assert "get quotes" in p and '"type": "object"' in p
    # block mode without schema uses the instruction template
    p2 = build_extract_prompt("u", "c", "find stuff", None, "block")
    assert "find stuff" in p2 and "<blocks>" in p2
    # schema mode without schema → inferred-schema template
    p3 = build_extract_prompt("u", "c", None, None, "schema")
    assert "Infer" in p3


# ── end-to-end through Spark ──────────────────────────────────────────────

def test_llm_extract_end_to_end(spark):  # noqa: F811
    rows = [
        ("http://a.test/", "First para words here.\n\nSecond para follows."),
        ("http://b.test/", "Solo paragraph."),
        ("http://c.test/", ""),  # empty content → no chunks, empty blocks
    ]
    df = spark.createDataFrame(rows, "url string, markdown string")
    out = llm_extract(
        df, rule_based_completion_factory, extraction_type="block",
        apply_chunking=False,
    ).orderBy("url").collect()

    a = json.loads(out[0].extracted_content)
    assert [b["content"] for b in a] == [
        "First para words here.", "Second para follows.",
    ]
    assert all(b["error"] is False for b in a)
    assert a[0]["tags"] == ["first"]
    assert out[0].llm_usage.chunks == 1
    assert out[0].llm_usage.prompt_chars > 0
    b = json.loads(out[1].extracted_content)
    assert len(b) == 1 and b[0]["content"] == "Solo paragraph."
    c = json.loads(out[2].extracted_content)
    assert c == [] and out[2].llm_usage.chunks == 0


def test_llm_extract_chunking_matches_merge_token_chunks(spark):  # noqa: F811
    from crawl4ai_spark.extraction.llm_extract import _sections

    text = " ".join(f"w{i}" for i in range(100))
    # threshold 20 tokens at rate 1.0, 10% overlap → several chunks
    chunks = _sections(text, True, 20, 0.1, 1.0)
    assert len(chunks) > 3
    df = spark.createDataFrame([("u", text)], "url string, markdown string")
    row = llm_extract(
        df, rule_based_completion_factory, extraction_type="block",
        chunk_token_threshold=20, overlap_rate=0.1, word_token_rate=1.0,
    ).head()
    assert row.llm_usage.chunks == len(chunks)
    # one block per chunk (fake: chunk has no blank lines → 1 paragraph),
    # concatenated in chunk order
    blocks = json.loads(row.extracted_content)
    assert [b["content"] for b in blocks] == chunks


def test_llm_extract_malformed_model_degrades_to_error_blocks(spark):  # noqa: F811
    def broken_factory():
        def complete(prompts):
            return ['<blocks>[{"fine": 1}, {"broken": }]</blocks>'] * len(prompts)

        return complete

    df = spark.createDataFrame([("u", "text body")], "url string, markdown string")
    row = llm_extract(df, broken_factory).head()
    blocks = json.loads(row.extracted_content)
    assert {"fine": 1, "error": False} in blocks
    assert any(b.get("error") for b in blocks)


def test_llm_extract_answer_count_mismatch_raises(spark):  # noqa: F811
    def short_factory():
        return lambda prompts: prompts[:-1] and ["x"]

    df = spark.createDataFrame([("u", "text body")], "url string, markdown string")
    with pytest.raises(Exception, match="answers"):
        llm_extract(df, short_factory).collect()


def test_completion_factory_called_once_per_partition(spark):  # noqa: F811
    """The client must be initialized per PARTITION (amortized), never
    per row: with 8 rows in 2 partitions there must be ≤2 distinct init
    markers across all blocks."""

    def marked_factory():
        return rule_based_completion_factory(init_marker=f"init-{uuid.uuid4().hex}")

    rows = [(f"http://h{i}.test/", f"Doc number {i} text.") for i in range(8)]
    df = spark.createDataFrame(rows, "url string, markdown string").repartition(2)
    out = llm_extract(df, marked_factory, extraction_type="block").collect()
    markers = {
        t
        for r in out
        for b in json.loads(r.extracted_content)
        for t in b["tags"]
        if t.startswith("init-")
    }
    assert 1 <= len(markers) <= 2


def test_llm_fit_markdown_filters_and_orders(spark):  # noqa: F811
    text = "Keep this sentence. This is boilerplate: subscribe now! Also keep this."
    df = spark.createDataFrame([("u", text)], "url string, markdown string")
    row = llm_fit_markdown(df, rule_based_completion_factory).head()
    assert "Keep this sentence." in row.fit_markdown_llm
    assert "Also keep this." in row.fit_markdown_llm
    assert "subscribe" not in row.fit_markdown_llm
    # chunked path joins in chunk order
    long = " ".join(f"tok{i}" for i in range(60))
    df2 = spark.createDataFrame([("u", long)], "url string, markdown string")
    row2 = llm_fit_markdown(
        df2, rule_based_completion_factory,
        chunk_token_threshold=20, overlap_rate=0.0, word_token_rate=1.0,
    ).head()
    # all tokens survive (no boilerplate), order preserved across chunks
    assert row2.fit_markdown_llm.replace("\n\n", " ").split() == long.split()


def test_llm_extract_schema_mode_plan_is_single_python_stage(spark):  # noqa: F811
    """Plan shape: one MapInPandas over the scan — no shuffle, no
    per-row PythonUDF."""
    df = spark.createDataFrame([("u", "t")], "url string, markdown string")
    out = llm_extract(df, rule_based_completion_factory)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "Exchange" not in plan


def test_escape_unescape_roundtrip_backslash_sequences():
    from crawl4ai_spark.extraction.llm_extract import (
        _unescape_prompt_chunk,
        escape_json_string,
    )

    for text in (
        "C:\\bin and D:\\tools",
        'quote " tab\t nl\n end',
        "\\\\double \\n literal",
    ):
        assert _unescape_prompt_chunk(escape_json_string(text)) == text
