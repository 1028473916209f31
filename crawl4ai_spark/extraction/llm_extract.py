"""LLM extraction and LLM content filtering — the Spark-side orchestration.

Re-expresses the reference's two LLM strategies with the model behind an
injectable completion function:

- ``LLMExtractionStrategy`` (reference ``extraction_strategy.py:533-860``):
  merge content into token-capped overlapping chunks
  (``utils.merge_chunks``, here :func:`merge_token_chunks`), build one
  prompt per chunk ({URL}/{HTML}/{REQUEST}/{SCHEMA} variable surface,
  ``prompts.py``), complete, then parse the response through the
  reference's ladder — fenced-JSON / ``<blocks>`` tag / balanced-brace
  salvage (``utils.py:707-749`` split_and_parse_json_objects,
  ``utils.py:1709-1739`` extract_xml_data, ``extraction_strategy.py:50-55``
  _strip_markdown_fences) — into a JSON blocks array
  (``CrawlResult.extracted_content``).
- ``LLMContentFilter`` (reference ``content_filter_strategy.py:808-1040``):
  per-chunk "rewrite as relevant markdown" completions, fence-stripped and
  re-joined in chunk order → a fit-markdown string.

Scale shape: the reference completes chunks with a 4-thread pool per page;
here the batching unit is the Spark partition. ``mapInPandas`` calls
``completion_factory()`` ONCE per partition (amortized client/connection —
what you want per executor against a real inference endpoint), then sends
every chunk prompt of an Arrow batch in one batched list→list call. No
per-row RPC, no driver-side loop; adding executors adds completion
bandwidth linearly.

This container has no LLM service, so the shipped
:func:`rule_based_completion_factory` is a deterministic contract-faithful
fake (answers block prompts with a ``<blocks>`` JSON array, filter prompts
with fenced markdown); tests drive the full path through it, and a user
plugs a real endpoint client in via their own factory.

Defaults mirror reference ``config.py:43-45``: CHUNK_TOKEN_THRESHOLD=2048,
OVERLAP_RATE=0.1, WORD_TOKEN_RATE=1.3 (the content filter's own defaults,
``content_filter_strategy.py:839-841``: threshold 1e9 — i.e. unchunked
unless set).
"""
from __future__ import annotations

import json
import re
from typing import Callable, Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

from crawl4ai_spark.operators.chunking import merge_token_chunks

CHUNK_TOKEN_THRESHOLD = 2048
OVERLAP_RATE = 0.1
WORD_TOKEN_RATE = 1.3

# list[prompt] -> list[completion], positionally aligned
CompletionFn = Callable[[list[str]], list[str]]
CompletionFactory = Callable[[], CompletionFn]


# ──────────────────────────────────────────────────────────────────────────
# Prompt templates — same variable surface as the reference's prompts.py
# ({URL}, {HTML}, {REQUEST}, {SCHEMA}), original wording. The content is
# wrapped in a <content> tag so contract-faithful fakes (and prompt tests)
# can recover it.
# ──────────────────────────────────────────────────────────────────────────

_BLOCKS_CONTRACT = (
    "Respond with ONLY one <blocks>...</blocks> tag containing a JSON "
    'array; each element is {"index": <int>, "tags": [<topic tags>], '
    '"content": <the block text>}.'
)

PROMPT_EXTRACT_BLOCKS = (
    "Below is the content of a page fetched from {URL}.\n"
    "<content>\n{HTML}\n</content>\n"
    "Split the content into coherent semantic blocks. " + _BLOCKS_CONTRACT
)

PROMPT_EXTRACT_BLOCKS_WITH_INSTRUCTION = (
    "Below is the content of a page fetched from {URL}.\n"
    "<content>\n{HTML}\n</content>\n"
    "Following this instruction:\n{REQUEST}\n"
    "split the content into matching semantic blocks. " + _BLOCKS_CONTRACT
)

PROMPT_EXTRACT_SCHEMA_WITH_INSTRUCTION = (
    "Below is the content of a page fetched from {URL}.\n"
    "<content>\n{HTML}\n</content>\n"
    "Following this instruction:\n{REQUEST}\n"
    "extract every object that matches this JSON schema:\n{SCHEMA}\n"
    "Respond with ONLY one <blocks>...</blocks> tag containing a JSON "
    "array of the extracted objects."
)

PROMPT_EXTRACT_INFERRED_SCHEMA = (
    "Below is the content of a page fetched from {URL}.\n"
    "<content>\n{HTML}\n</content>\n"
    "Infer the most natural JSON schema for the page's repeated entities "
    "and extract them. Respond with ONLY one <blocks>...</blocks> tag "
    "containing a JSON array of the extracted objects."
)

PROMPT_FILTER_CONTENT = (
    "Below is the content of a web page.\n"
    "<content>\n{HTML}\n</content>\n"
    "Task: {REQUEST}\n"
    "Respond with ONLY the resulting markdown inside a ```markdown fence."
)

DEFAULT_FILTER_INSTRUCTION = (
    "Convert this content into clean, relevant markdown, removing any "
    "noise or irrelevant content."
)


# ──────────────────────────────────────────────────────────────────────────
# Response parsing ladder (reference extraction_strategy.py:716-756)
# ──────────────────────────────────────────────────────────────────────────

def strip_markdown_fences(text: str) -> str:
    """Reference ``_strip_markdown_fences`` (extraction_strategy.py:50-55)."""
    text = (text or "").strip()
    return re.sub(
        r"^```(?:[a-zA-Z0-9_-]+)?\s*|```$", "", text, flags=re.MULTILINE
    ).strip()


def extract_tag(text: str, tag: str) -> str:
    """Longest-occurrence tag body (reference ``extract_xml_data``,
    utils.py:1709-1739)."""
    pattern = f"<{tag}>((?:(?!<{tag}>).)*)</{tag}>"
    matches = re.findall(pattern, text or "", re.DOTALL)
    return max(matches, key=len).strip() if matches else ""


def split_and_parse_json_objects(s: str) -> tuple[list, list[str]]:
    """Balanced-brace salvage of a malformed JSON-array response
    (reference ``split_and_parse_json_objects``, utils.py:707-749):
    returns (parsed objects, unparsable segment strings)."""
    s = s or ""
    if s.startswith("[") and s.endswith("]"):
        s = s[1:-1].strip()
    segments, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "{":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0:
                segments.append(s[start : i + 1])
    parsed, unparsed = [], []
    for seg in segments:
        try:
            parsed.append(json.loads(seg))
        except json.JSONDecodeError:
            unparsed.append(seg)
    return parsed, unparsed


def parse_blocks(content: str, force_json_response: bool = False) -> list[dict]:
    """Parse one completion into a blocks list — the reference ladder
    (extraction_strategy.py:716-756): empty → error block; force_json →
    fence-stripped ``json.loads`` with the reference's dict normalization
    (single list value unwraps, single object wraps); else the ``<blocks>``
    tag; on any failure, balanced-brace salvage with the unparsable
    remainder kept as an error block."""
    if not content:
        return [
            {"index": 0, "error": True, "tags": ["error"],
             "content": "LLM returned no content"}
        ]
    try:
        if force_json_response:
            blocks = json.loads(strip_markdown_fences(content))
            if isinstance(blocks, dict):
                if len(blocks) == 1 and isinstance(next(iter(blocks.values())), list):
                    blocks = next(iter(blocks.values()))
                else:
                    blocks = [blocks]
        else:
            blocks = json.loads(extract_tag(content, "blocks"))
            if isinstance(blocks, dict):
                blocks = [blocks]
        for b in blocks:
            b["error"] = False
        return blocks
    except Exception:
        parsed, unparsed = split_and_parse_json_objects(content)
        for b in parsed:
            if isinstance(b, dict):
                b["error"] = False
        if unparsed:
            parsed.append(
                {"index": 0, "error": True, "tags": ["error"],
                 "content": "\n".join(unparsed)}
            )
        return parsed


def escape_json_string(s: str) -> str:
    """Reference ``escape_json_string`` (utils.py:795-820) — JSON-safe
    escaping of the chunk before prompt interpolation."""
    s = (s or "").replace("\\", "\\\\").replace('"', '\\"')
    for raw, esc in (("\b", "\\b"), ("\f", "\\f"), ("\n", "\\n"),
                     ("\r", "\\r"), ("\t", "\\t")):
        s = s.replace(raw, esc)
    return s


# ──────────────────────────────────────────────────────────────────────────
# Prompt construction (reference extraction_strategy.py:663-686)
# ──────────────────────────────────────────────────────────────────────────

def build_extract_prompt(
    url: str,
    chunk: str,
    instruction: str | None,
    schema: dict | None,
    extraction_type: str,
) -> str:
    values = {"URL": url or "", "HTML": escape_json_string(chunk)}
    template = PROMPT_EXTRACT_BLOCKS
    if instruction:
        values["REQUEST"] = instruction
        template = PROMPT_EXTRACT_BLOCKS_WITH_INSTRUCTION
    if extraction_type == "schema" and schema:
        values["REQUEST"] = instruction or ""
        values["SCHEMA"] = json.dumps(schema, indent=2)
        template = PROMPT_EXTRACT_SCHEMA_WITH_INSTRUCTION
    elif extraction_type == "schema":
        template = PROMPT_EXTRACT_INFERRED_SCHEMA
    for var, value in values.items():
        template = template.replace("{" + var + "}", value)
    return template


def _sections(
    text: str,
    apply_chunking: bool,
    chunk_token_threshold: int,
    overlap_rate: float,
    word_token_rate: float,
) -> list[str]:
    """The reference's ``_merge`` step (extraction_strategy.py:774-785):
    one document merged/split into ~threshold-token sections with
    ``overlap = threshold × overlap_rate``; ``apply_chunking=False`` is a
    1e9 threshold (reference __init__:618-619), i.e. one section."""
    text = text or ""
    if not text.strip():
        return []
    if not apply_chunking:
        return [text]
    return merge_token_chunks(
        [text],
        target_size=chunk_token_threshold,
        overlap=int(chunk_token_threshold * overlap_rate),
        word_token_ratio=word_token_rate,
    )


_USAGE_FIELDS = StructType(
    [
        StructField("chunks", LongType()),
        StructField("prompt_chars", LongType()),
        StructField("completion_chars", LongType()),
    ]
)


def _batched_rows(
    pdf,
    content_col: str,
    url_col: str | None,
    prompt_for_chunk: Callable[[str, str], str],
    chunk_args: tuple,
) -> tuple[list[str], list[int], list[list[str]]]:
    """Flatten a pandas batch into (prompts, owner row indices, per-row
    chunk lists)."""
    prompts: list[str] = []
    owners: list[int] = []
    chunk_lists: list[list[str]] = []
    urls = pdf[url_col] if url_col else [""] * len(pdf)
    for ri, (u, text) in enumerate(zip(urls, pdf[content_col])):
        chunks = _sections(text, *chunk_args)
        chunk_lists.append(chunks)
        for c in chunks:
            prompts.append(prompt_for_chunk(u or "", c))
            owners.append(ri)
    return prompts, owners, chunk_lists


def llm_extract(
    df: DataFrame,
    completion_factory: CompletionFactory,
    *,
    content_col: str = "markdown",
    url_col: str | None = "url",
    instruction: str | None = None,
    schema: dict | None = None,
    extraction_type: str = "schema",
    chunk_token_threshold: int = CHUNK_TOKEN_THRESHOLD,
    overlap_rate: float = OVERLAP_RATE,
    word_token_rate: float = WORD_TOKEN_RATE,
    apply_chunking: bool = True,
    force_json_response: bool = False,
) -> DataFrame:
    """LLMExtractionStrategy over a DataFrame: adds ``extracted_content``
    (the JSON blocks array string — the reference's
    ``CrawlResult.extracted_content`` surface) and an ``llm_usage`` struct
    (chunk/char accounting; the reference's TokenUsage totals come from
    the provider, which is behind the injected fn here).

    Blocks are concatenated in chunk order per row (deterministic; the
    reference extends in thread-completion order, which is not)."""
    if extraction_type not in ("schema", "block"):
        raise ValueError(f"extraction_type must be 'schema' or 'block', got {extraction_type!r}")
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("extracted_content", StringType()),
            StructField("llm_usage", _USAGE_FIELDS),
        ]
    )
    chunk_args = (apply_chunking, chunk_token_threshold, overlap_rate, word_token_rate)

    def prompt_for_chunk(url: str, chunk: str) -> str:
        return build_extract_prompt(url, chunk, instruction, schema, extraction_type)

    def gen(batches: Iterable) -> Iterator:
        complete = completion_factory()  # once per partition
        for pdf in batches:
            prompts, owners, chunk_lists = _batched_rows(
                pdf, content_col, url_col, prompt_for_chunk, chunk_args
            )
            answers = list(complete(prompts)) if prompts else []
            if len(answers) != len(prompts):
                raise ValueError(
                    f"completion fn returned {len(answers)} answers for "
                    f"{len(prompts)} prompts"
                )
            blocks = [[] for _ in range(len(pdf))]
            comp_chars = [0] * len(pdf)
            prompt_chars = [0] * len(pdf)
            for p, o, a in zip(prompts, owners, answers):
                prompt_chars[o] += len(p)
                comp_chars[o] += len(a or "")
                blocks[o].extend(parse_blocks(a, force_json_response))
            pdf = pdf.copy()
            pdf["extracted_content"] = [json.dumps(b) for b in blocks]
            pdf["llm_usage"] = [
                {
                    "chunks": len(cl),
                    "prompt_chars": pc,
                    "completion_chars": cc,
                }
                for cl, pc, cc in zip(chunk_lists, prompt_chars, comp_chars)
            ]
            yield pdf

    return df.mapInPandas(gen, out_schema)


def llm_fit_markdown(
    df: DataFrame,
    completion_factory: CompletionFactory,
    *,
    content_col: str = "markdown",
    output_col: str = "fit_markdown_llm",
    instruction: str | None = None,
    chunk_token_threshold: int = int(1e9),
    overlap_rate: float = OVERLAP_RATE,
    word_token_rate: float = WORD_TOKEN_RATE,
) -> DataFrame:
    """LLMContentFilter over a DataFrame: per-chunk "rewrite as relevant
    markdown" completions, fence-stripped (reference
    ``content_filter_strategy.py:1040-1070`` keeps the fenced body) and
    joined in chunk order into ``output_col``. Default threshold 1e9 =
    unchunked, matching the reference's __init__ default."""
    request = instruction or DEFAULT_FILTER_INSTRUCTION
    out_schema = StructType(
        list(df.schema.fields) + [StructField(output_col, StringType())]
    )
    chunk_args = (True, chunk_token_threshold, overlap_rate, word_token_rate)

    def prompt_for_chunk(_url: str, chunk: str) -> str:
        return PROMPT_FILTER_CONTENT.replace(
            "{HTML}", escape_json_string(chunk)
        ).replace("{REQUEST}", request)

    def gen(batches: Iterable) -> Iterator:
        complete = completion_factory()
        for pdf in batches:
            prompts, owners, _ = _batched_rows(
                pdf, content_col, None, prompt_for_chunk, chunk_args
            )
            answers = list(complete(prompts)) if prompts else []
            if len(answers) != len(prompts):
                raise ValueError(
                    f"completion fn returned {len(answers)} answers for "
                    f"{len(prompts)} prompts"
                )
            parts: list[list[str]] = [[] for _ in range(len(pdf))]
            for o, a in zip(owners, answers):
                body = strip_markdown_fences(a)
                if body:
                    parts[o].append(body)
            pdf = pdf.copy()
            pdf[output_col] = ["\n\n".join(p) for p in parts]
            yield pdf

    return df.mapInPandas(gen, out_schema)


# ──────────────────────────────────────────────────────────────────────────
# Deterministic contract-faithful fake model (this container has no LLM
# service; a real deployment passes its own factory)
# ──────────────────────────────────────────────────────────────────────────

_CONTENT_RE = re.compile(r"<content>\n(.*)\n</content>", re.DOTALL)


_UNESCAPE_MAP = {"b": "\b", "f": "\f", "n": "\n", "r": "\r", "t": "\t",
                 '"': '"', "\\": "\\"}


def _unescape_prompt_chunk(s: str) -> str:
    # single left-to-right pass — sequential .replace() calls corrupt a
    # literal backslash followed by b/f/n/r/t (e.g. the text "C:\\bin")
    return re.sub(
        r"\\(.)", lambda m: _UNESCAPE_MAP.get(m.group(1), m.group(1)), s,
        flags=re.DOTALL,
    )


def rule_based_completion_factory(init_marker: str = "") -> CompletionFn:
    """A deterministic stand-in model: block/schema prompts get a
    ``<blocks>`` JSON array (one block per paragraph, tags = the
    paragraph's first word lowercased), filter prompts get fenced markdown
    with sentences containing ``boilerplate`` dropped (sentence-, not
    line-based: the merge step is whitespace-tokenized like the
    reference's merge_chunks, so newlines do not survive chunking).
    ``init_marker``, when
    set, is appended to every block's tags — tests use it to count how
    many times the factory ran (must be once per partition, not per row)."""

    def complete(prompts: list[str]) -> list[str]:
        out = []
        for p in prompts:
            m = _CONTENT_RE.search(p)
            chunk = _unescape_prompt_chunk(m.group(1)) if m else ""
            if "```markdown fence" in p:  # filter-prompt contract
                sentences = re.split(r"(?<=[.!?])\s+", chunk)
                kept = [s for s in sentences if "boilerplate" not in s.lower()]
                out.append("```markdown\n" + " ".join(kept).strip() + "\n```")
                continue
            paragraphs = [s.strip() for s in re.split(r"\n\n+", chunk) if s.strip()]
            blocks = []
            for i, para in enumerate(paragraphs):
                tags = [para.split()[0].lower()] if para.split() else []
                if init_marker:
                    tags.append(init_marker)
                blocks.append({"index": i, "tags": tags, "content": para})
            out.append("<blocks>" + json.dumps(blocks) + "</blocks>")
        return out

    return complete
