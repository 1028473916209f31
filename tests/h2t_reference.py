"""Test-time oracle: load the reference's markdown generator from the
read-only reference tree (pure-stdlib vendored html2text + the generator
glue, with its heavyweight package deps stubbed out).

Used ONLY by the parity tests — the engine itself never imports the
reference. Returns (raw_markdown, markdown_with_citations,
references_markdown) exactly as the reference pipeline would produce.
"""

from __future__ import annotations

import importlib.util
import sys
import types

_REF = "/root/reference/crawl4ai"


def _load():
    if "c4ai_ref.markdown_generation_strategy" in sys.modules:
        return sys.modules["c4ai_ref.markdown_generation_strategy"]
    pkg = types.ModuleType("c4ai_ref")
    pkg.__path__ = [_REF]
    sys.modules["c4ai_ref"] = pkg

    spec = importlib.util.spec_from_file_location(
        "c4ai_ref.html2text",
        f"{_REF}/html2text/__init__.py",
        submodule_search_locations=[f"{_REF}/html2text"],
    )
    m = importlib.util.module_from_spec(spec)
    sys.modules["c4ai_ref.html2text"] = m
    spec.loader.exec_module(m)

    models = types.ModuleType("c4ai_ref.models")

    class MarkdownGenerationResult:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    models.MarkdownGenerationResult = MarkdownGenerationResult
    sys.modules["c4ai_ref.models"] = models

    cfs = types.ModuleType("c4ai_ref.content_filter_strategy")

    class RelevantContentFilter:  # noqa: D401 - stub
        pass

    cfs.RelevantContentFilter = RelevantContentFilter
    sys.modules["c4ai_ref.content_filter_strategy"] = cfs

    spec2 = importlib.util.spec_from_file_location(
        "c4ai_ref.markdown_generation_strategy",
        f"{_REF}/markdown_generation_strategy.py",
    )
    mg = importlib.util.module_from_spec(spec2)
    sys.modules["c4ai_ref.markdown_generation_strategy"] = mg
    spec2.loader.exec_module(mg)
    return mg


def reference_markdown(html: str, base_url: str = "") -> tuple[str, str, str]:
    mg = _load()
    r = mg.DefaultMarkdownGenerator().generate_markdown(html, base_url=base_url)
    return r.raw_markdown, r.markdown_with_citations, r.references_markdown


def reference_raw(html: str, base_url: str = "") -> str:
    return reference_markdown(html, base_url)[0]
