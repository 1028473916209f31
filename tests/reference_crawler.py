"""Single-process reference crawler — the oracle for the Spark wave loop.

An independent, dict-and-set implementation of the SAME crawl semantics
(level-synchronous budgeted BFS, robots fail-open gating, first-wins
discovery dedup, deterministic wave order (score desc, depth, url)).
The Spark loop must reproduce its per-wave attempted sets exactly.
"""

from __future__ import annotations

from urllib.parse import urlparse
from urllib.robotparser import RobotFileParser

from crawl4ai_spark.extraction.links import extract_links


def _host(url: str) -> str:
    return urlparse(url).netloc.lower()


def reference_crawl(
    pages_by_url: dict[str, bytes],
    seeds: list[str],
    budgets: dict[str, int] | None = None,
    robots_rules: dict[str, str] | None = None,
    max_depth: int = 3,
    max_pages: int | None = None,
    default_budget: int = 10**6,
    include_external: bool = True,
    user_agent: str = "*",
) -> dict:
    budgets = budgets or {}
    parsers: dict[str, RobotFileParser] = {}
    for host, rules in (robots_rules or {}).items():
        parser = RobotFileParser()
        parser.parse(rules.splitlines())
        # same wildcard semantics as the engine (reference utils.py:57-73
        # RuleLine glob patch) so fixtures with '*' rules stay comparable
        from crawl4ai_spark.operators.robots import _bind_glob_rules

        _bind_glob_rules(parser)
        parsers[host] = parser

    def allowed(url: str) -> bool:
        parser = parsers.get(_host(url))
        return True if parser is None else parser.can_fetch(user_agent, url)

    frontier: dict[str, tuple[int, float]] = {}  # url -> (depth, score)
    for seed in seeds:
        frontier.setdefault(seed, (0, 1.0))
    attempted: set[str] = set()
    waves: list[dict] = []

    while True:
        pending = {u: v for u, v in frontier.items() if u not in attempted}
        if not pending:
            break
        by_host: dict[str, list[tuple[str, int, float]]] = {}
        for url, (depth, score) in pending.items():
            by_host.setdefault(_host(url), []).append((url, depth, score))
        selected: list[tuple[str, int, float]] = []
        for host, items in by_host.items():
            items.sort(key=lambda t: (-t[2], t[1], t[0]))
            selected.extend(items[: budgets.get(host, default_budget)])
        if max_pages is not None:
            selected.sort(key=lambda t: (-t[2], t[1], t[0]))
            selected = selected[: max_pages - len(attempted)]
            if not selected:
                break

        wave = {"attempted": set(), "denied": set(), "fetched": set(), "missing": set()}
        discoveries: list[tuple[str, int]] = []
        for url, depth, score in selected:
            attempted.add(url)
            wave["attempted"].add(url)
            if not allowed(url):
                wave["denied"].add(url)
                continue
            html = pages_by_url.get(url)
            if html is None:
                wave["missing"].add(url)
                continue
            wave["fetched"].add(url)
            links = extract_links(html.decode("utf-8"), url)
            hrefs = [d["href"] for d in links["internal"]]
            if include_external:
                hrefs += [d["href"] for d in links["external"]]
            for href in hrefs:
                if urlparse(href).scheme in ("http", "https") and "." in urlparse(href).netloc:
                    discoveries.append((href, depth + 1))
        for href, depth in discoveries:
            if depth <= max_depth and href not in frontier:
                frontier[href] = (depth, 1.0)
        waves.append(wave)

    return {
        "waves": waves,
        "attempted": attempted,
        "frontier": dict(frontier),
    }
