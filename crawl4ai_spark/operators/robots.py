"""Robots.txt gating — vectorized stdlib RobotFileParser evaluation.

Behavioral contract: the reference parses cached rules with stdlib
``RobotFileParser`` and **allows on any error or absence** (fail-open,
``crawl4ai/utils.py:313-365``); denied URLs become 403-style results and
are not retried (``crawl4ai/async_webcrawler.py:384-397``). Rules are
cached per host with a 7-day TTL (``crawl4ai/utils.py:252-311``).

Spark design: the wave is joined (broadcast — the robots dimension is tiny
relative to the frontier) against ``robots(host, rules_text)``, then a
single Series→Series pandas UDF evaluates ``can_fetch``. The UDF memoizes
one parsed RobotFileParser per distinct rules_text per Arrow batch, so
parsing cost is O(distinct hosts), not O(rows) — the vectorized analog of
the reference's per-host cache.
"""

from __future__ import annotations

import re
from urllib.robotparser import RobotFileParser, RuleLine

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

ROBOTS_TTL_DAYS = 7

# Stock RuleLine percent-encodes "*", so a wildcard rule like
# "Disallow: /private/*" NEVER matches anything — the reference
# monkey-patches applies_to process-wide to treat "*" as a glob
# (utils.py:57-73). Same SEMANTICS here — including the reference's quirk
# that the trailing-"$" anchor branch is dead code (RuleLine quotes "$"
# to "%24" before the patch sees it, pinned by
# test_robots_wildcard_and_anchor_rules) — but applied per PARSER
# INSTANCE in _make_parser rather than mutating the stdlib class:
# unrelated urllib.robotparser users in the same process keep stock
# behavior.
_original_applies_to = RuleLine.applies_to


def _glob_applies_to(self, filename):
    if "*" in self.path or "%2A" in self.path or self.path in ("*", "%2A"):
        pattern = self.path.replace("%2A", "*")
        pattern = re.escape(pattern).replace("\\*", ".*")
        pattern = "^" + pattern
        if pattern.endswith("\\$"):
            pattern = pattern[:-2] + "$"
        try:
            return bool(re.match(pattern, filename))
        except re.error:
            return _original_applies_to(self, filename)
    return _original_applies_to(self, filename)


def _bind_glob_rules(parser: RobotFileParser) -> None:
    """Rebind applies_to on this parser's RuleLine instances only."""
    from types import MethodType

    entries = list(parser.entries)
    if parser.default_entry is not None:
        entries.append(parser.default_entry)
    for entry in entries:
        for rl in entry.rulelines:
            rl.applies_to = MethodType(_glob_applies_to, rl)


def _make_parser(rules_text: str) -> RobotFileParser | None:
    try:
        parser = RobotFileParser()
        parser.parse(rules_text.splitlines())
        _bind_glob_rules(parser)
        return parser
    except Exception:
        return None


def make_robots_udf(user_agent: str = "*"):
    """Build the allowed(rules_text, url) pandas UDF bound to a UA."""

    @pandas_udf(BooleanType())
    def udf(rules_text: pd.Series, url: pd.Series) -> pd.Series:
        cache: dict[str, RobotFileParser | None] = {}
        out = []
        for rules, u in zip(rules_text, url):
            if rules is None or not rules.strip():
                out.append(True)  # fail-open: no rules → allow
                continue
            parser = cache.get(rules)
            if parser is None and rules not in cache:
                parser = _make_parser(rules)
                cache[rules] = parser
            if parser is None:
                out.append(True)  # unparseable → allow
                continue
            try:
                out.append(bool(parser.can_fetch(user_agent, u or "")))
            except Exception:
                out.append(True)
        return pd.Series(out)

    return udf


udf_robots_allowed = make_robots_udf("*")


def attach_robots_verdict(
    wave: DataFrame,
    robots: DataFrame | None,
    user_agent: str = "*",
    now: Column | None = None,
    apply_ttl: bool = True,
) -> DataFrame:
    """Add a ``robots_allowed`` column to a wave DataFrame (host column
    required). Stale rules (older than the 7-day TTL) are treated as
    absent → fail-open allow (the reference re-fetches on staleness and
    allows on any fetch failure; with no live network, stale ≡ absent).

    The TTL check runs by default against ``current_timestamp()``; pass a
    ``now`` column to pin evaluation time, or ``apply_ttl=False`` to
    enforce rules regardless of age (explicit opt-out)."""
    if robots is None:
        return wave.withColumn("robots_allowed", F.lit(True))
    has_ts = "fetch_time" in robots.columns
    rules = robots.select("host", "rules_text", *(["fetch_time"] if has_ts else []))
    if apply_ttl and has_ts:
        now = now if now is not None else F.current_timestamp()
        rules = rules.withColumn(
            "rules_text",
            F.when(
                F.col("fetch_time") >= now - F.expr(f"INTERVAL {ROBOTS_TTL_DAYS} DAYS"),
                F.col("rules_text"),
            ),
        )
    joined = wave.join(F.broadcast(rules.select("host", "rules_text")), "host", "left")
    allowed = make_robots_udf(user_agent)(F.col("rules_text"), F.col("url"))
    return joined.withColumn("robots_allowed", allowed).drop("rules_text")
