"""The batch-iterated crawl loop — one Spark job per BFS wave.

Semantics ported from the reference's level-synchronous deep crawl
(``crawl4ai/deep_crawling/bfs_strategy.py:207-301`` batch BFS,
``:133-205`` link discovery with visited-set dedup, score threshold,
max_depth and max-pages capacity trim), re-expressed as the SURVEY.md §3.3
flagship loop:

    while pending:
        wave    = politeness_rank(pending)          # window per host
        gated   = robots(wave)                      # broadcast join + UDF
        fetched = gated ⋈ pages on url              # the "fetch"
        res     = extract(fetched)                  # Arrow UDFs
        links   = explode → canonical → first-wins  # discovery
        fresh   = links ▷ seen                      # bloom + exact anti-join
        commit(results, frontier_delta, bloom, host_state, metrics, lineage)

Intra-wave order is pinned by the deterministic total key
(score desc, depth asc, url asc) — the reference's intra-level order is
completion-order-dependent, so parity is defined on per-wave URL *sets*
plus this documented total order (SURVEY.md §4 item 5).

Scale posture: exactly 3 shuffles per wave on the links-only path —
(1) repartition(host) feeding the politeness window and every host-grouped
agg, (2) the discovery dedup/anti-join keyed on url_fp, (3) the bloom
shard build. The pages join is a join on url (co-partitioned with the
frontier's bucketing at cluster scale; AQE handles the local case).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crawl4ai_spark.functions.fingerprint import url_fingerprint
from crawl4ai_spark.functions.urlnorm import host_col
from crawl4ai_spark.extraction.udfs import udf_extract_links, udf_full_extract, lang_col
from crawl4ai_spark.operators.bloom import bloom_prefilter, build_bloom_shards
from crawl4ai_spark.operators.politeness import (
    dfs_order,
    fair_wave_order,
    flag_global_top_k,
    rank_by_host_budget,
    update_host_state,
    wave_order,
)
from crawl4ai_spark.operators.antibot import blocked_reason_col
from crawl4ai_spark.operators.robots import attach_robots_verdict
from crawl4ai_spark.frontier.store import WaveStore

VALID_URL_RE = r"^https?://[^/]*\.[^/]*"

_DEBUG_TIMING = bool(os.environ.get("SPARK_GRAFT_DEBUG_TIMING"))


def _tick(label: str, t_prev: float) -> float:
    now = time.time()
    if _DEBUG_TIMING:
        print(f"[wave-timing] {label}: {now - t_prev:.1f}s", flush=True)
    return now

FRONTIER_COLS = ["url", "url_fp", "host", "depth", "score", "parent_url", "enqueue_wave", "path_key"]


@dataclass
class CrawlConfig:
    max_depth: int = 3
    max_pages: int | None = None
    max_waves: int = 1000
    score_threshold: float | None = None
    default_budget: int = 1_000_000
    include_external: bool = True
    links_only: bool = True
    # content pipeline per fetched page (reference async_webcrawler.py
    # :783,825-877 default flow):
    #   "links"  — anchors only (cheap frontier expansion; the prefetch
    #              fast path)
    #   "full"   — raw html → markdown + head (content_source="raw_html")
    #   "scrape" — the reference DEFAULT: scraping battery → cleaned_html
    #              → markdown, plus media/tables and scored rich links
    #              (content_source="cleaned_html"); results rows carry
    #              the full CrawlResult surface (models.py:130-164)
    # None derives from links_only for backward compatibility.
    content_mode: str | None = None
    # kwargs for the scrape battery (excluded_tags, css_selector,
    # include_tables, ... — extraction.scrape.scrape_page options)
    scrape_options: dict = field(default_factory=dict)
    # attach fit_markdown (PruningContentFilter) to every result row, as
    # the reference does when a content filter is configured
    # (async_webcrawler.py:871-877); "full" mode filters raw html,
    # "scrape" mode filters cleaned_html
    fit_markdown: bool = False
    # crawl query: drives per-link contextual BM25 scores + the 0.7/0.3
    # total-score blend inside the scrape UDF (utils.py:3459-3504)
    query: str | None = None
    # best-first from the scrape battery's own link scores: discovered
    # URLs inherit coalesce(total_score, intrinsic_score) as priority
    # (requires content_mode="scrape"; reference link-preview-driven
    # best-first). Takes effect only when no explicit scorer is set.
    score_from_links: bool = False
    # fold each delta table's wave dirs into one sized snapshot when the
    # crawl finishes (WaveStore.compact + vacuum) — a 10^4-wave crawl
    # otherwise leaves 10^4 tiny parquet dirs per table. Post-loop only:
    # vacuum deletes files a live wave's lazy plans may still reference.
    # content-level anti-bot detection (operators/antibot.py, the
    # reference antibot_detector.is_blocked ladder): fetched pages that
    # are challenge shells / block pages / structurally-empty renders take
    # the throttled path — recorded, never extracted, requeued under the
    # host's RateLimiter backoff exactly like a 429 (the batch analogue of
    # the reference's detect → fallback-refetch flow)
    detect_blocked: bool = False
    compact_on_finish: bool = False
    # fold the in-loop-read delta tables (frontier_delta, results,
    # seen_bloom) into one snapshot every K committed waves. The per-wave
    # state reload unions snapshot + tail deltas, so without this a
    # 10^4-wave crawl pays O(N) dir listings per wave (O(N^2) total);
    # compact_every=K bounds the tail at K dirs. Compaction only — never
    # mid-crawl vacuum (external readers / streaming tails may still
    # reference folded wave dirs). Each fold rewrites snapshot+tail, so
    # cumulative rewrite bytes are O(N^2/K): right for deep-NARROW
    # crawls (small waves, many of them); leave None for wide crawls.
    compact_every: int | None = None
    use_bloom: bool = True
    n_bloom_shards: int = 16
    bloom_fpp: float = 0.01
    user_agent: str = "*"
    # hot-host salting: shards the per-host politeness rank into this many
    # salted partial top-ks before the exact rank (defuses 10^8-row hosts);
    # None/1 = plain rank (fine until a single host dwarfs a partition)
    salt_partitions: int | None = None
    # traversal strategy: "bfs" (level order) or "dfs" (preorder via
    # lexicographic path keys — exact DFS when the wave size is 1, a
    # parallel-DFS approximation otherwise; SURVEY §2.3)
    strategy: str = "bfs"
    # best-first mode: a compiled scorer (url Column -> score Column), e.g.
    # crawl4ai_spark.operators.scorers.composite_scorer(...); None = BFS
    # (constant score 1.0, pure depth order)
    scorer: object | None = None
    # anchor-context best-first: (url_col, text_col, title_col) -> score
    # Column (e.g. scorers.anchor_keyword_scorer). Takes precedence over
    # ``scorer``; drives priority from anchor text like the reference's
    # link intrinsic/total score (utils.py:3344-3504).
    text_scorer: object | None = None
    # starvation-free best-first: add this much effective score per wave a
    # URL waits in the frontier (reference fairness re-prioritization,
    # async_dispatcher.py:471-528). None = pure reference-parity order.
    fairness_boost: float | None = None
    # depth-band wave coalescing for deep-NARROW crawls: run up to this
    # many politeness waves ("steps") per committed store wave, so the
    # per-wave fixed overhead (checkpoint commit, bloom build, metrics,
    # lineage, state reload — ~2.5 s measured, BENCH/WAVE_OVERHEAD.md)
    # amortizes over the band. Each step is an EXACT politeness wave
    # (same per-host budget, same rank order, same max_pages cap, same
    # backoff ticking), so a depth_band=k crawl selects the identical
    # URL multiset as the unbanded crawl — only the store's wave
    # numbering coalesces (results/lineage/metrics label every step in a
    # band with the band's wave index; intra-band order remains fully
    # determined by the (score desc, depth asc, url asc) key + depth
    # column). max_waves counts STEPS, not commits — the same selection
    # budget as the unbanded loop — so the equality also holds when
    # max_waves truncates the crawl mid-frontier; resume restarts at a
    # band boundary with the consumed step count reloaded from the
    # committed markers. Steps keep their narrow work frames persisted
    # until the band commits, so size bands for narrow waves (the only
    # shape that needs them); 1/None = commit every wave (default).
    depth_band: int | None = None
    # memory-adaptive wave sizing (operators.dispatch
    # .MemoryAdaptiveGovernor) — the Spark analog of the reference's
    # MemoryAdaptiveDispatcher (async_dispatcher.py:148-208): between
    # waves the driver samples memory, waits out critical pressure, and
    # shrinks/regrows the next wave's global row cap. Unselected rows
    # stay pending, so the final URL-seen set is unchanged.
    memory_governor: object | None = None
    # link-graph authority prior for best-first crawling: a small
    # (host, prior) frame — e.g. graph.host_authority_prior over a
    # previous crawl's edges — broadcast-joined onto every discovered
    # candidate, adding ``host_prior_weight * prior`` to its score
    # BEFORE score_threshold (an authoritative host can rescue a URL the
    # base scorer alone would drop). Hosts are bounded (a registrable-
    # domain universe, not a URL universe), so the broadcast is the
    # right join shape at any corpus size; the OPIC/IRLbot family of
    # frontier prioritization re-expressed as one map-side join.
    host_prior: object | None = None
    host_prior_weight: float = 1.0
    extra: dict = field(default_factory=dict)


def _prepare_seeds(seeds: DataFrame, need_path_keys: bool = False) -> DataFrame:
    """Normalize a seeds(url[, priority]) frame into frontier schema.

    ``need_path_keys``: only the DFS strategy orders by path keys, and
    ranking every seed through an unpartitioned window serializes wave 0
    (a 10^6-seed bench start sorts the whole list in ONE task) — so the
    seed rank is computed only when DFS asks for it; BFS/best-first carry
    an empty root key (child keys still concatenate fine)."""
    df = seeds
    if "priority" not in df.columns:
        df = df.withColumn("priority", F.lit(1.0))
    df = (
        df.select(
            F.col("url"),
            url_fingerprint("url").alias("url_fp"),
            host_col(F.col("url")).alias("host"),
            F.lit(0).alias("depth"),
            F.col("priority").cast("double").alias("score"),
            F.lit(None).cast("string").alias("parent_url"),
            F.lit(0).alias("enqueue_wave"),
        )
        .where(F.col("url").rlike(VALID_URL_RE))
    )
    if need_path_keys:
        # DFS path key root: zero-padded rank of the seed in url order
        # (DFS is a small-scale correctness surface; the exact global rank
        # is acceptable there and never runs for BFS/best-first)
        seed_rank = F.row_number().over(Window.orderBy("url"))
        df = df.withColumn("path_key", F.lpad(seed_rank.cast("string"), 6, "0"))
    else:
        df = df.withColumn("path_key", F.lit(""))
    # dedup by fingerprint via hash agg (all columns derive from url)
    row = F.struct("url", "host", "depth", "score", "parent_url", "enqueue_wave", "path_key")
    return (
        df.groupBy("url_fp")
        .agg(F.min_by(row, F.col("url")).alias("r"))
        .select("url_fp", "r.*")
        .select(*FRONTIER_COLS)
    )


def _wave_work(fetched: DataFrame, mode: str, config: CrawlConfig) -> DataFrame:
    """ONE pass over the heavy ``html`` column → a narrow reusable frame.

    Everything downstream (results assembly, discovery, host outcomes) runs
    off this persisted narrow projection — the html bytes are decoded and
    parsed exactly once per wave, and the cached frame carries no payload.
    The extraction UDF tolerates the null html of non-fetched rows (returns
    empty structs), which are then masked to NULL.
    """
    is_fetched = F.col("status") == "fetched"
    html_in = F.when(is_fetched, F.col("html"))  # skip parsing denied/missing rows
    fit_col = F.lit(None).cast("string")
    if mode == "links":
        df = fetched.withColumn("links_raw", udf_extract_links(html_in, F.col("url")))
        extract_col = F.lit(None).cast("string").alias("extract")  # placeholder, pruned
        df = df.withColumn("extract", extract_col)
        if config.fit_markdown:
            # links mode has no cleaned_html; filter raw html like "full"
            from crawl4ai_spark.extraction.udfs import udf_fit_markdown

            fit_col = udf_fit_markdown(html_in)
    elif mode == "scrape":
        from crawl4ai_spark.extraction.udfs import make_scrape_udf

        misplaced = {"query", "fit", "fit_markdown"} & set(config.scrape_options)
        if misplaced:
            raise ValueError(
                f"scrape_options {sorted(misplaced)} belong on CrawlConfig "
                "itself (CrawlConfig.query / CrawlConfig.fit_markdown), not "
                "in scrape_options"
            )
        scrape = make_scrape_udf(
            query=config.query, fit=config.fit_markdown, **config.scrape_options
        )
        df = fetched.withColumn("extract_raw", scrape(html_in, F.col("url")))
        df = df.withColumn("links_raw", F.col("extract_raw.links")).withColumn(
            "extract", F.when(is_fetched, F.col("extract_raw"))
        )
        fit_col = F.col("extract.fit_markdown")
    else:
        df = fetched.withColumn("extract_raw", udf_full_extract(html_in, F.col("url")))
        df = df.withColumn("links_raw", F.col("extract_raw.links")).withColumn(
            "extract", F.when(is_fetched, F.col("extract_raw"))
        )
        if config.fit_markdown:
            from crawl4ai_spark.extraction.udfs import udf_fit_markdown

            fit_col = udf_fit_markdown(html_in)
    return df.select(
        *FRONTIER_COLS,
        "status",
        F.when(is_fetched, lang_col(F.col("html"))).alias("lang"),
        F.when(is_fetched, F.col("links_raw")).alias("links"),
        "extract",
        fit_col.alias("fit_markdown"),
    )


def _result_rows(work: DataFrame, wave: int, mode: str) -> DataFrame:
    """Assemble the results-table rows for one wave (stable schema: the
    CrawlResult surface of models.py:130-164 — modes that don't produce a
    column carry it as a typed NULL so every crawl's results table unions
    cleanly)."""
    from crawl4ai_spark.extraction.udfs import MEDIA_SCHEMA, RICH_LINKS_SCHEMA

    if mode == "links":
        extract_cols = [
            F.lit(None).cast("string").alias("title"),
            F.lit(None).cast("string").alias("raw_markdown"),
            F.lit(None).cast("string").alias("markdown_with_citations"),
            F.lit(None).cast("string").alias("references_markdown"),
        ]
    else:
        extract_cols = [
            F.col("extract.head.title").alias("title"),
            F.col("extract.markdown.raw_markdown").alias("raw_markdown"),
            F.col("extract.markdown.markdown_with_citations").alias("markdown_with_citations"),
            F.col("extract.markdown.references_markdown").alias("references_markdown"),
        ]
    if mode == "scrape":
        scrape_cols = [
            F.col("extract.cleaned_html").alias("cleaned_html"),
            F.col("extract.media").alias("media"),
            F.col("links").alias("links"),
            F.col("extract.success").alias("scrape_success"),
        ]
    else:
        scrape_cols = [
            F.lit(None).cast("string").alias("cleaned_html"),
            F.lit(None).cast(MEDIA_SCHEMA).alias("media"),
            F.lit(None).cast(RICH_LINKS_SCHEMA).alias("links"),
            F.lit(None).cast("boolean").alias("scrape_success"),
        ]
    return work.select(
        "url",
        "url_fp",
        "host",
        "depth",
        "score",
        "parent_url",
        F.lit(wave).alias("wave"),
        F.col("status"),
        F.col("lang"),
        F.coalesce(F.size("links.internal"), F.lit(0)).alias("n_internal_links"),
        F.coalesce(F.size("links.external"), F.lit(0)).alias("n_external_links"),
        *extract_cols,
        *scrape_cols,
        F.col("fit_markdown"),
    )


def _discover(
    extracted: DataFrame, wave: int, config: CrawlConfig, mode: str = "links"
) -> DataFrame:
    """Explode links of fetched pages into frontier-candidate rows with
    first-wins dedup inside the wave (order: parent score-order, then link
    position — the deterministic analog of the reference's
    discovery-insertion order)."""
    sides = [F.col("links.internal")]
    if config.include_external:
        sides.append(F.col("links.external"))
    all_links = F.concat(*sides) if len(sides) > 1 else sides[0]
    link_score_col = (
        F.coalesce(F.col("link.total_score"), F.col("link.intrinsic_score"), F.lit(1.0))
        if mode == "scrape"
        else F.lit(None).cast("double")
    )
    cand = (
        extracted.select(
            F.col("url").alias("parent_url"),
            F.col("depth").alias("parent_depth"),
            F.col("score").alias("parent_score"),
            F.col("path_key").alias("parent_path_key"),
            F.posexplode(all_links).alias("pos", "link"),
        )
        .select(
            F.col("link.href").alias("url"),
            F.col("link.text").alias("anchor_text"),
            F.col("link.title").alias("anchor_title"),
            link_score_col.alias("link_score"),
            F.col("parent_url"),
            (F.col("parent_depth") + 1).alias("depth"),
            F.col("parent_score"),
            F.col("pos"),
            F.concat_ws(".", F.col("parent_path_key"), F.lpad(F.col("pos").cast("string"), 4, "0")).alias("path_key"),
        )
        .where(F.col("url").rlike(VALID_URL_RE))
        .where(F.col("depth") <= config.max_depth)
    )
    cand = cand.withColumn("url_fp", url_fingerprint("url")).withColumn(
        "host", host_col(F.col("url"))
    )
    # BFS: constant score (pure depth order); best-first: compiled column
    # scorer evaluated JVM-side on the discovered URL — and, when a
    # text_scorer is set, on the anchor text/title too (the reference's
    # Link intrinsic/total score drives its priority queue from anchor
    # context, not just URL shape; utils.py:3344-3504)
    if config.text_scorer is not None:
        cand = cand.withColumn(
            "score",
            config.text_scorer(
                F.col("url"), F.col("anchor_text"), F.col("anchor_title")
            ),
        )
    elif config.scorer is not None:
        cand = cand.withColumn("score", config.scorer(F.col("url")))
    elif config.score_from_links and mode == "scrape":
        # best-first from the scrape battery's own link scoring (the
        # intrinsic/contextual total computed inside the UDF)
        cand = cand.withColumn("score", F.coalesce(F.col("link_score"), F.lit(1.0)))
    else:
        cand = cand.withColumn("score", F.lit(1.0))
    if config.host_prior is not None:
        prior = config.host_prior.select(
            F.col("host"), F.col("prior").cast("double").alias("_hp")
        )
        cand = (
            cand.join(F.broadcast(prior), "host", "left")
            .withColumn(
                "score",
                F.col("score")
                + F.lit(float(config.host_prior_weight))
                * F.coalesce(F.col("_hp"), F.lit(0.0)),
            )
            .drop("_hp")
        )
    if config.score_threshold is not None:
        cand = cand.where(F.col("score") >= config.score_threshold)
    # first-wins dedup as a hash aggregation (min_by with the lexicographic
    # discovery-order key) — map-side partial agg, no sort-based window; on
    # a 20M-link wave this is the difference between a hash shuffle and a
    # full sort
    if config.strategy == "dfs":
        # DFS first-discovery = smallest preorder path
        order_key = F.struct(F.col("path_key"))
    else:
        order_key = F.struct(
            F.col("depth"), (-F.col("parent_score")).alias("neg_ps"), F.col("parent_url"), F.col("pos")
        )
    row = F.struct("url", "host", "depth", "score", "parent_url", "path_key")
    return (
        cand.groupBy("url_fp")
        .agg(F.min_by(row, order_key).alias("r"))
        .select(
            F.col("r.url").alias("url"),
            "url_fp",
            F.col("r.host").alias("host"),
            F.col("r.depth").alias("depth"),
            F.col("r.score").alias("score"),
            F.col("r.parent_url").alias("parent_url"),
            F.lit(wave + 1).alias("enqueue_wave"),
            F.col("r.path_key").alias("path_key"),
        )
    )


def _anti_join_seen(
    fresh: DataFrame, seen_keys: DataFrame | None, shards: DataFrame | None, config: CrawlConfig
) -> DataFrame:
    """Drop already-enqueued URLs: bloom pre-filter (cuts shuffle volume)
    backed by the exact anti-join (correctness)."""
    if seen_keys is None:
        return fresh
    if config.use_bloom and shards is not None:
        tagged = bloom_prefilter(fresh, shards, config.n_bloom_shards)
        definite_new = tagged.where(~F.col("maybe_seen")).drop("maybe_seen", "shard_id")
        maybe = tagged.where(F.col("maybe_seen")).drop("maybe_seen", "shard_id")
        survivors = maybe.join(seen_keys, "url_fp", "left_anti")
        return definite_new.unionByName(survivors)
    return fresh.join(seen_keys, "url_fp", "left_anti")


def _banded_loop(
    spark: SparkSession,
    store: WaveStore,
    pool,
    config: CrawlConfig,
    mode: str,
    pages_slim: DataFrame,
    has_status: bool,
    robots: DataFrame | None,
    host_budgets: DataFrame | None,
    summary: dict,
    frontier_all: DataFrame,
    attempted_keys: DataFrame | None,
    host_state: DataFrame | None,
    shards: DataFrame | None,
    wave: int,
    total_attempted: int,
    seed_delta: DataFrame | None,
) -> tuple[int, int]:
    """Depth-band coalesced crawl loop (``CrawlConfig.depth_band`` > 1).

    The inner loop runs up to ``depth_band`` politeness waves ("steps")
    against lazily accumulated intra-band state — each step's narrow
    ``work`` frame and discovery delta stay persisted until the band
    commits — and the outer loop pays the per-wave fixed overhead
    (checkpoint commit, bloom build, metrics, lineage, state reload) ONCE
    per band. Every step applies the identical politeness rank / robots
    gate / max_pages cap / backoff tick as one unbanded wave, so a banded
    crawl selects the same URL multiset (tests/test_depth_band.py pins
    set equality); only the store's wave numbering coalesces. max_waves
    counts politeness STEPS — the same selection budget as the unbanded
    loop — so the multiset equality holds even when max_waves truncates
    the crawl mid-frontier (counting committed bands instead would hand a
    banded crawl depth_band× the budget; caught by the deep-crawl bench's
    seen-set assertion). On resume the consumed step count reloads from
    the committed markers' ``band_steps`` meta (1 per wave for waves
    committed by the unbanded loop)."""
    band_steps = int(config.depth_band)
    steps_done = 0
    for w in store.committed_waves():
        steps_done += int(store.marker(w).get("meta", {}).get("band_steps", 1))
    while steps_done < config.max_waves:
        t0 = time.time()
        step_works: list[DataFrame] = []   # persisted; union -> results
        step_fresh: list[DataFrame] = []   # persisted; union -> frontier delta
        step_aux: list[DataFrame] = []     # persisted intermediates (top-k input)
        step_counts: list[tuple[int, int]] = []  # (n_selected, n_throttled)
        hs_cur = host_state
        crawl_done = False
        for _step in range(min(band_steps, config.max_waves - steps_done)):
            pending = frontier_all.select(*FRONTIER_COLS)
            for fr in step_fresh:
                pending = pending.unionByName(fr.select(*FRONTIER_COLS))
            if attempted_keys is not None:
                pending = pending.join(attempted_keys, "url_fp", "left_anti")
            for wk in step_works:
                pending = pending.join(
                    wk.where(F.col("status") != "throttled").select("url_fp"),
                    "url_fp",
                    "left_anti",
                )
            band_attempted = sum(n - t for n, t in step_counts)
            remaining = None
            if config.max_pages is not None:
                remaining = config.max_pages - total_attempted - band_attempted
                if remaining <= 0:
                    crawl_done = True
                    break
            wave_limit = remaining
            if config.memory_governor is not None:
                pct = config.memory_governor.wait_if_critical(spark)
                cap = config.memory_governor.next_wave_cap(pct)
                wave_limit = cap if wave_limit is None else min(wave_limit, cap)
            if config.strategy == "dfs":
                order = dfs_order()
            elif config.fairness_boost is not None:
                order = fair_wave_order(wave, config.fairness_boost)
            else:
                order = None
            ranked = rank_by_host_budget(
                pending,
                host_budgets,
                config.default_budget,
                host_state=hs_cur,
                global_limit=wave_limit,
                order=order,
                salt_partitions=config.salt_partitions,
            )
            wave_sel = ranked.where(F.col("selected")).drop("selected")
            wave_sel = attach_robots_verdict(wave_sel, robots, config.user_agent)
            fetched = wave_sel.join(pages_slim, "url", "left")
            throttle_cond = (
                F.col("status_code").isin(429, 503) if has_status else F.lit(False)
            )
            if config.detect_blocked:
                throttle_cond = throttle_cond | blocked_reason_col(
                    F.col("status_code") if has_status else F.lit(None).cast("int"),
                    F.col("html"),
                ).isNotNull()
            fetched = fetched.withColumn(
                "status",
                F.when(~F.col("robots_allowed"), F.lit("robots_denied"))
                .when(F.col("html").isNull(), F.lit("missing"))
                .when(throttle_cond, F.lit("throttled"))
                .otherwise(F.lit("fetched")),
            )
            if has_status:
                fetched = fetched.drop("status_code")
            # localCheckpoint (eager), not persist: each step's plan embeds
            # the previous steps' pending/host-state plans, so without a
            # LOGICAL lineage cut the band's plan tree doubles per step
            # (measured: a 2 GiB plan string by wave ~10). The checkpoint
            # materializes the same narrow frame the unbanded loop persists
            # and replaces its plan with the stored blocks.
            work = _wave_work(fetched, mode, config).localCheckpoint()
            cnt = work.agg(
                F.count("*").alias("n"),
                F.sum(
                    F.when(F.col("status") == "throttled", 1).otherwise(0)
                ).alias("t"),
            ).collect()[0]
            n_sel, n_thr = int(cnt["n"]), int(cnt["t"] or 0)
            if n_sel == 0:
                # same terminal logic as the unbanded loop, on the
                # PRE-step host state: stop unless a host is cooling down
                # and rows remain pending (then the empty step still ticks
                # cooldowns below, like the unbanded empty-wave commit)
                cooling = (
                    hs_cur is not None
                    and hs_cur.where(F.col("cooldown_waves") > 0).limit(1).count() > 0
                )
                if not cooling or pending.limit(1).count() == 0:
                    work.unpersist()
                    crawl_done = True
                    break
            step_works.append(work)
            step_counts.append((n_sel, n_thr))
            steps_done += 1
            outcomes = work.groupBy("host").agg(
                F.sum(F.when(F.col("status") == "fetched", 1).otherwise(0)).alias("n_ok"),
                F.sum(F.when(F.col("status") == "throttled", 1).otherwise(0)).alias(
                    "n_throttled"
                ),
            )
            # the host-state chain is re-broadcast by every later step's
            # rank — checkpoint it too (tiny frame, one cheap job) so the
            # chain stays O(1) plan depth
            hs_cur = update_host_state(hs_cur, outcomes).localCheckpoint()
            fresh = _discover(work.where(F.col("status") == "fetched"), wave, config, mode)
            fresh = _anti_join_seen(fresh, frontier_all.select("url_fp"), shards, config)
            for fr in step_fresh:
                # the bloom shards cover only COMMITTED state — intra-band
                # discoveries dedup exactly against the band's own deltas
                # (tiny persisted frames, plain anti-joins)
                fresh = fresh.join(fr.select("url_fp"), "url_fp", "left_anti")
            if config.max_pages is not None:
                cand = fresh.localCheckpoint()
                step_aux.append(cand)
                fresh = (
                    flag_global_top_k(
                        cand, wave_order(), max(remaining, 0), n_rows=cand.count()
                    )
                    .where(F.col("_topk"))
                    .drop("_topk")
                )
            # eager checkpoint: later steps' pending must not replay (or
            # even re-plan) the discover chain
            fresh = fresh.localCheckpoint()
            step_fresh.append(fresh)

        n_selected = sum(n for n, _ in step_counts)
        n_throttled = sum(t for _, t in step_counts)
        if not step_works:
            # terminal before any step ran — nothing to commit
            break

        results = None
        for wk in step_works:
            r = _result_rows(wk, wave, mode)
            results = r if results is None else results.unionByName(r)
        frontier_delta = None
        for fr in step_fresh:
            frontier_delta = (
                fr if frontier_delta is None else frontier_delta.unionByName(fr)
            )
        if seed_delta is not None:
            frontier_delta = (
                seed_delta
                if frontier_delta is None
                else seed_delta.unionByName(frontier_delta)
            )
        if frontier_delta is None:
            frontier_delta = frontier_all.limit(0)

        f_results = pool.submit(store.write_table, "results", wave, results)
        f_host = pool.submit(store.write_table, "host_state", wave, hs_cur)
        frontier_written = store.write_table("frontier_delta", wave, frontier_delta)
        n_fresh = store.pending_count(wave, "frontier_delta")
        f_results.result()
        f_host.result()
        f_bloom = None
        if config.use_bloom:
            f_bloom = pool.submit(
                store.write_table,
                "seen_bloom",
                wave,
                build_bloom_shards(
                    frontier_written, config.n_bloom_shards, config.bloom_fpp
                ),
            )
        store.write_lineage(wave, "results")
        # band counts are already exact driver-side ints — one literal row
        metrics = spark.createDataFrame(
            [
                (
                    wave,
                    n_selected - n_throttled,
                    n_throttled,
                    n_fresh,
                    time.time() - t0,
                )
            ],
            "wave long, n_attempted long, n_throttled long, n_new_frontier long, wall_sec double",
        )
        store.write_table("metrics", wave, metrics)
        if f_bloom is not None:
            f_bloom.result()
        marker = store.commit(
            wave, meta={"config": str(config), "band_steps": len(step_counts)}
        )
        summary["waves"].append(
            marker["counts"] | {"wave": wave, "band_steps": len(step_counts)}
        )

        for wk in step_works:
            wk.unpersist()
        for fr in step_fresh:
            fr.unpersist()
        for aux in step_aux:
            aux.unpersist()
        if seed_delta is not None:
            seed_delta.unpersist()
            seed_delta = None

        total_attempted += n_selected - n_throttled
        wave += 1
        if crawl_done:
            break

        if config.compact_every and wave % config.compact_every == 0:
            committed_now = store.committed_waves()
            for t in ("frontier_delta", "results", "seen_bloom"):
                if any(store.marker(w)["counts"].get(t, 0) > 0 for w in committed_now):
                    store.compact(t)

        frontier_all = store.read_table("frontier_delta")
        results_all = store.read_table("results")
        attempted_keys = results_all.where(F.col("status") != "throttled").select("url_fp")
        host_state = store.read_latest("host_state")
        shards = store.read_table("seen_bloom") if config.use_bloom else None

    return wave, total_attempted


def run_crawl(
    spark: SparkSession,
    pages: DataFrame,
    seeds: DataFrame,
    store_dir: str,
    config: CrawlConfig | None = None,
    robots: DataFrame | None = None,
    host_budgets: DataFrame | None = None,
) -> dict:
    """Run (or resume) a crawl to completion. Returns a summary dict."""
    config = config or CrawlConfig()
    mode = config.content_mode or ("links" if config.links_only else "full")
    if mode not in ("links", "full", "scrape"):
        raise ValueError(f"unknown content_mode {mode!r}")
    if config.score_from_links and mode != "scrape":
        # only the scrape battery computes per-link scores; silently
        # degrading best-first to constant-score order would be a trap
        raise ValueError(
            "CrawlConfig.score_from_links requires content_mode='scrape' "
            f"(got {mode!r})"
        )
    store = WaveStore(spark, store_dir)
    store.recover()  # drop stale staging dirs from a killed run
    # optional status_code column drives the throttle path (429/503 →
    # backoff; absent → every present page fetches)
    has_status = "status_code" in pages.columns
    if has_status:
        pages_slim = pages.select("url", "html", "status_code")
    else:
        pages_slim = pages.select("url", "html")

    last = store.last_wave()
    if last is None:
        # persisted: wave 0 reuses the seed frontier three times (politeness
        # pending, seen anti-join, frontier_delta union)
        seeds_frontier = _prepare_seeds(seeds, need_path_keys=(config.strategy == "dfs")).persist()
        frontier_all = seeds_frontier
        attempted_keys = None  # throttled rows never enter this set
        host_state = None
        shards = None
        wave = 0
        total_attempted = 0
        seed_delta = seeds_frontier  # committed with wave 0
        frontier_total = None  # unknown until the first footer count lands
    else:
        frontier_all = store.read_table("frontier_delta")
        results_all = store.read_table("results")
        attempted = (
            results_all.where(F.col("status") != "throttled")
            if results_all is not None
            else None
        )
        attempted_keys = attempted.select("url_fp") if attempted is not None else None
        host_state = store.read_latest("host_state")
        shards = store.read_table("seen_bloom") if config.use_bloom else None
        wave = last + 1
        committed = store.committed_waves()
        scalars = (
            [store.read_scalar("metrics", w, "n_attempted") for w in committed]
            if all("metrics" in store.marker(w)["tables"] for w in committed)
            else [None]
        )
        if any(s is None for s in scalars):
            # a wave's metrics dir is gone (compacted+vacuumed store) or a
            # wave predates the metrics table — recount, never assume 0
            total_attempted = attempted.count() if attempted is not None else 0
        else:
            # per-wave n_attempted scalars from the metrics deltas —
            # driver-side pyarrow reads, no Spark job on resume
            total_attempted = sum(int(s) for s in scalars)
        seed_delta = None
        frontier_total = sum(
            store.marker(w)["counts"].get("frontier_delta", 0) for w in committed
        )

    summary = {"waves": [], "resumed_from": last}

    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=2, thread_name_prefix="wave-writer")
    if (config.depth_band or 1) > 1:
        try:
            wave, total_attempted = _banded_loop(
                spark, store, pool, config, mode, pages_slim, has_status,
                robots, host_budgets, summary,
                frontier_all, attempted_keys, host_state, shards,
                wave, total_attempted, seed_delta,
            )
        finally:
            pool.shutdown(wait=True)
        return _finish_summary(store, config, summary, total_attempted, wave)
    try:
        while wave < config.max_waves:
            t0 = time.time()
            pending = frontier_all.select(*FRONTIER_COLS)
            if attempted_keys is not None:
                pending = pending.join(attempted_keys, "url_fp", "left_anti")

            remaining = None
            if config.max_pages is not None:
                remaining = config.max_pages - total_attempted
                if remaining <= 0:
                    break

            # memory-adaptive wave sizing: wait out critical pressure,
            # then cap this wave's global selection. A capped wave never
            # drops URLs (unselected rows stay pending), so only the wave
            # schedule changes, not the crawl's final URL-seen set.
            wave_limit = remaining
            if config.memory_governor is not None:
                pct = config.memory_governor.wait_if_critical(spark)
                cap = config.memory_governor.next_wave_cap(pct)
                wave_limit = cap if wave_limit is None else min(wave_limit, cap)

            if config.strategy == "dfs":
                order = dfs_order()
            elif config.fairness_boost is not None:
                order = fair_wave_order(wave, config.fairness_boost)
            else:
                order = None
            ranked = rank_by_host_budget(
                pending,
                host_budgets,
                config.default_budget,
                host_state=host_state,
                global_limit=wave_limit,
                order=order,
                salt_partitions=config.salt_partitions,
                # |pending| from accumulated footer counts (attempted ⊆
                # frontier, both unique by url_fp) — lets the global cap elide
                # its windows entirely once pending fits the remaining budget
                pending_hint=(
                    frontier_total - total_attempted if frontier_total is not None else None
                ),
            )
            wave_sel = ranked.where(F.col("selected")).drop("selected")
            wave_sel = attach_robots_verdict(wave_sel, robots, config.user_agent)
            fetched = wave_sel.join(pages_slim, "url", "left")
            throttle_cond = (
                F.col("status_code").isin(429, 503)
                if has_status
                else F.lit(False)
            )
            if config.detect_blocked:
                throttle_cond = throttle_cond | blocked_reason_col(
                    F.col("status_code") if has_status else F.lit(None).cast("int"),
                    F.col("html"),
                ).isNotNull()
            fetched = fetched.withColumn(
                "status",
                F.when(~F.col("robots_allowed"), F.lit("robots_denied"))
                .when(F.col("html").isNull(), F.lit("missing"))
                .when(throttle_cond, F.lit("throttled"))
                .otherwise(F.lit("fetched")),
            )
            if has_status:
                fetched = fetched.drop("status_code")
            # one pass over html, then everything runs off this narrow cache
            work = _wave_work(fetched, mode, config).persist()

            t_phase = time.time()
            results = _result_rows(work, wave, mode)
            outcomes = (
                work.groupBy("host")
                .agg(
                    F.sum(F.when(F.col("status") == "fetched", 1).otherwise(0)).alias("n_ok"),
                    # 429/503-equivalents from the pages table's status_code
                    # column (0 everywhere when the column is absent) — drives
                    # the RateLimiter backoff state machine per wave
                    F.sum(F.when(F.col("status") == "throttled", 1).otherwise(0)).alias("n_throttled"),
                )
            )
            # results and host_state depend only on the persisted `work`
            # frame and on nothing downstream — submit their write jobs from
            # driver threads so they overlap the discover+frontier job: the
            # wave's fixed cost is max(), not sum(), of the three (first
            # touch of a `work` block is serialized by BlockManager's
            # per-block locks, so the cache is still computed once)
            f_results = pool.submit(store.write_table, "results", wave, results)
            f_host = pool.submit(
                store.write_table, "host_state", wave, update_host_state(host_state, outcomes)
            )

            fresh = _discover(work.where(F.col("status") == "fetched"), wave, config, mode)
            fresh = _anti_join_seen(fresh, frontier_all.select("url_fp"), shards, config)

            fresh_cached = None
            if config.max_pages is not None:
                # tiered global top-k (see flag_global_top_k): the narrow
                # discovery frame is persisted so the elision count and the
                # frontier write share one computation of discover+anti-join
                fresh_cached = fresh.persist()
                fresh = flag_global_top_k(
                    fresh_cached,
                    wave_order(),
                    max(config.max_pages - total_attempted, 0),
                    n_rows=fresh_cached.count(),
                )
                fresh = fresh.where(F.col("_topk")).drop("_topk")

            frontier_delta = fresh if seed_delta is None else seed_delta.unionByName(fresh)
            frontier_written = store.write_table("frontier_delta", wave, frontier_delta)
            n_fresh = store.pending_count(wave, "frontier_delta")
            f_results.result()
            host_state_written = f_host.result()
            n_selected = store.pending_count(wave, "results")
            t_phase = _tick("results+frontier+host_state (3 concurrent jobs)", t_phase)
            if n_selected == 0:
                # An empty wave can mean "done" OR "every pending host is in
                # backoff cooldown" — only stop when no host is cooling down
                # (cooldown_waves == -1 retired hosts never come back, so a
                # frontier of only-retired hosts is terminal, matching the
                # reference's give-up-after-max_retries). Otherwise fall
                # through and commit the empty wave so cooldowns tick down.
                # (The empty wave's discover ran above — over zero fetched
                # rows — and its staged, uncommitted dirs are reclaimed by
                # the next run's recover().)
                cooling = (
                    host_state is not None
                    and host_state.where(F.col("cooldown_waves") > 0).limit(1).count() > 0
                )
                if not cooling or pending.limit(1).count() == 0:
                    work.unpersist()
                    if fresh_cached is not None:
                        fresh_cached.unpersist()
                    break

            # bloom shards depend only on the already-written frontier
            # bytes — submit the build+write from the pool so it overlaps
            # the (driver-side) lineage footer pass AND the metrics job
            # below; both tails were pure serial overhead per wave
            f_bloom = None
            if config.use_bloom:
                f_bloom = pool.submit(
                    store.write_table,
                    "seen_bloom",
                    wave,
                    build_bloom_shards(frontier_written, config.n_bloom_shards, config.bloom_fpp),
                )
            # lineage derives from the already-written parquet footers,
            # driver-side (store.write_lineage) — zero Spark jobs
            store.write_lineage(wave, "results")
            t_phase = _tick("lineage", t_phase)
            # throttle count folded into the metrics job: summed from the
            # already-written host_state bytes (the per-wave results-table
            # count() job this replaces was pure overhead), then read back
            # driver-side from the single-row metrics parquet — no extra job
            metrics = host_state_written.agg(
                F.coalesce(F.sum("wave_throttled"), F.lit(0)).alias("n_throttled")
            ).select(
                F.lit(wave).cast("long").alias("wave"),
                (F.lit(n_selected) - F.col("n_throttled")).alias("n_attempted"),
                F.col("n_throttled"),
                F.lit(n_fresh).cast("long").alias("n_new_frontier"),
                F.lit(time.time() - t0).alias("wall_sec"),
            )
            store.write_table("metrics", wave, metrics)
            if f_bloom is not None:
                f_bloom.result()
                t_phase = _tick("bloom+metrics (overlapped)", t_phase)
            # throttled rows are recorded but NOT attempted: they stay pending
            # (retried after the host cooldown) and don't burn max_pages
            n_throttled_rows = (
                int(store.read_scalar("metrics", wave, "n_throttled") or 0)
                if has_status
                else 0
            )
            marker = store.commit(wave, meta={"config": str(config)})
            summary["waves"].append(marker["counts"] | {"wave": wave})

            work.unpersist()
            if fresh_cached is not None:
                fresh_cached.unpersist()
            if seed_delta is not None:
                seed_delta.unpersist()

            # periodic fold of the in-loop-read delta tables so the state
            # reload below stays O(compact_every) dirs instead of O(waves)
            # (see CrawlConfig.compact_every; safe here: every live frame
            # is re-derived from store reads right after, and folded wave
            # dirs are left on disk — no mid-crawl vacuum)
            if config.compact_every and (wave + 1) % config.compact_every == 0:
                committed_now = store.committed_waves()
                for t in ("frontier_delta", "results", "seen_bloom"):
                    if any(store.marker(w)["counts"].get(t, 0) > 0 for w in committed_now):
                        store.compact(t)

            # reload state from committed storage (cheap: metadata-only plans)
            frontier_all = store.read_table("frontier_delta")
            results_all = store.read_table("results")
            attempted_keys = results_all.where(F.col("status") != "throttled").select("url_fp")
            host_state = store.read_latest("host_state")
            shards = store.read_table("seen_bloom") if config.use_bloom else None
            total_attempted += n_selected - n_throttled_rows
            frontier_total = (frontier_total or 0) + n_fresh
            wave += 1
            seed_delta = None

    finally:
        # always drain the writer threads — an exception raised between
        # submit and result must not leave write jobs running against a
        # session the caller is about to stop
        pool.shutdown(wait=True)
    return _finish_summary(store, config, summary, total_attempted, wave)


def _finish_summary(
    store: WaveStore, config: CrawlConfig, summary: dict, total_attempted: int, wave: int
) -> dict:
    summary["total_attempted"] = total_attempted
    summary["final_wave"] = wave - 1
    if config.compact_on_finish:
        compacted: dict[str, int] = {}
        committed_now = store.committed_waves()
        # delta-style tables only — host_state is snapshot-style (its
        # per-wave dirs ARE the history read_latest walks). Existence
        # check from the commit markers (driver-side, no Spark reader
        # construction per table).
        for t in ("results", "frontier_delta", "seen_bloom", "metrics", "lineage"):
            if any(store.marker(w)["counts"].get(t, 0) > 0 for w in committed_now):
                m = store.compact(t)
                store.vacuum(t)
                compacted[t] = m["rows"]
        summary["compacted"] = compacted
    return summary
