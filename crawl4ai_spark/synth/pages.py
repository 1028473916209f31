"""Deterministic synthetic Common-Crawl-style corpus (seed-stable).

Site shape mirrors the reference's dummy-site builder
(``crawl4ai/tests/general/generate_dummy_site.py:9-13``): per host,
``cats`` categories × ``subs`` subcategories × ``prods`` products, with
breadcrumbs — a link graph whose BFS levels are known by construction
(home=0, category=1, subcategory=2, product=3).

Each page is generated **markdown-first**: the body is a list of
(markdown_block, html_block) pairs rendered from the same AST, so the
golden ``text`` column is exact by construction and the converter's
round-trip (HTML → markdown == golden) is a byte-level invariant, not an
approximation.

Adversarial link cases baked in (modeled on the reference's unit tests,
``crawl4ai/utils.py:2288-2291`` tracking params, fragment/mailto/js links,
first-wins duplicate dedup, cross-host externals, ``<base href>`` pages):
every home page carries tracking-param, fragment-dup, mailto, javascript
and duplicate links that must all collapse/skip in the frontier.

Tables produced: pages(url, warc_ts, html, text, lang), seeds(url,
priority), robots(host, rules_text, fetch_time), host_budgets(host,
budget), link_graph(url, depth, parent_url) oracle.
"""

from __future__ import annotations

import datetime as dt
import html as html_mod
import random

_WORDS = (
    "spark frontier crawl wave page link host budget robots queue score "
    "depth parquet shuffle partition bloom filter anchor corpus token "
    "markdown extract canonical dedup batch vector arrow schema table"
).split()

_LANGS = ("en", "de", "fr", "es", "it", "nl", "pt", "sv")

EPOCH = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


class _PageBuilder:
    """Accumulates HTML blocks; the golden ``text`` column is produced by
    running the engine's own reference-parity converter over the final
    document (the converter itself is byte-parity-tested against the
    reference's vendored html2text in tests/test_markdown_parity.py, so
    ``text`` is exactly what the reference pipeline would extract)."""

    def __init__(self) -> None:
        self.html: list[str] = []

    def heading(self, level: int, text: str) -> None:
        self.html.append(f"<h{level}>{html_mod.escape(text)}</h{level}>")

    def para(self, text: str) -> None:
        self.html.append(f"<p>{html_mod.escape(text)}</p>")

    def para_with_links(self, prefix: str, links: list[tuple[str, str]]) -> None:
        """links: list of (anchor_text, href)."""
        html_parts = [html_mod.escape(prefix)] if prefix else []
        for text, href in links:
            html_parts.append(f'<a href="{html_mod.escape(href, quote=True)}">{html_mod.escape(text)}</a>')
        self.html.append("<p>" + " ".join(html_parts) + "</p>")

    def bullet_links(self, links: list[tuple[str, str]]) -> None:
        self.html.append(
            "<ul>"
            + "".join(
                f'<li><a href="{html_mod.escape(h, quote=True)}">{html_mod.escape(t)}</a></li>'
                for t, h in links
            )
            + "</ul>"
        )

    def image(self, src: str, alt: str, width: int, height: int, srcset: str = "") -> None:
        extra = f' srcset="{html_mod.escape(srcset, quote=True)}"' if srcset else ""
        self.html.append(
            f'<img src="{html_mod.escape(src, quote=True)}" width="{width}" '
            f'height="{height}" alt="{html_mod.escape(alt, quote=True)}"{extra}>'
        )

    def video(self, src: str) -> None:
        self.html.append(f'<video src="{html_mod.escape(src, quote=True)}"></video>')

    def code(self, language: str, body: str) -> None:
        self.html.append(
            f'<pre data-language="{language}">{html_mod.escape(body)}</pre>'
        )

    def quote(self, text: str) -> None:
        self.html.append(f"<blockquote><p>{html_mod.escape(text)}</p></blockquote>")

    def table(self, header: list[str], rows: list[list[str]]) -> None:
        h = ["<table><thead><tr>"]
        h += [f"<th>{html_mod.escape(c)}</th>" for c in header]
        h.append("</tr></thead><tbody>")
        for r in rows:
            h.append("<tr>" + "".join(f"<td>{html_mod.escape(c)}</td>" for c in r) + "</tr>")
        h.append("</tbody></table>")
        self.html.append("".join(h))

    def raw_links_html(self, links: list[tuple[str, str]]) -> None:
        """HTML-only anchor soup (tracking/fragment/mailto/js/dup cases)
        the frontier must canonicalize/skip."""
        self.para_with_links("", links)

    def render(self, url: str, title: str, lang: str, description: str) -> tuple[str, str]:
        from crawl4ai_spark.extraction.h2t import convert_to_markdown

        body = "".join(self.html)
        doc = (
            f'<html lang="{lang}"><head><meta charset="utf-8">'
            f"<title>{html_mod.escape(title)}</title>"
            f'<meta name="description" content="{html_mod.escape(description, quote=True)}">'
            f'<meta property="og:title" content="{html_mod.escape(title, quote=True)}">'
            f"</head><body>{body}</body></html>"
        )
        return doc, convert_to_markdown(doc, url)


def _host_name(i: int) -> str:
    return f"site{i}.com"


def generate_site(
    n_hosts: int = 3,
    cats: int = 3,
    subs: int = 2,
    prods: int = 5,
    hot_host: int = 0,
    hot_factor: int = 1,
    seed: int = 42,
) -> dict:
    """Build the synthetic web. ``hot_factor`` multiplies category count on
    the hot host to create frontier skew (FIXTURES.md §4)."""
    rng = random.Random(seed)
    pages: list[dict] = []
    edges: list[tuple[str, str]] = []  # (parent_url, child_url) canonical

    def add_page(url: str, depth_hint: int, build) -> None:
        builder = _PageBuilder()
        lang = _LANGS[rng.randrange(len(_LANGS))]
        title, description, links = build(builder)
        doc, text = builder.render(url, title, lang, description)
        pages.append(
            {
                "url": url,
                "warc_ts": EPOCH + dt.timedelta(minutes=len(pages)),
                "html": doc.encode("utf-8"),
                "text": text,
                "lang": lang,
            }
        )
        for child in links:
            edges.append((url, child))

    for h in range(n_hosts):
        host = _host_name(h)
        origin = f"http://{host}"
        n_cats = cats * (hot_factor if h == hot_host else 1)

        def build_home(b, host=host, origin=origin, n_cats=n_cats, h=h):
            title = f"{host} home"
            cat_links = [(f"category {c}", f"/cat{c}/") for c in range(n_cats)]
            b.heading(1, title)
            b.para(_sentence(rng, 12))
            b.bullet_links(cat_links)
            # adversarial anchors: tracking params (collapse to clean),
            # fragment dup (collapses to home), mailto/js (skipped),
            # duplicate (first-wins), external cross-host link
            other = _host_name((h + 1) % n_hosts)
            b.raw_links_html(
                [
                    ("tracked", f"/cat0/?utm_source=x&utm_campaign=y"),
                    ("fragment", "/#section"),
                    ("mail", "mailto:a@b.com"),
                    ("js", "javascript:void(0)"),
                    ("dup", f"/cat0/"),
                    ("partner", f"http://{other}/"),
                ]
            )
            b.quote(_sentence(rng, 8))
            children = [f"{origin}/cat{c}/" for c in range(n_cats)]
            children.append(f"{origin}/")  # fragment link → home itself
            children.append(f"http://{other}/")
            return title, _sentence(rng, 10), children

        add_page(f"{origin}/", 0, build_home)

        for c in range(n_cats):
            cat_url = f"{origin}/cat{c}/"

            def build_cat(b, c=c, origin=origin, host=host):
                title = f"{host} category {c}"
                b.heading(1, title)
                b.para(_sentence(rng, 10))
                sub_links = [(f"subcategory {s}", f"sub{s}/") for s in range(subs)]
                b.bullet_links(sub_links)
                b.para_with_links("back to", [("home", "/")])
                children = [f"{origin}/cat{c}/sub{s}/" for s in range(subs)]
                children.append(f"{origin}/")
                return title, _sentence(rng, 8), children

            add_page(cat_url, 1, build_cat)

            for s in range(subs):
                sub_url = f"{origin}/cat{c}/sub{s}/"

                def build_sub(b, c=c, s=s, origin=origin, host=host):
                    title = f"{host} cat {c} sub {s}"
                    b.heading(2, title)
                    b.para(_sentence(rng, 10))
                    prod_links = [(f"product {p}", f"prod{p}.html") for p in range(prods)]
                    b.bullet_links(prod_links)
                    b.table(
                        ["sku", "price"],
                        [[f"sku-{c}{s}{p}", str(10 + p)] for p in range(min(prods, 3))],
                    )
                    children = [f"{origin}/cat{c}/sub{s}/prod{p}.html" for p in range(prods)]
                    return title, _sentence(rng, 8), children

                add_page(sub_url, 2, build_sub)

                for p in range(prods):
                    prod_url = f"{origin}/cat{c}/sub{s}/prod{p}.html"

                    def build_prod(b, c=c, s=s, p=p, origin=origin, host=host):
                        title = f"product {p} of cat {c} sub {s}"
                        b.heading(2, title)
                        b.para(_sentence(rng, 16))
                        # deterministic media: even products carry a large
                        # scored image (width/height > 150, alt, srcset ->
                        # clears IMAGE_SCORE_THRESHOLD), odd ones a small
                        # unscored thumbnail; product 0 adds a video
                        if p % 2 == 0:
                            b.image(
                                f"/media/prod{c}{s}{p}.jpg", f"photo of product {p}",
                                200 + 10 * p, 180,
                                srcset=f"/media/prod{c}{s}{p}-2x.jpg 2x",
                            )
                        else:
                            b.image(f"/media/thumb{c}{s}{p}.gif", "", 40, 40)
                        if p == 0:
                            b.video(f"/media/clip{c}{s}.mp4")
                        b.code("python", f"sku = 'sku-{c}{s}{p}'\nprice = {10 + p}")
                        b.para_with_links(
                            "breadcrumbs:",
                            [("home", "/"), (f"cat {c}", f"/cat{c}/"), (f"sub {s}", f"/cat{c}/sub{s}/")],
                        )
                        children = [f"{origin}/", f"{origin}/cat{c}/", f"{origin}/cat{c}/sub{s}/"]
                        return title, _sentence(rng, 8), children

                    add_page(prod_url, 3, build_prod)

    # link-graph oracle: BFS depths over canonical edges from the seed set
    seeds = [f"http://{_host_name(h)}/" for h in range(n_hosts)]
    adj: dict[str, list[str]] = {}
    for parent, child in edges:
        adj.setdefault(parent, []).append(child)
    depth: dict[str, int] = {}
    parent_of: dict[str, str | None] = {}
    level = list(dict.fromkeys(seeds))
    for u in level:
        depth[u] = 0
        parent_of[u] = None
    d = 0
    while level:
        nxt: list[str] = []
        for u in level:
            for v in adj.get(u, []):
                if v not in depth:
                    depth[v] = d + 1
                    parent_of[v] = u
                    nxt.append(v)
        level = list(dict.fromkeys(nxt))
        d += 1

    link_graph = [
        {"url": u, "depth": depth[u], "parent_url": parent_of[u]} for u in depth
    ]

    robots = [
        # host 0: disallow the /cat1/ subtree for all agents
        # fetch_time is stamped "now": the crawl loop applies the 7-day
        # robots TTL by default, and rules must be fresh to be enforced
        {
            "host": _host_name(0),
            "rules_text": "User-agent: *\nDisallow: /cat1/\n",
            "fetch_time": dt.datetime.now(dt.timezone.utc),
        },
        # host 1: allow everything explicitly
        {
            "host": _host_name(1),
            "rules_text": "User-agent: *\nAllow: /\n",
            "fetch_time": dt.datetime.now(dt.timezone.utc),
        },
        # other hosts: no robots row → fail-open allow
    ]

    host_budgets = [
        {"host": _host_name(h), "budget": 4 if h == hot_host else 100}
        for h in range(n_hosts)
    ]

    return {
        "pages": pages,
        "seeds": [{"url": u, "priority": 1.0} for u in seeds],
        "robots": robots,
        "host_budgets": host_budgets,
        "link_graph": link_graph,
        "edges": edges,
    }


def write_site_parquet(site: dict, out_dir: str) -> None:
    """Write the fixture tables as parquet via pyarrow (Spark-free)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write(name: str, rows: list[dict], schema: pa.Schema) -> None:
        cols = {f.name: [r.get(f.name) for r in rows] for f in schema}
        pq.write_table(pa.table(cols, schema=schema), os.path.join(out_dir, f"{name}.parquet"))

    write(
        "pages",
        site["pages"],
        pa.schema(
            [
                ("url", pa.string()),
                ("warc_ts", pa.timestamp("us", tz="UTC")),
                ("html", pa.binary()),
                ("text", pa.string()),
                ("lang", pa.string()),
            ]
        ),
    )
    write("seeds", site["seeds"], pa.schema([("url", pa.string()), ("priority", pa.float64())]))
    write(
        "robots",
        site["robots"],
        pa.schema(
            [
                ("host", pa.string()),
                ("rules_text", pa.string()),
                ("fetch_time", pa.timestamp("us", tz="UTC")),
            ]
        ),
    )
    write(
        "host_budgets",
        site["host_budgets"],
        pa.schema([("host", pa.string()), ("budget", pa.int32())]),
    )
    write(
        "link_graph",
        site["link_graph"],
        pa.schema([("url", pa.string()), ("depth", pa.int32()), ("parent_url", pa.string())]),
    )
