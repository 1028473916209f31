"""Anti-bot block detection over crawl results — the batch half of the
reference's anti-bot surface.

Re-specifies ``crawl4ai/antibot_detector.py`` (`is_blocked`, :120-281):
given (status_code, html) decide whether the response is an anti-bot
block page and why. The reference's OTHER anti-bot halves (live browser
stealth, proxy rotation, Web-Unlocker fallback fetch) need a network and
stay out of scope; detection is pure content analysis and belongs in the
engine — at corpus scale it is the filter that keeps interstitials and
challenge shells out of training data, and in the crawl loop its output
is a requeue/fallback signal exactly like a 429.

Decision ladder (same precedence as the reference, detector philosophy
"false positives are cheap, false negatives are catastrophic"):

1. HTTP 429 → rate limited, always blocked.
2. Tier 1 vendor signatures (Akamai/Cloudflare/PerimeterX/DataDome/
   Incapsula/Sucuri/Kasada/... — structural markers that never occur in
   real content) on the first 15 KB; pages larger than that get a deep
   re-check with <script>/<style> blocks stripped (modern block pages
   bury the marker under 100 KB+ of inline CSS/JS).
3. HTTP 403/503 with non-data HTML is always a block: near-empty →
   flagged as such; otherwise tier-2 generic phrases on the (stripped,
   for large pages) snippet; otherwise flagged generically.
4. Other 4xx/5xx on short pages (<10 KB): tier-2 phrases.
5. HTTP 200 with near-empty non-data content (JS-blocked render).
6. Structural integrity (<50 KB, non-data): no <body>; two of
   {minimal visible text, no semantic content elements, script-heavy
   shell}; or one signal on a <5 KB page.

Spark-first: the whole ladder compiles to ONE whole-stage-codegen
projection — substring/regexp_replace/regexp_count/rlike column algebra,
no Python, no UDF, no shuffle. Reasons are built with concat to match
the reference byte-for-byte (pinned by tests/test_antibot.py, which
loads the reference module itself as the oracle over a branch-covering
fixture corpus).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tier 1: high-confidence vendor signatures (any page size). Java regex,
# (?i) mirrors the reference's re.IGNORECASE; ordered — first match wins.
TIER1_PATTERNS: list[tuple[str, str]] = [
    (r"(?i)Reference\s*#\s*[\d]+\.[0-9a-f]+\.\d+\.[0-9a-f]+", "Akamai block (Reference #)"),
    (r"(?i)Pardon\s+Our\s+Interruption", "Akamai challenge (Pardon Our Interruption)"),
    (r"(?is)challenge-form.*?__cf_chl_f_tk=", "Cloudflare challenge form"),
    (r'(?i)<span\s+class="cf-error-code">\d{4}</span>', "Cloudflare firewall block"),
    (r"(?i)/cdn-cgi/challenge-platform/\S+orchestrate", "Cloudflare JS challenge"),
    (r"(?i)window\._pxAppId\s*=", "PerimeterX block"),
    (r"(?i)captcha\.px-cdn\.net", "PerimeterX captcha"),
    (r"(?i)captcha-delivery\.com", "DataDome captcha"),
    (r"(?i)_Incapsula_Resource", "Imperva/Incapsula block"),
    (r"(?i)Incapsula\s+incident\s+ID", "Imperva/Incapsula incident"),
    (r"(?i)Sucuri\s+WebSite\s+Firewall", "Sucuri firewall block"),
    (r"(?i)KPSDK\.scriptStart\s*=\s*KPSDK\.now\(\)", "Kasada challenge"),
    (r"(?i)blocked\s+by\s+network\s+security", "Network security block"),
]

# Tier 2: generic phrases that occur in real articles too — only trusted
# on short pages or alongside an error status.
TIER2_PATTERNS: list[tuple[str, str]] = [
    (r"(?i)Access\s+Denied", "Access Denied on short page"),
    (r"(?i)Checking\s+your\s+browser", "Cloudflare browser check"),
    (r"(?i)<title>\s*Just\s+a\s+moment", "Cloudflare interstitial"),
    ("(?i)class=[\"']g-recaptcha[\"']", "reCAPTCHA on block page"),
    ("(?i)class=[\"']h-captcha[\"']", "hCaptcha on block page"),
    (r"(?i)Access\s+to\s+This\s+Page\s+Has\s+Been\s+Blocked", "PerimeterX block page"),
    (r"(?i)blocked\s+by\s+security", "Blocked by security"),
    (r"(?i)Request\s+unsuccessful", "Request unsuccessful (Imperva)"),
]

TIER2_MAX_SIZE = 10_000
STRUCTURAL_MAX_SIZE = 50_000
BLOCK_PAGE_MAX_SIZE = 5_000
EMPTY_CONTENT_THRESHOLD = 100

_SCRIPT_BLOCK = r"(?i)<script\b[\s\S]*?</script>"
_STYLE_BLOCK = r"(?i)<style\b[\s\S]*?</style>"
_CONTENT_ELEMENTS = r"(?i)<(?:p|h[1-6]|article|section|li|td|a|pre)\b"


def _strip_blocks(c: Column) -> Column:
    """Remove <script>…</script> then <style>…</style> blocks (the
    reference's strip order)."""
    return F.regexp_replace(F.regexp_replace(c, F.lit(_SCRIPT_BLOCK), F.lit("")), F.lit(_STYLE_BLOCK), F.lit(""))


def _first_match(snippet: Column, patterns: list[tuple[str, str]], suffix: Column | None = None) -> Column:
    """Ordered first-match-wins over the pattern list → reason string
    (NULL if none): a coalesce of one when() per pattern."""
    return F.coalesce(
        *[
            F.when(
                snippet.rlike(pat),
                F.lit(reason) if suffix is None else F.concat(F.lit(reason), suffix),
            )
            for pat, reason in patterns
        ]
    )


def blocked_reason_col(status_col: Column, html_col: Column) -> Column:
    """The detection ladder as one nullable string column: the block
    reason (byte-identical to the reference's), NULL when not blocked.
    Compose with ``.isNotNull()`` for the boolean."""
    html = F.coalesce(html_col.cast("string"), F.lit(""))
    sc = status_col.cast("int")
    n = F.length(html)
    n_str = n.cast("string")
    sc_str = sc.cast("string")

    snippet = F.substring(html, 1, 15_000)
    stripped_big = F.substring(_strip_blocks(F.substring(html, 1, 500_000)), 1, 30_000)

    # _looks_like_data (:120-135): JSON/XML API responses are never block pages
    body = F.trim(html)
    first = F.substring(body, 1, 1)
    head10 = F.lower(F.substring(body, 1, 10))
    data = F.when(F.length(body) == 0, F.lit(False)).when(
        first.isin("{", "["), F.lit(True)
    ).when(
        head10.startswith("<html") | head10.startswith("<!"),
        F.substring(body, 1, 500).rlike(r"(?i)<body[^>]*>\s*<pre[^>]*>\s*[{\[]"),
    ).otherwise(first == "<")

    # tier-3 structural integrity (:137-186)
    has_body_tag = html.rlike(r"(?i)<body\b")
    body_inner = F.when(
        html.rlike(r"(?is)<body\b[^>]*>[\s\S]*</body>"),
        F.regexp_extract(html, r"(?is)<body\b[^>]*>([\s\S]*)</body>", 1),
    ).otherwise(html)
    visible = F.trim(F.regexp_replace(_strip_blocks(body_inner), F.lit(r"<[^>]+>"), F.lit("")))
    vis_len = F.length(visible)
    content_elems = F.regexp_count(html, F.lit(_CONTENT_ELEMENTS))
    script_count = F.regexp_count(html, F.lit(r"(?i)<script\b"))
    sig_minimal = vis_len < 50
    sig_no_content = content_elems == 0
    sig_shell = (script_count > 0) & sig_no_content & (vis_len < 100)
    sig_names = F.array(
        F.when(sig_minimal, F.lit("minimal_text")),
        F.when(sig_no_content, F.lit("no_content_elements")),
        F.when(sig_shell, F.lit("script_heavy_shell")),
    )
    sig_count = (
        sig_minimal.cast("int") + sig_no_content.cast("int") + sig_shell.cast("int")
    )
    struct_detail = F.concat(
        F.lit(" ("), n_str, F.lit(" bytes, "), vis_len.cast("string"), F.lit(" chars visible)")
    )
    structural = F.when(
        (n > STRUCTURAL_MAX_SIZE) | data, F.lit(None).cast("string")
    ).when(
        ~has_body_tag, F.concat(F.lit("Structural: no <body> tag ("), n_str, F.lit(" bytes)"))
    ).when(
        sig_count >= 2,
        F.concat(F.lit("Structural: "), F.concat_ws(", ", sig_names), struct_detail),
    ).when(
        (sig_count == 1) & (n < BLOCK_PAGE_MAX_SIZE),
        F.concat(F.lit("Structural: "), F.concat_ws(", ", sig_names), F.lit(" on small page"), struct_detail),
    )

    # 403/503 sub-ladder (:236-262)
    t2_suffix = F.concat(F.lit(" (HTTP "), sc_str, F.lit(", "), n_str, F.lit(" bytes)"))
    check_snippet_403 = F.when(n > TIER2_MAX_SIZE, stripped_big).otherwise(snippet)
    branch_403 = F.when(
        n < EMPTY_CONTENT_THRESHOLD,
        F.concat(F.lit("HTTP "), sc_str, F.lit(" with near-empty response ("), n_str, F.lit(" bytes)")),
    ).otherwise(
        F.coalesce(
            _first_match(check_snippet_403, TIER2_PATTERNS, t2_suffix),
            F.concat(F.lit("HTTP "), sc_str, F.lit(" with HTML content ("), n_str, F.lit(" bytes)")),
        )
    )

    # first non-null wins — every branch is NULL unless its guard AND
    # (where applicable) its pattern match both hold, so the coalesce
    # reproduces the reference's early-return ladder with each regex
    # evaluated once
    return F.coalesce(
        F.when(sc == 429, F.lit("HTTP 429 Too Many Requests")),
        _first_match(snippet, TIER1_PATTERNS),
        F.when(n > 15_000, _first_match(stripped_big, TIER1_PATTERNS)),
        F.when(sc.isin(403, 503) & ~data, branch_403),
        F.when(
            (sc >= 400) & (n < TIER2_MAX_SIZE),
            _first_match(snippet, TIER2_PATTERNS, t2_suffix),
        ),
        F.when(
            (sc == 200) & (F.length(body) < EMPTY_CONTENT_THRESHOLD) & ~data,
            F.concat(F.lit("Near-empty content ("), F.length(body).cast("string"), F.lit(" bytes) with HTTP 200")),
        ),
        structural,
    )


def detect_blocked(
    df: DataFrame,
    status_col: str = "status_code",
    html_col: str = "html",
) -> DataFrame:
    """Append ``is_blocked`` / ``block_reason`` to a results frame —
    the post-fetch projection that feeds the requeue/fallback path in
    the loop and the corpus-cleaning filter in the pipeline."""
    reason = blocked_reason_col(F.col(status_col), F.col(html_col))
    return df.withColumns(
        {"block_reason": reason, "is_blocked": reason.isNotNull()}
    )
