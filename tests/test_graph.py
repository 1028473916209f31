"""Graph operators: connected components, PageRank, and C4-style span
dedup. Truth oracles are driver-side pure-Python implementations
(union-find, dense-matrix power iteration) on small deterministic
graphs — the Spark results must match exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.dedup import span_dedup, span_rows
from crawl4ai_spark.operators.graph import (
    connected_components,
    duplicate_clusters,
    pagerank,
)


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _pagerank_py(edges, iters=5, damping=0.85, digits=9):
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    r = {v: round(1.0 / n, digits) for v in nodes}
    base = (1.0 - damping) / n
    for _ in range(iters):
        inflow = {v: 0.0 for v in nodes}
        for s, d in edges:
            inflow[d] += r[s] / out[s]
        r = {v: round(base + damping * inflow[v], digits) for v in nodes}
    return r


# deterministic test graph: two chains, a triangle, a star, crossing edges
EDGES = [
    (1, 2), (2, 3), (3, 4),            # chain → comp 1
    (10, 11), (11, 12), (10, 12),      # triangle → comp 10
    (20, 21), (20, 22), (20, 23),      # star → comp 20
    (4, 40), (40, 41),                 # extends chain comp 1
    (50, 51),                          # pair → comp 50
]


def test_connected_components_matches_union_find(spark):
    df = spark.createDataFrame(EDGES, "id_a long, id_b long").repartition(5)
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == _union_find_components(EDGES)


def test_connected_components_long_chain_converges(spark):
    # a 64-node path exercises the O(log² n) round bound (a naive
    # min-propagation needs 63 rounds; large/small-star must finish
    # inside max_rounds=25)
    chain = [(i, i + 1) for i in range(64)]
    df = spark.createDataFrame(chain, "id_a long, id_b long")
    got = connected_components(df)
    assert got.select("component").distinct().collect()[0][0] == 0
    assert got.count() == 65
    assert got.where(F.col("component") != 0).count() == 0


def test_connected_components_direction_and_duplicate_invariant(spark):
    fwd = spark.createDataFrame(EDGES, "id_a long, id_b long")
    rev = spark.createDataFrame(
        [(b, a) for a, b in EDGES] + EDGES, "id_a long, id_b long"
    )
    assert sorted(map(tuple, connected_components(fwd).collect())) == sorted(
        map(tuple, connected_components(rev).collect())
    )


def test_duplicate_clusters_keep_drop(spark):
    df = spark.createDataFrame(EDGES, "id_a long, id_b long")
    rows = duplicate_clusters(df).collect()
    by_comp: dict[int, list] = {}
    for r in rows:
        by_comp.setdefault(r["component"], []).append(r)
    keeps = {c: [r["node"] for r in rs if r["is_keep"]] for c, rs in by_comp.items()}
    drops = {c: sorted(r["node"] for r in rs if not r["is_keep"]) for c, rs in by_comp.items()}
    assert keeps[1] == [1]
    assert drops[1] == [2, 3, 4, 40, 41]
    assert {r["n_members"] for r in by_comp[20]} == {4}
    assert drops[50] == [51]
    # every member row carries its cluster size; exactly one keep per cluster
    for c, rs in by_comp.items():
        assert {r["n_members"] for r in rs} == {len(rs)}
        assert sum(r["is_keep"] for r in rs) == 1


def test_pagerank_matches_dense_reference(spark):
    edges = [
        (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (4, 1), (2, 4),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=6).collect()}
    want = _pagerank_py(edges, iters=6)
    assert got == pytest.approx(want, abs=1e-9)
    # probability mass conserved (no dangling nodes in this graph)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


def test_pagerank_partitioning_invariant(spark):
    edges = [(i, (i * 7 + 3) % 23) for i in range(23)] + [(i, (i + 1) % 23) for i in range(23)]
    edges = [(a, b) for a, b in edges if a != b]
    a = pagerank(spark.createDataFrame(edges, "src long, dst long").repartition(1), iters=5)
    b = pagerank(spark.createDataFrame(edges, "src long, dst long").repartition(13), iters=5)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# ── span dedup ───────────────────────────────────────────────────────────


def _doc(words):
    return " ".join(words)


def test_span_rows_shape(spark):
    docs = spark.createDataFrame(
        [(1, _doc([f"w{i}" for i in range(7)]))], "doc_id long, text string"
    )
    rows = span_rows(docs, span_tokens=3).collect()
    assert [(r["pos"], r["span"]) for r in sorted(rows)] == [
        (0, "w0 w1 w2"),
        (1, "w3 w4 w5"),
        (2, "w6"),
    ]


def test_span_dedup_keeps_first_occurrence_only(spark):
    shared = [f"s{i}" for i in range(3)]
    docs = spark.createDataFrame(
        [
            (1, _doc(shared + ["a1", "a2", "a3"])),
            (2, _doc(["b1", "b2", "b3"] + shared)),
            (3, _doc(shared)),
        ],
        "doc_id long, text string",
    ).repartition(3)
    out = {r["id"]: r for r in span_dedup(docs, span_tokens=3).collect()}
    # doc 1 holds the first occurrence (min (id, pos)) → keeps both spans
    assert out[1]["dedup_text"] == "s0 s1 s2 a1 a2 a3"
    assert (out[1]["n_spans"], out[1]["n_spans_kept"]) == (2, 2)
    # doc 2's copy sits at pos 1 → dropped
    assert out[2]["dedup_text"] == "b1 b2 b3"
    assert (out[2]["n_spans"], out[2]["n_spans_kept"]) == (2, 1)
    # doc 3 is nothing but the shared span → empty after dedup
    assert out[3]["dedup_text"] == ""
    assert (out[3]["n_spans"], out[3]["n_spans_kept"]) == (1, 0)


def test_exact_substring_dedup_any_alignment_and_overlap(spark):
    """Sliding-window exact-substring dedup (Lee et al. 2021): a shared
    passage is caught at ANY token alignment (the case C4-style fixed
    spans miss), self-repeats within one doc keep only the first site,
    overlapping duplicate windows merge, and short docs pass through."""
    from crawl4ai_spark.operators.dedup import exact_substring_dedup

    P = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (0, "start0 " + P + " tail0 tail0b"),   # first occurrence: kept
            (1, "x1 y1 z1 " + P + " end1"),          # different alignment: cut
            (2, "tiny doc"),                          # shorter than the window
            (3, P + " mid3 " + P),                    # two internal copies: both cut
        ],
        "doc_id long, text string",
    ).repartition(3)
    out = {r["id"]: r for r in exact_substring_dedup(docs, min_tokens=6).collect()}
    assert out[0]["dedup_text"] == "start0 " + P + " tail0 tail0b"
    assert (out[0]["n_tokens"], out[0]["n_tokens_kept"]) == (9, 9)
    assert out[1]["dedup_text"] == "x1 y1 z1 end1"
    assert (out[1]["n_tokens"], out[1]["n_tokens_kept"]) == (10, 4)
    assert out[2]["dedup_text"] == "tiny doc"
    assert (out[2]["n_tokens"], out[2]["n_tokens_kept"]) == (2, 2)
    assert out[3]["dedup_text"] == "mid3"
    assert (out[3]["n_tokens"], out[3]["n_tokens_kept"]) == (13, 1)


def test_exact_substring_dedup_unique_corpus_is_identity(spark):
    from crawl4ai_spark.operators.dedup import exact_substring_dedup

    docs = spark.createDataFrame(
        [(i, _doc([f"d{i}w{j}" for j in range(12)])) for i in range(5)],
        "doc_id long, text string",
    )
    out = exact_substring_dedup(docs, min_tokens=4)
    assert out.where(F.col("n_tokens") != F.col("n_tokens_kept")).count() == 0
    joined = out.join(docs, out["id"] == docs["doc_id"])
    assert joined.where(F.col("dedup_text") != F.col("text")).count() == 0


@pytest.mark.parametrize("seed", [3, 17, 91])
def test_exact_substring_dedup_random_matches_reference(spark, seed):
    """Seeded collision-rich corpora (4-token alphabet, lengths 0-25,
    window 3 — dense overlaps, self-repeats, cross-doc repeats at every
    alignment) must match an independent pure-Python reference of the
    keep-global-first / delete-covered-tokens rule exactly."""
    import random
    from collections import defaultdict

    from crawl4ai_spark.operators.dedup import exact_substring_dedup

    L = 3
    rng = random.Random(seed)
    docs = [
        (i, " ".join(rng.choice("aa bb cc dd".split()) for _ in range(rng.randrange(26))))
        for i in range(40)
    ]

    toks = {i: t.split() for i, t in docs if t.strip()}
    occ = defaultdict(list)
    for i in sorted(toks):
        tt = toks[i]
        for p in range(len(tt) - L + 1):
            occ[tuple(tt[p : p + L])].append((i, p))
    expected = {}
    cov = defaultdict(set)
    for sites in occ.values():
        if len(sites) > 1:
            keep = min(sites)
            for i, p in sites:
                if (i, p) != keep:
                    cov[i].update(range(p, p + L))
    for i, tt in toks.items():
        kept = [tok for q, tok in enumerate(tt) if q not in cov[i]]
        expected[i] = (" ".join(kept), len(tt), len(tt) - len(cov[i]))

    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(7)
    got = {
        r["id"]: (r["dedup_text"], r["n_tokens"], r["n_tokens_kept"])
        for r in exact_substring_dedup(df, min_tokens=L).collect()
    }
    assert got == expected


def test_span_dedup_unique_corpus_is_identity(spark):
    docs = spark.createDataFrame(
        [(i, _doc([f"d{i}w{j}" for j in range(10)])) for i in range(5)],
        "doc_id long, text string",
    )
    out = span_dedup(docs, span_tokens=4)
    assert out.where(F.col("n_spans") != F.col("n_spans_kept")).count() == 0
    joined = out.join(docs, out["id"] == docs["doc_id"])
    assert joined.where(F.col("dedup_text") != F.col("text")).count() == 0


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(7, 60, 40), (11, 80, 120), (13, 30, 200)])
def test_connected_components_random_graphs_match_union_find(spark, seed, n_nodes, n_edges):
    """Seeded random graphs across density regimes (forest-like, ~critical,
    dense multigraph with self-loops/dups) — Spark CC must equal the
    union-find oracle exactly on every one."""
    import random

    rng = random.Random(seed)
    edges = [
        (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
    ]
    df = spark.createDataFrame(edges, "id_a long, id_b long").repartition(7)
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == _union_find_components(edges)


# ── HITS ─────────────────────────────────────────────────────────────────


def _hits_py(edges, iters=5, digits=9):
    """Independent reference mirroring the operator's max-normalized,
    rounded Kleinberg updates (authorities from hubs, hubs from NEW
    authorities)."""
    es = sorted(set(edges))
    nodes = sorted({u for u, _ in es} | {v for _, v in es})
    hub = {n: 1.0 for n in nodes}
    auth = {n: 0.0 for n in nodes}

    def norm(d):
        mx = max(d.values())
        return {n: round(v / mx, digits) if mx > 0 else 0.0 for n, v in d.items()}

    for _ in range(iters):
        auth = norm({n: sum(hub[u] for u, v in es if v == n) for n in nodes})
        hub = norm({n: sum(auth[v] for u, v in es if u == n) for n in nodes})
    return hub, auth


def test_hits_matches_dense_reference(spark):
    from crawl4ai_spark.operators.graph import hits

    edges = [
        (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (4, 1), (2, 4), (5, 3), (5, 2),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = hits(df, iters=6).collect()
    want_h, want_a = _hits_py(edges, iters=6)
    got_h = {r["node"]: r["hub"] for r in rows}
    got_a = {r["node"]: r["authority"] for r in rows}
    assert got_h == pytest.approx(want_h, abs=1e-8)
    assert got_a == pytest.approx(want_a, abs=1e-8)


def test_hits_star_graph_planted_structure(spark):
    """Hub pages 10..14 all point at authority 0 (plus one filler edge
    each); the authority must be node 0 at score 1.0 and every pure hub
    must outrank the authority's hub score."""
    from crawl4ai_spark.operators.graph import hits

    edges = [(10 + i, 0) for i in range(5)] + [(10 + i, 20 + i) for i in range(5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = {r["node"]: r for r in hits(df, iters=4).collect()}
    assert rows[0]["authority"] == pytest.approx(1.0)
    assert max(r["authority"] for n, r in rows.items() if n != 0) < 0.5
    for i in range(5):
        assert rows[10 + i]["hub"] == pytest.approx(1.0)
    assert rows[0]["hub"] == 0.0  # node 0 links to nothing


def test_hits_partitioning_invariant(spark):
    from crawl4ai_spark.operators.graph import hits

    edges = [(i, (i * 7 + 3) % 23) for i in range(23)] + [(i, (i + 1) % 23) for i in range(23)]
    edges = [(a, b) for a, b in edges if a != b]
    a = hits(spark.createDataFrame(edges, "src long, dst long").repartition(1), iters=5)
    b = hits(spark.createDataFrame(edges, "src long, dst long").repartition(13), iters=5)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
