"""pack_sequences vs a pure-Python concat-and-chunk reference, plus the
structural invariants a trainer relies on (full coverage, no overlap,
every chunk except the last exactly seq_len)."""
import hashlib
import random

import pytest

from crawl4ai_spark.operators.sampling import pack_sequences


def _ref_pack(rows, L):
    docs = [(d, len(t.split()) if t.strip() else 0) for d, _, t in rows]
    docs = [(d, n) for d, n in docs if n > 0]
    docs.sort(key=lambda x: (hashlib.md5(str(x[0]).encode()).hexdigest(), x[0]))
    out, off = [], 0
    for doc_id, n in docs:
        first, last = off // L, (off + n - 1) // L
        for c in range(first, last + 1):
            start = max(0, c * L - off)
            end = min(n, (c + 1) * L - off)
            pos = off % L if c == first else 0
            out.append((c, doc_id, start, end, pos))
        off += n
    return sorted(out), off


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(3)
    return [
        (i, "x", " ".join(f"t{j}" for j in range(rng.choice([0, 1, 7, 30, 190]))))
        for i in range(400)
    ]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, src string, text string")


def test_matches_reference(spark, corpus):
    got = sorted(
        tuple(r)
        for r in pack_sequences(_df(spark, corpus), 64).collect()
    )
    ref, _ = _ref_pack(corpus, 64)
    assert got == ref


def test_invariants(spark, corpus):
    rows = pack_sequences(_df(spark, corpus), 100).collect()
    _, total = _ref_pack(corpus, 100)
    # slices tile each chunk exactly: sum of slice lengths per chunk
    per_chunk = {}
    for r in rows:
        assert 0 <= r.doc_tok_start < r.doc_tok_end
        per_chunk.setdefault(r.chunk_id, []).append(r)
    n_chunks = max(per_chunk) + 1
    assert set(per_chunk) == set(range(n_chunks))
    for c, slices in per_chunk.items():
        covered = sum(s.doc_tok_end - s.doc_tok_start for s in slices)
        expected = 100 if c < n_chunks - 1 else (total - 1) % 100 + 1
        assert covered == expected
        # slices are contiguous within the chunk
        slices.sort(key=lambda s: s.chunk_pos)
        pos = slices[0].chunk_pos
        assert pos == 0
        for s in slices:
            assert s.chunk_pos == pos
            pos += s.doc_tok_end - s.doc_tok_start
    # every doc's tokens appear exactly once across all its slices
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append((r.doc_tok_start, r.doc_tok_end))
    for d, spans in per_doc.items():
        spans.sort()
        assert spans[0][0] == 0
        for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
            assert a1 == b0


def test_doc_longer_than_seq_len(spark):
    rows = [(1, "x", " ".join(["w"] * 250))]
    got = sorted(tuple(r) for r in pack_sequences(_df(spark, rows), 100).collect())
    assert got == [(0, 1, 0, 100, 0), (1, 1, 100, 200, 0), (2, 1, 200, 250, 0)]


def test_zero_token_docs_omitted_and_bad_seq_len(spark):
    rows = [(1, "x", ""), (2, "x", "a b c")]
    got = pack_sequences(_df(spark, rows), 2).collect()
    assert {r.doc_id for r in got} == {2}
    with pytest.raises(ValueError):
        pack_sequences(_df(spark, rows), 0)


def test_window_is_bucket_grained(spark, corpus):
    plan = (
        pack_sequences(_df(spark, corpus), 64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "windowspecdefinition" in line and "_key" in line:
            assert "_bucket" in line, line
