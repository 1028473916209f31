"""Dedup / similarity / textstats operator tests at sf0.001, including
recall of the approximate (scale) paths against the exact baselines."""

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(os.path.join(SF, "documents.parquet")).cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(os.path.join(SF, "embeddings.parquet")).cache()


def test_minhash_lsh_recall_vs_exact(spark, docs):
    from crawl4ai_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    approx = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, k=64, bands=16, threshold=0.3).collect()
    }
    # exact-verified LSH pairs are a subset of exact pairs by construction
    assert approx <= exact
    # recall at jaccard>=0.3 with 16 bands of 4 rows: expect most pairs
    if exact:
        assert len(approx) / len(exact) >= 0.8, (len(approx), len(exact))


def test_minhash_deterministic(spark, docs):
    from crawl4ai_spark.operators.dedup import minhash_signatures

    s1 = minhash_signatures(docs.limit(20)).collect()
    s2 = minhash_signatures(docs.limit(20)).collect()
    assert {r.doc_id: tuple(r.signature) for r in s1} == {
        r.doc_id: tuple(r.signature) for r in s2
    }


def test_simhash_close_docs_collide(spark):
    """Banding guarantee (pigeonhole): any pair within hamming ≤ 3 of the
    4×16-bit chunks shares a chunk and is surfaced; distant docs are not."""
    from crawl4ai_spark.operators.dedup import simhash_candidate_pairs

    base = "spark frontier crawl wave page link host budget robots queue score depth " * 20
    rows = [
        (1, base),
        (2, base),  # identical → hamming 0, must collide
        (3, "completely different words about cooking pasta tomatoes basil olive garlic"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.id_a, r.id_b): r.hamming for r in simhash_candidate_pairs(df, max_hamming=3).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs
    # returned pairs always satisfy the hamming bound
    assert all(h <= 3 for h in pairs.values())


def test_ann_lsh_recall_vs_bruteforce(spark):
    """Recall on clustered vectors (true neighbors at cosine ≈ 0.95+);
    hyperplane LSH cannot (and should not) prune weakly-similar random
    noise, so recall is specified on genuinely-near neighbors."""
    import numpy as np

    from crawl4ai_spark.operators.similarity import ann_topk_lsh, cosine_topk

    rng = np.random.RandomState(7)
    centers = rng.standard_normal((5, 32))
    rows = []
    vid = 0
    for c in range(5):
        for _ in range(40):
            v = centers[c] + 0.15 * rng.standard_normal(32)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    query = rows[0][1]
    exact = [r.vec_id for r in cosine_topk(df, query, k=10).collect()]
    approx = [r.vec_id for r in ann_topk_lsh(df, query, k=10, n_planes=10, probe_hamming=2).collect()]
    overlap = len(set(exact) & set(approx)) / 10
    assert overlap >= 0.8, (exact, approx)
    assert exact[0] == 0 and approx[0] == 0


def test_cosine_topk_is_sorted_and_self_first(spark, emb):
    from crawl4ai_spark.operators.similarity import cosine_topk

    query = list(emb.where(F.col("vec_id") == 0).head().embedding)
    rows = cosine_topk(emb, query, k=5).collect()
    sims = [r.cosine_sim for r in rows]
    assert sims == sorted(sims, reverse=True)
    assert rows[0].vec_id == 0 and abs(rows[0].cosine_sim - 1.0) < 1e-6


def test_exact_dedup_groups(spark):
    from crawl4ai_spark.operators.dedup import dedup_keep_first, exact_duplicate_groups

    df = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, "aaa"), (4, "aaa"), (5, "ccc")],
        "doc_id long, text string",
    )
    groups = exact_duplicate_groups(df).collect()
    assert len(groups) == 1
    assert groups[0].n_dups == 3 and groups[0].doc_ids == [1, 3, 4]
    kept = sorted(r.doc_id for r in dedup_keep_first(df).collect())
    assert kept == [1, 2, 5]


def test_langid_best_deterministic_and_sane(spark):
    from crawl4ai_spark.operators.textstats import langid_best

    df = spark.createDataFrame(
        [
            (1, "the cat and the dog ran to the house with a ball"),
            (2, "der hund und die katze ist nicht mit der maus"),
            (3, "le chat et le chien est dans la maison pour une nuit"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.lang_pred for r in df.select("doc_id", langid_best(F.col("text")).alias("lang_pred")).collect()}
    assert got == {1: "en", 2: "de", 3: "fr"}


def test_quality_score_bounds(spark, docs):
    from crawl4ai_spark.operators.textstats import quality_score_col

    stats = docs.select(quality_score_col(F.col("text")).alias("q")).agg(
        F.min("q").alias("lo"), F.max("q").alias("hi")
    ).head()
    assert 0.0 <= stats.lo <= stats.hi <= 1.0


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    # extraction round-trip holds for every synthesized page
    for r in rows:
        assert r.n_lang_roundtrip_ok == r.n_docs


def test_ivf_topk_recall_on_clusters(spark):
    """IVF coarse-quantizer ANN: on clustered data with n_probe covering
    the query's cluster, recall vs brute force should be high."""
    import numpy as np
    from pyspark.sql import functions as F

    from crawl4ai_spark.operators.similarity import cosine_topk, ivf_topk, kmeans_centroids

    rng = np.random.RandomState(11)
    centers = rng.standard_normal((4, 24))
    rows = []
    vid = 0
    for c in range(4):
        for _ in range(50):
            v = centers[c] + 0.2 * rng.standard_normal(24)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()
    centroids = kmeans_centroids(df, k=4, iters=6)
    query = rows[0][1]
    exact = [r.vec_id for r in cosine_topk(df, query, k=10).collect()]
    approx = [r.vec_id for r in ivf_topk(df, query, centroids, k=10, n_probe=2).collect()]
    assert len(set(exact) & set(approx)) / 10 >= 0.9
    assert approx[0] == 0
    # determinism: same centroids, same result
    centroids2 = kmeans_centroids(df, k=4, iters=6)
    assert np.allclose(centroids, centroids2)
    # precomputed-cell path (cells assigned at ingest, query = IN-list
    # filter + rerank) must return the identical result rows
    from crawl4ai_spark.operators.similarity import ivf_assign

    assigned = ivf_assign(df, centroids)
    pre = [
        (r.vec_id, r.cosine_sim)
        for r in ivf_topk(
            assigned, query, centroids, k=10, n_probe=2, cell_col="ivf_cell"
        ).collect()
    ]
    inline = [
        (r.vec_id, r.cosine_sim)
        for r in ivf_topk(df, query, centroids, k=10, n_probe=2).collect()
    ]
    assert pre == inline


def test_ivf_assign_udf_path_matches_literal_path(spark):
    """Above ASSIGN_LITERAL_MAX_K the assignment switches to a numpy
    pandas UDF; both physical strategies must assign identical cells, and
    ivf_topk recall must hold at k=64 cells (the production-k path)."""
    import numpy as np

    from crawl4ai_spark.operators import similarity as sim

    rng = np.random.RandomState(5)
    centers = rng.standard_normal((8, 16))
    rows = [
        (64 * c + i, [float(x) for x in centers[c] + 0.15 * rng.standard_normal(16)])
        for c in range(8)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()
    centroids = sim.kmeans_centroids(df, k=8, iters=6)

    literal = {
        r.vec_id: r.ivf_cell for r in sim.ivf_assign(df, centroids).collect()
    }
    old_max = sim.ASSIGN_LITERAL_MAX_K
    try:
        sim.ASSIGN_LITERAL_MAX_K = 0  # force the pandas-UDF strategy
        via_udf = {
            r.vec_id: r.ivf_cell for r in sim.ivf_assign(df, centroids).collect()
        }
    finally:
        sim.ASSIGN_LITERAL_MAX_K = old_max
    assert literal == via_udf

    # k=64 cells > ASSIGN_LITERAL_MAX_K → UDF path used inside ivf_topk
    centroids64 = sim.kmeans_centroids(df, k=64, iters=5)
    assert len(centroids64) > sim.ASSIGN_LITERAL_MAX_K
    query = rows[0][1]
    exact = [r.vec_id for r in sim.cosine_topk(df, query, k=10).collect()]
    approx = [
        r.vec_id
        for r in sim.ivf_topk(df, query, centroids64, k=10, n_probe=16).collect()
    ]
    assert len(set(exact) & set(approx)) / 10 >= 0.9


def test_lsh_bucket_cap_bounds_candidates(spark):
    """A degenerate bucket of B identical docs yields O(B^2) candidates;
    the cap excludes it while distinct near-dup pairs survive via their
    own buckets, and lsh_bucket_stats reports what the cap drops."""
    from crawl4ai_spark.operators.dedup import (
        lsh_banded_buckets,
        lsh_bucket_stats,
        minhash_lsh_pairs,
    )

    boiler = "lorem ipsum boilerplate nav footer copyright words repeated everywhere always"
    rows = [(i, boiler) for i in range(30)]  # 30 identical docs
    rows += [
        (100, "unique alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (101, "unique alpha beta gamma delta epsilon zeta eta theta iota kappa extra"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = minhash_lsh_pairs(df, threshold=0.5, verify_exact=True)
    capped = minhash_lsh_pairs(df, threshold=0.5, verify_exact=True, max_bucket_size=10)
    pairs_capped = {(r.id_a, r.id_b) for r in capped.collect()}
    # the distinct near-dup pair survives the cap
    assert (100, 101) in pairs_capped
    # the boilerplate clique is excluded by the cap
    assert len(pairs_capped) < uncapped.count()
    assert all(not (a < 30 and b < 30) for a, b in pairs_capped)
    # audit view reports the oversized buckets
    stats = lsh_bucket_stats(lsh_banded_buckets(df)).collect()
    assert any(r.size == 30 for r in stats)


def test_cosine_cluster_chunks_sections_and_query_filter(spark):
    """CosineStrategy surface: similar sentences cluster into one
    section; a query filter keeps only relevant clusters."""
    from crawl4ai_spark.operators.similarity import cosine_cluster_chunks

    text = (
        "Spark executors run tasks on partitions. "
        "Spark tasks execute on cluster partitions with executors. "
        "The pasta recipe needs tomato and basil. "
        "Cook the tomato basil pasta in the oven."
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    all_sections = cosine_cluster_chunks(df, max_dist=0.8).collect()
    # 4 sentences collapse into 2 topical sections
    assert len(all_sections) == 2
    spark_sec = [s.section for s in all_sections if "executors" in s.section]
    assert spark_sec and "partitions" in spark_sec[0]

    only_food = cosine_cluster_chunks(
        df, query="tomato basil pasta recipe", max_dist=0.8, sim_threshold=0.3
    ).collect()
    assert len(only_food) == 1 and "pasta" in only_food[0].section


def test_simhash_degenerate_chunk_cap_bounds_candidates(spark):
    """1,000 near-empty docs share 16-bit chunks → the uncapped candidate
    join is quadratic; the (chunk_idx, chunk) cap must bound it while the
    stats audit view exposes exactly which buckets a cap drops."""
    from pyspark.sql import functions as F

    from crawl4ai_spark.operators.dedup import (
        simhash_candidate_pairs,
        simhash_chunk_stats,
        simhash_chunks,
    )

    base = (
        "the quick brown fox jumps over a lazy dog while distributed systems "
        "shuffle partitions across many executor nodes computing aggregates " * 2
    )
    rows = [(i, "the") for i in range(1000)] + [
        (2000, base + "alpha"),
        (2001, base + "beta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    stats = simhash_chunk_stats(simhash_chunks(docs)).collect()
    assert any(r.size >= 1000 for r in stats)  # the degenerate buckets are visible

    capped = simhash_candidate_pairs(docs, max_chunk_bucket_size=50)
    n_capped = capped.count()
    # without the cap the identical docs alone give 1000*999/2 pairs
    assert n_capped < 5000
    # the genuinely-similar (non-degenerate) pair must survive the cap
    assert capped.where((F.col("id_a") == 2000) & (F.col("id_b") == 2001)).count() == 1


def _encode_png(width, height, pixels, filter_types):
    """Minimal in-test PNG encoder (8-bit RGB) applying the given PNG
    filter type per row — lets the test verify the decoder inverts every
    filter exactly."""
    import struct
    import zlib

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    bpp = 3
    stride = width * bpp
    flat = bytes(v for px in pixels for v in px)
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = flat[y * stride : (y + 1) * stride]
        ft = filter_types[y % len(filter_types)]
        raw.append(ft)
        for x in range(stride):
            a = line[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if ft == 0:
                raw.append(line[x])
            elif ft == 1:
                raw.append((line[x] - a) & 0xFF)
            elif ft == 2:
                raw.append((line[x] - b) & 0xFF)
            elif ft == 3:
                raw.append((line[x] - ((a + b) >> 1)) & 0xFF)
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                raw.append((line[x] - pred) & 0xFF)
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_decoder_inverts_all_filters():
    from crawl4ai_spark.operators.multimodal import png_decode

    w, h = 5, 10
    pixels = [((x * 37) % 256, (y * 53) % 256, (x * y * 11) % 256) for y in range(h) for x in range(w)]
    png = _encode_png(w, h, pixels, filter_types=[0, 1, 2, 3, 4])
    gw, gh, gc, pix = png_decode(png)
    assert (gw, gh, gc) == (w, h, 3)
    assert list(pix) == [v for px in pixels for v in px]


def test_png_interlaced_equals_plain():
    """Adam7 decode must reproduce the non-interlaced pixels exactly —
    including widths/heights below the pass grid (empty passes) and odd
    dimensions (partial passes)."""
    from crawl4ai_spark.operators.multimodal import png_decode, synth_png

    for w, h in [(8, 6), (9, 7), (3, 2), (1, 1), (16, 5), (7, 16), (2, 9)]:
        plain = png_decode(synth_png(w, h, seed=w * 31 + h))
        inter = png_decode(synth_png(w, h, seed=w * 31 + h, interlace=True))
        assert inter == plain, (w, h)


def test_png_16bit_reduces_to_8bit():
    """16-bit samples decode to their high byte — the synth encoder puts
    the 8-bit pixel value there, so both depths decode identically."""
    from crawl4ai_spark.operators.multimodal import png_decode, synth_png

    for w, h in [(8, 6), (5, 3)]:
        assert png_decode(synth_png(w, h, seed=2, depth=16)) == png_decode(
            synth_png(w, h, seed=2)
        )


def test_png_gray_subbyte_depths():
    """1/2/4/8-bit grayscale: MSB-first unpack + full-range scaling, plain
    and interlaced (per-pass packed-row boundaries)."""
    from crawl4ai_spark.operators.multimodal import png_decode, synth_png

    w, h, seed = 11, 5, 3
    for depth in (1, 2, 4, 8):
        scale = 255 // ((1 << depth) - 1)
        want = bytes(
            ((x * 7 + y * 13 + seed) % (1 << depth)) * scale
            for y in range(h)
            for x in range(w)
        )
        for interlace in (False, True):
            gw, gh, gc, pix = png_decode(
                synth_png(w, h, seed=seed, depth=depth, color="gray", interlace=interlace)
            )
            assert (gw, gh, gc) == (w, h, 1)
            assert pix == want, (depth, interlace)


def test_png_palette_expansion_and_trns():
    """Color type 3 expands through PLTE (RGB), and a tRNS chunk shorter
    than the palette yields RGBA with alpha 255 past the chunk's end."""
    from crawl4ai_spark.operators.multimodal import png_decode, synth_png

    w, h, seed = 9, 4, 5
    idx = [(x * 7 + y * 13 + seed) % 16 for y in range(h) for x in range(w)]
    pal = {j: (j * 11 % 256, j * 59 % 256, j * 83 % 256) for j in range(16)}

    gw, gh, gc, pix = png_decode(synth_png(w, h, seed=seed, color="palette"))
    assert (gw, gh, gc) == (w, h, 3)
    assert pix == bytes(v for j in idx for v in pal[j])

    gw, gh, gc, pix = png_decode(synth_png(w, h, seed=seed, color="palette", trns=True))
    assert (gw, gh, gc) == (w, h, 4)
    want = bytes(
        v for j in idx for v in (*pal[j], (j * 29) % 256 if j < 8 else 255)
    )
    assert pix == want


def test_image_feature_decoder_real_png_through_pipeline(spark):
    """A real PNG payload must produce decode_ok=true with exact channel
    means through the distributed mapInPandas stage; a garbage payload in
    the same batch falls back to the byte-histogram features (poison
    tolerance intact)."""
    from crawl4ai_spark.operators.multimodal import extract_media_features

    w, h = 8, 4
    solid = [(200, 100, 50)] * (w * h)
    png = _encode_png(w, h, solid, filter_types=[0])
    rows = [
        (1, "image", png, {"mime": "image/png", "width": w, "height": h, "duration_ms": 0}),
        (2, "image", b"not an image at all", {"mime": "image/jpeg", "width": 0, "height": 0, "duration_ms": 0}),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, "
        "meta struct<mime:string, width:int, height:int, duration_ms:int>",
    )
    got = {r.media_id: r for r in extract_media_features(media).collect()}
    assert got[1].decode_ok
    f = got[1].features
    assert f[0] == float(w) and f[1] == float(h) and f[2] == 3.0
    assert abs(f[3] - 200.0) < 1e-4 and abs(f[4] - 100.0) < 1e-4 and abs(f[5] - 50.0) < 1e-4
    # non-image payload: histogram fallback, still decode_ok (16 bins)
    assert got[2].decode_ok and len(got[2].features) == 16


def test_bmp_decoder_roundtrip():
    import struct

    from crawl4ai_spark.operators.multimodal import bmp_decode

    w, h = 3, 2
    px = [(10, 20, 30), (40, 50, 60), (70, 80, 90),
          (110, 120, 130), (140, 150, 160), (170, 180, 190)]
    row_bytes = (w * 3 + 3) & ~3
    body = bytearray()
    for y in reversed(range(h)):  # bottom-up
        row = bytearray()
        for x in range(w):
            r, g, b = px[y * w + x]
            row += bytes((b, g, r))
        row += bytes(row_bytes - len(row))
        body += row
    header = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    gw, gh, gc, pix = bmp_decode(bytes(header + dib + body))
    assert (gw, gh, gc) == (w, h, 3)
    assert list(pix) == [v for p in px for v in p]


def test_wav_decoder_features():
    import math

    from crawl4ai_spark.operators.multimodal import audio_feature_decoder, synth_wav

    rate, n = 8000, 400
    wav = synth_wav(n, rate=rate, seed=3)
    f = audio_feature_decoder(wav, {})
    assert len(f) == 16
    assert f[0] == float(rate) and f[1] == 1.0 and f[2] == float(n)
    assert abs(f[3] - 1000.0 * n / rate) < 1e-3      # duration_ms
    assert 0.0 < f[5] <= 1.0                         # rms of normalized samples
    assert 0.0 <= f[6] <= 1.0                        # zero-crossing rate
    assert abs(sum(f[8:16]) - 1.0) < 1e-5            # histogram normalized
    assert not any(math.isnan(v) for v in f)


def test_wav_decoder_known_square_wave():
    """A full-scale ±16384 square wave has rms = peak = 0.5 and a zero
    crossing at every sample boundary."""
    import io
    import struct
    import wave

    from crawl4ai_spark.operators.multimodal import audio_feature_decoder

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(b"".join(
            struct.pack("<h", 16384 if i % 2 == 0 else -16384) for i in range(100)
        ))
    f = audio_feature_decoder(buf.getvalue(), {})
    assert abs(f[5] - 0.5) < 1e-6 and abs(f[7] - 0.5) < 1e-6
    assert f[6] == 1.0


def test_y4m_decoder_frame_sampling():
    from crawl4ai_spark.operators.multimodal import synth_y4m, y4m_decode

    w, h, n = 6, 4, 7
    clip = synth_y4m(w, h, n, seed=5)
    gw, gh, fps, lumas = y4m_decode(clip, frame_stride=1)
    assert (gw, gh, fps) == (w, h, 25.0)
    assert len(lumas) == n and all(len(p) == w * h for p in lumas)
    # stride 3 samples frames 0, 3, 6
    _, _, _, sampled = y4m_decode(clip, frame_stride=3)
    assert len(sampled) == 3
    assert sampled[0] == lumas[0] and sampled[1] == lumas[3] and sampled[2] == lumas[6]


def test_jpeg_gif_dimension_probes():
    import struct

    from crawl4ai_spark.operators.multimodal import gif_probe, image_feature_decoder, jpeg_probe

    # minimal JPEG: SOI, APP0 stub, SOF0 (h=30, w=20, 3 components)
    sof = b"\xff\xc0" + struct.pack(">H", 8 + 3 * 3) + b"\x08" + struct.pack(">HH", 30, 20) + b"\x03" + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    jpeg = b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", 4) + b"JF" + sof
    assert jpeg_probe(jpeg) == (20, 30, 3)
    # spec-valid fill bytes (extra 0xFF) before a marker must be skipped,
    # not parsed as a standalone 0xFF marker + bogus segment length
    padded = b"\xff\xd8" + b"\xff\xff\xff\xe0" + struct.pack(">H", 4) + b"JF" + b"\xff\xff" + sof
    assert jpeg_probe(padded) == (20, 30, 3)
    # EOI before any SOF ends the walk cleanly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="SOF"):
        jpeg_probe(b"\xff\xd8\xff\xd9")
    gif = b"GIF89a" + struct.pack("<HH", 40, 25) + b"\x00\x00\x00"
    assert gif_probe(gif) == (40, 25, 3)
    fj = image_feature_decoder(jpeg, {})
    assert fj[0] == 20.0 and fj[1] == 30.0 and fj[2] == 3.0 and len(fj) == 16
    fg = image_feature_decoder(gif, {})
    assert fg[0] == 40.0 and fg[1] == 25.0


def test_webp_ico_svg_dimension_probes():
    """Header-only formats: WebP (all three stream kinds), ICO (largest
    entry, 0-means-256), SVG (attrs, units, viewBox fallback) probe real
    dimensions; malformed variants fall back to byte-histogram features
    through image_feature_decoder."""
    import struct

    from crawl4ai_spark.operators.multimodal import (
        ico_probe,
        image_feature_decoder,
        svg_probe,
        webp_probe,
    )

    # VP8 lossy: key-frame start code, 14-bit dims
    vp8 = (
        b"RIFF" + struct.pack("<I", 30) + b"WEBPVP8 " + struct.pack("<I", 18)
        + b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", 320, 240) + b"\x00" * 8
    )
    assert webp_probe(vp8) == (320, 240, 3)
    # VP8L lossless: 0x2F then packed (w-1, h-1)
    bits = (199 - 1) | ((83 - 1) << 14)
    vp8l = (
        b"RIFF" + struct.pack("<I", 20) + b"WEBPVP8L" + struct.pack("<I", 8)
        + b"\x2f" + struct.pack("<I", bits) + b"\x00" * 3
    )
    assert webp_probe(vp8l) == (199, 83, 4)
    # VP8X extended: alpha flag + 24-bit canvas dims-1
    vp8x = (
        b"RIFF" + struct.pack("<I", 22) + b"WEBPVP8X" + struct.pack("<I", 10)
        + bytes([0x10]) + b"\x00" * 3
        + (512 - 1).to_bytes(3, "little") + (300 - 1).to_bytes(3, "little")
    )
    assert webp_probe(vp8x) == (512, 300, 4)

    ico = (
        b"\x00\x00\x01\x00" + struct.pack("<H", 2)
        + bytes([16, 16]) + b"\x00" * 14      # 16x16 entry
        + bytes([0, 0]) + b"\x00" * 14        # 256x256 entry (0 = 256)
    )
    assert ico_probe(ico) == (256, 256, 4)

    svg = b'<?xml version="1.0"?>\n<svg xmlns="http://www.w3.org/2000/svg" width="24px" height="16">'
    assert svg_probe(svg) == (24, 16, 4)
    svg_vb = b'<svg viewBox="0 0 120.5 80">'
    assert svg_probe(svg_vb) == (120, 80, 4)

    # probe features land in the pixel slots; malformed WebP falls back
    f = image_feature_decoder(vp8l, {})
    assert f[:3] == [199.0, 83.0, 4.0]
    bad = b"RIFF" + b"\x00" * 4 + b"WEBPXXXX" + b"\x00" * 8
    fb = image_feature_decoder(bad, {})
    assert len(fb) == 16 and abs(sum(fb) - 1.0) < 1e-6  # histogram fallback


def test_mp3_ogg_mp4_metadata_probes():
    """Audio/video container probes: MP3 (ID3v2 skip + frame header, CBR
    duration), Ogg Vorbis (ident header + last granule), MP4 (mvhd
    timescale/duration + tkhd 16.16 dims); garbage falls back to the
    histogram stand-in."""
    import struct

    from crawl4ai_spark.operators.multimodal import (
        audio_feature_decoder,
        make_video_decoder,
        mp3_probe,
        mp4_probe,
        ogg_vorbis_probe,
    )

    # --- MP3: ID3v2 (10-byte, size 0) + MPEG1 Layer III 128kbps 44.1kHz
    # stereo frame sync; 16000 audio bytes at 128 kbps = 1000 ms
    mp3 = b"ID3\x04\x00\x00\x00\x00\x00\x00" + bytes([0xFF, 0xFB, 0x90, 0x00])
    mp3 += b"\x00" * (16000 - 4)
    rate, ch, dur = mp3_probe(mp3)
    assert (rate, ch) == (44100, 2) and abs(dur - 1000.0) < 1e-6
    f = audio_feature_decoder(mp3, {})
    assert f[:2] == [44100.0, 2.0] and abs(f[3] - 1000.0) < 0.01

    # --- Ogg Vorbis: first page with identification header, last page
    # granule 88200 samples @44100 = 2000 ms
    ident = b"\x01vorbis" + struct.pack("<I", 0) + bytes([2]) + struct.pack("<I", 44100)
    first = b"OggS" + bytes([0, 2]) + struct.pack("<q", 0) + b"\x00" * 13 + ident
    last = b"OggS" + bytes([0, 4]) + struct.pack("<q", 88200) + b"\x00" * 13
    assert ogg_vorbis_probe(first + b"\x00" * 50 + last) == (44100, 2, 2000.0)

    # --- MP4: ftyp + moov{mvhd v0 (timescale 1000, duration 2500),
    # trak{tkhd with 640x360 in 16.16 fixed}}
    ftyp = struct.pack(">I", 16) + b"ftypisom" + b"\x00" * 4
    mvhd_body = bytes([0, 0, 0, 0]) + b"\x00" * 8 + struct.pack(">II", 1000, 2500)
    mvhd_body += b"\x00" * 80
    mvhd = struct.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
    tkhd_body = b"\x00" * 76 + struct.pack(">II", 640 << 16, 360 << 16)
    tkhd = struct.pack(">I", 8 + len(tkhd_body)) + b"tkhd" + tkhd_body
    trak = struct.pack(">I", 8 + len(tkhd)) + b"trak" + tkhd
    moov = struct.pack(">I", 8 + len(mvhd) + len(trak)) + b"moov" + mvhd + trak
    mp4 = ftyp + moov
    assert mp4_probe(mp4) == (640, 360, 2500.0)
    vf = make_video_decoder()(mp4, {})
    assert vf[:2] == [640.0, 360.0] and abs(vf[3] - 2500.0) < 0.01

    # --- fallback: truncated MP4 and non-audio bytes keep the histogram
    # poison-tolerance contract
    fb = make_video_decoder()(ftyp + b"\x00\x00\x00\x99moov", {})
    assert len(fb) == 16 and abs(sum(fb) - 1.0) < 1e-6
    fa = audio_feature_decoder(b"\xff\xe0garbage-with-no-real-frame", {})
    assert len(fa) == 16 and abs(sum(fa) - 1.0) < 1e-6


def test_gif_decoder_roundtrip_all_variants():
    """gif_decode inverts synth_gif exactly across plain / interlaced /
    local-palette / transparent variants (pixels checked against the
    closed-form pattern + palette), and LZW survives the 4096-entry
    dictionary reset on a large frame."""
    import numpy as np

    from crawl4ai_spark.operators.multimodal import (
        gif_decode,
        gif_pattern_indices,
        synth_gif,
    )

    pal = np.array(
        [((i * 40 + 15) % 256, (i * 80 + 7) % 256, (i * 25 + 90) % 256)
         for i in range(8)],
        np.uint8,
    )
    cases = [
        (10, 7, 3, {}),
        (13, 11, 5, {"interlace": True}),
        (8, 8, 1, {"local_palette": True}),
        (9, 6, 2, {"transparent": True}),
        (257, 131, 9, {"interlace": True, "local_palette": True}),  # >4096 codes
    ]
    for w, h, seed, kw in cases:
        gw, gh, gc, pix = gif_decode(synth_gif(w, h, seed, **kw))
        assert (gw, gh, gc) == (w, h, 3)
        idx = np.frombuffer(gif_pattern_indices(w, h, seed), np.uint8).reshape(h, w)
        exp = pal[idx]
        if kw.get("transparent"):  # index 7 composited to background (index 0)
            exp = np.where((idx == 7)[:, :, None], pal[0], exp)
        assert np.array_equal(np.frombuffer(pix, np.uint8).reshape(h, w, 3), exp), kw


def test_gif_decoder_rejects_malformed_falls_back_in_pipeline():
    import struct

    import pytest as _pytest

    from crawl4ai_spark.operators.multimodal import (
        gif_decode,
        image_feature_decoder,
        synth_gif,
    )

    ok = synth_gif(6, 5, seed=1)
    for bad in (b"GIF89a", ok[:20], b"GIF89a" + bytes(7) + b"\x3b"):
        with _pytest.raises(ValueError):
            gif_decode(bad)
    # a GIF whose image data is stripped still yields probe features
    # (dimension + byte stats) through the decoder ladder, decode_ok path
    headerless = b"GIF89a" + struct.pack("<HH", 40, 25) + b"\x00\x00\x00"
    f = image_feature_decoder(headerless, {})
    assert f[0] == 40.0 and f[1] == 25.0 and len(f) == 16
    # and a well-formed GIF yields exact-pixel features
    f2 = image_feature_decoder(ok, {})
    assert f2[0] == 6.0 and f2[1] == 5.0 and f2[2] == 3.0


def test_real_codecs_through_pipeline_on_synth_table(spark):
    """synth_media_table's even ids carry real PNG/WAV/y4m payloads: the
    distributed stage must decode them with the format-true feature
    layout, while odd ids keep the fallback (all decode_ok)."""
    from crawl4ai_spark.operators.multimodal import extract_media_features, synth_media_table

    media = synth_media_table(spark, n=24)
    got = {r.media_id: r for r in extract_media_features(media).collect()}
    assert all(r.decode_ok for r in got.values())
    for i, r in got.items():
        assert len(r.features) == 16
        if i % 2 == 0:
            if r.kind == "image":     # [w, h, channels, ...]
                if i % 12 == 0:       # PNG rows
                    assert r.features[0] == float(8 + i % 4) and r.features[2] == 3.0
                elif i % 36 == 18:    # GIF rows (real LZW pixel decode)
                    assert r.features[0] == float(10 + i % 7)
                    assert r.features[1] == float(7 + i % 5)
                    assert r.features[2] == 3.0
                else:                 # baseline-JPEG rows (16x16 flat quads)
                    assert r.features[0] == 16.0 and r.features[1] == 16.0
                    assert r.features[2] == 3.0
                    base = (i * 29) % 200 + 20
                    assert r.features[3] == float(base + 15)  # mean of 4 quads
            elif r.kind == "audio":   # [rate, ch, n_frames, ...]
                assert r.features[0] == 8000.0 and r.features[2] == float(160 + (i % 5) * 40)
            else:                     # [w, h, n_sampled, fps, stride, ...]
                assert r.features[0] == float(4 + 2 * (i % 3))
                assert r.features[3] == 25.0 and r.features[4] == 2.0
                assert r.features[2] == float(-(-(3 + i % 4) // 2))  # ceil(n/stride)


def test_bpe_token_count_gpt2ish_segmentation(spark):
    from pyspark.sql import functions as F

    from crawl4ai_spark.operators.textstats import bpe_token_count_col

    texts = ["it's here", "hello world", "", "a1b2", "x  y", "foo-bar, baz!"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r[0] for r in df.select(bpe_token_count_col(F.col("text"))).collect()]
    import re

    # cross-check against Python's re on the same strings (\p classes
    # approximated with ASCII-equivalent classes; inputs are ASCII)
    pat = re.compile(r"'(?:s|t|re|ve|m|ll|d)| ?[^\W\d_]+| ?\d+| ?[^\s\w]+|\s+")
    assert got == [len(pat.findall(t)) for t in texts]
    # contraction split: [it]['s][ here]
    assert got[0] == 3


def test_cosine_neardup_lsh_precision_recall_and_cap(spark):
    """Banded hyperplane LSH near-dup pairs: output ⊆ exact all-pairs
    answer (precision 1 by construction — candidates are exact-verified),
    recall high on genuinely-near pairs (clustered vectors), and the
    degenerate-bucket cap bounds candidate blowup with an audit view."""
    import numpy as np

    from crawl4ai_spark.operators.similarity import (
        cosine_neardup_lsh_pairs,
        cosine_pairs_above,
        hyperplane_banded_buckets,
        lsh_pair_bucket_stats,
    )

    rng = np.random.RandomState(11)
    centers = rng.standard_normal((6, 24))
    rows, vid = [], 0
    for c in range(6):
        for _ in range(12):
            v = centers[c] + 0.08 * rng.standard_normal(24)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    exact = {(r.id_a, r.id_b) for r in cosine_pairs_above(df, 0.9).collect()}
    approx = {
        (r.id_a, r.id_b)
        for r in cosine_neardup_lsh_pairs(df, threshold=0.9, dim=24).collect()
    }
    assert approx <= exact  # precision 1: every emitted pair is verified
    assert exact, "test corpus must contain near pairs"
    assert len(approx) / len(exact) >= 0.8, (len(approx), len(exact))

    # degenerate bucket: 40 copies of one vector → B²/2 candidates uncapped;
    # the cap drops the clique while a distinct near pair (two clustered
    # vectors from above) still collides in its own bucket
    clone = [float(x) for x in centers[0]]
    rows2 = [(i, clone) for i in range(40)] + [
        (100, rows[0][1]),
        (101, rows[1][1]),
    ]
    df2 = spark.createDataFrame(rows2, "vec_id long, embedding array<double>")
    capped = {
        (r.id_a, r.id_b)
        for r in cosine_neardup_lsh_pairs(
            df2, threshold=0.9, dim=24, max_bucket_size=10
        ).collect()
    }
    assert (100, 101) in capped
    assert all(not (a < 40 and b < 40) for a, b in capped)
    # audit view reports the oversized clique buckets before capping
    stats = lsh_pair_bucket_stats(hyperplane_banded_buckets(df2, dim=24)).collect()
    assert any(r.size >= 40 for r in stats)


def test_semantic_dedup_matches_numpy_rule(spark):
    """Kept set equals the SemDeDup upper-triangular rule recomputed in
    numpy over the same cell assignment; distinct cluster centers all
    survive; result is deterministic across runs."""
    import numpy as np

    from crawl4ai_spark.operators.similarity import (
        ivf_assign,
        kmeans_centroids,
        semantic_dedup,
    )

    rng = np.random.RandomState(3)
    centers = rng.standard_normal((4, 16))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows, vid = [], 0
    for c in range(4):
        for _ in range(15):
            v = centers[c] + 0.05 * rng.standard_normal(16)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cents = kmeans_centroids(df, k=4)
    kept = sorted(r.vec_id for r in semantic_dedup(df, centroids=cents, threshold=0.98).collect())
    kept2 = sorted(r.vec_id for r in semantic_dedup(df, centroids=cents, threshold=0.98).collect())
    assert kept == kept2  # deterministic

    # numpy reference: same cells, same upper-triangular drop rule
    cells = {r.vec_id: r.ivf_cell for r in ivf_assign(df, cents).collect()}
    vecs = {i: np.asarray(v) for i, v in rows}
    expect = []
    for i, _ in rows:
        dropped = False
        for j, _ in rows:
            if j < i and cells[j] == cells[i]:
                a, b = vecs[i], vecs[j]
                sim = round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)
                if sim >= 0.98:
                    dropped = True
                    break
        if not dropped:
            expect.append(i)
    assert kept == expect
    # every cluster keeps at least its first member; tight clusters shrink
    assert len(kept) < 60 and all(any(cells[i] == c for i in kept) for c in set(cells.values()))


def test_cosine_neardup_lsh_null_embedding_dim_inference(spark):
    from crawl4ai_spark.operators.similarity import cosine_neardup_lsh_pairs

    rows = [(0, None), (1, [1.0, 0.0, 0.0]), (2, [0.99, 0.1, 0.0]), (3, [0.0, 1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").coalesce(1)
    pairs = cosine_neardup_lsh_pairs(df.where("embedding is not null"), threshold=0.8)
    # dim inferred despite the NULL row being first in layout order
    pairs2 = cosine_neardup_lsh_pairs(df, threshold=0.8)
    assert pairs.count() >= 1 and pairs2.count() >= 1


def test_robots_wildcard_and_anchor_rules(spark):
    """Reference parity for its RuleLine monkey-patch (utils.py:57-73):
    '*' globs and trailing '$' anchors — stock urllib percent-encodes '*'
    so such rules silently never match."""
    from crawl4ai_spark.operators.robots import attach_robots_verdict

    rules = "\n".join([
        "User-agent: *",
        "Disallow: /*.png",
        "Disallow: /doc/*.pdf$",
        "Disallow: /private/*/tmp",
        "Disallow: /literal",
    ])
    robots = spark.createDataFrame([("h.test", rules)], "host string, rules_text string")
    urls = [
        ("h.test", "http://h.test/img/x.png", False),     # '*' glob matches
        ("h.test", "http://h.test/img/x.pngx", False),    # glob is prefix-anchored only
        # reference quirk pinned: '$' is percent-quoted before the patch
        # sees it, so '$'-anchored rules never match anything
        ("h.test", "http://h.test/doc/a.pdf", True),
        ("h.test", "http://h.test/private/a/tmp", False), # mid-path glob
        ("h.test", "http://h.test/private/a/keep", True),
        ("h.test", "http://h.test/literal/x", False),     # plain prefix rule intact
        ("h.test", "http://h.test/ok", True),
    ]
    wave = spark.createDataFrame(
        [(h, u) for h, u, _ in urls], "host string, url string"
    )
    got = {
        r.url: r.robots_allowed
        for r in attach_robots_verdict(wave, robots, apply_ttl=False).collect()
    }
    for _h, u, want in urls:
        assert got[u] is want, u


def test_sessionize_gap_boundaries(spark):
    from datetime import datetime, timedelta

    from crawl4ai_spark.operators.sessions import session_stats, sessionize

    t0 = datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        # user 1: gap exactly 30min -> SAME session; 30min+1s -> new
        (1, 1, t0),
        (2, 1, t0 + timedelta(minutes=30)),
        (3, 1, t0 + timedelta(minutes=60, seconds=1)),
        # user 2: single event
        (4, 2, t0),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {r.event_id: r.session_seq for r in sessionize(df).collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 0}
    stats = {(r.user_id, r.session_seq): r for r in session_stats(df).collect()}
    assert stats[(1, 0)].n_events == 2 and stats[(1, 0)].duration_s == 1800.0
    assert stats[(1, 1)].n_events == 1 and stats[(1, 1)].duration_s == 0.0
    assert stats[(2, 0)].n_events == 1
    # plan: per-user window only — no unpartitioned window, one exchange
    plan = sessionize(df)._jdf.queryExecution().executedPlan().toString()
    assert "user_id" in plan


def test_winnowing_guarantee_and_robustness(spark):
    """Winnowing guarantee: two docs sharing a token run of at least
    window+k-1 words share at least one fingerprint; disjoint docs share
    none; and fingerprints are position-robust (prefix shift preserves
    the shared set's non-emptiness)."""
    from crawl4ai_spark.operators.textstats import winnow_fingerprints

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [
        (1, "intro words before anything " + shared + " trailing words here"),
        (2, shared + " completely different ending text follows now"),
        (3, "nothing common with others whatsoever kiwi mango papaya lemon grape melon"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(df, k=5, window=4)
    by_doc = {
        i: {r.fingerprint for r in fps.where(F.col("doc_id") == i).collect()}
        for i in (1, 2, 3)
    }
    assert by_doc[1] & by_doc[2], "shared 10-token run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])


def test_funnel_steps_ordering_semantics(spark):
    from datetime import datetime, timedelta

    from crawl4ai_spark.operators.sessions import funnel_steps

    t0 = datetime(2026, 1, 1)
    m = lambda k: t0 + timedelta(minutes=k)
    rows = [
        # user 1: full ordered funnel
        (1, m(0), "view"), (1, m(1), "click"), (1, m(2), "purchase"),
        # user 2: purchase BEFORE click -> depth 2 only
        (2, m(0), "view"), (2, m(1), "purchase"), (2, m(2), "click"),
        # user 3: click without view -> depth 0
        (3, m(0), "click"), (3, m(1), "purchase"),
        # user 4: repeated steps, greedy-min still finds the chain
        (4, m(0), "view"), (4, m(1), "view"), (4, m(2), "click"), (4, m(3), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r.user_id: r for r in funnel_steps(df, ["view", "click", "purchase"]).collect()}
    assert got[1].funnel_depth == 3
    assert got[2].funnel_depth == 2 and got[2].step_3_ts is None
    assert got[3].funnel_depth == 0 and got[3].step_1_ts is None
    assert got[4].funnel_depth == 3 and got[4].step_1_ts == m(0)


def test_funnel_steps_repeated_step_names(spark):
    """A step name appearing at two funnel positions (view→click→view)
    must be matchable at BOTH — the fold compares the event type against
    the slot the chain is at, not a precomputed per-event index."""
    from datetime import datetime, timedelta

    from crawl4ai_spark.operators.sessions import funnel_steps

    t0 = datetime(2026, 1, 1)
    m = lambda k: t0 + timedelta(minutes=k)
    rows = [
        # user 1: view@10, click@20, view@30 -> full depth 3
        (1, m(10), "view"), (1, m(20), "click"), (1, m(30), "view"),
        # user 2: view, click only -> depth 2 (second view missing)
        (2, m(0), "view"), (2, m(5), "click"),
        # user 3: click, view, view -> depth 0 then chain from first view?
        # no: step 1 is view -> first view@5 starts, no click after -> depth 1
        (3, m(0), "click"), (3, m(5), "view"), (3, m(6), "view"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r.user_id: r for r in funnel_steps(df, ["view", "click", "view"]).collect()}
    assert got[1].funnel_depth == 3 and got[1].step_3_ts == m(30)
    assert got[2].funnel_depth == 2 and got[2].step_3_ts is None
    assert got[3].funnel_depth == 1 and got[3].step_1_ts == m(5)


def test_funnel_steps_null_ts_ignored(spark):
    """Events with a NULL timestamp are dropped before the fold — a NULL
    in slot 1 used to NULL-poison every later ts comparison and block the
    funnel forever."""
    from datetime import datetime, timedelta

    from crawl4ai_spark.operators.sessions import funnel_steps

    t0 = datetime(2026, 1, 1)
    m = lambda k: t0 + timedelta(minutes=k)
    rows = [
        (1, None, "view"), (1, m(10), "view"), (1, m(20), "click"),
        (2, None, "view"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r.user_id: r for r in funnel_steps(df, ["view", "click"]).collect()}
    assert got[1].funnel_depth == 2 and got[1].step_1_ts == m(10)
    assert got[2].funnel_depth == 0 and got[2].step_1_ts is None


def test_xxhash64_longs_matches_spark(spark):
    """The pure-Python xxhash64 fold (functions/fingerprint.py) must agree
    with Spark's native xxhash64 on bigint inputs — single value and the
    seed-chained two-value fold the kmeans sampler uses."""
    from pyspark.sql import functions as F

    from crawl4ai_spark.functions.fingerprint import xxhash64_longs

    vals = [0, 1, -1, 42, 2**63 - 1, -(2**63), 2**62, -(2**62),
            123456789, -987654321, 0xDEADBEEF, 7]
    rows = (
        spark.createDataFrame([(v,) for v in vals], "v long")
        .select(
            "v",
            F.xxhash64("v").alias("h1"),
            F.xxhash64("v", F.lit(42).cast("long")).alias("h2"),
            F.xxhash64("v", F.lit(7).cast("long")).alias("h7"),
        )
        .collect()
    )
    for r in rows:
        assert r.h1 == xxhash64_longs(r.v)
        assert r.h2 == xxhash64_longs(r.v, 42)
        assert r.h7 == xxhash64_longs(r.v, 7)


def test_kmeans_centroids_offline_replica_matches_spark(spark, tmp_path):
    """__spark_entry__._kmeans_centroids_offline must reproduce
    kmeans_centroids bit-for-bit from the parquet alone (this equality is
    what makes the semantic_dedup / ivf_topk centroid-literal oracles
    legitimate)."""
    import os

    import numpy as np

    import __spark_entry__ as entrymod
    from crawl4ai_spark.operators.similarity import kmeans_centroids

    rng = np.random.RandomState(7)
    data = [(int(i), [float(x) for x in rng.standard_normal(8)]) for i in range(200)]
    df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    # single-file parquet like the driver's testdata (duckdb reads the path
    # as one file, not a Spark part-file directory)
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {"vec_id": [r[0] for r in data], "embedding": [r[1] for r in data]}
        ),
        str(tmp_path / "embeddings.parquet"),
    )

    want = kmeans_centroids(df, k=5, iters=4)
    old = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR")
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = str(tmp_path)
    try:
        got, rows = entrymod._kmeans_centroids_offline(k=5, iters=4)
    finally:
        if old is None:
            os.environ.pop("SPARK_GRAFT_ORACLE_SF_DIR", None)
        else:
            os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = old
    assert len(rows) == 200
    assert np.array_equal(want, got)


def test_funnel_steps_leaves_no_cached_frames(spark):
    """funnel_steps is a single-shuffle fold — it must not persist
    anything (the old N-step-agg shape leaked one cache entry per step)."""
    from datetime import datetime, timedelta

    from crawl4ai_spark.operators.sessions import funnel_steps

    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    t0 = datetime(2026, 1, 1)
    rows = [(u, t0 + timedelta(minutes=k), e)
            for u in range(5)
            for k, e in enumerate(["view", "click", "purchase"])]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = funnel_steps(df, ["view", "click", "purchase"]).collect()
    assert len(got) == 5 and all(r.funnel_depth == 3 for r in got)
    assert jsc.getPersistentRDDs().size() == before


def test_ngram_jaccard_count_path_shingle_freq_cap(spark):
    """1,000 docs all sharing one boilerplate shingle: the capped count
    path must (a) keep every pair that shares a sub-cap shingle, with
    EXACT jaccard over the full sets, (b) drop pairs whose only common
    shingle is the boilerplate one, and (c) expose the would-be-dropped
    shingle in the audit view."""
    from crawl4ai_spark.operators.dedup import ngram_jaccard_pairs, shingle_freq_stats

    boiler = "accept all cookies"
    rows = []
    # 996 unrelated docs that share ONLY the boilerplate shingle
    for i in range(996):
        rows.append((i, f"{boiler} unique{i} words{i} here{i} now{i}"))
    # two true near-dup pairs sharing plenty of sub-cap shingles
    rows.append((2001, boiler + " spark frontier crawl wave page link host"))
    rows.append((2002, boiler + " spark frontier crawl wave page link budget"))
    rows.append((2003, boiler + " alpha beta gamma delta epsilon zeta eta"))
    rows.append((2004, boiler + " alpha beta gamma delta epsilon zeta theta"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            docs, threshold=0.1, prefix_filter=False, max_shingle_freq=100
        ).collect()
    }
    # the near-dup pairs survive; nothing that only shares the boilerplate
    assert set(capped) == {(2001, 2002), (2003, 2004)}
    # jaccard is exact over the FULL sets: 8 shingles each (1 boilerplate-
    # spanning window differs... compute from the uncapped exact path)
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            docs.where(F.col("doc_id") >= 2001), threshold=0.1, prefix_filter=False
        ).collect()
    }
    assert capped == {p: exact[p] for p in capped}
    # audit view: the boilerplate shingle's frequency is visible pre-cap
    stats = shingle_freq_stats(docs, min_freq=500).collect()
    assert len(stats) >= 1 and max(r.size for r in stats) == 1000


def test_funnel_steps_numeric_ts_column(spark):
    """funnel_steps must accept non-timestamp ts columns (bigint epoch
    seconds) — the accumulator is typed from the input (round-4 review
    finding: a hardcoded array<timestamp> broke analysis)."""
    from crawl4ai_spark.operators.sessions import funnel_steps

    events = spark.createDataFrame(
        [(1, 10, "view"), (1, 20, "click"), (1, 30, "buy"), (2, 5, "click")],
        "user_id long, ts long, event_type string",
    )
    rows = {r.user_id: r for r in funnel_steps(events, ["view", "click", "buy"]).collect()}
    assert rows[1].funnel_depth == 3 and rows[1].step_3_ts == 30
    assert rows[2].funnel_depth == 0


def test_semantic_dedup_custom_id_col(spark):
    """semantic_dedup must forward id_col to the centroid trainer
    (round-4 review finding: frames without a 'vec_id' column crashed)."""
    import numpy as np

    from crawl4ai_spark.operators.similarity import semantic_dedup

    rng = np.random.RandomState(0)
    rows = [(i, rng.standard_normal(8).tolist()) for i in range(40)]
    emb = spark.createDataFrame(rows, "doc_id long, embedding array<double>")
    kept = semantic_dedup(emb, k=4, threshold=0.99, id_col="doc_id")
    assert kept.count() <= 40 and "doc_id" in kept.columns
