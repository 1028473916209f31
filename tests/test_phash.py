"""Perceptual image hashing + near-dup candidates (operators/phash.py).

Hash functions are pinned against hand-derivable bit patterns and
cross-format invariants; the banding operator is pinned against a
brute-force all-pairs Hamming scan (the pigeonhole exactness claim)."""

import numpy as np
import pytest

from crawl4ai_spark.operators.phash import (
    _bmp_encode,
    _png_encode_rgb,
    ahash64,
    dhash64,
    hash_image_payload,
    image_hashes,
    phash64,
    phash_neardup_candidates,
    resize_bilinear,
    resize_images,
    synth_image_corpus,
    to_gray,
)


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


# ── numpy core ───────────────────────────────────────────────────────────


def test_resize_identity_when_size_unchanged():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, size=(12, 17)).astype("float64")
    out = resize_bilinear(img, 12, 17)
    assert np.allclose(out, img)


def test_resize_downscale_averages_constant_blocks():
    # 2×2 constant blocks halve to exactly the block values under the
    # half-pixel-center convention (sample points land on block centers)
    img = np.kron(np.array([[10.0, 50.0], [90.0, 130.0]]), np.ones((2, 2)))
    out = resize_bilinear(img, 2, 2)
    assert np.allclose(out, [[10.0, 50.0], [90.0, 130.0]])


def test_ahash_hand_computed_on_native_8x8():
    # already 8×8 → resize is identity; mean of [0..63] is 31.5 so bits
    # 32..63 are set → hash = 0x00000000FFFFFFFF
    g = np.arange(64, dtype="float64").reshape(8, 8)
    assert ahash64(g) == 0x00000000FFFFFFFF


def test_dhash_hand_computed_on_native_9x8():
    # strictly increasing rows → every gradient positive → all 64 bits
    # set → signed -1; strictly decreasing → 0
    inc = np.tile(np.arange(9, dtype="float64"), (8, 1))
    dec = inc[:, ::-1].copy()
    assert dhash64(inc) == -1
    assert dhash64(dec) == 0


def test_phash_constant_image_sets_only_dc_bit():
    # constant image: all AC coefficients 0, DC > 0, median 0 → exactly
    # the MSB (row-major first coefficient) set
    g = np.full((32, 32), 77.0)
    assert phash64(g) == -(1 << 63)  # signed two's complement of bit 63
    # brightness-shifted constant image hashes identically
    assert phash64(np.full((32, 32), 200.0)) == phash64(g)


def test_gray_weights_bt601():
    pix = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 10, 10])
    g = to_gray(2, 2, 3, pix)
    assert np.allclose(g.reshape(-1), [0.299 * 255, 0.587 * 255, 0.114 * 255, 10.0])


def test_cross_format_exact_duplicate_same_hashes():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
    h_bmp = hash_image_payload(_bmp_encode(arr))
    h_png = hash_image_payload(_png_encode_rgb(arr))
    assert h_bmp is not None and h_png is not None
    assert h_bmp == h_png  # width, height and all three hashes


def test_near_duplicate_small_hamming_independent_far():
    from crawl4ai_spark.operators.phash import _base_pixels

    base = _base_pixels(seed=42)
    edited = base.copy()
    edited[8:16, 8:16] = np.clip(edited[8:16, 8:16].astype("int64") + 14, 0, 255).astype(
        np.uint8
    )
    other = _base_pixels(seed=43)
    hb = hash_image_payload(_bmp_encode(base))
    he = hash_image_payload(_bmp_encode(edited))
    ho = hash_image_payload(_bmp_encode(other))
    d_near = _hamming(hb[4], he[4])
    d_far = _hamming(hb[4], ho[4])
    assert d_near <= 7, d_near
    assert d_far > 12, d_far


def test_opaque_and_tiny_payloads_return_none():
    assert hash_image_payload(b"not an image at all") is None
    one_px = _bmp_encode(np.zeros((1, 1, 3), dtype=np.uint8))
    assert hash_image_payload(one_px) is None


# ── Spark operators ──────────────────────────────────────────────────────


@pytest.fixture(scope="module")
def corpus_hashes(spark):
    corpus = synth_image_corpus(60)
    media = spark.createDataFrame(corpus, "media_id long, payload binary")
    return image_hashes(media).cache()


def test_image_hashes_matches_driver_mirror(spark, corpus_hashes):
    rows = {r["media_id"]: r for r in corpus_hashes.collect()}
    assert len(rows) == 60
    for mid, payload in synth_image_corpus(60):
        expect = hash_image_payload(payload)
        got = rows[mid]
        if expect is None:
            assert not got["decode_ok"] and got["phash"] is None
        else:
            assert got["decode_ok"]
            assert (
                got["width"],
                got["height"],
                got["ahash"],
                got["dhash"],
                got["phash"],
            ) == expect


def test_neardup_candidates_equal_bruteforce_all_pairs(spark, corpus_hashes):
    got = {
        (r["media_id_a"], r["media_id_b"], r["hamming"])
        for r in phash_neardup_candidates(corpus_hashes, max_hamming=7).collect()
    }
    hs = [
        (r["media_id"], r["phash"])
        for r in corpus_hashes.collect()
        if r["phash"] is not None
    ]
    brute = set()
    for i in range(len(hs)):
        for j in range(i + 1, len(hs)):
            (ia, ha), (ib, hb) = hs[i], hs[j]
            if ia > ib:
                ia, ib, ha, hb = ib, ia, hb, ha
            d = _hamming(ha, hb)
            if d <= 7:
                brute.add((ia, ib, d))
    assert got == brute
    assert brute, "corpus must plant at least one near-dup pair"
    assert any(d == 0 for _, _, d in brute), "planted cross-format exact dup"


def test_neardup_banding_exactness_on_synthetic_hashes(spark):
    # adversarial hash-domain corpus: random 64-bit values + planted
    # neighbors at every distance 0..7 (bits spread across bands)
    rng = np.random.default_rng(7)
    vals = [int(v) for v in rng.integers(-(2**63), 2**63, size=40, dtype=np.int64)]
    rows = [(i, v) for i, v in enumerate(vals)]
    nid = len(rows)
    for d in range(8):
        base = vals[d]
        flip = base
        for k in range(d):
            flip ^= 1 << (k * 9 + 3)  # bits land in different 8-bit bands
        rows.append((nid + d, flip))
    df = spark.createDataFrame(rows, "media_id long, phash long")
    got = {
        (r["media_id_a"], r["media_id_b"], r["hamming"])
        for r in phash_neardup_candidates(df, max_hamming=7).collect()
    }
    brute = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            d = _hamming(rows[i][1], rows[j][1])
            if d <= 7:
                brute.add((rows[i][0], rows[j][0], d))
    assert got == brute
    assert len(brute) >= 8


def test_neardup_threshold_above_band_bound_raises(spark, corpus_hashes):
    with pytest.raises(ValueError):
        phash_neardup_candidates(corpus_hashes, max_hamming=8, n_bands=8)


def test_neardup_band_freq_cap_drops_flat_bucket(spark):
    # 30 identical hashes (spacer-gif pathology) + one true near pair
    # far (>7 bits) from the flat group so expected pair sets are exact
    v = 0x5555555555550000
    rows = [(i, 12345) for i in range(30)] + [(100, v), (101, v ^ 3)]
    df = spark.createDataFrame(rows, "media_id long, phash long")
    capped = phash_neardup_candidates(df, max_hamming=7, max_band_freq=10).collect()
    got = {(r["media_id_a"], r["media_id_b"]) for r in capped}
    assert got == {(100, 101)}  # flat bucket audited away, real pair kept
    full = phash_neardup_candidates(df, max_hamming=7).count()
    assert full == 30 * 29 // 2 + 1  # flat-group all-pairs + the real pair


def test_neardup_plan_has_no_cross_join(spark, corpus_hashes):
    plan = phash_neardup_candidates(corpus_hashes)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_resize_images_operator(spark):
    corpus = synth_image_corpus(20)
    media = spark.createDataFrame(corpus, "media_id long, payload binary")
    out = {r["media_id"]: r for r in resize_images(media, 16, 12).collect()}
    ok = [r for r in out.values() if r["decode_ok"]]
    assert ok and all(len(r["pixels"]) == 16 * 12 * 3 for r in ok)
    # poison rows keep the contract
    bad = [r for r in out.values() if not r["decode_ok"]]
    assert bad and all(r["pixels"] is None for r in bad)
    # pixel values equal the driver-side mirror for one row
    mid, payload = next((m, p) for m, p in corpus if hash_image_payload(p) is not None)
    from crawl4ai_spark.operators.multimodal import decode_image_pixels

    w, h, c, pix = decode_image_pixels(payload)
    arr = np.frombuffer(pix, dtype=np.uint8).reshape(h, w, c).astype("float64")
    expect = np.clip(np.rint(resize_bilinear(arr, 12, 16)), 0, 255).astype(np.uint8)
    assert out[mid]["pixels"] == expect.tobytes()


# ── video near-dup ───────────────────────────────────────────────────────


def _video_frame_hashes_driver(corpus, stride=2):
    """Driver-side mirror: y4m decode + phash64 per sampled luma plane."""
    from crawl4ai_spark.operators.multimodal import y4m_decode
    from crawl4ai_spark.operators.phash import phash64

    rows = []
    for mid, payload in corpus:
        try:
            w, h, _fps, lumas = y4m_decode(payload, stride)
        except ValueError:
            continue
        for k, luma in enumerate(lumas):
            g = np.frombuffer(luma, dtype=np.uint8).reshape(h, w).astype("float64")
            rows.append((mid, k, phash64(g)))
    return rows


@pytest.fixture(scope="module")
def video_frames(spark):
    from crawl4ai_spark.operators.phash import synth_video_corpus, video_frame_hashes

    corpus = synth_video_corpus(24)
    media = spark.createDataFrame(corpus, "media_id long, payload binary")
    return corpus, video_frame_hashes(media, frame_stride=2).cache()


def test_video_frame_hashes_match_driver_mirror(spark, video_frames):
    corpus, frames = video_frames
    got = {(r["media_id"], r["frame_idx"], r["phash"]) for r in frames.collect()}
    expect = set(_video_frame_hashes_driver(corpus))
    assert got == expect
    # poison rows (every 7th) contribute zero rows
    poisoned = {m for m, _ in corpus if m % 7 == 5}
    assert poisoned and not {m for m, _, _ in got} & poisoned


def _brute_video_pairs(rows, max_hamming, min_frac):
    from collections import defaultdict

    by_vid = defaultdict(dict)
    for mid, k, h in rows:
        by_vid[mid][k] = h
    vids = sorted(by_vid)
    out = {}
    for i in range(len(vids)):
        for j in range(i + 1, len(vids)):
            a, b = vids[i], vids[j]
            fa, fb = by_vid[a], by_vid[b]
            matched = sum(
                1
                for k in set(fa) & set(fb)
                if _hamming(fa[k], fb[k]) <= max_hamming
            )
            frac = matched / max(len(fa), len(fb))
            if frac >= min_frac:
                out[(a, b)] = (matched, len(fa), len(fb), frac)
    return out


def test_video_neardup_equals_bruteforce(spark, video_frames):
    from crawl4ai_spark.operators.phash import video_neardup_candidates

    corpus, frames = video_frames
    for min_frac in (0.8, 0.4):
        got = {
            (r["media_id_a"], r["media_id_b"]): (
                r["n_matched"], r["n_frames_a"], r["n_frames_b"], r["match_frac"],
            )
            for r in video_neardup_candidates(
                frames, max_hamming=7, min_match_frac=min_frac
            ).collect()
        }
        brute = _brute_video_pairs(
            _video_frame_hashes_driver(corpus), 7, min_frac
        )
        assert set(got) == set(brute)
        for k, (m, na, nb, fr) in brute.items():
            gm, gna, gnb, gfr = got[k]
            assert (gm, gna, gnb) == (m, na, nb)
            assert abs(gfr - fr) < 1e-12
    assert brute, "corpus must plant video near-dups"


def test_video_neardup_planted_structure(spark, video_frames):
    from crawl4ai_spark.operators.phash import video_neardup_candidates

    corpus, frames = video_frames
    pairs_strict = {
        (r["media_id_a"], r["media_id_b"])
        for r in video_neardup_candidates(frames, min_match_frac=0.8).collect()
    }
    # every planted whole-clip near-dup (i%4==1 edits of i-1) is found
    planted = {
        (i - 1, i)
        for i, _ in corpus
        if i % 4 == 1 and i % 7 != 5 and (i - 1) % 7 != 5
    }
    assert planted <= pairs_strict
    # the half-overlap clips (i%8==3) sit at frac 0.5: excluded at 0.8
    partial = {(i - 1, i) for i, _ in corpus if i % 8 == 3 and i % 4 != 1}
    assert not partial & pairs_strict


def test_video_neardup_plan_has_no_cross_join(spark, video_frames):
    from crawl4ai_spark.operators.phash import video_neardup_candidates

    _, frames = video_frames
    plan = (
        video_neardup_candidates(frames)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_video_neardup_threshold_above_band_bound_raises(spark, video_frames):
    from crawl4ai_spark.operators.phash import video_neardup_candidates

    _, frames = video_frames
    with pytest.raises(ValueError):
        video_neardup_candidates(frames, max_hamming=8, n_bands=8)


def test_decode_image_pixels_dispatch():
    from crawl4ai_spark.operators.multimodal import decode_image_pixels, synth_gif, synth_png

    w, h, c, pix = decode_image_pixels(synth_png(8, 6, seed=1))
    assert (w, h) == (8, 6) and len(pix) == 8 * 6 * c
    w, h, c, pix = decode_image_pixels(synth_gif(10, 7, seed=2))
    assert (w, h) == (10, 7) and len(pix) == 10 * 7 * c
    assert decode_image_pixels(b"\x00\x01garbage") is None


# ── time-shift-invariant video near-dup ──────────────────────────────────


def _shifted_video_corpus(n_frames: int = 16):
    """Deterministic (media_id, payload) corpus with planted TIME-SHIFTED
    structure the frame-aligned matcher cannot see (frame_stride=2
    sampling ⇒ a 2s-raw-frame trim is an s-sampled-frame offset):

    - id 0: base clip, temporally-evolving low-pass field.
    - id 1: id 0 trimmed by 6 raw frames (3 sampled) + fresh tail →
      true sampled offset fa−fb = +3 for (a=0, b=1).
    - id 2: id 0 trimmed by 4 raw frames AND brightness-stamped (the
      logo analogue) → offset +2 with hamming>0 frames.
    - ids 3..8: independent clips (no consistent offset).
    """
    from crawl4ai_spark.operators.phash import _base_pixels, _y4m_encode

    def evolving(seed, count):
        base = _base_pixels(seed=seed, w=64, h=48)[:, :, 0].astype("float64")
        drift = _base_pixels(seed=seed + 500, w=64, h=48)[:, :, 0].astype("float64")
        return [
            np.clip(
                np.rint(base * (1 - k / (2 * count)) + drift * (k / (2 * count))),
                0,
                255,
            ).astype(np.uint8)
            for k in range(count)
        ]

    base = evolving(9000, n_frames)
    out = [(0, _y4m_encode(base))]
    trimmed = base[6:] + evolving(9100, 6)
    out.append((1, _y4m_encode(trimmed)))
    stamped = []
    for f in base[4:]:
        g = f.copy()
        g[8:16, 8:16] = np.clip(g[8:16, 8:16].astype("int64") + 14, 0, 255).astype(np.uint8)
        stamped.append(g)
    out.append((2, _y4m_encode(stamped + evolving(9200, 4))))
    for i in range(3, 9):
        out.append((i, _y4m_encode(evolving(9300 + i * 37, n_frames))))
    return out


def _brute_shifted_pairs(rows, max_hamming, min_matched, min_frac):
    """Independent python reference: per pair, histogram hamming-matched
    frames by offset, keep (max matches, then smallest offset)."""
    from collections import defaultdict

    by_vid = defaultdict(dict)
    for mid, k, h in rows:
        by_vid[mid][k] = h
    vids = sorted(by_vid)
    out = {}
    for i in range(len(vids)):
        for j in range(i + 1, len(vids)):
            a, b = vids[i], vids[j]
            fa, fb = by_vid[a], by_vid[b]
            hist = defaultdict(int)
            for ka, ha in fa.items():
                for kb, hb in fb.items():
                    if _hamming(ha, hb) <= max_hamming:
                        hist[ka - kb] += 1
            if not hist:
                continue
            off, m = max(hist.items(), key=lambda kv: (kv[1], -kv[0]))
            frac = m / min(len(fa), len(fb))
            if m >= min_matched and frac >= min_frac:
                out[(a, b)] = (off, m, len(fa), len(fb), frac)
    return out


@pytest.fixture(scope="module")
def shifted_frames(spark):
    from crawl4ai_spark.operators.phash import video_frame_hashes

    corpus = _shifted_video_corpus()
    media = spark.createDataFrame(corpus, "media_id long, payload binary")
    return corpus, video_frame_hashes(media, frame_stride=2).cache()


def test_video_shifted_equals_bruteforce(spark, shifted_frames):
    from crawl4ai_spark.operators.phash import video_neardup_shifted

    corpus, frames = shifted_frames
    rows = _video_frame_hashes_driver(corpus)
    for mh, mm, mf in ((7, 4, 0.5), (3, 3, 0.3)):
        got = {
            (r["media_id_a"], r["media_id_b"]): (
                r["offset"], r["n_matched"], r["n_frames_a"], r["n_frames_b"],
                r["match_frac"],
            )
            for r in video_neardup_shifted(
                frames, max_hamming=mh, min_matched_frames=mm, min_match_frac=mf
            ).collect()
        }
        brute = _brute_shifted_pairs(rows, mh, mm, mf)
        assert got.keys() == brute.keys()
        for k, (off, m, na, nb, fr) in brute.items():
            goff, gm, gna, gnb, gfr = got[k]
            assert (goff, gm, gna, gnb) == (off, m, na, nb)
            assert abs(gfr - fr) < 1e-12
    assert brute, "corpus must plant shifted near-dups"


def test_video_shifted_finds_trims_aligned_pass_misses(spark, shifted_frames):
    from crawl4ai_spark.operators.phash import (
        video_neardup_candidates,
        video_neardup_shifted,
    )

    _, frames = shifted_frames
    shifted = {
        (r["media_id_a"], r["media_id_b"]): r["offset"]
        for r in video_neardup_shifted(frames, min_match_frac=0.5).collect()
    }
    # the planted trims surface at their true sampled offsets
    assert shifted.get((0, 1)) == 3
    assert shifted.get((0, 2)) == 2
    # and the frame-ALIGNED matcher cannot see either trim
    aligned = {
        (r["media_id_a"], r["media_id_b"])
        for r in video_neardup_candidates(frames, min_match_frac=0.5).collect()
    }
    assert (0, 1) not in aligned and (0, 2) not in aligned
    # no unrelated pair sneaks in at the default thresholds
    assert all(a in (0, 1, 2) and b in (0, 1, 2) for a, b in shifted)


def test_video_shifted_band_cap_only_removes(spark, shifted_frames):
    from crawl4ai_spark.operators.phash import video_neardup_shifted

    _, frames = shifted_frames
    full = {
        (r["media_id_a"], r["media_id_b"])
        for r in video_neardup_shifted(frames).collect()
    }
    capped = {
        (r["media_id_a"], r["media_id_b"])
        for r in video_neardup_shifted(frames, max_band_freq=3).collect()
    }
    assert capped <= full


def test_video_shifted_plan_and_band_bound(spark, shifted_frames):
    from crawl4ai_spark.operators.phash import video_neardup_shifted

    _, frames = shifted_frames
    plan = (
        video_neardup_shifted(frames)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    with pytest.raises(ValueError):
        video_neardup_shifted(frames, max_hamming=8, n_bands=8)
