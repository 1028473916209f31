"""Audio constellation fingerprinting (operators/afp.py).

The numpy core is pinned against hand-derivable properties (hash
packing, shift covariance); the Spark operators against a brute-force
driver mirror over the deterministic corpus."""

from collections import defaultdict

import numpy as np
import pytest

from crawl4ai_spark.operators.afp import (
    _wav_encode,
    audio_fingerprints,
    audio_neardup_candidates,
    constellation_hashes,
    fingerprint_wav,
    grid_peaks,
    pcm_to_mono_float,
    spectrogram,
    synth_audio_corpus,
)

# ── numpy core ───────────────────────────────────────────────────────────


def test_pcm_widths_and_channel_mean():
    x16 = np.array([0, 16384, -16384], dtype="<i2").tobytes()
    out = pcm_to_mono_float(8000, 1, 2, x16)
    assert np.allclose(out, [0.0, 0.5, -0.5])
    # stereo mean
    st = np.array([16384, -16384, 32767, 32767], dtype="<i2").tobytes()
    out = pcm_to_mono_float(8000, 2, 2, st)
    assert np.allclose(out, [0.0, 32767 / 32768.0])
    # u8
    out = pcm_to_mono_float(8000, 1, 1, bytes([128, 255, 0]))
    assert np.allclose(out, [0.0, 127 / 128.0, -1.0])
    with pytest.raises(ValueError):
        pcm_to_mono_float(8000, 1, 3, b"\x00\x00\x00")


def test_spectrogram_peak_at_tone_bin():
    rate, n_fft = 8000, 512
    # bin k corresponds to k*rate/n_fft Hz; pick exactly bin 32 (500 Hz)
    t = np.arange(8192) / rate
    x = np.sin(2 * np.pi * 500.0 * t)
    spec = spectrogram(x)
    assert spec.shape[1] == n_fft // 2 + 1
    assert (spec.argmax(axis=1) == 32).all()


def test_constellation_hash_packing_and_shift_covariance():
    peaks = [(0, 100), (3, 200), (10, 50)]
    hashes = constellation_hashes(peaks)
    assert (100 << 15 | 200 << 6 | 3, 0) in hashes
    # shifting every peak by k hops yields identical hashes, anchors +k
    shifted = constellation_hashes([(t + 7, f) for t, f in peaks])
    assert sorted(h for h, _ in shifted) == sorted(h for h, _ in hashes)
    assert sorted(t for _, t in shifted) == sorted(t + 7 for _, t in hashes)


def test_grid_peaks_silence_yields_nothing():
    assert grid_peaks(spectrogram(np.zeros(4096))) == []
    assert fingerprint_wav(b"opaque not a wav") is None


# ── Spark operators vs brute-force mirror ────────────────────────────────


def _brute_pairs(fps: dict, min_matches: int):
    out = {}
    ids = sorted(m for m in fps if fps[m])
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            ha, hb = defaultdict(list), defaultdict(list)
            for h, t in fps[a]:
                ha[h].append(t)
            for h, t in fps[b]:
                hb[h].append(t)
            off = defaultdict(int)
            for h in set(ha) & set(hb):
                for ta in ha[h]:
                    for tb in hb[h]:
                        off[ta - tb] += 1
            if not off:
                continue
            o, c = max(off.items(), key=lambda kv: (kv[1], -kv[0]))
            if c >= min_matches:
                out[(a, b)] = (o, c)
    return out


@pytest.fixture(scope="module")
def corpus_fps(spark):
    corpus = synth_audio_corpus(20)
    media = spark.createDataFrame(corpus, "media_id long, payload binary")
    fps = {m: (fingerprint_wav(p) or []) for m, p in corpus}
    return fps, audio_fingerprints(media).cache()


def test_audio_fingerprints_match_driver_mirror(spark, corpus_fps):
    fps, sdf = corpus_fps
    got = defaultdict(list)
    for r in sdf.collect():
        got[r["media_id"]].append((r["hash"], r["t"]))
    expect = {m: sorted(f) for m, f in fps.items() if f}
    assert {m: sorted(v) for m, v in got.items()} == expect
    # poison rows (every 9th) contribute zero rows
    assert {m for m, f in fps.items() if not f} == {7, 16}


@pytest.mark.parametrize("min_matches", [20, 5])
def test_audio_neardup_equals_bruteforce(spark, corpus_fps, min_matches):
    fps, sdf = corpus_fps
    got = {
        (r["media_id_a"], r["media_id_b"]): (r["offset"], r["n_matches"])
        for r in audio_neardup_candidates(sdf, min_matches=min_matches).collect()
    }
    assert got == _brute_pairs(fps, min_matches)


def test_audio_neardup_planted_structure(spark, corpus_fps):
    _, sdf = corpus_fps
    got = {
        (r["media_id_a"], r["media_id_b"]): (r["offset"], r["n_matches"])
        for r in audio_neardup_candidates(sdf, min_matches=20).collect()
    }
    # re-gain pairs at offset 0; 8-hop shifted copies at offset -8
    for a, b in ((0, 1), (5, 6), (10, 11)):
        assert got[(a, b)][0] == 0
    for a, b in ((1, 3), (6, 8), (11, 13)):
        o, c = got[(a, b)]
        assert o == -8 and c > 200
    # independent clips never pair
    assert (0, 5) not in got and (2, 4) not in got


def test_audio_neardup_hash_freq_cap(spark, corpus_fps):
    _, sdf = corpus_fps
    full = audio_neardup_candidates(sdf, min_matches=20)
    capped = audio_neardup_candidates(sdf, min_matches=20, max_hash_freq=3)
    # the cap only removes candidates (drops hot hashes), never adds
    fset = {(r[0], r[1]) for r in full.collect()}
    cset = {(r[0], r[1]) for r in capped.collect()}
    assert cset <= fset


def test_audio_neardup_plan_has_no_cross_join(spark, corpus_fps):
    _, sdf = corpus_fps
    plan = (
        audio_neardup_candidates(sdf)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_wav_encode_roundtrip():
    from crawl4ai_spark.operators.multimodal import wav_decode

    x = np.sin(np.linspace(0, 20, 4000))
    rate, ch, width, frames = wav_decode(_wav_encode(x))
    assert (rate, ch, width) == (8000, 1, 2)
    back = pcm_to_mono_float(rate, ch, width, frames)
    assert np.max(np.abs(back - np.clip(x, -1, 1))) < 2e-4
