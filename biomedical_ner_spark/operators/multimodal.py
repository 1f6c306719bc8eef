"""Multimodal columns: image/audio/video as opaque BINARY columns with
typed metadata, processed by Arrow-batched mapInPandas stages.

The Spark-side plumbing — schemas, batch iteration, partitioning, UDF
signatures — is real and tested; the actual media codecs are NOT available
in this container, so the decode step is pluggable: `decoder=None` uses a
deterministic fake (parses our synthetic header) and real decoders (PIL,
torchaudio, pyav) drop in behind the same callable without touching the
plan.  Real decode attempts raise NotImplementedError loudly rather than
fake-succeed.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id BIGINT, kind STRING, mime STRING, payload BINARY,"
    " meta_width INT, meta_height INT, meta_duration_ms INT"
)

_MAGIC = b"FAKEMEDIA1"


def synth_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table: payload = magic + packed
    (width, height, duration) + seeded bytes. Stands in for real blobs."""
    rows = []
    kinds = [("image", "image/png"), ("audio", "audio/wav"),
             ("video", "video/mp4")]
    for i in range(n):
        kind, mime = kinds[i % 3]
        w, h, dur = 64 + (i % 8) * 32, 48 + (i % 5) * 24, 1000 + i * 37
        body = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 4
        payload = _MAGIC + struct.pack("<iii", w, h, dur) + body
        rows.append((i, kind, mime, bytearray(payload), w, h, dur))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic fake decoder for the synthetic payload format."""
    if payload[: len(_MAGIC)] != _MAGIC:
        raise NotImplementedError(
            "real media decoding requires PIL/torchaudio/pyav, not present"
            " in this container; plug a decoder= callable"
        )
    w, h, dur = struct.unpack_from("<iii", payload, len(_MAGIC))
    return {"width": w, "height": h, "duration_ms": dur,
            "body": payload[len(_MAGIC) + 12:]}


FEATURE_SCHEMA = (
    "media_id BIGINT, kind STRING, n_bytes BIGINT, sha STRING,"
    " width INT, height INT, duration_ms INT, feat ARRAY<FLOAT>"
)


def extract_features(media: DataFrame, feat_dim: int = 16,
                     decoder: Callable[[bytes], dict] | None = None) -> DataFrame:
    """Decode + feature-extract per batch (ONE Python crossing).

    Features here are a deterministic byte-histogram projection — the same
    shape a real embedding model would return ([feat_dim] float32 per
    item), so downstream similarity operators compose unchanged."""
    import numpy as np
    import pandas as pd

    dec = decoder or _fake_decode

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "kind", "n_bytes", "sha",
                                   "width", "height", "duration_ms", "feat")}
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                b = bytes(payload)
                d = dec(b)
                hist = np.bincount(
                    np.frombuffer(d["body"], dtype=np.uint8) % feat_dim,
                    minlength=feat_dim,
                ).astype("float32")
                norm = float(np.linalg.norm(hist)) or 1.0
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["n_bytes"].append(len(b))
                out["sha"].append(hashlib.sha256(b).hexdigest())
                out["width"].append(d["width"])
                out["height"].append(d["height"])
                out["duration_ms"].append(d["duration_ms"])
                out["feat"].append((hist / norm).tolist())
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(
        _run, schema=FEATURE_SCHEMA
    )


RESIZE_SCHEMA = "media_id BIGINT, width INT, height INT, payload BINARY"


def resize_images(media: DataFrame, max_side: int = 32,
                  decoder: Callable[[bytes], dict] | None = None,
                  encoder: Callable[[dict, int], bytes] | None = None) -> DataFrame:
    """Resize stage: recompute target dims JVM-side-compatible (aspect
    preserved), re-encode per batch.  Fake encoder re-packs the synthetic
    header; a real one plugs in via encoder=."""
    import pandas as pd

    dec = decoder or _fake_decode

    def _enc(d: dict, side: int) -> bytes:
        scale = side / max(d["width"], d["height"])
        w = max(int(d["width"] * scale), 1)
        h = max(int(d["height"] * scale), 1)
        return _MAGIC + struct.pack("<iii", w, h, d["duration_ms"]) + d["body"]

    enc = encoder or _enc

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                d = dec(bytes(payload))
                new = enc(d, max_side)
                nd = dec(new)
                rows.append((mid, nd["width"], nd["height"], bytearray(new)))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "payload"]
            )

    return media.where(F.col("kind") == "image").select(
        "media_id", "payload"
    ).mapInPandas(_run, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "media_id BIGINT, frame_idx INT, ts_ms INT, frame_sha STRING"


def sample_frames(media: DataFrame, every_ms: int = 250,
                  decoder: Callable[[bytes], dict] | None = None) -> DataFrame:
    """Frame sampling for video: emits one row per sampled timestamp (a
    flatMap-shaped mapInPandas — output rows > input rows)."""
    import pandas as pd

    dec = decoder or _fake_decode

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                d = dec(bytes(payload))
                idx = 0
                for ts in range(0, d["duration_ms"], every_ms):
                    fs = hashlib.sha256(
                        d["body"][:32] + struct.pack("<i", ts)
                    ).hexdigest()
                    rows.append((mid, idx, ts, fs))
                    idx += 1
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "ts_ms", "frame_sha"]
            )

    return media.where(F.col("kind") == "video").select(
        "media_id", "payload"
    ).mapInPandas(_run, schema=FRAME_SCHEMA)
