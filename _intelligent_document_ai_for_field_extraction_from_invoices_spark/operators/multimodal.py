"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The decode/resize/frame-sample kernels require codec libraries that are NOT
in this container; they are STUBBED behind `decoder=` hooks (the default
deterministic fake keeps every pipeline testable; passing decoder="real"
raises NotImplementedError at the call site, clearly marked). The Spark-side
plumbing — schema, Arrow batch shape, partitioning, metadata projection — is
real and tested.

Schema convention for a multimodal table:
  (asset_id: long, kind: string, payload: binary, meta: struct<...>)
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id long, kind string, payload binary, "
    "width int, height int, n_frames int"
)

FEATURE_SCHEMA = (
    "asset_id long, kind string, n_bytes long, digest string, "
    "feat array<float>"
)


def fake_decode_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'decoder': md5-derived feature vector. Stands in for
    image decode + embedding until codec libs exist in the runtime."""
    if payload is None:
        return [0.0] * dim
    h = hashlib.md5(payload).digest()
    return [h[i] / 255.0 for i in range(dim)]


def real_decode_features(payload: bytes, dim: int = 8) -> list[float]:
    raise NotImplementedError(
        "image/audio decode requires codec libraries not present in this "
        "container; wire a real decoder here (PIL/torchaudio/ffmpeg) — the "
        "Spark plumbing around it is complete and tested with the fake."
    )


def extract_features(assets: DataFrame, decoder: str = "fake",
                     batch_rows: int = 64) -> DataFrame:
    """Binary payloads -> feature rows via mapInPandas. Payload rows are
    large, so batches are re-chunked to `batch_rows` to bound worker memory
    (same discipline as the html extraction path)."""
    decode = fake_decode_features if decoder == "fake" else real_decode_features

    def run(batches):
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                part = pdf.iloc[lo:lo + batch_rows]
                payloads = part["payload"].tolist()
                yield pd.DataFrame({
                    "asset_id": part["asset_id"].to_numpy(),
                    "kind": part["kind"].to_numpy(),
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "digest": [hashlib.md5(p or b"").hexdigest() for p in payloads],
                    "feat": [decode(p) for p in payloads],
                })

    return assets.select("asset_id", "kind", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def synthetic_assets(spark, n: int = 64) -> DataFrame:
    """Deterministic binary asset table for tests (payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        payload = hashlib.sha256(f"asset-{i}".encode()).digest() * (i % 7 + 1)
        rows.append((i, kinds[i % 3], bytearray(payload),
                     64 + i % 128, 64 + i % 64, i % 30))
    return spark.createDataFrame(rows, schema=ASSET_SCHEMA)


FRAME_SCHEMA = (
    "asset_id long, frame_idx int, n_frames int, frame_bytes long, "
    "frame_digest string"
)


def fake_split_frames(payload: bytes, n_frames: int) -> list[bytes]:
    """Deterministic fake frame splitter: slices the payload into n_frames
    even chunks (stand-in for an ffmpeg demux; same output shape)."""
    if not payload or n_frames <= 0:
        return []
    step = max(1, len(payload) // n_frames)
    return [payload[i * step:(i + 1) * step] for i in range(n_frames)]


def sample_frames(assets: DataFrame, every_n: int = 5,
                  decoder: str = "fake") -> DataFrame:
    """Video frame sampling: one input asset row -> one output row per kept
    frame (frame_idx % every_n == 0). The 1->many mapInPandas shape is the
    real scale concern (a 2-hour video explodes into thousands of rows);
    emitting one pandas frame per INPUT row keeps worker memory bounded by
    a single asset's kept frames, never a whole batch of videos."""
    if decoder != "fake":
        real_decode_features(b"")  # raises NotImplementedError, marked stub

    def run(batches):
        for pdf in batches:
            # zip over columns, not iterrows(): no per-row Series objects
            # (house style, extract.py)
            for asset_id, payload, n_frames in zip(
                    pdf["asset_id"], pdf["payload"], pdf["n_frames"]):
                frames = fake_split_frames(payload, int(n_frames))
                kept = [(i, f) for i, f in enumerate(frames) if i % every_n == 0]
                if not kept:
                    continue
                yield pd.DataFrame({
                    "asset_id": [asset_id] * len(kept),
                    "frame_idx": [i for i, _ in kept],
                    "n_frames": [len(frames)] * len(kept),
                    "frame_bytes": [len(f) for _, f in kept],
                    "frame_digest": [hashlib.md5(f).hexdigest() for _, f in kept],
                })

    return (
        assets.filter(F.col("kind") == "video")
        .select("asset_id", "payload", "n_frames")
        .mapInPandas(run, schema=FRAME_SCHEMA)
    )


WINDOW_SCHEMA = (
    "asset_id long, window_idx int, window_bytes long, window_digest string"
)


def audio_windows(assets: DataFrame, window_bytes: int = 1024,
                  decoder: str = "fake") -> DataFrame:
    """Audio windowing: fixed-size byte windows per audio asset (stand-in
    for PCM frame windows; the chunk arithmetic and 1->many plumbing are the
    real part, the codec is the stub)."""
    if decoder != "fake":
        real_decode_features(b"")

    def run(batches):
        for pdf in batches:
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                p = payload or b""
                wins = [p[i:i + window_bytes]
                        for i in range(0, len(p), window_bytes)]
                if not wins:
                    continue
                yield pd.DataFrame({
                    "asset_id": [asset_id] * len(wins),
                    "window_idx": list(range(len(wins))),
                    "window_bytes": [len(w) for w in wins],
                    "window_digest": [hashlib.md5(w).hexdigest() for w in wins],
                })

    return (
        assets.filter(F.col("kind") == "audio")
        .select("asset_id", "payload")
        .mapInPandas(run, schema=WINDOW_SCHEMA)
    )
