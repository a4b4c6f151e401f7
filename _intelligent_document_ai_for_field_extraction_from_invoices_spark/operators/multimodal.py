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
