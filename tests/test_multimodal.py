"""Multimodal binary-column plumbing: feature extraction, video frame
sampling, audio windowing (decoders stubbed; Spark-side shapes real)."""

import hashlib

import pytest

from _intelligent_document_ai_for_field_extraction_from_invoices_spark.operators import (
    multimodal as mm,
)


@pytest.fixture(scope="module")
def assets(spark):
    return mm.synthetic_assets(spark, n=60).cache()


def test_feature_extraction_shape_and_determinism(spark, assets):
    out = {r.asset_id: r for r in mm.extract_features(assets).collect()}
    assert len(out) == 60
    for r in out.values():
        assert len(r.feat) == 8
        assert all(0.0 <= v <= 1.0 for v in r.feat)
    # digest matches a driver-side recompute of the same payload
    raw = {r.asset_id: bytes(r.payload) for r in assets.collect()}
    for aid, r in out.items():
        assert r.digest == hashlib.md5(raw[aid]).hexdigest()


def test_frame_sampling_arithmetic(spark, assets):
    frames = mm.sample_frames(assets, every_n=5).collect()
    vids = {r.asset_id: (bytes(r.payload), r.n_frames)
            for r in assets.filter("kind = 'video'").collect()}
    by_asset = {}
    for r in frames:
        by_asset.setdefault(r.asset_id, []).append(r)
    for aid, rows in by_asset.items():
        payload, n_frames = vids[aid]
        exp = mm.fake_split_frames(payload, n_frames)
        kept = [i for i in range(len(exp)) if i % 5 == 0]
        assert sorted(r.frame_idx for r in rows) == kept, aid
        for r in rows:
            assert r.frame_digest == hashlib.md5(exp[r.frame_idx]).hexdigest()
    # assets with n_frames == 0 emit no rows
    zero = {r.asset_id for r in assets.filter(
        "kind = 'video' AND n_frames = 0").collect()}
    assert zero.isdisjoint(by_asset)


def test_audio_windows_cover_payload_exactly(spark, assets):
    wins = mm.audio_windows(assets, window_bytes=40).collect()
    auds = {r.asset_id: bytes(r.payload)
            for r in assets.filter("kind = 'audio'").collect()}
    by_asset = {}
    for r in wins:
        by_asset.setdefault(r.asset_id, []).append(r)
    assert set(by_asset) == {a for a, p in auds.items() if p}
    for aid, rows in by_asset.items():
        total = sum(r.window_bytes for r in rows)
        assert total == len(auds[aid])  # windows tile the payload exactly
        idxs = sorted(r.window_idx for r in rows)
        assert idxs == list(range(len(rows)))


def test_real_decoder_is_a_marked_stub(spark, assets):
    with pytest.raises(NotImplementedError):
        mm.sample_frames(assets, decoder="real")  # raised at plan time
    # extract_features raises inside the executor UDF -> wrapped by Spark
    with pytest.raises(Exception, match="codec libraries"):
        mm.extract_features(assets, decoder="real").collect()
