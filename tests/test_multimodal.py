"""Multimodal plumbing: schema, Arrow batch shape, decode/feature/frame
stubs (the codec itself is a deterministic fake — see operators.multimodal)."""

from __future__ import annotations

from analysis_of_flight_delay_data_by_mapreduce_spark.operators.multimodal import (
    FEATURE_DIM,
    attach_payload,
    decode_images,
    extract_features,
    sample_video_frames,
)


def _assets(spark):
    rows = [(1, "a" * 10), (2, "b" * 5000), (3, "c" * 10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return attach_payload(df, text_col="text", id_col="doc_id")


def test_asset_schema(spark):
    assets = _assets(spark)
    assert [f.name for f in assets.schema.fields] == [
        "asset_id",
        "modality",
        "payload",
        "meta",
    ]
    assert assets.schema["payload"].dataType.simpleString() == "binary"
    meta = assets.schema["meta"].dataType.simpleString()
    assert "mime" in meta and "width" in meta


def test_decode_deterministic_and_pruned(spark):
    decoded = decode_images(_assets(spark))
    rows = {r.asset_id: r for r in decoded.collect()}
    rows2 = {r.asset_id: r for r in decode_images(_assets(spark)).collect()}
    assert {r.content_sha256 for r in rows.values()} == {
        r.content_sha256 for r in rows2.values()
    }
    assert rows[2].n_bytes == 5000
    assert "payload" not in decoded.columns  # heavy bytes projected away
    assert 1 <= rows[1].width <= 4096 and 1 <= rows[1].height <= 4096


def test_extract_features_shape(spark):
    feats = {r.asset_id: r.features for r in extract_features(_assets(spark)).collect()}
    assert all(len(v) == FEATURE_DIM for v in feats.values())
    assert all(-1.0 <= x <= 1.0 for v in feats.values() for x in v)
    assert feats[1] != feats[2]


def test_sample_video_frames_counts(spark):
    frames = sample_video_frames(_assets(spark), every_n_bytes=1024).collect()
    per_asset = {}
    for r in frames:
        per_asset.setdefault(r.asset_id, []).append(r.frame_idx)
    assert len(per_asset[1]) == 1  # 10 bytes → 1 chunk
    assert len(per_asset[2]) == 5  # 5000 bytes / 1024 → 5 chunks
    assert sorted(per_asset[2]) == list(range(5))
