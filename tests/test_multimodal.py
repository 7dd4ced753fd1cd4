"""Multimodal plumbing: binary payload schema, mapInPandas batch shape,
and the decode stub contract."""

from __future__ import annotations

import hashlib

import pytest

from star_schema_etl_airflow_spark.sources.multimodal import (
    build_media_table,
    decode_media,
    extract_features,
)

SF_DIR = "/root/testdata/sf0.001"


def test_media_table_schema(spark):
    media = build_media_table(spark, SF_DIR)
    assert dict(media.dtypes)["payload"] == "binary"
    assert dict(media.dtypes)["media_type"] == "string"
    row = media.filter("media_id = 1").first()
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.media_type == "audio"  # 1 % 3 == 1 → MEDIA_TYPES[1]


def test_feature_extraction_roundtrip(spark):
    media = build_media_table(spark, SF_DIR)
    feats = extract_features(media)
    row = feats.filter("media_id = 0").first()
    src = media.filter("media_id = 0").first().payload
    assert row.n_bytes == len(src)
    assert row.payload_md5 == hashlib.md5(src).hexdigest()
    assert row.byte_sample == "|".join(str(int(x)) for x in src[::37][:8])
    # every document produced exactly one feature row
    assert feats.count() == media.count()


def test_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG", "image")


def test_resize_is_explicit_stub():
    from star_schema_etl_airflow_spark.sources.multimodal import resize_image

    with pytest.raises(NotImplementedError):
        resize_image(b"\xff\xd8", 224, 224)


def test_frame_sample_plumbing(spark):
    from star_schema_etl_airflow_spark.sources.multimodal import (
        build_media_table,
        frame_sample,
    )

    media = build_media_table(spark, SF_DIR)
    frames = frame_sample(media, n_frames=4)
    assert dict(frames.dtypes)["frame"] == "binary"

    n_videos = media.filter("media_type = 'video'").count()
    per_media = frames.groupBy("media_id").count().collect()
    assert len(per_media) == n_videos
    assert all(r["count"] == 4 for r in per_media)

    # frames of one video concatenate back into a payload prefix
    vid = media.filter("media_type = 'video'").first()
    got = b"".join(
        bytes(r.frame) for r in sorted(
            frames.filter(f"media_id = {vid.media_id}").collect(),
            key=lambda r: r.frame_idx,
        )
    )
    assert vid.payload.startswith(got[: len(vid.payload) // 4])
