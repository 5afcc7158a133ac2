"""Multimodal column plumbing: schema, Arrow batching, 1→N frame
explosion, null payloads (codec itself is a documented stub)."""

import pytest

from snappydata_spark.sources import (
    MULTIMODAL_SCHEMA,
    attach_payload_metadata,
    decode_images,
    sample_video_frames,
)


@pytest.fixture()
def media(spark):
    rows = [
        (1, "image", b"\x89PNG-fake-bytes-1", None, "image/png", 64, 64, None),
        (2, "image", b"\x89PNG-fake-bytes-2", None, "image/png", 32, 32, None),
        (3, "image", None, "s3://bucket/img3.png", "image/png", None, None, None),
        (4, "audio", b"RIFF-fake-wav", None, "audio/wav", None, None, 2500),
        (5, "video", b"fake-mp4-payload", None, "video/mp4", 640, 480, 3500),
    ]
    return spark.createDataFrame(rows, MULTIMODAL_SCHEMA)


def test_metadata_jvm_side(media):
    out = attach_payload_metadata(media).select("item_id", "byte_len", "content_md5")
    rows = {r.item_id: (r.byte_len, r.content_md5) for r in out.collect()}
    assert rows[1][0] == len(b"\x89PNG-fake-bytes-1")
    assert rows[3] == (None, None)  # uri-only row: no payload
    assert rows[1][1] != rows[2][1]


def test_decode_schema_and_determinism(media):
    out = decode_images(media.filter("modality = 'image'"))
    assert [f.name for f in out.schema.fields] == [
        "item_id",
        "modality",
        "byte_len",
        "feature",
    ]
    rows = {r.item_id: r for r in out.collect()}
    assert len(rows) == 3
    assert rows[3].feature is None  # null payload → null feature
    assert len(rows[1].feature) == 8
    # deterministic stub: same payload → same feature
    again = {r.item_id: r.feature for r in decode_images(media.filter("modality = 'image'")).collect()}
    assert again[1] == rows[1].feature


def test_video_frame_sampling_explodes(media):
    out = sample_video_frames(media, every_ms=1000, max_frames=8)
    rows = out.collect()
    # 3500ms at 1000ms sampling → 3 frames
    assert len(rows) == 3
    assert sorted(r.frame_no for r in rows) == [0, 1, 2]
    assert all(r.item_id == 5 for r in rows)
    feats = [tuple(r.feature) for r in rows]
    assert len(set(feats)) == 3  # per-frame distinct features


def test_partition_parallelism_preserved(media, spark):
    out = decode_images(media.repartition(4))
    assert out.rdd.getNumPartitions() == 4


def test_resize_images_stage(spark):
    from snappydata_spark.sources.multimodal import resize_images

    df = spark.createDataFrame(
        [(1, "image", bytearray(b"imgbytes1")), (2, "audio", bytearray(b"aud")),
         (3, "image", None)],
        "item_id long, modality string, payload binary",
    )
    out = resize_images(df, width=64, height=64).collect()
    by_id = {r.item_id: r for r in out}
    assert set(by_id) == {1, 3}                 # audio filtered out
    assert by_id[1].width == 64 and by_id[1].height == 64
    assert by_id[1].resized_payload is not None
    assert by_id[3].resized_payload is None     # null payload propagates
    # deterministic: same payload+geometry → same fake bytes
    out2 = resize_images(df, width=64, height=64).collect()
    assert {r.item_id: bytes(r.resized_payload) if r.resized_payload else None
            for r in out2} == {r.item_id: bytes(r.resized_payload) if r.resized_payload else None
                               for r in out}
