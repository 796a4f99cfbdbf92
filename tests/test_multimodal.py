"""Multimodal binary-column plumbing: schema, Arrow batch shape, stubbed
decode, frame sampling offsets."""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

import struct as _struct

from graphsetintersection_spark.functions.multimodal import (
    _HEADER_FMT,
    _HEADER_SIZE,
    _MAGIC,
    decode_image_features,
    frame_sample,
    make_fake_media,
    resize_plan,
)


@pytest.fixture(scope="module")
def media(spark):
    m = make_fake_media(spark, 60, seed=42).persist()
    m.count()
    return m


def test_media_schema_and_determinism(spark, media):
    fields = {f.name: f.dataType.simpleString() for f in media.schema.fields}
    assert fields == {
        "media_id": "bigint", "kind": "string", "payload": "binary",
        "mime": "string", "n_bytes": "bigint",
    }
    again = {
        r["media_id"]: bytes(r["payload"])
        for r in make_fake_media(spark, 60, seed=42, partitions=7).collect()
    }
    for r in media.collect():
        assert again[r["media_id"]] == bytes(r["payload"])
        assert r["n_bytes"] == len(bytes(r["payload"]))


def test_decode_features_oracle(spark, media):
    feats = {r["media_id"]: r for r in decode_image_features(media).collect()}
    for r in media.collect():
        payload = bytes(r["payload"])
        magic, w, h, frames = _struct.unpack(_HEADER_FMT, payload[:_HEADER_SIZE])
        px = np.frombuffer(payload, dtype=np.uint8, offset=_HEADER_SIZE)
        f = feats[r["media_id"]]
        assert (f["width"], f["height"], f["n_frames"]) == (w, h, frames)
        assert f["mean_pixel"] == pytest.approx(px.mean(), abs=1e-9)


def test_decode_rejects_foreign_payload(spark):
    df = spark.createDataFrame(
        [(0, "image", bytearray(b"NOTMEDIA" * 4), "image/png", 32)],
        "media_id long, kind string, payload binary, mime string, n_bytes long",
    )
    with pytest.raises(Exception, match="NotImplementedError|FAKEMEDIA"):
        decode_image_features(df).collect()


def test_frame_sample_offsets(spark, media):
    rows = frame_sample(media, every_k=2).collect()
    assert rows
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for mid, lst in by_id.items():
        _, w, h, frames = _struct.unpack(_HEADER_FMT, payloads[mid][:_HEADER_SIZE])
        idxs = sorted(r["frame_idx"] for r in lst)
        assert idxs == list(range(0, frames, 2))
        for r in lst:
            assert r["byte_offset"] == _HEADER_SIZE + r["frame_idx"] * w * h
            # every sampled frame's bytes are in-bounds
            assert r["byte_offset"] + w * h <= len(payloads[mid])


def test_resize_plan(spark, media):
    plan = {r["media_id"]: r for r in resize_plan(media, 16, 16).collect()}
    for r in decode_image_features(media).collect():
        p = plan[r["media_id"]]
        assert p["scale_x"] == pytest.approx(16 / r["width"])
        assert p["scale_y"] == pytest.approx(16 / r["height"])
