"""Multimodal plumbing tests: media table from spans, stubbed decode,
frame sampling — schemas and batching real, kernels deterministic fakes."""

import pytest
from pyspark.sql import functions as F

from sinew_spark.multimodal import (
    decode_image,
    extract_image_metadata,
    media_from_spans,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    spans = [
        [
            {"kind": "title", "text": "t", "media_ref": "", "offset": 0},
            {"kind": "image", "text": "", "media_ref": "http://x/i1.png", "offset": 1},
            {"kind": "image", "text": "", "media_ref": "http://x/i2.png", "offset": 2},
            {"kind": "video", "text": "", "media_ref": "http://x/v1.mp4", "offset": 3},
        ],
        [
            {"kind": "image", "text": "", "media_ref": "http://x/i1.png", "offset": 0},
        ],
    ]
    docs = spark.createDataFrame(
        [("d1", spans[0]), ("d2", spans[1])],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    return media_from_spans(docs).persist()


def test_media_table(media):
    rows = media.collect()
    # i1 deduped across docs: 2 images + 1 video
    assert len(rows) == 3
    kinds = sorted(r.kind for r in rows)
    assert kinds == ["image", "image", "video"]
    assert all(len(r.content) > 0 for r in rows)


def test_decode_real_mode_dispatches_or_raises():
    """fake=False dispatches to Pillow when the runtime has it; otherwise
    the capability gate raises. The test runs whichever mode this container
    supports (this one lacks Pillow — FIXTURES.md)."""
    from sinew_spark.multimodal import pillow_available

    if not pillow_available():
        with pytest.raises(NotImplementedError):
            decode_image(b"xx", fake=False)
    else:
        # 1x1 PNG (smallest valid): decoded dims must be real, not hash-fake
        import base64

        png = base64.b64decode(
            b"iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR4"
            b"nGNgYGAAAAAEAAH2FzhVAAAAAElFTkSuQmCC"
        )
        assert decode_image(png, fake=False) == (1, 1, 4)


def test_image_metadata(media):
    meta = extract_image_metadata(media, fake=True).collect()
    assert len(meta) == 2
    for m in meta:
        assert 64 <= m.width < 256 and 64 <= m.height < 256
        assert m.channels == 3
        assert len(m.sha256) == 64
        assert m.n_bytes == 256  # sha256 digest * 8


def test_image_metadata_deterministic(media):
    a = {m.media_id: m.width for m in extract_image_metadata(media).collect()}
    b = {m.media_id: m.width for m in extract_image_metadata(media).collect()}
    assert a == b


def test_frame_sampling(media):
    frames = sample_video_frames(media, every_n_bytes=64).collect()
    # 256-byte fake video -> 4 frames
    assert len(frames) == 4
    assert [f.frame_idx for f in sorted(frames, key=lambda x: x.frame_idx)] == [0, 1, 2, 3]
    assert len({f.frame_sha for f in frames}) == 4


def test_resize_images(media):
    from sinew_spark.multimodal import resize_images

    out = resize_images(media, max_side=100).collect()
    assert len(out) == 2
    for r in out:
        assert max(r.width, r.height) <= 100
        assert min(r.width, r.height) > 0
        assert len(r.content) > 0


def test_audio_metadata(spark):
    from sinew_spark.multimodal import extract_audio_metadata, media_from_spans

    spans = [
        [
            {"kind": "audio", "text": "", "media_ref": "http://x/a1.wav", "offset": 0},
            {"kind": "text", "text": "hi", "media_ref": "", "offset": 1},
        ]
    ]
    docs = spark.createDataFrame(
        [("d1", spans[0])],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    meta = extract_audio_metadata(media_from_spans(docs)).collect()
    assert len(meta) == 1
    m = meta[0]
    assert m.duration_sec > 1.0 and m.sample_rate in (16000, 44100) and m.n_channels in (1, 2)
