"""Multimodal tests: media table from spans, REAL decode kernels
(pure-numpy PNG/BMP/PPM/WAV — functions/imagecodec.py), frame sampling,
and the deterministic fake decoders kept for hash-derived fixtures."""

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


def test_decode_real_png_without_pillow():
    """fake=False decodes PNG for real via the pure-numpy kernel — no
    Pillow needed. 1x1 RGBA PNG assembled chunk-by-chunk from the spec."""
    import struct
    import zlib

    def chunk(t, body):
        return struct.pack(">I", len(body)) + t + body + struct.pack(
            ">I", zlib.crc32(t + body) & 0xFFFFFFFF
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00\x01\x02\x03\x04"))
        + chunk(b"IEND", b"")
    )
    assert decode_image(png, fake=False) == (1, 1, 4)


def test_decode_real_mode_unknown_format_dispatch():
    """Non-pure-decodable bytes dispatch to Pillow when installed and raise
    the capability gate otherwise (this container lacks Pillow —
    FIXTURES.md §9)."""
    from sinew_spark.multimodal import pillow_available

    if not pillow_available():
        with pytest.raises(NotImplementedError):
            decode_image(b"\xff\xd8\xffjunk", fake=False)


def test_real_image_pipeline_end_to_end(spark):
    """Real kernels through the Spark surface: encode PNGs -> media table
    -> extract_image_metadata(fake=False) measures true dims -> resize
    (real decode + nearest-neighbor + PNG re-encode) -> re-decode measures
    the clamped dims."""
    import numpy as np

    from sinew_spark.functions.imagecodec import decode_png, encode_png
    from sinew_spark.multimodal import resize_images

    imgs = {
        "m1": np.random.default_rng(1).integers(0, 256, (20, 30, 3), dtype=np.uint8),
        "m2": np.random.default_rng(2).integers(0, 256, (8, 8, 1), dtype=np.uint8),
    }
    media = spark.createDataFrame(
        [(k, "image", bytearray(encode_png(v)), "image/png", f"http://x/{k}.png")
         for k, v in imgs.items()],
        "media_id string, kind string, content binary, content_type string, source_url string",
    )
    meta = {m.media_id: m for m in extract_image_metadata(media, fake=False).collect()}
    assert (meta["m1"].width, meta["m1"].height, meta["m1"].channels) == (30, 20, 3)
    assert (meta["m2"].width, meta["m2"].height, meta["m2"].channels) == (8, 8, 1)

    out = {r.media_id: r for r in resize_images(media, max_side=10, fake=False).collect()}
    assert (out["m1"].width, out["m1"].height) == (10, 6)
    px = decode_png(bytes(out["m1"].content))
    assert px.shape == (6, 10, 3)
    # nearest-neighbor: every output pixel exists in the source
    src = imgs["m1"].reshape(-1, 3)
    assert all(tuple(p) in {tuple(s) for s in src} for p in px.reshape(-1, 3))
    # under max_side the image passes through un-resized
    assert (out["m2"].width, out["m2"].height) == (8, 8)


def test_real_audio_metadata(spark):
    """extract_audio_metadata(fake=False) parses true RIFF/WAVE headers."""
    import io
    import wave

    from sinew_spark.multimodal import extract_audio_metadata

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(b"\x00\x00" * 2 * 4000)  # 0.25 s stereo
    media = spark.createDataFrame(
        [("a1", "audio", bytearray(buf.getvalue()), "audio/wav", "http://x/a1.wav")],
        "media_id string, kind string, content binary, content_type string, source_url string",
    )
    m = extract_audio_metadata(media, fake=False).collect()[0]
    assert m.sample_rate == 16000
    assert m.n_channels == 2
    assert m.duration_sec == pytest.approx(0.25)


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


def test_corrupt_media_degrades_to_null_not_abort(spark):
    """Per-item tolerance in real-decode mode: a truncated PNG, a
    corrupt RIFF, AND unsupported/garbage leading bytes (a JPEG with no
    Pillow — the sniff that raises NotImplementedError is
    data-dependent) all yield NULL decoded fields (sha256/n_bytes stay
    real) instead of killing the stage — at corpus scale corrupt bytes
    are guaranteed. decode_image itself still raises for direct
    callers (pinned above)."""
    import hashlib as _h
    import numpy as np

    from sinew_spark.functions.imagecodec import encode_png
    from sinew_spark.multimodal import (
        extract_audio_metadata,
        extract_image_metadata,
        resize_images,
    )

    ok_png = encode_png(
        np.random.default_rng(3).integers(0, 256, (5, 7, 3), dtype=np.uint8)
    )
    bad_png = ok_png[:20]  # magic + truncated IHDR: sniffs as png, can't decode
    jpeg = b"\xff\xd8\xff\xe0junk"  # unsupported container without Pillow
    media = spark.createDataFrame(
        [
            ("ok", "image", bytearray(ok_png), "image/png", "http://x/ok.png"),
            ("bad", "image", bytearray(bad_png), "image/png", "http://x/bad.png"),
            ("jpg", "image", bytearray(jpeg), "image/jpeg", "http://x/j.jpg"),
        ],
        "media_id string, kind string, content binary, content_type string, source_url string",
    )
    meta = {m.media_id: m for m in extract_image_metadata(media, fake=False).collect()}
    assert (meta["ok"].width, meta["ok"].height) == (7, 5)
    for bad_id, raw in (("bad", bad_png), ("jpg", jpeg)):
        assert meta[bad_id].width is None and meta[bad_id].height is None
        assert meta[bad_id].sha256 == _h.sha256(raw).hexdigest()
        assert meta[bad_id].n_bytes == len(raw)

    out = {r.media_id: r for r in resize_images(media, max_side=4, fake=False).collect()}
    assert out["ok"].content is not None and out["ok"].width == 4
    assert out["bad"].content is None and out["bad"].width is None

    bad_wav = b"RIFF\x10\x00\x00\x00WAVEjunkjunk"
    audio = spark.createDataFrame(
        [("aw", "audio", bytearray(bad_wav), "audio/wav", "http://x/a.wav")],
        "media_id string, kind string, content binary, content_type string, source_url string",
    )
    a = extract_audio_metadata(audio, fake=False).collect()[0]
    assert a.sample_rate is None and a.duration_sec is None
    assert a.sha256 == _h.sha256(bad_wav).hexdigest()


# --- perceptual hash (dHash) ---------------------------------------------------


def test_dhash_from_pixels_ramps():
    import numpy as np

    from sinew_spark.multimodal import dhash_from_pixels

    # increasing-in-x ramp: every right neighbor larger -> all 64 bits set
    px = (np.tile(np.arange(9), (8, 1))).astype(np.uint8)
    assert dhash_from_pixels(px) == -1
    # decreasing -> no bit set
    assert dhash_from_pixels(px[:, ::-1]) == 0
    # flat -> strict > never fires
    assert dhash_from_pixels(np.zeros((8, 9), dtype=np.uint8)) == 0


def test_dhash_grayscale_rule():
    import numpy as np

    from sinew_spark.multimodal import dhash_from_pixels

    # 3-channel image whose floor-mean equals a known single-channel image
    g = (np.tile(np.arange(9), (8, 1)) * 7 % 256).astype(np.uint8)
    rgb = np.stack([g, g, g], axis=2)
    assert dhash_from_pixels(rgb) == dhash_from_pixels(g)
    # alpha never contributes: RGBA with wild alpha == RGB
    rgba = np.concatenate([rgb, np.full((8, 9, 1), 201, np.uint8)], axis=2)
    assert dhash_from_pixels(rgba) == dhash_from_pixels(rgb)
    # gray+alpha (PNG color type 4): luma is channel 0; a varying alpha
    # ramp must not turn a flat gray into the all-bits hash
    flat = np.zeros((8, 9), dtype=np.uint8)
    ga = np.stack([flat, np.tile(np.arange(9), (8, 1)).astype(np.uint8) * 20], axis=2)
    assert dhash_from_pixels(ga) == dhash_from_pixels(flat) == 0
    assert dhash_from_pixels(np.stack([g, flat], axis=2)) == dhash_from_pixels(g)


def test_image_dhash_real_and_tolerant(spark):
    import numpy as np

    from sinew_spark.functions.imagecodec import decode_ppm, encode_png
    from sinew_spark.multimodal import dhash_from_pixels, image_dhash

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(8, 9), dtype=np.uint8)
    pgm = b"P5\n9 8\n255\n" + px.tobytes()
    png = encode_png(px)
    rows = [
        ("pgm", bytearray(pgm)),
        ("png", bytearray(png)),
        ("corrupt", bytearray(b"\x89PNG\r\n\x1a\nnot-a-real-png")),
    ]
    media = spark.createDataFrame(rows, "media_id string, content binary")
    got = {r.media_id: r.dhash for r in image_dhash(media, fake=False).collect()}
    want = dhash_from_pixels(decode_ppm(pgm))
    # same pixels through either real container -> same signature
    assert got["pgm"] == want
    assert got["png"] == want
    # corrupt bytes -> NULL, never a stage abort
    assert got["corrupt"] is None


def test_image_dhash_fake_deterministic(spark):
    from sinew_spark.multimodal import image_dhash

    media = spark.createDataFrame(
        [("a", bytearray(b"xyz")), ("b", bytearray(b"xyz")), ("c", bytearray(b"other"))],
        "media_id string, content binary",
    )
    got = {r.media_id: r.dhash for r in image_dhash(media, fake=True).collect()}
    assert got["a"] == got["b"] != got["c"]
    import hashlib

    assert got["a"] == int.from_bytes(
        hashlib.sha256(b"xyz").digest()[:8], "big", signed=True
    )


def test_dhash_neardup_pairs(spark):
    from sinew_spark.operators.dedup import hamming_block_pairs

    base = 0x0123456789ABCDEF
    rows = [
        ("m0", base),
        ("m1", base ^ 0b1),            # hamming 1
        ("m2", base ^ 0b111),          # hamming 3 (boundary, kept)
        ("m3", base ^ 0b11110000),     # hamming 4 from m0 (dropped)
        ("m4", ~base),                 # hamming 64 (dropped)
    ]
    sigs = spark.createDataFrame(rows, "media_id string, dhash long")
    pairs = {
        (r.a, r.b): r.hamming
        for r in hamming_block_pairs(
            sigs, max_hamming=3, id_col="media_id", sig_col="dhash", bits=64
        ).collect()
    }
    assert pairs[("m0", "m1")] == 1
    assert pairs[("m0", "m2")] == 3
    assert pairs[("m1", "m2")] == 2
    # m1 ^ m3 = 0b11110001 -> 5, m2 ^ m3 -> hamming 7: none survive
    assert ("m0", "m3") not in pairs
    assert all("m4" not in k and "m3" not in k for k in pairs)


def _wav16(samples, rate=8000, nch=1):
    import struct

    import numpy as np

    pcm = np.asarray(samples).astype("<i2").tobytes()
    return (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, nch, rate, rate * 2 * nch, 2 * nch, 16)
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )


def test_audio_efp_hand_computed():
    from sinew_spark.multimodal import audio_efp_from_samples

    # 4 frames of 2 samples -> energies [1, 3, 2, 10] -> bits e1>e0=1,
    # e2>e1=0, e3>e2=1 -> 0b101 = 5
    s = [1, 1, 3, 3, 2, 2, 10, 10]
    assert audio_efp_from_samples(s, frames=4) == 0b101
    # negative samples: |.| used; stereo: channel 0 only
    import numpy as np

    st = np.array([[-1, 99], [1, 99], [-3, 0], [3, 0], [2, 0], [-2, 0], [10, 0], [10, 0]])
    assert audio_efp_from_samples(st, frames=4) == 0b101
    import pytest as _pytest

    with _pytest.raises(ValueError):
        audio_efp_from_samples([1, 2], frames=4)


def test_audio_fingerprint_loudness_invariant(spark):
    """A volume-scaled copy of well-separated frame energies fingerprints
    identically; garbage/float/short clips yield NULL."""
    import numpy as np

    from sinew_spark.multimodal import audio_fingerprint

    rng = np.random.default_rng(7)
    base = np.repeat(rng.permutation(64 + 1) * 400 + 100, 10) + rng.integers(
        0, 50, 650
    )
    rows = [
        ("orig", bytearray(_wav16(base))),
        ("scaled", bytearray(_wav16((base * 7) // 10))),
        ("garbage", bytearray(b"not a wav")),
        ("short", bytearray(_wav16([5, 5, 5]))),
    ]
    media = spark.createDataFrame(rows, "media_id string, content binary")
    out = {r.media_id: r.efp for r in audio_fingerprint(media).collect()}
    assert out["orig"] is not None
    assert out["orig"] == out["scaled"]
    assert out["garbage"] is None and out["short"] is None


def test_audio_fingerprint_pairs_via_hamming_join(spark):
    import numpy as np

    from sinew_spark.multimodal import audio_fingerprint
    from sinew_spark.operators.dedup import hamming_block_pairs

    rng = np.random.default_rng(11)
    rows = []
    for i in range(6):
        base = np.repeat(rng.permutation(65) * 400 + 100, 10)
        rows.append((f"c{i}", bytearray(_wav16(base))))
        rows.append((f"c{i}v", bytearray(_wav16((base * 8) // 10))))
    media = spark.createDataFrame(rows, "media_id string, content binary")
    sigs = audio_fingerprint(media)
    pairs = hamming_block_pairs(
        sigs, max_hamming=3, id_col="media_id", sig_col="efp", bits=64
    ).collect()
    got = {(r.a, r.b) for r in pairs}
    assert got == {(f"c{i}", f"c{i}v") for i in range(6)}
    assert all(r.hamming == 0 for r in pairs)


def test_audio_efp_frame_bounds():
    import pytest as _pytest

    from sinew_spark.multimodal import audio_efp_from_samples

    with _pytest.raises(ValueError, match=r"\[2, 65\]"):
        audio_efp_from_samples(list(range(100)), frames=66)
    with _pytest.raises(ValueError, match=r"\[2, 65\]"):
        audio_efp_from_samples(list(range(100)), frames=1)
    # frames=2 -> single bit
    assert audio_efp_from_samples([0, 0, 5, 5], frames=2) == 1
