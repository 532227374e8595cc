"""Pure-numpy codec kernels: decode correctness against hand-built
fixtures (independent of our own encoders where possible)."""

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from sinew_spark.functions import imagecodec as ic


# --- fixture builders (independent of the module under test) ---------------


def build_png(px: np.ndarray, filters=None) -> bytes:
    """Reference PNG writer: spec-following, chosen per-row filter types."""
    h, w, c = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    bpp = c
    filters = filters or [0] * h
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        ft = filters[y]
        row = px[y].reshape(-1).astype(np.int32)
        raw.append(ft)
        if ft == 0:
            enc = row
        elif ft == 1:
            left = np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]])
            enc = (row - left) % 256
        elif ft == 2:
            enc = (row - prev) % 256
        elif ft == 3:
            enc = np.empty_like(row)
            for x in range(len(row)):
                left = row[x - bpp] if x >= bpp else 0
                enc[x] = (row[x] - ((left + prev[x]) >> 1)) % 256
        elif ft == 4:
            enc = np.empty_like(row)
            for x in range(len(row)):
                a = row[x - bpp] if x >= bpp else 0
                b = prev[x]
                cc = prev[x - bpp] if x >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                enc[x] = (row[x] - pred) % 256
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = row

    def chunk(t, body):
        return struct.pack(">I", len(body)) + t + body + struct.pack(
            ">I", zlib.crc32(t + body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def build_bmp24(px: np.ndarray) -> bytes:
    """Minimal bottom-up 24-bit BMP writer."""
    h, w, _ = px.shape
    row_bytes = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):
        row = px[y][:, ::-1].reshape(-1).tobytes()  # RGB -> BGR
        body.extend(row)
        body.extend(b"\x00" * (row_bytes - len(row)))
    offset = 14 + 40
    header = b"BM" + struct.pack("<IHHI", offset + len(body), 0, 0, offset)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + dib + bytes(body)


def rng_image(h, w, c, seed=7):
    return np.random.default_rng(seed).integers(0, 256, (h, w, c), dtype=np.uint8)


# --- PNG --------------------------------------------------------------------


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_decode_all_filters(channels):
    px = rng_image(5, 4, channels)
    data = build_png(px, filters=[0, 1, 2, 3, 4])
    out = ic.decode_png(data)
    assert out.shape == (5, 4, channels)
    assert np.array_equal(out, px)


def test_png_decode_known_anchor():
    # 1x1 red RGB pixel, filter 0 — bytes assembled from the PNG spec by hand
    raw = b"\x00\xff\x00\x00"
    idat = zlib.compress(raw)
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)

    def chunk(t, body):
        return struct.pack(">I", len(body)) + t + body + struct.pack(
            ">I", zlib.crc32(t + body) & 0xFFFFFFFF
        )

    data = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    out = ic.decode_png(data)
    assert out.shape == (1, 1, 3)
    assert out[0, 0].tolist() == [255, 0, 0]


def test_png_palette():
    pal = np.array([[10, 20, 30], [200, 100, 50]], dtype=np.uint8)
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))

    def chunk(t, body):
        return struct.pack(">I", len(body)) + t + body + struct.pack(
            ">I", zlib.crc32(t + body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", pal.tobytes())
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = ic.decode_png(data)
    assert np.array_equal(out, pal[idx])


def test_png_encode_decode_roundtrip():
    for c in (1, 3, 4):
        px = rng_image(7, 11, c, seed=c)
        assert np.array_equal(ic.decode_png(ic.encode_png(px)), px)


def test_png_rejects_interlace_and_16bit():
    def chunk(t, body):
        return struct.pack(">I", len(body)) + t + body + struct.pack(
            ">I", zlib.crc32(t + body) & 0xFFFFFFFF
        )

    base = b"\x89PNG\r\n\x1a\n"
    interlaced = base + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 1))
    with pytest.raises(ValueError, match="interlac"):
        ic.decode_png(interlaced)
    deep = base + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0))
    with pytest.raises(ValueError, match="bit depth"):
        ic.decode_png(deep)


# --- BMP / PPM ---------------------------------------------------------------


def test_bmp_decode():
    px = rng_image(3, 5, 3)
    out = ic.decode_bmp(build_bmp24(px))
    assert np.array_equal(out, px)


def test_ppm_decode_with_comment():
    px = rng_image(2, 3, 3)
    data = b"P6\n# a comment\n3 2\n255\n" + px.tobytes()
    assert np.array_equal(ic.decode_ppm(data), px)


def test_pgm_decode():
    px = rng_image(4, 4, 1)
    data = b"P5 4 4 255\n" + px.tobytes()
    assert np.array_equal(ic.decode_ppm(data), px)


# --- WAV ---------------------------------------------------------------------


def test_wav_info_and_decode_via_stdlib_writer():
    rate, nch, nframes = 8000, 2, 1600
    t = np.arange(nframes)
    sig = (np.sin(2 * np.pi * 440 * t / rate) * 20000).astype("<i2")
    frames = np.stack([sig, -sig], axis=1)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(frames.tobytes())
    data = buf.getvalue()

    info = ic.wav_info(data)
    assert info["sample_rate"] == rate
    assert info["n_channels"] == nch
    assert info["n_frames"] == nframes
    assert info["duration_sec"] == pytest.approx(nframes / rate)

    samples, sr = ic.decode_wav(data)
    assert sr == rate and samples.shape == (nframes, nch)
    assert np.allclose(samples * 32768.0, frames, atol=0.5)


def test_wav_float32():
    rate, n = 16000, 100
    sig = np.linspace(-1, 1, n, dtype=np.float32)
    body = sig.tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, rate, rate * 4, 4, 32)
    data = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(body))
        + body
    )
    samples, sr = ic.decode_wav(data)
    assert sr == rate
    assert np.array_equal(samples[:, 0], sig)


# --- sniff / resize / dispatch ----------------------------------------------


def test_sniff():
    assert ic.sniff(ic.encode_png(rng_image(2, 2, 3))) == "png"
    assert ic.sniff(build_bmp24(rng_image(2, 2, 3))) == "bmp"
    assert ic.sniff(b"P6 1 1 255\n\x00\x00\x00") == "ppm"
    assert ic.sniff(b"RIFF\x00\x00\x00\x00WAVE") == "wav"
    assert ic.sniff(b"\xff\xd8\xff") is None  # JPEG: not pure-python decodable


def test_resize_nearest():
    px = rng_image(100, 40, 3)
    out = ic.resize_nearest(px, 50)
    assert out.shape == (50, 20, 3)
    # never upscales
    assert ic.resize_nearest(px, 500).shape == (100, 40, 3)
    # exact subsample identity on a constant image
    const = np.full((64, 64, 3), 42, np.uint8)
    assert np.array_equal(ic.resize_nearest(const, 16), np.full((16, 16, 3), 42, np.uint8))


def test_decode_image_array_dispatch():
    px = rng_image(3, 3, 3)
    for data in (ic.encode_png(px), build_bmp24(px), b"P6 3 3 255\n" + px.tobytes()):
        assert np.array_equal(ic.decode_image_array(data), px)
    with pytest.raises(ValueError):
        ic.decode_image_array(b"\xff\xd8\xffjunk")
