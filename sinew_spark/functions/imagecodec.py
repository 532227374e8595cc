"""Pure-numpy media codecs — REAL decode kernels with no native deps.

The reference treats media as opaque bytes (sinew never decodes; the
pipeline addendum requires decode/feature-extract/resize plumbing). This
container ships no Pillow/ffmpeg (FIXTURES.md §9), but several formats are
fully decodable with the stdlib + numpy:

- PNG  (zlib is stdlib; filters 0-4 unfiltered here, 8-bit depth,
  color types 0/2/3/4/6, non-interlaced)
- BMP  (uncompressed 24/32-bit BITMAPINFOHEADER)
- PPM/PGM (binary P6/P5, maxval <= 255)
- WAV  (RIFF/WAVE PCM + IEEE-float headers — metadata without decoding
  samples, plus sample decode for 8/16/32-bit PCM)

These are the real kernels behind sinew_spark.multimodal: `decode_image`
sniffs the magic and uses these decoders before falling back to Pillow
(when installed) and only then raising. `encode_png` exists so `resize`
can re-encode its output — making image resize a real end-to-end
transform, not a pass-through stub.

Scale note: these run inside Arrow-batched mapInPandas stages; per-image
cost is O(pixels) numpy work (PNG filters 3/4 fall back to a per-row
Python loop — fine for thumbnails/fixtures; a cluster with Pillow
installed takes the Pillow path for large assets automatically).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# --- sniffing ---------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def sniff(data: bytes) -> str | None:
    """Identify a decodable container by magic bytes."""
    if data.startswith(_PNG_SIG):
        return "png"
    if data.startswith(b"BM") and len(data) >= 54:
        return "bmp"
    if data[:2] in (b"P6", b"P5") and len(data) > 2 and data[2:3].isspace():
        return "ppm" if data[:2] == b"P6" else "pgm"
    if data.startswith(b"RIFF") and data[8:12] == b"WAVE":
        return "wav"
    return None


# --- PNG ---------------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(data: bytes):
    pos = len(_PNG_SIG)
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        yield ctype, body
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IEND":
            return


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters -> (height, width*bpp) uint8."""
    stride = width * bpp
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).copy()
        pos += 1 + stride
        if ftype == 0:
            pass
        elif ftype == 1:  # sub: per-byte-lane cumsum (mod 256 via uint8 wrap)
            for lane in range(bpp):
                np.add.accumulate(row[lane::bpp], out=row[lane::bpp], dtype=np.uint8)
        elif ftype == 2:  # up
            row += prev
        elif ftype == 3:  # average
            r = row.astype(np.int32)
            for x in range(stride):
                left = int(row[x - bpp]) if x >= bpp else 0
                row[x] = (r[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # paeth
            r = row.astype(np.int32)
            for x in range(stride):
                left = int(row[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                row[x] = (r[x] + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ftype}")
        out[y] = row
        prev = out[y]
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG -> (H, W, C) uint8. 8-bit depth, non-interlaced, types 0/2/3/4/6."""
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    width = height = None
    color_type = bit_depth = interlace = None
    palette = None
    idat = bytearray()
    for ctype, body in _png_chunks(data):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
    if width is None:
        raise ValueError("PNG: missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"PNG: unsupported bit depth {bit_depth} (only 8)")
    if interlace:
        raise ValueError("PNG: Adam7 interlacing unsupported")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"PNG: unknown color type {color_type}")
    bpp = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    expect = height * (1 + width * bpp)
    if len(raw) != expect:
        raise ValueError(f"PNG: raw stream {len(raw)} bytes, expected {expect}")
    px = _unfilter(raw, width, height, bpp).reshape(height, width, bpp)
    if color_type == 3:  # palette -> RGB
        if palette is None:
            raise ValueError("PNG: palette image without PLTE")
        px = palette[px[:, :, 0]]
    return px


def encode_png(arr: np.ndarray, level: int = 6) -> bytes:
    """(H, W) or (H, W, C) uint8 -> PNG bytes (filter 0 rows)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(c)
    if color_type is None:
        raise ValueError(f"unsupported channel count {c}")
    raw = bytearray()
    flat = a.reshape(h, w * c)
    for y in range(h):
        raw.append(0)
        raw.extend(flat[y].tobytes())

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), level))
        + chunk(b"IEND", b"")
    )


# --- BMP ---------------------------------------------------------------------


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP -> (H, W, 3|4) uint8 (RGB[A] order)."""
    if not data.startswith(b"BM"):
        raise ValueError("not a BMP")
    (offset,) = struct.unpack("<I", data[10:14])
    width, height = struct.unpack("<ii", data[18:26])
    (bpp,) = struct.unpack("<H", data[28:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if compression not in (0, 3):  # BI_RGB / BI_BITFIELDS(default masks)
        raise ValueError(f"BMP: compression {compression} unsupported")
    if bpp not in (24, 32):
        raise ValueError(f"BMP: {bpp}bpp unsupported (only 24/32)")
    nch = bpp // 8
    flipped = height > 0
    height = abs(height)
    row_bytes = (width * nch + 3) & ~3
    px = np.zeros((height, width, nch), dtype=np.uint8)
    for y in range(height):
        start = offset + y * row_bytes
        row = np.frombuffer(data, dtype=np.uint8, count=width * nch, offset=start)
        px[height - 1 - y if flipped else y] = row.reshape(width, nch)
    # BGR(A) -> RGB(A)
    out = px.copy()
    out[:, :, 0], out[:, :, 2] = px[:, :, 2], px[:, :, 0]
    return out


# --- PPM / PGM ---------------------------------------------------------------


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary P6 (RGB) / P5 (gray) with maxval <= 255 -> (H, W, C) uint8."""
    magic = data[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM")
    nch = 3 if magic == b"P6" else 1
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to EOL
            while pos < len(data) and data[pos] not in (0x0A, 0x0D):
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval > 255:
        raise ValueError("PPM: 16-bit samples unsupported")
    n = width * height * nch
    px = np.frombuffer(data, dtype=np.uint8, count=n, offset=pos)
    return px.reshape(height, width, nch).copy()


# --- WAV ---------------------------------------------------------------------


def wav_info(data: bytes) -> dict:
    """Parse RIFF/WAVE headers -> {sample_rate, n_channels, bits, n_frames,
    duration_sec, audio_format} without decoding samples."""
    if not (data.startswith(b"RIFF") and data[8:12] == b"WAVE"):
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data_size = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if cid == b"fmt ":
            audio_format, n_channels, sample_rate = struct.unpack(
                "<HHI", data[pos + 8 : pos + 16]
            )
            (bits,) = struct.unpack("<H", data[pos + 22 : pos + 24])
            fmt = (audio_format, n_channels, sample_rate, bits)
        elif cid == b"data":
            data_size = min(size, len(data) - pos - 8)
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data_size is None:
        raise ValueError("WAV: missing fmt or data chunk")
    audio_format, n_channels, sample_rate, bits = fmt
    frame_bytes = max(1, n_channels * bits // 8)
    n_frames = data_size // frame_bytes
    return {
        "audio_format": audio_format,
        "n_channels": n_channels,
        "sample_rate": sample_rate,
        "bits": bits,
        "n_frames": n_frames,
        "duration_sec": n_frames / sample_rate if sample_rate else 0.0,
    }


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV -> ((n_frames, n_channels) float32 in [-1, 1], sample_rate)."""
    info = wav_info(data)
    pos = 12
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if cid == b"data":
            body = data[pos + 8 : pos + 8 + size]
            bits, af = info["bits"], info["audio_format"]
            if af == 1 and bits == 16:
                samples = np.frombuffer(body, dtype="<i2").astype(np.float32) / 32768.0
            elif af == 1 and bits == 8:  # unsigned
                samples = (np.frombuffer(body, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
            elif af == 1 and bits == 32:
                samples = np.frombuffer(body, dtype="<i4").astype(np.float32) / 2147483648.0
            elif af == 3 and bits == 32:
                samples = np.frombuffer(body, dtype="<f4").astype(np.float32)
            else:
                raise ValueError(f"WAV: format {af}/{bits}bit unsupported")
            break
        pos += 8 + size + (size & 1)
    if samples is None:
        raise ValueError("WAV: no data chunk")
    n = info["n_channels"]
    return samples.reshape(-1, n), info["sample_rate"]


def wav_samples_int(data: bytes) -> tuple[np.ndarray, int]:
    """Integer PCM WAV -> ((n_frames, n_channels) int64, sample_rate) —
    the EXACT-arithmetic twin of ``decode_wav`` for fingerprinting:
    energies computed from these are pure integer sums, replayable
    bit-for-bit by a SQL oracle (float32 normalization would accumulate
    rounding in a frame mean). 8-bit unsigned is re-centered to signed
    (-128..127); IEEE-float WAVs raise (no exact integer reading)."""
    info = wav_info(data)
    pos = 12
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if cid == b"data":
            body = data[pos + 8 : pos + 8 + size]
            bits, af = info["bits"], info["audio_format"]
            if af == 1 and bits == 16:
                samples = np.frombuffer(body, dtype="<i2").astype(np.int64)
            elif af == 1 and bits == 8:
                samples = np.frombuffer(body, dtype=np.uint8).astype(np.int64) - 128
            elif af == 1 and bits == 32:
                samples = np.frombuffer(body, dtype="<i4").astype(np.int64)
            else:
                raise ValueError(f"WAV: no exact integer read for format {af}/{bits}bit")
            break
        pos += 8 + size + (size & 1)
    if samples is None:
        raise ValueError("WAV: no data chunk")
    n = info["n_channels"]
    return samples.reshape(-1, n), info["sample_rate"]


# --- transforms ---------------------------------------------------------------


def resize_nearest(px: np.ndarray, max_side: int) -> np.ndarray:
    """Nearest-neighbor downscale so max(H, W) <= max_side (never upscales)."""
    h, w = px.shape[:2]
    scale = min(1.0, max_side / max(h, w))
    th, tw = max(1, int(h * scale)), max(1, int(w * scale))
    if (th, tw) == (h, w):
        return px
    ys = (np.arange(th) * h // th).astype(np.int64)
    xs = (np.arange(tw) * w // tw).astype(np.int64)
    return px[ys][:, xs]


def decode_image_array(data: bytes) -> np.ndarray:
    """Sniff + decode any supported image container -> (H, W, C) uint8."""
    kind = sniff(data)
    if kind == "png":
        return decode_png(data)
    if kind == "bmp":
        return decode_bmp(data)
    if kind in ("ppm", "pgm"):
        return decode_ppm(data)
    raise ValueError("unrecognized image container (supported: PNG/BMP/PPM/PGM)")
