"""Multimodal column plumbing — binary media with typed metadata.

Interleaved documents carry media spans (kind='image'/'audio'/'video',
media_ref=URL). At pipeline scale the media bytes live in a binary column
with typed metadata; decode/resize/frame-sample run as Arrow-batched
mapInPandas stages.

Decode kernels (round 2): REAL for the containers decodable without
native libraries — PNG/BMP/PPM/PGM images and RIFF/WAVE audio are decoded
by the pure-numpy codecs in functions/imagecodec.py; image resize
decodes, nearest-neighbor downsamples, and re-encodes PNG for real.
Formats that require native codecs (JPEG/WebP images, compressed audio,
all video) dispatch to Pillow/ffmpeg when the runtime has them and raise
`NotImplementedError` otherwise (this container ships neither —
FIXTURES.md §9). `fake=True` keeps the deterministic hash-derived
decoder for oracle-checkable fixtures whose bytes aren't valid media.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sinew_spark.functions import imagecodec

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("source_url", T.StringType()),
    ]
)

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def _fake_decode_image(content: bytes) -> tuple[int, int, int]:
    """Deterministic fake: dimensions derived from the content hash. Replace
    with a real decoder (Pillow) on a cluster with the library installed."""
    h = hashlib.sha256(content).digest()
    return (64 + h[0] % 192, 64 + h[1] % 192, 3)


def pillow_available() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_image_pixels(content: bytes):
    """Decode to an (H, W, C) uint8 array. Pure-numpy codecs first
    (PNG/BMP/PPM/PGM — imagecodec.py), then Pillow for anything else it
    can open, else NotImplementedError naming the missing capability."""
    if imagecodec.sniff(content) in ("png", "bmp", "ppm", "pgm"):
        return imagecodec.decode_image_array(content)
    try:
        import io

        import numpy as np
        import PIL.Image
    except ImportError as e:
        raise NotImplementedError(
            "not a PNG/BMP/PPM/PGM — decoding other formats (e.g. JPEG/WebP) "
            "requires Pillow, which this container does not ship; pass "
            "fake=True for the deterministic test decoder"
        ) from e
    with PIL.Image.open(io.BytesIO(content)) as im:
        return np.asarray(im.convert(im.mode))


def decode_image(content: bytes, fake: bool = False) -> tuple[int, int, int]:
    """(width, height, channels). fake=False decodes for real — pure-numpy
    PNG/BMP/PPM/PGM kernels, Pillow fallback for other formats when
    installed. fake=True uses the deterministic hash decoder for fixture
    bytes that aren't valid media (oracle-checkable)."""
    if fake:
        return _fake_decode_image(content)
    if imagecodec.sniff(content) in ("png", "bmp", "ppm", "pgm"):
        px = imagecodec.decode_image_array(content)
        h, w = px.shape[:2]
        return (w, h, px.shape[2] if px.ndim == 3 else 1)
    try:
        import io

        import PIL.Image
    except ImportError as e:
        raise NotImplementedError(
            "not a PNG/BMP/PPM/PGM — decoding other formats (e.g. JPEG/WebP) "
            "requires Pillow, which this container does not ship; pass "
            "fake=True for the deterministic test decoder"
        ) from e
    with PIL.Image.open(io.BytesIO(content)) as im:
        return (im.width, im.height, len(im.getbands()))


def extract_image_metadata(media: DataFrame, fake: bool = True) -> DataFrame:
    """media (MEDIA_SCHEMA) -> image metadata. Arrow batches; sha256 + sizes
    always real, dimensions via the (stub) decoder."""

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                content = bytes(r.content) if r.content is not None else b""
                # per-item tolerance: at corpus scale corrupt bytes are
                # guaranteed (truncated PNG, bad zlib stream, mislabeled
                # or garbage leading bytes) and must not abort the stage
                # — dimensions go NULL, sha256 and n_bytes stay real so
                # the row remains accountable. NotImplementedError is
                # caught too: the sniff that raises it is data-dependent
                # (corrupt magic bytes look identical to an unsupported
                # format), so "raise on the first JPEG" would really be
                # "abort the whole stage on one bad row". A no-Pillow
                # misconfiguration shows up as the null-fraction of this
                # output, which callers should monitor; decode_image
                # itself still raises for direct callers.
                try:
                    w, h, c = decode_image(content, fake=fake)
                except Exception:
                    w = h = c = None
                rows.append(
                    {
                        "media_id": r.media_id,
                        "width": w,
                        "height": h,
                        "channels": c,
                        "sha256": hashlib.sha256(content).hexdigest(),
                        "n_bytes": len(content),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_META_SCHEMA.fields])

    return media.where(F.col("kind") == "image").select("media_id", "content").mapInPandas(
        batch, IMAGE_META_SCHEMA
    )


def sample_video_frames(media: DataFrame, every_n_bytes: int = 1024, fake: bool = True) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame with a
    frame index and a (fake) frame digest. A real implementation swaps the
    byte-stride sampler for ffmpeg keyframe extraction; schema and
    partitioning stay identical."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.StringType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_sha", T.StringType()),
        ]
    )
    if not fake:
        raise NotImplementedError("video decode requires ffmpeg — container lacks it")

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                content = bytes(r.content) if r.content is not None else b""
                for i in range(0, max(1, len(content) // every_n_bytes)):
                    chunk = content[i * every_n_bytes : (i + 1) * every_n_bytes]
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "frame_idx": i,
                            "frame_sha": hashlib.sha256(chunk).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_sha"])

    return media.where(F.col("kind") == "video").select("media_id", "content").mapInPandas(
        batch, schema
    )


def resize_images(
    media: DataFrame, max_side: int = 256, fake: bool = True
) -> DataFrame:
    """Resize: emits (media_id, width, height, content) with max(H, W)
    clamped to max_side preserving aspect ratio. fake=False is the REAL
    transform — decode (pure-numpy codecs), nearest-neighbor downsample,
    re-encode PNG. fake=True keeps the dimension math but passes bytes
    through (for hash-derived fixture bytes that aren't valid images)."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("content", T.BinaryType()),
        ]
    )

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                content = bytes(r.content) if r.content is not None else b""
                if fake:
                    w, h, _c = decode_image(content, fake=True)
                    scale = min(1.0, max_side / max(w, h))
                    out_w, out_h, out_bytes = int(w * scale), int(h * scale), content
                else:
                    # corrupt/undecodable bytes -> NULL output row
                    # (media_id kept for accounting) — incl. the
                    # data-dependent NotImplementedError, see
                    # extract_image_metadata
                    try:
                        px = decode_image_pixels(content)
                        small = imagecodec.resize_nearest(px, max_side)
                        out_h, out_w = small.shape[:2]
                        out_bytes = imagecodec.encode_png(small)
                    except Exception:
                        out_w = out_h = out_bytes = None
                rows.append(
                    {
                        "media_id": r.media_id,
                        "width": out_w,
                        "height": out_h,
                        "content": out_bytes,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return media.where(F.col("kind") == "image").select("media_id", "content").mapInPandas(
        batch, schema
    )


AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sha256", T.StringType()),
    ]
)


def extract_audio_metadata(media: DataFrame, fake: bool = True) -> DataFrame:
    """Audio feature-extract (duration/rate/channels). fake=False parses
    RIFF/WAVE headers for real (imagecodec.wav_info — PCM and IEEE-float);
    compressed formats (mp3/ogg/aac) would need ffmpeg/soundfile, absent
    here, and raise. fake mode derives deterministic metadata from the
    content hash for fixture bytes that aren't valid audio."""

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                content = bytes(r.content) if r.content is not None else b""
                if fake:
                    h = hashlib.sha256(content).digest()
                    dur = round(1.0 + h[2] / 16.0, 4)
                    rate = 16000 if h[3] % 2 == 0 else 44100
                    nch = 1 + h[4] % 2
                else:
                    # non-WAV (compressed audio needs ffmpeg/soundfile,
                    # absent here) and corrupt RIFF (bad fmt chunk,
                    # truncated data) both -> NULL metadata instead of a
                    # stage abort: the sniff is data-dependent, so one
                    # garbage row must not kill the job; sha256 stays
                    # real and the null-fraction is the capability signal
                    try:
                        if imagecodec.sniff(content) != "wav":
                            raise ValueError("not RIFF/WAVE")
                        info = imagecodec.wav_info(content)
                        dur = round(info["duration_sec"], 6)
                        rate = info["sample_rate"]
                        nch = info["n_channels"]
                    except Exception:
                        dur = rate = nch = None
                rows.append(
                    {
                        "media_id": r.media_id,
                        "duration_sec": dur,
                        "sample_rate": rate,
                        "n_channels": nch,
                        "sha256": hashlib.sha256(content).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_META_SCHEMA.fields])

    return media.where(F.col("kind") == "audio").select("media_id", "content").mapInPandas(
        batch, AUDIO_META_SCHEMA
    )


def media_from_spans(documents: DataFrame, seed: int = 42) -> DataFrame:
    """Materialize a media table from span documents: every media span
    becomes a row; content is deterministic fake bytes derived from the
    media_ref (the real pipeline fetches bytes through the crawler)."""

    @F.pandas_udf(T.BinaryType())
    def fake_bytes(refs: pd.Series) -> pd.Series:
        def gen(u):
            if not u:
                return b""
            # non-periodic deterministic stream (so chunk digests differ)
            return b"".join(
                hashlib.sha256(f"{seed}|{u}|{i}".encode()).digest() for i in range(8)
            )

        return refs.map(gen)

    spans = documents.select(F.explode("spans").alias("s"))
    media = spans.where(F.col("s.kind").isin("image", "audio", "video")).select(
        F.md5(F.col("s.media_ref")).alias("media_id"),
        F.col("s.kind").alias("kind"),
        fake_bytes(F.col("s.media_ref")).alias("content"),
        F.lit("application/octet-stream").alias("content_type"),
        F.col("s.media_ref").alias("source_url"),
    )
    return media.dropDuplicates(["media_id"])


# --- perceptual hash (image near-dup) -----------------------------------------

DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("dhash", T.LongType()),
    ]
)


def dhash_from_pixels(px) -> int:
    """64-bit difference hash of an (H, W) / (H, W, C) uint8 array.

    Fixed, SQL-replayable recipe (an independent oracle can re-derive it
    from the pixel values alone):
      1. grayscale: C==1 -> the channel; C==2 (gray+alpha, PNG color
         type 4) -> channel 0; else floor-mean of the first min(3, C)
         channels (alpha never contributes in any layout)
      2. sample to 8 rows x 9 cols by index (ys = y*H//8, xs = x*W//9 —
         the same nearest grid resize_nearest uses, identity for 9x8)
      3. bit(y, x) = 1 iff g[y, x+1] > g[y, x]  (x, y in 0..7)
      4. pack bit(y, x) at position y*8 + x, two's-complement int64

    Gradient bits make the hash invariant to global brightness shifts and
    stable under mild re-encoding — the classic dHash (Krawetz) — while
    staying exact integer arithmetic end to end."""
    import numpy as np

    a = np.asarray(px)
    if a.ndim == 3:
        c = a.shape[2]
        if c <= 2:
            # 1 channel, or gray+alpha (PNG color type 4): the luma IS
            # channel 0 — folding alpha into the mean would hash a flat
            # gray with an alpha ramp to the opposite corner of hamming
            # space from its opaque twin
            g = a[:, :, 0].astype(np.int64)
        else:
            g = a[:, :, :3].astype(np.int64).sum(axis=2) // 3
    else:
        g = a.astype(np.int64)
    h, w = g.shape
    if h < 1 or w < 1:
        raise ValueError("empty image")
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(9) * w) // 9
    s = g[ys][:, xs]
    bits = (s[:, 1:] > s[:, :-1]).astype(np.uint64)  # (8, 8)
    weights = (np.uint64(1) << (np.arange(64, dtype=np.uint64))).reshape(8, 8)
    return int((bits * weights).sum(dtype=np.uint64).astype(np.int64))


def image_dhash(media: DataFrame, fake: bool = False) -> DataFrame:
    """(media_id, dhash) per image — the perceptual-near-dup signature.

    The default decodes for real (pure-numpy PNG/BMP/PPM/PGM, Pillow
    fallback) and applies ``dhash_from_pixels``; corrupt/undecodable
    bytes yield a NULL dhash (same per-item tolerance as
    extract_image_metadata — one garbage row must not abort the stage,
    and the null fraction is the capability signal). Unlike the
    extract_*/resize family this defaults to the REAL path: degradation
    to NULL makes it safe without Pillow, and a sha256 pseudo-hash
    (fake=True, first 8 bytes big-endian signed — kept for fixture
    bytes that aren't valid media) has NO perceptual meaning, so a
    near-dup pipeline silently finding nothing would be the trap.

    Compose with ``operators.dedup.hamming_block_pairs(sigs, max_hamming,
    id_col='media_id', sig_col='dhash', bits=64)`` for the banded
    candidate join + exact popcount verify — pass ``bits=64`` (the
    default 60 is simhash's width; exactness would hold either way, but
    15-bit bands generate ~2x the candidate pairs 16-bit bands do).
    Near-duplicate IMAGES (re-encoded, brightness-shifted, lightly
    cropped copies) at corpus scale without an O(n^2) pixel comparison;
    checkpoint the signatures first so the decode doesn't re-run per
    join side. Scale shape: map-only Arrow batches (this stage) then
    the block equi-join (dedup.py) — signatures shuffle, pixels never
    do."""

    def batch(frames: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in frames:
            ids, hashes = [], []
            for r in pdf.itertuples(index=False):
                content = bytes(r.content) if r.content is not None else b""
                if fake:
                    d = hashlib.sha256(content).digest()[:8]
                    v = int.from_bytes(d, "big", signed=True)
                else:
                    try:
                        v = dhash_from_pixels(decode_image_pixels(content))
                    except Exception:
                        v = None
                ids.append(r.media_id)
                hashes.append(v)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="object"),
                    "dhash": pd.Series(hashes, dtype="object"),
                }
            )

    return media.select("media_id", "content").mapInPandas(batch, DHASH_SCHEMA)


AEFP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("efp", T.LongType()),
    ]
)


def audio_efp_from_samples(samples, frames: int = 65) -> int:
    """64-bit energy-envelope fingerprint of an integer PCM clip — the
    audio twin of ``dhash_from_pixels``, in the spirit of the
    Haitsma-Kalker audio fingerprint (ISMIR 2002: sign of band-energy
    differences) with the band axis collapsed to the time envelope so
    the whole recipe stays EXACT integer arithmetic an independent SQL
    oracle can re-derive from the sample values alone:

      1. mono: channel 0 (the perceptual envelope; channel mixing would
         inject a division per sample)
      2. split into ``frames`` windows by index (start_i = i*n//frames
         — the same nearest-grid rule dhash/resize_nearest use)
      3. energy e_i = sum(|s|) div window_len  (integer mean |PCM|)
      4. bit(i) = 1 iff e[i+1] > e[i], packed at position i,
         two's-complement int64 (frames-1 = 64 bits by default)

    Sign-of-difference bits make the fingerprint invariant to uniform
    volume scaling (a re-encoded copy at 70% gain keeps every energy
    comparison, up to integer-truncation ties) — the loudness analogue
    of dHash's brightness invariance. Raises on clips shorter than
    ``frames`` samples (no stable envelope to compare)."""
    import numpy as np

    if not 2 <= frames <= 65:
        # frames-1 bits must fit the int64 signature (and < 2 bits is no
        # envelope at all); a 1 << 64 in uint64 would silently wrap
        raise ValueError("frames must be in [2, 65]")
    a = np.asarray(samples)
    ch0 = a[:, 0] if a.ndim == 2 else a
    n = len(ch0)
    if n < frames:
        raise ValueError("clip shorter than frame grid")
    mags = np.abs(ch0.astype(np.int64))
    bounds = (np.arange(frames + 1) * n) // frames
    sums = np.add.reduceat(mags, bounds[:-1])
    lens = bounds[1:] - bounds[:-1]
    e = sums // lens
    bits = (e[1:] > e[:-1]).astype(np.uint64)
    weights = np.uint64(1) << np.arange(frames - 1, dtype=np.uint64)
    return int((bits * weights).sum(dtype=np.uint64).astype(np.int64))


def audio_fingerprint(media: DataFrame, frames: int = 65) -> DataFrame:
    """(media_id, efp) per audio clip — the perceptual-near-dup signature
    over REAL WAV decoding (imagecodec.wav_samples_int: integer PCM, no
    float normalization). Undecodable / float-PCM / too-short clips
    yield NULL efp (same per-item tolerance as image_dhash — one garbage
    row must not abort the stage).

    Compose with ``operators.dedup.hamming_block_pairs(sigs, max_hamming,
    id_col='media_id', sig_col='efp', bits=64)`` for volume-shifted /
    re-encoded duplicate clips at corpus scale — signatures shuffle, PCM
    never does. Scale shape: map-only Arrow batches, then the banded
    block equi-join."""
    from sinew_spark.functions.imagecodec import wav_samples_int

    def batch(frames_it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in frames_it:
            ids, fps = [], []
            for r in pdf.itertuples(index=False):
                content = bytes(r.content) if r.content is not None else b""
                try:
                    s, _rate = wav_samples_int(content)
                    v = audio_efp_from_samples(s, frames)
                except Exception:
                    v = None
                ids.append(r.media_id)
                fps.append(v)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="object"),
                    "efp": pd.Series(fps, dtype="object"),
                }
            )

    return media.select("media_id", "content").mapInPandas(batch, AEFP_SCHEMA)
