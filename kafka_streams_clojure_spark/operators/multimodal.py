"""Multimodal column support (`[ext]`, north-star mandate).

Design: media are opaque ``BinaryType`` columns + a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` operators so each task streams batches
of blobs without ever materializing a partition in Python memory.

Decode support (pure stdlib — the container has no Pillow/ffmpeg):

- **BMP** (uncompressed BITMAPINFOHEADER, 8/24/32 bpp) via ``struct``;
- **netpbm** P5 (PGM) / P6 (PPM) binary rasters;
- **WAV** (PCM) via the stdlib ``wave`` module (audio features).

Compressed formats (JPEG/PNG/MP4) would need real codec libraries;
those still raise a clear ``ValueError`` from the dispatcher. The
historical deterministic fake decoder is kept behind ``fake=True``
for plumbing tests that don't care about pixels.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried with every media blob.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),      # png|jpg|wav|mp4|...
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "doc_id long, n_bytes long, checksum string, width int, height int, "
    "n_channels int, mean_luma double"
)


def attach_media(df: DataFrame, binary_col: str, media_type: str, fmt: str) -> DataFrame:
    """Wrap a binary column with its typed metadata struct (real,
    engine-side — no stub)."""
    b = F.col(binary_col)
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit(fmt).alias("format"),
        F.octet_length(b).cast("long").alias("n_bytes"),
        F.md5(b).alias("checksum"),
    )
    return df.withColumn("media_meta", meta)


def _fake_decode(blob: bytes) -> tuple[int, int, int, float]:
    """Deterministic pseudo-image properties derived from the blob
    bytes — kept for plumbing tests that don't need real pixels.
    Returns (width, height, channels, mean_luma)."""
    h = zlib.crc32(blob)
    width = 64 + (h & 0x3FF)           # 64..1087
    height = 64 + ((h >> 10) & 0x3FF)
    channels = 1 + ((h >> 20) & 0x3)   # 1..4
    mean_luma = ((h >> 22) & 0xFF) / 255.0
    return width, height, channels, mean_luma


# --- real pure-stdlib decoders -------------------------------------------


def _bmp_header(width: int, height: int) -> tuple[bytes, int]:
    """(54-byte BM+BITMAPINFOHEADER header, per-row pad bytes) for a
    24-bpp file of the given geometry — the single source of truth the
    scalar encoder and the vectorized batch kernels both assemble from."""
    row_raw = width * 3
    pad = (4 - row_raw % 4) % 4
    data_len = (row_raw + pad) * height
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, data_len, 2835, 2835, 0, 0
    )
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + data_len, 0, 0, 14 + 40)
    return header + dib, pad


def encode_bmp(pixels: bytes, width: int, height: int) -> bytes:
    """Minimal 24-bit uncompressed BMP encoder (pure ``struct``): packs
    ``width*height*3`` pixel bytes (BGR, top-down input) into a valid
    BITMAPINFOHEADER file. Used to turn fixture text bytes into real
    image blobs so the decode path is exercised end-to-end without
    codec libraries; also the write half of a resize/re-encode op."""
    if len(pixels) != width * height * 3:
        raise ValueError(f"need {width * height * 3} pixel bytes, got {len(pixels)}")
    row_raw = width * 3
    header, pad = _bmp_header(width, height)
    # BMP rows are stored bottom-up, each padded to a 4-byte boundary
    rows = [
        pixels[y * row_raw : (y + 1) * row_raw] + b"\x00" * pad
        for y in range(height - 1, -1, -1)
    ]
    return header + b"".join(rows)


def decode_bmp(blob: bytes) -> tuple[int, int, int, float]:
    """Parse an uncompressed BITMAPINFOHEADER BMP (8/24/32 bpp) with
    the stdlib only. Returns (width, height, channels, mean_luma) where
    mean_luma is the mean of all pixel-channel bytes / 255.

    8-bpp images are PALETTE-RESOLVED: each index is mapped through the
    color table (BGRA entries following the DIB header; ``biClrUsed``
    honored, 0 → 256) to the mean of its B/G/R bytes — so mean_luma is
    actual luminance for arbitrary palettes, not the index value.
    Geometry fields are exact at every depth."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP (missing 'BM' magic)")
    data_off = struct.unpack_from("<I", blob, 10)[0]
    dib_size = struct.unpack_from("<I", blob, 14)[0]
    if dib_size < 40:
        raise ValueError(f"unsupported DIB header size {dib_size}")
    width, height = struct.unpack_from("<ii", blob, 18)
    bpp = struct.unpack_from("<H", blob, 28)[0]
    compression = struct.unpack_from("<I", blob, 30)[0]
    if compression != 0:
        raise ValueError(f"compressed BMP (method {compression}) unsupported")
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported bit depth {bpp}")
    channels = bpp // 8
    lut = None
    if bpp == 8:
        n_colors = struct.unpack_from("<I", blob, 46)[0] or 256
        pal_off = 14 + dib_size
        pal = blob[pal_off : pal_off + 4 * n_colors]
        if len(pal) != 4 * n_colors:
            raise ValueError("truncated BMP color table")
        # per-index luma = mean of the entry's B,G,R bytes (matches the
        # 24/32-bpp convention of averaging raw channel bytes)
        lut = [
            (pal[4 * i] + pal[4 * i + 1] + pal[4 * i + 2]) / 3.0
            for i in range(n_colors)
        ]
    top_down = height < 0
    height = abs(height)
    row_raw = width * channels
    stride = (row_raw + 3) & ~3
    total = 0.0
    count = 0
    for y in range(height):
        start = data_off + y * stride
        row = blob[start : start + row_raw]
        if len(row) != row_raw:
            raise ValueError("truncated BMP pixel data")
        if lut is not None:
            try:
                total += sum(lut[b] for b in row)
            except IndexError:
                raise ValueError("BMP pixel index beyond color table") from None
        else:
            total += sum(row)
        count += len(row)
    del top_down  # orientation doesn't change aggregate stats
    mean_luma = (total / count / 255.0) if count else 0.0
    return width, height, channels, mean_luma


def decode_netpbm(blob: bytes) -> tuple[int, int, int, float]:
    """Parse binary netpbm P5 (PGM, 1 channel) / P6 (PPM, 3 channels).
    Returns (width, height, channels, mean_luma)."""
    if blob[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm (P5/P6) blob")
    channels = 1 if blob[:2] == b"P5" else 3
    # header: magic, width, height, maxval as whitespace-separated
    # ASCII tokens; '#' comments run to end-of-line
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if blob[pos : pos + 1] == b"#":
            while pos < len(blob) and blob[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(blob[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit netpbm unsupported")
    n = width * height * channels
    raster = blob[pos : pos + n]
    if len(raster) != n:
        raise ValueError("truncated netpbm raster")
    mean_luma = (sum(raster) / n / maxval) if n else 0.0
    return width, height, channels, mean_luma


def decode_image(blob: bytes) -> tuple[int, int, int, float]:
    """Dispatch on magic bytes to a real pure-stdlib decoder. Formats
    needing codec libraries (JPEG/PNG/...) raise ValueError with the
    detected format named."""
    if blob[:2] == b"BM":
        return decode_bmp(blob)
    if blob[:2] in (b"P5", b"P6"):
        return decode_netpbm(blob)
    known = {
        b"\x89PNG": "png",
        b"\xff\xd8\xff": "jpeg",
        b"GIF8": "gif",
    }
    for magic, name in known.items():
        if blob[: len(magic)] == magic:
            raise ValueError(
                f"{name} requires a codec library (Pillow); "
                "stdlib decode supports BMP and netpbm P5/P6"
            )
    raise ValueError("unrecognized image format")


AUDIO_FEATURES_SCHEMA = (
    "doc_id long, n_bytes long, n_channels int, sample_rate int, "
    "n_frames long, duration_s double, rms double"
)


def decode_wav(blob: bytes) -> tuple[int, int, int, float]:
    """Parse a PCM WAV via the stdlib ``wave`` module. Returns
    (n_channels, sample_rate, n_frames, rms) with rms normalized to
    [0, 1] by the sample width's full scale."""
    with wave.open(io.BytesIO(blob), "rb") as w:
        n_channels = w.getnchannels()
        rate = w.getframerate()
        n_frames = w.getnframes()
        sw = w.getsampwidth()
        frames = w.readframes(n_frames)
    if sw == 2:
        vals = struct.unpack(f"<{len(frames) // 2}h", frames)
        scale = 32768.0
    elif sw == 1:  # 8-bit WAV is unsigned, centered at 128
        vals = [b - 128 for b in frames]
        scale = 128.0
    else:
        raise ValueError(f"sample width {sw} unsupported (8/16-bit PCM only)")
    if vals:
        rms = (sum(v * v for v in vals) / len(vals)) ** 0.5 / scale
    else:
        rms = 0.0
    return n_channels, rate, n_frames, rms


def decode_audio_features(
    df: DataFrame, binary_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """WAV feature extraction (channels, rate, duration, RMS) via the
    same Arrow-batched mapInPandas shape as images."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "n_bytes", "n_channels", "sample_rate",
                "n_frames", "duration_s", "rms",
            )}
            for i, blob in zip(pdf["__id"], pdf["__blob"]):
                ch, rate, nf, rms = decode_wav(blob)
                rows["doc_id"].append(i)
                rows["n_bytes"].append(len(blob))
                rows["n_channels"].append(ch)
                rows["sample_rate"].append(rate)
                rows["n_frames"].append(nf)
                rows["duration_s"].append(nf / rate if rate else 0.0)
                rows["rms"].append(rms)
            yield pd.DataFrame(rows)

    slim = df.select(F.col(id_col).alias("__id"), F.col(binary_col).alias("__blob"))
    return slim.mapInPandas(extract, schema=AUDIO_FEATURES_SCHEMA)


def decode_image_features(
    df: DataFrame, binary_col: str, id_col: str = "doc_id", fake: bool = False
) -> DataFrame:
    """Decode + feature-extract over media blobs via mapInPandas: each
    Arrow batch of blobs yields one row of features per blob. The
    iterator contract keeps peak memory at one batch, independent of
    partition size — the 100 TB-safe shape for fat binary columns.

    ``fake=False`` (default) runs the REAL pure-stdlib decoders
    (:func:`decode_image`: BMP / netpbm); ``fake=True`` keeps the
    deterministic pseudo-decoder for plumbing-only tests.
    """
    decode = _fake_decode if fake else decode_image

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(b) for b in pdf["__blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["__id"].values,
                    "n_bytes": [len(b) for b in pdf["__blob"]],
                    "checksum": [hashlib.md5(b).hexdigest() for b in pdf["__blob"]],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "n_channels": [f[2] for f in feats],
                    "mean_luma": [f[3] for f in feats],
                }
            )

    slim = df.select(F.col(id_col).alias("__id"), F.col(binary_col).alias("__blob"))
    return slim.mapInPandas(extract, schema=IMAGE_FEATURES_SCHEMA)


def text_to_bmp_blobs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", width: int = 32
) -> DataFrame:
    """Deterministically re-encode text bytes as REAL 24-bit BMP blobs
    (fixture generator for codec-less containers, and the write half of
    a re-encode op): utf-8 bytes zero-padded to a ``width × h × 3``
    raster. Same Arrow-batched mapInPandas shape as the decoders."""
    row_bytes = width * 3

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for i, txt in zip(pdf["__id"], pdf["__t"]):
                raw = (txt or "").encode("utf-8") or b"\x00"
                h = -(-len(raw) // row_bytes)  # ceil
                raw = raw.ljust(h * row_bytes, b"\x00")
                ids.append(i)
                blobs.append(encode_bmp(raw, width, h))
            yield pd.DataFrame({"doc_id": ids, "blob": blobs})

    slim = df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t"))
    return slim.mapInPandas(encode, schema="doc_id long, blob binary")


def text_to_wav_blobs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", rate: int = 8000
) -> DataFrame:
    """Deterministically re-encode text bytes as REAL 16-bit mono PCM
    WAV blobs (stdlib ``wave`` writer): each utf-8 byte becomes one
    centered 16-bit sample."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for i, txt in zip(pdf["__id"], pdf["__t"]):
                raw = (txt or "").encode("utf-8") or b"\x00"
                samples = struct.pack(f"<{len(raw)}h", *((b - 128) * 256 for b in raw))
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(rate)
                    w.writeframes(samples)
                ids.append(i)
                blobs.append(buf.getvalue())
            yield pd.DataFrame({"doc_id": ids, "blob": blobs})

    slim = df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__t"))
    return slim.mapInPandas(encode, schema="doc_id long, blob binary")


def sample_frames(
    df: DataFrame, binary_col: str, id_col: str = "doc_id", every_n: int = 10
) -> DataFrame:
    """Frame-sampling plumbing for video blobs: emits (id, frame_idx,
    frame_blob) rows. The splitter is the same deterministic stub
    (fixed-size chunks as stand-in frames); the Spark shape — explode
    via mapInPandas iterator, downstream repartition by id — is real."""

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, blob in zip(pdf["__id"], pdf["__blob"]):
                chunk = 256  # STUB: fixed-size chunks stand in for decoded frames
                n = max(1, len(blob) // chunk)
                for fi in range(0, n, every_n):
                    ids.append(i)
                    idxs.append(fi)
                    frames.append(bytes(blob[fi * chunk : (fi + 1) * chunk]))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    slim = df.select(F.col(id_col).alias("__id"), F.col(binary_col).alias("__blob"))
    return slim.mapInPandas(split, schema="doc_id long, frame_idx int, frame binary")


def _bmp24_geometry(blob: bytes) -> tuple[int, int, int, bool]:
    """(data_off, width, height, top_down) of a 24-bpp uncompressed
    BMP, with exactly :func:`_bmp_pixel_rows`' validation domain (same
    errors on the same malformed inputs) so the vectorized batch
    kernels accept/reject identically to the scalar path."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP (missing 'BM' magic)")
    data_off = struct.unpack_from("<I", blob, 10)[0]
    width, height = struct.unpack_from("<ii", blob, 18)
    bpp = struct.unpack_from("<H", blob, 28)[0]
    if bpp != 24:
        raise ValueError(f"resize supports 24-bpp BMPs, got {bpp}")
    top_down = height < 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    if height and len(blob) < data_off + (height - 1) * stride + width * 3:
        raise ValueError("truncated BMP pixel data")
    return data_off, width, height, top_down


def _bmp_pixel_rows(blob: bytes) -> tuple[int, int, list[bytes]]:
    """24-bpp BMP → (width, height, top-down raw BGR rows) for pixel
    ops (resize); strict twin of :func:`decode_bmp`'s parser."""
    data_off, width, height, top_down = _bmp24_geometry(blob)
    row_raw = width * 3
    stride = (row_raw + 3) & ~3
    rows = []
    for y in range(height):
        start = data_off + y * stride
        rows.append(blob[start : start + row_raw])
    if not top_down:
        rows.reverse()  # stored bottom-up -> return top-down
    return width, height, rows


def _bmp24_batches(blobs: list[bytes]) -> Iterator[tuple[list[int], np.ndarray, int, int]]:
    """Group a batch of 24-bpp BMP blobs by geometry and yield
    ``(batch positions, top-down rasters (n, h, w*3) uint8, w, h)`` —
    the whole-batch gather the vectorized dHash/resize kernels run on
    (guide §4.2). Blobs of one fixture family share a geometry, so the
    per-blob Python work collapses to one header parse + one fancy
    index."""
    geo: dict[tuple[int, int, int, bool], list[int]] = {}
    raw: list[bytes] = []
    for i, blob in enumerate(blobs):
        b = bytes(blob)
        raw.append(b)
        geo.setdefault(_bmp24_geometry(b), []).append(i)
    for (off, w, h, td), idxs in geo.items():
        row_raw = w * 3
        stride = (row_raw + 3) & ~3
        ys = np.arange(h)
        stored = ys if td else (h - 1 - ys)  # top-down order
        pos = off + stored[:, None] * stride + np.arange(row_raw)[None, :]
        rasters = np.stack(
            [np.frombuffer(raw[i], np.uint8)[pos] for i in idxs]
        ) if idxs else np.zeros((0, h, row_raw), np.uint8)
        yield idxs, rasters, w, h


def resize_bmp(blob: bytes, factor: int) -> bytes:
    """Nearest-neighbor integer decimation of a 24-bpp BMP: keep every
    ``factor``-th pixel in both axes starting at (0, 0) — the
    deterministic stand-in for codec-library resampling, with the
    plumbing (decode → pixel op → re-encode) fully real. New dims are
    ``ceil(w/factor) × ceil(h/factor)``; kept pixels are bit-exact
    copies, so feature extraction after resize is exactly predictable
    from the original raster."""
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")
    w, h, rows = _bmp_pixel_rows(blob)
    out = bytearray()
    for y in range(0, h, factor):
        row = rows[y]
        for x in range(0, w, factor):
            out += row[3 * x : 3 * x + 3]
    new_w = -(-w // factor)
    new_h = -(-h // factor)
    return encode_bmp(bytes(out), new_w, new_h)


def resize_images(
    df: DataFrame, binary_col: str, id_col: str = "doc_id", factor: int = 2
) -> DataFrame:
    """Batch image resize over a binary column (Arrow-batched
    mapInPandas, one batch of blobs in memory at a time — the same
    100 TB-safe shape as the decoders). Returns (id, blob) with every
    blob nearest-neighbor decimated by ``factor``."""

    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # geometry-grouped whole-batch decimation (r13, guide §4.2):
        # one strided numpy slice per geometry group instead of a
        # per-pixel Python loop per blob; output bytes identical to
        # resize_bmp (same kept pixels, same encode_bmp header/pad).
        for pdf in batches:
            blobs_in = list(pdf["__blob"])
            out: list[bytes | None] = [None] * len(blobs_in)
            for idxs, rasters, w, h in _bmp24_batches(blobs_in):
                n = len(idxs)
                kept = rasters.reshape(n, h, w, 3)[:, ::factor, ::factor, :]
                h2, w2 = kept.shape[1], kept.shape[2]
                hdr, pad = _bmp_header(w2, h2)
                rows = np.zeros((n, h2, w2 * 3 + pad), np.uint8)
                rows[:, :, : w2 * 3] = kept.reshape(n, h2, w2 * 3)[:, ::-1, :]
                for i, raster in zip(idxs, rows):
                    out[i] = hdr + raster.tobytes()
            yield pd.DataFrame({"doc_id": pdf["__id"].values, "blob": out})

    slim = df.select(F.col(id_col).alias("__id"), F.col(binary_col).alias("__blob"))
    return slim.mapInPandas(run, schema="doc_id long, blob binary")


def sample_wav_frames(
    df: DataFrame, binary_col: str, id_col: str = "doc_id", stride: int = 8
) -> DataFrame:
    """Frame sampling over an audio/video-style binary column: decode
    each WAV and emit every ``stride``-th frame as its own typed row
    (id, frame_idx, amplitude) — the keyframe-extraction plumbing shape
    (1 fat blob → N thin rows) with a real stdlib decoder. 16-bit mono
    PCM; amplitude is the raw signed sample."""
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, amps = [], [], []
            for i, blob in zip(pdf["__id"], pdf["__blob"]):
                with wave.open(io.BytesIO(blob), "rb") as w:
                    if w.getsampwidth() != 2 or w.getnchannels() != 1:
                        raise ValueError("frame sampling expects 16-bit mono PCM")
                    n = w.getnframes()
                    frames = w.readframes(n)
                vals = struct.unpack(f"<{n}h", frames)
                for j in range(0, n, stride):
                    ids.append(i)
                    idxs.append(j)
                    amps.append(vals[j])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "amplitude": amps},
                dtype="int64",
            )

    slim = df.select(F.col(id_col).alias("__id"), F.col(binary_col).alias("__blob"))
    return slim.mapInPandas(run, schema="doc_id long, frame_idx long, amplitude long")


#: Geometry of the deterministic gradient fixture rasters. w=36 and
#: h=16 are chosen so EVERY dHash grid sample position survives a 2×
#: nearest-neighbor decimation exactly: columns (i*36)//9 = 4i and rows
#: (j*16)//8 = 2j are all even, and on the 18×8 decimated image the
#: grid lands on (i*18)//9 = 2i, (j*8)//8 = j — i.e. original pixels
#: (4i, 2j) again. A resized copy therefore carries an IDENTICAL dHash
#: (the scale-invariance perceptual hashing is built for), while its
#: md5 differs — exactly the duplicate class `q_multimodal_dedup`'s
#: exact-bytes hash misses.
GRADIENT_W, GRADIENT_H = 36, 16


def gradient_bmp_blobs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministically render each doc as a SMOOTH 24-bpp gradient
    BMP (the perceptual-hash fixture twin of :func:`text_to_bmp_blobs`,
    whose raw-byte rasters are white noise — perceptual hashes are
    meaningless on noise). Four integer params are drawn from
    md5(text) (the engine-portable `_bucket` idiom: first four 8-hex
    chunks as uint32s), and pixel luma is a folded triangle wave

        t(x, y) = (a·x)//35 + (b·y)//15 + (c·x·(y+5))//700 + d
        v(x, y) = |t mod 510 − 255|              (all-integer, 0..255)

    so DuckDB can recompute every pixel — and hence the full dHash —
    from the text alone (the q_multimodal_resize oracle discipline).
    All three channels carry v. Params are computed SPARK-SIDE (JVM
    md5/conv); only the 576-pixel raster loop is Python, Arrow-batched.
    """
    w, h = GRADIENT_W, GRADIENT_H
    hx = F.md5(F.coalesce(F.col(text_col), F.lit("")))

    def chunk(pos: int) -> F.Column:
        return F.conv(F.substring(hx, pos, 8), 16, 10).cast("long")

    slim = df.select(
        F.col(id_col).alias("__id"),
        (F.lit(256) + chunk(1) % 768).alias("__a"),
        (F.lit(256) + chunk(9) % 768).alias("__b"),
        (chunk(17) % 1024).alias("__c"),
        (chunk(25) % 510).alias("__d"),
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # whole-batch numpy broadcast of the integer triangle wave
        # (r13, guide §4.2): all params are non-negative, so int64
        # floor-div/mod match Python's exactly; pixel assembly is one
        # repeat + bottom-up flip per batch instead of a 576-step
        # per-doc Python loop. Bytes identical to encode_bmp (w*3=108
        # is already 4-byte aligned: pad 0).
        hdr, pad = _bmp_header(w, h)
        assert pad == 0
        xs = np.arange(w, dtype=np.int64)[None, None, :]
        ys = np.arange(h, dtype=np.int64)[None, :, None]
        for pdf in batches:
            a = pdf["__a"].to_numpy(np.int64)[:, None, None]
            b = pdf["__b"].to_numpy(np.int64)[:, None, None]
            c = pdf["__c"].to_numpy(np.int64)[:, None, None]
            d = pdf["__d"].to_numpy(np.int64)[:, None, None]
            t = (
                (a * xs) // (w - 1)
                + (b * ys) // (h - 1)
                + (c * xs * (ys + 5)) // ((w - 1) * (h + 4))
                + d
            )
            v = np.abs((t % 510) - 255).astype(np.uint8)
            px = np.repeat(v, 3, axis=2)[:, ::-1, :]  # BGR, bottom-up
            blobs = [hdr + raster.tobytes() for raster in px]
            yield pd.DataFrame({"doc_id": pdf["__id"].values, "blob": blobs})

    return slim.mapInPandas(encode, schema="doc_id long, blob binary")


def dhash_bmp(blob: bytes) -> tuple[int, int, int, int]:
    """64-bit dHash (difference hash) of a 24-bpp BMP, packed as four
    16-bit bands: point-sample a 9×8 luma grid at ((i·w)//9, (j·h)//8),
    luma = B+G+R of the sampled pixel (integer — no float ties), and
    bit(j,i) = 1 iff luma(i,j) > luma(i+1,j). Band k carries grid rows
    2k and 2k+1: bit position (j mod 2)·8 + i. The textbook perceptual
    hash: smooth images get stable gradient-sign bits, and any blob
    whose kept pixels are a subsample of another's (re-encode, integer
    decimation) lands within a few bits."""
    w, h, rows = _bmp_pixel_rows(blob)
    hs = [0, 0, 0, 0]
    for j in range(8):
        row = rows[(j * h) // 8]
        s = []
        for i in range(9):
            gx = 3 * ((i * w) // 9)
            s.append(row[gx] + row[gx + 1] + row[gx + 2])
        for i in range(8):
            if s[i] > s[i + 1]:
                hs[j // 2] |= 1 << ((j % 2) * 8 + i)
    return hs[0], hs[1], hs[2], hs[3]


def dhash_images(
    df: DataFrame, binary_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """Batch dHash over a binary image column (Arrow-batched
    mapInPandas, same 100 TB shape as the decoders): returns
    (vid, h0..h3) — four 16-bit bands per blob, 5 longs/row, the
    id-width table every downstream banding join keys on (raw blobs
    never move past this point)."""

    # bit weight of grid cell (j, i) within its band j//2
    _wmat = (1 << ((np.arange(8)[:, None] % 2) * 8 + np.arange(8)[None, :])).astype(
        np.int64
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # geometry-grouped whole-batch dHash (r13, guide §4.2): sample
        # the 9×8 luma grid with one fancy index per group and pack the
        # difference bits with a tensor product — no per-pixel Python.
        # Bit-identical to dhash_bmp (integer comparisons only).
        for pdf in batches:
            blobs_in = list(pdf["__blob"])
            hs = np.zeros((len(blobs_in), 4), np.int64)
            for idxs, rasters, w, h in _bmp24_batches(blobs_in):
                n = len(idxs)
                rows_j = (np.arange(8) * h) // 8
                cols_i = (np.arange(9) * w) // 9
                grid = rasters.reshape(n, h, w, 3)[:, rows_j][:, :, cols_i, :]
                s = grid.astype(np.int64).sum(-1)  # (n, 8, 9) luma
                bits = (s[:, :, :8] > s[:, :, 1:]).astype(np.int64)
                weighted = bits * _wmat[None]  # (n, 8, 8)
                for k in range(4):
                    hs[idxs, k] = weighted[:, 2 * k : 2 * k + 2, :].sum((1, 2))
            yield pd.DataFrame(
                {
                    "vid": pdf["__id"].to_numpy(np.int64),
                    "h0": hs[:, 0],
                    "h1": hs[:, 1],
                    "h2": hs[:, 2],
                    "h3": hs[:, 3],
                }
            )

    slim = df.select(F.col(id_col).alias("__id"), F.col(binary_col).alias("__blob"))
    return slim.mapInPandas(
        run, schema="vid long, h0 long, h1 long, h2 long, h3 long"
    )


def phash_near_dup_pairs(
    hashes: DataFrame,
    id_col: str = "vid",
    max_hamming: int = 2,
    max_bucket: int | None = 50_000,
    n_bands: int | None = None,
    levels: int | None = None,
) -> DataFrame:
    """Perceptual-hash near-dup pairs via Hamming-band blocking (the
    SimHash machinery, operators/dedup.simhash_near_dups, applied to
    media): two images within ``max_hamming`` of 64 bits must agree
    EXACTLY on at least one band when the hash is cut into
    ``max_hamming + 1`` bands (pigeonhole: k flipped bits touch at most
    k bands), so candidates come from a (band, value) equi-join — never
    images² — with ZERO recall loss at this threshold, unlike
    probabilistic MinHash banding.

    Band GEOMETRY is the scale knob the r9 rehearsal measured
    (SCALE.md: 4×16-bit bands grew candidates ∝ N²/2¹⁶ once corpus ≈
    band space): ``n_bands`` defaults to the pigeonhole MINIMUM
    ``max_hamming + 1`` — at the standard max_hamming=2 that is THREE
    ~21-bit bands instead of four 16-bit ones, identical guaranteed
    recall, 2²¹/2¹⁶ = 32× larger band space (→ ~32× fewer random
    collisions) AND 25% fewer band rows. Pass a larger ``n_bands`` only
    to trade candidate mass for per-band selectivity consciously; the
    pigeonhole guarantee needs ``n_bands >= max_hamming + 1``.

    The band join runs over DISTINCT hash CLASSES, not vids (r10): the
    corpus collapses to (h64 → member vids) first, so duplicate-heavy
    corpora — exactly the ones a dedup pipeline sees — pay the
    quadratic band-bucket cost once per distinct hash, never per copy
    (measured 8× candidate cut on the 10× rehearsal fixture where 100k
    vids share 35.5k hashes; combined with the 3-band geometry, 27×
    less join work than r9). Identical-hash pairs (hamming 0) are
    emitted directly from the classes; surviving inter-class candidates
    expand to vid pairs only AFTER the exact Hamming filter — both
    expansions are output-sized, irreducible. Banding and class
    collapse affect WHICH candidates are scored, never the emitted
    pairs (the oracle-gated keys stay exact). ``max_bucket`` is the
    family's loud-fail skew guard, now counted over distinct-hash band
    buckets; one metadata-scale aggregate per call.

    ``levels=None`` (default) derives the blocking DEPTH from the
    distinct-class count (r10 verdict #4 — geometry from corpus size,
    not a static knob): beyond 2²¹ classes the level-1 band space
    saturates and `operators/dedup.hamming_band_rows` switches to its
    hierarchical double-pigeonhole keys (21→35-bit effective, zero
    recall loss, collision mass linear again up to 2³⁵ classes).
    Emitted pairs are level-independent — banding only selects which
    candidates are SCORED."""
    from kafka_streams_clojure_spark.operators._cache import persist_if_uncached
    from kafka_streams_clojure_spark.operators.dedup import (
        auto_band_levels,
        hamming_band_rows,
    )

    nb = n_bands if n_bands is not None else max_hamming + 1
    if nb < max_hamming + 1:
        raise ValueError(
            f"n_bands={nb} breaks the pigeonhole recall guarantee for "
            f"max_hamming={max_hamming} (need >= {max_hamming + 1})"
        )
    # repack the four 16-bit storage columns into one 64-bit value
    # (logical shifts below: the top band may cross the sign bit)
    h64 = (
        F.shiftleft(F.col("h3"), 48)
        .bitwiseOR(F.shiftleft(F.col("h2"), 32))
        .bitwiseOR(F.shiftleft(F.col("h1"), 16))
        .bitwiseOR(F.col("h0"))
    )
    # members: (h64, vid) — consumed by the intra-class pairs and both
    # expansion joins; classes: one row per distinct hash
    members = persist_if_uncached(
        hashes.select(F.col(id_col).alias("__vid"), h64.alias("__h64"))
    )
    classes = persist_if_uncached(members.select("__h64").distinct())
    # (a) identical-hash pairs: hamming 0, straight from the classes
    ma = members.select(F.col("__h64"), F.col("__vid").alias("id_a"))
    mb = members.select(F.col("__h64"), F.col("__vid").alias("id_b"))
    intra = (
        ma.join(mb, "__h64")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.lit(0).cast("long").alias("hamming"))
    )
    # (b) inter-class: band join over distinct hashes only, geometry
    # SELF-SCALING from the class count (r10 verdict #4): hierarchical
    # double-pigeonhole keys engage when the corpus outgrows the
    # level-1 band space (hamming_band_rows levels=2 — 21→35-bit
    # effective keys, recall guarantee intact, collisions linear again)
    if levels is None:
        levels = auto_band_levels(classes.count(), max_hamming, nb)
    bands = hamming_band_rows(
        classes, "__h64", max_hamming, n_bands=nb, levels=levels
    ).withColumnRenamed("bucket", "hb")
    if max_bucket is not None:
        oversized = [
            (int(r["band"]), int(r["hb"]), int(r["__n"]))
            for r in bands.groupBy("band", "hb")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > max_bucket)
            .collect()
        ]
        if oversized:
            raise RuntimeError(
                f"phash_near_dup_pairs: band bucket(s) exceed max_bucket="
                f"{max_bucket}: {oversized[:10]}; widen the bands or"
                " pre-split the degenerate image class"
            )
    ca = bands.select(F.col("__h64").alias("__ha"), "band", "hb")
    cb = bands.select(F.col("__h64").alias("__hb"), "band", "hb")
    ham = F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb"))).cast("long")
    close_classes = (
        ca.join(cb, ["band", "hb"])
        .filter(F.col("__ha") < F.col("__hb"))
        .select("__ha", "__hb")
        .distinct()
        .select("__ha", "__hb", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
    inter = (
        close_classes.join(
            members.select(F.col("__h64").alias("__ha"),
                           F.col("__vid").alias("__va")), "__ha")
        .join(
            members.select(F.col("__h64").alias("__hb"),
                           F.col("__vid").alias("__vb")), "__hb")
        .select(
            F.least("__va", "__vb").alias("id_a"),
            F.greatest("__va", "__vb").alias("id_b"),
            "hamming",
        )
    )
    return intra.unionByName(inter)


#: eHash geometry: 65 grid points -> 64 difference bits in four 16-bit
#: bands (the dHash band layout, so phash_near_dup_pairs blocks it
#: unchanged). Segment length MUST stay even so a 2x decimation keeps
#: every grid point (position (k*n)//65 = k*SEG_LEN -> k*SEG_LEN/2).
EHASH_POINTS = 65
EHASH_SEG_LEN = 4


def _wav_header(n_frames: int, rate: int) -> bytes:
    """The exact byte prefix the stdlib ``wave`` writer emits before
    the frame data for a 16-bit mono PCM file of ``n_frames`` at
    ``rate`` — computed BY that writer (one tiny in-memory file), so
    vectorized kernels that append raw int16 frames to it produce
    byte-identical files to the scalar wave-module path."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"\x00\x00" * n_frames)
    raw = buf.getvalue()
    return raw[: len(raw) - 2 * n_frames]


def _wav_pcm16_mono_view(blob: bytes) -> tuple[int, int, int]:
    """(n_frames, rate, data byte offset) of a 16-bit mono PCM WAV via
    a plain RIFF chunk walk; raises ValueError on anything else (the
    caller falls back to the stdlib ``wave`` path, which keeps the
    batch kernels' accept/reject behavior identical to the scalar
    code on unusual inputs)."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        sz = struct.unpack_from("<I", blob, pos + 4)[0]
        if cid == b"fmt " and fmt is None:
            fmt = (pos + 8, sz)
        elif cid == b"data":
            data = (pos + 8, sz)
            break
        pos += 8 + sz + (sz & 1)
    if fmt is None or data is None or fmt[1] < 16:
        raise ValueError("missing fmt/data chunk")
    tag, nch, frate, _, _, bits = struct.unpack_from("<HHIIHH", blob, fmt[0])
    if tag != 1 or nch != 1 or bits != 16:
        raise ValueError("not 16-bit mono PCM")
    off, dsz = data
    if off + dsz > len(blob):
        raise ValueError("truncated data chunk")
    return dsz // 2, frate, off


def stepped_wav_blobs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", rate: int = 8000
) -> DataFrame:
    """Deterministically render each doc as a STEPPED-tone mono PCM WAV
    (the perceptual-hash fixture twin of :func:`text_to_wav_blobs`,
    whose byte-for-byte samples are white noise — perceptual hashes are
    meaningless on noise): 65 constant-level segments of 4 samples,
    level_k = md5(text || '#k') folded into [32, 224), sample =
    (level−128)·256. Levels are computed SPARK-SIDE (JVM md5/conv, the
    gradient_bmp_blobs discipline) so DuckDB can recompute every grid
    sample — and hence the full eHash — from the text alone; only the
    260-sample writer loop is Python, Arrow-batched."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    lv = F.array(
        *[
            (
                F.conv(
                    F.substring(F.md5(F.concat(txt, F.lit(f"#{k}"))), 1, 4),
                    16,
                    10,
                ).cast("int")
                % 192
                + 32
            )
            for k in range(EHASH_POINTS)
        ]
    )
    slim = df.select(F.col(id_col).alias("__id"), lv.alias("__lv"))

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # whole-batch numpy sample synthesis (r13, guide §4.2): one
        # (n, 65) level matrix → repeat ×SEG_LEN → little-endian int16
        # rows appended to the wave-writer's own header bytes (identical
        # files: _wav_header IS the stdlib writer's output).
        hdr = _wav_header(EHASH_POINTS * EHASH_SEG_LEN, rate)
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame({"doc_id": [], "blob": []})
                continue
            lv = np.stack([np.asarray(x, np.int64) for x in pdf["__lv"]])
            samples = np.repeat((lv - 128) * 256, EHASH_SEG_LEN, axis=1)
            rows = samples.astype("<i2")
            blobs = [hdr + r.tobytes() for r in rows]
            yield pd.DataFrame({"doc_id": pdf["__id"].values, "blob": blobs})

    return slim.mapInPandas(encode, schema="doc_id long, blob binary")


def decimate_wavs(
    df: DataFrame, binary_col: str, factor: int = 2, id_col: str = "doc_id"
) -> DataFrame:
    """Keep every ``factor``-th sample and RE-ENCODE as a real WAV —
    the audio resample/transcode duplicate class (bytes, duration and
    md5 all change; perceptual content doesn't). The audio twin of
    :func:`resize_images`; Arrow-batched decode→stride→re-encode."""

    def _slow(blob: bytes) -> bytes:
        # stdlib path for blobs the RIFF walker declines — identical to
        # the pre-r13 scalar loop (and its error behavior)
        with wave.open(io.BytesIO(blob)) as w:
            n = w.getnframes()
            rate = w.getframerate()
            raw = w.readframes(n)
        samples = struct.unpack(f"<{n}h", raw)
        kept = samples[::factor]
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(struct.pack(f"<{len(kept)}h", *kept))
        return buf.getvalue()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # vectorized stride + re-encode (r13, guide §4.2): frombuffer →
        # [::factor] → header bytes from the wave writer itself; headers
        # cached per (rate, n_out). Byte-identical output.
        hdrs: dict[tuple[int, int], bytes] = {}
        for pdf in batches:
            blobs = []
            for blob in pdf["__blob"]:
                b = bytes(blob)
                try:
                    n, rate, off = _wav_pcm16_mono_view(b)
                except ValueError:
                    blobs.append(_slow(b))
                    continue
                kept = np.frombuffer(b, "<i2", count=n, offset=off)[::factor]
                key = (rate, len(kept))
                if key not in hdrs:
                    hdrs[key] = _wav_header(len(kept), rate)
                blobs.append(hdrs[key] + kept.tobytes())
            yield pd.DataFrame({"doc_id": pdf["__id"].values, "blob": blobs})

    slim = df.select(F.col(id_col).alias("__id"), F.col(binary_col).alias("__blob"))
    return slim.mapInPandas(run, schema="doc_id long, blob binary")


def ehash_wav(blob: bytes) -> tuple[int, int, int, int]:
    """64-bit eHash (the dHash idea on audio): grid-sample 65 amplitude
    points at positions (k·n)//65, bit k = 1 iff point_k > point_{k+1},
    packed as four 16-bit bands (band j = bits 16j..16j+15). Integer
    comparisons only — no float ties; any blob whose kept samples are a
    stride of another's (re-encode, integer decimation) hashes
    identically when the grid positions survive the stride."""
    with wave.open(io.BytesIO(bytes(blob))) as w:
        n = w.getnframes()
        raw = w.readframes(n)
    samples = struct.unpack(f"<{n}h", raw)
    pts = [samples[(k * n) // EHASH_POINTS] for k in range(EHASH_POINTS)]
    hs = [0, 0, 0, 0]
    for k in range(EHASH_POINTS - 1):
        if pts[k] > pts[k + 1]:
            hs[k // 16] |= 1 << (k % 16)
    return hs[0], hs[1], hs[2], hs[3]


def ehash_wavs(
    df: DataFrame, binary_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """Batch eHash over a binary audio column — the audio twin of
    :func:`dhash_images`: (vid, h0..h3), 5 longs/row, the id-width
    table the Hamming banding join keys on (blobs never move past
    this point)."""

    _w16 = 1 << np.arange(16, dtype=np.int64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # vectorized grid sample + bit pack (r13, guide §4.2), grouped
        # by frame count so the 65 grid positions are computed once per
        # group; unusual blobs fall back to the scalar ehash_wav.
        # Bit-identical (integer comparisons only).
        for pdf in batches:
            blobs_in = [bytes(b) for b in pdf["__blob"]]
            hs = np.zeros((len(blobs_in), 4), np.int64)
            groups: dict[int, tuple[list[int], list[np.ndarray]]] = {}
            for i, b in enumerate(blobs_in):
                try:
                    n, _, off = _wav_pcm16_mono_view(b)
                    samples = np.frombuffer(b, "<i2", count=n, offset=off)
                except ValueError:
                    hs[i] = ehash_wav(b)
                    continue
                groups.setdefault(n, ([], []))[0].append(i)
                groups[n][1].append(samples)
            for n, (idxs, arrs) in groups.items():
                pos = (np.arange(EHASH_POINTS) * n) // EHASH_POINTS
                pts = np.stack(arrs).astype(np.int64)[:, pos]
                bits = (pts[:, :-1] > pts[:, 1:]).astype(np.int64)  # (g, 64)
                for k in range(4):
                    hs[idxs, k] = bits[:, 16 * k : 16 * k + 16] @ _w16
            yield pd.DataFrame(
                {
                    "vid": pdf["__id"].to_numpy(np.int64),
                    "h0": hs[:, 0],
                    "h1": hs[:, 1],
                    "h2": hs[:, 2],
                    "h3": hs[:, 3],
                }
            )

    slim = df.select(F.col(id_col).alias("__id"), F.col(binary_col).alias("__blob"))
    return slim.mapInPandas(
        run, schema="vid long, h0 long, h1 long, h2 long, h3 long"
    )
