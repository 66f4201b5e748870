"""r13 vectorized multimodal kernels: the batch operators
(gradient_bmp_blobs / resize_images / dhash_images, stepped_wav_blobs /
decimate_wavs / ehash_wavs) were rewritten from per-pixel Python loops
to whole-batch numpy (guide §4.2). These tests pin BYTE/BIT equality
against the scalar reference functions (which stay the public
single-blob API), including mixed geometries in one batch — the shape
the near-dup corpus (originals ∪ decimated re-encodes) actually feeds
the kernels."""

import io
import struct
import wave

import pytest
from pyspark.sql import functions as F

from kafka_streams_clojure_spark.operators.multimodal import (
    EHASH_SEG_LEN,
    decimate_wavs,
    dhash_bmp,
    dhash_images,
    ehash_wav,
    ehash_wavs,
    encode_bmp,
    gradient_bmp_blobs,
    resize_bmp,
    resize_images,
    stepped_wav_blobs,
)
from kafka_streams_clojure_spark.queries._util import load_table


def _docs(spark, sf_dir, n=40):
    return load_table(spark, sf_dir, "documents").limit(n)


def test_gradient_blobs_byte_identical_to_scalar_formula(spark, sf_dir):
    """The numpy triangle-wave render emits byte-identical BMPs to the
    per-pixel integer formula + encode_bmp (the pre-r13 scalar loop,
    re-derived here from the md5 params the oracle also uses)."""
    import hashlib

    from kafka_streams_clojure_spark.operators.multimodal import (
        GRADIENT_H,
        GRADIENT_W,
    )

    docs = _docs(spark, sf_dir, 8)
    rows = docs.select("doc_id", "text").collect()
    got = {
        int(r.doc_id): bytes(r.blob)
        for r in gradient_bmp_blobs(docs).collect()
    }
    w, h = GRADIENT_W, GRADIENT_H
    for r in rows:
        hx = hashlib.md5((r.text or "").encode("utf-8")).hexdigest()
        a = 256 + int(hx[0:8], 16) % 768
        b = 256 + int(hx[8:16], 16) % 768
        c = int(hx[16:24], 16) % 1024
        d = int(hx[24:32], 16) % 510
        px = bytearray()
        for y in range(h):
            for x in range(w):
                t = (
                    (a * x) // (w - 1)
                    + (b * y) // (h - 1)
                    + (c * x * (y + 5)) // ((w - 1) * (h + 4))
                    + d
                )
                v = abs((t % 510) - 255)
                px += bytes((v, v, v))
        assert got[int(r.doc_id)] == encode_bmp(bytes(px), w, h)


def test_dhash_and_resize_batch_match_scalar_on_mixed_geometry(spark, sf_dir):
    """One batch holding three BMP geometries (36×16 originals, their
    2× and 3× decimations) — the vectorized group-gather must hash and
    resize each exactly like the scalar kernels."""
    origs = [
        bytes(r.blob) for r in gradient_bmp_blobs(_docs(spark, sf_dir)).collect()
    ]
    mixed = (
        origs
        + [resize_bmp(b, 2) for b in origs[:15]]
        + [resize_bmp(b, 3) for b in origs[:7]]
    )
    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate(mixed)], "doc_id long, blob binary"
    )
    hashes = {
        int(r.vid): (int(r.h0), int(r.h1), int(r.h2), int(r.h3))
        for r in dhash_images(df, "blob").collect()
    }
    assert len(hashes) == len(mixed)
    for i, b in enumerate(mixed):
        assert hashes[i] == dhash_bmp(b), i
    resized = {
        int(r.doc_id): bytes(r.blob)
        for r in resize_images(df, "blob", factor=2).collect()
    }
    for i, b in enumerate(mixed):
        assert resized[i] == resize_bmp(b, 2), i


def test_wav_batch_kernels_match_scalar_on_mixed_lengths(spark, sf_dir):
    """stepped render / decimate / eHash over a batch mixing 260- and
    130-frame WAVs must equal the stdlib-wave scalar path byte-for-byte
    (render, transcode) and bit-for-bit (hashes)."""
    docs = _docs(spark, sf_dir)
    blobs = {
        int(r.doc_id): bytes(r.blob)
        for r in stepped_wav_blobs(docs).collect()
    }
    # scalar-reference re-render of a few blobs (the pre-r13 loop)
    lv_rows = docs.select(
        "doc_id",
        F.array(
            *[
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.coalesce(F.col("text"), F.lit("")),
                                    F.lit(f"#{k}"),
                                )
                            ),
                            1,
                            4,
                        ),
                        16,
                        10,
                    ).cast("int")
                    % 192
                    + 32
                )
                for k in range(65)
            ]
        ).alias("lv"),
    ).collect()
    for r in lv_rows[:8]:
        samples = []
        for l in r.lv:
            samples.extend([(int(l) - 128) * 256] * EHASH_SEG_LEN)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
        assert blobs[int(r.doc_id)] == buf.getvalue()

    # mixed-length corpus: originals + 2×-decimated
    mixed = list(blobs.values()) + [
        _scalar_decimate(b, 2) for b in list(blobs.values())[:15]
    ]
    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate(mixed)], "doc_id long, blob binary"
    )
    got_dec = {
        int(r.doc_id): bytes(r.blob)
        for r in decimate_wavs(df, "blob", factor=2).collect()
    }
    for i, b in enumerate(mixed):
        assert got_dec[i] == _scalar_decimate(b, 2), i
    got_hash = {
        int(r.vid): (int(r.h0), int(r.h1), int(r.h2), int(r.h3))
        for r in ehash_wavs(df, "blob").collect()
    }
    for i, b in enumerate(mixed):
        assert got_hash[i] == ehash_wav(b), i


def _scalar_decimate(blob: bytes, factor: int) -> bytes:
    """The pre-r13 decimate loop, kept as the test's reference."""
    with wave.open(io.BytesIO(blob)) as w:
        n = w.getnframes()
        rate = w.getframerate()
        raw = w.readframes(n)
    kept = struct.unpack(f"<{n}h", raw)[::factor]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(kept)}h", *kept))
    return buf.getvalue()


def test_malformed_blob_error_parity(spark):
    """The vectorized kernels must reject malformed blobs exactly like
    the scalar parsers (same acceptance domain): truncated BMP pixel
    data and non-BMP magic still raise through the batch operators."""
    good = encode_bmp(bytes(range(48)) * 2, 4, 8)
    for bad in [good[: len(good) - 5], b"XX" + good[2:]]:
        with pytest.raises(ValueError):
            dhash_bmp(bad)
        df = spark.createDataFrame([(0, bad)], "doc_id long, blob binary")
        with pytest.raises(Exception):
            dhash_images(df, "blob").collect()
        with pytest.raises(Exception):
            resize_images(df, "blob", factor=2).collect()
