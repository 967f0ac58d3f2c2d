"""Multimodal decode: real pixel decoding for BMP/PNG/PNM payloads plus
the Spark feature-extraction plumbing over them."""

from __future__ import annotations

import os

import pytest

from delphi_pdf_parser_spark.operators.mediadec import (
    MediaDecodeError,
    UnsupportedMediaError,
    decode_image,
    encode_bmp,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_T2", "/root/testdata/sf0.01")


def _gray_pixels(w, h):
    return bytes((x * 37 + y * 11) % 256 for y in range(h) for x in range(w))


def _rgb_pixels(w, h):
    out = bytearray()
    for y in range(h):
        for x in range(w):
            out += bytes(((x * 5) % 256, (y * 7) % 256, (x + y) % 256))
    return bytes(out)


def test_bmp_gray_roundtrip():
    for w, h in ((8, 8), (5, 3), (1, 1)):  # odd widths exercise padding
        px = _gray_pixels(w, h)
        got = decode_image(encode_bmp(w, h, 1, px))
        assert got == (w, h, 1, px)


def test_bmp_rgb_roundtrip():
    for w, h in ((4, 4), (3, 2)):
        px = _rgb_pixels(w, h)
        got = decode_image(encode_bmp(w, h, 3, px))
        assert got == (w, h, 3, px)


def test_png_decode_of_own_writer():
    from delphi_pdf_parser_spark.pdfcore.images import write_png

    for ncomp in (1, 2, 3, 4):
        w, h = 6, 4
        px = bytes((i * 31) % 256 for i in range(w * h * ncomp))
        got = decode_image(write_png(w, h, ncomp, px))
        assert got == (w, h, ncomp, px)


def test_pnm_decode():
    px = _gray_pixels(4, 3)
    assert decode_image(b"P5\n# c\n4 3\n255\n" + px) == (4, 3, 1, px)
    rgb = _rgb_pixels(2, 2)
    assert decode_image(b"P6 2 2 255\n" + rgb) == (2, 2, 3, rgb)


def test_unsupported_and_corrupt():
    with pytest.raises(UnsupportedMediaError):
        decode_image(b"\xff\xd8\xff\xe0 jpeg-ish")
    with pytest.raises(UnsupportedMediaError):
        decode_image(b"RIFFxxxxWEBP")
    with pytest.raises(MediaDecodeError):
        decode_image(encode_bmp(8, 8, 1, _gray_pixels(8, 8))[:40])


def test_media_features_decode_real_pixels(spark):
    """multimodal_features end-to-end: image rows decode (status ok, true
    8x8 dims, mean_pixel == mean of the deterministic payload); audio
    rows report not_image with byte stats only."""
    import hashlib

    import numpy as np

    import __spark_entry__ as E

    rows = E.queries()["multimodal_features"](spark, SF_DIR).collect()
    assert rows
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.select("doc_id", "text").collect()
    }
    n_img = 0
    for r in rows:
        if r["media_type"] == "image/bmp":
            n_img += 1
            assert r["decode_status"] == "ok"
            assert (r["width"], r["height"], r["ncomp"]) == (8, 8, 1)
            seed = hashlib.md5(
                (texts[r["doc_id"]] or "").encode("utf-8")
            ).digest()
            blob = (seed * 5)[:64]
            want = round(float(np.frombuffer(blob, np.uint8).mean()), 4)
            assert r["mean_pixel"] == want
        else:
            assert r["decode_status"] == "not_image"
            assert r["width"] is None and r["mean_pixel"] is None
    assert n_img > 0
