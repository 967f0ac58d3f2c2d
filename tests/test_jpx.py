"""JPEG 2000 (JPX) decoder tests: encoder/decoder round-trips, the
JPXDecode PDF image-sink path, header probing, and mutation fuzz.

Reference parity: the reference decodes JPX via an OpenJPEG binding
(src/vcl/filt_jpdxp.pas:26 fz_load_jpx_image, wired from
src/vcl/pdf_imagess.pas:348); pdfcore/jpx.py is the from-scratch
equivalent for the lossless 5/3 profile. The fixture encoder
(fixtures.jpx_encode) authors codestreams independently (forward
DWT/tag-tree/packet writer vs the decoder's inverse algorithms; only
the T.88 MQ coder and T1 pixel-state helpers are shared)."""

from __future__ import annotations

import random

import numpy as np
import pytest

from delphi_pdf_parser_spark.fixtures import (
    _case_jpx_image,
    _jpx_fdwt2,
    _jpx_fixture_pixels,
    jpx_encode,
)
from delphi_pdf_parser_spark.pdfcore.images import extract_images, write_png
from delphi_pdf_parser_spark.pdfcore.jpx import (
    JpxError,
    JpxUnsupported,
    _idwt53,
    jpx_decode,
    jpx_siz,
)


def _roundtrip(w, h, nc, pix, **kw):
    data = jpx_encode(w, h, nc, pix, **kw)
    w2, h2, nc2, out = jpx_decode(data)
    assert (w2, h2, nc2) == (w, h, nc)
    assert out == pix
    return data


def test_dwt_2d_roundtrip():
    rng = np.random.default_rng(7)
    for (h, w, lv) in ((16, 16, 2), (17, 23, 3), (5, 9, 2), (1, 8, 1)):
        a = rng.integers(-128, 128, (h, w)).astype(np.int64)
        ll, bands = _jpx_fdwt2(a, lv)
        assert np.array_equal(_idwt53(ll, list(bands)), a)


def test_roundtrip_gray_and_rgb():
    rng = np.random.default_rng(11)
    for (w, h, nc, kw) in (
        (32, 32, 1, {}),
        (32, 32, 3, {}),  # exercises RCT
        (61, 47, 3, {"levels": 3, "cb": (4, 4)}),
        (40, 40, 3, {"mct": False}),
        (24, 24, 1, {"levels": 1, "cb": (3, 3), "jp2": False}),  # raw J2K
    ):
        pix = rng.integers(0, 256, (h, w, nc)).astype(np.uint8).tobytes()
        _roundtrip(w, h, nc, pix, **kw)


def test_roundtrip_tiled_and_multiblock():
    rng = np.random.default_rng(13)
    # several tiles, several code-blocks per band, odd remainders
    pix = rng.integers(0, 256, (41, 75, 3)).astype(np.uint8).tobytes()
    _roundtrip(75, 41, 3, pix, levels=2, cb=(4, 4), tile=(32, 24))


def test_roundtrip_structured_content():
    # low-entropy rasters drive the RL/UNIFORM contexts and excluded
    # (all-zero) code-blocks
    g = np.fromfunction(lambda y, x: (x + y) % 256, (50, 70)).astype(np.uint8)
    _roundtrip(70, 50, 1, g.tobytes(), levels=3, cb=(4, 4))
    flat = bytes([200]) * (24 * 24)
    _roundtrip(24, 24, 1, flat)


def test_jpx_siz_probe():
    gray, _ = _jpx_fixture_pixels()
    data = jpx_encode(24, 16, 1, gray)
    assert jpx_siz(data) == (24, 16, 1, 8)
    data = jpx_encode(24, 16, 1, gray, jp2=False)
    assert jpx_siz(data) == (24, 16, 1, 8)
    assert jpx_siz(b"not a jp2") is None


def test_unsupported_markers_are_typed():
    gray, _ = _jpx_fixture_pixels()
    data = jpx_encode(24, 16, 1, gray, jp2=False)
    # splice a COC marker (FF53) after SIZ: per-component override is
    # out of scope and must raise the typed unsupported error
    siz_end = 2 + 2 + 2 + int.from_bytes(data[4:6], "big")
    spliced = data[:siz_end] + b"\xff\x53\x00\x03\x00" + data[siz_end:]
    with pytest.raises(JpxUnsupported):
        jpx_decode(spliced)


def test_pdf_jpx_fixture_raw_and_transcode():
    pdf, golden, npages = _case_jpx_image()
    raw = extract_images(pdf)
    assert [im.format for im in raw] == ["jp2", "jp2"]
    # dimensions come from the codestream SIZ, not the dict claim
    assert (raw[0].width, raw[0].height) == (24, 16)
    assert (raw[1].width, raw[1].height) == (20, 12)
    gray, rgb = _jpx_fixture_pixels()
    # raw payloads decode standalone
    assert jpx_decode(raw[0].data)[3] == gray
    assert jpx_decode(raw[1].data)[3] == rgb
    # transcode parity mode: byte-identical PNGs
    png = extract_images(pdf, transcode=True)
    assert [im.format for im in png] == ["png", "png"]
    assert png[0].data == write_png(24, 16, 1, gray)
    assert png[1].data == write_png(20, 12, 3, rgb)


def test_jpx_mutation_robustness():
    rng = random.Random(17)
    gray, rgb = _jpx_fixture_pixels()
    payloads = (
        jpx_encode(24, 16, 1, gray, cb=(4, 4)),
        jpx_encode(20, 12, 3, rgb, levels=1, jp2=False),
    )
    for payload in payloads:
        for _ in range(60):
            kind = rng.randrange(3)
            if kind == 0 and len(payload) > 1:
                mut = payload[: rng.randrange(1, len(payload))]
            elif kind == 1:
                i = rng.randrange(len(payload))
                b = bytearray(payload)
                b[i] ^= 1 << rng.randrange(8)
                mut = bytes(b)
            else:
                i = rng.randrange(len(payload))
                mut = (
                    payload[:i]
                    + bytes(rng.randrange(256) for _ in range(8))
                    + payload[i:]
                )
            try:
                w, h, nc, out = jpx_decode(mut)
                # degraded-but-shaped output is acceptable
                assert len(out) == w * h * nc
            except JpxError:
                pass  # typed failure is the contract (incl. Unsupported)


def test_97_lifting_exact_inverse():
    from delphi_pdf_parser_spark.fixtures import _jpx_fdwt97, _jpx_fdwt97_1d
    from delphi_pdf_parser_spark.pdfcore.jpx import _idwt97, _sr97_1d

    rng = np.random.default_rng(21)
    for n in (1, 2, 8, 9, 17, 64):
        x = rng.uniform(-128, 128, n)
        assert np.allclose(_sr97_1d(_jpx_fdwt97_1d(x)), x, atol=1e-9)
    # T.800 normalization invariants: constant c -> L == c, H == 0
    y = _jpx_fdwt97_1d(np.full(16, 77.0))
    assert np.allclose(y[0::2], 77.0) and np.allclose(y[1::2], 0.0)
    a = rng.uniform(-128, 128, (31, 27))
    ll, bands = _jpx_fdwt97(a, 3)
    assert np.allclose(_idwt97(ll, list(bands)), a, atol=1e-9)


def test_lossy_97_roundtrip_bounds():
    rng = np.random.default_rng(23)
    for (w, h, nc, kw) in (
        (32, 32, 1, {}),
        (32, 32, 3, {}),             # exercises forward/inverse ICT
        (61, 47, 3, {"levels": 3, "cb": (4, 4)}),
        (40, 30, 3, {"mct": False, "tile": (24, 16)}),
    ):
        pix = rng.integers(0, 256, (h, w, nc)).astype(np.uint8)
        data = jpx_encode(w, h, nc, pix.tobytes(), lossy=True, **kw)
        w2, h2, nc2, out = jpx_decode(data)
        assert (w2, h2, nc2) == (w, h, nc)
        got = np.frombuffer(out, np.uint8).reshape(h, w, nc).astype(np.int64)
        err = np.abs(got - pix.astype(np.int64))
        # delta = 2^-4 per band: reconstruction bias keeps error tiny
        assert err.max() <= 3, (w, h, nc, kw, err.max())


def test_lossy_97_coarse_quantization_actually_lossy():
    """prec=1 (delta = 1/2) must shrink the stream AND introduce bounded
    visible loss — pinning that quantization is real, not a no-op."""
    g = np.fromfunction(
        lambda y, x: 100 + 50 * np.sin(x / 5) + 40 * np.cos(y / 4), (48, 64)
    )
    pix = np.clip(g, 0, 255).astype(np.uint8)
    fine = jpx_encode(64, 48, 1, pix.tobytes(), lossy=True, prec=4)
    coarse = jpx_encode(64, 48, 1, pix.tobytes(), lossy=True, prec=1)
    assert len(coarse) < len(fine)
    _, _, _, out = jpx_decode(coarse)
    got = np.frombuffer(out, np.uint8).reshape(48, 64).astype(np.int64)
    err = np.abs(got - pix.astype(np.int64))
    assert 0 < err.max() <= 4
    assert err.mean() < 1.0
