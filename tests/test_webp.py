"""WebP lossless (VP8L) decoder tests: encoder/decoder round-trips per
transform, spec-anchored pins (distance map, hash constant, predictor
edge rules), the mediadec dispatch, and mutation fuzz.

The fixture encoder (fixtures.webp_encode) shares only tiny helpers
(_avg2/_clamp/_ctd) with the decoder; prefix-code construction, LZ77,
transforms and bit I/O are forward vs inverse implementations."""

from __future__ import annotations

import random

import numpy as np
import pytest

from delphi_pdf_parser_spark.fixtures import webp_encode
from delphi_pdf_parser_spark.webp import (
    WebpError,
    WebpUnsupported,
    _DIST_MAP,
    webp_decode,
)


def _rt(w, h, nc, pix, **kw):
    data = webp_encode(w, h, nc, pix, **kw)
    w2, h2, nc2, out = webp_decode(data)
    exp = bytes(v for p in pix for v in (p, p, p)) if nc == 1 else pix
    assert (w2, h2) == (w, h)
    assert out == exp
    return data


def test_roundtrip_literals():
    rng = np.random.default_rng(5)
    for nc in (1, 3, 4):
        pix = rng.integers(0, 256, (12 * 16 * nc,)).astype(np.uint8).tobytes()
        _rt(16, 12, nc, pix)


def test_roundtrip_transforms():
    rng = np.random.default_rng(6)
    pix = rng.integers(0, 256, (12 * 16 * 3,)).astype(np.uint8).tobytes()
    _rt(16, 12, 3, pix, sub_green=True)
    _rt(16, 12, 3, pix, color_te=(0x40, 0x20, 0x10))
    for mode in (2, 7, 12):
        _rt(16, 12, 3, pix, predictor=mode)
    # multi-tile predictor exercises the right-edge TR quirk (TR of
    # (w-1, y) is the already-decoded (0, y) in flat-index arithmetic)
    big = rng.integers(0, 256, (33 * 40 * 3,)).astype(np.uint8).tobytes()
    _rt(40, 33, 3, big, predictor=12)
    # stacked transforms
    _rt(16, 12, 3, pix, sub_green=True, predictor=1)


def test_roundtrip_lz77_and_cache():
    flat = bytes([7, 99, 200]) * 400
    data = _rt(20, 20, 3, flat, use_lz77=True)
    assert len(data) < 120  # runs actually compressed
    rng = np.random.default_rng(7)
    pix = rng.integers(0, 4, (20 * 20,)).astype(np.uint8) * 80
    rgb = np.repeat(pix, 3).astype(np.uint8).tobytes()
    _rt(20, 20, 3, rgb, use_lz77=True, cache_bits=4)


def test_roundtrip_palette_packings():
    rng = np.random.default_rng(9)
    for ncolors in (2, 3, 13, 40):  # 1/2/4/8 bits per packed pixel
        pal = rng.integers(0, 256, (ncolors, 3)).astype(np.uint8)
        idx = rng.integers(0, ncolors, (11 * 30,))
        pix = pal[idx].reshape(-1).tobytes()
        _rt(30, 11, 3, pix, palette=True)


def test_alpha_channel():
    rng = np.random.default_rng(10)
    pix = rng.integers(0, 256, (8 * 8 * 4,)).astype(np.uint8).tobytes()
    _, _, nc, out = webp_decode(webp_encode(8, 8, 4, pix))
    assert nc == 4 and out == pix


def test_distance_map_matches_spec_prefix():
    """First entries of the 2D plane-code table as listed in the WebP
    lossless spec (RFC 9649) — pins the generative sort rule."""
    assert _DIST_MAP[:24] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    ]
    assert len(_DIST_MAP) == 120
    # distance-64/65 block: (8,0) alone, then |dx| ascending
    d64 = [p for p in _DIST_MAP if p[0] * p[0] + p[1] * p[1] == 64]
    d65 = [p for p in _DIST_MAP if p[0] * p[0] + p[1] * p[1] == 65]
    assert d64 == [(8, 0)]
    assert d65 == [(4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1)]


def test_lossy_vp8_is_typed_unsupported():
    riff = (
        b"RIFF" + (12).to_bytes(4, "little") + b"WEBP"
        + b"VP8 " + (4).to_bytes(4, "little") + b"\x00\x00\x00\x00"
    )
    with pytest.raises(WebpUnsupported):
        webp_decode(riff)
    with pytest.raises(WebpError):
        webp_decode(b"not a riff at all")


def test_mediadec_dispatch():
    from delphi_pdf_parser_spark.operators.mediadec import decode_image

    rng = np.random.default_rng(11)
    pix = rng.integers(0, 256, (6 * 9 * 3,)).astype(np.uint8).tobytes()
    assert decode_image(webp_encode(9, 6, 3, pix)) == (9, 6, 3, pix)


def test_webp_mutation_robustness():
    rng = random.Random(12)
    base = bytes(
        ((x * 7 + y * 3) % 256)
        for y in range(12) for x in range(16) for _ in range(3)
    )
    payloads = (
        webp_encode(16, 12, 3, base, use_lz77=True, cache_bits=3),
        webp_encode(16, 12, 3, base, predictor=12, sub_green=True),
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
                w, h, nc, out = webp_decode(mut)
                assert len(out) == w * h * nc
            except WebpError:
                pass  # typed failure is the contract
