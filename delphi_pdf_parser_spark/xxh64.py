"""Bit-exact XXH64 (Collet's xxHash, the public 64-bit construction)
matching Spark's ``F.xxhash64`` (seed 42 by default) on UTF-8 bytes.

Why it exists: the SimHash signature pass needs one 64-bit hash per
token.  Computing it JVM-side forces an explode to one row per token
(tens of billions of rows at corpus scale) through an interpreted or
wide-aggregate pipeline; computing it HERE lets a single ``mapInArrow``
pass hash a whole document's tokens as NumPy vectors (guide §4.2 "hand
whole batches to vectorized native libraries").  Parity with the JVM
implementation is pinned by tests/test_functions.py (fuzz incl.
non-ASCII and >=32-byte inputs) — any drift is an oracle break, not a
perf bug.

``xxh64_many`` vectorizes the short-input (< 32 bytes) path by grouping
tokens of equal byte length — every token in a group runs the identical
instruction sequence, so each step is one NumPy u64 op over the group.
Natural-language tokens are nearly always < 32 UTF-8 bytes; longer ones
take the scalar reference path.
"""

from __future__ import annotations

import numpy as np

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF

_U = np.uint64


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    return (_rotl((acc + inp * _P2) & _M, 31) * _P1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """Scalar reference path (any length); unsigned 64-bit result."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        acc = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M
        acc = _merge_round(acc, v1)
        acc = _merge_round(acc, v2)
        acc = _merge_round(acc, v3)
        acc = _merge_round(acc, v4)
    else:
        acc = (seed + _P5) & _M
    acc = (acc + n) & _M
    while i + 8 <= n:
        acc ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        acc = ((_rotl(acc, 27) * _P1) + _P4) & _M
        i += 8
    if i + 4 <= n:
        acc ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        acc = ((_rotl(acc, 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        acc ^= (data[i] * _P5) & _M
        acc = (_rotl(acc, 11) * _P1) & _M
        i += 1
    acc ^= acc >> 33
    acc = (acc * _P2) & _M
    acc ^= acc >> 29
    acc = (acc * _P3) & _M
    acc ^= acc >> 32
    return acc


def _rotl_v(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _U(r)) | (x >> _U(64 - r))


def _short_group(buf: np.ndarray, length: int, seed: int) -> np.ndarray:
    """Vectorized < 32-byte path: ``buf`` is (n, 32) uint8, zero-padded
    rows all of byte length ``length``. Returns (n,) uint64 hashes."""
    words = buf.view("<u8")  # (n, 4) little-endian 64-bit words
    acc = np.full(
        buf.shape[0], (seed + _P5 + length) & _M, dtype=np.uint64
    )
    i = 0
    w = 0
    p1, p2, p3, p4, p5 = _U(_P1), _U(_P2), _U(_P3), _U(_P4), _U(_P5)
    while i + 8 <= length:
        k = _rotl_v(words[:, w] * p2, 31) * p1
        acc = _rotl_v(acc ^ k, 27) * p1 + p4
        i += 8
        w += 1
    if i + 4 <= length:
        half = buf[:, i : i + 4].copy().view("<u4")[:, 0].astype(np.uint64)
        acc = _rotl_v(acc ^ (half * p1), 23) * p2 + p3
        i += 4
    while i < length:
        acc = _rotl_v(acc ^ (buf[:, i].astype(np.uint64) * p5), 11) * p1
        i += 1
    acc ^= acc >> _U(33)
    acc *= p2
    acc ^= acc >> _U(29)
    acc *= p3
    acc ^= acc >> _U(32)
    return acc


def xxh64_longs(vals: np.ndarray, seeds) -> np.ndarray:
    """Vectorized XXH64 of 64-bit integers — the specialization Spark's
    ``XxHash64`` applies to LONG columns (one 8-byte little-endian word,
    then the avalanche; reading the 8 LE bytes of a long yields the
    long itself, so the word IS the value).  ``vals`` is uint64 (the
    bit pattern of the signed long); ``seeds`` is a scalar or an
    equally-shaped uint64 array — Spark hashes multi-argument
    ``xxhash64(a, b)`` by FOLDING (the hash of ``a`` seeds the hash of
    ``b``), which is why per-element seeds are needed."""
    p1, p2, p3, p4, p5 = _U(_P1), _U(_P2), _U(_P3), _U(_P4), _U(_P5)
    seeds = np.asarray(seeds, dtype=np.uint64)
    acc = seeds + p5 + _U(8)
    k1 = _rotl_v(vals * p2, 31) * p1
    acc = _rotl_v(acc ^ k1, 27) * p1 + p4
    acc ^= acc >> _U(33)
    acc *= p2
    acc ^= acc >> _U(29)
    acc *= p3
    acc ^= acc >> _U(32)
    return acc


def xxh64_ints(vals: np.ndarray, seeds) -> np.ndarray:
    """Vectorized XXH64 of 32-bit integers — Spark's ``XxHash64``
    specialization for INT columns (4-byte word, then avalanche).
    Needed to replicate folded ``xxhash64(long_col, lit(i))`` where the
    Python-int literal is an IntegerType: the long hashes first, its
    result seeds the INT hash of ``i``."""
    p1, p2, p3, p5 = _U(_P1), _U(_P2), _U(_P3), _U(_P5)
    seeds = np.asarray(seeds, dtype=np.uint64)
    acc = seeds + p5 + _U(4)
    acc ^= (vals & _U(0xFFFFFFFF)) * p1
    acc = _rotl_v(acc, 23) * p2 + p3
    acc ^= acc >> _U(33)
    acc *= p2
    acc ^= acc >> _U(29)
    acc *= p3
    acc ^= acc >> _U(32)
    return acc


def xxh64_many(tokens: list, seed: int = 42) -> np.ndarray:
    """Unsigned 64-bit XXH64 of each bytes object in ``tokens``.

    Short inputs (< 32 bytes — virtually every natural-language token)
    are grouped by exact length and hashed as one vectorized NumPy pass
    per group; longer inputs use the scalar reference path.
    """
    n = len(tokens)
    out = np.empty(n, dtype=np.uint64)
    lens = np.fromiter((len(t) for t in tokens), dtype=np.int64, count=n)
    short = lens < 32
    long_idx = np.nonzero(~short)[0]
    for i in long_idx:
        out[i] = xxh64(tokens[i], seed)
    short_idx = np.nonzero(short)[0]
    if len(short_idx):
        slens = lens[short_idx]
        for length in np.unique(slens):
            grp = short_idx[slens == length]
            buf = np.zeros((len(grp), 32), dtype=np.uint8)
            lv = int(length)
            for row, i in enumerate(grp):
                buf[row, :lv] = np.frombuffer(tokens[i], dtype=np.uint8)
            out[grp] = _short_group(buf, lv, seed)
    return out
