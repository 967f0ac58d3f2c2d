"""JPEG (DCT) decoder, from scratch: baseline sequential AND progressive.

The reference fully decodes DCT images to pixmaps on its image path (the
DCTD filter in src/vcl/fz_filterss.pas via the factory
src/vcl/mypdfstream.pas:280-389, backed by libjpeg in filt_dctdss.pas —
which handles progressive). This module reproduces both modes with
NumPy: marker walk, DQT/DHT/SOF0/1/2/SOS/DRI, canonical Huffman decode
(tables come FROM THE STREAM, none built in), scans accumulated into
per-component coefficient buffers (T.81 G: DC/AC first scans +
successive-approximation refinement with EOB runs), then ONE batched
dequantize + zigzag + 8x8 IDCT (two stacked matmuls against the
orthonormal DCT basis), replicate upsampling for subsampled chroma,
YCbCr->RGB per JFIF.

Supported: SOF0/SOF1/SOF2 gray / 3-component, 8-bit, h/v factors <= 2,
restart intervals, multi-scan (non-interleaved) baseline. Arithmetic
coding, lossless/hierarchical SOFs, 12-bit, CMYK raise
UnsupportedJpegError — surfaced as decode-status codes upstream.
"""

from __future__ import annotations

import struct

import numpy as np


class JpegError(Exception):
    pass


class UnsupportedJpegError(JpegError):
    pass


_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)


def _dct_basis() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis: B[u, x] = C(u)/2 cos((2x+1)u pi/16).
    spatial = B.T @ coeffs @ B; coeffs = B @ spatial @ B.T."""
    b = np.zeros((8, 8))
    for u in range(8):
        c = (0.5 / np.sqrt(2.0)) if u == 0 else 0.5
        for x in range(8):
            b[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return b


_B = _dct_basis()


class _HuffTable:
    """Canonical Huffman per ITU T.81 Annex C: code lengths 1..16 with
    counts[], then values in code order."""

    __slots__ = ("lookup", "max_len")

    def __init__(self, counts: list[int], values: bytes):
        if sum(counts) > len(values):
            raise JpegError("DHT: counts exceed value list")
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                if code >= (1 << length):
                    raise JpegError("DHT: code overflow")
                self.lookup[(length, code)] = values[k]
                k += 1
                code += 1
            code <<= 1
        self.max_len = max((l for (l, _c) in self.lookup), default=0)


class _BitReader:
    """MSB-first over entropy-coded data; 0xFF00 stuffing removed; stops
    at any other marker (caller handles RSTn)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> bool:
        d = self.data
        p = self.pos
        if p >= len(d):
            return False
        byte = d[p]
        if byte == 0xFF:
            if p + 1 < len(d) and d[p + 1] == 0x00:
                self.pos = p + 2
            else:
                return False  # a real marker: stop
        else:
            self.pos = p + 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            return 0  # T.81: missing bits read as 0 past the segment
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, table.max_len + 1):
            code = (code << 1) | self.read_bit()
            v = table.lookup.get((length, code))
            if v is not None:
                return v
        raise JpegError("bad huffman code")

    def align(self) -> None:
        self.nbits = 0

    def skip_rst(self) -> None:
        """Consume an RSTn marker at the current byte position."""
        d = self.data
        p = self.pos
        while p + 1 < len(d) and d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
            p += 2
            self.pos = p
            return
        raise JpegError("expected RST marker")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _next_marker(data: bytes, pos: int) -> int:
    """Position of the next real marker's 0xFF at/after pos (skipping
    entropy bytes, 0xFF00 stuffing, fill bytes and RSTn)."""
    n = len(data)
    p = pos
    while p + 1 < n:
        if data[p] != 0xFF:
            p += 1
            continue
        m = data[p + 1]
        if m == 0x00 or m == 0xFF:
            p += 2 if m == 0x00 else 1
            continue
        if 0xD0 <= m <= 0xD7:
            p += 2
            continue
        return p
    return n


def jpeg_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """-> (width, height, ncomp, pixels row-major 8-bit).

    Tolerant API boundary: corrupt streams raise JpegError (typed), never
    bare IndexError/ValueError/StopIteration from mangled segments."""
    try:
        return _jpeg_decode(data)
    except JpegError:
        raise
    except (IndexError, ValueError, KeyError, StopIteration, struct.error) as e:
        raise JpegError(f"corrupt: {type(e).__name__}: {e}")


def _jpeg_decode(data: bytes) -> tuple[int, int, int, bytes]:
    if data[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (no SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None
    restart_interval = 0
    scans_done = 0
    i = 2
    n = len(data)
    while i + 3 < n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        seg_len = (data[i + 2] << 8) | data[i + 3]
        body = data[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 15
                j += 1
                if pq == 0:
                    tbl = np.frombuffer(
                        body[j : j + 64], dtype=np.uint8
                    ).astype(np.float64)
                    j += 64
                else:
                    tbl = np.frombuffer(
                        body[j : j + 128], dtype=">u2"
                    ).astype(np.float64)
                    j += 128
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            j = 0
            while j + 17 <= len(body):
                tc, th = body[j] >> 4, body[j] & 15
                counts = list(body[j + 1 : j + 17])
                total = sum(counts)
                values = bytes(body[j + 17 : j + 17 + total])
                j += 17 + total
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(
                    counts, values
                )
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            if frame is not None:
                raise UnsupportedJpegError("multiple frames (hierarchical)")
            precision = body[0]
            if precision != 8:
                raise UnsupportedJpegError(f"{precision}-bit precision")
            h = (body[1] << 8) | body[2]
            w = (body[3] << 8) | body[4]
            nc = body[5]
            if nc not in (1, 3):
                raise UnsupportedJpegError(f"{nc} components")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c], body[7 + 3 * c], body[8 + 3 * c]
                hi, vi = hv >> 4, hv & 15
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    raise UnsupportedJpegError(f"sampling {hi}x{vi}")
                comps.append({"id": cid, "h": hi, "v": vi, "tq": tq})
            frame = {
                "w": w,
                "h": h,
                "comps": comps,
                "prog": marker == 0xC2,
            }
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            frame["hmax"], frame["vmax"] = hmax, vmax
            frame["mcux"] = (w + 8 * hmax - 1) // (8 * hmax)
            frame["mcuy"] = (h + 8 * vmax - 1) // (8 * vmax)
            frame["coeffs"] = [
                np.zeros(
                    (frame["mcuy"] * c["v"], frame["mcux"] * c["h"], 64),
                    dtype=np.int32,
                )
                for c in comps
            ]
            frame["pred"] = [0] * nc
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise UnsupportedJpegError(f"SOF{marker - 0xC0} coding")
        elif marker == 0xDD:  # DRI
            restart_interval = (body[0] << 8) | body[1]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = body[0]
            scan = []
            for s in range(ns):
                cs, tt = body[1 + 2 * s], body[2 + 2 * s]
                ci, comp = next(
                    (ix, c)
                    for ix, c in enumerate(frame["comps"])
                    if c["id"] == cs
                )
                scan.append((ci, comp, tt >> 4, tt & 15))
            if frame["prog"]:
                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                a = body[3 + 2 * ns]
                ah, al = a >> 4, a & 15
            else:
                ss, se, ah, al = 0, 63, 0, 0
            end = _decode_scan(
                data, i + 2 + seg_len, frame, scan, huff_dc, huff_ac,
                restart_interval, ss, se, ah, al,
            )
            scans_done += 1
            i = end
            continue
        i += 2 + seg_len
    if frame is None or scans_done == 0:
        raise JpegError("no SOS marker")
    return _finish(frame, qt)


def _decode_scan(
    data, pos, frame, scan, huff_dc, huff_ac, restart_interval,
    ss, se, ah, al,
) -> int:
    """Decode one scan's entropy data into frame['coeffs']; returns the
    byte position of the next marker."""
    br = _BitReader(data, pos)
    eob = [0]  # EOB run, shared across blocks within the scan
    pred = frame["pred"]
    if ah == 0 and ss == 0:
        # a new DC (or sequential) scan restarts the predictors
        for ci, _c, _t, _t2 in scan:
            pred[ci] = 0

    def tables(ci_entry):
        ci, comp, tdc, tac = ci_entry
        dct = huff_dc.get(tdc)
        act = huff_ac.get(tac)
        if (ss == 0 and dct is None) or (se > 0 and act is None):
            raise JpegError("missing table")
        return dct, act

    def restart():
        br.align()
        br.skip_rst()
        for ci, _c, _t, _t2 in scan:
            pred[ci] = 0
        eob[0] = 0

    if len(scan) > 1:
        # interleaved MCU order (T.81: any multi-component scan). A
        # single-component scan — sequential OR progressive — is
        # non-interleaved and uses the component's own block raster.
        mcu_count = 0
        for my in range(frame["mcuy"]):
            for mx in range(frame["mcux"]):
                if restart_interval and mcu_count and (
                    mcu_count % restart_interval == 0
                ):
                    restart()
                for entry in scan:
                    ci, comp, tdc, tac = entry
                    dct, act = tables(entry)
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            blk = frame["coeffs"][ci][
                                my * comp["v"] + by, mx * comp["h"] + bx
                            ]
                            _decode_block(
                                br, blk, dct, act, pred, ci,
                                ss, se, ah, al, eob,
                            )
                mcu_count += 1
    else:
        # non-interleaved scan: the component's own block grid
        entry = scan[0]
        ci, comp, tdc, tac = entry
        dct, act = tables(entry)
        w, h = frame["w"], frame["h"]
        cw = (w * comp["h"] + frame["hmax"] - 1) // frame["hmax"]
        ch = (h * comp["v"] + frame["vmax"] - 1) // frame["vmax"]
        bw = (cw + 7) // 8
        bh = (ch + 7) // 8
        blk_count = 0
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and blk_count and (
                    blk_count % restart_interval == 0
                ):
                    restart()
                blk = frame["coeffs"][ci][by, bx]
                _decode_block(
                    br, blk, dct, act, pred, ci, ss, se, ah, al, eob
                )
                blk_count += 1
    return _next_marker(data, br.pos)


def _decode_block(br, blk, dct, act, pred, ci, ss, se, ah, al, eob):
    """Decode one block's contribution for this scan (T.81 F.2 sequential
    / G.1.2 progressive: DC first, DC refine, AC first, AC refine)."""
    if ss == 0:
        if ah == 0:
            t = br.decode_huff(dct)
            if t > 15:
                raise JpegError("DC category out of range")
            diff = _extend(br.read_bits(t), t)
            pred[ci] += diff
            val = pred[ci] << al
            if not (-(1 << 30) <= val < (1 << 30)):
                raise JpegError("DC out of range")  # corrupt stream
            blk[0] = val
        else:
            if br.read_bit():
                blk[0] = int(blk[0]) | (1 << al)
        if se == 0:
            return  # DC-only progressive scan
        k = 1
    else:
        k = ss
    if ah == 0:
        # first (or sequential) AC pass
        if eob[0] > 0:
            eob[0] -= 1
            return
        while k <= se:
            rs = br.decode_huff(act)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r == 15:
                    k += 16  # ZRL
                    continue
                eob[0] = (1 << r) - 1
                if r:
                    eob[0] += br.read_bits(r)
                break  # EOB
            k += r
            if k > 63:
                raise JpegError("AC index overflow")
            blk[k] = _extend(br.read_bits(s), s) << al
            k += 1
        return
    # AC refinement (T.81 G.1.2.3 / libjpeg decode_mcu_AC_refine shape)
    p1 = 1 << al
    m1 = -(1 << al)
    if eob[0] == 0:
        while k <= se:
            rs = br.decode_huff(act)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r < 15:
                    eob[0] = 1 << r
                    if r:
                        eob[0] += br.read_bits(r)
                    break
                val = 0  # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise JpegError("AC refine s != 1")
                val = p1 if br.read_bit() else m1
            while k <= se:
                c = int(blk[k])
                if c != 0:
                    if br.read_bit() and (c & p1) == 0:
                        blk[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val != 0 and k <= se:
                blk[k] = val
            k += 1
    if eob[0] > 0:
        # correction bits for remaining nonzero coefficients, then this
        # block consumes one unit of the EOB run
        while k <= se:
            c = int(blk[k])
            if c != 0 and br.read_bit() and (c & p1) == 0:
                blk[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eob[0] -= 1


def _finish(frame, qt) -> tuple[int, int, int, bytes]:
    """Dequantize + un-zigzag + batched IDCT + assemble/upsample."""
    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    full = []
    for ci, c in enumerate(comps):
        q = qt.get(c["tq"])
        if q is None:
            raise JpegError("missing table")
        coef = frame["coeffs"][ci]
        by, bx = coef.shape[:2]
        zz = coef.reshape(-1, 64).astype(np.float64) * q[None, :]
        nat = np.zeros_like(zz)
        nat[:, _ZIGZAG] = zz
        f = nat.reshape(-1, 8, 8)
        spatial = np.matmul(np.matmul(_B.T, f), _B) + 128.0
        plane = (
            spatial.reshape(by, bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by * 8, bx * 8)
        )
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:h, :w])
    if len(comps) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return w, h, 1, out.tobytes()
    y, cb, cr = full
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack(
        [np.clip(np.round(x), 0, 255).astype(np.uint8) for x in (r, g, b)],
        axis=-1,
    )
    return w, h, 3, rgb.tobytes()
