"""JPEG 2000 (JPX) decoder, from scratch — lossless 5/3 path.

The reference decodes JPX via an OpenJPEG binding
(src/vcl/filt_jpdxp.pas:26 `fz_load_jpx_image`, wired from
src/vcl/pdf_imagess.pas:348 `pdf_load_jpx_image` with SMask/colorspace
fixup). This module re-implements the decode pipeline natively:

- JP2 container box walk (jP/ftyp/jp2h/jp2c) or raw J2K codestream
- codestream markers: SIZ / COD / QCD / COM / SOT / SOD / EOC
- Tier-2: packet header parsing (bit-stuffed headers, inclusion +
  zero-bitplane tag trees per T.800 B.10.2, coding-pass counts per
  Table B.4, Lblock length signalling)
- Tier-1: EBCOT code-block decoding (T.800 Annex D) — significance
  propagation / magnitude refinement / cleanup passes over 4-row
  stripes, run-length and UNIFORM contexts, driven by the SAME MQ
  arithmetic decoder the JBIG2 subsystem uses (T.88's coder is JPEG
  2000's coder; shared QE table in pdfcore/jbig2.py)
- inverse reversible 5/3 DWT (T.800 Annex F lifting, whole-sample
  symmetric extension), inverse RCT component transform, DC unshift

Scope (typed JpxUnsupported otherwise — caller keeps the raw payload):
reversible 5/3 (lossless) AND irreversible 9/7 (lossy: scalar-expounded
quantization, float lifting, inverse ICT), <= 8-bit unsigned components
at 1:1 subsampling,
default precincts, single tile-part per tile, LRCP/RLCP progression,
one quality layer, default code-block style. That is exactly the shape
of lossless scanned-archive JPX, and the encoder half
(fixtures.jpx_encode) emits it for the pixel-pinned round-trip.
"""

from __future__ import annotations

import struct

import numpy as np

from .jbig2 import MQDecoder


class JpxError(Exception):
    pass


class JpxUnsupported(JpxError):
    pass


# --- bit-stuffed packet-header reader (B.10.1) --------------------------------


class _HeaderBits:
    __slots__ = ("data", "pos", "buf", "ct")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.ct = 0

    def bit(self) -> int:
        if self.ct == 0:
            if self.pos >= len(self.data):
                raise JpxError("packet header overrun")
            prev = self.buf
            self.buf = self.data[self.pos]
            self.pos += 1
            self.ct = 7 if prev == 0xFF else 8
        self.ct -= 1
        return (self.buf >> self.ct) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> int:
        """End of packet header: discard partial byte; a trailing 0xFF
        carries one stuffing byte (mirrors OpenJPEG bio_inalign)."""
        if self.ct == 0 and self.buf == 0xFF:
            # stuffing byte not yet consumed
            if self.pos >= len(self.data):
                raise JpxError("packet header overrun")
            self.pos += 1
        elif self.ct > 0 and self.buf == 0xFF:
            pass  # partial 0xFF impossible (stuffed to 7 bits)
        self.ct = 0
        self.buf = 0
        return self.pos


# --- tag trees (B.10.2) --------------------------------------------------------


class TagTree:
    """Decoder-side tag tree: per-node lower bound + known flag."""

    def __init__(self, w: int, h: int):
        self.dims = []
        while True:
            self.dims.append((w, h))
            if w == 1 and h == 1:
                break
            w = (w + 1) // 2
            h = (h + 1) // 2
        # node state per level: (low, known)
        self.low = [np.zeros((lh, lw), dtype=np.int64) for lw, lh in self.dims]
        self.known = [
            np.zeros((lh, lw), dtype=bool) for lw, lh in self.dims
        ]

    def decode(self, br: _HeaderBits, x: int, y: int, threshold: int):
        """-> (known, value_lower_bound): known means leaf value
        resolved (== returned bound); value < threshold implies known."""
        path = []
        lx, ly = x, y
        for lvl in range(len(self.dims)):
            path.append((lvl, lx, ly))
            lx >>= 1
            ly >>= 1
        low = 0
        for lvl, nx, ny in reversed(path):
            if self.low[lvl][ny, nx] < low:
                self.low[lvl][ny, nx] = low
            while (
                self.low[lvl][ny, nx] < threshold
                and not self.known[lvl][ny, nx]
            ):
                if br.bit():
                    self.known[lvl][ny, nx] = True
                else:
                    self.low[lvl][ny, nx] += 1
            low = int(self.low[lvl][ny, nx])
        return bool(self.known[0][y, x]), low

    def decode_value(self, br: _HeaderBits, x: int, y: int) -> int:
        """Decode until the leaf value is fully known (zero-bitplane
        trees are queried this way)."""
        t = 1
        while True:
            known, v = self.decode(br, x, y, t)
            if known:
                return v
            t = v + 1


# --- Tier-1: EBCOT code-block decoding (Annex D) -------------------------------

_CTX_RL = 17
_CTX_UNI = 18


def _fresh_contexts() -> list:
    cx = [[0, 0] for _ in range(19)]
    cx[0] = [4, 0]
    cx[_CTX_RL] = [3, 0]
    cx[_CTX_UNI] = [46, 0]
    return cx


def _sig_ctx(h: int, v: int, d: int, band: str) -> int:
    if band == "HL":
        h, v = v, h
    if band != "HH":
        if h == 2:
            return 8
        if h == 1:
            if v >= 1:
                return 7
            return 6 if d >= 1 else 5
        if v == 2:
            return 4
        if v == 1:
            return 3
        return 2 if d >= 2 else d
    hv = h + v
    if d >= 3:
        return 8
    if d == 2:
        return 7 if hv >= 1 else 6
    if d == 1:
        if hv >= 2:
            return 5
        return 4 if hv == 1 else 3
    return 2 if hv >= 2 else hv


_SIGN_LUT = {
    (1, 1): (13, 0), (1, 0): (12, 0), (1, -1): (11, 0),
    (0, 1): (10, 0), (0, 0): (9, 0), (0, -1): (10, 1),
    (-1, 1): (11, 1), (-1, 0): (12, 1), (-1, -1): (13, 1),
}


class _Block:
    """Shared state machine for one code-block; the fixture encoder
    mirrors these pass structures exactly (same classification, encode
    instead of decode)."""

    __slots__ = ("w", "h", "band", "sig", "sgn", "vis", "ref", "mag")

    def __init__(self, w: int, h: int, band: str):
        self.w = w
        self.h = h
        self.band = band
        n = w * h
        self.sig = bytearray(n)
        self.sgn = bytearray(n)
        self.vis = bytearray(n)
        self.ref = bytearray(n)
        self.mag = [0] * n

    def _nbr(self, x: int, y: int):
        """(h, v, d) significant-neighbor counts and sign contributions."""
        w, h = self.w, self.h
        sig, sgn = self.sig, self.sgn

        def s(xx, yy):
            if 0 <= xx < w and 0 <= yy < h and sig[yy * w + xx]:
                return -1 if sgn[yy * w + xx] else 1
            return 0

        left, right = s(x - 1, y), s(x + 1, y)
        up, down = s(x, y - 1), s(x, y + 1)
        dd = (
            (s(x - 1, y - 1) != 0)
            + (s(x + 1, y - 1) != 0)
            + (s(x - 1, y + 1) != 0)
            + (s(x + 1, y + 1) != 0)
        )
        return (
            (left != 0) + (right != 0),
            (up != 0) + (down != 0),
            dd,
            left,
            right,
            up,
            down,
        )

    def sign_ctx(self, x: int, y: int):
        _h, _v, _d, left, right, up, down = self._nbr(x, y)
        hc = max(-1, min(1, left + right))
        vc = max(-1, min(1, up + down))
        return _SIGN_LUT[(hc, vc)]


def _t1_decode(
    data: bytes, w: int, h: int, band: str, nplanes: int, npasses: int
) -> np.ndarray:
    """Decode one code-block's coefficient values (signed ints)."""
    blk = _Block(w, h, band)
    mq = MQDecoder(data if data else b"\x00")
    cx = _fresh_contexts()
    p = nplanes - 1
    passes = [("cup", p)]
    while p > 0:
        p -= 1
        passes += [("spp", p), ("mrp", p), ("cup", p)]
    for kind, plane in passes[:npasses]:
        if kind == "spp":
            _spp_dec(blk, mq, cx, plane)
        elif kind == "mrp":
            _mrp_dec(blk, mq, cx, plane)
        else:
            _cup_dec(blk, mq, cx, plane)
        if kind == "cup":
            blk.vis = bytearray(w * h)
    out = np.zeros((h, w), dtype=np.int64)
    for y in range(h):
        base = y * w
        for x in range(w):
            m = blk.mag[base + x]
            if m:
                out[y, x] = -m if blk.sgn[base + x] else m
    return out


def _spp_dec(blk: _Block, mq, cx, p: int) -> None:
    w, h = blk.w, blk.h
    for y0 in range(0, h, 4):
        for x in range(w):
            for y in range(y0, min(y0 + 4, h)):
                i = y * w + x
                if blk.sig[i]:
                    continue
                hh, vv, dd, *_ = blk._nbr(x, y)
                if hh + vv + dd == 0:
                    continue
                blk.vis[i] = 1
                if mq.decode(cx[_sig_ctx(hh, vv, dd, blk.band)]):
                    sctx, xor = blk.sign_ctx(x, y)
                    blk.sgn[i] = mq.decode(cx[sctx]) ^ xor
                    blk.sig[i] = 1
                    blk.mag[i] = 1 << p


def _mrp_dec(blk: _Block, mq, cx, p: int) -> None:
    w, h = blk.w, blk.h
    for y0 in range(0, h, 4):
        for x in range(w):
            for y in range(y0, min(y0 + 4, h)):
                i = y * w + x
                if not blk.sig[i] or blk.vis[i]:
                    continue
                if blk.ref[i]:
                    ctx = 16
                else:
                    hh, vv, dd, *_ = blk._nbr(x, y)
                    ctx = 15 if hh + vv + dd > 0 else 14
                if mq.decode(cx[ctx]):
                    blk.mag[i] += 1 << p
                blk.ref[i] = 1
                blk.vis[i] = 1


def _cup_dec(blk: _Block, mq, cx, p: int) -> None:
    w, h = blk.w, blk.h
    for y0 in range(0, h, 4):
        for x in range(w):
            y = y0
            # run-length mode: full 4-high column, all insignificant,
            # unvisited, zero-context
            if y0 + 4 <= h:
                rl = True
                for yy in range(y0, y0 + 4):
                    i = yy * w + x
                    if blk.sig[i] or blk.vis[i]:
                        rl = False
                        break
                    hh, vv, dd, *_ = blk._nbr(x, yy)
                    if hh + vv + dd:
                        rl = False
                        break
                if rl:
                    if not mq.decode(cx[_CTX_RL]):
                        continue
                    r = (mq.decode(cx[_CTX_UNI]) << 1) | mq.decode(
                        cx[_CTX_UNI]
                    )
                    y = y0 + r
                    i = y * w + x
                    sctx, xor = blk.sign_ctx(x, y)
                    blk.sgn[i] = mq.decode(cx[sctx]) ^ xor
                    blk.sig[i] = 1
                    blk.mag[i] = 1 << p
                    y += 1
            while y < min(y0 + 4, h):
                i = y * w + x
                if not blk.sig[i] and not blk.vis[i]:
                    hh, vv, dd, *_ = blk._nbr(x, y)
                    if mq.decode(cx[_sig_ctx(hh, vv, dd, blk.band)]):
                        sctx, xor = blk.sign_ctx(x, y)
                        blk.sgn[i] = mq.decode(cx[sctx]) ^ xor
                        blk.sig[i] = 1
                        blk.mag[i] = 1 << p
                y += 1


# --- inverse 5/3 DWT (Annex F) --------------------------------------------------


def _sr_1d(y: np.ndarray) -> np.ndarray:
    """1D reversible synthesis on interleaved [L0 H0 L1 H1 ...] starting
    even, whole-sample symmetric extension."""
    n = len(y)
    if n == 1:
        return y.copy()
    x = y.astype(np.int64).copy()
    # x[2n] = y[2n] - floor((y[2n-1] + y[2n+1] + 2) / 4)
    even = np.arange(0, n, 2)
    lm = np.clip(even - 1, 0, n - 1)
    lp = np.clip(even + 1, 0, n - 1)
    # symmetric extension: y[-1] -> y[1], y[n] -> y[n-2]
    lm = np.where(even - 1 < 0, np.minimum(1, n - 1), lm)
    lp = np.where(even + 1 > n - 1, max(n - 2, 0), lp)
    x[even] = y[even] - ((y[lm] + y[lp] + 2) >> 2)
    odd = np.arange(1, n, 2)
    om = odd - 1
    op = np.where(odd + 1 > n - 1, max(n - 2, 0), odd + 1)
    x[odd] = y[odd] + ((x[om] + x[op]) >> 1)
    return x


def _idwt53(ll: np.ndarray, bands: list) -> np.ndarray:
    """bands: [(hl, lh, hh)] per level, lowest resolution first."""
    a = ll.astype(np.int64)
    for hl, lh, hh in bands:
        h2 = a.shape[0] + lh.shape[0]
        w2 = a.shape[1] + hl.shape[1]
        m = np.zeros((h2, w2), dtype=np.int64)
        m[0::2, 0::2] = a
        m[0::2, 1::2] = hl
        m[1::2, 0::2] = lh
        m[1::2, 1::2] = hh
        # inverse 2D: horizontal synthesis on rows, then vertical on cols
        for r in range(h2):
            m[r, :] = _sr_1d(m[r, :])
        for c in range(w2):
            m[:, c] = _sr_1d(m[:, c])
        a = m
    return a


# --- codestream parse -----------------------------------------------------------


def _find_codestream(data: bytes) -> bytes:
    if data[:4] == b"\xff\x4f\xff\x51":
        return data  # raw J2K
    # JP2 box walk
    pos = 0
    n = len(data)
    while pos + 8 <= n:
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        btype = data[pos + 4 : pos + 8]
        if ln == 1:
            (ln,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            body = data[pos + 16 : pos + ln]
            nxt = pos + ln
        elif ln == 0:
            body = data[pos + 8 :]
            nxt = n
        else:
            body = data[pos + 8 : pos + ln]
            nxt = pos + ln
        if btype == b"jp2c":
            return body
        if nxt <= pos:
            break
        pos = nxt
    raise JpxError("no JPEG 2000 codestream found")


def jpx_siz(data: bytes) -> tuple[int, int, int, int] | None:
    """Light header probe: -> (width, height, ncomp, depth) from the SIZ
    marker, or None. Counterpart of images.jpeg_sof — the codestream
    header is the truth about dimensions, the PDF dict only a claim."""
    try:
        cs = _find_codestream(data)
        if cs[:2] != b"\xff\x4f":
            return None
        pos = 2
        while pos + 4 <= len(cs):
            if cs[pos] != 0xFF:
                return None
            marker = cs[pos + 1]
            (ln,) = struct.unpack(">H", cs[pos + 2 : pos + 4])
            if marker == 0x51:
                body = cs[pos + 4 : pos + 2 + ln]
                _r, xs, ys = struct.unpack(">HII", body[0:10])
                (csiz,) = struct.unpack(">H", body[34:36])
                depth = (body[36] & 0x7F) + 1 if len(body) > 36 else 8
                return xs, ys, csiz, depth
            if marker == 0x90:  # tile data starts; SIZ must precede
                return None
            pos += 2 + ln
    except (JpxError, struct.error, IndexError):
        return None
    return None


def jpx_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """-> (width, height, ncomp, 8-bit pixels row-major interleaved).
    Typed errors: JpxError (corrupt), JpxUnsupported (legal but outside
    the lossless-5/3 scope)."""
    try:
        return _jpx_decode(data)
    except (JpxError,):
        raise
    except (IndexError, ValueError, KeyError, struct.error) as e:
        raise JpxError(f"corrupt: {type(e).__name__}: {e}")


def _jpx_decode(data: bytes) -> tuple[int, int, int, bytes]:
    cs = _find_codestream(data)
    if cs[:2] != b"\xff\x4f":
        raise JpxError("no SOC")
    pos = 2
    n = len(cs)
    siz = cod = qcd = None
    tiles = []
    while pos + 4 <= n:
        if cs[pos] != 0xFF:
            raise JpxError(f"marker expected at {pos}")
        marker = cs[pos + 1]
        if marker == 0xD9:  # EOC
            break
        (ln,) = struct.unpack(">H", cs[pos + 2 : pos + 4])
        body = cs[pos + 4 : pos + 2 + ln]
        if marker == 0x51:  # SIZ
            siz = _parse_siz(body)
        elif marker == 0x52:  # COD
            cod = _parse_cod(body)
        elif marker == 0x5C:  # QCD
            qcd = body
        elif marker in (0x53, 0x5D, 0x5E, 0x5F, 0x55, 0x58, 0x60, 0x63):
            # COC/QCC/RGN/POC/TLM/PLM/PPM/CRG: tile/component overrides
            raise JpxUnsupported(f"marker FF{marker:02X}")
        elif marker == 0x64:  # COM
            pass
        elif marker == 0x90:  # SOT
            isot, psot = struct.unpack(">HI", body[0:6])
            tpsot, tnsot = body[6], body[7]
            if tpsot != 0 or tnsot not in (0, 1):
                raise JpxUnsupported("multiple tile-parts")
            # find SOD
            p2 = pos + 2 + ln
            if cs[p2 : p2 + 2] != b"\xff\x93":
                raise JpxUnsupported("markers inside tile header")
            start = p2 + 2
            end = pos + psot if psot else n
            tiles.append((isot, cs[start:end]))
            pos = end
            continue
        pos += 2 + ln
    if siz is None or cod is None or qcd is None:
        raise JpxError("missing SIZ/COD/QCD")
    return _decode_tiles(siz, cod, qcd, tiles)


def _parse_siz(body: bytes) -> dict:
    (
        _rsiz, xsiz, ysiz, xo, yo, xt, yt, xto, yto, csiz
    ) = struct.unpack(">HIIIIIIIIH", body[0:36])
    if xo or yo or xto or yto:
        raise JpxUnsupported("image/tile offsets")
    comps = []
    for c in range(csiz):
        ssiz, xr, yr = body[36 + 3 * c], body[37 + 3 * c], body[38 + 3 * c]
        if ssiz & 0x80:
            raise JpxUnsupported("signed components")
        depth = (ssiz & 0x7F) + 1
        if depth > 8:
            raise JpxUnsupported(f"{depth}-bit components")
        if xr != 1 or yr != 1:
            raise JpxUnsupported("subsampled components")
        comps.append(depth)
    if not (0 < xsiz and 0 < ysiz) or xsiz * ysiz > 50_000_000:
        raise JpxError(f"implausible dimensions {xsiz}x{ysiz}")
    if not (0 < xt and 0 < yt):
        raise JpxError("zero tile dimensions")
    if not 1 <= csiz <= 16:
        raise JpxUnsupported(f"{csiz} components")
    return {
        "w": xsiz, "h": ysiz, "tw": xt, "th": yt, "comps": comps,
    }


def _parse_cod(body: bytes) -> dict:
    scod = body[0]
    if scod & 0x01:
        raise JpxUnsupported("user-defined precincts")
    if scod & 0x06:
        raise JpxUnsupported("SOP/EPH markers")
    prog = body[1]
    (layers,) = struct.unpack(">H", body[2:4])
    mct = body[4]
    levels = body[5]
    xcb = (body[6] & 0x0F) + 2
    ycb = (body[7] & 0x0F) + 2
    cbstyle = body[8]
    transform = body[9]
    if prog not in (0, 1):
        raise JpxUnsupported(f"progression order {prog}")
    if layers != 1:
        raise JpxUnsupported(f"{layers} quality layers")
    if cbstyle != 0:
        raise JpxUnsupported(f"code-block style {cbstyle:#x}")
    if transform not in (0, 1):
        raise JpxError(f"transform {transform}")
    if xcb + ycb > 12:
        raise JpxError("code-block too large")
    return {
        "levels": levels, "xcb": xcb, "ycb": ycb, "mct": mct,
        "transform": transform,  # 1 = reversible 5/3, 0 = irreversible 9/7
    }


def _qcd_exponents(qcd: bytes, levels: int) -> tuple[int, list, list]:
    """-> (guard, exps, mus). Style 0 (no quantization, 8-bit entries)
    pairs with the 5/3 path; style 2 (scalar expounded, 16-bit
    exponent/mantissa entries) with 9/7. Style 1 (scalar derived) stays
    typed-unsupported."""
    sqcd = qcd[0]
    style = sqcd & 0x1F
    guard = sqcd >> 5
    nbands = 3 * levels + 1
    if style == 0:
        exps = [b >> 3 for b in qcd[1 : 1 + nbands]]
        if len(exps) < nbands:
            raise JpxError("QCD too short")
        return guard, exps, [0] * nbands
    if style == 2:
        body = qcd[1 : 1 + 2 * nbands]
        if len(body) < 2 * nbands:
            raise JpxError("QCD too short")
        exps, mus = [], []
        for i in range(nbands):
            (v,) = struct.unpack(">H", body[2 * i : 2 * i + 2])
            exps.append(v >> 11)
            mus.append(v & 0x7FF)
        return guard, exps, mus
    raise JpxUnsupported(f"quantization style {style}")


def _band_dims(w: int, h: int, levels: int):
    """-> (ll_dims, [(hl, lh, hh) dims] lowest level first).
    Offsets are zero, so each split is ceil/floor."""
    dims = []
    cw, ch = w, h
    for _ in range(levels):
        lw, lh_ = (cw + 1) // 2, (ch + 1) // 2
        hw, hh_ = cw - lw, ch - lh_
        dims.append(((hw, lh_), (lw, hh_), (hw, hh_)))  # HL, LH, HH
        cw, ch = lw, lh_
    dims.reverse()  # lowest resolution first
    return (cw, ch), dims


def _decode_tiles(siz, cod, qcd, tiles) -> tuple[int, int, int, bytes]:
    w, h = siz["w"], siz["h"]
    ncomp = len(siz["comps"])
    levels = cod["levels"]
    guard, exps, mus = _qcd_exponents(qcd, levels)
    reversible = cod["transform"] == 1
    ntx = (w + siz["tw"] - 1) // siz["tw"]
    nty = (h + siz["th"] - 1) // siz["th"]
    dtype = np.int64 if reversible else np.float64
    out = [np.zeros((h, w), dtype=dtype) for _ in range(ncomp)]
    for isot, tdata in tiles:
        tx, ty = isot % ntx, isot // ntx
        x0, y0 = tx * siz["tw"], ty * siz["th"]
        tw = min(siz["tw"], w - x0)
        th = min(siz["th"], h - y0)
        planes = _decode_tile(tdata, tw, th, ncomp, cod, guard, exps, mus,
                              siz["comps"][0])
        for ci in range(ncomp):
            out[ci][y0 : y0 + th, x0 : x0 + tw] = planes[ci]
    if cod["mct"] and ncomp >= 3:
        if reversible:
            # inverse RCT (reversible): G = Y - floor((U + V) / 4)
            yv, uv, vv = out[0], out[1], out[2]
            g = yv - ((uv + vv) >> 2)
            r = vv + g
            b = uv + g
            out[0], out[1], out[2] = r, g, b
        else:
            # inverse ICT (irreversible YCbCr)
            yv, cb, cr = out[0], out[1], out[2]
            r = yv + 1.402 * cr
            g = yv - 0.344136 * cb - 0.714136 * cr
            b = yv + 1.772 * cb
            out[0], out[1], out[2] = r, g, b
    depth = siz["comps"][0]
    shift = 1 << (depth - 1)
    if not reversible:
        out = [np.rint(p) for p in out]
    pix = np.stack(
        [np.clip(p + shift, 0, (1 << depth) - 1) for p in out], axis=-1
    ).astype(np.uint8)
    return w, h, ncomp, pix.tobytes()


# 9/7 lifting constants (T.800 F.4.8: analysis uses the SIGNED alpha
# and beta — high-band steps subtract — with low scaled by 1/K and high
# by K; the synthesis below is the exact reverse)
_K97 = 1.230174104914001
_ALPHA97 = 1.586134342059924
_BETA97 = 0.052980118572961
_GAMMA97 = 0.882911075530934
_DELTA97 = 0.443506852043971


def _sr97_1d(y: np.ndarray) -> np.ndarray:
    """1D irreversible synthesis on interleaved [L0 H0 L1 H1 ...]
    starting even, whole-sample symmetric extension."""
    n = len(y)
    if n == 1:
        return y.astype(np.float64).copy()
    x = y.astype(np.float64).copy()
    even = np.arange(0, n, 2)
    odd = np.arange(1, n, 2)
    # neighbor index maps with symmetric extension
    em = np.where(even - 1 < 0, min(1, n - 1), even - 1)
    ep = np.where(even + 1 > n - 1, max(n - 2, 0), even + 1)
    om = odd - 1
    op = np.where(odd + 1 > n - 1, max(n - 2, 0), odd + 1)
    x[even] *= _K97
    x[odd] /= _K97
    x[even] -= _DELTA97 * (x[em] + x[ep])
    x[odd] -= _GAMMA97 * (x[om] + x[op])
    x[even] += _BETA97 * (x[em] + x[ep])
    x[odd] += _ALPHA97 * (x[om] + x[op])
    return x


def _idwt97(ll: np.ndarray, bands: list) -> np.ndarray:
    a = ll.astype(np.float64)
    for hl, lh, hh in bands:
        h2 = a.shape[0] + lh.shape[0]
        w2 = a.shape[1] + hl.shape[1]
        m = np.zeros((h2, w2), dtype=np.float64)
        m[0::2, 0::2] = a
        m[0::2, 1::2] = hl
        m[1::2, 0::2] = lh
        m[1::2, 1::2] = hh
        for r in range(h2):
            m[r, :] = _sr97_1d(m[r, :])
        for c in range(w2):
            m[:, c] = _sr97_1d(m[:, c])
        a = m
    return a


def _band_gain(name: str) -> int:
    return {"LL": 0, "HL": 1, "LH": 1, "HH": 2}[name]


def _decode_tile(tdata, tw, th, ncomp, cod, guard, exps, mus, depth):
    levels = cod["levels"]
    xcb, ycb = cod["xcb"], cod["ycb"]
    (llw, llh), level_dims = _band_dims(tw, th, levels)
    # per component, per band: coefficient arrays
    band_arrays = []
    for _ in range(ncomp):
        arrays = {"LL": np.zeros((llh, llw), dtype=np.int64)}
        for lvl, ((hlw, hlh), (lhw, lhh), (hhw, hhh)) in enumerate(
            level_dims
        ):
            arrays[("HL", lvl)] = np.zeros((hlh, hlw), dtype=np.int64)
            arrays[("LH", lvl)] = np.zeros((lhh, lhw), dtype=np.int64)
            arrays[("HH", lvl)] = np.zeros((hhh, hhw), dtype=np.int64)
        band_arrays.append(arrays)

    br = _HeaderBits(tdata, 0)
    band_q = {}  # band key -> (eps, mu) for dequantization
    # packets in LRCP/RLCP order with 1 layer: r-major, then component
    for r in range(levels + 1):
        for ci in range(ncomp):
            if r == 0:
                bands = [("LL", None, exps[0])]
                band_q["LL"] = (exps[0], mus[0])
            else:
                e = exps[1 + 3 * (r - 1) : 4 + 3 * (r - 1)]
                m = mus[1 + 3 * (r - 1) : 4 + 3 * (r - 1)]
                bands = [
                    ("HL", r - 1, e[0]),
                    ("LH", r - 1, e[1]),
                    ("HH", r - 1, e[2]),
                ]
                for bi, nm in enumerate(("HL", "LH", "HH")):
                    band_q[(nm, r - 1)] = (e[bi], m[bi])
            _decode_packet(
                br, band_arrays[ci], bands, guard, xcb, ycb
            )
    if cod["transform"] == 1:
        return [
            _idwt53(
                arrays["LL"],
                [
                    (
                        arrays[("HL", lvl)],
                        arrays[("LH", lvl)],
                        arrays[("HH", lvl)],
                    )
                    for lvl in range(levels)
                ],
            )
            for arrays in band_arrays
        ]

    # irreversible: dequantize (E.1.1.2, r = 0.5 reconstruction bias)
    # with delta_b = 2^(Rb - eps) * (1 + mu / 2^11), Rb = depth + gain
    def deq(arr, key, name):
        eps, mu = band_q[key]
        rb = depth + _band_gain(name)
        delta = (2.0 ** (rb - eps)) * (1.0 + mu / 2048.0)
        a = arr.astype(np.float64)
        return np.where(a != 0, np.sign(a) * (np.abs(a) + 0.5) * delta, 0.0)

    out = []
    for arrays in band_arrays:
        ll = deq(arrays["LL"], "LL", "LL")
        bands_f = [
            (
                deq(arrays[("HL", lvl)], ("HL", lvl), "HL"),
                deq(arrays[("LH", lvl)], ("LH", lvl), "LH"),
                deq(arrays[("HH", lvl)], ("HH", lvl), "HH"),
            )
            for lvl in range(levels)
        ]
        out.append(_idwt97(ll, bands_f))
    return out


def _decode_packet(br, arrays, bands, guard, xcb, ycb):
    """One packet (single layer, one precinct = whole subband)."""
    if not br.bit():
        br.align()
        return  # empty packet
    todo = []  # (band_key, bx, by, npasses, nplanes, length)
    for name, lvl, eps in bands:
        key = "LL" if name == "LL" else (name, lvl)
        arr = arrays[key]
        bh, bw = arr.shape
        if bw == 0 or bh == 0:
            continue
        ncx = (bw + (1 << xcb) - 1) >> xcb
        ncy = (bh + (1 << ycb) - 1) >> ycb
        incl = TagTree(ncx, ncy)
        zbp = TagTree(ncx, ncy)
        mb = guard + eps - 1
        for cy in range(ncy):
            for cx_ in range(ncx):
                known, v = incl.decode(br, cx_, cy, 1)
                included = known and v == 0
                if not included:
                    continue
                zb = zbp.decode_value(br, cx_, cy)
                npasses = _read_npasses(br)
                lblock = 3
                while br.bit():
                    lblock += 1
                nbits = lblock + _floorlog2(npasses)
                length = br.bits(nbits)
                todo.append((key, name, cx_, cy, npasses, mb - zb, length))
    pos = br.align()
    data = br.data
    for key, name, cx_, cy, npasses, nplanes, length in todo:
        arr = arrays[key]
        bh, bw = arr.shape
        x0, y0 = cx_ << xcb, cy << ycb
        cbw = min(1 << xcb, bw - x0)
        cbh = min(1 << ycb, bh - y0)
        if nplanes < 0:
            raise JpxError("negative bitplane count")
        seg = data[pos : pos + length]
        if len(seg) < length:
            raise JpxError("code-block data overrun")
        coeffs = _t1_decode(seg, cbw, cbh, name, nplanes, npasses)
        arr[y0 : y0 + cbh, x0 : x0 + cbw] = coeffs
        pos += length
    br.pos = pos
    br.ct = 0
    br.buf = 0


def _read_npasses(br) -> int:
    if not br.bit():
        return 1
    if not br.bit():
        return 2
    v = br.bits(2)
    if v < 3:
        return 3 + v
    v = br.bits(5)
    if v < 31:
        return 6 + v
    return 37 + br.bits(7)


def _floorlog2(n: int) -> int:
    return max(0, n.bit_length() - 1)
