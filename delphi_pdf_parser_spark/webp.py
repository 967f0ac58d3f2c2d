"""WebP lossless (VP8L) decoder, from scratch.

ABOVE-REFERENCE web-side surface (the reference parses PDFs only): WebP
is the second most common image format on the web, so the multimodal
decode path should read it. This implements the full VP8L bitstream
(RFC 9649 / the public WebP lossless spec):

- RIFF container walk (VP8L direct, VP8X extended wrapping a VP8L
  chunk); lossy VP8 raises the typed unsupported error
- LSB-first bit reading, canonical DEFLATE-style prefix codes (simple
  1/2-symbol codes and code-length-coded normal codes with 16/17/18
  repeats and the optional max_symbol cap)
- color cache (the 0x1e35a7bd multiplicative hash), meta prefix-code
  groups via an entropy subimage, LZ77 backward references with the
  2D distance mapping for plane codes <= 120
- all four transforms, inverted in reverse order: PREDICTOR (14 modes,
  including the right-edge top-right quirk where TR of (w-1, y) is the
  already-decoded (0, y)), COLOR (signed-byte ColorTransformDelta),
  SUBTRACT_GREEN, COLOR_INDEXING (with sub-byte pixel packing)

Interop caveat (as for jbig2/jpx): no third-party WebP files exist in
this runtime; the decoder is validated against the independent fixture
encoder (fixtures.webp_encode) plus spec-anchored unit pins (distance
map prefix, hash constant, predictor edge rules).
"""

from __future__ import annotations

import struct


class WebpError(Exception):
    pass


class WebpUnsupported(WebpError):
    pass


class _LsbReader:
    """Buffered LSB-first reader: peek() zero-pads past the end (the
    overrun is raised on CONSUMPTION), which lets prefix decoding use an
    8-bit lookahead table."""

    __slots__ = ("data", "bytepos", "acc", "navail")

    def __init__(self, data: bytes):
        self.data = data
        self.bytepos = 0
        self.acc = 0
        self.navail = 0

    def _fill(self, n: int) -> None:
        data = self.data
        while self.navail < n and self.bytepos < len(data):
            self.acc |= data[self.bytepos] << self.navail
            self.navail += 8
            self.bytepos += 1

    def peek(self, n: int) -> int:
        if self.navail < n:
            self._fill(n)
        return self.acc & ((1 << n) - 1)

    def skip(self, n: int) -> None:
        if self.navail < n:
            self._fill(n)
            if self.navail < n:
                raise WebpError("bitstream overrun")
        self.acc >>= n
        self.navail -= n

    def read1(self) -> int:
        v = self.peek(1)
        self.skip(1)
        return v

    def read(self, n: int) -> int:
        v = self.peek(n)
        self.skip(n)
        return v


class _Prefix:
    """Canonical prefix code from per-symbol lengths (DEFLATE
    construction); codes are walked MSB-of-code-first. Decode uses an
    8-bit lookahead table (codes stream LSB-first, so table keys are the
    bit-reversed codes); longer codes fall back to a bit walk."""

    __slots__ = ("map", "maxlen", "single", "lut")

    def _build_lut(self):
        # used by simple() only (codes are 1 bit); __init__ fills its
        # LUT inline during canonical assignment
        lut = [None] * 256
        for (l, code), s in self.map.items():
            key = 0
            c = code
            for i in range(l):
                key |= ((c >> i) & 1) << (l - 1 - i)
            lut[key :: 1 << l] = [(s, l)] * (1 << (8 - l))
        self.lut = lut

    def __init__(self, lengths: list):
        used = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not used:
            raise WebpError("empty prefix code")
        if len(used) == 1:
            self.single = used[0][1]
            self.map = {}
            self.maxlen = 0
            self.lut = None
            return
        self.single = None
        maxlen = max(l for l, _ in used)
        count = [0] * (maxlen + 1)
        for l, _ in used:
            count[l] += 1
        nextcode = [0] * (maxlen + 2)
        code = 0
        for l in range(1, maxlen + 1):
            code = (code + count[l - 1]) << 1
            nextcode[l] = code
        # codes <= 8 bits fill the lookahead LUT directly (slice-assign:
        # all 256 keys sharing the reversed code prefix in one step);
        # only longer codes land in the bit-walk map
        m = {}
        lut = [None] * 256
        for s, l in enumerate(lengths):
            if l == 0:
                continue
            code = nextcode[l]
            nextcode[l] += 1
            if l <= 8:
                # reverse the l code bits (first-transmitted = MSB)
                key = 0
                c = code
                for _ in range(l):
                    key = (key << 1) | (c & 1)
                    c >>= 1
                lut[key :: 1 << l] = [(s, l)] * (1 << (8 - l))
            else:
                m[(l, code)] = s
        # completeness: Kraft sum must be exactly 1 (spec requires it)
        if sum(count[l] * (1 << (maxlen - l)) for l in range(1, maxlen + 1)) != (
            1 << maxlen
        ):
            raise WebpError("incomplete prefix code")
        self.map = m
        self.maxlen = maxlen
        self.lut = lut

    @classmethod
    def simple(cls, symbols: list):
        p = cls.__new__(cls)
        if len(symbols) == 1:
            p.single = symbols[0]
            p.map = {}
            p.maxlen = 0
            p.lut = None
        else:
            p.single = None
            p.map = {(1, 0): symbols[0], (1, 1): symbols[1]}
            p.maxlen = 1
            p._build_lut()
        return p

    def decode(self, br: _LsbReader) -> int:
        if self.single is not None:
            return self.single
        e = self.lut[br.peek(8)]
        if e is not None:
            br.skip(e[1])
            return e[0]
        # codes longer than 8 bits: bit walk over a wide peek
        v = br.peek(self.maxlen)
        acc = 0
        for l in range(1, self.maxlen + 1):
            acc = (acc << 1) | ((v >> (l - 1)) & 1)
            s = self.map.get((l, acc))
            if s is not None:
                br.skip(l)
                return s
        raise WebpError("invalid prefix code")


# code-length-code symbol order (shared with DEFLATE-style schemes)
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _read_code_lengths(br: _LsbReader, alphabet: int) -> list:
    num_codes = br.read(4) + 4
    cl_lens = [0] * 19
    for i in range(num_codes):
        cl_lens[_CL_ORDER[i]] = br.read(3)
    cl = _Prefix(cl_lens)
    if br.read1():  # use a max_symbol cap
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev = 8
    symbol = 0
    # hot loop: one CL symbol per alphabet slot (up to 280+cache) per
    # prefix tree per image — inline the LSB reader state locally to
    # avoid per-symbol method-call overhead (CL codes are <= 7 bits, so
    # the 8-bit LUT always resolves; extra-bit reads are <= 7 bits too)
    data = br.data
    ndata = len(data)
    bytepos = br.bytepos
    acc = br.acc
    navail = br.navail
    single = cl.single
    lut = cl.lut
    while symbol < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        if single is not None:
            code = single
        else:
            while navail < 8 and bytepos < ndata:
                acc |= data[bytepos] << navail
                navail += 8
                bytepos += 1
            e = lut[acc & 0xFF]
            if e is None:
                raise WebpError("invalid prefix code")
            code, n = e
            if navail < n:
                raise WebpError("bitstream overrun")
            acc >>= n
            navail -= n
        if code < 16:
            lengths[symbol] = code
            symbol += 1
            if code:
                prev = code
        else:
            if code == 16:
                nb, base = 2, 3
            elif code == 17:
                nb, base = 3, 3
            else:
                nb, base = 7, 11
            while navail < nb and bytepos < ndata:
                acc |= data[bytepos] << navail
                navail += 8
                bytepos += 1
            if navail < nb:
                raise WebpError("bitstream overrun")
            rep = base + (acc & ((1 << nb) - 1))
            acc >>= nb
            navail -= nb
            if code == 16:
                for _ in range(rep):
                    if symbol < alphabet:
                        lengths[symbol] = prev
                        symbol += 1
            else:
                symbol += rep
    br.bytepos = bytepos
    br.acc = acc
    br.navail = navail
    return lengths


def _read_prefix(br: _LsbReader, alphabet: int) -> _Prefix:
    if br.read1():  # simple
        num = br.read(1) + 1
        first_8 = br.read1()
        s0 = br.read(8 if first_8 else 1)
        if num == 2:
            return _Prefix.simple([s0, br.read(8)])
        return _Prefix.simple([s0])
    return _Prefix(_read_code_lengths(br, alphabet))


def _prefix_value(br: _LsbReader, code: int) -> int:
    """LZ77 length/distance prefix decoding."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _dist_map():
    """2D plane codes 1..120 -> pixel distance offsets (dx, dy). The
    code nibbles are (dy << 4) | (8 - dx), so the domain is dy 0 with
    dx 1..8 plus dy 1..7 with dx -7..8 — 120 offsets, sorted by
    (dx*dx + dy*dy, |dx|, dx<0). Matches the spec's explicit table
    (its listed prefix and distance-tie blocks are pinned in tests)."""
    pairs = [(dx, 0) for dx in range(1, 9)]
    pairs += [(dx, dy) for dy in range(1, 8) for dx in range(-7, 9)]
    pairs.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]), p[0] < 0))
    return pairs


_DIST_MAP = _dist_map()


def _plane_to_dist(code: int, w: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    return max(1, dy * w + dx)


_HASH_MULT = 0x1E35A7BD


def _decode_entropy_image(br, w, h, level0):
    """Spatially-coded ARGB image -> flat list of (a, r, g, b)."""
    cache_bits = br.read(4) if br.read1() else 0
    cache_size = 1 << cache_bits if cache_bits else 0
    if cache_bits > 11:
        raise WebpError("color cache too large")
    cache = [0] * cache_size
    meta = None
    meta_bits = 0
    n_groups = 1
    if level0 and br.read1():
        meta_bits = br.read(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta = _decode_entropy_image(br, mw, mh, False)
        n_groups = max(((p[1] << 8) | p[2]) for p in meta) + 1
    g_alpha = 256 + 24 + cache_size
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_prefix(br, g_alpha),   # green+len+cache
                _read_prefix(br, 256),       # red
                _read_prefix(br, 256),       # blue
                _read_prefix(br, 256),       # alpha
                _read_prefix(br, 40),        # distance
            )
        )
    n = w * h
    out = [None] * n
    pos = 0

    def cache_insert(px):
        if cache_size:
            argb = (px[0] << 24) | (px[1] << 16) | (px[2] << 8) | px[3]
            cache[(_HASH_MULT * argb & 0xFFFFFFFF) >> (32 - cache_bits)] = argb

    while pos < n:
        if meta is not None:
            x, y = pos % w, pos // w
            mw = (w + (1 << meta_bits) - 1) >> meta_bits
            mp = meta[(y >> meta_bits) * mw + (x >> meta_bits)]
            gcode, rcode, bcode, acode, dcode = groups[(mp[1] << 8) | mp[2]]
        else:
            gcode, rcode, bcode, acode, dcode = groups[0]
        s = gcode.decode(br)
        if s < 256:
            r = rcode.decode(br)
            b = bcode.decode(br)
            a = acode.decode(br)
            px = (a, r, s, b)
            out[pos] = px
            cache_insert(px)
            pos += 1
        elif s < 280:
            length = _prefix_value(br, s - 256)
            dist = _plane_to_dist(_prefix_value(br, dcode.decode(br)), w)
            if dist > pos:
                raise WebpError("backward reference before start")
            for _ in range(length):
                if pos >= n:
                    break
                px = out[pos - dist]
                out[pos] = px
                cache_insert(px)
                pos += 1
        else:
            if not cache_size:
                raise WebpError("cache hit without cache")
            argb = cache[s - 280]
            out[pos] = (
                (argb >> 24) & 0xFF, (argb >> 16) & 0xFF,
                (argb >> 8) & 0xFF, argb & 0xFF,
            )
            pos += 1
    return out


def _avg2(a, b):
    return tuple((x + y) >> 1 for x, y in zip(a, b))


def _clamp(v):
    return 0 if v < 0 else 255 if v > 255 else v


def _inv_predictor(pix, w, h, tiles, bits):
    tw = (w + (1 << bits) - 1) >> bits
    out = pix  # in place: residuals become pixels
    for pos in range(w * h):
        x, y = pos % w, pos // w
        if pos == 0:
            pred = (255, 0, 0, 0)
        elif y == 0:
            pred = out[pos - 1]
        elif x == 0:
            pred = out[pos - w]
        else:
            mode_px = tiles[(y >> bits) * tw + (x >> bits)]
            mode = mode_px[2]  # green channel
            left = out[pos - 1]
            top = out[pos - w]
            tl = out[pos - w - 1]
            tr = out[pos - w + 1]  # for x==w-1 this is (0, y): the quirk
            if mode == 0:
                pred = (255, 0, 0, 0)
            elif mode == 1:
                pred = left
            elif mode == 2:
                pred = top
            elif mode == 3:
                pred = tr
            elif mode == 4:
                pred = tl
            elif mode == 5:
                pred = _avg2(_avg2(left, tr), top)
            elif mode == 6:
                pred = _avg2(left, tl)
            elif mode == 7:
                pred = _avg2(left, top)
            elif mode == 8:
                pred = _avg2(tl, top)
            elif mode == 9:
                pred = _avg2(top, tr)
            elif mode == 10:
                pred = _avg2(_avg2(left, tl), _avg2(top, tr))
            elif mode == 11:
                p_t = sum(abs(l - t) for l, t in zip(left, tl))
                p_l = sum(abs(t - t2) for t, t2 in zip(top, tl))
                pred = top if p_t <= p_l else left
            elif mode == 12:
                pred = tuple(
                    _clamp(l + t - c) for l, t, c in zip(left, top, tl)
                )
            elif mode == 13:
                ave = _avg2(left, top)
                pred = tuple(
                    _clamp(av + int((av - c) / 2)) for av, c in zip(ave, tl)
                )
            else:
                raise WebpError(f"predictor mode {mode}")
        out[pos] = tuple((p + q) & 0xFF for p, q in zip(pred, out[pos]))
    return out


def _ctd(t, c):
    """ColorTransformDelta: signed-byte product, arithmetic >> 5."""
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def _inv_color_transform(pix, w, h, tiles, bits):
    tw = (w + (1 << bits) - 1) >> bits
    for pos in range(w * h):
        x, y = pos % w, pos // w
        te = tiles[(y >> bits) * tw + (x >> bits)]
        g2r, g2b, r2b = te[3], te[2], te[1]  # blue, green, red channels
        a, r, g, b = pix[pos]
        r = (r + _ctd(g2r, g)) & 0xFF
        b = (b + _ctd(g2b, g) + _ctd(r2b, r)) & 0xFF
        pix[pos] = (a, r, g, b)
    return pix


def _inv_subtract_green(pix):
    for i, (a, r, g, b) in enumerate(pix):
        pix[i] = (a, (r + g) & 0xFF, g, (b + g) & 0xFF)
    return pix


def _inv_color_index(pix, w, h, palette, packed_w):
    n_pal = len(palette)
    bpp = 1 if n_pal <= 2 else 2 if n_pal <= 4 else 4 if n_pal <= 16 else 8
    if bpp == 8:
        return [
            palette[p[2]] if p[2] < n_pal else (0, 0, 0, 0) for p in pix
        ], w
    ppb = 8 // bpp
    mask = (1 << bpp) - 1
    out = []
    for y in range(h):
        for x in range(w):
            g = pix[y * packed_w + x // ppb][2]
            idx = (g >> (bpp * (x % ppb))) & mask
            out.append(palette[idx] if idx < n_pal else (0, 0, 0, 0))
    return out, w


def _vp8l_decode(payload: bytes) -> tuple[int, int, int, bytes]:
    if not payload or payload[0] != 0x2F:
        raise WebpError("bad VP8L signature")
    br = _LsbReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read1()  # alpha hint
    if br.read(3) != 0:
        raise WebpUnsupported("VP8L version")
    if w * h > 50_000_000:
        raise WebpError("implausible dimensions")
    transforms = []
    seen = set()
    xsize = w
    while br.read1():
        ttype = br.read(2)
        if ttype in seen:
            raise WebpError("duplicate transform")
        seen.add(ttype)
        if ttype == 0:  # PREDICTOR
            bits = br.read(3) + 2
            tw = (xsize + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            tiles = _decode_entropy_image(br, tw, th, False)
            transforms.append(("pred", bits, tiles))
        elif ttype == 1:  # COLOR
            bits = br.read(3) + 2
            tw = (xsize + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            tiles = _decode_entropy_image(br, tw, th, False)
            transforms.append(("color", bits, tiles))
        elif ttype == 2:  # SUBTRACT_GREEN
            transforms.append(("sub_green",))
        else:  # COLOR_INDEXING
            n_colors = br.read(8) + 1
            deltas = _decode_entropy_image(br, n_colors, 1, False)
            palette = []
            prev = (0, 0, 0, 0)
            for d in deltas:
                prev = tuple((p + q) & 0xFF for p, q in zip(prev, d))
                palette.append(prev)
            bpp = 1 if n_colors <= 2 else 2 if n_colors <= 4 else (
                4 if n_colors <= 16 else 8
            )
            full_w = xsize
            if bpp < 8:
                xsize = (xsize + (8 // bpp) - 1) // (8 // bpp)
            transforms.append(("index", palette, full_w))
    pix = _decode_entropy_image(br, xsize, h, True)
    cur_w = xsize
    for t in reversed(transforms):
        if t[0] == "index":
            pix, cur_w = _inv_color_index(pix, t[2], h, t[1], cur_w)
        elif t[0] == "sub_green":
            pix = _inv_subtract_green(pix)
        elif t[0] == "color":
            pix = _inv_color_transform(pix, cur_w, h, t[2], t[1])
        else:
            pix = _inv_predictor(pix, cur_w, h, t[2], t[1])
    if cur_w != w:
        raise WebpError("width mismatch after transforms")
    has_alpha = any(p[0] != 255 for p in pix)
    if has_alpha:
        out = bytes(v for p in pix for v in (p[1], p[2], p[3], p[0]))
        return w, h, 4, out
    out = bytes(v for p in pix for v in (p[1], p[2], p[3]))
    return w, h, 3, out


def webp_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """RIFF/WEBP bytes -> (width, height, ncomp, RGB(A) pixels).
    WebpUnsupported for lossy VP8; WebpError for corrupt payloads."""
    try:
        return _webp_decode(data)
    except (WebpError,):
        raise
    except (IndexError, ValueError, KeyError, struct.error) as e:
        raise WebpError(f"corrupt: {type(e).__name__}: {e}")


def _webp_decode(data: bytes) -> tuple[int, int, int, bytes]:
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise WebpError("not a WEBP RIFF")
    pos = 12
    n = len(data)
    while pos + 8 <= n:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8L":
            return _vp8l_decode(payload)
        if fourcc == b"VP8 ":
            raise WebpUnsupported("lossy VP8")
        # VP8X / ALPH / ANIM / metadata chunks: keep walking for a VP8L
        pos += 8 + size + (size & 1)
    raise WebpUnsupported("no VP8L chunk")
