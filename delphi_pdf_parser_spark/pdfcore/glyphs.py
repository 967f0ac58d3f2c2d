"""Glyph outline extraction for the raster sink (A43): TrueType `glyf`
(simple + composite, quadratic beziers), CFF Type2 charstrings
(cubic beziers, subr calls with bias, hint skipping) and Type1
charstrings (eexec + lenIV decryption, name-addressed glyphs,
unbiased subrs, flex via othersubrs) — the three embedded outline
formats PDF fonts carry. The reference gets outlines from
FreeType (FT_Outline_Decompose under its draw device); this is the
from-scratch equivalent, emitting FLATTENED contours (point lists) in
font units so the rasterizer consumes them directly.

Fonts without an embedded outline program (base-14 references) have no
outlines here by construction — the render device falls back to the
synthetic-sans face in fallbackfont.py (recording
`raster_fallback_font`), and records `raster_no_outline` only for
glyphs outside that face's coverage.
"""

from __future__ import annotations

import struct

from .raster import flatten_cubic, flatten_quad

_u8 = lambda b, o: b[o]  # noqa: E731
_u16 = lambda b, o: struct.unpack_from(">H", b, o)[0]  # noqa: E731
_i16 = lambda b, o: struct.unpack_from(">h", b, o)[0]  # noqa: E731
_u32 = lambda b, o: struct.unpack_from(">I", b, o)[0]  # noqa: E731


class OutlineError(Exception):
    pass


# --- TrueType glyf ----------------------------------------------------------


def _loca(sf):
    data, tables = sf._data, sf._tables
    if b"loca" not in tables or b"glyf" not in tables or b"head" not in tables:
        raise OutlineError("no_glyf")
    hoff, hlen = tables[b"head"]
    if hlen < 52:
        raise OutlineError("bad_head")
    fmt = _i16(data, hoff + 50)
    loff, llen = tables[b"loca"]
    if fmt == 0:
        n = llen // 2
        return [_u16(data, loff + 2 * i) * 2 for i in range(n)]
    n = llen // 4
    return [_u32(data, loff + 4 * i) for i in range(n)]


def _glyf_points(data, off):
    """Simple glyph -> (contours of (x, y, on_curve))."""
    ncont = _i16(data, off)
    p = off + 10
    ends = [_u16(data, p + 2 * i) for i in range(ncont)]
    p += 2 * ncont
    npts = ends[-1] + 1 if ends else 0
    ilen = _u16(data, p)
    p += 2 + ilen
    flags = []
    while len(flags) < npts:
        f = data[p]
        p += 1
        flags.append(f)
        if f & 8:  # repeat
            r = data[p]
            p += 1
            flags.extend([f] * r)
    xs, x = [], 0
    for f in flags:
        if f & 2:
            d = data[p]
            p += 1
            x += d if f & 16 else -d
        elif not f & 16:
            x += _i16(data, p)
            p += 2
        xs.append(x)
    ys, y = [], 0
    for f in flags:
        if f & 4:
            d = data[p]
            p += 1
            y += d if f & 32 else -d
        elif not f & 32:
            y += _i16(data, p)
            p += 2
        ys.append(y)
    contours = []
    start = 0
    for e in ends:
        contours.append(
            [
                (xs[i], ys[i], bool(flags[i] & 1))
                for i in range(start, e + 1)
            ]
        )
        start = e + 1
    return contours


def _quad_contour_to_poly(pts):
    """TrueType contour ((x, y, on) points, implied midpoints between
    consecutive off-curve points) -> flattened polygon."""
    if not pts:
        return []
    # rotate so the contour starts on-curve (insert midpoint if none)
    if not any(on for _x, _y, on in pts):
        mid = (
            (pts[0][0] + pts[-1][0]) / 2.0,
            (pts[0][1] + pts[-1][1]) / 2.0,
            True,
        )
        pts = [mid] + pts
    else:
        k = next(i for i, (_x, _y, on) in enumerate(pts) if on)
        pts = pts[k:] + pts[:k]
    poly = [(float(pts[0][0]), float(pts[0][1]))]
    i = 1
    n = len(pts)
    cur = poly[0]
    while i <= n:
        x, y, on = pts[i % n]
        if on:
            poly.append((float(x), float(y)))
            cur = (float(x), float(y))
            i += 1
        else:
            nx, ny, non = pts[(i + 1) % n]
            if non:
                end = (float(nx), float(ny))
                i += 2
            else:
                end = ((x + nx) / 2.0, (y + ny) / 2.0)
                i += 1
            poly.extend(flatten_quad(cur, (float(x), float(y)), end))
            cur = end
    return poly


def ttf_outline(sf, gid: int, depth: int = 0):
    """-> list of flattened contours (font units) for glyph `gid`."""
    loca = _loca(sf)
    if gid < 0 or gid + 1 >= len(loca):
        raise OutlineError("gid_out_of_range")
    goff, glen = sf._tables[b"glyf"]
    a, b = loca[gid], loca[gid + 1]
    if a == b:
        return []  # empty glyph (space)
    off = goff + a
    data = sf._data
    ncont = _i16(data, off)
    if ncont >= 0:
        return [_quad_contour_to_poly(c) for c in _glyf_points(data, off)]
    if depth > 4:
        raise OutlineError("composite_too_deep")
    # composite glyph
    out = []
    p = off + 10
    while True:
        flags = _u16(data, p)
        cgid = _u16(data, p + 2)
        p += 4
        if flags & 1:  # ARG_1_AND_2_ARE_WORDS
            a1, a2 = _i16(data, p), _i16(data, p + 2)
            p += 4
        else:
            a1 = struct.unpack_from(">b", data, p)[0]
            a2 = struct.unpack_from(">b", data, p + 1)[0]
            p += 2
        sx = sy = 1.0
        s01 = s10 = 0.0
        if flags & 8:  # WE_HAVE_A_SCALE
            sx = sy = _i16(data, p) / 16384.0
            p += 2
        elif flags & 0x40:  # X_AND_Y_SCALE
            sx = _i16(data, p) / 16384.0
            sy = _i16(data, p + 2) / 16384.0
            p += 4
        elif flags & 0x80:  # 2x2
            sx = _i16(data, p) / 16384.0
            s01 = _i16(data, p + 2) / 16384.0
            s10 = _i16(data, p + 4) / 16384.0
            sy = _i16(data, p + 6) / 16384.0
            p += 8
        dx, dy = (a1, a2) if flags & 2 else (0, 0)  # ARGS_ARE_XY_VALUES
        for cont in ttf_outline(sf, cgid, depth + 1):
            out.append(
                [
                    (x * sx + y * s10 + dx, x * s01 + y * sy + dy)
                    for x, y in cont
                ]
            )
        if not flags & 0x20:  # MORE_COMPONENTS
            break
    return out


# --- CFF Type2 charstrings --------------------------------------------------


def _cff_index_entries(data, pos):
    count = _u16(data, pos)
    if count == 0:
        return [], pos + 2
    osz = data[pos + 2]
    offs = []
    p = pos + 3
    for i in range(count + 1):
        v = 0
        for j in range(osz):
            v = (v << 8) | data[p + i * osz + j]
        offs.append(v)
    base = p + (count + 1) * osz - 1
    items = [data[base + offs[i] : base + offs[i + 1]] for i in range(count)]
    return items, base + offs[-1]


class CffOutlines:
    """Charstring-level CFF reader (the encoding/charset half lives in
    cff.py — this one owns CharStrings + subrs for outlines)."""

    def __init__(self, data: bytes):
        if len(data) < 4 or data[0] != 1:
            raise OutlineError("cff_bad_header")
        pos = data[2]
        _names, pos = _cff_index_entries(data, pos)
        tops, pos = _cff_index_entries(data, pos)
        _strings, pos = _cff_index_entries(data, pos)
        gsubrs, pos = _cff_index_entries(data, pos)
        if not tops:
            raise OutlineError("cff_no_topdict")
        top = self._dict(tops[0])
        cs_off = top.get(17)
        if not cs_off:
            raise OutlineError("cff_no_charstrings")
        self.charstrings, _ = _cff_index_entries(data, int(cs_off[0]))
        self.gsubrs = gsubrs
        self.lsubrs = []
        priv = top.get(18)  # [size, offset]
        if priv and len(priv) == 2:
            psz, poff = int(priv[0]), int(priv[1])
            pdict = self._dict(data[poff : poff + psz])
            sub = pdict.get(19)
            if sub:
                self.lsubrs, _ = _cff_index_entries(data, poff + int(sub[0]))

    @staticmethod
    def _dict(blob):
        out = {}
        stack = []
        i = 0
        while i < len(blob):
            b0 = blob[i]
            if b0 <= 21:
                op = b0
                i += 1
                if b0 == 12:
                    op = 0xC00 | blob[i]
                    i += 1
                out[op] = stack
                stack = []
            elif b0 == 28:
                stack.append(struct.unpack_from(">h", blob, i + 1)[0])
                i += 3
            elif b0 == 29:
                stack.append(struct.unpack_from(">i", blob, i + 1)[0])
                i += 5
            elif b0 == 30:  # real
                i += 1
                s = ""
                done = False
                while i < len(blob) and not done:
                    for nib in (blob[i] >> 4, blob[i] & 15):
                        if nib <= 9:
                            s += str(nib)
                        elif nib == 10:
                            s += "."
                        elif nib == 11:
                            s += "E"
                        elif nib == 12:
                            s += "E-"
                        elif nib == 14:
                            s += "-"
                        elif nib == 15:
                            done = True
                            break
                    i += 1
                try:
                    stack.append(float(s or "0"))
                except ValueError:
                    stack.append(0.0)
            elif 32 <= b0 <= 246:
                stack.append(b0 - 139)
                i += 1
            elif 247 <= b0 <= 250:
                stack.append((b0 - 247) * 256 + blob[i + 1] + 108)
                i += 2
            elif 251 <= b0 <= 254:
                stack.append(-(b0 - 251) * 256 - blob[i + 1] - 108)
                i += 2
            else:
                i += 1
        return out

    @staticmethod
    def _bias(subrs):
        n = len(subrs)
        return 107 if n < 1240 else (1131 if n < 33900 else 32768)

    def outline(self, gid: int):
        """-> list of flattened contours (font units)."""
        if gid < 0 or gid >= len(self.charstrings):
            raise OutlineError("gid_out_of_range")
        contours = []
        cur = []
        st: list[float] = []
        x = y = 0.0
        nstems = 0
        width_parsed = False

        def moveto(nx, ny):
            nonlocal cur
            if len(cur) >= 3:
                contours.append(cur)
            cur = [(nx, ny)]

        def lineto(nx, ny):
            cur.append((nx, ny))

        def curveto(x1, y1, x2, y2, x3, y3):
            nonlocal cur
            if not cur:
                cur = [(x, y)]
            cur.extend(flatten_cubic(cur[-1], (x1, y1), (x2, y2), (x3, y3)))

        def run(code: bytes, depth: int):
            nonlocal st, x, y, nstems, width_parsed
            if depth > 10:
                raise OutlineError("subr_too_deep")
            i = 0
            n = len(code)
            while i < n:
                b0 = code[i]
                if b0 >= 32 or b0 == 28:
                    if b0 == 28:
                        st.append(struct.unpack_from(">h", code, i + 1)[0])
                        i += 3
                    elif b0 <= 246:
                        st.append(b0 - 139)
                        i += 1
                    elif b0 <= 250:
                        st.append((b0 - 247) * 256 + code[i + 1] + 108)
                        i += 2
                    elif b0 <= 254:
                        st.append(-(b0 - 251) * 256 - code[i + 1] - 108)
                        i += 2
                    else:  # 255: 16.16 fixed
                        st.append(
                            struct.unpack_from(">i", code, i + 1)[0] / 65536.0
                        )
                        i += 5
                    continue
                i += 1
                if b0 in (1, 3, 18, 23):  # h/vstem(hm)
                    if not width_parsed and len(st) % 2 == 1:
                        st.pop(0)
                    width_parsed = True
                    nstems += len(st) // 2
                    st = []
                elif b0 in (19, 20):  # hintmask / cntrmask
                    if not width_parsed and len(st) % 2 == 1:
                        st.pop(0)
                    width_parsed = True
                    nstems += len(st) // 2
                    st = []
                    i += (nstems + 7) // 8
                elif b0 == 21:  # rmoveto
                    if not width_parsed and len(st) == 3:
                        st.pop(0)
                    width_parsed = True
                    x += st[-2]
                    y += st[-1]
                    moveto(x, y)
                    st = []
                elif b0 == 22:  # hmoveto
                    if not width_parsed and len(st) == 2:
                        st.pop(0)
                    width_parsed = True
                    x += st[-1]
                    moveto(x, y)
                    st = []
                elif b0 == 4:  # vmoveto
                    if not width_parsed and len(st) == 2:
                        st.pop(0)
                    width_parsed = True
                    y += st[-1]
                    moveto(x, y)
                    st = []
                elif b0 == 5:  # rlineto
                    for j in range(0, len(st) - 1, 2):
                        x += st[j]
                        y += st[j + 1]
                        lineto(x, y)
                    st = []
                elif b0 in (6, 7):  # hlineto / vlineto
                    horiz = b0 == 6
                    for v in st:
                        if horiz:
                            x += v
                        else:
                            y += v
                        lineto(x, y)
                        horiz = not horiz
                    st = []
                elif b0 == 8:  # rrcurveto
                    for j in range(0, len(st) - 5, 6):
                        x1, y1 = x + st[j], y + st[j + 1]
                        x2, y2 = x1 + st[j + 2], y1 + st[j + 3]
                        x, y = x2 + st[j + 4], y2 + st[j + 5]
                        curveto(x1, y1, x2, y2, x, y)
                    st = []
                elif b0 == 24:  # rcurveline
                    j = 0
                    while len(st) - j >= 8:
                        x1, y1 = x + st[j], y + st[j + 1]
                        x2, y2 = x1 + st[j + 2], y1 + st[j + 3]
                        x, y = x2 + st[j + 4], y2 + st[j + 5]
                        curveto(x1, y1, x2, y2, x, y)
                        j += 6
                    x += st[j]
                    y += st[j + 1]
                    lineto(x, y)
                    st = []
                elif b0 == 25:  # rlinecurve
                    j = 0
                    while len(st) - j >= 8:
                        x += st[j]
                        y += st[j + 1]
                        lineto(x, y)
                        j += 2
                    x1, y1 = x + st[j], y + st[j + 1]
                    x2, y2 = x1 + st[j + 2], y1 + st[j + 3]
                    x, y = x2 + st[j + 4], y2 + st[j + 5]
                    curveto(x1, y1, x2, y2, x, y)
                    st = []
                elif b0 in (26, 27):  # vvcurveto / hhcurveto
                    j = 0
                    d1 = 0.0
                    if len(st) % 4 == 1:
                        d1 = st[0]
                        j = 1
                    while j + 3 < len(st):
                        if b0 == 26:
                            x1, y1 = x + d1, y + st[j]
                            x2, y2 = x1 + st[j + 1], y1 + st[j + 2]
                            x, y = x2, y2 + st[j + 3]
                        else:
                            x1, y1 = x + st[j], y + d1
                            x2, y2 = x1 + st[j + 1], y1 + st[j + 2]
                            x, y = x2 + st[j + 3], y2
                        curveto(x1, y1, x2, y2, x, y)
                        d1 = 0.0
                        j += 4
                    st = []
                elif b0 in (30, 31):  # vhcurveto / hvcurveto
                    horiz = b0 == 31
                    j = 0
                    while j + 3 < len(st):
                        last = j + 8 > len(st)
                        extra = st[j + 4] if (last and j + 4 < len(st)) else 0.0
                        if horiz:
                            x1, y1 = x + st[j], y
                            x2, y2 = x1 + st[j + 1], y1 + st[j + 2]
                            x, y = x2 + (extra if last else 0.0), y2 + st[j + 3]
                        else:
                            x1, y1 = x, y + st[j]
                            x2, y2 = x1 + st[j + 1], y1 + st[j + 2]
                            x, y = x2 + st[j + 3], y2 + (extra if last else 0.0)
                        curveto(x1, y1, x2, y2, x, y)
                        horiz = not horiz
                        j += 4
                    st = []
                elif b0 == 10:  # callsubr
                    idx = int(st.pop()) + self._bias(self.lsubrs)
                    if 0 <= idx < len(self.lsubrs):
                        run(self.lsubrs[idx], depth + 1)
                elif b0 == 29:  # callgsubr
                    idx = int(st.pop()) + self._bias(self.gsubrs)
                    if 0 <= idx < len(self.gsubrs):
                        run(self.gsubrs[idx], depth + 1)
                elif b0 == 11:  # return
                    return
                elif b0 == 14:  # endchar
                    if not width_parsed and len(st) in (1, 5):
                        st.pop(0)
                    width_parsed = True
                    st = []
                    return
                elif b0 == 12:  # escape ops: the four flex variants
                    # draw their two cubics (Type2 spec 4.2); other
                    # escapes (arith/logic) just clear the stack
                    b1 = code[i] if i < n else 255
                    i += 1
                    if b1 == 35 and len(st) >= 13:  # flex
                        x1, y1 = x + st[0], y + st[1]
                        x2, y2 = x1 + st[2], y1 + st[3]
                        x3, y3 = x2 + st[4], y2 + st[5]
                        curveto(x1, y1, x2, y2, x3, y3)
                        x4, y4 = x3 + st[6], y3 + st[7]
                        x5, y5 = x4 + st[8], y4 + st[9]
                        x, y = x5 + st[10], y5 + st[11]
                        curveto(x4, y4, x5, y5, x, y)
                    elif b1 == 34 and len(st) >= 7:  # hflex
                        y0f = y
                        x1, y1 = x + st[0], y
                        x2, y2 = x1 + st[1], y1 + st[2]
                        x3, y3 = x2 + st[3], y2
                        curveto(x1, y1, x2, y2, x3, y3)
                        x4, y4 = x3 + st[4], y2
                        x5, y5 = x4 + st[5], y0f
                        x, y = x5 + st[6], y0f
                        curveto(x4, y4, x5, y5, x, y)
                    elif b1 == 36 and len(st) >= 9:  # hflex1
                        y0f = y
                        x1, y1 = x + st[0], y + st[1]
                        x2, y2 = x1 + st[2], y1 + st[3]
                        x3, y3 = x2 + st[4], y2
                        curveto(x1, y1, x2, y2, x3, y3)
                        x4, y4 = x3 + st[5], y2
                        x5, y5 = x4 + st[6], y4 + st[7]
                        x, y = x5 + st[8], y0f
                        curveto(x4, y4, x5, y5, x, y)
                    elif b1 == 37 and len(st) >= 11:  # flex1
                        x0f, y0f = x, y
                        dx = st[0] + st[2] + st[4] + st[6] + st[8]
                        dy = st[1] + st[3] + st[5] + st[7] + st[9]
                        x1, y1 = x + st[0], y + st[1]
                        x2, y2 = x1 + st[2], y1 + st[3]
                        x3, y3 = x2 + st[4], y2 + st[5]
                        curveto(x1, y1, x2, y2, x3, y3)
                        x4, y4 = x3 + st[6], y3 + st[7]
                        x5, y5 = x4 + st[8], y4 + st[9]
                        if abs(dx) > abs(dy):
                            x, y = x5 + st[10], y0f
                        else:
                            x, y = x0f, y5 + st[10]
                        curveto(x4, y4, x5, y5, x, y)
                    st = []
                else:
                    st = []

        run(self.charstrings[gid], 0)
        if len(cur) >= 3:
            contours.append(cur)
        return contours


# --- Type1 (FontFile) charstrings -------------------------------------------


def _t1_decrypt(data: bytes, r: int, skip: int) -> bytes:
    """Adobe Type1 eexec/charstring decryption (r=55665 program,
    r=4330 per-charstring), first `skip` plaintext bytes dropped."""
    c1, c2 = 52845, 22719
    out = bytearray()
    for b in data:
        out.append(b ^ (r >> 8))
        r = ((b + r) * c1 + c2) & 0xFFFF
    return bytes(out[skip:])


class Type1Outlines:
    """Type1 font program -> glyph outlines by NAME. Parses the eexec-
    encrypted private section (lenIV, /Subrs, /CharStrings, RD/-| ND/|-
    token forms) and interprets Type1 charstrings (hsbw, h/v/r moveto/
    lineto/curveto, closepath, callsubr without bias, div, flex via
    othersubrs 0/1/2, seac composition deliberately unsupported ->
    OutlineError)."""

    def __init__(self, data: bytes):
        ee = data.find(b"eexec")
        if ee < 0:
            raise OutlineError("t1_no_eexec")
        p = ee + 5
        while p < len(data) and data[p] in b"\r\n \t":
            p += 1
        enc = data[p:]
        # PFA hex form: first 4 bytes all hex digits and mostly ASCII
        head = enc[:4]
        if all(chr(c) in "0123456789abcdefABCDEF" for c in head):
            import re as _re

            hexbody = _re.sub(rb"[^0-9a-fA-F]", b"", enc)
            enc = bytes.fromhex(
                hexbody[: len(hexbody) // 2 * 2].decode("ascii")
            )
        priv = _t1_decrypt(enc, 55665, 4)
        m = None
        import re

        mlen = re.search(rb"/lenIV\s+(\d+)", priv)
        self.len_iv = int(mlen.group(1)) if mlen else 4
        self.subrs: list[bytes] = []
        ms = re.search(rb"/Subrs\s+(\d+)", priv)
        if ms:
            pos = ms.end()
            for _ in range(int(ms.group(1))):
                md = re.compile(
                    rb"dup\s+(\d+)\s+(\d+)\s+(RD|-\|)[ ]"
                ).search(priv, pos)
                if not md:
                    break
                idx, ln = int(md.group(1)), int(md.group(2))
                start = md.end()
                while len(self.subrs) <= idx:
                    self.subrs.append(b"")
                self.subrs[idx] = _t1_decrypt(
                    priv[start : start + ln], 4330, self.len_iv
                )
                pos = start + ln
        self.charstrings: dict[str, bytes] = {}
        mc = re.search(rb"/CharStrings\s+(\d+)", priv)
        if not mc:
            raise OutlineError("t1_no_charstrings")
        pos = mc.end()
        pat = re.compile(rb"/([^\s/{}()\[\]]+)\s+(\d+)\s+(RD|-\|)[ ]")
        while True:
            md = pat.search(priv, pos)
            if not md:
                break
            name = md.group(1).decode("latin-1")
            ln = int(md.group(2))
            start = md.end()
            self.charstrings[name] = _t1_decrypt(
                priv[start : start + ln], 4330, self.len_iv
            )
            pos = start + ln

    def outline(self, name: str):
        code = self.charstrings.get(name)
        if code is None:
            raise OutlineError("t1_glyph_missing")
        contours: list = []
        cur: list = []
        st: list[float] = []
        ps_stack: list[float] = []
        x = y = 0.0
        flex_pts: list | None = None

        def moveto(nx, ny):
            nonlocal cur
            if len(cur) >= 3:
                contours.append(cur)
            cur = [(nx, ny)]

        def closep():
            nonlocal cur
            if len(cur) >= 3:
                contours.append(cur)
            cur = []

        def curveto(x1, y1, x2, y2, x3, y3):
            nonlocal cur
            if not cur:
                cur = [(x, y)]
            cur.extend(flatten_cubic(cur[-1], (x1, y1), (x2, y2), (x3, y3)))

        def run(cs: bytes, depth: int):
            nonlocal st, x, y, flex_pts, cur
            if depth > 10:
                raise OutlineError("t1_subr_too_deep")
            i = 0
            n = len(cs)
            while i < n:
                b0 = cs[i]
                if b0 >= 32:
                    if b0 <= 246:
                        st.append(b0 - 139)
                        i += 1
                    elif b0 <= 250:
                        st.append((b0 - 247) * 256 + cs[i + 1] + 108)
                        i += 2
                    elif b0 <= 254:
                        st.append(-(b0 - 251) * 256 - cs[i + 1] - 108)
                        i += 2
                    else:
                        st.append(struct.unpack_from(">i", cs, i + 1)[0])
                        i += 5
                    continue
                i += 1
                if b0 == 13:  # hsbw: sbx wx
                    if st:
                        x = st[0]
                        y = 0.0
                    st = []
                elif b0 == 9:  # closepath
                    closep()
                    st = []
                elif b0 in (1, 3):  # h/vstem
                    st = []
                elif b0 == 21:  # rmoveto
                    if len(st) >= 2:
                        x += st[-2]
                        y += st[-1]
                        if flex_pts is not None:
                            flex_pts.append((x, y))
                        else:
                            moveto(x, y)
                    st = []
                elif b0 == 22:  # hmoveto
                    if st:
                        x += st[-1]
                        if flex_pts is not None:
                            flex_pts.append((x, y))
                        else:
                            moveto(x, y)
                    st = []
                elif b0 == 4:  # vmoveto
                    if st:
                        y += st[-1]
                        if flex_pts is not None:
                            flex_pts.append((x, y))
                        else:
                            moveto(x, y)
                    st = []
                elif b0 == 5:  # rlineto
                    if len(st) >= 2:
                        x += st[-2]
                        y += st[-1]
                        cur.append((x, y))
                    st = []
                elif b0 == 6:  # hlineto
                    if st:
                        x += st[-1]
                        cur.append((x, y))
                    st = []
                elif b0 == 7:  # vlineto
                    if st:
                        y += st[-1]
                        cur.append((x, y))
                    st = []
                elif b0 == 8:  # rrcurveto
                    if len(st) >= 6:
                        x1, y1 = x + st[-6], y + st[-5]
                        x2, y2 = x1 + st[-4], y1 + st[-3]
                        x, y = x2 + st[-2], y2 + st[-1]
                        curveto(x1, y1, x2, y2, x, y)
                    st = []
                elif b0 == 30:  # vhcurveto
                    if len(st) >= 4:
                        x1, y1 = x, y + st[-4]
                        x2, y2 = x1 + st[-3], y1 + st[-2]
                        x, y = x2 + st[-1], y2
                        curveto(x1, y1, x2, y2, x, y)
                    st = []
                elif b0 == 31:  # hvcurveto
                    if len(st) >= 4:
                        x1, y1 = x + st[-4], y
                        x2, y2 = x1 + st[-3], y1 + st[-2]
                        x, y = x2, y2 + st[-1]
                        curveto(x1, y1, x2, y2, x, y)
                    st = []
                elif b0 == 10:  # callsubr (no bias)
                    if st:
                        idx = int(st.pop())
                        if 0 <= idx < len(self.subrs):
                            run(self.subrs[idx], depth + 1)
                elif b0 == 11:
                    return
                elif b0 == 14:  # endchar
                    closep()
                    return
                elif b0 == 12:
                    b1 = cs[i]
                    i += 1
                    if b1 == 12:  # div
                        if len(st) >= 2:
                            bdiv = st.pop()
                            adiv = st.pop()
                            st.append(adiv / bdiv if bdiv else 0.0)
                    elif b1 == 16:  # callothersubr
                        if len(st) >= 2:
                            oidx = int(st.pop())
                            cnt = int(st.pop())
                            args = st[-cnt:] if cnt else []
                            del st[len(st) - cnt :]
                            if oidx == 1:  # flex start
                                flex_pts = []
                            elif oidx == 0:  # flex end: 7 pts collected
                                pts = flex_pts or []
                                flex_pts = None
                                if len(pts) >= 7:
                                    curveto(*pts[1], *pts[2], *pts[3])
                                    x, y = pts[6]
                                    curveto(*pts[4], *pts[5], *pts[6])
                                ps_stack.extend(args[-2:])
                            elif oidx == 3:
                                ps_stack.append(3.0)
                            else:
                                ps_stack.extend(args)
                    elif b1 == 17:  # pop
                        st.append(ps_stack.pop() if ps_stack else 0.0)
                    elif b1 == 6:  # seac: accent composition unsupported
                        raise OutlineError("t1_seac")
                    elif b1 == 7:  # sbw
                        if len(st) >= 4:
                            x, y = st[0], st[1]
                        st = []
                    elif b1 == 33:  # setcurrentpoint
                        if len(st) >= 2:
                            x, y = st[-2], st[-1]
                        st = []
                    else:
                        st = []
                else:
                    st = []

        run(code, 0)
        if len(cur) >= 3:
            contours.append(cur)
        return contours
