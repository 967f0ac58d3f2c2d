"""Text device: glyph runs -> spans -> serialized page text.

Faithful reimplementation of src/vcl/dev_textss.pas (fz_text_extract_span,
fz_add_text_char) and fz_span_to_wchar
(src/vcl/base_object_functions.pas:2687-2747):

- pen starts at (-1,-1); first glyph never triggers space/newline
- newline when pen jump dist > size*0.9  (LINE_DIST)
- space when |dot| > 0.95 and dist > size*0.2 (SPACE_DIST) and the span's
  last char isn't already a space
- span breaks on (font, size, wmode) change unless the char is a space
- ligature expansion at add-char time: FB00->'ff', FB01->'ff' (the
  reference's copy-paste quirk — NOT 'fi'), FB02->'fl', FB03->'ffi',
  FB04->'ffl', FB05->'st', FB06->'st'; ucs==-1 fillers are dropped
- serialization: chars < 32 fold to '?'; CRLF when span.eol or at the very
  last span; the final span always gets eol=1 (fz_text_free_user)
"""

from __future__ import annotations

import math

LINE_DIST = 0.9
SPACE_DIST = 0.2

_LIGATURES = {
    0xFB00: "ff",
    0xFB01: "ff",  # reference quirk: fi expands to 'ff' (dev_textss.pas:104-108)
    0xFB02: "fl",
    0xFB03: "ffi",
    0xFB04: "ffl",
    0xFB05: "st",
    0xFB06: "st",
}


class Span:
    __slots__ = ("font", "size", "wmode", "chars", "eol")

    def __init__(self):
        self.font = None
        self.size = 0.0
        self.wmode = 0
        self.chars: list[int] = []
        self.eol = 0


class TextRun:
    """fz_text_s: glyphs batched while font/trm/wmode/render unchanged."""

    __slots__ = ("font", "trm", "wmode", "items")

    def __init__(self, font, trm, wmode):
        self.font = font
        self.trm = trm  # (a,b,c,d,e,f); e,f zeroed by the interpreter
        self.wmode = wmode
        self.items: list[tuple[int, int, float, float]] = []  # gid,ucs,x,y

    def add(self, gid: int, ucs: int, x: float, y: float):
        self.items.append((gid, ucs, x, y))


def _concat(m1, m2):
    a1, b1, c1, d1, e1, f1 = m1
    a2, b2, c2, d2, e2, f2 = m2
    return (
        a1 * a2 + b1 * c2,
        a1 * b2 + b1 * d2,
        c1 * a2 + d1 * c2,
        c1 * b2 + d1 * d2,
        e1 * a2 + f1 * c2 + e2,
        e1 * b2 + f1 * d2 + f2,
    )


class TextDevice:
    def __init__(self):
        root = Span()
        self.spans: list[Span] = [root]
        self.pen_x = -1.0
        self.pen_y = -1.0

    # --- device hooks (fill/stroke/clip/ignore all extract) -----------------
    def text(self, run: TextRun, ctm):
        self._extract_span(run, ctm)

    def _add_char(self, font, size, wmode, c: int, ligature_ok=True):
        """fz_add_text_char."""
        span = self.spans[-1]
        if span.font is None:
            span.font = font
            span.size = size
        if (
            (span.font is not font or span.size != size or span.wmode != wmode)
            and c != 32
        ):
            span = Span()
            span.font = font
            span.size = size
            span.wmode = wmode
            self.spans.append(span)
        if c == -1:
            return
        lig = _LIGATURES.get(c)
        if lig is not None:
            span.chars.extend(ord(ch) for ch in lig)
        else:
            span.chars.append(c)

    def _add_newline(self, font, size, wmode):
        self.spans[-1].eol = 1
        span = Span()
        span.font = font
        span.size = size
        span.wmode = wmode
        self.spans.append(span)

    def _extract_span(self, run: TextRun, ctm):
        if not run.items:
            return
        font = run.font
        tm = run.trm
        if run.wmode == 0:
            dirv = (1.0, 0.0)
        else:
            dirv = (0.0, 1.0)
        tm0 = (tm[0], tm[1], tm[2], tm[3], 0.0, 0.0)
        trm = _concat(tm0, ctm)
        dx = dirv[0] * trm[0] + dirv[1] * trm[2]
        dy = dirv[0] * trm[1] + dirv[1] * trm[3]
        dist = math.sqrt(dx * dx + dy * dy)
        ndir = (dx / dist, dy / dist) if dist else (1.0, 0.0)
        size = math.sqrt(abs(trm[0] * trm[3] - trm[1] * trm[2]))

        for gid, ucs, x, y in run.items:
            if gid < 0:
                # filler glyph of a one-to-many mapping: same position
                self._add_char(font, size, run.wmode, ucs)
                continue
            trm_i = _concat((tm0[0], tm0[1], tm0[2], tm0[3], x, y), ctm)
            ex, ey = trm_i[4], trm_i[5]
            if self.pen_x == -1.0 and self.pen_y == -1.0:
                delta_x = delta_y = 0.0
            else:
                delta_x = self.pen_x - ex
                delta_y = self.pen_y - ey
            pdist = math.sqrt(delta_x * delta_x + delta_y * delta_y)
            if pdist > 0:
                ndx = delta_x / pdist
                ndy = delta_y / pdist
                dot = ndx * ndir[0] + ndy * ndir[1]
                if pdist > size * LINE_DIST:
                    self._add_newline(font, size, run.wmode)
                elif abs(dot) > 0.95 and pdist > size * SPACE_DIST:
                    span = self.spans[-1]
                    if span.chars and span.chars[-1] != 32:
                        self._add_char(font, size, run.wmode, 32)
            adv = font.pen_advance(gid)
            self.pen_x = ex + dx * adv
            self.pen_y = ey + dy * adv
            self._add_char(font, size, run.wmode, ucs)

    # --- serialization -------------------------------------------------------
    def close(self):
        """fz_text_free_user: final span gets eol."""
        self.spans[-1].eol = 1

    def to_text(self) -> str:
        """fz_span_to_wchar with CRLF separator."""
        out: list[str] = []
        n = len(self.spans)
        for i, span in enumerate(self.spans):
            for c in span.chars:
                if c < 32:
                    out.append("?")
                else:
                    try:
                        out.append(chr(c))
                    except ValueError:
                        out.append("?")
            if span.eol == 0 and i + 1 < n:
                continue
            out.append("\r\n")
        return "".join(out)
