"""Built-in fallback outline face for fonts without an embedded program.

The reference substitutes a bundled base-14 FreeType face when a font
carries no FontFile (src/vcl/pdf_fontfiless.pas base-14 name match +
src/vcl/fz_freetypes.pas load); shipping licensed font binaries is not
an option here, so this module defines a from-scratch synthetic sans:
every printable-ASCII glyph is a hand-authored stroke SKELETON on a
1000-unit em (baseline 0, cap height 700, x-height 500, descender
-200), inflated to filled closed contours by the raster module's
stroke_outline (round caps/joins, 80-unit pen). Coverage extends to
the full Latin-1 letter block plus common webtext punctuation and
currency: accented letters compose via NFD decomposition (base
skeleton + combining-mark skeleton seated at cap/x-height), and the
non-decomposable stragglers (AE/ae, Eth/eth, Thorn/thorn, o-slash,
sharp-s) plus curly quotes, dashes, ellipsis, guillemets and
cent/pound/yen/euro are hand-authored. The goal is legible,
metrically-plausible rendering for unembedded text — NOT a metric or
shape match of Helvetica/Times; the raster device records
`raster_fallback_font` whenever these outlines paint so downstream
users can tell synthetic pages from embedded-font pages.

Glyph advance widths still come from the PDF's /Widths (or the AFM
tables in base14.py) exactly as in text extraction; only the painted
shape is synthetic.
"""

from __future__ import annotations

import math

_PEN = 80.0  # skeleton stroke width in em units


def _arc(cx, cy, r, a0, a1, n=12, ry=None):
    """Polyline approximation of an elliptical arc, degrees, CCW when
    a1 > a0."""
    ry = r if ry is None else ry
    pts = []
    for i in range(n + 1):
        t = math.radians(a0 + (a1 - a0) * i / n)
        pts.append((cx + r * math.cos(t), cy + ry * math.sin(t)))
    return pts


def _circle(cx, cy, r, ry=None, n=20):
    return _arc(cx, cy, r, 0, 360, n=n, ry=ry)


def _dot(x, y):
    # zero-ish segment: round caps turn it into a disc
    return [(x, y - 1), (x, y + 1)]


def _skeletons():
    """codepoint -> list of polyline strokes (em units, y up)."""
    g = {}
    g[ord(" ")] = []
    g[ord("!")] = [[(300, 700), (300, 220)], _dot(300, 40)]
    g[ord('"')] = [[(230, 700), (230, 560)], [(370, 700), (370, 560)]]
    g[ord("#")] = [
        [(250, 620), (210, 80)],
        [(390, 620), (350, 80)],
        [(130, 450), (490, 450)],
        [(110, 250), (470, 250)],
    ]
    g[ord("$")] = [
        _arc(310, 500, 170, 45, 270) + _arc(290, 170, 170, 90, -130),
        [(300, 770), (300, -70)],
    ]
    g[ord("%")] = [
        _circle(170, 560, 100),
        _circle(430, 140, 100),
        [(510, 700), (90, 0)],
    ]
    g[ord("&")] = [
        _circle(300, 560, 115),
        [(385, 480), (480, 360)],
        _arc(280, 170, 170, 60, 300) + [(500, 230)],
        [(198, 316), (370, 90)],
    ]
    g[ord("'")] = [[(300, 700), (300, 560)]]
    g[ord("(")] = [_arc(430, 260, 180, 90, 270, n=16, ry=470)]
    g[ord(")")] = [_arc(170, 260, 180, 90, -90, n=16, ry=470)]
    g[ord("*")] = [
        [(300, 650), (300, 370)],
        [(180, 580), (420, 440)],
        [(180, 440), (420, 580)],
    ]
    g[ord("+")] = [[(300, 480), (300, 120)], [(120, 300), (480, 300)]]
    g[ord(",")] = [[(310, 70), (250, -110)]]
    g[ord("-")] = [[(140, 300), (460, 300)]]
    g[ord(".")] = [_dot(300, 50)]
    g[ord("/")] = [[(460, 760), (140, -60)]]
    g[ord("0")] = [_circle(300, 350, 220, ry=350, n=24)]
    g[ord("1")] = [[(180, 540), (330, 700), (330, 0)], [(180, 0), (470, 0)]]
    g[ord("2")] = [
        _arc(300, 510, 195, 170, 10) + [(495, 480), (105, 0), (505, 0)]
    ]
    g[ord("3")] = [
        _arc(285, 525, 172, 165, -90) + _arc(285, 178, 172, 90, -165)
    ]
    g[ord("4")] = [[(420, 700), (120, 210), (540, 210)], [(420, 440), (420, 0)]]
    g[ord("5")] = [
        [(470, 700), (150, 700), (143, 420)]
        + _arc(285, 225, 215, 115, -140)
    ]
    g[ord("6")] = [
        [(430, 700), (255, 450), (140, 250)],
        _circle(300, 200, 195, n=24),
    ]
    g[ord("7")] = [[(110, 700), (490, 700), (230, 0)]]
    g[ord("8")] = [
        _circle(300, 525, 168, n=18),
        _circle(300, 178, 182, n=18),
    ]
    g[ord("9")] = [
        _circle(300, 500, 195, n=24),
        [(460, 440), (345, 195), (175, 0)],
    ]
    g[ord(":")] = [_dot(300, 380), _dot(300, 70)]
    g[ord(";")] = [_dot(300, 380), [(310, 70), (250, -110)]]
    g[ord("<")] = [[(460, 560), (140, 300), (460, 40)]]
    g[ord("=")] = [[(140, 390), (460, 390)], [(140, 210), (460, 210)]]
    g[ord(">")] = [[(140, 560), (460, 300), (140, 40)]]
    g[ord("?")] = [
        _arc(300, 520, 180, 180, -55) + [(300, 290), (300, 190)],
        _dot(300, 40),
    ]
    g[ord("@")] = [
        _arc(300, 320, 280, 20, 340, n=24),
        _circle(320, 320, 115),
        [(435, 320), (445, 210)],
    ]
    g[ord("A")] = [[(80, 0), (300, 700), (520, 0)], [(175, 240), (425, 240)]]
    g[ord("B")] = [
        [(140, 0), (140, 700)],
        [(140, 700), (330, 700)] + _arc(330, 525, 175, 90, -90) + [(140, 350)],
        [(140, 350), (350, 350)] + _arc(350, 175, 175, 90, -90) + [(140, 0)],
    ]
    g[ord("C")] = [_arc(320, 350, 230, 55, 305, n=18, ry=350)]
    g[ord("D")] = [
        [(140, 0), (140, 700)],
        [(140, 700), (280, 700)]
        + _arc(280, 350, 240, 90, -90, n=16, ry=350)
        + [(140, 0)],
    ]
    g[ord("E")] = [
        [(500, 700), (140, 700), (140, 0), (500, 0)],
        [(140, 360), (440, 360)],
    ]
    g[ord("F")] = [
        [(500, 700), (140, 700), (140, 0)],
        [(140, 370), (430, 370)],
    ]
    g[ord("G")] = [
        _arc(320, 350, 230, 55, 300, n=18, ry=350) + [(530, 115), (530, 300)],
        [(530, 300), (340, 300)],
    ]
    g[ord("H")] = [
        [(140, 0), (140, 700)],
        [(460, 0), (460, 700)],
        [(140, 350), (460, 350)],
    ]
    g[ord("I")] = [
        [(300, 0), (300, 700)],
        [(190, 700), (410, 700)],
        [(190, 0), (410, 0)],
    ]
    g[ord("J")] = [[(460, 700)] + _arc(300, 180, 160, 0, -180)]
    g[ord("K")] = [
        [(140, 0), (140, 700)],
        [(470, 700), (140, 280)],
        [(262, 385), (490, 0)],
    ]
    g[ord("L")] = [[(140, 700), (140, 0), (490, 0)]]
    g[ord("M")] = [[(110, 0), (110, 700), (300, 230), (490, 700), (490, 0)]]
    g[ord("N")] = [[(140, 0), (140, 700), (460, 0), (460, 700)]]
    g[ord("O")] = [_circle(300, 350, 235, ry=350, n=24)]
    g[ord("P")] = [
        [(140, 0), (140, 700)],
        [(140, 700), (330, 700)] + _arc(330, 512, 188, 90, -90) + [(140, 325)],
    ]
    g[ord("Q")] = [
        _circle(300, 350, 235, ry=350, n=24),
        [(360, 170), (520, -50)],
    ]
    g[ord("R")] = [
        [(140, 0), (140, 700)],
        [(140, 700), (330, 700)] + _arc(330, 512, 188, 90, -90) + [(140, 325)],
        [(310, 325), (500, 0)],
    ]
    g[ord("S")] = [
        _arc(310, 520, 178, 45, 268, n=14)
        + _arc(292, 172, 178, 88, -135, n=14)
    ]
    g[ord("T")] = [[(100, 700), (500, 700)], [(300, 700), (300, 0)]]
    g[ord("U")] = [
        [(140, 700)] + _arc(300, 190, 160, 180, 360) + [(460, 700)]
    ]
    g[ord("V")] = [[(100, 700), (300, 0), (500, 700)]]
    g[ord("W")] = [
        [(75, 700), (185, 0), (300, 450), (415, 0), (525, 700)]
    ]
    g[ord("X")] = [[(120, 700), (480, 0)], [(480, 700), (120, 0)]]
    g[ord("Y")] = [
        [(115, 700), (300, 330)],
        [(485, 700), (300, 330)],
        [(300, 330), (300, 0)],
    ]
    g[ord("Z")] = [[(120, 700), (480, 700), (120, 0), (480, 0)]]
    g[ord("[")] = [[(390, 760), (245, 760), (245, -140), (390, -140)]]
    g[ord("\\")] = [[(140, 760), (460, -60)]]
    g[ord("]")] = [[(210, 760), (355, 760), (355, -140), (210, -140)]]
    g[ord("^")] = [[(155, 440), (300, 700), (445, 440)]]
    g[ord("_")] = [[(70, -120), (530, -120)]]
    g[ord("`")] = [[(255, 700), (345, 555)]]
    g[ord("a")] = [
        _circle(275, 250, 175, ry=240, n=18),
        [(450, 500), (450, 0)],
    ]
    g[ord("b")] = [
        [(140, 700), (140, 0)],
        _circle(322, 250, 178, ry=240, n=18),
    ]
    g[ord("c")] = [_arc(300, 250, 185, 50, 310, n=16, ry=245)]
    g[ord("d")] = [
        [(460, 700), (460, 0)],
        _circle(278, 250, 178, ry=240, n=18),
    ]
    g[ord("e")] = [
        [(115, 255), (480, 255)] + _arc(298, 250, 182, 2, 305, n=16, ry=245)
    ]
    g[ord("f")] = [
        _arc(405, 545, 160, 90, 180) + [(245, 0)],
        [(140, 500), (400, 500)],
    ]
    g[ord("g")] = [
        _circle(285, 260, 172, ry=235, n=18),
        [(455, 500), (455, -45)] + _arc(312, -45, 143, 0, -180),
    ]
    g[ord("h")] = [
        [(140, 700), (140, 0)],
        _arc(300, 340, 160, 180, 0) + [(460, 0)],
    ]
    g[ord("i")] = [[(300, 500), (300, 0)], _dot(300, 630)]
    g[ord("j")] = [
        [(360, 500), (360, -55)] + _arc(238, -55, 122, 0, -180),
        _dot(360, 630),
    ]
    g[ord("k")] = [
        [(150, 700), (150, 0)],
        [(430, 500), (150, 195)],
        [(248, 302), (455, 0)],
    ]
    g[ord("l")] = [[(300, 700), (300, 0)]]
    g[ord("m")] = [
        [(115, 500), (115, 0)],
        _arc(209, 406, 94, 180, 0) + [(303, 0)],
        _arc(397, 406, 94, 180, 0) + [(491, 0)],
    ]
    g[ord("n")] = [
        [(140, 500), (140, 0)],
        _arc(300, 340, 160, 180, 0) + [(460, 0)],
    ]
    g[ord("o")] = [_circle(300, 250, 190, ry=245, n=20)]
    g[ord("p")] = [
        [(140, 500), (140, -200)],
        _circle(322, 250, 178, ry=240, n=18),
    ]
    g[ord("q")] = [
        [(460, 500), (460, -200)],
        _circle(278, 250, 178, ry=240, n=18),
    ]
    g[ord("r")] = [
        [(165, 500), (165, 0)],
        _arc(305, 358, 142, 180, 25),
    ]
    g[ord("s")] = [
        _arc(308, 372, 126, 45, 268, n=12)
        + _arc(294, 126, 126, 88, -135, n=12)
    ]
    g[ord("t")] = [
        [(258, 660)] + _arc(378, 120, 120, 180, 295),
        [(140, 500), (405, 500)],
    ]
    g[ord("u")] = [
        [(140, 500)] + _arc(300, 162, 160, 180, 360) + [(460, 500), (460, 0)]
    ]
    g[ord("v")] = [[(120, 500), (300, 0), (480, 500)]]
    g[ord("w")] = [[(85, 500), (188, 0), (300, 330), (412, 0), (515, 500)]]
    g[ord("x")] = [[(140, 500), (460, 0)], [(460, 500), (140, 0)]]
    g[ord("y")] = [[(140, 500), (308, 60)], [(465, 500), (215, -200)]]
    g[ord("z")] = [[(140, 500), (460, 500), (140, 0), (460, 0)]]
    g[ord("{")] = [
        [
            (415, 760),
            (318, 705),
            (312, 430),
            (235, 300),
            (312, 170),
            (318, -105),
            (415, -160),
        ]
    ]
    g[ord("|")] = [[(300, 760), (300, -160)]]
    g[ord("}")] = [
        [
            (185, 760),
            (282, 705),
            (288, 430),
            (365, 300),
            (288, 170),
            (282, -105),
            (185, -160),
        ]
    ]
    g[ord("~")] = [
        [(115, 270), (185, 345), (265, 345), (335, 270), (415, 270), (485, 345)]
    ]
    # common non-ASCII punctuation (webtext frequency: quotes, dashes,
    # ellipsis, inverted marks, guillemets, degree/middle dot, multiply)
    g[0x2018] = [[(310, 700), (255, 555)]]  # ' (lean left)
    g[0x2019] = [[(255, 700), (310, 555)]]  # '
    g[0x201C] = [[(250, 700), (195, 555)], [(400, 700), (345, 555)]]  # "
    g[0x201D] = [[(195, 700), (250, 555)], [(345, 700), (400, 555)]]  # "
    g[0x2013] = [[(100, 300), (500, 300)]]  # en dash
    g[0x2014] = [[(40, 300), (560, 300)]]  # em dash
    g[0x2026] = [_dot(130, 50), _dot(300, 50), _dot(470, 50)]  # ...
    g[0xA1] = [[(300, 480), (300, 0)], _dot(300, 660)]  # inverted !
    g[0xBF] = [  # inverted ? (180-degree rotation of the ? construction)
        _arc(300, 180, 180, 0, 235) + [(300, 410), (300, 510)],
        _dot(300, 660),
    ]
    g[0xAB] = [  # left guillemet
        [(280, 480), (120, 300), (280, 120)],
        [(480, 480), (320, 300), (480, 120)],
    ]
    g[0xBB] = [
        [(120, 480), (280, 300), (120, 120)],
        [(320, 480), (480, 300), (320, 120)],
    ]
    g[0xB0] = [_circle(300, 600, 90)]  # degree
    g[0xB7] = [_dot(300, 300)]  # middle dot
    g[0xD7] = [[(160, 440), (440, 160)], [(440, 440), (160, 160)]]  # x
    g[0xF7] = [[(120, 300), (480, 300)], _dot(300, 450), _dot(300, 150)]
    g[0xA0] = []  # no-break space
    # manual non-decomposable letters
    g[0xF8] = g[ord("o")] + [[(150, 30), (450, 470)]]  # o-slash
    g[0xD8] = g[ord("O")] + [[(130, -30), (470, 730)]]  # O-slash
    g[0xDF] = [  # sharp s: stem + two right bowls
        [(150, 0), (150, 560)] + _arc(300, 560, 150, 180, 0),
        _arc(340, 400, 110, 90, -90),
        _arc(340, 170, 130, 70, -110),
    ]
    g[0xC6] = [  # AE ligature
        [(60, 0), (280, 700), (340, 700)],
        [(340, 700), (340, 0), (520, 0)],
        [(340, 700), (520, 700)],
        [(340, 380), (490, 380)],
        [(150, 240), (340, 240)],
    ]
    g[0xE6] = [  # ae ligature
        _circle(180, 250, 130, ry=235, n=16),
        [(310, 500), (310, 0)],
        [(310, 255), (540, 255)] + _arc(425, 250, 115, 0, 305, n=12, ry=240),
    ]
    g[0xD0] = g[ord("D")] + [[(60, 350), (260, 350)]]  # Eth
    g[0xF0] = [  # eth: bowl + leaning ascender + cross tick
        _circle(300, 210, 170, ry=205, n=18),
        [(440, 345), (330, 545), (190, 690)],
        [(215, 555), (430, 665)],
    ]
    g[0xDE] = [  # Thorn
        [(140, 0), (140, 700)],
        [(140, 560), (330, 560)] + _arc(330, 405, 155, 90, -90) + [(140, 250)],
    ]
    g[0xFE] = [  # thorn
        [(140, -200), (140, 700)],
        _circle(322, 250, 178, ry=240, n=18),
    ]
    g[0xA2] = [  # cent
        _arc(300, 250, 185, 50, 310, n=16, ry=245),
        [(300, 580), (300, -60)],
    ]
    g[0xA3] = [  # pound
        _arc(340, 540, 150, 30, 180, n=10) + [(190, 0)],
        [(110, 0), (490, 0)],
        [(110, 330), (390, 330)],
    ]
    g[0xA5] = [  # yen
        [(120, 700), (300, 380)],
        [(480, 700), (300, 380)],
        [(300, 380), (300, 0)],
        [(170, 320), (430, 320)],
        [(170, 200), (430, 200)],
    ]
    g[0x20AC] = [  # euro
        _arc(340, 350, 230, 55, 305, n=16, ry=350),
        [(80, 430), (430, 430)],
        [(80, 270), (430, 270)],
    ]
    return g


# combining-mark skeletons in a local frame: y=0 is the mark's seat
# (placed above the base glyph's cap/x-height, or at the baseline for
# cedilla/ogonek); x centered on 300
_MARKS = {
    0x300: lambda: [[(255, 150), (345, 30)]],  # grave
    0x301: lambda: [[(345, 150), (255, 30)]],  # acute
    0x302: lambda: [[(210, 30), (300, 140), (390, 30)]],  # circumflex
    0x303: lambda: [  # tilde
        [(190, 60), (250, 130), (350, 60), (410, 130)]
    ],
    0x304: lambda: [[(190, 80), (410, 80)]],  # macron
    0x306: lambda: [_arc(300, 140, 110, 200, 340)],  # breve
    0x307: lambda: [_dot(300, 90)],  # dot above
    0x308: lambda: [_dot(230, 90), _dot(370, 90)],  # dieresis
    0x30A: lambda: [_circle(300, 100, 65)],  # ring
    0x30C: lambda: [[(210, 140), (300, 30), (390, 140)]],  # caron
    0x327: lambda: [[(300, 0), (330, -80), (250, -160)]],  # cedilla
    0x328: lambda: [[(300, 0), (240, -90), (310, -170)]],  # ogonek
}


def _composed_skeleton(cp: int):
    """Build an accented-letter skeleton via NFD decomposition: base
    ASCII glyph + combining marks seated above the cap (uppercase) or
    x-height (lowercase); cedilla/ogonek seat at the baseline. Returns
    None when the base or any mark is unknown."""
    import unicodedata

    try:
        parts = unicodedata.normalize("NFD", chr(cp))
    except ValueError:  # pragma: no cover - chr() bounds
        return None
    if len(parts) < 2:
        return None
    base = ord(parts[0])
    strokes = _SKELETONS.get(base)
    if strokes is None:
        return None
    out = [list(s) for s in strokes]
    seat = 760 if parts[0].isupper() or parts[0].isdigit() else 560
    for mark in parts[1:]:
        mk = _MARKS.get(ord(mark))
        if mk is None:
            return None
        dy = 0 if ord(mark) in (0x327, 0x328) else seat
        # i/j keep their dot out of the mark's way: drop it when a
        # top mark lands (matches how real fonts use dotless forms)
        if base in (ord("i"), ord("j")) and dy:
            out = [s for s in out if len(s) > 2 or abs(s[0][1] - 630) > 20]
        for s in mk():
            out.append([(x, y + dy) for x, y in s])
    return out


_SKELETONS = None
_OUTLINE_CACHE: dict[tuple, list] = {}
_SHEAR = 0.21  # oblique slant dx/dy (~12 deg, the classic synthetic slant)


def fallback_outline(cp: int, bold: bool = False, oblique: bool = False):
    """Filled closed contours (1000-em units) for codepoint `cp`, [] for
    glyphs that legitimately paint nothing (space), or None when the
    face has no coverage (non-ASCII). Bold thickens the pen, oblique
    shears the skeleton — the same synthetic-style trick FreeType's
    embolden/matrix transforms apply for styled base-14 substitutes.
    Cached per process per (cp, style) — the shapes are
    font-independent."""
    global _SKELETONS
    key = (cp, bold, oblique)
    hit = _OUTLINE_CACHE.get(key)
    if hit is not None or key in _OUTLINE_CACHE:
        return hit
    if _SKELETONS is None:
        _SKELETONS = _skeletons()
    strokes = _SKELETONS.get(cp)
    if strokes is None:
        strokes = _composed_skeleton(cp)
    if strokes is None:
        _OUTLINE_CACHE[key] = None
        return None
    if not strokes:
        _OUTLINE_CACHE[key] = []
        return []
    import numpy as np

    from .raster import ROUND_CAP, ROUND_JOIN, stroke_outline

    polys = [np.asarray(s, dtype=np.float64) for s in strokes]
    if oblique:
        for p in polys:
            p[:, 0] += _SHEAR * p[:, 1]
    conts = stroke_outline(
        polys, _PEN * (1.6 if bold else 1.0), ROUND_CAP, ROUND_JOIN
    )
    conts = [[(float(x), float(y)) for x, y in c] for c in conts]
    _OUTLINE_CACHE[key] = conts
    return conts
