"""Raster sink (A43): scanline geometry semantics + whole-page pixel
truth on the render_ops fixture. Every assertion is hand-computed from
the fixture's content stream (hard-edge coverage, pixel centers at
(x+0.5, y+0.5), device row = 792 - user_y at scale 1)."""

from __future__ import annotations

import numpy as np

from delphi_pdf_parser_spark.pdfcore.raster import (
    EVENODD,
    NONZERO,
    coverage_mask,
)
from delphi_pdf_parser_spark.pdfcore.rasterdev import render_page


def test_coverage_mask_semantics():
    # pixel centers in (2,8)x(2,8): exactly 6x6
    m = coverage_mask([[(2, 2), (8, 2), (8, 8), (2, 8)]], 10, 10)
    assert m.sum() == 36 and m[5, 5] and not m[1, 1]
    outer = [(0, 0), (10, 0), (10, 10), (0, 10)]
    inner = [(3, 3), (7, 3), (7, 7), (3, 7)]
    # even-odd: hole regardless of direction
    d = coverage_mask([outer, inner], 10, 10, EVENODD)
    assert d[1, 1] and not d[5, 5]
    # nonzero: same-direction inner fills, reversed inner is a hole
    assert coverage_mask([outer, inner], 10, 10, NONZERO)[5, 5]
    rev = coverage_mask([outer, inner[::-1]], 10, 10, NONZERO)
    assert rev[1, 1] and not rev[5, 5]


def test_render_ops_fixture_pixels():
    from delphi_pdf_parser_spark.fixtures import generate_fixtures

    pdf = bytes(generate_fixtures()["render_ops"]["pdf"])
    w, h, pix, fails = render_page(pdf, 0, scale=1.0)
    assert (w, h) == (612, 792)
    assert fails == {}, fails

    # 1. red rect 100,100 200x150: center user (200,175) -> dev (617,200)
    assert tuple(pix[617, 200]) == (255, 0, 0)
    assert tuple(pix[792 - 99, 200]) == (255, 255, 255)  # below it

    # 2. green fill clipped to 50..150 x 400..500
    assert tuple(pix[792 - 450, 100]) == (0, 255, 0)
    assert tuple(pix[792 - 450, 200]) == (255, 255, 255)  # outside clip
    # clip POPPED by Q: the later shading (different clip) still painted

    # 3. black diagonal stroke (300,500)->(500,700), width 4
    assert tuple(pix[792 - 600, 400]) == (0, 0, 0)
    assert tuple(pix[792 - 600, 420]) == (255, 255, 255)  # 20pt off the line

    # 4. image: 2x2 RGB in user (50..150, 600..700); row 0 (R,G) on top
    assert tuple(pix[792 - 675, 75]) == (255, 0, 0)
    assert tuple(pix[792 - 675, 125]) == (0, 255, 0)
    assert tuple(pix[792 - 625, 75]) == (0, 0, 255)
    assert tuple(pix[792 - 625, 125]) == (255, 255, 0)

    # 5. axial shading red->blue across user x 400..500 at y ~150
    l, r = pix[792 - 150, 405], pix[792 - 150, 495]
    assert l[0] > 200 and l[2] < 60
    assert r[2] > 200 and r[0] < 60
    assert tuple(pix[792 - 150, 520]) == (255, 255, 255)  # clipped

    # 6. glyph text at 48pt from (100,200): A = solid block
    #    x in 100+48*[0.1,0.5], y in 200+48*[0,0.7] -> center (114,216)
    assert tuple(pix[792 - 216, 114]) == (0, 0, 1) or tuple(
        pix[792 - 216, 114]
    ) == (0, 0, 255)
    # B triangle base center: starts at 100+28.8=128.8; (143,203)
    assert tuple(pix[792 - 203, 143]) == (0, 0, 255)
    # glyph coverage ~ analytic area (A 645 + B 504), hard edges —
    # counted over the text region only (the image also has blue pixels)
    blue = (pix[:, :, 2] == 255) & (pix[:, :, 0] == 0) & (pix[:, :, 1] == 0)
    assert 1000 < blue[540:600, 95:165].sum() < 1300, blue.sum()


def test_render_mode_3_not_painted():
    from delphi_pdf_parser_spark.fixtures import (
        PdfBuilder,
        _bt,
        build_ttf,
        simple_doc,
    )

    ttf = build_ttf(
        cmaps=[(3, 1, {0x41: 1})],
        advances=(500, 600),
        glyphs={0: [], 1: [[(0, 0), (600, 0), (600, 700), (0, 700)]]},
    )
    b = PdfBuilder()
    b.set(7, f"<< /Length {len(ttf)} >>", ttf)
    b.set(
        6,
        "<< /Type /FontDescriptor /FontName /T /Flags 32"
        " /FontFile2 7 0 R >>",
    )
    font = (
        "<< /Type /Font /Subtype /TrueType /BaseFont /T"
        " /FontDescriptor 6 0 R /FirstChar 65 /LastChar 65"
        " /Widths [600] >>"
    )
    b2, cat = simple_doc(
        _bt("3 Tr 100 100 Td (A) Tj"), font_body=font, builder=b
    )
    w, h, pix, fails = render_page(b2.build_classic(cat), 0, 1.0)
    assert (pix == 255).all()  # invisible text paints nothing
    # ... but the TEXT path still extracts it (render_mode_3 doctrine)
    from delphi_pdf_parser_spark.pdfcore import extract_text

    assert extract_text(b2.build_classic(cat)).text == "A\r\n"


def test_render_cff_glyphs():
    """CFF Type2 charstring outlines render through the same hook."""
    from delphi_pdf_parser_spark.fixtures import (
        PdfBuilder,
        _bt,
        build_cff,
        simple_doc,
        t2_path,
    )

    cs = [b"\x0e", t2_path([[(0, 0), (600, 0), (600, 700), (0, 700)]])]
    cff = build_cff({65: 1}, [0, 34], [], 2, charstrings=cs)
    b = PdfBuilder()
    b.set(7, f"<< /Length {len(cff)} /Subtype /Type1C >>", cff)
    b.set(
        6,
        "<< /Type /FontDescriptor /FontName /TC /Flags 4"
        " /FontFile3 7 0 R >>",
    )
    font = (
        "<< /Type /Font /Subtype /Type1 /BaseFont /TC"
        " /FontDescriptor 6 0 R /FirstChar 65 /LastChar 65"
        " /Widths [600] >>"
    )
    b2, cat = simple_doc(
        _bt("/F1 50 Tf 100 100 Td (A) Tj"), font_body=font, builder=b
    )
    w, h, pix, fails = render_page(b2.build_classic(cat), 0, 1.0)
    assert fails == {}, fails
    black = (pix == 0).all(axis=2)
    # 0.6em x 0.7em at 50pt = 30 x 35 = 1050 px, hard edges
    assert 980 < black.sum() < 1120, black.sum()
    assert black[792 - 115, 115]  # inside the block


def test_render_unembedded_font_uses_fallback_face():
    """Base-14 text (no embedded program) renders through the synthetic
    fallback face and records raster_fallback_font — not the old
    draws-nothing raster_no_outline behavior; paths still render."""
    from delphi_pdf_parser_spark.fixtures import _bt, simple_doc

    b2, cat = simple_doc(
        _bt("/F1 50 Tf 100 100 Td (Hi) Tj") + b" 1 0 0 rg 10 10 50 50 re f"
    )
    w, h, pix, fails = render_page(b2.build_classic(cat), 0, 1.0)
    assert fails.get("raster_fallback_font") == 1
    assert "raster_no_outline" not in fails, fails
    black = (pix == 0).all(axis=2)
    # 'H': two stems at em-x 140/460 + crossbar at em-y 350 (50pt em);
    # pen origin (100,100) -> device row 792 - (100 + 0.35*50)
    assert black[792 - 117, 100 + 15]  # left stem of H
    assert black[792 - 117, 100 + 23]  # right stem of H
    assert 400 < black.sum() < 2500, black.sum()


def test_fallback_face_covers_printable_ascii():
    """Every printable-ASCII codepoint has fallback contours (space is
    the legitimate empty glyph); non-ASCII has none; contours are
    closed polys consumable by coverage_mask."""
    from delphi_pdf_parser_spark.pdfcore.fallbackfont import fallback_outline

    for cp in range(0x20, 0x7F):
        conts = fallback_outline(cp)
        assert conts is not None, chr(cp)
        if cp == 0x20:
            assert conts == []
        else:
            assert conts and all(len(c) >= 3 for c in conts), chr(cp)
    assert fallback_outline(0x3B1) is None  # alpha
    assert fallback_outline(0x4E2D) is None  # CJK


def test_fallback_face_covers_latin1_letters():
    """Every Latin-1 letter (0xC0-0xFF) plus the webtext punctuation
    and currency set renders: accents via NFD base+mark composition,
    stragglers hand-authored."""
    from delphi_pdf_parser_spark.pdfcore.fallbackfont import fallback_outline

    for cp in range(0xC0, 0x100):
        conts = fallback_outline(cp)
        assert conts and all(len(c) >= 3 for c in conts), chr(cp)
    for ch in "‘’“”–—…¡¿" \
              "«»°·¢£¥€":
        assert fallback_outline(ord(ch)), ch
    # composed Latin Extended-A examples (NFD path): c-caron, o-macron
    assert fallback_outline(0x10D) and fallback_outline(0x14D)


def test_fallback_face_bold_and_oblique_styles():
    """Bold thickens (more covered area at the same grid), oblique
    shears (top of 'l' shifts right of its base)."""
    import numpy as np

    from delphi_pdf_parser_spark.pdfcore.fallbackfont import fallback_outline
    from delphi_pdf_parser_spark.pdfcore.raster import NONZERO, coverage_mask

    def area(**kw):
        conts = fallback_outline(ord("H"), **kw)
        polys = [np.asarray(c) * 0.05 for c in conts]  # 1000em -> 50px
        return coverage_mask(polys, 50, 50, NONZERO).sum()

    assert area(bold=True) > area() * 1.25
    lean = fallback_outline(ord("l"), oblique=True)
    xs = np.concatenate([np.asarray(c)[:, 0] for c in lean])
    ys = np.concatenate([np.asarray(c)[:, 1] for c in lean])
    assert xs[ys > 600].mean() > xs[ys < 100].mean() + 80


def test_render_text_clip_mode7():
    """Tr 7 adds glyph outlines to the clip at ET: a subsequent
    full-page red fill paints only inside the 'l' stem; after Q the
    clip unwinds and fills cover the page again."""
    from delphi_pdf_parser_spark.fixtures import simple_doc

    content = (
        b"q BT 7 Tr /F1 200 Tf 100 100 Td (l) Tj ET"
        b" 1 0 0 rg 0 0 612 792 re f Q"
        b" 0 0 1 rg 0 760 612 32 re f"
    )
    b2, cat = simple_doc(content)
    w, h, pix, fails = render_page(b2.build_classic(cat), 0, 1.0)
    red = (pix == (255, 0, 0)).all(axis=2)
    # fallback 'l': 80-unit pen on x=300 em stem -> device x 152..168,
    # y 100..240 (200pt em, Td 100 100)
    assert red[792 - 170, 160]  # inside the stem
    assert not red[792 - 170, 300]  # outside: clipped
    assert not red[792 - 50, 50]
    assert 1500 < red.sum() < 4200, red.sum()
    blue = (pix == (0, 0, 255)).all(axis=2)
    assert blue.sum() == 612 * 32  # post-Q fill is unclipped


def test_render_fallback_gap_glyph_records_no_outline():
    """A glyph whose Unicode maps outside the fallback face's printable-
    ASCII coverage still records raster_no_outline (and paints
    nothing): /Differences names an AGL glyph (alpha -> U+03B1)."""
    from delphi_pdf_parser_spark.fixtures import _bt, simple_doc

    font = (
        "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        " /Encoding << /Type /Encoding /Differences [65 /alpha] >> >>"
    )
    b2, cat = simple_doc(_bt("/F1 50 Tf 100 100 Td (A) Tj"), font_body=font)
    w, h, pix, fails = render_page(b2.build_classic(cat), 0, 1.0)
    assert fails.get("raster_no_outline") == 1
    assert (pix == 255).all()


def test_render_bezier_and_closepaint_ops():
    """c/v/y bezier construction, b (close+fill+stroke) and f* even-odd
    through the interpreter's path hooks: a bezier 'circle' approximated
    by 4 cubics fills convexly; an even-odd self-overlapping square ring
    leaves its hole empty."""
    from delphi_pdf_parser_spark.fixtures import simple_doc

    k = 55.2  # 100 * kappa for a radius-100 circle
    content = (
        # circle centered (150, 600) r=100 via c ops, filled red with b
        b"1 0 0 rg 0 0 0 RG 2 w "
        b"250 600 m "
        + f"250 {600 + k:.1f} {150 + k:.1f} 700 150 700 c ".encode()
        + f"{150 - k:.1f} 700 50 {600 + k:.1f} 50 600 c ".encode()
        + f"50 {600 - k:.1f} {150 - k:.1f} 500 150 500 c ".encode()
        + f"{150 + k:.1f} 500 250 {600 - k:.1f} 250 600 c ".encode()
        + b"b "
        # even-odd ring: two same-direction squares -> f* leaves a hole
        b"0 0 1 rg 400 100 150 150 re 440 140 70 70 re f* "
        # v and y operators: a filled wedge
        b"0 1 0 rg 300 300 m 350 300 400 350 v 400 300 400 300 y h f"
    )
    b2, cat = simple_doc(
        content,
        font_body="<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    )
    w, h, pix, fails = render_page(b2.build_classic(cat), 0, 1.0)
    # circle: center red, 95%-radius along x red, outside corner white
    assert tuple(pix[792 - 600, 150]) == (255, 0, 0)
    assert tuple(pix[792 - 600, 245]) == (255, 0, 0)
    assert tuple(pix[792 - 672, 78]) == (255, 255, 255)  # r~120 diagonal
    # even-odd ring: band filled, hole empty
    assert tuple(pix[792 - 110, 410]) == (0, 0, 255)
    assert tuple(pix[792 - 175, 475]) == (255, 255, 255)
    # wedge interior
    assert tuple(pix[792 - 310, 360]) == (0, 255, 0)


def test_render_q_restores_clip_across_nesting():
    """Nested q/W n/Q: each Q unwinds exactly the clips pushed since its
    q — a fill after double-pop paints unclipped."""
    from delphi_pdf_parser_spark.fixtures import simple_doc

    content = (
        b"q 100 100 100 100 re W n "
        b"q 120 120 20 20 re W n "
        b"1 0 0 rg 0 0 612 792 re f "    # doubly clipped: only 20x20 red
        # after ONE Q: outer clip only — a full-page green fill would
        # repaint the red, so fill a bottom strip of the outer region
        b"Q 0 1 0 rg 0 0 612 115 re f "
        b"Q 0 0 1 rg 300 300 10 10 re f"  # unclipped blue probe
    )
    b2, cat = simple_doc(
        content,
        font_body="<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    )
    w, h, pix, fails = render_page(b2.build_classic(cat), 0, 1.0)
    assert tuple(pix[792 - 130, 130]) == (255, 0, 0)  # inner clip
    assert tuple(pix[792 - 110, 110]) == (0, 255, 0)  # outer-clip region
    assert tuple(pix[792 - 250, 250]) == (255, 255, 255)  # outside both
    assert tuple(pix[792 - 305, 305]) == (0, 0, 255)  # unclipped


def test_render_radial_shading_offcenter():
    """Radial shading with NON-concentric circles: the spec quadratic
    (largest s with |p - center(s)| = r(s)) places the color front
    correctly — a point near the small start circle takes t~0 color, a
    point near the big end circle's far side takes t~1."""
    from delphi_pdf_parser_spark.fixtures import PdfBuilder

    b = PdfBuilder()
    cat = b.add("<< /Type /Catalog /Pages 2 0 R >>")
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Shading << /Sh1 5 0 R >> >> /Contents 4 0 R >>"
    )
    content = b"q 100 500 200 200 re W n /Sh1 sh Q"
    b.add(f"<< /Length {len(content)} >>", content)
    fn2 = "<< /FunctionType 2 /Domain [0 1] /C0 [1 0 0] /C1 [0 0 1] /N 1 >>"
    # start circle r=10 at (150,600); end circle r=120 at (220,600)
    b.add(
        "<< /ShadingType 3 /ColorSpace /DeviceRGB "
        "/Extend [true true] "
        f"/Coords [150 600 10 220 600 120] /Function {fn2} >>",
        num=5,
    )
    w, h, pix, fails = render_page(b.build_classic(cat), 0, 1.0)
    assert fails == {}, fails
    # on the center axis right of both circles, |p-c(s)| = r(s) gives
    # x-150-70s = 10+110s -> s = (x-160)/180: x=200 -> s=0.22,
    # x=295 -> s=0.75 — pin both against the lerp color
    near = pix[792 - 600, 152]  # inside/at the r=10 start circle: s~0
    mid = pix[792 - 600, 200]
    far = pix[792 - 600, 295]
    assert near[0] > 240 and near[2] < 20, near
    assert abs(int(mid[2]) - int(0.22 * 255)) < 12, mid
    assert abs(int(far[2]) - int(0.75 * 255)) < 12, far
    # non-concentric check: on the LEFT of the start circle the front
    # moves much faster (x-gap shrinks as center recedes): x=120 ->
    # |120-150-70s| = 10+110s -> s = 20/40 = 0.5
    left = pix[792 - 600, 120]
    assert abs(int(left[2]) - int(0.5 * 255)) < 14, left


def test_render_page_rotate():
    """/Rotate 90: the canvas swaps dimensions and a rect lands where
    the rotation maps it."""
    from delphi_pdf_parser_spark.fixtures import PdfBuilder

    b = PdfBuilder()
    cat = b.add("<< /Type /Catalog /Pages 2 0 R >>")
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Rotate 90 /Resources << >> /Contents 4 0 R >>"
    )
    content = b"1 0 0 rg 50 100 80 60 re f"
    b.add(f"<< /Length {len(content)} >>", content)
    w, h, pix, fails = render_page(b.build_classic(cat), 0, 1.0)
    assert (w, h) == (792, 612)
    # user rect center (90,130); rot-90 CW view: device x = 792-y_dev0?
    # verify by search instead of hand-mapping: exactly one red blob with
    # the rect's area, and its aspect flipped (60 wide x 80 tall)
    red = (pix[:, :, 0] == 255) & (pix[:, :, 1] == 0)
    assert red.sum() == 80 * 60
    ys, xs = red.nonzero()
    assert xs.max() - xs.min() + 1 == 60
    assert ys.max() - ys.min() + 1 == 80


def test_render_type1_glyphs():
    """Type1 (FontFile) charstring outlines — the third embedded outline
    format: eexec + lenIV-4 charstring decryption, name-addressed glyphs
    through the builtin /Encoding."""
    from delphi_pdf_parser_spark.fixtures import (
        PdfBuilder,
        _bt,
        build_type1,
        simple_doc,
    )

    prog = build_type1(
        {
            ".notdef": [],
            "square": [[(0, 0), (600, 0), (600, 700), (0, 700)]],
        },
        {65: "square"},
    )
    b = PdfBuilder()
    b.set(7, f"<< /Length {len(prog)} /Length1 64 /Length2 64 /Length3 0 >>", prog)
    b.set(
        6,
        "<< /Type /FontDescriptor /FontName /FixT1 /Flags 4"
        " /FontFile 7 0 R >>",
    )
    font = (
        "<< /Type /Font /Subtype /Type1 /BaseFont /FixT1"
        " /FontDescriptor 6 0 R /FirstChar 65 /LastChar 65"
        " /Widths [600] >>"
    )
    b2, cat = simple_doc(
        _bt("/F1 50 Tf 100 100 Td (A) Tj"), font_body=font, builder=b
    )
    w, h, pix, fails = render_page(b2.build_classic(cat), 0, 1.0)
    assert fails == {}, fails
    black = (pix == 0).all(axis=2)
    # 0.6em x 0.7em at 50pt = 30x35 = 1050 px
    assert 980 < black.sum() < 1120, black.sum()
    assert black[792 - 115, 115]


def test_render_type3_glyphs():
    """Type3 glyphs render by running their charproc content streams
    through a nested interpreter onto the same device, with
    CTM = FontMatrix · text matrix · page CTM."""
    from delphi_pdf_parser_spark.fixtures import PdfBuilder

    b = PdfBuilder()
    cat = b.add("<< /Type /Catalog /Pages 2 0 R >>")
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"
    )
    content = b"BT 1 0 0 rg /F1 50 Tf 100 100 Td (a) Tj ET"
    b.add(f"<< /Length {len(content)} >>", content)
    # glyph: d1 metrics then a filled 60x70 square in 0.01 glyph units
    glyph = b"60 0 0 0 60 70 d1 0 0 60 70 re f"
    b.add(f"<< /Length {len(glyph)} >>", glyph, num=6)
    b.add(
        "<< /Type /Font /Subtype /Type3 /Name /T3 "
        "/FontMatrix [0.01 0 0 0.01 0 0] /FontBBox [0 0 100 100] "
        "/FirstChar 97 /LastChar 98 /Widths [60 60] "
        "/Encoding << /Differences [97 /sq] >> "
        "/CharProcs << /sq 6 0 R >> >>",
        num=5,
    )
    w, h, pix, fails = render_page(b.build_classic(cat), 0, 1.0)
    assert fails == {}, fails
    red = (pix[:, :, 0] == 255) & (pix[:, :, 1] == 0)
    # FontMatrix 0.01 at 50pt: glyph unit = 0.5pt -> 30 x 35pt square
    # at (100,100): exact hard-edge pixel count
    assert red.sum() == 30 * 35, red.sum()
    assert red[792 - 115, 115]
    assert not red[792 - 140, 135]  # above the square


def test_render_inline_images_and_stencil():
    """BI..ID..EI painting: raw 8-bpc RGB quadrants land oriented like
    XObject images, and a 1-bpc ImageMask stencils the CURRENT fill
    color exactly where samples are 0."""
    from delphi_pdf_parser_spark.fixtures import simple_doc

    px = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 0])
    content = (
        b"q 100 0 0 100 50 600 cm BI /W 2 /H 2 /CS /RGB /BPC 8 ID "
        + px
        + b" EI Q "
        b"0 0 1 rg q 80 0 0 10 200 300 cm "
        b"BI /W 8 /H 1 /IM true /BPC 1 ID "
        + bytes([0b10101010])
        + b" EI Q"
    )
    b2, cat = simple_doc(
        content,
        font_body="<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    )
    w, h, pix, fails = render_page(b2.build_classic(cat), 0, 1.0)
    assert fails == {}, fails
    assert tuple(pix[792 - 675, 75]) == (255, 0, 0)
    assert tuple(pix[792 - 675, 125]) == (0, 255, 0)
    assert tuple(pix[792 - 625, 125]) == (255, 255, 0)
    # stencil: 0xAA -> odd samples (bit 0) paint blue, even stay white
    assert tuple(pix[792 - 305, 215]) == (0, 0, 255)
    assert tuple(pix[792 - 305, 205]) == (255, 255, 255)


def test_render_imagemask_xobject_stencil():
    """/ImageMask true XObject stencils the fill color: a checkerboard
    mask paints exactly the sample-0 squares green."""
    import zlib

    from delphi_pdf_parser_spark.fixtures import PdfBuilder

    bits = np.zeros((8, 8), dtype=np.uint8)
    bits[::2, ::2] = 1
    bits[1::2, 1::2] = 1  # 1 = NOT painted under default Decode
    comp = zlib.compress(np.packbits(bits, axis=1).tobytes())
    b = PdfBuilder()
    cat = b.add("<< /Type /Catalog /Pages 2 0 R >>")
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /XObject << /Im1 5 0 R >> >> /Contents 4 0 R >>"
    )
    content = b"0 1 0 rg q 80 0 0 80 100 600 cm /Im1 Do Q"
    b.add(f"<< /Length {len(content)} >>", content)
    b.add(
        "<< /Type /XObject /Subtype /Image /Width 8 /Height 8 "
        "/ImageMask true /BitsPerComponent 1 /Filter /FlateDecode "
        f"/Length {len(comp)} >>",
        comp,
        num=5,
    )
    w, h, pix, fails = render_page(b.build_classic(cat), 0, 1.0)
    assert fails == {}, fails
    # mask row 0 (top of unit square = user y near 680) has bit 1 at
    # even columns -> NOT painted; odd columns painted green.
    # cell size 10pt: cell (row0, col0) center user (105, 675)
    assert tuple(pix[792 - 675, 105]) == (255, 255, 255)
    assert tuple(pix[792 - 675, 115]) == (0, 255, 0)
    # painted pixel count: 32 of 64 cells x 100 px
    green = (pix[:, :, 1] == 255) & (pix[:, :, 0] == 0)
    assert green.sum() == 32 * 100, green.sum()


def test_render_supersampled_antialiasing():
    """supersample=2: edges blend (intermediate coverage values appear),
    interiors and dimensions stay exact."""
    from delphi_pdf_parser_spark.fixtures import generate_fixtures

    pdf = bytes(generate_fixtures()["render_ops"]["pdf"])
    w, h, pix, fails = render_page(pdf, 0, scale=1.0, supersample=2)
    assert (w, h) == (612, 792)
    # interior of the red rect unchanged
    assert tuple(pix[617, 200]) == (255, 0, 0)
    # the diagonal stroke's edges now carry intermediate gray values
    mids = ((pix > 10) & (pix < 245)).any(axis=2)
    assert mids.sum() > 50, mids.sum()


def test_render_review_fixes():
    """Review findings pinned: (a) a Type3 charproc's un-bracketed W n
    clip must NOT leak onto the page; (b) sh without /Extend leaves
    pixels beyond the shading extent unpainted; (c) render mode 7
    (clip-only) paints nothing."""
    from delphi_pdf_parser_spark.fixtures import PdfBuilder, _bt, build_ttf, simple_doc

    # (a) Type3 clip leak
    b = PdfBuilder()
    cat = b.add("<< /Type /Catalog /Pages 2 0 R >>")
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"
    )
    content = (
        b"BT /F1 50 Tf 100 100 Td (a) Tj ET "
        b"1 0 0 rg 0 0 612 792 re f"  # page fill AFTER the glyph
    )
    b.add(f"<< /Length {len(content)} >>", content)
    glyph = b"60 0 0 0 60 70 d1 0 0 10 10 re W n 0 0 60 70 re f"
    b.add(f"<< /Length {len(glyph)} >>", glyph, num=6)
    b.add(
        "<< /Type /Font /Subtype /Type3 /Name /T3 "
        "/FontMatrix [0.01 0 0 0.01 0 0] /FontBBox [0 0 100 100] "
        "/FirstChar 97 /LastChar 98 /Widths [60 60] "
        "/Encoding << /Differences [97 /sq] >> "
        "/CharProcs << /sq 6 0 R >> >>",
        num=5,
    )
    w, h, pix, fails = render_page(b.build_classic(cat), 0, 1.0)
    red = (pix[:, :, 0] == 255) & (pix[:, :, 1] == 0)
    assert red.sum() == 612 * 792, red.sum()  # page fill unclipped

    # (b) /Extend default false: axial band only
    b2 = PdfBuilder()
    cat2 = b2.add("<< /Type /Catalog /Pages 2 0 R >>")
    b2.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b2.add(
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Shading << /Sh1 5 0 R >> >> /Contents 4 0 R >>"
    )
    c2 = b"/Sh1 sh"
    b2.add(f"<< /Length {len(c2)} >>", c2)
    fn2 = "<< /FunctionType 2 /Domain [0 1] /C0 [1 0 0] /C1 [0 0 1] /N 1 >>"
    b2.add(
        "<< /ShadingType 2 /ColorSpace /DeviceRGB "
        f"/Coords [100 0 200 0] /Function {fn2} >>",
        num=5,
    )
    w, h, pix, fails = render_page(b2.build_classic(cat2), 0, 1.0)
    assert tuple(pix[400, 150]) != (255, 255, 255)  # inside the band
    assert tuple(pix[400, 50]) == (255, 255, 255)   # before start: unpainted
    assert tuple(pix[400, 500]) == (255, 255, 255)  # past end: unpainted

    # (c) mode 7 clip-only text paints nothing
    ttf = build_ttf(
        cmaps=[(3, 1, {0x41: 1})],
        advances=(500, 600),
        glyphs={0: [], 1: [[(0, 0), (600, 0), (600, 700), (0, 700)]]},
    )
    b3 = PdfBuilder()
    b3.set(7, f"<< /Length {len(ttf)} >>", ttf)
    b3.set(6, "<< /Type /FontDescriptor /FontName /T /Flags 32 /FontFile2 7 0 R >>")
    font = ("<< /Type /Font /Subtype /TrueType /BaseFont /T"
            " /FontDescriptor 6 0 R /FirstChar 65 /LastChar 65 /Widths [600] >>")
    b4, cat4 = simple_doc(_bt("7 Tr 100 100 Td (A) Tj"), font_body=font, builder=b3)
    w, h, pix, fails = render_page(b4.build_classic(cat4), 0, 1.0)
    assert (pix == 255).all()


def test_render_sink_defaults_to_antialiasing(spark):
    """VERDICT r6 #6: render_documents anti-aliases by default — the
    default digest equals explicit supersample=2 and differs from the
    hard-edge supersample=1 mode on a diagonal-edge page."""
    from delphi_pdf_parser_spark.fixtures import PdfBuilder
    from delphi_pdf_parser_spark.operators.render import render_documents

    content = b"0 0 0 rg 10 10 m 200 400 l 220 15 l f"
    b = PdfBuilder()
    cat = b.add("<< /Type /Catalog /Pages 2 0 R >>")
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << >> /Contents 4 0 R >>"
    )
    b.add(f"<< /Length {len(content)} >>", content)
    pdf = b.build_classic(cat)
    docs = spark.createDataFrame(
        [("u://tri", bytearray(pdf))], "url string, html binary"
    )

    def digest(df):
        row = df.collect()[0]
        return row.pixels_md5, row.ink_frac

    d_default = digest(render_documents(docs))
    d_aa = digest(render_documents(docs, supersample=2))
    d_hard = digest(render_documents(docs, supersample=1))
    assert d_default == d_aa
    assert d_default[0] != d_hard[0]
