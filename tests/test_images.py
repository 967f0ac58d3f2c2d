"""Image extraction (openfile3 parity): PNG re-encode of raster images,
raw JPEG passthrough for DCT payloads."""

from __future__ import annotations

import struct
import zlib

from delphi_pdf_parser_spark.fixtures import CASES
from delphi_pdf_parser_spark.pdfcore.images import extract_images, write_png


def test_png_writer_roundtrip():
    pixels = bytes(range(64))
    png = write_png(8, 8, 1, pixels)
    assert png.startswith(b"\x89PNG\r\n\x1a\n")
    # parse IDAT and verify the pixel payload survives
    i = png.index(b"IDAT") - 4
    (length,) = struct.unpack(">I", png[i : i + 4])
    idat = png[i + 8 : i + 8 + length]
    raw = zlib.decompress(idat)
    rows = [raw[y * 9 + 1 : y * 9 + 9] for y in range(8)]
    assert b"".join(rows) == pixels


def test_extract_images_from_fixture():
    pdf, _, _ = CASES["image_xobjects"]()
    images = {im.obj_num: im for im in extract_images(pdf)}
    assert len(images) == 2
    flate = next(im for im in images.values() if im.format == "png")
    assert (flate.width, flate.height, flate.colorspace) == (8, 8, "DeviceGray")
    assert flate.data.startswith(b"\x89PNG")
    jpeg = next(im for im in images.values() if im.format == "jpeg")
    assert jpeg.data.startswith(b"\xff\xd8\xff\xe0")
    assert jpeg.data.endswith(b"\xff\xd9")


def test_text_unaffected_by_images():
    from delphi_pdf_parser_spark.pdfcore import extract_text

    pdf, golden, _ = CASES["image_xobjects"]()
    assert extract_text(pdf).text == golden


def test_ccitt_images_decode_to_png():
    """G4 and G3-1D fax rasters must round-trip to real PNGs whose pixels
    equal the fixture bitmap (black->0, white->255)."""
    import zlib as _z

    from delphi_pdf_parser_spark.fixtures import _ccitt_test_bitmap

    pdf, _, _ = CASES["ccitt_images"]()
    images = [im for im in extract_images(pdf)]
    assert len(images) == 2
    bm = _ccitt_test_bitmap()
    for im in images:
        assert im.format == "png", (im.obj_num, im.format)
        assert (im.width, im.height, im.bpc) == (16, 10, 1)
        i = im.data.index(b"IDAT") - 4
        (length,) = struct.unpack(">I", im.data[i : i + 4])
        raw = _z.decompress(im.data[i + 8 : i + 8 + length])
        # rows: 1 filter byte + 16 gray bytes
        for y in range(10):
            row = raw[y * 17 + 1 : y * 17 + 17]
            want = bytes(0 if bm[y][x] else 255 for x in range(16))
            assert row == want, (im.obj_num, y, row.hex(), want.hex())


def test_ccitt_text_still_verifies():
    from delphi_pdf_parser_spark.pdfcore import extract_text

    pdf, golden, _ = CASES["ccitt_images"]()
    assert extract_text(pdf).text == golden


def test_jpeg_sof_reports_true_dimensions():
    """DCT rows must report width/height/components from the SOF header,
    not the PDF dict's claim."""
    import zlib as _z

    from delphi_pdf_parser_spark.fixtures import PdfBuilder
    from delphi_pdf_parser_spark.pdfcore.images import jpeg_sof

    # minimal JPEG skeleton: SOI, APP0, SOF0 (17x23, 3 comps, 8-bit), EOI
    sof = (
        b"\xff\xc0" + struct.pack(">H", 8 + 3 * 3) + b"\x08"
        + struct.pack(">HH", 23, 17) + b"\x03"
        + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    )
    jpg = (
        b"\xff\xd8"
        + b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
        + sof
        + b"\xff\xd9"
    )
    assert jpeg_sof(jpg) == (17, 23, 3, 8)

    b = PdfBuilder()
    cat = b.add("<< /Type /Catalog /Pages 2 0 R >>")
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /XObject << /Im1 5 0 R >> >> /Contents 4 0 R >>"
    )
    content = b"/Im1 Do"
    b.add(f"<< /Length {len(content)} >>", content)
    # dict LIES: claims 4x4 gray; SOF says 17x23 RGB
    b.add(
        "<< /Type /XObject /Subtype /Image /Width 4 /Height 4 "
        "/BitsPerComponent 8 /ColorSpace /DeviceGray /Filter /DCTDecode "
        f"/Length {len(jpg)} >>",
        jpg,
    )
    images = extract_images(b.build_classic(cat))
    assert len(images) == 1
    im = images[0]
    assert (im.width, im.height, im.colorspace, im.bpc) == (
        17, 23, "DeviceRGB", 8,
    )


def test_op_census_counts():
    """Display-list census: per-page operator-category counts, with form
    XObject recursion and inline-image payload skipping."""
    from delphi_pdf_parser_spark.pdfcore.opcensus import op_census

    pdf, _, _ = CASES["image_xobjects"]()
    (row,) = op_census(pdf)
    assert row["image"] == 2 and row["text"] == 5 and row["n_ops"] == 7

    pdf, _, _ = CASES["xobject_form"]()
    (row,) = op_census(pdf)
    assert row["form"] == 1
    assert row["text"] > 5  # the form's inner text ops were counted

    pdf, _, _ = CASES["inline_image_skip"]()
    (row,) = op_census(pdf)
    assert row["image"] == 1  # BI counted once, payload skipped cleanly

    pdf, _, _ = CASES["multipage"]()
    rows = op_census(pdf)
    assert [r["page"] for r in rows] == [0, 1, 2]
    assert all(r["n_ops"] > 0 for r in rows)


def test_op_census_shading_classification():
    """VERDICT r4 #7: every `sh` operand resolves to its /ShadingType
    bucket (1=function, 2=axial, 3=radial, 4=free-form mesh incl. the
    stream-object form) and a PatternType-2 pattern set via scn counts
    as a shading pattern AND classifies its /Shading — both entry paths
    into src/vcl/pdf_shadess.pas, pinned."""
    from delphi_pdf_parser_spark.pdfcore.opcensus import op_census

    pdf, _, _ = CASES["shading_ops"]()
    (row,) = op_census(pdf)
    assert row["shading"] == 4  # four sh ops
    assert row["sh_type1"] == 1 and row["sh_type2"] == 1
    # radial hit twice: once via sh, once via the scn pattern's /Shading
    assert row["sh_type3"] == 2
    assert row["sh_type4"] == 1  # the stream-based mesh
    assert row["sh_type5"] == row["sh_type6"] == row["sh_type7"] == 0
    assert row["sh_type_other"] == 0
    assert row["sh_pattern"] == 1


def test_jbig2_image_decodes_to_png():
    """JBIG2 generic-region raster must decode to a PNG whose pixels
    equal the fixture bitmap (black->0). Above-reference: the Delphi
    JBIG2 filter is a nil stub."""
    import zlib as _z

    from delphi_pdf_parser_spark.fixtures import _ccitt_test_bitmap

    pdf, _, _ = CASES["jbig2_image"]()
    (im,) = extract_images(pdf)
    assert im.format == "png" and (im.width, im.height, im.bpc) == (16, 10, 1)
    i = im.data.index(b"IDAT") - 4
    (length,) = struct.unpack(">I", im.data[i : i + 4])
    raw = _z.decompress(im.data[i + 8 : i + 8 + length])
    bm = _ccitt_test_bitmap()
    for y in range(10):
        row = raw[y * 17 + 1 : y * 17 + 17]
        want = bytes(0 if bm[y][x] else 255 for x in range(16))
        assert row == want, (y, row.hex())


def test_jbig2_unsupported_regions_fall_back_to_raw():
    """A refinement/aggregate symbol dictionary (SDREFAGG, not
    implemented) must surface as a typed failure -> raw passthrough,
    never a crash."""
    from delphi_pdf_parser_spark.fixtures import (
        PdfBuilder,
        _jbig2_segment,
        jbig2_embed,
        _ccitt_test_bitmap,
    )

    # splice an SDREFAGG symbol-dict segment (type 0) in front of the page
    good = jbig2_embed(_ccitt_test_bitmap())
    sym = _jbig2_segment(9, 0, 1, b"\x00\x02" + b"\x00" * 8)
    b = PdfBuilder()
    cat = b.add("<< /Type /Catalog /Pages 2 0 R >>")
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /XObject << /Jb 5 0 R >> >> /Contents 4 0 R >>"
    )
    content = b"/Jb Do"
    b.add(f"<< /Length {len(content)} >>", content)
    data = sym + good
    b.add(
        "<< /Type /XObject /Subtype /Image /Width 16 /Height 10 "
        "/BitsPerComponent 1 /ColorSpace /DeviceGray /Filter /JBIG2Decode "
        f"/Length {len(data)} >>",
        data,
    )
    (im,) = extract_images(b.build_classic(cat))
    assert im.format == "raw"  # typed fallback, like the reference's nil


def test_jbig2_globals_stream():
    """Page info delivered via a JBIG2Globals stream (the PDF spec's
    split): region segment in the image stream, page info in globals."""
    from delphi_pdf_parser_spark.fixtures import (
        _ccitt_test_bitmap,
        jbig2_embed,
        _jbig2_segment,
        PdfBuilder,
    )
    from delphi_pdf_parser_spark.pdfcore.jbig2 import jbig2_decode

    bm = _ccitt_test_bitmap()
    full = jbig2_embed(bm)
    # split: first segment (page info) -> globals; rest -> stream
    from delphi_pdf_parser_spark.pdfcore.jbig2 import _parse_segment_header

    hdr, body_start = _parse_segment_header(full, 0)
    split = body_start + hdr["length"]
    glob, rest = full[:split], full[split:]
    w, h, packed = jbig2_decode(rest, globals_data=glob)
    assert (w, h) == (16, 10)
    got = [[1 - ((packed[y * 2 + (x >> 3)] >> (7 - (x & 7))) & 1)
            for x in range(16)] for y in range(10)]
    assert got == bm

    # and through the PDF filter chain with /JBIG2Globals
    b = PdfBuilder()
    cat = b.add("<< /Type /Catalog /Pages 2 0 R >>")
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /XObject << /Jb 5 0 R >> >> /Contents 4 0 R >>"
    )
    content = b"/Jb Do"
    b.add(f"<< /Length {len(content)} >>", content)
    b.add(
        "<< /Type /XObject /Subtype /Image /Width 16 /Height 10 "
        "/BitsPerComponent 1 /ColorSpace /DeviceGray /Filter /JBIG2Decode "
        "/DecodeParms << /JBIG2Globals 6 0 R >> "
        f"/Length {len(rest)} >>",
        rest,
    )
    b.add(f"<< /Length {len(glob)} >>", glob)
    (im,) = extract_images(b.build_classic(cat))
    assert im.format == "png" and (im.width, im.height) == (16, 10)


def test_jbig2_symbol_text_region_decodes():
    """Symbol-dict + text-region JBIG2 (the scanned-text coding) must
    decode to a PNG whose pixels equal the reference rendering."""
    import zlib as _z

    from delphi_pdf_parser_spark.fixtures import _jbig2_text_fixture_args

    pdf, _, _ = CASES["jbig2_text_image"]()
    (im,) = extract_images(pdf)
    assert im.format == "png" and (im.width, im.height) == (16, 14)
    i = im.data.index(b"IDAT") - 4
    (length,) = struct.unpack(">I", im.data[i : i + 4])
    raw = _z.decompress(im.data[i + 8 : i + 8 + length])
    symbols, placements, W, H = _jbig2_text_fixture_args()
    want = [[0] * W for _ in range(H)]
    for sid, s, t in placements:
        for yy, row in enumerate(symbols[sid]):
            for xx, v in enumerate(row):
                if v:
                    want[t + yy][s + xx] = 1
    for y in range(H):
        got = raw[y * (W + 1) + 1 : y * (W + 1) + 1 + W]
        wrow = bytes(0 if want[y][x] else 255 for x in range(W))
        assert got == wrow, (y, got.hex())


def test_indexed_palette_images_decode():
    """Indexed rasters expand through the palette to true RGB/gray PNGs
    (4-bpc packed indices + string palette; 8-bpc + stream palette)."""
    import zlib as _z

    pdf, _, _ = CASES["indexed_image"]()
    ims = {im.obj_num: im for im in extract_images(pdf)}
    rgb = ims[6]
    assert rgb.format == "png" and rgb.colorspace == "Indexed(3)"
    i = rgb.data.index(b"IDAT") - 4
    (length,) = struct.unpack(">I", rgb.data[i : i + 4])
    raw = _z.decompress(rgb.data[i + 8 : i + 8 + length])
    pal = bytes.fromhex("ff0000" "00ff00" "0000ff" "ffffff" "000000" "804020")
    for y in range(4):
        row = raw[y * 19 + 1 : y * 19 + 19]
        want = b"".join(
            pal[((x + y) % 6) * 3 : ((x + y) % 6) * 3 + 3] for x in range(6)
        )
        assert row == want, (y, row.hex(), want.hex())
    gray = ims[7]
    assert gray.format == "png" and gray.colorspace == "Indexed(1)"
    i = gray.data.index(b"IDAT") - 4
    (length,) = struct.unpack(">I", gray.data[i : i + 4])
    raw = _z.decompress(gray.data[i + 8 : i + 8 + length])
    assert raw[1:5] == bytes([0, 85, 170, 255])
    assert raw[6:10] == bytes([255, 170, 85, 0])


def test_decode_array_and_subbyte_gray():
    """/Decode [1 0] inverts samples; 2/4-bpc gray expands correctly."""
    import zlib as _z

    from delphi_pdf_parser_spark.fixtures import PdfBuilder

    b = PdfBuilder()
    cat = b.add("<< /Type /Catalog /Pages 2 0 R >>")
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /XObject << /A 5 0 R /B 6 0 R >> >> /Contents 4 0 R >>"
    )
    content = b"/A Do /B Do"
    b.add(f"<< /Length {len(content)} >>", content)
    # 4-bpc gray 4x2 ramp with /Decode [1 0] (inverted)
    vals = [[0, 5, 10, 15], [15, 10, 5, 0]]
    packed = b"".join(
        bytes([(vals[y][0] << 4) | vals[y][1], (vals[y][2] << 4) | vals[y][3]])
        for y in range(2)
    )
    comp = _z.compress(packed)
    b.add(
        "<< /Type /XObject /Subtype /Image /Width 4 /Height 2 "
        "/BitsPerComponent 4 /ColorSpace /DeviceGray /Decode [1 0] "
        f"/Filter /FlateDecode /Length {len(comp)} >>",
        comp,
    )
    # 1-bpc ImageMask with /Decode [1 0]
    mask = bytes([0b10100000])  # 3x1: pixels 1,0,1
    comp2 = _z.compress(mask)
    b.add(
        "<< /Type /XObject /Subtype /Image /Width 3 /Height 1 "
        "/ImageMask true /Decode [1 0] "
        f"/Filter /FlateDecode /Length {len(comp2)} >>",
        comp2,
    )
    ims = {im.obj_num: im for im in extract_images(b.build_classic(cat))}
    a = ims[5]
    assert a.format == "png"
    i = a.data.index(b"IDAT") - 4
    (length,) = struct.unpack(">I", a.data[i : i + 4])
    raw = _z.decompress(a.data[i + 8 : i + 8 + length])
    # inverted 4-bpc ramp: v -> (15-v)*255//15
    want0 = bytes(((15 - v) * 255) // 15 for v in vals[0])
    want1 = bytes(((15 - v) * 255) // 15 for v in vals[1])
    assert raw[1:5] == want0 and raw[6:10] == want1
    m = ims[6]
    assert m.format == "png"
    i = m.data.index(b"IDAT") - 4
    (length,) = struct.unpack(">I", m.data[i : i + 4])
    raw = _z.decompress(m.data[i + 8 : i + 8 + length])
    assert raw[1:4] == bytes([0, 255, 0])  # bits 1,0,1 inverted


def _png_raw(im):
    import zlib as _z

    i = im.data.index(b"IDAT") - 4
    (length,) = struct.unpack(">I", im.data[i : i + 4])
    return _z.decompress(im.data[i + 8 : i + 8 + length])


def test_cmyk_image_converts_to_rgb_png():
    """DeviceCMYK rasters convert through the reference's device matrix
    (res_colorspace.pas:104-174, incl. the ported 1000-corner quirk) and
    trunc(v*255) quantization (fz_std_conv_pixmap) — anchor pixels are
    hand-computed from the coefficient table, NOT from the module."""
    pdf, _, _ = CASES["cmyk_image"]()
    ims = {im.obj_num: im for im in extract_images(pdf)}
    cmyk = ims[6]
    assert cmyk.format == "png" and cmyk.colorspace == "DeviceCMYK"
    raw = _png_raw(cmyk)
    # 3x2 RGB rows with filter byte
    row0 = raw[1:10]
    row1 = raw[11:20]
    # white (0,0,0,0): x(0000)=1 -> rgb (255,255,255)
    assert row0[0:3] == bytes([255, 255, 255])
    # pure cyan (1,0,0,0): only the 1000 corner fires; it accumulates the
    # (here zero) 0111 x, so r=0, g=trunc(.6784*255)=172, b=trunc(.9373*255)=239
    assert row0[3:6] == bytes([0, 172, 239])
    # pure magenta (0,1,0,0): 0100 corner -> r=.9255, g=0, b=.5490
    assert row0[6:9] == bytes([236, 0, 139])
    # pure yellow (0,0,1,0): 0010 -> r=1, g=.9490, b=0
    assert row1[0:3] == bytes([255, 241, 0])
    # pure K (0,0,0,1): 0001 -> (.1373,.1216,.1255)
    assert row1[3:6] == bytes([35, 31, 32])
    # rich black (1,1,1,1): no corner fires -> (0,0,0)
    assert row1[6:9] == bytes([0, 0, 0])


def test_separation_tint_transform_converts():
    """Separation ramp through a type-2 exponential tint into DeviceCMYK:
    tint t maps to CMYK t*(0.8,0.2,0,0.1); spot value 255 (t=1) must land
    on the CMYK conversion of (0.8,0.2,0,0.1)."""
    import numpy as np

    from delphi_pdf_parser_spark.pdfcore.colorspace import cmyk_to_rgb

    pdf, _, _ = CASES["cmyk_image"]()
    ims = {im.obj_num: im for im in extract_images(pdf)}
    sep = ims[7]
    assert sep.format == "png" and sep.colorspace == "Separation"
    raw = _png_raw(sep)
    px = raw[1:13]  # 4 RGB pixels
    # t=0 -> CMYK (0,0,0,0) -> white
    assert px[0:3] == bytes([255, 255, 255])
    # t=1 -> CMYK (.8,.2,0,.1); expected via the (independently anchored
    # above) matrix at full precision
    want = np.trunc(
        cmyk_to_rgb(np.array([[0.8, 0.2, 0.0, 0.1]])) * 255
    ).astype(int)[0]
    assert list(px[9:12]) == list(want)
    # monotone ramp: r should decrease with tint (more cyan)
    rs = [px[0], px[3], px[6], px[9]]
    assert rs == sorted(rs, reverse=True)


def test_devicen_sampled_tint_converts():
    """2-ink DeviceN through a type-0 sampled (2x2 lattice, bilinear)
    tint into DeviceRGB: corner inputs hit lattice corners exactly."""
    pdf, _, _ = CASES["cmyk_image"]()
    ims = {im.obj_num: im for im in extract_images(pdf)}
    dn = ims[9]
    assert dn.format == "png" and dn.colorspace == "DeviceN"
    raw = _png_raw(dn)
    px = raw[1:7]
    # pixel0 (ink0=0, ink1=1) -> lattice (0,1) -> blue
    assert px[0:3] == bytes([0, 0, 255])
    # pixel1 (ink0=1, ink1=0) -> lattice (1,0) -> red
    assert px[3:6] == bytes([255, 0, 0])


def test_jbig2_huffman_text_decodes_to_same_png():
    """Huffman coding family (SDHUFF dictionary with raw + MMR
    collective bitmaps, SBHUFF text region with a runcode symbol ID
    table) must produce the IDENTICAL page bitmap the arithmetic coding
    of the same content does — two independent coding paths
    cross-validate each other."""
    from delphi_pdf_parser_spark.fixtures import (
        _jbig2_text_fixture_args,
        jbig2_embed_text,
        jbig2_embed_text_huffman,
    )
    from delphi_pdf_parser_spark.pdfcore.jbig2 import jbig2_decode

    args = _jbig2_text_fixture_args()
    ref = jbig2_decode(jbig2_embed_text(*args), invert=False)
    for coll in ("raw", "mmr"):
        got = jbig2_decode(
            jbig2_embed_text_huffman(*args, collective=coll), invert=False
        )
        assert got == ref, coll
    # and through the PDF image sink
    pdf, _, _ = CASES["jbig2_huffman_image"]()
    (im,) = extract_images(pdf)
    assert im.format == "png" and (im.width, im.height) == (16, 14)
    pdf_a, _, _ = CASES["jbig2_text_image"]()
    (im_a,) = extract_images(pdf_a)
    assert im.data == im_a.data  # byte-identical PNG vs arithmetic case


def test_jbig2_standard_huffman_tables_roundtrip():
    """Every Annex B table: encode->decode identity across its finite
    ranges, the lower/upper 32-bit lines, and OOB where present."""
    from delphi_pdf_parser_spark.pdfcore.jbig2 import (
        OOB,
        _BitReader,
        _BitWriter,
        _STD_LINES,
        std_table,
    )

    for n, lines in _STD_LINES.items():
        tab = std_table(n)
        values = []
        for pl, rl, lo, kd in lines:
            if kd == "n" and rl < 32:
                values += [lo, lo + (1 << rl) - 1]
            elif kd == "n":
                values += [lo, lo + 12345]
            elif kd == "lower":
                values += [lo, lo - 999]
        has_oob = any(kd == "oob" for _, _, _, kd in lines)
        bw = _BitWriter()
        for v in values:
            tab.encode(bw, v)
        if has_oob:
            tab.encode(bw, OOB)
        br = _BitReader(bw.flush())
        for v in values:
            assert tab.decode(br) == v, (n, v)
        if has_oob:
            assert tab.decode(br) is OOB, n


def test_ps_function_tint_image():
    """Type-4 (PostScript calculator) tint transform on a Separation
    image: the 256-entry lookup path evaluates the program once,
    conversion matches hand-computed anchors."""
    import numpy as np
    import zlib as _z

    from delphi_pdf_parser_spark.pdfcore.colorspace import cmyk_to_rgb

    pdf, _, _ = CASES["ps_function_image"]()
    (im,) = extract_images(pdf)
    assert im.format == "png" and im.colorspace == "Separation"
    i = im.data.index(b"IDAT") - 4
    (length,) = struct.unpack(">I", im.data[i : i + 4])
    raw = _z.decompress(im.data[i + 8 : i + 8 + length])
    got = [tuple(raw[1 + 3 * x : 4 + 3 * x]) for x in range(4)]
    exp = []
    for v in (0, 85, 170, 255):
        t = v / 255.0
        cmyk = [0.8 * t, 0.2 * t if t < 0.5 else 0.3 * t, 0.0, 0.1 * t]
        rgb = cmyk_to_rgb(np.asarray([cmyk]))[0]
        exp.append(tuple(int(x) for x in np.trunc(rgb * 255.0)))
    assert got == exp


def test_lab_image_converts_to_rgb():
    """Lab raster -> RGB via the reference's exact conversion; anchors
    hand-derived from the pdf_color_spcasess.pas:44-76 math."""
    import zlib as _z

    pdf, _, _ = CASES["lab_image"]()
    (im,) = extract_images(pdf)
    assert im.format == "png" and im.colorspace == "Lab"
    i = im.data.index(b"IDAT") - 4
    (length,) = struct.unpack(">I", im.data[i : i + 4])
    raw = _z.decompress(im.data[i + 8 : i + 8 + length])
    rows = [raw[1 + 10 * y : 10 * (y + 1)] for y in range(2)]
    px = [tuple(rows[y][3 * x : 3 * x + 3]) for y in range(2) for x in range(3)]
    assert px == [
        (255, 255, 255), (109, 109, 109), (0, 0, 0),
        (0, 174, 140), (220, 183, 0), (131, 41, 146),
    ]
