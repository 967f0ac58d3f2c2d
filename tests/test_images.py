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
