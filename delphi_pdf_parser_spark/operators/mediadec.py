"""From-scratch image decoders for the multimodal path.

No imaging library exists in this runtime, so the formats a pure-Python
decoder can own are implemented for real: uncompressed BMP (8-bit gray /
24-bit BGR), binary PPM/PGM (P5/P6), and non-interlaced 8-bit PNG
(gray / RGB / gray+alpha / RGBA — zlib inflate + per-row filter undo,
reusing the vectorized PNG un-predictor from pdfcore.filters), and
baseline + progressive (SOF2) JPEG via the from-scratch DCT decoder in
pdfcore/jpeg.py.
Still-unsupported formats (lossy-VP8 WebP, arithmetic-coded JPEG, ...) raise
UnsupportedMediaError and surface as a decode-status column, the same
contract the PDF pipeline uses for its failure codes.
"""

from __future__ import annotations

import struct
import zlib


class UnsupportedMediaError(Exception):
    pass


class MediaDecodeError(Exception):
    pass


def decode_image(payload: bytes) -> tuple[int, int, int, bytes]:
    """payload -> (width, height, n_components, pixels).

    pixels are row-major, 8 bits per component, no padding.
    Raises UnsupportedMediaError for formats this runtime can't decode,
    MediaDecodeError for corrupt payloads of a supported format — typed
    boundary: mangled headers never surface bare struct/index errors.
    """
    try:
        return _decode_any(payload)
    except (UnsupportedMediaError, MediaDecodeError):
        raise
    except (IndexError, ValueError, KeyError, struct.error) as e:
        raise MediaDecodeError(f"corrupt: {type(e).__name__}: {e}")


def _decode_any(payload: bytes) -> tuple[int, int, int, bytes]:
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(payload)
    if payload[:2] in (b"P5", b"P6"):
        return _decode_pnm(payload)
    if payload[:2] == b"\xff\xd8":
        from delphi_pdf_parser_spark.pdfcore.jpeg import (
            JpegError,
            UnsupportedJpegError,
            jpeg_decode,
        )

        try:
            return jpeg_decode(payload)
        except UnsupportedJpegError as e:
            raise UnsupportedMediaError(f"jpeg: {e}")
        except JpegError as e:
            raise MediaDecodeError(f"jpeg: {e}")
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from delphi_pdf_parser_spark.webp import (
            WebpError,
            WebpUnsupported,
            webp_decode,
        )

        try:
            return webp_decode(payload)
        except WebpUnsupported as e:
            raise UnsupportedMediaError(f"webp: {e}")
        except WebpError as e:
            raise MediaDecodeError(f"webp: {e}")
    if payload[:4] == b"\xff\x4f\xff\x51" or payload[4:8] == b"jP\x20\x20":
        from delphi_pdf_parser_spark.pdfcore.jpx import (
            JpxError,
            JpxUnsupported,
            jpx_decode,
        )

        try:
            return jpx_decode(payload)
        except JpxUnsupported as e:
            raise UnsupportedMediaError(f"jpx: {e}")
        except JpxError as e:
            raise MediaDecodeError(f"jpx: {e}")
    raise UnsupportedMediaError(f"unknown magic {payload[:4]!r}")


def _decode_bmp(data: bytes) -> tuple[int, int, int, bytes]:
    if len(data) < 54:
        raise MediaDecodeError("bmp: truncated header")
    pix_ofs = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise UnsupportedMediaError(f"bmp: core header {hdr_size}")
    width, height = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression != 0:
        raise UnsupportedMediaError(f"bmp: compression {compression}")
    if bpp not in (8, 24):
        raise UnsupportedMediaError(f"bmp: {bpp} bpp")
    bottom_up = height > 0
    height = abs(height)
    ncomp = 1 if bpp == 8 else 3
    stride = (width * (bpp // 8) + 3) & ~3  # rows pad to 4 bytes
    need = pix_ofs + stride * height
    if len(data) < need:
        raise MediaDecodeError(f"bmp: {len(data)} bytes, need {need}")
    out = bytearray(width * height * ncomp)
    for y in range(height):
        src_y = (height - 1 - y) if bottom_up else y
        row = data[pix_ofs + src_y * stride :][: width * (bpp // 8)]
        if bpp == 8:
            out[y * width : (y + 1) * width] = row
        else:  # BGR -> RGB
            base = y * width * 3
            for x in range(width):
                out[base + 3 * x] = row[3 * x + 2]
                out[base + 3 * x + 1] = row[3 * x + 1]
                out[base + 3 * x + 2] = row[3 * x]
    return width, height, ncomp, bytes(out)


def _decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    from delphi_pdf_parser_spark.pdfcore.filters import predict

    pos = 8
    width = height = ncomp = -1
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8:
                raise UnsupportedMediaError(f"png: bit depth {depth}")
            if interlace:
                raise UnsupportedMediaError("png: interlaced")
            try:
                ncomp = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
            except KeyError:
                raise UnsupportedMediaError(f"png: color type {ctype}")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width < 0 or not idat:
        raise MediaDecodeError("png: missing IHDR/IDAT")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise MediaDecodeError(f"png: inflate: {e}")
    stride = width * ncomp
    if len(raw) < (stride + 1) * height:
        raise MediaDecodeError("png: short pixel data")
    # per-row filter-tag undo == the PDF PNG predictor (predictor >= 10)
    pixels = predict(raw, 15, ncomp, 8, width)
    return width, height, ncomp, pixels[: stride * height]


def _decode_pnm(data: bytes) -> tuple[int, int, int, bytes]:
    magic = data[:2]
    ncomp = 3 if magic == b"P6" else 1
    # header: magic, whitespace/comments, width, height, maxval, 1 ws
    pos = 2
    vals = []
    while len(vals) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos] == ord("#"):
            nl = data.find(b"\n", pos)
            pos = nl + 1 if nl >= 0 else len(data)
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        try:
            vals.append(int(data[start:pos]))
        except ValueError:
            raise MediaDecodeError("pnm: bad header token")
    pos += 1  # single whitespace after maxval
    width, height, maxval = vals
    if maxval != 255:
        raise UnsupportedMediaError(f"pnm: maxval {maxval}")
    need = width * height * ncomp
    if len(data) - pos < need:
        raise MediaDecodeError("pnm: short pixel data")
    return width, height, ncomp, data[pos : pos + need]


def encode_bmp(width: int, height: int, ncomp: int, pixels: bytes) -> bytes:
    """Minimal BMP writer (8-bit gray with palette / 24-bit RGB->BGR),
    used by synth_media to manufacture REAL deterministic payloads."""
    if ncomp == 1:
        stride = (width + 3) & ~3
        palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
        pix_ofs = 14 + 40 + len(palette)
        rows = bytearray()
        for y in range(height - 1, -1, -1):  # bottom-up
            row = pixels[y * width : (y + 1) * width]
            rows += row + b"\x00" * (stride - width)
        bpp = 8
        ncolors = 256
    elif ncomp == 3:
        stride = (width * 3 + 3) & ~3
        palette = b""
        pix_ofs = 14 + 40
        rows = bytearray()
        for y in range(height - 1, -1, -1):
            base = y * width * 3
            row = bytearray()
            for x in range(width):
                r, g, b = pixels[base + 3 * x : base + 3 * x + 3]
                row += bytes((b, g, r))
            rows += row + b"\x00" * (stride - width * 3)
        bpp = 24
        ncolors = 0
    else:
        raise ValueError(f"encode_bmp: ncomp {ncomp}")
    total = pix_ofs + len(rows)
    hdr = b"BM" + struct.pack("<IHHI", total, 0, 0, pix_ofs)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, bpp, 0, len(rows), 2835, 2835,
        ncolors, 0,
    )
    return hdr + info + palette + bytes(rows)
