"""Colorspace → RGB conversion for the image sink.

Reference: src/vcl/res_colorspace.pas — `cmyk_to_rgb` (:104-174, the
MuPDF trilinear device matrix, INCLUDING the ported `x := x + ...` quirk
in the 1000 term, reproduced bit-for-bit in intent here),
`gray_to_rgb` (:66), `fz_std_conv_pixmap` (:505 — float samples in
[0,1], `trunc(v * 255)` quantization, and the 256-entry 1-D lookup for
single-component spaces like Separation), and
src/vcl/pdf_color_spcasess.pas `separation_to_rgb` (:105 — tint
transform via pdf_eval_function into the alternate space, then the
alternate's to_rgb). The saveimage sink converts any non-RGB pixmap
through this path when dorgb is set (src/vcl/pdf_extracto.pas:47-53).

Everything is vectorized: one NumPy pass per image (or per 256-entry
lookup), no per-pixel Python.
"""

from __future__ import annotations

import numpy as np

from .cos import Name, to_int, to_name


def cmyk_to_rgb(cmyk: np.ndarray) -> np.ndarray:
    """(k, 4) CMYK floats in [0,1] -> (k, 3) RGB floats in [0,1].
    Exact coefficient-for-coefficient port of res_colorspace.pas:104-174
    (MuPDF's unrolled trilinear interpolation), including the reference's
    `x := x + c*m1*y1*k1` accumulation quirk in the 1000 corner — the
    parity target is the reference's output, not an idealized CMYK."""
    c, m, y, k = cmyk[:, 0], cmyk[:, 1], cmyk[:, 2], cmyk[:, 3]
    c1, m1, y1, k1 = 1 - c, 1 - m, 1 - y, 1 - k

    x = c1 * m1 * y1 * k1  # 0000
    r = x.copy()
    g = x.copy()
    b = x.copy()

    x = c1 * m1 * y1 * k  # 0001
    r += 0.1373 * x
    g += 0.1216 * x
    b += 0.1255 * x
    x = c1 * m1 * y * k1  # 0010
    r += x
    g += 0.9490 * x
    x = c1 * m1 * y * k  # 0011
    r += 0.1098 * x
    g += 0.1020 * x
    x = c1 * m * y1 * k1  # 0100
    r += 0.9255 * x
    b += 0.5490 * x
    x = c1 * m * y1 * k  # 0101
    r += 0.1412 * x
    x = c1 * m * y * k1  # 0110
    r += 0.9294 * x
    g += 0.1098 * x
    b += 0.1412 * x
    x = c1 * m * y * k  # 0111
    r += 0.1333 * x
    # reference quirk: the 1000 corner ACCUMULATES into the 0111 x
    # (res_colorspace.pas:147 `x :=x+ c * m1 * y1 * k1`)
    x = x + c * m1 * y1 * k1  # 1000 (accumulated)
    g += 0.6784 * x
    b += 0.9373 * x
    x = c * m1 * y1 * k  # 1001
    g += 0.0588 * x
    b += 0.1412 * x
    x = c * m1 * y * k1  # 1010
    g += 0.6510 * x
    b += 0.3137 * x
    x = c * m1 * y * k  # 1011
    g += 0.0745 * x
    x = c * m * y1 * k1  # 1100
    r += 0.1804 * x
    g += 0.1922 * x
    b += 0.5725 * x
    x = c * m * y1 * k  # 1101
    b += 0.0078 * x
    x = c * m * y * k1  # 1110
    r += 0.2118 * x
    g += 0.2119 * x
    b += 0.2235 * x
    # 1111 contributes nothing (black)
    out = np.stack(
        [np.clip(r, 0, 1), np.clip(g, 0, 1), np.clip(b, 0, 1)], axis=1
    )
    return out


def gray_to_rgb(gray: np.ndarray) -> np.ndarray:
    return np.repeat(gray[:, 0:1], 3, axis=1)


def _base_to_rgb(name: str, ncomp: int):
    """to_rgb converter for a device-equivalent base space, or None."""
    if ncomp == 1 and name in ("DeviceGray", "CalGray", "G", "ICCBased"):
        return gray_to_rgb
    if ncomp == 3 and name in ("DeviceRGB", "CalRGB", "RGB", "ICCBased"):
        return lambda v: v
    if ncomp == 4 and name in ("DeviceCMYK", "CMYK", "ICCBased"):
        return cmyk_to_rgb
    return None


def lab_to_rgb(v: np.ndarray) -> np.ndarray:
    """Exact port of the reference's lab_to_rgb
    (pdf_color_spcasess.pas:44-76) including its per-channel scale
    factors and sqrt gamma; inputs arrive as [0,1] byte fractions and
    are rescaled the way res_colorspace.pas:530-545 does (L = s/255*100,
    a/b = s - 128)."""
    lstar = v[:, 0] * 100.0
    astar = v[:, 1] * 255.0 - 128.0
    bstar = v[:, 2] * 255.0 - 128.0
    m = (lstar + 16.0) / 116.0
    l = m + astar / 500.0
    n = m - bstar / 200.0

    def fung(x):
        return np.where(
            x >= 6.0 / 29.0, x * x * x, (108.0 / 841.0) * (x - 4.0 / 29.0)
        )

    x, y, z = fung(l), fung(m), fung(n)
    r = (3.240449 * x - 1.537136 * y - 0.498531 * z) * 0.830026
    g = (-0.969265 * x + 1.876011 * y + 0.041556 * z) * 1.05452
    b = (0.055643 * x - 0.204026 * y + 1.057229 * z) * 1.1003
    return np.stack(
        [
            np.sqrt(np.clip(r, 0.0, 1.0)),
            np.sqrt(np.clip(g, 0.0, 1.0)),
            np.sqrt(np.clip(b, 0.0, 1.0)),
        ],
        axis=1,
    )


def to_rgb_converter(doc, cs):
    """Resolve a colorspace object to (ncomp, f) where f maps (k, ncomp)
    floats in [0,1] to (k, 3) RGB floats — or None if unsupported.
    Handles device spaces, ICCBased-by-N (MuPDF 1.0 treats ICC as its
    device equivalent), and Separation/DeviceN via the tint transform
    into a supported alternate (pdf_color_spcasess.pas:92-131)."""
    cs = doc.resolve(cs)
    if isinstance(cs, Name):
        name = str(cs)
        n = {"DeviceGray": 1, "CalGray": 1, "G": 1, "DeviceRGB": 3,
             "RGB": 3, "CalRGB": 3, "DeviceCMYK": 4, "CMYK": 4}.get(name, 0)
        f = _base_to_rgb(name if name != "ICCBased" else name, n)
        return (n, f) if f is not None else None
    if not (isinstance(cs, list) and cs):
        return None
    head = to_name(doc.resolve(cs[0]))
    if head == "ICCBased" and len(cs) > 1:
        stm = doc.resolve(cs[1])
        n = to_int(doc.get(stm, "N")) if isinstance(stm, dict) else 0
        f = _base_to_rgb("ICCBased", n)
        return (n, f) if f is not None else None
    if head == "CalGray":
        return 1, gray_to_rgb
    if head == "CalRGB":
        return 3, (lambda v: v)
    if head == "Lab":
        return 3, lab_to_rgb
    if head in ("Separation", "DeviceN") and len(cs) >= 4:
        from .functions import FunctionError, eval_function, load_function

        names = doc.resolve(cs[1])
        n_ink = 1 if head == "Separation" else (
            len(names) if isinstance(names, list) else 0
        )
        if n_ink < 1:
            return None
        alt = to_rgb_converter(doc, cs[2])
        if alt is None:
            return None
        alt_n, alt_f = alt
        try:
            tint = load_function(doc, cs[3])
        except (FunctionError, Exception):
            return None

        def sep_to_rgb(v: np.ndarray) -> np.ndarray:
            a = eval_function(tint, v)
            if a.shape[1] < alt_n:
                return np.zeros((v.shape[0], 3))
            return alt_f(np.clip(a[:, :alt_n], 0.0, 1.0))

        return n_ink, sep_to_rgb
    return None


def convert_to_rgb8(
    doc, cs, pixels: bytes, width: int, height: int, bpc: int,
    inverted: bool = False,
) -> bytes | None:
    """Raster samples in colorspace `cs` -> 8-bit RGB bytes, mirroring
    fz_std_conv_pixmap: byte -> /255.0 float, convert, trunc(v*255).
    Single-component spaces go through a 256-entry lookup exactly like
    the reference's srcn==1 fast path (one eval for the whole image).
    Returns None when the (cs, bpc) combination is unsupported."""
    conv = to_rgb_converter(doc, cs)
    if conv is None:
        return None
    ncomp, f = conv
    if bpc != 8:
        return None  # multi-component sub-byte packing: raw fallback
    need = width * height * ncomp
    if len(pixels) < need:
        return None
    arr = np.frombuffer(bytes(pixels[:need]), dtype=np.uint8)
    if inverted:
        arr = 255 - arr
    if ncomp == 1:
        # 256-entry lookup (reference srcn==1 path)
        lut_in = (np.arange(256, dtype=np.float64) / 255.0)[:, None]
        lut = np.trunc(f(lut_in) * 255).astype(np.uint8)  # (256, 3)
        rgb = lut[arr]
    else:
        v = arr.reshape(-1, ncomp).astype(np.float64) / 255.0
        rgb = np.trunc(f(v) * 255).astype(np.uint8)
    return rgb.reshape(-1).tobytes()
