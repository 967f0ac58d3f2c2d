"""Scanline rasterization geometry for the page-render sink (A43).

The reference renders through FreeType + its fz draw device
(src/vcl/draw_devicess.pas + draw_* units, ~7.5 kLoC of C-translated
span blitters). This module is the from-scratch NumPy reformulation of
the parts a PDF page render needs: flatten beziers to polylines,
scanline-fill polygon sets under the nonzero / even-odd winding rules,
approximate strokes as per-segment quads, and sample images through an
affine inverse map. Pixel centers sit at (x+0.5, y+0.5), no
anti-aliasing (hard coverage — the fixtures assert pixel truth away
from edges, and coverage parity is documented rather than blended).
"""

from __future__ import annotations

import numpy as np

NONZERO = 0
EVENODD = 1


def flatten_cubic(p0, p1, p2, p3, steps: int = 16):
    """Cubic bezier -> list of points (excluding p0)."""
    t = np.linspace(0.0, 1.0, steps + 1)[1:]
    mt = 1.0 - t
    x = (
        mt**3 * p0[0]
        + 3 * mt**2 * t * p1[0]
        + 3 * mt * t**2 * p2[0]
        + t**3 * p3[0]
    )
    y = (
        mt**3 * p0[1]
        + 3 * mt**2 * t * p1[1]
        + 3 * mt * t**2 * p2[1]
        + t**3 * p3[1]
    )
    return list(zip(x.tolist(), y.tolist()))


def flatten_quad(p0, p1, p2, steps: int = 12):
    """Quadratic bezier -> list of points (excluding p0)."""
    t = np.linspace(0.0, 1.0, steps + 1)[1:]
    mt = 1.0 - t
    x = mt**2 * p0[0] + 2 * mt * t * p1[0] + t**2 * p2[0]
    y = mt**2 * p0[1] + 2 * mt * t * p1[1] + t**2 * p2[1]
    return list(zip(x.tolist(), y.tolist()))


def transform_poly(poly, m):
    """Apply affine (a,b,c,d,e,f) to an Nx2 point list -> float array."""
    a, b, c, d, e, f = m
    pts = np.asarray(poly, dtype=np.float64)
    if len(pts) == 0:
        return pts.reshape(0, 2)
    out = np.empty_like(pts)
    out[:, 0] = pts[:, 0] * a + pts[:, 1] * c + e
    out[:, 1] = pts[:, 0] * b + pts[:, 1] * d + f
    return out


def coverage_mask(
    polys, width: int, height: int, rule: int = NONZERO
) -> np.ndarray:
    """Rasterize closed polygons -> bool (height, width) coverage mask.

    polys: iterable of Nx2 float arrays in DEVICE coordinates (y down).
    A pixel (x, y) is covered when its center (x+0.5, y+0.5) is inside
    the polygon set under `rule`.
    """
    mask = np.zeros((height, width), dtype=bool)
    edges = []
    for poly in polys:
        pts = np.asarray(poly, dtype=np.float64)
        if len(pts) < 3:
            continue
        closed = np.vstack([pts, pts[:1]])
        x0, y0 = closed[:-1, 0], closed[:-1, 1]
        x1, y1 = closed[1:, 0], closed[1:, 1]
        keep = y0 != y1
        if keep.any():
            edges.append(
                np.stack([x0[keep], y0[keep], x1[keep], y1[keep]], axis=1)
            )
    if not edges:
        return mask
    E = np.concatenate(edges)
    ex0, ey0, ex1, ey1 = E[:, 0], E[:, 1], E[:, 2], E[:, 3]
    winding = np.where(ey1 > ey0, 1, -1)
    ymin_e = np.minimum(ey0, ey1)
    ymax_e = np.maximum(ey0, ey1)
    y_lo = max(0, int(np.floor(ymin_e.min() - 0.5)))
    y_hi = min(height - 1, int(np.ceil(ymax_e.max())))
    for y in range(y_lo, y_hi + 1):
        yc = y + 0.5
        hit = (ymin_e <= yc) & (yc < ymax_e)  # half-open: no double count
        if not hit.any():
            continue
        t = (yc - ey0[hit]) / (ey1[hit] - ey0[hit])
        xs = ex0[hit] + t * (ex1[hit] - ex0[hit])
        ws = winding[hit]
        order = np.argsort(xs, kind="stable")
        xs, ws = xs[order], ws[order]
        if rule == EVENODD:
            spans = list(zip(xs[0::2], xs[1::2]))
        else:
            spans = []
            acc = 0
            start = None
            for xi, wi in zip(xs, ws):
                prev = acc
                acc += int(wi)
                if prev == 0 and acc != 0:
                    start = xi
                elif prev != 0 and acc == 0 and start is not None:
                    spans.append((start, xi))
                    start = None
        row = mask[y]
        for xa, xb in spans:
            i0 = int(np.ceil(xa - 0.5))
            i1 = int(np.ceil(xb - 0.5))  # exclusive
            if i1 > 0 and i0 < width:
                row[max(i0, 0) : min(i1, width)] = True
    return mask


def stroke_polys(polys, line_width: float):
    """Approximate a stroke as one quad per segment (butt caps, no
    joins — the render sink's documented stroke fidelity level; MuPDF
    builds true stroke outlines in fz_stroke_path)."""
    hw = max(line_width, 0.1) / 2.0
    quads = []
    for poly in polys:
        pts = np.asarray(poly, dtype=np.float64)
        for i in range(len(pts) - 1):
            (xa, ya), (xb, yb) = pts[i], pts[i + 1]
            dx, dy = xb - xa, yb - ya
            n = (dx * dx + dy * dy) ** 0.5
            if n == 0:
                continue
            nx, ny = -dy / n * hw, dx / n * hw
            quads.append(
                np.array(
                    [
                        [xa + nx, ya + ny],
                        [xb + nx, yb + ny],
                        [xb - nx, yb - ny],
                        [xa - nx, ya - ny],
                    ]
                )
            )
    return quads


class Canvas:
    """RGB8 canvas with a clip-mask stack."""

    def __init__(self, width: int, height: int, bg=(255, 255, 255)):
        self.width = width
        self.height = height
        self.pix = np.empty((height, width, 3), dtype=np.uint8)
        self.pix[:] = np.asarray(bg, dtype=np.uint8)
        self.clip_stack = [np.ones((height, width), dtype=bool)]

    @property
    def clip(self) -> np.ndarray:
        return self.clip_stack[-1]

    def push_clip(self, mask: np.ndarray):
        self.clip_stack.append(self.clip & mask)

    def pop_clip(self):
        if len(self.clip_stack) > 1:
            self.clip_stack.pop()

    def paint_mask(self, mask: np.ndarray, rgb):
        m = mask & self.clip
        self.pix[m] = np.asarray(rgb, dtype=np.uint8)

    def paint_image(self, mask: np.ndarray, ctm, img: np.ndarray):
        """Paint a decoded (h, w, 3) image mapped through `ctm` (the PDF
        image convention: unit square -> device, image row 0 at TOP of
        the unit square's y=1 edge). Nearest-neighbor inverse sampling
        at covered pixel centers."""
        a, b, c, d, e, f = ctm
        det = a * d - b * c
        if det == 0:
            return
        ia, ib = d / det, -b / det
        ic, id_ = -c / det, a / det
        ie = -(e * ia + f * ic)
        if_ = -(e * ib + f * id_)
        m = mask & self.clip
        ys, xs = np.nonzero(m)
        if len(ys) == 0:
            return
        px = xs + 0.5
        py = ys + 0.5
        u = px * ia + py * ic + ie
        v = px * ib + py * id_ + if_
        ih, iw = img.shape[0], img.shape[1]
        sx = np.clip((u * iw).astype(np.int64), 0, iw - 1)
        sy = np.clip(((1.0 - v) * ih).astype(np.int64), 0, ih - 1)
        inside = (u >= 0) & (u < 1) & (v >= 0) & (v < 1)
        self.pix[ys[inside], xs[inside]] = img[sy[inside], sx[inside]]
