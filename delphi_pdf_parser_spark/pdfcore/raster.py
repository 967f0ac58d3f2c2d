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


def _ccw(poly: np.ndarray) -> np.ndarray:
    """Normalize winding to positive signed area so a NONZERO pass over
    the whole outline set behaves as a pure union (windings add, never
    cancel)."""
    x, y = poly[:, 0], poly[:, 1]
    area = np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
    return poly if area >= 0 else poly[::-1]


def _disc(cx: float, cy: float, r: float, n: int = 16) -> np.ndarray:
    ang = np.linspace(0.0, 2.0 * np.pi, n, endpoint=False)
    return np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=1)


def dash_polyline(pts: np.ndarray, pattern, phase: float):
    """Split a polyline into its ON pieces under a PDF dash pattern
    (PDF 32000 8.4.3.6: the array cycles starting 'on', `phase` is the
    distance into the cycle at the path start). Returns a list of
    Nx2 arrays; zero-length patterns or all-zero entries yield the
    whole line."""
    pat = [float(v) for v in pattern if float(v) >= 0]
    if not pat or not any(v > 0 for v in pat):
        return [pts]
    cycle = sum(pat)
    pos = float(phase) % cycle if cycle > 0 else 0.0
    # locate position within the pattern cycle
    idx = 0
    while pos >= pat[idx]:
        pos -= pat[idx]
        idx = (idx + 1) % len(pat)
    on = idx % 2 == 0
    remain = pat[idx] - pos
    pieces = []
    cur = [pts[0]] if on else None
    for i in range(len(pts) - 1):
        a = pts[i]
        b = pts[i + 1]
        seg = b - a
        seglen = float(np.hypot(seg[0], seg[1]))
        if seglen == 0:
            continue
        t = 0.0
        while seglen - t > 1e-9:
            step = min(remain, seglen - t)
            t += step
            remain -= step
            p = a + seg * (t / seglen)
            if remain <= 1e-9:  # dash element boundary inside the segment
                if on:
                    cur.append(p)
                    if len(cur) >= 2:
                        pieces.append(np.asarray(cur))
                    cur = None
                else:
                    cur = [p]
                on = not on
                idx = (idx + 1) % len(pat)
                remain = pat[idx]
                # skip zero-length elements (degenerate dots elided);
                # each flip must keep `cur` consistent with `on`, else
                # a legal pattern like [5 0] crashes on cur=None
                while remain == 0:
                    on = not on
                    if on:
                        cur = [p]
                    else:
                        if cur is not None and len(cur) >= 2:
                            pieces.append(np.asarray(cur))
                        cur = None
                    idx = (idx + 1) % len(pat)
                    remain = pat[idx]
            elif on and t >= seglen - 1e-9:
                cur.append(b)
        if on and cur is not None and (len(cur) == 0 or not np.array_equal(cur[-1], b)):
            cur.append(b)
    if on and cur is not None and len(cur) >= 2:
        pieces.append(np.asarray(cur))
    return pieces


BUTT_CAP, ROUND_CAP, SQUARE_CAP = 0, 1, 2
MITER_JOIN, ROUND_JOIN, BEVEL_JOIN = 0, 1, 2


def stroke_outline(
    polys,
    line_width: float,
    cap: int = BUTT_CAP,
    join: int = MITER_JOIN,
    miter_limit: float = 10.0,
    dash=None,
):
    """Build the stroke outline of device-space polylines as a list of
    consistently-wound polygons (one NONZERO coverage pass = their
    union): per-segment quads + join wedges (miter with limit fallback
    to bevel / round discs / bevel triangles) + caps (butt / round /
    projecting-square). `dash` is (pattern, phase) in DEVICE units;
    closed subpaths (tail == head) take a wrap join and no caps —
    the reference strokes through fz_stroke_path's full stroke state
    (src/vcl/digtypes.pas stroke record)."""
    hw = max(line_width, 0.1) / 2.0
    out = []

    def add_join(b, d1, d2):
        cz = d1[0] * d2[1] - d1[1] * d2[0]
        dot = d1[0] * d2[0] + d1[1] * d2[1]
        if abs(cz) < 1e-9 and dot >= 0:
            return  # straight-through: segment quads already abut
        if join == ROUND_JOIN:
            out.append(_disc(b[0], b[1], hw))
            return
        side = -1.0 if cz > 0 else 1.0
        o1 = np.array([-d1[1], d1[0]]) * hw * side
        o2 = np.array([-d2[1], d2[0]]) * hw * side
        use_miter = False
        m = None
        if join == MITER_JOIN and not (abs(cz) < 1e-9):
            # intersection of the two outer edge lines:
            # b + o1 + t*d1 == b + o2 + u*d2
            rhs = o2 - o1
            det = d1[0] * (-d2[1]) - (-d2[0]) * d1[1]
            if abs(det) > 1e-12:
                t = (rhs[0] * (-d2[1]) - (-d2[0]) * rhs[1]) / det
                m = b + o1 + t * d1
                if np.hypot(*(m - b)) <= miter_limit * hw:
                    use_miter = True
        if use_miter:
            out.append(_ccw(np.array([b, b + o1, m, b + o2])))
        else:
            out.append(_ccw(np.array([b, b + o1, b + o2])))

    def add_cap(p, d):
        """Cap at endpoint p, unit direction d pointing AWAY from the
        stroked piece."""
        if cap == ROUND_CAP:
            out.append(_disc(p[0], p[1], hw))
        elif cap == SQUARE_CAP:
            n = np.array([-d[1], d[0]]) * hw
            e = d * hw
            out.append(
                _ccw(np.array([p + n, p + n + e, p - n + e, p - n]))
            )

    for poly in polys:
        pts = np.asarray(poly, dtype=np.float64)
        if len(pts) < 2:
            continue
        closed = len(pts) >= 3 and bool(np.all(pts[0] == pts[-1]))
        pieces = (
            dash_polyline(pts, dash[0], dash[1]) if dash else [pts]
        )
        whole = len(pieces) == 1 and pieces[0] is pts
        for piece in pieces:
            p = np.asarray(piece, dtype=np.float64)
            # drop zero-length segments, keep direction list aligned
            d = np.diff(p, axis=0)
            ln = np.hypot(d[:, 0], d[:, 1])
            keep = ln > 0
            if not keep.any():
                continue
            segs = []
            for i in np.nonzero(keep)[0]:
                a, b = p[i], p[i + 1]
                u = d[i] / ln[i]
                n = np.array([-u[1], u[0]]) * hw
                out.append(_ccw(np.array([a + n, b + n, b - n, a - n])))
                segs.append((a, b, u))
            for i in range(len(segs) - 1):
                add_join(segs[i][1], segs[i][2], segs[i + 1][2])
            piece_closed = closed and whole
            if piece_closed:
                add_join(segs[-1][1], segs[-1][2], segs[0][2])
            else:
                add_cap(segs[0][0], -segs[0][2])
                add_cap(segs[-1][1], segs[-1][2])
    return out


class Canvas:
    """RGB8 canvas with a clip-mask stack.

    `track_coverage=True` (transparency-group offscreens) adds a float
    per-pixel coverage/alpha plane updated by every paint under the
    Porter-Duff over rule, so the group can later be composited onto
    its backdrop with one multiply (the reference's draw device keeps
    the same group pixmap + alpha in fz_draw_begin_group,
    src/vcl/digtypes.pas:772-800)."""

    def __init__(
        self,
        width: int,
        height: int,
        bg=(255, 255, 255),
        track_coverage: bool = False,
    ):
        self.width = width
        self.height = height
        self.pix = np.empty((height, width, 3), dtype=np.uint8)
        self.pix[:] = np.asarray(bg, dtype=np.uint8)
        self.clip_stack = [np.ones((height, width), dtype=bool)]
        self.cov = (
            np.zeros((height, width), dtype=np.float64)
            if track_coverage
            else None
        )
        # blend modes normally see an opaque backdrop; an ISOLATED
        # transparency group's initial backdrop is transparent, so its
        # offscreen sets this False and B() is weighted by accumulated
        # group coverage (PDF 32000 11.4.5: Cs passes through where the
        # group has painted nothing yet)
        self.blend_seed_opaque = True
        # knockout groups (PDF 32000 11.6.6): every ELEMENT composites
        # with the group's INITIAL backdrop, not the accumulated stack,
        # and the group alpha at a pixel is the topmost element's alpha
        # (replaced, not unioned). begin_group(knockout=True) snapshots
        # the seed planes here; _blend_at then reads its backdrop from
        # the snapshot and REPLACES coverage.
        self.ko_pix = None
        self.ko_cov = None

    @property
    def clip(self) -> np.ndarray:
        return self.clip_stack[-1]

    def push_clip(self, mask: np.ndarray):
        self.clip_stack.append(self.clip & mask)

    def pop_clip(self):
        if len(self.clip_stack) > 1:
            self.clip_stack.pop()

    def _blend_at(self, ys, xs, colors, alpha, blend=None):
        """Porter-Duff OVER at the given pixel indices. `colors` is
        (n,3) float or a single rgb; `alpha` is scalar or (n,) float.
        `blend` (a BLEND_MODES callable) mixes source with the backdrop
        BEFORE compositing: C = (1-a)*Cb + a*B(Cb, Cs), PDF 32000
        11.3.5 over an opaque backdrop."""
        a = np.asarray(alpha, dtype=np.float64)
        c = np.asarray(colors, dtype=np.float64)
        ko = self.ko_pix is not None
        if blend is not None:
            base = self.ko_pix if ko else self.pix
            old = base[ys, xs].astype(np.float64) / 255.0
            src = (c[None, :] if c.ndim == 1 else c) / 255.0
            # non-separable modes index rows; give src the backdrop's shape
            src = np.broadcast_to(src, old.shape)
            if self.cov is not None and not self.blend_seed_opaque:
                cb = self.ko_cov if ko else self.cov
                ab = cb[ys, xs][:, None]
                # inside a transparent-backdrop group the canvas stores
                # coverage-PREMULTIPLIED color; B() is defined over the
                # un-premultiplied Cb (PDF 32000 11.4.5), so divide by
                # the accumulated group alpha before blending
                old_u = np.clip(
                    old / np.maximum(ab, 1e-12), 0.0, 1.0
                )
                mixed = np.clip(blend(old_u, src), 0.0, 1.0)
                mixed = src * (1.0 - ab) + mixed * ab
            else:
                mixed = np.clip(blend(old, src), 0.0, 1.0)
            c = mixed * 255.0
        if a.ndim == 0 and float(a) >= 1.0:
            self.pix[ys, xs] = np.asarray(
                np.round(c), dtype=np.uint8
            )
            if self.cov is not None:
                self.cov[ys, xs] = 1.0
            return
        af = a if a.ndim else float(a)
        old = (self.ko_pix if ko else self.pix)[ys, xs].astype(np.float64)
        if c.ndim == 1:
            c = c[None, :]
        aa = af[:, None] if np.ndim(af) else af
        self.pix[ys, xs] = np.clip(
            np.round(c * aa + old * (1.0 - aa)), 0, 255
        ).astype(np.uint8)
        if self.cov is not None:
            cov0 = self.ko_cov[ys, xs] if ko else self.cov[ys, xs]
            self.cov[ys, xs] = af + cov0 * (1.0 - af)

    def paint_mask(self, mask: np.ndarray, rgb, alpha=None, blend=None):
        """alpha: None/1.0 (opaque fast path), scalar in [0,1], or a
        full (h, w) float map (constant alpha x soft mask); `blend` is
        a BLEND_MODES callable or None (Normal)."""
        m = mask & self.clip
        if blend is None and (
            alpha is None or (np.ndim(alpha) == 0 and float(alpha) >= 1.0)
        ):
            self.pix[m] = np.asarray(rgb, dtype=np.uint8)
            if self.cov is not None:
                self.cov[m] = 1.0
            return
        ys, xs = np.nonzero(m)
        if len(ys) == 0:
            return
        a = (
            np.asarray(alpha, dtype=np.float64)[ys, xs]
            if np.ndim(alpha) == 2
            else (1.0 if alpha is None else float(alpha))
        )
        self._blend_at(ys, xs, np.asarray(rgb, dtype=np.float64), a, blend)

    def paint_image(self, mask: np.ndarray, ctm, img: np.ndarray, alpha=None, blend=None, src_alpha=None):
        """Paint a decoded (h, w, 3) image mapped through `ctm` (the PDF
        image convention: unit square -> device, image row 0 at TOP of
        the unit square's y=1 edge). Nearest-neighbor inverse sampling
        at covered pixel centers. `src_alpha` is an optional per-SOURCE-
        pixel alpha plane in [0,1] (the image's own /SMask or /Mask,
        PDF 32000 8.9.6) with its OWN dimensions — it is sampled at the
        same unit-square (u, v) as the image, so a mask whose w/h differ
        from the base image's still registers (the spec maps both onto
        the same unit square)."""
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
        ys, xs = ys[inside], xs[inside]
        cols = img[sy[inside], sx[inside]]
        if src_alpha is None and blend is None and (
            alpha is None or (np.ndim(alpha) == 0 and float(alpha) >= 1.0)
        ):
            self.pix[ys, xs] = cols
            if self.cov is not None:
                self.cov[ys, xs] = 1.0
            return
        av = (
            np.asarray(alpha, dtype=np.float64)[ys, xs]
            if np.ndim(alpha) == 2
            else (1.0 if alpha is None else float(alpha))
        )
        if src_alpha is None:
            self._blend_at(ys, xs, cols.astype(np.float64), av, blend)
            return
        sa = np.asarray(src_alpha, dtype=np.float64)
        mh, mw = sa.shape
        mx = np.clip((u[inside] * mw).astype(np.int64), 0, mw - 1)
        my = np.clip(((1.0 - v[inside]) * mh).astype(np.int64), 0, mh - 1)
        av = av * sa[my, mx]
        keep = av > 0.0
        if not keep.all():
            ys, xs, cols, av = ys[keep], xs[keep], cols[keep], av[keep]
        if len(ys) == 0:
            return
        self._blend_at(ys, xs, cols.astype(np.float64), av, blend)


# --- separable blend modes (PDF 32000 11.3.5) --------------------------------
# B(backdrop, source) on float arrays in [0,1]; the non-separable modes
# (Hue/Saturation/Color/Luminosity) are not here — callers record a
# failure code for those.

def _bl_multiply(b, s):
    return b * s


def _bl_screen(b, s):
    return b + s - b * s


def _bl_darken(b, s):
    return np.minimum(b, s)


def _bl_lighten(b, s):
    return np.maximum(b, s)


def _bl_hardlight(b, s):
    return np.where(
        s <= 0.5, _bl_multiply(b, 2.0 * s), _bl_screen(b, 2.0 * s - 1.0)
    )


def _bl_overlay(b, s):
    return _bl_hardlight(s, b)


def _bl_colordodge(b, s):
    with np.errstate(divide="ignore", invalid="ignore"):
        q = np.where(s >= 1.0, 1.0, np.minimum(1.0, b / (1.0 - s)))
    return np.where(b <= 0.0, 0.0, q)


def _bl_colorburn(b, s):
    with np.errstate(divide="ignore", invalid="ignore"):
        q = np.where(s <= 0.0, 0.0, 1.0 - np.minimum(1.0, (1.0 - b) / s))
    return np.where(b >= 1.0, 1.0, q)


def _bl_softlight(b, s):
    d = np.where(
        b <= 0.25, ((16.0 * b - 12.0) * b + 4.0) * b, np.sqrt(b)
    )
    return np.where(
        s <= 0.5,
        b - (1.0 - 2.0 * s) * b * (1.0 - b),
        b + (2.0 * s - 1.0) * (d - b),
    )


def _bl_difference(b, s):
    return np.abs(b - s)


def _bl_exclusion(b, s):
    return b + s - 2.0 * b * s


# --- non-separable blend modes (PDF 32000 11.3.5.3) --------------------------
# operate on whole (n, 3) RGB rows via the spec's Lum/Sat helpers

def _lum(c):
    return 0.3 * c[:, 0] + 0.59 * c[:, 1] + 0.11 * c[:, 2]


def _clip_color(c):
    l = _lum(c)[:, None]
    n = c.min(axis=1, keepdims=True)
    x = c.max(axis=1, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        lo = np.where(n < 0.0, l + (c - l) * l / (l - n), c)
        c = np.where(np.isfinite(lo), lo, l)
        hi = np.where(x > 1.0, l + (c - l) * (1.0 - l) / (x - l), c)
        c = np.where(np.isfinite(hi), hi, l)
    return c


def _set_lum(c, l):
    return _clip_color(c + (l - _lum(c))[:, None])


def _sat(c):
    return c.max(axis=1) - c.min(axis=1)


def _set_sat(c, s):
    mn = c.min(axis=1, keepdims=True)
    rng = c.max(axis=1, keepdims=True) - mn
    out = np.zeros_like(c)
    nz = rng[:, 0] > 0
    out[nz] = (c[nz] - mn[nz]) / rng[nz] * s[nz, None]
    return out


def _bl_hue(b, s):
    return _set_lum(_set_sat(s, _sat(b)), _lum(b))


def _bl_saturation(b, s):
    return _set_lum(_set_sat(b, _sat(s)), _lum(b))


def _bl_color(b, s):
    return _set_lum(s, _lum(b))


def _bl_luminosity(b, s):
    return _set_lum(b, _lum(s))


BLEND_MODES = {
    "Hue": _bl_hue,
    "Saturation": _bl_saturation,
    "Color": _bl_color,
    "Luminosity": _bl_luminosity,
    "Multiply": _bl_multiply,
    "Screen": _bl_screen,
    "Overlay": _bl_overlay,
    "Darken": _bl_darken,
    "Lighten": _bl_lighten,
    "ColorDodge": _bl_colordodge,
    "ColorBurn": _bl_colorburn,
    "HardLight": _bl_hardlight,
    "SoftLight": _bl_softlight,
    "Difference": _bl_difference,
    "Exclusion": _bl_exclusion,
}
