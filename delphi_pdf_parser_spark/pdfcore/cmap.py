"""CMap machinery: structure, lookup, decode, and the CMap parser.

Mirrors src/vcl/pdf_cmapss.pas (structure/lookup/decode) and
src/vcl/pdf_camp_parses.pas (the PostScript-ish parser for embedded CMaps
and ToUnicode streams):

- ranges are (low, high, flag, offset) with flags SINGLE/RANGE/TABLE/MULTI,
  kept sorted by low; lookup is binary search with usecmap chaining
- codespace ranges are (nbytes, low, high); decode takes the first 1..4-byte
  prefix landing inside a codespace, else consumes 1 byte and yields 0
  (pdf_decode_cmap, src/vcl/pdf_cmapss.pas:495-519)
- the identity CMap maps 0..0xffff to itself with a single codespace of
  ``bytes`` width (pdf_new_identity_cmap, src/vcl/pdf_camp_loads.pas:103-126)
- predefined CMap names: Identity-H/V are built-in; the CJK system CMap
  collections (Adobe-GB1 etc.) are not bundled — a font that names one
  surfaces a ``system_cmap:<name>`` decode-failure code instead (the
  reference compiles ~50 kLoC of CJK tables; shipping them is data work
  deferred to a later round, tracked in SURVEY §2 A34)
"""

from __future__ import annotations

from bisect import bisect_right

from . import lexer as lx
from .lexer import Lexer

SINGLE, RANGE, TABLE, MULTI = 0, 1, 2, 3


class CMap:
    __slots__ = (
        "name",
        "wmode",
        "usecmap",
        "codespaces",
        "ranges",
        "table",
        "_lows",
        "_sorted",
        "_np",
    )

    def __init__(self, name: str = ""):
        self.name = name
        self.wmode = 0
        self.usecmap: CMap | None = None
        self.codespaces: list[tuple[int, int, int]] = []  # (nbytes, low, high)
        self.ranges: list[list[int]] = []  # [low, high, flag, offset]
        self.table: list[int] = []
        self._lows: list[int] = []
        self._sorted = False
        self._np = None  # cached (ranges, lows) int64 arrays for lookup_arrays

    # --- construction --------------------------------------------------------
    def add_codespace(self, low: int, high: int, n: int):
        if len(self.codespaces) < 40:
            self.codespaces.append((n, low, high))

    def map_range_to_range(self, low: int, high: int, offset: int):
        flag = SINGLE if high - low == 0 else RANGE
        self.ranges.append([low, high, flag, offset])
        self._sorted = False

    def map_one_to_many(self, low: int, values: list[int]):
        if len(values) == 1:
            self.ranges.append([low, low, SINGLE, values[0]])
            self._sorted = False
            return
        values = values[:8]
        if (
            len(values) == 2
            and 0xD800 <= values[0] <= 0xDBFF
            and 0xDC00 <= values[1] <= 0xDFFF
        ):
            return  # reference ignores surrogate-pair mappings
        offset = len(self.table)
        self.table.append(len(values))
        self.table.extend(values)
        self.ranges.append([low, low, MULTI, offset])
        self._sorted = False

    def set_usecmap(self, usecmap: "CMap"):
        self.usecmap = usecmap
        if not self.codespaces:
            self.codespaces = list(usecmap.codespaces)

    def sort(self):
        """pdf_sort_cmap1: sort by low. (Range coalescing in the reference
        is a space optimization, not a semantic one — lookups agree.)"""
        self.ranges.sort(key=lambda r: r[0])
        self._lows = [r[0] for r in self.ranges]
        self._sorted = True
        self._np = None

    # --- lookup ---------------------------------------------------------------
    def _find(self, cpt: int):
        if not self._sorted:
            self.sort()
        i = bisect_right(self._lows, cpt) - 1
        if i >= 0:
            r = self.ranges[i]
            if r[0] <= cpt <= r[1]:
                return r
        return None

    def lookup(self, cpt: int) -> int:
        """pdf_lookup_cmap: returns CID or -1."""
        r = self._find(cpt)
        if r is not None:
            low, _high, flag, offset = r
            i = cpt - low + offset
            if flag == TABLE:
                return self.table[i]
            if flag == MULTI:
                return -1
            return i
        if self.usecmap is not None:
            return self.usecmap.lookup(cpt)
        return -1

    def lookup_full(self, cpt: int) -> list[int]:
        """pdf_lookup_cmap_full: returns [] when unmapped."""
        r = self._find(cpt)
        if r is not None:
            low, _high, flag, offset = r
            if flag == TABLE:
                return [self.table[cpt - low + offset]]
            if flag == MULTI:
                n = self.table[offset]
                return self.table[offset + 1 : offset + 1 + n]
            return [cpt - low + offset]
        if self.usecmap is not None:
            return self.usecmap.lookup_full(cpt)
        return []

    def lookup_arrays(self, codes):
        """Vectorized pdf_lookup_cmap over an int64 NumPy array — same
        binary-search-last-low semantics as _find, evaluated for every
        code at once (the ToUnicode build scans 64Ki codes per CID font;
        per-code bisects were 90% of extraction time on CJK documents).

        Returns (val, kind) int64/int8 arrays: kind 0 = unmapped,
        1 = single value in val (SINGLE/RANGE arithmetic or TABLE
        gather), 2 = MULTI with val = the table offset. usecmap chains
        exactly like the scalar path (only unmapped positions fall
        through)."""
        import numpy as np

        if not self._sorted:
            self.sort()
        val = np.full(codes.shape, -1, dtype=np.int64)
        kind = np.zeros(codes.shape, dtype=np.int8)
        if self.ranges:
            if self._np is None:
                self._np = (
                    np.array(self.ranges, dtype=np.int64),
                    np.array(self._lows, dtype=np.int64),
                )
            arr, lows = self._np
            idx = np.searchsorted(lows, codes, side="right") - 1
            okpos = idx >= 0
            idx0 = np.where(okpos, idx, 0)
            low = arr[idx0, 0]
            high = arr[idx0, 1]
            flag = arr[idx0, 2]
            off = arr[idx0, 3]
            inr = okpos & (codes >= low) & (codes <= high)
            sr = inr & ((flag == SINGLE) | (flag == RANGE))
            val[sr] = codes[sr] - low[sr] + off[sr]
            kind[sr] = 1
            tb = inr & (flag == TABLE)
            if tb.any():
                t = np.array(self.table, dtype=np.int64)
                val[tb] = t[codes[tb] - low[tb] + off[tb]]
                kind[tb] = 1
            mu = inr & (flag == MULTI)
            val[mu] = off[mu]
            kind[mu] = 2
        if self.usecmap is not None:
            un = kind == 0
            if un.any():
                v2, k2 = self.usecmap.lookup_arrays(codes[un])
                val[un] = v2
                kind[un] = k2
        return val, kind

    def decode(self, buf: bytes, pos: int) -> tuple[int, int]:
        """pdf_decode_cmap: longest(first)-codespace-match over 1..4 bytes.
        Returns (codepoint, new_pos)."""
        c = 0
        end = len(buf)
        for n in range(4):
            if pos + n >= end:
                break
            c = (c << 8) | buf[pos + n]
            for cs_n, cs_low, cs_high in self.codespaces:
                if cs_n == n + 1 and cs_low <= c <= cs_high:
                    return c, pos + n + 1
        return 0, pos + 1


def identity_cmap(wmode: int, nbytes: int) -> CMap:
    cmap = CMap("Identity-V" if wmode else "Identity-H")
    cmap.add_codespace(0x0000, 0xFFFF, nbytes)
    cmap.map_range_to_range(0x0000, 0xFFFF, 0)
    cmap.sort()
    cmap.wmode = wmode
    return cmap


class SystemCMapUnavailable(Exception):
    def __init__(self, name: str):
        super().__init__(name)
        self.name = name


_CJK_NPZ = None
_CJK_CACHE: dict[str, CMap] = {}


def _cjk_data():
    """Lazy-load the predefined-CMap data module (generated by
    tools/gen_cjk_cmaps.py from Adobe's published cmap tables). Loaded
    once per executor process — the broadcast-once semantics of
    SURVEY §2.A A34."""
    global _CJK_NPZ
    if _CJK_NPZ is None:
        import os

        import numpy as np

        path = os.path.join(os.path.dirname(__file__), "data", "cjk_cmaps.npz")
        _CJK_NPZ = np.load(path) if os.path.exists(path) else False
    return _CJK_NPZ


def _load_packed_cmap(name: str, npz) -> CMap:
    ranges = npz[f"{name}/ranges"]
    table = npz[f"{name}/table"]
    codespaces = npz[f"{name}/codespaces"]
    wmode = int(npz[f"{name}/meta"][0])
    use = str(npz[f"{name}/use"][0])
    cmap = CMap(name)
    cmap.wmode = wmode
    cmap.codespaces = [
        (int(n), int(lo), int(hi)) for n, lo, hi in codespaces.tolist()
    ]
    # packed rows: (low, extent_flags, offset); high = low + (ef >> 2),
    # flag = ef & 3 (same packing as pdf_range_s)
    cmap.ranges = [
        [low, low + (ef >> 2), ef & 3, off]
        for low, ef, off in ranges.tolist()
    ]
    cmap.table = table.tolist()
    cmap.sort()
    if use:
        # set_usecmap also inherits codespaces when this cmap has none
        # (V variants rely on their H parent's codespaces)
        cmap.set_usecmap(load_system_cmap(use))
    return cmap


def load_system_cmap(name: str) -> CMap:
    if name == "Identity-H":
        return identity_cmap(0, 2)
    if name == "Identity-V":
        return identity_cmap(1, 2)
    cached = _CJK_CACHE.get(name)
    if cached is not None:
        return cached
    npz = _cjk_data()
    if npz is not False and f"{name}/ranges" in npz:
        cmap = _load_packed_cmap(name, npz)
        _CJK_CACHE[name] = cmap
        return cmap
    raise SystemCMapUnavailable(name)


# --- CMap parsing (embedded CMap / ToUnicode streams) -----------------------

_CMAP_OPS = {
    b"usecmap",
    b"begincodespacerange",
    b"endcodespacerange",
    b"begincidrange",
    b"endcidrange",
    b"begincidchar",
    b"endcidchar",
    b"beginbfrange",
    b"endbfrange",
    b"beginbfchar",
    b"endbfchar",
}


def _code_from_bytes(b: bytes) -> int:
    a = 0
    for c in b:
        a = (a << 8) | c
    return a


class CMapParseError(Exception):
    pass


def parse_cmap(data: bytes) -> CMap:
    """pdf_parse_cmap (src/vcl/pdf_camp_parses.pas:533-...)."""
    cmap = CMap()
    lex = Lexer(data)
    prev_name: str | None = None
    while True:
        tok, val = lex.lex()
        if tok == lx.TOK_EOF:
            break
        if tok == lx.TOK_NAME:
            prev_name = val
            continue
        if tok == lx.TOK_INT:
            prev_int = val
            continue
        if tok != lx.TOK_KEYWORD:
            continue
        kw = val
        if kw == b"usecmap":
            if prev_name:
                try:
                    cmap.set_usecmap(load_system_cmap(prev_name))
                except SystemCMapUnavailable:
                    raise
            continue
        if kw == b"endcmap":
            break
        if kw == b"begincodespacerange":
            _parse_codespace(cmap, lex)
        elif kw == b"begincidrange":
            _parse_cid_range(cmap, lex)
        elif kw == b"begincidchar":
            _parse_cid_char(cmap, lex)
        elif kw == b"beginbfrange":
            _parse_bf_range(cmap, lex)
        elif kw == b"beginbfchar":
            _parse_bf_char(cmap, lex)
        # CMapName /x def and WMode n def arrive as NAME/INT then 'def';
        # handled via the prev_* trackers below
        elif kw == b"def":
            pass
    # second pass conveniences: CMapName and WMode were tracked by the
    # reference via dedicated parse functions keyed on the *keyword names*
    # 'CMapName'/'WMode', which arrive as /CMapName <name> def. Scan again:
    _scan_header(cmap, data)
    cmap.sort()
    return cmap


def _scan_header(cmap: CMap, data: bytes):
    i = data.find(b"/CMapName")
    if i >= 0:
        sub = Lexer(data, i)
        sub.lex()  # /CMapName
        tok, val = sub.lex()
        if tok == lx.TOK_NAME:
            cmap.name = val
    i = data.find(b"/WMode")
    if i >= 0:
        sub = Lexer(data, i)
        sub.lex()
        tok, val = sub.lex()
        if tok == lx.TOK_INT:
            cmap.wmode = val


def _parse_codespace(cmap: CMap, lex: Lexer):
    while True:
        tok, val = lex.lex()
        if tok == lx.TOK_KEYWORD and val == b"endcodespacerange":
            return
        if tok != lx.TOK_STRING:
            raise CMapParseError("expected string or endcodespacerange")
        lo = _code_from_bytes(val)
        n = len(val)
        tok, val = lex.lex()
        if tok != lx.TOK_STRING:
            raise CMapParseError("expected string")
        hi = _code_from_bytes(val)
        cmap.add_codespace(lo, hi, n)


def _parse_cid_range(cmap: CMap, lex: Lexer):
    while True:
        tok, val = lex.lex()
        if tok == lx.TOK_KEYWORD and val == b"endcidrange":
            return
        if tok != lx.TOK_STRING:
            raise CMapParseError("expected string or endcidrange")
        lo = _code_from_bytes(val)
        tok, val = lex.lex()
        if tok != lx.TOK_STRING:
            raise CMapParseError("expected string")
        hi = _code_from_bytes(val)
        tok, val = lex.lex()
        if tok != lx.TOK_INT:
            raise CMapParseError("expected integer")
        cmap.map_range_to_range(lo, hi, val)


def _parse_cid_char(cmap: CMap, lex: Lexer):
    while True:
        tok, val = lex.lex()
        if tok == lx.TOK_KEYWORD and val == b"endcidchar":
            return
        if tok != lx.TOK_STRING:
            raise CMapParseError("expected string or endcidchar")
        src = _code_from_bytes(val)
        tok, val = lex.lex()
        if tok != lx.TOK_INT:
            raise CMapParseError("expected integer")
        cmap.map_range_to_range(src, src, val)


def _values_from_utf16be(b: bytes) -> list[int]:
    return [_code_from_bytes(b[i : i + 2]) for i in range(0, (len(b) // 2) * 2, 2)]


def _parse_bf_char(cmap: CMap, lex: Lexer):
    while True:
        tok, val = lex.lex()
        if tok == lx.TOK_KEYWORD and val == b"endbfchar":
            return
        if tok != lx.TOK_STRING:
            raise CMapParseError("expected string or endbfchar")
        src = _code_from_bytes(val)
        tok, val = lex.lex()
        if tok != lx.TOK_STRING:
            raise CMapParseError("expected string")
        vals = _values_from_utf16be(val)
        if vals:
            cmap.map_one_to_many(src, vals)


def _parse_bf_range(cmap: CMap, lex: Lexer):
    while True:
        tok, val = lex.lex()
        if tok == lx.TOK_KEYWORD and val == b"endbfrange":
            return
        if tok != lx.TOK_STRING:
            raise CMapParseError("expected string or endbfrange")
        lo = _code_from_bytes(val)
        tok, val = lex.lex()
        if tok != lx.TOK_STRING:
            raise CMapParseError("expected string")
        hi = _code_from_bytes(val)
        tok, val = lex.lex()
        if tok == lx.TOK_STRING:
            if len(val) == 2:
                cmap.map_range_to_range(lo, hi, _code_from_bytes(val))
            else:
                vals = _values_from_utf16be(val)
                if vals:
                    cur = lo
                    while cur <= hi:
                        # the port increments the last value BEFORE each
                        # mapping (src/vcl/pdf_camp_parses.pas:441-446), an
                        # off-by-one vs upstream MuPDF we reproduce
                        vals[-1] += 1
                        cmap.map_one_to_many(cur, list(vals))
                        cur += 1
        elif tok == lx.TOK_OPEN_ARRAY:
            cur = lo
            while True:
                tok, val = lex.lex()
                if tok == lx.TOK_CLOSE_ARRAY:
                    break
                if tok != lx.TOK_STRING:
                    raise CMapParseError("expected string or ]")
                vals = _values_from_utf16be(val)
                if vals:
                    cmap.map_one_to_many(cur, vals)
                cur += 1
        else:
            raise CMapParseError("expected string or array or endbfrange")
