"""Minimal sfnt (TrueType) reader — a FreeType-free reproduction of the
pieces the reference consumes for embedded simple fonts
(pdf_load_simple_font, src/vcl/pdf_fontss.pas:595-862):

- charmap selection (the port's own rule, not FreeType's default: start
  from charmaps[0], then prefer (1,0) Mac Roman / (3,1) MS Unicode for
  TrueType — last match in font order wins; src/vcl/pdf_fontss.pas:607-639)
- ``ft_char_index`` lookup semantics incl. the 0xF000 symbol retry and
  the U+22EF -> U+2026 CJK workaround (src/vcl/pdf_fontss.pas:153-167)
- post-table glyph names (FT_Get_Glyph_Name / FT_Get_Name_Index /
  FT_HAS_GLYPH_NAMES used by the glyph-name reversal loop,
  src/vcl/pdf_fontss.pas:772-791)
- hmtx advances at 1000 units/em (the no-/Widths fallback ``ft_width``,
  src/vcl/pdf_fontss.pas:838-848)

Only the table formats that occur in PDF-embedded TrueType fonts are
implemented: cmap subtable formats 0/4/6/12, post 1.0/2.0/3.0.
"""

from __future__ import annotations

import struct

__all__ = ["SfntError", "SfntFont", "MAC_GLYPH_NAMES"]


class SfntError(Exception):
    pass


# The 258 standard Macintosh glyph names ('post' table format 1.0 order;
# format 2.0 indices < 258 refer into this list). Public data from the
# OpenType/TrueType specifications.
MAC_GLYPH_NAMES = (
    ".notdef", ".null", "nonmarkingreturn", "space", "exclam", "quotedbl",
    "numbersign", "dollar", "percent", "ampersand", "quotesingle",
    "parenleft", "parenright", "asterisk", "plus", "comma", "hyphen",
    "period", "slash", "zero", "one", "two", "three", "four", "five",
    "six", "seven", "eight", "nine", "colon", "semicolon", "less",
    "equal", "greater", "question", "at", "A", "B", "C", "D", "E", "F",
    "G", "H", "I", "J", "K", "L", "M", "N", "O", "P", "Q", "R", "S",
    "T", "U", "V", "W", "X", "Y", "Z", "bracketleft", "backslash",
    "bracketright", "asciicircum", "underscore", "grave", "a", "b", "c",
    "d", "e", "f", "g", "h", "i", "j", "k", "l", "m", "n", "o", "p",
    "q", "r", "s", "t", "u", "v", "w", "x", "y", "z", "braceleft",
    "bar", "braceright", "asciitilde", "Adieresis", "Aring", "Ccedilla",
    "Eacute", "Ntilde", "Odieresis", "Udieresis", "aacute", "agrave",
    "acircumflex", "adieresis", "atilde", "aring", "ccedilla", "eacute",
    "egrave", "ecircumflex", "edieresis", "iacute", "igrave",
    "icircumflex", "idieresis", "ntilde", "oacute", "ograve",
    "ocircumflex", "odieresis", "otilde", "uacute", "ugrave",
    "ucircumflex", "udieresis", "dagger", "degree", "cent", "sterling",
    "section", "bullet", "paragraph", "germandbls", "registered",
    "copyright", "trademark", "acute", "dieresis", "notequal", "AE",
    "Oslash", "infinity", "plusminus", "lessequal", "greaterequal",
    "yen", "mu", "partialdiff", "summation", "product", "pi",
    "integral", "ordfeminine", "ordmasculine", "Omega", "ae", "oslash",
    "questiondown", "exclamdown", "logicalnot", "radical", "florin",
    "approxequal", "Delta", "guillemotleft", "guillemotright",
    "ellipsis", "nonbreakingspace", "Agrave", "Atilde", "Otilde", "OE",
    "oe", "endash", "emdash", "quotedblleft", "quotedblright",
    "quoteleft", "quoteright", "divide", "lozenge", "ydieresis",
    "Ydieresis", "fraction", "currency", "guilsinglleft",
    "guilsinglright", "fi", "fl", "daggerdbl", "periodcentered",
    "quotesinglbase", "quotedblbase", "perthousand", "Acircumflex",
    "Ecircumflex", "Aacute", "Edieresis", "Egrave", "Iacute",
    "Icircumflex", "Idieresis", "Igrave", "Oacute", "Ocircumflex",
    "apple", "Ograve", "Uacute", "Ucircumflex", "Ugrave", "dotlessi",
    "circumflex", "tilde", "macron", "breve", "dotaccent", "ring",
    "cedilla", "hungarumlaut", "ogonek", "caron", "Lslash", "lslash",
    "Scaron", "scaron", "Zcaron", "zcaron", "brokenbar", "Eth", "eth",
    "Yacute", "yacute", "Thorn", "thorn", "minus", "multiply",
    "onesuperior", "twosuperior", "threesuperior", "onehalf",
    "onequarter", "threequarters", "franc", "Gbreve", "gbreve",
    "Idotaccent", "Scedilla", "scedilla", "Cacute", "cacute", "Ccaron",
    "ccaron", "dcroat",
)

_MAX_CMAP_CODE = 0x1FFFF  # simple fonts never need more (0xF000+255 max)


def _u16(b, o):
    return struct.unpack_from(">H", b, o)[0]


def _u32(b, o):
    return struct.unpack_from(">I", b, o)[0]


class _Charmap:
    __slots__ = ("platform_id", "encoding_id", "map")

    def __init__(self, platform_id: int, encoding_id: int, map_: dict):
        self.platform_id = platform_id
        self.encoding_id = encoding_id
        self.map = map_


def _parse_cmap_subtable(b: bytes, off: int) -> dict:
    fmt = _u16(b, off)
    out: dict[int, int] = {}
    if fmt == 0:
        # byte encoding table: 256 glyph ids
        for code in range(256):
            gid = b[off + 6 + code]
            if gid:
                out[code] = gid
    elif fmt == 4:
        segx2 = _u16(b, off + 6)
        nseg = segx2 // 2
        ends = off + 14
        starts = ends + segx2 + 2
        deltas = starts + segx2
        ranges = deltas + segx2
        for s in range(nseg):
            end = _u16(b, ends + 2 * s)
            start = _u16(b, starts + 2 * s)
            delta = _u16(b, deltas + 2 * s)
            roff_at = ranges + 2 * s
            roff = _u16(b, roff_at)
            if start == 0xFFFF and end == 0xFFFF:
                continue
            for code in range(start, min(end, 0xFFFE) + 1):
                if roff == 0:
                    gid = (code + delta) & 0xFFFF
                else:
                    idx = roff_at + roff + 2 * (code - start)
                    if idx + 2 > len(b):
                        continue
                    gid = _u16(b, idx)
                    if gid:
                        gid = (gid + delta) & 0xFFFF
                if gid:
                    out[code] = gid
    elif fmt == 6:
        first = _u16(b, off + 6)
        count = _u16(b, off + 8)
        for i in range(count):
            gid = _u16(b, off + 10 + 2 * i)
            if gid:
                out[first + i] = gid
    elif fmt == 12:
        ngroups = _u32(b, off + 12)
        p = off + 16
        for _ in range(ngroups):
            start, end, sgid = struct.unpack_from(">III", b, p)
            p += 12
            end = min(end, _MAX_CMAP_CODE)
            for code in range(start, end + 1):
                out[code] = sgid + (code - start)
    else:
        raise SfntError(f"cmap_format_{fmt}")
    return out


class SfntFont:
    """Parsed sfnt: charmaps (in font order), post names, hmtx advances."""

    def __init__(self, data: bytes):
        if len(data) < 12:
            raise SfntError("sfnt_too_short")
        tag = data[:4]
        if tag not in (b"\x00\x01\x00\x00", b"true", b"ttcf", b"OTTO"):
            raise SfntError("sfnt_bad_magic")
        dir_off = 0
        if tag == b"ttcf":  # TrueType collection: use the first face
            if len(data) < 16:
                raise SfntError("sfnt_too_short")
            dir_off = _u32(data, 12)
            if dir_off + 12 > len(data):
                raise SfntError("sfnt_bad_ttc")
        self._init_at(data, dir_off)

    def _init_at(self, data: bytes, dir_off: int):
        self.is_cff = data[dir_off:dir_off + 4] == b"OTTO"
        ntables = _u16(data, dir_off + 4)
        tables: dict[bytes, tuple[int, int]] = {}
        p = dir_off + 12
        for _ in range(ntables):
            if p + 16 > len(data):
                raise SfntError("sfnt_bad_directory")
            tag = data[p:p + 4]
            off = _u32(data, p + 8)
            length = _u32(data, p + 12)
            if off + length > len(data):
                raise SfntError("sfnt_table_out_of_range")
            tables[tag] = (off, length)
            p += 16
        self._data = data
        self._tables = tables

        # --- cmap ---
        self.charmaps: list[_Charmap] = []
        if b"cmap" in tables:
            coff, _clen = tables[b"cmap"]
            n = _u16(data, coff + 2)
            for i in range(n):
                pid = _u16(data, coff + 4 + 8 * i)
                eid = _u16(data, coff + 6 + 8 * i)
                sub = _u32(data, coff + 8 + 8 * i)
                try:
                    m = _parse_cmap_subtable(data, coff + sub)
                except (SfntError, struct.error, IndexError):
                    continue
                self.charmaps.append(_Charmap(pid, eid, m))

        # --- post names ---
        self.post_names: list[str] | None = None
        if b"post" in tables:
            poff, plen = tables[b"post"]
            version = _u32(data, poff)
            if version == 0x00010000:
                self.post_names = list(MAC_GLYPH_NAMES)
            elif version == 0x00020000 and plen >= 34:
                nglyphs = _u16(data, poff + 32)
                idx = [
                    _u16(data, poff + 34 + 2 * i) for i in range(nglyphs)
                    if poff + 36 + 2 * i <= poff + plen
                ]
                strings: list[str] = []
                sp = poff + 34 + 2 * nglyphs
                end = poff + plen
                while sp < end:
                    ln = data[sp]
                    strings.append(
                        data[sp + 1:sp + 1 + ln].decode("latin-1")
                    )
                    sp += 1 + ln
                names = []
                for gi in idx:
                    if gi < 258:
                        names.append(MAC_GLYPH_NAMES[gi])
                    elif gi - 258 < len(strings):
                        names.append(strings[gi - 258])
                    else:
                        names.append("")
                self.post_names = names
            # 2.5 (deprecated) and 3.0 carry no names

        # --- metrics ---
        self.units_per_em = 1000
        if b"head" in tables:
            hoff, hlen = tables[b"head"]
            if hlen >= 20:
                self.units_per_em = _u16(data, hoff + 18) or 1000
        self._advances: list[int] = []
        if b"hhea" in tables and b"hmtx" in tables:
            hhoff, hhlen = tables[b"hhea"]
            if hhlen >= 36:
                nhm = _u16(data, hhoff + 34)
                moff, mlen = tables[b"hmtx"]
                for i in range(nhm):
                    if moff + 4 * i + 2 <= moff + mlen:
                        self._advances.append(_u16(data, moff + 4 * i))

        self._name_index: dict[str, int] | None = None
        self.charmap: _Charmap | None = None  # set via select_charmap

    # --- the port's charmap selection (src/vcl/pdf_fontss.pas:607-639) ---

    def select_charmap(self, kind: str) -> None:
        """kind in {'TYPE1','TRUETYPE'} per ft_kind; last match wins."""
        cmap = self.charmaps[0] if self.charmaps else None
        for test in self.charmaps:
            if kind == "TYPE1" and test.platform_id == 7:
                cmap = test
            if kind == "TRUETYPE":
                if test.platform_id == 1 and test.encoding_id == 0:
                    cmap = test
                if test.platform_id == 3 and test.encoding_id == 1:
                    cmap = test
        self.charmap = cmap

    @property
    def charmap_is_ms_symbol(self) -> bool:
        return (
            self.charmap is not None
            and self.charmap.platform_id == 3
            and self.charmap.encoding_id == 0
        )

    # --- ft_char_index (src/vcl/pdf_fontss.pas:153-167) ---

    def char_index(self, code: int) -> int:
        if self.charmap is None:
            return 0
        m = self.charmap.map
        gid = m.get(code, 0)
        if gid == 0:
            gid = m.get(0xF000 + code, 0)
        if gid == 0 and code == 0x22EF:
            gid = m.get(0x2026, 0)
        return gid

    # --- FT_Get_Glyph_Name / FT_Get_Name_Index / FT_HAS_GLYPH_NAMES ---

    @property
    def has_glyph_names(self) -> bool:
        return self.post_names is not None

    def glyph_name(self, gid: int) -> str | None:
        if self.post_names is not None and 0 <= gid < len(self.post_names):
            return self.post_names[gid] or None
        return None

    def name_index(self, name: str) -> int:
        if self.post_names is None:
            return 0
        if self._name_index is None:
            # first occurrence wins (FT returns the first matching gid)
            rev: dict[str, int] = {}
            for gid, nm in enumerate(self.post_names):
                if nm and nm not in rev:
                    rev[nm] = gid
            self._name_index = rev
        return self._name_index.get(name, 0)

    # --- ft_width: advance at 1000 units/em (pdf_fontss.pas:838-848) ---

    def advance1000(self, gid: int) -> int:
        if not self._advances or gid < 0:
            return 0
        adv = self._advances[min(gid, len(self._advances) - 1)]
        return int(round(adv * 1000.0 / self.units_per_em))
