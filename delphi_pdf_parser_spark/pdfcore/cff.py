"""CFF (Compact Font Format / Type1C, the /FontFile3 payload) reader —
FreeType-free recovery of what the reference's glyph-name reversal loop
gets from an embedded CFF face (src/vcl/pdf_fontss.pas:772-791):

  code --Encoding--> gid --Charset--> SID --strings--> glyph name

Only the structures the text path needs are parsed: header, INDEXes,
Top DICT (charset/Encoding/CharStrings offsets), charset formats 0/1/2,
encoding formats 0/1 (+supplements). Charstrings themselves are never
decoded. CIDFonts (Top DICT has ROS) have no glyph names — callers get
``has_glyph_names == False``, the same answer FT_HAS_GLYPH_NAMES gives.

SIDs 0-228 are the standard strings fixed by the CFF spec (public);
229-390 are the Expert-set names — none of them appear in the AGL, so
they are represented by placeholder names that likewise resolve to no
codepoint (identical extracted text: '?').
"""

from __future__ import annotations

import struct

__all__ = ["CffError", "CffFont"]


class CffError(Exception):
    pass


# CFF standard strings, SIDs 0..228 (ISOAdobe repertoire, spec order)
STD_STRINGS = (
    ".notdef", "space", "exclam", "quotedbl", "numbersign", "dollar",
    "percent", "ampersand", "quoteright", "parenleft", "parenright",
    "asterisk", "plus", "comma", "hyphen", "period", "slash", "zero",
    "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "colon", "semicolon", "less", "equal", "greater", "question",
    "at", "A", "B", "C", "D", "E", "F", "G", "H", "I", "J", "K", "L",
    "M", "N", "O", "P", "Q", "R", "S", "T", "U", "V", "W", "X", "Y",
    "Z", "bracketleft", "backslash", "bracketright", "asciicircum",
    "underscore", "quoteleft", "a", "b", "c", "d", "e", "f", "g", "h",
    "i", "j", "k", "l", "m", "n", "o", "p", "q", "r", "s", "t", "u",
    "v", "w", "x", "y", "z", "braceleft", "bar", "braceright",
    "asciitilde", "exclamdown", "cent", "sterling", "fraction", "yen",
    "florin", "section", "currency", "quotesingle", "quotedblleft",
    "guillemotleft", "guilsinglleft", "guilsinglright", "fi", "fl",
    "endash", "dagger", "daggerdbl", "periodcentered", "paragraph",
    "bullet", "quotesinglbase", "quotedblbase", "quotedblright",
    "guillemotright", "ellipsis", "perthousand", "questiondown",
    "grave", "acute", "circumflex", "tilde", "macron", "breve",
    "dotaccent", "dieresis", "ring", "cedilla", "hungarumlaut",
    "ogonek", "caron", "emdash", "AE", "ordfeminine", "Lslash",
    "Oslash", "OE", "ordmasculine", "ae", "dotlessi", "lslash",
    "oslash", "oe", "germandbls", "onesuperior", "logicalnot", "mu",
    "trademark", "Eth", "onehalf", "plusminus", "Thorn", "onequarter",
    "divide", "brokenbar", "degree", "thorn", "threequarters",
    "twosuperior", "registered", "minus", "eth", "multiply",
    "threesuperior", "copyright", "Aacute", "Acircumflex", "Adieresis",
    "Agrave", "Aring", "Atilde", "Ccedilla", "Eacute", "Ecircumflex",
    "Edieresis", "Egrave", "Iacute", "Icircumflex", "Idieresis",
    "Igrave", "Ntilde", "Oacute", "Ocircumflex", "Odieresis", "Ograve",
    "Otilde", "Scaron", "Uacute", "Ucircumflex", "Udieresis", "Ugrave",
    "Yacute", "Ydieresis", "Zcaron", "aacute", "acircumflex",
    "adieresis", "agrave", "aring", "atilde", "ccedilla", "eacute",
    "ecircumflex", "edieresis", "egrave", "iacute", "icircumflex",
    "idieresis", "igrave", "ntilde", "oacute", "ocircumflex",
    "odieresis", "ograve", "otilde", "scaron", "uacute", "ucircumflex",
    "udieresis", "ugrave", "yacute", "ydieresis", "zcaron",
) + tuple(f"sid{i}" for i in range(229, 391))
# 229-390: Expert-set names; none are AGL names, so placeholders produce
# byte-identical extracted text ('?') while staying visibly synthetic


def _index(data: bytes, pos: int):
    """Parse an INDEX at pos -> (list_of_items, end_pos)."""
    if pos + 2 > len(data):
        raise CffError("cff_truncated_index")
    count = struct.unpack_from(">H", data, pos)[0]
    pos += 2
    if count == 0:
        return [], pos
    off_size = data[pos]
    pos += 1
    if not 1 <= off_size <= 4:
        raise CffError("cff_bad_offsize")
    offs = []
    for i in range(count + 1):
        v = 0
        for b in data[pos + i * off_size:pos + (i + 1) * off_size]:
            v = (v << 8) | b
        offs.append(v)
    pos += (count + 1) * off_size
    base = pos - 1
    items = []
    for i in range(count):
        lo, hi = base + offs[i], base + offs[i + 1]
        if hi > len(data) or lo > hi:
            raise CffError("cff_bad_offsets")
        items.append(data[lo:hi])
    return items, base + offs[count]


def _parse_dict(blob: bytes) -> dict:
    """CFF DICT: operands then a 1-2 byte operator."""
    out: dict[int, list] = {}
    operands: list = []
    pos = 0
    n = len(blob)
    while pos < n:
        b0 = blob[pos]
        if b0 <= 21:  # operator
            op = b0
            pos += 1
            if b0 == 12:
                op = 0xC00 | blob[pos]
                pos += 1
            out[op] = operands
            operands = []
        elif 32 <= b0 <= 246:
            operands.append(b0 - 139)
            pos += 1
        elif 247 <= b0 <= 250:
            operands.append((b0 - 247) * 256 + blob[pos + 1] + 108)
            pos += 2
        elif 251 <= b0 <= 254:
            operands.append(-(b0 - 251) * 256 - blob[pos + 1] - 108)
            pos += 2
        elif b0 == 28:
            operands.append(struct.unpack_from(">h", blob, pos + 1)[0])
            pos += 3
        elif b0 == 29:
            operands.append(struct.unpack_from(">i", blob, pos + 1)[0])
            pos += 5
        elif b0 == 30:  # real: BCD nibbles
            pos += 1
            s = ""
            done = False
            while pos < n and not done:
                byte = blob[pos]
                pos += 1
                for nib in (byte >> 4, byte & 0xF):
                    if nib <= 9:
                        s += str(nib)
                    elif nib == 0xA:
                        s += "."
                    elif nib == 0xB:
                        s += "E"
                    elif nib == 0xC:
                        s += "E-"
                    elif nib == 0xE:
                        s += "-"
                    elif nib == 0xF:
                        done = True
                        break
            try:
                operands.append(float(s or "0"))
            except ValueError:
                operands.append(0.0)
        else:
            raise CffError("cff_bad_dict_byte")
    return out


# The CFF Standard Encoding: code -> SID (Appendix B of the spec is
# code -> name, which for codes 0-255 equals the Adobe StandardEncoding
# name table we already ship; resolved via encodings.py at load time).


class CffFont:
    """Parsed CFF: code->gid encoding, gid->name charset."""

    def __init__(self, data: bytes):
        if len(data) < 4 or data[0] != 1:
            raise CffError("cff_bad_header")
        hdr_size = data[2]
        pos = hdr_size
        _names, pos = _index(data, pos)
        top_dicts, pos = _index(data, pos)
        strings, pos = _index(data, pos)
        if not top_dicts:
            raise CffError("cff_no_topdict")
        top = _parse_dict(top_dicts[0])
        self.is_cid = 0xC1E in top  # ROS operator
        self._strings = strings

        # number of glyphs = CharStrings INDEX count (charstrings unused)
        self.n_glyphs = 0
        cs_off = top.get(17)
        if cs_off and isinstance(cs_off[0], (int, float)):
            cpos = int(cs_off[0])
            if 0 < cpos < len(data):
                self.n_glyphs = struct.unpack_from(">H", data, cpos)[0]

        # charset: gid -> SID
        self._charset: list[int] = [0]
        cso = top.get(15)
        cs_v = int(cso[0]) if cso else 0
        if self.is_cid:
            pass  # CID charsets map to CIDs, not names
        elif cs_v in (0, 1, 2):  # predefined (ISOAdobe/Expert/ExpertSubset)
            # ISOAdobe: SID i for gid i; Expert sets use expert SIDs we
            # represent as placeholders (non-AGL either way)
            self._charset = list(range(self.n_glyphs))
        else:
            self._charset = self._parse_charset(data, cs_v)

        # encoding: code -> gid
        eno = top.get(16)
        en_v = int(eno[0]) if eno else 0
        self.encoding_is_standard = False
        self._enc: dict[int, int] = {}
        if self.is_cid:
            pass  # CID fonts have no encoding
        elif en_v == 0:
            self.encoding_is_standard = True  # resolve by name at load
        elif en_v == 1:
            self.encoding_is_standard = True  # Expert: same fold path
        else:
            self._enc = self._parse_encoding(data, en_v)

    def _parse_charset(self, data: bytes, pos: int) -> list[int]:
        fmt = data[pos]
        pos += 1
        out = [0]  # gid 0 is .notdef
        if fmt == 0:
            while len(out) < self.n_glyphs:
                out.append(struct.unpack_from(">H", data, pos)[0])
                pos += 2
        elif fmt in (1, 2):
            step = 3 if fmt == 1 else 4
            while len(out) < self.n_glyphs:
                sid = struct.unpack_from(">H", data, pos)[0]
                if fmt == 1:
                    nleft = data[pos + 2]
                else:
                    nleft = struct.unpack_from(">H", data, pos + 2)[0]
                pos += step
                for k in range(nleft + 1):
                    if len(out) >= self.n_glyphs:
                        break
                    out.append(sid + k)
        else:
            raise CffError("cff_bad_charset_fmt")
        return out

    def _parse_encoding(self, data: bytes, pos: int) -> dict[int, int]:
        fmt = data[pos]
        pos += 1
        enc: dict[int, int] = {}
        base_fmt = fmt & 0x7F
        if base_fmt == 0:
            n_codes = data[pos]
            pos += 1
            for gid in range(1, n_codes + 1):
                enc[data[pos]] = gid
                pos += 1
        elif base_fmt == 1:
            n_ranges = data[pos]
            pos += 1
            gid = 1
            for _ in range(n_ranges):
                first = data[pos]
                nleft = data[pos + 1]
                pos += 2
                for k in range(nleft + 1):
                    enc[first + k] = gid
                    gid += 1
        else:
            raise CffError("cff_bad_encoding_fmt")
        if fmt & 0x80:  # supplements: code -> SID, resolve SID via charset
            n_sups = data[pos]
            pos += 1
            sid_to_gid = {sid: g for g, sid in enumerate(self._charset)}
            for _ in range(n_sups):
                code = data[pos]
                sid = struct.unpack_from(">H", data, pos + 1)[0]
                pos += 3
                g = sid_to_gid.get(sid)
                if g:
                    enc[code] = g
        return enc

    # --- the FT-equivalent surface -------------------------------------

    @property
    def has_glyph_names(self) -> bool:
        return not self.is_cid

    def sid_name(self, sid: int) -> str:
        if sid < len(STD_STRINGS):
            return STD_STRINGS[sid]
        i = sid - len(STD_STRINGS)
        if i < len(self._strings):
            return self._strings[i].decode("latin-1", "replace")
        return ""

    def glyph_name(self, gid: int) -> str | None:
        if self.is_cid or not 0 <= gid < len(self._charset):
            return None
        return self.sid_name(self._charset[gid]) or None

    def name_index(self, name: str) -> int:
        if self.is_cid:
            return 0
        for gid, sid in enumerate(self._charset):
            if self.sid_name(sid) == name:
                return gid
        return 0

    def char_index(self, code: int, std_name: str | None = None) -> int:
        """code -> gid. For the (predefined) Standard/Expert encodings the
        caller passes the code's StandardEncoding glyph NAME (std_name);
        the gid is then found through the charset."""
        if self.is_cid:
            return 0
        if self.encoding_is_standard:
            if not std_name:
                return 0
            return self.name_index(std_name)
        return self._enc.get(code, 0)
