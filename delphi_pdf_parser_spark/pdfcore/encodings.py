"""Base encodings, PdfDocEncoding and the Adobe Glyph List lookup.

The four base encodings are Adobe's published tables (PDF 1.7 spec,
Appendix D); the reference ships the same data
(src/vcl/digtypes.pas:1149/1190/1231/1284). ``lookup_agl`` mirrors
pdf_lookup_agl (src/vcl/pdf_encodings.pas:46-113) including its
algorithmic forms — and its quirks: ``uniXXXX`` parses as hex but the
``uXXXX`` branch parses the suffix as DECIMAL, and ``aNNN`` (len >= 3)
parses as decimal too. Suffixes after the first '.' or '_' are stripped
before lookup.
"""

from __future__ import annotations

_N = None  # .notdef


def _tab(prefix32_to: str) -> list:
    return [_N] * 32 + prefix32_to.split() + [_N] * 0


_ASCII_NAMES = (
    "space exclam quotedbl numbersign dollar percent ampersand {q27} "
    "parenleft parenright asterisk plus comma hyphen period slash "
    "zero one two three four five six seven eight nine colon semicolon "
    "less equal greater question at A B C D E F G H I J K L M N O P Q R S "
    "T U V W X Y Z bracketleft backslash bracketright asciicircum "
    "underscore {q60} a b c d e f g h i j k l m n o p q r s t u v w x y z "
    "braceleft bar braceright asciitilde"
)

STANDARD_ENCODING: list = (
    [_N] * 32
    + _ASCII_NAMES.format(q27="quoteright", q60="quoteleft").split()
    + [_N]  # 127
    + [_N] * 33  # 128..160 (161 starts exclamdown)
)
STANDARD_ENCODING[161:256] = [
    "exclamdown", "cent", "sterling", "fraction", "yen", "florin", "section",
    "currency", "quotesingle", "quotedblleft", "guillemotleft",
    "guilsinglleft", "guilsinglright", "fi", "fl", _N, "endash", "dagger",
    "daggerdbl", "periodcentered", _N, "paragraph", "bullet",
    "quotesinglbase", "quotedblbase", "quotedblright", "guillemotright",
    "ellipsis", "perthousand", _N, "questiondown", _N, "grave", "acute",
    "circumflex", "tilde", "macron", "breve", "dotaccent", "dieresis", _N,
    "ring", "cedilla", _N, "hungarumlaut", "ogonek", "caron", "emdash",
    _N, _N, _N, _N, _N, _N, _N, _N, _N, _N, _N, _N, _N, _N, _N, _N, "AE",
    _N, "ordfeminine", _N, _N, _N, _N, "Lslash", "Oslash", "OE",
    "ordmasculine", _N, _N, _N, _N, _N, "ae", _N, _N, _N, "dotlessi",
    _N, _N, "lslash", "oslash", "oe", "germandbls", _N, _N, _N, _N,
]

WIN_ANSI_ENCODING: list = (
    [_N] * 32
    + _ASCII_NAMES.format(q27="quotesingle", q60="grave").split()
    + ["bullet"]  # 127
)
WIN_ANSI_ENCODING += [
    "Euro", "bullet", "quotesinglbase", "florin", "quotedblbase", "ellipsis",
    "dagger", "daggerdbl", "circumflex", "perthousand", "Scaron",
    "guilsinglleft", "OE", "bullet", "Zcaron", "bullet", "bullet",
    "quoteleft", "quoteright", "quotedblleft", "quotedblright", "bullet",
    "endash", "emdash", "tilde", "trademark", "scaron", "guilsinglright",
    "oe", "bullet", "zcaron", "Ydieresis", "space", "exclamdown", "cent",
    "sterling", "currency", "yen", "brokenbar", "section", "dieresis",
    "copyright", "ordfeminine", "guillemotleft", "logicalnot", "hyphen",
    "registered", "macron", "degree", "plusminus", "twosuperior",
    "threesuperior", "acute", "mu", "paragraph", "periodcentered",
    "cedilla", "onesuperior", "ordmasculine", "guillemotright",
    "onequarter", "onehalf", "threequarters", "questiondown", "Agrave",
    "Aacute", "Acircumflex", "Atilde", "Adieresis", "Aring", "AE",
    "Ccedilla", "Egrave", "Eacute", "Ecircumflex", "Edieresis", "Igrave",
    "Iacute", "Icircumflex", "Idieresis", "Eth", "Ntilde", "Ograve",
    "Oacute", "Ocircumflex", "Otilde", "Odieresis", "multiply", "Oslash",
    "Ugrave", "Uacute", "Ucircumflex", "Udieresis", "Yacute", "Thorn",
    "germandbls", "agrave", "aacute", "acircumflex", "atilde", "adieresis",
    "aring", "ae", "ccedilla", "egrave", "eacute", "ecircumflex",
    "edieresis", "igrave", "iacute", "icircumflex", "idieresis", "eth",
    "ntilde", "ograve", "oacute", "ocircumflex", "otilde", "odieresis",
    "divide", "oslash", "ugrave", "uacute", "ucircumflex", "udieresis",
    "yacute", "thorn", "ydieresis",
]

MAC_ROMAN_ENCODING: list = (
    [_N] * 32
    + _ASCII_NAMES.format(q27="quotesingle", q60="grave").split()
    + [_N]  # 127
)
MAC_ROMAN_ENCODING += [
    "Adieresis", "Aring", "Ccedilla", "Eacute", "Ntilde", "Odieresis",
    "Udieresis", "aacute", "agrave", "acircumflex", "adieresis", "atilde",
    "aring", "ccedilla", "eacute", "egrave", "ecircumflex", "edieresis",
    "iacute", "igrave", "icircumflex", "idieresis", "ntilde", "oacute",
    "ograve", "ocircumflex", "odieresis", "otilde", "uacute", "ugrave",
    "ucircumflex", "udieresis", "dagger", "degree", "cent", "sterling",
    "section", "bullet", "paragraph", "germandbls", "registered",
    "copyright", "trademark", "acute", "dieresis", _N, "AE", "Oslash",
    _N, "plusminus", _N, _N, "yen", "mu", _N, _N, _N, _N, _N,
    "ordfeminine", "ordmasculine", _N, "ae", "oslash", "questiondown",
    "exclamdown", "logicalnot", _N, "florin", _N, _N, "guillemotleft",
    "guillemotright", "ellipsis", "space", "Agrave", "Atilde", "Otilde",
    "OE", "oe", "endash", "emdash", "quotedblleft", "quotedblright",
    "quoteleft", "quoteright", "divide", _N, "ydieresis", "Ydieresis",
    "fraction", "currency", "guilsinglleft", "guilsinglright", "fi", "fl",
    "daggerdbl", "periodcentered", "quotesinglbase", "quotedblbase",
    "perthousand", "Acircumflex", "Ecircumflex", "Aacute", "Edieresis",
    "Egrave", "Iacute", "Icircumflex", "Idieresis", "Igrave", "Oacute",
    "Ocircumflex", _N, "Ograve", "Uacute", "Ucircumflex", "Ugrave",
    "dotlessi", "circumflex", "tilde", "macron", "breve", "dotaccent",
    "ring", "cedilla", "hungarumlaut", "ogonek", "caron",
]

# MacExpert contains specialist glyphs with no AGL codepoints for most
# names; included for completeness of /BaseEncoding resolution.
MAC_EXPERT_ENCODING: list = [_N] * 256
for _i, _nm in [
    (32, "space"), (44, "comma"), (45, "hyphen"), (46, "period"),
    (47, "fraction"), (58, "colon"), (59, "semicolon"),
    (86, "ff"), (87, "fi"), (88, "fl"), (89, "ffi"), (90, "ffl"),
]:
    MAC_EXPERT_ENCODING[_i] = _nm

# Adobe Symbol font built-in encoding (Greek + math core; specialist
# glyphs without AGL codepoints are omitted and fold to '?')
SYMBOL_ENCODING: list = [_N] * 256
for _i, _nm in list(
    {
        0x20: "space", 0x21: "exclam", 0x23: "numbersign", 0x25: "percent",
        0x26: "ampersand", 0x28: "parenleft", 0x29: "parenright",
        0x2B: "plus", 0x2C: "comma", 0x2E: "period", 0x2F: "slash",
        0x3A: "colon", 0x3B: "semicolon", 0x3C: "less", 0x3D: "equal",
        0x3E: "greater", 0x3F: "question", 0x5B: "bracketleft",
        0x5D: "bracketright", 0x5F: "underscore",
        0x41: "Alpha", 0x42: "Beta", 0x47: "Gamma", 0x44: "Delta",
        0x45: "Epsilon", 0x5A: "Zeta", 0x48: "Eta", 0x51: "Theta",
        0x49: "Iota", 0x4B: "Kappa", 0x4C: "Lambda", 0x4D: "Mu",
        0x4E: "Nu", 0x58: "Xi", 0x4F: "Omicron", 0x50: "Pi",
        0x52: "Rho", 0x53: "Sigma", 0x54: "Tau", 0x55: "Upsilon",
        0x46: "Phi", 0x43: "Chi", 0x59: "Psi", 0x57: "Omega",
        0x61: "alpha", 0x62: "beta", 0x67: "gamma", 0x64: "delta",
        0x65: "epsilon", 0x7A: "zeta", 0x68: "eta", 0x71: "theta",
        0x69: "iota", 0x6B: "kappa", 0x6C: "lambda", 0x6D: "mu",
        0x6E: "nu", 0x78: "xi", 0x6F: "omicron", 0x70: "pi",
        0x72: "rho", 0x73: "sigma", 0x56: "sigma1", 0x74: "tau",
        0x75: "upsilon", 0x66: "phi", 0x63: "chi", 0x79: "psi",
        0x77: "omega",
        0xB1: "plusminus", 0xB4: "multiply", 0xB8: "divide",
        0xB9: "notequal", 0xA3: "lessequal", 0xB3: "greaterequal",
        0xBB: "approxequal", 0xA5: "infinity", 0xD6: "radical",
        0xE5: "summation", 0xD5: "product", 0xF2: "integral",
        0xB6: "partialdiff", 0xAE: "arrowright", 0xAC: "arrowleft",
    }.items()
):
    SYMBOL_ENCODING[_i] = _nm
for _d in range(10):
    SYMBOL_ENCODING[0x30 + _d] = (
        "zero one two three four five six seven eight nine".split()[_d]
    )

BASE_ENCODINGS = {
    "StandardEncoding": STANDARD_ENCODING,
    "WinAnsiEncoding": WIN_ANSI_ENCODING,
    "MacRomanEncoding": MAC_ROMAN_ENCODING,
    "MacExpertEncoding": MAC_EXPERT_ENCODING,
    "SymbolEncoding": SYMBOL_ENCODING,
}


def load_encoding(estrings: list, encoding_name: str) -> None:
    """pdf_load_encoding: overwrite all 256 slots from the base table."""
    table = BASE_ENCODINGS.get(encoding_name)
    if table is None:
        return
    for i in range(256):
        estrings[i] = table[i]


# --- Adobe Glyph List (subset covering the base encodings + ligatures) ------
AGL: dict[str, int] = {}


def _agl_add(names_codes):
    for name, code in names_codes:
        AGL[name] = code


# ASCII range glyph names
for _i in range(0x21, 0x7F):
    pass
_agl_add(
    [
        ("space", 0x20), ("exclam", 0x21), ("quotedbl", 0x22),
        ("numbersign", 0x23), ("dollar", 0x24), ("percent", 0x25),
        ("ampersand", 0x26), ("quotesingle", 0x27), ("parenleft", 0x28),
        ("parenright", 0x29), ("asterisk", 0x2A), ("plus", 0x2B),
        ("comma", 0x2C), ("hyphen", 0x2D), ("period", 0x2E), ("slash", 0x2F),
        ("zero", 0x30), ("one", 0x31), ("two", 0x32), ("three", 0x33),
        ("four", 0x34), ("five", 0x35), ("six", 0x36), ("seven", 0x37),
        ("eight", 0x38), ("nine", 0x39), ("colon", 0x3A), ("semicolon", 0x3B),
        ("less", 0x3C), ("equal", 0x3D), ("greater", 0x3E),
        ("question", 0x3F), ("at", 0x40), ("bracketleft", 0x5B),
        ("backslash", 0x5C), ("bracketright", 0x5D), ("asciicircum", 0x5E),
        ("underscore", 0x5F), ("grave", 0x60), ("braceleft", 0x7B),
        ("bar", 0x7C), ("braceright", 0x7D), ("asciitilde", 0x7E),
    ]
)
for _c in range(ord("A"), ord("Z") + 1):
    AGL[chr(_c)] = _c
for _c in range(ord("a"), ord("z") + 1):
    AGL[chr(_c)] = _c
_agl_add(
    [
        ("exclamdown", 0xA1), ("cent", 0xA2), ("sterling", 0xA3),
        ("currency", 0xA4), ("yen", 0xA5), ("brokenbar", 0xA6),
        ("section", 0xA7), ("dieresis", 0xA8), ("copyright", 0xA9),
        ("ordfeminine", 0xAA), ("guillemotleft", 0xAB), ("logicalnot", 0xAC),
        ("registered", 0xAE), ("macron", 0xAF), ("degree", 0xB0),
        ("plusminus", 0xB1), ("twosuperior", 0xB2), ("threesuperior", 0xB3),
        ("acute", 0xB4), ("mu", 0xB5), ("paragraph", 0xB6),
        ("periodcentered", 0xB7), ("cedilla", 0xB8), ("onesuperior", 0xB9),
        ("ordmasculine", 0xBA), ("guillemotright", 0xBB),
        ("onequarter", 0xBC), ("onehalf", 0xBD), ("threequarters", 0xBE),
        ("questiondown", 0xBF), ("Agrave", 0xC0), ("Aacute", 0xC1),
        ("Acircumflex", 0xC2), ("Atilde", 0xC3), ("Adieresis", 0xC4),
        ("Aring", 0xC5), ("AE", 0xC6), ("Ccedilla", 0xC7), ("Egrave", 0xC8),
        ("Eacute", 0xC9), ("Ecircumflex", 0xCA), ("Edieresis", 0xCB),
        ("Igrave", 0xCC), ("Iacute", 0xCD), ("Icircumflex", 0xCE),
        ("Idieresis", 0xCF), ("Eth", 0xD0), ("Ntilde", 0xD1),
        ("Ograve", 0xD2), ("Oacute", 0xD3), ("Ocircumflex", 0xD4),
        ("Otilde", 0xD5), ("Odieresis", 0xD6), ("multiply", 0xD7),
        ("Oslash", 0xD8), ("Ugrave", 0xD9), ("Uacute", 0xDA),
        ("Ucircumflex", 0xDB), ("Udieresis", 0xDC), ("Yacute", 0xDD),
        ("Thorn", 0xDE), ("germandbls", 0xDF), ("agrave", 0xE0),
        ("aacute", 0xE1), ("acircumflex", 0xE2), ("atilde", 0xE3),
        ("adieresis", 0xE4), ("aring", 0xE5), ("ae", 0xE6),
        ("ccedilla", 0xE7), ("egrave", 0xE8), ("eacute", 0xE9),
        ("ecircumflex", 0xEA), ("edieresis", 0xEB), ("igrave", 0xEC),
        ("iacute", 0xED), ("icircumflex", 0xEE), ("idieresis", 0xEF),
        ("eth", 0xF0), ("ntilde", 0xF1), ("ograve", 0xF2), ("oacute", 0xF3),
        ("ocircumflex", 0xF4), ("otilde", 0xF5), ("odieresis", 0xF6),
        ("divide", 0xF7), ("oslash", 0xF8), ("ugrave", 0xF9),
        ("uacute", 0xFA), ("ucircumflex", 0xFB), ("udieresis", 0xFC),
        ("yacute", 0xFD), ("thorn", 0xFE), ("ydieresis", 0xFF),
        # punctuation / symbols
        ("quoteleft", 0x2018), ("quoteright", 0x2019),
        ("quotesinglbase", 0x201A), ("quotedblleft", 0x201C),
        ("quotedblright", 0x201D), ("quotedblbase", 0x201E),
        ("dagger", 0x2020), ("daggerdbl", 0x2021), ("bullet", 0x2022),
        ("ellipsis", 0x2026), ("perthousand", 0x2030),
        ("guilsinglleft", 0x2039), ("guilsinglright", 0x203A),
        ("fraction", 0x2044), ("Euro", 0x20AC), ("trademark", 0x2122),
        ("minus", 0x2212), ("endash", 0x2013), ("emdash", 0x2014),
        ("florin", 0x192), ("circumflex", 0x2C6), ("caron", 0x2C7),
        ("breve", 0x2D8), ("dotaccent", 0x2D9), ("ring", 0x2DA),
        ("ogonek", 0x2DB), ("tilde", 0x2DC), ("hungarumlaut", 0x2DD),
        # latin extended
        ("Lslash", 0x141), ("lslash", 0x142), ("OE", 0x152), ("oe", 0x153),
        ("Scaron", 0x160), ("scaron", 0x161), ("Ydieresis", 0x178),
        ("Zcaron", 0x17D), ("zcaron", 0x17E), ("dotlessi", 0x131),
        # ligatures (expanded by the text device, A38)
        ("ff", 0xFB00), ("fi", 0xFB01), ("fl", 0xFB02),
        ("ffi", 0xFB03), ("ffl", 0xFB04), ("longst", 0xFB05), ("st", 0xFB06),
        # misc commonly-referenced
        ("nbspace", 0xA0), ("sfthyphen", 0xAD), ("middot", 0xB7),
        ("Delta", 0x2206), ("Omega", 0x2126), ("pi", 0x3C0),
        ("summation", 0x2211), ("radical", 0x221A), ("infinity", 0x221E),
        ("notequal", 0x2260), ("lessequal", 0x2264), ("greaterequal", 0x2265),
        ("lozenge", 0x25CA), ("apple", 0xF8FF), ("partialdiff", 0x2202),
        ("integral", 0x222B), ("product", 0x220F), ("approxequal", 0x2248),
        ("degree", 0xB0), ("arrowleft", 0x2190), ("arrowright", 0x2192),
        ("sigma1", 0x3C2),
    ]
)

# Greek letters (Symbol encoding / AGL)
_GREEK_UPPER = (
    "Alpha Beta Gamma Delta Epsilon Zeta Eta Theta Iota Kappa Lambda Mu "
    "Nu Xi Omicron Pi Rho Sigma2 Sigma Tau Upsilon Phi Chi Psi Omega"
).split()
_code = 0x391
for _nm in _GREEK_UPPER:
    if _nm != "Sigma2":  # 0x3A2 is unassigned in Unicode
        AGL[_nm] = _code
    _code += 1
_GREEK_LOWER = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu "
    "nu xi omicron pi rho sigmafinal sigma tau upsilon phi chi psi omega"
).split()
_code = 0x3B1
for _nm in _GREEK_LOWER:
    if _nm != "sigmafinal":
        AGL[_nm] = _code
    _code += 1


def lookup_agl(name: str) -> int:
    """Glyph name -> Unicode codepoint; 0 when unknown.

    Reproduces the reference's algorithmic fallbacks *with its quirks*
    (src/vcl/pdf_encodings.pas:46-113): 'uniXXXX' hex, but 'uXXXX'
    DECIMAL, and 'aNNN' decimal.
    """
    for sep in (".", "_"):
        i = name.find(sep)
        if i >= 0:
            name = name[:i]
    code = AGL.get(name)
    if code is not None:
        return code
    if name.startswith("uni"):
        try:
            return int(name[3:], 16)
        except ValueError:
            return 0
    if name.startswith("u"):
        try:
            return int(name[1:])  # decimal, reproducing the port's quirk
        except ValueError:
            return 0
    if name.startswith("a") and len(name) >= 3:
        try:
            return int(name[1:])
        except ValueError:
            return 0
    return 0


# --- PdfDocEncoding (metadata strings, src/vcl/digtypes.pas:569-602) --------
PDF_DOC_ENCODING: list[int] = (
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0x09, 0x0A, 0, 0, 0x0D, 0, 0]
    + [0] * 8
    + [0x02D8, 0x02C7, 0x02C6, 0x02D9, 0x02DD, 0x02DB, 0x02DA, 0x02DC]
    + list(range(0x20, 0x7F))
    + [0]
    + [
        0x2022, 0x2020, 0x2021, 0x2026, 0x2014, 0x2013, 0x0192, 0x2044,
        0x2039, 0x203A, 0x2212, 0x2030, 0x201E, 0x201C, 0x201D, 0x2018,
        0x2019, 0x201A, 0x2122, 0xFB01, 0xFB02, 0x0141, 0x0152, 0x0160,
        0x0178, 0x017D, 0x0131, 0x0142, 0x0153, 0x0161, 0x017E, 0,
        0x20AC,
    ]
    + list(range(0xA1, 0xAD))
    + [0]
    + list(range(0xAE, 0x100))
)
assert len(PDF_DOC_ENCODING) == 256
