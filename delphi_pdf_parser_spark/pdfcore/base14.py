"""Base-14 font data: name cleanup + built-in advance widths.

``clean_base14_name`` mirrors the reference's alias table
(src/vcl/pdf_fontss.pas base_font_names). The width tables are Adobe's
published AFM metrics for the standard 14 fonts — the same numbers baked
into the CFF programs the reference bundles (src/vcl/font_base14.pas), so
pen advances agree. Keyed by glyph name; glyphs outside the table get
width 0 (and surface as spacing anomalies only if a document actually
uses them without /Widths).
"""

from __future__ import annotations

_BASE_FONT_ALIASES = {
    "Courier": ["CourierNew", "CourierNewPSMT"],
    "Courier-Bold": [
        "CourierNew,Bold", "Courier,Bold", "CourierNewPS-BoldMT",
        "CourierNew-Bold",
    ],
    "Courier-Oblique": [
        "CourierNew,Italic", "Courier,Italic", "CourierNewPS-ItalicMT",
        "CourierNew-Italic",
    ],
    "Courier-BoldOblique": [
        "CourierNew,BoldItalic", "Courier,BoldItalic",
        "CourierNewPS-BoldItalicMT", "CourierNew-BoldItalic",
    ],
    "Helvetica": ["ArialMT", "Arial"],
    "Helvetica-Bold": ["Arial-BoldMT", "Arial,Bold", "Arial-Bold", "Helvetica,Bold"],
    "Helvetica-Oblique": [
        "Arial-ItalicMT", "Arial,Italic", "Arial-Italic", "Helvetica,Italic",
        "Helvetica-Italic",
    ],
    "Helvetica-BoldOblique": [
        "Arial-BoldItalicMT", "Arial,BoldItalic", "Arial-BoldItalic",
        "Helvetica,BoldItalic", "Helvetica-BoldItalic",
    ],
    "Times-Roman": ["TimesNewRomanPSMT", "TimesNewRoman", "TimesNewRomanPS"],
    "Times-Bold": [
        "TimesNewRomanPS-BoldMT", "TimesNewRoman,Bold", "TimesNewRomanPS-Bold",
        "TimesNewRoman-Bold",
    ],
    "Times-Italic": [
        "TimesNewRomanPS-ItalicMT", "TimesNewRoman,Italic",
        "TimesNewRomanPS-Italic", "TimesNewRoman-Italic",
    ],
    "Times-BoldItalic": [
        "TimesNewRomanPS-BoldItalicMT", "TimesNewRoman,BoldItalic",
        "TimesNewRomanPS-BoldItalic", "TimesNewRoman-BoldItalic",
    ],
    "Symbol": [],
    "ZapfDingbats": [],
}

_ALIAS_LOOKUP: dict[str, str] = {}
for _canon, _aliases in _BASE_FONT_ALIASES.items():
    _ALIAS_LOOKUP[_canon.replace(" ", "")] = _canon
    for _a in _aliases:
        _ALIAS_LOOKUP[_a.replace(" ", "")] = _canon


def clean_base14_name(fontname: str) -> str:
    """Strip subset tags (ABCDEF+) and map aliases to canonical names."""
    if len(fontname) > 7 and fontname[6] == "+":
        fontname = fontname[7:]
    return _ALIAS_LOOKUP.get(fontname.replace(" ", ""), fontname)


def _expand(widths: dict[str, int]) -> dict[str, int]:
    """Accent composites inherit their base letter's width (true in the
    actual AFMs for the faces below)."""
    comp = {
        "grave": "", "acute": "", "circumflex": "", "tilde": "",
        "dieresis": "", "ring": "", "cedilla": "", "caron": "",
    }
    out = dict(widths)
    for base in "AEINOUYCZS":
        for acc in comp:
            name = base + acc
            if name not in out and base in out:
                out[name] = out[base]
    for base in "aeinouyczs":
        for acc in comp:
            name = base + acc
            if name not in out and base in out:
                out[name] = out[base]
    return out


_HELVETICA = _expand(
    {
        "space": 278, "exclam": 278, "quotedbl": 355, "numbersign": 556,
        "dollar": 556, "percent": 889, "ampersand": 667, "quoteright": 222,
        "quotesingle": 191, "parenleft": 333, "parenright": 333,
        "asterisk": 389, "plus": 584, "comma": 278, "hyphen": 333,
        "period": 278, "slash": 278, "zero": 556, "one": 556, "two": 556,
        "three": 556, "four": 556, "five": 556, "six": 556, "seven": 556,
        "eight": 556, "nine": 556, "colon": 278, "semicolon": 278,
        "less": 584, "equal": 584, "greater": 584, "question": 556,
        "at": 1015, "A": 667, "B": 667, "C": 722, "D": 722, "E": 667,
        "F": 611, "G": 778, "H": 722, "I": 278, "J": 500, "K": 667,
        "L": 556, "M": 833, "N": 722, "O": 778, "P": 667, "Q": 778,
        "R": 722, "S": 667, "T": 611, "U": 722, "V": 667, "W": 944,
        "X": 667, "Y": 667, "Z": 611, "bracketleft": 278, "backslash": 278,
        "bracketright": 278, "asciicircum": 469, "underscore": 556,
        "quoteleft": 222, "a": 556, "b": 556, "c": 500, "d": 556, "e": 556,
        "f": 278, "g": 556, "h": 556, "i": 222, "j": 222, "k": 500,
        "l": 222, "m": 833, "n": 556, "o": 556, "p": 556, "q": 556,
        "r": 333, "s": 500, "t": 278, "u": 556, "v": 500, "w": 722,
        "x": 500, "y": 500, "z": 500, "braceleft": 334, "bar": 260,
        "braceright": 334, "asciitilde": 584, "exclamdown": 333,
        "cent": 556, "sterling": 556, "fraction": 167, "yen": 556,
        "florin": 556, "section": 556, "currency": 556,
        "quotedblleft": 333, "guillemotleft": 556, "guilsinglleft": 333,
        "guilsinglright": 333, "fi": 500, "fl": 500, "endash": 556,
        "dagger": 556, "daggerdbl": 556, "periodcentered": 278,
        "paragraph": 537, "bullet": 350, "quotesinglbase": 222,
        "quotedblbase": 333, "quotedblright": 333, "guillemotright": 556,
        "ellipsis": 1000, "perthousand": 1000, "questiondown": 611,
        "grave": 333, "acute": 333, "circumflex": 333, "tilde": 333,
        "macron": 333, "breve": 333, "dotaccent": 333, "dieresis": 333,
        "ring": 333, "cedilla": 333, "hungarumlaut": 333, "ogonek": 333,
        "caron": 333, "emdash": 1000, "AE": 1000, "ordfeminine": 370,
        "Lslash": 556, "Oslash": 778, "OE": 1000, "ordmasculine": 365,
        "ae": 889, "dotlessi": 278, "lslash": 222, "oslash": 611,
        "oe": 944, "germandbls": 611, "Euro": 556, "Scaron": 667,
        "scaron": 500, "Zcaron": 611, "zcaron": 500, "Ydieresis": 667,
        "ydieresis": 500, "brokenbar": 260, "copyright": 737,
        "registered": 737, "logicalnot": 584, "degree": 400,
        "plusminus": 584, "twosuperior": 333, "threesuperior": 333,
        "mu": 556, "onesuperior": 333, "onequarter": 834, "onehalf": 834,
        "threequarters": 834, "multiply": 584, "divide": 584,
        "trademark": 1000, "Eth": 722, "eth": 556, "Thorn": 667,
        "thorn": 556, "Atilde": 667, "atilde": 556, "Ntilde": 722,
        "ntilde": 556, "Otilde": 778, "otilde": 556, "yacute": 500,
        "Yacute": 667,
    }
)

_HELVETICA_BOLD = _expand(
    {
        "space": 278, "exclam": 333, "quotedbl": 474, "numbersign": 556,
        "dollar": 556, "percent": 889, "ampersand": 722, "quoteright": 278,
        "quotesingle": 238, "parenleft": 333, "parenright": 333,
        "asterisk": 389, "plus": 584, "comma": 278, "hyphen": 333,
        "period": 278, "slash": 278, "zero": 556, "one": 556, "two": 556,
        "three": 556, "four": 556, "five": 556, "six": 556, "seven": 556,
        "eight": 556, "nine": 556, "colon": 333, "semicolon": 333,
        "less": 584, "equal": 584, "greater": 584, "question": 611,
        "at": 975, "A": 722, "B": 722, "C": 722, "D": 722, "E": 667,
        "F": 611, "G": 778, "H": 722, "I": 278, "J": 556, "K": 722,
        "L": 611, "M": 833, "N": 722, "O": 778, "P": 667, "Q": 778,
        "R": 722, "S": 667, "T": 611, "U": 722, "V": 667, "W": 944,
        "X": 667, "Y": 667, "Z": 611, "bracketleft": 333, "backslash": 278,
        "bracketright": 333, "asciicircum": 584, "underscore": 556,
        "quoteleft": 278, "a": 556, "b": 611, "c": 556, "d": 611, "e": 556,
        "f": 333, "g": 611, "h": 611, "i": 278, "j": 278, "k": 556,
        "l": 278, "m": 889, "n": 611, "o": 611, "p": 611, "q": 611,
        "r": 389, "s": 556, "t": 333, "u": 611, "v": 556, "w": 778,
        "x": 556, "y": 556, "z": 500, "braceleft": 389, "bar": 280,
        "braceright": 389, "asciitilde": 584,
    }
)

_TIMES_ROMAN = _expand(
    {
        "space": 250, "exclam": 333, "quotedbl": 408, "numbersign": 500,
        "dollar": 500, "percent": 833, "ampersand": 778, "quoteright": 333,
        "quotesingle": 180, "parenleft": 333, "parenright": 333,
        "asterisk": 500, "plus": 564, "comma": 250, "hyphen": 333,
        "period": 250, "slash": 278, "zero": 500, "one": 500, "two": 500,
        "three": 500, "four": 500, "five": 500, "six": 500, "seven": 500,
        "eight": 500, "nine": 500, "colon": 278, "semicolon": 278,
        "less": 564, "equal": 564, "greater": 564, "question": 444,
        "at": 921, "A": 722, "B": 667, "C": 667, "D": 722, "E": 611,
        "F": 556, "G": 722, "H": 722, "I": 333, "J": 389, "K": 722,
        "L": 611, "M": 889, "N": 722, "O": 722, "P": 556, "Q": 722,
        "R": 667, "S": 556, "T": 611, "U": 722, "V": 722, "W": 944,
        "X": 722, "Y": 722, "Z": 611, "bracketleft": 333, "backslash": 278,
        "bracketright": 333, "asciicircum": 469, "underscore": 500,
        "quoteleft": 333, "a": 444, "b": 500, "c": 444, "d": 500, "e": 444,
        "f": 333, "g": 500, "h": 500, "i": 278, "j": 278, "k": 500,
        "l": 278, "m": 778, "n": 500, "o": 500, "p": 500, "q": 500,
        "r": 333, "s": 389, "t": 278, "u": 500, "v": 500, "w": 722,
        "x": 500, "y": 500, "z": 444, "braceleft": 480, "bar": 200,
        "braceright": 480, "asciitilde": 541, "fi": 556, "fl": 556,
        "endash": 500, "emdash": 1000, "bullet": 350, "ellipsis": 1000,
    }
)

_TIMES_BOLD = _expand(
    {
        "space": 250, "exclam": 333, "quotedbl": 555, "numbersign": 500,
        "dollar": 500, "percent": 1000, "ampersand": 833, "quoteright": 333,
        "quotesingle": 278, "parenleft": 333, "parenright": 333,
        "asterisk": 500, "plus": 570, "comma": 250, "hyphen": 333,
        "period": 250, "slash": 278, "zero": 500, "one": 500, "two": 500,
        "three": 500, "four": 500, "five": 500, "six": 500, "seven": 500,
        "eight": 500, "nine": 500, "colon": 333, "semicolon": 333,
        "less": 570, "equal": 570, "greater": 570, "question": 500,
        "at": 930, "A": 722, "B": 667, "C": 722, "D": 722, "E": 667,
        "F": 611, "G": 778, "H": 778, "I": 389, "J": 500, "K": 778,
        "L": 667, "M": 944, "N": 722, "O": 778, "P": 611, "Q": 778,
        "R": 722, "S": 556, "T": 667, "U": 722, "V": 722, "W": 1000,
        "X": 722, "Y": 722, "Z": 667, "bracketleft": 333, "backslash": 278,
        "bracketright": 333, "asciicircum": 581, "underscore": 500,
        "quoteleft": 333, "a": 500, "b": 556, "c": 444, "d": 556, "e": 444,
        "f": 333, "g": 500, "h": 556, "i": 278, "j": 333, "k": 556,
        "l": 278, "m": 833, "n": 556, "o": 500, "p": 556, "q": 556,
        "r": 444, "s": 389, "t": 333, "u": 556, "v": 500, "w": 722,
        "x": 500, "y": 500, "z": 444, "braceleft": 394, "bar": 220,
        "braceright": 394, "asciitilde": 520, "fi": 556, "fl": 556,
        "endash": 500, "emdash": 1000, "bullet": 350, "ellipsis": 1000,
        "quotedblleft": 500, "quotedblright": 500, "dagger": 500,
        "daggerdbl": 500, "section": 500, "paragraph": 540,
        "germandbls": 556, "AE": 1000, "ae": 722, "OE": 1000, "oe": 722,
        "cent": 500, "sterling": 500, "yen": 500, "florin": 500,
        "exclamdown": 333, "questiondown": 500, "guillemotleft": 500,
        "guillemotright": 500, "guilsinglleft": 333, "guilsinglright": 333,
        "quotesinglbase": 333, "quotedblbase": 500, "perthousand": 1000,
        "Lslash": 667, "lslash": 278, "Oslash": 778, "oslash": 500,
        "dotlessi": 278, "fraction": 167,
    }
)

_TIMES_ITALIC = _expand(
    {
        "space": 250, "exclam": 333, "quotedbl": 420, "numbersign": 500,
        "dollar": 500, "percent": 833, "ampersand": 778, "quoteright": 333,
        "quotesingle": 214, "parenleft": 333, "parenright": 333,
        "asterisk": 500, "plus": 675, "comma": 250, "hyphen": 333,
        "period": 250, "slash": 278, "zero": 500, "one": 500, "two": 500,
        "three": 500, "four": 500, "five": 500, "six": 500, "seven": 500,
        "eight": 500, "nine": 500, "colon": 333, "semicolon": 333,
        "less": 675, "equal": 675, "greater": 675, "question": 500,
        "at": 920, "A": 611, "B": 611, "C": 667, "D": 722, "E": 611,
        "F": 611, "G": 722, "H": 722, "I": 333, "J": 444, "K": 667,
        "L": 556, "M": 833, "N": 667, "O": 722, "P": 611, "Q": 722,
        "R": 611, "S": 500, "T": 556, "U": 722, "V": 611, "W": 833,
        "X": 611, "Y": 556, "Z": 556, "bracketleft": 389, "backslash": 278,
        "bracketright": 389, "asciicircum": 422, "underscore": 500,
        "quoteleft": 333, "a": 500, "b": 500, "c": 444, "d": 500, "e": 444,
        "f": 278, "g": 500, "h": 500, "i": 278, "j": 278, "k": 444,
        "l": 278, "m": 722, "n": 500, "o": 500, "p": 500, "q": 500,
        "r": 389, "s": 389, "t": 278, "u": 500, "v": 444, "w": 667,
        "x": 444, "y": 444, "z": 389, "braceleft": 400, "bar": 275,
        "braceright": 400, "asciitilde": 541, "fi": 500, "fl": 500,
        "endash": 500, "emdash": 889, "bullet": 350, "ellipsis": 889,
        "quotedblleft": 556, "quotedblright": 556, "dagger": 500,
        "daggerdbl": 500, "section": 500, "germandbls": 500,
        "AE": 889, "ae": 667, "OE": 944, "oe": 667, "florin": 500,
        "exclamdown": 389, "questiondown": 500, "guillemotleft": 500,
        "guillemotright": 500,
    }
)

_TIMES_BOLD_ITALIC = _expand(
    {
        "space": 250, "exclam": 389, "quotedbl": 555, "numbersign": 500,
        "dollar": 500, "percent": 833, "ampersand": 778, "quoteright": 333,
        "quotesingle": 278, "parenleft": 333, "parenright": 333,
        "asterisk": 500, "plus": 570, "comma": 250, "hyphen": 333,
        "period": 250, "slash": 278, "zero": 500, "one": 500, "two": 500,
        "three": 500, "four": 500, "five": 500, "six": 500, "seven": 500,
        "eight": 500, "nine": 500, "colon": 333, "semicolon": 333,
        "less": 570, "equal": 570, "greater": 570, "question": 500,
        "at": 832, "A": 667, "B": 667, "C": 667, "D": 722, "E": 667,
        "F": 667, "G": 722, "H": 778, "I": 389, "J": 500, "K": 667,
        "L": 611, "M": 889, "N": 722, "O": 722, "P": 611, "Q": 722,
        "R": 667, "S": 556, "T": 611, "U": 722, "V": 667, "W": 889,
        "X": 667, "Y": 611, "Z": 611, "bracketleft": 333, "backslash": 278,
        "bracketright": 333, "asciicircum": 570, "underscore": 500,
        "quoteleft": 333, "a": 500, "b": 500, "c": 444, "d": 500, "e": 444,
        "f": 333, "g": 500, "h": 556, "i": 278, "j": 278, "k": 500,
        "l": 278, "m": 778, "n": 556, "o": 500, "p": 500, "q": 500,
        "r": 389, "s": 389, "t": 278, "u": 556, "v": 444, "w": 667,
        "x": 500, "y": 444, "z": 389, "braceleft": 348, "bar": 220,
        "braceright": 348, "asciitilde": 570, "fi": 556, "fl": 556,
        "endash": 500, "emdash": 1000, "bullet": 350, "ellipsis": 1000,
        "quotedblleft": 500, "quotedblright": 500, "germandbls": 500,
        "AE": 944, "ae": 722, "OE": 944, "oe": 722,
    }
)

# Symbol.afm widths (glyph names per the Symbol built-in encoding)
_SYMBOL = {
    "space": 250, "exclam": 333, "universal": 713, "numbersign": 500,
    "existential": 549, "percent": 833, "ampersand": 778, "suchthat": 439,
    "parenleft": 333, "parenright": 333, "asteriskmath": 500, "plus": 549,
    "comma": 250, "minus": 549, "period": 250, "slash": 278,
    "zero": 500, "one": 500, "two": 500, "three": 500, "four": 500,
    "five": 500, "six": 500, "seven": 500, "eight": 500, "nine": 500,
    "colon": 278, "semicolon": 278, "less": 549, "equal": 549,
    "greater": 549, "question": 444, "congruent": 549,
    "Alpha": 722, "Beta": 667, "Chi": 722, "Delta": 612, "Epsilon": 611,
    "Phi": 763, "Gamma": 603, "Eta": 722, "Iota": 333, "theta1": 631,
    "Kappa": 722, "Lambda": 686, "Mu": 889, "Nu": 722, "Omicron": 722,
    "Pi": 768, "Theta": 741, "Rho": 556, "Sigma": 592, "Tau": 611,
    "Upsilon": 690, "sigma1": 439, "Omega": 768, "Xi": 645, "Psi": 795,
    "Zeta": 611, "bracketleft": 333, "therefore": 863, "bracketright": 333,
    "perpendicular": 658, "underscore": 500, "radicalex": 500,
    "alpha": 631, "beta": 549, "chi": 549, "delta": 494, "epsilon": 439,
    "phi": 521, "gamma": 411, "eta": 603, "iota": 329, "phi1": 603,
    "kappa": 549, "lambda": 549, "mu": 576, "nu": 521, "omicron": 549,
    "pi": 549, "theta": 521, "rho": 549, "sigma": 603, "tau": 439,
    "upsilon": 576, "omega1": 713, "omega": 686, "xi": 493, "psi": 686,
    "zeta": 494, "braceleft": 480, "bar": 200, "braceright": 480,
    "similar": 549,
}

_COURIER = {}  # all glyphs 600


class _Courier(dict):
    def get(self, key, default=0):
        return 600 if key else default

    def __contains__(self, key):  # pragma: no cover
        return True


_COURIER = _Courier()

BASE14_WIDTHS: dict[str, dict] = {
    "Helvetica": _HELVETICA,
    "Helvetica-Oblique": _HELVETICA,
    "Helvetica-Bold": _HELVETICA_BOLD,
    "Helvetica-BoldOblique": _HELVETICA_BOLD,
    "Times-Roman": _TIMES_ROMAN,
    "Times-Bold": _TIMES_BOLD,
    "Times-Italic": _TIMES_ITALIC,
    "Times-BoldItalic": _TIMES_BOLD_ITALIC,
    "Courier": _COURIER,
    "Courier-Bold": _COURIER,
    "Courier-Oblique": _COURIER,
    "Courier-BoldOblique": _COURIER,
    "Symbol": _SYMBOL,
    # ZapfDingbats AFM widths omitted: its a1..a191 glyph names are not in
    # the reference's AGL data (date_glyphlist.pas), so every dingbat folds
    # to '?' regardless of advance — spacing inside all-'?' runs is the only
    # thing widths could alter, and fixtures never exercise it
    "ZapfDingbats": {},
}

# built-in encoding of the bundled font programs: the text faces carry
# StandardEncoding; Symbol/ZapfDingbats have custom encodings we don't ship
BASE14_ENCODING_OVERRIDES = {
    "Symbol": "SymbolEncoding",
    "ZapfDingbats": "ZapfDingbatsEncoding",
}
