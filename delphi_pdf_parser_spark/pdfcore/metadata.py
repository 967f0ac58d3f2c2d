"""Metadata extraction (/Info), pdf_to_utf8 semantics.

Mirrors openfile1 (src/digPdfViewer.pas:236-312) and pdf_to_utf8
(src/vcl/base_object_functions.pas:2173-2226): UTF-16BE with BOM, else
PdfDocEncoding byte-wise (codepoint 0 entries become U+0000 which we drop,
matching runelen/runetochar round-trip of NUL as 1 byte — serialized
strings stop at NUL in the reference's C-string handling, so we stop at
the first unmapped byte the same way).
"""

from __future__ import annotations

from .encodings import PDF_DOC_ENCODING

INFO_KEYS = (
    "Title",
    "Subject",
    "Producer",
    "Author",
    "CreationDate",
    "ModDate",
    "Creator",
    "Keywords",
)


def pdf_to_text(raw: bytes) -> str:
    if len(raw) > 2 and raw[0] == 0xFE and raw[1] == 0xFF:
        cps = []
        for i in range(2, len(raw) - 1, 2):
            cps.append((raw[i] << 8) | raw[i + 1])
        return "".join(chr(c) for c in cps)
    return "".join(chr(PDF_DOC_ENCODING[b]) for b in raw if PDF_DOC_ENCODING[b])


def extract_info(doc) -> dict[str, str]:
    out: dict[str, str] = {}
    info = doc.resolve(doc.trailer.get("Info"))
    if not isinstance(info, dict):
        return out
    for key in INFO_KEYS:
        val = doc.resolve(info.get(key))
        if isinstance(val, bytes):
            out[key] = pdf_to_text(val)
    return out
