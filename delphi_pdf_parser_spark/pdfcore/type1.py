"""Type1 font-program builtin encoding, FreeType-free.

The reference loads embedded Type1 programs through FreeType and reads
the builtin encoding back out via the platform-7 (Adobe custom) charmap +
glyph names (charmap scan src/vcl/pdf_fontss.pas:612-626, glyph-name
reversal :772-791). The encoding itself lives in the CLEARTEXT section of
the Type1 program (before ``eexec``), as either

    /Encoding StandardEncoding def
or
    /Encoding 256 array
    0 1 255 {1 index exch /.notdef put} for
    dup 48 /zero put
    ...
    readonly def

so no charstring decryption is needed to recover it. PFB segment headers
(0x80 0x01/0x02 + little-endian length) are stripped when present.
"""

from __future__ import annotations

import re

__all__ = ["parse_type1_encoding"]

_DUP_RE = re.compile(rb"dup\s+(\d+)\s*/([^\s/\(\)\[\]{}<>]+)\s+put")


def _cleartext(data: bytes) -> bytes:
    """PFB -> concatenated ASCII segments; raw PFA/PS -> up to eexec."""
    if data[:1] == b"\x80":
        out = bytearray()
        pos = 0
        while pos + 6 <= len(data) and data[pos] == 0x80:
            seg_type = data[pos + 1]
            length = int.from_bytes(data[pos + 2:pos + 6], "little")
            if seg_type == 1:  # ASCII segment
                out += data[pos + 6:pos + 6 + length]
            elif seg_type == 3:  # EOF
                break
            pos += 6 + length
        data = bytes(out)
    ee = data.find(b"eexec")
    return data[:ee] if ee >= 0 else data


def parse_type1_encoding(data: bytes):
    """Return 'standard', a 256-entry list of glyph names (None = unset),
    or None when no /Encoding is found in the cleartext."""
    clear = _cleartext(data)
    at = clear.find(b"/Encoding")
    if at < 0:
        return None
    # scan to the terminating 'def' (readonly def / ND / |-)
    end = clear.find(b" def", at)
    body = clear[at:end if end >= 0 else len(clear)]
    if re.match(rb"/Encoding\s+StandardEncoding\b", body):
        return "standard"
    table: list = [None] * 256
    seen = False
    for m in _DUP_RE.finditer(body):
        code = int(m.group(1))
        if 0 <= code <= 255:
            table[code] = m.group(2).decode("latin-1")
            seen = True
    return table if seen else None
