"""Deterministic fixture-PDF generator + golden texts.

Implements the FIXTURES.md feature matrix. Every PDF byte string is
produced here (no external data); every golden text is hand-derived from
the reference semantics documented in SURVEY.md §2.A (positioning math
A23-A24, text-device heuristics A38, serialization A39).

The generator shares NO parsing code with pdfcore (it only borrows the
AES/RC4 primitives to author encrypted fixtures), so fixture bugs and
parser bugs cannot cancel out.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

from .pdfcore.crypt import PAD, aes_cbc_encrypt, rc4

CRLF = "\r\n"


# ---------------------------------------------------------------------------
# encoders used to author fixtures
# ---------------------------------------------------------------------------

def lzw_encode(data: bytes, early_change: int = 1) -> bytes:
    """Minimal LZW encoder (9->12 bit, CLEAR/EOD) compatible with the
    PDF LZWDecode filter."""
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(256, width)  # CLEAR
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
        else:
            emit(table[w], width)
            table[wc] = next_code
            next_code += 1
            if next_code + early_change - 1 >= (1 << width) and width < 12:
                width += 1
            if next_code >= 4096 - 1:
                emit(256, width)
                table = {bytes([i]): i for i in range(256)}
                next_code = 258
                width = 9
            w = bytes([ch])
    if w:
        emit(table[w], width)
    emit(257, width)  # EOD
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def a85_encode(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 4):
        chunk = data[i : i + 4]
        pad = 4 - len(chunk)
        word = int.from_bytes(chunk + b"\x00" * pad, "big")
        if word == 0 and pad == 0:
            out.append(0x7A)
            continue
        digits = []
        for _ in range(5):
            digits.append(word % 85)
            word //= 85
        digits.reverse()
        enc = bytes(d + 0x21 for d in digits)
        out += enc[: 5 - pad]
    out += b"~>"
    return bytes(out)


def ahx_encode(data: bytes) -> bytes:
    return data.hex().encode() + b">"


def rl_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find run
        j = i
        while j < n - 1 and data[j] == data[j + 1] and j - i < 127:
            j += 1
        if j > i:  # run of length j-i+1
            out.append(257 - (j - i + 1))
            out.append(data[i])
            i = j + 1
        else:
            # literal stretch
            j = i
            while (
                j < n
                and j - i < 127
                and not (j < n - 1 and data[j] == data[j + 1])
            ):
                j += 1
            out.append(j - i - 1)
            out += data[i:j]
            i = j
    out.append(128)
    return bytes(out)


def png_predict_encode(data: bytes, columns: int, tag: int) -> bytes:
    """Forward-apply a PNG predictor row filter (bpp=1) so the parser's
    un-predict restores the original."""
    # pad to row multiple with spaces (harmless in content streams)
    stride = columns
    if len(data) % stride:
        data = data + b" " * (stride - len(data) % stride)
    rows = [data[i : i + stride] for i in range(0, len(data), stride)]
    out = bytearray()
    prev = bytes(stride)
    for row in rows:
        out.append(tag)
        if tag == 0:
            out += row
        elif tag == 1:  # Sub
            enc = bytearray(row)
            for i in range(stride - 1, 0, -1):
                enc[i] = (enc[i] - row[i - 1]) & 0xFF
            out += enc
        elif tag == 2:  # Up
            out += bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
        elif tag == 4:  # Paeth
            enc = bytearray()
            for i in range(stride):
                a = row[i - 1] if i >= 1 else 0
                b = prev[i]
                c = prev[i - 1] if i >= 1 else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                enc.append((row[i] - pred) & 0xFF)
            out += enc
        prev = row
    return bytes(out)


def tiff_predict_encode(data: bytes, columns: int) -> bytes:
    stride = columns
    if len(data) % stride:
        data = data + b" " * (stride - len(data) % stride)
    out = bytearray()
    for r in range(0, len(data), stride):
        row = data[r : r + stride]
        enc = bytearray(row)
        for i in range(stride - 1, 0, -1):
            enc[i] = (enc[i] - row[i - 1]) & 0xFF
        out += enc
    return bytes(out)


# ---------------------------------------------------------------------------
# PDF builder
# ---------------------------------------------------------------------------


class Obj:
    def __init__(self, num: int, body: str | bytes, stream: bytes | None = None):
        self.num = num
        self.body = body
        self.stream = stream


class PdfBuilder:
    def __init__(self, version=b"%PDF-1.4"):
        self.version = version
        self.objects: dict[int, Obj] = {}
        self._next = 1

    def add(self, body: str | bytes, stream: bytes | None = None, num: int | None = None) -> int:
        if num is None:
            num = self._next
        self._next = max(self._next, num + 1)
        self.objects[num] = Obj(num, body, stream)
        return num

    def reserve(self) -> int:
        num = self._next
        self._next += 1
        return num

    def set(self, num: int, body: str | bytes, stream: bytes | None = None):
        self.objects[num] = Obj(num, body, stream)

    def _serialize_obj(self, o: Obj) -> bytes:
        body = o.body.encode("latin-1") if isinstance(o.body, str) else o.body
        parts = [f"{o.num} 0 obj\n".encode(), body]
        if o.stream is not None:
            parts.append(b"\nstream\n")
            parts.append(o.stream)
            parts.append(b"\nendstream")
        parts.append(b"\nendobj\n")
        return b"".join(parts)

    def build_classic(
        self,
        root: int,
        info: int | None = None,
        encrypt_clause: str = "",
        doc_id: bytes | None = None,
        multisection: bool = False,
    ) -> bytes:
        out = bytearray(self.version + b"\n%\xe2\xe3\xcf\xd3\n")
        offsets: dict[int, int] = {}
        for num in sorted(self.objects):
            offsets[num] = len(out)
            out += self._serialize_obj(self.objects[num])
        startxref = len(out)
        nums = sorted(self.objects)
        size = max(nums) + 1
        out += b"xref\n"
        if multisection:
            # one subsection for object 0, then one per run of object nums
            sections: list[list[int]] = []
            run: list[int] = []
            for n in nums:
                if run and n != run[-1] + 1:
                    sections.append(run)
                    run = []
                run.append(n)
            if run:
                sections.append(run)
            out += b"0 1\n0000000000 65535 f \n"
            for sec in sections:
                out += f"{sec[0]} {len(sec)}\n".encode()
                for n in sec:
                    out += f"{offsets[n]:010d} 00000 n \n".encode()
        else:
            out += f"0 {size}\n".encode()
            out += b"0000000000 65535 f \n"
            for n in range(1, size):
                if n in offsets:
                    out += f"{offsets[n]:010d} 00000 n \n".encode()
                else:
                    out += b"0000000000 65535 f \n"
        trailer = f"trailer\n<< /Size {size} /Root {root} 0 R"
        if info:
            trailer += f" /Info {info} 0 R"
        if encrypt_clause:
            trailer += " " + encrypt_clause
        if doc_id is not None:
            h = doc_id.hex().upper()
            trailer += f" /ID [<{h}> <{h}>]"
        trailer += " >>\n"
        out += trailer.encode()
        out += f"startxref\n{startxref}\n%%EOF\n".encode()
        return bytes(out)

    def build_xref_stream(self, root: int, info: int | None = None) -> bytes:
        out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
        offsets: dict[int, int] = {}
        for num in sorted(self.objects):
            offsets[num] = len(out)
            out += self._serialize_obj(self.objects[num])
        xref_num = self._next
        size = xref_num + 1
        startxref = len(out)
        rows = bytearray()
        for n in range(size):
            if n == 0:
                rows += bytes([0]) + struct.pack(">H", 0) + bytes([255])
            elif n == xref_num:
                rows += bytes([1]) + struct.pack(">H", startxref) + bytes([0])
            elif n in offsets:
                rows += bytes([1]) + struct.pack(">H", offsets[n]) + bytes([0])
            else:
                rows += bytes([0]) + struct.pack(">H", 0) + bytes([0])
        stream = zlib.compress(bytes(rows))
        body = (
            f"<< /Type /XRef /Size {size} /W [1 2 1] /Root {root} 0 R "
            f"/Filter /FlateDecode /Length {len(stream)}"
            + (f" /Info {info} 0 R" if info else "")
            + " >>"
        )
        xobj = Obj(xref_num, body, stream)
        out += self._serialize_obj(xobj)
        out += f"startxref\n{startxref}\n%%EOF\n".encode()
        return bytes(out)


def content_stream_obj(
    b: PdfBuilder, content: bytes, filters: str = "", encoded: bytes | None = None,
    extra: str = "",
) -> int:
    data = encoded if encoded is not None else content
    flt = f" /Filter {filters}" if filters else ""
    return b.add(f"<< /Length {len(data)}{flt}{extra} >>", data)


def simple_doc(
    content: bytes,
    font_body: str = "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    filters: str = "",
    encoded: bytes | None = None,
    extra_stream_dict: str = "",
    builder: PdfBuilder | None = None,
) -> tuple[PdfBuilder, int]:
    """catalog(1) pages(2) page(3) content(4) font(5)."""
    b = builder or PdfBuilder()
    cat = b.add("<< /Type /Catalog /Pages 2 0 R >>")
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"
    )
    content_stream_obj(b, content, filters, encoded, extra_stream_dict)
    b.add(font_body)
    return b, cat


def _bt(text_ops: str) -> bytes:
    return f"BT /F1 12 Tf {text_ops} ET".encode("latin-1")


# ---------------------------------------------------------------------------
# the fixture corpus
# ---------------------------------------------------------------------------


def _case_xref_classic():
    b, cat = simple_doc(_bt("72 720 Td (Hello World) Tj"))
    return b.build_classic(cat), "Hello World" + CRLF, 1


def _case_xref_multisection():
    b, cat = simple_doc(_bt("72 720 Td (Multi Section) Tj"))
    # introduce a numbering gap so subsections split: move font to 9
    b.objects[9] = b.objects.pop(5)
    b.objects[9].num = 9
    b.objects[3] = Obj(
        3,
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 9 0 R >> >> /Contents 4 0 R >>",
    )
    return b.build_classic(cat, multisection=True), "Multi Section" + CRLF, 1


def _case_xref_stream():
    b, cat = simple_doc(_bt("72 720 Td (Xref Stream) Tj"))
    return b.build_xref_stream(cat), "Xref Stream" + CRLF, 1


def _case_xref_prev_chain():
    b, cat = simple_doc(_bt("72 720 Td (Original) Tj"))
    base = b.build_classic(cat)
    # incremental update: replace content object 4
    newc = _bt("72 720 Td (Updated) Tj")
    upd = bytearray(base)
    ofs4 = len(upd)
    o = Obj(4, f"<< /Length {len(newc)} >>", newc)
    upd += PdfBuilder()._serialize_obj(o)
    startxref = len(upd)
    prev_start = base.rfind(b"startxref")
    prev_ofs = int(base[prev_start + 9 :].split()[0])
    upd += b"xref\n0 1\n0000000000 65535 f \n"
    upd += f"4 1\n{ofs4:010d} 00000 n \n".encode()
    upd += f"trailer\n<< /Size 6 /Root {cat} 0 R /Prev {prev_ofs} >>\n".encode()
    upd += f"startxref\n{startxref}\n%%EOF\n".encode()
    return bytes(upd), "Updated" + CRLF, 1


def _case_xref_hybrid():
    """Classic table that omits the font object; /XRefStm supplies it."""
    b, cat = simple_doc(_bt("72 720 Td (Hybrid) Tj"))
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(b.objects):
        offsets[num] = len(out)
        out += b._serialize_obj(b.objects[num])
    # xref stream object (7) covering object 5 (font) + itself
    xref_stm_num = 7
    xref_stm_ofs = len(out)
    rows = bytearray()
    rows += bytes([1]) + struct.pack(">H", offsets[5]) + bytes([0])
    rows += bytes([1]) + struct.pack(">H", xref_stm_ofs) + bytes([0])
    stm = zlib.compress(bytes(rows))
    xobj = Obj(
        xref_stm_num,
        f"<< /Type /XRef /Size 8 /W [1 2 1] /Index [5 1 7 1] /Root {cat} 0 R "
        f"/Filter /FlateDecode /Length {len(stm)} >>",
        stm,
    )
    out += b._serialize_obj(xobj)
    startxref = len(out)
    out += b"xref\n0 1\n0000000000 65535 f \n"
    out += f"1 4\n".encode()
    for n in (1, 2, 3, 4):
        out += f"{offsets[n]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size 8 /Root {cat} 0 R /XRefStm {xref_stm_ofs} >>\n"
    ).encode()
    out += f"startxref\n{startxref}\n%%EOF\n".encode()
    return bytes(out), "Hybrid" + CRLF, 1


def _case_objstm():
    b = PdfBuilder()
    # catalog(1) pages(2) page(3) packed in an ObjStm(6); content(4), font(5)
    content = _bt("72 720 Td (ObjStm) Tj")
    b.add(f"<< /Length {len(content)} >>", content, num=4)
    b.add("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>", num=5)
    members = [
        (1, "<< /Type /Catalog /Pages 2 0 R >>"),
        (2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (
            3,
            "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        ),
    ]
    payload = ""
    heads = []
    for num, body in members:
        heads.append((num, len(payload)))
        payload += body + "\n"
    header = " ".join(f"{n} {o}" for n, o in heads) + "\n"
    stm_data = (header + payload).encode("latin-1")
    comp = zlib.compress(stm_data)
    b.add(
        f"<< /Type /ObjStm /N {len(members)} /First {len(header)} "
        f"/Filter /FlateDecode /Length {len(comp)} >>",
        comp,
        num=6,
    )
    # hand-build with an xref stream marking 1..3 as type-2 entries
    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(b.objects):
        offsets[num] = len(out)
        out += b._serialize_obj(b.objects[num])
    xref_num = 7
    startxref = len(out)
    rows = bytearray()
    rows += bytes([0]) + struct.pack(">H", 0) + bytes([255])  # 0
    for idx in range(3):  # 1..3 in objstm 6
        rows += bytes([2]) + struct.pack(">H", 6) + bytes([idx])
    for n in (4, 5, 6):
        rows += bytes([1]) + struct.pack(">H", offsets[n]) + bytes([0])
    rows += bytes([1]) + struct.pack(">H", startxref) + bytes([0])  # 7
    stm = zlib.compress(bytes(rows))
    xobj = Obj(
        xref_num,
        f"<< /Type /XRef /Size 8 /W [1 2 1] /Root 1 0 R "
        f"/Filter /FlateDecode /Length {len(stm)} >>",
        stm,
    )
    out += b._serialize_obj(xobj)
    out += f"startxref\n{startxref}\n%%EOF\n".encode()
    return bytes(out), "ObjStm" + CRLF, 1


def _case_repair_truncated():
    b, cat = simple_doc(_bt("72 720 Td (Repaired) Tj"))
    data = b.build_classic(cat)
    # corrupt the startxref target
    i = data.rfind(b"startxref")
    j = data.find(b"\n", i) + 1
    k = data.find(b"\n", j)
    bad = data[:j] + b"999999999" + data[k:]
    return bytes(bad), "Repaired" + CRLF, 1


def _case_pagetree_deep():
    b = PdfBuilder()
    cat = b.add("<< /Type /Catalog /Pages 2 0 R >>")
    # 2 -> 3 -> 4 -> 5 -> 6 -> leaves 7,8 ; resources+mediabox inherited from 2
    b.add(
        "<< /Type /Pages /Kids [3 0 R] /Count 2 /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 11 0 R >> >> >>"
    )
    b.add("<< /Type /Pages /Kids [4 0 R] /Count 2 /Parent 2 0 R >>")
    b.add("<< /Type /Pages /Kids [5 0 R] /Count 2 /Parent 3 0 R >>")
    b.add("<< /Type /Pages /Kids [6 0 R] /Count 2 /Parent 4 0 R >>")
    b.add("<< /Type /Pages /Kids [7 0 R 8 0 R] /Count 2 /Parent 5 0 R >>")
    b.add("<< /Type /Page /Parent 6 0 R /Contents 9 0 R >>")
    b.add("<< /Type /Page /Parent 6 0 R /Contents 10 0 R >>")
    c1 = _bt("72 720 Td (Deep One) Tj")
    c2 = _bt("72 720 Td (Deep Two) Tj")
    b.add(f"<< /Length {len(c1)} >>", c1)
    b.add(f"<< /Length {len(c2)} >>", c2)
    b.add("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    return (
        b.build_classic(cat),
        "Deep One" + CRLF + "Deep Two" + CRLF,
        2,
    )


def _case_pagetree_cycle():
    b = PdfBuilder()
    cat = b.add("<< /Type /Catalog /Pages 2 0 R >>")
    # node 2's kids: page 3 and node 2 itself (cycle)
    b.add(
        "<< /Type /Pages /Kids [3 0 R 2 0 R] /Count 2 /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 5 0 R >> >> >>"
    )
    b.add("<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    c = _bt("72 720 Td (Cycle Survivor) Tj")
    b.add(f"<< /Length {len(c)} >>", c)
    b.add("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    return b.build_classic(cat), "Cycle Survivor" + CRLF, 1


def _case_contents_array():
    b = PdfBuilder()
    cat = b.add("<< /Type /Catalog /Pages 2 0 R >>")
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 7 0 R >> >> /Contents [4 0 R 5 0 R 6 0 R] >>"
    )
    p1 = b"BT /F1 12 Tf 72 720"
    p2 = b"Td (Split) Tj"  # the single-space join supplies token separation
    p3 = b"ET"
    for p in (p1, p2, p3):
        b.add(f"<< /Length {len(p)} >>", p)
    b.add("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    return b.build_classic(cat), "Split" + CRLF, 1


def _filtered_case(text: str, filters: str, encoder, extra_dict: str = ""):
    content = _bt(f"72 720 Td ({text}) Tj")
    enc = encoder(content)
    b, cat = simple_doc(
        content, filters=filters, encoded=enc, extra_stream_dict=extra_dict
    )
    return b.build_classic(cat), text + CRLF, 1


def _case_flate_plain():
    return _filtered_case("Flate", "/FlateDecode", zlib.compress)


def _case_flate_predictor_png_up():
    def enc(c):
        return zlib.compress(png_predict_encode(c, 20, 2))

    return _filtered_case(
        "Predictor Up",
        "/FlateDecode",
        enc,
        " /DecodeParms << /Predictor 12 /Columns 20 >>",
    )


def _case_flate_predictor_paeth():
    def enc(c):
        return zlib.compress(png_predict_encode(c, 16, 4))

    return _filtered_case(
        "Paeth",
        "/FlateDecode",
        enc,
        " /DecodeParms << /Predictor 15 /Columns 16 >>",
    )


def _case_lzw_earlychange():
    return _filtered_case("LZW LZW LZW", "/LZWDecode", lzw_encode)


def _case_lzw_predictor_tiff():
    def enc(c):
        return lzw_encode(tiff_predict_encode(c, 10))

    return _filtered_case(
        "LZW TIFF",
        "/LZWDecode",
        enc,
        " /DecodeParms << /Predictor 2 /Columns 10 >>",
    )


def _case_ahx():
    return _filtered_case("Hex", "/ASCIIHexDecode", ahx_encode)


def _case_a85():
    return _filtered_case("Ascii85", "/ASCII85Decode", a85_encode)


def _case_rle():
    return _filtered_case("RunLength   gap", "/RunLengthDecode", rl_encode)


def _case_filter_chain_a85_flate():
    def enc(c):
        return a85_encode(zlib.compress(c))

    return _filtered_case("Chain", "[/ASCII85Decode /FlateDecode]", enc)


def _case_tj_simple():
    b, cat = simple_doc(_bt("72 720 Td (Hello World) Tj"))
    return b.build_classic(cat), "Hello World" + CRLF, 1


def _case_tj_array_kerning():
    # -300/1000*12 = 3.6pt gap > 0.2*12=2.4 -> space; -100 -> 1.2 < 2.4 -> none
    ops = "72 720 Td [(To) -300 (day)] TJ 0 -50 Td [(ke) -100 (rn)] TJ"
    b, cat = simple_doc(_bt(ops))
    return b.build_classic(cat), "To day" + CRLF + "kern" + CRLF, 1


def _case_td_tm_tstar():
    ops = (
        "72 720 Td (Line1) Tj "
        "0 -20 TD (Line2) Tj "
        "T* (Line3) Tj "
        "1 0 0 1 300 500 Tm (Line4) Tj"
    )
    b, cat = simple_doc(_bt(ops))
    golden = CRLF.join(["Line1", "Line2", "Line3", "Line4"]) + CRLF
    return b.build_classic(cat), golden, 1


def _case_quote_dquote():
    ops = "14 TL 72 720 Td (First) Tj (Second) ' 4 0.5 (Third Word) \""
    b, cat = simple_doc(_bt(ops))
    golden = CRLF.join(["First", "Second", "Third Word"]) + CRLF
    return b.build_classic(cat), golden, 1


def _case_tc_tw_tz_ts():
    # Tc 3 at size 12: inter-glyph gap 3 > 2.4 -> synthetic spaces
    # Tz 50 halves the gap: 1.5 < 2.4 -> no spaces
    # Ts rise mid-string: vertical delta, dot=0 -> nothing inserted
    ops = (
        "72 720 Td 3 Tc (ABC) Tj 0 Tc "
        "0 -50 Td 5 Tw (a b) Tj 0 Tw "
        "0 -50 Td 50 Tz 3 Tc (XYZ) Tj 0 Tc 100 Tz "
        "0 -50 Td (ab) Tj 5 Ts (cd) Tj 0 Ts"
    )
    b, cat = simple_doc(_bt(ops))
    golden = CRLF.join(["A B C", "a b", "XYZ", "abcd"]) + CRLF
    return b.build_classic(cat), golden, 1


def _case_render_mode_3():
    # Tr 2 (fill+stroke) extracts the run twice, separated by a newline
    # because the second pass restarts at the word origin (pen jump).
    # Tr 3 (invisible) still extracts via the ignore_text hook.
    ops = (
        "72 720 Td 2 Tr (Dup) Tj 0 Tr "
        "0 -50 Td 3 Tr (Invisible) Tj 0 Tr"
    )
    b, cat = simple_doc(_bt(ops))
    golden = CRLF.join(["Dup", "Dup", "Invisible"]) + CRLF
    return b.build_classic(cat), golden, 1


def _case_qq_cm_nesting():
    content = (
        b"q 2 0 0 2 0 100 cm BT /F1 12 Tf 72 300 Td (Scaled) Tj ET Q "
        b"BT /F1 12 Tf 72 600 Td (Normal) Tj ET"
    )
    b, cat = simple_doc(content)
    return b.build_classic(cat), "Scaled" + CRLF + "Normal" + CRLF, 1


def _case_xobject_form():
    b = PdfBuilder()
    cat = b.add("<< /Type /Catalog /Pages 2 0 R >>")
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 5 0 R >> /XObject << /Fx 6 0 R >> >> "
        "/Contents 4 0 R >>"
    )
    content = (
        b"BT /F1 12 Tf 72 720 Td (Before) Tj ET /Fx Do "
        b"BT /F1 12 Tf 72 600 Td (After) Tj ET"
    )
    b.add(f"<< /Length {len(content)} >>", content)
    b.add("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    form = b"BT /F1 12 Tf 0 0 Td (InForm) Tj ET"
    b.add(
        "<< /Type /XObject /Subtype /Form /BBox [0 0 612 792] "
        f"/Matrix [1 0 0 1 100 560] /Length {len(form)} >>",
        form,
    )
    golden = CRLF.join(["Before", "InForm", "After"]) + CRLF
    return b.build_classic(cat), golden, 1


def _case_inline_image_skip():
    # 4x4 gray 8bpc raw image: 16 bytes including ')' 'E' 'I' decoys
    img = bytes([0x29, 0x45, 0x49, 0x00] * 4)
    content = (
        b"BT /F1 12 Tf 72 720 Td (PreImage) Tj ET "
        b"BI /W 4 /H 4 /BPC 8 /CS /G ID " + img + b" EI "
        b"BT /F1 12 Tf 72 650 Td (PostImage) Tj ET"
    )
    b, cat = simple_doc(content)
    return b.build_classic(cat), "PreImage" + CRLF + "PostImage" + CRLF, 1


def _case_extgstate_font():
    b = PdfBuilder()
    cat = b.add("<< /Type /Catalog /Pages 2 0 R >>")
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 5 0 R >> "
        "/ExtGState << /GS1 << /Type /ExtGState /Font [5 0 R 12] >> >> >> "
        "/Contents 4 0 R >>"
    )
    content = b"/GS1 gs BT 72 720 Td (ExtG) Tj ET"
    b.add(f"<< /Length {len(content)} >>", content)
    b.add("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    return b.build_classic(cat), "ExtG" + CRLF, 1


def _case_multipage():
    b = PdfBuilder()
    cat = b.add("<< /Type /Catalog /Pages 2 0 R >>")
    b.add("<< /Type /Pages /Kids [3 0 R 4 0 R 5 0 R] /Count 3 >>")
    texts = ["Page One", "Page Two", "Page Three"]
    for i, t in enumerate(texts):
        b.add(
            "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 9 0 R >> >> /Contents {6 + i} 0 R >>"
        )
    for t in texts:
        c = _bt(f"72 720 Td ({t}) Tj")
        b.add(f"<< /Length {len(c)} >>", c)
    b.add("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    return b.build_classic(cat), CRLF.join(texts) + CRLF, 3


def _case_std14_helvetica():
    b, cat = simple_doc(_bt("72 720 Td (Builtin Metrics) Tj"))
    return b.build_classic(cat), "Builtin Metrics" + CRLF, 1


def _case_times_afm_metrics():
    """Pins the Times-Bold/Italic/BoldItalic builtin AFM widths: each page
    positions a second show op just past (or just inside) the true pen
    advance so the 0.2*size space threshold flips iff the width table is
    the real AFM one (Times-Roman approximations put the pen 2.2-3.4 units
    off at size 10 over 4-6 glyphs).

    Hand-derived pens at size 10:
      p1 Bold     'mmmm'  m=833: pen 72+33.32=105.32; next Tm 105.82 ->
                  gap 0.50 <= 2 -> no space  (Roman m=778: gap 2.70 -> space)
      p2 Italic   'mmmmmm' m=722: pen 72+43.32=115.32; next Tm 117.82 ->
                  gap 2.50 > 2  -> space     (Roman: pen 118.68 -> no space)
      p3 BoldItal 'hhhhhh' h=556: pen 72+33.36=105.36; next Tm 105.86 ->
                  gap 0.50 -> no space       (Roman h=500: gap 3.86 -> space)
    """
    b = PdfBuilder()
    cat = b.add("<< /Type /Catalog /Pages 2 0 R >>")
    b.add("<< /Type /Pages /Kids [3 0 R 4 0 R 5 0 R] /Count 3 >>")
    for i in range(3):
        b.add(
            "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {9 + i} 0 R >> >> "
            f"/Contents {6 + i} 0 R >>"
        )
    pages = [
        b"BT /F1 10 Tf 1 0 0 1 72 720 Tm (mmmm) Tj"
        b" 1 0 0 1 105.82 720 Tm (x) Tj ET",
        b"BT /F1 10 Tf 1 0 0 1 72 720 Tm (mmmmmm) Tj"
        b" 1 0 0 1 117.82 720 Tm (y) Tj ET",
        b"BT /F1 10 Tf 1 0 0 1 72 720 Tm (hhhhhh) Tj"
        b" 1 0 0 1 105.86 720 Tm (z) Tj ET",
    ]
    for c in pages:
        b.add(f"<< /Length {len(c)} >>", c)
    for face in ("Times-Bold", "Times-Italic", "Times-BoldItalic"):
        b.add(f"<< /Type /Font /Subtype /Type1 /BaseFont /{face} >>")
    golden = CRLF.join(["mmmmx", "mmmmmm y", "hhhhhhz"]) + CRLF
    return b.build_classic(cat), golden, 3


# --- minimal TrueType builder (for embedded-font fixtures) -----------------
# Shares no code with pdfcore/sfnt.py: tables are hand-packed here; post
# format-2 names always use custom-string indices (>=258) so the goldens
# don't depend on the Macintosh standard-order table.


def _ttf_cmap_format4(mapping: dict[int, int]) -> bytes:
    """One segment per code (fixtures map a handful of codes)."""
    codes = sorted(mapping)
    segs = [(c, c, (mapping[c] - c) & 0xFFFF) for c in codes]
    segs.append((0xFFFF, 0xFFFF, 1))
    n = len(segs)
    length = 16 + 8 * n
    out = struct.pack(">HHHHHHH", 4, length, 0, 2 * n, 0, 0, 0)
    out += b"".join(struct.pack(">H", e) for _, e, _ in segs)
    out += b"\x00\x00"  # reservedPad
    out += b"".join(struct.pack(">H", s) for s, _, _ in segs)
    out += b"".join(struct.pack(">H", d) for _, _, d in segs)
    out += b"\x00\x00" * n  # idRangeOffset = 0 everywhere
    return out


def build_ttf(
    cmaps: list[tuple[int, int, dict[int, int]]],
    post_names: list[str] | None = None,
    advances: tuple[int, ...] = (500,),
    upem: int = 1000,
    glyphs: dict[int, list] | None = None,
) -> bytes:
    """Deterministic minimal sfnt: cmap/post/head/hhea/hmtx/maxp (what a
    text extractor consults) plus, with `glyphs`, real glyf/loca
    outlines for the raster sink — glyphs[gid] is a list of contours,
    each a list of on-curve (x, y) font-unit points; checksums left
    zero."""
    tables: dict[bytes, bytes] = {}
    head = bytearray(54)
    struct.pack_into(">I", head, 0, 0x00010000)
    struct.pack_into(">I", head, 12, 0x5F0F3CF5)  # magic
    struct.pack_into(">H", head, 18, upem)
    # indexToLocFormat (offset 50) stays 0 = short loca offsets
    tables[b"head"] = bytes(head)
    if glyphs is not None:
        nglyphs_g = max(glyphs) + 1 if glyphs else 1
        blobs = []
        for gid in range(nglyphs_g):
            conts = glyphs.get(gid)
            if not conts:
                blobs.append(b"")
                continue
            allpts = [p for c in conts for p in c]
            xs = [p[0] for p in allpts]
            ys = [p[1] for p in allpts]
            g = bytearray()
            g += struct.pack(
                ">hhhhh", len(conts), min(xs), min(ys), max(xs), max(ys)
            )
            end = -1
            for c in conts:
                end += len(c)
                g += struct.pack(">H", end)
            g += struct.pack(">H", 0)  # no instructions
            g += bytes([0x01] * len(allpts))  # on-curve, 2-byte deltas
            px = 0
            for x, _y in allpts:
                g += struct.pack(">h", x - px)
                px = x
            py = 0
            for _x, y in allpts:
                g += struct.pack(">h", y - py)
                py = y
            if len(g) % 2:
                g += b"\x00"
            blobs.append(bytes(g))
        loca = [0]
        for blob in blobs:
            loca.append(loca[-1] + len(blob))
        tables[b"glyf"] = b"".join(blobs)
        tables[b"loca"] = b"".join(
            struct.pack(">H", o // 2) for o in loca
        )
    hhea = bytearray(36)
    struct.pack_into(">I", hhea, 0, 0x00010000)
    struct.pack_into(">H", hhea, 34, len(advances))
    tables[b"hhea"] = bytes(hhea)
    tables[b"hmtx"] = b"".join(struct.pack(">Hh", a, 0) for a in advances)
    nglyphs = max(len(advances), len(post_names or ()))
    tables[b"maxp"] = struct.pack(">IH", 0x00010000, nglyphs) + bytes(26)
    subs = [(pid, eid, _ttf_cmap_format4(m)) for pid, eid, m in cmaps]
    coff = 4 + 8 * len(subs)
    recs, blobs = b"", b""
    for pid, eid, blob in subs:
        recs += struct.pack(">HHI", pid, eid, coff)
        coff += len(blob)
        blobs += blob
    tables[b"cmap"] = struct.pack(">HH", 0, len(subs)) + recs + blobs
    if post_names is None:
        tables[b"post"] = struct.pack(">I", 0x00030000) + bytes(28)
    else:
        body = struct.pack(">H", len(post_names))
        body += b"".join(
            struct.pack(">H", 258 + i) for i in range(len(post_names))
        )
        body += b"".join(
            bytes([len(nm)]) + nm.encode("latin-1") for nm in post_names
        )
        tables[b"post"] = struct.pack(">I", 0x00020000) + bytes(28) + body
    tags = sorted(tables)
    out = struct.pack(">IHHHH", 0x00010000, len(tags), 16, 0, 0)
    off = 12 + 16 * len(tags)
    payload = b""
    for t in tags:
        d = tables[t]
        pad = (-len(d)) % 4
        out += struct.pack(">4sIII", t, 0, off, len(d))
        off += len(d) + pad
        payload += d + b"\x00" * pad
    return out + payload


def _ttf_font_doc(
    content: bytes, ttf: bytes, flags: int, encoding_item: str = ""
) -> tuple[PdfBuilder, int]:
    """simple_doc whose font is an embedded TrueType (descriptor at 6,
    FontFile2 stream at 7; set() bypasses the auto-number counter)."""
    b = PdfBuilder()
    b.set(7, f"<< /Length {len(ttf)} >>", ttf)
    b.set(
        6,
        "<< /Type /FontDescriptor /FontName /TestTTF "
        f"/Flags {flags} /FontFile2 7 0 R >>",
    )
    font = (
        "<< /Type /Font /Subtype /TrueType /BaseFont /TestTTF "
        f"{encoding_item} /FontDescriptor 6 0 R >>"
    )
    return simple_doc(content, font_body=font, builder=b)


def _case_ttf_symbolic_post_names():
    """Symbolic TrueType, (3,0) MS-symbol cmap only, post format 2: codes
    hit the cmap via the 0xF000 retry; glyph names come back through the
    post table and AGL (alpha/beta/gamma -> Greek)."""
    ttf = build_ttf(
        cmaps=[(3, 0, {0xF041: 1, 0xF042: 2, 0xF043: 3})],
        post_names=[".notdef", "alpha", "beta", "gamma"],
        advances=(500, 600, 600, 600),
    )
    b, cat = _ttf_font_doc(_bt("72 720 Td (ABC) Tj"), ttf, flags=4)
    return b.build_classic(cat), "αβγ" + CRLF, 1


def _case_ttf_symbolic_post3_winansi():
    """Symbolic TrueType with NO glyph names (post format 3): the reversal
    loop falls back to the WinAnsi name of each mapped code
    (pdf_fontss.pas:786 'estrings[i] := pdf_win_ansi[i]')."""
    ttf = build_ttf(
        cmaps=[(3, 0, {0xF043: 1, 0xF061: 2, 0xF092: 3, 0xF065: 4})],
        post_names=None,
        advances=(500, 700, 500, 300, 500),
    )
    b, cat = _ttf_font_doc(_bt("72 720 Td (Ca\\222e) Tj"), ttf, flags=4)
    return b.build_classic(cat), "Ca’e" + CRLF, 1


def _case_ttf_nonsymbolic_unicode():
    """Non-symbolic TrueType: the port's charmap scan prefers (3,1) over an
    earlier (1,0) (last match wins, pdf_fontss.pas:620-633). If (1,0) won,
    'A' would be unmapped -> '?'. Unmapped 'Z' stays '?' because the
    reversal loop only names codes whose etable gid is nonzero."""
    ttf = build_ttf(
        cmaps=[
            (1, 0, {0x42: 5}),
            (3, 1, {0x41: 1, 0x42: 2}),
        ],
        post_names=None,
        advances=(500, 640, 640, 640, 640, 640),
    )
    b, cat = _ttf_font_doc(_bt("72 720 Td (ABZ) Tj"), ttf, flags=32)
    return b.build_classic(cat), "AB?" + CRLF, 1


def _case_ttf_widths_vs_hmtx():
    """ADVERSARIAL A38 metrics fixture (VERDICT r4 #5): the embedded
    TrueType's hmtx advances (700/1000) deliberately disagree with the
    PDF /Widths array (500/1000). This engine uses PDF widths for BOTH
    tm advancement and the text device's pen (fonts.py module doctrine);
    the reference instead drives its PEN from FT_Get_Advance of the
    loaded face (src/vcl/dev_textss.pas:296) while tm uses the PDF
    widths. The geometry makes the divergence MEASURABLE, not assumed
    (the space rule fires on |pen jump| > 0.2*size in either direction,
    |dot| > 0.95): at size 12, (AB) advances the PDF-widths pen to
    72+2*6.0 = 84 and the second show starts at 87 — |gap| 3.0 >= 2.4,
    so PDF-widths semantics emit 'AB CD'. An FT-advance pen sits at
    72+2*8.4 = 88.8, |gap| 1.8 < 2.4 — it would emit 'ABCD' (recorded
    in FIXTURES.md; verified by the no-/Widths hmtx-fallback variant in
    tests)."""
    ttf = build_ttf(
        cmaps=[(3, 1, {0x41: 1, 0x42: 2, 0x43: 3, 0x44: 4})],
        post_names=None,
        advances=(500, 700, 700, 700, 700),
    )
    b = PdfBuilder()
    b.set(7, f"<< /Length {len(ttf)} >>", ttf)
    b.set(
        6,
        "<< /Type /FontDescriptor /FontName /TestTTF "
        "/Flags 32 /FontFile2 7 0 R >>",
    )
    font = (
        "<< /Type /Font /Subtype /TrueType /BaseFont /TestTTF "
        "/FontDescriptor 6 0 R /FirstChar 65 /LastChar 68 "
        "/Widths [500 500 500 500] >>"
    )
    b2, cat = simple_doc(
        _bt("72 720 Td (AB) Tj 15 0 Td (CD) Tj"),
        font_body=font,
        builder=b,
    )
    return b2.build_classic(cat), "AB CD" + CRLF, 1


def _case_cff_widths_vs_charstrings():
    """ADVERSARIAL A38 metrics fixture, CFF flavor: the embedded Type1C
    program carries NO width information (endchar-only charstrings, no
    Private-DICT defaultWidthX), so an FT-advance pen would see
    advance 0 for every glyph — after (AB) it would still sit at 72,
    and the second show at 82 is a 10 pt jump: > 2.4 (space) and
    <= 10.8 (not a newline) — 'AB CD'. The PDF /Widths pen (500/1000
    at size 12) lands at 84, so 82 is a |gap| of 2.0 < 2.4 — NO space.
    Golden pins the PDF-widths choice: 'ABCD' (divergence recorded in
    FIXTURES.md)."""
    cff = build_cff(
        encoding_codes={65: 1, 66: 2, 67: 3, 68: 4},
        charset_sids=[0, 34, 35, 36, 37],  # A B C D standard SIDs
        custom_strings=[],
        n_glyphs=5,
    )
    b = PdfBuilder()
    b.set(7, f"<< /Length {len(cff)} /Subtype /Type1C >>", cff)
    b.set(
        6,
        "<< /Type /FontDescriptor /FontName /TestCFFW /Flags 4"
        " /FontFile3 7 0 R >>",
    )
    font = (
        "<< /Type /Font /Subtype /Type1 /BaseFont /TestCFFW "
        "/FontDescriptor 6 0 R /FirstChar 65 /LastChar 68 "
        "/Widths [500 500 500 500] >>"
    )
    b2, cat = simple_doc(
        _bt("72 720 Td (AB) Tj 10 0 Td (CD) Tj"),
        font_body=font,
        builder=b,
    )
    return b2.build_classic(cat), "ABCD" + CRLF, 1


def _cff_index(items: list[bytes]) -> bytes:
    """Serialize a CFF INDEX (offSize 2 for simplicity)."""
    if not items:
        return struct.pack(">H", 0)
    offs = [1]
    for it in items:
        offs.append(offs[-1] + len(it))
    out = struct.pack(">HB", len(items), 2)
    out += b"".join(struct.pack(">H", o) for o in offs)
    return out + b"".join(items)


def _t1_encrypt(data: bytes, r: int) -> bytes:
    """Adobe Type1 eexec/charstring ENcryption (fixture-side inverse of
    the decoder in pdfcore/glyphs.py)."""
    c1, c2 = 52845, 22719
    out = bytearray()
    for b in data:
        c = b ^ (r >> 8)
        out.append(c)
        r = ((c + r) * c1 + c2) & 0xFFFF
    return bytes(out)


def t1_charstring(contours: list, wx: int = 600) -> bytes:
    """Encode closed polygonal contours as a Type1 charstring:
    hsbw, rmoveto/rlinetos + closepath per contour, endchar."""

    def num(v: int) -> bytes:
        v = int(v)
        if -107 <= v <= 107:
            return bytes([v + 139])
        return b"\xff" + struct.pack(">i", v)

    out = bytearray(num(0) + num(wx) + bytes([13]))  # 0 wx hsbw
    x = y = 0
    for cont in contours:
        x0, y0 = cont[0]
        out += num(x0 - x) + num(y0 - y) + bytes([21])  # rmoveto
        x, y = x0, y0
        for px, py in cont[1:]:
            out += num(px - x) + num(py - y) + bytes([5])  # rlineto
            x, y = px, py
        out += bytes([9])  # closepath
    out += bytes([14])  # endchar
    return bytes(out)


def build_type1(
    glyphs: dict[str, list], encoding: dict[int, str]
) -> bytes:
    """Author a PFA-style Type1 program: cleartext /Encoding (dup-put
    entries), eexec-encrypted private section with lenIV-4 encrypted
    CharStrings."""
    clear = (
        b"%!PS-AdobeFont-1.0: FixT1 001.001\n"
        b"/FontName /FixT1 def\n"
        b"/PaintType 0 def\n"
        b"/Encoding 256 array\n"
        b"0 1 255 {1 index exch /.notdef put} for\n"
    )
    for code, name in sorted(encoding.items()):
        clear += f"dup {code} /{name} put\n".encode()
    clear += b"readonly def\ncurrentdict end\ncurrentfile eexec\n"
    cs = bytearray()
    for name, conts in glyphs.items():
        enc_cs = _t1_encrypt(b"\x00\x00\x00\x00" + t1_charstring(conts), 4330)
        cs += f"/{name} {len(enc_cs)} RD ".encode() + enc_cs + b" ND\n"
    priv = (
        b"dup /Private 8 dict dup begin\n/lenIV 4 def\n"
        + f"/CharStrings {len(glyphs)} dict dup begin\n".encode()
        + bytes(cs)
        + b"end end\nmark currentfile closefile\n"
    )
    return clear + _t1_encrypt(b"\x49\x58\x33\x27" + priv, 55665)


def t2_num(v: int) -> bytes:
    """Type2 charstring number encoding (28 + int16 form: unambiguous)."""
    import struct as _struct

    return b"\x1c" + _struct.pack(">h", v)


def t2_path(contours: list) -> bytes:
    """Encode closed polygonal contours as a Type2 charstring:
    rmoveto + rlinetos per contour, endchar."""
    out = bytearray()
    x = y = 0
    for cont in contours:
        (x0, y0) = cont[0]
        out += t2_num(x0 - x) + t2_num(y0 - y) + bytes([21])  # rmoveto
        x, y = x0, y0
        for px, py in cont[1:]:
            out += t2_num(px - x) + t2_num(py - y) + bytes([5])  # rlineto
            x, y = px, py
    out += bytes([14])  # endchar
    return bytes(out)


def build_cff(
    encoding_codes: dict[int, int],
    charset_sids: list[int],
    custom_strings: list[bytes],
    n_glyphs: int,
    charstrings: list[bytes] | None = None,
) -> bytes:
    """Minimal CFF: header, Name/TopDICT/String/GSubr INDEXes, format-0
    encoding (code->gid in gid order), format-0 charset, dummy
    CharStrings INDEX sized n_glyphs. Top DICT offsets use fixed-width
    5-byte ints so layout is a single pass."""
    header = b"\x01\x00\x04\x02"
    name_idx = _cff_index([b"TestCFF"])
    string_idx = _cff_index(custom_strings)
    gsubr_idx = _cff_index([])
    # format-0 encoding: codes listed for gid 1..nCodes
    codes_by_gid = sorted(encoding_codes.items(), key=lambda kv: kv[1])
    enc = bytes([0, len(codes_by_gid)]) + bytes(
        c for c, _g in codes_by_gid
    )
    charset = b"\x00" + b"".join(
        struct.pack(">H", sid) for sid in charset_sids[1:]
    )
    charstrings = _cff_index(
        charstrings
        if charstrings is not None
        else [b"\x0e"] * n_glyphs  # endchar stubs (text path never looks)
    )
    # top dict: 3 entries of (29 <int32> op) = 18 bytes
    top_dict_size = 18
    top_idx_prefix = struct.pack(">HB", 1, 2) + struct.pack(
        ">HH", 1, 1 + top_dict_size
    )
    pre = len(header) + len(name_idx) + len(top_idx_prefix) + top_dict_size
    charset_off = pre + len(string_idx) + len(gsubr_idx)
    enc_off = charset_off + len(charset)
    cs_off = enc_off + len(enc)
    top = (
        b"\x1d" + struct.pack(">i", charset_off) + b"\x0f"
        + b"\x1d" + struct.pack(">i", enc_off) + b"\x10"
        + b"\x1d" + struct.pack(">i", cs_off) + b"\x11"
    )
    return (
        header + name_idx + top_idx_prefix + top
        + string_idx + gsubr_idx + charset + enc + charstrings
    )


def _case_cff_custom_encoding():
    """Embedded CFF (FontFile3 /Type1C) with a custom builtin encoding:
    code->gid via the CFF Encoding, gid->name via the charset (custom SID
    'alpha', standard SID 34 'A', custom 'gamma')."""
    cff = build_cff(
        encoding_codes={65: 1, 66: 2, 67: 3},
        charset_sids=[0, 391, 34, 392],
        custom_strings=[b"alpha", b"gamma"],
        n_glyphs=4,
    )
    b = PdfBuilder()
    b.set(7, f"<< /Length {len(cff)} /Subtype /Type1C >>", cff)
    b.set(
        6,
        "<< /Type /FontDescriptor /FontName /TestCFF /Flags 4"
        " /FontFile3 7 0 R >>",
    )
    font = (
        "<< /Type /Font /Subtype /Type1 /BaseFont /TestCFF "
        "/FontDescriptor 6 0 R /FirstChar 65 /LastChar 67 "
        "/Widths [600 600 600] >>"
    )
    b2, cat = simple_doc(_bt("72 720 Td (ABC) Tj"), font_body=font, builder=b)
    return b2.build_classic(cat), "αAγ" + CRLF, 1


def _case_type1_builtin_encoding():
    """Embedded Type1 program with a custom builtin /Encoding (the LaTeX
    shape: no /Encoding in the font dict; names live in the cleartext of
    the FontFile). dup entries map A->alpha, B->beta; 'C' stays unset ->
    '?'."""
    pfa = (
        b"%!PS-AdobeFont-1.0: TestT1 001.001\n"
        b"/FontName /TestT1 def\n"
        b"/PaintType 0 def\n"
        b"/Encoding 256 array\n"
        b"0 1 255 {1 index exch /.notdef put} for\n"
        b"dup 65 /alpha put\n"
        b"dup 66 /beta put\n"
        b"readonly def\n"
        b"currentdict end\n"
        b"currentfile eexec\n"
        b"\x01\x02\x03binary-junk-not-parsed\x04\x05"
    )
    b = PdfBuilder()
    b.set(
        7,
        f"<< /Length {len(pfa)} /Length1 {len(pfa) - 30} /Length2 25"
        " /Length3 0 >>",
        pfa,
    )
    b.set(
        6,
        "<< /Type /FontDescriptor /FontName /TestT1 /Flags 4"
        " /FontFile 7 0 R >>",
    )
    font = (
        "<< /Type /Font /Subtype /Type1 /BaseFont /TestT1 "
        "/FontDescriptor 6 0 R /FirstChar 65 /LastChar 67 "
        "/Widths [500 500 500] >>"
    )
    b2, cat = simple_doc(_bt("72 720 Td (ABC) Tj"), font_body=font, builder=b)
    return b2.build_classic(cat), "αβ?" + CRLF, 1


def _tounicode_stream(body: str) -> str:
    return (
        "/CIDInit /ProcSet findresource begin 12 dict begin begincmap "
        "/CMapName /Custom def /CMapType 2 def "
        "1 begincodespacerange <00> <FF> endcodespacerange "
        + body
        + " endcmap CMapName currentdict /CMap defineresource pop end end"
    )


def _simple_font_with_tounicode(b: PdfBuilder, tounicode_body: str, encoding="/WinAnsiEncoding") -> str:
    # ToUnicode stream lives at object 6; simple_doc fills 1..5 afterwards
    # (set() bypasses the auto-number counter on purpose)
    tu = _tounicode_stream(tounicode_body).encode()
    b.set(6, f"<< /Length {len(tu)} >>", tu)
    return (
        "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        f"/Encoding {encoding} /ToUnicode 6 0 R >>"
    )


def _case_winansi_differences():
    font = (
        "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        "/Encoding << /BaseEncoding /WinAnsiEncoding "
        "/Differences [65 /eacute /uni0042 67 /trademark] >> >>"
    )
    b, cat = simple_doc(_bt("72 720 Td (ABCD) Tj"), font_body=font)
    golden = "éB™D" + CRLF
    return b.build_classic(cat), golden, 1


def _case_macroman():
    font = (
        "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        "/Encoding /MacRomanEncoding >>"
    )
    b, cat = simple_doc(_bt("72 720 Td (caf\\216) Tj"), font_body=font)
    return b.build_classic(cat), "café" + CRLF, 1


def _case_tounicode_bfchar():
    b = PdfBuilder()
    font = _simple_font_with_tounicode(
        b, "2 beginbfchar <41> <0416> <42> <00660066> endbfchar"
    )
    b2, cat = simple_doc(_bt("72 720 Td (AB) Tj"), font_body=font, builder=b)
    golden = "Жff" + CRLF
    return b2.build_classic(cat), golden, 1


def _case_tounicode_bfrange():
    b = PdfBuilder()
    font = _simple_font_with_tounicode(
        b,
        "2 beginbfrange <41> <43> <0061> <44> <45> [<0058> <0059>] endbfrange",
    )
    b2, cat = simple_doc(_bt("72 720 Td (ABCDE) Tj"), font_body=font, builder=b)
    golden = "abcXY" + CRLF
    return b2.build_classic(cat), golden, 1


def _case_ligatures():
    b = PdfBuilder()
    font = _simple_font_with_tounicode(
        b,
        "7 beginbfchar <41> <FB00> <42> <FB01> <43> <FB02> <44> <FB03> "
        "<45> <FB04> <46> <FB05> <47> <FB06> endbfchar",
    )
    b2, cat = simple_doc(
        _bt("72 720 Td (A B C D E F G) Tj"), font_body=font, builder=b
    )
    # reference quirk: FB01 (fi) also expands to 'ff'
    golden = "ff ff fl ffi ffl st st" + CRLF
    return b2.build_classic(cat), golden, 1


def _identity_h_doc(
    text_ops: str,
    w_clause: str = "",
    tounicode_identity: bool = True,
    encoding: str = "/Identity-H",
) -> PdfBuilder:
    b = PdfBuilder()
    b.add("<< /Type /Catalog /Pages 2 0 R >>")
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"
    )
    content = f"BT /F1 12 Tf {text_ops} ET".encode("latin-1")
    b.add(f"<< /Length {len(content)} >>", content)
    tu = ""
    if tounicode_identity:
        tu_data = (
            "/CIDInit /ProcSet findresource begin begincmap "
            "1 begincodespacerange <0000> <FFFF> endcodespacerange "
            "1 beginbfrange <0000> <FFFF> <0000> endbfrange endcmap end"
        ).encode()
        tu_num = 7
        b.add(f"<< /Length {len(tu_data)} >>", tu_data, num=7)
        tu = f" /ToUnicode {tu_num} 0 R"
    b.add(
        "<< /Type /Font /Subtype /Type0 /BaseFont /Synth-CID "
        f"/Encoding {encoding} /DescendantFonts [6 0 R]{tu} >>",
        num=5,
    )
    b.add(
        "<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Synth-CID "
        "/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
        f"/Supplement 0 >> /FontDescriptor 8 0 R /DW 1000{w_clause} >>",
        num=6,
    )
    b.add(
        "<< /Type /FontDescriptor /FontName /Synth-CID /Flags 4 "
        "/FontBBox [0 -200 1000 900] /ItalicAngle 0 /Ascent 800 "
        "/Descent -200 /CapHeight 700 /StemV 80 >>",
        num=8,
    )
    return b


def _hex16(s: str) -> str:
    return "<" + "".join(f"{ord(c):04X}" for c in s) + ">"


def _case_type0_identity_h():
    ops = f"72 720 Td {_hex16('Hello CID')} Tj"
    b = _identity_h_doc(ops)
    return b.build_classic(1), "Hello CID" + CRLF, 1


def _case_type0_system_cmap():
    # predefined CJK CMap from the generated data module: ASCII codes map
    # through UniGB-UCS2-H to Adobe-GB1 CIDs (1..95 = 0x20..0x7E); the
    # identity ToUnicode (keyed by code) restores the text
    ops = f"72 720 Td {_hex16('system cmap')} Tj"
    b = _identity_h_doc(ops, encoding="/UniGB-UCS2-H")
    return b.build_classic(1), "system cmap" + CRLF, 1


def _case_type0_gb_no_tounicode():
    # NO ToUnicode: the Adobe-GB1 collection resolves to the
    # Adobe-GB1-UCS2 system cmap (pdf_load_to_unicode collection branch)
    ops = f"72 720 Td {_hex16(chr(0x4E2D)+chr(0x56FD))} Tj"
    b = _identity_h_doc(ops, encoding="/UniGB-UCS2-H", tounicode_identity=False)
    # descendant needs Registry Adobe / Ordering GB1
    o6 = b.objects[6]
    o6.body = o6.body.replace("/Ordering (Identity)", "/Ordering (GB1)")
    return b.build_classic(1), chr(0x4E2D) + chr(0x56FD) + CRLF, 1


def _case_type0_unknown_cmap():
    # a CMap name that exists nowhere: font load fails gracefully, the
    # page extracts empty, and the metrics record the failure code
    ops = f"72 720 Td {_hex16('missing')} Tj"
    b = _identity_h_doc(ops, encoding="/NoSuch-UCS2-H")
    return b.build_classic(1), CRLF, 1


def _case_cid_w_widths():
    ops = f"72 720 Td [{_hex16('CID')} -300 {_hex16('Widths')}] TJ"
    w = " /W [72 [600] 105 [250 250] 67 73 500]"
    b = _identity_h_doc(ops, w_clause=w)
    return b.build_classic(1), "CID Widths" + CRLF, 1


def _case_type3_widths():
    b = PdfBuilder()
    cat = b.add("<< /Type /Catalog /Pages 2 0 R >>")
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"
    )
    content = b"BT /F1 12 Tf 72 720 Td (abc) Tj ET"
    b.add(f"<< /Length {len(content)} >>", content)
    glyph = b"50 0 0 0 50 50 d1"
    g1 = b.add(f"<< /Length {len(glyph)} >>", glyph, num=6)
    tu = _tounicode_stream(
        "3 beginbfchar <61> <0054> <62> <0033> <63> <0021> endbfchar"
    ).encode()
    b.add(f"<< /Length {len(tu)} >>", tu, num=7)
    b.add(
        "<< /Type /Font /Subtype /Type3 /Name /T3 "
        "/FontMatrix [0.01 0 0 0.01 0 0] /FontBBox [0 0 100 100] "
        "/FirstChar 97 /LastChar 99 /Widths [50 60 70] "
        "/Encoding << /Differences [97 /ga 98 /gb 99 /gc] >> "
        "/CharProcs << /ga 6 0 R /gb 6 0 R /gc 6 0 R >> "
        "/ToUnicode 7 0 R >>",
        num=5,
    )
    # 'abc' -> T3! via ToUnicode; Type3 width quirk (LastChar dropped) only
    # affects pen advance after the final glyph -> invisible here
    return b.build_classic(cat), "T3!" + CRLF, 1


def _case_wmode_vertical():
    # Identity-V: each glyph's pen moves UP (horizontal advance along the
    # vertical dir vector) while tm steps DOWN -> every glyph pair is a
    # line break (MuPDF 1.0 behavior, see SURVEY §2.A A38)
    ops = f"306 700 Td {_hex16('VERT')} Tj"
    b = _identity_h_doc(ops, encoding="/Identity-V")
    golden = CRLF.join("VERT") + CRLF
    return b.build_classic(1), golden, 1


def _case_vertical_word_space():
    """ADVERSARIAL A38: word spacing in VERTICAL mode on a 2-BYTE space
    code (VERDICT r4 #5). Two reference quirks pinned at once, with the
    geometry chosen so each is measurable:

    - Tw applies after RAW codepoint 32 even when it arrives as the
      2-byte Identity-V code <0020> (pdf_show_string,
      src/vcl/pdf_fontss.pas show path :546-580 — spec-conformant
      readers restrict word spacing to 1-byte code 32, the reference
      does not), and in wmode 1 it is an UNSCALED (0, tadj) translate.
    - the vertical pen quirk: the pen moves UP by the horizontal
      advance while tm steps DOWN by the vmtx default (-1000/1000 *
      size), so at size 12 the space-glyph pen sits +12 while the next
      origin sits -12 + Tw: distance |Tw - 24|.

    At Tw 18 the distance is 6 — inside the 0.9*size=10.8 line
    threshold, past the 0.2*size space threshold, so 'T' JOINS the
    space's line: 'V', ' T'. If Tw were ignored for the 2-byte code
    (or applied scaled), the distance would be 24 — a line break:
    'V', ' ', 'T'. The Tw-less control is pinned alongside in
    wmode_vertical."""
    ops = f"18 Tw 306 700 Td {_hex16('V T')} Tj"
    b = _identity_h_doc(ops, encoding="/Identity-V")
    golden = "V" + CRLF + " T" + CRLF
    return b.build_classic(1), golden, 1


def _case_wmode_vertical_cjk():
    """Predefined vertical CMap (UniGB-UCS2-V): wmode comes from the cmap;
    each glyph's pen moves opposite the tm step -> one glyph per line."""
    text = "中文直書"
    ops = f"306 700 Td {_hex16(text)} Tj"
    b = _identity_h_doc(ops, encoding="/UniGB-UCS2-V")
    golden = CRLF.join(text) + CRLF
    return b.build_classic(1), golden, 1


def _case_control_chars():
    b = PdfBuilder()
    font = _simple_font_with_tounicode(
        b, "2 beginbfchar <41> <0007> <42> <0000> endbfchar"
    )
    b2, cat = simple_doc(_bt("72 720 Td (aAbB) Tj"), font_body=font, builder=b)
    # A -> U+0007 -> '?' at serialization; B -> 0 -> '?' at show_char
    return b2.build_classic(cat), "a?b?" + CRLF, 1


# --- encryption --------------------------------------------------------------


def _std_OU(r: int, length_bytes: int, p: int, doc_id: bytes, user_pw: bytes = b"", owner_pw: bytes = b""):
    """Algorithms 3.2-3.5 of the PDF spec (owner pw defaults to user pw)."""
    opw = (owner_pw or user_pw) + PAD
    h = hashlib.md5(opw[:32]).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:length_bytes]).digest()
    rc4_key = h[:length_bytes]
    upw = (user_pw + PAD)[:32]
    o = rc4(rc4_key, upw)
    if r >= 3:
        for i in range(1, 20):
            k = bytes(bb ^ i for bb in rc4_key)
            o = rc4(k, o)
    # encryption key (Algorithm 3.2)
    m = hashlib.md5()
    m.update((user_pw + PAD)[:32])
    m.update(o[:32])
    m.update(struct.pack("<I", p & 0xFFFFFFFF))
    m.update(doc_id)
    key = m.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:length_bytes]).digest()
    key = key[:length_bytes]
    if r == 2:
        u = rc4(key, PAD)
    else:
        mu = hashlib.md5()
        mu.update(PAD)
        mu.update(doc_id)
        u = rc4(key, mu.digest())
        for i in range(1, 20):
            k = bytes(bb ^ i for bb in key)
            u = rc4(k, u)
        u = u + b"\x00" * 16
    return o, u, key


def _objkey(key: bytes, num: int, gen: int, aes: bool) -> bytes:
    msg = key + struct.pack("<i", num)[:3] + struct.pack("<i", gen)[:2]
    if aes:
        msg += b"sAlT"
    n = min(len(key) + 5, 16)
    return hashlib.md5(msg).digest()[:n]


def _encrypted_doc(
    method: str, user_pw: bytes = b"", owner_pw: bytes = b""
):
    doc_id = bytes(range(16))
    p = 0xFFFFFFFC
    if method == "rc4":
        r, v, nbytes = 3, 2, 16
        enc_extra = ""
    else:
        r, v, nbytes = 4, 4, 16
        enc_extra = (
            " /CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
            "/StmF /StdCF /StrF /StdCF"
        )
    o, u, key = _std_OU(
        r, nbytes, p, doc_id, user_pw=user_pw, owner_pw=owner_pw
    )
    label = "Encrypted RC4" if method == "rc4" else "Encrypted AES"
    content = _bt(f"72 720 Td ({label}) Tj")
    num = 4  # content stream object number in simple_doc
    if method == "rc4":
        enc_content = rc4(_objkey(key, num, 0, False), content)
    else:
        iv = bytes(range(16))
        enc_content = aes_cbc_encrypt(_objkey(key, num, 0, True), iv, content)
    b, cat = simple_doc(content, encoded=enc_content)
    # fix the /Length to the encrypted payload
    b.set(4, f"<< /Length {len(enc_content)} >>", enc_content)
    enc_num = b.add(
        f"<< /Filter /Standard /V {v} /R {r} /Length {nbytes * 8} "
        f"/P -4 /O <{o.hex().upper()}> /U <{u.hex().upper()}>{enc_extra} >>"
    )
    data = b.build_classic(
        cat, encrypt_clause=f"/Encrypt {enc_num} 0 R", doc_id=doc_id
    )
    return data, label + CRLF, 1


def _r6_hash(password: bytes, salt: bytes, udata: bytes) -> bytes:
    """PDF 2.0 Algorithm 2.B (the R6 iterated hash) for AUTHORING
    fixtures — same spec math the parser implements in crypt._hash_r6,
    written out here so the fixture encodes from the spec text."""
    from .pdfcore.crypt import AES

    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        aes = AES(k[:16])
        prev = k[16:32]
        e = bytearray()
        for j in range(0, len(k1), 16):
            blk = bytes(a ^ b for a, b in zip(k1[j : j + 16], prev))
            enc = aes.encrypt_block(blk)
            e += enc
            prev = enc
        mod = sum(e[:16]) % 3
        if mod == 0:
            k = hashlib.sha256(bytes(e)).digest()
        elif mod == 1:
            k = hashlib.sha384(bytes(e)).digest()
        else:
            k = hashlib.sha512(bytes(e)).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def _aes_cbc_raw(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC with NO padding and NO IV prefix (Algorithms 8/9 wrap the
    32-byte file key exactly)."""
    from .pdfcore.crypt import AES

    aes = AES(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        enc = aes.encrypt_block(blk)
        out += enc
        prev = enc
    return bytes(out)


def _encrypted_doc_r6(user_pw: bytes = b"", owner_pw: bytes = b""):
    """AES-256 / R6 (PDF 2.0 7.6.4): U/UE from Algorithm 8, O/OE from
    Algorithm 9, content encrypted with the 32-byte file key directly
    (R>=5 uses no per-object key derivation)."""
    owner_pw = owner_pw or user_pw
    fk = bytes(range(32, 64))  # deterministic 256-bit file key
    uvs, uks = bytes(range(8)), bytes(range(8, 16))
    ovs, oks = bytes(range(16, 24)), bytes(range(24, 32))
    u = _r6_hash(user_pw, uvs, b"") + uvs + uks
    ue = _aes_cbc_raw(_r6_hash(user_pw, uks, b""), b"\x00" * 16, fk)
    o = _r6_hash(owner_pw, ovs, u[:48]) + ovs + oks
    oe = _aes_cbc_raw(
        _r6_hash(owner_pw, oks, u[:48]), b"\x00" * 16, fk
    )
    label = "Encrypted AES256"
    content = _bt(f"72 720 Td ({label}) Tj")
    iv = bytes(range(16))
    enc_content = aes_cbc_encrypt(fk, iv, content)
    b, cat = simple_doc(content, encoded=enc_content)
    b.set(4, f"<< /Length {len(enc_content)} >>", enc_content)
    enc_num = b.add(
        "<< /Filter /Standard /V 5 /R 6 /Length 256 /P -4 "
        "/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
        "/StmF /StdCF /StrF /StdCF "
        f"/O <{o.hex().upper()}> /U <{u.hex().upper()}> "
        f"/OE <{oe.hex().upper()}> /UE <{ue.hex().upper()}> >>"
    )
    data = b.build_classic(
        cat, encrypt_clause=f"/Encrypt {enc_num} 0 R",
        doc_id=bytes(range(16)),
    )
    return data, label + CRLF, 1


def _case_aesv3_empty_password():
    """R6/AES-256 with the empty user password: must auto-open through
    the SHA-2 family auth + /UE key unwrap (crypt._auth_user_r56)."""
    return _encrypted_doc_r6()


def _case_rc4_empty_password():
    return _encrypted_doc("rc4")


def _case_aesv2_empty_password():
    return _encrypted_doc("aes")


def _case_encrypted_password():
    data, _, _ = _encrypted_doc("rc4", user_pw=b"secret")
    return data, None, 0  # golden None => expected status 'failed'


def _case_outline_links():
    """Outlines (2 levels) + a URI link annotation + a GoTo link."""
    b = PdfBuilder()
    cat = b.add("<< /Type /Catalog /Pages 2 0 R /Outlines 6 0 R >>")
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R "
        "/Annots [10 0 R 11 0 R] >>"
    )
    c = _bt("72 720 Td (NavDoc) Tj")
    b.add(f"<< /Length {len(c)} >>", c)
    b.add("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    b.add("<< /Type /Outlines /First 7 0 R /Last 8 0 R /Count 3 >>", num=6)
    b.add(
        "<< /Title (Chapter 1) /Parent 6 0 R /Next 8 0 R /First 9 0 R "
        "/Last 9 0 R /Dest [3 0 R /XYZ 0 792 0] >>",
        num=7,
    )
    b.add("<< /Title (Chapter 2) /Parent 6 0 R /Prev 7 0 R >>", num=8)
    b.add("<< /Title (Section 1.1) /Parent 7 0 R >>", num=9)
    b.add(
        "<< /Type /Annot /Subtype /Link /Rect [72 700 200 720] "
        "/A << /S /URI /URI (https://example.org/spec) >> >>",
        num=10,
    )
    b.add(
        "<< /Type /Annot /Subtype /Link /Rect [72 650 200 670] "
        "/Dest [3 0 R /Fit] >>",
        num=11,
    )
    return b.build_classic(cat), "NavDoc" + CRLF, 1


def _case_symbol_font():
    """Base-14 Symbol font: built-in SymbolEncoding maps Latin codes to
    Greek letters via AGL."""
    font = (
        "<< /Type /Font /Subtype /Type1 /BaseFont /Symbol "
        "/FirstChar 97 /LastChar 122 /Widths [631 549 549 494 439 521 411 "
        "603 329 603 549 549 576 521 549 549 521 549 603 439 576 713 686 "
        "493 686 494] >>"
    )
    b, cat = simple_doc(_bt("72 720 Td (abgd) Tj"), font_body=font)
    return b.build_classic(cat), "αβγδ" + CRLF, 1


def _case_annot_appearance():
    """FreeText annotation: its /AP /N form runs after the page content,
    positioned by the Rect<->BBox matrix. An annotation with the Hidden
    flag set must NOT extract."""
    b = PdfBuilder()
    cat = b.add("<< /Type /Catalog /Pages 2 0 R >>")
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R "
        "/Annots [6 0 R 8 0 R] >>"
    )
    content = _bt("72 720 Td (Main) Tj")
    b.add(f"<< /Length {len(content)} >>", content)
    b.add("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    b.add(
        "<< /Type /Annot /Subtype /FreeText /Rect [200 600 400 650] "
        "/AP << /N 7 0 R >> >>",
        num=6,
    )
    ap = b"BT /F1 12 Tf 10 10 Td (Annot) Tj ET"
    b.add(
        "<< /Type /XObject /Subtype /Form /BBox [0 0 200 50] "
        "/Resources << /Font << /F1 5 0 R >> >> "
        f"/Length {len(ap)} >>",
        ap,
        num=7,
    )
    hidden_ap = b"BT /F1 12 Tf 10 10 Td (HiddenAnnot) Tj ET"
    b.add(
        "<< /Type /Annot /Subtype /FreeText /Rect [100 100 300 150] /F 2 "
        "/AP << /N 9 0 R >> >>",
        num=8,
    )
    b.add(
        "<< /Type /XObject /Subtype /Form /BBox [0 0 200 50] "
        "/Resources << /Font << /F1 5 0 R >> >> "
        f"/Length {len(hidden_ap)} >>",
        hidden_ap,
        num=9,
    )
    return b.build_classic(cat), "Main" + CRLF + "Annot" + CRLF, 1


def _case_ocg_layers():
    """Optional-content (OCG) visibility: pdf_is_hidden_ocg
    (src/vcl/pdf_interprets.pas:20-39) hides an XObject/annotation iff
    /OC -> /OCGs -> [0] -> /Usage/View/ViewState == /OFF.

    Four probes:
    - /FxOff: OCMD whose /OCGs array's first OCG has ViewState OFF -> SKIPPED
      (the pdf_run_Do check, pas:1494).
    - /FxOn:  same shape, ViewState ON (and /OCGs as a direct dict, covering
      the non-array branch) -> extracted.
    - /FxBare: /OC points DIRECTLY at an OCG (no /OCGs key) whose usage says
      OFF -- the reference's chain breaks at fz_dict_gets(obj,'OCGs') so it
      is NOT hidden -> extracted (reference quirk, matched deliberately).
    - annotation whose /OC is the OFF OCMD -> SKIPPED (pas:2689).
    """
    b = PdfBuilder()
    cat = b.add("<< /Type /Catalog /Pages 2 0 R >>")
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 5 0 R >> "
        "/XObject << /FxOff 6 0 R /FxOn 9 0 R /FxBare 12 0 R >> >> "
        "/Contents 4 0 R /Annots [14 0 R] >>"
    )
    content = (
        b"BT /F1 12 Tf 72 720 Td (Page) Tj ET "
        b"/FxOff Do /FxOn Do /FxBare Do"
    )
    b.add(f"<< /Length {len(content)} >>", content)
    b.add("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    off_form = b"BT /F1 12 Tf 0 0 Td (OffLayer) Tj ET"
    b.add(
        "<< /Type /XObject /Subtype /Form /OC 7 0 R /BBox [0 0 200 50] "
        f"/Matrix [1 0 0 1 72 690] /Length {len(off_form)} >>",
        off_form,
        num=6,
    )
    b.add("<< /Type /OCMD /OCGs [8 0 R] >>", num=7)
    b.add(
        "<< /Type /OCG /Name (Watermark) "
        "/Usage << /View << /ViewState /OFF >> >> >>",
        num=8,
    )
    on_form = b"BT /F1 12 Tf 0 0 Td (OnLayer) Tj ET"
    b.add(
        "<< /Type /XObject /Subtype /Form /OC 10 0 R /BBox [0 0 200 50] "
        f"/Matrix [1 0 0 1 72 650] /Length {len(on_form)} >>",
        on_form,
        num=9,
    )
    b.add("<< /Type /OCMD /OCGs 11 0 R >>", num=10)
    b.add(
        "<< /Type /OCG /Name (Body) "
        "/Usage << /View << /ViewState /ON >> >> >>",
        num=11,
    )
    bare_form = b"BT /F1 12 Tf 0 0 Td (BareOCG) Tj ET"
    b.add(
        "<< /Type /XObject /Subtype /Form /OC 13 0 R /BBox [0 0 200 50] "
        f"/Matrix [1 0 0 1 72 610] /Length {len(bare_form)} >>",
        bare_form,
        num=12,
    )
    b.add(
        "<< /Type /OCG /Name (Direct) "
        "/Usage << /View << /ViewState /OFF >> >> >>",
        num=13,
    )
    b.add(
        "<< /Type /Annot /Subtype /FreeText /OC 7 0 R "
        "/Rect [100 100 300 150] /AP << /N 15 0 R >> >>",
        num=14,
    )
    annot_ap = b"BT /F1 12 Tf 10 10 Td (OcgAnnot) Tj ET"
    b.add(
        "<< /Type /XObject /Subtype /Form /BBox [0 0 200 50] "
        "/Resources << /Font << /F1 5 0 R >> >> "
        f"/Length {len(annot_ap)} >>",
        annot_ap,
        num=15,
    )
    golden = CRLF.join(["Page", "OnLayer", "BareOCG"]) + CRLF
    return b.build_classic(cat), golden, 1


def _case_shading_ops():
    """Shading operators for the census (src/vcl/pdf_shadess.pas
    dispatches ShadingType 1..7): a page that fires `sh` against a
    function-based (1), axial (2), radial (3) and free-form-mesh (4,
    stream-based) shading, plus a fill through a PatternType-2 shading
    pattern set with scn — both entry paths into the reference's
    shading evaluator. Text extraction ignores all of it (the north
    rule's text device has no shading hook), so the golden text is just
    the page text; the op census classifies every target by type."""
    b = PdfBuilder()
    cat = b.add("<< /Type /Catalog /Pages 2 0 R >>")
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 5 0 R >> "
        "/Shading << /Ax 6 0 R /Ra 7 0 R /Fn 8 0 R /Me 9 0 R >> "
        "/Pattern << /P1 10 0 R >> >> "
        "/Contents 4 0 R >>"
    )
    content = (
        b"BT /F1 12 Tf 72 720 Td (ShadingPage) Tj ET "
        b"q /Ax sh Q q /Ra sh Q q /Fn sh Q q /Me sh Q "
        b"/Pattern cs /P1 scn 100 100 200 120 re f"
    )
    b.add(f"<< /Length {len(content)} >>", content)
    b.add("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    fn2 = (
        "<< /FunctionType 2 /Domain [0 1] /C0 [1 0 0] /C1 [0 0 1] /N 1 >>"
    )
    b.add(
        "<< /ShadingType 2 /ColorSpace /DeviceRGB "
        f"/Coords [0 0 612 792] /Function {fn2} >>",
        num=6,
    )
    b.add(
        "<< /ShadingType 3 /ColorSpace /DeviceRGB "
        f"/Coords [306 396 0 306 396 300] /Function {fn2} >>",
        num=7,
    )
    b.add(
        "<< /ShadingType 1 /ColorSpace /DeviceRGB "
        f"/Domain [0 1 0 1] /Function {fn2} >>",
        num=8,
    )
    # type 4 free-form Gouraud mesh is a STREAM shading: one triangle,
    # 8-bit coords/colors (census only reads /ShadingType; the payload
    # just has to be spec-shaped)
    mesh = bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 255, 0, 0, 128, 128, 0, 0, 255])
    b.add(
        "<< /ShadingType 4 /ColorSpace /DeviceRGB /BitsPerCoordinate 8 "
        "/BitsPerComponent 8 /BitsPerFlag 8 "
        f"/Decode [0 612 0 792 0 1 0 1 0 1] /Length {len(mesh)} >>",
        mesh,
        num=9,
    )
    b.add(
        "<< /Type /Pattern /PatternType 2 /Shading 7 0 R >>",
        num=10,
    )
    golden = "ShadingPage" + CRLF
    return b.build_classic(cat), golden, 1


def _case_render_ops():
    """Raster-sink fixture (A43): one page exercising every draw-device
    hook with hand-computable pixels — rect fill, clipped fill, stroke,
    embedded-TTF glyph text (solid block + triangle glyphs so coverage
    is analytic), a 2x2 Flate RGB image, and an axial shading inside a
    clip. The golden TEXT is what the text device sees ('AB'); the
    pixel assertions live in tests/test_raster.py."""
    ttf = build_ttf(
        cmaps=[(3, 1, {0x41: 1, 0x42: 2})],
        advances=(500, 600, 600),
        glyphs={
            0: [],
            1: [[(100, 0), (500, 0), (500, 700), (100, 700)]],
            2: [[(0, 0), (600, 0), (300, 700)]],
        },
    )
    b = PdfBuilder()
    cat = b.add("<< /Type /Catalog /Pages 2 0 R >>")
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 5 0 R >> "
        "/XObject << /Im1 8 0 R >> /Shading << /Sh1 9 0 R >> >> "
        "/Contents 4 0 R >>"
    )
    content = (
        b"1 0 0 rg 100 100 200 150 re f "
        b"q 0 0 1 rg 50 400 100 100 re W n "
        b"0 1 0 rg 0 300 612 300 re f Q "
        b"0 0 0 RG 4 w 300 500 m 500 700 l S "
        b"q 100 0 0 100 50 600 cm /Im1 Do Q "
        b"q 400 100 100 100 re W n 1 0 0 1 400 100 cm /Sh1 sh Q "
        b"BT 0 0 1 rg /F1 48 Tf 100 200 Td (AB) Tj ET"
    )
    b.add(f"<< /Length {len(content)} >>", content)
    b.add(
        "<< /Type /Font /Subtype /TrueType /BaseFont /RasterTTF "
        "/FontDescriptor 6 0 R /FirstChar 65 /LastChar 66 "
        "/Widths [600 600] >>"
    )
    b.set(
        6,
        "<< /Type /FontDescriptor /FontName /RasterTTF /Flags 32"
        " /FontFile2 7 0 R >>",
    )
    b.set(7, f"<< /Length {len(ttf)} >>", ttf)
    px = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 0])
    comp = zlib.compress(px)
    b.set(
        8,
        "<< /Type /XObject /Subtype /Image /Width 2 /Height 2 "
        "/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /FlateDecode "
        f"/Length {len(comp)} >>",
        comp,
    )
    fn2 = "<< /FunctionType 2 /Domain [0 1] /C0 [1 0 0] /C1 [0 0 1] /N 1 >>"
    b.set(
        9,
        "<< /ShadingType 2 /ColorSpace /DeviceRGB /Coords [0 0 100 0] "
        f"/Function {fn2} >>",
    )
    golden = "AB" + CRLF
    return b.build_classic(cat), golden, 1


def _case_image_xobjects():
    """Embedded images: a Flate gray raster (-> engine re-encodes PNG) and
    a DCT payload (-> raw JPEG passthrough). Text alongside proves the
    text device still skips image XObjects (FZ_IGNORE_IMAGE)."""
    b = PdfBuilder()
    cat = b.add("<< /Type /Catalog /Pages 2 0 R >>")
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 5 0 R >> "
        "/XObject << /Im1 6 0 R /Im2 7 0 R >> >> /Contents 4 0 R >>"
    )
    content = b"BT /F1 12 Tf 72 720 Td (WithImages) Tj ET /Im1 Do /Im2 Do"
    b.add(f"<< /Length {len(content)} >>", content)
    b.add("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    gray = bytes(range(8)) * 8  # 8x8 8-bit gray ramp
    comp = zlib.compress(gray)
    b.add(
        "<< /Type /XObject /Subtype /Image /Width 8 /Height 8 "
        "/BitsPerComponent 8 /ColorSpace /DeviceGray /Filter /FlateDecode "
        f"/Length {len(comp)} >>",
        comp,
    )
    fake_jpeg = bytes.fromhex("ffd8ffe000104a46494600") + b"\x00" * 32 + b"\xff\xd9"
    b.add(
        "<< /Type /XObject /Subtype /Image /Width 4 /Height 4 "
        "/BitsPerComponent 8 /ColorSpace /DeviceRGB /Filter /DCTDecode "
        f"/Length {len(fake_jpeg)} >>",
        fake_jpeg,
    )
    return b.build_classic(cat), "WithImages" + CRLF, 1


def _case_info_utf16():
    b, cat = simple_doc(_bt("72 720 Td (Meta) Tj"))
    title = "Tïtle ✓"
    enc = b"\xfe\xff" + "".join(title).encode("utf-16-be")
    info = b.add(
        f"<< /Title <{enc.hex().upper()}> /Producer (pyspark-pdf) "
        "/Subject (fixtures) /Keywords (pdf spark) "
        "/CreationDate (D:20240101120000Z) /ModDate (D:20240102120000Z) >>"
    )
    return b.build_classic(cat, info=info), "Meta" + CRLF, 1


def _case_info_pdfdoc():
    b, cat = simple_doc(_bt("72 720 Td (MetaDoc) Tj"))
    # 0x93 = U+FB01 (fi) in PdfDocEncoding
    info = b.add("<< /Title (Pro\\223le) /Creator (fixture-gen) >>")
    return b.build_classic(cat, info=info), "MetaDoc" + CRLF, 1


CASES = {
    "xref_classic": _case_xref_classic,
    "xref_multisection": _case_xref_multisection,
    "xref_stream": _case_xref_stream,
    "xref_prev_chain": _case_xref_prev_chain,
    "xref_hybrid": _case_xref_hybrid,
    "objstm": _case_objstm,
    "repair_truncated": _case_repair_truncated,
    "pagetree_deep": _case_pagetree_deep,
    "pagetree_cycle": _case_pagetree_cycle,
    "contents_array": _case_contents_array,
    "flate_plain": _case_flate_plain,
    "flate_predictor_png_up": _case_flate_predictor_png_up,
    "flate_predictor_paeth": _case_flate_predictor_paeth,
    "lzw_earlychange": _case_lzw_earlychange,
    "lzw_predictor_tiff": _case_lzw_predictor_tiff,
    "ahx": _case_ahx,
    "a85": _case_a85,
    "rle": _case_rle,
    "filter_chain_a85_flate": _case_filter_chain_a85_flate,
    "tj_simple": _case_tj_simple,
    "tj_array_kerning": _case_tj_array_kerning,
    "td_tm_tstar": _case_td_tm_tstar,
    "quote_dquote": _case_quote_dquote,
    "tc_tw_tz_ts": _case_tc_tw_tz_ts,
    "render_mode_3": _case_render_mode_3,
    "qq_cm_nesting": _case_qq_cm_nesting,
    "xobject_form": _case_xobject_form,
    "inline_image_skip": _case_inline_image_skip,
    "extgstate_font": _case_extgstate_font,
    "multipage": _case_multipage,
    "std14_helvetica": _case_std14_helvetica,
    "times_afm_metrics": _case_times_afm_metrics,
    "ttf_symbolic_post_names": _case_ttf_symbolic_post_names,
    "ttf_symbolic_post3_winansi": _case_ttf_symbolic_post3_winansi,
    "ttf_nonsymbolic_unicode": _case_ttf_nonsymbolic_unicode,
    "type1_builtin_encoding": _case_type1_builtin_encoding,
    "cff_custom_encoding": _case_cff_custom_encoding,
    "ttf_widths_vs_hmtx": _case_ttf_widths_vs_hmtx,
    "cff_widths_vs_charstrings": _case_cff_widths_vs_charstrings,
    "winansi_differences": _case_winansi_differences,
    "macroman": _case_macroman,
    "tounicode_bfchar": _case_tounicode_bfchar,
    "tounicode_bfrange": _case_tounicode_bfrange,
    "ligatures": _case_ligatures,
    "type0_identity_h": _case_type0_identity_h,
    "type0_system_cmap": _case_type0_system_cmap,
    "type0_unknown_cmap": _case_type0_unknown_cmap,
    "type0_gb_no_tounicode": _case_type0_gb_no_tounicode,
    "cid_w_widths": _case_cid_w_widths,
    "type3_widths": _case_type3_widths,
    "wmode_vertical": _case_wmode_vertical,
    "vertical_word_space": _case_vertical_word_space,
    "wmode_vertical_cjk": _case_wmode_vertical_cjk,
    "control_chars": _case_control_chars,
    "outline_links": _case_outline_links,
    "symbol_font": _case_symbol_font,
    "annot_appearance": _case_annot_appearance,
    "ocg_layers": _case_ocg_layers,
    "shading_ops": _case_shading_ops,
    "render_ops": _case_render_ops,
    "image_xobjects": _case_image_xobjects,
    "rc4_empty_password": _case_rc4_empty_password,
    "aesv2_empty_password": _case_aesv2_empty_password,
    "aesv3_empty_password": _case_aesv3_empty_password,
    "encrypted_password": _case_encrypted_password,
    "info_utf16": _case_info_utf16,
    "info_pdfdoc": _case_info_pdfdoc,
}


def generate_fixtures() -> dict[str, dict]:
    """case_id -> {pdf, golden (None => expect failed), npages, lang}."""
    out = {}
    for case_id, fn in CASES.items():
        pdf, golden, npages = fn()
        out[case_id] = {
            "url": f"pdf://fixture/{case_id}",
            "pdf": pdf,
            "golden": golden,
            "npages": npages,
            "lang": "en",
        }
    return out


# --- bench corpora (BASELINE.md) --------------------------------------------

_LOREM = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua"
).split()


def _lorem_line(rng, n=8) -> str:
    return " ".join(_LOREM[rng() % len(_LOREM)] for _ in range(n))


def _mk_rng(seed: int):
    state = seed or 1

    def rng():
        nonlocal state
        state = (state * 1103515245 + 12345) & 0x7FFFFFFF
        return state

    return rng


def bench_pdf(seed: int, npages: int) -> bytes:
    """A deterministic multi-page text PDF (tj_simple/multipage template)."""
    rng = _mk_rng(seed)
    b = PdfBuilder()
    cat = b.add("<< /Type /Catalog /Pages 2 0 R >>")
    kids = " ".join(f"{3 + i} 0 R" for i in range(npages))
    b.add(f"<< /Type /Pages /Kids [{kids}] /Count {npages} >>")
    font_num = 3 + 2 * npages
    for i in range(npages):
        b.add(
            "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
            f"/Contents {3 + npages + i} 0 R >>"
        )
    for i in range(npages):
        lines = []
        y = 740
        for _ in range(30):
            lines.append(f"1 0 0 1 72 {y} Tm ({_lorem_line(rng)}) Tj")
            y -= 18
        ops = "BT /F1 10 Tf " + " ".join(lines) + " ET"
        content = zlib.compress(ops.encode("latin-1"))
        b.add(
            f"<< /Length {len(content)} /Filter /FlateDecode >>", content
        )
    b.add("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    return b.build_classic(cat)


# --- CCITT fax encoders (fixture side) ---------------------------------------
# The ENCODE algorithm is independent of pdfcore's decoder; the Huffman
# tables are ITU T.4 spec constants (public data, shared like AFM widths).


def _ccitt_tables():
    from delphi_pdf_parser_spark.pdfcore.ccitt import (
        _BLACK_CODES,
        _EXT_CODES,
        _WHITE_CODES,
    )

    white = {run: bits for bits, run in _WHITE_CODES + _EXT_CODES}
    black = {run: bits for bits, run in _BLACK_CODES + _EXT_CODES}
    return white, black


def _ccitt_run_bits(run: int, table: dict) -> str:
    out = []
    while run >= 64:
        makeup = min(2560, (run // 64) * 64)
        out.append(table[makeup])
        run -= makeup
    out.append(table[run])
    return "".join(out)


def _row_transitions(row: list[int]) -> list[int]:
    t, cur = [], 0  # runs alternate starting white (0)
    for x, px in enumerate(row):
        if px != cur:
            t.append(x)
            cur = px
    t.append(len(row))
    if len(t) % 2:
        t.append(len(row))
    return t


def ccitt_g4_encode(bitmap: list[list[int]]) -> bytes:
    """Group 4 (T.6 MMR) encoder over rows of 0(white)/1(black) pixels."""
    white_t, black_t = _ccitt_tables()
    columns = len(bitmap[0])
    bits = []
    ref = [columns, columns]
    for row in bitmap:
        line = _row_transitions(row)
        a0, white, i = -1, True, 0
        while a0 < columns:
            a1 = line[i] if i < len(line) else columns
            # b1: first ref transition > a0 starting a run of color
            # opposite to a0's color (even index = white->black)
            j = 0
            while j < len(ref) and ref[j] <= a0:
                j += 1
            if (j % 2 == 0) != white:
                j += 1
            b1 = ref[j] if j < len(ref) else columns
            b2 = ref[j + 1] if j + 1 < len(ref) else columns
            if b2 < a1:
                bits.append("0001")  # pass
                a0 = b2
                continue
            d = a1 - b1
            if -3 <= d <= 3:
                bits.append(
                    {0: "1", 1: "011", 2: "000011", 3: "0000011",
                     -1: "010", -2: "000010", -3: "0000010"}[d]
                )
                a0 = a1
                white = not white
                i += 1
            else:
                a2 = line[i + 1] if i + 1 < len(line) else columns
                start = max(a0, 0)
                t1 = white_t if white else black_t
                t2 = black_t if white else white_t
                bits.append("001")
                bits.append(_ccitt_run_bits(a1 - start, t1))
                bits.append(_ccitt_run_bits(a2 - a1, t2))
                a0 = a2
                i += 2
        ref = line + [columns, columns]
    bits.append("000000000001" * 2)  # EOFB
    s = "".join(bits)
    s += "0" * (-len(s) % 8)
    return bytes(int(s[k : k + 8], 2) for k in range(0, len(s), 8))


def ccitt_g3_1d_encode(bitmap: list[list[int]], eol: bool = True) -> bytes:
    """Group 3 1-D (MH) encoder; EOL before each line when eol=True."""
    white_t, black_t = _ccitt_tables()
    columns = len(bitmap[0])
    bits = []
    for row in bitmap:
        if eol:
            bits.append("000000000001")
        pos, white = 0, True
        for t in _row_transitions(row):
            table = white_t if white else black_t
            bits.append(_ccitt_run_bits(t - pos, table))
            pos, white = t, not white
            if pos >= columns:
                break
    s = "".join(bits)
    s += "0" * (-len(s) % 8)
    return bytes(int(s[k : k + 8], 2) for k in range(0, len(s), 8))


def _ccitt_test_bitmap(w: int = 16, h: int = 10) -> list[list[int]]:
    """Deterministic pattern with runs, diagonals and isolated pixels —
    exercises pass/vertical/horizontal 2-D modes."""
    bm = []
    for y in range(h):
        row = []
        for x in range(w):
            v = 1 if (x + y) % 5 < 2 or (x == y) or (y == 2 and 4 <= x < 12) else 0
            row.append(v)
        bm.append(row)
    return bm


def _case_ccitt_images():
    """CCITT-coded images: one G4 (K<0) and one G3 1-D (K=0) fax raster;
    the engine must decode both to PNG (the scanned-document codec path,
    reference src/vcl/filt_faxdss.pas via the filter factory)."""
    b = PdfBuilder()
    cat = b.add("<< /Type /Catalog /Pages 2 0 R >>")
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 5 0 R >> "
        "/XObject << /Fax1 6 0 R /Fax2 7 0 R >> >> /Contents 4 0 R >>"
    )
    content = b"BT /F1 12 Tf 72 720 Td (WithFax) Tj ET /Fax1 Do /Fax2 Do"
    b.add(f"<< /Length {len(content)} >>", content)
    b.add("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    bm = _ccitt_test_bitmap()
    g4 = ccitt_g4_encode(bm)
    b.add(
        "<< /Type /XObject /Subtype /Image /Width 16 /Height 10 "
        "/BitsPerComponent 1 /ColorSpace /DeviceGray /Filter /CCITTFaxDecode "
        "/DecodeParms << /K -1 /Columns 16 /Rows 10 >> "
        f"/Length {len(g4)} >>",
        g4,
    )
    g3 = ccitt_g3_1d_encode(bm)
    b.add(
        "<< /Type /XObject /Subtype /Image /Width 16 /Height 10 "
        "/BitsPerComponent 1 /ColorSpace /DeviceGray /Filter /CCITTFaxDecode "
        "/DecodeParms << /K 0 /Columns 16 /Rows 10 >> "
        f"/Length {len(g3)} >>",
        g3,
    )
    return b.build_classic(cat), "WithFax" + CRLF, 1


CASES["ccitt_images"] = _case_ccitt_images


# --- baseline JPEG encoder (fixture side) -------------------------------------
# Independent of pdfcore/jpeg.py: the decoder reads ALL tables from the
# stream, so the encoder ships its own (simple fixed-length canonical
# Huffman tables + chosen quant tables) inside DQT/DHT segments.


def _jpeg_huff_fixed(symbols: list[int]) -> tuple[list[int], list[int]]:
    """Canonical table with every symbol at the same code length L,
    L chosen so one leaf is spare (avoids the all-ones code)."""
    L = 1
    while (1 << L) < len(symbols) + 1:
        L += 1
    counts = [0] * 16
    counts[L - 1] = len(symbols)
    return counts, list(symbols)


class _JpegBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.write(1, 1)  # pad with 1-bits


def _jpeg_category(v: int) -> tuple[int, int]:
    """(size t, t-bit code) per T.81 F.1.2.1 (negative values use the
    one's-complement low bits)."""
    t = 0
    a = abs(v)
    while a:
        t += 1
        a >>= 1
    code = v if v >= 0 else v + (1 << t) - 1
    return t, code


def jpeg_encode(
    width: int,
    height: int,
    ncomp: int,
    pixels: bytes,
    quant: int = 1,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF encoder (gray or RGB->YCbCr; 4:4:4 or 4:2:0 when
    subsample=True). quant=1 gives near-lossless round-trips (DCT float
    rounding only) for pinning the decoder."""
    import numpy as np

    from delphi_pdf_parser_spark.pdfcore.jpeg import _B, _ZIGZAG

    if ncomp == 1:
        planes = [
            np.frombuffer(pixels, dtype=np.uint8)
            .reshape(height, width)
            .astype(np.float64)
        ]
        samps = [(1, 1)]
    elif ncomp == 3:
        rgb = (
            np.frombuffer(pixels, dtype=np.uint8)
            .reshape(height, width, 3)
            .astype(np.float64)
        )
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
        samps = [(2, 2), (1, 1), (1, 1)] if subsample else [
            (1, 1), (1, 1), (1, 1)
        ]
    else:
        raise ValueError(f"jpeg_encode: ncomp {ncomp}")
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    # pad each plane (edge replicate) to its mcu-aligned sampled size;
    # subsampled chroma averages 2x2 neighborhoods
    comp_planes = []
    for (hi, vi), p in zip(samps, planes):
        if (hi, vi) != (hmax, vmax):
            ry, rx = vmax // vi, hmax // hi
            ph = -(-p.shape[0] // ry) * ry
            pw = -(-p.shape[1] // rx) * rx
            pp = np.pad(
                p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"
            )
            p = pp.reshape(ph // ry, ry, pw // rx, rx).mean(axis=(1, 3))
        th, tw = mcuy * vi * 8, mcux * hi * 8
        p = np.pad(
            p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"
        )
        comp_planes.append(p)

    qtab = np.full(64, float(quant))
    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    dc_counts, dc_vals = _jpeg_huff_fixed(dc_syms)
    ac_counts, ac_vals = _jpeg_huff_fixed(ac_syms)

    def _codes(counts, vals):
        table = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                table[vals[k]] = (length, code)
                k += 1
                code += 1
            code <<= 1
        return table

    dc_code = _codes(dc_counts, dc_vals)
    ac_code = _codes(ac_counts, ac_vals)

    bw = _JpegBitWriter()
    pred = [0] * len(planes)
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                bw.flush()
                bw.out += bytes((0xFF, 0xD0 + (rst & 7)))
                rst += 1
                pred = [0] * len(planes)
            for ci, ((hi, vi), p) in enumerate(zip(samps, comp_planes)):
                for by in range(vi):
                    for bx in range(hi):
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        s = p[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        f = _B @ s @ _B.T
                        zz = np.round(f.reshape(64)[_ZIGZAG] / qtab).astype(
                            int
                        )
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        t, code = _jpeg_category(diff)
                        ln, c = dc_code[t]
                        bw.write(c, ln)
                        if t:
                            bw.write(code, t)
                        k = 1
                        while k < 64:
                            run = 0
                            while k < 64 and zz[k] == 0:
                                run += 1
                                k += 1
                            if k == 64:
                                ln, c = ac_code[0x00]  # EOB
                                bw.write(c, ln)
                                break
                            while run > 15:
                                ln, c = ac_code[0xF0]  # ZRL
                                bw.write(c, ln)
                                run -= 16
                            t, code = _jpeg_category(int(zz[k]))
                            ln, c = ac_code[(run << 4) | t]
                            bw.write(c, ln)
                            bw.write(code, t)
                            k += 1
            mcu_count += 1
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(
        0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    out += seg(0xDB, bytes([0x00]) + bytes(int(q) for q in qtab))
    sofc = bytearray(struct.pack(">BHHB", 8, height, width, len(planes)))
    for ci, (hi, vi) in enumerate(samps):
        sofc += bytes((ci + 1, (hi << 4) | vi, 0))
    out += seg(0xC0, bytes(sofc))
    dht = bytearray()
    dht += bytes([0x00]) + bytes(dc_counts) + bytes(dc_vals)
    dht += bytes([0x10]) + bytes(ac_counts) + bytes(ac_vals)
    out += seg(0xC4, bytes(dht))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([len(planes)])
    for ci in range(len(planes)):
        sos += bytes((ci + 1, 0x00))
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, bytes(sos))
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# --- WARC fixture writer ------------------------------------------------------


def build_warc(
    records: list[dict], gzip_members: bool = False
) -> bytes:
    """records: [{url, date, payload, rectype='response',
    http_status=200}] -> WARC bytes (one gzip member per record when
    gzip_members=True, the Common Crawl convention)."""
    import gzip as _gzip

    out = bytearray()
    for i, r in enumerate(records):
        rectype = r.get("rectype", "response")
        payload = r["payload"]
        if rectype == "response":
            http = (
                f"HTTP/1.1 {r.get('http_status', 200)} OK\r\n"
                f"Content-Type: {r.get('content_type', 'text/html')}\r\n"
                f"Content-Length: {len(payload)}\r\n\r\n"
            ).encode("latin-1") + payload
        else:
            http = payload
        hdrs = (
            "WARC/1.0\r\n"
            f"WARC-Type: {rectype}\r\n"
            f"WARC-Record-ID: <urn:uuid:fixture-{i:04d}>\r\n"
            f"WARC-Date: {r.get('date', '2024-01-01T00:00:00Z')}\r\n"
            + (
                f"WARC-Target-URI: {r['url']}\r\n"
                if r.get("url")
                else ""
            )
            + f"Content-Length: {len(http)}\r\n\r\n"
        ).encode("latin-1")
        rec = hdrs + http + b"\r\n\r\n"
        out += _gzip.compress(rec) if gzip_members else rec
    return bytes(out)


# --- JBIG2 fixture writer ----------------------------------------------------


def _jbig2_segment(number: int, seg_type: int, page: int, body: bytes,
                   refs: tuple = ()) -> bytes:
    hdr = number.to_bytes(4, "big") + bytes([seg_type & 0x3F])
    hdr += bytes([len(refs) << 5])  # short form, no retain bits
    for r in refs:
        hdr += bytes([r])
    hdr += bytes([page])
    hdr += len(body).to_bytes(4, "big")
    return hdr + body


def jbig2_embed(
    bitmap: list, template: int = 0, tpgdon: bool = False, mmr: bool = False
) -> bytes:
    """Embedded-JBIG2 stream (PDF flavor): page info + one immediate
    generic region + end-of-page. Region payload is our generic-region
    encoder (or G4/MMR via the CCITT encoder)."""
    from delphi_pdf_parser_spark.pdfcore.jbig2 import (
        _NOMINAL_AT,
        encode_generic_region,
    )

    h = len(bitmap)
    w = len(bitmap[0])
    page_info = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
        + bytes([0]) + (0).to_bytes(2, "big")
    )
    out = _jbig2_segment(0, 48, 1, page_info)
    reg_info = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + (0).to_bytes(4, "big") + (0).to_bytes(4, "big") + bytes([0])
    )
    if mmr:
        payload = ccitt_g4_encode(bitmap)
        body = reg_info + bytes([1]) + payload
    else:
        payload = encode_generic_region(
            bitmap, template=template, tpgdon=tpgdon
        )
        flags = (template << 1) | (8 if tpgdon else 0)
        at = b"".join(
            bytes([x & 0xFF, y & 0xFF]) for x, y in _NOMINAL_AT[template]
        )
        body = reg_info + bytes([flags]) + at + payload
    out += _jbig2_segment(1, 38, 1, body)
    out += _jbig2_segment(2, 49, 1, b"")
    return out


def _case_jbig2_image():
    """JBIG2-coded image: generic-region (template 0) fax-style raster;
    decoded to PNG (the reference's own JBIG2 filter is a nil stub —
    this is above-reference coverage)."""
    b = PdfBuilder()
    cat = b.add("<< /Type /Catalog /Pages 2 0 R >>")
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 5 0 R >> "
        "/XObject << /Jb 6 0 R >> >> /Contents 4 0 R >>"
    )
    content = b"BT /F1 12 Tf 72 720 Td (WithJbig2) Tj ET /Jb Do"
    b.add(f"<< /Length {len(content)} >>", content)
    b.add("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    jb = jbig2_embed(_ccitt_test_bitmap())
    b.add(
        "<< /Type /XObject /Subtype /Image /Width 16 /Height 10 "
        "/BitsPerComponent 1 /ColorSpace /DeviceGray /Filter /JBIG2Decode "
        f"/Length {len(jb)} >>",
        jb,
    )
    return b.build_classic(cat), "WithJbig2" + CRLF, 1


CASES["jbig2_image"] = _case_jbig2_image


def jbig2_embed_text(
    symbols: list, placements: list, page_w: int, page_h: int
) -> bytes:
    """Embedded-JBIG2 stream using a SYMBOL DICTIONARY + TEXT REGION (the
    coding real scanned-text PDFs use): symbols are small glyph bitmaps
    (rows of 0/1), placements are (symbol_index, s, t) with TOPLEFT
    reference corners. Arithmetic coding, template 0, strips=1."""
    from delphi_pdf_parser_spark.pdfcore.jbig2 import (
        _CTX_SIZE,
        _NOMINAL_AT,
        IdCtx,
        IntCtx,
        MQEncoder,
        OOB,
        _gb_context,
        encode_id,
        encode_int,
    )

    # --- symbol dictionary: height classes ascending; remap ids ---------
    order = sorted(range(len(symbols)), key=lambda i: (len(symbols[i]), i))
    remap = {orig: new for new, orig in enumerate(order)}
    sorted_syms = [symbols[i] for i in order]

    enc = MQEncoder()
    gb_cx = [[0, 0] for _ in range(_CTX_SIZE[0])]
    at = _NOMINAL_AT[0]
    iadh, iadw, iaex = IntCtx(), IntCtx(), IntCtx()
    hc = 0
    i = 0
    while i < len(sorted_syms):
        h = len(sorted_syms[i])
        encode_int(enc, iadh, h - hc)
        hc = h
        prev_w = 0
        while i < len(sorted_syms) and len(sorted_syms[i]) == hc:
            bm = sorted_syms[i]
            w = len(bm[0])
            encode_int(enc, iadw, w - prev_w)
            prev_w = w
            # encode the bitmap through the SHARED coder/contexts
            img = [[0] * w for _ in range(hc)]
            for y in range(hc):
                for x in range(w):
                    ctx = _gb_context(img, x, y, w, 0, at)
                    enc.encode(gb_cx[ctx], bm[y][x])
                    img[y][x] = bm[y][x]
            i += 1
        encode_int(enc, iadw, OOB)
    # export all: run(0)=0 not-exported, run(1)=all exported
    encode_int(enc, iaex, 0)
    encode_int(enc, iaex, len(sorted_syms))
    sd_mq = enc.flush()
    sd_body = (
        (0).to_bytes(2, "big")  # flags: arith, template 0
        + b"".join(bytes([x & 0xFF, y & 0xFF]) for x, y in at)
        + len(sorted_syms).to_bytes(4, "big")  # SDNUMEXSYMS
        + len(sorted_syms).to_bytes(4, "big")  # SDNUMNEWSYMS
        + sd_mq
    )

    # --- text region: strips=1, TOPLEFT corner, OR composition ----------
    codelen = max(1, (len(sorted_syms) - 1).bit_length())
    enc = MQEncoder()
    iadt, iafs, iads = IntCtx(), IntCtx(), IntCtx()
    iaid = IdCtx(codelen)
    inst = sorted(
        ((remap[sid], s, t) for sid, s, t in placements),
        key=lambda p: (p[2], p[1]),
    )
    encode_int(enc, iadt, 0)  # initial STRIPT = 0
    prev_t = 0
    firsts = 0
    k = 0
    while k < len(inst):
        t = inst[k][2]
        encode_int(enc, iadt, t - prev_t)
        prev_t = t
        # first symbol of the strip
        sid, s, _ = inst[k]
        encode_int(enc, iafs, s - firsts)
        firsts = s
        curs = s
        encode_id(enc, iaid, sid)
        curs += len(sorted_syms[sid][0]) - 1
        k += 1
        while k < len(inst) and inst[k][2] == t:
            sid, s, _ = inst[k]
            encode_int(enc, iads, s - curs)  # DSOFFSET = 0
            curs = s
            encode_id(enc, iaid, sid)
            curs += len(sorted_syms[sid][0]) - 1
            k += 1
        encode_int(enc, iads, OOB)  # end of strip
    tr_mq = enc.flush()
    reg_info = (
        page_w.to_bytes(4, "big") + page_h.to_bytes(4, "big")
        + (0).to_bytes(4, "big") + (0).to_bytes(4, "big") + bytes([0])
    )
    # flags: SBHUFF=0 REFINE=0 LOGSBSTRIPS=0 REFCORNER=TL(1<<4)
    tr_flags = (1 << 4)
    tr_body = (
        reg_info
        + tr_flags.to_bytes(2, "big")
        + len(inst).to_bytes(4, "big")
        + tr_mq
    )

    page_info = (
        page_w.to_bytes(4, "big") + page_h.to_bytes(4, "big")
        + (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
        + bytes([0]) + (0).to_bytes(2, "big")
    )
    out = _jbig2_segment(0, 48, 1, page_info)
    out += _jbig2_segment(1, 0, 0, sd_body)  # symbol dict (page 0 per spec)
    out += _jbig2_segment(2, 6, 1, tr_body, refs=(1,))  # immediate text
    out += _jbig2_segment(3, 49, 1, b"")
    return out


def _case_jbig2_text_image():
    """JBIG2 symbol-dictionary + text-region raster — the coding real
    scanned-text PDFs use (glyph dictionary, placed instances)."""
    b = PdfBuilder()
    cat = b.add("<< /Type /Catalog /Pages 2 0 R >>")
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 5 0 R >> "
        "/XObject << /Jt 6 0 R >> >> /Contents 4 0 R >>"
    )
    content = b"BT /F1 12 Tf 72 720 Td (WithJbig2Text) Tj ET /Jt Do"
    b.add(f"<< /Length {len(content)} >>", content)
    b.add("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    jb = jbig2_embed_text(*_jbig2_text_fixture_args())
    b.add(
        "<< /Type /XObject /Subtype /Image /Width 16 /Height 14 "
        "/BitsPerComponent 1 /ColorSpace /DeviceGray /Filter /JBIG2Decode "
        f"/Length {len(jb)} >>",
        jb,
    )
    return b.build_classic(cat), "WithJbig2Text" + CRLF, 1


def _jbig2_text_fixture_args():
    sym_i = [[1], [1], [1], [1]]
    sym_l = [[1, 0, 0], [1, 0, 0], [1, 0, 0], [1, 1, 1]]
    sym_o = [[0, 1, 0], [1, 0, 1], [0, 1, 0]]
    placements = [
        (0, 2, 2), (1, 5, 2), (2, 10, 3),
        (1, 2, 9), (0, 7, 9), (2, 10, 9),
    ]
    return [sym_i, sym_l, sym_o], placements, 16, 14


CASES["jbig2_text_image"] = _case_jbig2_text_image


def _case_indexed_image():
    """Indexed-palette raster (4-bpc indices into an RGB palette string,
    plus a 8-bpc gray-palette variant via a stream lookup)."""
    b = PdfBuilder()
    cat = b.add("<< /Type /Catalog /Pages 2 0 R >>")
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 5 0 R >> "
        "/XObject << /Ix 6 0 R /Iy 7 0 R >> >> /Contents 4 0 R >>"
    )
    content = b"BT /F1 12 Tf 72 720 Td (WithIndexed) Tj ET /Ix Do /Iy Do"
    b.add(f"<< /Length {len(content)} >>", content)
    b.add("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    # 6x4 image, 4-bpc indices 0..5 into a 6-entry RGB palette (string)
    pal = bytes.fromhex("ff0000" "00ff00" "0000ff" "ffffff" "000000" "804020")
    rows = []
    for y in range(4):
        idx = [(x + y) % 6 for x in range(6)]
        packed = bytearray()
        for i in range(0, 6, 2):
            packed.append((idx[i] << 4) | idx[i + 1])
        rows.append(bytes(packed))
    data = b"".join(rows)
    comp = zlib.compress(data)
    b.add(
        "<< /Type /XObject /Subtype /Image /Width 6 /Height 4 "
        "/BitsPerComponent 4 "
        f"/ColorSpace [/Indexed /DeviceRGB 5 <{pal.hex().upper()}>] "
        f"/Filter /FlateDecode /Length {len(comp)} >>",
        comp,
    )
    # 4x2, 8-bpc indices into a gray palette delivered via a STREAM
    gpal = bytes([0, 85, 170, 255])
    gidx = bytes([0, 1, 2, 3, 3, 2, 1, 0])
    gcomp = zlib.compress(gidx)
    b.add(
        "<< /Type /XObject /Subtype /Image /Width 4 /Height 2 "
        "/BitsPerComponent 8 "
        "/ColorSpace [/Indexed /DeviceGray 3 8 0 R] "
        f"/Filter /FlateDecode /Length {len(gcomp)} >>",
        gcomp,
    )
    b.add(f"<< /Length {len(gpal)} >>", gpal)
    return b.build_classic(cat), "WithIndexed" + CRLF, 1


CASES["indexed_image"] = _case_indexed_image


def _case_cmyk_image():
    """CMYK + Separation + DeviceN rasters exercising the colorspace
    fixup path (saveimage's dorgb conversion, pdf_extracto.pas:47-53 ->
    res_colorspace.pas cmyk_to_rgb / pdf_color_spcasess.pas
    separation_to_rgb): an 8-bpc DeviceCMYK image, a Separation image
    with a type-2 exponential tint into DeviceCMYK, and a 2-ink DeviceN
    image with a type-0 sampled tint into DeviceRGB."""
    b = PdfBuilder()
    cat = b.add("<< /Type /Catalog /Pages 2 0 R >>")
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 5 0 R >> "
        "/XObject << /Ic 6 0 R /Is 7 0 R /In 9 0 R >> >> /Contents 4 0 R >>"
    )
    content = b"BT /F1 12 Tf 72 720 Td (WithCMYK) Tj ET /Ic Do /Is Do /In Do"
    b.add(f"<< /Length {len(content)} >>", content)
    b.add("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    # 3x2 DeviceCMYK: white, cyan, magenta / yellow, black(K), rich black
    cmyk = bytes(
        [0, 0, 0, 0] + [255, 0, 0, 0] + [0, 255, 0, 0]
        + [0, 0, 255, 0] + [0, 0, 0, 255] + [255, 255, 255, 255]
    )
    comp = zlib.compress(cmyk)
    b.add(
        "<< /Type /XObject /Subtype /Image /Width 3 /Height 2 "
        "/BitsPerComponent 8 /ColorSpace /DeviceCMYK "
        f"/Filter /FlateDecode /Length {len(comp)} >>",
        comp,
    )
    # 4x1 Separation ramp 0,85,170,255 -> type-2 tint (N=1) to CMYK:
    # C0=[0 0 0 0], C1=[0.8 0.2 0 0.1] (a teal-ish spot ink)
    sep = bytes([0, 85, 170, 255])
    scomp = zlib.compress(sep)
    b.add(
        "<< /Type /XObject /Subtype /Image /Width 4 /Height 1 "
        "/BitsPerComponent 8 "
        "/ColorSpace [/Separation /TealSpot /DeviceCMYK 8 0 R] "
        f"/Filter /FlateDecode /Length {len(scomp)} >>",
        scomp,
    )
    b.add(
        "<< /FunctionType 2 /Domain [0 1] /N 1 "
        "/C0 [0 0 0 0] /C1 [0.8 0.2 0 0.1] >>"
    )
    # 2x1 DeviceN (2 inks) -> type-0 sampled tint to DeviceRGB:
    # 2x2 lattice, 8 bps, samples (ink0, ink1) -> (r, g, b)
    dn = bytes([0, 255, 255, 0])  # pixel0: ink0=0,ink1=1; pixel1: 1,0
    ncomp2 = zlib.compress(dn)
    b.add(
        "<< /Type /XObject /Subtype /Image /Width 2 /Height 1 "
        "/BitsPerComponent 8 "
        "/ColorSpace [/DeviceN [/InkA /InkB] /DeviceRGB 10 0 R] "
        f"/Filter /FlateDecode /Length {len(ncomp2)} >>",
        ncomp2,
    )
    # lattice order: ink0 varies fastest. corners (i0,i1):
    # (0,0)->black (0,0,0); (1,0)->red; (0,1)->blue; (1,1)->white
    samp = bytes(
        [0, 0, 0] + [255, 0, 0] + [0, 0, 255] + [255, 255, 255]
    )
    b.add(
        "<< /FunctionType 0 /Domain [0 1 0 1] /Range [0 1 0 1 0 1] "
        "/Size [2 2] /BitsPerSample 8 "
        f"/Length {len(samp)} >>",
        samp,
    )
    return b.build_classic(cat), "WithCMYK" + CRLF, 1


CASES["cmyk_image"] = _case_cmyk_image


def jpeg_encode_progressive(
    width: int, height: int, ncomp: int, pixels: bytes, quant: int = 1
) -> bytes:
    """Progressive (SOF2) JFIF encoder for pinning the progressive
    decoder: DC-first (Al=1) -> AC-first per component in two spectral
    bands (1-5, 6-63, Al=1, with EOB runs) -> DC refinement -> AC
    refinement per band (correction bits + buffered-bit EOB runs, the
    libjpeg jcphuff shape). 4:4:4 only; gray or RGB. quant=1 keeps
    round-trips near-lossless so the decode is pixel-pinnable."""
    import numpy as np

    from delphi_pdf_parser_spark.pdfcore.jpeg import _B, _ZIGZAG

    if ncomp == 1:
        planes = [
            np.frombuffer(pixels, dtype=np.uint8)
            .reshape(height, width)
            .astype(np.float64)
        ]
    elif ncomp == 3:
        rgb = (
            np.frombuffer(pixels, dtype=np.uint8)
            .reshape(height, width, 3)
            .astype(np.float64)
        )
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    else:
        raise ValueError(f"jpeg_encode_progressive: ncomp {ncomp}")
    bw_blocks = (width + 7) // 8
    bh_blocks = (height + 7) // 8
    qtab = np.full(64, float(quant))
    coeffs = []
    for p in planes:
        pp = np.pad(
            p,
            ((0, bh_blocks * 8 - p.shape[0]), (0, bw_blocks * 8 - p.shape[1])),
            mode="edge",
        )
        cz = np.zeros((bh_blocks, bw_blocks, 64), dtype=np.int64)
        for by in range(bh_blocks):
            for bx in range(bw_blocks):
                s = pp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                f = _B @ s @ _B.T
                cz[by, bx] = np.round(f.reshape(64)[_ZIGZAG] / qtab).astype(
                    np.int64
                )
        coeffs.append(cz)

    dc_counts, dc_vals = _jpeg_huff_fixed(list(range(12)))
    ac_syms = (
        [(r << 4) for r in range(15)]
        + [0xF0]
        + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    )
    ac_counts, ac_vals = _jpeg_huff_fixed(ac_syms)

    def _codes(counts, vals):
        table = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                table[vals[k]] = (length, code)
                k += 1
                code += 1
            code <<= 1
        return table

    dc_code = _codes(dc_counts, dc_vals)
    ac_code = _codes(ac_counts, ac_vals)

    def enc_dc_first(al):
        bw = _JpegBitWriter()
        pred = [0] * ncomp
        for by in range(bh_blocks):
            for bx in range(bw_blocks):
                for ci in range(ncomp):
                    v = int(coeffs[ci][by, bx, 0]) >> al
                    diff = v - pred[ci]
                    pred[ci] = v
                    t, code = _jpeg_category(diff)
                    ln, c = dc_code[t]
                    bw.write(c, ln)
                    if t:
                        bw.write(code, t)
        bw.flush()
        return bytes(bw.out)

    def enc_dc_refine(al):
        bw = _JpegBitWriter()
        for by in range(bh_blocks):
            for bx in range(bw_blocks):
                for ci in range(ncomp):
                    bw.write((int(coeffs[ci][by, bx, 0]) >> al) & 1, 1)
        bw.flush()
        return bytes(bw.out)

    def enc_ac_first(ci, ss, se, al):
        bw = _JpegBitWriter()
        eobrun = 0

        def emit_eobrun():
            nonlocal eobrun
            if eobrun > 0:
                t = eobrun
                nbits = 0
                while t > 1:
                    t >>= 1
                    nbits += 1
                ln, c = ac_code[nbits << 4]
                bw.write(c, ln)
                if nbits:
                    bw.write(eobrun & ((1 << nbits) - 1), nbits)
                eobrun = 0

        for by in range(bh_blocks):
            for bx in range(bw_blocks):
                zz = coeffs[ci][by, bx]
                r = 0
                for k in range(ss, se + 1):
                    t = int(zz[k])
                    temp = abs(t) >> al
                    if temp == 0:
                        r += 1
                        continue
                    emit_eobrun()
                    while r > 15:
                        ln, c = ac_code[0xF0]
                        bw.write(c, ln)
                        r -= 16
                    sv = temp if t >= 0 else -temp
                    nbits, code = _jpeg_category(sv)
                    ln, c = ac_code[(r << 4) | nbits]
                    bw.write(c, ln)
                    bw.write(code, nbits)
                    r = 0
                if r > 0:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        emit_eobrun()
        emit_eobrun()
        bw.flush()
        return bytes(bw.out)

    def enc_ac_refine(ci, ss, se, al):
        bw = _JpegBitWriter()
        eobrun = 0
        pending: list[int] = []  # correction bits buffered across EOB run

        def emit_eobrun():
            nonlocal eobrun, pending
            if eobrun > 0:
                t = eobrun
                nbits = 0
                while t > 1:
                    t >>= 1
                    nbits += 1
                ln, c = ac_code[nbits << 4]
                bw.write(c, ln)
                if nbits:
                    bw.write(eobrun & ((1 << nbits) - 1), nbits)
                eobrun = 0
                for b in pending:
                    bw.write(b, 1)
                pending = []

        for by in range(bh_blocks):
            for bx in range(bw_blocks):
                zz = coeffs[ci][by, bx]
                absv = {}
                eobpos = ss - 1
                for k in range(ss, se + 1):
                    t = int(zz[k])
                    a = abs(t) >> al
                    absv[k] = (a, t < 0)
                    if a == 1:
                        eobpos = k
                r = 0
                br: list[int] = []  # bits buffered within this block
                for k in range(ss, se + 1):
                    a, neg = absv[k]
                    if a == 0:
                        r += 1
                        continue
                    while r > 15 and k <= eobpos:
                        emit_eobrun()
                        ln, c = ac_code[0xF0]
                        bw.write(c, ln)
                        r -= 16
                        for b in br:
                            bw.write(b, 1)
                        br = []
                    if a > 1:
                        br.append(a & 1)
                        continue
                    emit_eobrun()
                    ln, c = ac_code[(r << 4) | 1]
                    bw.write(c, ln)
                    bw.write(0 if neg else 1, 1)
                    for b in br:
                        bw.write(b, 1)
                    br = []
                    r = 0
                if r > 0 or br:
                    eobrun += 1
                    pending.extend(br)
                    if eobrun == 0x7FFF:
                        emit_eobrun()
        emit_eobrun()
        bw.flush()
        return bytes(bw.out)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body

    def sos(comp_ids, ss, se, ah, al, entropy):
        body = bytearray([len(comp_ids)])
        for cid in comp_ids:
            body += bytes((cid, 0x00))
        body += bytes((ss, se, (ah << 4) | al))
        return seg(0xDA, bytes(body)) + entropy

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(int(q) for q in qtab))
    sofc = bytearray(struct.pack(">BHHB", 8, height, width, ncomp))
    for ci in range(ncomp):
        sofc += bytes((ci + 1, 0x11, 0))
    out += seg(0xC2, bytes(sofc))
    dht = bytearray()
    dht += bytes([0x00]) + bytes(dc_counts) + bytes(dc_vals)
    dht += bytes([0x10]) + bytes(ac_counts) + bytes(ac_vals)
    out += seg(0xC4, bytes(dht))
    all_ids = [ci + 1 for ci in range(ncomp)]
    out += sos(all_ids, 0, 0, 0, 1, enc_dc_first(1))
    for ci in range(ncomp):
        out += sos([ci + 1], 1, 5, 0, 1, enc_ac_first(ci, 1, 5, 1))
        out += sos([ci + 1], 6, 63, 0, 1, enc_ac_first(ci, 6, 63, 1))
    out += sos(all_ids, 0, 0, 1, 0, enc_dc_refine(0))
    for ci in range(ncomp):
        out += sos([ci + 1], 1, 5, 1, 0, enc_ac_refine(ci, 1, 5, 0))
        out += sos([ci + 1], 6, 63, 1, 0, enc_ac_refine(ci, 6, 63, 0))
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# JPEG 2000 (JPX) fixture encoder — lossless 5/3, counterpart of pdfcore.jpx
# ---------------------------------------------------------------------------

class _JpxHeaderWriter:
    """Bit-stuffed packet-header writer: after an emitted 0xFF byte the
    next byte carries only 7 bits (mirrors pdfcore.jpx._HeaderBits)."""

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.cap = 8  # bits available in current byte
        self.n = 0    # bits written into current byte

    def bit(self, b: int) -> None:
        self.buf = (self.buf << 1) | (b & 1)
        self.n += 1
        if self.n == self.cap:
            self.out.append(self.buf)
            self.cap = 7 if self.buf == 0xFF else 8
            self.buf = 0
            self.n = 0

    def bits(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bit((v >> i) & 1)

    def align(self) -> None:
        """Pad to a byte boundary; if the final byte is 0xFF append the
        stuffing byte the reader skips (pdfcore.jpx._HeaderBits.align)."""
        while self.n:
            self.bit(0)
        if self.out and self.out[-1] == 0xFF:
            self.out.append(0x00)
            self.cap = 8


class _JpxEncTagTree:
    """Encoder-side tag tree (T.800 B.10.2), state-mirrored against
    pdfcore.jpx.TagTree.decode so every emitted bit is consumed."""

    def __init__(self, leaves):
        import numpy as np

        a = np.asarray(leaves, dtype=np.int64)
        self.levels = [a]
        while a.shape != (1, 1):
            h, w = a.shape
            nh, nw = (h + 1) // 2, (w + 1) // 2
            p = np.full((nh * 2, nw * 2), np.iinfo(np.int64).max, dtype=np.int64)
            p[:h, :w] = a
            a = np.minimum.reduce(
                [p[0::2, 0::2], p[0::2, 1::2], p[1::2, 0::2], p[1::2, 1::2]]
            )
            self.levels.append(a)
        self.low = [np.zeros_like(lv) for lv in self.levels]
        self.known = [np.zeros(lv.shape, dtype=bool) for lv in self.levels]

    def encode(self, bw: _JpxHeaderWriter, x: int, y: int, threshold: int) -> None:
        path = []
        lx, ly = x, y
        for lvl in range(len(self.levels)):
            path.append((lvl, lx, ly))
            lx >>= 1
            ly >>= 1
        low = 0
        for lvl, nx, ny in reversed(path):
            if self.low[lvl][ny, nx] < low:
                self.low[lvl][ny, nx] = low
            nv = int(self.levels[lvl][ny, nx])
            while (
                self.low[lvl][ny, nx] < threshold
                and not self.known[lvl][ny, nx]
            ):
                if self.low[lvl][ny, nx] == nv:
                    bw.bit(1)
                    self.known[lvl][ny, nx] = True
                else:
                    bw.bit(0)
                    self.low[lvl][ny, nx] += 1
            low = int(self.low[lvl][ny, nx])

    def encode_value(self, bw: _JpxHeaderWriter, x: int, y: int) -> None:
        """Counterpart of TagTree.decode_value: raise the threshold until
        the leaf is fully resolved."""
        t = 1
        while not self.known[0][y, x]:
            self.encode(bw, x, y, t)
            t = int(self.low[0][y, x]) + 1


def _jpx_fdwt_1d(x):
    """Forward 5/3 analysis on one interleaved row/column; exact inverse
    of pdfcore.jpx._sr_1d (whole-sample symmetric extension)."""
    import numpy as np

    n = len(x)
    if n == 1:
        return x.copy()
    y = x.astype(np.int64).copy()
    odd = np.arange(1, n, 2)
    om = odd - 1
    op = np.where(odd + 1 > n - 1, max(n - 2, 0), odd + 1)
    y[odd] = x[odd] - ((x[om] + x[op]) >> 1)
    even = np.arange(0, n, 2)
    lm = np.where(even - 1 < 0, min(1, n - 1), even - 1)
    lp = np.where(even + 1 > n - 1, max(n - 2, 0), even + 1)
    y[even] = x[even] + ((y[lm] + y[lp] + 2) >> 2)
    return y


def _jpx_fdwt2(a, levels):
    """-> (LL, [(HL, LH, HH)] lowest resolution first); inverse of
    pdfcore.jpx._idwt53 (vertical analysis, then horizontal, per level)."""
    import numpy as np

    a = a.astype(np.int64)
    out = []
    for _ in range(levels):
        h, w = a.shape
        m = a.copy()
        for c in range(w):
            m[:, c] = _jpx_fdwt_1d(m[:, c])
        for r in range(h):
            m[r, :] = _jpx_fdwt_1d(m[r, :])
        ll = m[0::2, 0::2]
        hl = m[0::2, 1::2]
        lh = m[1::2, 0::2]
        hh = m[1::2, 1::2]
        out.append((hl, lh, hh))
        a = ll
    out.reverse()
    return a, out


def _jpx_t1_encode(coeffs, band: str) -> tuple[int, int, bytes]:
    """EBCOT Tier-1 encoder for one code-block; pass structure mirrors
    pdfcore.jpx._t1_decode. -> (nplanes, npasses, mq_bytes)."""
    from .pdfcore.jbig2 import MQEncoder
    from .pdfcore.jpx import _Block, _CTX_RL, _CTX_UNI, _fresh_contexts, _sig_ctx

    h, w = coeffs.shape
    vals = [int(v) for row in coeffs for v in row]
    nplanes = max((abs(v).bit_length() for v in vals), default=0)
    if nplanes == 0:
        return 0, 0, b""
    blk = _Block(w, h, band)
    mq = MQEncoder()
    cx = _fresh_contexts()

    def absbit(i: int, p: int) -> int:
        return (abs(vals[i]) >> p) & 1

    def code_sign(x: int, y: int, i: int, p: int) -> None:
        sctx, xor = blk.sign_ctx(x, y)
        s = 1 if vals[i] < 0 else 0
        mq.encode(cx[sctx], s ^ xor)
        blk.sgn[i] = s
        blk.sig[i] = 1
        blk.mag[i] = 1 << p

    def spp(p: int) -> None:
        for y0 in range(0, h, 4):
            for x in range(w):
                for y in range(y0, min(y0 + 4, h)):
                    i = y * w + x
                    if blk.sig[i]:
                        continue
                    hh, vv, dd, *_ = blk._nbr(x, y)
                    if hh + vv + dd == 0:
                        continue
                    blk.vis[i] = 1
                    b = absbit(i, p)
                    mq.encode(cx[_sig_ctx(hh, vv, dd, band)], b)
                    if b:
                        code_sign(x, y, i, p)

    def mrp(p: int) -> None:
        for y0 in range(0, h, 4):
            for x in range(w):
                for y in range(y0, min(y0 + 4, h)):
                    i = y * w + x
                    if not blk.sig[i] or blk.vis[i]:
                        continue
                    if blk.ref[i]:
                        ctx = 16
                    else:
                        hh, vv, dd, *_ = blk._nbr(x, y)
                        ctx = 15 if hh + vv + dd > 0 else 14
                    b = absbit(i, p)
                    mq.encode(cx[ctx], b)
                    if b:
                        blk.mag[i] += 1 << p
                    blk.ref[i] = 1
                    blk.vis[i] = 1

    def cup(p: int) -> None:
        for y0 in range(0, h, 4):
            for x in range(w):
                y = y0
                if y0 + 4 <= h:
                    rl = True
                    for yy in range(y0, y0 + 4):
                        i = yy * w + x
                        if blk.sig[i] or blk.vis[i]:
                            rl = False
                            break
                        hh, vv, dd, *_ = blk._nbr(x, yy)
                        if hh + vv + dd:
                            rl = False
                            break
                    if rl:
                        first = -1
                        for yy in range(y0, y0 + 4):
                            if absbit(yy * w + x, p):
                                first = yy
                                break
                        if first < 0:
                            mq.encode(cx[_CTX_RL], 0)
                            continue
                        mq.encode(cx[_CTX_RL], 1)
                        r = first - y0
                        mq.encode(cx[_CTX_UNI], (r >> 1) & 1)
                        mq.encode(cx[_CTX_UNI], r & 1)
                        i = first * w + x
                        code_sign(x, first, i, p)
                        y = first + 1
                while y < min(y0 + 4, h):
                    i = y * w + x
                    if not blk.sig[i] and not blk.vis[i]:
                        hh, vv, dd, *_ = blk._nbr(x, y)
                        b = absbit(i, p)
                        mq.encode(cx[_sig_ctx(hh, vv, dd, band)], b)
                        if b:
                            code_sign(x, y, i, p)
                    y += 1

    p = nplanes - 1
    passes = [("cup", p)]
    while p > 0:
        p -= 1
        passes += [("spp", p), ("mrp", p), ("cup", p)]
    for kind, plane in passes:
        if kind == "spp":
            spp(plane)
        elif kind == "mrp":
            mrp(plane)
        else:
            cup(plane)
        if kind == "cup":
            blk.vis = bytearray(w * h)
    return nplanes, len(passes), mq.flush()


def _jpx_npasses_bits(bw: _JpxHeaderWriter, n: int) -> None:
    """Inverse of pdfcore.jpx._read_npasses (T.800 Table B.4)."""
    if n == 1:
        bw.bit(0)
        return
    bw.bit(1)
    if n == 2:
        bw.bit(0)
        return
    bw.bit(1)
    if n <= 5:
        bw.bits(n - 3, 2)
        return
    bw.bits(3, 2)
    if n <= 36:
        bw.bits(n - 6, 5)
        return
    bw.bits(31, 5)
    bw.bits(n - 37, 7)


def _jpx_fdwt97_1d(x):
    """Forward 9/7 analysis; exact inverse of pdfcore.jpx._sr97_1d."""
    import numpy as np

    from .pdfcore.jpx import _ALPHA97, _BETA97, _DELTA97, _GAMMA97, _K97

    n = len(x)
    if n == 1:
        return x.astype(np.float64).copy()
    y = x.astype(np.float64).copy()
    even = np.arange(0, n, 2)
    odd = np.arange(1, n, 2)
    em = np.where(even - 1 < 0, min(1, n - 1), even - 1)
    ep = np.where(even + 1 > n - 1, max(n - 2, 0), even + 1)
    om = odd - 1
    op = np.where(odd + 1 > n - 1, max(n - 2, 0), odd + 1)
    y[odd] -= _ALPHA97 * (y[om] + y[op])
    y[even] -= _BETA97 * (y[em] + y[ep])
    y[odd] += _GAMMA97 * (y[om] + y[op])
    y[even] += _DELTA97 * (y[em] + y[ep])
    y[odd] *= _K97
    y[even] /= _K97
    return y


def _jpx_fdwt97(a, levels):
    import numpy as np

    a = a.astype(np.float64)
    out = []
    for _ in range(levels):
        h, w = a.shape
        m = a.copy()
        for c in range(w):
            m[:, c] = _jpx_fdwt97_1d(m[:, c])
        for r in range(h):
            m[r, :] = _jpx_fdwt97_1d(m[r, :])
        out.append((m[0::2, 1::2], m[1::2, 0::2], m[1::2, 1::2]))
        a = m[0::2, 0::2]
    out.reverse()
    return a, out


def jpx_encode(
    width: int,
    height: int,
    ncomp: int,
    pixels: bytes,
    *,
    levels: int = 2,
    cb: tuple[int, int] = (6, 6),
    tile: tuple[int, int] | None = None,
    mct: bool | None = None,
    jp2: bool = True,
    lossy: bool = False,
    prec: int = 4,
) -> bytes:
    """Author a lossless 5/3 JPEG 2000 stream (JP2 container or raw J2K)
    in exactly the shape pdfcore.jpx.jpx_decode supports: 8-bit unsigned
    components, 1:1 sampling, one layer, LRCP, default precincts, one
    tile-part per tile. Shares only the MQ coder + T1 pixel-state helpers
    with the decoder; DWT/tag-tree/packet/codestream authoring is
    independent (forward vs inverse algorithms). lossy=True emits the
    irreversible 9/7 path (forward ICT, float lifting, scalar-expounded
    quantization with eps = Rb + prec, mu = 0)."""
    import numpy as np

    from .pdfcore.jpx import _band_gain, _floorlog2

    if mct is None:
        mct = ncomp >= 3
    xcb, ycb = cb
    tw, th = tile if tile else (width, height)
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, ncomp)
    if lossy:
        planes = [
            img[:, :, c].astype(np.float64) - 128.0 for c in range(ncomp)
        ]
        if mct and ncomp >= 3:
            r, g, b = planes[0], planes[1], planes[2]
            planes[0] = 0.299 * r + 0.587 * g + 0.114 * b
            planes[1] = -0.168736 * r - 0.331264 * g + 0.5 * b
            planes[2] = 0.5 * r - 0.418688 * g - 0.081312 * b
    else:
        planes = [img[:, :, c].astype(np.int64) - 128 for c in range(ncomp)]
        if mct and ncomp >= 3:
            r, g, b = planes[0], planes[1], planes[2]
            planes[0] = (r + 2 * g + b) >> 2  # Y
            planes[1] = b - g                 # U
            planes[2] = r - g                 # V

    depth = 8

    def q_eps(name):
        return depth + _band_gain(name) + prec

    def q_delta(name):
        return 2.0 ** (depth + _band_gain(name) - q_eps(name))

    ntx = (width + tw - 1) // tw
    nty = (height + th - 1) // th
    guard = 2

    # First pass over every tile: transform + T1-encode all code-blocks,
    # recording per-band max bitplanes (QCD exponents are codestream-global).
    band_maxplanes: dict = {}
    tiles = []  # list of per-tile dicts: band key -> list of cb records
    for ty in range(nty):
        for tx in range(ntx):
            x0, y0 = tx * tw, ty * th
            ctw = min(tw, width - x0)
            cth = min(th, height - y0)
            tinfo = []
            for ci in range(ncomp):
                a = planes[ci][y0 : y0 + cth, x0 : x0 + ctw]
                if lossy:
                    llf, lvl_f = _jpx_fdwt97(a, levels)

                    def qz(arr, name):
                        d = q_delta(name)
                        return (
                            np.sign(arr)
                            * np.floor(np.abs(arr) / d)
                        ).astype(np.int64)

                    ll = qz(llf, "LL")
                    lvl_bands = [
                        (qz(hl, "HL"), qz(lh, "LH"), qz(hh, "HH"))
                        for hl, lh, hh in lvl_f
                    ]
                else:
                    ll, lvl_bands = _jpx_fdwt2(a, levels)
                bands = {"LL": ll}
                for lvl, (hl, lh, hh) in enumerate(lvl_bands):
                    bands[("HL", lvl)] = hl
                    bands[("LH", lvl)] = lh
                    bands[("HH", lvl)] = hh
                comp_cbs = {}
                for key, arr in bands.items():
                    name = key if isinstance(key, str) else key[0]
                    bh, bw_ = arr.shape
                    cbs = []
                    if bw_ and bh:
                        ncx = (bw_ + (1 << xcb) - 1) >> xcb
                        ncy = (bh + (1 << ycb) - 1) >> ycb
                        for cy in range(ncy):
                            for cx_ in range(ncx):
                                bx, by = cx_ << xcb, cy << ycb
                                blkc = arr[
                                    by : by + (1 << ycb), bx : bx + (1 << xcb)
                                ]
                                npl, npas, data = _jpx_t1_encode(blkc, name)
                                cbs.append((cx_, cy, npl, npas, data))
                                mk = key if isinstance(key, str) else key
                                band_maxplanes[mk] = max(
                                    band_maxplanes.get(mk, 0), npl
                                )
                    comp_cbs[key] = cbs
                tinfo.append(comp_cbs)
            tiles.append(tinfo)

    # QCD exponents: mb = guard + eps - 1 >= max bitplanes in the band
    def eps_for(key) -> int:
        if lossy:
            name = key if isinstance(key, str) else key[0]
            e = q_eps(name)
            assert band_maxplanes.get(key, 0) <= guard + e - 1
            return e
        mb = max(band_maxplanes.get(key, 0), 1)
        return max(mb - guard + 1, 0)

    exps = [eps_for("LL")]
    for lvl in range(levels):
        exps += [eps_for(("HL", lvl)), eps_for(("LH", lvl)), eps_for(("HH", lvl))]

    # Second pass: packet headers + bodies per tile, LRCP (1 layer:
    # resolution-major, then component), matching _decode_tiles.
    tile_payloads = []
    for tinfo in tiles:
        body = bytearray()
        for r in range(levels + 1):
            for ci in range(ncomp):
                if r == 0:
                    keys = [("LL", exps[0])]
                else:
                    e = exps[1 + 3 * (r - 1) : 4 + 3 * (r - 1)]
                    keys = [
                        (("HL", r - 1), e[0]),
                        (("LH", r - 1), e[1]),
                        (("HH", r - 1), e[2]),
                    ]
                cb_lists = [(k, eps, tinfo[ci][k]) for k, eps in keys]
                any_included = any(
                    npl > 0
                    for _, _, cbs in cb_lists
                    for (_, _, npl, _, _) in cbs
                )
                bw = _JpxHeaderWriter()
                datas = []
                if not any_included:
                    bw.bit(0)
                    bw.align()
                    body += bw.out
                    continue
                bw.bit(1)
                for key, eps, cbs in cb_lists:
                    if not cbs:
                        continue
                    ncx = max(cx_ for cx_, _, _, _, _ in cbs) + 1
                    ncy = max(cy for _, cy, _, _, _ in cbs) + 1
                    mb = guard + eps - 1
                    incl_leaves = [[1] * ncx for _ in range(ncy)]
                    zbp_leaves = [[0] * ncx for _ in range(ncy)]
                    for cx_, cy, npl, npas, data in cbs:
                        incl_leaves[cy][cx_] = 0 if npl > 0 else 1
                        zbp_leaves[cy][cx_] = mb - npl if npl > 0 else 0
                    incl = _JpxEncTagTree(incl_leaves)
                    zbp = _JpxEncTagTree(zbp_leaves)
                    for cx_, cy, npl, npas, data in cbs:
                        incl.encode(bw, cx_, cy, 1)
                        if npl <= 0:
                            continue
                        zbp.encode_value(bw, cx_, cy)
                        _jpx_npasses_bits(bw, npas)
                        length = len(data)
                        need = max(length.bit_length(), 1)
                        lblock = max(3, need - _floorlog2(npas))
                        for _ in range(lblock - 3):
                            bw.bit(1)
                        bw.bit(0)
                        bw.bits(length, lblock + _floorlog2(npas))
                        datas.append(data)
                bw.align()
                body += bw.out
                for d in datas:
                    body += d
        tile_payloads.append(bytes(body))

    # Codestream assembly
    out = bytearray(b"\xff\x4f")  # SOC
    siz = struct.pack(
        ">HIIIIIIIIH", 0, width, height, 0, 0, tw, th, 0, 0, ncomp
    ) + bytes(v for _ in range(ncomp) for v in (7, 1, 1))
    out += b"\xff\x51" + struct.pack(">H", len(siz) + 2) + siz
    cod = bytes(
        [0, 0]
    ) + struct.pack(">H", 1) + bytes(
        [1 if (mct and ncomp >= 3) else 0, levels, xcb - 2, ycb - 2, 0,
         0 if lossy else 1]
    )
    out += b"\xff\x52" + struct.pack(">H", len(cod) + 2) + cod
    if lossy:
        # scalar expounded (style 2): 16-bit eps<<11 | mu per band
        qcd = bytes([(guard << 5) | 2]) + b"".join(
            struct.pack(">H", e << 11) for e in exps
        )
    else:
        qcd = bytes([guard << 5]) + bytes(e << 3 for e in exps)
    out += b"\xff\x5c" + struct.pack(">H", len(qcd) + 2) + qcd
    for isot, payload in enumerate(tile_payloads):
        psot = 12 + 2 + len(payload)
        out += b"\xff\x90" + struct.pack(">HHIBB", 10, isot, psot, 0, 1)
        out += b"\xff\x93" + payload
    out += b"\xff\xd9"  # EOC
    if not jp2:
        return bytes(out)

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload) + 8) + btype + payload

    sig = box(b"jP\x20\x20", b"\x0d\x0a\x87\x0a")
    ftyp = box(b"ftyp", b"jp2\x20" + struct.pack(">I", 0) + b"jp2\x20")
    ihdr = box(
        b"ihdr",
        struct.pack(">IIHBBBB", height, width, ncomp, 7, 7, 0, 0),
    )
    colr = box(
        b"colr",
        bytes([1, 0, 0]) + struct.pack(">I", 16 if ncomp >= 3 else 17),
    )
    jp2h = box(b"jp2h", ihdr + colr)
    return sig + ftyp + jp2h + box(b"jp2c", bytes(out))


def _jpx_fixture_pixels() -> tuple[bytes, bytes]:
    """Deterministic (gray 24x16, rgb 20x12) test rasters."""
    gray = bytes(((x * 7 + y * 13) % 256) for y in range(16) for x in range(24))
    rgb = bytes(
        v
        for y in range(12)
        for x in range(20)
        for v in ((x * 12) % 256, (y * 21) % 256, (x * y) % 256)
    )
    return gray, rgb


def _case_jpx_image():
    """JPXDecode images: gray JP2 and an RGB raw-J2K codestream (tiled);
    shipped raw by default, pixel-decoded under transcode=True via
    pdfcore/jpx.py (the reference decodes via OpenJPEG,
    src/vcl/filt_jpdxp.pas:26)."""
    b = PdfBuilder()
    cat = b.add("<< /Type /Catalog /Pages 2 0 R >>")
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 5 0 R >> "
        "/XObject << /Jg 6 0 R /Jc 7 0 R >> >> /Contents 4 0 R >>"
    )
    content = b"BT /F1 12 Tf 72 720 Td (WithJpx) Tj ET /Jg Do /Jc Do"
    b.add(f"<< /Length {len(content)} >>", content)
    b.add("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    gray, rgb = _jpx_fixture_pixels()
    jg = jpx_encode(24, 16, 1, gray, levels=2, cb=(4, 4))
    b.add(
        "<< /Type /XObject /Subtype /Image /Width 24 /Height 16 "
        "/BitsPerComponent 8 /ColorSpace /DeviceGray /Filter /JPXDecode "
        f"/Length {len(jg)} >>",
        jg,
    )
    jc = jpx_encode(20, 12, 3, rgb, levels=1, cb=(3, 3), tile=(12, 12), jp2=False)
    b.add(
        "<< /Type /XObject /Subtype /Image /Width 20 /Height 12 "
        "/BitsPerComponent 8 /ColorSpace /DeviceRGB /Filter /JPXDecode "
        f"/Length {len(jc)} >>",
        jc,
    )
    return b.build_classic(cat), "WithJpx" + CRLF, 1


CASES["jpx_image"] = _case_jpx_image


def jbig2_embed_text_huffman(
    symbols: list, placements: list, page_w: int, page_h: int,
    collective: str = "raw", custom_ds: bool = False,
) -> bytes:
    """Huffman-coded counterpart of jbig2_embed_text: SDHUFF symbol
    dictionary (height classes with raw or MMR collective bitmaps,
    standard tables B.4/B.2/B.1) + SBHUFF text region (standard tables
    B.6/B.8/B.11, runcode-coded symbol ID table per T.88 7.4.3.1.7).
    Placements may be (sid, s, t) or (sid, s, t, refined_bitmap) — the
    latter emits REFINE=1 instances whose RSIZE-byte MQ refinement
    segments follow B.14-coded deltas."""
    from delphi_pdf_parser_spark.pdfcore.jbig2 import (
        OOB,
        _BitWriter,
        _GR_CTX_SIZE,
        _GR_NOMINAL_AT,
        _LOW,
        _N,
        _OOB_K,
        HuffTable,
        MQEncoder,
        encode_refinement,
        encode_table_segment,
        std_table,
    )

    placements = [
        p if len(p) == 4 else (p[0], p[1], p[2], None) for p in placements
    ]
    any_refine = any(p[3] is not None for p in placements)

    # symbols ascending by (height, width): B.4 needs DH >= 1 and the
    # selector-0 DW table (B.2) has no negative range
    order = sorted(
        range(len(symbols)),
        key=lambda i: (len(symbols[i]), len(symbols[i][0]), i),
    )
    remap = {orig: new for new, orig in enumerate(order)}
    sorted_syms = [symbols[i] for i in order]

    t1, t2, t4 = std_table(1), std_table(2), std_table(4)
    t6, t11 = std_table(6), std_table(11)
    if custom_ds:
        # a compact IDS table tuned to small deltas: [-8, 8) in 1-value
        # ranges at 4-bit prefixes, 32-bit lower/upper lines, OOB
        ds_lines = [(5, 0, v, _N) for v in range(-8, 8)]
        ds_lines += [(3, 32, -9, _LOW), (3, 32, 8, _N), (2, 0, 0, _OOB_K)]
        t8 = HuffTable(ds_lines)
        ds_table_seg = encode_table_segment(ds_lines, htoob=True)
    else:
        t8 = std_table(8)
        ds_table_seg = None

    # --- symbol dictionary ------------------------------------------------
    bw = _BitWriter()
    hc = 0
    i = 0
    while i < len(sorted_syms):
        h = len(sorted_syms[i])
        t4.encode(bw, h - hc)
        hc = h
        cls = []
        prev_w = 0
        while i < len(sorted_syms) and len(sorted_syms[i]) == hc:
            w = len(sorted_syms[i][0])
            t2.encode(bw, w - prev_w)
            prev_w = w
            cls.append(sorted_syms[i])
            i += 1
        t2.encode(bw, OOB)
        totwidth = sum(len(s[0]) for s in cls)
        coll = [
            [v for s in cls for v in s[y]] for y in range(hc)
        ]
        if collective == "raw":
            t1.encode(bw, 0)  # BMSIZE 0 = uncompressed
            stride = (totwidth + 7) // 8
            raw = bytearray(stride * hc)
            for y, row in enumerate(coll):
                for x, v in enumerate(row):
                    if v:
                        raw[y * stride + (x >> 3)] |= 0x80 >> (x & 7)
            bw.write_bytes(bytes(raw))
        else:  # mmr
            payload = ccitt_g4_encode(coll)
            t1.encode(bw, len(payload))
            bw.write_bytes(payload)
    t1.encode(bw, 0)  # export runs: 0 not-exported,
    t1.encode(bw, len(sorted_syms))  # then all exported
    sd_body = (
        (1).to_bytes(2, "big")  # flags: SDHUFF, selectors 0 (B.4/B.2/B.1)
        + len(sorted_syms).to_bytes(4, "big")
        + len(sorted_syms).to_bytes(4, "big")
        + bw.flush()
    )

    # --- text region ------------------------------------------------------
    nsyms = len(sorted_syms)
    codelen = max(1, (nsyms - 1).bit_length())
    bw = _BitWriter()
    # symbol ID code table: all codes length `codelen`; runcode table
    # assigns the single used runcode a 1-bit code
    runlens = [0] * 35
    runlens[codelen] = 1
    for l in runlens:
        bw.write(l, 4)
    for _ in range(nsyms):
        bw.write(0, 1)  # the runcode `codelen`, canonical code 0
    bw.align()
    symtab = HuffTable([(codelen, 0, i, _N) for i in range(nsyms)])

    t14 = std_table(14)
    t1b = std_table(1)

    def emit_sym(sid, ref):
        symtab.encode(bw, sid)
        sym = sorted_syms[sid]
        if not any_refine:
            return len(sym[0]) - 1
        if ref is None:
            bw.write(0, 1)  # RI = 0
            return len(sym[0]) - 1
        bw.write(1, 1)
        rdw = len(ref[0]) - len(sym[0])
        rdh = len(ref) - len(sym)
        t14.encode(bw, rdw)
        t14.encode(bw, rdh)
        t14.encode(bw, 0)
        t14.encode(bw, 0)
        enc = MQEncoder()
        cx = [[0, 0] for _ in range(_GR_CTX_SIZE[0])]
        encode_refinement(
            enc, cx, ref, sym, rdw >> 1, rdh >> 1, template=0,
            at=_GR_NOMINAL_AT,
        )
        seg = enc.flush()
        t1b.encode(bw, len(seg))
        bw.align()
        bw.out += seg
        return len(ref[0]) - 1

    inst = sorted(
        ((remap[sid], s, t, ref) for sid, s, t, ref in placements),
        key=lambda p: (p[2], p[1]),
    )
    t11.encode(bw, 1)  # initial STRIPT = -1 (B.11 codes values >= 1)
    prev_t = -1
    firsts = 0
    k = 0
    while k < len(inst):
        t = inst[k][2]
        t11.encode(bw, t - prev_t)
        prev_t = t
        sid, s, _, ref = inst[k]
        t6.encode(bw, s - firsts)
        firsts = s
        curs = s + emit_sym(sid, ref)
        k += 1
        while k < len(inst) and inst[k][2] == t:
            sid, s, _, ref = inst[k]
            t8.encode(bw, s - curs)
            curs = s + emit_sym(sid, ref)
            k += 1
        t8.encode(bw, OOB)
    reg_info = (
        page_w.to_bytes(4, "big") + page_h.to_bytes(4, "big")
        + (0).to_bytes(4, "big") + (0).to_bytes(4, "big") + bytes([0])
    )
    tr_flags = 1 | (1 << 4) | ((1 << 1) if any_refine else 0)
    huff_flags = (3 << 2) if custom_ds else 0  # SBHUFFDS selector
    tr_body = (
        reg_info
        + tr_flags.to_bytes(2, "big")
        + huff_flags.to_bytes(2, "big")
        + (
            bytes(x & 0xFF for pair in _GR_NOMINAL_AT for x in pair)
            if any_refine
            else b""
        )
        + len(inst).to_bytes(4, "big")
        + bw.flush()
    )

    page_info = (
        page_w.to_bytes(4, "big") + page_h.to_bytes(4, "big")
        + (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
        + bytes([0]) + (0).to_bytes(2, "big")
    )
    out = _jbig2_segment(0, 48, 1, page_info)
    out += _jbig2_segment(1, 0, 0, sd_body)
    if ds_table_seg is not None:
        out += _jbig2_segment(2, 53, 0, ds_table_seg)
        out += _jbig2_segment(3, 6, 1, tr_body, refs=(1, 2))
        out += _jbig2_segment(4, 49, 1, b"")
    else:
        out += _jbig2_segment(2, 6, 1, tr_body, refs=(1,))
        out += _jbig2_segment(3, 49, 1, b"")
    return out


def _case_jbig2_huffman_image():
    """Huffman-coded JBIG2 (SDHUFF dictionary + SBHUFF text region) —
    the other coding family real scanned PDFs use."""
    b = PdfBuilder()
    cat = b.add("<< /Type /Catalog /Pages 2 0 R >>")
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 5 0 R >> "
        "/XObject << /Jh 6 0 R >> >> /Contents 4 0 R >>"
    )
    content = b"BT /F1 12 Tf 72 720 Td (WithJbig2Huff) Tj ET /Jh Do"
    b.add(f"<< /Length {len(content)} >>", content)
    b.add("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    jb = jbig2_embed_text_huffman(*_jbig2_text_fixture_args())
    b.add(
        "<< /Type /XObject /Subtype /Image /Width 16 /Height 14 "
        "/BitsPerComponent 1 /ColorSpace /DeviceGray /Filter /JBIG2Decode "
        f"/Length {len(jb)} >>",
        jb,
    )
    return b.build_classic(cat), "WithJbig2Huff" + CRLF, 1


CASES["jbig2_huffman_image"] = _case_jbig2_huffman_image


def _case_ps_function_image():
    """Separation image whose tint transform is a TYPE 4 PostScript
    calculator (with a conditional) — exercises ps_run parity
    (pdf_functionss.pas:210-682)."""
    b = PdfBuilder()
    cat = b.add("<< /Type /Catalog /Pages 2 0 R >>")
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 5 0 R >> "
        "/XObject << /Ip 6 0 R >> >> /Contents 4 0 R >>"
    )
    content = b"BT /F1 12 Tf 72 720 Td (WithPsFn) Tj ET /Ip Do"
    b.add(f"<< /Length {len(content)} >>", content)
    b.add("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    sep = bytes([0, 85, 170, 255])
    scomp = zlib.compress(sep)
    b.add(
        "<< /Type /XObject /Subtype /Image /Width 4 /Height 1 "
        "/BitsPerComponent 8 "
        "/ColorSpace [/Separation /PsSpot /DeviceCMYK 7 0 R] "
        f"/Filter /FlateDecode /Length {len(scomp)} >>",
        scomp,
    )
    # t -> (0.8t, t<0.5 ? 0.2t : 0.3t, 0, 0.1t)
    prog = (
        b"{ dup 0.8 mul exch dup dup 0.5 lt "
        b"{ 0.2 mul } { 0.3 mul } ifelse exch dup 0 mul exch 0.1 mul }"
    )
    b.add(
        "<< /FunctionType 4 /Domain [0 1] /Range [0 1 0 1 0 1 0 1] "
        f"/Length {len(prog)} >>",
        prog,
    )
    return b.build_classic(cat), "WithPsFn" + CRLF, 1


CASES["ps_function_image"] = _case_ps_function_image


# ---------------------------------------------------------------------------
# WebP lossless (VP8L) fixture encoder — counterpart of webp.py
# ---------------------------------------------------------------------------

class _Vp8lWriter:
    """LSB-first bit writer (mirrors webp._LsbReader)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, nbits: int) -> None:
        self.acc |= (v & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def write_code(self, code: int, nbits: int) -> None:
        """Prefix codes are walked MSB-of-code-first by the reader, so
        the LSB-first writer emits the bit-reversed code in one shot."""
        rev = 0
        for _ in range(nbits):
            rev = (rev << 1) | (code & 1)
            code >>= 1
        self.write(rev, nbits)

    def flush(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def _vp8l_huffman_lengths(counts: dict) -> dict:
    """symbol -> code length (plain Huffman; alphabet is small in
    fixtures so the 15-bit cap never binds)."""
    import heapq

    if not counts:
        raise ValueError("empty histogram")
    if len(counts) == 1:
        return {next(iter(counts)): 0}
    heap = [(c, i, [s]) for i, (s, c) in enumerate(sorted(counts.items()))]
    heapq.heapify(heap)
    lengths = {s: 0 for s in counts}
    i = len(heap)
    while len(heap) > 1:
        c1, _, s1 = heapq.heappop(heap)
        c2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            lengths[s] += 1
        heapq.heappush(heap, (c1 + c2, i, s1 + s2))
        i += 1
    assert max(lengths.values()) <= 15
    return lengths


def _vp8l_canonical(lengths: dict) -> dict:
    """symbol -> (code, len), DEFLATE canonical assignment."""
    maxlen = max(lengths.values())
    count = [0] * (maxlen + 1)
    for l in lengths.values():
        count[l] += 1
    nextcode = [0] * (maxlen + 1)
    code = 0
    for l in range(1, maxlen + 1):
        code = (code + count[l - 1]) << 1
        nextcode[l] = code
    out = {}
    for s in sorted(lengths):
        l = lengths[s]
        if l > 0:
            out[s] = (nextcode[l], l)
            nextcode[l] += 1
    return out


_VP8L_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
                  14, 15)


def _vp8l_write_prefix(bw: _Vp8lWriter, counts: dict, alphabet: int) -> dict:
    """Emit one prefix code; -> symbol -> (code, len) for the body."""
    syms = sorted(counts)
    if len(syms) <= 2 and syms[-1] <= 255:
        # simple codes store raw 8-bit symbols, so codes >= 256
        # (length/cache) must go through the normal path
        bw.write(1, 1)  # simple
        bw.write(len(syms) - 1, 1)
        first_8 = 0 if syms[0] <= 1 else 1
        bw.write(first_8, 1)
        bw.write(syms[0], 8 if first_8 else 1)
        if len(syms) == 2:
            bw.write(syms[1], 8)
            return {syms[0]: (0, 1), syms[1]: (1, 1)}
        return {syms[0]: (0, 0)}
    bw.write(0, 1)  # normal
    lengths = _vp8l_huffman_lengths(counts)
    all_lens = [lengths.get(s, 0) for s in range(alphabet)]
    # run-length-code the CL body: zero runs become code 17 (3-10 zeros,
    # 3 extra bits) / code 18 (11-138 zeros, 7 extra bits) instead of
    # one explicit 0 per alphabet slot — ~4x fewer CL symbols on both
    # the encode and decode side for sparse alphabets
    ops = []  # (cl_symbol, extra_nbits, extra_val)
    i = 0
    n_lens = len(all_lens)
    while i < n_lens:
        l = all_lens[i]
        if l != 0:
            ops.append((l, 0, 0))
            i += 1
            continue
        j = i
        while j < n_lens and all_lens[j] == 0:
            j += 1
        run = j - i
        while run:
            if run < 3:
                ops.extend([(0, 0, 0)] * run)
                run = 0
            elif run <= 10:
                ops.append((17, 3, run - 3))
                run = 0
            else:
                take = min(run, 138)
                ops.append((18, 7, take - 11))
                run -= take
        i = j
    cl_counts: dict = {}
    for sym, _, _ in ops:
        cl_counts[sym] = cl_counts.get(sym, 0) + 1
    cl_lengths = _vp8l_huffman_lengths(cl_counts)
    assert max(cl_lengths.values()) <= 7
    bw.write(19 - 4, 4)  # emit all 19 code-length-code slots
    if len(cl_lengths) == 1:
        # every CL op shares one symbol: the CL code is a single symbol
        # — written with any nonzero length, decoded as a 0-bit code;
        # its extra bits (if any) still follow per op
        only = next(iter(cl_lengths))
        for s in _VP8L_CL_ORDER:
            bw.write(1 if s == only else 0, 3)
        bw.write(0, 1)  # no max_symbol cap
        for _, enb, ev in ops:
            if enb:
                bw.write(ev, enb)
        return _vp8l_canonical(lengths)
    for s in _VP8L_CL_ORDER:
        bw.write(cl_lengths.get(s, 0), 3)
    cl_codes = _vp8l_canonical(cl_lengths)
    bw.write(0, 1)  # no max_symbol cap
    for sym, enb, ev in ops:
        c, n = cl_codes[sym]
        bw.write_code(c, n)
        if enb:
            bw.write(ev, enb)
    return _vp8l_canonical(lengths)


def _vp8l_lz77(pixels: list, use_lz77: bool):
    """-> ops: ('lit', px) | ('copy', length, dist). Greedy run-of-
    previous-pixel detection (dist 1), enough to exercise the decoder's
    backward-reference path."""
    ops = []
    i = 0
    n = len(pixels)
    while i < n:
        if use_lz77 and i > 0 and pixels[i] == pixels[i - 1]:
            j = i
            while j < n and pixels[j] == pixels[i - 1] and j - i < 4096:
                j += 1
            if j - i >= 3:
                ops.append(("copy", j - i, 1))
                i = j
                continue
        ops.append(("lit", pixels[i]))
        i += 1
    return ops


def _vp8l_prefix_split(v: int):
    """value -> (prefix_code, extra_bits, extra_val); inverse of
    webp._prefix_value."""
    if v <= 4:
        return v - 1, 0, 0
    v -= 1
    nbits = v.bit_length() - 1
    rest = v - (1 << nbits)
    half = 1 << (nbits - 1)
    if rest >= half:
        return 2 * nbits + 1, nbits - 1, rest - half
    return 2 * nbits, nbits - 1, rest


def _gif_lzw_encode_frame(indices, min_code: int) -> bytes:
    """GIF-flavor LZW (LSB-first, CLEAR/EOI, 12-bit cap) — the encode
    mirror of mediadec._gif_lzw."""
    clear = 1 << min_code
    eoi = clear + 1
    dic = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    prev = ()
    for i in indices:
        cur = prev + (i,)
        if cur in dic:
            prev = cur
            continue
        emit(dic[prev])
        if next_code < 4096:
            dic[cur] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        prev = (i,)
    if prev:
        emit(dic[prev])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def gif_encode_animated(
    w: int,
    h: int,
    frames: list,
    palette: bytes,
    delay_cs: int = 4,
    controls: list | None = None,
) -> bytes:
    """Animated GIF89a: each frames[i] is a full-canvas list of palette
    indices (or, with a per-frame control rect, a rect-sized list); by
    default every frame gets a GCE (delay, no transparency, disposal
    'do not dispose') + a full-size image descriptor.

    controls[i], when given, is a dict overriding that frame's GCE and
    descriptor: 'disposal' (0..3), 'transparent' (palette index or
    None), 'rect' ((left, top, fw, fh) sub-rectangle)."""
    import struct as _struct

    n = max(2, (len(palette) // 3 - 1).bit_length())
    gct = palette + b"\x00" * (3 * (2 ** n) - len(palette))
    out = bytearray(
        b"GIF89a" + _struct.pack("<HHBBB", w, h, 0x80 | (n - 1), 0, 0) + gct
    )
    min_code = max(2, n)
    for fno, idx in enumerate(frames):
        ctl = (controls[fno] if controls and fno < len(controls) else None) or {}
        disposal = ctl.get("disposal", 1)
        transparent = ctl.get("transparent")
        left, top, fw, fh = ctl.get("rect", (0, 0, w, h))
        gce_flags = (disposal << 2) | (1 if transparent is not None else 0)
        out += b"\x21\xf9\x04" + bytes(
            [gce_flags, delay_cs & 0xFF, delay_cs >> 8, transparent or 0]
        ) + b"\x00"
        out += b"\x2c" + _struct.pack("<HHHHB", left, top, fw, fh, 0)
        lzw = _gif_lzw_encode_frame(idx, min_code)
        out += bytes([min_code])
        for i in range(0, len(lzw), 255):
            blk = lzw[i : i + 255]
            out += bytes([len(blk)]) + blk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def webp_encode(
    width: int,
    height: int,
    ncomp: int,
    pixels: bytes,
    *,
    sub_green: bool = False,
    predictor: int | None = None,
    color_te: tuple[int, int, int] | None = None,
    cache_bits: int = 0,
    use_lz77: bool = False,
    palette: bool = False,
) -> bytes:
    """Author a lossless VP8L WebP. Transforms are applied forward here
    and inverted by the decoder: optional SUBTRACT_GREEN, optional
    PREDICTOR (one mode for every tile), optional COLOR transform (one
    (g2r, g2b, r2b) element for every tile); optional color cache and
    LZ77 dist-1 runs."""
    px = []
    for i in range(width * height):
        if ncomp == 1:
            v = pixels[i]
            px.append((255, v, v, v))
        elif ncomp == 3:
            r, g, b = pixels[3 * i : 3 * i + 3]
            px.append((255, r, g, b))
        else:
            r, g, b, a = pixels[4 * i : 4 * i + 4]
            px.append((a, r, g, b))

    bw = _Vp8lWriter()
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(1 if ncomp == 4 else 0, 1)  # alpha hint
    bw.write(0, 3)  # version

    def emit_entropy_image(pix, w, h, cache_b, lz77, level0=False):
        if cache_b:
            bw.write(1, 1)
            bw.write(cache_b, 4)
        else:
            bw.write(0, 1)
        cache = [None] * (1 << cache_b) if cache_b else []
        ops = _vp8l_lz77(pix, lz77)
        # rewrite through the cache exactly as the decoder replays it
        final = []
        pos_pix = []
        for op in ops:
            if op[0] == "lit":
                p = op[1]
                if cache_b:
                    argb = (p[0] << 24) | (p[1] << 16) | (p[2] << 8) | p[3]
                    slot = (0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_b)
                    if cache[slot] == argb:
                        final.append(("cache", slot))
                        pos_pix.append(p)
                        continue
                    cache[slot] = argb
                final.append(op)
                pos_pix.append(p)
            else:
                _, ln, dist = op
                final.append(op)
                for _ in range(ln):
                    p = pos_pix[len(pos_pix) - dist]
                    if cache_b:
                        argb = (p[0] << 24) | (p[1] << 16) | (p[2] << 8) | p[3]
                        slot = (0x1E35A7BD * argb & 0xFFFFFFFF) >> (
                            32 - cache_b
                        )
                        cache[slot] = argb
                    pos_pix.append(p)
        gc: dict = {}
        rc: dict = {}
        bc: dict = {}
        ac: dict = {}
        dc: dict = {}
        for op in final:
            if op[0] == "lit":
                a, r, g, b = op[1]
                gc[g] = gc.get(g, 0) + 1
                rc[r] = rc.get(r, 0) + 1
                bc[b] = bc.get(b, 0) + 1
                ac[a] = ac.get(a, 0) + 1
            elif op[0] == "copy":
                lcode, _, _ = _vp8l_prefix_split(op[1])
                gc[256 + lcode] = gc.get(256 + lcode, 0) + 1
                dcode, _, _ = _vp8l_prefix_split(op[2] + 120)
                dc[dcode] = dc.get(dcode, 0) + 1
            else:
                gc[280 + op[1]] = gc.get(280 + op[1], 0) + 1
        for d, default in ((rc, 0), (bc, 0), (ac, 255), (dc, 0)):
            if not d:
                d[default] = 1
        if level0:
            bw.write(0, 1)  # no meta prefix-code image
        g_alpha = 256 + 24 + ((1 << cache_b) if cache_b else 0)
        g_codes = _vp8l_write_prefix(bw, gc, g_alpha)
        r_codes = _vp8l_write_prefix(bw, rc, 256)
        b_codes = _vp8l_write_prefix(bw, bc, 256)
        a_codes = _vp8l_write_prefix(bw, ac, 256)
        d_codes = _vp8l_write_prefix(bw, dc, 40)
        for op in final:
            if op[0] == "lit":
                a, r, g, b = op[1]
                bw.write_code(*g_codes[g])
                bw.write_code(*r_codes[r])
                bw.write_code(*b_codes[b])
                bw.write_code(*a_codes[a])
            elif op[0] == "copy":
                lcode, nb, ev = _vp8l_prefix_split(op[1])
                bw.write_code(*g_codes[256 + lcode])
                bw.write(ev, nb)
                dcode, dnb, dev = _vp8l_prefix_split(op[2] + 120)
                bw.write_code(*d_codes[dcode])
                bw.write(dev, dnb)
            else:
                bw.write_code(*g_codes[280 + op[1]])

    # forward transforms (decoder inverts in reverse order, so emit
    # transform headers in the order applied here)
    if predictor is not None:
        from .webp import _avg2, _clamp

        bits = 4
        tw = (width + 15) >> 4
        th = (height + 15) >> 4
        bw.write(1, 1)
        bw.write(0, 2)  # PREDICTOR
        bw.write(bits - 2, 3)
        tiles = [(255, 0, predictor, 0)] * (tw * th)
        emit_entropy_image(tiles, tw, th, 0, False)
        res = []
        for pos in range(width * height):
            x, y = pos % width, pos // width
            if pos == 0:
                pred = (255, 0, 0, 0)
            elif y == 0:
                pred = px[pos - 1]
            elif x == 0:
                pred = px[pos - width]
            else:
                left, top = px[pos - 1], px[pos - width]
                tl = px[pos - width - 1]
                # same flat-index arithmetic as the decoder: for
                # x == width-1 this reads (0, y) — the spec quirk
                tr = px[pos - width + 1]
                mode = predictor
                if mode == 0:
                    pred = (255, 0, 0, 0)
                elif mode == 1:
                    pred = left
                elif mode == 2:
                    pred = top
                elif mode == 7:
                    pred = _avg2(left, top)
                elif mode == 12:
                    pred = tuple(
                        _clamp(l + t - c) for l, t, c in zip(left, top, tl)
                    )
                else:
                    raise ValueError("fixture encoder: unsupported mode")
            res.append(
                tuple((p - q) & 0xFF for p, q in zip(px[pos], pred))
            )
        px = res
    if color_te is not None:
        from .webp import _ctd

        g2r, g2b, r2b = color_te
        bits = 4
        tw = (width + 15) >> 4
        th = (height + 15) >> 4
        bw.write(1, 1)
        bw.write(1, 2)  # COLOR
        bw.write(bits - 2, 3)
        tiles = [(255, r2b, g2b, g2r)] * (tw * th)
        emit_entropy_image(tiles, tw, th, 0, False)
        fwd = []
        for a, r, g, b in px:
            # forward: subtract the deltas the decoder will add back
            nr = (r - _ctd(g2r, g)) & 0xFF
            nb = (b - _ctd(g2b, g) - _ctd(r2b, (nr + _ctd(g2r, g)) & 0xFF)) & 0xFF
            fwd.append((a, nr, g, nb))
        px = fwd
    if sub_green:
        bw.write(1, 1)
        bw.write(2, 2)  # SUBTRACT_GREEN
        px = [(a, (r - g) & 0xFF, g, (b - g) & 0xFF) for a, r, g, b in px]
    xsize = width
    if palette:
        colors = []
        index = {}
        for p in px:
            if p not in index:
                index[p] = len(colors)
                colors.append(p)
        if len(colors) > 256:
            raise ValueError("fixture encoder: > 256 colors for palette")
        bw.write(1, 1)
        bw.write(3, 2)  # COLOR_INDEXING
        bw.write(len(colors) - 1, 8)
        deltas = []
        prev = (0, 0, 0, 0)
        for c in colors:
            deltas.append(tuple((a - b) & 0xFF for a, b in zip(c, prev)))
            prev = c
        emit_entropy_image(deltas, len(colors), 1, 0, False)
        n_pal = len(colors)
        bpp = 1 if n_pal <= 2 else 2 if n_pal <= 4 else 4 if n_pal <= 16 else 8
        if bpp == 8:
            px = [(255, 0, index[p], 0) for p in px]
        else:
            ppb = 8 // bpp
            xsize = (width + ppb - 1) // ppb
            packed = []
            for y in range(height):
                for bx in range(xsize):
                    g = 0
                    for k in range(ppb):
                        x = bx * ppb + k
                        if x < width:
                            g |= index[px[y * width + x]] << (bpp * k)
                    packed.append((255, 0, g, 0))
            px = packed
    bw.write(0, 1)  # end of transforms

    emit_entropy_image(px, xsize, height, cache_bits, use_lz77, level0=True)
    payload = b"\x2f" + bw.flush()
    riff = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        riff += b"\x00"
    return b"RIFF" + (4 + len(riff)).to_bytes(4, "little") + b"WEBP" + riff


def jbig2_embed_refinement(base: list, refined: list) -> bytes:
    """Page = generic region (base) + immediate refinement region that
    refines it in place to `refined` (same dims, REPLACE comb op)."""
    from delphi_pdf_parser_spark.pdfcore.jbig2 import (
        _GR_CTX_SIZE,
        _GR_NOMINAL_AT,
        MQEncoder,
        encode_generic_region,
        encode_refinement,
    )

    h = len(base)
    w = len(base[0])
    assert len(refined) == h and len(refined[0]) == w
    page_info = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
        + bytes([0]) + (0).to_bytes(2, "big")
    )
    reg_info = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + (0).to_bytes(4, "big") + (0).to_bytes(4, "big") + bytes([0])
    )
    gen = encode_generic_region(base)
    gen_body = reg_info + bytes([0]) + bytes(
        x & 0xFF for pair in ((3, -1), (-3, -1), (2, -2), (-2, -2))
        for x in pair
    ) + gen
    enc = MQEncoder()
    cx = [[0, 0] for _ in range(_GR_CTX_SIZE[0])]
    encode_refinement(enc, cx, refined, base, 0, 0, template=0)
    # REPLACE comb op (region info flags = 4)
    ref_reg_info = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + (0).to_bytes(4, "big") + (0).to_bytes(4, "big") + bytes([4])
    )
    ref_body = ref_reg_info + bytes([0]) + bytes(
        x & 0xFF for pair in _GR_NOMINAL_AT for x in pair
    ) + enc.flush()
    out = _jbig2_segment(0, 48, 1, page_info)
    out += _jbig2_segment(1, 38, 1, gen_body)   # immediate generic
    out += _jbig2_segment(2, 42, 1, ref_body)   # immediate refinement
    out += _jbig2_segment(3, 49, 1, b"")
    return out


def jbig2_embed_text_refine(
    symbols: list, placements: list, page_w: int, page_h: int
) -> bytes:
    """Arithmetic symbol dict + text region with REFINE=1: placements are
    (symbol_index, s, t, refined_bitmap_or_None); refined instances carry
    RDW/RDH/RDX/RDY deltas + a refinement of the dictionary symbol."""
    from delphi_pdf_parser_spark.pdfcore.jbig2 import (
        _CTX_SIZE,
        _GR_CTX_SIZE,
        _GR_NOMINAL_AT,
        _NOMINAL_AT,
        IdCtx,
        IntCtx,
        MQEncoder,
        OOB,
        _gb_context,
        encode_id,
        encode_int,
        encode_refinement,
    )

    order = sorted(range(len(symbols)), key=lambda i: (len(symbols[i]), i))
    remap = {orig: new for new, orig in enumerate(order)}
    sorted_syms = [symbols[i] for i in order]

    enc = MQEncoder()
    gb_cx = [[0, 0] for _ in range(_CTX_SIZE[0])]
    at = _NOMINAL_AT[0]
    iadh, iadw, iaex = IntCtx(), IntCtx(), IntCtx()
    hc = 0
    i = 0
    while i < len(sorted_syms):
        h = len(sorted_syms[i])
        encode_int(enc, iadh, h - hc)
        hc = h
        prev_w = 0
        while i < len(sorted_syms) and len(sorted_syms[i]) == hc:
            bm = sorted_syms[i]
            w = len(bm[0])
            encode_int(enc, iadw, w - prev_w)
            prev_w = w
            img = [[0] * w for _ in range(hc)]
            for y in range(hc):
                for x in range(w):
                    ctx = _gb_context(img, x, y, w, 0, at)
                    enc.encode(gb_cx[ctx], bm[y][x])
                    img[y][x] = bm[y][x]
            i += 1
        encode_int(enc, iadw, OOB)
    encode_int(enc, iaex, 0)
    encode_int(enc, iaex, len(sorted_syms))
    sd_body = (
        (0).to_bytes(2, "big")
        + b"".join(bytes([x & 0xFF, y & 0xFF]) for x, y in at)
        + len(sorted_syms).to_bytes(4, "big")
        + len(sorted_syms).to_bytes(4, "big")
        + enc.flush()
    )

    codelen = max(1, (len(sorted_syms) - 1).bit_length())
    enc = MQEncoder()
    iadt, iafs, iads = IntCtx(), IntCtx(), IntCtx()
    iari = IntCtx()
    iardw, iardh, iardx, iardy = IntCtx(), IntCtx(), IntCtx(), IntCtx()
    gr_cx = [[0, 0] for _ in range(_GR_CTX_SIZE[0])]
    iaid = IdCtx(codelen)
    inst = sorted(
        ((remap[sid], s, t, ref) for sid, s, t, ref in placements),
        key=lambda p: (p[2], p[1]),
    )
    encode_int(enc, iadt, 0)
    prev_t = 0
    firsts = 0
    k = 0

    def emit_symbol(sid, ref):
        encode_id(enc, iaid, sid)
        sym = sorted_syms[sid]
        if ref is None:
            encode_int(enc, iari, 0)
            return len(sym[0]) - 1
        encode_int(enc, iari, 1)
        rdw = len(ref[0]) - len(sym[0])
        rdh = len(ref) - len(sym)
        encode_int(enc, iardw, rdw)
        encode_int(enc, iardh, rdh)
        encode_int(enc, iardx, 0)
        encode_int(enc, iardy, 0)
        encode_refinement(
            enc, gr_cx, ref, sym, rdw >> 1, rdh >> 1, template=0,
            at=_GR_NOMINAL_AT,
        )
        return len(ref[0]) - 1

    while k < len(inst):
        t = inst[k][2]
        encode_int(enc, iadt, t - prev_t)
        prev_t = t
        sid, s, _, ref = inst[k]
        encode_int(enc, iafs, s - firsts)
        firsts = s
        curs = s + emit_symbol(sid, ref)
        k += 1
        while k < len(inst) and inst[k][2] == t:
            sid, s, _, ref = inst[k]
            encode_int(enc, iads, s - curs)
            curs = s + emit_symbol(sid, ref)
            k += 1
        encode_int(enc, iads, OOB)
    reg_info = (
        page_w.to_bytes(4, "big") + page_h.to_bytes(4, "big")
        + (0).to_bytes(4, "big") + (0).to_bytes(4, "big") + bytes([0])
    )
    # flags: REFINE(1<<1), REFCORNER=TL(1<<4), SBRTEMPLATE=0
    tr_flags = (1 << 1) | (1 << 4)
    tr_body = (
        reg_info
        + tr_flags.to_bytes(2, "big")
        + bytes(x & 0xFF for pair in _GR_NOMINAL_AT for x in pair)
        + len(inst).to_bytes(4, "big")
        + enc.flush()
    )
    page_info = (
        page_w.to_bytes(4, "big") + page_h.to_bytes(4, "big")
        + (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
        + bytes([0]) + (0).to_bytes(2, "big")
    )
    out = _jbig2_segment(0, 48, 1, page_info)
    out += _jbig2_segment(1, 0, 0, sd_body)
    out += _jbig2_segment(2, 6, 1, tr_body, refs=(1,))
    out += _jbig2_segment(3, 49, 1, b"")
    return out


def jbig2_embed_refagg_dict(
    base_symbols: list, refined_symbols: list, placements: list,
    page_w: int, page_h: int,
) -> bytes:
    """Dict 1: generic-coded base_symbols. Dict 2 (SDREFAGG,
    REFAGGNINST=1): refined_symbols[i] refines base_symbols[i] (same
    index, same dims here). Text region places dict-2 symbols."""
    from delphi_pdf_parser_spark.pdfcore.jbig2 import (
        _CTX_SIZE,
        _GR_CTX_SIZE,
        _GR_NOMINAL_AT,
        _NOMINAL_AT,
        IdCtx,
        IntCtx,
        MQEncoder,
        OOB,
        _gb_context,
        encode_id,
        encode_int,
        encode_refinement,
    )

    def encode_dict_generic(syms):
        enc = MQEncoder()
        gb_cx = [[0, 0] for _ in range(_CTX_SIZE[0])]
        at = _NOMINAL_AT[0]
        iadh, iadw, iaex = IntCtx(), IntCtx(), IntCtx()
        hc = 0
        i = 0
        order = sorted(range(len(syms)), key=lambda j: (len(syms[j]), j))
        assert order == list(range(len(syms))), "pass height-sorted symbols"
        while i < len(syms):
            h = len(syms[i])
            encode_int(enc, iadh, h - hc)
            hc = h
            prev_w = 0
            while i < len(syms) and len(syms[i]) == hc:
                bm = syms[i]
                w = len(bm[0])
                encode_int(enc, iadw, w - prev_w)
                prev_w = w
                img = [[0] * w for _ in range(hc)]
                for y in range(hc):
                    for x in range(w):
                        ctx = _gb_context(img, x, y, w, 0, at)
                        enc.encode(gb_cx[ctx], bm[y][x])
                        img[y][x] = bm[y][x]
                i += 1
            encode_int(enc, iadw, OOB)
        encode_int(enc, iaex, 0)
        encode_int(enc, iaex, len(syms))
        return (
            (0).to_bytes(2, "big")
            + b"".join(bytes([x & 0xFF, y & 0xFF]) for x, y in at)
            + len(syms).to_bytes(4, "big")
            + len(syms).to_bytes(4, "big")
            + enc.flush()
        )

    sd1_body = encode_dict_generic(base_symbols)

    # dict 2: SDREFAGG over input (dict 1) symbols
    n_in = len(base_symbols)
    n_new = len(refined_symbols)
    enc = MQEncoder()
    iadh, iadw, iaex, iaai = IntCtx(), IntCtx(), IntCtx(), IntCtx()
    iardx, iardy = IntCtx(), IntCtx()
    gr_cx = [[0, 0] for _ in range(_GR_CTX_SIZE[0])]
    id_codelen = max(1, (n_in + n_new - 1).bit_length())
    iaid = IdCtx(id_codelen)
    hc = 0
    i = 0
    while i < n_new:
        h = len(refined_symbols[i])
        encode_int(enc, iadh, h - hc)
        hc = h
        prev_w = 0
        while i < n_new and len(refined_symbols[i]) == hc:
            bm = refined_symbols[i]
            w = len(bm[0])
            encode_int(enc, iadw, w - prev_w)
            prev_w = w
            encode_int(enc, iaai, 1)  # REFAGGNINST
            encode_id(enc, iaid, i)   # refine base_symbols[i]
            encode_int(enc, iardx, 0)
            encode_int(enc, iardy, 0)
            encode_refinement(
                enc, gr_cx, bm, base_symbols[i], 0, 0, template=0,
                at=_GR_NOMINAL_AT,
            )
            i += 1
        encode_int(enc, iadw, OOB)
    # export ONLY the new (refined) symbols: skip the n_in inputs
    encode_int(enc, iaex, n_in)
    encode_int(enc, iaex, n_new)
    sd2_flags = (1 << 1)  # SDREFAGG, SDRTEMPLATE=0
    sd2_body = (
        sd2_flags.to_bytes(2, "big")
        + b"".join(
            bytes([x & 0xFF, y & 0xFF]) for x, y in _NOMINAL_AT[0]
        )
        + bytes(x & 0xFF for pair in _GR_NOMINAL_AT for x in pair)
        + n_new.to_bytes(4, "big")
        + n_new.to_bytes(4, "big")
        + enc.flush()
    )

    codelen = max(1, (n_new - 1).bit_length())
    enc = MQEncoder()
    iadt, iafs, iads = IntCtx(), IntCtx(), IntCtx()
    iaid = IdCtx(codelen)
    inst = sorted(placements, key=lambda p: (p[2], p[1]))
    encode_int(enc, iadt, 0)
    prev_t = 0
    firsts = 0
    k = 0
    while k < len(inst):
        t = inst[k][2]
        encode_int(enc, iadt, t - prev_t)
        prev_t = t
        sid, s, _ = inst[k]
        encode_int(enc, iafs, s - firsts)
        firsts = s
        curs = s
        encode_id(enc, iaid, sid)
        curs += len(refined_symbols[sid][0]) - 1
        k += 1
        while k < len(inst) and inst[k][2] == t:
            sid, s, _ = inst[k]
            encode_int(enc, iads, s - curs)
            curs = s
            encode_id(enc, iaid, sid)
            curs += len(refined_symbols[sid][0]) - 1
            k += 1
        encode_int(enc, iads, OOB)
    reg_info = (
        page_w.to_bytes(4, "big") + page_h.to_bytes(4, "big")
        + (0).to_bytes(4, "big") + (0).to_bytes(4, "big") + bytes([0])
    )
    tr_body = (
        reg_info
        + (1 << 4).to_bytes(2, "big")
        + len(inst).to_bytes(4, "big")
        + enc.flush()
    )
    page_info = (
        page_w.to_bytes(4, "big") + page_h.to_bytes(4, "big")
        + (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
        + bytes([0]) + (0).to_bytes(2, "big")
    )
    out = _jbig2_segment(0, 48, 1, page_info)
    out += _jbig2_segment(1, 0, 0, sd1_body)
    out += _jbig2_segment(2, 0, 0, sd2_body, refs=(1,))
    out += _jbig2_segment(3, 6, 1, tr_body, refs=(2,))
    out += _jbig2_segment(4, 49, 1, b"")
    return out


def jbig2_embed_halftone(
    values: list, patterns: list, page_w: int, page_h: int,
    pattern_mmr: bool = False, gray_mmr: bool = False,
    grid_x: int = 0, grid_y: int = 0, enable_skip: bool = False,
) -> bytes:
    """Pattern dictionary + immediate halftone region: `values` is the
    HGH x HGW grid of pattern indices, `patterns` the HDPW x HDPH cells.
    Grid vectors: HRX = HDPW << 8, HRY = 0 (square-step grid)."""
    from delphi_pdf_parser_spark.pdfcore.jbig2 import (
        _CTX_SIZE,
        _NOMINAL_AT,
        MQEncoder,
        _gb_context,
        encode_generic_region,
    )

    hdph = len(patterns[0])
    hdpw = len(patterns[0][0])
    n = len(patterns)
    assert all(len(p) == hdph and len(p[0]) == hdpw for p in patterns)
    # collective bitmap: patterns side by side; A1 = (-HDPW, 0)
    coll = [
        [v for p in patterns for v in p[y]] for y in range(hdph)
    ]
    if pattern_mmr:
        pd_payload = ccitt_g4_encode(coll)
        pd_flags = 1
    else:
        at = [(-hdpw, 0)] + list(_NOMINAL_AT[0][1:])
        pd_payload = encode_generic_region(coll, template=0, at=tuple(at))
        pd_flags = 0
    pd_body = (
        bytes([pd_flags, hdpw, hdph]) + (n - 1).to_bytes(4, "big")
        + pd_payload
    )

    hgh = len(values)
    hgw = len(values[0])
    bits = max(1, (n - 1).bit_length())
    # gray-code planes (C.5): p_{b-1} = v_{b-1}; p_j = v_j ^ v_{j+1}
    planes = []
    prev_bit = [[0] * hgw for _ in range(hgh)]
    for j in range(bits - 1, -1, -1):
        plane = [[0] * hgw for _ in range(hgh)]
        for y in range(hgh):
            for x in range(hgw):
                v = (values[y][x] >> j) & 1
                plane[y][x] = v ^ prev_bit[y][x]
                prev_bit[y][x] = v
        planes.append(plane)
    skip = None
    if enable_skip and not gray_mmr:
        # with HMMR=1 the flag is still set but the G4 stream codes
        # every cell (Annex C.5: skip only applies to the arithmetic
        # generic procedure) — the encoder just ignores it there
        skip = [[0] * hgw for _ in range(hgh)]
        for mg in range(hgh):
            for ng in range(hgw):
                x = (grid_x + ng * (hdpw << 8)) >> 8
                y = (grid_y + mg * (hdpw << 8)) >> 8
                if (x + hdpw <= 0 or x >= page_w
                        or y + hdph <= 0 or y >= page_h):
                    skip[mg][ng] = 1
    if gray_mmr:
        gs_payload = ccitt_g4_encode([row for pl in planes for row in pl])
    else:
        # arithmetic: one shared coder + context across planes
        enc = MQEncoder()
        gb_cx = [[0, 0] for _ in range(_CTX_SIZE[0])]
        nat = _NOMINAL_AT[0]
        for plane in planes:
            img = [[0] * hgw for _ in range(hgh)]
            for y in range(hgh):
                for x in range(hgw):
                    if skip is not None and skip[y][x]:
                        continue  # pixel not coded
                    ctx = _gb_context(img, x, y, hgw, 0, nat)
                    enc.encode(gb_cx[ctx], plane[y][x])
                    img[y][x] = plane[y][x]
        gs_payload = None
    reg_info = (
        page_w.to_bytes(4, "big") + page_h.to_bytes(4, "big")
        + (0).to_bytes(4, "big") + (0).to_bytes(4, "big") + bytes([0])
    )
    ht_flags = (1 if gray_mmr else 0) | ((1 << 3) if enable_skip else 0)
    ht_body = (
        reg_info
        + bytes([ht_flags])  # template 0, OR composition
        + hgw.to_bytes(4, "big") + hgh.to_bytes(4, "big")
        + grid_x.to_bytes(4, "big", signed=True)
        + grid_y.to_bytes(4, "big", signed=True)
        + (hdpw << 8).to_bytes(2, "big") + (0).to_bytes(2, "big")
        + (gs_payload if gray_mmr else enc.flush())
    )
    page_info = (
        page_w.to_bytes(4, "big") + page_h.to_bytes(4, "big")
        + (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
        + bytes([0]) + (0).to_bytes(2, "big")
    )
    out = _jbig2_segment(0, 48, 1, page_info)
    out += _jbig2_segment(1, 16, 1, pd_body)
    out += _jbig2_segment(2, 22, 1, ht_body, refs=(1,))
    out += _jbig2_segment(3, 49, 1, b"")
    return out


def _case_jbig2_refine_halftone():
    """JBIG2 refinement (REFINE=1 text region) and halftone images
    through the PDF image sink."""
    b = PdfBuilder()
    cat = b.add("<< /Type /Catalog /Pages 2 0 R >>")
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 5 0 R >> "
        "/XObject << /Jr 6 0 R /Jh 7 0 R >> >> /Contents 4 0 R >>"
    )
    content = b"BT /F1 12 Tf 72 720 Td (WithJbig2RH) Tj ET /Jr Do /Jh Do"
    b.add(f"<< /Length {len(content)} >>", content)
    b.add("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    syms, placements, pw, ph = _jbig2_text_fixture_args()
    ref_o = [row + [0] for row in syms[2]]
    ref_o[1][1] ^= 1
    plc = [(sid, s, t, ref_o if sid == 2 else None)
           for sid, s, t in placements]
    jr = jbig2_embed_text_refine(syms, plc, pw, ph)
    b.add(
        f"<< /Type /XObject /Subtype /Image /Width {pw} /Height {ph} "
        "/BitsPerComponent 1 /ColorSpace /DeviceGray /Filter /JBIG2Decode "
        f"/Length {len(jr)} >>",
        jr,
    )
    pats = [
        [[0, 0], [0, 0]], [[1, 0], [0, 0]], [[1, 0], [0, 1]],
        [[1, 1], [1, 1]],
    ]
    vals = [[(x + y) % 4 for x in range(6)] for y in range(5)]
    jh = jbig2_embed_halftone(vals, pats, 12, 10)
    b.add(
        "<< /Type /XObject /Subtype /Image /Width 12 /Height 10 "
        "/BitsPerComponent 1 /ColorSpace /DeviceGray /Filter /JBIG2Decode "
        f"/Length {len(jh)} >>",
        jh,
    )
    return b.build_classic(cat), "WithJbig2RH" + CRLF, 1


CASES["jbig2_refine_halftone"] = _case_jbig2_refine_halftone


def _case_lab_image():
    """L*a*b* raster through the reference's exact lab_to_rgb
    (pdf_color_spcasess.pas:44-76: fung + matrix with per-channel scale
    factors + sqrt gamma; byte scaling per res_colorspace.pas:530)."""
    b = PdfBuilder()
    cat = b.add("<< /Type /Catalog /Pages 2 0 R >>")
    b.add("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 5 0 R >> "
        "/XObject << /Il 6 0 R >> >> /Contents 4 0 R >>"
    )
    content = b"BT /F1 12 Tf 72 720 Td (WithLab) Tj ET /Il Do"
    b.add(f"<< /Length {len(content)} >>", content)
    b.add("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    # 3x2: white, mid-gray, black / teal-ish, yellow-ish, purple-ish
    lab = bytes(
        [255, 128, 128] + [128, 128, 128] + [0, 128, 128]
        + [160, 60, 128] + [200, 128, 220] + [100, 180, 90]
    )
    comp = zlib.compress(lab)
    b.add(
        "<< /Type /XObject /Subtype /Image /Width 3 /Height 2 "
        "/BitsPerComponent 8 "
        "/ColorSpace [/Lab << /WhitePoint [0.9505 1 1.089] >>] "
        f"/Filter /FlateDecode /Length {len(comp)} >>",
        comp,
    )
    return b.build_classic(cat), "WithLab" + CRLF, 1


CASES["lab_image"] = _case_lab_image


def jbig2_embed_agg_dict(
    base_symbols: list, agg_specs: list, placements: list,
    page_w: int, page_h: int,
) -> bytes:
    """SDREFAGG dictionary with REFAGGNINST > 1 aggregates: each
    agg_specs[i] is (width, height, [(input_sid, s, t, refined|None),
    ...]) — the new symbol is a nested text region composing input
    symbols (TL corners, OR). Text region then places the aggregates."""
    from delphi_pdf_parser_spark.pdfcore.jbig2 import (
        _CTX_SIZE,
        _GR_CTX_SIZE,
        _GR_NOMINAL_AT,
        _NOMINAL_AT,
        IdCtx,
        IntCtx,
        MQEncoder,
        OOB,
        _gb_context,
        encode_id,
        encode_int,
        encode_refinement,
    )

    def encode_dict_generic(syms):
        enc = MQEncoder()
        gb_cx = [[0, 0] for _ in range(_CTX_SIZE[0])]
        at = _NOMINAL_AT[0]
        iadh, iadw, iaex = IntCtx(), IntCtx(), IntCtx()
        hc = 0
        i = 0
        while i < len(syms):
            h = len(syms[i])
            encode_int(enc, iadh, h - hc)
            hc = h
            prev_w = 0
            while i < len(syms) and len(syms[i]) == hc:
                bm = syms[i]
                w = len(bm[0])
                encode_int(enc, iadw, w - prev_w)
                prev_w = w
                img = [[0] * w for _ in range(hc)]
                for y in range(hc):
                    for x in range(w):
                        ctx = _gb_context(img, x, y, w, 0, at)
                        enc.encode(gb_cx[ctx], bm[y][x])
                        img[y][x] = bm[y][x]
                i += 1
            encode_int(enc, iadw, OOB)
        encode_int(enc, iaex, 0)
        encode_int(enc, iaex, len(syms))
        return (
            (0).to_bytes(2, "big")
            + b"".join(bytes([x & 0xFF, y & 0xFF]) for x, y in at)
            + len(syms).to_bytes(4, "big")
            + len(syms).to_bytes(4, "big")
            + enc.flush()
        )

    sd1_body = encode_dict_generic(base_symbols)

    n_in = len(base_symbols)
    n_new = len(agg_specs)
    enc = MQEncoder()
    iadh, iadw, iaex, iaai = IntCtx(), IntCtx(), IntCtx(), IntCtx()
    iardx, iardy = IntCtx(), IntCtx()
    iadt, iafs, iads, iari = IntCtx(), IntCtx(), IntCtx(), IntCtx()
    iardw, iardh = IntCtx(), IntCtx()
    gr_cx = [[0, 0] for _ in range(_GR_CTX_SIZE[0])]
    id_codelen = max(1, (n_in + n_new - 1).bit_length())
    iaid = IdCtx(id_codelen)
    specs = sorted(range(n_new), key=lambda i: (agg_specs[i][1], i))
    assert specs == list(range(n_new)), "pass height-sorted aggregates"
    hc = 0
    i = 0
    while i < n_new:
        w, h, insts = agg_specs[i]
        encode_int(enc, iadh, h - hc)
        hc = h
        prev_w = 0
        while i < n_new and agg_specs[i][1] == hc:
            w, _, insts = agg_specs[i]
            encode_int(enc, iadw, w - prev_w)
            prev_w = w
            insts = [
                p if len(p) == 4 else (p[0], p[1], p[2], None)
                for p in insts
            ]
            encode_int(enc, iaai, len(insts))  # REFAGGNINST > 1
            # nested text region, strips=1, TL, shared contexts
            inst = sorted(insts, key=lambda p: (p[2], p[1]))
            encode_int(enc, iadt, 0)  # STRIPT = 0
            prev_t = 0
            firsts = 0
            k = 0
            while k < len(inst):
                t = inst[k][2]
                encode_int(enc, iadt, t - prev_t)
                prev_t = t
                sid, s, _, ref = inst[k]
                encode_int(enc, iafs, s - firsts)
                firsts = s
                curs = s

                def emit(sid, ref, curs):
                    encode_id(enc, iaid, sid)
                    sym = base_symbols[sid]
                    if ref is None:
                        encode_int(enc, iari, 0)
                        return curs + len(sym[0]) - 1
                    encode_int(enc, iari, 1)
                    rdw = len(ref[0]) - len(sym[0])
                    rdh = len(ref) - len(sym)
                    encode_int(enc, iardw, rdw)
                    encode_int(enc, iardh, rdh)
                    encode_int(enc, iardx, 0)
                    encode_int(enc, iardy, 0)
                    encode_refinement(
                        enc, gr_cx, ref, sym, rdw >> 1, rdh >> 1,
                        template=0, at=_GR_NOMINAL_AT,
                    )
                    return curs + len(ref[0]) - 1

                curs = emit(sid, ref, curs)
                k += 1
                while k < len(inst) and inst[k][2] == t:
                    sid, s, _, ref = inst[k]
                    encode_int(enc, iads, s - curs)
                    curs = emit(sid, ref, s)
                    k += 1
                encode_int(enc, iads, OOB)
            i += 1
        encode_int(enc, iadw, OOB)
    encode_int(enc, iaex, n_in)  # skip inputs
    encode_int(enc, iaex, n_new)
    sd2_flags = (1 << 1)
    sd2_body = (
        sd2_flags.to_bytes(2, "big")
        + b"".join(bytes([x & 0xFF, y & 0xFF]) for x, y in _NOMINAL_AT[0])
        + bytes(x & 0xFF for pair in _GR_NOMINAL_AT for x in pair)
        + n_new.to_bytes(4, "big")
        + n_new.to_bytes(4, "big")
        + enc.flush()
    )

    agg_bitmaps = []
    for w, h, insts in agg_specs:
        bm = [[0] * w for _ in range(h)]
        for p in insts:
            sid, s, t = p[0], p[1], p[2]
            src = p[3] if len(p) == 4 and p[3] is not None else base_symbols[sid]
            for yy, row in enumerate(src):
                for xx, v in enumerate(row):
                    if 0 <= t + yy < h and 0 <= s + xx < w:
                        bm[t + yy][s + xx] |= v
        agg_bitmaps.append(bm)

    codelen = max(1, (n_new - 1).bit_length())
    enc = MQEncoder()
    iadt, iafs, iads = IntCtx(), IntCtx(), IntCtx()
    iaid = IdCtx(codelen)
    inst = sorted(placements, key=lambda p: (p[2], p[1]))
    encode_int(enc, iadt, 0)
    prev_t = 0
    firsts = 0
    k = 0
    while k < len(inst):
        t = inst[k][2]
        encode_int(enc, iadt, t - prev_t)
        prev_t = t
        sid, s, _ = inst[k]
        encode_int(enc, iafs, s - firsts)
        firsts = s
        curs = s
        encode_id(enc, iaid, sid)
        curs += len(agg_bitmaps[sid][0]) - 1
        k += 1
        while k < len(inst) and inst[k][2] == t:
            sid, s, _ = inst[k]
            encode_int(enc, iads, s - curs)
            curs = s
            encode_id(enc, iaid, sid)
            curs += len(agg_bitmaps[sid][0]) - 1
            k += 1
        encode_int(enc, iads, OOB)
    reg_info = (
        page_w.to_bytes(4, "big") + page_h.to_bytes(4, "big")
        + (0).to_bytes(4, "big") + (0).to_bytes(4, "big") + bytes([0])
    )
    tr_body = (
        reg_info
        + (1 << 4).to_bytes(2, "big")
        + len(inst).to_bytes(4, "big")
        + enc.flush()
    )
    page_info = (
        page_w.to_bytes(4, "big") + page_h.to_bytes(4, "big")
        + (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
        + bytes([0]) + (0).to_bytes(2, "big")
    )
    out = _jbig2_segment(0, 48, 1, page_info)
    out += _jbig2_segment(1, 0, 0, sd1_body)
    out += _jbig2_segment(2, 0, 0, sd2_body, refs=(1,))
    out += _jbig2_segment(3, 6, 1, tr_body, refs=(2,))
    out += _jbig2_segment(4, 49, 1, b"")
    return out, agg_bitmaps


def jbig2_embed_refagg_dict_huffman(
    base_symbols: list, refined_symbols: list, placements: list,
    page_w: int, page_h: int, agg_specs: list | None = None,
) -> tuple[bytes, list]:
    """Huffman counterpart of jbig2_embed_refagg_dict /
    jbig2_embed_agg_dict (T.88 6.5.8.2 with SDHUFF=1): dict 1 is an
    SDHUFF collective-bitmap dictionary for base_symbols; dict 2 is
    SDHUFF+SDREFAGG where refined_symbols[i] refines base_symbols[i]
    (REFAGGNINST=1: fixed-length ID, B.15 RDX/RDY, B.1 BMSIZE, then a
    byte-aligned MQ refinement segment) and each agg_specs entry
    (w, h, [(sid, s, t, refined|None), ...]) is a REFAGGNINST>1 nested
    Huffman text region. The dict-2 exports [refined..., aggregates...]
    must be in ascending height order. An arithmetic text region places
    them per `placements` -> (stream, new_symbol_bitmaps)."""
    from delphi_pdf_parser_spark.pdfcore.jbig2 import (
        _GR_CTX_SIZE,
        _GR_NOMINAL_AT,
        IdCtx,
        IntCtx,
        MQEncoder,
        OOB,
        _BitWriter,
        encode_id,
        encode_int,
        encode_refinement,
        std_table,
    )

    agg_specs = agg_specs or []
    t1, t2, t4 = std_table(1), std_table(2), std_table(4)
    t6, t8, t11, t15 = (
        std_table(6), std_table(8), std_table(11), std_table(15)
    )

    # --- dict 1: SDHUFF collective raw (as jbig2_embed_text_huffman) ----
    bw = _BitWriter()
    hc = 0
    i = 0
    while i < len(base_symbols):
        h = len(base_symbols[i])
        assert h > hc, "pass height-sorted base symbols"
        t4.encode(bw, h - hc)
        hc = h
        cls = []
        prev_w = 0
        while i < len(base_symbols) and len(base_symbols[i]) == hc:
            w = len(base_symbols[i][0])
            t2.encode(bw, w - prev_w)
            prev_w = w
            cls.append(base_symbols[i])
            i += 1
        t2.encode(bw, OOB)
        totwidth = sum(len(s[0]) for s in cls)
        t1.encode(bw, 0)  # BMSIZE 0 = uncompressed
        stride = (totwidth + 7) // 8
        raw = bytearray(stride * hc)
        x0 = 0
        for s in cls:
            for y, row in enumerate(s):
                for x, v in enumerate(row):
                    if v:
                        raw[y * stride + ((x0 + x) >> 3)] |= (
                            0x80 >> ((x0 + x) & 7)
                        )
            x0 += len(s[0])
        bw.write_bytes(bytes(raw))
    t1.encode(bw, 0)
    t1.encode(bw, len(base_symbols))
    sd1_body = (
        (1).to_bytes(2, "big")
        + len(base_symbols).to_bytes(4, "big")
        + len(base_symbols).to_bytes(4, "big")
        + bw.flush()
    )

    # --- dict 2: SDHUFF + SDREFAGG --------------------------------------
    n_in = len(base_symbols)
    # new symbols: ('ref', i, bitmap) then ('agg', spec, bitmap)
    new_specs = [
        ("ref", i, refined_symbols[i]) for i in range(len(refined_symbols))
    ]
    agg_bitmaps = []
    for w, h, insts in agg_specs:
        bm = [[0] * w for _ in range(h)]
        for p in insts:
            sid, s, t = p[0], p[1], p[2]
            src = (
                p[3] if len(p) == 4 and p[3] is not None
                else base_symbols[sid]
            )
            for yy, row in enumerate(src):
                for xx, v in enumerate(row):
                    if 0 <= t + yy < h and 0 <= s + xx < w:
                        bm[t + yy][s + xx] |= v
        agg_bitmaps.append(bm)
        new_specs.append(("agg", (w, h, insts), bm))
    n_new = len(new_specs)
    codelen = max(1, (n_in + n_new - 1).bit_length())

    bw = _BitWriter()
    hc = 0
    i = 0
    while i < n_new:
        h = len(new_specs[i][2])
        assert h > hc, "pass height-sorted new symbols"
        t4.encode(bw, h - hc)
        hc = h
        prev_w = 0
        while i < n_new and len(new_specs[i][2]) == hc:
            kind, payload, bm = new_specs[i]
            w = len(bm[0])
            t2.encode(bw, w - prev_w)
            prev_w = w
            if kind == "ref":
                base = base_symbols[payload]
                t1.encode(bw, 1)        # REFAGGNINST = 1 via B.1
                bw.write(payload, codelen)
                t15.encode(bw, 0)       # RDX
                t15.encode(bw, 0)       # RDY
                enc = MQEncoder()
                cx = [[0, 0] for _ in range(_GR_CTX_SIZE[0])]
                encode_refinement(
                    enc, cx, bm, base, 0, 0, template=0,
                    at=_GR_NOMINAL_AT,
                )
                seg = enc.flush()
                t1.encode(bw, len(seg))
                bw.align()
                bw.out += seg
            else:
                w_, h_, insts = payload
                insts = [
                    p if len(p) == 4 else (p[0], p[1], p[2], None)
                    for p in insts
                ]
                t1.encode(bw, len(insts))  # REFAGGNINST > 1
                # nested huffman text region (SBSTRIPS=1, TL, OR)
                inst = sorted(insts, key=lambda p: (p[2], p[1]))
                t11.encode(bw, 1)  # initial STRIPT = -1 (B.11 min 1)
                prev_t = -1
                firsts = 0
                k = 0
                while k < len(inst):
                    t = inst[k][2]
                    t11.encode(bw, t - prev_t)
                    prev_t = t
                    first = True
                    curs = 0
                    while k < len(inst) and inst[k][2] == t:
                        sid, s, _, ref = inst[k]
                        if first:
                            t6.encode(bw, s - firsts)
                            firsts = s
                            first = False
                        else:
                            t8.encode(bw, s - curs)
                        bw.write(sid, codelen)
                        sym = base_symbols[sid]
                        if ref is None:
                            bw.write(0, 1)  # R bit
                            curs = s + len(sym[0]) - 1
                        else:
                            bw.write(1, 1)
                            rdw = len(ref[0]) - len(sym[0])
                            rdh = len(ref) - len(sym)
                            t15.encode(bw, rdw)
                            t15.encode(bw, rdh)
                            t15.encode(bw, 0)
                            t15.encode(bw, 0)
                            enc = MQEncoder()
                            cx = [
                                [0, 0]
                                for _ in range(_GR_CTX_SIZE[0])
                            ]
                            encode_refinement(
                                enc, cx, ref, sym, rdw >> 1, rdh >> 1,
                                template=0, at=_GR_NOMINAL_AT,
                            )
                            seg = enc.flush()
                            t1.encode(bw, len(seg))
                            bw.align()
                            bw.out += seg
                            curs = s + len(ref[0]) - 1
                        k += 1
                    t8.encode(bw, OOB)
            i += 1
        t2.encode(bw, OOB)
    t1.encode(bw, n_in)   # export runs: skip inputs,
    t1.encode(bw, n_new)  # export all new symbols
    sd2_flags = 1 | (1 << 1)  # SDHUFF | SDREFAGG, SDRTEMPLATE=0
    sd2_body = (
        sd2_flags.to_bytes(2, "big")
        + bytes(x & 0xFF for pair in _GR_NOMINAL_AT for x in pair)
        + n_new.to_bytes(4, "big")
        + n_new.to_bytes(4, "big")
        + bw.flush()
    )

    new_bitmaps = [bm for _, _, bm in new_specs]

    # --- arithmetic text region placing dict-2 exports ------------------
    tcodelen = max(1, (n_new - 1).bit_length())
    enc = MQEncoder()
    iadt, iafs, iads = IntCtx(), IntCtx(), IntCtx()
    iaid = IdCtx(tcodelen)
    inst = sorted(placements, key=lambda p: (p[2], p[1]))
    encode_int(enc, iadt, 0)
    prev_t = 0
    firsts = 0
    k = 0
    while k < len(inst):
        t = inst[k][2]
        encode_int(enc, iadt, t - prev_t)
        prev_t = t
        sid, s, _ = inst[k]
        encode_int(enc, iafs, s - firsts)
        firsts = s
        curs = s
        encode_id(enc, iaid, sid)
        curs += len(new_bitmaps[sid][0]) - 1
        k += 1
        while k < len(inst) and inst[k][2] == t:
            sid, s, _ = inst[k]
            encode_int(enc, iads, s - curs)
            curs = s
            encode_id(enc, iaid, sid)
            curs += len(new_bitmaps[sid][0]) - 1
            k += 1
        encode_int(enc, iads, OOB)
    reg_info = (
        page_w.to_bytes(4, "big") + page_h.to_bytes(4, "big")
        + (0).to_bytes(4, "big") + (0).to_bytes(4, "big") + bytes([0])
    )
    tr_body = (
        reg_info
        + (1 << 4).to_bytes(2, "big")
        + len(inst).to_bytes(4, "big")
        + enc.flush()
    )
    page_info = (
        page_w.to_bytes(4, "big") + page_h.to_bytes(4, "big")
        + (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
        + bytes([0]) + (0).to_bytes(2, "big")
    )
    out = _jbig2_segment(0, 48, 1, page_info)
    out += _jbig2_segment(1, 0, 0, sd1_body)
    out += _jbig2_segment(2, 0, 0, sd2_body, refs=(1,))
    out += _jbig2_segment(3, 6, 1, tr_body, refs=(2,))
    out += _jbig2_segment(4, 49, 1, b"")
    return out, new_bitmaps
