"""CCITT Group 3/4 fax decoding (CCITTFaxDecode), from scratch.

Implements the ITU-T T.4 (G3 1-D MH, mixed 2-D) and T.6 (G4 pure 2-D MMR)
algorithms from the published standard's code tables. The reference fully
decodes fax images on its image-extraction path (filter factory
src/vcl/mypdfstream.pas:280-389 routing to the fax decoder
src/vcl/filt_faxdss.pas:45-837 — dec1d/dec2d over changing-element
coordinates); this module reproduces that capability with an independent
implementation over transition-position lists.

PDF parameter semantics (PDF 32000-1 §7.4.6):
- K < 0  : pure 2-D (Group 4)
- K = 0  : pure 1-D (Group 3, MH)
- K > 0  : mixed — a tag bit after each EOL selects 1-D/2-D per line
- BlackIs1 false (default): decoded 0 bits are BLACK pixels
- EncodedByteAlign: each line starts on a byte boundary

Output: packed 1-bit rows, stride = ceil(columns/8), MSB-first,
`rows * stride` bytes.
"""

from __future__ import annotations


class CcittError(Exception):
    pass


# ---- ITU T.4 modified-Huffman run-length tables -------------------------
# (code-string, run) pairs straight from the standard; stored as
# {(nbits, value): run} for longest-prefix decode.

_WHITE_CODES = [
    ("00110101", 0), ("000111", 1), ("0111", 2), ("1000", 3), ("1011", 4),
    ("1100", 5), ("1110", 6), ("1111", 7), ("10011", 8), ("10100", 9),
    ("00111", 10), ("01000", 11), ("001000", 12), ("000011", 13),
    ("110100", 14), ("110101", 15), ("101010", 16), ("101011", 17),
    ("0100111", 18), ("0001100", 19), ("0001000", 20), ("0010111", 21),
    ("0000011", 22), ("0000100", 23), ("0101000", 24), ("0101011", 25),
    ("0010011", 26), ("0100100", 27), ("0011000", 28), ("00000010", 29),
    ("00000011", 30), ("00011010", 31), ("00011011", 32), ("00010010", 33),
    ("00010011", 34), ("00010100", 35), ("00010101", 36), ("00010110", 37),
    ("00010111", 38), ("00101000", 39), ("00101001", 40), ("00101010", 41),
    ("00101011", 42), ("00101100", 43), ("00101101", 44), ("00000100", 45),
    ("00000101", 46), ("00001010", 47), ("00001011", 48), ("01010010", 49),
    ("01010011", 50), ("01010100", 51), ("01010101", 52), ("00100100", 53),
    ("00100101", 54), ("01011000", 55), ("01011001", 56), ("01011010", 57),
    ("01011011", 58), ("01001010", 59), ("01001011", 60), ("00110010", 61),
    ("00110011", 62), ("00110100", 63),
    # makeup codes
    ("11011", 64), ("10010", 128), ("010111", 192), ("0110111", 256),
    ("00110110", 320), ("00110111", 384), ("01100100", 448),
    ("01100101", 512), ("01101000", 576), ("01100111", 640),
    ("011001100", 704), ("011001101", 768), ("011010010", 832),
    ("011010011", 896), ("011010100", 960), ("011010101", 1024),
    ("011010110", 1088), ("011010111", 1152), ("011011000", 1216),
    ("011011001", 1280), ("011011010", 1344), ("011011011", 1408),
    ("010011000", 1472), ("010011001", 1536), ("010011010", 1600),
    ("011000", 1664), ("010011011", 1728),
]

_BLACK_CODES = [
    ("0000110111", 0), ("010", 1), ("11", 2), ("10", 3), ("011", 4),
    ("0011", 5), ("0010", 6), ("00011", 7), ("000101", 8), ("000100", 9),
    ("0000100", 10), ("0000101", 11), ("0000111", 12), ("00000100", 13),
    ("00000111", 14), ("000011000", 15), ("0000010111", 16),
    ("0000011000", 17), ("0000001000", 18), ("00001100111", 19),
    ("00001101000", 20), ("00001101100", 21), ("00000110111", 22),
    ("00000101000", 23), ("00000010111", 24), ("00000011000", 25),
    ("000011001010", 26), ("000011001011", 27), ("000011001100", 28),
    ("000011001101", 29), ("000001101000", 30), ("000001101001", 31),
    ("000001101010", 32), ("000001101011", 33), ("000011010010", 34),
    ("000011010011", 35), ("000011010100", 36), ("000011010101", 37),
    ("000011010110", 38), ("000011010111", 39), ("000001101100", 40),
    ("000001101101", 41), ("000011011010", 42), ("000011011011", 43),
    ("000001010100", 44), ("000001010101", 45), ("000001010110", 46),
    ("000001010111", 47), ("000001100100", 48), ("000001100101", 49),
    ("000001010010", 50), ("000001010011", 51), ("000000100100", 52),
    ("000000110111", 53), ("000000111000", 54), ("000000100111", 55),
    ("000000101000", 56), ("000001011000", 57), ("000001011001", 58),
    ("000000101011", 59), ("000000101100", 60), ("000001011010", 61),
    ("000001100110", 62), ("000001100111", 63),
    # makeup codes
    ("0000001111", 64), ("000011001000", 128), ("000011001001", 192),
    ("000001011011", 256), ("000000110011", 320), ("000000110100", 384),
    ("000000110101", 448), ("0000001101100", 512), ("0000001101101", 576),
    ("0000001001010", 640), ("0000001001011", 704), ("0000001001100", 768),
    ("0000001001101", 832), ("0000001110010", 896), ("0000001110011", 960),
    ("0000001110100", 1024), ("0000001110101", 1088),
    ("0000001110110", 1152), ("0000001110111", 1216),
    ("0000001010010", 1280), ("0000001010011", 1344),
    ("0000001010100", 1408), ("0000001010101", 1472),
    ("0000001011010", 1536), ("0000001011011", 1600),
    ("0000001100100", 1664), ("0000001100101", 1728),
]

# extended makeup codes (shared by both colors), runs 1792-2560
_EXT_CODES = [
    ("00000001000", 1792), ("00000001100", 1856), ("00000001101", 1920),
    ("000000010010", 1984), ("000000010011", 2048), ("000000010100", 2112),
    ("000000010101", 2176), ("000000010110", 2240), ("000000010111", 2304),
    ("000000011100", 2368), ("000000011101", 2432), ("000000011110", 2496),
    ("000000011111", 2560),
]


def _table(pairs):
    t = {}
    for bits, run in pairs:
        t[(len(bits), int(bits, 2))] = run
    return t


_WHITE = _table(_WHITE_CODES + _EXT_CODES)
_BLACK = _table(_BLACK_CODES + _EXT_CODES)
_WHITE_MAXLEN = max(n for n, _ in _WHITE)
_BLACK_MAXLEN = max(n for n, _ in _BLACK)

_EOL = "000000000001"


class _Bits:
    """MSB-first bit reader."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = len(data) * 8

    def eof(self) -> bool:
        return self.pos >= self.nbits

    def peek(self, n: int) -> int:
        """Next n bits as an int; bits past EOF read as 0 (T.4 allows the
        final code to be truncated by padding)."""
        v = 0
        for i in range(n):
            p = self.pos + i
            if p < self.nbits:
                bit = (self.data[p >> 3] >> (7 - (p & 7))) & 1
            else:
                bit = 0
            v = (v << 1) | bit
        return v

    def skip(self, n: int) -> None:
        self.pos += n

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _read_run(bits: _Bits, white: bool) -> int:
    """One complete run length: zero or more makeup codes + a terminating
    code (T.4 §2.3.1.2: runs >= 64 use makeup + terminating)."""
    table = _WHITE if white else _BLACK
    maxlen = _WHITE_MAXLEN if white else _BLACK_MAXLEN
    total = 0
    while True:
        run = None
        for n in range(2, maxlen + 1):
            run = table.get((n, bits.peek(n)))
            if run is not None:
                bits.skip(n)
                break
        if run is None:
            raise CcittError(f"bad {'white' if white else 'black'} code at bit {bits.pos}")
        total += run
        if run < 64:  # terminating code ends the run
            return total
        # makeup code: a terminating code must follow


def _skip_eols(bits: _Bits) -> int:
    """Consume any EOL codes (with optional fill 0-bits before them).
    Returns how many EOLs were consumed."""
    n = 0
    while True:
        # EOL = >=11 zero bits then a 1; scan fill zeros
        save = bits.pos
        zeros = 0
        while not bits.eof() and bits.peek(1) == 0:
            bits.skip(1)
            zeros += 1
        if zeros >= 11 and not bits.eof() and bits.peek(1) == 1:
            bits.skip(1)
            n += 1
            continue
        bits.pos = save
        return n


def _decode_1d_line(bits: _Bits, columns: int) -> list[int]:
    """One MH-coded line -> list of transition positions (pixel indices
    where color changes), colors alternating starting white."""
    transitions = []
    pos = 0
    white = True
    while pos < columns:
        run = _read_run(bits, white)
        pos += run
        if pos > columns:
            pos = columns
        transitions.append(pos)
        white = not white
    return transitions


def _b1_b2(ref: list[int], a0: int, a0_white: bool) -> tuple[int, int]:
    """Changing elements b1/b2 on the reference line (T.4 §2.2.4): b1 is
    the first transition to the right of a0 whose color (the color of the
    pixel run it STARTS) is opposite a0's color; transitions alternate
    white->black, black->white starting with white->black."""
    # ref transitions: index 0 starts a black run, 1 starts white, ...
    # b1 must start a run of color opposite a0_white's color, i.e. a
    # black-starting transition (even index) when a0 is white.
    i = 0
    n = len(ref)
    while i < n and ref[i] <= a0:
        i += 1
    # parity: even index = white->black transition
    want_even = a0_white
    if (i % 2 == 0) != want_even:
        i += 1
    b1 = ref[i] if i < n else -1
    b2 = ref[i + 1] if i + 1 < n else -1
    return b1, b2


def _decode_2d_line(bits: _Bits, ref: list[int], columns: int) -> list[int]:
    """One 2-D-coded line against reference transitions -> transitions."""
    transitions: list[int] = []
    a0 = -1
    white = True
    while a0 < columns:
        b1, b2 = _b1_b2(ref, a0, white)
        if b1 < 0:
            b1 = columns
        if b2 < 0:
            b2 = columns
        # mode codes, longest first is unnecessary: they are prefix-free
        if bits.peek(1) == 0b1:  # V0
            bits.skip(1)
            a1 = b1
        elif bits.peek(3) == 0b011:  # VR1
            bits.skip(3)
            a1 = b1 + 1
        elif bits.peek(3) == 0b010:  # VL1
            bits.skip(3)
            a1 = b1 - 1
        elif bits.peek(3) == 0b001:  # Horizontal
            bits.skip(3)
            start = max(a0, 0)
            r1 = _read_run(bits, white)
            r2 = _read_run(bits, not white)
            p1 = min(start + r1, columns)
            p2 = min(start + r1 + r2, columns)
            transitions.append(p1)
            transitions.append(p2)
            a0 = p2
            continue
        elif bits.peek(4) == 0b0001:  # Pass
            bits.skip(4)
            a0 = b2 if b2 > 0 else columns
            continue
        elif bits.peek(6) == 0b000011:  # VR2
            bits.skip(6)
            a1 = b1 + 2
        elif bits.peek(6) == 0b000010:  # VL2
            bits.skip(6)
            a1 = b1 - 2
        elif bits.peek(7) == 0b0000011:  # VR3
            bits.skip(7)
            a1 = b1 + 3
        elif bits.peek(7) == 0b0000010:  # VL3
            bits.skip(7)
            a1 = b1 - 3
        else:
            raise CcittError(f"bad 2-D mode code at bit {bits.pos}")
        a1 = max(0, min(a1, columns))
        transitions.append(a1)
        a0 = a1
        white = not white
    return transitions


def _pack_line(transitions: list[int], columns: int, black_is_1: bool) -> bytes:
    """Transitions -> packed bits. Internally black=1; PDF default
    (BlackIs1 false) inverts so 0 bits are black."""
    stride = (columns + 7) // 8
    row = bytearray(stride)
    # runs alternate white/black starting white; set black runs
    start = 0
    white = True
    for t in transitions:
        if not white:
            for x in range(start, min(t, columns)):
                row[x >> 3] |= 0x80 >> (x & 7)
        start = t
        white = not white
    if not black_is_1:
        for i in range(stride):
            row[i] ^= 0xFF
        # clear padding bits past `columns`
        if columns & 7:
            row[-1] &= 0xFF << (8 - (columns & 7)) & 0xFF
    return bytes(row)


def ccitt_decode(
    data: bytes,
    columns: int = 1728,
    rows: int = 0,
    k: int = 0,
    encoded_byte_align: bool = False,
    black_is_1: bool = False,
) -> bytes:
    """Decode a CCITTFaxDecode payload to packed 1-bpc rows.

    rows=0 decodes until the data (or EOFB/RTC) is exhausted.
    """
    bits = _Bits(data)
    out = bytearray()
    ref = [columns, columns]  # imaginary all-white reference line
    nrows = 0
    while rows <= 0 or nrows < rows:
        if encoded_byte_align and k <= 0:
            bits.align()
        eols = _skip_eols(bits)
        if k < 0:
            if eols >= 2:  # EOFB
                break
        elif eols >= 6:
            break  # RTC
        if encoded_byte_align and k > 0:
            bits.align()
        if bits.eof():
            break
        if k < 0:
            two_d = True
        elif k == 0:
            two_d = False
        else:
            # mixed mode: tag bit after EOL picks the coding of this line
            if eols:
                two_d = bits.peek(1) == 0
                bits.skip(1)
            else:
                two_d = False  # first line with no EOL: 1-D
        try:
            line = (
                _decode_2d_line(bits, ref, columns)
                if two_d
                else _decode_1d_line(bits, columns)
            )
        except CcittError:
            if rows <= 0 and nrows > 0:
                break  # trailing garbage after an un-row-counted image
            raise
        out += _pack_line(line, columns, black_is_1)
        # reference for the next 2-D line; pad with sentinels
        ref = line + [columns, columns]
        nrows += 1
    if rows > 0 and nrows < rows:
        # missing rows decode as all-white (tolerant, like the reference)
        stride = (columns + 7) // 8
        fill = _pack_line([columns], columns, black_is_1)
        out += fill * (rows - nrows)
    return bytes(out)
