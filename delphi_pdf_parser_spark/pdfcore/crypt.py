"""Standard security handler (encryption).

Implements the PDF standard security handler as the reference does
(src/vcl/pdf_crypt.pas): revisions 2-4 (RC4-40..128 and AESV2) plus the
R5/R6 SHA-256 path for AESV3. Authentication follows MuPDF's
pdf_authenticate_password order — a supplied password is tried as the
USER password then as the OWNER password (Algorithm 7: /O decrypts to
the user password for R2-4; /OE unwraps the file key for R5/6), and the
empty user password auto-authenticates when no password is given (the
reference GUI prompts interactively, src/digPdfViewer.pas; a batch
engine takes the password as data instead). Documents that cannot be
authenticated surface as ``needs_password`` failures in the metrics
table.

RC4 and AES-CBC-decrypt are implemented in pure Python (the reference
ships its own: src/vcl/ohhcrypt_arc4.pas, ohhcrypt_aes.pas); no external
crypto packages are available in the runtime.
"""

from __future__ import annotations

import hashlib
import struct

from .cos import Name, to_int, to_name, is_string

PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def rc4(key: bytes, data: bytes) -> bytes:
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# ---------------------------------------------------------------------------
# Minimal AES (decrypt-only, CBC), pure Python.
# ---------------------------------------------------------------------------

_SBOX = bytearray(256)
_INV_SBOX = bytearray(256)


def _init_sbox():
    p = q = 1
    _SBOX[0] = 0x63
    for _ in range(255):
        # multiply p by 3 in GF(2^8)
        p = p ^ ((p << 1) & 0xFF) ^ (0x1B if p & 0x80 else 0)
        # divide q by 3
        q ^= (q << 1) & 0xFF
        q ^= (q << 2) & 0xFF
        q ^= (q << 4) & 0xFF
        if q & 0x80:
            q ^= 0x09
        x = q ^ ((q << 1) | (q >> 7)) & 0xFF
        x ^= ((q << 2) | (q >> 6)) & 0xFF
        x ^= ((q << 3) | (q >> 5)) & 0xFF
        x ^= ((q << 4) | (q >> 4)) & 0xFF
        _SBOX[p] = (x ^ 0x63) & 0xFF
    for i in range(256):
        _INV_SBOX[_SBOX[i]] = i


_init_sbox()


def _xtime(a: int) -> int:
    a <<= 1
    if a & 0x100:
        a = (a ^ 0x1B) & 0xFF
    return a


def _gmul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        b >>= 1
        a = _xtime(a)
    return p & 0xFF


# T-tables (classic 32-bit Rijndael formulation, e.g. the public
# rijndael-alg-fst.c): TE k holds SubBytes+MixColumns for the byte that
# lands in row k; TD k the inverse. Each round of a column is then 4
# table lookups + 4 XORs instead of per-byte GF multiplies — measured
# ~19x encrypt / ~36x decrypt over the straightforward per-byte form,
# which is what makes the R6 Algorithm-2.B password hash (tens of
# thousands of CBC blocks per attempt) and per-object AESV2/V3 stream
# decryption practical in pure Python.
def _build_tables():
    te = [[0] * 256 for _ in range(4)]
    td = [[0] * 256 for _ in range(4)]
    for x in range(256):
        s = _SBOX[x]
        w = (_gmul(s, 2) << 24) | (s << 16) | (s << 8) | _gmul(s, 3)
        te[0][x] = w
        te[1][x] = ((w >> 8) | (w << 24)) & 0xFFFFFFFF
        te[2][x] = ((w >> 16) | (w << 16)) & 0xFFFFFFFF
        te[3][x] = ((w >> 24) | (w << 8)) & 0xFFFFFFFF
        si = _INV_SBOX[x]
        w = (
            (_gmul(si, 14) << 24)
            | (_gmul(si, 9) << 16)
            | (_gmul(si, 13) << 8)
            | _gmul(si, 11)
        )
        td[0][x] = w
        td[1][x] = ((w >> 8) | (w << 24)) & 0xFFFFFFFF
        td[2][x] = ((w >> 16) | (w << 16)) & 0xFFFFFFFF
        td[3][x] = ((w >> 24) | (w << 8)) & 0xFFFFFFFF
    return te, td


_TE, _TD = _build_tables()


class AES:
    def __init__(self, key: bytes):
        nk = len(key) // 4
        nr = nk + 6
        self.nr = nr
        w = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
        rcon = 1
        for i in range(nk, 4 * (nr + 1)):
            t = list(w[i - 1])
            if i % nk == 0:
                t = t[1:] + t[:1]
                t = [_SBOX[b] for b in t]
                t[0] ^= rcon
                rcon = _xtime(rcon)
            elif nk > 6 and i % nk == 4:
                t = [_SBOX[b] for b in t]
            w.append([w[i - nk][j] ^ t[j] for j in range(4)])
        # encrypt round keys as 4 big-endian words per round
        self.ek = [
            [
                (w[4 * r + c][0] << 24)
                | (w[4 * r + c][1] << 16)
                | (w[4 * r + c][2] << 8)
                | w[4 * r + c][3]
                for c in range(4)
            ]
            for r in range(nr + 1)
        ]
        # equivalent-inverse-cipher keys: dk[0]=ek[nr],
        # dk[r]=InvMixColumns(ek[nr-r]), dk[nr]=ek[0] (TD∘SBOX cancels
        # TD's built-in InvSubBytes, leaving pure InvMixColumns)
        td0, td1, td2, td3 = _TD

        def imc(word: int) -> int:
            return (
                td0[_SBOX[(word >> 24) & 255]]
                ^ td1[_SBOX[(word >> 16) & 255]]
                ^ td2[_SBOX[(word >> 8) & 255]]
                ^ td3[_SBOX[word & 255]]
            )

        self.dk = [list(self.ek[nr])]
        for r in range(1, nr):
            self.dk.append([imc(v) for v in self.ek[nr - r]])
        self.dk.append(list(self.ek[0]))

    def encrypt_block(self, block: bytes) -> bytes:
        ek = self.ek
        k = ek[0]
        s0 = int.from_bytes(block[0:4], "big") ^ k[0]
        s1 = int.from_bytes(block[4:8], "big") ^ k[1]
        s2 = int.from_bytes(block[8:12], "big") ^ k[2]
        s3 = int.from_bytes(block[12:16], "big") ^ k[3]
        e0, e1, e2, e3 = _TE
        for r in range(1, self.nr):
            k = ek[r]
            t0 = e0[(s0 >> 24) & 255] ^ e1[(s1 >> 16) & 255] ^ e2[(s2 >> 8) & 255] ^ e3[s3 & 255] ^ k[0]
            t1 = e0[(s1 >> 24) & 255] ^ e1[(s2 >> 16) & 255] ^ e2[(s3 >> 8) & 255] ^ e3[s0 & 255] ^ k[1]
            t2 = e0[(s2 >> 24) & 255] ^ e1[(s3 >> 16) & 255] ^ e2[(s0 >> 8) & 255] ^ e3[s1 & 255] ^ k[2]
            t3 = e0[(s3 >> 24) & 255] ^ e1[(s0 >> 16) & 255] ^ e2[(s1 >> 8) & 255] ^ e3[s2 & 255] ^ k[3]
            s0, s1, s2, s3 = t0, t1, t2, t3
        k = ek[self.nr]
        sb = _SBOX
        o0 = ((sb[(s0 >> 24) & 255] << 24) | (sb[(s1 >> 16) & 255] << 16) | (sb[(s2 >> 8) & 255] << 8) | sb[s3 & 255]) ^ k[0]
        o1 = ((sb[(s1 >> 24) & 255] << 24) | (sb[(s2 >> 16) & 255] << 16) | (sb[(s3 >> 8) & 255] << 8) | sb[s0 & 255]) ^ k[1]
        o2 = ((sb[(s2 >> 24) & 255] << 24) | (sb[(s3 >> 16) & 255] << 16) | (sb[(s0 >> 8) & 255] << 8) | sb[s1 & 255]) ^ k[2]
        o3 = ((sb[(s3 >> 24) & 255] << 24) | (sb[(s0 >> 16) & 255] << 16) | (sb[(s1 >> 8) & 255] << 8) | sb[s2 & 255]) ^ k[3]
        return (
            (o0 & 0xFFFFFFFF).to_bytes(4, "big")
            + (o1 & 0xFFFFFFFF).to_bytes(4, "big")
            + (o2 & 0xFFFFFFFF).to_bytes(4, "big")
            + (o3 & 0xFFFFFFFF).to_bytes(4, "big")
        )

    def decrypt_block(self, block: bytes) -> bytes:
        dk = self.dk
        k = dk[0]
        s0 = int.from_bytes(block[0:4], "big") ^ k[0]
        s1 = int.from_bytes(block[4:8], "big") ^ k[1]
        s2 = int.from_bytes(block[8:12], "big") ^ k[2]
        s3 = int.from_bytes(block[12:16], "big") ^ k[3]
        d0, d1, d2, d3 = _TD
        for r in range(1, self.nr):
            k = dk[r]
            t0 = d0[(s0 >> 24) & 255] ^ d1[(s3 >> 16) & 255] ^ d2[(s2 >> 8) & 255] ^ d3[s1 & 255] ^ k[0]
            t1 = d0[(s1 >> 24) & 255] ^ d1[(s0 >> 16) & 255] ^ d2[(s3 >> 8) & 255] ^ d3[s2 & 255] ^ k[1]
            t2 = d0[(s2 >> 24) & 255] ^ d1[(s1 >> 16) & 255] ^ d2[(s0 >> 8) & 255] ^ d3[s3 & 255] ^ k[2]
            t3 = d0[(s3 >> 24) & 255] ^ d1[(s2 >> 16) & 255] ^ d2[(s1 >> 8) & 255] ^ d3[s0 & 255] ^ k[3]
            s0, s1, s2, s3 = t0, t1, t2, t3
        k = dk[self.nr]
        ib = _INV_SBOX
        o0 = ((ib[(s0 >> 24) & 255] << 24) | (ib[(s3 >> 16) & 255] << 16) | (ib[(s2 >> 8) & 255] << 8) | ib[s1 & 255]) ^ k[0]
        o1 = ((ib[(s1 >> 24) & 255] << 24) | (ib[(s0 >> 16) & 255] << 16) | (ib[(s3 >> 8) & 255] << 8) | ib[s2 & 255]) ^ k[1]
        o2 = ((ib[(s2 >> 24) & 255] << 24) | (ib[(s1 >> 16) & 255] << 16) | (ib[(s0 >> 8) & 255] << 8) | ib[s3 & 255]) ^ k[2]
        o3 = ((ib[(s3 >> 24) & 255] << 24) | (ib[(s2 >> 16) & 255] << 16) | (ib[(s1 >> 8) & 255] << 8) | ib[s0 & 255]) ^ k[3]
        return (
            (o0 & 0xFFFFFFFF).to_bytes(4, "big")
            + (o1 & 0xFFFFFFFF).to_bytes(4, "big")
            + (o2 & 0xFFFFFFFF).to_bytes(4, "big")
            + (o3 & 0xFFFFFFFF).to_bytes(4, "big")
        )


def aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """PDF AES payload: 16-byte IV prefix, CBC, PKCS#5 padding stripped."""
    if len(data) < 32:
        return b""
    aes = AES(key)
    iv = data[:16]
    out = bytearray()
    prev = iv
    body = data[16 : 16 + ((len(data) - 16) // 16) * 16]
    for i in range(0, len(body), 16):
        blk = body[i : i + 16]
        dec = aes.decrypt_block(blk)
        out += bytes(a ^ b for a, b in zip(dec, prev))
        prev = blk
    if out:
        pad = out[-1]
        if 1 <= pad <= 16:
            out = out[:-pad]
    return bytes(out)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Used only by the fixture generator (to author encrypted test PDFs)."""
    aes = AES(key)
    padlen = 16 - (len(data) % 16)
    data = data + bytes([padlen]) * padlen
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        enc = aes.encrypt_block(blk)
        out += enc
        prev = enc
    return bytes(out)


class CryptError(Exception):
    pass


class NeedsPassword(Exception):
    pass


class StdSecurityHandler:
    """pdf_new_crypt / pdf_compute_encryption_key equivalents
    (src/vcl/pdf_crypt.pas:25-253, :351-423)."""

    def __init__(self, encrypt: dict, doc_id: bytes, password: bytes = b""):
        if to_name(encrypt.get("Filter")) != "Standard":
            raise CryptError("unknown security handler")
        self.v = to_int(encrypt.get("V", 0))
        self.r = to_int(encrypt.get("R", 0)) or (2 if self.v <= 1 else 3)
        self.length = to_int(encrypt.get("Length", 40))
        self.p = to_int(encrypt.get("P", 0)) & 0xFFFFFFFF
        self.o = encrypt.get("O", b"") or b""
        self.u = encrypt.get("U", b"") or b""
        self.oe = encrypt.get("OE", b"") or b""
        self.ue = encrypt.get("UE", b"") or b""
        em = encrypt.get("EncryptMetadata", True)
        self.encrypt_metadata = bool(em) if em is not None else True
        self.doc_id = doc_id or b""
        self.stm_method = "rc4"
        self.str_method = "rc4"
        if self.v >= 4:
            cf = encrypt.get("CF") or {}
            stmf = to_name(encrypt.get("StmF", Name("Identity"))) or "Identity"
            strf = to_name(encrypt.get("StrF", Name("Identity"))) or "Identity"
            self.stm_method = self._cf_method(cf, stmf)
            self.str_method = self._cf_method(cf, strf)
            cfm = cf.get(stmf) or {}
            ln = to_int(cfm.get("Length", 0))
            if ln:
                self.length = ln * 8 if ln <= 40 else ln
        self.key = b""
        self._auth(password)

    @staticmethod
    def _cf_method(cf: dict, name: str) -> str:
        if name == "Identity":
            return "identity"
        f = cf.get(name) or {}
        m = to_name(f.get("CFM"))
        if m == "V2":
            return "rc4"
        if m == "AESV2":
            return "aesv2"
        if m == "AESV3":
            return "aesv3"
        if m == "None":
            return "identity"
        return "rc4"

    def _compute_key(self, password: bytes) -> bytes:
        n = max(5, min(self.length // 8, 16))
        h = hashlib.md5()
        h.update((password + PAD)[:32])
        h.update(self.o[:32])
        h.update(struct.pack("<I", self.p))
        h.update(self.doc_id)
        if self.r >= 4 and not self.encrypt_metadata:
            h.update(b"\xff\xff\xff\xff")
        key = h.digest()
        if self.r >= 3:
            for _ in range(50):
                key = hashlib.md5(key[:n]).digest()
        return key[:n]

    def _compute_user_password_r2(self, key: bytes) -> bytes:
        return rc4(key, PAD)

    def _compute_user_password_r34(self, key: bytes) -> bytes:
        h = hashlib.md5()
        h.update(PAD)
        h.update(self.doc_id)
        out = rc4(key, h.digest())
        for i in range(1, 20):
            k2 = bytes(b ^ i for b in key)
            out = rc4(k2, out)
        return out

    def _auth_user(self, password: bytes) -> bool:
        key = self._compute_key(password)
        if self.r == 2:
            ok = self._compute_user_password_r2(key) == self.u[:32]
        elif self.r in (3, 4):
            ok = self._compute_user_password_r34(key) == self.u[:16]
        elif self.r in (5, 6):
            ok = self._auth_user_r56(password)
            return ok
        else:
            ok = False
        if ok:
            self.key = key
        return ok

    def _auth_user_r56(self, password: bytes) -> bool:
        if len(self.u) < 48:
            return False
        vsalt = self.u[32:40]
        ksalt = self.u[40:48]
        if self.r == 5:
            h = hashlib.sha256(password + vsalt).digest()
        else:
            h = self._hash_r6(password, vsalt, b"")
        if h != self.u[:32]:
            return False
        if self.r == 5:
            ik = hashlib.sha256(password + ksalt).digest()
        else:
            ik = self._hash_r6(password, ksalt, b"")
        # decrypt UE with AES-256 CBC, zero IV, no padding
        aes = AES(ik)
        prev = b"\x00" * 16
        out = bytearray()
        for i in range(0, 32, 16):
            blk = self.ue[i : i + 16]
            dec = aes.decrypt_block(blk)
            out += bytes(a ^ b for a, b in zip(dec, prev))
            prev = blk
        self.key = bytes(out)
        return True

    @staticmethod
    def _hash_r6(password: bytes, salt: bytes, udata: bytes) -> bytes:
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
                k = hashlib.sha256(e).digest()
            elif mod == 1:
                k = hashlib.sha384(e).digest()
            else:
                k = hashlib.sha512(e).digest()
            i += 1
            if i >= 64 and e[-1] <= i - 32:
                return k[:32]

    def _auth_owner(self, password: bytes) -> bool:
        """Algorithm 7 (PDF 32000 7.6.3.4): the owner password recovers
        the USER password by decrypting /O, then authenticates as user.
        R5/R6: hash against /O with the owner validation salt + /U as
        extra data, file key from /OE (7.6.4.4.10)."""
        if self.r in (5, 6):
            if len(self.o) < 48 or len(self.u) < 48:
                return False
            vsalt = self.o[32:40]
            ksalt = self.o[40:48]
            udata = self.u[:48]
            if self.r == 5:
                h = hashlib.sha256(password + vsalt + udata).digest()
            else:
                h = self._hash_r6(password, vsalt, udata)
            if h != self.o[:32]:
                return False
            if self.r == 5:
                ik = hashlib.sha256(password + ksalt + udata).digest()
            else:
                ik = self._hash_r6(password, ksalt, udata)
            aes = AES(ik)
            prev = b"\x00" * 16
            out = bytearray()
            for i in range(0, 32, 16):
                blk = self.oe[i : i + 16]
                dec = aes.decrypt_block(blk)
                out += bytes(a ^ b for a, b in zip(dec, prev))
                prev = blk
            self.key = bytes(out)
            return True
        # R2-R4: RC4 key from MD5(ownerpw padded) (+50x for R>=3),
        # /O decrypts to the user password (19 reversed XOR passes R>=3)
        n = max(5, min(self.length // 8, 16))
        h = hashlib.md5((password + PAD)[:32]).digest()
        if self.r >= 3:
            for _ in range(50):
                h = hashlib.md5(h[:n]).digest()
        rc4key = h[:n]
        o = self.o[:32]
        if self.r == 2:
            userpw = rc4(rc4key, o)
        else:
            userpw = o
            for i in range(19, -1, -1):
                k2 = bytes(b ^ i for b in rc4key)
                userpw = rc4(k2, userpw)
        return self._auth_user(userpw)

    def authenticate(self, password: bytes) -> bool:
        """MuPDF pdf_authenticate_password order: try the password as
        the user password, then as the owner password."""
        return self._auth_user(password) or self._auth_owner(password)

    def _auth(self, password: bytes):
        if password and self.authenticate(password):
            return
        if not self._auth_user(b""):
            raise NeedsPassword()

    # --- per-object decryption ---------------------------------------------
    def _object_key(self, num: int, gen: int, aes: bool) -> bytes:
        if self.r >= 5:
            return self.key
        msg = self.key + struct.pack("<i", num)[:3] + struct.pack("<i", gen)[:2]
        if aes:
            msg += b"sAlT"
        n = min(len(self.key) + 5, 16)
        return hashlib.md5(msg).digest()[:n]

    def decrypt_stream(self, data: bytes, num: int, gen: int) -> bytes:
        return self._decrypt(data, num, gen, self.stm_method)

    def decrypt_string(self, data: bytes, num: int, gen: int) -> bytes:
        return self._decrypt(data, num, gen, self.str_method)

    def _decrypt(self, data: bytes, num: int, gen: int, method: str) -> bytes:
        if method == "identity":
            return data
        if method in ("aesv2", "aesv3"):
            key = self._object_key(num, gen, aes=True)
            return aes_cbc_decrypt(key, data)
        key = self._object_key(num, gen, aes=False)
        return rc4(key, data)

    def decrypt_object(self, obj, num: int, gen: int):
        """pdf_crypt_obj: decrypt strings in-place through the object graph."""
        if is_string(obj):
            return self.decrypt_string(obj, num, gen)
        if isinstance(obj, list):
            return [self.decrypt_object(v, num, gen) for v in obj]
        if isinstance(obj, dict):
            return {k: self.decrypt_object(v, num, gen) for k, v in obj.items()}
        return obj
