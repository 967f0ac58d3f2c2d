"""Document model: xref resolution + lazy object graph.

One ``PdfDocument`` per row of the ``documents`` table; it lives only
inside a pandas-UDF batch. The xref is the north-star "per-document
dict-of-offsets": ``self.table[num] = (type, ofs, gen)``, objects parsed
lazily on first access and memoized (reference: pdf_cache_object,
src/vcl/mypdfstream.pas:131-203).

Covered reference behavior:
- version sniff (pdf_load_version, src/vcl/digcommtype.pas:40-60)
- startxref backward scan of the last 1024 bytes (:137-190)
- classic xref tables incl. multi-subsection + broken-line tolerance
  (pdf_read_old_xref, :1588-1719)
- xref streams with W-packed columns and /Index pairs
  (pdf_read_new_xref, :1399-1584) — W columns unpacked with NumPy
- /Prev + hybrid /XRefStm chain, first-seen entry wins
  (pdf_read_xref_sections, :1771-1820)
- offset sanity checks then full-file repair scan on failure
  (pdf_open_xref_with_stream :2282-2413; pdf_repair_xref,
  src/vcl/pdf_repair.pas:221-497)
- object streams (pdf_load_obj_stm, src/vcl/mypdfstream.pas:19-127)
- stream loading through the filter chain with /Length clamp and
  tolerant over-read (pdf_open_filter/fz_read_all, :439-460, :626-701)
- decryption hookup (empty user password only)
"""

from __future__ import annotations

import re

import numpy as np

from . import lexer as lx
from .cos import IndirectRef, Name, is_indirect, to_int, to_name
from .crypt import NeedsPassword, StdSecurityHandler
from .filters import FilterError, apply_filter
from .lexer import Lexer
from .parser import PdfSyntaxError, parse_dict, parse_ind_obj, parse_stm_obj

_obj_re = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


class PdfError(Exception):
    def __init__(self, code: str, msg: str = ""):
        super().__init__(msg or code)
        self.code = code


class PdfDocument:
    def __init__(self, data: bytes, password: bytes | str = b""):
        if isinstance(password, str):
            password = password.encode("utf-8")
        self.password = password
        self.data = data
        self.version = -1
        self.startxref = 0
        self.file_size = len(data)
        self.table: dict[int, tuple[int, int, int]] = {}  # num -> (type,ofs,gen)
        self.size = 0
        self.cache: dict[int, object] = {}
        self.stm_ofs: dict[int, int] = {}
        self.trailer: dict = {}
        self.crypt: StdSecurityHandler | None = None
        self.repaired = False
        self.failures: dict[str, int] = {}
        self.page_refs: list[IndirectRef] = []
        self.page_objs: list[dict] = []
        self._repair_stm_len: dict[int, int] = {}
        self._open()

    # --- failure accounting --------------------------------------------------
    def note_failure(self, code: str):
        self.failures[code] = self.failures.get(code, 0) + 1

    # --- open ----------------------------------------------------------------
    def _open(self):
        try:
            self._load_xref()
            self._sanity_check()
        except Exception:
            self.table.clear()
            self.cache.clear()
            self.trailer = {}
            self._repair_xref()
            self.repaired = True
            self.note_failure("repaired")

        encrypt = self.resolve(self.trailer.get("Encrypt"))
        if isinstance(encrypt, dict):
            doc_id = b""
            idarr = self.resolve(self.trailer.get("ID"))
            if isinstance(idarr, list) and idarr and isinstance(idarr[0], bytes):
                doc_id = idarr[0]
            try:
                self.crypt = StdSecurityHandler(
                    encrypt, doc_id, self.password
                )
            except NeedsPassword:
                raise PdfError("needs_password")

        if self.repaired:
            self._repair_obj_stms_and_trailer()

    def _load_version(self):
        if not self.data.startswith(b"%PDF-"):
            raise PdfError("bad_header", "missing %PDF header")
        try:
            self.version = int(chr(self.data[5])) * 10 + int(chr(self.data[7]))
        except (ValueError, IndexError):
            self.version = -1

    def _read_start_xref(self):
        tail = self.data[max(0, self.file_size - 1024) :]
        i = tail.rfind(b"startxref")
        if i < 0:
            raise PdfError("no_startxref")
        m = re.search(rb"\d+", tail[i + 9 :])
        if not m:
            raise PdfError("no_startxref")
        self.startxref = int(m.group())

    def _load_xref(self):
        self._load_version()
        self._read_start_xref()
        trailer = self._read_xref_at(self.startxref, set())
        self.trailer = trailer
        size = to_int(self.resolve(trailer.get("Size")))
        if not size:
            raise PdfError("trailer_no_size")
        self.size = max(self.size, size)
        # walk already happened inside _read_xref_at via recursion queue

    def _read_xref_at(self, ofs: int, seen: set[int]) -> dict:
        """Read one xref section (classic or stream) and recurse into
        /XRefStm then /Prev. Returns the first (newest) trailer dict."""
        if ofs in seen or len(seen) > 256:
            raise PdfError("xref_loop")
        seen.add(ofs)
        lex = Lexer(self.data, ofs)
        while lx._IS_WS[lex.peek_byte() & 0xFF] and not lex.is_eof():
            lex.read_byte()
        c = lex.peek_byte()
        if c == 0x78:  # 'x'
            trailer = self._read_old_xref(lex)
        elif 0x30 <= c <= 0x39:
            trailer = self._read_new_xref(lex)
        else:
            raise PdfError("bad_xref", f"cannot recognize xref format at {ofs}")
        xrefstm = trailer.get("XRefStm")
        if xrefstm is not None:
            self._read_xref_at(to_int(xrefstm), seen)
        prev = trailer.get("Prev")
        if prev is not None:
            self._read_xref_at(to_int(self.resolve(prev)), seen)
        return trailer

    def _read_old_xref(self, lex: Lexer) -> dict:
        line = lex.read_line()
        if not line.strip().startswith(b"xref"):
            raise PdfError("bad_xref", "cannot find xref marker")
        table = self.table
        while True:
            c = lex.peek_byte()
            while c in (32, 13, 10, 9):
                lex.read_byte()
                c = lex.peek_byte()
            if not (0x30 <= c <= 0x39):
                break
            hdr = lex.read_line()
            parts = hdr.split()
            if len(parts) < 2:
                raise PdfError("bad_xref", "bad subsection header")
            ofs0, cnt = int(parts[0]), int(parts[1])
            if len(parts) > 2:
                # broken pdfs: entries start on the same line; back up
                extra = hdr.split(None, 2)[2]
                lex.seek(lex.tell() - len(extra) - 2)
            for i in range(ofs0, ofs0 + cnt):
                row = lex.read(20)
                if len(row) < 18:
                    raise PdfError("bad_xref", "truncated xref row")
                if i not in table:
                    s = row.lstrip()
                    try:
                        o = int(s[0:10])
                        g = int(s[11:16])
                    except ValueError:
                        raise PdfError("bad_xref", "bad xref row")
                    t = s[17:18]
                    if t not in (b"f", b"n", b"o"):
                        raise PdfError("bad_xref", f"unexpected type {t!r}")
                    table[i] = (t[0], o, g)
        tok, _ = lex.lex()
        if tok != lx.TOK_TRAILER:
            raise PdfError("bad_xref", "expected trailer")
        tok, _ = lex.lex()
        if tok != lx.TOK_OPEN_DICT:
            raise PdfError("bad_xref", "expected trailer dict")
        return parse_dict(lex)

    def _read_new_xref(self, lex: Lexer) -> dict:
        obj, num, gen, stm_ofs = parse_ind_obj(lex)
        if not isinstance(obj, dict):
            raise PdfError("bad_xref", "xref stream is not a dict")
        trailer = obj
        size = to_int(trailer.get("Size"))
        if not size:
            raise PdfError("bad_xref", "xref stream missing Size")
        self.size = max(self.size, size)
        w = trailer.get("W")
        if not isinstance(w, list) or len(w) < 3:
            raise PdfError("bad_xref", "xref stream missing W")
        w0, w1, w2 = (to_int(x) for x in w[:3])
        index = trailer.get("Index")
        raw = self._stream_bytes(trailer, num, gen, stm_ofs, decrypt=False)
        rowlen = w0 + w1 + w2
        if rowlen <= 0:
            raise PdfError("bad_xref", "bad W")
        nrows = len(raw) // rowlen
        arr = np.frombuffer(raw[: nrows * rowlen], dtype=np.uint8).reshape(
            nrows, rowlen
        )

        def col(start, width, default):
            if width == 0:
                return np.full(nrows, default, dtype=np.int64)
            v = np.zeros(nrows, dtype=np.int64)
            for k in range(width):
                v = (v << 8) | arr[:, start + k]
            return v

        types = col(0, w0, 1)
        offs = col(w0, w1, 0)
        gens = col(w0 + w1, w2, 0)
        pairs = []
        if index is None:
            pairs = [(0, size)]
        else:
            idx = [to_int(x) for x in index]
            pairs = [(idx[i], idx[i + 1]) for i in range(0, len(idx) - 1, 2)]
        r = 0
        table = self.table
        for i0, cnt in pairs:
            for i in range(i0, i0 + cnt):
                if r >= nrows:
                    raise PdfError("bad_xref", "truncated xref stream")
                if i not in table:
                    t = int(types[r])
                    ch = (ord("f"), ord("n"), ord("o"))[t] if t in (0, 1, 2) else 0
                    table[i] = (ch, int(offs[r]), int(gens[r]))
                r += 1
        return trailer

    def _sanity_check(self):
        if self.table.get(0, (ord("f"), 0, 0))[0] != ord("f"):
            # tolerated: reference throws then repairs; many real PDFs hit
            # this, so only note it
            pass
        for num, (t, ofs, _gen) in self.table.items():
            if t == ord("n") and not (0 < ofs < self.file_size):
                raise PdfError("bad_offset", f"object {num} offset {ofs}")
            if t == ord("o"):
                container = self.table.get(ofs)
                if container is None or container[0] != ord("n"):
                    raise PdfError("bad_objstm_ref", f"object {num} -> {ofs}")

    # --- repair ----------------------------------------------------------------
    def _repair_xref(self):
        """Full-file scan for ``N G obj`` (pdf_repair_xref,
        src/vcl/pdf_repair.pas:221-497)."""
        data = self.data
        table = self.table
        trailer: dict = {}
        encrypt = idobj = root = info = None
        for m in _obj_re.finditer(data):
            num, gen = int(m.group(1)), int(m.group(2))
            if num <= 0 or num > 1 << 22:
                continue
            # later occurrences overwrite earlier (incremental updates append)
            table[num] = (ord("n"), m.start(), gen)
            # find stream offset/length lazily later
        # scan trailer dicts for Root/Info/Encrypt/ID
        for m in re.finditer(rb"trailer", data):
            lexr = Lexer(data, m.end())
            tok, _ = lexr.lex()
            if tok != lx.TOK_OPEN_DICT:
                continue
            try:
                d = parse_dict(lexr)
            except PdfSyntaxError:
                continue
            encrypt = d.get("Encrypt", encrypt)
            idobj = d.get("ID", idobj)
            root = d.get("Root", root)
            info = d.get("Info", info)
        if root is not None:
            trailer["Root"] = root
        if info is not None:
            trailer["Info"] = info
        if encrypt is not None:
            trailer["Encrypt"] = encrypt
        if idobj is not None:
            trailer["ID"] = idobj
        if not table:
            raise PdfError("repair_failed", "no objects found")
        self.size = max(table) + 1
        trailer["Size"] = self.size
        self.trailer = trailer

    def _repair_obj_stms_and_trailer(self):
        """After repair: expand object streams and recover missing
        Root/Info by scanning live objects (reference:
        pdf_repair_obj_stms + the loop in pdf_open_xref_with_stream)."""
        for num in sorted(self.table):
            t = self.table[num][0]
            if t != ord("n"):
                continue
            try:
                obj = self.load_object(num)
            except Exception:
                continue
            if isinstance(obj, dict) and to_name(obj.get("Type")) == "ObjStm":
                try:
                    self._load_obj_stm(num)
                except Exception:
                    self.note_failure("objstm_repair_failed")
        has_root = "Root" in self.trailer
        has_info = "Info" in self.trailer
        if has_root and has_info:
            return
        for num in sorted(self.table):
            if self.table[num][0] in (0, ord("f")):
                continue
            try:
                obj = self.load_object(num)
            except Exception:
                continue
            if not isinstance(obj, dict):
                continue
            if not has_root and to_name(obj.get("Type")) == "Catalog":
                self.trailer["Root"] = IndirectRef(num, 0)
                has_root = True
            if not has_info and ("Creator" in obj or "Producer" in obj):
                self.trailer["Info"] = IndirectRef(num, 0)
                has_info = True

    # --- object access ---------------------------------------------------------
    def resolve(self, obj):
        """fz_resolve_indirect: follow indirect refs (iteratively)."""
        depth = 0
        while is_indirect(obj) and depth < 32:
            obj = self.load_object(obj.num)
            depth += 1
        return obj

    def load_object(self, num: int):
        if num in self.cache:
            return self.cache[num]
        entry = self.table.get(num)
        if entry is None:
            self.cache[num] = None
            return None
        t, ofs, gen = entry
        if t == ord("f") or t == 0:
            self.cache[num] = None
            return None
        if t == ord("n"):
            lex = Lexer(self.data, ofs)
            try:
                obj, rnum, rgen, stm_ofs = parse_ind_obj(lex)
            except PdfSyntaxError as e:
                raise PdfError("parse_error", str(e))
            if rnum != num:
                raise PdfError("wrong_object", f"found {rnum} wanted {num}")
            if self.crypt is not None:
                obj = self.crypt.decrypt_object(obj, num, gen)
            self.cache[num] = obj
            self.stm_ofs[num] = stm_ofs
            return obj
        if t == ord("o"):
            self._load_obj_stm(ofs)
            obj = self.cache.get(num)
            if num not in self.cache:
                raise PdfError("objstm_missing", f"{num} not in objstm {ofs}")
            return obj
        raise PdfError("bad_xref_entry", f"type {t}")

    def _load_obj_stm(self, num: int):
        """Expand an object stream into the cache
        (pdf_load_obj_stm, src/vcl/mypdfstream.pas:19-127)."""
        objstm = self.load_object(num)
        if not isinstance(objstm, dict):
            raise PdfError("bad_objstm")
        count = to_int(self.resolve(objstm.get("N")))
        first = to_int(self.resolve(objstm.get("First")))
        data = self.load_stream(num)
        lex = Lexer(data)
        heads = []
        for _ in range(count):
            tok, v = lex.lex()
            if tok != lx.TOK_INT:
                raise PdfError("bad_objstm", "expected int")
            onum = v
            tok, v = lex.lex()
            if tok != lx.TOK_INT:
                raise PdfError("bad_objstm", "expected int")
            heads.append((onum, v))
        for onum, oofs in heads:
            sub = Lexer(data, first + oofs)
            try:
                obj = parse_stm_obj(sub)
            except PdfSyntaxError as e:
                raise PdfError("bad_objstm", str(e))
            ent = self.table.get(onum)
            if ent is not None and ent[0] == ord("o") and ent[1] == num:
                self.cache[onum] = obj
            elif self.repaired and onum not in self.cache:
                # repair path: install recovered members
                self.table.setdefault(onum, (ord("o"), num, 0))
                self.cache[onum] = obj

    # --- streams ---------------------------------------------------------------
    def is_stream(self, ref) -> bool:
        if not is_indirect(ref):
            return False
        try:
            self.load_object(ref.num)
        except Exception:
            return False
        return self.stm_ofs.get(ref.num, 0) != 0

    def load_stream(self, num: int, gen: int | None = None) -> bytes:
        """Fully decoded stream contents (pdf_load_stream,
        src/vcl/mypdfstream.pas:658-701). The per-object crypt key uses
        the object's REAL generation from the xref (the reference passes
        the xref gen to pdf_open_crypt); defaulting to 0 would decode
        nonzero-gen streams to garbage under RC4/AESV2 while strings
        (load_object) used the right key."""
        dict_ = self.load_object(num)
        if not isinstance(dict_, dict):
            raise PdfError("not_a_stream", f"{num} 0 R")
        stm_ofs = self.stm_ofs.get(num, 0)
        if not stm_ofs:
            raise PdfError("not_a_stream", f"{num} 0 R")
        if gen is None:
            entry = self.table.get(num)
            gen = entry[2] if entry is not None else 0
        return self._stream_bytes(dict_, num, gen, stm_ofs, decrypt=True)

    def _stream_bytes(
        self, stmdict: dict, num: int, gen: int, stm_ofs: int, decrypt: bool
    ) -> bytes:
        length = to_int(self.resolve(stmdict.get("Length")))
        raw = self.data[stm_ofs : stm_ofs + length] if length > 0 else b""
        if length <= 0 or self._length_looks_wrong(raw, stmdict):
            # reference tolerates wrong /Length by reading-all + endstream scan
            end = self.data.find(b"endstream", stm_ofs)
            if end < 0:
                end = self.file_size
            raw = self.data[stm_ofs:end]
            # strip one trailing EOL
            if raw.endswith(b"\r\n"):
                raw = raw[:-2]
            elif raw.endswith((b"\n", b"\r")):
                raw = raw[:-1]
        if decrypt and self.crypt is not None and not self._has_crypt_filter(stmdict):
            raw = self.crypt.decrypt_stream(raw, num, gen)
        filters = stmdict.get("Filter") or stmdict.get("F")
        parms = stmdict.get("DecodeParms") or stmdict.get("DP")
        if filters is None:
            return raw
        if isinstance(filters, Name):
            filters = [filters]
            parms = [parms]
        elif not isinstance(parms, list):
            parms = [parms] * len(filters)
        out = raw
        for f, p in zip(filters, parms):
            fname = to_name(f)
            if fname == "Crypt":
                continue  # already decrypted above
            rp = self.resolve(p) if p is not None else None
            if fname in ("JBIG2Decode",) and isinstance(rp, dict):
                # the globals stream must be loaded with document context;
                # hand the filter layer raw bytes
                g = rp.get("JBIG2Globals")
                if g is not None and "_globals_bytes" not in rp:
                    rp = dict(rp)
                    try:
                        from .cos import IndirectRef

                        if isinstance(g, IndirectRef):
                            rp["_globals_bytes"] = self.load_stream(g.num)
                    except Exception:
                        rp["_globals_bytes"] = b""
            out = apply_filter(out, fname, rp)
        return out

    @staticmethod
    def _has_crypt_filter(stmdict: dict) -> bool:
        filters = stmdict.get("Filter") or stmdict.get("F")
        if isinstance(filters, Name):
            return to_name(filters) == "Crypt"
        if isinstance(filters, list):
            return any(to_name(f) == "Crypt" for f in filters)
        return False

    @staticmethod
    def _length_looks_wrong(raw: bytes, stmdict: dict) -> bool:
        # cheap check: flate streams must start with a plausible zlib header
        filters = stmdict.get("Filter") or stmdict.get("F")
        names = []
        if isinstance(filters, Name):
            names = [str(filters)]
        elif isinstance(filters, list):
            names = [to_name(f) for f in filters]
        if not raw and (names or stmdict.get("Length")):
            return True
        return False

    # --- convenience -----------------------------------------------------------
    def get(self, d: dict, key: str):
        """dict get + resolve."""
        return self.resolve(d.get(key)) if isinstance(d, dict) else None
