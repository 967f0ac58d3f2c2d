"""PDF functions (types 0 sampled / 2 exponential / 3 stitching /
4 PostScript calculator), vectorized over NumPy sample batches.

Reference: pdf_load_function / pdf_eval_function dispatch in
src/vcl/pdf_functionss.pas (SAMPLE eval :~load_sample/eval_sample,
EXPONENTIAL, STITCHING, and the type-4 calculator ps_run :210-682 —
here the program parses once into nested op lists and evaluates
vectorized: every stack slot is a scalar or (k,) array, and if/ifelse
run both branches on stack copies and np.where-merge the slots).

These exist for colorspace tint transforms (Separation / DeviceN →
alternate space, res_colorspace.pas' separation_to_rgb calls
pdf_eval_function per color) — the text path never evaluates functions
(SURVEY A44), so this module is only reached from the image sink.

Eval is batched: `eval_function(fn, x)` takes x of shape (k, m) and
returns (k, n) — one NumPy pass per 256-entry Separation lookup or per
image's worth of DeviceN samples, never per-pixel Python.
"""

from __future__ import annotations

import numpy as np

from .cos import to_int, to_real


class FunctionError(Exception):
    """Unsupported or malformed PDF function (e.g. type 4)."""


def _float_list(doc, v) -> list[float]:
    v = doc.resolve(v)
    if not isinstance(v, list):
        return []
    return [to_real(doc.resolve(x)) for x in v]


def load_function(doc, obj):
    """Parse a function dict/stream into an eval-ready dict."""
    ref = obj
    obj = doc.resolve(obj)
    if not isinstance(obj, dict):
        raise FunctionError("function is not a dict")
    ftype = to_int(doc.get(obj, "FunctionType"))
    domain = _float_list(doc, obj.get("Domain"))
    rng = _float_list(doc, obj.get("Range"))
    if ftype == 2:
        c0 = _float_list(doc, obj.get("C0")) or [0.0]
        c1 = _float_list(doc, obj.get("C1")) or [1.0]
        nv = doc.resolve(obj.get("N"))
        if not isinstance(nv, (int, float)) or isinstance(nv, bool):
            raise FunctionError("type 2 missing /N")
        n = float(nv)
        return {
            "type": 2,
            "domain": domain or [0.0, 1.0],
            "range": rng,
            "c0": np.asarray(c0, dtype=np.float64),
            "c1": np.asarray(c1, dtype=np.float64),
            "n": n,
        }
    if ftype == 3:
        funcs = doc.resolve(obj.get("Functions"))
        if not isinstance(funcs, list):
            raise FunctionError("type 3 missing /Functions")
        subs = [load_function(doc, f) for f in funcs]
        bounds = _float_list(doc, obj.get("Bounds"))
        encode = _float_list(doc, obj.get("Encode"))
        if len(encode) != 2 * len(subs):
            encode = [0.0, 1.0] * len(subs)
        return {
            "type": 3,
            "domain": domain or [0.0, 1.0],
            "range": rng,
            "funcs": subs,
            "bounds": bounds,
            "encode": encode,
        }
    if ftype == 0:
        # sampled: needs the stream payload
        from .cos import IndirectRef

        if not isinstance(ref, IndirectRef):
            raise FunctionError("type 0 function must be a stream")
        data = doc.load_stream(ref.num)
        size = [to_int(doc.resolve(s)) for s in doc.resolve(obj.get("Size")) or []]
        bps = to_int(doc.get(obj, "BitsPerSample"))
        if not size or bps not in (1, 2, 4, 8, 16, 24, 32):
            raise FunctionError("type 0 bad /Size or /BitsPerSample")
        m = len(size)
        if len(domain) != 2 * m or not rng:
            raise FunctionError("type 0 bad /Domain or missing /Range")
        n = len(rng) // 2
        encode = _float_list(doc, obj.get("Encode"))
        if len(encode) != 2 * m:
            encode = []
            for s in size:
                encode += [0.0, float(s - 1)]
        decode = _float_list(doc, obj.get("Decode")) or list(rng)
        total = 1
        for s in size:
            total *= s
        nbits = total * n * bps
        if len(data) * 8 < nbits:
            raise FunctionError("type 0 sample stream too short")
        samples = _unpack_samples(data, total * n, bps)
        return {
            "type": 0,
            "domain": domain,
            "range": rng,
            "size": size,
            "bps": bps,
            "encode": encode,
            "decode": decode,
            "samples": samples,  # float64 in [0, 1], length total*n
            "n": n,
        }
    if ftype == 4:
        from .cos import IndirectRef

        if not isinstance(ref, IndirectRef):
            raise FunctionError("type 4 function must be a stream")
        data = doc.load_stream(ref.num)
        if not rng:
            raise FunctionError("type 4 missing /Range")
        return {
            "type": 4,
            "domain": domain or [0.0, 1.0],
            "range": rng,
            "prog": _ps_parse(data),
            "n": len(rng) // 2,
        }
    raise FunctionError(f"unsupported FunctionType {ftype}")


# --- type 4: PostScript calculator (ps_run, pdf_functionss.pas:210-682) -------
#
# The program is parsed once into nested op lists; evaluation is
# vectorized — every stack slot is a scalar or a (k,) array, and
# if/ifelse run BOTH branches on stack copies and merge the slots with
# np.where on the (k,) condition, so one batch pass serves all samples.

_PS_TOKEN_END = frozenset(b"{}% \t\r\n\x00\x0c")


def _ps_parse(data: bytes) -> list:
    """-> nested list program (numbers and operator-name strings)."""
    pos = 0
    n = len(data)

    def block() -> list:
        nonlocal pos
        out: list = []
        while pos < n:
            c = data[pos]
            if c in b" \t\r\n\x00\x0c":
                pos += 1
                continue
            if c == 0x25:  # % comment
                while pos < n and data[pos] not in b"\r\n":
                    pos += 1
                continue
            if c == 0x7B:  # {
                pos += 1
                out.append(block())
                continue
            if c == 0x7D:  # }
                pos += 1
                return out
            start = pos
            while pos < n and data[pos] not in _PS_TOKEN_END:
                pos += 1
            tok = data[start:pos].decode("latin-1")
            try:
                out.append(int(tok))
            except ValueError:
                try:
                    out.append(float(tok))
                except ValueError:
                    out.append(tok)
        return out

    top = block()
    # the whole program is one braced block
    if len(top) == 1 and isinstance(top[0], list):
        return top[0]
    return top


def _ps_truth(v):
    return np.asarray(v, dtype=bool)


def _ps_int(v):
    return np.trunc(np.asarray(v, dtype=np.float64)).astype(np.int64)


def _ps_is_bool(v):
    return isinstance(v, (bool, np.bool_)) or (
        isinstance(v, np.ndarray) and v.dtype == bool
    )


def _ps_exec(prog: list, stack: list, depth: int = 0) -> None:
    if depth > 100:
        raise FunctionError("ps: recursion too deep")

    def pop():
        if not stack:
            raise FunctionError("ps: stack underflow")
        return stack.pop()

    def pop_n():
        v = pop()
        if isinstance(v, list):
            raise FunctionError("ps: procedure where number expected")
        return v

    i = 0
    n = len(prog)
    while i < n:
        tok = prog[i]
        i += 1
        if isinstance(tok, (int, float)):
            stack.append(tok)
            continue
        if isinstance(tok, list):
            stack.append(tok)  # procedure literal (consumed by if/ifelse)
            continue
        op = tok
        if op == "if" or op == "ifelse":
            if op == "ifelse":
                proc2 = pop()
                proc1 = pop()
                if not isinstance(proc1, list) or not isinstance(proc2, list):
                    raise FunctionError("ps: ifelse needs two procedures")
            else:
                proc1 = pop()
                proc2 = None
                if not isinstance(proc1, list):
                    raise FunctionError("ps: if needs a procedure")
            cond = pop_n()
            then_stack = list(stack)
            _ps_exec(proc1, then_stack, depth + 1)
            else_stack = list(stack)
            if proc2 is not None:
                _ps_exec(proc2, else_stack, depth + 1)
            if np.ndim(cond) == 0:
                stack[:] = then_stack if bool(cond) else else_stack
                continue
            if len(then_stack) != len(else_stack):
                raise FunctionError("ps: branch stack depths differ")
            cond = _ps_truth(cond)
            merged = []
            for a, b in zip(then_stack, else_stack):
                if a is b:
                    merged.append(a)
                elif isinstance(a, list) or isinstance(b, list):
                    raise FunctionError("ps: branch left a procedure")
                else:
                    merged.append(np.where(cond, a, b))
            stack[:] = merged
            continue
        if op in ("true", "false"):
            stack.append(op == "true")
            continue
        if op == "pop":
            pop()
            continue
        if op == "exch":
            b, a = pop(), pop()
            stack += [b, a]
            continue
        if op == "dup":
            a = pop()
            stack += [a, a]
            continue
        if op == "copy":
            cnt = pop_n()
            cnt = int(cnt) if np.ndim(cnt) == 0 else None
            if cnt is None or cnt < 0 or cnt > len(stack):
                raise FunctionError("ps: bad copy count")
            stack += stack[len(stack) - cnt :] if cnt else []
            continue
        if op == "index":
            k = pop_n()
            k = int(k) if np.ndim(k) == 0 else None
            if k is None or k < 0 or k >= len(stack):
                raise FunctionError("ps: bad index")
            stack.append(stack[len(stack) - 1 - k])
            continue
        if op == "roll":
            j = pop_n()
            cnt = pop_n()
            if np.ndim(j) != 0 or np.ndim(cnt) != 0:
                raise FunctionError("ps: vector roll")
            cnt, j = int(cnt), int(j)
            if cnt < 0 or cnt > len(stack):
                raise FunctionError("ps: bad roll count")
            if cnt:
                j %= cnt
                tail = stack[len(stack) - cnt :]
                stack[len(stack) - cnt :] = tail[-j:] + tail[:-j] if j else tail
            continue
        # unary
        if op in ("neg", "abs", "sqrt", "sin", "cos", "ln", "log",
                  "floor", "ceiling", "round", "truncate", "cvi", "cvr",
                  "not"):
            a = pop_n()
            if op == "not":
                if _ps_is_bool(a):
                    stack.append(np.logical_not(a))
                else:
                    stack.append(~_ps_int(a))
                continue
            af = np.asarray(a, dtype=np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                if op == "neg":
                    r = -af
                elif op == "abs":
                    r = np.abs(af)
                elif op == "sqrt":
                    r = np.sqrt(np.maximum(af, 0.0))
                elif op == "sin":
                    r = np.sin(np.deg2rad(af))
                elif op == "cos":
                    r = np.cos(np.deg2rad(af))
                elif op == "ln":
                    r = np.log(np.maximum(af, 1e-300))
                elif op == "log":
                    r = np.log10(np.maximum(af, 1e-300))
                elif op == "floor":
                    r = np.floor(af)
                elif op == "ceiling":
                    r = np.ceil(af)
                elif op == "round":
                    # PLRM: ties go to the greater value
                    r = np.floor(af + 0.5)
                elif op == "truncate":
                    r = np.trunc(af)
                elif op == "cvi":
                    r = _ps_int(af)
                else:  # cvr
                    r = af
            stack.append(r if np.ndim(r) else r.item() if hasattr(r, "item") else r)
            continue
        # binary
        if op in ("add", "sub", "mul", "div", "idiv", "mod", "exp",
                  "atan", "and", "or", "xor", "bitshift",
                  "eq", "ne", "gt", "ge", "lt", "le"):
            b = pop_n()
            a = pop_n()
            if op in ("and", "or", "xor"):
                if _ps_is_bool(a) and _ps_is_bool(b):
                    fn_ = {"and": np.logical_and, "or": np.logical_or,
                           "xor": np.logical_xor}[op]
                    stack.append(fn_(a, b))
                else:
                    ia, ib = _ps_int(a), _ps_int(b)
                    stack.append(
                        ia & ib if op == "and"
                        else ia | ib if op == "or" else ia ^ ib
                    )
                continue
            af = np.asarray(a, dtype=np.float64)
            bf = np.asarray(b, dtype=np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                if op == "add":
                    r = af + bf
                elif op == "sub":
                    r = af - bf
                elif op == "mul":
                    r = af * bf
                elif op == "div":
                    r = np.where(bf != 0, af / np.where(bf == 0, 1, bf), 0.0)
                elif op == "idiv":
                    q = np.where(bf != 0, af / np.where(bf == 0, 1, bf), 0.0)
                    r = np.trunc(q).astype(np.int64)
                elif op == "mod":
                    ia, ib = _ps_int(a), _ps_int(b)
                    safe = np.where(ib == 0, 1, ib)
                    # PLRM: remainder of truncating division (sign of a)
                    r = np.where(ib != 0, ia - np.trunc(ia / safe).astype(np.int64) * safe, 0)
                elif op == "exp":
                    r = np.power(np.abs(af), bf) * np.where(
                        (af < 0) & (np.mod(bf, 2) == 1), -1.0, 1.0
                    )
                elif op == "atan":
                    r = np.rad2deg(np.arctan2(af, bf))
                    r = np.where(r < 0, r + 360.0, r)
                elif op == "bitshift":
                    ia, ib = _ps_int(a), _ps_int(b)
                    ib = np.clip(ib, -63, 63)
                    r = np.where(ib >= 0, ia << np.abs(ib), ia >> np.abs(ib))
                elif op == "eq":
                    r = af == bf
                elif op == "ne":
                    r = af != bf
                elif op == "gt":
                    r = af > bf
                elif op == "ge":
                    r = af >= bf
                elif op == "lt":
                    r = af < bf
                else:
                    r = af <= bf
            stack.append(r)
            continue
        raise FunctionError(f"ps: unknown operator {op!r}")


def _eval_ps(fn: dict, x: np.ndarray) -> np.ndarray:
    k, m = x.shape
    stack: list = [x[:, i] for i in range(m)]
    _ps_exec(fn["prog"], stack)
    n = fn["n"]
    if len(stack) < n:
        raise FunctionError("ps: too few results on stack")
    out = np.zeros((k, n))
    for j in range(n):
        v = stack[len(stack) - n + j]
        if isinstance(v, list):
            raise FunctionError("ps: procedure left on stack")
        out[:, j] = np.asarray(v, dtype=np.float64)
    return out


def _unpack_samples(data: bytes, count: int, bps: int) -> np.ndarray:
    """Big-endian bit-packed samples -> float64 scaled to [0, 1]."""
    if bps == 8:
        v = np.frombuffer(data[:count], dtype=np.uint8).astype(np.float64)
        return v / 255.0
    if bps == 16:
        v = np.frombuffer(data[: 2 * count], dtype=">u2").astype(np.float64)
        return v / 65535.0
    if bps == 32:
        v = np.frombuffer(data[: 4 * count], dtype=">u4").astype(np.float64)
        return v / 4294967295.0
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
    if bps == 1:
        return bits[:count].astype(np.float64)
    if bps in (2, 4):
        per = bps
        usable = (len(bits) // per) * per
        grouped = bits[:usable].reshape(-1, per)
        weights = 1 << np.arange(per - 1, -1, -1)
        vals = (grouped * weights).sum(axis=1)[:count]
        return vals.astype(np.float64) / ((1 << bps) - 1)
    if bps == 24:
        b = np.frombuffer(data[: 3 * count], dtype=np.uint8).reshape(-1, 3)
        v = (
            b[:, 0].astype(np.float64) * 65536
            + b[:, 1].astype(np.float64) * 256
            + b[:, 2].astype(np.float64)
        )
        return v / 16777215.0
    raise FunctionError(f"bps {bps}")


def _interp(x, lo_in, hi_in, lo_out, hi_out):
    span = hi_in - lo_in
    t = np.where(span != 0, (x - lo_in) / np.where(span == 0, 1, span), 0.0)
    return lo_out + t * (hi_out - lo_out)


def eval_function(fn: dict, x: np.ndarray) -> np.ndarray:
    """x: (k, m) inputs -> (k, n) outputs, domain/range-clipped like the
    reference's pdf_eval_function."""
    # copy=True: the domain clip below writes into x, and np.asarray
    # would alias a caller-owned float64 2-D array (ADVICE r3)
    x = np.atleast_2d(np.array(x, dtype=np.float64, copy=True))
    dom = fn["domain"]
    m = x.shape[1]
    for i in range(min(m, len(dom) // 2)):
        x[:, i] = np.clip(x[:, i], dom[2 * i], dom[2 * i + 1])
    if fn["type"] == 2:
        t = x[:, 0:1] ** fn["n"]
        out = fn["c0"][None, :] + t * (fn["c1"] - fn["c0"])[None, :]
    elif fn["type"] == 3:
        out = _eval_stitching(fn, x)
    elif fn["type"] == 4:
        out = _eval_ps(fn, x)
    else:
        out = _eval_sampled(fn, x)
    rng = fn.get("range")
    if rng:
        for j in range(out.shape[1]):
            if 2 * j + 1 < len(rng):
                out[:, j] = np.clip(out[:, j], rng[2 * j], rng[2 * j + 1])
    return out


def _eval_stitching(fn: dict, x: np.ndarray) -> np.ndarray:
    d0, d1 = fn["domain"][0], fn["domain"][1]
    bounds = fn["bounds"]
    subs = fn["funcs"]
    k = len(subs)
    xs = x[:, 0]
    # subfunction index per input
    edges = np.asarray([d0] + list(bounds) + [d1])
    idx = np.clip(np.searchsorted(edges[1:-1], xs, side="right"), 0, k - 1)
    # probe output width with the first subfunction
    probe = eval_function(subs[0], np.asarray([[d0]]))
    out = np.zeros((len(xs), probe.shape[1]))
    for i in range(k):
        sel = idx == i
        if not sel.any():
            continue
        lo, hi = edges[i], edges[i + 1]
        e0, e1 = fn["encode"][2 * i], fn["encode"][2 * i + 1]
        sub_x = _interp(xs[sel], lo, hi, e0, e1)
        out[sel] = eval_function(subs[i], sub_x[:, None])
    return out


def _eval_sampled(fn: dict, x: np.ndarray) -> np.ndarray:
    """Multilinear interpolation over the sample lattice (the reference
    interpolates linearly for m==1 and multilinearly via corner blending
    for higher m; here: full multilinear for any m, vectorized)."""
    size = fn["size"]
    m = len(size)
    n = fn["n"]
    dom, enc, dec = fn["domain"], fn["encode"], fn["decode"]
    k = x.shape[0]
    # encode inputs to lattice coordinates
    coords = np.zeros((k, m))
    for i in range(m):
        e = _interp(x[:, i], dom[2 * i], dom[2 * i + 1], enc[2 * i], enc[2 * i + 1])
        coords[:, i] = np.clip(e, 0, size[i] - 1)
    lo = np.floor(coords).astype(np.int64)
    for i in range(m):
        lo[:, i] = np.minimum(lo[:, i], max(size[i] - 2, 0))
    frac = coords - lo
    # strides in samples (first input varies fastest, per PDF spec)
    strides = np.ones(m, dtype=np.int64)
    for i in range(1, m):
        strides[i] = strides[i - 1] * size[i - 1]
    samples = fn["samples"]
    out = np.zeros((k, n))
    for corner in range(1 << m):
        wt = np.ones(k)
        idx = np.zeros(k, dtype=np.int64)
        for i in range(m):
            bit = (corner >> i) & 1
            ci = lo[:, i] + bit
            ci = np.minimum(ci, size[i] - 1)
            idx += ci * strides[i]
            wt = wt * (frac[:, i] if bit else (1.0 - frac[:, i]))
        base = idx * n
        for j in range(n):
            out[:, j] += wt * samples[base + j]
    # decode outputs from [0,1] to Decode range
    for j in range(n):
        out[:, j] = dec[2 * j] + out[:, j] * (dec[2 * j + 1] - dec[2 * j])
    return out
