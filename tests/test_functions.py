"""PDF function eval (types 0/2/3) — the tint-transform machinery for
Separation/DeviceN colorspaces (reference: pdf_functionss.pas)."""

from __future__ import annotations

import numpy as np
import pytest

from delphi_pdf_parser_spark.pdfcore.functions import (
    FunctionError,
    eval_function,
)


class _FakeDoc:
    def resolve(self, x):
        return x

    def get(self, d, k):
        return d.get(k)


def _load(obj):
    from delphi_pdf_parser_spark.pdfcore.functions import load_function

    return load_function(_FakeDoc(), obj)


def test_type2_exponential():
    from delphi_pdf_parser_spark.pdfcore.cos import Name  # noqa: F401

    fn = _load(
        {"FunctionType": 2, "Domain": [0, 1], "N": 2,
         "C0": [0.0, 1.0], "C1": [1.0, 0.0]}
    )
    out = eval_function(fn, np.array([[0.0], [0.5], [1.0]]))
    assert np.allclose(out, [[0.0, 1.0], [0.25, 0.75], [1.0, 0.0]])
    # domain clipping
    out = eval_function(fn, np.array([[2.0]]))
    assert np.allclose(out, [[1.0, 0.0]])


def test_type3_stitching():
    halves = [
        {"FunctionType": 2, "Domain": [0, 1], "N": 1, "C0": [0.0], "C1": [0.5]},
        {"FunctionType": 2, "Domain": [0, 1], "N": 1, "C0": [0.5], "C1": [1.0]},
    ]
    fn = _load(
        {"FunctionType": 3, "Domain": [0, 1], "Functions": halves,
         "Bounds": [0.5], "Encode": [0, 1, 0, 1]}
    )
    out = eval_function(fn, np.array([[0.0], [0.25], [0.5], [0.75], [1.0]]))
    assert np.allclose(out[:, 0], [0.0, 0.25, 0.5, 0.75, 1.0])


def test_type4_must_be_stream():
    # a type-4 function carried as a bare dict (no stream payload)
    with pytest.raises(FunctionError):
        _load({"FunctionType": 4, "Domain": [0, 1], "Range": [0, 1]})


def _ps(src: str, *inputs):
    from delphi_pdf_parser_spark.pdfcore.functions import _ps_exec, _ps_parse

    stack = [
        np.asarray(i, dtype=np.float64) if isinstance(i, (list, tuple)) else i
        for i in inputs
    ]
    _ps_exec(_ps_parse(src.encode()), stack)
    return stack


def test_type4_arithmetic_semantics():
    """PLRM corners: truncating idiv/mod, degree trig, 0..360 atan,
    ties-to-greater round, signed exp."""
    assert _ps("{ 7 2 idiv }")[-1] == 3
    assert _ps("{ -7 2 idiv }")[-1] == -3
    assert _ps("{ -7 2 mod }")[-1] == -1
    assert _ps("{ 90 sin }")[-1] == 1.0
    assert abs(_ps("{ 0 -1 atan }")[-1] - 180.0) < 1e-9
    assert _ps("{ -1.5 round }")[-1] == -1.0
    assert _ps("{ 1.5 round }")[-1] == 2.0
    assert _ps("{ 2 10 exp }")[-1] == 1024
    assert _ps("{ 12 5 and }")[-1] == 4
    assert _ps("{ 1 3 bitshift }")[-1] == 8


def test_type4_stack_ops():
    assert _ps("{ 1 2 3 2 copy }") == [1, 2, 3, 2, 3]
    assert _ps("{ 1 2 3 3 1 roll }") == [3, 1, 2]
    assert _ps("{ 1 2 3 2 index }") == [1, 2, 3, 1]
    assert _ps("{ 1 2 exch pop }") == [2]


def test_type4_vectorized_conditionals():
    """if/ifelse run both branches on stack copies and np.where-merge
    per-lane — one batch pass serves all samples."""
    s = _ps("{ dup 0.5 lt { 2 mul } { 3 mul } ifelse }", [0.2, 0.8])
    assert np.allclose(s[-1], [0.4, 2.4])
    s = _ps("{ dup 0.5 lt { pop 0.5 } if }", [0.2, 0.8])
    assert np.allclose(s[-1], [0.5, 0.8])
    with pytest.raises(FunctionError):
        _ps("{ dup 0.5 lt { 1 2 } { 3 } ifelse }", [0.2, 0.8])  # depths differ


def test_type4_eval_function():
    from delphi_pdf_parser_spark.pdfcore.functions import _eval_ps, _ps_parse

    fn = {
        "type": 4, "domain": [0, 1], "range": [0, 1] * 4, "n": 4,
        "prog": _ps_parse(
            b"{ dup 0.8 mul exch dup dup 0.5 lt "
            b"{ 0.2 mul } { 0.3 mul } ifelse exch dup 0 mul exch 0.1 mul }"
        ),
    }
    out = _eval_ps(fn, np.asarray([[0.0], [0.25], [1.0]]))
    assert np.allclose(
        out,
        [[0, 0, 0, 0], [0.2, 0.05, 0, 0.025], [0.8, 0.3, 0, 0.1]],
    )


def test_sampled_16bit_unpack():
    from delphi_pdf_parser_spark.pdfcore.functions import _unpack_samples

    data = (0).to_bytes(2, "big") + (65535).to_bytes(2, "big") + (32768).to_bytes(2, "big")
    v = _unpack_samples(data, 3, 16)
    assert np.allclose(v, [0.0, 1.0, 32768 / 65535.0])
