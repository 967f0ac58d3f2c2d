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


def test_type4_unsupported():
    with pytest.raises(FunctionError):
        _load({"FunctionType": 4, "Domain": [0, 1], "Range": [0, 1]})


def test_sampled_16bit_unpack():
    from delphi_pdf_parser_spark.pdfcore.functions import _unpack_samples

    data = (0).to_bytes(2, "big") + (65535).to_bytes(2, "big") + (32768).to_bytes(2, "big")
    v = _unpack_samples(data, 3, 16)
    assert np.allclose(v, [0.0, 1.0, 32768 / 65535.0])
