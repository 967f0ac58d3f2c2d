"""The BASELINE correctness gate: SHA-256 of extracted text per url.

Per BASELINE.json: `python -m pytest -x -q` compares sha256(extract(url))
against the golden fixtures for every case in FIXTURES.md.
"""

from __future__ import annotations

import hashlib

import pytest

from delphi_pdf_parser_spark.fixtures import generate_fixtures
from delphi_pdf_parser_spark.pdfcore import extract_text

FIXTURES = generate_fixtures()


@pytest.mark.parametrize("case_id", sorted(FIXTURES))
def test_golden_sha256(case_id):
    fx = FIXTURES[case_id]
    res = extract_text(fx["pdf"])
    if fx["golden"] is None:
        assert res.status == "failed", f"{case_id}: expected failure, got {res.status}"
        assert "needs_password" in res.failures or res.error == "needs_password"
        return
    assert res.status in ("ok", "repaired"), f"{case_id}: {res.status} {res.error}"
    got = hashlib.sha256(res.text.encode("utf-8")).hexdigest()
    want = hashlib.sha256(fx["golden"].encode("utf-8")).hexdigest()
    assert got == want, (
        f"{case_id}: text mismatch\n got: {res.text!r}\nwant: {fx['golden']!r}"
    )
    assert res.npages == fx["npages"], f"{case_id}: npages {res.npages}"


def test_repaired_status():
    res = extract_text(FIXTURES["repair_truncated"]["pdf"])
    assert res.status == "repaired"


def test_metadata_utf16():
    res = extract_text(FIXTURES["info_utf16"]["pdf"])
    assert res.metadata.get("Title") == "Tïtle ✓"
    assert res.metadata.get("Producer") == "pyspark-pdf"


def test_metadata_pdfdoc():
    res = extract_text(FIXTURES["info_pdfdoc"]["pdf"])
    assert res.metadata.get("Title") == "Proﬁle"
    assert res.metadata.get("Creator") == "fixture-gen"


def test_system_cmap_failure_code():
    res = extract_text(FIXTURES["type0_unknown_cmap"]["pdf"])
    assert any(k.startswith("system_cmap:") for k in res.failures), res.failures


def test_cjk_system_cmap_positive():
    res = extract_text(FIXTURES["type0_system_cmap"]["pdf"])
    assert res.text == "system cmap\r\n", (res.text, res.failures)
