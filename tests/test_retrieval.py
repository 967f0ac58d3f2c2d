"""Okapi BM25 retrieval: exact truth vs a pure-Python reference."""

from __future__ import annotations

import math

import pytest

from delphi_pdf_parser_spark.operators.retrieval import bm25_topk


DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog chased the cat"),
    (3, "mat weaving is an ancient craft"),
    (4, "completely unrelated text about spark"),
]
QUERIES = [(0, "cat mat"), (1, "spark"), (2, "nothing matches zz")]


def _ref_bm25(docs, queries, k1=1.2, b=0.75):
    toks = {d: t.lower().split() for d, t in docs}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for qid, qt in queries:
        scores = {}
        for term in dict.fromkeys(qt.lower().split()):
            dfreq = sum(1 for t in toks.values() if term in t)
            if dfreq == 0:
                continue
            idf = math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))
            for d, t in toks.items():
                tf = t.count(term)
                if tf == 0:
                    continue
                denom = tf + k1 * (1 - b + b * len(t) / avgdl)
                scores[d] = scores.get(d, 0.0) + idf * tf * (k1 + 1) / denom
        out[qid] = sorted(
            ((round(s, 6), d) for d, s in scores.items()),
            key=lambda x: (-x[0], x[1]),
        )
    return out


def test_bm25_matches_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(QUERIES, "query_id long, text string")
    got = {}
    for r in bm25_topk(docs, qs, k=10).collect():
        got.setdefault(r.query_id, []).append((r.rk, r.doc_id, r.score))
    want = _ref_bm25(DOCS, QUERIES)
    assert 2 not in got  # no term matches -> no rows
    for qid in (0, 1):
        rows = sorted(got[qid])
        assert len(rows) == len(want[qid])
        for (rk, d, s), (ws, wd) in zip(rows, want[qid]):
            assert d == wd
            assert s == pytest.approx(ws, abs=2e-6)
    # doc 1 has cat+mat (mat is rarer): it must beat doc 2 (cat only)
    assert got[0][0][1] == 1


def test_bm25_topk_cap(spark):
    docs = spark.createDataFrame(
        [(i, "common word") for i in range(30)], "doc_id long, text string"
    )
    qs = spark.createDataFrame([(0, "common")], "query_id long, text string")
    rows = bm25_topk(docs, qs, k=5).collect()
    assert len(rows) == 5
    assert [r.doc_id for r in sorted(rows, key=lambda r: r.rk)] == [0, 1, 2, 3, 4]


def test_inverted_index_bounds_and_truncation(spark):
    from delphi_pdf_parser_spark.operators.retrieval import (
        build_inverted_index,
    )

    rows = [(i, "common rare" if i < 3 else "common") for i in range(10)]
    rows[5] = (5, "common common solo")
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = {
        r.tok: r
        for r in build_inverted_index(
            docs, min_df=2, max_df_frac=0.5, max_postings=2
        ).collect()
    }
    # 'common' df=10 > 0.5*10: stopword-dropped; 'solo' df=1 < 2: dropped
    assert set(idx) == {"rare"}
    r = idx["rare"]
    assert (r.df, r.n_stored, r.postings) == (3, 2, "0:1,1:1")
