"""Unit tests for the capped unigram LM (VERDICT r3 #2): the broadcast
model is bounded at top_v tokens; rarer tokens score as unseen."""

from __future__ import annotations

import math

import pytest


def test_unigram_topv_cap_scores_oov_as_unseen(spark):
    from delphi_pdf_parser_spark.operators.textstats import unigram_logprob

    # corpus: "a" x 6, "b" x 2, "rare" x 1  (total=9, vsize=3)
    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "a a a b"), (3, "rare")],
        "doc_id long, text string",
    )
    k = 0.5
    total, vsize = 9, 3
    # top_v=1 keeps only "a"; "b" and "rare" take the unseen floor
    out = {
        r["doc_id"]: r["mean_logprob"]
        for r in unigram_logprob(docs, k=k, top_v=1).collect()
    }
    lp_a = math.log10((6 + k) / (total + k * vsize))
    lp_oov = math.log10(k / (total + k * vsize))
    assert out[3] == pytest.approx(round(lp_oov, 4), abs=1e-4)
    assert out[1] == pytest.approx(
        round((3 * lp_a + lp_oov) / 4, 4), abs=1e-4
    )


def test_unigram_uncapped_equals_capped_when_vocab_fits(spark):
    from delphi_pdf_parser_spark.operators.textstats import unigram_logprob

    docs = spark.createDataFrame(
        [(1, "x y z"), (2, "x x q")], "doc_id long, text string"
    )
    a = sorted(unigram_logprob(docs, top_v=100_000).collect())
    b = sorted(unigram_logprob(docs, top_v=4).collect())
    assert a == b
