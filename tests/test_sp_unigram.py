"""Unigram-LM tokenizer: Viterbi exactness, training coverage, encode."""

from __future__ import annotations

import itertools
import math

from delphi_pdf_parser_spark.operators.sp_unigram import (
    _viterbi,
    unigram_encode,
    unigram_train,
)


def _brute_force(word, logp, max_len=8):
    floor = min(logp.values()) - 10.0
    best = None
    n = len(word)
    for cuts in itertools.product([0, 1], repeat=n - 1):
        pos = [0] + [i + 1 for i, c in enumerate(cuts) if c] + [n]
        pieces = [word[a:b] for a, b in zip(pos, pos[1:])]
        if any(len(p) > max_len for p in pieces):
            continue
        score = 0.0
        ok = True
        for p in pieces:
            if p in logp:
                score += logp[p]
            elif len(p) == 1:
                score += floor
            else:
                ok = False
                break
        if ok and (best is None or score > best):
            best = score
    return best


def test_viterbi_matches_brute_force():
    logp = {
        "a": math.log(0.3), "b": math.log(0.2), "c": math.log(0.1),
        "ab": math.log(0.25), "bc": math.log(0.05), "abc": math.log(0.1),
    }
    for word in ["abc", "abcabc", "aabbcc", "cab", "abcz", "zzz", "a"]:
        pieces, score = _viterbi(word, logp)
        assert "".join(pieces) == word  # lossless
        assert score == _brute_force(word, logp)


def test_viterbi_tie_prefers_longer_piece():
    # p(ab) == p(a)*p(b): tie — the longer piece must win deterministically
    logp = {"a": math.log(0.5), "b": math.log(0.5), "ab": math.log(0.25)}
    pieces, _ = _viterbi("ab", logp)
    assert pieces == ["ab"]


def test_train_and_encode_roundtrip(spark):
    rows = [(i, "the internal international intern ate " * 3) for i in range(6)]
    rows += [(10 + i, "nation national internationalization") for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    model = unigram_train(docs, vocab_size=60, em_iters=2, seed_size=300)
    # single-char coverage survives pruning
    assert all(c in model for c in set("internationalization"))
    # multi-char pieces exist and model is a proper distribution
    assert any(len(p) > 1 for p in model)
    assert abs(sum(math.exp(v) for v in model.values()) - 1.0) < 1e-9
    out = {r.doc_id: r for r in unigram_encode(docs, model).collect()}
    assert len(out) == 10
    # encode agrees with the driver-side Viterbi on a sample doc
    segs = []
    for w in rows[0][1].split():
        segs.extend(_viterbi(w, model)[0])
    assert out["0"].n_pieces == len(segs)
    assert list(out["0"].pieces_prefix) == segs[:12]
    # losslessness: pieces of every word concatenate back
    for w in "internationalization the ate".split():
        p, _ = _viterbi(w, model)
        assert "".join(p) == w


def test_train_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, "abab baba abba") for i in range(3)], "doc_id long, text string"
    )
    m1 = unigram_train(docs, vocab_size=20, em_iters=2, seed_size=50)
    m2 = unigram_train(docs, vocab_size=20, em_iters=2, seed_size=50)
    assert m1 == m2
