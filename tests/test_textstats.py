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


def test_kmv_distinct_estimator_accuracy(spark):
    """KMV sketch: on a corpus with known distinct-token cardinality the
    estimate lands within the standard ~1/sqrt(k-2) relative error, and
    groups under capacity report exact counts."""
    from delphi_pdf_parser_spark.operators.sketches import (
        kmv_distinct_tokens,
    )

    rows = []
    # group "big": 2000 distinct tokens spread over docs
    for d in range(40):
        toks = " ".join(f"tok{d}_{i}" for i in range(50))
        rows.append((d, "big", toks))
    # group "small": 5 distinct tokens (< k -> exact)
    rows.append((100, "small", "a b c d e a b"))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        r["source"]: r
        for r in kmv_distinct_tokens(docs, k=64, group_col="source").collect()
    }
    assert out["small"]["est_distinct"] == 5.0
    assert out["small"]["kth_hash"] is None
    est = out["big"]["est_distinct"]
    # 3 sigma of ~ n/sqrt(k-2) at k=64, n=2000 -> +-760
    assert 1240 < est < 2760, est


def test_gopher_quality_rules(spark):
    """Published Gopher thresholds: a normal English paragraph passes;
    short / symbol-heavy / stop-word-free documents fail the specific
    rule they violate."""
    from delphi_pdf_parser_spark.operators.textstats import gopher_quality

    good = (
        "the quick brown fox jumps over that lazy dog and keeps running "
        "through fields with great joy because movement can have meaning "
        "when you least expect it to happen "
    ) * 2  # > 50 words, plenty of stop words, all alphabetic
    short = "too short"
    hashy = "the and that have with " + "# " * 60 + "word " * 50
    # ellipsis-to-word ratio 0.2: passed the old (misread) 0.3 bar, must
    # FAIL the published 0.1 symbol-ratio rule
    dotty = "the of and that have " + "... " * 12 + "word " * 45
    # >30% of lines end with an ellipsis -> line rule fails even though
    # the symbol ratio (9/62 > 0.1 too) — give it few enough ellipses
    # that only the LINE rule can catch it: 2 of 4 lines end with "..."
    liney = "\n".join(
        [
            "the quick brown fox jumps over that lazy dog " + "word " * 15,
            "this line trails off like so ...",
            "a perfectly ordinary line of and to be text " + "word " * 15,
            "and so does this one …",
        ]
    )
    # >90% bullet lines
    bullets = "\n".join("• the item of and %d" % i for i in range(20))
    out = {
        r["doc_id"]: r
        for r in gopher_quality(
            spark.createDataFrame(
                [
                    (1, good),
                    (2, short),
                    (3, hashy),
                    (4, dotty),
                    (5, liney),
                    (6, bullets),
                ],
                "doc_id long, text string",
            )
        ).collect()
    }
    assert out[1]["keep"] == 1
    assert out[1]["n_stop_words"] >= 2
    assert out[2]["keep"] == 0 and out[2]["n_words"] < 50
    assert out[3]["keep"] == 0 and out[3]["hash_ratio"] > 0.1
    assert out[4]["keep"] == 0 and 0.1 < out[4]["ellipsis_ratio"] <= 0.3
    assert out[5]["ellipsis_line_frac"] == 0.5 and out[5]["keep"] == 0
    assert out[6]["bullet_line_frac"] == 1.0 and out[6]["keep"] == 0
    # the 8-word published stop list: 'of' and 'to' and 'be' now count
    assert out[5]["n_stop_words"] >= 5


def test_curation_pipeline_stages(spark):
    """Each curation stage drops exactly what it should: a short doc
    fails quality, an exact duplicate is dropped keep-first, sampling is
    the deterministic md5 threshold."""
    from delphi_pdf_parser_spark.operators.curation import curation_pipeline

    long_a = "alpha " * 40
    rows = [
        (1, "s1", long_a),          # keeper
        (2, "s1", long_a),          # exact dup of 1 -> dropped at dedup
        (3, "s1", "too short"),     # dropped at quality
        (4, "s2", "beta " * 35),    # keeper, other source
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        r["source"]: r
        for r in curation_pipeline(docs, sample_hex="ffff").collect()
    }
    assert out["s1"]["n_input"] == 3
    assert out["s1"]["n_quality"] == 2
    assert out["s1"]["n_unique"] == 1   # dup collapsed, doc 1 kept
    assert out["s1"]["n_sampled"] == 1  # sample_hex ffff keeps all
    assert out["s2"]["n_input"] == 1
    assert out["s2"]["n_unique"] == 1


def test_gopher_repetition_rules(spark):
    """Repetition half of Rae et al. A1.1: each rule catches exactly the
    document built to violate it."""
    from delphi_pdf_parser_spark.operators.textstats import gopher_repetition

    # genuinely non-repetitive: every word unique -> every n-gram unique
    clean = "\n".join(
        " ".join(f"w{i}_{j}" for j in range(7)) for i in range(10)
    )
    # 6 of 10 lines are the same -> dup_line_frac 0.5 > 0.30
    dup_lines = "\n".join(
        ["repeated line of text"] * 6
        + [f"fresh line {i} here" for i in range(4)]
    )
    # one 2-gram dominating: "buy now" * 30 in otherwise-short text
    spammy = "buy now " * 30 + "other words close the document"
    out = {
        r["doc_id"]: r
        for r in gopher_repetition(
            spark.createDataFrame(
                [(1, clean), (2, dup_lines), (3, spammy)],
                "doc_id long, text string",
            )
        ).collect()
    }
    assert out[1]["keep"] == 1
    assert out[1]["dup_line_frac"] == 0.0
    assert out[2]["keep"] == 0 and out[2]["dup_line_frac"] == 0.5
    assert out[2]["dup_line_char_frac"] > 0.20
    assert out[3]["keep"] == 0 and out[3]["top2gram_char_frac"] > 0.20
    # deterministic mode: 'buy now'/'now buy' tie-break by gram asc
    assert out[3]["top3gram_char_frac"] > 0.18


def test_pii_scrub_counts_and_masking(spark):
    """PII pass: per-class counts on the original text, sequential typed
    masking, and the no-PII document untouched."""
    from delphi_pdf_parser_spark.operators.pii import pii_scrub

    rich = (
        "contact alice@example.com or bob.smith+x@sub.domain.org, "
        "server at 10.0.0.1 and 192.168.254.3, call +1 (555) 123-4567"
    )
    clean = "no personal data here, just 3.14 and version 1.2"
    out = {
        r["doc_id"]: r
        for r in pii_scrub(
            spark.createDataFrame(
                [(1, rich), (2, clean)], "doc_id long, text string"
            )
        ).collect()
    }
    r1 = out[1]
    assert r1["n_emails"] == 2 and r1["n_ipv4"] == 2 and r1["n_phones"] == 1
    assert r1["n_pii"] == 5
    m = r1["masked_text"]
    assert m.count("<EMAIL>") == 2 and m.count("<IP>") == 2
    assert m.count("<PHONE>") == 1
    assert "example.com" not in m and "10.0.0.1" not in m
    r2 = out[2]
    assert r2["n_pii"] == 0 and r2["masked_text"] == clean


def test_dsir_importance_prefers_target_like_docs(spark):
    """DSIR: documents sharing the target domain's hashed n-grams score
    higher than out-of-domain ones, and the top-k form is cut via
    TakeOrderedAndProject with a deterministic rank."""
    from delphi_pdf_parser_spark.operators.dsir import dsir_importance
    from delphi_pdf_parser_spark.plans import explain_str

    target = spark.createDataFrame(
        [(100, "medical trial patient dosage clinical outcome results")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "clinical trial patient outcome dosage measured"),
            (2, "football score goal match referee stadium crowd"),
            (3, "patient dosage clinical numbers trial"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["logw"] for r in dsir_importance(docs, target).collect()}
    assert out[1] > out[2] and out[3] > out[2]

    top = dsir_importance(docs, target, k=2)
    assert "TakeOrderedAndProject" in explain_str(top, "simple")
    rows = top.collect()
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2]
    assert {r["doc_id"] for r in rows} == {1, 3}


def test_bpe_train_matches_reference_implementation(spark):
    """Distributed BPE trainer == Sennrich et al. algorithm 1 run
    independently over the same word-frequency table (deterministic
    (count desc, pair asc) selection), and the encoder's greedy
    lowest-rank merge produces the expected token counts."""
    from collections import Counter

    from delphi_pdf_parser_spark.operators.bpe import (
        EOW,
        bpe_encode,
        bpe_train,
    )

    texts = [
        "low lower lowest low low",
        "new newer newest new lower",
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    merges = bpe_train(docs, num_merges=8)

    wf = Counter(w for t in texts for w in t.lower().split())
    segs = {w: [*w[:-1], w[-1] + EOW] for w in wf}
    ref = []
    for _ in range(8):
        pc = Counter()
        for w, s in segs.items():
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += wf[w]
        if not pc:
            break
        (left, right), cnt = sorted(
            pc.items(), key=lambda kv: (-kv[1], kv[0])
        )[0]
        if cnt < 2:
            break
        ref.append((left, right, cnt))
        for w, s in segs.items():
            res, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    res.append(left + right)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            segs[w] = res
    assert merges == ref
    assert merges[0] == ("l", "o", 6)  # most frequent pair first

    enc = {
        r["doc_id"]: r for r in bpe_encode(docs, merges).collect()
    }
    # doc 0: low</w> x3 (1 tok each) + lower</w> (1) + low+e+s+t</w>... 
    # exact counts pinned from the learned merge table
    assert enc[0]["n_bpe_tokens"] == 7 and enc[0]["n_words"] == 5
    assert enc[1]["n_bpe_tokens"] == 8 and enc[1]["n_words"] == 5


def test_bpe_train_many_merges_is_driver_fast(spark):
    """VERDICT r5 #6: the merge loop is driver-local over the collected
    capped vocab table — hundreds of merges must NOT launch hundreds of
    Spark jobs. 300 merges over the sf0.001 documents corpus completes
    in interactive time and stays deterministic."""
    import time

    from delphi_pdf_parser_spark.operators.bpe import bpe_train

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    t0 = time.time()
    merges = bpe_train(docs, num_merges=300, vocab_words=5_000)
    elapsed = time.time() - t0
    # the tiny synthetic vocab dries up (cnt<2 stop) after ~90 merges;
    # the point is they all came from ONE job + a driver loop
    assert len(merges) > 50
    # monotone non-increasing counts property of BPE does NOT hold in
    # general, but determinism does: same input -> same merges
    merges2 = bpe_train(docs, num_merges=300, vocab_words=5_000)
    assert merges == merges2
    # one word-count job + driver loop: far under a per-merge-job regime
    assert elapsed < 60, elapsed


def test_token_idf_stats_hand_computed(spark):
    """idf profile on a 3-doc corpus: df(a)=3, df(b)=df(c)=1, N=3."""
    import math

    from delphi_pdf_parser_spark.operators.textstats import token_idf_stats

    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a c"), (2, "a")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in token_idf_stats(docs).collect()}
    ln3 = math.log(3.0)
    assert out[0]["n_unique"] == 2
    assert out[0]["mean_idf"] == round((0.0 + ln3) / 2, 4)
    assert out[0]["max_idf"] == round(ln3, 4)
    assert out[0]["hapax_frac"] == 0.5
    assert out[2]["n_unique"] == 1
    assert out[2]["mean_idf"] == 0.0
    assert out[2]["hapax_frac"] == 0.0


def test_token_idf_stats_repeated_tokens_count_once(spark):
    """df is documents-containing, not occurrences: 'a a a' contributes
    one to df(a); per-doc stats are over DISTINCT tokens."""
    from delphi_pdf_parser_spark.operators.textstats import token_idf_stats

    docs = spark.createDataFrame(
        [(0, "a a a b"), (1, "a")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in token_idf_stats(docs).collect()}
    assert out[0]["n_unique"] == 2  # a, b — not 4
    assert out[1]["mean_idf"] == 0.0  # df(a)=2=N -> ln(1)=0


def test_c4_quality_rules_hand_computed(spark):
    """C4 line rules (terminal punct + >=3 words + no 'javascript')
    and page rules (>=5 sentences, lorem ipsum, curly brace, badword
    list) pinned on hand-built pages."""
    import hashlib

    from delphi_pdf_parser_spark.operators.textstats import (
        c4_quality_rules,
    )

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    good = (
        "This is a fine sentence one.\n"
        "Here is a second good line!\n"
        "A third line, asking a question?\n"
        "The fourth line ends with a period.\n"
        "And a fifth sentence closes it out."
    )
    docs = spark.createDataFrame(
        [
            (0, good),
            # line rules: no terminal punct / <3 words / javascript
            (1, "no punct here\nToo. Short.\nPlease enable JavaScript now."),
            (2, good + "\nBut it has a { brace."),
            (3, good.replace("second good", "second badword")),
            (4, "Lorem ipsum dolor sit amet, consectetur adipiscing."),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in c4_quality_rules(docs).collect()}
    assert len(out) == 6
    r0 = out[0]
    assert (r0["n_lines"], r0["n_kept_lines"], r0["n_sentences"]) == (5, 5, 5)
    assert r0["keep"] == 1 and r0["kept_text_md5"] == md5(good)
    r1 = out[1]
    # 'no punct here' fails punct; 'Too. Short.' has 2 words;
    # the JavaScript line fails the javascript rule
    assert (r1["n_lines"], r1["n_kept_lines"]) == (3, 0)
    assert r1["keep"] == 0 and r1["kept_text_md5"] == md5("")
    r2 = out[2]
    assert r2["has_brace"] and r2["keep"] == 0
    assert r2["n_kept_lines"] == 6  # the brace line itself passes line rules
    r3 = out[3]
    assert r3["has_badword"] and r3["keep"] == 0
    r4 = out[4]
    # lorem ipsum page: the single line passes line rules but the page
    # drops on the phrase AND on <5 sentences
    assert r4["has_lorem"] and r4["n_sentences"] == 1 and r4["keep"] == 0
    r5 = out[5]
    assert (r5["n_lines"], r5["keep"]) == (0, 0)


def test_pack_sequences_hand_computed(spark):
    """Document packing: corpus-order concat with one EOS per doc, cut
    into seq_len windows; the two-phase prefix sum must produce the
    exact flat-cumsum layout (forced multi-bucket via bucket_docs=2)."""
    from delphi_pdf_parser_spark.operators.packing import pack_sequences

    # token counts (+1 EOS): 3+1, 5+1, 2+1, 4+1 -> starts 0,4,10,13
    docs = spark.createDataFrame(
        [
            (0, "a b c"),
            (1, "d e f g h"),
            (2, "i j"),
            (3, "k l m n"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["seq_id"]: r
        for r in pack_sequences(docs, seq_len=8, bucket_docs=2).collect()
    }
    # total 18 tokens -> seqs 0..2: [0,8) [8,16) [16,18)
    assert sorted(rows) == [0, 1, 2]
    # seq 0: doc0 (4 tok) + doc1 tokens 4..7 (4 of its 6)
    assert (rows[0]["n_docs"], rows[0]["n_tokens"]) == (2, 8)
    assert (rows[0]["first_doc_id"], rows[0]["last_doc_id"]) == (0, 1)
    # seq 1: doc1 remainder (2) + doc2 (3) + doc3 head (3)
    assert (rows[1]["n_docs"], rows[1]["n_tokens"]) == (3, 8)
    assert (rows[1]["first_doc_id"], rows[1]["last_doc_id"]) == (1, 3)
    # seq 2: doc3 tail (2) — the only under-filled sequence
    assert (rows[2]["n_docs"], rows[2]["n_tokens"]) == (1, 2)
    assert (rows[2]["first_doc_id"], rows[2]["last_doc_id"]) == (3, 3)


def test_temperature_mix_hand_computed(spark):
    """alpha<1 up-samples small sources: with sources of 16 and 4 docs
    at alpha=0.5 and target 0.5, rates are prop. to sqrt(c)/c — the
    small source's rate is twice the big one's; rate caps at 1."""
    from delphi_pdf_parser_spark.operators.textstats import (
        temperature_mix,
    )

    rows = [(i, "big", "x") for i in range(16)] + [
        (100 + i, "small", "x") for i in range(4)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    out = {
        r["source"]: r
        for r in temperature_mix(docs, alpha=0.5, target_frac=0.5).collect()
    }
    # sum_w = 4 + 2 = 6; rate_s = 0.5 * 20 * sqrt(c)/6/c
    assert out["big"]["n_docs"] == 16 and out["small"]["n_docs"] == 4
    assert abs(out["big"]["rate"] - round(10 * 4 / 6 / 16, 6)) < 1e-9
    assert abs(out["small"]["rate"] - round(10 * 2 / 6 / 4, 6)) < 1e-9
    # small source's (pre-rounding) rate is exactly double big's
    assert abs(out["small"]["rate"] - 2 * out["big"]["rate"]) < 1e-5
    assert 0 <= out["big"]["n_kept"] <= 16
    assert 0 <= out["small"]["n_kept"] <= 4
    # rate caps at 1: tiny corpus, huge target
    out2 = {
        r["source"]: r
        for r in temperature_mix(docs, alpha=0.5, target_frac=2.0).collect()
    }
    assert out2["small"]["rate"] == 1.0
    assert out2["small"]["n_kept"] == 4  # rate 1 keeps everything


def test_quality_classifier_learns_separable_classes(spark):
    """MLlib-backed learned filter: on a linearly separable corpus the
    hashed-feature logistic regression recovers the labels exactly,
    and scoring emits calibrated per-class probabilities."""
    from delphi_pdf_parser_spark.operators.classify import (
        score_quality,
        train_quality_classifier,
    )

    good = (
        "the quick brown fox and the lazy dog have run with that "
        "style of grace to be seen"
    )
    junk = "### @@@ $$$ %%% ^^^ &&& *** ((( ))) ]]] [[["
    rows = [(i, (good + " ") * 5) for i in range(30)] + [
        (100 + i, (junk + " ") * 5) for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    labels = spark.createDataFrame(
        [(i, 1.0) for i in range(30)] + [(100 + i, 0.0) for i in range(30)],
        "doc_id long, label double",
    )
    m = train_quality_classifier(docs, labels=labels)
    out = {r["doc_id"]: r for r in score_quality(docs, m).collect()}
    assert all(out[i]["keep"] == 1 for i in range(30))
    assert all(out[100 + i]["keep"] == 0 for i in range(30))
    assert out[0]["quality_prob"] > 0.9 > 0.1 > out[100]["quality_prob"]


def test_quality_classifier_weak_label_bootstrap(spark):
    """Without labels the median-split bootstrap must yield two
    classes and score every document; a constant-score corpus raises
    instead of fitting a degenerate model."""
    import pytest

    from delphi_pdf_parser_spark.operators.classify import (
        quality_classifier,
        train_quality_classifier,
    )

    docs = spark.createDataFrame(
        [(i, ("word" + str(i) + " ") * (10 + i)) for i in range(20)],
        "doc_id long, text string",
    )
    out = quality_classifier(docs, num_features=256)
    assert out.count() == 20
    assert {r["keep"] for r in out.collect()} <= {0, 1}

    same = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(10)],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError):
        train_quality_classifier(same, num_features=256)


def test_bigram_logprob_hand_computed(spark):
    """Interpolated bigram LM: p(b|a) = lam*c(ab)/c(a) +
    (1-lam)*p_uni(b) with add-k unigrams over the WHOLE corpus; docs
    with < 2 tokens emit no row."""
    import math

    from delphi_pdf_parser_spark.operators.textstats import (
        bigram_logprob,
    )

    docs = spark.createDataFrame(
        [(0, "x y x y z"), (1, "q")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in bigram_logprob(docs).collect()}
    assert sorted(out) == [0]  # the 1-token doc has no transitions
    # corpus: x2 y2 z1 q1 -> total 6, vsize 4, denom 6+0.5*4=8
    pxy = 0.7 * (2 / 2) + 0.3 * (2.5 / 8)
    pyx = 0.7 * (1 / 2) + 0.3 * (2.5 / 8)
    pyz = 0.7 * (1 / 2) + 0.3 * (1.5 / 8)
    exp = round(
        (2 * math.log10(pxy) + math.log10(pyx) + math.log10(pyz)) / 4, 4
    )
    assert out[0]["n_bigrams"] == 4
    assert abs(out[0]["mean_logprob"] - exp) < 1e-9


def test_pack_sequences_null_and_empty_docs(spark):
    """A null/empty/whitespace document occupies exactly its EOS slot
    (n=1) — no phantom tokens, no descending-sequence explosion at a
    window boundary."""
    from delphi_pdf_parser_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(0, "a b c"), (1, None), (2, ""), (3, "   "), (4, "d e f g")],
        "doc_id long, text string",
    )
    # n: 4, 1, 1, 1, 5 -> total 12, seq_len 4 -> seqs [0,4) [4,8) [8,12)
    rows = {
        r["seq_id"]: r
        for r in pack_sequences(docs, seq_len=4, bucket_docs=2).collect()
    }
    assert sorted(rows) == [0, 1, 2]
    assert (rows[0]["n_docs"], rows[0]["n_tokens"]) == (1, 4)
    # seq 1: docs 1,2,3 (EOS slots) + doc4 head token
    assert (rows[1]["n_docs"], rows[1]["n_tokens"]) == (4, 4)
    assert (rows[1]["first_doc_id"], rows[1]["last_doc_id"]) == (1, 4)
    assert (rows[2]["n_docs"], rows[2]["n_tokens"]) == (1, 4)
    total = sum(r["n_tokens"] for r in rows.values())
    assert total == 12


def test_assign_shards_hand_computed(spark):
    """Byte-balanced shards: documents atomic, shard = first-byte
    window, shards overshoot by at most one document."""
    from delphi_pdf_parser_spark.operators.packing import assign_shards

    docs = spark.createDataFrame(
        [(0, "x" * 9), (1, "y" * 9), (2, "z" * 9), (3, "w" * 3)],
        "doc_id long, text string",
    )
    # sizes +1 terminator: 10,10,10,4; starts 0,10,20,30; shard 16B:
    # doc0 -> 0, doc1 -> 0 (starts at 10), doc2 -> 1, doc3 -> 1
    rows = {
        r["shard_id"]: r
        for r in assign_shards(docs, shard_bytes=16, bucket_docs=2).collect()
    }
    assert sorted(rows) == [0, 1]
    assert (rows[0]["n_docs"], rows[0]["n_bytes"]) == (2, 20)
    assert (rows[1]["n_docs"], rows[1]["n_bytes"]) == (2, 14)
    assert (rows[1]["first_doc_id"], rows[1]["last_doc_id"]) == (2, 3)


def test_quality_score_blank_and_null_text(spark):
    """ANSI hardening: empty / null / whitespace text must score
    (alpha-ratio 0) instead of dividing by zero or returning null —
    the cluster-canonical and classifier paths depend on it."""
    from delphi_pdf_parser_spark.operators.textstats import quality_score

    docs = spark.createDataFrame(
        [(0, ""), (1, None), (2, "real words here")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in quality_score(docs).collect()}
    assert out[0]["quality"] is not None
    assert out[1]["quality"] == out[0]["quality"]
    assert out[2]["quality"] > out[0]["quality"]


def test_assign_shards_counts_bytes_not_chars(spark):
    """Shard sizes are UTF-8 BYTES: 3-byte CJK chars weigh 3x."""
    from delphi_pdf_parser_spark.operators.packing import assign_shards

    docs = spark.createDataFrame(
        [(0, "世" * 5)], "doc_id long, text string"  # 15 bytes + 1
    )
    r = assign_shards(docs, shard_bytes=64).collect()[0]
    assert r["n_bytes"] == 16


def test_pack_sequences_randomized_invariants(spark):
    """Randomized (fixed-seed) corpus incl. empties: packing conserves
    tokens, fills every sequence to seq_len except the last, and
    matches a pure-Python flat-cumsum reference."""
    import random

    from delphi_pdf_parser_spark.operators.packing import pack_sequences

    rng = random.Random(42)
    rows = []
    for i in range(120):
        k = rng.choice([0, 1, 3, 7, 20, 55])
        rows.append((i, " ".join(f"t{i}_{j}" for j in range(k))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    L = 32
    got = {
        r["seq_id"]: r
        for r in pack_sequences(docs, seq_len=L, bucket_docs=16).collect()
    }

    # pure-python reference
    sizes = [(i, (len(t.split()) if t.strip() else 0) + 1) for i, t in rows]
    total = sum(n for _, n in sizes)
    import collections

    ref = collections.defaultdict(lambda: [0, 0, None, None])
    off = 0
    for i, n in sizes:
        for s in range(off // L, (off + n - 1) // L + 1):
            tok = min(off + n, (s + 1) * L) - max(off, s * L)
            e = ref[s]
            e[0] += 1
            e[1] += tok
            e[2] = i if e[2] is None else e[2]
            e[3] = i
        off += n
    assert sorted(got) == sorted(ref)
    for s, e in ref.items():
        r = got[s]
        assert (
            r["n_docs"], r["n_tokens"], r["first_doc_id"], r["last_doc_id"]
        ) == tuple(e), s
    assert sum(r["n_tokens"] for r in got.values()) == total
    last = max(got)
    for s, r in got.items():
        assert r["n_tokens"] == (L if s != last else r["n_tokens"])


def test_boilerplate_lines_finds_site_template(spark):
    """Lines present in >= min_frac of a source's docs are boilerplate;
    the most widespread line is pinned by md5."""
    import hashlib

    from delphi_pdf_parser_spark.operators.textstats import (
        boilerplate_lines,
    )

    nav = "Home | About | Contact"
    docs = spark.createDataFrame(
        [
            (0, "s1", nav + "\nreal content zero"),
            (1, "s1", nav + "\nother content one"),
            (2, "s1", nav + "\nmore content two"),
            (3, "s1", "totally unique page"),
        ],
        "doc_id long, source string, text string",
    )
    r = boilerplate_lines(docs).collect()[0]
    assert (r["n_docs"], r["n_distinct_lines"]) == (4, 5)
    assert r["n_boilerplate_lines"] == 1  # nav in 3/4 >= 0.5
    assert r["top_df"] == 3
    assert r["top_line_md5"] == hashlib.md5(nav.encode()).hexdigest()


def test_ccnet_buckets_terciles(spark):
    from delphi_pdf_parser_spark.operators.textstats import ccnet_buckets

    # 9 docs, one lang: scores strictly ordered by construction (more
    # singleton tokens = lower mean unigram logprob)
    rows = []
    for i in range(9):
        text = " ".join(["common"] * (9 - i) + [f"rare{i}x{j}" for j in range(i)])
        rows.append((i, text, "en"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = ccnet_buckets(docs).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r.score)
    assert {k: len(v) for k, v in by_bucket.items()} == {
        "head": 3, "middle": 3, "tail": 3
    }
    # ordering: every head score > every middle score > every tail score
    assert min(by_bucket["head"]) > max(by_bucket["middle"])
    assert min(by_bucket["middle"]) > max(by_bucket["tail"])
    # thresholds are per-language constants
    assert len({(r.t_head, r.t_tail) for r in out}) == 1


def test_chunk_documents_windows(spark):
    from delphi_pdf_parser_spark.operators.packing import chunk_documents

    toks = [f"t{i}" for i in range(1, 11)]  # 10 tokens
    docs = spark.createDataFrame(
        [(1, " ".join(toks)), (2, "a b"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=4, overlap=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: starts 1,4,7 (stop = n_tok - overlap = 9); full coverage
    d1 = sorted(by_doc[1], key=lambda r: r.chunk_id)
    assert [(r.start_tok, r.n_tokens, r.chunk_text) for r in d1] == [
        (1, 4, "t1 t2 t3 t4"),
        (4, 4, "t4 t5 t6 t7"),
        (7, 4, "t7 t8 t9 t10"),
    ]
    # doc 2: shorter than one chunk -> single short chunk
    assert [(r.start_tok, r.chunk_text) for r in by_doc[2]] == [(1, "a b")]
    # empty / null docs emit nothing
    assert 3 not in by_doc and 4 not in by_doc


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest as _pt

    from delphi_pdf_parser_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pt.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_script_profile_routing(spark):
    from delphi_pdf_parser_spark.operators.textstats import script_profile

    docs = spark.createDataFrame(
        [
            (1, "hello world"),
            (2, "привет мир hello"),   # cyrillic-dominant
            (3, "你好世界"),
            (4, "مرحبا بالعالم"),
            (5, "12345 !!!"),          # no script letters at all
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in script_profile(docs).collect()}
    assert got[1].main_script == "latin" and got[1].latin_frac == 1.0
    assert got[2].main_script == "cyrillic"
    assert got[2].cyrillic_frac > 0.5 > got[2].latin_frac > 0
    assert got[3].main_script == "han" and got[3].han_frac == 1.0
    assert got[4].main_script == "arabic"
    assert got[5].main_script == "none" and got[5].n_script_chars == 0
