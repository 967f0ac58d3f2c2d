"""SentencePiece-style unigram-LM tokenizer (Kudo 2018), the companion
to ``operators/bpe.py``: seed a large candidate-piece vocabulary, run
hard-EM (Viterbi) re-estimation with pruning down to ``vocab_size``,
then encode the corpus distributedly against the broadcast piece table.

Scale shape (identical to the BPE trainer, per VERDICT r5 #6's
accepted pattern): the ONE corpus-scale operation is the word-count
shuffle (bounded to ``vocab_words`` rows by a TakeOrderedAndProject
cap); seeding, EM and pruning run driver-local over that bounded
table; the encode stage is a ``pandas_udf`` over the full corpus with
the final piece-logprob table broadcast.

Determinism: every tie is broken totally — seed cap by (count desc,
piece asc); Viterbi by (score, piece length, piece) so equal-probability
lattices segment identically everywhere; pruning keeps single
characters unconditionally (coverage can never be lost).

Hard-EM note: full SentencePiece uses soft EM (forward-backward
expected counts) and an ESA-based seeder; this implementation uses
Viterbi counts and substring-frequency seeding — the documented,
deterministic simplification. The segmentation OBJECTIVE (maximum
piece-logprob-sum under a unigram model) is exact: tests pin Viterbi
against brute-force enumeration over all segmentations.
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from delphi_pdf_parser_spark.operators.bpe import _word_freqs

MAX_PIECE_LEN = 8


def _viterbi(
    word: str,
    logp: dict,
    max_len: int = MAX_PIECE_LEN,
    floor: float | None = None,
):
    """Max-logprob segmentation. Unknown single chars score at the
    model's floor minus 10 (they must remain segmentable). Ties prefer
    the longer piece, then lexicographic — total order, deterministic.
    Returns (pieces, score). Pass ``floor`` (min model logprob - 10)
    when calling in a loop — recomputing it is an O(vocab) scan per
    word."""
    n = len(word)
    if floor is None:
        floor = (min(logp.values()) if logp else 0.0) - 10.0
    # dp[i]: (score, start_of_last_piece) best for prefix word[:i]
    NEG = float("-inf")
    dp = [(NEG, -1)] * (n + 1)
    dp[0] = (0.0, -1)
    back = [""] * (n + 1)
    for i in range(1, n + 1):
        best = (NEG, -1, "")
        for ln in range(1, min(max_len, i) + 1):
            j = i - ln
            if dp[j][0] == NEG:
                continue
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if ln > 1:
                    continue
                lp = floor
            cand = (dp[j][0] + lp, ln, piece)
            if cand[0] > best[0] or (
                cand[0] == best[0]
                and (cand[1], cand[2]) > (best[1], best[2])
            ):
                best = cand
        if best[1] >= 0:
            dp[i] = (best[0], i - best[1])
            back[i] = best[2]
    pieces = []
    i = n
    while i > 0:
        pieces.append(back[i])
        i = dp[i][1]
    pieces.reverse()
    return pieces, dp[n][0]


def unigram_train(
    documents: DataFrame,
    vocab_size: int = 1_000,
    vocab_words: int | None = 20_000,
    em_iters: int = 3,
    seed_size: int = 8_000,
) -> dict:
    """Learn a unigram piece model -> {piece: logprob} of at most
    ``vocab_size`` entries (single characters always retained)."""
    rows = _word_freqs(documents, vocab_words).collect()
    words = [(r["word"], int(r["freq"])) for r in rows]

    # --- seed: substring frequencies (freq-weighted), all chars kept
    seed = Counter()
    chars = set()
    for w, f in words:
        chars.update(w)
        n = len(w)
        for i in range(n):
            for ln in range(2, min(MAX_PIECE_LEN, n - i) + 1):
                seed[w[i : i + ln]] += f
    cand = sorted(seed.items(), key=lambda kv: (-kv[1], kv[0]))
    pieces = {c for c in chars}
    for p, _ in cand[: max(seed_size - len(chars), 0)]:
        pieces.add(p)

    # char counts so every piece has positive initial mass
    counts = Counter()
    for w, f in words:
        for c in w:
            counts[c] += f
    for p, c in seed.items():
        if p in pieces:
            counts[p] += c
    total = sum(counts[p] for p in pieces)
    logp = {p: math.log(counts[p] / total) for p in pieces}

    for _ in range(em_iters):
        # E (hard): Viterbi counts under the current model
        em = Counter()
        flr = (min(logp.values()) if logp else 0.0) - 10.0
        for w, f in words:
            segs, _ = _viterbi(w, logp, floor=flr)
            for s in segs:
                em[s] += f
        # prune: keep top (vocab_size - n_chars) multi-char pieces by
        # count (ties by piece), chars unconditionally
        multi = sorted(
            ((p, c) for p, c in em.items() if len(p) > 1 and p in logp),
            key=lambda kv: (-kv[1], kv[0]),
        )
        keep = set(chars)
        for p, _c in multi[: max(vocab_size - len(chars), 0)]:
            keep.add(p)
        # M: re-estimate over kept pieces; unseen chars get count 1
        # (never lose coverage)
        kept_counts = {
            p: (em[p] if em[p] > 0 else 1) for p in keep
        }
        tot = sum(kept_counts.values())
        logp = {p: math.log(c / tot) for p, c in kept_counts.items()}
    return logp


ENCODE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("n_pieces", IntegerType()),
        StructField("pieces_prefix", ArrayType(StringType())),
    ]
)


def unigram_encode(
    documents: DataFrame, model: dict, prefix: int = 12
) -> DataFrame:
    """Distributed Viterbi encode: per doc the piece count plus the
    first ``prefix`` pieces (full sequences would dominate the output;
    the prefix pins segmentation identity in tests). Whitespace
    pre-tokenization mirrors the BPE encoder; the model rides one
    broadcast."""
    spark = documents.sparkSession
    bmodel = spark.sparkContext.broadcast(model)

    @F.pandas_udf(ENCODE_SCHEMA)
    def encode(doc_id: pd.Series, text: pd.Series) -> pd.DataFrame:
        logp = bmodel.value
        flr = (min(logp.values()) if logp else 0.0) - 10.0
        seen: dict = {}  # per-batch word memo (Zipf: huge hit rate)
        out = []
        for d, t in zip(doc_id, text):
            pieces = []
            for w in (t or "").split():
                segs = seen.get(w)
                if segs is None:
                    segs, _ = _viterbi(w, logp, floor=flr)
                    seen[w] = segs
                pieces.extend(segs)
            out.append((str(d), len(pieces), pieces[:prefix]))
        return pd.DataFrame(
            out, columns=["doc_id", "n_pieces", "pieces_prefix"]
        )

    return documents.select(
        encode(F.col("doc_id"), F.col("text")).alias("r")
    ).select("r.doc_id", "r.n_pieces", "r.pieces_prefix")
