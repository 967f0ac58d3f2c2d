"""Distributed BPE tokenizer training + encoding (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units" — the
word-frequency formulation every production tokenizer trainer uses).

Shape at 100 TB: the corpus-scale work is exactly ONE shuffle — the
distinct-word frequency count (map-side combined). Everything after
operates on the (optionally top-V-capped) word-frequency table, which is
orders of magnitude smaller than the corpus; each merge iteration is one
Arrow map stage (apply the previous merge inside the segment arrays) +
one pair-count hash-aggregate, and the only thing ever collected is the
single winning pair per iteration (plus the final merge list). Lineage
is truncated with localCheckpoint every few merges so Catalyst never
sees an unboundedly nested plan.

Determinism: pair selection is (count desc, pair asc) — bit-stable
across runs and cluster layouts. Words are lowercased whitespace tokens
with the classic </w> end-of-word sentinel on the final symbol.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EOW = "</w>"


def _word_freqs(documents: DataFrame, vocab_words: int | None) -> DataFrame:
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    words = (
        documents.select(F.explode(toks).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    if vocab_words is not None:
        # deterministic cap (TakeOrderedAndProject): train on the top-V
        # words — the standard practice; rare-word tails add noise and
        # driver-independent size bounds matter more
        words = words.orderBy(F.desc("freq"), F.asc("word")).limit(vocab_words)
    return words


def bpe_train(
    documents: DataFrame,
    num_merges: int = 32,
    vocab_words: int | None = 20_000,
) -> list[tuple[str, str, int]]:
    """Learn `num_merges` BPE merges -> [(left, right, pair_count)] in
    merge order. Each word contributes its corpus frequency as the
    weight of every adjacent symbol pair in its current segmentation."""
    # per-character segmentation with the </w> sentinel on the last char
    chars = F.split(F.col("word"), "")
    seg = F.concat(
        F.slice(chars, 1, F.greatest(F.size(chars) - 1, F.lit(0))),
        F.array(F.concat(F.element_at(chars, -1), F.lit(EOW))),
    )
    # EAGER checkpoint: the vocab table is small by construction; every
    # iteration below re-checkpoints so (a) no iteration ever recomputes
    # the previous merges and (b) Catalyst never sees a nested 50-stage
    # plan
    cur = (
        _word_freqs(documents, vocab_words)
        .select(seg.alias("seg"), "freq")
        .localCheckpoint()
    )

    def _apply_merge_udf(left: str, right: str):
        # factory so the Arrow closure binds THIS iteration's pair (a
        # loop-local closure would late-bind to the final values)
        merged = left + right

        @F.pandas_udf("array<string>")
        def apply_merge(segs: pd.Series) -> pd.Series:
            out = []
            for s in segs:
                s = list(s)
                res = []
                i = 0
                n = len(s)
                while i < n:
                    if i + 1 < n and s[i] == left and s[i + 1] == right:
                        res.append(merged)
                        i += 2
                    else:
                        res.append(s[i])
                        i += 1
                out.append(res)
            return pd.Series(out)

        return apply_merge

    merges: list[tuple[str, str, int]] = []
    for _it in range(num_merges):
        pairs = [
            F.slice(F.col("seg"), j + 1, F.greatest(F.size("seg") - 1, F.lit(0)))
            for j in range(2)
        ]
        pair_counts = (
            cur.select("freq", F.explode(F.arrays_zip(*pairs)).alias("z"))
            .select(
                F.col("z.0").alias("left"),
                F.col("z.1").alias("right"),
                "freq",
            )
            .groupBy("left", "right")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not pair_counts:
            break
        top = pair_counts[0]
        left, right, cnt = top["left"], top["right"], int(top["cnt"])
        if cnt < 2:
            break  # nothing repeats: further merges are arbitrary
        merges.append((left, right, cnt))
        cur = cur.select(
            _apply_merge_udf(left, right)("seg").alias("seg"), "freq"
        ).localCheckpoint()
    return merges


def bpe_encode(
    documents: DataFrame, merges: list[tuple[str, str, int]]
) -> DataFrame:
    """Apply learned merges -> (doc_id, n_bpe_tokens, n_words,
    tokens_per_word). Broadcast merge ranks; one Arrow map stage (the
    greedy lowest-rank-first merge loop per word, the standard BPE
    encoder), no shuffle."""
    spark = documents.sparkSession
    ranks = {(l, r): i for i, (l, r, _c) in enumerate(merges)}
    bc = spark.sparkContext.broadcast(ranks)

    @F.pandas_udf("int")
    def count_tokens(text: pd.Series) -> pd.Series:
        rk = bc.value
        out = []
        for t in text:
            if not t:
                out.append(0)
                continue
            total = 0
            for w in t.lower().split():
                s = list(w)
                s[-1] = s[-1] + EOW
                while len(s) > 1:
                    best, bi = None, -1
                    for i in range(len(s) - 1):
                        r = rk.get((s[i], s[i + 1]))
                        if r is not None and (best is None or r < best):
                            best, bi = r, i
                    if best is None:
                        break
                    s[bi : bi + 2] = [s[bi] + s[bi + 1]]
                total += len(s)
            out.append(total)
        return pd.Series(out, dtype="int32")

    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    return documents.select(
        "doc_id",
        count_tokens(F.col("text")).alias("n_bpe_tokens"),
        F.size(toks).alias("n_words"),
    ).select(
        "doc_id",
        "n_bpe_tokens",
        "n_words",
        F.round(F.col("n_bpe_tokens") / F.col("n_words"), 4).alias(
            "tokens_per_word"
        ),
    )
