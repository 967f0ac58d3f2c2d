"""Dedup cluster resolution: connected components over near-duplicate
pairs, the keep-one-per-cluster step that follows candidate generation
and verification in a training-data dedup pipeline.

100 TB shape: iterative min-label propagation — per round, one shuffle
join of the (symmetrized) edge list against the current labels and a
min-aggregate, with localCheckpoint truncating the lineage so the plan
does not grow per iteration. Rounds needed = graph diameter; dedup
clusters are shallow (near-dup relations are near-transitive), so this
converges in a handful of rounds even at corpus scale. The convergence
check is one count() per round on the changed-label set — the classic
Spark connected-components loop (the large-star/small-star variant
halves round count but adds two joins per round; at dedup-cluster
diameters plain propagation wins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 25
) -> DataFrame:
    """nodes: (doc_id,); edges: (a, b) undirected pairs. -> (doc_id,
    cluster_id, is_canonical) where cluster_id is the minimum doc_id
    reachable from the node and is_canonical marks the cluster
    representative (the row a keep-one-per-cluster filter retains)."""
    sym = edges.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).union(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    sym = sym.localCheckpoint()
    labels = nodes.select(
        F.col("doc_id").alias("node"), F.col("doc_id").alias("label")
    ).localCheckpoint()
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr, labels.node == nbr.src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("nbr_label"), F.col("label")),
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # loop exhausted max_iter with labels still changing: the
        # result would be silently wrong (ADVICE r3) — fail loudly;
        # callers with deeper graphs must raise max_iter
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            f"iterations ({changed} labels still changing)"
        )
    return labels.select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        (F.col("label") == F.col("node")).alias("is_canonical"),
    ).orderBy("doc_id")


def dedup_clusters(
    documents: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """Near-dup pairs (exact token Jaccard, the LSH verify stage) ->
    connected components -> per-doc cluster id + canonical flag."""
    from .dedup import token_jaccard_pairs

    pairs = token_jaccard_pairs(documents, threshold=threshold).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    return connected_components(documents.select("doc_id"), pairs)


def canonical_by_quality(
    documents: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """Quality-aware cluster resolution (the RefinedWeb-style keep
    policy): within each near-dup cluster retain the HIGHEST-quality
    member — heuristic quality score, ties broken by minimum doc_id —
    instead of dedup_clusters' positional min-doc_id canonical. The
    difference matters exactly when near-duplicates are NOT identical
    (truncations, boilerplate-injected copies): min-id keeps whichever
    crawl happened first; this keeps the best text.

    Emits (doc_id, cluster_id, quality, keep). Scale shape (100 TB):
    components from dedup_clusters (iterative min-label propagation);
    the selection is ONE struct-max agg on cluster_id — lexicographic
    max of (quality, -doc_id) gives argmax-with-tie-break without a
    per-cluster sort window — joined back on cluster_id. Map-side
    partial aggregation applies; no global sorts (trailing orderBy is
    presentation-only)."""
    from .textstats import quality_score

    cc = dedup_clusters(documents, threshold=threshold).select(
        "doc_id", "cluster_id"
    )
    q = quality_score(documents).select("doc_id", "quality")
    j = cc.join(q, "doc_id")
    best = j.groupBy("cluster_id").agg(
        F.max(
            F.struct(
                F.col("quality"), (-F.col("doc_id")).alias("neg_id")
            )
        ).alias("best")
    )
    return (
        j.join(best, "cluster_id")
        .select(
            "doc_id",
            "cluster_id",
            "quality",
            (
                (F.col("quality") == F.col("best.quality"))
                & (F.col("doc_id") == -F.col("best.neg_id"))
            )
            .cast("int")
            .alias("keep"),
        )
        .orderBy("doc_id")
    )
