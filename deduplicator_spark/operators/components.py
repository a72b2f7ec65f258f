"""Connected components over verified candidate pairs — the clustering stage.

The reference never clusters (every probe row gets an independent verdict);
the north rule adds transitive closure of the duplicate relation. Implemented
as iterative min-label propagation expressed purely as DataFrame joins:

    label(v) <- min(label(v), min_{(u,v) in E} label(u))

with three scale guards (SURVEY.md §7.4 hard part #1):
  * edges are canonicalized + deduplicated once, then cached;
  * propagation rounds run in LAZY batches of cfg.checkpoint_every: the
    label frontier is only checkpointed + convergence-checked once per
    batch, so the driver pays ONE job per batch instead of two per round.
    Labels are monotone non-increasing, so an unchanged order-invariant
    checksum across a whole batch proves a fixed point (on a cluster:
    df.checkpoint() to HDFS / an Iceberg snapshot — see plans/checkpoint.py);
  * dedup graphs are star-shaped (tiers emit star edges around bucket
    minima), so they converge in 1-2 propagation rounds: the common case is
    exactly two driver actions total;
  * from the second batch on (i.e. only when the star-shaped fast path did
    NOT converge), each round adds a pointer-doubling shortcut
    label(v) <- label(label(v)), bounding high-diameter graphs (chains of
    drifting near-dups) at O(log n) rounds instead of O(diameter).

Determinism: labels are min(image_id) of the component — reproducing the
reference's deterministic winner rule (scan-order last-wins,
WarcIterator.java:59 / IndexBuilder.java:227-236) with an explicit total
order instead of incidental file order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT, DedupConfig


def _propagate(edges: DataFrame, labels: DataFrame, id_col: str) -> DataFrame:
    """One min-label round: label(v) <- min(label(v), min over neighbors)."""
    nbr_min = (
        edges.join(labels.select(F.col(id_col).alias("id_b"), "label"), "id_b")
        .groupBy("id_a")
        .agg(F.min("label").alias("label"))
        .withColumnRenamed("id_a", id_col)
    )
    return (
        labels.unionByName(nbr_min)
        .groupBy(id_col)
        .agg(F.min("label").alias("label"))
    )


def _shortcut(labels: DataFrame, id_col: str) -> DataFrame:
    """Pointer doubling: label(v) <- label(label(v)).

    Every label value is itself a node id present in ``labels`` (labels are
    mins over node ids), so the self-join always hits; coalesce guards the
    degenerate empty frame. least() keeps monotonicity explicit even though
    label(u) <= u already implies it.
    """
    lab = labels.select(F.col(id_col).alias("_lk"), F.col("label").alias("_l2"))
    return (
        labels.join(lab, labels["label"] == lab["_lk"], "left")
        .select(
            F.col(id_col),
            F.least(F.col("label"), F.coalesce("_l2", "label")).alias("label"),
        )
    )


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame | None = None,
    cfg: DedupConfig = DEFAULT,
    id_col: str = "image_id",
) -> DataFrame:
    """pairs(id_a, id_b) [+ nodes(image_id)] -> (image_id, cluster_id).

    Singleton nodes (no incident edge) map to themselves when ``nodes`` is
    given; otherwise only endpoint nodes appear in the output.
    """
    edges = (
        pairs.select("id_a", "id_b")
        .unionByName(pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b")))
        .distinct()
        .persist()
    )
    # round 0 fused into label construction: label(v) = min(v, neighbors)
    # via ONE union+groupBy — no join (star-shaped tiers converge right here)
    labels = (
        edges.select(F.col("id_a").alias(id_col), F.col("id_b").alias("label"))
        .unionByName(edges.select(F.col("id_a").alias(id_col),
                                  F.col("id_a").alias("label")))
        .groupBy(id_col)
        .agg(F.min("label").alias("label"))
    )

    # Lazy-batched iteration: every round ends in a LAZY localCheckpoint —
    # nothing runs yet, but the checkpoint makes round N+1 reference round
    # N's RDD *structurally* (computed once at materialization) instead of
    # duplicating its Catalyst plan (a union references labels twice; without
    # the per-round checkpoint the physical plan doubles every round and AQE
    # re-executes the duplicated subtrees). The driver then pays ONE job per
    # `batch` rounds: the convergence-checksum action, which materializes
    # the whole checkpointed chain.
    batch = max(1, cfg.checkpoint_every)
    prev_state: tuple = ()
    it = 0
    converged = False
    labels = labels.localCheckpoint(eager=False)
    while it < cfg.cc_max_iters:
        for _ in range(min(batch, cfg.cc_max_iters - it)):
            labels = _propagate(edges, labels, id_col)
            if it >= batch:
                # Pointer doubling from the second batch on: star-shaped
                # dedup graphs have already converged by then (no extra
                # shuffle in the common case), while high-diameter graphs
                # (chains of drifting near-dups A~B~C~...) get O(log n)
                # rounds instead of O(diameter) — each round the reach of
                # a label at least doubles, vs +1 for propagation alone.
                labels = _shortcut(labels, id_col)
            labels = labels.localCheckpoint(eager=False)
            it += 1
        # order-invariant checksum of the assignment; labels only ever
        # decrease, so (count, sum) unchanged across a batch <=> fixed point
        row = labels.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64(F.concat_ws("\x1f", id_col, "label"))
                  .cast("decimal(38,0)")).alias("s"),  # decimal: no ANSI overflow
        ).first()
        state = (row["n"], row["s"])
        if state == prev_state:
            converged = True
            break
        prev_state = state
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {cfg.cc_max_iters} iters"
        )

    out = labels.select(F.col(id_col), F.col("label").alias("cluster_id"))
    if nodes is not None:
        out = (
            nodes.select(id_col)
            .join(out, id_col, "left")
            .select(id_col, F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"))
        )
    edges.unpersist()
    return out


def repair_clusters(
    clusters: DataFrame,
    edges: DataFrame,
    retracted: DataFrame,
    cfg: DedupConfig = DEFAULT,
    id_col: str = "image_id",
) -> DataFrame:
    """Incremental cluster repair after retracting members (takedown /
    GDPR-erasure requests): (clusters(image_id, cluster_id) from a prior
    run, edges(id_a, id_b) canonical verified pairs from the same run,
    retracted(image_id)) -> the (image_id, cluster_id) assignment a FULL
    recompute over the surviving subgraph would produce — without running
    connected components over the corpus again.

    Exactness: a component with no retracted member keeps its node set and
    every incident edge (removed edges all touch a retracted node, and
    retracted nodes live only in affected components), so its assignment is
    carried through VERBATIM; only affected components are re-closed — they
    may split (the retracted node was a cut vertex) or re-label (it was the
    min-id representative). The cross-engine oracle proves the composition
    equals the full recompute.

    Scale: the retraction set is operationally tiny (a takedown batch), so
    `retracted` and the affected-cluster-id set are broadcast; the corpus-
    sized inputs (clusters, edges) are each touched by ONE broadcast
    semi-/anti-join — no shuffle of the 10^12-row assignment, no global CC.
    The re-closed subgraph is bounded by |retracted| x max cluster size;
    connected_components on it is a few tasks. The reference analog is
    IndexBuilder's rebuild-on-change (IndexBuilder.java:94-104, APPEND
    lifecycle) — this is the subtractive counterpart, done incrementally.
    """
    affected = (
        clusters.join(F.broadcast(retracted.select(id_col)), id_col)
        .select("cluster_id")
        .distinct()
    )
    survivors = clusters.join(
        F.broadcast(retracted.select(id_col)), id_col, "left_anti")
    untouched = survivors.join(
        F.broadcast(affected), "cluster_id", "left_anti"
    ).select(id_col, "cluster_id")
    sub_nodes = survivors.join(F.broadcast(affected), "cluster_id") \
        .select(id_col)
    sub_edges = (
        edges.select("id_a", "id_b")
        .join(F.broadcast(sub_nodes.select(F.col(id_col).alias("id_a"))),
              "id_a")
        .join(F.broadcast(sub_nodes.select(F.col(id_col).alias("id_b"))),
              "id_b")
        .select("id_a", "id_b")
    )
    repaired = connected_components(
        sub_edges, nodes=sub_nodes, cfg=cfg, id_col=id_col)
    return untouched.unionByName(repaired)
