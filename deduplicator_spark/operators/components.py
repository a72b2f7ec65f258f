"""Connected components over verified candidate pairs — the clustering stage.

The reference never clusters (every probe row gets an independent verdict);
the north rule adds transitive closure of the duplicate relation. Implemented
as iterative min-label propagation expressed purely as DataFrame joins:

    label(v) <- min(label(v), min_{(u,v) in E} label(u))

with three scale guards (SURVEY.md §7.4 hard part #1):
  * edges are canonicalized + deduplicated once, then cached;
  * every cfg.checkpoint_every iterations the label frontier is
    localCheckpoint()-ed, truncating the Catalyst lineage that otherwise grows
    exponentially across self-join iterations (on a cluster: df.checkpoint()
    to HDFS / an Iceberg snapshot — see plans/checkpoint.py);
  * convergence is detected with a single count of changed labels per
    iteration; dedup-graph diameters are tiny (star-shaped tiers), so this
    terminates in O(log n) rounds in practice.

Determinism: labels are min(image_id) of the component — reproducing the
reference's deterministic winner rule (scan-order last-wins,
WarcIterator.java:59 / IndexBuilder.java:227-236) with an explicit total
order instead of incidental file order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT, DedupConfig


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
    # iteration 1 fused into label construction: label(v) = min(v, neighbors)
    # via ONE union+groupBy — no join (star-shaped tiers converge right here)
    labels = (
        edges.select(F.col("id_a").alias(id_col), F.col("id_b").alias("label"))
        .unionByName(edges.select(F.col("id_a").alias(id_col),
                                  F.col("id_a").alias("label")))
        .groupBy(id_col)
        .agg(F.min("label").alias("label"))
        .localCheckpoint(eager=True)
    )
    prev_sum = None

    for it in range(cfg.cc_max_iters):
        # one join (edges ⋈ labels) + two groupBys per round; convergence is
        # detected by an order-invariant checksum of the label assignment
        # (one tiny agg on the checkpointed frame — no self-join diff needed)
        nbr_min = (
            edges.join(labels.select(F.col(id_col).alias("id_b"), "label"), "id_b")
            .groupBy("id_a")
            .agg(F.min("label").alias("label"))
            .withColumnRenamed("id_a", id_col)
        )
        labels = (
            labels.unionByName(nbr_min)
            .groupBy(id_col)
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        cur = labels.agg(
            F.sum(F.xxhash64(F.concat_ws("\x1f", id_col, "label"))
                  .cast("decimal(38,0)")).alias("s")  # decimal: no ANSI overflow
        ).collect()[0]["s"]
        if cur == prev_sum:
            break
        prev_sum = cur
    else:
        raise RuntimeError(f"connected_components did not converge in {cfg.cc_max_iters} iters")

    out = labels.select(F.col(id_col), F.col("label").alias("cluster_id"))
    if nodes is not None:
        out = (
            nodes.select(id_col)
            .join(out, id_col, "left")
            .select(id_col, F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"))
        )
    edges.unpersist()
    return out
