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
    endpoints = edges.select(F.col("id_a").alias(id_col)).distinct()
    labels = endpoints.withColumn("label", F.col(id_col))

    for it in range(cfg.cc_max_iters):
        # neighbor minimum, one shuffle: edges ⋈ labels(dst) -> min per src
        nbr_min = (
            edges.join(labels.select(F.col(id_col).alias("id_b"), "label"), "id_b")
            .groupBy("id_a")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min.withColumnRenamed("id_a", id_col), id_col, "left")
            .select(
                id_col,
                F.least(F.col("label"), F.coalesce("nbr_label", F.col("label"))).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("changed"),
            )
        )
        # materialize + truncate lineage each round (we count() anyway, so
        # eager checkpointing costs nothing extra and keeps plans flat)
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("changed")).limit(1).count()
        labels = new_labels.drop("changed")
        if changed == 0:
            break
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
