"""Incremental cluster repair after retraction (takedown lifecycle).

Plants every interesting repair case explicitly — a retracted cut vertex
(component splits), a retracted min-id representative (component
re-labels), an untouched component, surviving and retracted singletons —
and asserts repair_clusters equals a full recompute over the surviving
subgraph. The cross-engine gate row (cluster_retract_repair) proves the
same equality against DuckDB on the real corpus.
"""

from __future__ import annotations

import pytest

from deduplicator_spark.operators.components import (
    connected_components,
    repair_clusters,
)


def _assignment(df):
    return {r["image_id"]: r["cluster_id"] for r in df.collect()}


def test_repair_equals_full_recompute(spark):
    # components: chain a-b-c (b is a cut vertex), pair d-e (d is the
    # min-id rep), pair f-g (untouched), singletons h (kept), i (retracted)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e"), ("f", "g")],
        ["id_a", "id_b"],
    )
    nodes = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",), ("e",), ("f",), ("g",), ("h",),
         ("i",)],
        ["image_id"],
    )
    clusters = connected_components(edges, nodes=nodes)
    retracted = spark.createDataFrame([("b",), ("d",), ("i",)], ["image_id"])

    repaired = _assignment(repair_clusters(clusters, edges, retracted))

    # the split: with b gone, a and c fall apart into singletons
    assert repaired["a"] == "a" and repaired["c"] == "c"
    # the re-label: with rep d gone, e maps to itself
    assert repaired["e"] == "e"
    # untouched component passes through verbatim
    assert repaired["f"] == "f" and repaired["g"] == "f"
    # surviving singleton kept, retracted rows absent
    assert repaired["h"] == "h"
    assert set(repaired) == {"a", "c", "e", "f", "g", "h"}

    # equality with the full recompute over the surviving subgraph
    surv_nodes = nodes.join(retracted, "image_id", "left_anti")
    surv_edges = (
        edges.join(retracted.withColumnRenamed("image_id", "id_a"), "id_a",
                   "left_anti")
        .join(retracted.withColumnRenamed("image_id", "id_b"), "id_b",
              "left_anti")
    )
    full = _assignment(connected_components(surv_edges, nodes=surv_nodes))
    assert repaired == full


def test_repair_noop_when_nothing_retracted(spark):
    edges = spark.createDataFrame([("a", "b")], ["id_a", "id_b"])
    nodes = spark.createDataFrame([("a",), ("b",), ("c",)], ["image_id"])
    clusters = connected_components(edges, nodes=nodes)
    empty = spark.createDataFrame([], "image_id string")
    repaired = _assignment(repair_clusters(clusters, edges, empty))
    assert repaired == _assignment(clusters)


@pytest.mark.slow
def test_cli_retract_roundtrip(spark, tmp_path):
    """run --output writes pairs/ lineage; retract drops a duplicate's
    cluster representative and the survivor re-labels consistently."""
    from deduplicator_spark.cli import main

    out = str(tmp_path / "run_out")
    rc = main(["--cores", "8", "run", "--synth", "200", "--no-verify",
               "--output", out])
    assert rc == 0
    clusters = {r["image_id"]: r["cluster_id"]
                for r in spark.read.parquet(f"{out}/clusters").collect()}
    # pick a 2+-member cluster's representative to retract
    from collections import Counter

    sizes = Counter(clusters.values())
    rep = next(cid for cid, n in sizes.items() if n >= 2)
    rc = main(["--cores", "8", "retract", "--run-output", out,
               "--ids", rep, "--output", str(tmp_path / "fix")])
    assert rc == 0
    repaired = {r["image_id"]: r["cluster_id"]
                for r in spark.read.parquet(f"{tmp_path}/fix/clusters").collect()}
    assert rep not in repaired
    assert len(repaired) == len(clusters) - 1
    # every other member of the retracted rep's cluster got a new label
    # that is NOT the retracted id, and unaffected rows are untouched
    for iid, cid in repaired.items():
        assert cid != rep
        if clusters[iid] != rep:
            assert cid == clusters[iid]
