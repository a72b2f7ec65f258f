"""Planted-truth tests for soft dedup (entry_queries.q_cluster_downsample).
Cross-engine proof is the `cluster_downsample` oracle row (green at sf0.01
and sf0.1); these pin the policy on a corpus with a KNOWN 9-member near-dup
cluster: quota = ceil(sqrt(9)) = 3 kept, ranked by token count, every kept
member weighted size/quota = 3.0, singletons untouched at weight 1.0."""

from __future__ import annotations

import math

import pytest

from deduplicator_spark.entry_queries import q_cluster_downsample

_FAMILY = 9     # one planted cluster of 9 near-identical docs
_N_SINGLE = 12


def _corpus() -> list[tuple[int, str]]:
    base = [f"fam{j:02d}" for j in range(60)]
    rows = []
    for i in range(_FAMILY):
        # member i appends i extra tokens: Jaccard(base, base+i) >= 60/68
        # stays above the 0.8 tier threshold; token counts 60..68 make the
        # quality ranking deterministic (more tokens = better = lower rank).
        rows.append((i, " ".join(base + [f"x{i}t{j}" for j in range(i)])))
    for k in range(_N_SINGLE):
        rows.append((100 + k,
                     " ".join(f"s{k:02d}u{j:02d}" for j in range(40))))
    return rows


@pytest.fixture(scope="module")
def rows(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("downsample")
    docs = spark.createDataFrame(_corpus(), "doc_id long, text string")
    docs.write.mode("overwrite").parquet(str(tmp / "documents.parquet"))
    return {r["doc_id"]: r for r in q_cluster_downsample(spark, str(tmp)).collect()}


def test_family_quota_and_ranking(rows):
    fam = [rows[i] for i in range(_FAMILY)]
    assert {r["cluster_id"] for r in fam} == {0}  # one cluster, min-id label
    quota = math.ceil(math.sqrt(_FAMILY))
    kept = sorted(r["doc_id"] for r in fam if r["kept"])
    # ranked by token count desc -> the 3 longest members (ids 8, 7, 6)
    assert kept == [_FAMILY - 3, _FAMILY - 2, _FAMILY - 1]
    assert len(kept) == quota
    for r in fam:
        if r["kept"]:
            assert r["weight"] == pytest.approx(_FAMILY / quota)
            assert r["rank"] <= quota
        else:
            assert r["weight"] == 0.0 and r["rank"] > quota


def test_singletons_kept_at_weight_one(rows):
    for k in range(_N_SINGLE):
        r = rows[100 + k]
        assert r["kept"] and r["rank"] == 1 and r["weight"] == 1.0
        assert r["cluster_id"] == 100 + k


def test_mass_preserved_in_expectation(rows):
    # sum of weights == corpus size for the quota'd family too:
    # 3 kept * 3.0 == 9 members.
    total = sum(r["weight"] for r in rows.values())
    assert total == pytest.approx(_FAMILY + _N_SINGLE)
