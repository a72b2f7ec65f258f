"""Largest-remainder stratified sample (entry_queries.q_stratified_sample):
apportionment exactness and determinism invariants."""

import math

from deduplicator_spark.entry_queries import SAMPLE_DENOM, q_stratified_sample

SF = "/root/testdata/sf0.001"


def test_budget_exact_and_quota_bounds(spark):
    rows = q_stratified_sample(spark, SF).collect()
    n_total = sum({r.lang: r.lang_n for r in rows}.values())
    budget = n_total // SAMPLE_DENOM
    # kept rows == budget EXACTLY (the property naive per-stratum rounding
    # cannot give)
    assert len(rows) == budget
    # per-language quota within 1 of the exact proportional share, and the
    # kept count per language equals the quota
    per = {}
    for r in rows:
        per.setdefault(r.lang, []).append(r)
    for lang, rs in per.items():
        quota = rs[0].quota
        assert len(rs) == quota
        exact = budget * rs[0].lang_n / n_total
        assert math.floor(exact) <= quota <= math.floor(exact) + 1
        # pick_rank is 1..quota with no gaps (hash-rank prefix)
        assert sorted(r.pick_rank for r in rs) == list(range(1, quota + 1))


def test_deterministic_across_runs(spark):
    a = {(r.doc_id, r.lang) for r in q_stratified_sample(spark, SF).collect()}
    b = {(r.doc_id, r.lang) for r in q_stratified_sample(spark, SF).collect()}
    assert a == b and a
