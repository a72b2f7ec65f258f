"""LSH band-plan chooser (functions/lshplan.py): the frozen DedupConfig
b=32/r=4 must be derivable, and the S-curve math must satisfy its
documented guarantees."""

import math

import pytest

from deduplicator_spark.config import DEFAULT
from deduplicator_spark.functions.lshplan import (
    candidate_prob,
    choose_lsh_params,
    error_profile,
    miss_prob,
)


def test_config_plan_is_derivable():
    # the frozen config's 32x4 must be what the chooser picks for the
    # config's own budget and threshold
    plan = choose_lsh_params(perms=DEFAULT.minhash_perms,
                             t=DEFAULT.jaccard_threshold)
    assert (plan.bands, plan.rows) == (DEFAULT.lsh_bands, DEFAULT.lsh_rows)
    # and the docstring's miss bound holds: P(miss | J=0.8) ~ 5e-8
    assert plan.miss_at_t < 1e-7


def test_scurve_identities():
    for s in (0.0, 0.3, 0.8, 1.0):
        assert math.isclose(
            candidate_prob(s, 32, 4) + miss_prob(s, 32, 4), 1.0)
    assert candidate_prob(1.0, 32, 4) == 1.0
    assert candidate_prob(0.0, 32, 4) == 0.0
    # monotone in s
    ps = [candidate_prob(s / 20, 32, 4) for s in range(21)]
    assert ps == sorted(ps)


def test_more_bands_trade_fn_for_fp():
    # at fixed rows, more bands can only lower FN and raise FP
    fn8, fp8 = error_profile(8, 4, 0.8)
    fn32, fp32 = error_profile(32, 4, 0.8)
    assert fn32 <= fn8 and fp32 >= fp8


def test_fn_weight_moves_toward_recall():
    lo = choose_lsh_params(perms=128, t=0.8, fn_weight=1.0)
    hi = choose_lsh_params(perms=128, t=0.8, fn_weight=1e6)
    assert hi.fn <= lo.fn


def test_infeasible_budget_raises():
    with pytest.raises(ValueError):
        # 1 permutation cannot commit to recall at t=0.8
        choose_lsh_params(perms=1, t=0.8, max_miss_at_t=1e-6)
