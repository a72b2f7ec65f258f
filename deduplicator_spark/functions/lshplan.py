"""LSH band-plan chooser: pick (bands, rows) for a MinHash signature by
minimizing the S-curve's weighted error around the target Jaccard threshold.

The frozen DedupConfig pins b=32, r=4 for 128 permutations at t=0.8
(config.py). This module is the derivation for that choice — and the tool
for re-deriving it when a deployment changes the threshold or the
signature budget — instead of folklore constants:

    P(candidate | J=s) = 1 - (1 - s^r)^b          (the LSH S-curve)

    FN(b, r) = integral over s in [t, 1]  of  1 - P(cand | s)
    FP(b, r) = integral over s in [0, t)  of      P(cand | s)

    cost = fn_weight * FN + FP,   over all (b, r) with b*r <= perms

fn_weight > 1 encodes that dedup misses (recall loss, the north rule's
>= 0.99 bound) hurt more than false candidates (bounded extra verify work:
every candidate is exact-verified downstream, so FP costs compute only,
never correctness). Driver-side planning arithmetic — nothing here touches
a DataFrame; the chosen plan is frozen into DedupConfig so the pipeline,
pytest oracle and DuckDB oracle can never drift (SURVEY §7.4 #4).
"""

from __future__ import annotations

from dataclasses import dataclass


def candidate_prob(s: float, bands: int, rows: int) -> float:
    """P(some band agrees | Jaccard = s) = 1 - (1 - s^rows)^bands."""
    return 1.0 - (1.0 - s ** rows) ** bands


def miss_prob(s: float, bands: int, rows: int) -> float:
    """P(pair at Jaccard s is never a candidate)."""
    return (1.0 - s ** rows) ** bands


def error_profile(bands: int, rows: int, t: float,
                  steps: int = 2000) -> tuple[float, float]:
    """(fn, fp): the INTEGRAL of the miss probability over s in [t, 1] and
    of the candidate probability over s in [0, t) — midpoint rule,
    deterministic. True integrals (mean x interval length), so the header's
    cost formula fn_weight * FN + FP holds literally: a mean-based variant
    would silently rescale fn_weight by t/(1-t)."""
    fn = fp = 0.0
    n_hi = max(int(round(steps * (1.0 - t))), 1)
    for i in range(n_hi):
        s = t + (1.0 - t) * (i + 0.5) / n_hi
        fn += miss_prob(s, bands, rows)
    n_lo = max(int(round(steps * t)), 1)
    for i in range(n_lo):
        s = t * (i + 0.5) / n_lo
        fp += candidate_prob(s, bands, rows)
    return fn / n_hi * (1.0 - t), fp / n_lo * t


@dataclass(frozen=True)
class LshPlan:
    bands: int
    rows: int
    fn: float           # integral of miss prob over [t, 1]
    fp: float           # integral of candidate prob over [0, t)
    miss_at_t: float    # miss prob exactly at the threshold
    cost: float


def choose_lsh_params(perms: int = 128, t: float = 0.8,
                      fn_weight: float = 100.0,
                      max_miss_at_t: float = 1e-6) -> LshPlan:
    """Best (bands, rows) with bands*rows <= perms: exhaustive over the
    (at most perms) divisor-free grid — rows from 1..perms, bands =
    perms // rows (always use the whole signature budget; fewer bands than
    the budget allows is never optimal for FN and only lowers FP, which
    the weight already arbitrates). Plans whose miss probability AT the
    threshold exceeds max_miss_at_t are rejected outright — the S-curve
    must have committed to recall by s = t, not merely 'on average past
    t': the north rule's recall >= 0.99 is a bound on pairs at the
    threshold, so the default rejection bound sits 4 orders of magnitude
    under the 1e-2 recall allowance. Under that constraint the choice is
    weight-insensitive (for perms=128, t=0.8 every fn_weight in 1..1000
    lands on 32x4 — the frozen config). Ties break to fewer rows: rows
    ascend and strict < keeps the incumbent."""
    best: LshPlan | None = None
    for rows in range(1, perms + 1):
        bands = perms // rows
        m_t = miss_prob(t, bands, rows)
        if m_t > max_miss_at_t:
            continue
        fn, fp = error_profile(bands, rows, t)
        cost = fn_weight * fn + fp
        if best is None or cost < best.cost:
            best = LshPlan(bands, rows, fn, fp, m_t, cost)
    if best is None:
        raise ValueError(
            f"no (bands, rows) plan under {perms} perms holds "
            f"miss(t={t}) <= {max_miss_at_t}; raise perms or the bound")
    return best
