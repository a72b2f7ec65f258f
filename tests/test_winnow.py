"""Winnowing fingerprints (operators/winnow.py) vs a pure-Python reference
implementation of robust winnowing (Schleimer et al. SIGMOD'03, Fig. 6
semantics: per window select the minimum gram hash, rightmost on ties)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from deduplicator_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_pairs,
)


def _h40(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:10], 16)


def py_winnow(text: str, k: int = 8, w: int = 9) -> set[tuple[int, int]]:
    """Reference robust winnowing: {(hash, 1-based char pos)}."""
    if len(text) < k:
        return set()
    hs = [_h40(text[i:i + k]) for i in range(len(text) - k + 1)]
    sel = set()
    for p in range(max(len(hs) - w + 1, 1)):
        win = hs[p:p + w]
        mn = min(win)
        j = max(i for i, h in enumerate(win) if h == mn)  # rightmost min
        sel.add((mn, p + j + 1))
    return sel


TEXTS = [
    "the quick brown fox jumps over the lazy dog again and again",
    "the quick brown fox jumps over the lazy dog again and again",
    "a quick brown fox jumps over the lazy dog again and often",
    "completely different content with nothing shared at all here",
    "short",  # < k chars: no grams, no fingerprints
    "aaaaaaaaaaaaaaaaaaaaaaaa",  # all grams identical: tie-break stress
    "abababababababababababab",  # period-2 repeat: 2 distinct grams
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_fingerprints_match_python_reference(docs):
    got = {(r.id, r.fp, r.pos)
           for r in winnow_fingerprints(docs).collect()}
    want = set()
    for i, t in enumerate(TEXTS):
        want |= {(i, h, p) for h, p in py_winnow(t)}
    assert got == want


def test_window_guarantee_and_noise_floor(spark):
    # two texts sharing a 16-char passage (= w + k - 1) MUST share a
    # fingerprint; sharing only 7 chars (< k) must NEVER match
    shared = "XCOMMONPASSAGEQZ"  # 16 chars
    assert len(shared) == 16
    a = "left padding 111 " + shared + " right tail one"
    b = "other padd 22222 " + shared + " different end"
    c = "no overlap here beyond seven: " + shared[:7] + " zzz qqq"
    df = spark.createDataFrame(
        [(0, a), (1, b), (2, c)], "doc_id long, text string")
    fps = winnow_fingerprints(df).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.id, set()).add(r.fp)
    assert by_doc[0] & by_doc[1], "window guarantee violated"
    # doc 2 shares < k chars of the passage with a's copy: any accidental
    # overlap must come from elsewhere — the passage grams cannot match
    passage_hashes = {_h40(shared[i:i + 8]) for i in range(len(shared) - 7)}
    assert not (by_doc[2] & passage_hashes & by_doc[0])


def test_pairs_min_shared_and_df_cap(docs):
    # min_shared=1: exact dup pair (0,1) present with shared == n
    rows = {(r.id_a, r.id_b): r for r in
            winnow_pairs(docs, min_shared=1).collect()}
    assert (0, 1) in rows
    r = rows[(0, 1)]
    assert r.shared == r.n_a == r.n_b > 0
    # doc 3 (novel) never pairs with 0/1/2
    assert not any(3 in k for k in rows)
    # df_cap=1: every fingerprint shared by 2+ docs is dropped -> no pairs
    assert winnow_pairs(docs, df_cap=1, min_shared=1).count() == 0


def test_randomized_equality_with_reference(spark):
    # one batch of seeded random strings over alphabets chosen to stress
    # hash ties (binary alphabet -> few distinct grams -> many windows
    # where the rightmost-min tie-break decides) and boundary lengths
    # around k and k+w-1
    import random

    rng = random.Random(1234)
    alphabets = ["ab", "abc ", "abcdefgh ", "aa ab"]
    texts = []
    for i in range(60):
        alpha = alphabets[i % len(alphabets)]
        n = rng.choice([7, 8, 9, 15, 16, 17, 40, 200])
        texts.append("".join(rng.choice(alpha) for _ in range(n)))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {(r.id, r.fp, r.pos) for r in winnow_fingerprints(df).collect()}
    want = set()
    for i, t in enumerate(texts):
        want |= {(i, h, p) for h, p in py_winnow(t)}
    assert got == want


@pytest.mark.slow
def test_pipeline_winnow_tier_catches_subthreshold_paraphrases(spark):
    # the optional 5th tier's contract: with winnow enabled, the ONLY new
    # duplicates over the 4-tier default are the planted sub-Jaccard-
    # threshold paraphrases (near_caption_below — anti-pairs for the
    # whole-set Jaccard contract, true passage-level dups for this one);
    # nothing unrelated merges (the winnow_min_score gate holds against
    # the caption-template boilerplate every synth caption shares)
    from deduplicator_spark.plans.pipeline import run_pipeline
    from deduplicator_spark.synth import _kind, synthesize_images

    imgs = synthesize_images(spark, 400).persist()
    r5 = run_pipeline(imgs, tiers=("exact", "near_image", "near_caption",
                                   "containment", "winnow"))
    r4 = run_pipeline(imgs)
    d5 = {r.image_id for r in
          r5.verdicts.filter("verdict = 'duplicate'").collect()}
    d4 = {r.image_id for r in
          r4.verdicts.filter("verdict = 'duplicate'").collect()}
    assert d4 <= d5, "adding a tier must never lose duplicates"
    extra_kinds = {_kind(int(i.split("-")[1])) for i in d5 - d4}
    assert extra_kinds == {"near_caption_below"}
    imgs.unpersist()


def test_density_bound(spark):
    # fingerprint count per doc is ~2n/(w+1) selected keys, never more than
    # the number of windows (one selection per window)
    import random

    rng = random.Random(7)
    text = "".join(rng.choice("abcdefgh ") for _ in range(2000))
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    n_fp = winnow_fingerprints(df, k=8, w=9).count()
    n_windows = (len(text) - 8 + 1) - 9 + 1
    assert 0 < n_fp <= n_windows
    # expected density 2/(w+1) = 0.2; allow generous slack both ways
    assert n_fp < 0.5 * n_windows
