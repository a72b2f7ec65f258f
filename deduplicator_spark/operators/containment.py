"""Tier 3 — containment: a short caption embedded in a long caption.

Jaccard under-scores containment (a 40-token caption inside a 200-token one
has J ~= 0.2 but containment |A∩B|/|A| = 1.0), so long captions get their own
pass. The north star names a suffix-array pass; the *distributed* shape is an
inverted probe: the short side exposes its p smallest shingle-hashes (a
deterministic sample that any superset must also contain — the min of a
hashed set is order-free), the long side exposes all shingle hashes, the
candidate join is (hash) equi-join, and verification is exact shingle-set
containment. A partition-local suffix-array verifier (mapInPandas) confirms
*verbatim* substring containment for verified pairs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT, DedupConfig
from .candidates import canonical_pairs, cap_per_key


def containment_pairs(images: DataFrame, cfg: DedupConfig = DEFAULT,
                      prepared: DataFrame | None = None,
                      verbatim: bool | None = None,
                      flag_verbatim: bool = False) -> DataFrame:
    """(id_a, id_b, tier='containment', score=|A∩B|/|A|) with short ⊆-ish long.

    id_a/id_b keep canonical order; the *short* side is the contained one.
    Works on the hashed shingle sets from prepared_features (sh_hashes is
    SORTED, so the 4 smallest hashes — a deterministic sample any superset
    must also contain: if A ⊆ B then min_p(h(A)) ⊆ h(B) — are a plain
    slice(1..4)). Pass a persisted ``prepared`` to share the caption scan
    with tier 2.

    ``verbatim`` (default ``cfg.containment_verbatim``) additionally runs
    verify_substring_pairs on the shingle-verified pairs: the short caption
    must appear as a contiguous token sequence in the long one (space-padded
    so token boundaries can't false-match), rejecting scattered-fragment
    containment. Runs only on verified candidates — tiny relative to n.

    ``flag_verbatim`` keeps ALL set-gate pairs and adds an ``is_verbatim``
    boolean column instead of filtering (one pass over the tier; combine
    with ``verbatim=False`` to let the caller decide per pair)."""
    from .minhash import prepared_features

    if cfg.containment_max_short_tokens >= cfg.containment_min_long_tokens:
        # overlapping roles would let a pair survive in BOTH orientations
        # and the canonical join at the end would emit duplicate
        # (id_a, id_b) rows with conflicting scores
        raise ValueError(
            "containment_max_short_tokens must be < "
            "containment_min_long_tokens (got "
            f"{cfg.containment_max_short_tokens} >= "
            f"{cfg.containment_min_long_tokens})")
    sh = prepared if prepared is not None else prepared_features(images, cfg)
    short = sh.filter(F.col("n_tok") <= cfg.containment_max_short_tokens)
    long_ = sh.filter(F.col("n_tok") >= cfg.containment_min_long_tokens)

    probe = short.select(
        F.col("image_id").alias("id_s"),
        F.explode(F.slice("sh_hashes", 1, 4)).alias("hash"),
    )
    target = long_.select(
        F.col("image_id").alias("id_l"),
        F.explode("sh_hashes").alias("hash"),
    )
    # cap each hash's posting list (smallest ids win, deterministic): one
    # boilerplate shingle shared by millions of long docs must not make the
    # probe join quadratic. A capped hash can only lose candidates whose
    # OTHER 3 probe hashes are also capped-hot — boilerplate-on-boilerplate,
    # which the LSH tier already covers.
    target = cap_per_key(target, ["hash"], [F.col("id_l").asc()],
                         cfg.containment_posting_cap)
    cands = probe.join(target, "hash").select("id_s", "id_l").distinct()

    a = short.select(F.col("image_id").alias("id_s"), F.col("sh_hashes").alias("sh_s"))
    b = long_.select(F.col("image_id").alias("id_l"), F.col("sh_hashes").alias("sh_l"))
    inter = F.size(F.array_intersect(F.col("sh_s"), F.col("sh_l")))
    # cands: aggregated (distinct) string-id pair table, corpus-growing —
    # same broadcast bar as jaccard_verify (BENCH/SF100X_GATE.md); the
    # second join is sort-merge because the left now carries sh_s arrays
    verified = (
        cands.hint("shuffle_hash").join(a, "id_s")
        .hint("merge").join(b, "id_l")
        .withColumn("containment", inter / F.greatest(F.size("sh_s"), F.lit(1)))
        .filter(F.col("containment") >= cfg.containment_threshold)
    )
    if verbatim is None:
        verbatim = cfg.containment_verbatim
    if verbatim or flag_verbatim:
        # whitespace-normalized + space-padded: str.find then means "the
        # short side's token sequence appears contiguously in the long one",
        # using the SAME tokens() convention (split after space-trim) the
        # shingles were built from — both paths keep an empty token for
        # tab/newline-edged captions, so containment and verbatim agree
        norm = lambda c: F.concat(F.lit(" "),
                                  F.concat_ws(" ", F.split(F.trim(c), r"\s+")),
                                  F.lit(" "))
        caps = images.select("image_id", norm(F.col("caption")).alias("_t"))
        texted = (
            verified.select("id_s", "id_l")
            .join(caps.select(F.col("image_id").alias("id_s"),
                              F.col("_t").alias("text_short")), "id_s")
            .join(caps.select(F.col("image_id").alias("id_l"),
                              F.col("_t").alias("text_long")), "id_l")
        )
        checked = verify_substring_pairs(
            texted.select(F.col("id_s").alias("id_a"),
                          F.col("id_l").alias("id_b"),
                          "text_short", "text_long"),
            method=cfg.containment_sub_method,
        ).select(F.col("id_a").alias("id_s"), F.col("id_b").alias("id_l"),
                 F.col("is_substring"))
        # every verified pair has both captions, so this join is lossless
        verified = verified.join(checked, ["id_s", "id_l"])
        if verbatim:
            verified = verified.filter(F.col("is_substring"))
    carry = ["is_substring"] if flag_verbatim else []
    out_cols = [F.col("is_substring").alias("is_verbatim")] if flag_verbatim else []
    return (
        canonical_pairs(verified.select(F.col("id_s").alias("id_a"), F.col("id_l").alias("id_b")))
        .join(
            verified.select(
                F.least("id_s", "id_l").alias("id_a"),
                F.greatest("id_s", "id_l").alias("id_b"),
                "containment", *carry,
            ),
            ["id_a", "id_b"],
        )
        .select("id_a", "id_b", F.lit("containment").alias("tier"),
                F.col("containment").alias("score"), *out_cols)
    )


def suffix_array(text: str) -> np.ndarray:
    """Suffix array of ``text`` by vectorized prefix doubling — O(n log n)
    numpy rounds, no per-character Python. Returns the int64 array of suffix
    start offsets in lexicographic (byte-wise, UTF-8) suffix order.

    This is the north star's 'suffix-array substring pass' primitive: the
    array is built ONCE per long caption, then every short-caption probe is
    an O(m log n) binary search (C-level slice comparisons), so a long doc
    with f candidate shorts costs n log n + f·m log n instead of find()'s
    f·(n+m)."""
    data = text.encode("utf-8")
    n = len(data)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    k = 1
    while True:
        # secondary key: rank of the suffix k bytes further in
        # (-1 == past the end, sorts first)
        r2 = np.full(n, -1, dtype=np.int64)
        r2[: n - k] = rank[k:]
        order = np.lexsort((r2, rank))
        head, tail = rank[order], r2[order]
        bumped = np.ones(n, dtype=np.int64)
        bumped[0] = 0
        bumped[1:] = (head[1:] != head[:-1]) | (tail[1:] != tail[:-1])
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[order] = np.cumsum(bumped)
        if new_rank[order[-1]] == n - 1:  # all ranks distinct -> done
            return order
        rank = new_rank
        k *= 2


def sa_contains(data: bytes, sa: np.ndarray, pattern: str) -> bool:
    """Binary search ``sa`` (suffix array of ``data``) for any suffix that
    starts with ``pattern``. Empty pattern is trivially contained."""
    pat = pattern.encode("utf-8")
    if not pat:
        return True
    lo, hi = 0, len(sa)
    m = len(pat)
    while lo < hi:
        mid = (lo + hi) // 2
        start = sa[mid]
        chunk = data[start : start + m]
        if chunk == pat:
            return True
        if chunk < pat:
            lo = mid + 1
        else:
            hi = mid
    return False


def verify_substring_pairs(pairs_with_text: DataFrame,
                           method: str = "find") -> DataFrame:
    """Verbatim-substring check via partition-local suffix search.

    Input: (id_a, id_b, text_short, text_long); output adds is_substring.

    method='find' (default): Python's str.find, a C-level two-way string
    search per pair — optimal when fan-out per long caption is low, which
    the shingle gate guarantees at sandbox scale.

    method='suffix_array': the north star's suffix-array pass — pairs are
    grouped by long caption inside each Arrow batch (callers should
    repartition by id_b first so one long doc's candidates co-locate), the
    suffix array is built once per distinct long caption, and every short
    probe is an O(m log n) binary search. Wins when boilerplate long docs
    attract many candidates each (f·m log n vs find's f·n). Both methods
    return identical flags (pinned by test_substring_methods_agree).

    At cluster scale this runs only on tier-3 verified candidates (tiny
    relative to n).
    """
    if method not in ("find", "suffix_array"):
        raise ValueError(f"unknown substring method: {method!r}")

    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if method == "suffix_array":
                found = np.empty(len(pdf), dtype=bool)
                pos = {c: i for i, c in enumerate(pdf.columns)}
                rows = pdf.itertuples(index=False)
                by_long: dict[str, list[tuple[int, str]]] = {}
                for i, row in enumerate(rows):
                    by_long.setdefault(row[pos["text_long"]], []).append(
                        (i, row[pos["text_short"]]))
                for t_long, probes in by_long.items():
                    data = t_long.encode("utf-8")
                    sa = suffix_array(t_long)
                    for i, t_short in probes:
                        found[i] = sa_contains(data, sa, t_short)
                found = found.tolist()
            else:
                found = [
                    t_long.find(t_short) >= 0
                    for t_short, t_long in zip(pdf["text_short"], pdf["text_long"])
                ]
            out = pdf[["id_a", "id_b"]].copy()
            out["is_substring"] = found
            yield out

    pairs = pairs_with_text
    if method == "suffix_array":
        # co-locate each long doc's probes so its suffix array builds once
        pairs = pairs.repartition("id_b")
    return pairs.mapInPandas(
        check, schema="id_a string, id_b string, is_substring boolean"
    )
