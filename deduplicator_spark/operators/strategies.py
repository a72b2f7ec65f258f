"""The reference's four search strategies as join-shape functions (SURVEY §2.4).

SearchStrategy (deduplicator-commons/.../SearchStrategy.java:3-30) defines how
a probe record is matched against the index; each returns at most one match
per probe (top-1: LuceneIndexSearcher.java:285-296 searches with limit 1).
Set-oriented re-expression: equi-join + row_number window. The probe table
replaces Heritrix's one-URI-at-a-time loop (DeDuplicator.java:149-192).

Index schema: (url, url_canon, digest, ts, etag, record_id) — INDEX_SCHEMA,
mirroring IndexFields.java:22-39. Probe: same keys + probe_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_IDX_COLS = ("url", "url_canon", "digest", "ts", "etag", "record_id")


def _idx(index: DataFrame) -> DataFrame:
    return index.select(
        *[F.col(c).alias(f"idx_{c}") for c in _IDX_COLS if c in index.columns]
    )


def _top1(joined: DataFrame, probe_id: str, order_cols: list) -> DataFrame:
    w = Window.partitionBy(probe_id).orderBy(*order_cols)
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def lookup_url_exact(probe: DataFrame, index: DataFrame,
                     probe_id: str = "probe_id") -> DataFrame:
    """J1 — URL_EXACT: both URL and digest must match
    (LuceneIndexSearcher.java:247-252). Left join: unmatched probes keep NULL
    idx_* columns (verdict 'novel')."""
    idx = _idx(index)
    joined = probe.join(
        idx,
        (probe["url"] == idx["idx_url"]) & (probe["digest"] == idx["idx_digest"]),
        "left",
    )
    return _top1(joined, probe_id,
                 [F.col("idx_ts").desc_nulls_last(), F.col("idx_record_id").asc_nulls_last()])


def lookup_url_canonical(probe: DataFrame, index: DataFrame,
                         probe_id: str = "probe_id") -> DataFrame:
    """J2 — URL_CANONICAL: canonicalized URL + digest
    (LuceneIndexSearcher.java:254-259)."""
    idx = _idx(index)
    joined = probe.join(
        idx,
        (probe["url_canon"] == idx["idx_url_canon"])
        & (probe["digest"] == idx["idx_digest"]),
        "left",
    )
    return _top1(joined, probe_id,
                 [F.col("idx_ts").desc_nulls_last(), F.col("idx_record_id").asc_nulls_last()])


def lookup_digest_any(probe: DataFrame, index: DataFrame,
                      probe_id: str = "probe_id") -> DataFrame:
    """J3 — DIGEST_ANY: digest alone; any hit is a duplicate; deterministic
    top-1 (LuceneIndexSearcher.java:274-276; default strategy,
    profile-crawler-beans.cxml:46)."""
    idx = _idx(index)
    joined = probe.join(idx, probe["digest"] == idx["idx_digest"], "left")
    return _top1(joined, probe_id,
                 [F.col("idx_ts").desc_nulls_last(), F.col("idx_record_id").asc_nulls_last()])


def lookup_digest_url_preferred(probe: DataFrame, index: DataFrame,
                                probe_id: str = "probe_id") -> DataFrame:
    """J4 — DIGEST_URL_PREFERRED: digest MUST match; exact-URL then
    canonical-URL matches are *preferred* (Lucene SHOULD-term boosting,
    LuceneIndexSearcher.java:261-272) — a preference, not a guarantee.
    SHOULD terms degrade gracefully: a preference column absent from the
    index (not indexed) simply contributes no boost, mirroring Lucene."""
    idx = _idx(index)
    joined = probe.join(idx, probe["digest"] == idx["idx_digest"], "left")
    order = []
    if "url" in probe.columns and "idx_url" in idx.columns:
        order.append((probe["url"] == idx["idx_url"]).cast("int").desc_nulls_last())
    if "url_canon" in probe.columns and "idx_url_canon" in idx.columns:
        order.append((probe["url_canon"] == idx["idx_url_canon"]).cast("int").desc_nulls_last())
    order += [
        F.col("idx_ts").desc_nulls_last(),
        F.col("idx_record_id").asc_nulls_last(),
    ]
    return _top1(joined, probe_id, order)


STRATEGIES = {
    "URL_EXACT": lookup_url_exact,
    "URL_CANONICAL": lookup_url_canonical,
    "DIGEST_ANY": lookup_digest_any,
    "DIGEST_URL_PREFERRED": lookup_digest_url_preferred,
}


class StrategyLegalityError(ValueError):
    """Typed analog of the reference's open-time legality verification
    (LuceneIndexSearcher.java:131-170): DIGEST must always be indexed
    (:135-137, hard failure), and URL strategies are refused when the URL /
    canonical-URL fields were not indexed (:158-170)."""


# MUST-term columns per strategy (digest is universally mandatory);
# DIGEST_URL_PREFERRED's url columns are SHOULD terms, so not required here
_REQUIRED_INDEX_COLS = {
    "URL_EXACT": ("url",),
    "URL_CANONICAL": ("url_canon",),
    "DIGEST_ANY": (),
    "DIGEST_URL_PREFERRED": (),
}


def check_strategy_legality(index: DataFrame, strategy: str) -> None:
    """Raise StrategyLegalityError when the index schema cannot serve the
    strategy — the set-oriented form of refusing to open the searcher."""
    if strategy not in STRATEGIES:
        raise StrategyLegalityError(
            f"unknown strategy {strategy!r}; expected one of {sorted(STRATEGIES)}")
    if "digest" not in index.columns:
        raise StrategyLegalityError(
            "index does not contain the mandatory 'digest' column "
            "(LuceneIndexSearcher.java:135-137)")
    missing = [c for c in _REQUIRED_INDEX_COLS[strategy] if c not in index.columns]
    if missing:
        raise StrategyLegalityError(
            f"strategy {strategy} requires indexed column(s) {missing} "
            "(LuceneIndexSearcher.java:158-170)")


def lookup(probe: DataFrame, index: DataFrame, strategy: str = "DIGEST_ANY",
           probe_id: str = "probe_id") -> DataFrame:
    """Strategy dispatch — the Index interface (Index.java:5-22) + the
    switch(strategy) of LuceneIndexSearcher.java:226-239, guarded by the
    legality matrix."""
    check_strategy_legality(index, strategy)
    return STRATEGIES[strategy](probe, index, probe_id)


def lookup_with_bloom_gate(probe: DataFrame, index: DataFrame,
                           strategy: str = "DIGEST_ANY",
                           probe_id: str = "probe_id"):
    """F10 + A8 — the Bloom definite-miss short-circuit with an observable
    hit counter (LuceneIndexSearcher.java:172-199 builds the sidecar,
    :221-224 consults it, :333-335 reports the count).

    Set-oriented form: probes whose digest cannot be in the index
    (left_anti against the distinct digest set — Spark additionally applies
    runtime bloom-filter pruning to this join, session.py) skip the strategy
    join entirely and get their novel verdict directly; the rest go through
    the full lookup. Returns (matched_df, Observation) — after the caller
    materializes the result, ``observation.get["bloom_short_circuited"]``
    is the A8 counter (the observe() analog of the reference AtomicLong).
    """
    from pyspark.sql import Observation

    check_strategy_legality(index, strategy)
    obs = Observation()
    digests = index.select("digest").distinct()
    hits = probe.join(digests, "digest", "left_semi")
    misses = probe.join(digests, "digest", "left_anti").observe(
        obs, F.count(F.lit(1)).alias("bloom_short_circuited")
    )
    matched_hits = STRATEGIES[strategy](hits, index, probe_id)
    # null literals for the miss side take their types from the hit side's
    # actual schema — an index with non-string etag/record_id (or a custom
    # idx_ column type) unions cleanly instead of failing at plan time
    probe_cols = set(misses.columns)
    null_idx = [F.lit(None).cast(f.dataType).alias(f.name)
                for f in matched_hits.schema.fields
                if f.name not in probe_cols]
    matched_misses = misses.select("*", *null_idx)
    return matched_hits.unionByName(matched_misses), obs


def classify_verdicts(matched: DataFrame) -> DataFrame:
    """A1 — 3-way duplicate classification (DeDuplicator.java:194-205):
    exact-URL dup / canonical-URL dup / digest-only dup, plus 'novel' for
    no-match rows. Adds verdict + dup_class + refers_to_* lineage (K2/K3)."""
    has = F.col("idx_digest").isNotNull()
    return matched.select(
        "*",
        F.when(~has, F.lit("novel")).otherwise(F.lit("duplicate")).alias("verdict"),
        F.when(~has, F.lit(None).cast("string"))
        .when(F.col("url") == F.col("idx_url"), F.lit("exact_url"))
        .when(F.col("url_canon") == F.col("idx_url_canon"), F.lit("canonical_url"))
        .otherwise(F.lit("digest_only"))
        .alias("dup_class"),
        F.when(has, F.col("idx_url")).alias("refers_to_uri"),
        F.when(has, F.col("idx_ts")).alias("refers_to_date"),
        F.when(has, F.col("idx_record_id")).alias("refers_to_record_id"),
    )


def dup_stats(verdicts: DataFrame, bytes_col: str = "bytes_len") -> DataFrame:
    """A1/A2/A3 — per-class counts + byte sums (AtomicLong counters,
    DeDuplicator.java:54-94, set-oriented)."""
    return (
        verdicts.groupBy("dup_class")
        .agg(F.count("*").alias("n"), F.sum(bytes_col).alias("bytes_total"))
    )


def last_wins_upsert(index: DataFrame, updates: DataFrame,
                     keys: tuple[str, ...] = ("url", "digest"),
                     order_col: str = "ts") -> DataFrame:
    """A5/A6 — delete-then-add upsert: a re-occurrence of the key replaces the
    prior entry (IndexBuilder.java:227-236; manual.md:149-150). On Iceberg
    this is MERGE INTO; engine-agnostic batch form: union + keep latest per
    key with a deterministic tie-break."""
    merged = index.unionByName(updates)
    w = Window.partitionBy(*keys).orderBy(
        F.col(order_col).desc(), F.col("record_id").desc()
    )
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
