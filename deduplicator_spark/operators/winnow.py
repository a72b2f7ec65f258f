"""Winnowing document fingerprints (MOSS): local fingerprint selection with
a guarantee threshold, as pure JVM Column algebra.

Schleimer, Wilkerson, Aiken, SIGMOD'03 "Winnowing: Local Algorithms for
Document Fingerprinting" — the fourth candidate-generation strategy next to
the inverted-shingle join (exact, indexes every shingle), MinHash/LSH
(constant keys, probabilistic) and PPJoin (exact, prefix-only): hash every
k-char gram, slide a window of w consecutive gram hashes, and in each window
select the MINIMUM hash (rightmost on ties — "robust winnowing"). The
selected (hash, position) set is the document's fingerprint. Guarantees:
any shared substring of length >= t = w + k - 1 chars produces at least one
shared fingerprint (window guarantee), and no shared gram shorter than k
ever matches (noise floor). Density is 2/(w+1) — the fingerprint index is
~2n/(w+1) postings for n grams, vs n for the full inverted index.

Where the reference compares whole-payload digests (exact sha1 equality on
the always-indexed DIGEST field — IndexBuilder.java:209-212, lookup at
LuceneIndexSearcher.java:274-276), winnowing is the LOCAL generalization:
two documents match when they share any sufficiently long passage, without
the alignment step repeated-passage detection (operators/passages.py) pays.

Engine-portable arithmetic (the md5-conv pattern shared with the SimHash
tier) so the DuckDB oracle is integer-exact:

  gram hash  h = first 10 md5 hex chars as a 40-bit integer
  select key K[i] = (h_i + 1) * 2^20 - i        (i = 1-based gram position)
  window p   min(K[p .. p+w-1])                  -> smallest h, rightmost i
  decode     pos = 2^20 - K % 2^20,  h = (K + pos) / 2^20 - 1

min over K orders by (h asc, position desc) in one BIGINT compare — the
robust-winnowing tie-break with no struct ordering needed. Position space
2^20 caps a document at ~1M grams; longer texts are fingerprinted on their
first 2^20-1 grams (both engines truncate identically — at 100 TB the tail
of a >1 MB document adds recall no tier here targets).

100 TB shape: two narrow projections (grams -> keys -> selected keys are
per-row array ops inside whole-stage codegen, no shuffle), one explode +
groupBy for document frequency, hot fingerprints dropped above df_cap
(the same bounded-postings rule as every other tier — a boilerplate
passage shared by millions of docs must not go quadratic), one equi-join
on the capped postings, one groupBy count. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# position space per document: keys pack (hash, position) into one BIGINT
POS_SPACE = 1 << 20
POS_SHIFT = POS_SPACE.bit_length() - 1  # decode shift, derived so the two
                                        # constants can never drift apart

# 40-bit md5-derived gram hash, identical in DuckDB as
#   CAST('0x' || substr(md5(g), 1, 10) AS BIGINT)
_H40 = "CAST(conv(substring(md5({g}), 1, 10), 16, 10) AS BIGINT)"


def keys_expr(k: int, text: str = "t") -> str:
    """SQL expression: the per-gram packed key array over column ``text``."""
    m = POS_SPACE
    g = f"substring({text}, i, {k})"
    return (f"transform(sequence(1, least(length({text}) - {k} + 1,"
            f" {m - 1})), i -> ({_H40.format(g=g)} + 1) * {m}L - i)")


def selected_expr(w: int, keys: str = "ks") -> str:
    """SQL expression: per-window min over the key array ``keys`` (robust
    winnowing selection; duplicates across overlapping windows remain)."""
    return (f"transform(sequence(1, greatest(size({keys}) - {w} + 1, 1)), "
            f"p -> array_min(slice({keys}, p, {w})))")


def fp_array_expr(w: int, keys: str = "ks") -> str:
    """SQL expression: the DISTINCT decoded fingerprint hashes as an array —
    the per-row (streaming-safe, no shuffle) form of winnow_fingerprints."""
    m, s = POS_SPACE, POS_SHIFT
    decode = f"key -> shiftright(key + ({m} - pmod(key, {m}L)), {s}) - 1"
    return f"array_distinct(transform({selected_expr(w, keys)}, {decode}))"


def winnow_selected_keys(docs: DataFrame, k: int = 8, w: int = 9,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """(id, key) — the distinct selected winnowing keys per document.
    key encodes (gram hash, gram position); docs shorter than k chars have
    no gram and are absent. k/w give the substring-match guarantee
    t = w + k - 1 chars."""
    return (
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
        .filter(F.length("t") >= k)
        .withColumn("ks", F.expr(keys_expr(k)))
        .select("id", F.explode(F.expr(selected_expr(w))).alias("key"))
        .distinct()
    )


def winnow_fp_arrays(docs: DataFrame, k: int = 8, w: int = 9,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(id, fps) — each doc's distinct fingerprint hashes as one array,
    computed row-locally (works on STREAMING frames: no explode+distinct
    shuffle). Element sets equal winnow_fingerprints' fp column per doc."""
    return (
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
        .filter(F.length("t") >= k)
        .withColumn("ks", F.expr(keys_expr(k)))
        .select("id", F.expr(fp_array_expr(w)).alias("fps"))
    )


def winnow_fingerprints(docs: DataFrame, k: int = 8, w: int = 9,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """(id, fp, pos) — decoded winnowing fingerprints: 40-bit gram hash and
    the 1-based char position of the selected gram. Keys reach 2^60, past
    exact-double range, so the decode is integer shifts only."""
    sel = winnow_selected_keys(docs, k, w, id_col, text_col)
    pos = F.lit(POS_SPACE) - F.pmod(F.col("key"), F.lit(POS_SPACE))
    fp = F.shiftright(F.col("key") + pos, POS_SHIFT) - F.lit(1)
    return sel.select("id", fp.alias("fp"), pos.alias("pos"))


def capped_postings(fp: DataFrame, df_cap: int) -> DataFrame:
    """Drop fingerprints held by more than df_cap documents from a distinct
    (…, fp) postings frame — THE bounded-join rule of the winnow tier,
    shared by the pairs self-join, the batch probe and the streaming index
    so the three (and their oracles, which mirror it) can never drift."""
    rare = (fp.groupBy("fp").agg(F.count("*").alias("df"))
            .filter(F.col("df") <= df_cap).select("fp"))
    # rare's cardinality tracks the corpus's fingerprint count — keep it off
    # the driver-broadcast path (BENCH/SF100X_GATE.md hazard)
    return fp.join(rare.hint("shuffle_hash"), "fp")


def winnow_pairs(docs: DataFrame, k: int = 8, w: int = 9,
                 df_cap: int = 16, min_shared: int = 3,
                 id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """All document pairs sharing >= min_shared distinct fingerprint hashes:
    (id_a, id_b, shared, n_a, n_b). n_* is each doc's distinct-fingerprint
    count BEFORE the df cap (a stable per-doc property); shared is counted
    on the capped postings, so a fingerprint appearing in more than df_cap
    documents contributes to no pair (bounded join, mirrored by the
    oracle)."""
    fp = (
        winnow_fingerprints(docs, k, w, id_col, text_col)
        .select("id", "fp")
        .distinct()
        .persist()
    )
    n = fp.groupBy("id").agg(F.count("*").alias("n"))
    # distinct-doc df == plain count(*) here (fp is distinct per doc)
    post = capped_postings(fp, df_cap)
    pairs = (
        post.alias("a")
        .join(post.alias("b"),
              (F.col("a.fp") == F.col("b.fp"))
              & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    return (
        pairs
        .join(n.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a"),
              "id_a")
        .join(n.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b"),
              "id_b")
        .select("id_a", "id_b", "shared", "n_a", "n_b")
    )
