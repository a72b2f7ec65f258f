"""Corpus-level repeated-passage detection: the exact-substring dedup pass
(Lee et al., "Deduplicating Training Data Makes Language Models Better" —
suffix-array ExactSubstr) re-expressed as set-oriented DataFrame algebra.

Where the tier-3 containment operator (operators/containment.py) asks "is
doc A wholly inside doc B", this asks the finer-grained question every
training pipeline also needs: WHICH token spans of each document are
verbatim repeats of text occurring elsewhere in the corpus (boilerplate
headers, license blocks, syndicated paragraphs), so they can be cut or
down-weighted without dropping the document.

Algorithm (equivalent to the suffix-array scan for fixed minimum length k,
but in three shuffles instead of a global sort):
  1. explode every k-token window with its start position;
  2. a window gram is REPEATED if it occurs >= 2 times corpus-wide
     (cross-document or within-document — both are training repeats);
  3. per document, merge repeated windows whose k-token coverages overlap
     or touch (gaps-and-islands: a new island starts where the gap between
     start positions exceeds k) into maximal disjoint spans; a span [s, e]
     certifies every token s..e lies inside some window occurring elsewhere.

100 TB shape: stage 2 is one groupBy(gram) with map-side partial counts
(a boilerplate gram collapses to one (gram, count) row per map partition
before the shuffle — hot grams cost bandwidth O(partitions), not O(rows));
the repeated-gram set joins back by SHUFFLED-HASH equi-join (hot is the
per-partition build side — its cardinality grows with the corpus, so the
driver-broadcast path is explicitly barred; runtime bloom filter still
prunes, session.py) and stage 3 shuffles each doc's matched positions once, bounded
by document length. No sort of the corpus, no suffix array materialization
— the reference point for THAT approach is the per-pair verifier
operators/containment.py:verify_substring_pairs (numpy prefix-doubling),
which this operator deliberately avoids on the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import tokens

REPEAT_K = 5  # minimum verbatim run, in tokens


def window_grams(docs: DataFrame, k: int = REPEAT_K,
                 id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, pos, gram): every k-token window of every document with its
    0-based start position. Documents shorter than k tokens have no window
    and drop out (they cannot contain a k-token repeat)."""
    t = tokens(F.col(text_col))
    windows = F.transform(
        F.sequence(F.lit(1), F.size(t) - k + 1),
        lambda i: F.concat_ws(" ", F.slice(t, i, k)),
    )
    return (
        docs.filter(F.size(t) >= k)
        .select(id_col, F.posexplode(windows).alias("pos", "gram"))
        .select(id_col, F.col("pos").cast("long").alias("pos"), "gram")
    )


def spans_from_positions(hits: DataFrame, k: int = REPEAT_K,
                         id_col: str = "doc_id") -> DataFrame:
    """Gaps-and-islands merge of matched k-token window START positions into
    maximal DISJOINT spans: (id, span_start, span_end, span_tokens), tokens
    span_start..span_end 0-based inclusive. A window at pos covers
    pos..pos+k-1, so the next window merges iff its start is <= pos + k
    (overlap or exact adjacency) — disjointness means coverage sums never
    double-count. Shared by the corpus-repeat pass (repeated_passages) and
    eval-span decontamination (plans/curate.eval_contaminated_spans)."""
    w = Window.partitionBy(id_col).orderBy("pos")
    new_isl = (F.col("pos") - F.lag("pos").over(w) > k).cast("long")
    isl = hits.withColumn(
        "_grp",
        F.sum(F.coalesce(new_isl, F.lit(1)))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        isl.groupBy(id_col, "_grp")
        .agg(F.min("pos").alias("span_start"),
             (F.max("pos") + k - 1).alias("span_end"))
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
    )


def repeated_passages(docs: DataFrame, k: int = REPEAT_K,
                      min_count: int = 2,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Maximal repeated spans per document:
    (doc_id, span_start, span_end, span_tokens), where tokens
    span_start..span_end (0-based, inclusive) occur verbatim at least
    ``min_count`` times corpus-wide in windows of ``k`` tokens."""
    g = window_grams(docs, k, id_col, text_col)
    hot = (
        g.groupBy("gram").agg(F.count("*").alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select("gram")
    )
    # hot's cardinality grows with the corpus (every boilerplate/syndicated
    # gram lands in it), so it must NEVER ride the driver-broadcast path:
    # at 100x gate scale AQE's post-shuffle size estimate still slipped it
    # under the broadcast threshold and the driver OOM'd building the
    # relation (BENCH/SF100X_GATE.md). A shuffled hash join with hot as the
    # per-partition build side bounds memory by partition, not by driver,
    # and the runtime bloom filter still prunes g's side of the shuffle.
    rep = g.join(hot.hint("shuffle_hash"), "gram").select(id_col, "pos")
    return spans_from_positions(rep, k, id_col)


def repeated_token_fraction(docs: DataFrame, k: int = REPEAT_K,
                            min_count: int = 2,
                            id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """Per-document repeated-coverage summary (the quality-filter signal):
    (doc_id, n_tokens, repeated_tokens, repeated_frac). Documents with no
    repeated span report 0 / 0.0 — one row per input document."""
    spans = repeated_passages(docs, k, min_count, id_col, text_col)
    per_doc = spans.groupBy(id_col).agg(
        F.sum("span_tokens").alias("repeated_tokens"))
    return (
        docs.select(id_col,
                    F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"))
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("repeated_tokens", F.lit(0)).cast("long")
            .alias("repeated_tokens"),
            F.round(F.coalesce("repeated_tokens", F.lit(0)) / F.col("n_tokens"), 6)
            .alias("repeated_frac"),
        )
    )
