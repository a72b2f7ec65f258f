"""Shared LSH bucket -> candidate-pair machinery (tiers 1 and 2).

A banded signature (pHash bit-bands or MinHash LSH bands) becomes candidate
pairs via one equi-join-shaped groupBy on (band, key) — the set-oriented analog
of the reference's per-record index probe (LuceneIndexSearcher.java:285-296).

Scale levers, explicit per SURVEY.md §7.4:

* **Bucket explosion cap**: all-pairs inside a bucket is O(g^2). Buckets up to
  ``pair_cap`` emit all pairs (needed because similarity is not transitive:
  in {x, a, b} with a~b but x far from both, star-only edges would lose a-b).
  Larger buckets — at web scale these are boilerplate/near-identical content —
  fall back to star edges around the bucket minimum, keeping output linear.
* **Salting**: the hot-caption boilerplate makes a handful of band keys carry
  millions of rows. AQE skew-join splitting handles the *join*; the groupBy
  collect is bounded by ``group_cap`` sampling inside each bucket so no single
  task ever materializes an unbounded bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def candidate_pairs_from_bands(
    banded: DataFrame,
    pair_cap: int = 16,
    group_cap: int = 4096,
) -> DataFrame:
    """banded: (image_id, band:int, key:long) -> distinct (id_a < id_b) pairs.

    Implementation is a groupBy + bounded collect_list + in-plan pair
    expansion (arrays_zip/explode), NOT a self-join: one shuffle instead of
    two, and the cap is enforced before any pair is materialized.
    """
    buckets = (
        banded.groupBy("band", "key")
        .agg(F.slice(F.sort_array(F.collect_list("image_id")), 1, group_cap).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    small = buckets.filter(F.size("ids") <= pair_cap)
    big = buckets.filter(F.size("ids") > pair_cap)

    # all pairs for small buckets: explode twice over the (sorted) array
    small_pairs = (
        small.select(F.posexplode("ids").alias("i", "id_a"), F.col("ids"))
        .select("id_a", F.explode(F.slice(F.col("ids"), F.col("i") + 2, 2147483647)).alias("id_b"))
    )
    # star to bucket min for big buckets (near-identical content by construction)
    big_pairs = big.select(
        F.element_at("ids", 1).alias("id_a"),
        F.explode(F.slice("ids", 2, 2147483647)).alias("id_b"),
    )
    return small_pairs.unionByName(big_pairs).distinct()


def canonical_pairs(df: DataFrame, a: str = "id_a", b: str = "id_b") -> DataFrame:
    """Normalize so id_a < id_b and drop self/duplicate pairs."""
    return (
        df.filter(F.col(a) != F.col(b))
        .select(
            F.least(F.col(a), F.col(b)).alias("id_a"),
            F.greatest(F.col(a), F.col(b)).alias("id_b"),
        )
        .distinct()
    )
