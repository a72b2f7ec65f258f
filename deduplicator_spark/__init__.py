"""deduplicator_spark — a PySpark-native near-duplicate detection + clustering engine.

A from-scratch re-expression of the semantics of Landsbokasafn/deduplicator
(Heritrix DeDuplicator 3.2.0, reference at /root/reference) as an idiomatic
Spark DataFrame pipeline, generalized per the north rule to a full similarity
cascade over image+caption tables:

    tier 0  exact      SHA-256 over payload bytes      (ref: DIGEST_ANY join,
                                                         LuceneIndexSearcher.java:274-276)
    tier 1  near-image 64-bit SimHash / pHash banding   (generalizes digest equality)
    tier 2  near-text  MinHash over caption shingles + LSH band join
    tier 3  contain    suffix/shingle containment for long captions
    then    cluster    connected components over verified candidate pairs
    then    verdicts   novel/duplicate + refers-to lineage
                                                        (ref: DeDuplicator.java:149-192)

Everything is DataFrame-first: Catalyst plans the joins, AQE handles skew,
Python appears only inside Arrow-vectorized pandas UDFs.
"""

__version__ = "0.1.0"
