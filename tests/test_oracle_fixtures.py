"""The committed oracle fixtures must be exactly reproducible from source.

The image_dedup_verdicts oracle (entry_queries._image_dedup_verdicts_oracle)
reads committed parquet fixtures; this pins that a from-scratch regeneration
is byte-identical, so the fixtures can never drift from the synth/codec/
hashing code they are derived from.
"""

from __future__ import annotations

import os

from deduplicator_spark.oracle_fixtures import (
    FEATS_PATH,
    PSNR_PATH,
    ensure_image_oracle_fixtures,
    materialize,
)


def test_fixture_regeneration_is_byte_identical(tmp_path):
    ensure_image_oracle_fixtures()
    f2 = str(tmp_path / "feats.parquet")
    p2 = str(tmp_path / "psnr.parquet")
    materialize(feats_path=f2, psnr_path=p2)
    for committed, fresh in ((FEATS_PATH, f2), (PSNR_PATH, p2)):
        assert os.path.getsize(committed) == os.path.getsize(fresh)
        with open(committed, "rb") as a, open(fresh, "rb") as b:
            assert a.read() == b.read(), f"fixture drift: {committed}"


def test_features_match_distributed_extraction(spark):
    """The fixture's feature layer equals what the executors compute: digest/
    decode/phash_recomputed from operators.media.image_features and n_tok/
    sh_hashes/band_keys from operators.minhash.prepared_features, over the
    same synthesized corpus (64 rows keeps it fast; every planted kind
    appears within one 100-id block anyway)."""
    import pandas as pd

    from deduplicator_spark.operators.media import image_features
    from deduplicator_spark.operators.minhash import prepared_features
    from deduplicator_spark.oracle_fixtures import build_feature_rows
    from deduplicator_spark.synth import synthesize_images

    n = 64
    feats, _ = build_feature_rows(n=n)
    imgs = synthesize_images(spark, n).persist()
    med = {r["image_id"]: r for r in image_features(imgs, safe=True).collect()}
    prep = {r["image_id"]: r for r in prepared_features(imgs).collect()}
    assert len(med) == len(prep) == n
    for f in feats:
        m, p = med[f["image_id"]], prep[f["image_id"]]
        assert f["digest"] == m["digest"]
        assert f["decode_ok"] == m["decode_ok"]
        assert f["phash_recomputed"] == m["phash_recomputed"]
        assert f["n_tok"] == p["n_tok"]
        assert f["sh_hashes"] == list(p["sh_hashes"])
        assert f["band_keys"] == list(p["band_keys"])
    imgs.unpersist()
