from __future__ import annotations

import pytest

from deduplicator_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("deduplicator-tests", cores=8)
    yield s


@pytest.fixture(scope="session")
def images_500(spark):
    from deduplicator_spark.synth import synthesize_images

    df = synthesize_images(spark, 500).persist()
    df.count()
    yield df
    df.unpersist()
