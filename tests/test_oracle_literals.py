"""Pin the fitted-literal oracles (dagli_spark/oracle_literals.py): the
fits must reproduce the inlined state bit-for-bit under the test session
config — if this fails after an intentional fit change, regenerate with
`python tools/gen_oracle_literals.py`."""

import pytest
from pyspark.sql import functions as F

from dagli_spark.operators.fit import fit_bucket_index
from dagli_spark.operators.models import fit_isotonic, fit_kmeans
from dagli_spark.oracle_literals import (
    BUCKET_BOUNDS,
    ISO_XS,
    ISO_YS,
    KMEANS_CENTERS,
    ORACLE_SF_DIR,
)


@pytest.fixture(scope="module")
def oracle_sf(spark):
    import os
    if not os.path.isdir(ORACLE_SF_DIR):
        pytest.skip(f"{ORACLE_SF_DIR} not present")
    return ORACLE_SF_DIR


def test_fitted_literals_current(spark, oracle_sf):
    ev = spark.read.parquet(f"{oracle_sf}/events.parquet")
    e = spark.read.parquet(f"{oracle_sf}/embeddings.parquet")

    evi = ev.withColumn("value_int", F.floor("value").cast("int"))
    assert [int(b) for b in fit_bucket_index(evi, "value_int", 8).boundaries] \
        == BUCKET_BOUNDS

    km = fit_kmeans(e, "embedding", 4, max_iter=5, seed=7, id_col="vec_id")
    assert [[float(x) for x in c] for c in km.centers] == KMEANS_CENTERS

    from dagli_spark.oracle_literals import IVF_CENTERS
    ivf = fit_kmeans(e, "embedding", 8, max_iter=5, seed=7, id_col="vec_id")
    assert [[float(x) for x in c] for c in ivf.centers] == IVF_CENTERS

    iso_in = e.select(
        F.element_at("embedding", 1).cast("double").alias("s"),
        (F.col("label") == 0).cast("double").alias("y"))
    im = fit_isotonic(iso_in, "s", "y")
    assert [float(x) for x in im.xs] == ISO_XS
    assert [float(y) for y in im.ys] == ISO_YS
