"""Distributed PCA vs an exact numpy replica on identical data."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from station_data_ingestion_spark.operators.pca import fit_pca, project_pca


def _data(spark, n=200, d=8, seed=7):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, d))
    # plant structure: one dominant direction
    base[:, 0] *= 6.0
    base[:, 1] *= 3.0
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # float32 round-trip: the replica must see EXACTLY what Spark saw
    x32 = base.astype(np.float32).astype(np.float64)
    return df.repartition(7), x32


def test_components_match_numpy(spark):
    df, x = _data(spark)
    comps, var, mean = fit_pca(df, k=3)
    assert np.allclose(mean, x.mean(axis=0), atol=1e-9)
    cov = np.cov(x, rowvar=False)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:3]
    want = v[:, order].T
    for i in range(3):
        j = int(np.argmax(np.abs(want[i])))
        if want[i, j] < 0:
            want[i] = -want[i]
    assert np.allclose(var, w[order], rtol=1e-9)
    assert np.allclose(comps, want, atol=1e-8)


def test_projection_matches_numpy_and_partitioning(spark):
    df, x = _data(spark)
    comps, _var, mean = fit_pca(df, k=2)
    got = {
        r["vec_id"]: (r["pc1"], r["pc2"])
        for r in project_pca(df, comps, mean).collect()
    }
    want = (x - x.mean(axis=0)) @ comps.T
    for i in range(len(x)):
        assert got[i][0] == pytest.approx(want[i, 0], abs=1e-8)
        assert got[i][1] == pytest.approx(want[i, 1], abs=1e-8)
    # partitioning must not change the fit (exact float64 partials,
    # driver reduce)
    comps2, _v2, mean2 = fit_pca(df.repartition(31), k=2)
    assert np.allclose(comps, comps2, atol=1e-9)
    assert np.allclose(mean, mean2, atol=1e-12)


def test_variance_concentrates_on_planted_direction(spark):
    df, x = _data(spark)
    comps, var, _mean = fit_pca(df, k=2)
    # the dominant component points (mostly) along axis 0
    assert abs(comps[0, 0]) > 0.9
    assert var[0] > var[1] > 0
