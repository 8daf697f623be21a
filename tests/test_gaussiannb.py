"""GaussianNB: ported reference unit test (tests/test_gaussiannb_basic.c)
with compiled-reference golden values, Chan-merge equivalence, and the
Spark fit path."""

from __future__ import annotations

import numpy as np
import pytest

from sketchlib.ml.gaussiannb import (
    GaussianNBModel,
    GNB_ALPHA,
    fit_gaussian_nb,
    merge_models,
)

X = np.array([[1.0, 2.0], [2.0, 3.0], [3.0, 4.0], [4.0, 5.0], [5.0, 6.0], [6.0, 7.0]])
Y = np.array([0, 0, 1, 1, 2, 2])


def _fit_local(X, y, labels):
    count = np.array([(y == c).sum() for c in labels], dtype=np.float64)
    mean = np.array([X[y == c].mean(axis=0) for c in labels])
    var = np.array([X[y == c].var(axis=0) for c in labels]) + GNB_ALPHA
    return GaussianNBModel(
        labels=list(labels), count=count, mean=mean, var=var, n_samples=len(y)
    )


@pytest.fixture
def model():
    return _fit_local(X, Y, [0, 1, 2])


def test_reference_predictions(model):
    """tests/test_gaussiannb_basic.c:19-56 — probes predict 0/1/2 in
    reference-compat mode AND with the corrected log-pdf."""
    probes = np.array([[2.5, 3.5], [4.0, 4.0], [6.0, 6.5]])
    assert model.predict(probes, reference_compat=True).tolist() == [0, 1, 2]
    assert model.predict(probes, reference_compat=False).tolist() == [0, 1, 2]


def test_reference_mahalanobis_golden(model):
    """Compiled reference prints 11.807755 / 6.278780 / 0.980581 for the
    class2 probe vs classes 0/1/2."""
    probe = np.array([[6.0, 6.5]])
    got = [float(model.mahalanobis(probe, c)[0]) for c in (0, 1, 2)]
    assert got == pytest.approx([11.807755, 6.278780, 0.980581], abs=1e-5)


def test_prior_weighted_laplace(model):
    # (count + weight) / (n + C) = (2 + 1) / (6 + 3)
    assert model.prior == pytest.approx([3 / 9, 3 / 9, 3 / 9])


def test_merge_equals_single_fit():
    """Chan merge of partition fits == one global fit (the distributed
    analog of gaussiannb_update)."""
    full = _fit_local(X, Y, [0, 1, 2])
    a = _fit_local(X[:3], Y[:3], [0, 1, 2])
    b = _fit_local(X[3:], Y[3:], [0, 1, 2])
    merged = merge_models(a, b)
    np.testing.assert_allclose(merged.mean, full.mean, atol=1e-12)
    np.testing.assert_allclose(merged.var, full.var, atol=1e-12)
    np.testing.assert_allclose(merged.count, full.count)
    assert merged.n_samples == full.n_samples


def test_merge_empty_class():
    """A partition may lack some classes entirely."""
    a = _fit_local(X[:2], Y[:2], [0, 1, 2])  # classes 1,2 empty: count 0
    a.count = np.array([2.0, 0.0, 0.0])
    a.mean = np.nan_to_num(a.mean)
    a.var = np.where(np.isnan(a.var), GNB_ALPHA, a.var)
    b = _fit_local(X[2:], Y[2:], [0, 1, 2])
    b.count = np.array([0.0, 2.0, 2.0])
    b.mean = np.nan_to_num(b.mean)
    b.var = np.where(np.isnan(b.var), GNB_ALPHA, b.var)
    merged = merge_models(a, b)
    full = _fit_local(X, Y, [0, 1, 2])
    np.testing.assert_allclose(merged.mean, full.mean, atol=1e-9)


def test_serde(model):
    m2 = GaussianNBModel.from_json(model.to_json())
    np.testing.assert_allclose(m2.mean, model.mean)
    assert m2.labels == model.labels


@pytest.mark.spark
def test_spark_fit_and_predict():
    from sketchlib.spark import get_spark
    from sketchlib.ml.gaussiannb import mahalanobis_udf, predict_udf

    spark = get_spark("gnb-test", cpus=4, shuffle_partitions=4)
    pdf = [(float(a), float(b), int(c)) for (a, b), c in zip(X, Y)]
    df = spark.createDataFrame(pdf, "f0 double, f1 double, label int")
    model = fit_gaussian_nb(df, "label", ["f0", "f1"])
    local = _fit_local(X, Y, [0, 1, 2])
    np.testing.assert_allclose(model.mean, local.mean, atol=1e-12)
    np.testing.assert_allclose(model.var, local.var, atol=1e-12)

    probes = spark.createDataFrame(
        [(2.5, 3.5), (4.0, 4.0), (6.0, 6.5)], "f0 double, f1 double"
    )
    got = [
        r[0]
        for r in probes.select(
            predict_udf(spark, model, ["f0", "f1"])
        ).collect()
    ]
    assert got == ["0", "1", "2"]
    d = [
        r[0]
        for r in probes.select(
            mahalanobis_udf(spark, model, ["f0", "f1"], 2)
        ).collect()
    ]
    assert d[2] == pytest.approx(0.980581, abs=1e-5)


@pytest.mark.spark
def test_split_fit_equals_filtered_fits():
    """fit_gaussian_nb_split must reproduce fit_gaussian_nb over each
    filtered split exactly (one groupBy(split, label) pass vs N scans)."""
    from pyspark.sql import functions as F

    from sketchlib.ml.gaussiannb import fit_gaussian_nb_split
    from sketchlib.spark import get_spark

    spark = get_spark("gnb-split-test", cpus=4, shuffle_partitions=4)
    pdf = [
        (float(a), float(b), int(c), i) for i, ((a, b), c) in enumerate(zip(X, Y))
    ]
    df = spark.createDataFrame(pdf, "f0 double, f1 double, label int, rid int")
    half = F.pmod(F.xxhash64(F.col("rid")), F.lit(2))
    halves = fit_gaussian_nb_split(df, "label", ["f0", "f1"], half)
    assert set(halves) == {0, 1}
    for hv in (0, 1):
        direct = fit_gaussian_nb(df.filter(half == hv), "label", ["f0", "f1"])
        m = halves[hv]
        assert m.labels == direct.labels
        np.testing.assert_allclose(m.count, direct.count)
        np.testing.assert_allclose(m.mean, direct.mean, atol=1e-12)
        np.testing.assert_allclose(m.var, direct.var, atol=1e-12)
        assert m.n_samples == direct.n_samples
