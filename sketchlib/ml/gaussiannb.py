"""Gaussian Naive Bayes + Mahalanobis scoring — Spark-first rebuild of
``src/gaussiannb.c`` (194 LoC; README.md:115-137 "PARTIALLY IMPLEMENTED").

Training is a pure Catalyst aggregation: ``groupBy(label).agg(count, avg,
var_pop per feature)`` — Spark's partial+final hash aggregate IS the
reference's two-pass mean/variance (src/gaussiannb.c:48-87), distributed.
Model semantics match the reference:

- population variance + ALPHA=1e-2 regularization (src/gaussiannb.c:85-87)
- weighted-Laplace prior ``(count + weight) / (n + num_classes)`` with
  weight=1.0 default (src/gaussiannb.c:127, init :23-25)
- ``gaussiannb_update``'s online Welford step (src/gaussiannb.c:167-187) is
  subsumed by Chan's parallel merge — ``merge_models`` below — which is what
  a distributed engine actually needs.

One deliberate divergence, flagged: the reference's per-feature likelihood
is ``log((1/√(2π)) · e^(−d²/2σ²))`` — it OMITS the 1/σ factor
(GNB_NORMALIZING_CONSTANT, src/gaussiannb.h:12, used :142-146), so classes
with different variances are mis-weighted.  Default here is the correct
Gaussian log-pdf; ``reference_compat=True`` reproduces the reference
bit-for-bit for parity tests.  NaN features: the reference imputes with the
*running* class mean mid-pass (order-dependent, src/gaussiannb.c:56-59); we
drop NaN rows (deterministic).
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GNB_EPSILON = 1e-9
GNB_ALPHA = 1e-2
_LOG_NC = -0.5 * math.log(2 * math.pi)


@dataclass
class GaussianNBModel:
    labels: list  # class label values, index = class id
    count: np.ndarray  # (C,)
    mean: np.ndarray  # (C, F)
    var: np.ndarray  # (C, F), regularized (+ALPHA)
    weight: np.ndarray = field(default=None)  # type: ignore[assignment]
    n_samples: int = 0

    def __post_init__(self):
        if self.weight is None:
            self.weight = np.ones(len(self.labels))

    @property
    def prior(self) -> np.ndarray:
        """Weighted-Laplace prior (src/gaussiannb.c:127)."""
        return (self.count + self.weight) / (self.n_samples + len(self.labels))

    # -- scoring ------------------------------------------------------------
    def log_likelihood(self, X: np.ndarray, reference_compat: bool = False) -> np.ndarray:
        """(n, C) joint log posterior (unnormalized)."""
        X = np.asarray(X, dtype=np.float64)
        n = X.shape[0]
        C = len(self.labels)
        out = np.empty((n, C))
        log_prior = np.log(self.prior * self.weight + GNB_EPSILON)
        for c in range(C):
            var = self.var[c] + GNB_EPSILON
            d2 = (X - self.mean[c]) ** 2 / (2.0 * var)
            if reference_compat:
                # reference: log((1/√2π)·e^(−d²/2σ²)) per feature — no 1/σ
                ll = (_LOG_NC - d2).sum(axis=1)
            else:
                ll = (_LOG_NC - 0.5 * np.log(var) - d2).sum(axis=1)
            out[:, c] = log_prior[c] + ll
        return out

    def predict(self, X: np.ndarray, reference_compat: bool = False) -> np.ndarray:
        return self.log_likelihood(X, reference_compat).argmax(axis=1)

    def predict_labels(self, X: np.ndarray, reference_compat: bool = False) -> list:
        return [self.labels[i] for i in self.predict(X, reference_compat)]

    def mahalanobis(self, X: np.ndarray, class_index: int) -> np.ndarray:
        """Diagonal Mahalanobis distance (src/gaussiannb.c:156-165)."""
        X = np.asarray(X, dtype=np.float64)
        var = self.var[class_index] + GNB_EPSILON
        return np.sqrt(((X - self.mean[class_index]) ** 2 / var).sum(axis=1))

    # -- serde ----------------------------------------------------------------
    def to_json(self) -> str:
        return json.dumps(
            {
                "labels": list(self.labels),
                "count": self.count.tolist(),
                "mean": self.mean.tolist(),
                "var": self.var.tolist(),
                "weight": self.weight.tolist(),
                "n_samples": self.n_samples,
            }
        )

    @staticmethod
    def from_json(s: str) -> "GaussianNBModel":
        d = json.loads(s)
        return GaussianNBModel(
            labels=d["labels"],
            count=np.array(d["count"], dtype=np.float64),
            mean=np.array(d["mean"], dtype=np.float64),
            var=np.array(d["var"], dtype=np.float64),
            weight=np.array(d["weight"], dtype=np.float64),
            n_samples=d["n_samples"],
        )


def fit_gaussian_nb(
    df: DataFrame, label_col: str, feature_cols: list[str]
) -> GaussianNBModel:
    """Catalyst-native fit: one groupBy with count/avg/var_pop per feature —
    partial aggregation map-side, one small shuffle of |C| rows."""
    aggs = [F.count("*").alias("__n")]
    for i, c in enumerate(feature_cols):
        aggs.append(F.avg(c).alias(f"__m{i}"))
        aggs.append(F.var_pop(c).alias(f"__v{i}"))
    cond = None
    for c in feature_cols:
        nn = F.col(c).isNotNull() & ~F.isnan(F.col(c).cast("double"))
        cond = nn if cond is None else (cond & nn)
    rows = (
        df.filter(cond)
        .groupBy(F.col(label_col).alias("__label"))
        .agg(*aggs)
        .orderBy("__label")
        .collect()
    )
    labels = [r["__label"] for r in rows]
    count = np.array([r["__n"] for r in rows], dtype=np.float64)
    mean = np.array([[r[f"__m{i}"] for i in range(len(feature_cols))] for r in rows])
    var = (
        np.array([[r[f"__v{i}"] for i in range(len(feature_cols))] for r in rows])
        + GNB_ALPHA
    )
    return GaussianNBModel(
        labels=labels, count=count, mean=mean, var=var, n_samples=int(count.sum())
    )


def fit_gaussian_nb_split(
    df: DataFrame, label_col: str, feature_cols: list[str], split_col
) -> dict:
    """Fit one model per value of ``split_col`` in a SINGLE aggregation pass
    (groupBy(split, label) instead of one filtered fit per split) — the
    carrier for parallel-merge verification: ``merge_models`` over the
    returned models must equal the one-pass fit.  Identical stats to
    ``fit_gaussian_nb(df.filter(split == v), ...)`` per split value (the
    per-(split,label) count/avg/var_pop are the same aggregates over the
    same rows)."""
    split = F.col(split_col) if isinstance(split_col, str) else split_col
    aggs = [F.count("*").alias("__n")]
    for i, c in enumerate(feature_cols):
        aggs.append(F.avg(c).alias(f"__m{i}"))
        aggs.append(F.var_pop(c).alias(f"__v{i}"))
    cond = None
    for c in feature_cols:
        nn = F.col(c).isNotNull() & ~F.isnan(F.col(c).cast("double"))
        cond = nn if cond is None else (cond & nn)
    rows = (
        df.filter(cond)
        .groupBy(split.alias("__split"), F.col(label_col).alias("__label"))
        .agg(*aggs)
        .orderBy("__split", "__label")
        .collect()
    )
    out: dict = {}
    by_split: dict = {}
    for r in rows:
        by_split.setdefault(r["__split"], []).append(r)
    for sv, srows in by_split.items():
        labels = [r["__label"] for r in srows]
        count = np.array([r["__n"] for r in srows], dtype=np.float64)
        mean = np.array(
            [[r[f"__m{i}"] for i in range(len(feature_cols))] for r in srows]
        )
        var = (
            np.array([[r[f"__v{i}"] for i in range(len(feature_cols))] for r in srows])
            + GNB_ALPHA
        )
        out[sv] = GaussianNBModel(
            labels=labels, count=count, mean=mean, var=var,
            n_samples=int(count.sum()),
        )
    return out


def merge_models(a: GaussianNBModel, b: GaussianNBModel) -> GaussianNBModel:
    """Chan parallel mean/variance merge — the distributed generalization of
    the reference's single-sample online update (src/gaussiannb.c:167-187)."""
    if list(a.labels) != list(b.labels):
        raise ValueError("label sets must match")
    na, nb = a.count[:, None], b.count[:, None]
    n = na + nb
    # a class absent from one side has NaN/undefined stats — neutralize to
    # (mean=0, M2=0) so Chan's formula reduces to the other side's stats
    mean_a = np.where(na > 0, a.mean, 0.0)
    mean_b = np.where(nb > 0, b.mean, 0.0)
    m2a = np.where(na > 0, (a.var - GNB_ALPHA) * na, 0.0)
    m2b = np.where(nb > 0, (b.var - GNB_ALPHA) * nb, 0.0)
    delta = mean_b - mean_a
    mean = mean_a + delta * nb / np.maximum(n, 1)
    m2 = m2a + m2b + delta**2 * na * nb / np.maximum(n, 1)
    var = m2 / np.maximum(n, 1) + GNB_ALPHA
    return GaussianNBModel(
        labels=list(a.labels),
        count=a.count + b.count,
        mean=mean,
        var=var,
        weight=a.weight,
        n_samples=a.n_samples + b.n_samples,
    )


def predict_udf(
    spark: SparkSession,
    model: GaussianNBModel,
    feature_cols: list[str],
    reference_compat: bool = False,
):
    """Vectorized scoring column: argmax class label per row."""
    bc = spark.sparkContext.broadcast(model.to_json())
    compat = bool(reference_compat)

    @F.pandas_udf("string")
    def _predict(*cols: pd.Series) -> pd.Series:
        m = GaussianNBModel.from_json(bc.value)
        X = np.column_stack([c.to_numpy(dtype=np.float64) for c in cols])
        idx = m.predict(X, reference_compat=compat)
        return pd.Series([str(m.labels[i]) for i in idx])

    return _predict(*[F.col(c).cast("double") for c in feature_cols])


def mahalanobis_udf(
    spark: SparkSession,
    model: GaussianNBModel,
    feature_cols: list[str],
    class_label,
):
    """Anomaly-score column: diagonal Mahalanobis distance to one class."""
    bc = spark.sparkContext.broadcast(model.to_json())
    cls_label = class_label

    @F.pandas_udf("double")
    def _dist(*cols: pd.Series) -> pd.Series:
        m = GaussianNBModel.from_json(bc.value)
        ci = m.labels.index(cls_label)
        X = np.column_stack([c.to_numpy(dtype=np.float64) for c in cols])
        return pd.Series(m.mahalanobis(X, ci))

    return _dist(*[F.col(c).cast("double") for c in feature_cols])
