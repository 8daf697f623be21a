"""Sketch aggregates as Spark SQL / DataFrame grouped aggregations.

The north rule asks for archbloom's queries "rephrased as Spark SQL /
DataFrame aggregates"; this module makes that literal: a sketch state
becomes a value you can GROUP BY over —

    >>> register_sql_udafs(spark, HllSpec(p=14), "hll")
    >>> spark.sql('''
    ...   SELECT day,
    ...          hll_estimate(hll_state(xxhash64(CAST(user_id AS STRING))))
    ...            AS users
    ...   FROM events GROUP BY day
    ... ''')

Design notes:

- **Prehash lanes only.** Aggregates consume the JVM-computed xxhash64
  lane(s) (``spark/prehash.py``; in SQL: ``xxhash64(CAST(col AS STRING))``
  and ``xxhash64(CAST(col AS STRING), <PREHASH_SALT>L)`` — use
  ``prehash.prehash_lane_sql(col)`` to emit these exactly), so the shuffle
  moves 8-16 bytes per row, not raw keys, and the Python side never
  re-hashes.  States are therefore in the prehash family (not
  mmh3/archbloom-file compatible).  The ``CAST(... AS STRING)`` is
  LOAD-BEARING for cross-path merges: ``prehash_pair`` string-casts before
  hashing, so a lane built from a raw int column would be a silently
  different hash family than ``SketchJob(prehash=True)`` /
  ``build_*_sql`` states — merging the two yields wrong estimates with no
  error.  (For string columns the cast is a no-op either way.)
- **Scale shape.** A pandas GROUPED_AGG UDAF has no partial-aggregation
  step: Spark shuffles the (hash-lane) rows of each group to one task.
  With int64 lanes that is the same traffic as an exact
  ``groupBy(...).agg(countDistinct(...))`` moves, and fine for many-group
  rollups; for few huge groups prefer ``spark/rollup.py`` (map-side
  partials, one KB state per task) — documented trade-off, same states.
- **Re-aggregation.** ``<prefix>_merge`` folds state columns, so rollup
  trees stay in SQL: day states → week states → one state, byte-identical
  to a direct build (merge associativity).
- Nulls: ``xxhash64(NULL)`` is the seed (42), NOT null — filter null keys
  in the query (``WHERE col IS NOT NULL``).  A hash lane that arrives as
  floats (pandas nullable-int fallback) would silently corrupt hashes
  above 2^53, so the aggregates reject non-integer lanes loudly.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from sketchlib.kernels import KERNEL_BY_KIND
from sketchlib.spark.agg import _new_kernel, _pack_state, _unpack_state
from sketchlib.specs import BaseSpec

# kinds by aggregate arity over the prehash lanes
_ONE_LANE = ("hll",)
_TWO_LANE = ("bloom", "cbloom", "cms", "sbf")
_TS_LANE = ("tdbloom", "tdcbloom")
_VALUES = ("kll", "tdigest")


def _int_lane(s: pd.Series, name: str):
    if s.dtype.kind not in "iu":
        raise TypeError(
            f"{name} lane must be integer (got {s.dtype}) — null keys make "
            "pandas fall back to float and corrupt 64-bit hashes; filter "
            "nulls (WHERE col IS NOT NULL) or coalesce the lane"
        )
    return s.to_numpy()


def sketch_state_agg(spec: BaseSpec):
    """GROUPED_AGG pandas UDAF building one serialized (zlib-framed) sketch
    state per group.  Arity by kind: hll(h1); bloom/cbloom/cms/sbf(h1, h2);
    tdbloom/tdcbloom(h1, h2, ts_epoch_sec); kll/tdigest(values)."""
    spec_json = spec.to_json()
    kind = spec.kind

    if kind in _ONE_LANE:

        @F.pandas_udf("binary")
        def _agg(h1: pd.Series) -> bytes:
            k = _new_kernel(spec_json)
            k.update_hashes(_int_lane(h1, "h1"))
            return _pack_state(k.serialize())

        return _agg
    if kind in _TWO_LANE:

        @F.pandas_udf("binary")
        def _agg(h1: pd.Series, h2: pd.Series) -> bytes:
            k = _new_kernel(spec_json)
            k.update_hashes(_int_lane(h1, "h1"), _int_lane(h2, "h2"))
            return _pack_state(k.serialize())

        return _agg
    if kind in _TS_LANE:

        @F.pandas_udf("binary")
        def _agg(h1: pd.Series, h2: pd.Series, ts: pd.Series) -> bytes:
            k = _new_kernel(spec_json)
            k.update_hashes(
                _int_lane(h1, "h1"), _int_lane(h2, "h2"), _int_lane(ts, "ts")
            )
            return _pack_state(k.serialize())

        return _agg
    if kind in _VALUES:

        @F.pandas_udf("binary")
        def _agg(vals: pd.Series) -> bytes:
            k = _new_kernel(spec_json)
            k.update(vals.dropna().to_numpy(dtype="float64"))
            return _pack_state(k.serialize())

        return _agg
    raise ValueError(f"no SQL aggregate for kind {kind}")


def state_merge_agg(spec: BaseSpec):
    """GROUPED_AGG pandas UDAF folding serialized states — the SQL
    re-aggregation step (day states → week → total)."""
    spec_json = spec.to_json()

    @F.pandas_udf("binary")
    def _merge(states: pd.Series) -> bytes:
        spec_ = BaseSpec.from_json(spec_json)
        cls = KERNEL_BY_KIND[spec_.kind]
        acc = None
        for blob in states:
            if blob is None:
                continue
            k = cls.deserialize(spec_, _unpack_state(bytes(blob)))
            acc = k if acc is None else acc.merge(k)
        if acc is None:
            acc = cls(spec_)
        return _pack_state(acc.serialize())

    return _merge


def hll_estimate_udf(spec: BaseSpec):
    """Scalar pandas UDF: serialized HLL state → cardinality estimate."""
    if spec.kind != "hll":
        raise ValueError("hll_estimate_udf needs an HllSpec")
    spec_json = spec.to_json()

    @F.pandas_udf("double")
    def _est(states: pd.Series) -> pd.Series:
        spec_ = BaseSpec.from_json(spec_json)
        cls = KERNEL_BY_KIND[spec_.kind]
        out = [
            float(cls.deserialize(spec_, _unpack_state(bytes(b))).estimate())
            if b is not None
            else None
            for b in states
        ]
        return pd.Series(out, dtype="float64")

    return _est


# kinds whose saturation() is argument-free (time-decaying kinds need as_of)
_SATURATION_KINDS = ("bloom", "cbloom", "sbf")


def saturation_udf(spec: BaseSpec):
    """Scalar pandas UDF: serialized state → saturation %, for kinds with
    an argument-free ``saturation()`` (bloom/cbloom/sbf)."""
    if spec.kind not in _SATURATION_KINDS:
        raise ValueError(f"no argument-free saturation for kind {spec.kind}")
    spec_json = spec.to_json()

    @F.pandas_udf("double")
    def _sat(states: pd.Series) -> pd.Series:
        spec_ = BaseSpec.from_json(spec_json)
        cls = KERNEL_BY_KIND[spec_.kind]
        out = [
            float(cls.deserialize(spec_, _unpack_state(bytes(b))).saturation())
            if b is not None
            else None
            for b in states
        ]
        return pd.Series(out, dtype="float64")

    return _sat


def quantile_udf(spec: BaseSpec, q: float):
    """Scalar pandas UDF: serialized KLL / t-digest state → the ``q``
    quantile.  One registered function per quantile (SQL has no extra
    scalar arg for aggregated-state readers)."""
    if spec.kind not in _VALUES:
        raise ValueError(f"no quantile reader for kind {spec.kind}")
    spec_json = spec.to_json()
    q = float(q)

    @F.pandas_udf("double")
    def _q(states: pd.Series) -> pd.Series:
        spec_ = BaseSpec.from_json(spec_json)
        cls = KERNEL_BY_KIND[spec_.kind]
        out = [
            float(cls.deserialize(spec_, _unpack_state(bytes(b))).quantile(q))
            if b is not None
            else None
            for b in states
        ]
        return pd.Series(out, dtype="float64")

    return _q


def _quantile_fn_name(prefix: str, q: float) -> str:
    """``kll, 0.5 -> kll_p50``; non-integral percents keep their decimals
    with ``_`` (``0.999 -> kll_p99_9``)."""
    pct = q * 100.0
    if float(pct).is_integer():
        return f"{prefix}_p{int(pct)}"
    return f"{prefix}_p{str(pct).replace('.', '_').rstrip('0').rstrip('_')}"


def register_sql_udafs(
    spark: SparkSession,
    spec: BaseSpec,
    prefix: str,
    quantiles: tuple[float, ...] = (0.5, 0.95, 0.99),
) -> None:
    """Register ``<prefix>_state`` / ``<prefix>_merge`` (and
    ``<prefix>_estimate`` for HLL, ``<prefix>_saturation`` where supported,
    ``<prefix>_p50``-style quantile readers for KLL / t-digest — one
    function per requested quantile, since SQL scalar readers take only the
    state column) for use from ``spark.sql``."""
    spark.udf.register(f"{prefix}_state", sketch_state_agg(spec))
    spark.udf.register(f"{prefix}_merge", state_merge_agg(spec))
    if spec.kind == "hll":
        spark.udf.register(f"{prefix}_estimate", hll_estimate_udf(spec))
    if spec.kind in _SATURATION_KINDS:
        spark.udf.register(f"{prefix}_saturation", saturation_udf(spec))
    if spec.kind in _VALUES:
        for q in quantiles:
            spark.udf.register(_quantile_fn_name(prefix, q), quantile_udf(spec, q))
