"""Probe path: broadcast the merged sketch state, flag/count rows with
vectorized pandas UDFs (the set-at-a-time analog of bloomtool query,
SURVEY.md §3.2).

Every UDF is Arrow-batched; the kernel is deserialized once per executor
process (module-level cache keyed by broadcast id), not per batch.  A Bloom
membership probe is relationally a broadcast left-semi join approximation —
the exact oracle used in tests.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

from sketchlib import mmh3
from sketchlib.kernels import KERNEL_BY_KIND
from sketchlib.specs import BaseSpec

# Keyed by a content digest of (spec_json, state blob) — NOT id(bc): a reused
# executor worker can allocate a later probe's Broadcast at a freed one's
# address and silently resolve the wrong kernel.  Content keying also makes
# the cache a dedup (same sketch broadcast twice deserializes once).
_KERNEL_CACHE: dict[str, object] = {}
_KERNEL_CACHE_MAX = 64


def _broadcast_kernel(spark: SparkSession, kernel):
    spec_json = kernel.spec.to_json()
    blob = kernel.serialize()
    digest = hashlib.sha256(spec_json.encode() + b"\x00" + blob).hexdigest()
    return spark.sparkContext.broadcast((digest, spec_json, blob))


def _resolve(bc):
    digest, spec_json, blob = bc.value
    k = _KERNEL_CACHE.get(digest)
    if k is None:
        if len(_KERNEL_CACHE) >= _KERNEL_CACHE_MAX:
            _KERNEL_CACHE.clear()
        spec = BaseSpec.from_json(spec_json)
        k = KERNEL_BY_KIND[spec.kind].deserialize(spec, blob)
        _KERNEL_CACHE[digest] = k
    return k


def _series_buffers(s: pd.Series):
    arr = pa.Array.from_pandas(s.astype("string"), type=pa.large_string())
    return mmh3.arrow_string_buffers(arr)


def contains_udf(spark: SparkSession, kernel) -> "F.Column":
    """Factory: ``udf(keycol) -> boolean`` membership probe for bloom /
    counting bloom / cuckoo kernels."""
    bc = _broadcast_kernel(spark, kernel)

    @F.pandas_udf("boolean")
    def _contains(s: pd.Series) -> pd.Series:
        k = _resolve(bc)
        data, off = _series_buffers(s)
        return pd.Series(k.contains(data, off))

    return _contains


def contains_asof_udf(spark: SparkSession, kernel, as_of: int):
    """Time-decaying membership as-of ``as_of`` (epoch seconds) for
    tdbloom / tdcbloom kernels."""
    bc = _broadcast_kernel(spark, kernel)
    as_of = int(as_of)

    @F.pandas_udf("boolean")
    def _contains(s: pd.Series) -> pd.Series:
        k = _resolve(bc)
        data, off = _series_buffers(s)
        return pd.Series(k.contains(data, off, as_of))

    return _contains


def count_udf(spark: SparkSession, kernel):
    """Point-count estimate (counting bloom ``count`` / CMS ``estimate``)."""
    bc = _broadcast_kernel(spark, kernel)

    @F.pandas_udf("long")
    def _count(s: pd.Series) -> pd.Series:
        k = _resolve(bc)
        data, off = _series_buffers(s)
        est = k.estimate(data, off) if hasattr(k, "estimate") else k.count(data, off)
        return pd.Series(est.astype("int64"))

    return _count


def count_asof_udf(spark: SparkSession, kernel, as_of: int):
    """Windowed point-count (tdcbloom: 'how many times in the last W seconds')."""
    bc = _broadcast_kernel(spark, kernel)
    as_of = int(as_of)

    @F.pandas_udf("long")
    def _count(s: pd.Series) -> pd.Series:
        k = _resolve(bc)
        data, off = _series_buffers(s)
        return pd.Series(k.count(data, off, as_of).astype("int64"))

    return _count


def method_udf(spark: SparkSession, kernel, method: str, ret: str, extra: tuple = ()):
    """Generic kernel-method probe column:
    ``getattr(kernel, method)(data, offsets, *extra)`` per Arrow batch —
    covers the long tail of per-key ops (``last_access_time``,
    ``was_active_within``, ``has_expired``, ``count``...) without one
    bespoke UDF each."""
    bc = _broadcast_kernel(spark, kernel)
    extra = tuple(extra)

    @F.pandas_udf(ret)
    def _f(s: pd.Series) -> pd.Series:
        k = _resolve(bc)
        data, off = _series_buffers(s)
        return pd.Series(getattr(k, method)(data, off, *extra))

    return _f


def probe_column(spark: SparkSession, kernel, col: Column | str, as_of: int | None = None) -> Column:
    """Dispatch to the right probe UDF for the kernel kind."""
    c = F.col(col) if isinstance(col, str) else col
    c = c.cast("string")
    kind = kernel.spec.kind
    if kind in ("bloom", "cbloom", "cuckoo", "sbf"):
        return contains_udf(spark, kernel)(c)
    if kind in ("tdbloom", "tdcbloom"):
        if as_of is None:
            raise ValueError("time-decaying probes need as_of")
        return contains_asof_udf(spark, kernel, as_of)(c)
    raise ValueError(f"no membership probe for kind {kind}")
