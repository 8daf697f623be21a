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


def contains_hashes_udf(spark: SparkSession, kernel, as_of: int | None = None):
    """Prehashed membership probe: ``udf(h1, h2) -> boolean`` over the JVM
    xxhash64 pair (``spark/prehash.py``) — pairs with ``prehash=True``
    builds; the raw key never crosses to Python."""
    bc = _broadcast_kernel(spark, kernel)
    timed = as_of is not None
    as_of_i = int(as_of) if timed else 0

    @F.pandas_udf("boolean")
    def _contains(h1: pd.Series, h2: pd.Series) -> pd.Series:
        # callers coalesce nulls JVM-side: an int64-with-nulls column would
        # arrive as float64 and corrupt hashes above 2^53
        k = _resolve(bc)
        a1 = h1.to_numpy(dtype="int64")
        a2 = h2.to_numpy(dtype="int64")
        got = (
            k.contains_hashes(a1, a2, as_of_i)
            if timed
            else k.contains_hashes(a1, a2)
        )
        return pd.Series(got)

    return _contains


def count_hashes_column(
    spark: SparkSession, kernel, col: Column | str, as_of: int | None = None
) -> Column:
    """Prehashed point-count probe (CMS ``estimate_hashes`` / counting
    kinds' ``count_hashes``) over the JVM xxhash64 pair of ``col``; null
    keys count 0."""
    method = "estimate_hashes" if hasattr(kernel, "estimate_hashes") else "count_hashes"
    if not hasattr(kernel, method):
        raise ValueError(f"kind {kernel.spec.kind} has no prehashed count probe")
    # derive timed-ness from the kernel KIND, not from as_of: a tdcbloom
    # probed without as_of (or a cms/sbf probed with one) would otherwise
    # die with an opaque executor-side TypeError inside the pandas UDF
    timed = kernel.spec.kind in ("tdbloom", "tdcbloom")
    if timed and as_of is None:
        raise ValueError(
            f"time-decaying probes need as_of (kind {kernel.spec.kind})"
        )
    if not timed and as_of is not None:
        raise ValueError(
            f"as_of given but kind {kernel.spec.kind} is not time-decaying"
        )
    bc = _broadcast_kernel(spark, kernel)
    as_of_i = int(as_of) if timed else 0

    @F.pandas_udf("long")
    def _count(h1: pd.Series, h2: pd.Series) -> pd.Series:
        k = _resolve(bc)
        a1 = h1.to_numpy(dtype="int64")
        a2 = h2.to_numpy(dtype="int64")
        fn = getattr(k, method)
        got = fn(a1, a2, as_of_i) if timed else fn(a1, a2)
        return pd.Series(got.astype("int64"))

    from sketchlib.spark.prehash import prehash_pair

    c = F.col(col) if isinstance(col, str) else col
    h1, h2 = prehash_pair(c)
    res = _count(F.coalesce(h1, F.lit(0)), F.coalesce(h2, F.lit(0)))
    return F.when(c.cast("string").isNotNull(), res).otherwise(F.lit(0))


def probe_column(
    spark: SparkSession,
    kernel,
    col: Column | str,
    as_of: int | None = None,
    prehash: bool = False,
) -> Column:
    """Dispatch to the right probe UDF for the kernel kind.

    ``prehash=True`` probes a sketch built with ``SketchJob(prehash=True)``:
    the same JVM xxhash64 pair expression is applied to ``col``, so build
    and probe cannot disagree; null keys probe False."""
    c = F.col(col) if isinstance(col, str) else col
    kind = kernel.spec.kind
    if prehash:
        if not hasattr(kernel, "contains_hashes"):
            raise ValueError(f"kind {kind} has no prehashed probe")
        from sketchlib.spark.prehash import prehash_pair

        h1, h2 = prehash_pair(c)
        # nulls → 0 before the UDF (exact int64 transport), masked back to
        # False after — a null key is never "present"
        h1z, h2z = F.coalesce(h1, F.lit(0)), F.coalesce(h2, F.lit(0))
        if kind in ("tdbloom", "tdcbloom"):
            if as_of is None:
                raise ValueError("time-decaying probes need as_of")
            res = contains_hashes_udf(spark, kernel, as_of)(h1z, h2z)
        else:
            res = contains_hashes_udf(spark, kernel)(h1z, h2z)
        return F.when(c.cast("string").isNotNull(), res).otherwise(F.lit(False))
    c = c.cast("string")
    if kind in ("bloom", "cbloom", "cuckoo", "sbf"):
        return contains_udf(spark, kernel)(c)
    if kind in ("tdbloom", "tdcbloom"):
        if as_of is None:
            raise ValueError("time-decaying probes need as_of")
        return contains_asof_udf(spark, kernel, as_of)(c)
    raise ValueError(f"no membership probe for kind {kind}")
