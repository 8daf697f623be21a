"""Distributed cuckoo filter: key-partitioned shards (SURVEY.md §7 hard
part 3; reference semantics ``src/cuckoo.c:89-193`` with the four defect
fixes of kernels/cuckoo.py kept).

Cuckoo filters have no cell-wise merge algebra, so the scale construction is
sharding, not merging:

- **build**: route every key to ``shard = pmod(xxhash64(key), S)`` (computed
  JVM-side), ``groupBy(shard).applyInArrow`` builds one independent
  CuckooFilter per shard.  Each shard is bounded — at 100 TB you raise S,
  never the per-shard table.  Deletions ride the same pass via an ``op``
  column (+1 insert, −1 remove), applied adds-first inside each shard group.
- **probe**: the shard states are broadcast as a dict; the probe computes the
  SAME JVM-side routing hash as a column and a vectorized pandas UDF looks
  up each row's shard filter.  No corpus collect, no shuffle of the probe
  side beyond the scan.

The routing hash is Spark's ``xxhash64`` on the stringified key in BOTH
paths, so build and probe can never disagree.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sketchlib import mmh3
from sketchlib.kernels.cuckoo import CuckooFilter
from sketchlib.specs import CuckooSpec

_SHARD_CACHE: dict[str, dict[int, CuckooFilter]] = {}
_SHARD_CACHE_MAX = 16


def _route(col: Column, n_shards: int) -> Column:
    return F.pmod(F.xxhash64(col.cast("string")), F.lit(n_shards)).cast("int")


class ShardedCuckoo:
    """Immutable handle over S independent per-shard cuckoo filters."""

    def __init__(self, spec: CuckooSpec, n_shards: int, blobs: dict[int, bytes]):
        self.spec = spec
        self.n_shards = n_shards
        self.blobs = blobs

    def digest(self) -> str:
        h = hashlib.sha256(self.spec.to_json().encode())
        for s in sorted(self.blobs):
            h.update(s.to_bytes(4, "little"))
            h.update(self.blobs[s])
        return h.hexdigest()

    def load_factor(self) -> float:
        """Mean occupancy across shards (cuckoo_load_factor analog)."""
        if not self.blobs:
            return 0.0
        fs = [CuckooFilter.deserialize(self.spec, b) for b in self.blobs.values()]
        return float(np.mean([f.load_factor() for f in fs]))


def build_sharded_cuckoo(
    df: DataFrame,
    key,
    spec: CuckooSpec,
    n_shards: int = 32,
    op=None,
) -> ShardedCuckoo:
    """Build S shard filters in one shuffled pass.

    ``spec`` is the PER-SHARD geometry (size it for n_total / n_shards with
    headroom).  ``op``: optional int column, >0 insert / <0 remove; within a
    shard, inserts apply before removes (the bloomtool create→remove flow).
    Raises RuntimeError if any shard overflows its eviction budget.
    """
    kcol = (F.col(key) if isinstance(key, str) else key).cast("string")
    cols = [kcol.alias("__key"), _route(kcol, n_shards).alias("__s")]
    if op is not None:
        ocol = (F.col(op) if isinstance(op, str) else op).cast("int")
        cols.append(ocol.alias("__op"))
    else:
        cols.append(F.lit(1).alias("__op"))
    proj = df.select(*cols).filter(F.col("__key").isNotNull())

    spec_json = spec.to_json()

    def build(tbl: pa.Table) -> pa.Table:
        from sketchlib.specs import BaseSpec

        sp = BaseSpec.from_json(spec_json)
        f = CuckooFilter(sp)
        shard = int(tbl.column("__s")[0].as_py())
        keys = tbl.column("__key")
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        ops = tbl.column("__op").to_numpy(zero_copy_only=False)
        add_idx = np.nonzero(ops > 0)[0]
        rem_idx = np.nonzero(ops < 0)[0]
        n_fail = 0
        if add_idx.size:
            data, off = mmh3.arrow_string_buffers(keys.take(pa.array(add_idx)))
            n_fail = int((~f.update(data, off)).sum())
        if rem_idx.size:
            data, off = mmh3.arrow_string_buffers(keys.take(pa.array(rem_idx)))
            f.remove(data, off)
        return pa.table(
            {
                "shard": pa.array([shard], type=pa.int32()),
                "state": pa.array([f.serialize()], type=pa.binary()),
                "n_add": pa.array([int(add_idx.size)], type=pa.int64()),
                "n_fail": pa.array([n_fail], type=pa.int64()),
            }
        )

    out = (
        proj.groupBy("__s")
        .applyInArrow(build, "shard int, state binary, n_add long, n_fail long")
        .toArrow()
    )
    fails = sum(out.column("n_fail").to_pylist())
    if fails:
        raise RuntimeError(
            f"cuckoo shard overflow: {fails} failed inserts — raise n_shards "
            "or per-shard num_buckets"
        )
    blobs = dict(
        zip(out.column("shard").to_pylist(), out.column("state").to_pylist())
    )
    return ShardedCuckoo(spec, n_shards, blobs)


def _resolve_shards(bc) -> dict[int, CuckooFilter]:
    digest, spec_json, blobs = bc.value
    cached = _SHARD_CACHE.get(digest)
    if cached is None:
        from sketchlib.specs import BaseSpec

        if len(_SHARD_CACHE) >= _SHARD_CACHE_MAX:
            _SHARD_CACHE.clear()
        spec = BaseSpec.from_json(spec_json)
        cached = {
            s: CuckooFilter.deserialize(spec, b) for s, b in blobs.items()
        }
        _SHARD_CACHE[digest] = cached
    return cached


def cuckoo_probe_column(spark: SparkSession, sharded: ShardedCuckoo, col) -> Column:
    """Membership probe column: routes each row to its shard filter with the
    same JVM-side hash the build used, probes Arrow-batched per shard."""
    kcol = (F.col(col) if isinstance(col, str) else col).cast("string")
    bc = spark.sparkContext.broadcast(
        (sharded.digest(), sharded.spec.to_json(), sharded.blobs)
    )

    @F.pandas_udf("boolean")
    def _probe(keys: pd.Series, shards: pd.Series) -> pd.Series:
        filters = _resolve_shards(bc)
        # null keys route to a null shard (float NaN series) — mask them out
        # up front (a null key is never a member) so int(s) below can't blow
        # up; the build path already filters nulls symmetrically.
        valid = keys.notna() & shards.notna()
        out = np.zeros(len(keys), dtype=bool)
        if not valid.any():
            return pd.Series(out)
        keys = keys[valid]
        arr = pa.Array.from_pandas(keys.astype("string"), type=pa.large_string())
        sh = shards[valid].to_numpy()
        sub = np.zeros(len(keys), dtype=bool)
        for s in np.unique(sh):
            f = filters.get(int(s))
            if f is None:
                continue
            idx = np.nonzero(sh == s)[0]
            data, off = mmh3.arrow_string_buffers(arr.take(pa.array(idx)))
            sub[idx] = f.contains(data, off)
        out[valid.to_numpy()] = sub
        return pd.Series(out)

    return _probe(kcol, _route(kcol, sharded.n_shards))
