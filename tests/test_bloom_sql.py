"""Byte-identity of the pure-Catalyst bloom-family builds (spark/bloom_sql)
vs the prehash kernel path — same xxhash64 lanes, same KM ladder, same cell
layout, so serialize() must match bit for bit.  Also covers the declarative
probes (membership / min-of-k counts) against kernel probes."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from sketchlib.spark import build_sketch, get_spark
from sketchlib.spark.bloom_sql import (
    bloom_sql_members,
    bloom_word_rows,
    build_bloom_sql,
    build_cbloom_sql,
    build_tdbloom_sql,
    cbloom_cell_rows,
    cbloom_sql_counts,
    km_position_cols,
)
from sketchlib.specs import BloomSpec, CBloomSpec, TdBloomSpec


@pytest.fixture(scope="module")
def spark():
    yield get_spark("sketchlib-bloom-sql-tests", cpus=8, shuffle_partitions=8)


@pytest.fixture(scope="module")
def kdf(spark):
    rng = np.random.default_rng(11)
    keys = [f"conv-{i}" for i in rng.integers(0, 4000, 9000)]
    # nulls + duplicates + unicode + empty string
    keys += [None] * 200 + ["", "émoji🚀", "a" * 300] * 5
    ts = pd.to_datetime(1767225600 + rng.integers(0, 7 * 86400, len(keys)), unit="s")
    return spark.createDataFrame(pd.DataFrame({"k": keys, "ts": ts}))


def test_km_positions_match_kernel_lane(spark, kdf):
    """The Catalyst ladder reproduces mmh3.positions_from_hashes exactly,
    including the -1 -> 0 after-wrap quirk, across k and m geometries."""
    from sketchlib import mmh3

    pdf = (
        kdf.filter("k is not null")
        .select(
            F.xxhash64(F.col("k").cast("string")).alias("h1"),
            F.xxhash64(
                F.col("k").cast("string"),
                F.lit(-7046029254386353131),
            ).alias("h2"),
            *[
                c.alias(f"p{i}")
                for i, c in enumerate(km_position_cols("k", 9, 95851))
            ],
        )
        .toPandas()
    )
    exp = mmh3.positions_from_hashes(
        pdf["h1"].to_numpy(np.int64), pdf["h2"].to_numpy(np.int64), 9, 95851
    )
    got = pdf[[f"p{i}" for i in range(9)]].to_numpy()
    assert (got == exp).all()


def test_bloom_sql_byte_identity(spark, kdf):
    spec = BloomSpec(5000, 0.01)
    sql_k = build_bloom_sql(kdf, spec, "k")
    kern, rows = build_sketch(kdf, spec, key="k", prehash=True)
    assert rows == kdf.filter("k is not null").count()
    assert sql_k.serialize() == kern.serialize()
    assert sql_k.saturation_count() > 0


def test_bloom_sql_empty_and_all_null(spark):
    spec = BloomSpec(1000, 0.01)
    df = spark.createDataFrame(pd.DataFrame({"k": pd.array([None, None], dtype="string")}))
    assert build_bloom_sql(df, spec, "k").saturation_count() == 0
    assert build_bloom_sql(df.limit(0), spec, "k").saturation_count() == 0


def test_bloom_sql_members_matches_kernel_probe(spark, kdf):
    spec = BloomSpec(5000, 0.001)
    words = bloom_word_rows(kdf, spec, "k")
    kern, _ = build_sketch(kdf, spec, key="k", prehash=True)
    probes = spark.createDataFrame(
        pd.DataFrame({"k": [f"conv-{i}" for i in range(0, 8000, 7)] + ["émoji🚀", "nope"]})
    )
    got = {
        r["k"]: r["member"]
        for r in bloom_sql_members(words, probes, spec, "k").collect()
    }
    from sketchlib.spark import probe

    exp = {
        r["k"]: r["hit"]
        for r in probes.withColumn(
            "hit", probe.probe_column(spark, kern, "k", prehash=True)
        ).collect()
    }
    assert got == exp
    assert got["émoji🚀"] is True and got["nope"] is False


def test_cbloom_sql_byte_identity(spark, kdf):
    for bits in (4, 16):
        spec = CBloomSpec(5000, 0.01, counter_bits=bits)
        sql_k = build_cbloom_sql(kdf, spec, "k")
        kern, _ = build_sketch(kdf, spec, key="k", prehash=True)
        assert sql_k.serialize() == kern.serialize(), f"counter_bits={bits}"


def test_cbloom_sql_saturation_cap(spark):
    # 4-bit counters cap at 15: 40 adds of one key must land exactly at cap
    spec = CBloomSpec(100, 0.01, counter_bits=4)
    df = spark.createDataFrame(pd.DataFrame({"k": ["hot"] * 40 + ["cold"]}))
    sql_k = build_cbloom_sql(df, spec, "k")
    kern, _ = build_sketch(df, spec, key="k", prehash=True)
    assert sql_k.serialize() == kern.serialize()
    cells = cbloom_cell_rows(df, spec, "k")
    assert cells.agg(F.max("cnt")).first()[0] == 15


def test_cbloom_sql_counts_never_undercount(spark, kdf):
    spec = CBloomSpec(5000, 0.01)
    cells = cbloom_cell_rows(kdf, spec, "k")
    truth = (
        kdf.filter("k is not null").groupBy("k").count().toPandas()
        .set_index("k")["count"]
    )
    got = cbloom_sql_counts(cells, kdf, spec, "k").toPandas().set_index("k")["cnt"]
    assert (got.loc[truth.index] >= truth).all()


def test_tdbloom_sql_byte_identity(spark, kdf):
    spec = TdBloomSpec(5000, 0.01, timeout=86400, start_time=1767225600)
    sql_k = build_tdbloom_sql(kdf, spec, "k", ts="ts")
    kern, _ = build_sketch(kdf, spec, key="k", ts="ts", prehash=True)
    assert sql_k.serialize() == kern.serialize()
    assert (sql_k.ticks > 0).any()


def test_tdcbloom_sql_byte_identity(spark, kdf):
    """tdcbloom (counters + ticks SoA) SQL build vs prehash kernel build —
    the identity the r4 gate carried in-query (moved here; the gate keeps
    only the cbloom flag)."""
    from sketchlib.spark.bloom_sql import build_tdcbloom_sql
    from sketchlib.specs import TdCBloomSpec

    spec = TdCBloomSpec(
        5000, 0.01, timeout=86400, counter_bits=32, start_time=1767225600
    )
    sql_k = build_tdcbloom_sql(kdf, spec, "k", ts="ts")
    kern, _ = build_sketch(kdf, spec, key="k", ts="ts", prehash=True)
    assert sql_k.serialize() == kern.serialize()
    assert (sql_k.ticks > 0).any() and (sql_k.counters > 0).any()


def test_tdcbloom_sql_counts_matches_kernel_probe(spark, kdf):
    """The declarative windowed min-of-k probe equals the kernel's
    count_hashes on the same state, per key and per as-of (inside the
    window, at the edge, and past it — everything reads 0 once stale),
    and its plan carries zero Python."""
    from sketchlib.spark.bloom_sql import (
        build_tdcbloom_sql,
        tdcbloom_cell_rows,
        tdcbloom_sql_counts,
    )
    from sketchlib.specs import TdCBloomSpec

    from sketchlib.spark.probe import count_hashes_column

    t0 = 1767225600
    spec = TdCBloomSpec(5000, 0.01, timeout=3600, counter_bits=32, start_time=t0)
    cells = tdcbloom_cell_rows(kdf, spec, "k", ts="ts").cache()
    kern = build_tdcbloom_sql(kdf, spec, "k", ts="ts")
    for as_of in (t0 + 1800, t0 + 3 * 86400, t0 + 8 * 86400):
        sql_cnt = tdcbloom_sql_counts(cells, spec, kdf, "k", as_of=as_of)
        kc = count_hashes_column(
            spark, kern, F.col("k").cast("string"), as_of=as_of
        )
        rows = sql_cnt.withColumn("kc", kc).collect()
        assert rows and all(r["cnt"] == r["kc"] for r in rows), f"as_of={as_of}"
        if as_of == t0 + 8 * 86400:
            assert all(r["cnt"] == 0 for r in rows), "stale window must read 0"
    plan = (
        tdcbloom_sql_counts(cells, spec, kdf, "k", as_of=t0 + 1800)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "ArrowEval" not in plan
    cells.unpersist()


def test_tdbloom_sql_rejects_pre_epoch_ts(spark):
    spec = TdBloomSpec(100, 0.01, timeout=3600, start_time=1767225600)
    df = spark.createDataFrame(
        pd.DataFrame({"k": ["a"], "ts": pd.to_datetime([1767225600 - 50], unit="s")})
    )
    with pytest.raises(ValueError, match="earlier than"):
        build_tdbloom_sql(df, spec, "k", ts="ts")


def test_bloom_sql_merges_with_prehash_kernel_build(spark, kdf):
    """SQL-built and prehash-kernel-built halves merge into the same state
    as a single build over the union — the cross-path compatibility the
    module promises."""
    spec = BloomSpec(5000, 0.01)
    half1 = kdf.filter(F.crc32(F.col("k").cast("string")) % 2 == 0)
    half2 = kdf.filter(F.crc32(F.col("k").cast("string")) % 2 == 1)
    a = build_bloom_sql(half1, spec, "k")
    b, _ = build_sketch(half2, spec, key="k", prehash=True)
    whole, _ = build_sketch(kdf, spec, key="k", prehash=True)
    assert a.merge(b).serialize() == whole.serialize()


def test_wrap_arithmetic_adversarial_vs_bigint_truth(spark):
    """_wrap_add / _wrap_mul_const / _umod vs Python big-int arithmetic on
    adversarial uint64 corners (carry propagation across the 32-bit seam,
    sign-bit reinterpretation, 0, 2^64-1) plus a seeded random sweep —
    the primitives the whole declarative KM ladder stands on."""
    from sketchlib.spark.bloom_sql import _umod, _wrap_add, _wrap_mul_const

    corners = [
        0, 1, 0x7FFFFFFF, 0x80000000, 0xFFFFFFFF, 0x100000000,
        0x7FFFFFFFFFFFFFFF, 0x8000000000000000, 0xFFFFFFFFFFFFFFFF,
        0xFFFFFFFF00000000, 0x00000000FFFFFFFF, 0x9E3779B97F4A7C15,
    ]
    rng = np.random.default_rng(23)
    us = corners + [int(x) for x in rng.integers(0, 1 << 64, 500, dtype=np.uint64)]
    vs = corners + [int(x) for x in rng.integers(0, 1 << 64, 500, dtype=np.uint64)]
    consts = [0, 1, 2, 3, 5, 63, (1 << 26) - 1]
    mods = [1, 2, 3, 5, 8, 191, 1 << 20, (1 << 62) - 57]

    def s64(u):  # uint64 bit pattern -> signed int64 (Spark bigint)
        return u - (1 << 64) if u >= (1 << 63) else u

    pdf = pd.DataFrame({
        "a": pd.array([s64(u) for u in us], dtype="int64"),
        "b": pd.array([s64(v) for v in vs], dtype="int64"),
    })
    df = spark.createDataFrame(pdf)
    cols = [_wrap_add(F.col("a"), F.col("b")).alias("add")]
    cols += [_wrap_mul_const(F.col("a"), c).alias(f"mul_{c}") for c in consts]
    cols += [_umod(F.col("a"), m).alias(f"mod_{m}") for m in mods]
    rows = df.select("a", "b", *cols).collect()
    for r in rows:
        ua, ub = r["a"] % (1 << 64), r["b"] % (1 << 64)
        assert r["add"] % (1 << 64) == (ua + ub) % (1 << 64), (ua, ub)
        for c in consts:
            assert r[f"mul_{c}"] % (1 << 64) == (ua * c) % (1 << 64), (ua, c)
        for m in mods:
            assert r[f"mod_{m}"] == ua % m, (ua, m)


def test_tdcbloom_prereduce_cells_identical(spark, kdf):
    """Key-level pre-reduction (explode over distinct keys with a per-key
    (sum, max-tick) statistic) yields the exact same aggregated cell frame
    as the per-row explode — saturating +1 adds compose as least(sum, cap)
    through the key level.  Also certifies tdcbloom_from_cells == the
    prehash kernel build over either frame."""
    from sketchlib.spark.bloom_sql import tdcbloom_cell_rows, tdcbloom_from_cells
    from sketchlib.specs import TdCBloomSpec

    # cap-sensitive geometry: 8-bit counters saturate on the hot keys
    spec = TdCBloomSpec(
        2000, 0.01, timeout=86400, counter_bits=8, start_time=1767225600
    )
    plain = {
        r["pos"]: (r["cnt"], r["tick"])
        for r in tdcbloom_cell_rows(kdf, spec, "k", ts="ts").collect()
    }
    pre = {
        r["pos"]: (r["cnt"], r["tick"])
        for r in tdcbloom_cell_rows(
            kdf, spec, "k", ts="ts", prereduce=True
        ).collect()
    }
    assert plain == pre and plain
    kern, _ = build_sketch(kdf, spec, key="k", ts="ts", prehash=True)
    mat = tdcbloom_from_cells(
        tdcbloom_cell_rows(kdf, spec, "k", ts="ts", prereduce=True), spec
    )
    assert mat.serialize() == kern.serialize()


def test_prereduce_builds_byte_identical_family(spark, kdf):
    """prereduce=True (key-level pre-reduction / dedupe before the
    explode×k) yields byte-identical kernels for bloom, cbloom and tdbloom
    — presence is idempotent, saturating +1 adds compose as least(sum,cap),
    and max-tick is associative through the key level."""
    from sketchlib.spark.bloom_sql import (
        build_bloom_sql,
        build_cbloom_sql,
        build_tdbloom_sql,
    )

    bspec = BloomSpec(5000, 0.01)
    assert (
        build_bloom_sql(kdf, bspec, "k", prereduce=True).serialize()
        == build_bloom_sql(kdf, bspec, "k").serialize()
    )
    cspec = CBloomSpec(2000, 0.01, counter_bits=8)
    assert (
        build_cbloom_sql(kdf, cspec, "k", prereduce=True).serialize()
        == build_cbloom_sql(kdf, cspec, "k").serialize()
    )
    tspec = TdBloomSpec(5000, 0.01, timeout=86400, start_time=1767225600)
    assert (
        build_tdbloom_sql(kdf, tspec, "k", ts="ts", prereduce=True).serialize()
        == build_tdbloom_sql(kdf, tspec, "k", ts="ts").serialize()
    )


def test_tdcbloom_cells_from_lanes_groupby_key(spark, kdf):
    """Cells built from a groupBy(key) per-key lane frame (count + max tick
    per key) must equal the direct tdcbloom_cell_rows build — the carrier
    shape q_tdcbloom_windowed_counts uses so the cell build costs no extra
    pass over the data."""
    from sketchlib.spark.bloom_sql import (
        _tick_col,
        tdcbloom_cell_rows,
        tdcbloom_cells_from_lanes,
    )
    from sketchlib.spark.prehash import prehash_pair
    from sketchlib.specs import TdCBloomSpec

    spec = TdCBloomSpec(
        3000, 0.01, timeout=7 * 86400, counter_bits=16, start_time=1767225600
    )
    h1, h2 = prehash_pair(F.col("k"))
    per_key = (
        kdf.filter("k is not null")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("__w"),
            F.max(_tick_col(spec, "ts")).alias("__t"),
        )
        .select(h1.alias("__h1"), h2.alias("__h2"), "__t", "__w")
    )
    got = {
        (r["pos"], r["cnt"], r["tick"])
        for r in tdcbloom_cells_from_lanes(per_key, spec).collect()
    }
    want = {
        (r["pos"], r["cnt"], r["tick"])
        for r in tdcbloom_cell_rows(kdf, spec, "k", ts="ts", prereduce=True).collect()
    }
    assert got == want
