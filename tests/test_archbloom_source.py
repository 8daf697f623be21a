"""The ``archbloom`` Python DataSource: native C filter files as a
DataFrame (read) and back (write), byte-exactly."""

from __future__ import annotations

import os

import numpy as np
import pytest

from sketchlib import formats
from sketchlib.kernels.bloom import BloomFilter
from sketchlib.kernels.cbloom import CountingBloomFilter
from sketchlib.kernels.tdbloom import TdBloomFilter
from sketchlib.mmh3 import pack_strings
from sketchlib.spark import get_spark
from sketchlib.spark.archbloom_source import (
    ArchbloomDataSource,
    import_merged,
    kernel_from_row,
)
from sketchlib.specs import BloomSpec, CBloomSpec, TdBloomSpec

T0 = 1767225600


@pytest.fixture(scope="module")
def spark():
    s = get_spark("archbloom-source-tests", cpus=4, shuffle_partitions=4)
    s.dataSource.register(ArchbloomDataSource)
    yield s


@pytest.fixture(scope="module")
def fleet(tmp_path_factory):
    """Three native files of different kinds, written via formats.py
    (itself golden-tested against compiled-C output)."""
    d = tmp_path_factory.mktemp("fleet")
    b = BloomFilter(BloomSpec(1000, 0.01, name="tenant_a"))
    b.update(*pack_strings([f"u{i}" for i in range(300)]))
    formats.export_file(b, str(d / "tenant_a.bloom"))

    c = CountingBloomFilter(CBloomSpec(500, 0.01, name="tenant_b"))
    c.update(*pack_strings(["x", "x", "y"]))
    formats.export_file(c, str(d / "tenant_b.cbloom"))

    t = TdBloomFilter(TdBloomSpec(400, 0.01, timeout=600, start_time=T0, name="tenant_c"))
    t.update(*pack_strings(["k1", "k2"]), np.array([T0 + 5, T0 + 9], dtype=np.int64))
    formats.export_file(t, str(d / "tenant_c.tdbloom"))
    return str(d), b, c, t


def test_read_fleet_rows(spark, fleet):
    d, b, c, t = fleet
    df = spark.read.format("archbloom").load(d)
    rows = {r["name"]: r for r in df.collect()}
    assert set(rows) == {"tenant_a", "tenant_b", "tenant_c"}
    assert rows["tenant_a"]["kind"] == "bloom"
    assert rows["tenant_b"]["kind"] == "cbloom"
    assert rows["tenant_c"]["kind"] == "tdbloom"
    # state is byte-identical to the in-memory kernels that wrote the files
    assert bytes(rows["tenant_a"]["state"]) == b.serialize()
    assert bytes(rows["tenant_b"]["state"]) == c.serialize()
    assert bytes(rows["tenant_c"]["state"]) == t.serialize()
    assert rows["tenant_a"]["m"] == b.spec.m and rows["tenant_a"]["k"] == b.spec.k
    assert 0.0 < rows["tenant_a"]["saturation_pct"] < 100.0
    # a row reconstructs a probeable kernel anywhere
    k = kernel_from_row(rows["tenant_a"])
    assert bool(k.contains(*pack_strings(["u5"]))[0])


def test_glob_and_sql_over_fleet(spark, fleet):
    d, *_ = fleet
    df = spark.read.format("archbloom").load(os.path.join(d, "*.bloom"))
    assert df.count() == 1
    df.createOrReplaceTempView("filters")
    got = spark.sql(
        "SELECT name FROM filters WHERE kind = 'bloom' AND saturation_pct > 0"
    ).collect()
    assert [r["name"] for r in got] == ["tenant_a"]


def test_import_merged_equals_kernel_merge(spark, tmp_path):
    spec = BloomSpec(1000, 0.01)
    b1 = BloomFilter(BloomSpec(1000, 0.01, name="part1"))
    b2 = BloomFilter(BloomSpec(1000, 0.01, name="part2"))
    b1.update(*pack_strings([f"a{i}" for i in range(100)]))
    b2.update(*pack_strings([f"b{i}" for i in range(100)]))
    formats.export_file(b1, str(tmp_path / "p1.bloom"))
    formats.export_file(b2, str(tmp_path / "p2.bloom"))
    merged = import_merged(spark.read.format("archbloom").load(str(tmp_path)))
    want = BloomFilter(spec, np.frombuffer(b1.serialize(), dtype=np.uint8).copy())
    want.merge(b2)
    assert merged.serialize() == want.serialize()


def test_write_fleet_roundtrip(spark, fleet, tmp_path):
    """read → write → files byte-identical to the originals."""
    d, b, c, t = fleet
    out = str(tmp_path / "out")
    df = spark.read.format("archbloom").load(d)
    df.write.format("archbloom").mode("append").save(out)
    for fname in ("tenant_a.bloom", "tenant_b.cbloom", "tenant_c.tdbloom"):
        with open(os.path.join(d, fname), "rb") as f1, open(
            os.path.join(out, fname), "rb"
        ) as f2:
            assert f1.read() == f2.read(), fname


def test_write_requires_unique_names(spark, fleet, tmp_path):
    d, *_ = fleet
    df = spark.read.format("archbloom").load(d).withColumn(
        "name", __import__("pyspark").sql.functions.lit("")
    )
    with pytest.raises(Exception, match="non-empty 'name'"):
        df.write.format("archbloom").mode("append").save(str(tmp_path / "o2"))


def test_multi_path_load(spark, fleet, tmp_path):
    """load(p1, p2) ships a JSON array in the 'paths' option — both must be
    globbed (ADVICE r4: the array string used to be treated as one path)."""
    d, *_ = fleet
    df = spark.read.format("archbloom").load(
        [os.path.join(d, "*.bloom"), os.path.join(d, "*.cbloom")]
    )
    assert {r["kind"] for r in df.collect()} == {"bloom", "cbloom"}


def test_import_merged_mixed_kind_error(spark, fleet):
    """A broad glob over a mixed fleet must fail up front, naming files —
    and kind=... must narrow it to a mergeable family (ADVICE r4)."""
    d, b, *_ = fleet
    df = spark.read.format("archbloom").load(d)
    with pytest.raises(ValueError, match="mixed filter kinds"):
        import_merged(df)
    merged = import_merged(df, kind="bloom")
    assert merged.serialize() == b.serialize()


def test_import_merged_incompatible_geometry_error(spark, tmp_path):
    b1 = BloomFilter(BloomSpec(1000, 0.01, name="g1"))
    b2 = BloomFilter(BloomSpec(2000, 0.01, name="g2"))
    formats.export_file(b1, str(tmp_path / "g1.bloom"))
    formats.export_file(b2, str(tmp_path / "g2.bloom"))
    df = spark.read.format("archbloom").load(str(tmp_path))
    with pytest.raises(ValueError, match="incompatible filter geometry"):
        import_merged(df)


def test_write_overwrite_replaces_and_clears_stale(spark, fleet, tmp_path):
    """mode('overwrite') = replace the dataset: stale files from an earlier
    write go away, no temp files survive, and re-running append on existing
    names still errors cleanly (atomic two-phase writer, ADVICE r4)."""
    d, b, *_ = fleet
    out = str(tmp_path / "ow")
    full = spark.read.format("archbloom").load(d)
    full.write.format("archbloom").mode("append").save(out)
    assert len(os.listdir(out)) == 3
    only_bloom = spark.read.format("archbloom").load(os.path.join(d, "*.bloom"))
    only_bloom.write.format("archbloom").mode("overwrite").save(out)
    names = sorted(os.listdir(out))
    assert names == ["tenant_a.bloom"], names  # stale cbloom/tdbloom cleared
    assert not any(n.endswith(".tmp") for n in names)
    with open(os.path.join(out, "tenant_a.bloom"), "rb") as f:
        assert formats.bloom_import(os.path.join(out, "tenant_a.bloom")).serialize() == b.serialize()
        f.read()
    with pytest.raises(Exception, match="exist"):
        only_bloom.write.format("archbloom").mode("append").save(out)
    # the failed append left no partial/temp files behind
    assert sorted(os.listdir(out)) == ["tenant_a.bloom"]


def test_cuckoo_native_passthrough(spark, tmp_path):
    st = formats.CuckooNativeFile.create(num_buckets=64)
    st.add_strings([f"k{i}" for i in range(40)])
    src = str(tmp_path / "cn")
    os.makedirs(src)
    formats.cuckoo_native_export(st, os.path.join(src, "legacy.cuckoo"))
    df = spark.read.format("archbloom").option("kind", "cuckoo").load(src)
    row = df.collect()[0]
    assert row["kind"] == "cuckoo_native"
    assert row["m"] == 64 * st.bucket_size
    assert row["saturation_pct"] == pytest.approx(st.load_factor() * 100.0)
    with open(os.path.join(src, "legacy.cuckoo"), "rb") as f:
        assert bytes(row["state"]) == f.read()
    with pytest.raises(ValueError, match="cuckoo_native"):
        kernel_from_row(row)
    # write-side passthrough: name the row, save, byte-compare
    out = str(tmp_path / "cnout")
    df.withColumn(
        "name", __import__("pyspark").sql.functions.lit("legacy")
    ).write.format("archbloom").mode("append").save(out)
    with open(os.path.join(src, "legacy.cuckoo"), "rb") as f1, open(
        os.path.join(out, "legacy.cuckoo"), "rb"
    ) as f2:
        assert f1.read() == f2.read()
