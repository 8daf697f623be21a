"""bloomtool CLI end-to-end: all 8 commands through a tmpdir store, mirroring
bin/bloomtool.c flows (create -> query exit codes, info, rename,
merge/intersect/intersection outputs)."""

from __future__ import annotations

import json

import pytest

from sketchlib.cli import main as cli
from sketchlib.spark import get_spark


@pytest.fixture(scope="module")
def spark():
    # the create command spins a session through the jobs runner; keep one
    # session alive so the CLI reuses it (getOrCreate)
    yield get_spark("cli-tests", cpus=4, shuffle_partitions=4)


@pytest.fixture(scope="module")
def data(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    a = str(root / "a.parquet")
    b = str(root / "b.parquet")
    spark.createDataFrame([(f"k{i}",) for i in range(100)], "key string").write.parquet(a)
    spark.createDataFrame([(f"k{i}",) for i in range(50, 150)], "key string").write.parquet(b)
    return {"store": str(root / "store"), "a": a, "b": b}


def test_create_and_query_exit_codes(data):
    rc = cli(["create", data["store"], "set_a", "--input", data["a"],
              "--key", "key", "--expected", "1000", "--accuracy", "0.001"])
    assert rc == 0
    # bloomtool query semantics: 0 present, 1 absent (bin/bloomtool.c:81-105)
    assert cli(["query", data["store"], "set_a", "k3", "-v"]) == 0
    assert cli(["query", data["store"], "set_a", "definitely-not-there"]) == 1


def test_add_is_incremental(data):
    rc = cli(["create", data["store"], "set_ab", "--input", data["a"],
              "--key", "key", "--expected", "1000", "--accuracy", "0.001"])
    assert rc == 0
    rc = cli(["add", data["store"], "set_ab", "--input", data["b"],
              "--key", "key", "--expected", "1000", "--accuracy", "0.001"])
    assert rc == 0
    assert cli(["query", data["store"], "set_ab", "k149"]) == 0
    assert cli(["query", data["store"], "set_ab", "k0"]) == 0


def test_info_json(data, capsys):
    assert cli(["info", data["store"], "set_a"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["kind"] == "bloom"
    assert out["name"] == "set_a"
    assert 0 < out["saturation_pct"] < 100
    assert "est_fpr" in out


def test_rename(data):
    assert cli(["rename", data["store"], "set_a", "set_a2"]) == 0
    assert cli(["query", data["store"], "set_a2", "k3"]) == 0


def test_merge_intersect_intersection(data, capsys):
    cli(["create", data["store"], "sa", "--input", data["a"],
         "--key", "key", "--expected", "1000", "--accuracy", "0.001"])
    cli(["create", data["store"], "sb", "--input", data["b"],
         "--key", "key", "--expected", "1000", "--accuracy", "0.001"])
    capsys.readouterr()

    assert cli(["merge", data["store"], "sa", "sb", "s_or"]) == 0
    assert cli(["query", data["store"], "s_or", "k0"]) == 0
    assert cli(["query", data["store"], "s_or", "k149"]) == 0

    assert cli(["intersect", data["store"], "sa", "sb", "s_and"]) == 0
    assert cli(["query", data["store"], "s_and", "k75"]) == 0   # in both
    assert cli(["query", data["store"], "s_and", "k0"]) == 1    # only in a
    assert cli(["query", data["store"], "s_and", "k149"]) == 1  # only in b

    capsys.readouterr()
    assert cli(["intersection", data["store"], "sa", "sb"]) == 0
    jaccard = float(capsys.readouterr().out.strip())
    # true Jaccard = 50/150 = 33.3%; bloom estimate within a few pp
    assert 23.0 <= jaccard <= 43.0

    # merge must not have mutated the stored input (deepcopy guard)
    assert cli(["query", data["store"], "sa", "k149"]) == 1


def test_export_import_native_format(data, tmp_path):
    """CLI export writes a C-loadable !bloomf! file; import round-trips it
    into a fresh store entry with identical membership answers."""
    f = str(tmp_path / "set_a.bloomf")
    assert cli(["export", data["store"], "set_a", f]) == 0
    with open(f, "rb") as fh:
        assert fh.read(8) == b"!bloomf!"
    assert cli(["import", data["store"], "set_a_back", f]) == 0
    assert cli(["query", data["store"], "set_a_back", "k3"]) == 0
    assert cli(["query", data["store"], "set_a_back", "definitely-not-there"]) == 1
