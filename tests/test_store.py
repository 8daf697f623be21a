"""Sketch store: save/load round-trips, lineage-driven resume —
kill after N batches → resume → final state byte-identical to an
uninterrupted run (SURVEY.md §5.2 item 7)."""

from __future__ import annotations

import os

import pytest

from sketchlib.spark import get_spark
from sketchlib.spark.agg import SketchJob
from sketchlib.specs import BloomSpec, HllSpec
from sketchlib.store import SketchStore
from sketchlib.testdata import write_transcripts_parquet


@pytest.fixture(scope="module")
def spark():
    yield get_spark("store-tests", cpus=4, shuffle_partitions=4)


@pytest.fixture(scope="module")
def transcripts_dir(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tr") / "transcripts")
    write_transcripts_parquet(path, n_conversations=500, seed=42, n_files=8)
    return path


def _files(d):
    return sorted(os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet"))


def test_save_load_roundtrip(tmp_path):
    from sketchlib.kernels import HyperLogLog

    store = SketchStore(str(tmp_path / "store"))
    h = HyperLogLog(HllSpec(p=12))
    h.update_strings(["a", "b", "c"])
    store.save_kernel("hll_test", h, metrics={"rows": 3})
    k2, metrics = store.load_kernel("hll_test")
    assert (k2.registers == h.registers).all()
    assert metrics == {"rows": 3}
    assert store.list_sketches() == ["hll_test"]


def test_resume_byte_identical(spark, transcripts_dir, tmp_path):
    files = _files(transcripts_dir)
    job = SketchJob("bloom_conv", BloomSpec(50_000, 0.001), key="conv_id")

    # uninterrupted run
    s1 = SketchStore(str(tmp_path / "s1"))
    k_full, rows_full, built, skipped = s1.build_resumable(
        spark, files, job, run_id="run-a", batch_files=2
    )
    assert built == len(files) and skipped == 0  # built counts files

    # interrupted after 2 batches, then resumed
    s2 = SketchStore(str(tmp_path / "s2"))
    with pytest.raises(RuntimeError, match="injected failure"):
        s2.build_resumable(
            spark, files, job, run_id="run-b", batch_files=2, fail_after_batches=2
        )
    k_res, rows_res, built2, skipped2 = s2.build_resumable(
        spark, files, job, run_id="run-b2", batch_files=2
    )
    assert skipped2 == 4  # 2 batches × 2 files completed before the crash
    assert built2 == len(files) - 4
    assert rows_res == rows_full
    assert k_res.serialize() == k_full.serialize(), "resume must be byte-identical"

    # idempotent re-run: everything skipped, same state
    k_again, rows_again, built3, skipped3 = s2.build_resumable(
        spark, files, job, run_id="run-b3", batch_files=2
    )
    assert built3 == 0 and skipped3 == len(files)
    assert k_again.serialize() == k_full.serialize()


def test_incremental_append(spark, transcripts_dir, tmp_path):
    """New input files appended later are picked up; already-built files are
    not recomputed (the bloomtool `add` analog, SURVEY.md §2.8)."""
    files = _files(transcripts_dir)
    job = SketchJob("hll_conv", HllSpec(p=12), key="conv_id")
    store = SketchStore(str(tmp_path / "inc"))
    k1, _, built1, _ = store.build_resumable(
        spark, files[:4], job, run_id="r1", batch_files=2
    )
    k2, _, built2, skipped2 = store.build_resumable(
        spark, files, job, run_id="r2", batch_files=2
    )
    assert built2 == len(files) - 4 and skipped2 == 4
    # full build from scratch equals incremental result
    fresh = SketchStore(str(tmp_path / "fresh"))
    k3, _, _, _ = fresh.build_resumable(spark, files, job, run_id="r3", batch_files=8)
    assert k2.serialize() == k3.serialize()
