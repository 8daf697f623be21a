"""Structured Streaming: micro-batch sketch maintenance equals a batch
build; watermarked window carrier; custom stateful operator."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sketchlib import streaming
from sketchlib.spark import get_spark
from sketchlib.spark.agg import SketchJob, build_many
from sketchlib.specs import CmsSpec, HllSpec
from sketchlib.store import SketchStore
from sketchlib.testdata import write_transcripts_parquet


@pytest.fixture(scope="module")
def spark():
    yield get_spark("stream-tests", cpus=4, shuffle_partitions=4)


@pytest.fixture(scope="module")
def tr_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("st") / "tr")
    write_transcripts_parquet(d, n_conversations=400, seed=42, n_files=5)
    return d


def test_stream_build_equals_batch(spark, tr_dir, tmp_path):
    """Folding 5 micro-batches (1 file each) must produce byte-identical
    sketches to one batch build over the whole directory."""
    store = SketchStore(str(tmp_path / "store"))
    jobs = [
        SketchJob("hll_conv", HllSpec(p=12), key="conv_id"),
        SketchJob("cms_tool", CmsSpec(epsilon=0.01, delta=0.1), key="tool"),
    ]
    q = streaming.run_stream_build(
        spark, tr_dir, store, jobs, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    q.stop()

    batch = build_many(spark.read.parquet(tr_dir), jobs)
    for job in jobs:
        streamed, metrics = store.load_kernel(job.name)
        assert streamed.serialize() == batch[job.name][0].serialize(), job.name
        assert metrics["rows"] == batch[job.name][1]
        assert metrics["epochs"] == 5


def test_stream_build_prehash_equals_batch(spark, tr_dir, tmp_path):
    """The JVM-prehash fast path flows through the streaming sink unchanged:
    micro-batch folding of prehash jobs is byte-identical to one prehash
    batch build (the sink calls build_many, which owns the mode)."""
    store = SketchStore(str(tmp_path / "store_ph"))
    jobs = [
        SketchJob("hll_conv", HllSpec(p=12), key="conv_id", prehash=True),
        SketchJob("cms_tool", CmsSpec(epsilon=0.01, delta=0.1), key="tool", prehash=True),
    ]
    q = streaming.run_stream_build(
        spark, tr_dir, store, jobs, checkpoint_dir=str(tmp_path / "ckpt_ph")
    )
    q.processAllAvailable()
    q.stop()
    batch = build_many(spark.read.parquet(tr_dir), jobs)
    for job in jobs:
        streamed, _ = store.load_kernel(job.name)
        assert streamed.serialize() == batch[job.name][0].serialize(), job.name


def test_epoch_replay_is_idempotent(spark, tr_dir, tmp_path):
    """Replaying an epoch (at-least-once delivery) must not double-count."""
    store = SketchStore(str(tmp_path / "store2"))
    jobs = [SketchJob("cms_tool", CmsSpec(epsilon=0.01, delta=0.1), key="tool")]
    sink = streaming.sketch_sink(store, jobs, "q2")
    df = spark.read.parquet(tr_dir)
    sink(df, 0)
    k1, m1 = store.load_kernel("cms_tool")
    sink(df, 0)  # replay
    k2, m2 = store.load_kernel("cms_tool")
    assert k2.serialize() == k1.serialize()
    assert m2["rows"] == m1["rows"]
    sink(df, 1)  # genuinely new epoch doubles the counts
    k3, _ = store.load_kernel("cms_tool")
    assert k3.total == 2 * k1.total


def test_windowed_counts(spark, tr_dir):
    stream = streaming.read_transcripts_stream(spark, tr_dir)
    # files are split by conv_id, so each micro-batch spans the full ~31-day
    # ts range; a watermark wider than the span keeps every window open and
    # makes the streaming totals exactly equal the batch counts
    agg = streaming.windowed_counts(stream, window="60 minutes", watermark="800 hours")
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName("wc")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql(
        "SELECT tool, SUM(n) AS n FROM wc WHERE tool != '' GROUP BY tool"
    )
    # update-mode emits per-batch running counts; the MAX per (window,key) is
    # the final count — simpler check: totals per tool must match batch counts
    latest = spark.sql(
        """SELECT tool, SUM(n) AS n FROM (
               SELECT win_start, tool, MAX(n) AS n FROM wc WHERE tool != ''
               GROUP BY win_start, tool)
           GROUP BY tool"""
    )
    exact = (
        spark.read.parquet(tr_dir)
        .filter(F.col("tool") != "")
        .groupBy("tool")
        .count()
    )
    gotd = {r["tool"]: r["n"] for r in latest.collect()}
    wantd = {r["tool"]: r["count"] for r in exact.collect()}
    assert gotd == wantd


def test_conversation_state(spark, tr_dir):
    import time

    stream = streaming.read_transcripts_stream(spark, tr_dir)
    st = streaming.conversation_state(stream, timeout_ms=3_000)
    q = (
        st.writeStream.outputMode("update")
        .format("memory")
        .queryName("cs")
        .start()
    )
    # idle-timeout state keeps the cleanup loop alive, so poll the sink
    # instead of processAllAvailable (see conversation_state docstring)
    exact = spark.read.parquet(tr_dir).groupBy("conv_id").count()
    wantd = {r["conv_id"]: r["count"] for r in exact.collect()}
    deadline = time.time() + 180
    gotd: dict = {}
    expired = 0
    while time.time() < deadline:
        rows = spark.sql(
            "SELECT conv_id, MAX(n_turns) AS n, MAX(CAST(expired AS INT)) AS e "
            "FROM cs GROUP BY conv_id"
        ).collect()
        gotd = {r["conv_id"]: r["n"] for r in rows}
        expired = sum(r["e"] for r in rows)
        if gotd == wantd and expired == len(wantd):
            break
        time.sleep(3)
    q.stop()
    assert gotd == wantd
    assert expired == len(wantd), "idle timeout must expire every conversation"


def _write_doc_file(path, ids, texts, ts_base=0):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": list(ids),
            "text": list(texts),
            "ts": pd.to_datetime([1767225600 + ts_base] * len(ids), unit="s").astype(
                "datetime64[us]"  # spark parquet reader rejects NANOS
            ),
        }
    )
    pdf.to_parquet(path)


def test_streaming_dedup_bloom_cross_batch(spark, tmp_path):
    """Bloom-backed streaming dedup: duplicates arriving in LATER
    micro-batches are suppressed by the sharded bitmap state; every unique
    row passes through exactly once; checkpoint restart resumes the state
    (a post-restart file of known keys stays suppressed)."""
    import os
    import time

    from sketchlib.specs import BloomSpec

    src = tmp_path / "src"
    src.mkdir()
    a = [f"doc-{i}" for i in range(100)]
    b = [f"doc-{i}" for i in range(100, 150)]
    _write_doc_file(src / "f1.parquet", range(100), a)
    _write_doc_file(src / "f2.parquet", list(range(50)) + list(range(100, 150)), a[:50] + b)
    _write_doc_file(src / "f3.parquet", range(150), a + b)
    for i, f in enumerate(["f1.parquet", "f2.parquet", "f3.parquet"]):
        t = time.time() - 100 + i  # file-source processes oldest-first
        os.utime(src / f, (t, t))

    stream = (
        spark.readStream.schema(spark.read.parquet(str(src)).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    ckpt = str(tmp_path / "ckpt_dedup")
    sink = str(tmp_path / "dedup_out")  # file sink: checkpoint-recoverable

    def run_pass():
        q = (
            streaming.streaming_dedup(
                stream, "text", BloomSpec(10_000, 1e-6), n_shards=4
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_pass()
    got = (
        spark.read.parquet(sink)
        .groupBy("text")
        .count()
        .collect()
    )
    assert {r["text"] for r in got} == set(a + b)
    assert all(r["count"] == 1 for r in got), "every unique row exactly once"

    # restart on the same checkpoint: known keys stay suppressed, new pass
    _write_doc_file(src / "f4.parquet", list(range(100)) + [999], a + ["doc-new"])
    run_pass()
    got2 = (
        spark.read.parquet(sink)
        .groupBy("text")
        .count()
        .collect()
    )
    assert {r["text"]: r["count"] for r in got2} == {t: 1 for t in a + b + ["doc-new"]}, (
        "state must survive the checkpoint restart"
    )


def test_streaming_dedup_tdbloom_readmits_after_timeout(spark, tmp_path):
    """Time-decaying streaming dedup: repeats within the timeout are
    suppressed; past it the key is re-admitted (the reference's tdbloom
    freshness rule as a streaming suppressor)."""
    import os
    import time

    from sketchlib.specs import TdBloomSpec

    src = tmp_path / "tsrc"
    src.mkdir()
    keys = [f"alert-{i}" for i in range(40)]
    _write_doc_file(src / "f1.parquet", range(40), keys, ts_base=0)
    _write_doc_file(src / "f2.parquet", range(40), keys, ts_base=50)   # within timeout
    _write_doc_file(src / "f3.parquet", range(40), keys, ts_base=500)  # expired
    for i, f in enumerate(["f1.parquet", "f2.parquet", "f3.parquet"]):
        t = time.time() - 100 + i
        os.utime(src / f, (t, t))

    stream = (
        spark.readStream.schema(spark.read.parquet(str(src)).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    spec = TdBloomSpec(10_000, 1e-6, timeout=100, start_time=1767225600)
    out = streaming.streaming_dedup(stream, "text", spec, n_shards=2, ts_col="ts")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("tdedup")
        .option("checkpointLocation", str(tmp_path / "ckpt_td"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql(
        "SELECT text, COUNT(*) AS c, COUNT(DISTINCT ts) AS d FROM tdedup GROUP BY text"
    ).collect()
    assert {r["text"] for r in rows} == set(keys)
    assert all(r["c"] == 2 and r["d"] == 2 for r in rows), (
        "each key passes at t=0 and again at t=500, never at t=50"
    )


def test_streaming_heavy_hitters_bounds(spark, tr_dir, tmp_path):
    """Per-shard MG summaries maintained across micro-batches: every
    emitted key's estimate brackets its true count, every globally-heavy
    key is present, and nothing ever overcounts."""
    from pyspark.sql import functions as F

    from sketchlib.specs import MGSpec

    stream = streaming.read_transcripts_stream(spark, tr_dir)
    out = streaming.streaming_heavy_hitters(
        stream, "tool", MGSpec(k=16), n_shards=4
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("shh")
        .option("checkpointLocation", str(tmp_path / "ckpt_hh"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # latest emission per (shard, key): shard_rows grows monotonically, so
    # keep the row with the max shard_rows per key
    latest = spark.sql(
        """SELECT key, count_lower, undercount_bound FROM (
             SELECT *, ROW_NUMBER() OVER (
               PARTITION BY shard, key ORDER BY shard_rows DESC, count_lower DESC
             ) AS rn FROM shh
           ) WHERE rn = 1"""
    ).collect()
    got = {r["key"]: (r["count_lower"], r["undercount_bound"]) for r in latest}
    exact = {
        r["tool"]: r["cnt"]
        for r in spark.read.parquet(tr_dir)
        .groupBy("tool")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert got, "summaries must emit"
    for k, (lo, bound) in got.items():
        assert lo <= exact.get(k, 0) <= lo + bound, (k, lo, bound, exact.get(k))
    # global top tools must all be present (k=16 per shard is generous for
    # the ~10-tool universe)
    top = sorted(exact, key=exact.get, reverse=True)[:5]
    assert all(t in got for t in top), (top, sorted(got))


def test_partial_crash_replay_no_double_fold(spark, tr_dir, tmp_path):
    """Crash AFTER a kernel save but BEFORE the epoch marker: the replayed
    batch must not re-fold already-updated kernels (per-kernel last_epoch
    guard — the marker file alone is not atomic across kernels)."""
    import os

    store = SketchStore(str(tmp_path / "store3"))
    jobs = [SketchJob("cms_tool", CmsSpec(epsilon=0.01, delta=0.1), key="tool")]
    sink = streaming.sketch_sink(store, jobs, "q3")
    df = spark.read.parquet(tr_dir)
    sink(df, 0)
    # simulate the crash window: kernel saved, epoch marker lost
    os.remove(os.path.join(store.root, "q3.epoch"))
    k1, m1 = store.load_kernel("cms_tool")
    sink(df, 0)  # replay of epoch 0
    k2, m2 = store.load_kernel("cms_tool")
    assert k2.serialize() == k1.serialize()
    assert m2["rows"] == m1["rows"]


def test_rollup_sink_stream_equals_batch_rollup(spark, tr_dir, tmp_path):
    """Streaming per-day rollup maintenance == one batch rollup: merged
    range states byte-identical; replay of an epoch is a no-op."""
    from sketchlib.spark.rollup import merge_range, sketch_rollup
    from sketchlib.specs import HllSpec

    spec = HllSpec(p=12)
    store = SketchStore(str(tmp_path / "rstore"))
    sink = streaming.rollup_sink(store, spec, key="conv_id", query_name="hll_day")
    df = spark.read.parquet(tr_dir)
    # drive the sink as two "micro-batches" (halves of the data)
    h1 = df.filter(F.xxhash64("conv_id") % 2 == 0)
    h2 = df.filter(F.xxhash64("conv_id") % 2 != 0)
    sink(h1, 0)
    sink(h2, 1)
    sink(h2, 1)  # replay: per-bucket last_epoch guard must skip

    streamed, n1 = streaming.rollup_range_from_store(store, spec, "hll_day")
    batch = sketch_rollup(df, spec, key="conv_id")
    direct, n2 = merge_range(batch, spec)
    assert streamed.serialize() == direct.serialize()
    assert n1 == n2


def test_stream_cells_equals_batch_suite(spark, tr_dir, tmp_path):
    """The declarative cell-store sink: streaming micro-batch merges must
    materialize byte-identical kernels to one batch suite build over the
    whole directory, and a restart on the same checkpoint must not
    double-fold."""
    from sketchlib.spark.suite_sql import build_suite_sql, materialize_suite_cells
    from sketchlib.specs import BloomSpec, TdBloomSpec

    jobs = [
        SketchJob("hll_conv", HllSpec(p=12), key="conv_id", prehash=True),
        SketchJob("bloom_conv", BloomSpec(5000, 0.01), key="conv_id", prehash=True),
        SketchJob(
            "cms_tool", CmsSpec(epsilon=0.01, delta=0.1), key="tool",
            prehash=True, low_cardinality=True,
        ),
    ]
    root = str(tmp_path / "cellroot")
    q = streaming.run_stream_cells(
        spark, tr_dir, root, jobs, checkpoint_dir=str(tmp_path / "ckpt_cells")
    )
    q.processAllAvailable()
    q.stop()

    streamed = materialize_suite_cells(
        streaming.read_stream_cells(spark, root), jobs
    )
    batch = build_suite_sql(spark.read.parquet(tr_dir), jobs)
    for job in jobs:
        assert streamed[job.name][0].serialize() == batch[job.name][0].serialize(), job.name
        assert streamed[job.name][1] == batch[job.name][1], job.name

    # restart on the same checkpoint: no new epochs, state unchanged
    import json as _json
    import os as _os

    with open(_os.path.join(root, "cells_build.cells.json")) as f:
        before = _json.load(f)
    q2 = streaming.run_stream_cells(
        spark, tr_dir, root, jobs, checkpoint_dir=str(tmp_path / "ckpt_cells")
    )
    q2.processAllAvailable()
    q2.stop()
    with open(_os.path.join(root, "cells_build.cells.json")) as f:
        after = _json.load(f)
    assert after == before
    streamed2 = materialize_suite_cells(
        streaming.read_stream_cells(spark, root), jobs
    )
    assert streamed2["bloom_conv"][0].serialize() == batch["bloom_conv"][0].serialize()


def test_streaming_dedup_tdbloom_same_second_duplicates(spark, tmp_path):
    """A key repeated WITHIN one micro-batch at the same event-time second
    must be emitted once: tdbloom's lookup_or_add probes the whole group
    against pre-call state, so the operator resolves within-group repeats
    itself (round-5 review finding)."""
    from sketchlib.specs import TdBloomSpec

    src = tmp_path / "samesec"
    src.mkdir()
    # one batch: key 'dup' three times in the same second, 'solo' once
    _write_doc_file(
        src / "f1.parquet", range(4), ["dup", "dup", "solo", "dup"], ts_base=0
    )
    stream = (
        spark.readStream.schema(spark.read.parquet(str(src)).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    spec = TdBloomSpec(10_000, 1e-6, timeout=100, start_time=1767225600)
    out = streaming.streaming_dedup(stream, "text", spec, n_shards=2, ts_col="ts")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("td_samesec")
        .option("checkpointLocation", str(tmp_path / "ckpt_ss"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT text FROM td_samesec").collect()
    assert sorted(r["text"] for r in rows) == ["dup", "solo"]


def test_streaming_dedup_tdbloom_horizon_misconfig_raises(spark, tmp_path):
    """A tdbloom spec whose timer horizon is already in the past on the
    FIRST batch (the default start_time=0 against real unix timestamps)
    can never suppress anything — the operator must fail loudly instead
    of silently emitting every duplicate forever."""
    import pytest as _pytest

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from sketchlib.specs import TdBloomSpec

    src = tmp_path / "horizon"
    src.mkdir()
    _write_doc_file(src / "f1.parquet", range(3), ["a", "a", "b"], ts_base=0)
    stream = (
        spark.readStream.schema(spark.read.parquet(str(src)).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    spec = TdBloomSpec(10_000, 1e-6, timeout=3600)  # start_time defaults to 0
    out = streaming.streaming_dedup(stream, "text", spec, n_shards=2, ts_col="ts")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("td_horizon")
        .option("checkpointLocation", str(tmp_path / "ckpt_hz"))
        .start()
    )
    with _pytest.raises(StreamingQueryException, match="timer horizon"):
        q.processAllAvailable()
    q.stop()
