"""Structured Streaming integration.

The reference's time-decaying filters exist to answer streaming-shaped
questions ("seen in the last W seconds?") — here they are maintained by
actual streams:

- ``sketch_sink``: a foreachBatch sink that folds every micro-batch into the
  persistent sketch state in a SketchStore.  Exactly-once per epoch: the
  store records the last applied epoch per (query, sketch) and skips
  replayed batches, so at-least-once delivery cannot double-count counters.
- ``windowed_counts``: the watermark + windowed aggregation carrier (exact,
  built-in operators — late data handled by the watermark).
- ``conversation_state``: a custom stateful operator via
  ``applyInPandasWithState``: per-conversation running turn count + last
  event time, with idle-timeout expiry — the streaming analog of the
  tdbloom freshness rule.
"""

from __future__ import annotations

import json
import os

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from sketchlib.spark.agg import SketchJob, build_many
from sketchlib.store import SketchStore


def read_transcripts_stream(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """File-source stream over a transcripts directory (one file per
    micro-batch by default — the test/bench driver; swap for kafka in
    production)."""
    if schema is None:
        schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def sketch_sink(store: SketchStore, jobs: list[SketchJob], query_name: str):
    """foreachBatch function maintaining one merged kernel per job in the
    store, with epoch-dedup for exactly-once folding.

    Epoch ids are scoped to ONE stream checkpoint: ``query_name`` must be
    unique per (stream, checkpoint) — restarting with a FRESH checkpoint
    restarts epoch ids at 0, so reusing the old query_name against already-
    advanced kernels would silently skip the new stream's early batches.
    The guard key embeds query_name so a REPLAY of one stream can never
    double-fold another stream's progress — but the load→merge→save cycle
    itself takes no lock, so two streams that maintain the same kernel name
    must not run CONCURRENTLY (last save wins and the loser's fold is
    lost); give concurrent streams distinct kernel names and merge their
    outputs instead (the algebra is associative)."""
    epoch_file = os.path.join(store.root, f"{query_name}.epoch")
    guard_key = f"last_epoch::{query_name}"

    def _last_epoch() -> int:
        try:
            with open(epoch_file) as f:
                return json.load(f)["epoch"]
        except (OSError, ValueError):
            return -1

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        if epoch_id <= _last_epoch():
            return  # replayed batch, whole-batch fast path — already folded
        results = build_many(batch_df, jobs)
        for job in jobs:
            kernel, rows = results[job.name]
            try:
                current, metrics = store.load_kernel(job.name)
                # per-kernel epoch guard: a crash after saving SOME kernels
                # but before the epoch marker must not double-fold the saved
                # ones on replay (each save_kernel is atomic tmp+rename, so
                # the guard and the folded state always move together)
                if metrics.get(guard_key, -1) >= epoch_id:
                    continue
                current.merge(kernel)
                metrics["rows"] = metrics.get("rows", 0) + rows
                metrics["epochs"] = metrics.get("epochs", 0) + 1
            except FileNotFoundError:
                current, metrics = kernel, {"rows": rows, "epochs": 1}
            metrics[guard_key] = epoch_id
            store.save_kernel(job.name, current, metrics)
        tmp = epoch_file + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"epoch": epoch_id}, f)
        os.replace(tmp, epoch_file)

    return _apply


def rollup_sink(store: SketchStore, spec, key, query_name: str, ts: str = "ts"):
    """foreachBatch sink maintaining ONE kernel per day bucket in the store
    (the streaming maintenance path of spark/rollup.py): each micro-batch is
    rolled up per day and merged into ``{query_name}__{day}`` entries, so
    time-range queries keep working while the stream runs.  Exactly-once per
    (bucket, epoch) via a query-scoped guard in each kernel's metrics — a
    batch replay after a partial crash re-merges only the buckets that
    missed.  As with sketch_sink, ``query_name`` must be unique per
    (stream, checkpoint): a fresh checkpoint restarts epoch ids at 0."""
    from sketchlib.spark.agg import _merge_blobs
    from sketchlib.spark.rollup import sketch_rollup

    spec_json = spec.to_json()
    guard_key = f"last_epoch::{query_name}"

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        tbl = sketch_rollup(batch_df, spec, key=key, ts=ts).toArrow()
        for b, blob, rows in zip(
            tbl.column("bucket").to_pylist(),
            tbl.column("state").to_pylist(),
            tbl.column("rows").to_pylist(),
        ):
            name = f"{query_name}__{b.isoformat()}"
            kernel = _merge_blobs(spec_json, [blob])
            try:
                current, metrics = store.load_kernel(name)
                if metrics.get(guard_key, -1) >= epoch_id:
                    continue
                current.merge(kernel)
                metrics["rows"] = metrics.get("rows", 0) + rows
            except FileNotFoundError:
                current, metrics = kernel, {"rows": rows}
            metrics[guard_key] = epoch_id
            store.save_kernel(name, current, metrics)

    return _apply


def rollup_range_from_store(store: SketchStore, spec, query_name: str, start=None, end=None):
    """Merge the store's ``{query_name}__{day}`` kernels for days in
    [start, end] (ISO date strings / dates) → (kernel, rows)."""
    prefix = f"{query_name}__"
    lo = str(start) if start is not None else None
    hi = str(end) if end is not None else None
    merged, total = None, 0
    for name in sorted(store.list_sketches()):
        if not name.startswith(prefix):
            continue
        day = name[len(prefix):]
        if (lo is not None and day < lo) or (hi is not None and day > hi):
            continue
        kernel, metrics = store.load_kernel(name)
        total += metrics.get("rows", 0)
        merged = kernel if merged is None else merged.merge(kernel)
    if merged is None:
        from sketchlib.kernels import KERNEL_BY_KIND

        merged = KERNEL_BY_KIND[spec.kind](spec)
    return merged, total


def run_stream_build(
    spark: SparkSession,
    input_path: str,
    store: SketchStore,
    jobs: list[SketchJob],
    checkpoint_dir: str,
    query_name: str = "sketch_build",
):
    """Wire stream → sketch_sink; caller drives with processAllAvailable()
    (tests) or awaitTermination() (production)."""
    stream = read_transcripts_stream(spark, input_path)
    return (
        stream.writeStream.foreachBatch(sketch_sink(store, jobs, query_name))
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )


def windowed_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "tool",
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked sliding-window counts — the exact-aggregation carrier the
    sketch estimates are checked against in streaming mode."""
    # watermarks require TIMESTAMP (LTZ); parquet NTZ casts losslessly under
    # the session's UTC timezone
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp_ltz"))
    w = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(w.alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            key_col,
            "n",
        )
    )


_CONV_STATE_SCHEMA = "n_turns long, last_ts long"
_CONV_OUT_SCHEMA = "conv_id string, n_turns long, last_ts long, expired boolean"


def _make_conversation_fn(timeout_ms: int):
    def _conversation_fn(key, pdfs, state: GroupState):
        (conv_id,) = key
        if state.hasTimedOut:
            n, last = state.get
            state.remove()
            yield pd.DataFrame(
                {"conv_id": [conv_id], "n_turns": [n], "last_ts": [last], "expired": [True]}
            )
            return
        n, last = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            last = max(last, int(pdf["ts_sec"].max()))
        state.update((n, last))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {"conv_id": [conv_id], "n_turns": [n], "last_ts": [last], "expired": [False]}
        )

    return _conversation_fn


def conversation_state(stream: DataFrame, timeout_ms: int = 60_000) -> DataFrame:
    """Per-conversation running state with idle expiry
    (applyInPandasWithState) — custom stateful streaming, the tdbloom
    'fresh within timeout' semantics as an operator.

    Note: while idle-timeout state exists, the engine keeps scheduling
    no-data cleanup batches, so ``processAllAvailable()`` does not return —
    poll the sink and ``stop()`` (as production jobs do)."""
    prepared = stream.select(
        "conv_id", F.unix_timestamp(F.col("ts").cast("timestamp_ltz")).alias("ts_sec")
    ).filter(F.col("ts_sec").isNotNull())  # no event time → cannot sequence
    return prepared.groupBy("conv_id").applyInPandasWithState(
        _make_conversation_fn(timeout_ms),
        _CONV_OUT_SCHEMA,
        _CONV_STATE_SCHEMA,
        "update",
        GroupStateTimeout.ProcessingTimeTimeout,
    )


_DEDUP_STATE_SCHEMA = "bits binary, n_emitted long"


def _make_dedup_fn(spec_json: str, out_cols: list[str], reset_pct: float | None):
    """Per-shard stateful fn: bloom/tdbloom bitmap lives in the group state,
    first-seen rows pass through.  Defined at module scope (not a closure
    over kernels) so the state round-trips through serialize()/deserialize()
    exactly like the store does — a worker restart resumes from bytes."""

    def _dedup_fn(key, pdfs, state: GroupState):
        import numpy as np
        import pandas as _pd
        import pyarrow as pa

        from sketchlib import mmh3
        from sketchlib.kernels import KERNEL_BY_KIND
        from sketchlib.specs import BaseSpec

        spec = BaseSpec.from_json(spec_json)
        timed = spec.kind == "tdbloom"
        if state.exists:
            blob, n_emitted = state.get
            kernel = KERNEL_BY_KIND[spec.kind].deserialize(spec, bytes(blob))
        else:
            kernel, n_emitted = KERNEL_BY_KIND[spec.kind](spec), 0
        # horizon misconfiguration guard state (see below): evaluate on the
        # FIRST non-empty chunk only — state.exists reflects the batch
        # start, so a later all-past-horizon chunk of the same first batch
        # must not re-trigger after earlier chunks were legitimately
        # admitted (r5 advice)
        first_chunk = not state.exists
        for pdf in pdfs:
            if not len(pdf):
                continue
            keys = pdf["__key"].fillna("")
            data, offsets = mmh3.arrow_string_buffers(
                pa.Array.from_pandas(keys, type=pa.string())
            )
            if timed:
                # exact per-event-time semantics: probe/stamp in ascending
                # per-second groups (micro-batches span few distinct seconds)
                if pdf["__ts_sec"].isna().any():
                    raise ValueError(
                        "streaming_dedup with TdBloomSpec needs a non-null "
                        "event-time column (null ts cannot be stamped)"
                    )
                ts = pdf["__ts_sec"].to_numpy().astype(np.int64)
                # misconfiguration guard: the kernel reproduces the C age
                # guard (as_of - start_time > max_time → everything reads
                # absent, src/tdbloom.c:342).  For a RUNNING filter that is
                # the documented expiry → re-admit semantics (tested); but
                # a shard whose very FIRST event is already past the
                # horizon can never suppress anything — the classic cause
                # is the default start_time=0 against real unix timestamps
                # (horizon = max_time seconds after epoch 1970), a silent
                # total no-op.  Fail loudly on that instead.
                horizon = int(spec.start_time) + int(spec.max_time)
                if first_chunk and int(ts.min()) > horizon:
                    raise ValueError(
                        f"streaming_dedup: first event time {int(ts.min())} "
                        f"is already past the tdbloom timer horizon "
                        f"{horizon} (start_time={spec.start_time} + "
                        f"max_time={spec.max_time}) — the filter would never "
                        "suppress anything; set spec.start_time near the "
                        "stream's epoch and/or a larger timeout (its timer "
                        "width bounds filter life).  NOTE: a fresh-checkpoint "
                        "restart of a long-lived stream lands here too — "
                        "resume from the existing checkpoint, or re-anchor "
                        "spec.start_time for the new epoch"
                    )
                first_chunk = False
                key_arr = keys.to_numpy()
                seen = np.empty(len(pdf), dtype=bool)
                order = np.argsort(ts, kind="stable")
                bounds = np.flatnonzero(
                    np.diff(ts[order], prepend=np.int64(ts[order[0]] - 1))
                )
                for i, lo in enumerate(bounds):
                    hi = bounds[i + 1] if i + 1 < len(bounds) else len(order)
                    idx = order[lo:hi]
                    sub_off = np.zeros(len(idx) + 1, dtype=np.int64)
                    lens = offsets[idx + 1] - offsets[idx]
                    np.cumsum(lens, out=sub_off[1:])
                    sub = np.concatenate(
                        [data[offsets[j]: offsets[j + 1]] for j in idx]
                    ) if len(idx) else np.empty(0, dtype=np.uint8)
                    was_present = kernel.lookup_or_add(
                        sub, sub_off, as_of=int(ts[idx[0]])
                    )
                    # tdbloom's lookup_or_add probes the whole group
                    # against PRE-call state (kernels/tdbloom.py:159-162),
                    # so a key repeated within one second-group would read
                    # not-present twice; suppress later same-group repeats
                    # explicitly for exact test-and-set semantics
                    dup_in_group = _pd.Series(key_arr[idx]).duplicated().to_numpy()
                    seen[idx] = was_present | dup_in_group
            else:
                seen = kernel.lookup_or_add(data, offsets)
            fresh = pdf.loc[~seen, out_cols]
            n_emitted += len(fresh)
            if len(fresh):
                yield fresh
        if reset_pct is not None and not timed:
            kernel.clear_if_saturation_exceeds(reset_pct)
        state.update((kernel.serialize(), n_emitted))

    return _dedup_fn


def streaming_dedup(
    stream: DataFrame,
    key,
    spec,
    n_shards: int = 64,
    ts_col: str = "ts",
    saturation_reset_pct: float | None = None,
) -> DataFrame:
    """Cross-micro-batch first-occurrence dedup with BOUNDED state — the
    streaming analog of ``pipeline/dedup.py::exact_dedup``.

    Spark's built-in ``dropDuplicates`` keeps one exact state row per key
    forever (unbounded at 10^12 turns) and ``dropDuplicatesWithinWatermark``
    bounds state only by event-time.  This operator instead keeps a Bloom
    bitmap per shard — ``n_shards × spec.nbytes`` bytes TOTAL no matter how
    many keys flow through — at the documented cost of dropping a ~p
    fraction of genuinely-novel rows as false positives (size ``spec`` for
    the full corpus / ``n_shards`` each; p=1e-6 loses ~1 row per million).
    For training-data dedup that trade is usually right: state for 10^12
    keys at p=1e-4 is ~0.3 TB sharded across executors vs ~10s of TB exact.

    - ``spec=BloomSpec(...)``: dedup-forever (first occurrence wins).
    - ``spec=TdBloomSpec(...)``: suppress repeats within ``timeout`` seconds
      of event-time (``ts_col``), then re-admit — the reference's
      time-decaying membership (src/tdbloom.c) as a streaming suppressor.

    Keys shard via ``pmod(xxhash64(key), n_shards)`` so state parallelism is
    independent of key skew; each shard's bitmap updates via the kernel's
    ``lookup_or_add`` (sequential test-and-set semantics, exact within and
    across batches).  Null keys hash as the empty string (all nulls dedup to
    one surviving row).  ``saturation_reset_pct`` optionally clears a
    bloom-variant shard past that fill level — re-admitting duplicates
    (safe direction for training data) instead of losing novel rows to a
    saturated filter.

    Output = input rows (same schema) that were first-seen; drive with
    ``.writeStream.outputMode("append")``.
    """
    from sketchlib.specs import BloomSpec, TdBloomSpec

    if not isinstance(spec, (BloomSpec, TdBloomSpec)):
        raise ValueError(f"streaming_dedup needs BloomSpec or TdBloomSpec, got {spec.kind}")
    out_cols = list(stream.columns)
    key_col = F.col(key) if isinstance(key, str) else key
    prepared = stream.withColumn("__key", key_col.cast("string")).withColumn(
        "__shard", F.pmod(F.xxhash64("__key"), F.lit(n_shards))
    )
    if isinstance(spec, TdBloomSpec):
        prepared = prepared.withColumn(
            "__ts_sec", F.unix_timestamp(F.col(ts_col).cast("timestamp_ltz"))
        )
    out_schema = prepared.select(*out_cols).schema
    return prepared.groupBy("__shard").applyInPandasWithState(
        _make_dedup_fn(spec.to_json(), out_cols, saturation_reset_pct),
        out_schema,
        _DEDUP_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


_HH_STATE_SCHEMA = "blob binary, n_rows long"
_HH_OUT_SCHEMA = (
    "shard int, key string, count_lower long, undercount_bound long, "
    "shard_rows long"
)


def _make_hh_fn(spec_json: str):
    def _hh_fn(key, pdfs, state: GroupState):
        import pandas as pd

        from sketchlib.kernels.mg import MisraGries
        from sketchlib.specs import BaseSpec

        (shard,) = key
        spec = BaseSpec.from_json(spec_json)
        if state.exists:
            blob, n_rows = state.get
            mg = MisraGries.deserialize(spec, bytes(blob))
        else:
            mg, n_rows = MisraGries(spec), 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            mg.update_strings(pdf["__key"].fillna("").tolist())
            n_rows += len(pdf)
        state.update((mg.serialize(), n_rows))
        hh = mg.heavy_hitters()
        bound = mg.max_undercount()
        yield pd.DataFrame(
            {
                "shard": [shard] * len(hh),
                "key": [k.decode("utf-8", "replace") for k, _ in hh],
                "count_lower": [c for _, c in hh],
                "undercount_bound": [bound] * len(hh),
                "shard_rows": [n_rows] * len(hh),
            }
        )

    return _hh_fn


def streaming_heavy_hitters(
    stream: DataFrame,
    key,
    spec,
    n_shards: int = 16,
) -> DataFrame:
    """Continuously-maintained heavy hitters: a Misra–Gries summary per
    key-shard in ``applyInPandasWithState``, refreshed every micro-batch —
    the streaming twin of the batch ``mg_heavy_hitters`` gate.

    Each key hashes to exactly ONE shard (``pmod(xxhash64(key), n_shards)``),
    so its estimate comes from that shard alone and the MG one-sided bound
    applies with the SHARD's row count: for every emitted key,
    ``count_lower ≤ true_count ≤ count_lower + undercount_bound``, with
    ``undercount_bound ≤ shard_rows/(k+1)`` — sharper than one global
    summary, and state is ``n_shards × k`` entries total no matter how many
    distinct keys stream past.

    Emits, per micro-batch and shard, the summary's current entries
    (output mode ``update``; the latest row per (shard, key) is the
    current estimate).  Fold shards for a fleet-wide view with a plain
    ``GROUP BY key`` — keys never span shards, so no MG re-merge is needed.
    """
    from sketchlib.specs import MGSpec

    if not isinstance(spec, MGSpec):
        raise ValueError(f"streaming_heavy_hitters needs MGSpec, got {spec.kind}")
    key_col = F.col(key) if isinstance(key, str) else key
    prepared = stream.withColumn("__key", key_col.cast("string")).withColumn(
        "__shard", F.pmod(F.xxhash64("__key"), F.lit(n_shards)).cast("int")
    )
    return prepared.groupBy("__shard").applyInPandasWithState(
        _make_hh_fn(spec.to_json()),
        _HH_OUT_SCHEMA,
        _HH_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def cells_sink(root: str, jobs: list[SketchJob], query_name: str):
    """foreachBatch sink maintaining the DECLARATIVE suite cell store
    (spark/suite_sql.py): each micro-batch's cell frame is merged into a
    versioned sk-partitioned parquet snapshot — the streaming counterpart
    of ``sketch_sink`` with zero Python in the per-batch dataflow (the
    batch aggregation and the merge are both pure Catalyst; only the
    pointer bookkeeping runs on the driver).

    Exactly-once: each epoch writes a NEW snapshot directory
    (``{query_name}.cells.epoch=N``) from the previous pointer's snapshot
    + the batch, then atomically swings the pointer file.  A replayed
    epoch ≤ the pointer's is skipped; a crash between snapshot write and
    pointer swing merely rewrites the same snapshot from the same (old)
    pointer on replay — never a double fold.  The previous snapshot is
    kept for in-flight readers; older ones are removed."""
    import shutil

    pointer = os.path.join(root, f"{query_name}.cells.json")

    def _ptr():
        try:
            with open(pointer) as f:
                return json.load(f)
        except (OSError, ValueError):
            return None

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        from sketchlib.spark.suite_sql import (
            merge_suite_cells,
            read_suite_cells,
            suite_cell_rows,
            write_suite_cells,
        )

        cur = _ptr()
        if cur is not None and epoch_id <= cur["epoch"]:
            return
        spark = batch_df.sparkSession
        new = suite_cell_rows(batch_df, jobs)
        if cur is not None:
            new = merge_suite_cells(read_suite_cells(spark, cur["path"]), new)
        out = os.path.join(root, f"{query_name}.cells.epoch={epoch_id}")
        write_suite_cells(new, out)
        tmp = pointer + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"epoch": epoch_id, "path": out}, f)
        os.replace(tmp, pointer)
        # GC: keep the new and the immediately previous snapshot
        keep = {out, cur["path"] if cur else out}
        prefix = f"{query_name}.cells.epoch="
        for d in os.listdir(root):
            full = os.path.join(root, d)
            if d.startswith(prefix) and full not in keep:
                shutil.rmtree(full, ignore_errors=True)

    return _apply


def run_stream_cells(
    spark: SparkSession,
    input_path: str,
    root: str,
    jobs: list[SketchJob],
    checkpoint_dir: str,
    query_name: str = "cells_build",
):
    """Wire stream → cells_sink (the declarative cell-store maintenance
    job); caller drives with processAllAvailable() or awaitTermination()."""
    os.makedirs(root, exist_ok=True)
    stream = read_transcripts_stream(spark, input_path)
    return (
        stream.writeStream.foreachBatch(cells_sink(root, jobs, query_name))
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )


def read_stream_cells(spark: SparkSession, root: str, query_name: str = "cells_build") -> DataFrame:
    """The latest streamed cell snapshot as a DataFrame (probe it with the
    declarative probes or materialize kernels via
    ``suite_sql.materialize_suite_cells``)."""
    from sketchlib.spark.suite_sql import read_suite_cells

    with open(os.path.join(root, f"{query_name}.cells.json")) as f:
        ptr = json.load(f)
    return read_suite_cells(spark, ptr["path"])
