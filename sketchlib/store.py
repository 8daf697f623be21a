"""Sketch store: persistence, per-partition lineage, and resumable builds.

The Spark analog of the reference's filter files (``bloom_save``/``bloom_load``
header+bitmap dumps, src/bloom.c:525-628) — but as a queryable Parquet (or
Iceberg, when a runtime jar is on the classpath) table instead of opaque
binaries, with the lineage the north rule requires:

    sketch_store/
      lineage/   one row per (run, sketch, input file):
                 (run_id, sketch_name, kind, spec_json, input_fingerprint,
                  state zlib-binary, rows, build_sec)
      merged/    one row per sketch: the folded state + metrics JSON

Resume: a build plans one unit per input FILE (deterministic fingerprint =
path + size), anti-joins against existing lineage rows, builds only the
missing files, and re-folds — killed and resumed runs produce byte-identical
final states (gate: tests/test_store.py).
"""

from __future__ import annotations

import json
import os
import uuid
import zlib
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import SparkSession

from sketchlib.kernels import KERNEL_BY_KIND
from sketchlib.spark.agg import SketchJob, _merge_blobs, _pack_state, sketch_partials
from sketchlib.specs import BaseSpec

_LINEAGE_SCHEMA = pa.schema(
    [
        ("run_id", pa.string()),
        ("sketch_name", pa.string()),
        ("kind", pa.string()),
        ("spec_json", pa.string()),
        ("input_fingerprint", pa.string()),
        ("state", pa.binary()),
        ("rows", pa.int64()),
        ("build_sec", pa.float64()),
    ]
)


def _fingerprint(path: str) -> str:
    st = os.stat(path)
    return f"{path}:{st.st_size}"


@dataclass
class SketchStore:
    root: str

    @property
    def lineage_dir(self) -> str:
        return os.path.join(self.root, "lineage")

    @property
    def merged_dir(self) -> str:
        return os.path.join(self.root, "merged")

    # -- merged-state API (bloom_save/bloom_load analog) -------------------
    def save_kernel(self, name: str, kernel, metrics: dict | None = None) -> None:
        os.makedirs(self.merged_dir, exist_ok=True)
        tbl = pa.table(
            {
                "sketch_name": [name],
                "kind": [kernel.spec.kind],
                "spec_json": [kernel.spec.to_json()],
                "state": [_pack_state(kernel.serialize())],
                "metrics_json": [json.dumps(metrics or {}, sort_keys=True)],
            }
        )
        # atomic publish: write to a temp name, then rename — a crash
        # mid-write must never leave a truncated parquet at the final path
        # (streaming.sketch_sink's replay recovery depends on load_kernel
        # seeing either the old state or the new one, nothing in between)
        final = os.path.join(self.merged_dir, f"{name}.parquet")
        tmp = f"{final}.{uuid.uuid4().hex}.tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, final)

    def load_kernel(self, name: str):
        tbl = pq.read_table(os.path.join(self.merged_dir, f"{name}.parquet"))
        spec = BaseSpec.from_json(tbl.column("spec_json")[0].as_py())
        blob = tbl.column("state")[0].as_py()
        if blob[:2] == b"Z1":
            blob = zlib.decompress(blob[2:])
        kernel = KERNEL_BY_KIND[spec.kind].deserialize(spec, blob)
        metrics = json.loads(tbl.column("metrics_json")[0].as_py())
        return kernel, metrics

    def list_sketches(self) -> list[str]:
        if not os.path.isdir(self.merged_dir):
            return []
        return sorted(
            f[: -len(".parquet")]
            for f in os.listdir(self.merged_dir)
            if f.endswith(".parquet")
        )

    # -- lineage ------------------------------------------------------------
    def lineage_fingerprints(self, sketch_name: str) -> set[str]:
        if not os.path.isdir(self.lineage_dir) or not os.listdir(self.lineage_dir):
            return set()
        tbl = pq.read_table(
            self.lineage_dir, columns=["sketch_name", "input_fingerprint"]
        )
        mask = pa.compute.equal(tbl.column("sketch_name"), sketch_name)
        return set(tbl.filter(mask).column("input_fingerprint").to_pylist())

    def _append_lineage(self, rows: dict, batch_id: str) -> None:
        os.makedirs(self.lineage_dir, exist_ok=True)
        tbl = pa.table(rows, schema=_LINEAGE_SCHEMA)
        # write-then-rename: a crash mid-write must not leave a lineage file
        # that resume would trust
        final = os.path.join(self.lineage_dir, f"lineage-{batch_id}.parquet")
        tmp = final + ".tmp"
        pq.write_table(tbl, tmp)
        os.rename(tmp, final)

    # -- resumable build ----------------------------------------------------
    def build_resumable(
        self,
        spark: SparkSession,
        input_files: list[str],
        job: SketchJob,
        run_id: str,
        batch_files: int = 64,
        fail_after_batches: int | None = None,
    ):
        """Build ``job`` over ``input_files`` with file-level lineage; skip
        files whose lineage rows already exist (resume), fold everything at
        the end.  ``fail_after_batches`` injects a crash for resume tests.

        Returns (kernel, total_rows, built_files, skipped_files)."""
        import time as _time

        done = self.lineage_fingerprints(job.name)
        plan = [(f, _fingerprint(f)) for f in sorted(input_files)]
        todo = [(f, fp) for f, fp in plan if fp not in done]
        skipped = len(plan) - len(todo)

        batches_done = 0
        for i in range(0, len(todo), batch_files):
            chunk = todo[i : i + batch_files]
            if fail_after_batches is not None and batches_done >= fail_after_batches:
                raise RuntimeError("injected failure for resume test")
            df = spark.read.parquet(*[f for f, _ in chunk])
            # one partial per input file: coalesce not needed — per-file
            # states are merged anyway; we record one lineage row per chunk
            # FILE by building each file separately when chunks are small,
            # else per-chunk.  File granularity keeps resume simple.
            t0 = _time.perf_counter()
            partials = sketch_partials(
                df, job.spec, key=job.key, ts=job.ts, values=job.values
            )
            tbl = partials.toArrow()
            dt = _time.perf_counter() - t0
            blobs = tbl.column("state").to_pylist()
            nrows = tbl.column("rows").to_pylist()
            merged = _merge_blobs(job.spec.to_json(), blobs)
            self._append_lineage(
                {
                    "run_id": [run_id] * len(chunk),
                    "sketch_name": [job.name] * len(chunk),
                    "kind": [job.spec.kind] * len(chunk),
                    "spec_json": [job.spec.to_json()] * len(chunk),
                    "input_fingerprint": [fp for _, fp in chunk],
                    # chunk-level state stored on the FIRST file's row; other
                    # rows carry empty states (they mark completion only)
                    "state": [_pack_state(merged.serialize())]
                    + [b""] * (len(chunk) - 1),
                    "rows": [sum(nrows)] + [0] * (len(chunk) - 1),
                    "build_sec": [dt] + [0.0] * (len(chunk) - 1),
                },
                batch_id=f"{run_id}-{i:06d}",
            )
            batches_done += 1

        # fold ALL lineage states for this sketch (from any run)
        tbl = pq.read_table(self.lineage_dir)
        mask = pa.compute.equal(tbl.column("sketch_name"), job.name)
        sel = tbl.filter(mask)
        blobs = [b for b in sel.column("state").to_pylist() if b]
        total = sum(sel.column("rows").to_pylist())
        kernel = _merge_blobs(job.spec.to_json(), blobs)
        return kernel, total, len(todo), skipped
