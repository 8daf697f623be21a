"""``spark.read.format("archbloom")`` — a PySpark Python DataSource over
fleets of native archbloom filter files.

The reference persists one filter per file (``bloom_save`` src/bloom.c,
``cbloom_save`` src/cbloom.c, ``tdbloom_save`` src/tdbloom.c — magics
``!bloomf!``/``!cbloom!``/``!tdbloo!``, parsed by ``sketchlib/formats.py``).
A C deployment accumulates directories of them (one per tenant / day /
feed).  This source turns such a directory into a DataFrame — one row per
file, one file per task — so fleet-wide questions become SQL:

    spark.dataSource.register(ArchbloomDataSource)
    df = spark.read.format("archbloom").load("/var/filters/*.bloom")
    df.filter("kind = 'bloom' AND saturation_pct > 50").select("path", "name")

and the ``state``/``spec_json`` columns reconstruct a full kernel anywhere
(``kernel_from_row``) for probing or merging — e.g. OR-merging a fleet:
``import_merged`` below, or group rows and fold in any order (the merge
algebra is associative).

Writing is the mirror image: ``df.write.format("archbloom").save(dir)``
emits one native C-readable file per row (columns ``name``, ``spec_json``,
``state``) in parallel from the executors — the distributed counterpart of
``formats.export_file``.

Scale notes: listing happens on the driver (cheap — names only); each file
is read wholly inside one task (filter files are MBs — state-sized, never
data-sized).  Cuckoo native files (src/cuckoo.c:205-301) carry NO magic,
so they are only parsed when ``kind=cuckoo`` is forced via option.
"""

from __future__ import annotations

import glob as _glob
import os
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("name", StringType()),
        StructField("kind", StringType()),
        StructField("m", LongType()),
        StructField("k", LongType()),
        StructField("nbytes", LongType()),
        StructField("saturation_pct", DoubleType()),
        StructField("spec_json", StringType()),
        StructField("state", BinaryType()),
    ]
)


@dataclass
class _FilePartition(InputPartition):
    path: str
    kind_hint: str | None


def _row_from_file(path: str, kind_hint: str | None):
    from sketchlib.formats import cuckoo_native_import, import_file

    if kind_hint == "cuckoo":
        # no magic, no portable spec: state = the raw file (byte-exact
        # round-trip), kind tagged cuckoo_native, spec_json empty
        st = cuckoo_native_import(path)
        with open(path, "rb") as f:
            raw = f.read()
        return (
            path, "", "cuckoo_native",
            int(st.num_buckets * st.bucket_size), 0, len(raw),
            float(st.load_factor() * 100.0), "", raw,
        )
    kernel = import_file(path)
    spec = kernel.spec
    state = kernel.serialize()
    if spec.kind == "tdbloom":
        # time-decaying saturation needs an as-of; report occupied cells
        # (tick != 0) — the live fraction is a query, not a file property
        sat = float((kernel.ticks != 0).mean() * 100.0)
    else:
        sat = float(kernel.saturation())
    return (
        path,
        getattr(spec, "name", "") or "",
        spec.kind,
        int(getattr(spec, "m", 0)),
        int(getattr(spec, "k", 0)),
        len(state),
        sat,
        spec.to_json(),
        state,
    )


class _ArchbloomReader(DataSourceReader):
    def __init__(self, options):
        # load(p) arrives as option "path"; load(p1, p2, ...) arrives as
        # option "paths" holding a JSON-encoded array string
        paths: list[str] = []
        if options.get("path"):
            paths.append(options["path"])
        if options.get("paths"):
            import json as _json

            try:
                many = _json.loads(options["paths"])
            except ValueError:
                many = [options["paths"]]
            if not isinstance(many, list):
                # any non-array JSON value (string, number, bool, null)
                # is a single literal path, not a list to iterate
                many = [options["paths"]]
            paths.extend(str(p) for p in many)
        if not paths:
            raise ValueError("archbloom source needs a path (file, dir, or glob)")
        self.paths = paths
        self.kind_hint = options.get("kind")

    def partitions(self):
        files: list[str] = []
        for p in self.paths:
            if os.path.isdir(p):
                files.extend(
                    fp
                    for f in os.listdir(p)
                    if not f.startswith(".")
                    and os.path.isfile(fp := os.path.join(p, f))
                )
            else:
                files.extend(f for f in _glob.glob(p) if os.path.isfile(f))
        files = sorted(set(files))
        if not files:
            raise FileNotFoundError(
                f"archbloom source: no files match {self.paths}"
            )
        return [_FilePartition(f, self.kind_hint) for f in files]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        yield _row_from_file(partition.path, partition.kind_hint)


@dataclass
class _WroteFiles(WriterCommitMessage):
    #: ((tmp_path, final_path), ...) — renamed atomically at commit()
    staged: tuple


class _ArchbloomWriter(DataSourceWriter):
    """Two-phase writer: tasks write to per-task temp names (never final
    paths), the driver renames at commit() and deletes temps at abort() —
    a failed or speculatively-retried task can neither leave a partial
    final file behind nor collide with its own retry (ADVICE r4)."""

    def __init__(self, options, overwrite: bool):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("archbloom writer needs a directory path")
        self.overwrite = overwrite

    def write(self, iterator) -> _WroteFiles:
        import uuid

        from sketchlib.formats import export_file
        from sketchlib.kernels import KERNEL_BY_KIND
        from sketchlib.specs import BaseSpec

        os.makedirs(self.dir, exist_ok=True)
        staged = []
        for row in iterator:
            fname = row["name"]
            if not fname:
                # rows are written from many partitions into one dir — a
                # positional fallback name would collide across tasks
                raise ValueError(
                    "archbloom writer: every row needs a unique non-empty 'name'"
                )
            if row["kind"] == "cuckoo_native":
                # state IS the raw C file — byte-exact passthrough
                final = os.path.join(self.dir, f"{fname}.cuckoo")
                tmp = f"{final}.{uuid.uuid4().hex}.tmp"
                with open(tmp, "wb") as f:
                    f.write(bytes(row["state"]))
                staged.append((tmp, final))
                continue
            spec = BaseSpec.from_json(row["spec_json"])
            kernel = KERNEL_BY_KIND[spec.kind].deserialize(spec, bytes(row["state"]))
            final = os.path.join(self.dir, f"{fname}.{spec.kind}")
            tmp = f"{final}.{uuid.uuid4().hex}.tmp"
            export_file(kernel, tmp)
            staged.append((tmp, final))
        return _WroteFiles(tuple(staged))

    def commit(self, messages):
        staged = [
            pair for m in messages if m is not None for pair in m.staged
        ]
        finals = [final for _tmp, final in staged]
        from collections import Counter

        dupes = {f for f, n in Counter(finals).items() if n > 1}
        if dupes:
            for tmp, _final in staged:
                if os.path.exists(tmp):
                    os.unlink(tmp)
            raise ValueError(
                f"archbloom writer: duplicate row names map to {sorted(dupes)}"
            )
        if not self.overwrite:
            clashes = [f for f in finals if os.path.exists(f)]
            if clashes:
                for tmp, _final in staged:
                    if os.path.exists(tmp):
                        os.unlink(tmp)
                raise FileExistsError(
                    f"archbloom writer: {sorted(clashes)} exist "
                    "(use mode('overwrite') to replace)"
                )
        else:
            # overwrite = replace the dataset: clear stale non-temp files
            keep = set(finals)
            for f in os.listdir(self.dir):
                full = os.path.join(self.dir, f)
                if (
                    os.path.isfile(full)
                    and not f.endswith(".tmp")
                    and full not in keep
                ):
                    os.unlink(full)
        for tmp, final in staged:
            os.replace(tmp, final)
        return None

    def abort(self, messages):
        for m in messages:
            if m is None:
                continue
            for tmp, _final in m.staged:
                if os.path.exists(tmp):
                    os.unlink(tmp)
        return None


class ArchbloomDataSource(DataSource):
    """Register with ``spark.dataSource.register(ArchbloomDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "archbloom"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return _ArchbloomReader(self.options)

    def writer(self, schema, overwrite: bool):
        return _ArchbloomWriter(self.options, overwrite)


def kernel_from_row(row):
    """Rebuild the full kernel from one source row (any executor/driver)."""
    from sketchlib.kernels import KERNEL_BY_KIND
    from sketchlib.specs import BaseSpec

    if row["kind"] == "cuckoo_native":
        raise ValueError(
            "cuckoo_native rows carry the raw C file in 'state' — write it "
            "to disk and use formats.cuckoo_native_import (the defective C "
            "probe semantics are not a sketchlib kernel)"
        )
    spec = BaseSpec.from_json(row["spec_json"])
    return KERNEL_BY_KIND[spec.kind].deserialize(spec, bytes(row["state"]))


def import_merged(df, kind: str | None = None):
    """OR-merge every (compatible) filter row of ``df`` into one kernel —
    the fleet-wide union, folded associatively.  State-sized driver work:
    collect() moves only serialized filter states, never data.

    A mixed fleet (e.g. a broad glob matching bloom + tdbloom files) is
    rejected up front with the offending paths named, instead of failing
    deep inside a kernel merge; pass ``kind`` to filter to one family."""
    cols = ["kind", "spec_json", "state"]
    has_path = "path" in df.columns
    if has_path:
        cols.append("path")
    if kind is not None:
        df = df.filter(df["kind"] == kind)
    rows = df.select(*cols).collect()
    if not rows:
        raise ValueError("no rows to merge")

    def _where(r):
        return r["path"] if has_path else "<row without path column>"

    natives = [_where(r) for r in rows if r["kind"] == "cuckoo_native"]
    if natives:
        raise ValueError(
            "import_merged: cuckoo_native rows cannot be merged (the raw C "
            f"layout has no portable merge) — offending files: {natives[:5]}"
        )
    kinds = {r["kind"] for r in rows}
    if len(kinds) > 1:
        by_kind = {
            k: [_where(r) for r in rows if r["kind"] == k][:3] for k in sorted(kinds)
        }
        raise ValueError(
            f"import_merged: mixed filter kinds {sorted(kinds)} — pass "
            f"kind=... or narrow the glob; examples per kind: {by_kind}"
        )
    from sketchlib.specs import BaseSpec

    ref = BaseSpec.from_json(rows[0]["spec_json"])
    bad = [
        _where(r)
        for r in rows
        if not ref.compatible(BaseSpec.from_json(r["spec_json"]))
    ]
    if bad:
        raise ValueError(
            "import_merged: incompatible filter geometry vs "
            f"{_where(rows[0])} (size/hashcount/accuracy must match, "
            f"src/bloom.c:773-777 semantics) — offending files: {bad[:5]}"
        )
    merged = None
    for row in rows:
        k = kernel_from_row(row)
        merged = k if merged is None else merged.merge(k)
    return merged
