"""bloomtool-equivalent CLI over the sketch store (reference:
``bin/bloomtool.c``, SURVEY.md §2.8) — every command maps 1:1:

    python -m sketchlib create <store> <name> --input <parquet> --key <col> \
        --expected N [--accuracy P] [--kind bloom]        # bloomtool create
    python -m sketchlib query  <store> <name> <string>    # bloomtool query/lookup
    python -m sketchlib add    <store> <name> --input …   # bloomtool add (incremental)
    python -m sketchlib info   <store> <name>             # bloomtool info
    python -m sketchlib rename <store> <name> <newname>   # bloomtool rename
    python -m sketchlib merge  <store> <in1> <in2> <out>  # bloomtool merge (OR)
    python -m sketchlib intersect <store> <in1> <in2> <out>      # AND
    python -m sketchlib intersection <store> <in1> <in2>  # Jaccard %
    python -m sketchlib export <store> <name> <file>      # native !bloomf! file
    python -m sketchlib import <store> <name> <file> [--timeout N]  # load one

``query`` exits 0 when present, 1 when absent, like the reference
(bin/bloomtool.c:81-105).
"""

from __future__ import annotations

import argparse
import copy
import json
import sys


def _store(path):
    from sketchlib.store import SketchStore

    return SketchStore(path)


def cmd_create(a) -> int:
    from sketchlib.jobs import build_sketches as bs

    argv = [
        "--input", a.input, "--store", a.store, "--name", a.name,
        "--kind", a.kind, "--key", a.key,
        "--expected", str(a.expected), "--accuracy", str(a.accuracy),
        "--run-id", a.run_id,
    ]
    return bs.main(argv)


def cmd_add(a) -> int:
    # incremental: lineage makes `add` the same job — new files build, old skip
    return cmd_create(a)


def cmd_query(a) -> int:
    kernel, _ = _store(a.store).load_kernel(a.name)
    if hasattr(kernel, "contains_strings"):
        kwargs = {"as_of": a.as_of} if kernel.spec.kind.startswith("td") else {}
        present = bool(kernel.contains_strings([a.element], **kwargs)[0])
    else:
        print(f"kind {kernel.spec.kind} has no membership query", file=sys.stderr)
        return 2
    if a.verbose:
        print("present" if present else "absent")
    return 0 if present else 1


def cmd_info(a) -> int:
    kernel, metrics = _store(a.store).load_kernel(a.name)
    spec = kernel.spec
    out = {"name": a.name, "kind": spec.kind, "spec": json.loads(spec.to_json()), "metrics": metrics}
    if hasattr(kernel, "saturation") and spec.kind == "bloom":
        out["saturation_pct"] = round(kernel.saturation(), 4)
        out["est_fpr"] = kernel.estimate_false_positive_rate()
    if hasattr(kernel, "estimate") and spec.kind == "hll":
        out["estimate"] = kernel.estimate()
    print(json.dumps(out, indent=2))
    return 0


def cmd_rename(a) -> int:
    st = _store(a.store)
    kernel, metrics = st.load_kernel(a.name)
    st.save_kernel(a.newname, kernel, metrics)
    return 0


def _binary_op(a, op: str) -> int:
    st = _store(a.store)
    k1, m1 = st.load_kernel(a.in1)
    k2, _ = st.load_kernel(a.in2)
    k1 = copy.deepcopy(k1)
    if op == "merge":
        k1.merge(k2)
    else:
        k1.intersect(k2)
    st.save_kernel(a.out, k1, {"derived_from": [a.in1, a.in2], "op": op})
    return 0


def cmd_merge(a) -> int:
    return _binary_op(a, "merge")


def cmd_intersect(a) -> int:
    return _binary_op(a, "intersect")


def cmd_intersection(a) -> int:
    st = _store(a.store)
    k1, _ = st.load_kernel(a.in1)
    k2, _ = st.load_kernel(a.in2)
    print(f"{k1.jaccard(k2):.2f}")
    return 0


def cmd_export(a) -> int:
    """Write a store sketch as a native archbloom filter file (!bloomf! /
    !cbloom! / !tdbloo!, sketchlib/formats.py) the C library can load."""
    from sketchlib.formats import export_file

    kernel, _ = _store(a.store).load_kernel(a.name)
    export_file(kernel, a.file)
    return 0


def cmd_import(a) -> int:
    """Load a native archbloom filter file into the store."""
    from sketchlib.formats import import_file

    kw = {"timeout": a.timeout} if a.timeout is not None else {}
    kernel = import_file(a.file, **kw)
    _store(a.store).save_kernel(a.name, kernel, {"imported_from": a.file})
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="sketchlib", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    def add(name, fn, *args_):
        p = sub.add_parser(name)
        p.set_defaults(fn=fn)
        for spec in args_:
            p.add_argument(*spec[0], **spec[1])
        return p

    common = (["store"], {})
    add(
        "create", cmd_create, common, (["name"], {}),
        (["--input"], {"required": True}), (["--key"], {"required": True}),
        (["--kind"], {"default": "bloom"}),
        (["--expected"], {"type": int, "default": 1_000_000}),
        (["--accuracy"], {"type": float, "default": 0.01}),
        (["--run-id"], {"default": "cli"}),
    )
    add(
        "add", cmd_add, common, (["name"], {}),
        (["--input"], {"required": True}), (["--key"], {"required": True}),
        (["--kind"], {"default": "bloom"}),
        (["--expected"], {"type": int, "default": 1_000_000}),
        (["--accuracy"], {"type": float, "default": 0.01}),
        (["--run-id"], {"default": "cli-add"}),
    )
    add(
        "query", cmd_query, common, (["name"], {}), (["element"], {}),
        (["--as-of"], {"type": int, "default": None}),
        (["-v", "--verbose"], {"action": "store_true"}),
    )
    add("info", cmd_info, common, (["name"], {}))
    add("rename", cmd_rename, common, (["name"], {}), (["newname"], {}))
    add("merge", cmd_merge, common, (["in1"], {}), (["in2"], {}), (["out"], {}))
    add("intersect", cmd_intersect, common, (["in1"], {}), (["in2"], {}), (["out"], {}))
    add("intersection", cmd_intersection, common, (["in1"], {}), (["in2"], {}))
    add("export", cmd_export, common, (["name"], {}), (["file"], {}))
    add(
        "import", cmd_import, common, (["name"], {}), (["file"], {}),
        (["--timeout"], {"type": int, "default": None,
                         "help": "required for C-written tdbloom files"}),
    )

    a = ap.parse_args(argv)
    return a.fn(a)


if __name__ == "__main__":
    sys.exit(main())
