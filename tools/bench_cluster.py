"""North-rule scaling evidence on a REAL multi-executor cluster topology.

The north rule asks for the job "run via spark-submit --py-files on a
multi-executor cluster at two cluster sizes (N and 4N executors)".  This
sandbox has one host, but Spark's ``local-cluster[W, cores, mem]`` master
launches W genuinely separate worker JVMs (own heaps, task executors,
shuffle clients, RPC to the driver) — the standalone-cluster execution
topology minus only the inter-host network.  This harness submits the
pure-Catalyst 5-sketch suite (sketchlib/spark/suite_sql.py) via the real
``spark-submit --py-files sketchlib.zip`` path at

- N  = ``local-cluster[1,1,4096]``  (1 executor,  1 core)
- 4N = ``local-cluster[4,1,4096]``  (4 executors, 1 core each)

on the same 9M-turn input (strong scaling) plus a quarter-sized input on
the 1-executor level (weak scaling), interleaved across rounds, min per
level, with every raw sample appended to BENCH/scaling_samples.json
(level names ``lc_strong_lo`` / ``lc_strong_hi`` / ``lc_weak_lo``, mode
``sql-lc-cluster``) — the same accumulate-across-invocations protocol as
tools/bench_scaling.py, because this VM is time-shared and identical runs
vary 3-8x.

1-core executors keep the 4N level at 4 hot JVM threads, under the box's
shared-DRAM ceiling (BENCH/BASELINE.md controls: the no-Spark kernel
control caps at 0.61 by 16 threads) — so the pair measures the ENGINE's
executor-scaling behaviour, not the host's memory controllers.

Usage: python tools/bench_cluster.py [--rounds R] [--reps K]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CACHE = os.environ.get("SKETCHLIB_BENCH_CACHE", "/tmp/sketchlib_bench")
SPARK_SUBMIT = os.environ.get("SPARK_SUBMIT", "/opt/spark/bin/spark-submit")


def ensure_data(n_conv: int) -> str:
    path = f"{CACHE}/transcripts_{n_conv}.parquet"
    if not os.path.exists(path):
        from sketchlib.testdata import write_transcripts_parquet

        print(f"generating {n_conv} conversations …", file=sys.stderr)
        write_transcripts_parquet(path, n_conversations=n_conv, seed=42)
    return path


def build_zip() -> str:
    """Package the library the way a cluster deployment ships it."""
    os.makedirs(CACHE, exist_ok=True)
    out = shutil.make_archive(f"{CACHE}/sketchlib", "zip", root_dir=REPO, base_dir="sketchlib")
    return out


def submit_level(
    workers: int, path: str, reps: int, zip_path: str, spec_rows: int = 0
) -> dict:
    """One spark-submit run at ``local-cluster[workers,1,4096]``."""
    master = f"local-cluster[{workers},1,4096]"
    env = dict(os.environ)
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    env.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)
    cmd = [
        SPARK_SUBMIT,
        "--master", master,
        "--conf", "spark.executor.memory=3g",
        "--conf", "spark.driver.memory=4g",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zip_path,
        os.path.join(REPO, "tools", "cluster_child.py"),
        path, str(reps), str(workers),
    ] + ([str(spec_rows)] if spec_rows else [])
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1800, env=env)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            r = json.loads(line[len("RESULT "):])
            if r["executors"] != workers:
                raise RuntimeError(
                    f"asked for {workers} executors, cluster registered {r['executors']}"
                )
            return r
    raise RuntimeError(
        f"no RESULT from workers={workers}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def _git_head() -> str:
    try:
        return subprocess.run(
            ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
    except Exception:  # noqa: BLE001
        return "unknown"


# name -> (workers, which-table, spec_rows-override, history mode)
BIG_ROWS = 8_985_625
LEVELS = {
    "lc_strong_lo": (1, "big", 0, "sql-lc-cluster"),
    "lc_strong_hi": (4, "big", 0, "sql-lc-cluster"),
    "lc_weak_lo": (1, "small", 0, "sql-lc-cluster"),
    # constant-work weak variant: quarter data, 4N-level sketch geometry
    "lc_weak_lo_fg": (1, "small", BIG_ROWS, "sql-lc-cluster-fg"),
}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rounds", type=int, default=2, help="interleaved rounds")
    ap.add_argument("--reps", type=int, default=2, help="timed reps per submit")
    args = ap.parse_args()

    big = ensure_data(300_000)   # ~9.0M turns
    small = ensure_data(75_000)  # ~2.25M turns (≈ big/4)
    zip_path = build_zip()
    head = _git_head()

    tables = {"big": big, "small": small}
    best: dict[str, dict] = {}
    for rnd in range(args.rounds):
        for name, (workers, tbl, spec_rows, _mode) in LEVELS.items():
            r = submit_level(workers, tables[tbl], args.reps, zip_path, spec_rows)
            cur = best.get(name)
            if cur is None or r["suite_sec"] < cur["suite_sec"]:
                samples = (cur or {}).get("samples", []) + r["samples"]
                r["samples"] = samples
                best[name] = r
            else:
                cur["samples"] += r["samples"]
            print(f"round {rnd} {name}: {r if name in best else cur}", file=sys.stderr)

    cache_f = f"{REPO}/BENCH/scaling_samples.json"
    hist = {}
    if os.path.exists(cache_f):
        with open(cache_f) as f:
            hist = json.load(f)
    for name, (_workers, _tbl, _spec_rows, mode) in LEVELS.items():
        res = best[name]
        h = hist.setdefault(
            name, {"samples": [], "rows": res["rows"], "cpus": res["cpus"], "mode": mode}
        )
        if h.get("rows") != res["rows"] or h.get("cpus") != res["cpus"] or h.get("mode") != mode:
            h = hist[name] = {
                "samples": [], "rows": res["rows"], "cpus": res["cpus"], "mode": mode,
            }
        h["executors"] = res["executors"]
        h["samples"] += res["samples"]
        h.setdefault("by_head", {}).setdefault(head, []).extend(res["samples"])
        res["suite_sec"] = min(h["samples"])
        res["turns_per_sec"] = round(res["rows"] / res["suite_sec"])
    with open(cache_f, "w") as f:
        json.dump(hist, f, indent=1)

    lo, hi, wk, wk_fg = (best[n] for n in LEVELS)
    strong = (lo["suite_sec"] / hi["suite_sec"]) / 4
    weak = wk["suite_sec"] / hi["suite_sec"]
    weak_fg = wk_fg["suite_sec"] / hi["suite_sec"]
    print(json.dumps({
        "master_lo": "local-cluster[1,1,4096]",
        "master_hi": "local-cluster[4,1,4096]",
        "submit": "spark-submit --py-files sketchlib.zip tools/cluster_child.py",
        "strong": {"low": lo, "high": hi, "efficiency": round(strong, 3)},
        "weak": {"low": wk, "high": hi, "efficiency": round(weak, 3)},
        "weak_constant_work": {
            "low": wk_fg, "high": hi, "efficiency": round(weak_fg, 3),
        },
    }))


if __name__ == "__main__":
    main()
