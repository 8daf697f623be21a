"""North-rule deployment path: the build job submitted via
``spark-submit --py-files sketchlib.zip`` into a fresh JVM with the library
available ONLY through the shipped zip (no repo on PYTHONPATH)."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _zip_package(dest: str) -> str:
    zpath = os.path.join(dest, "sketchlib.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "sketchlib")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_py_files_build(tmp_path):
    zpath = _zip_package(str(tmp_path))
    driver = tmp_path / "job.py"
    driver.write_text(
        "import sys\n"
        "from sketchlib.jobs.build_sketches import main\n"
        "sys.exit(main(sys.argv[1:]))\n"
    )
    # input: a small parquet written by a plain pyarrow process (no session
    # reuse with the test JVM)
    import pyarrow as pa
    import pyarrow.parquet as pq

    data = pa.table({"key": [f"k{i % 500}" for i in range(5000)]})
    inp = str(tmp_path / "in.parquet")
    pq.write_table(data, inp)
    store = str(tmp_path / "store")

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    out = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zpath,
            str(driver),
            "--input", inp, "--store", store, "--name", "hll_keys",
            "--kind", "hll", "--key", "key", "--p", "12", "--run-id", "submit-test",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(tmp_path),  # NOT the repo — sketchlib must come from the zip
        env=env,
    )
    assert out.returncode == 0, out.stdout[-1500:] + out.stderr[-1500:]

    # validate the store from the host process
    sys.path.insert(0, REPO)
    from sketchlib.store import SketchStore

    kernel, metrics = SketchStore(store).load_kernel("hll_keys")
    est = kernel.estimate()
    assert abs(est - 500) / 500 <= 0.05
    assert metrics["rows"] == 5000


def test_build_cells_job_incremental(tmp_path):
    """The declarative cell-store job (jobs/build_cells.py): two
    incremental runs over split inputs materialize byte-identical kernels
    to one suite build over the union — the nightly-increment contract."""
    import json

    import numpy as np
    import pandas as pd

    from sketchlib.jobs.build_cells import main as cells_main
    from sketchlib.spark import get_spark
    from sketchlib.spark.agg import SketchJob
    from sketchlib.spark.suite_sql import (
        build_suite_sql,
        materialize_suite_cells,
        read_suite_cells,
    )
    from sketchlib.specs import BloomSpec, HllSpec

    spark = get_spark("build-cells-test", cpus=4, shuffle_partitions=4)
    rng = np.random.default_rng(9)
    pdf = pd.DataFrame(
        {
            "conv_id": [f"c{i}" for i in rng.integers(0, 400, 3000)],
            "text": [f"txt {i}" for i in rng.integers(0, 2000, 3000)],
        }
    )
    a, b = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    allp = str(tmp_path / "all.parquet")
    spark.createDataFrame(pdf.iloc[:1500]).write.parquet(a)
    spark.createDataFrame(pdf.iloc[1500:]).write.parquet(b)
    spark.createDataFrame(pdf).write.parquet(allp)

    root = str(tmp_path / "cellroot")
    jobspec = ["--job", "hll:hll_conv:conv_id",
               "--job", "bloom:bloom_text:text:expected=5000,accuracy=0.01"]
    assert cells_main(["--input", a, "--root", root, "--cpus", "4"] + jobspec) == 0
    assert cells_main(["--input", b, "--root", root, "--cpus", "4"] + jobspec) == 0
    with open(f"{root}/cells.cells.json") as f:
        ptr = json.load(f)
    assert ptr["gen"] == 1

    jobs = [
        SketchJob("hll_conv", HllSpec(), key="conv_id", prehash=True),
        SketchJob("bloom_text", BloomSpec(5000, 0.01), key="text", prehash=True),
    ]
    stored = materialize_suite_cells(read_suite_cells(spark, ptr["path"]), jobs)
    whole = build_suite_sql(spark.read.parquet(allp), jobs)
    for name in ("hll_conv", "bloom_text"):
        assert stored[name][0].serialize() == whole[name][0].serialize(), name


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_cluster_child_multi_executor(tmp_path):
    """The multi-executor scaling child (tools/cluster_child.py) submitted
    at local-cluster[2,1,1024]: two SEPARATE worker JVMs must register and
    the suite must complete with a RESULT line — the same path
    tools/bench_cluster.py times at 1 vs 4 executors."""
    import json

    zpath = _zip_package(str(tmp_path))
    sys.path.insert(0, REPO)
    from sketchlib.testdata import write_transcripts_parquet

    inp = str(tmp_path / "tiny_transcripts.parquet")
    write_transcripts_parquet(inp, n_conversations=200, seed=7)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    out = subprocess.run(
        [
            "spark-submit",
            "--master", "local-cluster[2,1,1024]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.executor.memory=768m",
            "--py-files", zpath,
            os.path.join(REPO, "tools", "cluster_child.py"),
            inp, "1", "2",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(tmp_path),  # NOT the repo — sketchlib must come from the zip
        env=env,
    )
    assert out.returncode == 0, out.stdout[-1500:] + out.stderr[-1500:]
    results = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
    assert results, out.stdout[-1500:]
    r = json.loads(results[0][len("RESULT "):])
    assert r["executors"] == 2
    assert r["rows"] > 0 and r["suite_sec"] > 0
