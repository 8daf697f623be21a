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
