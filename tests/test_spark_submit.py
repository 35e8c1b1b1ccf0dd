"""spark-submit --py-files deployment smoke test.

The north-star contract says the engine "ships as spark-submit --py-files":
zip the package, hand the zip to spark-submit, and the job must run with NO
repo checkout on the driver or executors. This test proves it end-to-end —
it builds engine.zip from the installed package, writes a tiny images
parquet, and launches a REAL spark-submit subprocess (fresh JVM, cwd outside
the repo so the zip is the only import path) running the `tile` CLI command.

Reference: bin/activity_files.dart (CLI binary surface).
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _build_engine_zip(dest: str) -> str:
    """zip -r engine.zip activity_files_spark (py files only)."""
    zpath = os.path.join(dest, "engine.zip")
    pkg = os.path.join(REPO, "activity_files_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_py_files_tile_job(tmp_path):
    zpath = _build_engine_zip(str(tmp_path))
    launcher = os.path.join(str(tmp_path), "spark_main.py")
    shutil.copy(os.path.join(REPO, "spark_main.py"), launcher)

    # tiny deterministic images table: 8 points on a lat/lon grid
    n = 8
    tbl = pa.table({
        "image_id": pa.array([f"img{i:03d}" for i in range(n)]),
        "lat": pa.array([10.0 + 5.0 * i for i in range(n)], pa.float64()),
        "lon": pa.array([-100.0 + 20.0 * i for i in range(n)], pa.float64()),
    })
    images = os.path.join(str(tmp_path), "images.parquet")
    pq.write_table(tbl, images)
    out = os.path.join(str(tmp_path), "tiles_out")

    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zpath,
            launcher,
            "tile", "--images", images, "--resolutions", "8,10",
            "--output", out,
        ],
        cwd=str(tmp_path),  # NOT the repo: imports must resolve from the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    # the CLI prints one JSON result line on stdout
    result = None
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            result = json.loads(line)
    assert result is not None, proc.stdout[-2000:]
    assert result["tiles"] == n * 2  # one row per image per resolution
    got = pq.read_table(out)
    assert got.num_rows == n * 2
    names = set(got.schema.names)
    assert {"image_id", "zoom"} <= names
