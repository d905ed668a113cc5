"""North-rule shipping contract: the job runs via ``spark-submit
--py-files`` with the engine shipped as a zip/wheel, NOT via the repo
checkout on the driver's sys.path.

The test stages ``scripts/run_pipeline.py`` into a temp directory (so the
repo root is NOT importable from the script's location), zips
``grandine_spark`` the way ``pip wheel`` would package it, and submits with
``spark-submit --py-files <zip>``. If any import fell back to the checkout,
the staged copy would fail — this genuinely exercises the --py-files
distribution path the north rule names. A second submit against the same
warehouse must resume from the checkpoints and report identical counts.
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _build_pyfiles_zip(dest: str) -> str:
    """Package grandine_spark as the artifact spark-submit distributes to
    executors (equivalent to the wheel from ``pip wheel . -w dist/``)."""
    zpath = os.path.join(dest, "grandine_spark.zip")
    pkg = os.path.join(REPO, "grandine_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return zpath


def _submit(script: str, zpath: str, warehouse: str, cores: int = 4) -> dict:
    env = dict(os.environ)
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    env.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)
    env["SPARK_DRIVER_MEM"] = "4g"
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", f"local[{cores}]",
            "--py-files", zpath,
            script,
            "--n-pages", "1500",
            "--cores", str(cores),
            "--zooms", "2,5",
            "--warehouse", warehouse,
        ],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=os.path.dirname(script),  # neutral cwd: repo not importable
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    stats_line = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("{")
    ][-1]
    return json.loads(stats_line)


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this image"
)
def test_spark_submit_pyfiles_and_resume(tmp_path):
    zpath = _build_pyfiles_zip(str(tmp_path))
    # stage the entry script OUTSIDE the repo: its sys.path bootstrap then
    # points at tmp_path, so grandine_spark can only come from --py-files
    staged = tmp_path / "stage" / "run_pipeline.py"
    staged.parent.mkdir()
    shutil.copy(os.path.join(REPO, "scripts", "run_pipeline.py"), staged)
    wh = str(tmp_path / "wh")

    stats = _submit(str(staged), zpath, wh)
    assert stats["tiles"] > 0
    assert stats["join_rows"] > 0
    assert stats["geocoded"] > 0

    # lineage sidecars exist for every stage (resumability evidence)
    stages = {d for d in os.listdir(wh) if not d.startswith("_")}
    assert {"geocoded", "join_rows", "tiles"} <= stages

    # second submit against the same warehouse AND at 4x the parallelism
    # (local[16] vs local[4] — the north rule's N vs 4N executors): the
    # same wheel artifact runs at both cluster sizes, resumes from the
    # checkpoints, and reports identical counts (byte-identity of a
    # resumed run is covered in test_checkpoint_resume at the API level)
    stats2 = _submit(str(staged), zpath, wh, cores=16)
    for k in ("geocoded", "join_rows", "assignments", "tiles"):
        assert stats2[k] == stats[k], k
