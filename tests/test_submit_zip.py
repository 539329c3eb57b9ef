"""North-rule deployment pin: the package must run when shipped to a
cluster as a ``spark-submit --py-files`` zip (BASELINE.json north_star),
i.e. be zip-importable with no repo-cwd or PYTHONPATH dependence. Runs
the documented scripts/submit_demo.py flow — corpus gen, crawl engine,
oracle equality — in a fresh spark-submit JVM from a neutral cwd, with
only the zipped package on the python path."""

import os
import shutil
import subprocess
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _zip_package(dest: str) -> str:
    zpath = os.path.join(dest, "delver_spark.zip")
    pkg = os.path.join(REPO, "delver_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".pyc"):
                    continue
                p = os.path.join(root, f)
                z.write(p, os.path.relpath(p, REPO))
    return zpath


def test_spark_submit_py_files_zip(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pytest
        pytest.skip("spark-submit not on PATH")
    zpath = _zip_package(str(tmp_path))
    # copy the driver script out of the repo so its script-dir sys.path
    # entry cannot resolve the package — imports must come from the zip
    script = str(tmp_path / "submit_demo.py")
    shutil.copy(os.path.join(REPO, "scripts", "submit_demo.py"), script)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [spark_submit, "--master", "local[8]", "--py-files", zpath, script],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=280)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "SUBMIT_DEMO ok=True" in proc.stdout, proc.stdout[-2000:]
