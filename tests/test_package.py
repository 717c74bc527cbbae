"""spark-submit --py-files packaging (north_star deployment contract)."""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

from feathr_spark.package import build_pyfiles_zip

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_zip_contains_package(tmp_path):
    out = build_pyfiles_zip(str(tmp_path / "fs.zip"))
    with zipfile.ZipFile(out) as zf:
        names = zf.namelist()
    assert "feathr_spark/__init__.py" in names
    assert "feathr_spark/operators/swa.py" in names
    assert not any("__pycache__" in n for n in names)
    # deterministic build: rebuilding yields identical bytes
    out2 = build_pyfiles_zip(str(tmp_path / "fs2.zip"))
    assert open(out, "rb").read() == open(out2, "rb").read()


def test_zip_importable(tmp_path):
    """The zip must be importable from its root — what --py-files does."""
    out = build_pyfiles_zip(str(tmp_path / "fs.zip"))
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import feathr_spark.definitions as d; "
        "print(d.SWAFeature('x', 'SUM', 'v', d.WindowSpec(60)).name)" % out
    )
    res = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, cwd=str(tmp_path))
    assert res.returncode == 0, res.stderr
    assert res.stdout.strip() == "x"
