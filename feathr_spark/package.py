"""Build the ``--py-files`` artifact for spark-submit deployment.

The engine is pure Python (DataFrame API + pandas/Arrow UDFs), so
cluster deployment is one zip::

    python -m feathr_spark.package dist/feathr_spark.zip
    spark-submit --py-files dist/feathr_spark.zip jobs/corpus_features.py \
        --input /data/corpus --obs /data/observations --output /data/features

Reference analogue: the reference ships a fat jar + a thin Python client
that submits it (feathr_project/feathr/client.py:497-570); here the
engine itself IS the Python package, so the zip replaces the jar.
"""

from __future__ import annotations

import os
import sys
import zipfile


def build_pyfiles_zip(out_path: str) -> str:
    """Zip the feathr_spark package (importable from the zip root, as
    spark-submit --py-files requires). Deterministic: fixed timestamps
    and sorted entries, so repeated builds are byte-identical."""
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    parent = os.path.dirname(pkg_root)
    out_dir = os.path.dirname(os.path.abspath(out_path))
    os.makedirs(out_dir, exist_ok=True)

    entries = []
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith((".py",)):
                full = os.path.join(dirpath, fn)
                entries.append((full, os.path.relpath(full, parent)))

    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, arc in entries:
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arc, date_time=(2020, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            zf.writestr(info, data, zipfile.ZIP_DEFLATED)
    return out_path


def main(argv: list[str]) -> None:
    out = argv[0] if argv else "dist/feathr_spark.zip"
    path = build_pyfiles_zip(out)
    print(path)


if __name__ == "__main__":  # pragma: no cover
    main(sys.argv[1:])
