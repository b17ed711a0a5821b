"""Deployment helpers."""

from __future__ import annotations

import os
import zipfile


def build_pyfiles_zip(out_path: str = "/tmp/valor_spark.zip") -> str:
    """Zip the ``valor_spark`` package for ``spark-submit --py-files``.

    Workers unpickle mapInPandas/mapInArrow closures by importing the module
    they live in, so the package must be importable on every executor —
    this zip is the cluster mechanism (local mode inherits the driver's
    PYTHONPATH instead)."""
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    repo_root = os.path.dirname(pkg_root)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, repo_root))
    return out_path
