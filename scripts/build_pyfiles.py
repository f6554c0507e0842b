#!/usr/bin/env python3
"""Package the engine for ``spark-submit --py-files`` (north rule: the job
"runs via spark-submit --py-files on multi-executor clusters").

Produces a zip whose root contains the ``jurisprudencia_privada_etl_spark``
package — spark-submit prepends it to ``sys.path`` on the driver and ships
it to every executor's python workers, so one artifact serves both sides.

The zip is deterministic (fixed timestamps, sorted entries, no bytecode):
re-packaging an unchanged tree yields byte-identical output, which lets a
deploy pipeline content-address the artifact.

Usage: python scripts/build_pyfiles.py [out.zip]   (default: engine.zip)
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "jurisprudencia_privada_etl_spark"
EPOCH_STAMP = (1980, 1, 1, 0, 0, 0)  # zip format's epoch; fixed for determinism


def build(repo_root: str, out_path: str) -> list[str]:
    pkg_root = os.path.join(repo_root, PKG)
    entries: list[str] = []
    for root, dirs, files in os.walk(pkg_root):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith((".pyc", ".pyo")):
                continue
            full = os.path.join(root, f)
            entries.append(os.path.relpath(full, repo_root))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for rel in entries:
            with open(os.path.join(repo_root, rel), "rb") as fh:
                info = zipfile.ZipInfo(rel.replace(os.sep, "/"), EPOCH_STAMP)
                info.external_attr = 0o644 << 16
                z.writestr(info, fh.read(), zipfile.ZIP_DEFLATED)
    return entries


if __name__ == "__main__":
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(repo, "engine.zip")
    n = len(build(repo, out))
    print(f"{out}: {n} files, {os.path.getsize(out)} bytes")
