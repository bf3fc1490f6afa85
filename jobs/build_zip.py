#!/usr/bin/env python
"""Build ccspark.zip for spark-submit --py-files.

    python jobs/build_zip.py [out.zip]

The archive contains the ``ccspark`` package (source + data files) laid
out so that executors importing ``ccspark.*`` resolve it straight from
the zip on their PYTHONPATH — the north_rule's ship-via
``spark-submit --py-files`` contract.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> str:
    pkg = os.path.join(REPO, "ccspark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for name in sorted(files):
                if name.endswith((".pyc", ".pyo")):
                    continue
                full = os.path.join(root, name)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "ccspark.zip")
    print(build(out))
