#!/usr/bin/env python
"""Build the --py-files archive for cluster submission.

The north rule's deployment shape is ``spark-submit --py-files
dist/crawlspark.zip tools/submit_crawl.py ...`` on a multi-executor
cluster: the zip is what ships the engine to every executor's Python
worker (pyspark docs: zip/egg on --py-files is prepended to PYTHONPATH on
driver and executors). This builder zips only the package sources —
deterministically ordered, pycache excluded — so the artifact is
reproducible and small enough to broadcast at job start.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str | None = None, repo: str = REPO) -> str:
    out = out or os.path.join(repo, "dist", "crawlspark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(repo, "crawlspark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in sorted(os.walk(pkg)):
            dirs[:] = sorted(d for d in dirs if d != "__pycache__")
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                # fixed timestamp => byte-identical archive per source state
                info = zipfile.ZipInfo(os.path.relpath(full, repo))
                info.date_time = (2000, 1, 1, 0, 0, 0)
                info.compress_type = zipfile.ZIP_DEFLATED
                with open(full, "rb") as fh:
                    z.writestr(info, fh.read())
    return out


if __name__ == "__main__":
    print(build())
