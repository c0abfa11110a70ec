"""Package transmog_spark for ``spark-submit --py-files``.

Produces a single zip with the package rooted at ``transmog_spark/`` —
the artifact the north-rule cluster run ships next to
``jobs/backfill_features.py``:

    python scripts/make_pyfiles.py [dest.zip]
    spark-submit --master yarn --py-files transmog_spark.zip \
        jobs/backfill_features.py ...

Only ``.py`` sources are packaged (no tests, no caches); the zip is
deterministic (sorted entries, zeroed timestamps) so repeated builds of
the same tree are byte-identical — convenient for cache keys on the
cluster side.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(dest: str | None = None) -> str:
    dest = dest or os.path.join(REPO, "transmog_spark.zip")
    pkg = os.path.join(REPO, "transmog_spark")
    entries = []
    for root, _dirs, files in os.walk(pkg):
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(root, f)
                entries.append((os.path.relpath(full, REPO), full))
    entries.sort()
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, full in entries:
            with open(full, "rb") as fh:
                info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
                info.compress_type = zipfile.ZIP_DEFLATED
                z.writestr(info, fh.read())
    return dest


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
