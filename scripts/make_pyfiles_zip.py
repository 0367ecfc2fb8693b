"""Package dggstools_spark into dist/dggstools_spark.zip for
spark-submit --py-files.

The zip is DETERMINISTIC (sorted members, fixed timestamps) so byte-equality
against a fresh build is a staleness test.  dist/ is gitignored; the zip is
rebuilt by this script at deploy time and verified/refreshed by
scripts/check_entry.py on every gate run, so a stale artifact can never ship.
"""

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZIP_PATH = f"{REPO}/dist/dggstools_spark.zip"

_FIXED_DATE = (2020, 1, 1, 0, 0, 0)  # fixed mtime => reproducible bytes


def build(out: str = ZIP_PATH) -> str:
    """Build the py-files zip deterministically; returns the path."""
    os.makedirs(os.path.dirname(out), exist_ok=True)
    members = []
    for root, _, files in os.walk(f"{REPO}/dggstools_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(root, f)
                members.append((os.path.relpath(full, REPO), full))
    members.sort()
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for arcname, full in members:
            info = zipfile.ZipInfo(arcname, date_time=_FIXED_DATE)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            with open(full, "rb") as fh:
                z.writestr(info, fh.read())
    return out


def is_stale(path: str = ZIP_PATH) -> bool:
    """True if `path` is missing or byte-differs from a fresh build."""
    if not os.path.exists(path):
        return True
    tmp = path + ".fresh"
    try:
        build(tmp)
        with open(path, "rb") as a, open(tmp, "rb") as b:
            return a.read() != b.read()
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def ensure_fresh(path: str = ZIP_PATH) -> bool:
    """Rebuild `path` if stale; returns True if it WAS stale (and is now
    fresh).  Called by scripts/check_entry.py so every gate run leaves a
    current artifact on disk."""
    stale = is_stale(path)
    if stale:
        build(path)
    return stale


def main() -> None:
    print(build())


if __name__ == "__main__":
    main()
