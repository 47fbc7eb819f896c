#!/usr/bin/env python3
"""Fetch the MIT KEMAR HRTF database (the data the reference engine loads,
reference: Jefferson/src/hrtf_signals.cu:124-133 reads the `full/` layout;
the repo ships the `compact/` layout).

Usage:
    python scripts/fetch_kemar.py [--set compact|full] [--dest DIR]

Downloads from MIT Media Lab's public KEMAR page and unpacks into DEST
(default ./kemar_<set>). Point the engine at it afterwards:

    export JEFFERSON_HRTF_DIR=$PWD/kemar_compact
    # or: jefferson --hrtf-dir kemar_compact ...

The data is (c) 1994 MIT Media Laboratory (Gardner & Martin), free for
research use — see the KEMAR documentation at the same site.
"""

from __future__ import annotations

import argparse
import io
import sys
import tarfile
import urllib.error
import urllib.request
import zipfile
from pathlib import Path

BASE = "https://sound.media.mit.edu/resources/KEMAR"
CANDIDATES = {
    # (url suffix, archive kind) in preference order
    "compact": [("compact.zip", "zip"), ("compact.tar.gz", "tar")],
    "full": [("full.zip", "zip"), ("full.tar.gz", "tar")],
}


def fetch(name: str, dest: Path) -> Path:
    last_err: Exception | None = None
    for suffix, kind in CANDIDATES[name]:
        url = f"{BASE}/{suffix}"
        print(f"downloading {url} ...")
        try:
            with urllib.request.urlopen(url, timeout=60) as resp:
                blob = resp.read()
        except (urllib.error.URLError, OSError) as e:
            last_err = e
            print(f"  failed: {e}", file=sys.stderr)
            continue
        dest.mkdir(parents=True, exist_ok=True)
        if kind == "zip":
            with zipfile.ZipFile(io.BytesIO(blob)) as z:
                for m in z.namelist():  # refuse path traversal from the archive
                    p = (dest / m).resolve()
                    if not p.is_relative_to(dest.resolve()):
                        raise SystemExit(f"refusing unsafe archive member {m!r}")
                z.extractall(dest)
        else:
            with tarfile.open(fileobj=io.BytesIO(blob)) as t:
                t.extractall(dest, filter="data")  # no traversal/links/devices
        # archives may nest a single top-level dir; flatten to DEST
        entries = list(dest.iterdir())
        if len(entries) == 1 and entries[0].is_dir():
            inner = entries[0]
            for p in inner.iterdir():
                p.rename(dest / p.name)
            inner.rmdir()
        print(f"unpacked into {dest}")
        return dest
    raise SystemExit(
        f"could not download the KEMAR {name} set ({last_err}).\n"
        f"Manual fallback: fetch it from {BASE}/ (any mirror of the 1994 MIT "
        f"Media Lab KEMAR HRTF measurements), unpack, and pass the directory "
        f"via --hrtf-dir or $JEFFERSON_HRTF_DIR."
    )


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--set", dest="which", choices=["compact", "full"], default="compact")
    p.add_argument("--dest", default=None, help="target dir (default ./kemar_<set>)")
    args = p.parse_args(argv)
    dest = Path(args.dest) if args.dest else Path(f"kemar_{args.which}")
    fetch(args.which, dest)
    print(f"done. export JEFFERSON_HRTF_DIR={dest.resolve()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
