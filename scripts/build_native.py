#!/usr/bin/env python3
"""Build the _jefferson_native C++ extension in place (plain g++)."""

import subprocess
import sys
import sysconfig
from pathlib import Path

import numpy as np


def main() -> int:
    root = Path(__file__).resolve().parent.parent
    src = root / "jefferson_tpu" / "native" / "_native.cpp"
    ext = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = src.parent / f"_jefferson_native{ext}"
    cmd = [
        # -ffp-contract=off: the plan core's BIT-EXACT contract vs NumPy
        # (tests/test_native.py) forbids FMA contraction — on FMA-baseline
        # targets (aarch64, -march=native) the default contraction would
        # shift e.g. 1 + fsvs*r*r by 1 ulp and silently eat sweep-gate
        # headroom relative to the independently-computed oracle
        "g++", "-O3", "-ffp-contract=off", "-shared", "-fPIC", "-std=c++17",
        f"-I{sysconfig.get_paths()['include']}",
        f"-I{np.get_include()}",
        str(src), "-o", str(out),
    ]
    print(" ".join(cmd))
    rc = subprocess.call(cmd)
    if rc == 0:
        print(f"built {out}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
