"""Build the native runtime library.

Usage: python -m rays1bench_tpu.runtime.build
Also invoked lazily by runtime.native on first use.
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "native", "imageio.cpp")
OUT = os.path.join(HERE, "native", "libraysrt.so")


def build(force: bool = False) -> str:
    """Compile the native library if missing/stale; returns the .so path."""
    if (not force and os.path.exists(OUT)
            and os.path.getmtime(OUT) >= os.path.getmtime(SRC)):
        return OUT
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-std=c++17", SRC, "-o", OUT]
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    path = build(force="--force" in sys.argv)
    print(f"built {path}")
