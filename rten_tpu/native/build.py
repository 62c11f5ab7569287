"""Build the native library: python -m rten_tpu.native.build"""

from __future__ import annotations

import os
import subprocess
import sys

SRC = os.path.join(os.path.dirname(__file__), "rten_native.cpp")
OUT = os.path.join(os.path.dirname(__file__), "librten_native.so")


def build(force: bool = False) -> str | None:
    """Compile the shared library if needed; returns its path or None."""
    if not force and os.path.exists(OUT) and os.path.getmtime(OUT) >= os.path.getmtime(SRC):
        return OUT
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
        "-o", OUT, SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        msg = getattr(e, "stderr", str(e))
        print(f"native build failed: {msg}", file=sys.stderr)
        return None
    return OUT


if __name__ == "__main__":
    path = build(force=True)
    if path:
        print(f"built {path}")
    else:
        sys.exit(1)
