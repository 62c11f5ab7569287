"""Build the native library: python -m rten_tpu.native.build"""

from __future__ import annotations

import os
import subprocess
import sys

SRC = os.path.join(os.path.dirname(__file__), "rten_native.cpp")
OUT = os.path.join(os.path.dirname(__file__), "librten_native.so")

EMBED_SRC = os.path.join(os.path.dirname(__file__), "embed_api.cpp")
EMBED_OUT = os.path.join(os.path.dirname(__file__), "librten_embed.so")


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


def build_embed(force: bool = False) -> str | None:
    """Compile librten_embed.so — the in-process C embedding API
    (reference wasm_api analog). Links against the running CPython."""
    import sysconfig

    if (
        not force
        and os.path.exists(EMBED_OUT)
        and os.path.getmtime(EMBED_OUT) >= os.path.getmtime(EMBED_SRC)
    ):
        return EMBED_OUT
    inc = sysconfig.get_paths()["include"]
    libdir = sysconfig.get_config_var("LIBDIR")
    ver = sysconfig.get_config_var("LDVERSION") or sysconfig.get_config_var("VERSION")
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
        f"-I{inc}",
        "-o", EMBED_OUT, EMBED_SRC,
        f"-L{libdir}", f"-lpython{ver}", f"-Wl,-rpath,{libdir}",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        msg = getattr(e, "stderr", str(e))
        print(f"embed build failed: {msg}", file=sys.stderr)
        return None
    return EMBED_OUT


if __name__ == "__main__":
    path = build(force=True)
    epath = build_embed(force=True)
    if path and epath:
        print(f"built {path}\nbuilt {epath}")
    else:
        sys.exit(1)
