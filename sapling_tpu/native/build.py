"""Compile-on-demand build of the native C++ substrate.

The shared library is compiled with g++ the first time it is needed and
cached next to the sources, keyed by a hash of all .cpp/.h files so edits
trigger a rebuild. No external build system required (the reference used a
7-line Makefile: src/Makefile:1-7).
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import threading

_CSRC = os.path.join(os.path.dirname(__file__), "csrc")
_LOCK = threading.Lock()
_CACHE: dict[str, str] = {}

_CXX = os.environ.get("CXX", "g++")
# SAPLING_NATIVE_DEBUG=1 switches to a sanitized debug build (ASan +
# UBSan, -O1, frame pointers) — the reference ships no sanitizer config
# at all (src/Makefile:2 has only -g -Wall). The build is hash-keyed on
# the flag set, so debug and release .so files never collide; note an
# ASan .so only loads into a process started with LD_PRELOAD=libasan.
if os.environ.get("SAPLING_NATIVE_DEBUG"):
    _FLAGS = ["-O1", "-g", "-std=c++17", "-fPIC", "-shared",
              "-fsanitize=address,undefined", "-fno-omit-frame-pointer"]
else:
    _FLAGS = ["-O3", "-std=c++17", "-fPIC", "-shared", "-march=native",
              "-funroll-loops"]


def _source_files() -> list[str]:
    return sorted(
        os.path.join(_CSRC, f)
        for f in os.listdir(_CSRC)
        if f.endswith((".cpp", ".cc", ".h", ".hpp"))
    )


def _digest(paths: list[str]) -> str:
    h = hashlib.sha256()
    h.update(" ".join([_CXX] + _FLAGS).encode())
    for p in paths:
        with open(p, "rb") as f:
            h.update(p.encode())
            h.update(f.read())
    return h.hexdigest()[:16]


def build_native(name: str = "libsapling_native") -> str:
    """Build (or reuse) the native shared library; returns its path."""
    with _LOCK:
        if name in _CACHE:
            return _CACHE[name]
        srcs = [p for p in _source_files() if p.endswith((".cpp", ".cc"))]
        tag = _digest(_source_files())
        out = os.path.join(_CSRC, f"{name}-{tag}.so")
        if not os.path.exists(out):
            tmp = out + f".tmp{os.getpid()}"
            cmd = [_CXX, *_FLAGS, "-o", tmp, *srcs]
            try:
                subprocess.run(cmd, check=True, capture_output=True, text=True)
            except subprocess.CalledProcessError as e:  # pragma: no cover
                raise RuntimeError(
                    f"native build failed:\n{' '.join(cmd)}\n{e.stderr}"
                ) from e
            os.replace(tmp, out)
            # Tidy stale builds of the same lib.
            for f in os.listdir(_CSRC):
                if f.startswith(name + "-") and f.endswith(".so") and f != os.path.basename(out):
                    try:
                        os.remove(os.path.join(_CSRC, f))
                    except OSError:
                        pass
        _CACHE[name] = out
        return out
