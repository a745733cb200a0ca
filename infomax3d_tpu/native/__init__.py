"""Native (C) runtime components, loaded via ctypes.

The collate core `pack_topology` (batcher.c) replaces the python-level
index loops of `graphs/batch.py::batch_graphs` — see the C file's header
for the rationale.  The shared object is compiled lazily with the system
compiler and cached next to the source keyed by a content hash, so edits
to the .c rebuild automatically and prebuilt images skip the compile.

Everything degrades gracefully: `load()` returns None when no compiler is
available and callers fall back to the numpy path (the correctness oracle
either way).
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _source_hash() -> str:
    with open(os.path.join(_DIR, "batcher.c"), "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:12]


def _compile(so_path: str) -> bool:
    src = os.path.join(_DIR, "batcher.c")
    for cc in (os.environ.get("CC"), "cc", "gcc", "clang"):
        if not cc:
            continue
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", so_path, src, "-lm"],
                check=True, capture_output=True, timeout=120)
            return True
        except (OSError, subprocess.SubprocessError):
            continue
    return False


def load():
    """ctypes handle to the batcher library, or None (no compiler)."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("INFOMAX3D_NO_NATIVE"):
            return None
        so_path = os.path.join(_DIR, f"_batcher_{_source_hash()}.so")
        if not os.path.exists(so_path) and not _compile(so_path):
            return None
        try:
            lib = ctypes.CDLL(so_path)
        except OSError:
            return None
        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.pack_topology.restype = ctypes.c_int
        lib.pack_topology.argtypes = (
            [i32p, i32p, i32p, i32p]                      # src/dst/n_per/e_per
            + [ctypes.c_int32] * 9                        # g_real..do_csr
            + [i32p, i32p, i32p, i32p, i32p, i32p,        # senders..edge_graph
               u8p, u8p, i32p, u8p, f32p, f32p,           # masks, snorm, deg
               i32p, i32p, i32p, i32p, i32p,              # csr/csc, rd
               i32p, u8p, i32p, i32p, u8p, i32p,          # mailboxes
               i32p])                                     # scratch
        _LIB = lib
        return _LIB
