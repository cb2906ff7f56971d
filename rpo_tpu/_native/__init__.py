"""ctypes binding + on-demand build of the native image pipeline.

The .so is compiled once (g++ -O3, links libjpeg) into this directory;
loading is attempted lazily and every consumer falls back to the PIL path
when the library is unavailable (no compiler, no libjpeg, non-JPEG file).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "image_pipeline.cpp")
_SO = os.path.join(_HERE, "librpo_image.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    # Link into a temp file and rename into place: os.replace gives _SO a
    # fresh inode, so a retry CDLL(_SO) dlopens the new library instead of
    # glibc's cached handle for the old (possibly stale, still-mapped) one.
    tmp = f"{_SO}.tmp.{os.getpid()}"
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        _SRC, "-o", tmp, "-ljpeg", "-lpthread",
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=180)
    except Exception:
        return False
    if res.returncode != 0:
        import sys

        print(f"rpo_tpu native build failed:\n{res.stderr}", file=sys.stderr)
        return False
    try:
        os.replace(tmp, _SO)
    except OSError:
        return False
    return True


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed or os.environ.get("RPO_TPU_NO_NATIVE") == "1":
        return None
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
            _bind(lib)
        except (OSError, AttributeError):
            # AttributeError: a stale librpo_image.so (copied/touched
            # artifact whose mtime beats the source) missing a newer
            # symbol — rebuild once from the current source, else fall
            # back to the PIL path instead of killing the loader.
            try:
                if not _build():
                    raise OSError("rebuild failed")
                lib = ctypes.CDLL(_SO)
                _bind(lib)
            except (OSError, AttributeError):
                _build_failed = True
                return None
        _lib = lib
        return _lib


def _bind(lib: ctypes.CDLL) -> None:
        lib.rpo_eval_preprocess.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.rpo_eval_preprocess.restype = ctypes.c_int
        lib.rpo_train_preprocess.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.rpo_train_preprocess.restype = ctypes.c_int
        lib.rpo_image_size.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.rpo_image_size.restype = ctypes.c_int
        lib.rpo_eval_preprocess_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
        ]
        lib.rpo_eval_preprocess_batch.restype = ctypes.c_int
        lib.rpo_train_preprocess_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
        ]
        lib.rpo_train_preprocess_batch.restype = ctypes.c_int
