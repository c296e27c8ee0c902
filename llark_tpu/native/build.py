"""Build + ctypes-load the native audio preprocessing library.

`load_library()` compiles llark_tpu/native/audioproc.cpp with g++ -O3 on
first use (cached as _audioproc.so next to the source) and returns a
ctypes handle with typed signatures, or None if no toolchain is available
— callers fall back to the numpy implementations in llark_tpu/audio/io.py.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

log = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "audioproc.cpp")
_SO = os.path.join(_HERE, "_audioproc.so")
_lock = threading.Lock()
_lib = None
_tried = False


def compile_native(src: str, so: str, extra_flags=()) -> bool:
    """g++ -O3 build of one source file into a shared object."""
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", *extra_flags,
           "-o", so, src]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        log.warning("native build of %s failed (%s)", os.path.basename(src), e)
        return False


def _compile() -> bool:
    return compile_native(_SRC, _SO)


def load_library() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            log.warning("failed to load %s: %s", _SO, e)
            return None
        fp = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lp = ctypes.POINTER(ctypes.c_long)
        ip = ctypes.POINTER(ctypes.c_int)
        lib.ljt_peak_normalize.argtypes = [fp, ctypes.c_long]
        lib.ljt_resample_len.argtypes = [ctypes.c_long, ctypes.c_int, ctypes.c_int]
        lib.ljt_resample_len.restype = ctypes.c_long
        lib.ljt_resample.argtypes = [
            fp, ctypes.c_long, ctypes.c_int,
            fp, ctypes.c_long, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ]
        lib.ljt_parse_wav.argtypes = [u8p, ctypes.c_long, fp, lp, ip, ip]
        lib.ljt_parse_wav.restype = ctypes.c_int
        _lib = lib
        return _lib
