"""ctypes wrapper for the native tar shard loader (tarloader.cpp).

`iter_samples(paths)` yields the same {"__key__", field: bytes} groups as
the pure-Python tarfile path in llark_tpu/data/webdataset.py, but with
file IO + ustar parsing on C++ threads that read shards ahead of the
consumer. Decoding (json/pickle/npy) stays in Python, on the consumer
side. Falls back to None when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import logging
import os
import threading
from typing import Dict, Iterator, Optional, Sequence

log = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "tarloader.cpp")
_SO = os.path.join(_HERE, "_tarloader.so")
_lock = threading.Lock()
_lib = None
_tried = False


def load_library() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            from llark_tpu.native.build import compile_native

            if not compile_native(_SRC, _SO, extra_flags=("-pthread",)):
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            log.warning("failed to load %s: %s", _SO, e)
            return None
        vp = ctypes.c_void_p
        lib.ljt_loader_open.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_long, ctypes.c_int,
            ctypes.c_long,
        ]
        lib.ljt_loader_open.restype = vp
        lib.ljt_loader_next.argtypes = [vp]
        lib.ljt_loader_next.restype = vp
        lib.ljt_loader_close.argtypes = [vp]
        lib.ljt_sample_key.argtypes = [vp]
        lib.ljt_sample_key.restype = ctypes.c_char_p
        lib.ljt_sample_nfields.argtypes = [vp]
        lib.ljt_sample_nfields.restype = ctypes.c_long
        lib.ljt_sample_field_name.argtypes = [vp, ctypes.c_long]
        lib.ljt_sample_field_name.restype = ctypes.c_char_p
        lib.ljt_sample_field_size.argtypes = [vp, ctypes.c_long]
        lib.ljt_sample_field_size.restype = ctypes.c_long
        lib.ljt_sample_field_data.argtypes = [vp, ctypes.c_long]
        lib.ljt_sample_field_data.restype = ctypes.c_void_p
        lib.ljt_sample_free.argtypes = [vp]
        _lib = lib
        return _lib


def available() -> bool:
    return load_library() is not None


def iter_samples(
    paths: Sequence[str], n_threads: int = 2, readahead: int = 2
) -> Iterator[Dict[str, bytes]]:
    """Yield {"__key__": str, field_name: raw bytes} per sample, in shard
    order. Raises RuntimeError if the native library is unavailable."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native tarloader unavailable")
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    h = lib.ljt_loader_open(arr, len(paths), n_threads, readahead)
    try:
        while True:
            s = lib.ljt_loader_next(h)
            if not s:
                break
            try:
                out: Dict[str, bytes] = {
                    "__key__": lib.ljt_sample_key(s).decode()
                }
                for i in range(lib.ljt_sample_nfields(s)):
                    name = lib.ljt_sample_field_name(s, i).decode()
                    size = lib.ljt_sample_field_size(s, i)
                    ptr = lib.ljt_sample_field_data(s, i)
                    out[name] = ctypes.string_at(ptr, size) if size else b""
                yield out
            finally:
                lib.ljt_sample_free(s)
    finally:
        lib.ljt_loader_close(h)
