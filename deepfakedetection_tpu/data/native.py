"""ctypes binding for the native decode library (native/dfd_loader.cc).

The reference decodes with PIL inside DataLoader worker processes
(reference: trainers/efficientnet.py:216-233); this is the TPU framework's
native runtime equivalent: C++ libjpeg/libpng decode with DCT-domain scaled
JPEG reads, PIL-quality triangle resampling, and an in-library thread pool —
~2x PIL throughput per core, no Python in the loop. Geometry is identical to
data/decode.py (shorter-side resize → center-crop square), verified by
tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import functools
from pathlib import Path

import numpy as np

_LIB_PATH = Path(__file__).resolve().parents[2] / "native" / "libdfd_loader.so"


@functools.cache
def _lib() -> ctypes.CDLL | None:
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.dfd_version.restype = ctypes.c_int
    lib.dfd_last_error.restype = ctypes.c_char_p
    lib.dfd_decode_image.restype = ctypes.c_int
    lib.dfd_decode_image.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte),
    ]
    lib.dfd_decode_buffer.restype = ctypes.c_int
    lib.dfd_decode_buffer.argtypes = [
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_long, ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte),
    ]
    lib.dfd_decode_batch.restype = ctypes.c_int
    lib.dfd_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    if hasattr(lib, "dfd_decode_batch_rc"):
        lib.dfd_decode_batch_rc.restype = ctypes.c_int
        lib.dfd_decode_batch_rc.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ]
    if hasattr(lib, "dfd_decode_buffer_batch_rc"):
        lib.dfd_decode_buffer_batch_rc.restype = ctypes.c_int
        lib.dfd_decode_buffer_batch_rc.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
            ctypes.POINTER(ctypes.c_long), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ]
    if hasattr(lib, "dfd_set_scaled_decode"):
        lib.dfd_set_scaled_decode.argtypes = [ctypes.c_int]
        import os

        # DCT-scaled JPEG decode is OPT-IN (round-4 measurement: serving a
        # PIL-trained model through the scaled chain cost 6 points top-1 on
        # noise-sensitive content — docs/BENCHMARKS.md "Decode fidelity")
        if os.environ.get("DFD_NATIVE_SCALED_DECODE") == "1":
            lib.dfd_set_scaled_decode(1)
    return lib


def set_scaled_decode(enable: bool) -> None:
    """Toggle the DCT-scaled JPEG fast path (default off; see module doc)."""
    lib = _lib()
    if lib is not None and hasattr(lib, "dfd_set_scaled_decode"):
        lib.dfd_set_scaled_decode(1 if enable else 0)


def available() -> bool:
    """True when the shared library is present and loadable."""
    return _lib() is not None


def last_error() -> str:
    lib = _lib()
    return lib.dfd_last_error().decode() if lib is not None else "library not loaded"


def decode_image(path: str | Path, target: int) -> np.ndarray:
    """Decode one file → uint8 [target, target, 3]. Raises on failure."""
    lib = _lib()
    if lib is None:
        raise RuntimeError(f"native loader not available at {_LIB_PATH}")
    out = np.empty((target, target, 3), np.uint8)
    rc = lib.dfd_decode_image(
        str(path).encode(), target,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    if rc != 0:
        raise RuntimeError(f"native decode failed for {path}: {last_error()}")
    return out


def decode_buffer(data: bytes, target: int) -> np.ndarray:
    """Decode an in-memory JPEG/PNG buffer → uint8 [target, target, 3]."""
    lib = _lib()
    if lib is None:
        raise RuntimeError(f"native loader not available at {_LIB_PATH}")
    out = np.empty((target, target, 3), np.uint8)
    buf = (ctypes.c_ubyte * len(data)).from_buffer_copy(data)
    rc = lib.dfd_decode_buffer(
        buf, len(data), target, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
    )
    if rc != 0:
        raise RuntimeError(f"native buffer decode failed: {last_error()}")
    return out


def has_buffer_batch() -> bool:
    """True when the library exposes the buffer-batch entry point
    (``dfd_decode_buffer_batch_rc``; rebuild with ``make -C native`` if not)."""
    lib = _lib()
    return lib is not None and hasattr(lib, "dfd_decode_buffer_batch_rc")


def decode_buffer_batch(
    buffers: list[bytes],
    target: int,
    *,
    n_threads: int = 4,
    resize_target: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Thread-pool batch decode of in-memory buffers (tar-shard datasets).

    Same geometry/status semantics as ``decode_batch``; the C++ pool decodes
    all buffers concurrently (one Python→C call per batch, no per-image
    ctypes overhead, no GIL in the loop).
    """
    lib = _lib()
    if lib is None:
        raise RuntimeError(f"native loader not available at {_LIB_PATH}")
    if not hasattr(lib, "dfd_decode_buffer_batch_rc"):
        raise RuntimeError(
            "native library is stale (no dfd_decode_buffer_batch_rc); rebuild "
            "with `make -C native` or use the PIL path"
        )
    n = len(buffers)
    out = np.zeros((n, target, target, 3), np.uint8)
    status = np.zeros((n,), np.int32)
    # keep the per-buffer ctypes copies alive for the duration of the call
    c_bufs = [
        (ctypes.c_ubyte * len(b)).from_buffer_copy(b) for b in buffers
    ]
    buf_ptrs = (ctypes.POINTER(ctypes.c_ubyte) * n)(
        *[ctypes.cast(b, ctypes.POINTER(ctypes.c_ubyte)) for b in c_bufs]
    )
    lens = (ctypes.c_long * n)(*[len(b) for b in buffers])
    resize = int(resize_target) if resize_target else int(target)
    lib.dfd_decode_buffer_batch_rc(
        buf_ptrs, lens, n, resize, target,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        max(int(n_threads), 1),
    )
    return out, status


def decode_batch(
    paths: list[str | Path],
    target: int,
    *,
    n_threads: int = 4,
    resize_target: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Thread-pool batch decode → (uint8 [N, target, target, 3], status [N]).

    ``resize_target`` sets the shorter-side resize before the DIRECT center
    crop to ``target`` (trainer-val over-resize geometry, data/transforms);
    default is ``target`` itself. Per-image status is 0 on success; failed
    slots are zero-filled. The thread pool lives in C++ (no GIL contention).
    """
    lib = _lib()
    if lib is None:
        raise RuntimeError(f"native loader not available at {_LIB_PATH}")
    resize = int(resize_target) if resize_target else int(target)
    if resize != target and not hasattr(lib, "dfd_decode_batch_rc"):
        raise RuntimeError(
            "native library is stale (no dfd_decode_batch_rc); rebuild with "
            "`make -C native` or use the PIL path"
        )
    n = len(paths)
    out = np.zeros((n, target, target, 3), np.uint8)
    status = np.zeros((n,), np.int32)
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    if hasattr(lib, "dfd_decode_batch_rc"):
        lib.dfd_decode_batch_rc(
            c_paths, n, resize, target,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            max(int(n_threads), 1),
        )
    else:
        lib.dfd_decode_batch(
            c_paths, n, target,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            max(int(n_threads), 1),
        )
    return out, status
