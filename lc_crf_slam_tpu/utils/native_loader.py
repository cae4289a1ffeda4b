"""ctypes bindings for the native prefetching TUM loader.

Wraps runtime/libtumloader.so (built by runtime/build.sh): a C++ thread
pool decodes RGB/depth PNG pairs ahead of the pipeline into a bounded
in-order queue. Falls back to the Python (OpenCV) TUMSequence when the
library isn't built — same iteration contract either way.
"""

from __future__ import annotations

import ctypes
import os
from typing import Iterator, Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "runtime", "libtumloader.so",
)


def _load_lib() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.tum_loader_create.restype = ctypes.c_void_p
    lib.tum_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.c_float, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.tum_loader_next.restype = ctypes.c_int
    lib.tum_loader_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.tum_loader_destroy.argtypes = [ctypes.c_void_p]
    return lib


def build_native_runtime() -> bool:
    """Compile runtime/libtumloader.so if missing. Returns availability."""
    if os.path.exists(_LIB_PATH):
        return True
    import subprocess

    script = os.path.join(os.path.dirname(_LIB_PATH), "build.sh")
    try:
        subprocess.run(["sh", script], check=True, capture_output=True)
    except Exception:
        return False
    return os.path.exists(_LIB_PATH)


class NativeTUMLoader:
    """Iterates (timestamp, gray float32 [H,W], depth float32 [H,W]) with
    C++ decode threads prefetching ahead of the consumer."""

    def __init__(self, entries, width: int, height: int,
                 depth_map_factor: float = 5000.0,
                 n_threads: int = 4, queue_cap: int = 8):
        """entries: list of (t_rgb, rgb_path, t_depth, depth_path)."""
        self._lib = _load_lib()
        if self._lib is None:
            raise RuntimeError(
                "native loader not built; run runtime/build.sh or use "
                "utils.io_tum.TUMSequence"
            )
        self.width, self.height = width, height
        self.n = len(entries)
        rgb = (ctypes.c_char_p * self.n)(
            *[e[1].encode() for e in entries])
        dep = (ctypes.c_char_p * self.n)(
            *[e[3].encode() for e in entries])
        ts = (ctypes.c_double * self.n)(*[e[0] for e in entries])
        self._keepalive = (rgb, dep, ts)
        # expected dims are enforced natively: a decoded frame whose size
        # differs from the configured camera is delivered as failed (rc 0)
        # rather than memcpy'd past the fixed numpy buffers below
        self._h = self._lib.tum_loader_create(
            rgb, dep, ts, self.n, depth_map_factor, n_threads, queue_cap,
            width, height,
        )
        self._closed = False

    def __len__(self) -> int:
        return self.n

    def __iter__(self) -> Iterator[Tuple[float, np.ndarray, np.ndarray]]:
        gray = np.empty((self.height, self.width), np.float32)
        depth = np.empty((self.height, self.width), np.float32)
        t = ctypes.c_double()
        w = ctypes.c_int()
        h = ctypes.c_int()
        while True:
            r = self._lib.tum_loader_next(
                self._h,
                gray.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                ctypes.byref(t), ctypes.byref(w), ctypes.byref(h),
            )
            if r < 0:
                return
            if r == 0:
                continue   # decode failure: skip frame, keep order
            yield t.value, gray.copy(), depth.copy()

    def close(self) -> None:
        if not self._closed and getattr(self, "_h", None):
            self._lib.tum_loader_destroy(self._h)
            self._closed = True

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
