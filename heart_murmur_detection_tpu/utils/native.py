"""ctypes bindings for the C++ host audio runtime (native/hmdt_native.cpp)
with a threaded prefetch loader. Falls back to the pure-python path when the
shared library hasn't been built (native/build.sh)."""

from __future__ import annotations

import ctypes
import os
import queue
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_LIB = None


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for cand in (
        os.path.join(here, "native", "libhmdt_native.so"),
        os.environ.get("HMDT_NATIVE_LIB", ""),
    ):
        if cand and os.path.exists(cand):
            return cand
    return None


def load_native():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = _find_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.hmdt_decode_wav.restype = ctypes.c_long
    lib.hmdt_decode_wav.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.hmdt_free.argtypes = [ctypes.c_void_p]
    lib.hmdt_trim_bounds.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
        ctypes.c_long,
        ctypes.c_long,
        ctypes.c_double,
        ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long),
    ]
    lib.hmdt_load_clip.restype = ctypes.c_long
    lib.hmdt_load_clip.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
        ctypes.c_long,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_long,
        ctypes.c_long,
    ]
    _LIB = lib
    return lib


def native_available() -> bool:
    return load_native() is not None


def decode_wav(path: str) -> Tuple[np.ndarray, int]:
    lib = load_native()
    if lib is None:
        raise RuntimeError("native lib not built; run native/build.sh")
    ptr = ctypes.POINTER(ctypes.c_float)()
    sr = ctypes.c_int()
    n = lib.hmdt_decode_wav(path.encode(), ctypes.byref(ptr), ctypes.byref(sr))
    if n < 0:
        raise IOError(f"native decode failed: {path}")
    out = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    lib.hmdt_free(ptr)
    return out, sr.value


def trim_bounds(y: np.ndarray, frame: int, hop: int, top_db: float = 60.0):
    lib = load_native()
    y = np.ascontiguousarray(y, np.float32)
    s = ctypes.c_long()
    e = ctypes.c_long()
    lib.hmdt_trim_bounds(
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(y),
        frame,
        hop,
        top_db,
        ctypes.byref(s),
        ctypes.byref(e),
    )
    return s.value, e.value


def load_clip(
    path: str,
    max_len: int,
    min_len: int,
    pad_zero: bool = True,
    sr: int = 16000,
) -> Tuple[np.ndarray, int]:
    """decode+trim+pad into a fresh buffer (mirrors get_entire_signal)."""
    lib = load_native()
    buf = np.zeros(max(max_len, min_len), np.float32)
    n = lib.hmdt_load_clip(
        path.encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_len,
        min_len,
        1 if pad_zero else 0,
        sr,
        sr // 10,
        sr // 20,
    )
    if n == -2:
        raise ValueError("sample-rate mismatch; use the python path to resample")
    if n < 0:
        raise IOError(f"native load failed: {path}")
    return buf, int(n)


class PrefetchLoader:
    """Threaded clip prefetcher: decodes batch k+1 on host threads while the
    device computes batch k (the reference has no such overlap — its loop is
    strictly serial, model_util.py:138-176)."""

    def __init__(
        self,
        paths: Sequence[str],
        batch_size: int,
        max_len: int,
        min_len: int,
        pad_zero: bool = True,
        sr: int = 16000,
        num_threads: int = 2,
        depth: int = 2,
        loader=None,
    ):
        self.paths = list(paths)
        self.bs = batch_size
        self.max_len = max_len
        self.min_len = min_len
        self.pad_zero = pad_zero
        self.sr = sr
        self._load = loader or (lambda p: load_clip(p, max_len, min_len, pad_zero, sr))
        self.q: "queue.Queue" = queue.Queue(maxsize=depth)
        self.t = threading.Thread(target=self._work, args=(num_threads,), daemon=True)
        self.t.start()

    def _work(self, num_threads: int):
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(num_threads) as pool:
            for lo in range(0, len(self.paths), self.bs):
                batch_paths = self.paths[lo : lo + self.bs]
                results = list(pool.map(self._load, batch_paths))
                wav = np.zeros((self.bs, self.max_len), np.float32)
                lengths = np.zeros(self.bs, np.int32)
                for i, (buf, n) in enumerate(results):
                    m = min(n, self.max_len)
                    wav[i, :m] = buf[:m]
                    lengths[i] = m
                self.q.put((lo, len(batch_paths), wav, lengths))
        self.q.put(None)

    def __iter__(self):
        while True:
            item = self.q.get()
            if item is None:
                return
            yield item
