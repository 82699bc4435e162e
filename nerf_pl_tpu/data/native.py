"""ctypes bindings for the native C++ ray store (``native/raystore.cpp``)
— the host data engine behind the trainers' streaming mode (the reference's
DataLoader worker pool, ``train.py:89-94``, re-done as one native library).

The library is built on first use (``make -C native``) and cached; if no
C++ toolchain is available a pure-numpy fallback with identical semantics
(same epoch permutations NOT guaranteed — numpy RNG differs) keeps
everything working.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libraystore.so")
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.raystore_create.restype = ctypes.c_void_p
    lib.raystore_create.argtypes = [
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_uint64,
    ]
    lib.raystore_destroy.argtypes = [ctypes.c_void_p]
    lib.raystore_rows.restype = ctypes.c_int64
    lib.raystore_rows.argtypes = [ctypes.c_void_p]
    lib.raystore_row_width.restype = ctypes.c_int64
    lib.raystore_row_width.argtypes = [ctypes.c_void_p]
    lib.raystore_fill_batch.restype = ctypes.c_int64
    lib.raystore_fill_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.raystore_fill_sequential.restype = ctypes.c_int64
    lib.raystore_fill_sequential.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.raystore_epoch_perm.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_uint32)
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


class RayStore:
    """Interleaved row store with background-prefetched epoch shuffles.

    ``columns``: list of (N, Ci) float32 arrays (e.g. rays, rgbs, pixels).
    ``fill_batch(epoch, step, batch)`` returns a (batch, sum(Ci)) array of
    shuffled rows; ``split`` slices it back into the original columns.
    """

    def __init__(self, columns: Sequence[np.ndarray], seed: int = 0,
                 threads: int = 4, force_fallback: bool = False):
        self.widths = [int(c.shape[1]) for c in columns]
        self.n_rows = int(columns[0].shape[0])
        self.row_width = sum(self.widths)
        self.threads = threads
        self._handle = None
        lib = None if force_fallback else _load_lib()
        cols = [np.ascontiguousarray(c, dtype=np.float32) for c in columns]
        if lib is not None:
            ptrs = (ctypes.c_void_p * len(cols))(
                *[c.ctypes.data_as(ctypes.c_void_p).value for c in cols]
            )
            widths = (ctypes.c_int64 * len(cols))(*self.widths)
            self._handle = lib.raystore_create(
                ptrs, widths, len(cols), self.n_rows, seed
            )
            self._lib = lib
        else:
            self._data = np.concatenate(cols, axis=1)
            self._seed = seed
            self._perm_epoch = -1
            self._perm = None

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.raystore_destroy(self._handle)
            self._handle = None

    @property
    def native(self) -> bool:
        return self._handle is not None

    def _fallback_perm(self, epoch: int):
        if self._perm_epoch != epoch:
            rng = np.random.RandomState((self._seed * 7919 + epoch) % 2**31)
            self._perm = rng.permutation(self.n_rows)
            self._perm_epoch = epoch
        return self._perm

    def fill_batch(self, epoch: int, step: int, batch: int) -> np.ndarray:
        out = np.empty((batch, self.row_width), np.float32)
        if self._handle:
            n = self._lib.raystore_fill_batch(
                self._handle, epoch, step, batch,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self.threads,
            )
        else:
            perm = self._fallback_perm(epoch)
            lo = step * batch
            idx = perm[lo : lo + batch]
            n = len(idx)
            out[:n] = self._data[idx]
        return out[:n]

    def fill_sequential(self, start: int, batch: int) -> np.ndarray:
        out = np.empty((batch, self.row_width), np.float32)
        if self._handle:
            n = self._lib.raystore_fill_sequential(
                self._handle, start, batch,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self.threads,
            )
        else:
            # clamp like the native path: start past the end returns empty
            n = max(0, min(batch, self.n_rows - start))
            out[:n] = self._data[start : start + n]
        return out[:n]

    def epoch_perm(self, epoch: int) -> np.ndarray:
        if self._handle:
            out = np.empty(self.n_rows, np.uint32)
            self._lib.raystore_epoch_perm(
                self._handle, epoch,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            )
            return out
        return self._fallback_perm(epoch).astype(np.uint32)

    def split(self, rows: np.ndarray) -> List[np.ndarray]:
        out, off = [], 0
        for w in self.widths:
            out.append(rows[:, off : off + w])
            off += w
        return out
