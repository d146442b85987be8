"""ctypes bindings for the native C++ data-loading runtime.

``NativeDataLoader`` matches the Python ``data.DataLoader`` iterator
contract (yields float32 NCHW (x, y) numpy batch pairs) but decodes and
augments on a C++ thread pool with a bounded prefetch queue
(runtime/dataloader.cc), keeping the host ahead of the device. Falls back
cleanly: ``is_available()`` is False when the shared library is absent and
``ensure_built()`` can compile it with make (libpng/libjpeg required).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

_RUNTIME_DIR = Path(__file__).resolve().parent
_LIB_PATH = _RUNTIME_DIR / "libtadruntime.so"
_lib = None


def ensure_built(force: bool = False) -> bool:
    """Build the shared library if needed. Returns availability."""
    if _LIB_PATH.exists() and not force:
        return True
    try:
        subprocess.run(
            ["make", "-C", str(_RUNTIME_DIR)] + (["-B"] if force else []),
            check=True,
            capture_output=True,
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    return _LIB_PATH.exists()


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        raise RuntimeError(
            "native runtime not built; run ensure_built() or "
            f"`make -C {_RUNTIME_DIR}`"
        )
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.tad_loader_create.restype = ctypes.c_void_p
    lib.tad_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_uint64,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.tad_loader_next.restype = ctypes.c_int
    lib.tad_loader_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
    lib.tad_loader_batches_per_epoch.restype = ctypes.c_int
    lib.tad_loader_batches_per_epoch.argtypes = [ctypes.c_void_p]
    lib.tad_loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def is_available() -> bool:
    return _LIB_PATH.exists()


class NativeDataLoader:
    """Drop-in for data.DataLoader backed by the C++ worker pool."""

    def __init__(
        self,
        x_paths: Sequence[str],
        y_paths: Sequence[str],
        batch_size: int,
        crop: Tuple[int, int],
        awgn_std_range: Tuple[int, int] = (0, 0),
        shuffle: bool = True,
        seed: int = 0,
        n_threads: int = 4,
        prefetch: int = 4,
    ):
        assert len(x_paths) == len(y_paths) and len(x_paths) > 0
        lib = _load()
        self._lib = lib
        self.batch_size = batch_size
        self.crop = crop
        n = len(x_paths)
        xs = (ctypes.c_char_p * n)(*[str(p).encode() for p in x_paths])
        ys = (ctypes.c_char_p * n)(*[str(p).encode() for p in y_paths])
        self._handle = lib.tad_loader_create(
            xs,
            ys,
            n,
            batch_size,
            crop[0],
            crop[1],
            awgn_std_range[0],
            awgn_std_range[1],
            1 if shuffle else 0,
            seed,
            n_threads,
            prefetch,
        )
        if not self._handle:
            raise RuntimeError("tad_loader_create failed")
        self._batches = lib.tad_loader_batches_per_epoch(self._handle)

    @classmethod
    def from_dirs(cls, x_dir, y_dir, batch_size, crop, **kw) -> "NativeDataLoader":
        xs = sorted(str(p) for p in Path(x_dir).glob("*"))
        ys = sorted(str(p) for p in Path(y_dir).glob("*"))
        return cls(xs, ys, batch_size, crop, **kw)

    def __len__(self) -> int:
        return self._batches

    def next_batch(self) -> Tuple[np.ndarray, np.ndarray]:
        shape = (self.batch_size, 3, self.crop[0], self.crop[1])
        x = np.empty(shape, np.float32)
        y = np.empty(shape, np.float32)
        rc = self._lib.tad_loader_next(
            self._handle,
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise StopIteration
        return x, y

    def __iter__(self):
        for _ in range(self._batches):
            yield self.next_batch()

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.tad_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
