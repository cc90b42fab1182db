"""Out-of-core shard reader: native gather + background prefetch.

Python binding for the C++ ``libwstio`` library (wstio.cpp).  The native
gather releases the GIL (plain ctypes call), so :class:`PrefetchLoader`'s
worker thread genuinely overlaps batch assembly with device steps.
Falls back to numpy memmap gather when the .so has not been built
(``make -C src/whisper_sae_tpu/runtime``).
"""

from __future__ import annotations

import ctypes
import math
import queue
import threading
from pathlib import Path

import numpy as np

_LIB_PATH = Path(__file__).parent / "libwstio.so"
_SRC_PATH = Path(__file__).parent / "wstio.cpp"
_lib = None


def _stale() -> bool:
    """True when wstio.cpp is newer than the built .so (loading the old
    binary would silently ignore source edits)."""
    return (
        _LIB_PATH.exists()
        and _SRC_PATH.exists()
        and _SRC_PATH.stat().st_mtime > _LIB_PATH.stat().st_mtime
    )


def _make(quiet: bool = True) -> None:
    import subprocess

    try:
        subprocess.run(
            ["make", "-C", str(Path(__file__).parent)],
            check=True,
            capture_output=quiet,
        )
    except Exception:
        pass


_build_attempted = False


def _load_lib():
    global _lib, _build_attempted
    if _lib is None:
        # build on first use; rebuild when the source is newer than the
        # binary (the .so is NOT in version control — a committed binary
        # would shadow source edits and be unauditable).  A failed build
        # is attempted once per process, not per call.
        if (not _LIB_PATH.exists() or _stale()) and not _build_attempted:
            _build_attempted = True
            _make()
        if not _LIB_PATH.exists() or _stale():
            return None  # no toolchain / failed rebuild: numpy fallback
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.wstio_open.restype = ctypes.c_void_p
        lib.wstio_open.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
        ]
        lib.wstio_total_rows.restype = ctypes.c_int64
        lib.wstio_total_rows.argtypes = [ctypes.c_void_p]
        lib.wstio_gather.restype = None
        lib.wstio_gather.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_char_p,
        ]
        lib.wstio_close.restype = None
        lib.wstio_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def native_available() -> bool:
    return _load_lib() is not None


def build_native(quiet: bool = True) -> bool:
    """Try to build libwstio.so with make; returns availability.
    (Explicit entry point: retries even after a failed lazy build.)"""
    global _build_attempted
    if native_available():
        return True
    _make(quiet=quiet)
    _build_attempted = True
    return native_available()


def _npy_header_info(path: Path) -> tuple[int, tuple[int, ...], np.dtype]:
    """Parse a .npy file's header: (data offset, shape, dtype).

    A header-only memmap open gives all three via public numpy API
    (no data pages are read)."""
    m = np.load(path, mmap_mode="r")
    if not m.flags["C_CONTIGUOUS"]:
        raise ValueError(f"{path}: fortran-order arrays unsupported")
    return int(m.offset), m.shape, m.dtype


class ShardReader:
    """Row-gather over a set of .npy shards forming one [N, dim] dataset."""

    def __init__(self, shard_paths: list[Path | str], dtype=None):
        """``dtype`` overrides the parsed element type BY VIEW (same
        itemsize): .npy headers cannot persist third-party dtypes, so
        bf16 shards parse as void-2 and the cache metadata supplies the
        real type."""
        self.paths = [Path(p) for p in shard_paths]
        offsets, rows = [], []
        self.dim = None
        self.dtype = None
        for p in self.paths:
            off, shape, parsed = _npy_header_info(p)
            if len(shape) != 2:
                raise ValueError(f"{p}: expected 2-D shard, got {shape}")
            if self.dim is None:
                self.dim, self.dtype = shape[1], parsed
            elif shape[1] != self.dim or parsed != self.dtype:
                raise ValueError(f"{p}: inconsistent shard shape/dtype")
            offsets.append(off)
            rows.append(shape[0])
        if dtype is not None:
            dtype = np.dtype(dtype)
            if dtype.itemsize != self.dtype.itemsize:
                raise ValueError(
                    f"dtype override {dtype} itemsize {dtype.itemsize} != "
                    f"shard itemsize {self.dtype.itemsize}"
                )
            self.dtype = dtype
        self.rows_per_shard = rows
        self.num_rows = int(sum(rows))
        self.row_bytes = self.dim * self.dtype.itemsize

        self._handle = None
        self._mmaps = None
        lib = _load_lib()
        if lib is not None:
            c_paths = (ctypes.c_char_p * len(self.paths))(
                *[str(p).encode() for p in self.paths]
            )
            c_off = (ctypes.c_int64 * len(offsets))(*offsets)
            c_rows = (ctypes.c_int64 * len(rows))(*rows)
            self._handle = lib.wstio_open(
                c_paths, len(self.paths), c_off, c_rows, self.row_bytes
            )
        if self._handle is None:
            # numpy fallback: lazy memmaps (re-viewed when a dtype
            # override applies — bf16 shards parse as void-2)
            self._mmaps = [
                m if m.dtype == self.dtype else m.view(self.dtype)
                for m in (np.load(p, mmap_mode="r") for p in self.paths)
            ]
            self._cum = np.cumsum([0] + rows)

    @property
    def native(self) -> bool:
        return self._handle is not None

    def gather(self, indices: np.ndarray, out: np.ndarray | None = None) -> np.ndarray:
        indices = np.ascontiguousarray(indices, np.int64)
        if out is None:
            out = np.empty((len(indices), self.dim), self.dtype)
        if self._handle is not None:
            _load_lib().wstio_gather(
                self._handle,
                indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(indices),
                out.ctypes.data_as(ctypes.c_char_p),
            )
        else:
            shard_ids = np.searchsorted(self._cum, indices, side="right") - 1
            local = indices - self._cum[shard_ids]
            for s in range(len(self.paths)):
                m = shard_ids == s
                if m.any():
                    out[m] = self._mmaps[s][local[m]]
        return out

    def close(self) -> None:
        if self._handle is not None:
            _load_lib().wstio_close(self._handle)
            self._handle = None
        self._mmaps = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


class PrefetchLoader:
    """Shuffling batch loader over a ShardReader with a prefetch thread.

    Drop-in for ActivationLoader on disk-resident caches: reshuffles every
    epoch, includes the final partial batch, and assembles the next batch
    on a worker thread while the caller trains on the current one.
    """

    def __init__(
        self,
        reader: ShardReader,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        prefetch: int = 2,
    ):
        self.reader = reader
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.prefetch = prefetch
        self._rng = np.random.default_rng(seed)

    @property
    def num_tokens(self) -> int:
        return self.reader.num_rows

    def __len__(self) -> int:
        return math.ceil(self.reader.num_rows / self.batch_size)

    def __iter__(self):
        n = self.reader.num_rows
        order = self._rng.permutation(n) if self.shuffle else np.arange(n)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)

        def worker():
            try:
                for start in range(0, n, self.batch_size):
                    q.put(self.reader.gather(order[start : start + self.batch_size]))
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            batch = q.get()
            if batch is None:
                break
            yield batch
        t.join()
