"""ctypes binding for the native LMDB reader (runtime/native/lmdbread.cc).

Same read surface as :class:`adsorbdiff_tpu.data.lmdbio.LmdbReader` (items /
keys / get / entries) but the B+tree walk, record index and byte copies run
in C++ over the mmap — the python walker spends its time in struct.unpack
per node, which matters at OC20 scale (~10^6 records per shard; the
reference reads these through py-lmdb's C core,
ref: adsorbdiff/datasets/lmdb_dataset.py:30-116).  Values stream in bounded
chunks, so multi-GB shards never materialize at once.  Compiled on first
use like the adbin collator (data/native.py); falls back to None when no
compiler is available — callers keep the pure-python reader as the fallback.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Iterator, Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    if os.environ.get("ADSORBDIFF_TPU_NO_NATIVE"):
        _LIB_FAILED = True
        return None
    here = os.path.dirname(__file__)
    src = os.path.abspath(os.path.join(here, "..", "runtime", "native", "lmdbread.cc"))
    so = os.path.join(os.path.dirname(src), "liblmdbread.so")
    try:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", so + ".tmp"],
                check=True, capture_output=True,
            )
            os.replace(so + ".tmp", so)
        lib = ctypes.CDLL(so)
    except (subprocess.CalledProcessError, OSError) as e:
        logging.warning(f"native lmdbread unavailable ({e}); using pure-python reader")
        _LIB_FAILED = True
        return None
    lib.lmr_open.restype = ctypes.c_void_p
    lib.lmr_open.argtypes = [ctypes.c_char_p]
    lib.lmr_close.argtypes = [ctypes.c_void_p]
    lib.lmr_count.restype = ctypes.c_longlong
    lib.lmr_count.argtypes = [ctypes.c_void_p]
    lib.lmr_psize.restype = ctypes.c_longlong
    lib.lmr_psize.argtypes = [ctypes.c_void_p]
    lib.lmr_sizes.restype = ctypes.c_int
    lib.lmr_sizes.argtypes = [ctypes.c_void_p, ctypes.c_longlong, ctypes.c_longlong,
                              ctypes.c_void_p, ctypes.c_void_p]
    lib.lmr_read.restype = ctypes.c_int
    lib.lmr_read.argtypes = [ctypes.c_void_p, ctypes.c_longlong, ctypes.c_longlong,
                             ctypes.c_void_p, ctypes.c_void_p]
    lib.lmr_read_keys.restype = ctypes.c_int
    lib.lmr_read_keys.argtypes = [ctypes.c_void_p, ctypes.c_longlong,
                                  ctypes.c_longlong, ctypes.c_void_p]
    lib.lmr_get.restype = ctypes.c_longlong
    lib.lmr_get.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_longlong,
                            ctypes.c_void_p, ctypes.c_longlong]
    _LIB = lib
    return lib


class NativeLmdbReader:
    """Read-only native LMDB environment; raises OSError if the native
    library is unavailable or the file fails to parse."""

    def __init__(self, path: str, chunk_records: int = 512) -> None:
        lib = _load_lib()
        if lib is None:
            raise OSError("native lmdbread library unavailable")
        self._lib = lib
        self._h = lib.lmr_open(os.fspath(path).encode())
        if not self._h:
            raise OSError(f"native lmdbread failed to open '{path}'")
        self.entries = int(lib.lmr_count(self._h))
        self.psize = int(lib.lmr_psize(self._h))
        self._chunk = max(1, int(chunk_records))

    def _read_chunk(self, start: int, count: int) -> Iterator[Tuple[bytes, bytes]]:
        ks = np.zeros(count, np.int64)
        vs = np.zeros(count, np.int64)
        p = lambda a: a.ctypes.data_as(ctypes.c_void_p)  # noqa: E731
        if self._lib.lmr_sizes(self._h, start, count, p(ks), p(vs)) != 0:
            raise OSError("lmr_sizes failed")
        kbuf = np.zeros(int(ks.sum()), np.uint8)
        vbuf = np.zeros(int(vs.sum()), np.uint8)
        if self._lib.lmr_read(self._h, start, count, p(kbuf), p(vbuf)) != 0:
            raise OSError("lmr_read failed")
        ko = vo = 0
        kb, vb = kbuf.tobytes(), vbuf.tobytes()
        for i in range(count):
            yield kb[ko : ko + int(ks[i])], vb[vo : vo + int(vs[i])]
            ko += int(ks[i])
            vo += int(vs[i])

    def items(self) -> Iterator[Tuple[bytes, bytes]]:
        for start in range(0, self.entries, self._chunk):
            yield from self._read_chunk(start, min(self._chunk, self.entries - start))

    def keys(self) -> Iterator[bytes]:
        p = lambda a: a.ctypes.data_as(ctypes.c_void_p)  # noqa: E731
        for start in range(0, self.entries, self._chunk):
            count = min(self._chunk, self.entries - start)
            ks = np.zeros(count, np.int64)
            vs = np.zeros(count, np.int64)
            if self._lib.lmr_sizes(self._h, start, count, p(ks), p(vs)) != 0:
                raise OSError("lmr_sizes failed")
            kbuf = np.zeros(int(ks.sum()), np.uint8)
            if self._lib.lmr_read_keys(self._h, start, count, p(kbuf)) != 0:
                raise OSError("lmr_read_keys failed")
            kb = kbuf.tobytes()
            off = 0
            for i in range(count):
                yield kb[off : off + int(ks[i])]
                off += int(ks[i])

    def get(self, key: bytes) -> Optional[bytes]:
        cap = 1 << 20
        while True:
            out = np.zeros(cap, np.uint8)
            n = self._lib.lmr_get(self._h, key, len(key),
                                  out.ctypes.data_as(ctypes.c_void_p), cap)
            if n == -3:
                cap *= 8
                continue
            if n < 0:
                return None
            return out[:n].tobytes()

    def close(self) -> None:
        if self._h:
            self._lib.lmr_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def open_best_reader(path: str):
    """Native reader when buildable, else the pure-python LmdbReader."""
    try:
        return NativeLmdbReader(path)
    except OSError:
        from adsorbdiff_tpu.data.lmdbio import LmdbReader

        return LmdbReader(path)
