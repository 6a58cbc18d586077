"""Host-side page pool: native C++ via ctypes with a Python fallback.

See csrc/pagepool.cpp. Manages physical page allocation for many
sequences sharing one device pool (continuous batching); each engine
step calls ``fill_batch_tables`` once to produce the int32 page-table /
seq-len arrays the Pallas kernels consume via scalar prefetch.

Reference counterparts: `KvPool.alloc_block/free_block`
(`/root/reference/quest/utils/kv_cache.py:55-62`) and the per-token
Python index building (`controller.py:80-129`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Sequence

import numpy as np

_LIB = None
_LIB_TRIED = False


def _csrc_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "csrc")


def _load_native():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so = os.path.join(_csrc_dir(), "libquestpool.so")
    if not os.path.exists(so):
        try:  # build on demand (g++ is baked into the image)
            subprocess.run(["make", "-C", _csrc_dir(), "-s"], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(so):
        return None
    lib = ctypes.CDLL(so)
    lib.qp_create.restype = ctypes.c_int64
    lib.qp_create.argtypes = [ctypes.c_int64] * 3
    lib.qp_destroy.argtypes = [ctypes.c_int64]
    lib.qp_free_pages.restype = ctypes.c_int64
    lib.qp_free_pages.argtypes = [ctypes.c_int64]
    lib.qp_seq_create.restype = ctypes.c_int32
    lib.qp_seq_create.argtypes = [ctypes.c_int64]
    lib.qp_seq_release.restype = ctypes.c_int32
    lib.qp_seq_release.argtypes = [ctypes.c_int64, ctypes.c_int32]
    lib.qp_seq_extend.restype = ctypes.c_int64
    lib.qp_seq_extend.argtypes = [ctypes.c_int64, ctypes.c_int32,
                                  ctypes.c_int64]
    lib.qp_seq_len.restype = ctypes.c_int64
    lib.qp_seq_len.argtypes = [ctypes.c_int64, ctypes.c_int32]
    lib.qp_seq_num_pages.restype = ctypes.c_int64
    lib.qp_seq_num_pages.argtypes = [ctypes.c_int64, ctypes.c_int32]
    lib.qp_fill_batch_tables.restype = ctypes.c_int32
    lib.qp_fill_batch_tables.argtypes = [
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32)]
    for fn in ("qp_pages_retain", "qp_pages_release"):
        f = getattr(lib, fn, None)
        if f is None:        # stale .so without the refcount API
            return None
        f.restype = ctypes.c_int32
        f.argtypes = [ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
                      ctypes.c_int64]
    _LIB = lib
    return _LIB


class PagePool:
    """Shared physical page pool for many sequences."""

    def __init__(self, total_pages: int, page_size: int, max_seqs: int,
                 native: bool | None = None):
        self.total_pages = total_pages
        self.page_size = page_size
        self.max_seqs = max_seqs
        lib = _load_native() if native in (None, True) else None
        if native is True and lib is None:
            raise RuntimeError("native page pool requested but "
                               "libquestpool.so unavailable")
        self._lib = lib
        if lib is not None:
            self._h = lib.qp_create(total_pages, page_size, max_seqs)
            assert self._h > 0
        else:  # pure-Python fallback (same semantics)
            self._free = list(range(total_pages - 1, -1, -1))
            self._seqs = {}
            self._next_ids = list(range(max_seqs - 1, -1, -1))
            self._refs = np.zeros((total_pages,), np.int64)

    @property
    def is_native(self) -> bool:
        return self._lib is not None

    def __del__(self):
        if getattr(self, "_lib", None) is not None:
            try:
                self._lib.qp_destroy(self._h)
            except Exception:
                pass

    # -- API ---------------------------------------------------------
    def free_pages(self) -> int:
        if self._lib:
            return self._lib.qp_free_pages(self._h)
        return len(self._free)

    def seq_create(self) -> int:
        if self._lib:
            sid = self._lib.qp_seq_create(self._h)
        else:
            if not self._next_ids:
                sid = -1
            else:
                sid = self._next_ids.pop()
                self._seqs[sid] = {"pages": [], "len": 0}
        if sid < 0:
            raise RuntimeError("sequence capacity exhausted")
        return sid

    def seq_release(self, seq_id: int) -> None:
        if self._lib:
            rc = self._lib.qp_seq_release(self._h, seq_id)
            assert rc == 0, seq_id
        else:
            s = self._seqs.pop(seq_id)
            for pg in s["pages"]:
                self._refs[pg] -= 1
                if self._refs[pg] == 0:
                    self._free.append(pg)
            self._next_ids.append(seq_id)

    def pages_retain(self, pages: Sequence[int]) -> None:
        """Take a refcount hold on owned pages — a shared-prefix hold
        that survives the owning sequence's release (prefix caching)."""
        if self._lib:
            arr = np.asarray(pages, np.int32)
            rc = self._lib.qp_pages_retain(
                self._h, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(arr))
            if rc != 0:
                raise ValueError("retain of unowned page")
        else:
            if any(self._refs[pg] <= 0 for pg in pages):
                raise ValueError("retain of unowned page")
            for pg in pages:
                self._refs[pg] += 1

    def pages_release(self, pages: Sequence[int]) -> None:
        """Drop a pages_retain hold; pages reaching zero become free."""
        if self._lib:
            arr = np.asarray(pages, np.int32)
            rc = self._lib.qp_pages_release(
                self._h, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(arr))
            if rc != 0:
                raise ValueError("release of unowned page")
        else:
            if any(self._refs[pg] <= 0 for pg in pages):
                raise ValueError("release of unowned page")
            for pg in pages:
                self._refs[pg] -= 1
                if self._refs[pg] == 0:
                    self._free.append(pg)

    def seq_extend(self, seq_id: int, n_tokens: int) -> int:
        """Returns number of new pages; raises on pool exhaustion."""
        if self._lib:
            got = self._lib.qp_seq_extend(self._h, seq_id, n_tokens)
            if got < 0:
                raise MemoryError("page pool exhausted")
            return got
        s = self._seqs[seq_id]
        new_len = s["len"] + n_tokens
        need = -(-new_len // self.page_size) - len(s["pages"])
        if need > len(self._free):
            raise MemoryError("page pool exhausted")
        for _ in range(need):
            pg = self._free.pop()
            self._refs[pg] = 1
            s["pages"].append(pg)
        s["len"] = new_len
        return need

    def seq_len(self, seq_id: int) -> int:
        if self._lib:
            return self._lib.qp_seq_len(self._h, seq_id)
        return self._seqs[seq_id]["len"]

    def seq_pages(self, seq_id: int) -> List[int]:
        n = (self.seq_len(seq_id) + self.page_size - 1) // self.page_size
        tables, _ = self.fill_batch_tables([seq_id], max(n, 1))
        return tables[0, :n].tolist()

    def fill_batch_tables(self, seq_ids: Sequence[int], table_width: int,
                          pad_page: int = 0):
        """(tables [n, table_width] int32, lens [n] int32) for a step."""
        n = len(seq_ids)
        tables = np.empty((n, table_width), np.int32)
        lens = np.empty((n,), np.int32)
        if self._lib:
            ids = np.asarray(seq_ids, np.int32)
            rc = self._lib.qp_fill_batch_tables(
                self._h, ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                n, table_width, pad_page,
                tables.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
            if rc != 0:
                raise ValueError("invalid sequence id or table overflow")
            return tables, lens
        for i, sid in enumerate(seq_ids):
            s = self._seqs[sid]
            pg = s["pages"]
            if len(pg) > table_width:
                raise ValueError("table overflow")
            tables[i, :len(pg)] = pg
            tables[i, len(pg):] = pad_page
            lens[i] = s["len"]
        return tables, lens
