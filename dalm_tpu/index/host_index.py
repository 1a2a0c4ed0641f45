"""Host-RAM exact index backed by the C++ scan (ctypes binding).

The spill tier of the retrieval engine: corpora beyond the mesh's HBM
budget keep their overflow rows in host memory (optionally memory-mapped
from disk) and are scanned by ``dalm_tpu/native/host_topk.cpp`` —
OpenMP-parallel blocked exact MIPS with per-query heaps. Results merge
with the on-device shards' winners (both tiers are exact, so a plain
top-k over the union is the global answer).

The shared library builds on demand (``make -C dalm_tpu/native``); if no
compiler is available a numpy fallback keeps behavior identical (slower).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdalm_host.so")
_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True, capture_output=True, timeout=120
            )
        except Exception as e:
            logger.warning("native host index build failed (%s); numpy fallback", e)
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.dalm_host_topk.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.dalm_host_topk.restype = None
        _lib = lib
    except Exception as e:  # pragma: no cover
        logger.warning("failed to load native host index (%s); numpy fallback", e)
    return _lib


class HostDenseIndex:
    """Exact MIPS over a host-resident (N, D) float32 matrix."""

    def __init__(self, embeddings: np.ndarray, use_native: bool = True):
        if isinstance(embeddings, np.memmap) and embeddings.dtype == np.float32:
            self.embeddings = embeddings  # keep OS-paged; no RAM copy
        else:
            self.embeddings = np.ascontiguousarray(embeddings, np.float32)
        self.use_native = use_native and _load_lib() is not None

    @classmethod
    def from_memmap(cls, path: str, num_rows: int, dim: int, use_native: bool = True) -> "HostDenseIndex":
        """Memory-mapped variant for beyond-RAM corpora on fast disk."""
        mm = np.memmap(path, dtype=np.float32, mode="r", shape=(num_rows, dim))
        return cls(mm, use_native=use_native)

    def search(self, queries: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        queries = np.ascontiguousarray(queries, np.float32)
        nq = queries.shape[0]
        n = self.embeddings.shape[0]
        k = min(k, n)
        if self.use_native:
            # memmap buffers pass as raw pointers too (OS pages them in)
            return self._native_search(queries, k)
        scores = queries @ self.embeddings.T
        ids = np.argsort(-scores, axis=1, kind="stable")[:, :k]
        return np.take_along_axis(scores, ids, axis=1), ids.astype(np.int32)

    def _native_search(self, queries: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        lib = _load_lib()
        nq = queries.shape[0]
        n, d = self.embeddings.shape
        out_scores = np.empty((nq, k), np.float32)
        out_ids = np.empty((nq, k), np.int32)
        # raw-pointer passing works for ndarray and memmap alike
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.dalm_host_topk(
            self.embeddings.ctypes.data_as(f32p),
            ctypes.c_int64(n), ctypes.c_int64(d),
            queries.ctypes.data_as(f32p),
            ctypes.c_int64(nq), ctypes.c_int64(k),
            out_scores.ctypes.data_as(f32p),
            out_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return out_scores, out_ids


class TieredIndex:
    """HBM tier (ShardedDenseIndex) + host tier (HostDenseIndex).

    Rows [0, hbm_rows) live on the mesh; rows [hbm_rows, N) on host.
    Both tiers are exact, so the global top-k is the top-k of the union.
    """

    def __init__(self, device_index, host_index: Optional[HostDenseIndex], hbm_rows: int):
        self.device_index = device_index
        self.host_index = host_index
        self.hbm_rows = hbm_rows

    @classmethod
    def build(cls, mesh, embeddings: np.ndarray, hbm_budget_rows: Optional[int] = None, **kw):
        from dalm_tpu.index.dense import ShardedDenseIndex

        n = len(embeddings)
        hbm_rows = n if hbm_budget_rows is None else min(hbm_budget_rows, n)
        device_index = ShardedDenseIndex.build(mesh, embeddings[:hbm_rows], **kw)
        host_index = HostDenseIndex(embeddings[hbm_rows:]) if hbm_rows < n else None
        return cls(device_index, host_index, hbm_rows)

    def search(self, queries: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        d_scores, d_ids = self.device_index.search(queries, k)
        if self.host_index is None:
            return d_scores, d_ids
        h_scores, h_ids = self.host_index.search(queries, k)
        h_ids = h_ids + self.hbm_rows
        scores = np.concatenate([d_scores, h_scores], axis=1)
        ids = np.concatenate([d_ids, h_ids], axis=1)
        # exact union top-k; ties break to smaller id via stable ordering
        order = np.argsort(-scores, axis=1, kind="stable")[:, :k]
        return np.take_along_axis(scores, order, axis=1), np.take_along_axis(ids, order, axis=1)
