"""ctypes bindings for the native host runtime (native/libnsl_native.so).

The reference's graph substrate and sampler are C++/OpenMP; ours live in
native/nsl_native.cpp with these bindings. Every function has a numpy
fallback at its call site, so the framework works without the .so (e.g.
fresh checkout before `make -C native`).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False

_I32P = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_I64P = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_F32P = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "native", "libnsl_native.so")
    if not os.path.exists(so):
        return None
    try:
        lib = ctypes.CDLL(so)
        lib.nsl_degree.argtypes = [_I32P, ctypes.c_int64, ctypes.c_int32,
                                   _I32P]
        lib.nsl_sort_edges.argtypes = [_I32P, ctypes.c_int64, ctypes.c_int32,
                                       _I64P, _I64P]
        lib.nsl_sample_hop.argtypes = [_I64P, _I32P, _I32P, ctypes.c_int32,
                                       ctypes.c_int32, ctypes.c_uint64,
                                       ctypes.c_void_p, _I32P]
        lib.nsl_dedup_relabel.argtypes = [_I32P, ctypes.c_int64,
                                          ctypes.c_int32, _I32P, _I32P, _I32P]
        lib.nsl_dedup_relabel.restype = ctypes.c_int64
        lib.nsl_fennel.argtypes = [_I64P, _I32P, _I64P, _I32P,
                                   ctypes.c_int32, ctypes.c_int64,
                                   ctypes.c_int32, ctypes.c_double,
                                   ctypes.c_double, ctypes.c_int32,
                                   _I32P, _I32P]
        lib.nsl_pack_slab.argtypes = [_I32P, _I32P, _F32P, ctypes.c_int64,
                                      ctypes.c_int32, ctypes.c_int32,
                                      ctypes.c_int64, _I32P, _F32P, _I32P,
                                      _F32P, _I32P, _I64P]
        _LIB = lib
    except (OSError, AttributeError):  # missing .so or stale build
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def degree(ids: np.ndarray, num_vertices: int) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    ids = np.ascontiguousarray(ids, np.int32)
    out = np.zeros(num_vertices, np.int32)
    lib.nsl_degree(ids, ids.size, num_vertices, out)
    return out


def sort_edges(key: np.ndarray, num_vertices: int):
    """Stable bucket sort by key → (offsets[v+1] int64, perm[e] int64)."""
    lib = _load()
    if lib is None:
        return None
    key = np.ascontiguousarray(key, np.int32)
    offsets = np.zeros(num_vertices + 1, np.int64)
    perm = np.zeros(key.size, np.int64)
    lib.nsl_sort_edges(key, key.size, num_vertices, offsets, perm)
    return offsets, perm


def sample_hop(offsets: np.ndarray, nbr: np.ndarray, seeds: np.ndarray,
               fanout: int, seed: int) -> np.ndarray | None:
    """Uniform-without-replacement hop sample → [cap, fanout] global ids
    (-1 padded)."""
    lib = _load()
    if lib is None:
        return None
    offsets = np.ascontiguousarray(offsets, np.int64)
    nbr = np.ascontiguousarray(nbr, np.int32)
    seeds = np.ascontiguousarray(seeds, np.int32)
    out = np.zeros((seeds.size, fanout), np.int32)
    lib.nsl_sample_hop(offsets, nbr, seeds, seeds.size, fanout,
                       np.uint64(seed), None, out)
    return out


class DedupWorkspace:
    """Reusable [V] scratch for nsl_dedup_relabel."""

    def __init__(self, num_vertices: int):
        self.num_vertices = num_vertices
        self.scratch = np.zeros(num_vertices, np.int32)

    def __call__(self, flat: np.ndarray):
        lib = _load()
        if lib is None:
            return None
        flat = np.ascontiguousarray(flat, np.int32)
        table = np.zeros(flat.size, np.int32)
        local = np.zeros(flat.size, np.int32)
        n = lib.nsl_dedup_relabel(flat, flat.size, self.num_vertices, table,
                                  local, self.scratch)
        return table[:n].copy(), local


def pack_slab(key: np.ndarray, other: np.ndarray, w: np.ndarray,
              num_rows: int, k: int, v_pad: int, idx: np.ndarray,
              wgt: np.ndarray, tail_idx: np.ndarray, tail_w: np.ndarray,
              tail_rows: np.ndarray, pos: np.ndarray) -> bool:
    """Single-pass ELL slab pack into caller-allocated arrays (idx/wgt and
    tails pre-zeroed, tail_rows pre-filled with num_rows); ``pos[j]`` gets
    input edge j's flat slab position. Returns False without the .so.
    The ctypes call releases the GIL — thread-pool friendly."""
    lib = _load()
    if lib is None:
        return False
    lib.nsl_pack_slab(np.ascontiguousarray(key, np.int32),
                      np.ascontiguousarray(other, np.int32),
                      np.ascontiguousarray(w, np.float32),
                      key.size, num_rows, k, v_pad, idx, wgt,
                      tail_idx, tail_w, tail_rows, pos)
    return True


def fennel(in_offsets: np.ndarray, in_nbr: np.ndarray,
           out_offsets: np.ndarray, out_nbr: np.ndarray,
           num_vertices: int, num_partitions: int, gamma: float,
           slack: float, passes: int, order: np.ndarray
           ) -> np.ndarray | None:
    """Streaming Fennel partition → owner[v] int32 (None without the .so)."""
    lib = _load()
    if lib is None:
        return None
    in_offsets = np.ascontiguousarray(in_offsets, np.int64)
    in_nbr = np.ascontiguousarray(in_nbr, np.int32)
    out_offsets = np.ascontiguousarray(out_offsets, np.int64)
    out_nbr = np.ascontiguousarray(out_nbr, np.int32)
    order = np.ascontiguousarray(order, np.int32)
    owner = np.zeros(num_vertices, np.int32)
    lib.nsl_fennel(in_offsets, in_nbr, out_offsets, out_nbr,
                   num_vertices, in_nbr.size, num_partitions,
                   float(gamma), float(slack), int(passes), order, owner)
    return owner
