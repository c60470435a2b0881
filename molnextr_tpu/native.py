"""ctypes bindings for the native C++ host kernels.

The framework's counterpart of the reference's Indigo ctypes facade
(`/root/reference/MolNexTR/indigo/__init__.py:2334-2423`): a small C ABI
shared library (``native/matcher.cpp``), built on demand with g++ and loaded
with ctypes.  Every entry point has a pure-Python fallback, so the package
works without a toolchain; with it, the synthetic-data hot loop
(substructure matching for abbreviation collapse) runs natively.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, List, Optional

import numpy as np

from molnextr_tpu.utils import logger

_LIB = None
_LIB_LOCK = threading.Lock()
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native_src")
_SO_NAME = "libmolnextr_native.so"


def _build_and_load() -> Optional[ctypes.CDLL]:
    src = os.path.join(_NATIVE_DIR, "matcher.cpp")
    so = os.path.join(_NATIVE_DIR, _SO_NAME)
    if not os.path.exists(so) or (
        os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(so)
    ):
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-o", so, src],
                check=True, capture_output=True, timeout=120,
            )
        except Exception as e:  # no toolchain / compile error: fall back
            logger.debug(f"native build failed: {e}")
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError as e:
        logger.debug(f"native load failed: {e}")
        return None
    lib.mnx_find_substructures.restype = ctypes.c_int
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LIB_LOCK:
        if _LIB is None and not _TRIED:
            if os.environ.get("MOLNEXTR_NO_NATIVE"):
                _TRIED = True
                return None
            _LIB = _build_and_load()
            _TRIED = True
            if _LIB is not None:
                logger.debug("native matcher loaded")
    return _LIB


def _graph_arrays(mol) -> Dict[str, np.ndarray]:
    """Flatten a Mol into the C ABI's CSR arrays (cached on the object)."""
    n = mol.num_atoms()
    n_bonds = sum(1 for _ in mol.iter_bonds())
    cached = getattr(mol, "_native_arrays", None)
    if cached is not None and cached["key"] == (n, n_bonds):
        return cached
    sym = np.zeros(n, np.int32)
    charge = np.zeros(n, np.int32)
    aromatic = np.zeros(n, np.int32)
    explicit_h = np.zeros(n, np.int32)
    total_h = np.zeros(n, np.int32)
    has_alias = np.zeros(n, np.int32)
    for i, a in enumerate(mol.atoms):
        sym[i] = a.atomic_num
        charge[i] = a.charge
        aromatic[i] = 1 if a.aromatic else 0
        explicit_h[i] = a.explicit_h
        total_h[i] = mol.total_h(i)
        has_alias[i] = 1 if a.alias else 0
    counts = np.zeros(n + 1, np.int32)
    edges = [(b.a1, b.a2, b.order) for b in mol.iter_bonds()]
    for a1, a2, _ in edges:
        counts[a1 + 1] += 1
        counts[a2 + 1] += 1
    off = np.cumsum(counts).astype(np.int32)
    nbr = np.zeros(max(int(off[-1]), 1), np.int32)
    ordv = np.zeros_like(nbr)
    fill = off[:-1].copy()
    for a1, a2, o in edges:
        nbr[fill[a1]] = a2
        ordv[fill[a1]] = o
        fill[a1] += 1
        nbr[fill[a2]] = a1
        ordv[fill[a2]] = o
        fill[a2] += 1
    arrays = {
        "key": (n, n_bonds),
        "n": n, "sym": sym, "charge": charge, "aromatic": aromatic,
        "explicit_h": explicit_h, "total_h": total_h, "has_alias": has_alias,
        "adj_off": off, "adj_nbr": nbr, "adj_ord": ordv,
    }
    # pre-build the ctypes pointers once: data_as() per call dominated the
    # native dispatch cost (20 conversions per match call)
    arrays["ptrs"] = tuple(
        _ptr(arrays[k])
        for k in ("sym", "charge", "aromatic", "explicit_h", "total_h",
                  "has_alias", "adj_off", "adj_nbr", "adj_ord")
    )
    mol._native_arrays = arrays
    return arrays


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def find_substructures_native(
    mol, pattern, attachment_free: Optional[Dict[int, int]] = None,
    max_matches: int = 64,
) -> Optional[List[Dict[int, int]]]:
    """Native matcher; returns None when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    g = _graph_arrays(mol)
    p = _graph_arrays(pattern)
    np_ = p["n"]
    if np_ == 0 or np_ > g["n"]:
        return []
    af = np.zeros(np_, np.int32)
    for k, v in (attachment_free or {}).items():
        if 0 <= k < np_:
            af[k] = v
    out = np.zeros(max_matches * np_, np.int32)
    found = lib.mnx_find_substructures(
        g["n"], *g["ptrs"], np_, *p["ptrs"], _ptr(af), _ptr(out), max_matches,
    )
    return [
        {pi: int(out[m * np_ + pi]) for pi in range(np_)} for m in range(found)
    ]
