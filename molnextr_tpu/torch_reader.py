"""Torch-free reader for PyTorch ``.pth`` checkpoint files.

The reference distributes its released model as a ``torch.save`` zip archive
(`/root/reference/MolNexTR/molnextr.py:126-143`, loaded at `model.py:41`).
A ``.pth`` (zip format, torch >= 1.6) is a zip containing

* ``<archive>/data.pkl`` — a pickle of the checkpoint object whose tensors
  are ``persistent_load`` references ``('storage', StorageType, key,
  location, numel)`` rebuilt through ``torch._utils._rebuild_tensor_v2``;
* ``<archive>/data/<key>`` — the raw little-endian storage bytes.

This module re-implements just enough of that protocol to materialize every
tensor as a numpy array without importing torch: a restricted Unpickler maps
the torch storage classes to dtype tags and ``_rebuild_tensor_v2`` to a
strided numpy view over the zip entry's bytes.  Anything outside the
whitelist (arbitrary reduce payloads) is rejected — this is also a far
smaller attack surface than ``torch.load(weights_only=False)``.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from collections import OrderedDict
from typing import Any, Dict, Tuple

import numpy as np

# torch storage class name -> numpy dtype (bfloat16 via ml_dtypes, which is
# a jax dependency and therefore always present here)
try:
    import ml_dtypes

    _BFLOAT16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    _BFLOAT16 = None

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("<i1"),
    "ByteStorage": np.dtype("<u1"),
    "BoolStorage": np.dtype("?"),
}
if _BFLOAT16 is not None:
    _STORAGE_DTYPES["BFloat16Storage"] = _BFLOAT16


class _StorageType:
    """Marker for a ``torch.XxxStorage`` class reference inside the pickle."""

    def __init__(self, dtype: np.dtype):
        self.dtype = dtype


class _Storage:
    """One raw storage: lazily decoded bytes + dtype."""

    def __init__(self, data: bytes, dtype: np.dtype):
        self.data = data
        self.dtype = dtype

    def as_array(self) -> np.ndarray:
        return np.frombuffer(self.data, dtype=self.dtype)


def _rebuild_tensor_v2(
    storage: _Storage,
    storage_offset: int,
    size: Tuple[int, ...],
    stride: Tuple[int, ...],
    requires_grad: bool = False,
    backward_hooks: Any = None,
    metadata: Any = None,
) -> np.ndarray:
    """numpy equivalent of ``torch._utils._rebuild_tensor_v2``."""
    flat = storage.as_array()[storage_offset:]
    if not size:
        return flat[:1].reshape(()).copy()
    itemsize = flat.dtype.itemsize
    strides = tuple(int(s) * itemsize for s in stride)
    arr = np.lib.stride_tricks.as_strided(flat, shape=tuple(size), strides=strides)
    return np.ascontiguousarray(arr)


def _rebuild_parameter(tensor: np.ndarray, requires_grad: bool = False,
                       backward_hooks: Any = None) -> np.ndarray:
    return tensor


class _Namespace:
    """Stand-in for ``argparse.Namespace`` instances pickled inside ``args``."""

    def __init__(self, **kwargs):
        self.__dict__.update(kwargs)

    def __setstate__(self, state):
        self.__dict__.update(state)

    def to_dict(self) -> Dict[str, Any]:
        return dict(self.__dict__)


_SAFE_BUILTINS = {
    ("collections", "OrderedDict"): OrderedDict,
    ("argparse", "Namespace"): _Namespace,
    ("builtins", "set"): set,
    ("builtins", "frozenset"): frozenset,
    ("builtins", "complex"): complex,
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
    ("torch.serialization", "_get_layout"): lambda name: name,
}


class _TorchUnpickler(pickle.Unpickler):
    """Restricted unpickler: torch storages + plain containers only."""

    def __init__(self, file, load_storage):
        super().__init__(file)
        self._load_storage = load_storage

    def find_class(self, module: str, name: str):
        if module == "torch" and name in _STORAGE_DTYPES:
            return _StorageType(_STORAGE_DTYPES[name])
        if module == "torch" and name.endswith("Storage"):
            raise pickle.UnpicklingError(
                f"unsupported torch storage dtype: {name}"
            )
        fn = _SAFE_BUILTINS.get((module, name))
        if fn is not None:
            return fn
        raise pickle.UnpicklingError(
            f"refusing to unpickle {module}.{name} (not in the torch-reader "
            "whitelist; extend molnextr_tpu.torch_reader._SAFE_BUILTINS if "
            "this is a legitimate checkpoint field)"
        )

    def persistent_load(self, pid):
        # ('storage', StorageType, key, location, numel)
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unsupported persistent id {pid!r}")
        _, storage_type, key, _location, _numel = pid
        if not isinstance(storage_type, _StorageType):
            raise pickle.UnpicklingError(f"unknown storage type {storage_type!r}")
        return self._load_storage(str(key), storage_type.dtype)


def load_pth(path: str) -> Any:
    """Read a ``torch.save`` zip ``.pth`` without torch.

    Returns the checkpoint object with every tensor as a numpy array
    (bfloat16 tensors use ``ml_dtypes.bfloat16``).  Raises ``ValueError``
    for the pre-1.6 legacy format.
    """
    if not zipfile.is_zipfile(path):
        raise ValueError(
            f"{path} is not a zip-format torch checkpoint (pre-1.6 legacy "
            "serialization is not supported; re-save it with a modern torch)"
        )
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next((n for n in names if n.endswith("/data.pkl")), None)
        if pkl_name is None:
            raise ValueError(f"{path}: no data.pkl inside the archive")
        prefix = pkl_name[: -len("data.pkl")]

        def load_storage(key: str, dtype: np.dtype) -> _Storage:
            return _Storage(zf.read(f"{prefix}data/{key}"), dtype)

        with zf.open(pkl_name) as f:
            return _TorchUnpickler(io.BytesIO(f.read()), load_storage).load()


def namespace_to_dict(obj: Any) -> Any:
    """Normalize pickled args: _Namespace -> dict, recursively."""
    if isinstance(obj, _Namespace):
        return {k: namespace_to_dict(v) for k, v in obj.to_dict().items()}
    if isinstance(obj, dict):
        return {k: namespace_to_dict(v) for k, v in obj.items()}
    return obj
