"""Torch-free reader for ``.pth.tar`` checkpoints.

The reference loads released checkpoints with ``torch.load``
(ref utils/util_functions.py:274-281). TPU hosts don't need a torch
install just to convert those files: this module unpickles both torch
serialization formats with a restricted, safelisted unpickler and
rebuilds tensors as numpy arrays.

Formats:
- **legacy** (torch <=1.5, what the 2019-era released checkpoints use):
  magic + protocol + sys_info pickles, the checkpoint object pickled with
  persistent-id storage references, a pickled key list, then raw storage
  bytes each prefixed by an int64 element count;
- **zip** (torch >=1.6 default): an archive holding ``<name>/data.pkl``
  plus one ``<name>/data/<key>`` file per storage.

Only the classes a checkpoint dict actually needs are allowed through
``find_class`` — anything else raises ``UnpicklingError`` instead of
executing arbitrary reduce callables.
"""

from __future__ import annotations

import io
import pickle
import struct
import zipfile
from collections import OrderedDict
from typing import Any, Dict

import numpy as np

__all__ = ["read_pth_tar"]

_LEGACY_MAGIC = 0x1950A86A20F9469CFC6C

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype(np.float32),
    "DoubleStorage": np.dtype(np.float64),
    "HalfStorage": np.dtype(np.float16),
    "LongStorage": np.dtype(np.int64),
    "IntStorage": np.dtype(np.int32),
    "ShortStorage": np.dtype(np.int16),
    "CharStorage": np.dtype(np.int8),
    "ByteStorage": np.dtype(np.uint8),
    "BoolStorage": np.dtype(np.bool_),
}
try:  # bf16 rides along with jax
    import ml_dtypes

    _STORAGE_DTYPES["BFloat16Storage"] = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    pass


class _StorageType:
    """Stand-in for ``torch.FloatStorage`` & co. inside persistent ids."""

    def __init__(self, name: str):
        self.name = name
        self.dtype = _STORAGE_DTYPES[name]


class _StorageRef:
    """One storage: dtype + element count, bytes filled in when read."""

    __slots__ = ("dtype", "numel", "data")

    def __init__(self, dtype: np.dtype, numel: int, data: bytes = None):
        self.dtype = dtype
        self.numel = numel
        self.data = data


class _LazyTensor:
    """Tensor deferred until its storage bytes exist (legacy format reads
    storage data *after* the object pickle)."""

    def __init__(self, storage: _StorageRef, offset: int, size, stride):
        self.storage = storage
        self.offset = offset
        self.size = tuple(size)
        self.stride = tuple(stride) if stride is not None else None

    def materialize(self) -> np.ndarray:
        if self.storage.data is None:
            raise pickle.UnpicklingError("tensor references an unread storage")
        flat = np.frombuffer(self.storage.data, dtype=self.storage.dtype)
        if self.stride is None:
            n = int(np.prod(self.size)) if self.size else 1
            return flat[self.offset : self.offset + n].reshape(self.size).copy()
        itemsize = self.storage.dtype.itemsize
        return np.lib.stride_tricks.as_strided(
            flat[self.offset :],
            shape=self.size,
            strides=tuple(s * itemsize for s in self.stride),
        ).copy()


def _rebuild_tensor_v2(storage, offset, size, stride, *_extra):
    return _LazyTensor(storage, offset, size, stride)


def _rebuild_tensor(storage, offset, size, stride):
    return _LazyTensor(storage, offset, size, stride)


def _rebuild_parameter(data, _requires_grad=True, _hooks=None):
    return data


_SAFE_GLOBALS = {
    ("collections", "OrderedDict"): OrderedDict,
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_tensor"): _rebuild_tensor,
    ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
    ("torch", "Size"): tuple,
}


class _Unpickler(pickle.Unpickler):
    def __init__(self, file, persistent_load):
        super().__init__(file, encoding="utf-8")
        self._persistent_load = persistent_load

    def find_class(self, module, name):
        if name in _STORAGE_DTYPES and module in ("torch", "torch.storage"):
            return _StorageType(name)
        try:
            return _SAFE_GLOBALS[(module, name)]
        except KeyError:
            raise pickle.UnpicklingError(
                "checkpoint references %s.%s, which the torch-free reader "
                "does not allow (install torch to load it)" % (module, name)
            )

    def persistent_load(self, pid):
        return self._persistent_load(pid)


def _materialize(obj: Any) -> Any:
    if isinstance(obj, _LazyTensor):
        return obj.materialize()
    if isinstance(obj, dict):
        return type(obj)((k, _materialize(v)) for k, v in obj.items())
    if isinstance(obj, (list, tuple)):
        return type(obj)(_materialize(v) for v in obj)
    return obj


def _read_zip(path: str) -> Any:
    zf = zipfile.ZipFile(path)
    pkl_name = next(
        n for n in zf.namelist() if n.endswith("/data.pkl") or n == "data.pkl"
    )
    prefix = pkl_name[: -len("data.pkl")]
    storages: Dict[str, _StorageRef] = {}

    def persistent_load(pid):
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError("unknown persistent id %r" % (pid,))
        stype, key, _location, numel = pid[1:5]
        if key not in storages:
            storages[key] = _StorageRef(
                stype.dtype, numel, zf.read(prefix + "data/" + str(key))
            )
        return storages[key]

    obj = _Unpickler(io.BytesIO(zf.read(pkl_name)), persistent_load).load()
    return _materialize(obj)


def _read_legacy(f) -> Any:
    def _pickle_one():
        return _Unpickler(f, lambda pid: None).load()

    if _pickle_one() != _LEGACY_MAGIC:
        raise pickle.UnpicklingError("not a torch legacy checkpoint (bad magic)")
    _protocol = _pickle_one()
    _sys_info = _pickle_one()

    storages: Dict[str, _StorageRef] = {}
    views: Dict[str, tuple] = {}  # view key -> (root key, offset, numel)

    def persistent_load(pid):
        if not (isinstance(pid, tuple) and pid):
            raise pickle.UnpicklingError("unknown persistent id %r" % (pid,))
        if pid[0] == "module":
            return pid[1]
        if pid[0] != "storage":
            raise pickle.UnpicklingError("unknown persistent id %r" % (pid,))
        stype, root_key, _location, numel = pid[1:5]
        view_metadata = pid[5] if len(pid) > 5 else None
        if root_key not in storages:
            storages[root_key] = _StorageRef(stype.dtype, numel)
        if view_metadata:
            view_key, view_offset, view_numel = view_metadata
            if view_key not in storages:
                storages[view_key] = _StorageRef(stype.dtype, view_numel)
                views[view_key] = (root_key, view_offset, view_numel)
            return storages[view_key]
        return storages[root_key]

    obj = _Unpickler(f, persistent_load).load()
    keys = _Unpickler(f, lambda pid: None).load()
    for key in keys:
        (numel,) = struct.unpack("<q", f.read(8))
        ref = storages[key]
        ref.data = f.read(numel * ref.dtype.itemsize)
    for view_key, (root_key, offset, numel) in views.items():
        root = storages[root_key]
        itemsize = root.dtype.itemsize
        storages[view_key].data = root.data[
            offset * itemsize : (offset + numel) * itemsize
        ]
    return _materialize(obj)


def read_pth_tar(path: str) -> Any:
    """Load a torch checkpoint file without torch; tensors become numpy."""
    if zipfile.is_zipfile(path):
        return _read_zip(path)
    with open(path, "rb") as f:
        return _read_legacy(f)
