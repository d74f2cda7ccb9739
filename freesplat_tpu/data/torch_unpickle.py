"""Torch-free reader for ``torch.save`` files (RE10K ``.torch`` chunks).

PyTorch is not a dependency of this framework; the RE10K dataset ships as
``.torch`` chunk files (reference ``src/dataset/dataset_re10k.py:69-127``),
so this module re-implements exactly the subset of torch's serialization
format those chunks use, producing numpy arrays:

- the modern zip container: ``{name}/data.pkl`` + ``{name}/data/{key}``
  storage blobs (+ ``{name}/version``),
- pickle ``persistent_id`` tuples
  ``("storage", StorageType, key, location, numel)``,
- ``torch._utils._rebuild_tensor_v2(storage, offset, size, stride,
  requires_grad, backward_hooks)`` (and the plain ``_rebuild_tensor``),
- the storage dtypes that appear in image/camera chunks.

If a file is not a zip archive (legacy torch format), we fall back to
``import torch`` when available, else raise with a clear message.
"""
from __future__ import annotations

import io
import pickle
import zipfile
from pathlib import Path
from typing import Any

import numpy as np

_STORAGE_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "ByteStorage": np.uint8,
    "CharStorage": np.int8,
    "ShortStorage": np.int16,
    "IntStorage": np.int32,
    "LongStorage": np.int64,
    "BoolStorage": np.bool_,
    "BFloat16Storage": None,  # handled specially below
}


class _StorageType:
    """Stand-in for ``torch.FloatStorage`` & co. in the pickle stream."""

    def __init__(self, name: str):
        self.name = name

    def __repr__(self) -> str:  # pragma: no cover
        return f"_StorageType({self.name})"


class _Storage:
    """A raw storage blob + element dtype."""

    def __init__(self, data: bytes, dtype, numel: int):
        self.dtype = dtype
        if dtype is None:  # bfloat16: widen to f32 via int16 bit tricks
            raw = np.frombuffer(data, dtype=np.uint16, count=numel)
            self.array = (
                raw.astype(np.uint32) << 16
            ).view(np.float32).copy()
            self.dtype = np.float32
        else:
            self.array = np.frombuffer(
                data, dtype=dtype, count=numel
            ).copy()


def _rebuild_tensor_v2(
    storage: _Storage,
    storage_offset: int,
    size,
    stride,
    requires_grad=False,
    backward_hooks=None,
    metadata=None,
) -> np.ndarray:
    size = tuple(int(s) for s in size)
    stride = tuple(int(s) for s in stride)
    base = storage.array[storage_offset:]
    if not size:
        return base[:1].reshape(())
    itemsize = base.dtype.itemsize
    arr = np.lib.stride_tricks.as_strided(
        base, shape=size, strides=tuple(s * itemsize for s in stride)
    )
    return np.ascontiguousarray(arr)


def _rebuild_tensor(storage, storage_offset, size, stride):
    return _rebuild_tensor_v2(storage, storage_offset, size, stride)


class _TorchUnpickler(pickle.Unpickler):
    def __init__(self, file, read_record):
        super().__init__(file)
        self._read_record = read_record

    def find_class(self, module: str, name: str) -> Any:
        if module.startswith("torch"):
            if name in _STORAGE_DTYPES:
                return _StorageType(name)
            if name == "_rebuild_tensor_v2":
                return _rebuild_tensor_v2
            if name == "_rebuild_tensor":
                return _rebuild_tensor
            if name == "Size":
                return tuple
            if name in ("OrderedDict",):
                from collections import OrderedDict

                return OrderedDict
            raise pickle.UnpicklingError(
                f"torch-free unpickler: unsupported torch symbol "
                f"{module}.{name}"
            )
        # Allow-list of safe stdlib symbols that appear in data chunks.
        if (module, name) in (
            ("collections", "OrderedDict"),
            ("builtins", "list"),
            ("builtins", "dict"),
            ("builtins", "set"),
        ):
            import importlib

            return getattr(importlib.import_module(module), name)
        if module.startswith("numpy"):
            import importlib

            return getattr(importlib.import_module(module), name)
        raise pickle.UnpicklingError(
            f"torch-free unpickler: refusing {module}.{name}"
        )

    def persistent_load(self, pid: Any) -> Any:
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unknown persistent id {pid!r}")
        _, storage_type, key, _location, numel = pid
        name = (
            storage_type.name
            if isinstance(storage_type, _StorageType)
            else str(storage_type)
        )
        dtype = _STORAGE_DTYPES.get(name, "missing")
        if dtype == "missing":
            raise pickle.UnpicklingError(f"unsupported storage type {name}")
        data = self._read_record(str(key))
        return _Storage(data, dtype, int(numel))


def load_torch_file(path: str | Path) -> Any:
    """Load a ``torch.save`` zip file without torch; tensors -> numpy."""
    path = Path(path)
    if not zipfile.is_zipfile(path):
        try:  # legacy format: defer to torch if present
            import torch

            return torch.load(path, map_location="cpu", weights_only=False)
        except ImportError:
            raise ValueError(
                f"{path} is not a torch zip archive and torch is not "
                "installed to read the legacy format"
            )
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("/data.pkl"))
        prefix = pkl_name[: -len("data.pkl")]

        def read_record(key: str) -> bytes:
            return zf.read(f"{prefix}data/{key}")

        with zf.open(pkl_name) as f:
            return _TorchUnpickler(io.BytesIO(f.read()), read_record).load()


_INV_DTYPES = {
    np.dtype(np.float32): "FloatStorage",
    np.dtype(np.float64): "DoubleStorage",
    np.dtype(np.float16): "HalfStorage",
    np.dtype(np.uint8): "ByteStorage",
    np.dtype(np.int8): "CharStorage",
    np.dtype(np.int16): "ShortStorage",
    np.dtype(np.int32): "IntStorage",
    np.dtype(np.int64): "LongStorage",
    np.dtype(np.bool_): "BoolStorage",
}


def save_torch_file(obj: Any, path: str | Path) -> None:
    """Write ``obj`` in the torch zip format, without torch installed.

    Numpy arrays become tensors (``torch._utils._rebuild_tensor_v2``
    GLOBALs + persistent-id storages), so fixtures written here exercise
    the same format ``torch.save`` produces.  The GLOBAL identity check in
    ``pickle`` requires the referenced symbols to resolve, so lightweight
    stand-in ``torch`` modules are registered in ``sys.modules`` for the
    duration of the dump when torch is absent.
    """
    import sys
    import types

    path = Path(path)
    storages: list[np.ndarray] = []

    fake_modules = {}
    if "torch" not in sys.modules:
        torch_mod = types.ModuleType("torch")
        utils_mod = types.ModuleType("torch._utils")

        def _rebuild(*args):  # pragma: no cover — only called by readers
            return _rebuild_tensor_v2(*args)

        _rebuild.__module__ = "torch._utils"
        _rebuild.__qualname__ = _rebuild.__name__ = "_rebuild_tensor_v2"
        utils_mod._rebuild_tensor_v2 = _rebuild
        for name in _INV_DTYPES.values():
            t = type(name, (), {"__module__": "torch"})
            setattr(torch_mod, name, t)
        torch_mod._utils = utils_mod
        fake_modules = {"torch": torch_mod, "torch._utils": utils_mod}
        sys.modules.update(fake_modules)

    try:
        torch_mod = sys.modules["torch"]
        rebuild = sys.modules["torch._utils"]._rebuild_tensor_v2

        class _TensorProxy:
            def __init__(self, arr: np.ndarray):
                self.arr = np.ascontiguousarray(arr)

        class _Pickler(pickle.Pickler):
            def persistent_id(self, o):
                if isinstance(o, _TensorProxy):
                    raise RuntimeError  # pragma: no cover
                return None

            def reducer_override(self, o):
                if isinstance(o, np.ndarray):
                    key = len(storages)
                    arr = np.ascontiguousarray(o)
                    storages.append(arr)
                    stride = tuple(
                        s // arr.dtype.itemsize for s in arr.strides
                    )
                    from collections import OrderedDict

                    storage = _FixtureStorage(
                        getattr(torch_mod, _INV_DTYPES[arr.dtype]),
                        str(key),
                        arr.size,
                    )
                    return (
                        rebuild,
                        (storage, 0, tuple(arr.shape), stride, False,
                         OrderedDict()),
                    )
                return NotImplemented

        class _FixtureStorage:
            def __init__(self, storage_cls, key, numel):
                self.pid = ("storage", storage_cls, key, "cpu", numel)

        def storage_pid(pickler_self, o):
            if isinstance(o, _FixtureStorage):
                return o.pid
            return None

        _Pickler.persistent_id = storage_pid

        buf = io.BytesIO()
        _Pickler(buf, protocol=2).dump(obj)
    finally:
        for k in fake_modules:
            sys.modules.pop(k, None)

    name = path.stem
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr(f"{name}/version", "3\n")
        zf.writestr(f"{name}/data.pkl", buf.getvalue())
        for key, arr in enumerate(storages):
            zf.writestr(f"{name}/data/{key}", arr.tobytes())
