"""ctypes bindings for the native safetensors reader (native/
safetensors_reader.cpp): zero-copy mmap'd tensor views for the checkpoint
load path.  Falls back to the `safetensors` Python package when the
shared object has not been built (`make -C native`)."""

from __future__ import annotations

import ctypes
import os
from typing import Dict, List, Optional, Tuple

import ml_dtypes
import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native",
    "libsafetensors_reader.so")

_DTYPES = {
    "F64": np.float64, "F32": np.float32, "F16": np.float16,
    "BF16": ml_dtypes.bfloat16,
    "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
    "U8": np.uint8, "U16": np.uint16, "U32": np.uint32, "U64": np.uint64,
    "BOOL": np.bool_,
}


def _load_lib() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_LIB_PATH):
        # The .so is intentionally NOT committed (a prebuilt binary
        # can't be reviewed and can drift from the source): build it
        # from native/safetensors_reader.cpp on first use.
        import subprocess
        try:
            subprocess.run(["make", "-C", os.path.dirname(_LIB_PATH)],
                           capture_output=True, timeout=120, check=True)
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.str_open.restype = ctypes.c_void_p
    lib.str_open.argtypes = [ctypes.c_char_p]
    lib.str_close.argtypes = [ctypes.c_void_p]
    lib.str_num_tensors.restype = ctypes.c_int64
    lib.str_num_tensors.argtypes = [ctypes.c_void_p]
    lib.str_tensor_name.restype = ctypes.c_int64
    lib.str_tensor_name.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.c_char_p, ctypes.c_int64]
    lib.str_tensor_info.restype = ctypes.c_int64
    lib.str_tensor_info.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int64)]
    return lib


_LIB = _load_lib()


def available() -> bool:
    return _LIB is not None


class NativeShard:
    """One mmap'd safetensors shard; tensors come back as zero-copy numpy
    views into the mapping (bf16 as uint16 raw bits plus a flag)."""

    def __init__(self, path: str):
        assert _LIB is not None, "native reader not built (make -C native)"
        self._h = _LIB.str_open(path.encode())
        if not self._h:
            raise OSError(f"failed to open/parse {path}")
        self.path = path

    def keys(self) -> List[str]:
        n = _LIB.str_num_tensors(self._h)
        cap = 512
        buf = ctypes.create_string_buffer(cap)
        out = []
        for i in range(n):
            rc = _LIB.str_tensor_name(self._h, i, buf, cap)
            while rc < 0 and cap < 1 << 20:
                # name longer than the buffer: grow and retry (never
                # silently drop a tensor from the listing)
                cap *= 2
                buf = ctypes.create_string_buffer(cap)
                rc = _LIB.str_tensor_name(self._h, i, buf, cap)
            if rc >= 0:
                out.append(buf.value.decode())
        return out

    def get(self, name: str) -> np.ndarray:
        """Zero-copy numpy view of the tensor (bf16 via ml_dtypes)."""
        dbuf = ctypes.create_string_buffer(16)
        ndim = ctypes.c_int64()
        dims = (ctypes.c_int64 * 8)()
        data = ctypes.POINTER(ctypes.c_uint8)()
        nbytes = ctypes.c_int64()
        rc = _LIB.str_tensor_info(self._h, name.encode(), dbuf, 16,
                                  ctypes.byref(ndim), dims,
                                  ctypes.byref(data), ctypes.byref(nbytes))
        if rc != 0:
            raise KeyError(name)
        dt = dbuf.value.decode()
        shape = tuple(dims[i] for i in range(ndim.value))
        raw = np.ctypeslib.as_array(data, shape=(nbytes.value,))
        npdt = _DTYPES.get(dt)
        if npdt is None:
            raise ValueError(f"unsupported dtype {dt}")
        return raw.view(npdt).reshape(shape)

    def close(self):
        if self._h:
            _LIB.str_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


def open_shards(paths: List[str]) -> Dict[str, "NativeShard"]:
    """name -> shard lookup table over several shard files."""
    where: Dict[str, NativeShard] = {}
    for p in paths:
        sh = NativeShard(p)
        for k in sh.keys():
            where[k] = sh
    return where
