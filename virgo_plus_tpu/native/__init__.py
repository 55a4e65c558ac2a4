"""ctypes bindings for the native C++ circuit frontend.

Builds ``frontend.cpp`` into a shared object on first use (g++, -O2) and
exposes ``load_circuit(path, bug_compat)`` returning the same
``LayeredCircuit`` as the pure-Python frontend (circuits/pws.py +
circuits/layered.py), ~20x faster on large .pws files.  Falls back to the
Python path when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "frontend.cpp")
_SO = os.path.join(_DIR, "libvptfrontend.so")

_lib = None


def _build():
    cmd = ["g++", "-std=c++17", "-O2", "-fPIC", "-shared", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_SO) or
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_SO)
    lib.vpt_build.restype = ctypes.c_void_p
    lib.vpt_build.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
    lib.vpt_error.restype = ctypes.c_char_p
    lib.vpt_error.argtypes = [ctypes.c_void_p]
    P = ctypes.c_void_p
    I64 = ctypes.c_int64
    for name, res, args in (
            ("vpt_depth", ctypes.c_int64, [P]),
            ("vpt_layer_size", ctypes.c_int64, [P, I64]),
            ("vpt_layer_bl", ctypes.c_int32, [P, I64]),
            ("vpt_layer_max_dad_bl", ctypes.c_int32, [P, I64]),
            ("vpt_layer_max_dad_size", ctypes.c_int64, [P, I64])):
        fn = getattr(lib, name)
        fn.restype = res
        fn.argtypes = args
    pv = ctypes.c_void_p
    lib.vpt_layer_gates.restype = None
    lib.vpt_layer_gates.argtypes = [P, I64, pv, pv, pv, pv, pv, pv]
    lib.vpt_dad_sizes.restype = None
    lib.vpt_dad_sizes.argtypes = [P, I64, pv, pv]
    lib.vpt_dad_ids.restype = None
    lib.vpt_dad_ids.argtypes = [P, I64, I64, pv]
    lib.vpt_inputs.restype = None
    lib.vpt_inputs.argtypes = [P, pv]
    lib.vpt_free.argtypes = [P]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def load_circuit(path: str, bug_compat: bool = True,
                 use_glibc_inputs: bool = True):
    """Parse + layer + subsets natively; returns a LayeredCircuit."""
    from ..circuits.layered import Layer, LayeredCircuit, _SENTINEL_EMPTY

    lib = _load()
    h = lib.vpt_build(path.encode(), int(bug_compat), int(use_glibc_inputs))
    try:
        err = lib.vpt_error(h)
        if err:
            raise ValueError(f"native frontend: {err.decode()}")
        depth = lib.vpt_depth(h)
        layers = []
        for i in range(depth):
            size = lib.vpt_layer_size(h, i)
            ty = np.zeros(size, np.int32)
            u = np.zeros(size, np.int64)
            v = np.zeros(size, np.int64)
            lv = np.zeros(size, np.int64)
            l = np.zeros(size, np.int32)
            c_real = np.zeros(size, np.uint64)
            lib.vpt_layer_gates(h, i, ty.ctypes.data, u.ctypes.data,
                                v.ctypes.data, lv.ctypes.data,
                                l.ctypes.data, c_real.ctypes.data)
            L = Layer(ty=ty, u=u, v=v, l=l, lv=lv, c_real=c_real,
                      c_img=np.zeros(size, np.uint64),
                      is_assert=np.zeros(size, bool), size=int(size),
                      bit_length=int(lib.vpt_layer_bl(h, i)))
            if i > 0:
                sizes = np.zeros(i, np.int64)
                bls = np.zeros(i, np.int64)
                lib.vpt_dad_sizes(h, i, sizes.ctypes.data,
                                  bls.ctypes.data)
                L.dad_size = [int(x) for x in sizes]
                L.dad_bl_raw = bls
                L.dad_bit_length = [
                    int(b) if s > 0 else _SENTINEL_EMPTY
                    for b, s in zip(bls, sizes)]
                L.dad_id = []
                for li in range(i):
                    ids = np.zeros(int(sizes[li]), np.int64)
                    if sizes[li] > 0:
                        lib.vpt_dad_ids(h, i, li, ids.ctypes.data)
                    L.dad_id.append(ids)
                L.max_dad_size = int(lib.vpt_layer_max_dad_size(h, i))
                L.max_dad_bit_length = int(lib.vpt_layer_max_dad_bl(h, i))
            layers.append(L)
        input_vals = np.zeros((2, layers[0].size), np.uint64)
        lib.vpt_inputs(h, input_vals[0].ctypes.data)
        return LayeredCircuit(layers=layers, input_values=input_vals)
    finally:
        lib.vpt_free(h)
