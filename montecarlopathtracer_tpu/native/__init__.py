"""Native (C++) host-runtime bindings.

The reference's host runtime is native C++ — its OBJ/MTL parser
(`CVMCTracer/CVMCTracer/Framework/ObjReader.{hpp,cpp}`) and KD-tree
builder (`MCRT/QuinEngine/Utils/KDTree.hpp`). This package binds the
framework's C++ equivalents (``native/mcpt_native.cpp``) via ctypes:

- :func:`read_obj_native` — scene loading straight into the flat NumPy
  arrays the device layer consumes;
- :func:`build_kdtree_native` — KD build + pre-order/skip-link
  flattening in one native call.

The shared library is compiled on demand with the system ``g++`` and
cached next to this file; :func:`available` reports whether the native
path can be used. The pure-Python implementations in ``scene.objio``
and ``accel.kdtree`` remain the portable oracle — tests assert the
native outputs match them exactly.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(os.path.dirname(os.path.dirname(_HERE)), "native", "mcpt_native.cpp")
_LIB_PATH = os.path.join(_HERE, "libmcpt_native.so")
_ABI_VERSION = 2

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _compile() -> Optional[str]:
    """Compile the shared library; returns an error string or None."""
    if not os.path.exists(_SRC):
        return f"native source not found: {_SRC}"
    # Build into a temp file then atomically rename, so concurrent
    # processes never load a half-written .so.
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_HERE)
    os.close(fd)
    cmd = [
        "g++",
        "-O2",
        "-std=c++17",
        "-shared",
        "-fPIC",
        _SRC,
        "-o",
        tmp,
    ]
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=300
        )
    except (OSError, subprocess.TimeoutExpired) as e:
        os.unlink(tmp)
        return f"g++ invocation failed: {e}"
    if proc.returncode != 0:
        os.unlink(tmp)
        return f"g++ failed:\n{proc.stderr[-2000:]}"
    os.replace(tmp, _LIB_PATH)
    return None


def _bind(lib: ctypes.CDLL) -> None:
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.mcpt_abi_version.restype = ctypes.c_int
    lib.mcpt_obj_read.restype = ctypes.c_void_p
    lib.mcpt_obj_read.argtypes = [ctypes.c_char_p]
    lib.mcpt_obj_error.restype = ctypes.c_char_p
    lib.mcpt_obj_error.argtypes = [ctypes.c_void_p]
    lib.mcpt_obj_counts.argtypes = [ctypes.c_void_p] + [i64p] * 8
    lib.mcpt_obj_fill.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 16
    lib.mcpt_obj_free.argtypes = [ctypes.c_void_p]
    lib.mcpt_kd_build.restype = ctypes.c_void_p
    lib.mcpt_kd_build.argtypes = [ctypes.c_void_p] * 4 + [ctypes.c_int64]
    lib.mcpt_kd_counts.argtypes = [ctypes.c_void_p, i64p, i64p]
    lib.mcpt_kd_fill.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 6
    lib.mcpt_kd_free.argtypes = [ctypes.c_void_p]


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_error
    with _lock:
        if _lib is not None:
            return _lib
        if _build_error is not None:
            return None
        if not os.path.exists(_LIB_PATH):
            err = _compile()
            if err is not None:
                _build_error = err
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            _bind(lib)
            if lib.mcpt_abi_version() != _ABI_VERSION:
                # Stale cache from an older source: rebuild once.
                os.unlink(_LIB_PATH)
                err = _compile()
                if err is not None:
                    _build_error = err
                    return None
                lib = ctypes.CDLL(_LIB_PATH)
                _bind(lib)
        except OSError as e:
            _build_error = str(e)
            return None
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def build_error() -> Optional[str]:
    get_lib()
    return _build_error


def _ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.c_void_p)


def read_obj_native(path: str):
    """Parse an OBJ (+MTL) natively into an ``ObjModel``.

    Drop-in equivalent of :func:`scene.objio.read_obj` — identical pool
    layout including the dummy index-0 entries.
    """
    from ..scene.objio import ObjModel, ObjMaterial, ObjTriangle

    lib = get_lib()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_build_error}")
    handle = lib.mcpt_obj_read(path.encode())
    if not handle:
        raise RuntimeError("mcpt_obj_read returned NULL")
    try:
        err = lib.mcpt_obj_error(handle)
        if err:
            raise FileNotFoundError(err.decode())
        counts = [ctypes.c_int64() for _ in range(8)]
        lib.mcpt_obj_counts(handle, *[ctypes.byref(c) for c in counts])
        nv, nt, nn, ntri, nmat, ngroups, gtotal, nbytes = (
            c.value for c in counts
        )
        vertices = np.empty((nv, 3), np.float64)
        textures = np.empty((nt, 2), np.float64)
        normals = np.empty((nn, 3), np.float64)
        tri_v = np.empty((ntri, 3), np.int32)
        tri_t = np.empty((ntri, 3), np.int32)
        tri_n = np.empty((ntri, 3), np.int32)
        tri_mat = np.empty((ntri,), np.int32)
        mat_ka = np.empty((nmat, 3), np.float64)
        mat_kd = np.empty((nmat, 3), np.float64)
        mat_ks = np.empty((nmat, 3), np.float64)
        mat_ns = np.empty((nmat,), np.float64)
        mat_tr = np.empty((nmat,), np.float64)
        mat_ni = np.empty((nmat,), np.float64)
        group_start = np.empty((ngroups + 1,), np.int64)
        group_tris = np.empty((gtotal,), np.int32)
        names = ctypes.create_string_buffer(int(nbytes))
        lib.mcpt_obj_fill(
            handle,
            _ptr(vertices),
            _ptr(textures),
            _ptr(normals),
            _ptr(tri_v),
            _ptr(tri_t),
            _ptr(tri_n),
            _ptr(tri_mat),
            _ptr(mat_ka),
            _ptr(mat_kd),
            _ptr(mat_ks),
            _ptr(mat_ns),
            _ptr(mat_tr),
            _ptr(mat_ni),
            _ptr(group_start),
            _ptr(group_tris),
            ctypes.cast(names, ctypes.c_void_p),
        )
    finally:
        lib.mcpt_obj_free(handle)

    name_list = bytes(names.raw).split(b"\0")[: ngroups + nmat]
    group_names = [n.decode() for n in name_list[:ngroups]]
    mat_names = [n.decode() for n in name_list[ngroups:]]

    model = ObjModel(path=path)
    model.vertices = [tuple(map(float, v)) for v in vertices]
    model.textures = [tuple(map(float, t)) for t in textures]
    model.normals = [tuple(map(float, n)) for n in normals]
    model.triangles = [
        ObjTriangle(
            v=tuple(int(x) for x in tri_v[i]),
            t=tuple(int(x) for x in tri_t[i]),
            n=tuple(int(x) for x in tri_n[i]),
            material=int(tri_mat[i]),
        )
        for i in range(ntri)
    ]
    model.materials = [
        ObjMaterial(
            name=mat_names[i],
            Ka=tuple(map(float, mat_ka[i])),
            Kd=tuple(map(float, mat_kd[i])),
            Ks=tuple(map(float, mat_ks[i])),
            Ns=float(mat_ns[i]),
            Tr=float(mat_tr[i]),
            Ni=float(mat_ni[i]),
        )
        for i in range(nmat)
    ]
    model.groups = {
        group_names[g]: [
            int(t) for t in group_tris[group_start[g] : group_start[g + 1]]
        ]
        for g in range(ngroups)
    }
    return model


def build_kdtree_native(
    a: np.ndarray,
    b: np.ndarray,
    c: np.ndarray,
    valid: Optional[np.ndarray] = None,
    pad_leaf_to: int = 1,
):
    """Build + flatten the KD-tree natively.

    Drop-in equivalent of ``flatten_kdtree(build_kdtree(...))`` from
    :mod:`accel.kdtree` — same build policy (median/SAH hybrid, straddle
    duplication, depth cap 32), same pre-order skip-link layout.
    """
    from ..accel.kdtree import FlatKDTree

    lib = get_lib()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_build_error}")
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    c = np.ascontiguousarray(c, np.float32)
    T = a.shape[0]
    if valid is not None:
        vmask = np.ascontiguousarray(valid, np.uint8)
        vptr = _ptr(vmask)
    else:
        vmask = None
        vptr = None
    handle = lib.mcpt_kd_build(_ptr(a), _ptr(b), _ptr(c), vptr, T)
    if not handle:
        raise RuntimeError("mcpt_kd_build returned NULL")
    try:
        n_nodes = ctypes.c_int64()
        n_leaf = ctypes.c_int64()
        lib.mcpt_kd_counts(handle, ctypes.byref(n_nodes), ctypes.byref(n_leaf))
        N, L = n_nodes.value, n_leaf.value
        node_lo = np.empty((N, 3), np.float32)
        node_hi = np.empty((N, 3), np.float32)
        node_skip = np.empty((N,), np.int32)
        leaf_start = np.empty((N,), np.int32)
        leaf_count = np.empty((N,), np.int32)
        leaf_tris = np.empty((L,), np.int32)
        lib.mcpt_kd_fill(
            handle,
            _ptr(node_lo),
            _ptr(node_hi),
            _ptr(node_skip),
            _ptr(leaf_start),
            _ptr(leaf_count),
            _ptr(leaf_tris),
        )
    finally:
        lib.mcpt_kd_free(handle)
    if pad_leaf_to > 1 and len(leaf_tris) % pad_leaf_to:
        pad = pad_leaf_to - len(leaf_tris) % pad_leaf_to
        leaf_tris = np.concatenate(
            [leaf_tris, np.full((pad,), -1, np.int32)]
        )
    return FlatKDTree(
        node_lo=node_lo,
        node_hi=node_hi,
        node_skip=node_skip,
        leaf_start=leaf_start,
        leaf_count=leaf_count,
        leaf_tris=leaf_tris,
    )
