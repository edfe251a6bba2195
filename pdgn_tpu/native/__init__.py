"""Native C++ backend: XLA FFI custom calls on CPU.

Equivalent of the reference's native layer glue (lib/pointops/src/*_cuda.cpp
+ pointops_api.cpp pybind module and the StructuralLossesBackend shim): a
shared library built from ``pdgn_ops.cc`` whose handlers are registered as
XLA custom-call targets for the CPU platform. No pybind — the handlers are
looked up with ctypes and registered through ``jax.ffi``.

The library is compiled on first use with the system ``g++`` against the
XLA FFI headers that ship inside jaxlib, and cached next to the source.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "pdgn_ops.cc")
_LIB = os.path.join(_HERE, "libpdgn_ops.so")

_HANDLERS = {
    "pdgn_knnquery": "PdgnKnnQuery",
    "pdgn_nndistance": "PdgnNnDistance",
    "pdgn_approxmatch": "PdgnApproxMatch",
    "pdgn_fps": "PdgnFps",
}


def _build() -> str:
    """Compile the shared library if missing or stale.

    Compiles to a unique temp file and renames atomically so concurrent
    processes never dlopen a partially-written .so.
    """
    if (os.path.exists(_LIB)
            and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
        return _LIB
    include_dir = jax.ffi.include_dir()
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-shared", "-fPIC", "-O3", "-std=c++17",
        f"-I{include_dir}", _SRC, "-o", tmp,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        os.replace(tmp, _LIB)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return _LIB


@functools.cache
def _register() -> bool:
    """Build + register all handlers for the CPU platform (idempotent)."""
    lib = ctypes.CDLL(_build())
    for target, symbol in _HANDLERS.items():
        jax.ffi.register_ffi_target(
            target, jax.ffi.pycapsule(getattr(lib, symbol)), platform="cpu")
    return True


def available() -> bool:
    """True when the native library can be built and registered."""
    try:
        _register()
        return True
    except Exception:
        return False


def knnquery_cpu(xyz: jnp.ndarray, new_xyz: jnp.ndarray, nsample: int
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Native kNN (reference knnquery semantics). CPU only.

    Returns ``(idx (b,m,k) int32, dist2 (b,m,k) f32)``.
    """
    _register()
    b, m, _ = new_xyz.shape
    call = jax.ffi.ffi_call(
        "pdgn_knnquery",
        (jax.ShapeDtypeStruct((b, m, nsample), jnp.int32),
         jax.ShapeDtypeStruct((b, m, nsample), jnp.float32)),
    )
    return call(jnp.asarray(xyz, jnp.float32), jnp.asarray(new_xyz, jnp.float32))


def nndistance_cpu(x: jnp.ndarray, y: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Native bidirectional NN distances (reference nndistance.cu)."""
    _register()
    b, n, _ = x.shape
    m = y.shape[1]
    call = jax.ffi.ffi_call(
        "pdgn_nndistance",
        (jax.ShapeDtypeStruct((b, n), jnp.float32),
         jax.ShapeDtypeStruct((b, m), jnp.float32)),
    )
    return call(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32))


def approxmatch_cpu(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Native approxmatch transport cost (reference approxmatch.cu)."""
    _register()
    b = x1.shape[0]
    call = jax.ffi.ffi_call(
        "pdgn_approxmatch",
        jax.ShapeDtypeStruct((b,), jnp.float32),
    )
    return call(jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32))


def fps_cpu(xyz: jnp.ndarray, m: int) -> jnp.ndarray:
    """Native furthest point sampling (reference sampling_cuda_kernel.cu)."""
    _register()
    b = xyz.shape[0]
    call = jax.ffi.ffi_call(
        "pdgn_fps",
        jax.ShapeDtypeStruct((b, m), jnp.int32),
    )
    return call(jnp.asarray(xyz, jnp.float32))
