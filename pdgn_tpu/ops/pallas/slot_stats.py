"""Slot-blocked first/second-moment accumulation for lane-flat tensors.

The bilateral tail's ``bn_all2`` statistics come from the linear
second-moment identity (generator._linear_bn_stats): they need the
channel sums ``s = sum_rows h`` and the second-moment matrix
``S = sum_rows h h^T`` over every (batch, point, slot) row of the hidden
activation ``h``. The generator keeps ``h`` lane-flat ``(B, N, k*H)`` (no
(B, N, k, H) relayout anywhere), so computing S with a plain matmul
would first materialise a ``(B*N*k, H)`` reshape — a full HBM round trip
— and then run a multipass fp32 GEMM (measured ~2.6 ms/fwd at B=128 on
the stage-4 shapes).

This kernel reads each ``(T, k*H)`` tile once and accumulates
``s (1, H)`` and ``S (H, H)`` in revisited VMEM blocks: per slot a cheap
lane slice feeds one ``(T, H)^T @ (T, H)`` MXU contraction. bf16 inputs
lose nothing: bf16 products are exact in fp32 and both paths accumulate
in fp32.

Gradients (``custom_vjp``): ``d h`` for slot ``s`` is
``h_s (dS + dS^T) + ds`` — one block-diagonal GEMM on the flat layout
(XLA), no kernel needed.

Reference context: this replaces the stats pass the reference's
``bn_all2`` (models/PDGNet_v2.py:613-614, inside
``bilateral_upsample_edgeConv``) performs over the materialised
(B, 2Fin, N, k) gate tensor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_T = 128

_F32 = dict(preferred_element_type=jnp.float32)


def _kernel(k: int, H: int, h_ref, s_ref, S_ref):
    b = pl.program_id(0)
    t = pl.program_id(1)
    first = jnp.logical_and(b == 0, t == 0)

    @pl.when(first)
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)
        S_ref[...] = jnp.zeros_like(S_ref)

    tile = h_ref[0]                                       # (T, k*H)
    acc_s = jnp.zeros((1, H), jnp.float32)
    acc_S = jnp.zeros((H, H), jnp.float32)
    for s in range(k):
        hs = tile[:, s * H:(s + 1) * H]
        acc_s = acc_s + jnp.sum(hs.astype(jnp.float32), axis=0,
                                keepdims=True)
        acc_S = acc_S + jax.lax.dot_general(
            hs, hs, (((0,), (0,)), ((), ())), **_F32)
    s_ref[...] = s_ref[...] + acc_s
    S_ref[...] = S_ref[...] + acc_S


def _jnp_stats(h_flat, k):
    B, N, kh = h_flat.shape
    H = kh // k
    hf = h_flat.astype(jnp.float32).reshape(B * N * k, H)
    s = jnp.sum(hf, axis=0)
    S = jnp.matmul(hf.T, hf, precision=jax.lax.Precision.HIGHEST, **_F32)
    return s, S


def _pallas_stats(h_flat, k, interpret):
    B, N, kh = h_flat.shape
    H = kh // k
    s, S = pl.pallas_call(
        functools.partial(_kernel, k, H),
        grid=(B, N // _T),
        in_specs=[pl.BlockSpec((1, _T, kh), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, H), lambda b, t: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((H, H), lambda b, t: (0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((1, H), jnp.float32),
                   jax.ShapeDtypeStruct((H, H), jnp.float32)),
        interpret=interpret,
    )(h_flat)
    return s.reshape(H), S


def slot_stats_ok(h_flat, k: int) -> bool:
    import os

    if os.environ.get("PDGN_DISABLE_PALLAS"):
        return False
    if h_flat.shape[1] % _T or h_flat.shape[-1] % k:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def slot_moment_stats(h_flat, k: int, interpret: bool = False):
    """``(B, N, k*H) -> (s (H,), S (H, H))`` summed over all
    (batch, point, slot) rows. fp32 accumulation either path."""
    if interpret or slot_stats_ok(h_flat, k):
        return _pallas_stats(h_flat, k, interpret)
    return _jnp_stats(h_flat, k)


def _fwd(h_flat, k, interpret):
    return slot_moment_stats(h_flat, k, interpret), h_flat


def _bwd(k, interpret, h_flat, cts):
    ds, dS = cts
    H = ds.shape[0]
    sym = dS + dS.T                                       # d(h^T h) = h(dS+dS^T)
    blk = jnp.kron(jnp.eye(k, dtype=sym.dtype), sym)      # (k*H, k*H)
    hf = h_flat.astype(jnp.float32)
    dh = jnp.matmul(hf, blk, **_F32) + jnp.tile(ds, k)
    return (dh.astype(h_flat.dtype),)


slot_moment_stats.defvjp(_fwd, _bwd)
