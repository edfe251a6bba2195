"""Fused gated-merge Pallas TPU kernel for the bilateral edge conv.

The bilateral upsample block (reference models/PDGNet_v2.py:590-650) ends
with ``merge = conv2dbr([e | inte*w])`` — in the decomposed TPU form
(pdgn_tpu.models.generator._merge_gemm):

    y = x @ A  +  Σ_s nbr[s] @ We_n[s]  +  Σ_s (inte*w)[s] @ Wi[s]  + bias

where ``inte`` is the *interleaved* window-conv output. XLA materialises
three full-size (B, N, k, 2Fin) HBM tensors for this: the interleave
permutation of the conv output, the softmax gate ``w`` and the product
``inte*w`` — pure HBM traffic that dominates the sampler's non-MXU time.

This kernel reads the raw conv output ``(B, N, k/2, 4Fin)`` (never
interleaved in HBM), the gate ``w`` in its natural slot layout, and
performs the interleave permutation on the VMEM tile
(``w_conv[wp, c*2+j] = w[j*hk+wp, c]`` — a register shuffle, not an HBM
round trip), the gating multiply and all three contractions in one pass.

Gradients: :func:`fused_gated_merge` carries a custom VJP whose backward
is the jnp reference formulation's VJP — the kernel is exact (fp32 MXU
accumulation), so forward/backward stay consistent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_T = 128  # point rows per grid step


def _interleave_lanes(w0: jnp.ndarray, w1: jnp.ndarray) -> jnp.ndarray:
    """``(T, C), (T, C) -> (T, 2C)`` with even lanes from w0, odd from w1.

    Mosaic only supports the stack+reshape minor-dim insertion for 32-bit
    element types, so 16-bit inputs take a round trip through fp32 (a VMEM
    relayout — still no HBM traffic).
    """
    T, C = w0.shape
    if w0.dtype.itemsize < 4:
        dt = w0.dtype
        w32 = jnp.stack([w0.astype(jnp.float32), w1.astype(jnp.float32)],
                        axis=-1).reshape(T, 2 * C)
        return w32.astype(dt)
    return jnp.stack([w0, w1], axis=-1).reshape(T, 2 * C)


def _kernel(k: int, out_dtype,
            x_ref, nbr_ref, conv_ref, w_ref,
            a_ref, wen_ref, wip_ref, bias_ref, out_ref):
    hk = k // 2
    x = x_ref[0]                                     # (T, C)
    acc = jax.lax.dot_general(
        x, a_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (T, 2F)
    for s in range(k):
        acc = acc + jax.lax.dot_general(
            nbr_ref[0][:, s, :], wen_ref[s],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    for wp in range(hk):
        w_il = _interleave_lanes(w_ref[0][:, wp, :], w_ref[0][:, hk + wp, :])
        gated = conv_ref[0][:, wp, :] * w_il         # (T, 4C)
        acc = acc + jax.lax.dot_general(
            gated, wip_ref[wp], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    out_ref[0] = (acc + bias_ref[0]).astype(out_dtype)


def _permute_wi(wi: jnp.ndarray, hk: int) -> jnp.ndarray:
    """Reference slot-layout ``(k, 2C, 2F)`` -> conv-layout ``(hk, 4C, 2F)``.

    ``wi_perm[wp, c*2+j] = wi[j*hk+wp, c]`` — matches the interleave index
    semantics of generator._interleave_halves (models/PDGNet_v2.py:574-578).
    """
    k, two_c, two_f = wi.shape
    w = wi.reshape(2, hk, two_c, two_f).transpose(1, 2, 0, 3)
    return w.reshape(hk, 2 * two_c, two_f)


def _reference(x, nbr, conv, w, a_mat, we_n, wi_perm, bias):
    """jnp formulation (used for the VJP and as the non-TPU fallback)."""
    B, N, k, C = nbr.shape
    hk = k // 2
    y = jnp.matmul(x, a_mat, preferred_element_type=jnp.float32)
    y = y + jnp.einsum("bnkc,kcf->bnf", nbr, we_n,
                       preferred_element_type=jnp.float32)
    # w (slot layout) -> conv layout: w_conv[.., wp, c*2+j] = w[.., j*hk+wp, c]
    two_c = w.shape[-1]
    w_conv = w.reshape(B, N, 2, hk, two_c).transpose(0, 1, 3, 4, 2)
    w_conv = w_conv.reshape(B, N, hk, 2 * two_c)
    y = y + jnp.einsum("bnwc,wcf->bnf", conv * w_conv, wi_perm,
                       preferred_element_type=jnp.float32)
    return (y + bias).astype(x.dtype)


def _pallas_forward(x, nbr, conv, w, a_mat, we_n, wi_perm, bias, interpret):
    B, N, C = x.shape
    k = nbr.shape[2]
    hk = k // 2
    two_f = a_mat.shape[-1]
    out = pl.pallas_call(
        functools.partial(_kernel, k, x.dtype),
        grid=(B, N // _T),
        in_specs=[
            pl.BlockSpec((1, _T, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _T, k, C), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _T, hk, 4 * C), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _T, k, 2 * C), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, two_f), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, C, two_f), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hk, 4 * C, two_f), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, two_f), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _T, two_f), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, two_f), x.dtype),
        interpret=interpret,
    )(x, nbr, conv, w, a_mat, we_n, wi_perm, bias[None])
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _fused(x, nbr, conv, w, a_mat, we_n, wi_perm, bias, interpret):
    return _pallas_forward(x, nbr, conv, w, a_mat, we_n, wi_perm, bias,
                           interpret)


def _fused_fwd(x, nbr, conv, w, a_mat, we_n, wi_perm, bias, interpret):
    out = _pallas_forward(x, nbr, conv, w, a_mat, we_n, wi_perm, bias,
                          interpret)
    return out, (x, nbr, conv, w, a_mat, we_n, wi_perm, bias)


def _fused_bwd(interpret, res, g):
    _, vjp = jax.vjp(_reference, *res)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_gated_merge(x, nbr, conv, w, wi_slot, a_mat, we_n, bias, *,
                      interpret: bool = False):
    """One-pass gated merge: ``x@A + Σ nbr@We_n + Σ (interleave(conv)*w)@Wi``.

    Args:
      x: ``(B, N, C)`` point features.
      nbr: ``(B, N, k, C)`` gathered neighbours.
      conv: ``(B, N, k/2, 4C')`` raw window-conv output (pre-interleave).
      w: ``(B, N, k, 2C')`` softmax gate in slot layout.
      wi_slot: ``(k, 2C', 2F)`` merge weight for the inte half (slot layout).
      a_mat: ``(C, 2F)`` folded central weight.
      we_n: ``(k, C, 2F)`` neighbour-half weight.
      bias: ``(2F,)``.

    Returns:
      ``(B, N, 2F)`` in ``x.dtype``.
    """
    hk = nbr.shape[2] // 2
    wi_perm = _permute_wi(wi_slot, hk)
    dt = x.dtype
    args = (x, nbr.astype(dt), conv.astype(dt), w.astype(dt),
            a_mat.astype(dt), we_n.astype(dt), wi_perm.astype(dt),
            bias.astype(jnp.float32))
    return _fused(*args, interpret)


def fused_gated_merge_ok(x, k: int) -> bool:
    """Kernel applies: TPU backend, 128-multiple N."""
    import os

    if os.environ.get("PDGN_DISABLE_PALLAS"):
        return False
    if x.shape[1] % _T or k % 2:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
