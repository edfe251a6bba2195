"""Fused edge-conv tail Pallas TPU kernel (the sampler's hot path).

One bilateral upsample stage (reference ``bilateral_upsample_edgeConv``,
models/PDGNet_v2.py:590-650) ends with:

    inte = LeakyReLU(BN(window_conv))           # (B, N, k/2, 4Fin) block
    w    = softmax_k(LeakyReLU(BN(conv_all2(h))))
    y    = merge_conv([e | inte * w])           # -> (B, N, 2F)

XLA executes this as ~8 HBM round trips over (B, N, k, 2Fin)-sized
tensors (normalise inte, the conv_all2 GEMM output, its BN stats pass,
softmax passes, the gating product, and the merge reads) — pure bandwidth
that dominates the generator forward. This kernel performs the whole tail
in one pass per (batch, point-tile) grid step:

* the merge conv's central + neighbour contractions arrive as a
  precomputed fp32 ``partial`` from the head kernel
  (ops/pallas/edge_head.py), so the (B, N, k, C) neighbour tensor never
  exists in HBM;
* the conv_all2 GEMM runs on the (tiny, 64-channel) ``h`` activation in
  VMEM — the (B, N, k, 2Fin) gate tensor never exists in HBM either. Its
  batch-norm statistics are supplied by the caller, computed EXACTLY from
  the second-moment matrix of ``h`` (see generator._linear_bn_stats): for
  a linear layer y = h @ W + b, E[y_c] = m·W_c + b_c and
  E[y_c^2] = W_c^T S W_c + 2 b_c (m·W_c) + b_c^2 with S = E[h h^T] —
  a (64, 64) contraction instead of a full-tensor stats pass;
* the window-conv batch norm is folded to a per-channel scale/shift
  (statistics accumulated inside the head kernel — no stats pass at all);
* softmax over the k neighbour slots, the gating multiply and the gated
  merge contraction happen on VMEM tiles, accumulating in fp32 on the
  MXU.

All neighbour-structured operands are lane-flattened (``(B, N, k*H)``
etc.) so every in-kernel slot access is a cheap lane slice — no Mosaic
relayouts.

HBM traffic per stage: read partial, inte, h once; write y once.

Gradients: a ``custom_vjp`` whose backward is the jnp reference
formulation's VJP (same math; the kernel is a fusion, not an
approximation). The reference path is also the non-TPU fallback, so unit
tests exercise identical code on CPU.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_T = 128  # point rows per grid step

_F32 = dict(preferred_element_type=jnp.float32)


def _leaky(x, slope=0.01):
    return jnp.where(x >= 0, x, slope * x)


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())), **_F32)


# ----------------------------------------------------------------- kernels
def _gated_kernel(k: int, hidden: int, two_fin: int, softmax: bool,
                  out_dtype,
                  partial_ref, inte_ref, h_ref,
                  isc_ref, ish_ref, w2k_ref, w2b_ref, s2_ref, t2_ref,
                  wi_ref, bias_ref, out_ref):
    hk = k // 2
    four_fin = 2 * two_fin
    dt = inte_ref.dtype

    # weight net tail: conv_all2 GEMM + folded BN + LeakyReLU (+ softmax
    # over the k neighbour slots). Slot order is the generator's
    # (window, j) layout, so consecutive slot pairs form the block
    # channels of the window-conv output.
    u = []
    for j in range(k):
        hj = h_ref[0][:, j * hidden:(j + 1) * hidden]
        pre = _dot(hj, w2k_ref[...]) + w2b_ref[...]
        u.append(_leaky(pre * s2_ref[...] + t2_ref[...]))
    if softmax:
        m = u[0]
        for j in range(1, k):
            m = jnp.maximum(m, u[j])
        e = [jnp.exp(uj - m) for uj in u]
        z = e[0]
        for j in range(1, k):
            z = z + e[j]
        inv = 1.0 / z
        w = [ej * inv for ej in e]
    else:
        w = u

    gparts = []
    for wp in range(hk):
        gi = inte_ref[0][:, wp * four_fin:(wp + 1) * four_fin]
        gi = gi.astype(jnp.float32)
        gi = _leaky(gi * isc_ref[...] + ish_ref[...]).astype(dt)
        wblk = jnp.concatenate([w[2 * wp], w[2 * wp + 1]], axis=-1)
        gparts.append(gi * wblk.astype(dt))
    g = jnp.concatenate(gparts, axis=-1)                 # (T, hk*4Fin)
    acc = partial_ref[0] + _dot(g, wi_ref[...])
    out_ref[0] = (acc + bias_ref[...]).astype(out_dtype)


def _plain_kernel(k: int, two_fin: int, out_dtype,
                  partial_ref, inte_ref,
                  isc_ref, ish_ref,
                  wi_ref, bias_ref, out_ref):
    hk = k // 2
    four_fin = 2 * two_fin
    dt = inte_ref.dtype

    gparts = []
    for wp in range(hk):
        gi = inte_ref[0][:, wp * four_fin:(wp + 1) * four_fin]
        gi = gi.astype(jnp.float32)
        gparts.append(_leaky(gi * isc_ref[...] + ish_ref[...]).astype(dt))
    g = jnp.concatenate(gparts, axis=-1)
    acc = partial_ref[0] + _dot(g, wi_ref[...])
    out_ref[0] = (acc + bias_ref[...]).astype(out_dtype)


# ------------------------------------------------------------ jnp reference
def _reference(partial, inte_flat, h_flat,
               isc, ish, w2k, w2b, s2, t2,
               wi, bias, k: int, softmax: bool):
    """Identical math in jnp — the VJP body and the non-TPU fallback.

    Operands are lane-flattened exactly as the kernel sees them:
    ``inte_flat (B,N,hk*4Fin)``, ``h_flat (B,N,k*H)``.
    """
    B, N, _ = partial.shape
    hk = k // 2
    four_fin = inte_flat.shape[-1] // hk
    dt = inte_flat.dtype

    inte = inte_flat.reshape(B, N, hk, four_fin)
    gi = _leaky(inte.astype(jnp.float32) * isc + ish).astype(dt)
    if h_flat is not None:
        hidden = h_flat.shape[-1] // k
        h = h_flat.reshape(B, N, k, hidden)
        pre = jnp.matmul(h, w2k, **_F32) + w2b           # (B,N,k,2Fin) fp32
        u = _leaky(pre * s2 + t2)
        if softmax:
            u = jax.nn.softmax(u, axis=2)
        # slot pairs (2wp, 2wp+1) -> block channels (contiguous reshape)
        w = u.reshape(B, N, hk, four_fin).astype(dt)
        gi = gi * w
    acc = partial + jnp.matmul(
        gi.reshape(B, N, hk * four_fin), wi, **_F32)
    return (acc + bias).astype(dt)


# ----------------------------------------------------------------- dispatch
def _pallas_tail(partial, inte_flat, h_flat, isc, ish, w2k, w2b, s2, t2,
                 wi, bias, k, softmax, interpret):
    B, N, two_f = partial.shape
    hk = k // 2
    four_fin = inte_flat.shape[-1] // hk
    two_fin = four_fin // 2
    dt = inte_flat.dtype

    def cspec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda b, t, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    def rowspec(b, t):
        return (b, t, 0)

    row = lambda v: v.reshape(1, -1).astype(jnp.float32)

    common_specs = [
        pl.BlockSpec((1, _T, two_f), rowspec, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, _T, hk * four_fin), rowspec,
                     memory_space=pltpu.VMEM),
    ]
    tail_specs = [cspec((1, four_fin)), cspec((1, four_fin))]  # isc, ish
    merge_specs = [
        cspec((hk * four_fin, two_f)), cspec((1, two_f)),
    ]
    out_spec = pl.BlockSpec((1, _T, two_f), rowspec, memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, N, two_f), dt)
    grid = (B, N // _T)

    merge_args = (wi.astype(dt), row(bias))
    if h_flat is not None:
        hidden = h_flat.shape[-1] // k
        gate_specs = [
            pl.BlockSpec((1, _T, k * hidden), rowspec,
                         memory_space=pltpu.VMEM),
        ]
        w2_specs = [
            cspec((hidden, two_fin)), cspec((1, two_fin)),
            cspec((1, two_fin)), cspec((1, two_fin)),
        ]
        return pl.pallas_call(
            functools.partial(_gated_kernel, k, hidden, two_fin, softmax,
                              dt),
            grid=grid,
            in_specs=common_specs + gate_specs + tail_specs + w2_specs
            + merge_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
            interpret=interpret,
        )(partial, inte_flat, h_flat.astype(dt),
          row(isc), row(ish),
          w2k.astype(dt), row(w2b), row(s2), row(t2),
          *merge_args)
    return pl.pallas_call(
        functools.partial(_plain_kernel, k, two_fin, dt),
        grid=grid,
        in_specs=common_specs + tail_specs + merge_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(partial, inte_flat, row(isc), row(ish), *merge_args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13))
def _fused(partial, inte_flat, h_flat, isc, ish, w2k, w2b, s2, t2,
           wi, bias, k, softmax, interpret):
    return _pallas_tail(partial, inte_flat, h_flat, isc, ish,
                        w2k, w2b, s2, t2, wi, bias, k, softmax, interpret)


def _fused_fwd(partial, inte_flat, h_flat, isc, ish, w2k, w2b, s2, t2,
               wi, bias, k, softmax, interpret):
    out = _pallas_tail(partial, inte_flat, h_flat, isc, ish,
                       w2k, w2b, s2, t2, wi, bias, k, softmax, interpret)
    return out, (partial, inte_flat, h_flat, isc, ish, w2k, w2b, s2, t2,
                 wi, bias)


def _fused_bwd(k, softmax, interpret, res, g):
    (partial, inte_flat, h_flat, isc, ish, w2k, w2b, s2, t2,
     wi, bias) = res
    _, vjp = jax.vjp(
        lambda *args: _reference(*args, k, softmax), partial, inte_flat,
        h_flat, isc, ish, w2k, w2b, s2, t2, wi, bias)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def tail_fusion_ok(x, k: int) -> bool:
    """Kernel applies: TPU backend, 128-multiple N, even k."""
    import os

    if os.environ.get("PDGN_DISABLE_PALLAS"):
        return False
    if x.shape[1] % _T or k % 2:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def edge_conv_tail(
    partial: jnp.ndarray,
    inte_raw: jnp.ndarray,
    h: Optional[jnp.ndarray],
    inte_stats: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray],
    w2_params: Optional[Tuple[jnp.ndarray, jnp.ndarray]],
    w2_stats: Optional[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                             jnp.ndarray]],
    merge_kernel: jnp.ndarray,
    merge_bias: jnp.ndarray,
    k: int,
    *,
    epsilon: float = 1e-5,
    softmax: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """The fused stage tail: normalise + gate + merge in one pass.

    Args:
      partial: ``(B, N, 2F)`` fp32 — ``x @ A_merge + nbr_flat @ We_n``
        from the head kernel.
      inte_raw: ``(B, N, (k/2)*4Fin)`` raw window-conv output (lane-flat
        block channel order, conv bias included, no BN/activation).
      h: ``(B, N, k, H)`` weight-net hidden activation, or ``None`` for
        the non-bilateral (ungated) stage.
      inte_stats: ``(mean, var, scale, bias)`` of the window-conv BN,
        each ``(4Fin,)`` fp32.
      w2_params: ``(kernel (H, 2Fin), bias (2Fin,))`` of conv_all2.
      w2_stats: ``(mean, var, scale, bias)`` of bn_all2 (from the
        second-moment identity — see generator._linear_bn_stats).
      merge_kernel: ``(2k*2Fin, 2F)`` merge weight in the reference slot
        layout; the inte half is split/permuted here (param-side, free).
      merge_bias: ``(2F,)``.
      k: neighbour count (even).

    Returns:
      ``(B, N, 2F)`` in ``inte_raw.dtype``.
    """
    B, N, _ = partial.shape
    hk = k // 2
    four_fin = inte_raw.shape[-1] // hk
    two_fin = four_fin // 2
    two_f = merge_kernel.shape[-1]
    kr = merge_kernel.reshape(2 * k, two_fin, two_f)
    # inte half -> block conv layout: wi_blk[wp, j*2Fin+c] = wi[j*hk+wp, c]
    wi = kr[k:].reshape(2, hk, two_fin, two_f).transpose(1, 0, 2, 3)
    wi = wi.reshape(hk * four_fin, two_f)

    i_mean, i_var, i_scale, i_bias = [v.astype(jnp.float32)
                                      for v in inte_stats]
    isc = i_scale * jax.lax.rsqrt(i_var + epsilon)
    ish = i_bias - i_mean * isc

    h_flat = None if h is None else h.reshape(B, N, k * h.shape[-1])
    if h is not None:
        w2k, w2b = w2_params
        m2, v2, sc2, b2 = [v.astype(jnp.float32) for v in w2_stats]
        s2 = sc2 * jax.lax.rsqrt(v2 + epsilon)
        t2 = b2 - m2 * s2
    else:
        # placeholders keep the custom_vjp signature static
        w2k = jnp.zeros((1, 1), jnp.float32)
        w2b = jnp.zeros((1,), jnp.float32)
        s2 = jnp.zeros((1,), jnp.float32)
        t2 = jnp.zeros((1,), jnp.float32)

    if tail_fusion_ok(partial, k) or interpret:
        return _fused(partial, inte_raw, h_flat, isc, ish,
                      w2k, w2b, s2, t2, wi, merge_bias,
                      k, softmax, interpret)
    dt = inte_raw.dtype
    return _reference(partial, inte_raw,
                      None if h_flat is None else h_flat.astype(dt),
                      isc, ish, w2k.astype(dt), w2b, s2, t2,
                      wi.astype(dt), merge_bias, k, softmax)
