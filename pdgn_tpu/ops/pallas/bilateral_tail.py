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

Gradients: a ``custom_vjp`` whose backward is a second Pallas kernel of
the same shape — it re-derives the gate weights and normalised window
features in VMEM from the saved ``inte``/``h`` tiles, walks the
softmax/LeakyReLU/BN-fold chain backwards per tile, and accumulates every
weight gradient (merge, conv_all2, the two BN folds) into revisited VMEM
blocks across the grid. As in the forward, the (B, N, k, 2Fin) gate
tensor exists in neither direction. Off-TPU the backward is the jnp
reference formulation's VJP (same math), so unit tests exercise identical
semantics on CPU and the interpret-mode kernel is checked against it.
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


def _gated_bwd_kernel(k: int, hidden: int, two_fin: int, softmax: bool,
                      inte_ref, h_ref,
                      isc_ref, ish_ref, w2k_ref, w2b_ref, s2_ref, t2_ref,
                      wi_t_ref, w2k_t_ref, dout_ref,
                      dinte_ref, dh_ref, dwi_ref, dbias_ref,
                      disc_ref, dish_ref, dw2k_ref, dw2b_ref,
                      ds2_ref, dt2_ref):
    hk = k // 2
    four_fin = 2 * two_fin
    dt = inte_ref.dtype
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        for r in (dwi_ref, dbias_ref, disc_ref, dish_ref,
                  dw2k_ref, dw2b_ref, ds2_ref, dt2_ref):
            r[...] = jnp.zeros(r.shape, r.dtype)

    # ---- recompute the forward chain (same math as _gated_kernel)
    pres = []
    hats = []   # pre * s2 + t2 (pre-activation of the folded BN)
    u = []
    for j in range(k):
        hj = h_ref[0][:, j * hidden:(j + 1) * hidden]
        pre = _dot(hj, w2k_ref[...]) + w2b_ref[...]
        hat = pre * s2_ref[...] + t2_ref[...]
        pres.append(pre)
        hats.append(hat)
        u.append(_leaky(hat))
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

    dout = dout_ref[0]                                    # (T, 2F) fp32
    dbias_ref[...] = dbias_ref[...] + jnp.sum(dout, axis=0, keepdims=True)
    dg = _dot(dout.astype(dt), wi_t_ref[...])             # (T, hk*4Fin)

    gis = []
    dsc = jnp.zeros((1, four_fin), jnp.float32)
    dsh = jnp.zeros((1, four_fin), jnp.float32)
    dws = []                                              # d_w per slot
    for wp in range(hk):
        iw = inte_ref[0][:, wp * four_fin:(wp + 1) * four_fin]
        iw = iw.astype(jnp.float32)
        pre_i = iw * isc_ref[...] + ish_ref[...]
        mi = jnp.where(pre_i >= 0, 1.0, 0.01)
        gi = jnp.where(pre_i >= 0, pre_i, 0.01 * pre_i)
        wblk = jnp.concatenate([w[2 * wp], w[2 * wp + 1]], axis=-1)
        gis.append((gi * wblk).astype(dt))                # g for d_wi
        dgw = dg[:, wp * four_fin:(wp + 1) * four_fin].astype(jnp.float32)
        dgi = dgw * wblk
        dwblk = dgw * gi
        dws.append(dwblk[:, :two_fin])
        dws.append(dwblk[:, two_fin:])
        dpre_i = dgi * mi
        dinte_ref[0, :, wp * four_fin:(wp + 1) * four_fin] = (
            dpre_i * isc_ref[...]).astype(dt)
        dsc = dsc + jnp.sum(dpre_i * iw, axis=0, keepdims=True)
        dsh = dsh + jnp.sum(dpre_i, axis=0, keepdims=True)
    disc_ref[...] = disc_ref[...] + dsc
    dish_ref[...] = dish_ref[...] + dsh

    g = jnp.concatenate(gis, axis=-1)                     # (T, hk*4Fin)
    dwi_ref[...] = dwi_ref[...] + jax.lax.dot_general(
        g, dout.astype(dt), (((0,), (0,)), ((), ())), **_F32)

    if softmax:
        s = dws[0] * w[0]
        for j in range(1, k):
            s = s + dws[j] * w[j]
        dus = [w[j] * (dws[j] - s) for j in range(k)]
    else:
        dus = dws

    dw2k = jnp.zeros((hidden, two_fin), jnp.float32)
    dw2b = jnp.zeros((1, two_fin), jnp.float32)
    ds2 = jnp.zeros((1, two_fin), jnp.float32)
    dt2 = jnp.zeros((1, two_fin), jnp.float32)
    for j in range(k):
        m2 = jnp.where(hats[j] >= 0, 1.0, 0.01)
        dhat = dus[j] * m2
        ds2 = ds2 + jnp.sum(dhat * pres[j], axis=0, keepdims=True)
        dt2 = dt2 + jnp.sum(dhat, axis=0, keepdims=True)
        dpre = dhat * s2_ref[...]
        dh_ref[0, :, j * hidden:(j + 1) * hidden] = _dot(
            dpre.astype(dt), w2k_t_ref[...]).astype(dt)
        hj = h_ref[0][:, j * hidden:(j + 1) * hidden]
        dw2k = dw2k + jax.lax.dot_general(
            hj, dpre.astype(dt), (((0,), (0,)), ((), ())), **_F32)
        dw2b = dw2b + jnp.sum(dpre, axis=0, keepdims=True)
    dw2k_ref[...] = dw2k_ref[...] + dw2k
    dw2b_ref[...] = dw2b_ref[...] + dw2b
    ds2_ref[...] = ds2_ref[...] + ds2
    dt2_ref[...] = dt2_ref[...] + dt2


def _plain_bwd_kernel(k: int, two_fin: int,
                      inte_ref, isc_ref, ish_ref, wi_t_ref, dout_ref,
                      dinte_ref, dwi_ref, dbias_ref, disc_ref, dish_ref):
    hk = k // 2
    four_fin = 2 * two_fin
    dt = inte_ref.dtype
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        for r in (dwi_ref, dbias_ref, disc_ref, dish_ref):
            r[...] = jnp.zeros(r.shape, r.dtype)

    dout = dout_ref[0]
    dbias_ref[...] = dbias_ref[...] + jnp.sum(dout, axis=0, keepdims=True)
    dg = _dot(dout.astype(dt), wi_t_ref[...])

    gis = []
    dsc = jnp.zeros((1, four_fin), jnp.float32)
    dsh = jnp.zeros((1, four_fin), jnp.float32)
    for wp in range(hk):
        iw = inte_ref[0][:, wp * four_fin:(wp + 1) * four_fin]
        iw = iw.astype(jnp.float32)
        pre_i = iw * isc_ref[...] + ish_ref[...]
        mi = jnp.where(pre_i >= 0, 1.0, 0.01)
        gis.append(jnp.where(pre_i >= 0, pre_i, 0.01 * pre_i).astype(dt))
        dgw = dg[:, wp * four_fin:(wp + 1) * four_fin].astype(jnp.float32)
        dpre_i = dgw * mi
        dinte_ref[0, :, wp * four_fin:(wp + 1) * four_fin] = (
            dpre_i * isc_ref[...]).astype(dt)
        dsc = dsc + jnp.sum(dpre_i * iw, axis=0, keepdims=True)
        dsh = dsh + jnp.sum(dpre_i, axis=0, keepdims=True)
    disc_ref[...] = disc_ref[...] + dsc
    dish_ref[...] = dish_ref[...] + dsh

    g = jnp.concatenate(gis, axis=-1)
    dwi_ref[...] = dwi_ref[...] + jax.lax.dot_general(
        g, dout.astype(dt), (((0,), (0,)), ((), ())), **_F32)


def _bwd_pallas(inte_flat, h_flat, isc, ish, w2k, w2b, s2, t2, wi,
                dout, k, softmax, interpret):
    """Pallas tail backward. Returns cotangents for every _fused operand
    (``d_partial`` is ``dout`` itself and is handled by the caller)."""
    B, N, two_f = dout.shape
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

    def acc_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda b, t, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    row = lambda v: v.reshape(1, -1).astype(jnp.float32)
    tile = lambda lanes: pl.BlockSpec((1, _T, lanes), rowspec,
                                      memory_space=pltpu.VMEM)
    grid = (B, N // _T)
    doutf = dout.astype(jnp.float32)

    if h_flat is not None:
        hidden = h_flat.shape[-1] // k
        outs = pl.pallas_call(
            functools.partial(_gated_bwd_kernel, k, hidden, two_fin,
                              softmax),
            grid=grid,
            in_specs=[tile(hk * four_fin), tile(k * hidden),
                      cspec((1, four_fin)), cspec((1, four_fin)),
                      cspec((hidden, two_fin)), cspec((1, two_fin)),
                      cspec((1, two_fin)), cspec((1, two_fin)),
                      cspec((two_f, hk * four_fin)),
                      cspec((two_fin, hidden)), tile(two_f)],
            out_specs=(tile(hk * four_fin), tile(k * hidden),
                       acc_spec((hk * four_fin, two_f)), acc_spec((1, two_f)),
                       acc_spec((1, four_fin)), acc_spec((1, four_fin)),
                       acc_spec((hidden, two_fin)), acc_spec((1, two_fin)),
                       acc_spec((1, two_fin)), acc_spec((1, two_fin))),
            out_shape=(
                jax.ShapeDtypeStruct((B, N, hk * four_fin), dt),
                jax.ShapeDtypeStruct((B, N, k * hidden), dt),
                jax.ShapeDtypeStruct((hk * four_fin, two_f), jnp.float32),
                jax.ShapeDtypeStruct((1, two_f), jnp.float32),
                jax.ShapeDtypeStruct((1, four_fin), jnp.float32),
                jax.ShapeDtypeStruct((1, four_fin), jnp.float32),
                jax.ShapeDtypeStruct((hidden, two_fin), jnp.float32),
                jax.ShapeDtypeStruct((1, two_fin), jnp.float32),
                jax.ShapeDtypeStruct((1, two_fin), jnp.float32),
                jax.ShapeDtypeStruct((1, two_fin), jnp.float32)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(inte_flat, h_flat.astype(dt),
          row(isc), row(ish), w2k.astype(dt), row(w2b), row(s2), row(t2),
          jnp.swapaxes(wi.astype(dt), 0, 1),
          jnp.swapaxes(w2k.astype(dt), 0, 1), doutf)
        (dinte, dh, dwi, dbias, disc, dish, dw2k, dw2b, ds2, dt2) = outs
        return (dinte, dh.astype(h_flat.dtype), disc, dish,
                dw2k.astype(w2k.dtype), dw2b, ds2, dt2,
                dwi.astype(wi.dtype), dbias)

    outs = pl.pallas_call(
        functools.partial(_plain_bwd_kernel, k, two_fin),
        grid=grid,
        in_specs=[tile(hk * four_fin),
                  cspec((1, four_fin)), cspec((1, four_fin)),
                  cspec((two_f, hk * four_fin)), tile(two_f)],
        out_specs=(tile(hk * four_fin),
                   acc_spec((hk * four_fin, two_f)), acc_spec((1, two_f)),
                   acc_spec((1, four_fin)), acc_spec((1, four_fin))),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, hk * four_fin), dt),
            jax.ShapeDtypeStruct((hk * four_fin, two_f), jnp.float32),
            jax.ShapeDtypeStruct((1, two_f), jnp.float32),
            jax.ShapeDtypeStruct((1, four_fin), jnp.float32),
            jax.ShapeDtypeStruct((1, four_fin), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(inte_flat, row(isc), row(ish),
      jnp.swapaxes(wi.astype(dt), 0, 1), doutf)
    dinte, dwi, dbias, disc, dish = outs
    return (dinte, None, disc, dish, None, None, None, None,
            dwi.astype(wi.dtype), dbias)


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
    if not (interpret or tail_fusion_ok(partial, k)):
        _, vjp = jax.vjp(
            lambda *args: _reference(*args, k, softmax), partial, inte_flat,
            h_flat, isc, ish, w2k, w2b, s2, t2, wi, bias)
        return vjp(g)
    (dinte, dh, disc, dish, dw2k, dw2b, ds2, dt2, dwi, dbias) = _bwd_pallas(
        inte_flat, h_flat, isc, ish, w2k, w2b, s2, t2, wi, g,
        k, softmax, interpret)
    d_partial = g.astype(partial.dtype)
    if h_flat is None:
        return (d_partial, dinte, None,
                disc.reshape(isc.shape), dish.reshape(ish.shape),
                jnp.zeros_like(w2k), jnp.zeros_like(w2b),
                jnp.zeros_like(s2), jnp.zeros_like(t2),
                dwi, dbias.reshape(bias.shape).astype(bias.dtype))
    return (d_partial, dinte, dh,
            disc.reshape(isc.shape), dish.reshape(ish.shape),
            dw2k, dw2b.reshape(w2b.shape), ds2.reshape(s2.shape),
            dt2.reshape(t2.shape),
            dwi, dbias.reshape(bias.shape).astype(bias.dtype))


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
      h: ``(B, N, k, H)`` (or pre-flattened ``(B, N, k*H)``) weight-net
        hidden activation, or ``None`` for the non-bilateral (ungated)
        stage.
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

    # h may arrive pre-flattened (B, N, k*H) — the generator computes it
    # lane-flat so no (B, N, k, H) relayout ever materialises
    h_flat = None if h is None else (
        h if h.ndim == 3 else h.reshape(B, N, k * h.shape[-1]))
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
