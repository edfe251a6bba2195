"""Fused edge-conv head Pallas TPU kernel: kNN + gathers + window conv.

The head of every generator stage (reference ``get_edge_features`` /
``get_edge_features_xyz`` + ``inte_conv_hk``, models/PDGNet_v2.py:439-528,
561-578) is, in XLA form: a Pallas kNN, HBM gathers of the (B, N, k, C)
neighbour tensor and the (B, N, k, 32) weight-net projections, five
layout copies between the gather/conv/merge layouts, the window
convolution and two full-tensor batch-norm stats passes — almost all of
it HBM-bandwidth-bound data formatting.

This kernel does the whole head in VMEM per (batch, point-tile) grid
step, with the full per-sample feature matrix resident:

* distances on the MXU, then a packed-key top-k: the (bf16-rounded)
  distance occupies the high 16 bits of an int32 key and the lane index
  the low 16, so ascending-distance lowest-index-first extraction
  (the reference tie-break, knnquery_cuda_kernel.cu) is a plain integer
  min + compare per neighbour. Distances already come from a
  default-precision (bf16) MXU matmul, so key packing does not change
  the selection regime (``PDGN_EXACT_KNN=1`` routes around this kernel
  entirely for fp32-exact graphs);
* the ``key == min`` mask IS the one-hot gather matrix: each neighbour
  row costs one (T, N) x (N, C) MXU matmul and no HBM traffic (fp32
  inputs use a bf16 hi/lo split — ~2^-16-exact; bf16 inputs are
  gathered exactly);
* the window convolution computes as k/2 patch GEMMs and writes its
  output directly in the lane-flat (B, N, hk*4Fin) block layout the
  fused tail kernel (bilateral_tail.py) consumes — no interleave, no
  relayout;
* the merge conv's central + neighbour contractions
  (``x @ A + nbr_flat @ We_n``) are folded in as a running fp32 partial,
  so the neighbour tensor never exists in HBM at all;
* for bilateral stages, the weight-net front also rides the one-hot
  masks: the 32-channel projections gather per slot (in the generator's
  (window, j) slot order, so the index permutation costs nothing),
  the central terms are added, and the two 16-channel pre-activations
  are written lane-flat;
* every batch-norm statistic (window conv, weight-net fea/xyz) is
  accumulated across the sequential grid into revisited VMEM blocks —
  the separate full-tensor stats passes disappear.

Gradients: ``custom_vjp`` treating the kNN indices as constants (as the
reference does — the graph is not differentiated). On TPU the backward is
a second Pallas kernel of the same tiling: it rebuilds the one-hot masks
from the saved indices, pushes the merge/window-conv/weight-net cotangents
through per-tile MXU GEMMs with bf16 operands (the same rounding XLA's
default-precision backward applies to fp32 matmuls), performs the
neighbour scatter as transposed one-hot matmuls into a per-sample VMEM
accumulator, and accumulates every weight gradient across the grid — the
(B, N, k, C) neighbour tensor exists in neither direction. Off-TPU the
backward is the jnp reference composition's VJP.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_T = 128          # query rows per grid step
_PROJ = 32        # weight-net projection channels (16 fea + 16 xyz)

_F32 = dict(preferred_element_type=jnp.float32)


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())), **_F32)


def _head_kernel(k: int, window: int, exact_gather: bool, gated: bool, dt,
                 *refs):
    if gated:
        (q_ref, xt_ref, qsq_ref, dbsq_ref, db_hi_ref, db_lo_ref,
         pcat_hi_ref, pcat_lo_ref, ppoint_ref,
         wn_ref, ca_ref, pb_ref, pbm_ref, am_ref, wen_ref,
         idx_ref, inte_ref, partial_ref, stats_ref,
         wfea_ref, wxyz_ref, wstats_ref) = refs
    else:
        (q_ref, xt_ref, qsq_ref, dbsq_ref, db_hi_ref, db_lo_ref,
         wn_ref, ca_ref, pb_ref, pbm_ref, am_ref, wen_ref,
         idx_ref, inte_ref, partial_ref, stats_ref) = refs

    T = q_ref.shape[1]
    N = xt_ref.shape[2]
    hk = k // 2
    four_fin = ca_ref.shape[1]

    b = pl.program_id(0)
    t = pl.program_id(1)
    first = jnp.logical_and(b == 0, t == 0)

    prod = jax.lax.dot_general(
        q_ref[0], xt_ref[0], (((1,), (0,)), ((), ())), **_F32)
    d = qsq_ref[0] + dbsq_ref[0] - 2.0 * prod            # (T, N) fp32
    # packed sort key: bf16-rounded non-negative distance in the high 16
    # bits (monotone as an int for d >= 0), lane index in the low 16
    d = jnp.maximum(d, 0.0).astype(jnp.bfloat16).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (T, N), 1)
    key = jax.lax.bitcast_convert_type(d, jnp.int32) | lane

    db_hi = db_hi_ref[0]                                 # (N, C) bf16
    imax = jnp.int32(0x7FFFFFFF)
    idx_cols = []
    masks = []
    for j in range(k + 1):
        m = jnp.min(key, axis=1, keepdims=True)          # (T, 1)
        msk = key == m
        if j > 0:  # slot 0 is the query itself — dropped
            idx_cols.append(m & 0xFFFF)                  # (T, 1)
            masks.append(msk)
        key = jnp.where(msk, imax, key)
    idx_ref[0] = jnp.concatenate(idx_cols, axis=-1)      # (T, k)

    nbrs = []
    ohs = []
    for j in range(k):
        oh = masks[j].astype(jnp.bfloat16)
        ohs.append(oh)
        row = _dot(oh, db_hi)
        if exact_gather:
            row = row + _dot(oh, db_lo_ref[0])
        nbrs.append(row.astype(dt))                      # (T, C)

    x_dt = q_ref[0].astype(dt)
    nbr_flat = jnp.concatenate(nbrs, axis=-1)            # (T, k*C)
    partial_ref[0] = (_dot(x_dt, am_ref[...]) + _dot(nbr_flat, wen_ref[...])
                      + pbm_ref[0])

    point = _dot(x_dt, ca_ref[...]) + pb_ref[0]          # (T, 4Fin) fp32
    ssum = jnp.zeros((1, four_fin), jnp.float32)
    ssq = jnp.zeros((1, four_fin), jnp.float32)
    for wp in range(hk):
        patch = jnp.concatenate(nbrs[wp:wp + window], axis=-1)
        y = _dot(patch, wn_ref[...]) + point             # fp32
        yc = y.astype(dt)
        inte_ref[0, :, wp * four_fin:(wp + 1) * four_fin] = yc
        yf = yc.astype(jnp.float32)
        ssum = ssum + jnp.sum(yf, axis=0, keepdims=True)
        ssq = ssq + jnp.sum(yf * yf, axis=0, keepdims=True)

    @pl.when(first)
    def _():
        stats_ref[...] = jnp.zeros_like(stats_ref)

    stats_ref[0:1, :] = stats_ref[0:1, :] + ssum
    stats_ref[1:2, :] = stats_ref[1:2, :] + ssq

    if gated:
        # weight-net front: gather the 32-channel projections per slot
        # (slot s'' reads extraction index (s''%2)*hk + s''//2 — the
        # generator's (window, j) order), add the central terms, write
        # both 16-channel halves lane-flat and accumulate their stats
        pcat_hi = pcat_hi_ref[0]                         # (N, 32)
        ppoint = ppoint_ref[0].astype(jnp.float32)       # (T, 32)
        half = _PROJ // 2
        wsums = []
        wsqs = []
        for s in range(k):
            j = (s % 2) * hk + s // 2
            prow = _dot(ohs[j], pcat_hi)
            if exact_gather:
                prow = prow + _dot(ohs[j], pcat_lo_ref[0])
            wrow = (prow + ppoint).astype(dt)            # (T, 32)
            wfea_ref[0, :, s * half:(s + 1) * half] = wrow[:, :half]
            wxyz_ref[0, :, s * half:(s + 1) * half] = wrow[:, half:]
            wf = wrow.astype(jnp.float32)
            wsums.append(jnp.sum(wf, axis=0, keepdims=True))
            wsqs.append(jnp.sum(wf * wf, axis=0, keepdims=True))
        wsum = jnp.concatenate(wsums, axis=-1)           # (1, k*32)
        wsq = jnp.concatenate(wsqs, axis=-1)

        @pl.when(first)
        def _():
            wstats_ref[...] = jnp.zeros_like(wstats_ref)

        wstats_ref[0:1, :] = wstats_ref[0:1, :] + wsum
        wstats_ref[1:2, :] = wstats_ref[1:2, :] + wsq


def _dot_t(a, b):
    """Contract the leading axis: ``(T, N)^T @ (T, F) -> (N, F)``."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())), **_F32)


# GEMM-operand dtype for the backward kernel. bf16 matches the rounding
# XLA's default TPU precision applies to fp32 matmuls (which is what the
# jnp reference VJP gets); tests flip it to fp32 to check the kernel's
# math is exact modulo that rounding.
_BWD_MM_DTYPE = jnp.bfloat16


def _bf(x):
    return x.astype(_BWD_MM_DTYPE)


def _head_bwd_kernel(k: int, window: int, gated: bool, *refs):
    if gated:
        (x_ref, db_ref, idx_ref, inte_ref, dinte_ref, dpart_ref,
         dstats_ref, wnt_ref, went_ref, cat_ref, amt_ref,
         pcat_ref, ppoint_ref, dwfea_ref, dwxyz_ref, dwstats_ref,
         dxc_ref, dxn_ref, dwn_ref, dca_ref, dpb_ref, dpbm_ref, dam_ref,
         dwen_ref, dpc_ref, dpp_ref) = refs
    else:
        (x_ref, db_ref, idx_ref, inte_ref, dinte_ref, dpart_ref,
         dstats_ref, wnt_ref, went_ref, cat_ref, amt_ref,
         dxc_ref, dxn_ref, dwn_ref, dca_ref, dpb_ref, dpbm_ref, dam_ref,
         dwen_ref) = refs

    T = x_ref.shape[1]
    N = db_ref.shape[1]
    C = x_ref.shape[2]
    hk = k // 2
    four_fin = cat_ref.shape[0]
    two_f = amt_ref.shape[0]
    b = pl.program_id(0)
    t = pl.program_id(1)
    first = jnp.logical_and(b == 0, t == 0)

    @pl.when(first)
    def _():
        for r in (dwn_ref, dca_ref, dam_ref, dwen_ref):
            r[...] = jnp.zeros(r.shape, r.dtype)

    @pl.when(t == 0)
    def _():
        dxn_ref[...] = jnp.zeros(dxn_ref.shape, dxn_ref.dtype)
        dpb_ref[...] = jnp.zeros(dpb_ref.shape, dpb_ref.dtype)
        dpbm_ref[...] = jnp.zeros(dpbm_ref.shape, dpbm_ref.dtype)
        if gated:
            dpc_ref[...] = jnp.zeros(dpc_ref.shape, dpc_ref.dtype)

    lane = jax.lax.broadcasted_iota(jnp.int32, (T, N), 1)
    ohs = []
    nbrs = []
    db = db_ref[0]                                        # (N, C) bf16
    for j in range(k):
        oh = (lane == idx_ref[0][:, j:j + 1]).astype(_BWD_MM_DTYPE)
        ohs.append(oh)
        nbrs.append(_bf(_dot(oh, db)))                    # (T, C) bf16

    dpart = dpart_ref[0]                                  # (T, 2F) fp32
    dpart_b = _bf(dpart)
    x_b = _bf(x_ref[0])

    # ---- window-conv chain: d_y per window (stats cotangent folded in)
    ds0 = dstats_ref[0:1, :]                              # (1, 4Fin)
    ds1 = dstats_ref[1:2, :]
    dys = []
    d_point = jnp.zeros((T, four_fin), jnp.float32)
    for wp in range(hk):
        y = inte_ref[0][:, wp * four_fin:(wp + 1) * four_fin]
        y = y.astype(jnp.float32)
        dy = (dinte_ref[0][:, wp * four_fin:(wp + 1) * four_fin]
              + ds0 + 2.0 * y * ds1)
        dys.append(dy)
        d_point = d_point + dy

    dpb_ref[0] = dpb_ref[0] + jnp.sum(d_point, axis=0, keepdims=True)
    dpbm_ref[0] = dpbm_ref[0] + jnp.sum(dpart, axis=0, keepdims=True)
    d_point_b = _bf(d_point)
    dca_ref[...] = dca_ref[...] + _dot_t(x_b, d_point_b)
    dam_ref[...] = dam_ref[...] + _dot_t(x_b, dpart_b)
    dxc_ref[0] = _dot(d_point_b, cat_ref[...]) + _dot(dpart_b, amt_ref[...])

    # d_patch per window + window-kernel gradient
    dpatches = []
    dwn = jnp.zeros(dwn_ref.shape, jnp.float32)
    for wp in range(hk):
        dy_b = _bf(dys[wp])
        dpatches.append(_dot(dy_b, wnt_ref[...]))         # (T, window*C)
        patch = jnp.concatenate(nbrs[wp:wp + window], axis=-1)
        dwn = dwn + _dot_t(patch, dy_b)
    dwn_ref[...] = dwn_ref[...] + dwn

    # ---- per-slot neighbour cotangents -> scatter + merge-weight grads
    dxn = jnp.zeros((N, C), jnp.float32)
    for j in range(k):
        dnbr = _dot(dpart_b, went_ref[j * two_f:(j + 1) * two_f, :])
        for wp in range(max(0, j - window + 1), min(hk, j + 1)):
            dnbr = dnbr + dpatches[wp][:, (j - wp) * C:(j - wp + 1) * C]
        dxn = dxn + _dot_t(ohs[j], _bf(dnbr))
        dwen_ref[j * C:(j + 1) * C, :] = (
            dwen_ref[j * C:(j + 1) * C, :] + _dot_t(nbrs[j], dpart_b))
    dxn_ref[0] = dxn_ref[0] + dxn

    if gated:
        half = _PROJ // 2
        pdb = pcat_ref[0]                                 # (N, 32) bf16
        ppoint = ppoint_ref[0].astype(jnp.float32)
        # build the full lane-flat wrow / cotangent rows first and slice
        # afterwards: broadcasting a lane-SLICED (1, 32) vector against a
        # (T, 32) tile is not Mosaic-lowerable, a full-width (1, k*32)
        # row broadcast is
        wrows = []
        base = []
        for s in range(k):
            j = (s % 2) * hk + s // 2
            wrows.append(_dot(ohs[j], pdb) + ppoint)      # (T, 32)
            base.append(dwfea_ref[0][:, s * half:(s + 1) * half])
            base.append(dwxyz_ref[0][:, s * half:(s + 1) * half])
        wrow_flat = jnp.concatenate(wrows, axis=-1)       # (T, k*32)
        dwrow_flat = (jnp.concatenate(base, axis=-1)
                      + dwstats_ref[0:1, :]
                      + 2.0 * wrow_flat * dwstats_ref[1:2, :])
        dpp = jnp.zeros((T, _PROJ), jnp.float32)
        dpc = jnp.zeros((N, _PROJ), jnp.float32)
        for s in range(k):
            j = (s % 2) * hk + s // 2
            dwrow = dwrow_flat[:, s * _PROJ:(s + 1) * _PROJ]
            dpp = dpp + dwrow
            dpc = dpc + _dot_t(ohs[j], _bf(dwrow))
        dpp_ref[0] = dpp
        dpc_ref[0] = dpc_ref[0] + dpc


def _hi_lo(xf):
    """bf16 hi/lo split (see ops/pallas/knn.py); the barrier pins the
    split against --xla_allow_excess_precision."""
    hi = jax.lax.optimization_barrier(xf.astype(jnp.bfloat16))
    lo = jax.lax.optimization_barrier(
        (xf - hi.astype(jnp.float32)).astype(jnp.bfloat16))
    return hi, lo


def _head_pallas(x, conv_wn, conv_a, pb_point, a_merge, wen, pb_merge,
                 pcat, ppoint, k, window, interpret):
    B, N, C = x.shape
    hk = k // 2
    four_fin = conv_a.shape[-1]
    two_f = a_merge.shape[-1]
    dt = x.dtype
    exact_gather = dt == jnp.float32
    gated = pcat is not None

    xf = x.astype(jnp.float32)
    qsq = jnp.sum(jnp.square(xf), axis=-1, keepdims=True)
    dbsq = jnp.swapaxes(qsq, 1, 2)
    if exact_gather:
        # fp32 queries: full-precision distance products (hi/lo gathers)
        q_op = xf
        xt = jnp.swapaxes(xf, 1, 2)                      # (B, C, N)
        db_hi, db_lo = _hi_lo(xf)
        if gated:
            pcat_hi, pcat_lo = _hi_lo(pcat.astype(jnp.float32))
    else:
        # bf16 inputs carry no information an fp32 upcast would add: the
        # MXU's bf16 products accumulate exactly in fp32, so bf16
        # operands give the same distances at single-pass MXU rate (the
        # fp32-operand matmul runs multi-pass) and half the VMEM/HBM
        # traffic for q/xt
        q_op = x
        xt = jnp.swapaxes(x, 1, 2)
        db_hi = x
        db_lo = jnp.zeros((B, 1, C), jnp.bfloat16)
        if gated:
            pcat_hi = pcat
            pcat_lo = jnp.zeros((B, 1, _PROJ), jnp.bfloat16)

    def cspec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda b, t, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    def bspec(shape):
        nd = len(shape)
        return pl.BlockSpec(
            shape, lambda b, t, _n=nd: (b,) + (0,) * (_n - 1),
            memory_space=pltpu.VMEM)

    def tspec(shape):
        return pl.BlockSpec(shape, lambda b, t: (b, t, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        tspec((1, _T, C)), bspec((1, C, N)), tspec((1, _T, 1)),
        bspec((1, 1, N)), bspec((1, N, C)), bspec((1, db_lo.shape[1], C)),
    ]
    operands = [q_op, xt, qsq, dbsq, db_hi, db_lo]
    if gated:
        in_specs += [bspec((1, N, _PROJ)),
                     bspec((1, pcat_lo.shape[1], _PROJ)),
                     tspec((1, _T, _PROJ))]
        operands += [pcat_hi, pcat_lo, ppoint.astype(dt)]
    in_specs += [cspec(conv_wn.shape), cspec(conv_a.shape),
                 bspec((1, 1, four_fin)), bspec((1, 1, two_f)),
                 cspec(a_merge.shape), cspec(wen.shape)]
    operands += [conv_wn.astype(dt), conv_a.astype(dt),
                 pb_point.reshape(B, 1, four_fin).astype(jnp.float32),
                 pb_merge.reshape(B, 1, two_f).astype(jnp.float32),
                 a_merge.astype(dt), wen.astype(dt)]

    out_specs = [
        tspec((1, _T, k)),
        tspec((1, _T, hk * four_fin)),
        tspec((1, _T, two_f)),
        pl.BlockSpec((2, four_fin), lambda b, t: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, N, k), jnp.int32),
        jax.ShapeDtypeStruct((B, N, hk * four_fin), dt),
        jax.ShapeDtypeStruct((B, N, two_f), jnp.float32),
        jax.ShapeDtypeStruct((2, four_fin), jnp.float32),
    ]
    if gated:
        half = _PROJ // 2
        out_specs += [tspec((1, _T, k * half)), tspec((1, _T, k * half)),
                      pl.BlockSpec((2, k * _PROJ), lambda b, t: (0, 0),
                                   memory_space=pltpu.VMEM)]
        out_shape += [jax.ShapeDtypeStruct((B, N, k * half), dt),
                      jax.ShapeDtypeStruct((B, N, k * half), dt),
                      jax.ShapeDtypeStruct((2, k * _PROJ), jnp.float32)]

    outs = pl.pallas_call(
        functools.partial(_head_kernel, k, window, exact_gather, gated, dt),
        grid=(B, N // _T),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    if gated:
        return outs
    return outs + (None, None, None)


def _head_bwd_pallas(x, conv_wn, conv_a, a_merge, wen, pcat, ppoint,
                     idx, inte, d_inte, d_partial, d_stats,
                     d_wfea, d_wxyz, d_wstats, k, window, interpret):
    """Pallas head backward. Returns cotangents for
    (x, conv_wn, conv_a, pb_point, a_merge, wen, pb_merge, pcat,
    ppoint)."""
    B, N, C = x.shape
    hk = k // 2
    four_fin = conv_a.shape[-1]
    two_f = a_merge.shape[-1]
    gated = pcat is not None
    dt = x.dtype

    xf = x.astype(jnp.float32)
    db = xf.astype(_BWD_MM_DTYPE)                         # (B, N, C)
    wnt = jnp.swapaxes(conv_wn, 0, 1).astype(_BWD_MM_DTYPE)
    went = jnp.swapaxes(wen, 0, 1).reshape(two_f, k, C)
    went = went.transpose(1, 0, 2).reshape(k * two_f, C)
    went = went.astype(_BWD_MM_DTYPE)                     # slot-major wen^T
    cat = jnp.swapaxes(conv_a, 0, 1).astype(_BWD_MM_DTYPE)
    amt = jnp.swapaxes(a_merge, 0, 1).astype(_BWD_MM_DTYPE)

    def cspec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda b, t, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    def bspec(shape):
        nd = len(shape)
        return pl.BlockSpec(
            shape, lambda b, t, _n=nd: (b,) + (0,) * (_n - 1),
            memory_space=pltpu.VMEM)

    def tspec(shape):
        return pl.BlockSpec(shape, lambda b, t: (b, t, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [tspec((1, _T, C)), bspec((1, N, C)), tspec((1, _T, k)),
                tspec((1, _T, hk * four_fin)),
                tspec((1, _T, hk * four_fin)), tspec((1, _T, two_f)),
                cspec((2, four_fin)),
                cspec((four_fin, window * C)), cspec((k * two_f, C)),
                cspec((four_fin, C)), cspec((two_f, C))]
    operands = [xf, db, idx, inte.astype(jnp.float32),
                d_inte.astype(jnp.float32), d_partial.astype(jnp.float32),
                d_stats.astype(jnp.float32),
                wnt, went, cat, amt]
    out_specs = [tspec((1, _T, C)), bspec((1, N, C)),
                 cspec((window * C, four_fin)), cspec((C, four_fin)),
                 bspec((1, 1, four_fin)), bspec((1, 1, two_f)),
                 cspec((C, two_f)), cspec((k * C, two_f))]
    out_shape = [jax.ShapeDtypeStruct((B, N, C), jnp.float32),
                 jax.ShapeDtypeStruct((B, N, C), jnp.float32),
                 jax.ShapeDtypeStruct((window * C, four_fin), jnp.float32),
                 jax.ShapeDtypeStruct((C, four_fin), jnp.float32),
                 jax.ShapeDtypeStruct((B, 1, four_fin), jnp.float32),
                 jax.ShapeDtypeStruct((B, 1, two_f), jnp.float32),
                 jax.ShapeDtypeStruct((C, two_f), jnp.float32),
                 jax.ShapeDtypeStruct((k * C, two_f), jnp.float32)]
    if gated:
        in_specs += [bspec((1, N, _PROJ)), tspec((1, _T, _PROJ)),
                     tspec((1, _T, k * _PROJ // 2)),
                     tspec((1, _T, k * _PROJ // 2)),
                     cspec((2, k * _PROJ))]
        operands += [pcat.astype(jnp.float32).astype(_BWD_MM_DTYPE),
                     ppoint.astype(jnp.float32),
                     d_wfea.astype(jnp.float32),
                     d_wxyz.astype(jnp.float32),
                     d_wstats.astype(jnp.float32)]
        out_specs += [bspec((1, N, _PROJ)), tspec((1, _T, _PROJ))]
        out_shape += [jax.ShapeDtypeStruct((B, N, _PROJ), jnp.float32),
                      jax.ShapeDtypeStruct((B, N, _PROJ), jnp.float32)]

    outs = pl.pallas_call(
        functools.partial(_head_bwd_kernel, k, window, gated),
        grid=(B, N // _T),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)

    dxc, dxn, dwn, dca, dpb, dpbm, dam, dwen = outs[:8]
    d_x = (dxc + dxn).astype(dt)
    d_pb = dpb.reshape(B, four_fin)
    d_pbm = dpbm.reshape(B, two_f)
    if not gated:
        return (d_x, dwn, dca, d_pb, dam, dwen, d_pbm, None, None)
    dpc, dpp = outs[8:]
    return (d_x, dwn, dca, d_pb, dam, dwen, d_pbm,
            dpc.astype(pcat.dtype), dpp.astype(ppoint.dtype))


def _head_reference_given_idx(x, conv_wn, conv_a, pb_point, a_merge, wen,
                              pb_merge, pcat, ppoint, idx, k, window):
    """Recompute gathers + conv + partial + stats for a fixed kNN graph —
    the VJP body and (with idx from ops.edges) the non-TPU fallback.

    ``pb_point (B, 4Fin)`` / ``pb_merge (B, 2F)`` are the per-batch bias
    terms (conv bias plus, for split inputs, every contraction of the
    per-batch broadcast half — see :func:`edge_conv_head`).
    """
    from pdgn_tpu.ops.grouping import grouping

    B, N, C = x.shape
    hk = k // 2
    four_fin = conv_a.shape[-1]
    dt = x.dtype

    nbr = grouping(x, idx)                               # (B, N, k, C)
    nbr_flat = nbr.reshape(B, N, k * C)
    partial = (jnp.matmul(x, a_merge.astype(dt), **_F32)
               + jnp.matmul(nbr_flat, wen.astype(dt), **_F32)
               + pb_merge.astype(jnp.float32)[:, None, :])

    point = (jnp.matmul(x, conv_a.astype(dt), **_F32)
             + pb_point.astype(jnp.float32)[:, None, :])  # (B, N, 4Fin) fp32
    parts = []
    wnr = conv_wn.astype(dt).reshape(window, C, four_fin)
    for wp in range(hk):
        y = point
        for t in range(window):
            y = y + jnp.matmul(nbr[:, :, wp + t, :], wnr[t], **_F32)
        parts.append(y.astype(dt))
    inte = jnp.concatenate(parts, axis=-1)               # (B, N, hk*4Fin)
    intef = inte.astype(jnp.float32)
    stats = jnp.stack([
        jnp.sum(intef.reshape(B, N, hk, four_fin), axis=(0, 1, 2)),
        jnp.sum(jnp.square(intef).reshape(B, N, hk, four_fin),
                axis=(0, 1, 2)),
    ])
    if pcat is None:
        return inte, partial, stats, None, None, None

    # weight-net front in the (window, j) slot order
    idx_b = idx.reshape(B, N, 2, hk).transpose(0, 1, 3, 2)
    idx_b = idx_b.reshape(B, N, k)
    half = _PROJ // 2
    wrow = (grouping(pcat, idx_b).astype(jnp.float32)
            + ppoint.astype(jnp.float32)[:, :, None, :]).astype(dt)
    wfea = wrow[..., :half].reshape(B, N, k * half)
    wxyz = wrow[..., half:].reshape(B, N, k * half)
    wf = wrow.astype(jnp.float32)
    wstats = jnp.stack([
        jnp.sum(wf, axis=(0, 1)).reshape(k * _PROJ),
        jnp.sum(jnp.square(wf), axis=(0, 1)).reshape(k * _PROJ),
    ])
    return inte, partial, stats, wfea, wxyz, wstats


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def _head(x, conv_wn, conv_a, pb_point, a_merge, wen, pb_merge, pcat,
          ppoint, k, window, interpret):
    return _head_pallas(x, conv_wn, conv_a, pb_point, a_merge, wen,
                        pb_merge, pcat, ppoint, k, window, interpret)


def _head_fwd(x, conv_wn, conv_a, pb_point, a_merge, wen, pb_merge, pcat,
              ppoint, k, window, interpret):
    out = _head_pallas(x, conv_wn, conv_a, pb_point, a_merge, wen,
                       pb_merge, pcat, ppoint, k, window, interpret)
    idx, inte = out[0], out[1]
    return out, (x, conv_wn, conv_a, pb_point, a_merge, wen, pb_merge,
                 pcat, ppoint, idx, inte)


def _head_bwd(k, window, interpret, res, cts):
    (x, conv_wn, conv_a, pb_point, a_merge, wen, pb_merge, pcat, ppoint,
     idx, inte) = res
    if interpret or head_fusion_ok(x, k):
        d_inte, d_partial, d_stats = cts[1], cts[2], cts[3]
        d_wfea = d_wxyz = d_wstats = None
        if pcat is not None:
            d_wfea, d_wxyz, d_wstats = cts[4], cts[5], cts[6]
        return _head_bwd_pallas(
            x, conv_wn, conv_a, a_merge, wen, pcat, ppoint, idx, inte,
            d_inte, d_partial, d_stats, d_wfea, d_wxyz, d_wstats,
            k, window, interpret)
    cts_ref = cts[1:]
    if pcat is None:
        cts_ref = cts_ref[:3]

        def f(x, conv_wn, conv_a, pb_point, a_merge, wen, pb_merge):
            return _head_reference_given_idx(
                x, conv_wn, conv_a, pb_point, a_merge, wen, pb_merge,
                None, None, idx, k, window)[:3]

        _, vjp = jax.vjp(f, x, conv_wn, conv_a, pb_point, a_merge, wen,
                         pb_merge)
        return vjp(cts_ref) + (None, None)

    def f(x, conv_wn, conv_a, pb_point, a_merge, wen, pb_merge, pcat,
          ppoint):
        return _head_reference_given_idx(
            x, conv_wn, conv_a, pb_point, a_merge, wen, pb_merge, pcat,
            ppoint, idx, k, window)

    _, vjp = jax.vjp(f, x, conv_wn, conv_a, pb_point, a_merge, wen,
                     pb_merge, pcat, ppoint)
    return vjp(cts_ref)


_head.defvjp(_head_fwd, _head_bwd)


def head_fusion_ok(x, k: int) -> bool:
    """Kernel applies: TPU backend, 128-multiple N, even k, default
    (non-exact) kNN mode."""
    import os

    from pdgn_tpu.ops.edges import exact_knn_enabled

    if os.environ.get("PDGN_DISABLE_PALLAS") or exact_knn_enabled():
        return False
    if x.shape[1] % _T or k % 2 or x.shape[1] > 0x10000:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def edge_conv_head(
    x: jnp.ndarray,
    conv_kernel: jnp.ndarray,
    conv_bias: jnp.ndarray,
    merge_kernel: jnp.ndarray,
    k: int,
    pcat: Optional[jnp.ndarray] = None,
    ppoint: Optional[jnp.ndarray] = None,
    *,
    xs: Optional[jnp.ndarray] = None,
    interpret: bool = False,
):
    """Fused stage head: self-kNN (self excluded), neighbour gathers,
    window conv (block channel order, lane-flat output), the merge conv's
    central+neighbour partial and (bilateral stages) the weight-net front.

    Args:
      x: ``(B, N, C)`` point features (compute dtype). With ``xs`` set,
        this is only the *per-point* half of the stage input (the
        reference's ``x_ec``); the full features are conceptually
        ``concat([broadcast(xs), x])``.
      conv_kernel: ``(1, W, 2Cf, 4Fin)`` window-conv kernel, block channel
        order (the generator's param-side permutation already applied);
        ``Cf = C + xs-width`` is the full channel count.
      conv_bias: ``(4Fin,)``.
      merge_kernel: ``(2k*2Cf, 2F)`` merge weight (reference slot layout).
      k: neighbour count (even).
      pcat: ``(B, N, 32)`` weight-net projections ``[x@Wn_fea | pc@Wn_xyz]``
        (bilateral stages only; with ``xs`` the fea half contracts only
        the per-point channels — the per-batch part must already be folded
        into ``ppoint`` by the caller).
      ppoint: ``(B, N, 32)`` matching central terms
        ``[x@(Wc-Wn)_fea + b_fea | pc@(Wc-Wn)_xyz + b_xyz]``.
      xs: optional ``(B, Cs)`` per-batch broadcast half of the stage input
        (the reference's global ``xs`` feature, identical for every
        point). Because it is constant per cloud it contributes nothing
        to the pairwise feature distances and every contraction of it
        collapses to a per-batch bias — the kernel then runs at the
        per-point half's channel width (the concat never materialises and
        the head's MXU work drops by ~the xs fraction of the channels).

    Returns:
      ``idx (B, N, k)`` int32; ``inte (B, N, (k/2)*4Fin)`` raw window-conv
      output (lane-flat block layout); ``partial (B, N, 2F)`` fp32
      (``x @ A_merge + nbr_flat @ We_n``); ``(mean, var)`` of the
      window-conv output; and — bilateral only, else ``None``s —
      ``wfea/wxyz (B, N, k*16)`` lane-flat weight-net pre-activations in
      (window, j) slot order with ``(mean, var)`` stats for each.
    """
    B, N, C = x.shape
    hk = k // 2
    window = conv_kernel.shape[1]
    four_fin = conv_kernel.shape[-1]
    two_f = merge_kernel.shape[-1]
    cx = 0 if xs is None else xs.shape[-1]
    cf = cx + C                                          # full channels

    wc = conv_kernel[0, :, :cf, :]
    wn = conv_kernel[0, :, cf:, :]
    conv_a_full = jnp.sum(wc - wn, axis=0)               # (Cf, 4Fin)

    kr = merge_kernel.reshape(2 * k, 2 * cf, two_f)
    a_merge_full = jnp.sum(kr[:k, :cf, :] - kr[:k, cf:, :], axis=0)
    wen_full = kr[:k, cf:, :]                            # (k, Cf, 2F)

    if xs is None:
        conv_a = conv_a_full
        wn_flat = wn.reshape(window * cf, four_fin)
        a_merge = a_merge_full
        wen = wen_full.reshape(k * cf, two_f)
        pb_point = jnp.broadcast_to(
            conv_bias.astype(jnp.float32)[None, :], (B, four_fin))
        pb_merge = jnp.zeros((B, two_f), jnp.float32)
    else:
        # per-batch half: every xs contraction is a (B, Cs) GEMM bias
        xsf = xs.astype(jnp.float32)
        conv_a = conv_a_full[cx:]
        wn_flat = wn[:, cx:, :].reshape(window * C, four_fin)
        m_point = conv_a_full[:cx] + jnp.sum(wn[:, :cx, :], axis=0)
        pb_point = (jnp.matmul(xsf, m_point.astype(jnp.float32), **_F32)
                    + conv_bias.astype(jnp.float32))
        a_merge = a_merge_full[cx:]
        wen = wen_full[:, cx:, :].reshape(k * C, two_f)
        m_merge = a_merge_full[:cx] + jnp.sum(wen_full[:, :cx, :], axis=0)
        pb_merge = jnp.matmul(xsf, m_merge.astype(jnp.float32), **_F32)

    if head_fusion_ok(x, k) or interpret:
        idx, inte, partial, stats, wfea, wxyz, wstats = _head(
            x, wn_flat, conv_a, pb_point, a_merge, wen, pb_merge,
            pcat, ppoint, k, window, interpret)
    else:
        from pdgn_tpu.ops.edges import _neighbor_idx

        # exact fallback: the kNN graph is built from the FULL features
        # (identical ranking — the broadcast half cancels — but the fp32
        # rounding matches the reference's full-concat distance exactly)
        if xs is None:
            x_knn = x
        else:
            x_knn = jnp.concatenate(
                [jnp.broadcast_to(xs[:, None, :], (B, N, cx)), x], axis=-1)
        idx = _neighbor_idx(x_knn, k)
        inte, partial, stats, wfea, wxyz, wstats = \
            _head_reference_given_idx(
                x, wn_flat, conv_a, pb_point, a_merge, wen, pb_merge,
                pcat, ppoint, idx, k, window)

    count = B * N * hk
    mean = stats[0] / count
    var = stats[1] / count - jnp.square(mean)
    if pcat is None:
        return idx, inte, partial, (mean, var), None, None, None, None

    wcount = B * N * k
    ws = wstats.reshape(2, k, _PROJ)
    wm = jnp.sum(ws[0], axis=0) / wcount                 # (32,)
    wv = jnp.sum(ws[1], axis=0) / wcount - jnp.square(wm)
    half = _PROJ // 2
    fea_stats = (wm[:half], wv[:half])
    xyz_stats = (wm[half:], wv[half:])
    return idx, inte, partial, (mean, var), wfea, wxyz, fea_stats, xyz_stats
