"""Progressive point-cloud generator (PointGenerator).

TPU-native re-design of the reference generator
(models/PDGNet_v2.py:439-877): a 128-d noise vector is lifted to a 32x128
feature cloud and pushed through four "bilateral" upsampling blocks, each
doubling the point count (128 -> 256 -> 512 -> 1024 -> 2048) and emitting a
coordinate head at 256/512/1024/2048 points.

Differences from the reference implementation (behaviour preserved):

* channel-last layout ``(B, N, C)`` — every 1x1 conv becomes a Dense over
  the lane axis (one MXU matmul per layer);
* the kNN edge gather is a fused Pallas kernel / one batched gather
  instead of a per-sample Python loop (reference models/PDGNet_v2.py:
  463-469);
* **edge tensors are never materialised**: the reference's edge features
  ``e = [central | nbr - central]`` (B, N, k, 2C) feed only *linear*
  layers, so every consumer's weight is split into central/neighbour
  halves — the central part folds into a per-point GEMM and the
  neighbour part contracts the raw gathered neighbours (half the bytes,
  half the conv FLOPs; the weight-net gathers shrink to 16 channels);
* the channel-to-point "pixel shuffle" (reference :583-585) is a reshape/
  transpose with identical index semantics.

Parameter tree, shapes and init distributions are identical to the
pre-decomposition implementation (and to torch defaults), so checkpoints
interoperate; outputs match to float tolerance.

The v2 network always applies softmax neighbour weighting regardless of
the CLI flag (reference models/PDGNet_v2.py:95 drops the arg); v1 passes
it through (models/PDGNet.py:95).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pdgn_tpu.models.layers import (
    BatchNorm,
    BatchNormFold,
    MLP,
    TorchDense,
    current_batch_mask,
    leaky_relu,
    masked_moments,
    torch_bias_uniform,
    torch_kaiming_uniform,
)
from pdgn_tpu.ops.grouping import grouping
from pdgn_tpu.ops.pallas.bilateral_tail import edge_conv_tail
from pdgn_tpu.ops.pallas.edge_head import edge_conv_head

_MMF32 = dict(preferred_element_type=jnp.float32)


def _sync_stats(mean, var, axis_name):
    """Cross-replica (sync-BN) combination of per-shard batch statistics.

    Recovers the second moment, ``pmean``s both moments and recombines —
    exactly what ``nn.BatchNorm`` does with ``axis_name`` set.
    """
    if axis_name is None:
        return mean, var
    mean2 = var + jnp.square(mean)
    mean = jax.lax.pmean(mean, axis_name)
    mean2 = jax.lax.pmean(mean2, axis_name)
    return mean, mean2 - jnp.square(mean)


def _linear_bn_stats(h, kernel, bias, axis_name):
    """Batch statistics of ``y = h @ kernel + bias`` without materialising y.

    For a linear layer, ``E[y_c] = m·W_c + b_c`` and
    ``E[y_c^2] = W_c^T S W_c + 2 b_c (m·W_c) + b_c^2`` with
    ``S = E[h h^T]`` — a (H, H) second-moment contraction over the (tiny)
    hidden width instead of a full-tensor stats pass over the (huge)
    output. This is what lets the fused tail kernel keep the
    (B, N, k, 2Fin) gate tensor out of HBM entirely. Under a batch mask
    (padded batch) the moments weight each sample's rows by its mask.
    """
    from pdgn_tpu.models.layers import linear_bn_stats

    return linear_bn_stats(h, kernel, bias, axis_name)


def _block_channel_perm(four_fin: int):
    """Reference->block channel permutation of the window-conv output.

    The reference interleave (models/PDGNet_v2.py:574-578) sends conv
    output channel ``c*2 + j`` at window position ``w`` to neighbour slot
    ``j*(k/2) + w``, channel ``c``. Materialising that permutation of the
    activation costs two HBM round trips per stage, so this framework
    instead emits the conv channels in *block* order ``p = j*2Fin + c``
    (a free, param-side permutation of the conv weights) and builds every
    consumer in the same order. ``perm[p]`` is the reference channel.
    """
    two_fin = four_fin // 2
    return tuple(2 * (p % two_fin) + (p // two_fin) for p in range(four_fin))


def _point_pixel_shuffle(y: jnp.ndarray) -> jnp.ndarray:
    """Channel-pair -> point doubling (reference models/PDGNet_v2.py:583-585).

    ``(B, N, 2*Fout)`` -> ``(B, 2N, Fout)``; output channel ``f*2 + j`` of
    point ``n`` becomes point ``j*N + n`` (block layout, not interleaved).
    """
    B, N, two_fout = y.shape
    fout = two_fout // 2
    r = y.reshape(B, N, fout, 2)                     # ch -> (f, j)
    r = r.transpose(0, 3, 1, 2)                      # (B, j, N, f)
    return r.reshape(B, 2 * N, fout)


class _ConvParams(nn.Module):
    """Raw conv parameters with nn.Conv's tree layout ({kernel, bias})."""

    shape: Tuple[int, ...]           # (1, W, in, out)
    fan_in: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", torch_kaiming_uniform(), self.shape)
        bias = self.param("bias", torch_bias_uniform(self.fan_in),
                          (self.shape[-1],))
        return kernel, bias


class _InnerDenseParams(nn.Module):
    shape: Tuple[int, int]
    fan_in: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", torch_kaiming_uniform(), self.shape)
        bias = self.param("bias", torch_bias_uniform(self.fan_in),
                          (self.shape[-1],))
        return kernel, bias


class _DenseParams(nn.Module):
    """Raw dense parameters with TorchDense's tree layout (dense/kernel)."""

    shape: Tuple[int, int]
    fan_in: int

    @nn.compact
    def __call__(self):
        return _InnerDenseParams(self.shape, self.fan_in, name="dense")()


def _cast(dtype, *arrays):
    if dtype is None:
        return arrays
    return tuple(a.astype(dtype) for a in arrays)


def _to(dtype, y):
    """Cast a GEMM output (fp32 accumulators) back to the compute dtype.

    XLA fuses the cast into the producing GEMM's epilogue, so with
    ``dtype=bfloat16`` every large intermediate is *stored* in bf16 —
    halving the HBM traffic of the gathers, batch norms and layout ops
    that dominate the sampler's non-MXU time.
    """
    return y if dtype is None else y.astype(dtype)


def _pin(dtype, y):
    """Pin a bf16 stage-boundary tensor against excess-precision elision.

    ``--xla_allow_excess_precision`` (default on) elides a bf16
    down-cast whose consumer up-casts to fp32 — which is exactly the
    BN-stats/normalise pattern at every stage boundary, so without the
    barrier the pixel-shuffle transpose and the bn_uc passes run on a
    materialised fp32 copy (measured ~2.2 ms/fwd at B=128).
    """
    if dtype is None:
        return y
    return jax.lax.optimization_barrier(y)


class _WindowConv(nn.Module):
    """``inte_conv_hk`` decomposed (reference models/PDGNet_v2.py:561-565).

    The original is a VALID conv over the neighbour window of the edge
    features ``[x | nbr - x]``. Splitting the kernel into its central and
    neighbour halves gives ``conv(e) = x @ A + conv_n(nbr)`` with
    ``A = sum_t (Wc_t - Wn_t)`` — the conv contracts C channels instead
    of 2C. The conv parameter keeps the nn.Conv tree layout; its *output
    channels* are emitted in block order (see
    :func:`_block_channel_perm`) via a param-side column permutation, so
    the downstream interleave never materialises. The batch-norm params
    therefore live in block order too — the torch checkpoint converter
    maps them (pdgn_tpu.convert_ckpt).
    """

    four_fin: int
    window: int
    axis_name: Optional[str] = None
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, nbr):
        B, N, k, C = nbr.shape
        fan_in = 2 * C * self.window
        kernel, bias = _ConvParams(
            (1, self.window, 2 * C, self.four_fin), fan_in, name="conv")()
        perm = jnp.asarray(_block_channel_perm(self.four_fin))
        kernel = kernel[..., perm]
        bias = bias[perm]
        wc = kernel[0, :, :C, :]                     # (W, C, 4Fin)
        wn = kernel[0, :, C:, :]
        a_mat = jnp.sum(wc - wn, axis=0)             # (C, 4Fin)

        xd, nbrd, wnd, ad = _cast(self.dtype, x, nbr, wn, a_mat)
        point = _to(self.dtype,
                    jnp.matmul(xd, ad, **_MMF32) + bias)  # (B, N, 4Fin)
        nbr_conv = _to(self.dtype, jax.lax.conv_general_dilated(
            nbrd, wnd[None],                         # (1, W, C, 4Fin)
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ))                                           # (B, N, k-W+1, 4Fin)
        y = nbr_conv + point[:, :, None, :]
        y = BatchNorm(axis_name=self.axis_name, dtype=self.dtype)(y)
        return leaky_relu(y)


class _WindowConvVars(nn.Module):
    """Parameter container matching :class:`_WindowConv`'s variable tree
    (``{conv, BatchNorm_0/bn}``) for the fused edge-conv path.

    Called twice per stage: once up-front for the conv parameters (no
    running-stat update) and once with the head kernel's batch statistics
    (running-stat update + the BN affine parameters).
    """

    shape: Tuple[int, ...]           # (1, W, 2C, 4Fin)
    fan_in: int

    @nn.compact
    def __call__(self, mean=None, var=None):
        kernel, bias = _ConvParams(self.shape, self.fan_in, name="conv")()
        four_fin = self.shape[-1]
        update = mean is not None
        if mean is None:
            mean = jnp.zeros((four_fin,), jnp.float32)
            var = jnp.ones((four_fin,), jnp.float32)
        stats = BatchNormFold(name="BatchNorm_0")(mean, var, update)
        return kernel, bias, stats


def _merge_gemm(x, nbr, inte, params, dtype, inte_layout="slot"):
    """The full-width ``[1, 2k]`` merge conv (reference conv2dbr), with the
    edge half decomposed into point + neighbour contractions.

    ``merge = concat([e, inte], axis=k)`` flattened over (2k, 2C); slot
    ``j < k`` carries ``[x | nbr_j - x]``, slot ``j >= k`` carries inte.

    ``inte_layout``:
      * ``"slot"`` — inte is interleaved ``(B, N, k, 2Fin)`` (the
        reference's edge layout).
      * ``"block"`` — inte is the raw block-order window-conv output
        ``(B, N, k/2, 4Fin)`` (channel ``p = j*2Fin + c`` at window
        position ``w`` carries the reference's slot ``j*k/2+w``, channel
        ``c``); the interleave permutation is folded into the (tiny,
        param-side) merge weight instead of materialising a permuted
        copy of the activation.
    """
    kernel, bias = params                            # (2k*2C, 2F), (2F,)
    B, N, k, C = nbr.shape
    two_c = 2 * C
    two_f = kernel.shape[-1]
    kr = kernel.reshape(2 * k, two_c, two_f)
    we_c = kr[:k, :C, :]                             # (k, C, 2F)
    we_n = kr[:k, C:, :]
    wi = kr[k:]                                      # (k, 2C, 2F)
    a_mat = jnp.sum(we_c - we_n, axis=0)             # (C, 2F)
    if inte_layout == "block":
        # wi_block[w, j*2Fin+c, o] = wi[j*hk+w, c, o]
        hk = k // 2
        wi = wi.reshape(2, hk, two_c, two_f).transpose(1, 0, 2, 3)
        wi = wi.reshape(hk, 2 * two_c, two_f)        # (k/2, 4Fin, 2F)

    xd, nbrd, inted, wend, wid, ad = _cast(dtype, x, nbr, inte, we_n, wi,
                                           a_mat)
    y = jnp.matmul(xd, ad, **_MMF32)
    y = y + jnp.einsum("bnkc,kco->bno", nbrd, wend, **_MMF32)
    y = y + jnp.einsum("bnkc,kco->bno", inted, wid, **_MMF32)
    return _to(dtype, y + bias)


def _split_1x1(x, gathered_src, idx, params, dtype):
    """A 1x1 conv over edge features, decomposed.

    ``e @ W = x @ (Wc - Wn) [broadcast over k] + gather(src @ Wn, idx)``
    — the gather moves to the (tiny) projected space.
    """
    kernel, bias = params                            # (2C_src, F)
    C = gathered_src.shape[-1]
    wc = kernel[:C, :]
    wn = kernel[C:, :]
    xd, srcd, wcd, wnd = _cast(dtype, x, gathered_src, wc - wn, wn)
    point = _to(dtype, jnp.matmul(xd, wcd, **_MMF32) + bias)  # (B, N, F)
    proj = _to(dtype, jnp.matmul(srcd, wnd, **_MMF32))  # (B, N, F)
    nbr_term = grouping(proj, idx)                   # (B, N, k, F)
    return point[:, :, None, :] + nbr_term


def _dual_split_1x1(x, pc, idx, fea_params, xyz_params, dtype):
    """The two decomposed weight-net 1x1 convs with a single shared gather.

    Both 16-channel edge convs (reference models/PDGNet_v2.py:608-612) use
    the same neighbour indices, so their projected neighbour terms are
    gathered together as one 32-channel tensor — one gather instead of two
    and better lane packing for the tiny channel counts.
    """
    fk, fb = fea_params                              # (2C, 16), (16,)
    xk, xb = xyz_params                              # (6, 16), (16,)
    C = x.shape[-1]
    Cp = pc.shape[-1]
    xd, pcd = _cast(dtype, x, pc)
    fwc, fwn = _cast(dtype, fk[:C] - fk[C:], fk[C:])
    xwc, xwn = _cast(dtype, xk[:Cp] - xk[Cp:], xk[Cp:])
    pf = _to(dtype, jnp.matmul(xd, fwc, **_MMF32) + fb)   # (B, N, 16)
    px = _to(dtype, jnp.matmul(pcd, xwc, **_MMF32) + xb)  # (B, N, 16)
    proj = jnp.concatenate(
        [_to(dtype, jnp.matmul(xd, fwn, **_MMF32)),
         _to(dtype, jnp.matmul(pcd, xwn, **_MMF32))], axis=-1)  # (B, N, 32)
    nbr = grouping(proj, idx)                        # (B, N, k, 32)
    f = nbr.shape[-1] // 2
    return pf[:, :, None, :] + nbr[..., :f], px[:, :, None, :] + nbr[..., f:]


class EdgeConv(nn.Module):
    """Plain (non-upsampling) edge convolution.

    Reference ``edgeConv`` (models/PDGNet_v2.py:652-670) — defined in the
    reference but off the live PDGN path; provided for API completeness.
    ``[x | nbr - x]`` edge features through a 1x1 conv + BN + ReLU, then a
    max over the k neighbours: ``(B, N, Fin) -> (B, N, Fout)``. Uses the
    same decomposed conv as the live stages (the gather moves to the
    projected space; the (B, N, k, 2Fin) edge tensor never exists).
    """

    fin: int
    fout: int
    k: int
    axis_name: Optional[str] = None
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        from pdgn_tpu.ops.edges import _neighbor_idx

        params = _DenseParams((2 * self.fin, self.fout),
                              fan_in=2 * self.fin, name="conv")()
        idx = _neighbor_idx(x, self.k)
        e = _split_1x1(x, x, idx, params, self.dtype)   # (B, N, k, Fout)
        e = BatchNorm(axis_name=self.axis_name, dtype=self.dtype)(e)
        e = nn.relu(e)
        return jnp.max(e, axis=2)


class UpsampleEdgeConv(nn.Module):
    """Point-doubling edge convolution (reference ``upsample_edgeConv``,
    models/PDGNet_v2.py:547-588). ``(B, N, Fin)`` -> ``(B, 2N, Fout)``."""

    fin: int
    fout: int
    k: int
    axis_name: Optional[str] = None
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        four_fin = 4 * self.fin
        window = self.k // 2 + 1
        merge_kernel, merge_bias = _DenseParams(
            (2 * self.k * 2 * self.fin, 2 * self.fout),
            fan_in=2 * self.k * 2 * self.fin, name="TorchDense_0")()
        wcv = _WindowConvVars((1, window, 2 * C, four_fin),
                              2 * C * window, name="_WindowConv_0")
        conv_kernel, conv_bias, _ = wcv()
        perm = jnp.asarray(_block_channel_perm(four_fin))
        conv_kernel = conv_kernel[..., perm]
        conv_bias = conv_bias[perm]

        # fused head: kNN + gather + window conv + merge partial + BN
        # stats; fused tail: BN fold + LeakyReLU + merge. The (B, N, k, C)
        # neighbour tensor and the (B, N, k, 2Fin) edge tensor never exist
        # in HBM.
        idx, inte_raw, partial, (i_mean, i_var) = edge_conv_head(
            x, conv_kernel, conv_bias, merge_kernel, self.k)[:4]
        mask = current_batch_mask()
        if mask is not None:
            # padded batch: the kernel's stats accumulate over every row;
            # recompute them mask-weighted from the saved conv output
            i_mean, i_var = masked_moments(
                inte_raw.reshape(B, -1, four_fin), mask)
        i_mean, i_var = _sync_stats(i_mean, i_var, self.axis_name)
        _, _, i_stats = wcv(i_mean, i_var)
        y = edge_conv_tail(partial, inte_raw, None, i_stats, None, None,
                           merge_kernel, merge_bias, self.k)
        y = BatchNorm(axis_name=self.axis_name, dtype=self.dtype)(y)
        # pin AFTER the shuffle: the transpose then moves bf16 bytes and
        # bn_uc's fp32 upcasts stay fused in its stats/normalise passes
        return _pin(self.dtype,
                    _point_pixel_shuffle(nn.relu(y)))         # (B,2N,Fout)


class BilateralUpsampleEdgeConv(nn.Module):
    """Bilaterally-weighted point-doubling edge convolution.

    Reference ``bilateral_upsample_edgeConv`` (models/PDGNet_v2.py:590-650):
    the interpolated neighbour features are gated by a weight net driven by
    both feature-space and xyz-space edge features before the merge conv.
    The xyz edge features use the *feature-space* kNN graph (reference
    :479-528) and are consumed only by a 16-channel 1x1 conv, which the
    decomposition turns into a 16-channel gather.

    The stage input is taken as the pair ``(xs, ec)`` whose concat is the
    reference's ``x_out = cat([xs·repeat, x_ec])`` (models/PDGNet_v2.py:
    785): ``xs`` is identical for every point of a cloud, so it cancels in
    the pairwise kNN distances and every channel contraction of it
    collapses to a per-batch bias — the head kernel only ever touches the
    per-point half (half the MXU work; the concat never materialises).
    ``xs=None`` reproduces the plain single-tensor input.
    """

    fin: int
    fout: int
    k: int
    softmax: bool = True
    axis_name: Optional[str] = None
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, pc, xs=None):
        B, N, _ = x.shape
        C = self.fin                     # full channels (x may be a half)
        cx = 0 if xs is None else xs.shape[-1]
        hk = self.k // 2
        four_fin = 4 * self.fin
        window = hk + 1
        merge_kernel, merge_bias = _DenseParams(
            (2 * self.k * 2 * self.fin, 2 * self.fout),
            fan_in=2 * self.k * 2 * self.fin, name="TorchDense_0")()
        wcv = _WindowConvVars((1, window, 2 * C, four_fin),
                              2 * C * window, name="_WindowConv_0")
        conv_kernel, conv_bias, _ = wcv()
        perm = jnp.asarray(_block_channel_perm(four_fin))
        conv_kernel = conv_kernel[..., perm]
        conv_bias = conv_bias[perm]

        # weight-net projections for the fused head. The decomposition is
        # _split_1x1's: ``e @ W = x @ (Wc - Wn) + gather(src @ Wn)`` — the
        # head kernel gathers the (tiny, 32-channel) concatenated
        # projections per neighbour slot in (window, j) order (reference
        # slot j*hk + w rides slot s'' = w*2 + j), so its flat outputs
        # reshape *contiguously* into the block channel layout of the
        # window-conv output downstream. With a split input the xs rows of
        # both weight halves fold into per-batch terms on ppoint (the
        # gathered xs contribution is constant per cloud).
        fea_params = _DenseParams((2 * C, 16), fan_in=2 * C,
                                  name="conv_fea")()
        xyz_params = _DenseParams((6, 16), fan_in=6, name="conv_xyz")()
        fk, fb = fea_params
        xk, xb = xyz_params
        cp = pc.shape[-1]
        dt = self.dtype
        xd, pcd = _cast(dt, x, pc)
        fwc_full = fk[:C] - fk[C:]
        fwn_full = fk[C:]
        fwc, fwn = _cast(dt, fwc_full[cx:], fwn_full[cx:])
        xwc, xwn = _cast(dt, xk[:cp] - xk[cp:], xk[cp:])
        pp_fea = _to(dt, jnp.matmul(xd, fwc, **_MMF32) + fb)
        if xs is not None:
            # central xs term + the constant gathered-xs term, per batch
            xsf = xs.astype(jnp.float32)
            pb_fea = jnp.matmul(
                xsf, (fwc_full[:cx] + fwn_full[:cx]).astype(jnp.float32),
                **_MMF32)
            pp_fea = pp_fea + _to(dt, pb_fea)[:, None, :]
        ppoint = jnp.concatenate(
            [pp_fea,
             _to(dt, jnp.matmul(pcd, xwc, **_MMF32) + xb)], axis=-1)
        pcat = jnp.concatenate(
            [_to(dt, jnp.matmul(xd, fwn, **_MMF32)),
             _to(dt, jnp.matmul(pcd, xwn, **_MMF32))], axis=-1)

        # fused head: kNN + gathers + window conv + merge partial +
        # weight-net front + all BN stats (the (B, N, k, C) neighbour
        # tensor never exists in HBM)
        (idx, inte_raw, partial, (i_mean, i_var),
         wfea, wxyz, fea_stats, xyz_stats) = edge_conv_head(
            x, conv_kernel, conv_bias, merge_kernel, self.k, pcat, ppoint,
            xs=xs)
        mask = current_batch_mask()
        if mask is not None:
            # padded batch: recompute every kernel-accumulated statistic
            # mask-weighted from the saved lane-flat outputs
            i_mean, i_var = masked_moments(
                inte_raw.reshape(B, -1, four_fin), mask)
            fea_stats = masked_moments(wfea.reshape(B, -1, 16), mask)
            xyz_stats = masked_moments(wxyz.reshape(B, -1, 16), mask)
        i_mean, i_var = _sync_stats(i_mean, i_var, self.axis_name)
        _, _, i_stats = wcv(i_mean, i_var)

        eps = 1e-5
        fm, fv = _sync_stats(*fea_stats, self.axis_name)
        xm, xv = _sync_stats(*xyz_stats, self.axis_name)
        _, _, fsc, fsh = BatchNormFold(name="bn_fea")(fm, fv)
        _, _, xsc, xsh = BatchNormFold(name="bn_xyz")(xm, xv)
        fs = fsc * jax.lax.rsqrt(fv + eps)
        xs = xsc * jax.lax.rsqrt(xv + eps)
        # normalise + LeakyReLU + gate-multiply in the lane-flat layout
        # (per-channel vectors tile across the k slots) — one fused pass
        w_flat = _to(dt, leaky_relu(
            wfea.astype(jnp.float32) * jnp.tile(fs, self.k)
            + jnp.tile(fsh - fm * fs, self.k))
            * leaky_relu(
            wxyz.astype(jnp.float32) * jnp.tile(xs, self.k)
            + jnp.tile(xsh - xm * xs, self.k)))
        # conv_all1 + bn_all1 + LeakyReLU in the lane-flat layout: the
        # per-slot 16->64 dense rides a block-diagonal weight so the
        # (B, N, k, 16)/(B, N, k, 64) relayouts (two full HBM round
        # trips) never happen; bn_all1's per-64-channel stats pool the k
        # slots of the flat channel axis. Same parameter tree/init as the
        # previous TorchDense("conv_all1") + BatchNorm("bn_all1").
        ck1, cb1 = _DenseParams((16, 64), fan_in=16, name="conv_all1")()
        wblk = jnp.kron(jnp.eye(self.k, dtype=ck1.dtype), ck1)
        wfd, wbd = _cast(dt, w_flat, wblk)
        h_pre = _to(dt, jnp.matmul(wfd, wbd, **_MMF32)
                    + jnp.tile(cb1, self.k))             # (B, N, k*64)
        if mask is None:
            cnt = float(B * N * self.k)
            hf = h_pre.astype(jnp.float32)
            hs = jnp.sum(hf, axis=(0, 1)).reshape(self.k, 64)
            hq = jnp.sum(jnp.square(hf), axis=(0, 1)).reshape(self.k, 64)
            m1 = jnp.sum(hs, axis=0) / cnt
            v1 = jnp.sum(hq, axis=0) / cnt - jnp.square(m1)
        else:
            m1, v1 = masked_moments(
                h_pre.reshape(B, N * self.k, 64), mask)
        m1, v1 = _sync_stats(m1, v1, self.axis_name)
        _, _, sc1, bi1 = BatchNormFold(name="bn_all1")(m1, v1)
        s1 = sc1 * jax.lax.rsqrt(v1 + eps)
        h = _pin(dt, _to(dt, leaky_relu(
            h_pre.astype(jnp.float32) * jnp.tile(s1, self.k)
            + jnp.tile(bi1 - m1 * s1, self.k))))         # (B, N, k*64)
        h4 = h.reshape(B, N, self.k, 64)
        # conv_all2 + bn_all2 + LeakyReLU + softmax + gating + merge all
        # run inside the fused tail: the (B, N, k, 2Fin) gate tensor never
        # materialises. bn_all2's batch statistics come from the
        # second-moment identity on h (exact — see _linear_bn_stats); the
        # softmax over the neighbour axis (reference torch dim=-1 on
        # (B, C, N, K)) is invariant to the slot permutation above, and
        # consecutive slot pairs form the block channel layout of the
        # window-conv output.
        w2_params = _DenseParams((64, 2 * self.fin), fan_in=64,
                                 name="conv_all2")()
        if mask is None:
            # one fused pass over the flat h: per-slot channel sums +
            # second-moment matrix (ops/pallas/slot_stats), then the
            # linear identity — no (B, N, k, 64) relayout, no extra read
            from pdgn_tpu.ops.pallas.slot_stats import slot_moment_stats

            s_vec, s_mat = slot_moment_stats(h, self.k)
            rows = float(B * N * self.k)
            m_x = s_vec / rows
            s_mat = s_mat / rows
            if self.axis_name is not None:
                m_x = jax.lax.pmean(m_x, self.axis_name)
                s_mat = jax.lax.pmean(s_mat, self.axis_name)
            kf = w2_params[0].astype(jnp.float32)
            bf = w2_params[1].astype(jnp.float32)
            mk = m_x @ kf
            m2 = mk + bf
            ex2 = jnp.sum(kf * (s_mat @ kf), axis=0) + 2.0 * bf * mk + bf * bf
            v2 = jnp.maximum(0.0, ex2 - jnp.square(m2))
        else:
            m2, v2 = _linear_bn_stats(h4, w2_params[0], w2_params[1],
                                      self.axis_name)
        w2_stats = BatchNormFold(name="bn_all2")(m2, v2)

        y = edge_conv_tail(partial, inte_raw, h, i_stats, w2_params,
                           w2_stats, merge_kernel, merge_bias, self.k,
                           softmax=self.softmax)
        y = BatchNorm(axis_name=self.axis_name, dtype=self.dtype)(y)
        return _pin(self.dtype, _point_pixel_shuffle(nn.relu(y)))


class _GlobalBranch(nn.Module):
    """Max-pool -> fc stack shared by all bilateral blocks.

    Reference ``fc`` + ``g_fc`` submodules (models/PDGNet_v2.py:682-694).
    Returns ``xs (B, Fout)`` and optionally ``g (B, 512)``.
    """

    fin: int
    fout: int
    with_g: bool = True
    axis_name: Optional[str] = None
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, pooled):
        dt = self.dtype
        xs = pooled                                           # (B, Fin)
        xs = leaky_relu(BatchNorm(axis_name=self.axis_name, dtype=dt,
                                  name="bn_fc1")(
            TorchDense(self.fin, dtype=dt, name="fc1")(xs)))
        xs = leaky_relu(BatchNorm(axis_name=self.axis_name, dtype=dt,
                                  name="bn_fc2")(
            TorchDense(self.fout, dtype=dt, name="fc2")(xs)))
        if not self.with_g:
            return xs, None
        g = leaky_relu(BatchNorm(axis_name=self.axis_name, dtype=dt,
                                 name="bn_g")(
            TorchDense(512, dtype=dt, name="g_fc")(xs)))
        return xs, g


class BilateralBlock(nn.Module):
    """One progressive stage (reference ``bilateral_block_l{1..4}``,
    models/PDGNet_v2.py:672-818).

    Stage 1 uses the plain :class:`UpsampleEdgeConv`; stages 2-4 use the
    bilateral variant conditioned on the previous coordinate head. Stage 4
    has no global ``g`` branch.
    """

    fin: int
    fout: int
    k: int
    bilateral: bool = True
    with_g: bool = True
    softmax: bool = True
    axis_name: Optional[str] = None
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, pc=None, xs_in=None):
        """``x``: per-point features — the full stage input when
        ``xs_in`` is None (stage 1), else the per-point half ``x_ec`` of
        the previous stage whose per-batch half is ``xs_in (B, C/2)``.

        Returns ``(xs_new, g, ec_new)`` — the reference's
        ``x_out = cat([xs_new·repeat, ec_new])`` and
        ``g_out = cat([g·repeat, ec_new])`` (models/PDGNet_v2.py:785-788)
        are never materialised; consumers decompose against the pair.
        """
        B, N, _ = x.shape
        # maxpool of the (virtual) concat: the broadcast half maxes to
        # itself, the per-point half reduces over points
        pooled = jnp.max(x, axis=1)
        if xs_in is not None:
            pooled = jnp.concatenate([xs_in, pooled], axis=-1)
        xs, g = _GlobalBranch(self.fin, self.fout, with_g=self.with_g,
                              axis_name=self.axis_name,
                              dtype=self.dtype)(pooled)
        if self.bilateral:
            x_ec = BilateralUpsampleEdgeConv(
                self.fin, self.fout, self.k, softmax=self.softmax,
                axis_name=self.axis_name, dtype=self.dtype,
                name="upsample_cov")(x, pc, xs=xs_in)
        else:
            x_ec = UpsampleEdgeConv(
                self.fin, self.fout, self.k,
                axis_name=self.axis_name, dtype=self.dtype,
                name="upsample_cov")(x)
        # post-upsample BN + LeakyReLU (reference wraps the edge conv in
        # Sequential(BatchNorm1d, LeakyReLU) / bn_uc+relu_uc)
        x_ec = _pin(self.dtype, leaky_relu(
            BatchNorm(axis_name=self.axis_name, dtype=self.dtype,
                      name="bn_uc")(x_ec)))
        return xs, g, x_ec


class PairMLP(nn.Module):
    """:class:`MLP` with the first layer decomposed against a
    ``(g, ec)`` pair whose concat is the reference's head input
    (``g_out``/``x_out``, models/PDGNet_v2.py:785-788, 869-876).

    ``g (B, Cg)`` is identical for every point, so its contraction is one
    per-batch GEMM; the big per-point GEMM contracts only ``ec``'s
    channels and the concat tensor never exists. Identical parameter tree
    to :class:`MLP` (TorchDense_0..n / dense), so checkpoints interop.
    """

    features: Tuple[int, ...]
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, g, ec):
        cg = g.shape[-1]
        cin = cg + ec.shape[-1]
        f0 = self.features[0]
        kernel, bias = _DenseParams((cin, f0), fan_in=cin,
                                    name="TorchDense_0")()
        dt = self.dtype
        gd, ecd, ktop, kbot = _cast(dt, g, ec, kernel[:cg], kernel[cg:])
        pb = jnp.matmul(gd, ktop, **_MMF32) + bias           # (B, F0) f32
        x = _to(dt, jnp.matmul(ecd, kbot, **_MMF32) + pb[:, None, :])
        x = leaky_relu(x)
        for i, f in enumerate(self.features[1:-1]):
            x = TorchDense(f, dtype=dt, name=f"TorchDense_{i + 1}")(x)
            x = leaky_relu(x)
        return TorchDense(self.features[-1], dtype=dt,
                          name=f"TorchDense_{len(self.features) - 1}")(x)


class PointGenerator(nn.Module):
    """128-d noise -> four point clouds (B,256,3)...(B,2048,3).

    Reference ``PointGenerator`` (models/PDGNet_v2.py:820-877). Channel
    schedule 32 -> 64 -> 128 -> 256 -> 512(concat); point schedule
    128 -> 256 -> 512 -> 1024 -> 2048; ``num_k`` is halved inside blocks.
    """

    num_point: int = 2048
    num_k: int = 20
    softmax: bool = True
    axis_name: Optional[str] = None
    # compute/storage dtype for every large activation (GEMM outputs,
    # gathers, batch norms, layout ops). Params, BN statistics and the
    # coordinate heads' outputs stay fp32; MXU accumulation is fp32.
    dtype: Optional[str] = None
    # first-stage point count; 128 reproduces the reference (fc1 -> 4096 =
    # 32ch x 128pts). Smaller values shrink every stage proportionally —
    # used by smoke tests; must stay > num_k // 2.
    base_points: int = 128

    @nn.compact
    def __call__(self, z) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        B = z.shape[0]
        k = self.num_k // 2
        an = self.axis_name

        x = TorchDense(32 * self.base_points, name="fc1")(z)
        x = BatchNorm(axis_name=an, name="fc1_bn")(x)
        x = leaky_relu(x)
        # torch view(B, 32, 128) is (channel, point); transpose to (B, N, C)
        x = x.reshape(B, 32, self.base_points).transpose(0, 2, 1)
        # compute dtype applies from the first block on: all large
        # activations (gathers, batch norms, layout ops) are stored in it
        x = _to(self.dtype, x)

        dt = self.dtype
        b1 = BilateralBlock(32, 32, k, bilateral=False, axis_name=an,
                            dtype=dt, name="bilateral1")
        b2 = BilateralBlock(64, 64, k, softmax=self.softmax, axis_name=an,
                            dtype=dt, name="bilateral2")
        b3 = BilateralBlock(128, 128, k, softmax=self.softmax, axis_name=an,
                            dtype=dt, name="bilateral3")
        b4 = BilateralBlock(256, 256, k, with_g=False,
                            softmax=self.softmax, axis_name=an,
                            dtype=dt, name="bilateral4")

        # every stage's x_out/g_out concat (reference models/PDGNet_v2.py:
        # 785-788) stays a (per-batch, per-point) PAIR end to end: the
        # broadcast halves collapse to per-batch GEMM biases in every
        # consumer (edge head, global branch, coordinate heads)
        xs1, g1, ec1 = b1(x)                 # (B,32), (B,512), (B,256,32)
        x1s = PairMLP([256, 64, 3], dtype=dt, name="mlp1")(g1, ec1)
        xs2, g2, ec2 = b2(ec1, x1s, xs_in=xs1)
        x2s = PairMLP([256, 64, 3], dtype=dt, name="mlp2")(g2, ec2)
        xs3, g3, ec3 = b3(ec2, x2s, xs_in=xs2)
        x3s = PairMLP([256, 64, 3], dtype=dt, name="mlp3")(g3, ec3)
        xs4, _, ec4 = b4(ec3, x3s, xs_in=xs3)
        x4s = PairMLP([256, 64, 3], dtype=dt, name="mlp4")(xs4, ec4)
        # coordinate heads in fp32 regardless of compute dtype
        return tuple(o.astype(jnp.float32) for o in (x1s, x2s, x3s, x4s))
