"""Shared NN building blocks (flax.linen, channel-last).

TPU-native equivalents of the reference layer helpers:
``conv2dbr``/``conv1dbr``/``fcbr`` (reference utils/nn_utils.py:10-74 and
models/PDGNet_v2.py:530-545). In channel-last layout every 1x1 conv is a
``Dense`` over the trailing axis — a single MXU matmul over the flattened
(batch, points) rows.

Initialisation matches torch defaults (kaiming-uniform with a=sqrt(5) for
weights, fan-in uniform for biases) so training dynamics are comparable to
the reference.

BatchNorm matches torch semantics: eps 1e-5, running-stat momentum 0.1,
and — critically — *batch statistics are used at all times*, because the
reference never calls ``.eval()``: its test phase runs BN in training mode
(reference models/PDGNet_v2.py:302-307 generates with the module still in
train mode). ``axis_name`` enables cross-replica (sync) batch norm — the
TPU equivalent of the vendored-but-unused lib/sync_bn (SURVEY.md §2.3).
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

# ---------------------------------------------------------------- batch mask
# Per-sample weights for batch statistics and loss reductions. When the
# global batch is padded up to a device-count multiple (parallel/mesh
# padding instead of mesh shrinking), every BatchNorm in scope computes
# mask-weighted statistics so the padded rows are invisible — metrics are
# bit-comparable to the unpadded run. The mask is delivered through a
# trace-time context (set by the train step around its whole trace)
# rather than threaded through every module signature.
#
# Single-threaded-trace assumption: like ops.edges._EXACT_KNN_OVERRIDE,
# this is plain module state consulted at TRACE time — jax traces on the
# caller's thread, so scoping is correct for the normal jit workflow but
# two threads tracing concurrently with different masks would race.
_MASK_STACK: list = []


@contextlib.contextmanager
def batch_mask(mask: Optional[jnp.ndarray]):
    """Scope a per-sample ``(B,)`` weight vector over traced model calls.

    ``None`` is a no-op scope (convenient for call sites that may or may
    not have padding).
    """
    if mask is None:
        yield
        return
    _MASK_STACK.append(mask)
    try:
        yield
    finally:
        _MASK_STACK.pop()


def current_batch_mask() -> Optional[jnp.ndarray]:
    return _MASK_STACK[-1] if _MASK_STACK else None


def masked_moments(x: jnp.ndarray, mask: jnp.ndarray, axes=None):
    """Mask-weighted per-feature (last-axis) mean and biased variance.

    ``axes`` defaults to all axes but the last; axis 0 must be the batch.
    """
    xf = x.astype(jnp.float32)
    if axes is None:
        axes = tuple(range(x.ndim - 1))
    w = mask.astype(jnp.float32).reshape((-1,) + (1,) * (x.ndim - 1))
    per_sample = 1.0
    for a in axes:
        if a != 0:
            per_sample *= x.shape[a]
    # guard the all-padded edge case (trainer masks always keep >=1 real
    # row, but the helper is public): clamp instead of NaN-ing
    denom = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0) * per_sample
    mean = jnp.sum(xf * w, axis=axes) / denom
    mean2 = jnp.sum(jnp.square(xf) * w, axis=axes) / denom
    var = jnp.maximum(0.0, mean2 - jnp.square(mean))
    return mean, var


def torch_kaiming_uniform(fan_in_axes: Optional[Sequence[int]] = None):
    """torch's default ``kaiming_uniform_(a=sqrt(5))`` weight init.

    Reduces to ``U(-1/sqrt(fan_in), 1/sqrt(fan_in))``.
    """

    def init(key, shape, dtype=jnp.float32):
        # flax Dense kernels are (in, out); convs are (*window, in, out)
        fan_in = 1
        for d in shape[:-1]:
            fan_in *= d
        bound = 1.0 / jnp.sqrt(jnp.maximum(fan_in, 1.0))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_bias_uniform(fan_in: int):
    """torch's default bias init: ``U(-1/sqrt(fan_in), 1/sqrt(fan_in))``."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / (fan_in ** 0.5)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchDense(nn.Module):
    """``nn.Linear``-compatible Dense (torch default init)."""

    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=torch_kaiming_uniform(),
            bias_init=torch_bias_uniform(fan_in),
            dtype=self.dtype,
            name="dense",
        )(x)


class BatchNorm(nn.Module):
    """Torch-semantics batch norm over all axes but the last.

    Always normalises with the *current batch* statistics (the reference
    never switches BN to eval mode); running averages are still tracked in
    the ``batch_stats`` collection for checkpoint parity. When
    ``axis_name`` is set the batch statistics are additionally averaged
    across that mapped/sharded axis — the sync-BN equivalent.
    """

    momentum: float = 0.9  # flax convention == torch momentum 0.1
    epsilon: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Optional[Dtype] = None
    # paired mode: a rank-4 ``(2, B, ..., C)`` input is treated as two
    # *independent* batches (real | fake) sharing one layer: statistics are
    # computed per leading half and the running averages fold the two
    # updates sequentially (half 0 first) — bit-for-bit the same math as
    # two separate calls, in one pass. See train_step.d_update.
    paired: bool = False

    @nn.compact
    def __call__(self, x):
        mask = current_batch_mask()
        if self.paired and x.ndim == 4:
            return self._paired_call(x, mask)
        if mask is None:
            # manual stats + normalise (same math and variable tree as
            # flax nn.BatchNorm, which this replaced): keeping the fp32
            # upcasts as leaf ops lets XLA fuse them into the stats
            # reduce and the normalise elementwise — nn.BatchNorm's
            # shared upcast materialised a full fp32 copy of bf16
            # activations (measured ~2.8 ms/fwd on the B=128 sampler)
            axes = tuple(range(x.ndim - 1))
            n = 1.0
            for a in axes:
                n *= x.shape[a]
            xf = x.astype(jnp.float32)
            mean = jnp.sum(xf, axes) / n
            mean2 = jnp.sum(jnp.square(xf), axes) / n
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            # clamp at 0: the E[x^2] - E[x]^2 form can go slightly
            # negative in floating point (consistent with the masked and
            # paired paths, which already clamp)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            scale, bias = _BNStatsVars(momentum=self.momentum, name="bn")(
                mean, var)
            s = scale * jax.lax.rsqrt(var + self.epsilon)
            y = x.astype(jnp.float32) * s + (bias - mean * s)
            out_dt = (self.dtype if self.dtype is not None
                      else jnp.promote_types(x.dtype, jnp.float32))
            return y.astype(out_dt)
        # masked path (padded batch): weighted statistics over the real
        # rows only, same variable tree as nn.BatchNorm(name="bn")
        if self.axis_name is not None:
            raise NotImplementedError(
                "masked BatchNorm under an explicit axis_name; the jit "
                "data-parallel path computes global stats without one")
        mean, var = masked_moments(x, mask)
        scale, bias = _BNStatsVars(momentum=self.momentum, name="bn")(
            mean, var)
        y = ((x.astype(jnp.float32) - mean) * jax.lax.rsqrt(
            var + self.epsilon) * scale + bias)
        out_dt = self.dtype if self.dtype is not None else jnp.promote_types(
            x.dtype, jnp.float32)
        return y.astype(out_dt)

    def _paired_call(self, x, mask):
        """Two stacked batches ``(2, B, ..., C)`` through one BN layer."""
        if self.axis_name is not None and mask is not None:
            raise NotImplementedError(
                "masked BatchNorm under an explicit axis_name; the jit "
                "data-parallel path computes global stats without one")
        axes = tuple(range(1, x.ndim - 1))
        xf = x.astype(jnp.float32)
        if mask is None:
            n = 1.0
            for a in axes:
                n *= x.shape[a]
            mean = jnp.sum(xf, axes) / n                     # (2, C)
            mean2 = jnp.sum(jnp.square(xf), axes) / n
        else:
            w = mask.astype(jnp.float32).reshape(
                (1, -1) + (1,) * (x.ndim - 2))
            per_sample = 1.0
            for a in axes[1:]:
                per_sample *= x.shape[a]
            denom = jnp.maximum(jnp.sum(mask.astype(jnp.float32)),
                                1.0) * per_sample
            mean = jnp.sum(xf * w, axes) / denom
            mean2 = jnp.sum(jnp.square(xf) * w, axes) / denom
        if self.axis_name is not None:
            mean = jax.lax.pmean(mean, self.axis_name)
            mean2 = jax.lax.pmean(mean2, self.axis_name)
        var = jnp.maximum(0.0, mean2 - jnp.square(mean))
        scale, bias = _BNStatsVars(momentum=self.momentum, name="bn")(
            mean, var, paired=True)
        bshape = (2,) + (1,) * (x.ndim - 2) + (mean.shape[-1],)
        s = (scale * jax.lax.rsqrt(var + self.epsilon)).reshape(bshape)
        y = xf * s + (bias - mean.reshape(bshape) * s)
        out_dt = (self.dtype if self.dtype is not None
                  else jnp.promote_types(x.dtype, jnp.float32))
        return y.astype(out_dt)


class _BNStatsVars(nn.Module):
    """Inner variable holder mirroring flax ``nn.BatchNorm``'s layout."""

    momentum: float = 0.9

    @nn.compact
    def __call__(self, mean, var, update: bool = True, paired: bool = False):
        # paired: mean/var are (2, C) per-half statistics; parameters stay
        # (C,) and the running averages fold the two EMA updates
        # sequentially (half 0 first), matching two separate calls
        feat_shape = mean.shape[-1:] if paired else mean.shape
        scale = self.param("scale", nn.initializers.ones, feat_shape,
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, feat_shape,
                          jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros(feat_shape, jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones(feat_shape, jnp.float32))
        if update and not self.is_initializing():
            m = self.momentum
            if paired:
                ra_mean.value = (m * (m * ra_mean.value
                                      + (1.0 - m) * mean[0])
                                 + (1.0 - m) * mean[1])
                ra_var.value = (m * (m * ra_var.value
                                     + (1.0 - m) * var[0])
                                + (1.0 - m) * var[1])
            else:
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var
        return scale, bias


class BatchNormFold(nn.Module):
    """Variable-compatible BatchNorm stand-in for fused normalisation.

    Consumes *precomputed* batch statistics (so the callers can fold the
    normalisation into a fused kernel — see pdgn_tpu.ops.pallas.
    bilateral_tail) while creating exactly the same parameters
    (``bn/{scale,bias}``) and running statistics (``bn/{mean,var}``,
    momentum update) as :class:`BatchNorm`, so parameter trees and
    checkpoints are interchangeable between the fused and unfused paths.

    Returns ``(mean, var, scale, bias)``.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, mean, var, update: bool = True, paired: bool = False):
        scale, bias = _BNStatsVars(self.momentum, name="bn")(mean, var,
                                                             update, paired)
        return mean, var, scale, bias


def linear_bn_stats(x, kernel, bias, axis_name, paired: bool = False):
    """Batch statistics of ``y = x @ kernel + bias`` without a stats pass
    over y.

    For a linear layer, ``E[y_c] = m·W_c + b_c`` and
    ``E[y_c^2] = W_c^T S W_c + 2 b_c (m·W_c) + b_c^2`` with
    ``S = E[x x^T]`` — a (C_in, C_in) second-moment contraction instead of
    a full-tensor pass over the (much larger) output. Exact modulo fp
    ordering, and it lets XLA fuse the BN scale/shift into the GEMM
    epilogue: the activation is written once, normalised. Honours the
    ambient batch mask (padded batches).
    """
    mask = current_batch_mask()
    if mask is not None and axis_name is not None:
        # per-shard mask-weighted moments cannot be pmean-ed unweighted
        # when shards carry unequal real-row counts; match BatchNorm's
        # explicit refusal rather than silently computing wrong stats
        raise NotImplementedError(
            "masked linear_bn_stats under an explicit axis_name; the jit "
            "trainer handles padded batches with a global mask instead")
    if paired:
        # (2, B, ..., C): independent real|fake halves — (2, C)/(2, C, C)
        # moments via one batched contraction, stats per half
        rows_per_sample = 1
        for d in x.shape[2:-1]:
            rows_per_sample *= d
        if mask is None:
            xf = x.astype(jnp.float32).reshape(2, -1, x.shape[-1])
            m_rows = float(xf.shape[1])
        else:
            w = mask.astype(jnp.float32)
            xf = x.astype(jnp.float32).reshape(
                2, x.shape[1], -1, x.shape[-1])
            xf = (xf * w[None, :, None, None]).reshape(2, -1, x.shape[-1])
            m_rows = jnp.maximum(jnp.sum(w), 1.0) * float(rows_per_sample)
        m_x = jnp.sum(xf, axis=1) / m_rows                   # (2, C)
        s_mat = jnp.einsum(
            "hrc,hrd->hcd", xf, xf, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32) / m_rows     # (2, C, C)
        if axis_name is not None:
            m_x = jax.lax.pmean(m_x, axis_name)
            s_mat = jax.lax.pmean(s_mat, axis_name)
        kf = kernel.astype(jnp.float32)
        bf = bias.astype(jnp.float32)
        mk = m_x @ kf                                        # (2, F)
        mean = mk + bf
        ex2 = (jnp.sum(kf * (s_mat @ kf), axis=1)
               + 2.0 * bf * mk + bf * bf)
        return mean, jnp.maximum(0.0, ex2 - jnp.square(mean))
    rows_per_sample = 1
    for d in x.shape[1:-1]:
        rows_per_sample *= d
    if mask is None:
        xf = x.astype(jnp.float32).reshape(-1, x.shape[-1])
        m_rows = float(xf.shape[0])
    else:
        w = mask.astype(jnp.float32)
        xf = x.astype(jnp.float32).reshape(x.shape[0], -1, x.shape[-1])
        # binary mask: w^2 == w, so pre-scaling rows yields the weighted
        # second moment from the plain matmul
        xf = (xf * w[:, None, None]).reshape(-1, x.shape[-1])
        m_rows = jnp.maximum(jnp.sum(w), 1.0) * float(rows_per_sample)
    m_x = jnp.sum(xf, axis=0) / m_rows                       # (C,)
    s_mat = jnp.matmul(
        xf.T, xf, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32) / m_rows         # (C, C)
    if axis_name is not None:
        m_x = jax.lax.pmean(m_x, axis_name)
        s_mat = jax.lax.pmean(s_mat, axis_name)
    kf = kernel.astype(jnp.float32)
    bf = bias.astype(jnp.float32)
    mk = m_x @ kf                                            # (F,)
    mean = mk + bf
    ex2 = jnp.sum(kf * (s_mat @ kf), axis=0) + 2.0 * bf * mk + bf * bf
    return mean, jnp.maximum(0.0, ex2 - jnp.square(mean))


class DenseBR(nn.Module):
    """Dense + BN + activation (== reference ``fcbr``/``conv1dbr``).

    A 1x1 Conv1d over channel-last data *is* a Dense over the last axis, so
    this one block covers both reference helpers. The BN statistics come
    from the linear second-moment identity (:func:`linear_bn_stats`) —
    exact, but with no stats pass over the activation, so the whole block
    is one GEMM with a fused normalise+activate epilogue. This is the
    discriminators' entire conv stack (reference PointDiscriminator_1..4,
    models/PDGNet_v2.py:882-1023).
    """

    features: int
    negative_slope: Optional[float] = None  # None -> plain ReLU
    axis_name: Optional[str] = None
    dtype: Optional[Dtype] = None
    paired: bool = False  # (2, B, ..., C) real|fake halves — see BatchNorm

    @nn.compact
    def __call__(self, x):
        p = self.paired and x.ndim == 4
        # the identity costs an fp32-exact (C_in, C_in) contraction of x;
        # it beats the full stats pass over y only while C_in is narrow
        # (measured on v5e: D1 6.2 -> 4.0 ms, but D4's 256-wide layer
        # regresses) — wide layers keep the plain BatchNorm
        if x.shape[-1] > 128:
            y = TorchDense(self.features, dtype=self.dtype)(x)
            y = BatchNorm(axis_name=self.axis_name, dtype=self.dtype,
                          paired=p)(y)
            if self.negative_slope is None:
                return nn.relu(y)
            return nn.leaky_relu(y, self.negative_slope)
        d = TorchDense(self.features, dtype=self.dtype, name="TorchDense_0")
        y = d(x)
        kernel = d.variables["params"]["dense"]["kernel"]
        bias = d.variables["params"]["dense"]["bias"]
        mean, var = linear_bn_stats(x, kernel, bias, self.axis_name,
                                    paired=p)
        # same variable tree as the previous BatchNorm(name="BatchNorm_0")
        _, _, scale, shift = BatchNormFold(name="BatchNorm_0")(mean, var,
                                                               paired=p)
        eps = 1e-5
        s = scale * jax.lax.rsqrt(var + eps)
        off = shift - mean * s
        if p:  # (2, F) stats against (2, B, ..., F) activations
            bshape = (2,) + (1,) * (x.ndim - 2) + (self.features,)
            s = s.reshape(bshape)
            off = off.reshape(bshape)
        y = y.astype(jnp.float32) * s + off
        out_dt = self.dtype if self.dtype is not None else jnp.promote_types(
            x.dtype, jnp.float32)
        y = y.astype(out_dt)
        if self.negative_slope is None:
            return nn.relu(y)
        return nn.leaky_relu(y, self.negative_slope)


def leaky_relu(x, negative_slope: float = 0.01):
    """torch-default LeakyReLU (slope 0.01)."""
    return nn.leaky_relu(x, negative_slope)


class DenseBRPool(nn.Module):
    """Dense + BN + LeakyReLU + global max-pool over the point axis,
    without materialising the normalised tensor.

    BN's normalise is a per-channel affine ``s*y + t`` and LeakyReLU is
    monotone *increasing*, so
    ``max_n act(s*y_n + t) == act(s * (s>0 ? max_n y_n : min_n y_n) + t)``
    exactly — the same float ops applied to the same winning element. The
    widest discriminator activation (256/512/1024 channels over all
    points; reference PointDiscriminator_1..4 max_pool, models/
    PDGNet_v2.py:905-1016) is therefore reduced straight from the GEMM
    output: one max+min+sum+sum² pass instead of a full normalise
    write/read plus a pooling pass. Identical parameter/stat tree to
    ``DenseBR`` (conv{i}/TorchDense_0 + BatchNorm_0/bn).

    Input ``(B, N, C)`` (or paired ``(2, B, N, C)``) -> pooled
    ``(B, F)`` (or ``(2, B, F)``), always fp32.
    """

    features: int
    negative_slope: float = 0.01
    axis_name: Optional[str] = None
    dtype: Optional[Dtype] = None
    paired: bool = False

    @nn.compact
    def __call__(self, x):
        p = self.paired and x.ndim == 4
        d = TorchDense(self.features, dtype=self.dtype, name="TorchDense_0")
        yf = d(x).astype(jnp.float32)
        mask = current_batch_mask()
        if mask is not None and self.axis_name is not None:
            raise NotImplementedError(
                "masked BatchNorm under an explicit axis_name; the jit "
                "data-parallel path computes global stats without one")
        # batch statistics over all rows (masked rows excluded); reduction
        # axes: everything but channels, and but the pair axis if present
        axes = tuple(range(1, yf.ndim - 1)) if p else tuple(
            range(yf.ndim - 1))
        if mask is None:
            n = 1.0
            for a in axes:
                n *= yf.shape[a]
            mean = jnp.sum(yf, axes) / n
            mean2 = jnp.sum(jnp.square(yf), axes) / n
        else:
            batch_axis = 1 if p else 0
            wshape = [1] * yf.ndim
            wshape[batch_axis] = -1
            w = mask.astype(jnp.float32).reshape(wshape)
            per_sample = 1.0
            for a in axes:
                if a != batch_axis:
                    per_sample *= yf.shape[a]
            denom = jnp.maximum(jnp.sum(mask.astype(jnp.float32)),
                                1.0) * per_sample
            mean = jnp.sum(yf * w, axes) / denom
            mean2 = jnp.sum(jnp.square(yf) * w, axes) / denom
        if self.axis_name is not None:
            mean = jax.lax.pmean(mean, self.axis_name)
            mean2 = jax.lax.pmean(mean2, self.axis_name)
        var = jnp.maximum(0.0, mean2 - jnp.square(mean))
        _, _, scale, bias = BatchNormFold(name="BatchNorm_0")(mean, var,
                                                              paired=p)
        eps = 1e-5
        s = scale * jax.lax.rsqrt(var + eps)
        t = bias - mean * s
        # per-sample pooling never crosses samples, so the batch mask is
        # irrelevant here (padded samples' logits are masked in the loss)
        ymax = jnp.max(yf, axis=-2)                  # (..., B, F)
        ymin = jnp.min(yf, axis=-2)
        if p:
            s = s[:, None, :]
            t = t[:, None, :]
        pooled = jnp.where(s > 0, ymax, ymin)
        return nn.leaky_relu(pooled * s + t, self.negative_slope)


class DenseDBR(nn.Module):
    """Dense + Dropout + BN + activation (== reference ``fcdbr``,
    utils/nn_utils.py:26-41)."""

    features: int
    drop_rate: float = 0.5
    negative_slope: Optional[float] = None
    axis_name: Optional[str] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = TorchDense(self.features, dtype=self.dtype)(x)
        x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)
        x = BatchNorm(axis_name=self.axis_name, dtype=self.dtype)(x)
        if self.negative_slope is None:
            return nn.relu(x)
        return nn.leaky_relu(x, self.negative_slope)


class MLP(nn.Module):
    """Stack of Dense layers with LeakyReLU between (no BN).

    Matches the reference coordinate heads ``mlp1..4``
    (models/PDGNet_v2.py:835-862): Conv1d(1x1) + LeakyReLU pairs with a
    final biased Conv1d(1x1) projection.
    """

    features: Sequence[int]
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        for f in self.features[:-1]:
            x = TorchDense(f, dtype=self.dtype)(x)
            x = leaky_relu(x)
        return TorchDense(self.features[-1], dtype=self.dtype)(x)
