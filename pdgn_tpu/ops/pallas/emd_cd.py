"""Fused Chamfer + approximate-EMD Pallas TPU kernel.

One grid step processes one cloud pair entirely in VMEM: the (n, m)
kernel/distance matrix is never materialised in HBM — distance tiles are
recomputed from the (3, n) coordinate blocks on the MXU, the nine
approxmatch balancing rounds (reference approxmatch.cu:3-182; see
pdgn_tpu.losses.emd for the algorithm) run as MXU matvecs against column
vectors, and the Chamfer row/column minima fall out of round 0's tiles for
free.

HBM traffic per pair: ~50 KB (coordinates + two scalars) versus the
reference's ~0.6 GB (match-matrix reads/writes per kernel launch) — this
kernel is the reason the ~2 h evaluation phase fits in minutes.

Design (as measured; see PERF.md for the optimization log):
* distance tiles come from direct per-channel broadcast differences
  (coordinates are passed in both ``(B, n, 3)`` and ``(B, 3, n)``
  layouts) — fp32-exact and far cheaper than a 3-deep MXU contraction;
* euclidean distances are computed once (round 0) into an fp32 VMEM
  cache; each round's kernel matrix K = exp(level * d2) is computed once
  into a second fp32 VMEM cache and reused by all three passes;
* remainL/ratioL are column vectors, remainR/ratioR are row vectors, so
  every contraction is a VPU broadcast + lane/sublane reduction — a
  1-column MXU matvec would idle 127/128 of the systolic array.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROUNDS = 9        # j = 7 .. -1, level = -4^j
_TILE = 512        # preferred row-tile size (256 fallback)
def _kernel(tile, x1c_ref, x2c_ref, x1r_ref, x2r_ref,
            cost_ref, cd_ref,
            remainL, remainR, ratioL, ratioR, rowmin, colmin, acc, kbuf,
            dbuf):
    _TILE = tile
    n = x1c_ref.shape[1]
    m = x2c_ref.shape[1]
    nt = n // _TILE
    mt = m // _TILE

    # remainL/ratioL live as column vectors (consumed per row tile);
    # remainR/ratioR live as ROW vectors so the row-tile contractions run
    # as VPU broadcast + lane reductions instead of 1-column MXU matvecs
    remainL[:, :] = jnp.ones((n, 1), jnp.float32)
    remainR[:, :] = jnp.ones((1, m), jnp.float32)
    acc[0, 0] = 0.0

    def d2_row_tile(t):
        """(TILE, m) distances via direct per-channel differences
        (fp32-exact and much cheaper on the VPU than a K=3 MXU matmul
        at HIGHEST precision)."""
        d = jnp.zeros((tile, m), jnp.float32)
        for c in range(3):
            a = x1c_ref[0, pl.ds(t * _TILE, _TILE), c:c + 1]  # (T, 1)
            b = x2r_ref[0, c:c + 1, :]                        # (1, m)
            diff = a - b
            d = d + diff * diff
        return d

    def d2_col_tile(t):
        """(TILE, n) distances: rows = x2 tile, cols = all x1."""
        d = jnp.zeros((tile, n), jnp.float32)
        for c in range(3):
            a = x2c_ref[0, pl.ds(t * _TILE, _TILE), c:c + 1]
            b = x1r_ref[0, c:c + 1, :]
            diff = a - b
            d = d + diff * diff
        return d

    def row_reduce(w, v_row):
        """sum(w * v_row, axis=1): a (T, m) x (1, m) contraction on the
        VPU — a 1-column MXU matvec would idle 127/128 of the array."""
        return jnp.sum(w * v_row, axis=1, keepdims=True)      # (T, 1)

    def round_body(r, _):
        level = -jnp.exp2(14.0 - 2.0 * r.astype(jnp.float32))

        # ---- pass 1: ratioL = remainL / (K @ remainR + 1e-9); the kernel
        # matrix is computed ONCE per round here and cached in VMEM as
        # bf16 for passes 2 and 3 (the XLA path recomputes the exp; the
        # exps are a large share of the VPU work)
        def p1(t, _):
            sl = pl.ds(t * _TILE, _TILE)

            @pl.when(r == 0)
            def _():
                # distances don't change across rounds: compute once,
                # cache the euclidean form for the cost pass
                d2 = d2_row_tile(t)
                dbuf[sl, :] = jnp.sqrt(jnp.maximum(d2, 0.0))
                rowmin[sl, :] = jnp.min(d2, axis=1, keepdims=True)

            dist = dbuf[sl, :]
            # NOTE: the VPU's native exp beats the polynomial fast-exp
            # here too (3,580 vs 2,560 pairs/s measured) — the
            # transcendental unit is genuinely fast; see the unused
            # _fast_exp_neg in pdgn_tpu/losses/emd.py for the record.
            k = jnp.exp(level * (dist * dist))
            kbuf[sl, :] = k
            suml = row_reduce(k, remainR[:, :])               # (T, 1)
            ratioL[sl, :] = remainL[sl, :] / (suml + 1e-9)
            return 0

        jax.lax.fori_loop(0, nt, p1, 0)

        # ---- pass 2: right absorption (transposed reads of the K cache;
        # the contraction over n runs as a sublane reduction)
        def p2(t, _):
            sl = pl.ds(t * _TILE, _TILE)
            kc = kbuf[:, sl]                                  # (n, T)
            sumr = jnp.sum(kc * ratioL[:, :], axis=0,
                           keepdims=True)                     # (1, T)
            rr = remainR[0:1, sl]                             # (1, T)
            sumr = sumr * rr
            consumption = jnp.minimum(rr / (sumr + 1e-9), 1.0)
            ratioR[0:1, sl] = consumption * rr
            remainR[0:1, sl] = jnp.maximum(0.0, rr - sumr)

            @pl.when(r == 0)
            def _():
                colmin[sl, :] = jnp.min(d2_col_tile(t), axis=1,
                                        keepdims=True)

            return 0

        jax.lax.fori_loop(0, mt, p2, 0)

        # ---- pass 3: transport increment -> cost, remainL update
        def p3(t, carry):
            sl = pl.ds(t * _TILE, _TILE)
            k = kbuf[sl, :]                                    # (T, m)
            kr = k * ratioR[:, :]                              # (T, m)
            rl = ratioL[sl, :]                                 # (T, 1)
            suml2 = rl * jnp.sum(kr, axis=1, keepdims=True)
            remainL[sl, :] = jnp.maximum(0.0, remainL[sl, :] - suml2)
            contrib = rl * jnp.sum(kr * dbuf[sl, :], axis=1, keepdims=True)
            return carry + jnp.sum(contrib)

        round_cost = jax.lax.fori_loop(0, nt, p3, jnp.float32(0.0))
        acc[0, 0] = acc[0, 0] + round_cost
        return 0

    jax.lax.fori_loop(0, _ROUNDS, round_body, 0)

    cost_ref[0, 0, 0] = acc[0, 0]
    cd_ref[0, 0, 0] = (jnp.sum(rowmin[:, :]) / n + jnp.sum(colmin[:, :]) / m)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_cd_emd(xyz1: jnp.ndarray, xyz2: jnp.ndarray, *,
                 interpret: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pair Chamfer (mean-of-min both directions) and approxmatch cost.

    Args:
      xyz1: ``(B, n, 3)`` with ``n % 256 == 0``.
      xyz2: ``(B, m, 3)`` with ``m % 256 == 0`` and (for the reference
        multipliers to be 1) ``n == m``.

    Returns:
      ``cd (B,)`` — ``dl.mean + dr.mean`` per pair (reference
      evaluation_metrics.py:108) and ``cost (B,)`` — un-normalised
      approxmatch transport cost (divide by n for ``emd_approx``).
    """
    B, n, _ = xyz1.shape
    m = xyz2.shape[1]
    tile = _TILE if (n % _TILE == 0 and m % _TILE == 0) else 256
    if n % tile or m % tile:
        raise ValueError(f"point counts must be multiples of {tile}")
    if n != m:
        raise ValueError("fused kernel assumes n == m (reference test path)")

    x1f = xyz1.astype(jnp.float32)                         # (B, n, 3)
    x2f = xyz2.astype(jnp.float32)
    x1t = jnp.swapaxes(x1f, 1, 2)                          # (B, 3, n)
    x2t = jnp.swapaxes(x2f, 1, 2)

    def spec(shape):
        zeros = (0,) * len(shape)
        return pl.BlockSpec((1,) + shape,
                            lambda i, z=zeros: (i,) + z,
                            memory_space=pltpu.VMEM)

    cost, cd = pl.pallas_call(
        functools.partial(_kernel, tile),
        grid=(B,),
        in_specs=[
            spec((n, 3)), spec((m, 3)),
            spec((3, n)), spec((3, m)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, 1), jnp.float32),   # remainL
            pltpu.VMEM((1, m), jnp.float32),   # remainR (row layout)
            pltpu.VMEM((n, 1), jnp.float32),   # ratioL
            pltpu.VMEM((1, m), jnp.float32),   # ratioR (row layout)
            pltpu.VMEM((n, 1), jnp.float32),   # rowmin
            pltpu.VMEM((m, 1), jnp.float32),   # colmin
            pltpu.SMEM((1, 1), jnp.float32),   # cost accumulator
            pltpu.VMEM((n, m), jnp.float32),   # per-round K cache
            pltpu.VMEM((n, m), jnp.float32),   # euclidean distance cache
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            # ~23 VPU ops per element-round (distances cached; exp once
            # per round; three reduce passes)
            flops=int(B) * _ROUNDS * 23 * n * m,
            bytes_accessed=int(B) * (n + m) * 4 * 8,
            transcendentals=int(B) * (_ROUNDS + 1) * n * m,
        ),
        interpret=interpret,
    )(x1f, x2f, x1t, x2t)
    return cd[:, 0, 0], cost[:, 0, 0]
