"""LSGAN (least-squares GAN) objectives.

The reference uses ``nn.MSELoss`` against constant 1/0 targets
(models/PDGNet_v2.py:116,187-253). Mean reduction, matching torch.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray,
             mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """torch ``nn.MSELoss`` (mean reduction).

    ``mask`` (B,) weights samples — the mean runs over real rows only
    (padded-batch support; see models.layers.batch_mask).
    """
    sq = jnp.square(pred - target)
    if mask is None:
        return jnp.mean(sq)
    w = mask.astype(sq.dtype).reshape((-1,) + (1,) * (sq.ndim - 1))
    per = 1.0
    for d in sq.shape[1:]:
        per *= d
    return jnp.sum(sq * w) / (jnp.sum(w) * per)


def d_loss(pred_real: jnp.ndarray, pred_fake: jnp.ndarray,
           mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Discriminator LSGAN loss: ``(MSE(real,1) + MSE(fake,0)) / 2``.

    Matches reference models/PDGNet_v2.py:187-189.
    """
    return (
        mse_loss(pred_real, jnp.ones_like(pred_real), mask)
        + mse_loss(pred_fake, jnp.zeros_like(pred_fake), mask)
    ) / 2.0


def g_adv_loss(pred_fake: jnp.ndarray,
               mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Generator LSGAN loss: ``MSE(fake, 1)``."""
    return mse_loss(pred_fake, jnp.ones_like(pred_fake), mask)
