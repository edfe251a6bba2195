"""LSGAN (least-squares GAN) objectives.

The reference uses ``nn.MSELoss`` against constant 1/0 targets
(models/PDGNet_v2.py:116,187-253). Mean reduction, matching torch.
"""

from __future__ import annotations

import jax.numpy as jnp


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """torch ``nn.MSELoss`` (mean reduction)."""
    return jnp.mean(jnp.square(pred - target))


def d_loss(pred_real: jnp.ndarray, pred_fake: jnp.ndarray) -> jnp.ndarray:
    """Discriminator LSGAN loss: ``(MSE(real,1) + MSE(fake,0)) / 2``.

    Matches reference models/PDGNet_v2.py:187-189.
    """
    return (
        mse_loss(pred_real, jnp.ones_like(pred_real))
        + mse_loss(pred_fake, jnp.zeros_like(pred_fake))
    ) / 2.0


def g_adv_loss(pred_fake: jnp.ndarray) -> jnp.ndarray:
    """Generator LSGAN loss: ``MSE(fake, 1)``."""
    return mse_loss(pred_fake, jnp.ones_like(pred_fake))
