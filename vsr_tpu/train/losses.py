"""GAN losses (parity with backend/tools/train/loss_sttn.py:5-57)."""

from __future__ import annotations

import jax.numpy as jnp


def adversarial_loss(
    outputs: jnp.ndarray,
    is_real: bool,
    is_disc: bool,
    gan_type: str = "hinge",
) -> jnp.ndarray:
    """hinge | nsgan | lsgan adversarial loss.

    hinge: disc -> mean(relu(1 -/+ out)); gen -> -mean(out).
    """
    if gan_type == "hinge":
        if is_disc:
            signed = -outputs if is_real else outputs
            return jnp.mean(jnp.maximum(1.0 + signed, 0.0))
        return -jnp.mean(outputs)
    labels = jnp.full_like(outputs, 1.0 if is_real else 0.0)
    if gan_type == "nsgan":
        # BCE over sigmoid outputs (discriminator runs with use_sigmoid=True)
        return jnp.mean(
            -(labels * jnp.log(outputs + 1e-8)
              + (1 - labels) * jnp.log(1 - outputs + 1e-8))
        )
    if gan_type == "lsgan":
        return jnp.mean((outputs - labels) ** 2)
    raise ValueError(f"unknown gan loss: {gan_type}")


def masked_l1(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """L1 over the masked region, normalized by mask density (trainer_sttn.py:289-303)."""
    return jnp.mean(jnp.abs(pred * mask - target * mask)) / jnp.clip(jnp.mean(mask), 1e-8)
