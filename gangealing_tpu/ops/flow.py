"""Flow-field regularizers and utilities.

Capability reference: models/losses/loss.py:4-18 (total_variation_loss,
flow_identity_loss).
"""

import jax.numpy as jnp


def _huber(a, reduce_dims):
    return jnp.mean(jnp.where(a <= 1.0, 0.5 * a ** 2, a - 0.5),
                    axis=reduce_dims)


def total_variation_loss(delta_flow, reduce_batch=True):
    """Smoothed-L1 total variation on an (N, H, W, 2) residual flow."""
    assert delta_flow.shape[-1] == 2
    reduce_dims = (0, 1, 2, 3) if reduce_batch else (1, 2, 3)
    diff_y = _huber(jnp.abs(delta_flow[:, :-1] - delta_flow[:, 1:]),
                    reduce_dims)
    diff_x = _huber(jnp.abs(delta_flow[:, :, :-1] - delta_flow[:, :, 1:]),
                    reduce_dims)
    return diff_x + diff_y


def flow_identity_loss(delta_flow):
    """L2 pull toward the identity (zero residual flow)."""
    return jnp.mean(delta_flow ** 2)
