"""On-chip learning check for the banded Pallas sampling kernels.

tests/test_convergence.py proves the STN learns to undo affine jitter on
CPU — but on CPU the mipmap warp takes the XLA fold path, so the Pallas
forward/backward kernels are never in the loop. This script runs the same
supervised jitter-undo training at 128px on the REAL TPU, where the banded
kernel (ops/pallas_mipmap.py) carries both the forward and the fused
backward. Passing means the custom VJPs produce gradients good enough for
Adam to drive alignment, not just finite ones.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/tpu_learn_check.py
Expected: loss ratio last10/first10 well under 0.35 after 80 steps.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from gangealing_tpu.models.stn import (
    STNConfig, stn_init, stn_forward,
    ComposedSTNConfig, composed_stn_init, composed_stn_forward)
from test_convergence import _base_image, _jitter


def main():
    composed = "--composed" in sys.argv  # also trains the flow head
    size, batch, steps = 128, 16, 80
    base = _base_image(size)
    if composed:
        cfg = ComposedSTNConfig(transforms=("similarity", "flow"),
                                flow_size=size, supersize=size,
                                channel_multiplier=0.25, max_channels=64,
                                flow_downsample=8)
        params = composed_stn_init(jax.random.PRNGKey(0), cfg)

        def loss_fn(p, imgs):
            out, _, _, _, _ = composed_stn_forward(p, cfg, imgs,
                                                   padding_mode="border")
            return jnp.mean((out - base) ** 2)
    else:
        cfg = STNConfig(transform="similarity", flow_size=size,
                        supersize=size, channel_multiplier=0.25,
                        max_channels=64)
        params = stn_init(jax.random.PRNGKey(0), cfg)

        def loss_fn(p, imgs):
            out, _, _, _ = stn_forward(p, cfg, imgs, padding_mode="border")
            return jnp.mean((out - base) ** 2)
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, key):
        imgs = _jitter(key, base, batch)
        l, g = jax.value_and_grad(loss_fn)(p, imgs)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, l

    losses = []
    for i in range(steps):
        params, opt_state, l = step(params, opt_state,
                                    jax.random.PRNGKey(100 + i))
        losses.append(float(l))
    first, last = np.mean(losses[:10]), np.mean(losses[-10:])
    print(f"first10={first:.4f} last10={last:.4f} ratio={last / first:.3f}")
    assert last < 0.35 * first, \
        "banded-kernel backward failed to drive learning"
    print("TPU LEARNING OK (banded Pallas fwd+bwd path)")


if __name__ == "__main__":
    main()
