"""Measured same-machine CPU anchor for the bench's vs_baseline ratio.

The reference publishes no absolute throughput numbers, so bench.py quotes
an *estimated* 150 imgs/s V100 rate. This script provides the one ratio that
CAN be measured honestly in this environment: the ACTUAL reference
implementation (torch, /root/reference via tests/ref_shim.py CPU fallbacks)
vs gangealing_tpu (jax), both running the flagship ComposedSTN forward
congeal at 256px on the SAME CPU with the SAME weights.

Usage:  python benchmarks/cpu_anchor.py [batch [reps]]

Caveat for reading the number: torch-CPU is not a V100, and the reference's
CUDA kernels don't run here (its CPU fallbacks are the project's own golden
implementations, op/upfirdn2d.py:159-200). This is a sanity anchor — "our
framework is not winning via a lowballed baseline" — not a GPU measurement.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import ref_shim  # noqa: E402
ref_shim.install()  # reference import stubs + /root/reference on sys.path
import numpy as np  # noqa: E402
import torch  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from gangealing_tpu.io.torch_import import import_state_dict  # noqa: E402
from gangealing_tpu.models.stn import (  # noqa: E402
    ComposedSTNConfig, composed_stn_forward)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from models.spatial_transformers.spatial_transformer import get_stn
    torch.manual_seed(0)
    ref = get_stn(["similarity", "flow"], flow_size=128, supersize=256,
                  channel_multiplier=0.5).eval()
    ref_shim.randomize_module(ref, scale=0.05, seed=7)

    cfg = ComposedSTNConfig(transforms=("similarity", "flow"), flow_size=128,
                            supersize=256, channel_multiplier=0.5)
    params = {k: jnp.asarray(v)
              for k, v in import_state_dict(ref.state_dict()).items()}

    imgs_np = np.tanh(np.random.RandomState(3)
                      .randn(batch, 3, 256, 256).astype(np.float32))
    imgs_t = torch.from_numpy(imgs_np)
    imgs_j = jnp.asarray(imgs_np)

    # --- reference (torch CPU) ---
    with torch.no_grad():
        ref(imgs_t)  # warmup
        ts = []
        for _ in range(reps):
            t0 = time.time()
            ref(imgs_t)
            ts.append(time.time() - t0)
    ref_rate = batch / min(ts)

    # --- ours (jax CPU) ---
    @jax.jit
    def fwd(p, x):
        out, _, _, _, _ = composed_stn_forward(p, cfg, x, iters=1,
                                               padding_mode="border")
        return out

    np.asarray(fwd(params, imgs_j))  # compile + warmup
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(fwd(params, imgs_j))
        ts.append(time.time() - t0)
    our_rate = batch / min(ts)

    print(f"reference torch-CPU congeal @256px batch {batch}: "
          f"{ref_rate:.2f} imgs/s")
    print(f"gangealing_tpu jax-CPU congeal @256px batch {batch}: "
          f"{our_rate:.2f} imgs/s")
    print(f"same-machine CPU ratio (ours/reference): "
          f"{our_rate / ref_rate:.2f}x")


if __name__ == "__main__":
    main()
