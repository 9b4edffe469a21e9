"""PCK-Transfer eval throughput at the published test configuration
(BASELINE config #2 shape): full-size STN, 256px pairs, iters=3, 4-way
match_flows, bidirectional transfer."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from gangealing_tpu.models.stn import ComposedSTNConfig, composed_stn_init
from gangealing_tpu.apps.pck import make_pck_batch_fn


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cfg = ComposedSTNConfig(flow_size=128, supersize=256,
                            channel_multiplier=0.5)
    params = composed_stn_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    imgsA = jnp.asarray(rng.randn(batch, 3, 256, 256).astype(np.float32))
    imgsB = jnp.asarray(rng.randn(batch, 3, 256, 256).astype(np.float32))
    kps = jnp.asarray(rng.rand(batch, 15, 2).astype(np.float32) * 255)
    vis = jnp.ones((batch, 15, 1))
    th = jnp.full((batch,), 100.0)
    valid = jnp.ones((batch,))

    fn = make_pck_batch_fn(cfg, (0.1, 0.05, 0.01), iters=iters,
                           match_flows=True, transfer_both_ways=True,
                           permutation=np.arange(15), has_thresholds=True)

    def run():
        c, k = fn(params, imgsA, imgsB, kps, kps, vis, th, th, valid)
        return float(c[0] + k)

    print("compiling ...", flush=True)
    t0 = time.time()
    run()
    print(f"compile+run: {time.time() - t0:.1f}s", flush=True)
    ts = []
    for _ in range(5):
        t0 = time.time()
        run()
        ts.append(time.time() - t0)
    dt = min(ts)
    print(f"PCK batch ({batch} pairs, iters={iters}, match_flows, both "
          f"ways): {dt * 1e3:.0f} ms -> {batch / dt:.1f} pairs/s")
    print("SPair-71k cat test (~300 pairs) ETA: "
          f"{300 / (batch / dt):.1f}s per evaluation")


if __name__ == "__main__":
    main()
