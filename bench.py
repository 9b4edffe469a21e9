"""Benchmark: congealing throughput of the flagship ComposedSTN on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config mirrors BASELINE.json config #1/#3: reference-default STN
(flow_size=128, channel_multiplier=0.5), 256px inputs, forward congeal,
batch 40 (the reference's global training batch).

Timing notes: on this environment device dispatch is asynchronous through a
relay and ``block_until_ready`` does not reflect completion, so every timed
call ends in a scalar host transfer, and a null-graph probe measures the
per-call harness overhead which is subtracted.

vs_baseline: the reference publishes no absolute throughput numbers. We use
an estimated PyTorch V100 batch-congealing rate of 150 imgs/s at 256px
(extrapolated from the reference's 8xGPU batch-40 training configuration and
README.md:279-280); the north-star is >10x this per chip (BASELINE.json).
"""

import json
import time

V100_BASELINE_IMGS_PER_SEC = 150.0


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    import __graft_entry__ as ge

    fn, (params, _) = ge.entry()
    batch = 40
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(batch, 3, 256, 256).astype(np.float32))

    @jax.jit
    def null_probe(p, x):
        return x[0, 0, 0, 0] + p["stns.0.warp_head.linear.bias"][0]

    @jax.jit
    def fwd(p, x):
        out, grid, fom = fn(p, x)
        return out.mean() + grid.mean() + fom.mean()

    def timeit(f, reps=10):
        _ = float(f(params, imgs))  # compile + run
        ts = []
        for _ in range(reps):
            t0 = time.time()
            float(f(params, imgs))
            ts.append(time.time() - t0)
        return min(ts)

    overhead = timeit(null_probe)
    total = timeit(fwd)
    dt = max(total - overhead, 1e-6)

    imgs_per_sec = batch / dt
    print(json.dumps({
        "metric": "congeal_imgs_per_sec_per_chip_256px",
        "value": round(imgs_per_sec, 2),
        "unit": "imgs/s",
        "vs_baseline": round(imgs_per_sec / V100_BASELINE_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
