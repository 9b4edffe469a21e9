"""Chip-run full-system learning demo: joint latent-learner + ComposedSTN
training on the synthetic structured generator (train/synthetic.py),
through the real jitted train step, on whatever backend is active (run
plainly for the TPU, JAX_PLATFORMS=cpu for CPU).

Prints the loss curve + congealed-variance collapse.

    python benchmarks/full_system_demo.py [iters] [num_heads]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    num_heads = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    import jax
    from gangealing_tpu.train.synthetic import run_synthetic_congealing

    print(f"backend={jax.default_backend()} iters={iters} K={num_heads}")
    t0 = time.time()
    r = run_synthetic_congealing(iters=iters, size=64, batch=16,
                                 num_heads=num_heads, progress=True)
    dt = time.time() - t0
    anneal_end = max(1, int(iters * 0.3))
    early = float(np.mean(r.losses[anneal_end:anneal_end + 10]))
    late = float(np.mean(r.losses[-10:]))
    print(f"\nloss curve (every {max(1, iters // 20)}):")
    for i in range(0, iters, max(1, iters // 20)):
        print(f"  iter {i + 1:4d}: p={r.losses[i]:.5f}")
    print(f"post-anneal early mean p: {early:.5f}")
    print(f"final mean p:             {late:.5f}  ({late / early:.2f}x)")
    print(f"congealed variance: {r.var_before:.4f} -> {r.var_after:.4f} "
          f"({r.var_after / r.var_before:.2f}x)")
    print(f"total time: {dt:.1f}s")
    ok = late < 0.75 * early and r.var_after < 0.6 * r.var_before
    print("FULL-SYSTEM DEMO", "OK" if ok else "WEAK")


if __name__ == "__main__":
    main()
