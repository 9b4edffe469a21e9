"""Congeal-forward throughput sweep over batch sizes on the real chip.

Round-4 flagged an inversion: batch 40 (2187 imgs/s, 0.60 MFU) overtook the
batch-128 headline (1949 imgs/s) after the r4 layer changes. This sweep
re-measures the flagship ComposedSTN forward (the exact graph bench.py's
congeal metric times) across batches so the headline batch choice is a
measured decision, not a stale comment. Usage:

    python benchmarks/congeal_batch_sweep.py [batches...]   # default sweep

Prints one line per batch: imgs/s, ms/batch, MFU (XLA cost-analysis FLOPs /
time / v5e bf16 peak). Timing protocol identical to bench.py: AOT-compiled
executable, scalar host transfer per rep, null-graph probe subtracted.

Measured caveat: back-to-back full sweeps on this chip (through the axon
relay) disagree by 10-20% GLOBALLY — ambient machine noise is larger than
most per-batch differences, so a sequential sweep cannot rank nearby
batches. `--interleave` fixes that: all candidate executables are compiled
first, then timing ROUNDS alternate between batches (A B C A B C ...), so
slow drift hits every batch equally; per-batch medians of the round minima
are reported and are the numbers to trust for ranking.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

V5E_BF16_PEAK_FLOPS = 197e12


def _flops_of(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


def _timeit(f, *args, reps=10):
    _ = float(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(f(*args))
        ts.append(time.time() - t0)
    return min(ts)


def main():
    args = [a for a in sys.argv[1:] if a != "--interleave"]
    interleave = "--interleave" in sys.argv[1:]
    batches = [int(b) for b in args] or [32, 40, 64, 96, 128, 160]

    import __graft_entry__ as ge
    fn, (params, _) = ge.entry()
    rng = np.random.RandomState(0)

    @jax.jit
    def null_probe(p, x):
        return x[0, 0, 0, 0] + p["stns.0.warp_head.linear.bias"][0]

    @jax.jit
    def fwd(p, x):
        out, grid, fom = fn(p, x)
        return out.mean() + grid.mean() + fom.mean()

    if not interleave:
        for batch in batches:
            imgs = jnp.asarray(
                rng.randn(batch, 3, 256, 256).astype(np.float32))
            compiled = fwd.lower(params, imgs).compile()
            flops = _flops_of(compiled)
            overhead = _timeit(null_probe, params, imgs)
            total = _timeit(compiled, params, imgs)
            dt = max(total - overhead, 1e-6)
            mfu = flops / dt / V5E_BF16_PEAK_FLOPS if flops else float("nan")
            print(f"batch {batch:4d}: {batch / dt:8.1f} imgs/s  "
                  f"{dt * 1e3:7.2f} ms  mfu={mfu:.3f}  "
                  f"(overhead {overhead * 1e3:.2f} ms)", flush=True)
        return

    # interleaved: compile everything first, then alternate timing rounds
    # so ambient drift hits every batch equally
    rounds, reps = 5, 6
    execs = {}
    for batch in batches:
        imgs = jnp.asarray(rng.randn(batch, 3, 256, 256).astype(np.float32))
        execs[batch] = (fwd.lower(params, imgs).compile(), imgs)
        print(f"compiled batch {batch}", flush=True)
    times = {b: [] for b in batches}  # per-round minima
    for r in range(rounds):
        overhead = _timeit(null_probe, params, execs[batches[0]][1], reps=6)
        for batch in batches:
            compiled, imgs = execs[batch]
            total = _timeit(compiled, params, imgs, reps=reps)
            times[batch].append(max(total - overhead, 1e-6))
    for batch in batches:
        med = float(np.median(times[batch]))
        flops = _flops_of(execs[batch][0])
        mfu = flops / med / V5E_BF16_PEAK_FLOPS if flops else float("nan")
        spread = (max(times[batch]) - min(times[batch])) / med
        print(f"batch {batch:4d}: {batch / med:8.1f} imgs/s  "
              f"{med * 1e3:7.2f} ms (median of {rounds} rounds, "
              f"spread {spread * 100:.0f}%)  mfu={mfu:.3f}", flush=True)


if __name__ == "__main__":
    main()
