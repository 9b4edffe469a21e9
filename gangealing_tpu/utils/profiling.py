"""Profiling/timing utilities.

Capability reference: the reference has no profiling subsystem (SURVEY §5.1);
this is the TPU-native replacement: jax.profiler traces plus an
honest wall-clock timer. On async dispatch paths (e.g. relay-backed
devices) ``block_until_ready`` can return before execution completes, so
``timed_call`` forces a scalar host transfer per call and subtracts the
overhead of a null graph measured the same way.
"""

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir="/tmp/jax-trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def _scalarize(x):
    leaf = jax.tree.leaves(x)[0]
    return jnp.asarray(leaf).ravel()[0].astype(jnp.float32)


def timed_call(fn, *args, reps=10, warmup=1, **kwargs):
    """Wall time per call, seconds. ``fn``'s output is reduced to one scalar
    host transfer; a null graph's time is subtracted.

    Relay-noise handling: samples of fn and the null probe are INTERLEAVED
    (relay RTT drifts over seconds, so separated batches bias the
    difference), the estimate is the median of per-pair differences, and
    ops below the probe's own jitter re-measure with 3x samples. Values at
    or under the noise floor come back as 0.0 — treat those as "too small
    to resolve through the relay", not as free."""
    jfn = jax.jit(lambda *a: _scalarize(fn(*a, **kwargs)))

    @jax.jit
    def null(*a):
        return sum(_scalarize(x) for x in a[:1])

    for _ in range(max(warmup, 1)):
        float(jfn(*args))
        float(null(*args))

    def sample(n):
        diffs, nulls = [], []
        for _ in range(n):
            t0 = time.time()
            float(null(*args))
            t1 = time.time()
            float(jfn(*args))
            t2 = time.time()
            nulls.append(t1 - t0)
            diffs.append((t2 - t1) - (t1 - t0))
        diffs.sort()
        nulls.sort()
        med = diffs[len(diffs) // 2]
        jitter = nulls[(3 * len(nulls)) // 4] - nulls[len(nulls) // 4]
        return med, jitter

    med, jitter = sample(reps)
    if med < 4 * jitter:  # too close to the probe's own noise: look harder
        med, _ = sample(3 * reps)
    return max(med, 0.0)


def throughput(fn, batch_size, *args, **kwargs):
    """Items/second for a batched callable."""
    dt = timed_call(fn, *args, **kwargs)
    return batch_size / max(dt, 1e-9)
