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


def timed_call(fn, *args, reps=8, warmup=1, **kwargs):
    """Median-of-min wall time per call, seconds. ``fn``'s output is reduced
    to one scalar host transfer; a null graph's time is subtracted."""
    jfn = jax.jit(lambda *a: _scalarize(fn(*a, **kwargs)))

    @jax.jit
    def null(*a):
        return sum(_scalarize(x) for x in a[:1])

    for _ in range(max(warmup, 1)):
        float(jfn(*args))
        float(null(*args))

    def best(f):
        ts = []
        for _ in range(reps):
            t0 = time.time()
            float(f(*args))
            ts.append(time.time() - t0)
        return min(ts)

    return max(best(jfn) - best(null), 0.0)


def throughput(fn, batch_size, *args, **kwargs):
    """Items/second for a batched callable."""
    dt = timed_call(fn, *args, **kwargs)
    return batch_size / max(dt, 1e-9)
