"""Decompose the per-chip-batch-5 train step (the reference's flagship
per-GPU operating point, README.md:276-277) and measure the k-step scan
fusion. Run: python benchmarks/batch5_decompose.py [batch] [scan_k]

Prints per-component time + cost-analysis MFU at the given batch and at
batch 40 (the one-chip global-batch point) so the batch-5 efficiency
floor is attributable: which parts are fixed-cost / MXU-starved at tiny
batch, and how much of the gap a k-step lax.scan with on-device z
recovers (dispatch/host amortization).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from gangealing_tpu.models.stylegan2 import GeneratorConfig, generator_init
from gangealing_tpu.models.stn import (
    ComposedSTNConfig, composed_stn_init, composed_stn_forward)
from gangealing_tpu.models.latent_learner import (
    LatentLearnerConfig, latent_learner_init)
from gangealing_tpu.models.lpips import vgg16_init, lpips_distance
from gangealing_tpu.train.state import (
    TrainConfig, init_train_state, make_train_step, make_train_scan)
from gangealing_tpu.train.losses import default_pair_sampler, resize_fake2stn

V5E_BF16_PEAK_FLOPS = 197e12


def _flops_of(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


def _time_compiled(compiled, *args, reps=8, donated_idx=None,
                   donated_out=0):
    """Time a compiled executable. ``donated_idx``: input arg donated to the
    executable; it is refreshed each rep with output leaf ``donated_out``
    (the step/scan fns return (state, metrics), so the new state is
    out[0] — NOT the whole output tuple)."""
    out = compiled(*args)
    jax.block_until_ready(out)
    leaf = jax.tree.leaves(out)[0]
    float(jnp.asarray(leaf).reshape(-1)[0])
    ts = []
    for _ in range(reps):
        if donated_idx is not None:
            args = tuple(out[donated_out] if i == donated_idx else a
                         for i, a in enumerate(args))
        t0 = time.time()
        out = compiled(*args)
        leaf = jax.tree.leaves(out)[0]
        float(jnp.asarray(leaf).reshape(-1)[0])
        ts.append(time.time() - t0)
    return min(ts), out


def report(name, dt, flops, batch, steps=1):
    mfu = flops / dt / V5E_BF16_PEAK_FLOPS if flops else float("nan")
    print(f"  {name:28s}: {dt * 1e3 / steps:8.2f} ms/step  "
          f"imgs/s {steps * batch / dt:8.1f}  mfu {mfu:.3f}", flush=True)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    scan_k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    compute_dtype = sys.argv[3] if len(sys.argv) > 3 else "float32"

    g_cfg = GeneratorConfig(size=256)
    t_cfg = ComposedSTNConfig(transforms=("similarity", "flow"),
                              flow_size=128, supersize=256,
                              channel_multiplier=0.5)
    ll_cfg = LatentLearnerConfig(n_comps=512, inject_index=5,
                                 n_latent=g_cfg.n_latent, num_heads=1)
    g_params = generator_init(jax.random.PRNGKey(0), g_cfg)
    t_params = composed_stn_init(jax.random.PRNGKey(1), t_cfg)
    ll_params = latent_learner_init(jax.random.PRNGKey(2), ll_cfg)
    vgg_params = vgg16_init(jax.random.PRNGKey(3))

    pdtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32

    def perceptual_fn(p, x, y):
        return lpips_distance(p, x, y, use_lins=False,
                              compute_dtype=pdtype) / 18.0

    for B in sorted({batch, 40}):
        print(f"batch {B}:", flush=True)
        z = jax.random.normal(jax.random.PRNGKey(4), (B, g_cfg.style_dim))
        key = jax.random.PRNGKey(5)
        psi = jnp.float32(0.9)

        sampler = default_pair_sampler(g_params, g_cfg, ll_cfg,
                                       t_cfg.flow_size)

        @jax.jit
        def g_fwd(llp, z):
            ua, tg = sampler(llp, key, psi, B, z)
            return ua.mean() + tg.mean()

        @jax.jit
        def stn_fwd(tp, x):
            pred, _, df, _, _ = composed_stn_forward(tp, t_cfg, x)
            return pred.mean() + df.mean()

        @jax.jit
        def vgg_fwd(x, y):
            return jnp.mean(perceptual_fn(vgg_params, x, y))

        x128 = jax.random.normal(jax.random.PRNGKey(6), (B, 3, 128, 128))
        y128 = jax.random.normal(jax.random.PRNGKey(7), (B, 3, 128, 128))

        for name, fn, args in [
            ("G fwd (pair sampler)", g_fwd, (ll_params, z)),
            ("STN composed fwd", stn_fwd, (t_params, x128)),
            ("VGG perceptual fwd", vgg_fwd, (x128, y128)),
        ]:
            compiled = fn.lower(*args).compile()
            dt, _ = _time_compiled(compiled, *args)
            report(name, dt, _flops_of(compiled), B)

        cfg = TrainConfig(g=g_cfg, t=t_cfg, ll=ll_cfg, batch=B,
                          tv_weight=1000.0, flow_identity_weight=1.0,
                          anneal_psi=100, period=50, loss_fn="vgg_ssl",
                          compute_dtype=compute_dtype)
        # init_train_state copies its inputs, so t_params/ll_params stay
        # valid for the next batch size even though the step donates state
        state = init_train_state(t_params, ll_params)
        step = make_train_step(cfg, g_params, vgg_params, perceptual_fn,
                               donate=True)
        lr = jnp.float32(1e-3)
        compiled = step.lower(state, z, key, psi, lr, lr).compile()
        step_flops = _flops_of(compiled)
        dt, out = _time_compiled(compiled, state, z, key, psi, lr, lr,
                                 donated_idx=0)
        report("full step (fwd+bwd+adam)", dt, step_flops, B)
        state = out[0]

        scan = make_train_scan(cfg, g_params, vgg_params, perceptual_fn,
                               scan_k, donate=True)
        zs = jax.random.normal(jax.random.PRNGKey(8),
                               (scan_k, B, g_cfg.style_dim))
        keys = jax.random.split(jax.random.PRNGKey(9), scan_k)
        psis = jnp.full((scan_k,), 0.9)
        lrs = jnp.full((scan_k,), 1e-3)
        compiled = scan.lower(state, zs, keys, psis, lrs, lrs).compile()
        # XLA cost analysis counts a while/scan BODY once, not x trip count
        # (measured: the scan executable reports ~1/k of the true flops), so
        # the honest scan flop count is k single-step executables' worth.
        scan_flops = step_flops * scan_k if step_flops else None
        dt, _ = _time_compiled(compiled, state, zs, keys, psis, lrs, lrs,
                               donated_idx=0)
        report(f"scan x{scan_k} (per step)", dt, scan_flops, B, steps=scan_k)


if __name__ == "__main__":
    main()
