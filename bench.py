"""Benchmark: flagship throughput on one chip. Prints one JSON line per
metric; the LAST line is the headline congealing metric
{"metric", "value", "unit", "vs_baseline"}.

Metrics:
  1. train_imgs_per_sec_per_chip_256px — the DONATED jitted GANgealing
     train step (StyleGAN2-256 G fwd + STN + vgg_ssl perceptual loss,
     fwd+bwd+Adam; donate=True, exactly the graph train/loop.py runs),
     reference-default architecture, global batch 40 (the reference's 8-GPU
     configuration, README.md:276-277) on ONE chip; also at per-chip batch 5
     (the reference's per-GPU batch). Train + congeal metrics carry an
     'mfu_bf16_peak' field: XLA cost-analysis FLOPs / time / 197 TFLOP/s.
  2. pck_eval_pairs_per_sec_per_chip_256px_iters3 — PCK-Transfer eval
     throughput at the published protocol (iters=3, 4-way match_flows,
     bidirectional, per-image thresholds; BASELINE config #2 shape).
  3. congeal_imgs_per_sec_per_chip_256px — forward congeal of the
     reference-default ComposedSTN (flow_size=128, channel_multiplier=0.5),
     256px inputs, batch 128. Batches 32-128 all sit on the same ~0.52 MFU
     plateau with 128 marginally ahead and 160 falling off (measured
     drift-controlled by benchmarks/congeal_batch_sweep.py --interleave);
     the batch-40 row is printed for reference and is timed INTERLEAVED
     with the 128 row so ambient drift cannot reorder them (it did in r4).

Timing notes: on this environment device dispatch is asynchronous through a
relay and ``block_until_ready`` does not reflect completion, so every timed
call ends in a scalar host transfer, and a null-graph probe measures the
per-call harness overhead which is subtracted.

vs_baseline: the reference publishes no absolute throughput numbers
(BASELINE.md). 150 imgs/s at 256px is an ESTIMATE of a V100 PyTorch
batch-congealing rate, extrapolated from the reference's 8xGPU batch-40
training configuration and the cuDNN speed notes in its README.md:279-280;
it is not a measured number and cannot be verified in this environment.
The north-star (>10x per chip, BASELINE.json) is quoted against it.

Measured sanity anchor (benchmarks/cpu_anchor.py): the ACTUAL reference
implementation congeals at 0.57 imgs/s on this machine's CPU (torch, CPU
fallback kernels), and gangealing_tpu at 0.38 imgs/s on the same CPU with
the same weights — i.e. the TPU speedup comes from the hardware + Pallas
kernels, not from a lowballed baseline or framework overhead games (torch's
MKL CPU convs are in fact faster than XLA-CPU's).
"""

import json
import time

V100_BASELINE_IMGS_PER_SEC = 150.0  # estimated, unverifiable (see docstring)
V5E_BF16_PEAK_FLOPS = 197e12  # v5e MXU peak (bf16); f32 convs run at this
                              # MXU rate too (see ops/resample.py notes)


def _flops_of(compiled):
    """FLOPs from XLA cost analysis of a compiled executable, or None."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


def _timeit(f, *args, reps=10):
    _ = float(f(*args))  # compile + run
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(f(*args))
        ts.append(time.time() - t0)
    return min(ts)


def bench_congeal():
    import numpy as np
    import jax
    import jax.numpy as jnp
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

    # Interleaved rounds (compile everything first, then alternate timing
    # between the batch shapes): back-to-back sequential measurements
    # through the relay drift 10-20% globally, which round 4 misread as a
    # batch-40-beats-128 inversion (benchmarks/congeal_batch_sweep.py
    # re-measured both drift-controlled: 32-128 sit on one ~0.52 MFU
    # plateau, 128 marginally ahead). Interleaving makes the two printed
    # rows comparable with each other.
    execs = {}
    for batch in (40, 128):
        imgs = jnp.asarray(rng.randn(batch, 3, 256, 256).astype(np.float32))
        # AOT-compile once: the same executable serves cost analysis + runs
        execs[batch] = (fwd.lower(params, imgs).compile(), imgs)
    rounds = 4
    times = {b: [] for b in execs}  # per-round minima
    for _ in range(rounds):
        overhead = _timeit(null_probe, params, execs[40][1], reps=6)
        for batch, (compiled, imgs) in execs.items():
            total = _timeit(compiled, params, imgs, reps=6)
            times[batch].append(max(total - overhead, 1e-6))
    results = {}
    for batch, (compiled, _) in execs.items():
        dt = float(np.median(times[batch]))
        flops = _flops_of(compiled)
        mfu = flops / dt / V5E_BF16_PEAK_FLOPS if flops else None
        results[batch] = (batch / dt, mfu)
    return results


def bench_pck():
    """PCK-Transfer eval throughput at the published test configuration
    (BASELINE config #2 shape): 256px pairs, iters=3 recursion, 4-way
    match_flows flip matching, bidirectional transfer, per-image
    thresholds."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from gangealing_tpu.models.stn import ComposedSTNConfig, composed_stn_init
    from gangealing_tpu.apps.pck import make_pck_batch_fn

    batch = 16
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
    fn = make_pck_batch_fn(cfg, (0.1, 0.05, 0.01), iters=3,
                           match_flows=True, transfer_both_ways=True,
                           permutation=np.arange(15), has_thresholds=True)

    def run():
        c, k = fn(params, imgsA, imgsB, kps, kps, vis, th, th, valid)
        return float(c[0] + k)

    run()  # compile
    ts = []
    for _ in range(5):
        t0 = time.time()
        run()
        ts.append(time.time() - t0)
    return batch / min(ts)


def bench_train_step(compute_dtype="float32", batch=40):
    """The DONATED jitted train step (the exact graph the training loop
    runs — donate=True reuses the state buffers in place) at the reference
    architecture. Returns (imgs_per_sec, mfu) where mfu is XLA
    cost-analysis FLOPs / time / v5e bf16 peak.

    compute_dtype='bfloat16' runs the frozen G + VGG at the full MXU rate
    (G is inference-only during GANgealing training; ~16% faster step)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from gangealing_tpu.models.stylegan2 import GeneratorConfig, generator_init
    from gangealing_tpu.models.stn import ComposedSTNConfig, composed_stn_init
    from gangealing_tpu.models.latent_learner import (
        LatentLearnerConfig, latent_learner_init)
    from gangealing_tpu.models.lpips import vgg16_init, lpips_distance
    from gangealing_tpu.train.state import (
        TrainConfig, init_train_state, make_train_step)

    g_cfg = GeneratorConfig(size=256)
    t_cfg = ComposedSTNConfig(transforms=("similarity", "flow"),
                              flow_size=128, supersize=256,
                              channel_multiplier=0.5)
    ll_cfg = LatentLearnerConfig(n_comps=512, inject_index=5,
                                 n_latent=g_cfg.n_latent, num_heads=1)
    cfg = TrainConfig(g=g_cfg, t=t_cfg, ll=ll_cfg, batch=batch,
                      tv_weight=1000.0, flow_identity_weight=1.0,
                      anneal_psi=100, period=50, loss_fn="vgg_ssl",
                      compute_dtype=compute_dtype)
    g_params = generator_init(jax.random.PRNGKey(0), g_cfg)
    t_params = composed_stn_init(jax.random.PRNGKey(1), t_cfg)
    ll_params = latent_learner_init(jax.random.PRNGKey(2), ll_cfg)
    vgg_params = vgg16_init(jax.random.PRNGKey(3))

    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32

    def perceptual_fn(p, x, y):
        return lpips_distance(p, x, y, use_lins=False,
                              compute_dtype=dtype) / 18.0

    state = init_train_state(t_params, ll_params)
    step = make_train_step(cfg, g_params, vgg_params, perceptual_fn,
                           donate=True)
    z = jax.random.normal(jax.random.PRNGKey(4), (batch, g_cfg.style_dim))
    key = jax.random.PRNGKey(5)
    psi = jnp.float32(0.9)
    lr = jnp.float32(1e-3)

    # AOT-compile once: the executable provides the FLOP count (XLA cost
    # analysis, fold-equivalent) and is what we time
    compiled = step.lower(state, z, key, psi, lr, lr).compile()
    step_flops = _flops_of(compiled)

    # warm up; the state is donated, so thread it through
    state, m = compiled(state, z, key, psi, lr, lr)
    _ = float(m["p"])

    ts = []
    for _ in range(6):
        t0 = time.time()
        state, m = compiled(state, z, key, psi, lr, lr)
        _ = float(m["p"])
        ts.append(time.time() - t0)
    # overhead probe: scalar host transfer alone
    @jax.jit
    def null_probe(s):
        return s["t"]["stns.0.warp_head.linear.bias"][0]
    oh = _timeit(null_probe, state)
    dt = max(min(ts) - oh, 1e-6)
    mfu = (step_flops / dt / V5E_BF16_PEAK_FLOPS
           if step_flops else None)
    return batch / dt, mfu


def bench_train_scan(batch=5, scan_k=8, compute_dtype="float32"):
    """The k-step FUSED train path (train/state.py make_train_scan — what
    cli/train.py auto-enables at per-chip batch < 16): k optimizer steps
    per device dispatch, amortizing the per-call host/dispatch latency
    that dominates at the reference's per-GPU batch of 5
    (README.md:276-277). Returns (imgs_per_sec, mfu).

    MFU note: XLA cost analysis counts a scan BODY once, not x trip count,
    so flops are taken as k single-step executables' worth (the body is
    the same graph; see benchmarks/batch5_decompose.py)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from gangealing_tpu.models.stylegan2 import GeneratorConfig, generator_init
    from gangealing_tpu.models.stn import ComposedSTNConfig, composed_stn_init
    from gangealing_tpu.models.latent_learner import (
        LatentLearnerConfig, latent_learner_init)
    from gangealing_tpu.models.lpips import vgg16_init, lpips_distance
    from gangealing_tpu.train.state import (
        TrainConfig, init_train_state, make_train_step, make_train_scan)

    g_cfg = GeneratorConfig(size=256)
    t_cfg = ComposedSTNConfig(transforms=("similarity", "flow"),
                              flow_size=128, supersize=256,
                              channel_multiplier=0.5)
    ll_cfg = LatentLearnerConfig(n_comps=512, inject_index=5,
                                 n_latent=g_cfg.n_latent, num_heads=1)
    cfg = TrainConfig(g=g_cfg, t=t_cfg, ll=ll_cfg, batch=batch,
                      tv_weight=1000.0, flow_identity_weight=1.0,
                      anneal_psi=100, period=50, loss_fn="vgg_ssl",
                      compute_dtype=compute_dtype)
    g_params = generator_init(jax.random.PRNGKey(0), g_cfg)
    t_params = composed_stn_init(jax.random.PRNGKey(1), t_cfg)
    ll_params = latent_learner_init(jax.random.PRNGKey(2), ll_cfg)
    vgg_params = vgg16_init(jax.random.PRNGKey(3))

    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32

    def perceptual_fn(p, x, y):
        return lpips_distance(p, x, y, use_lins=False,
                              compute_dtype=dtype) / 18.0

    state = init_train_state(t_params, ll_params)
    # single-step executable: honest per-step FLOPs for the scan body
    step = make_train_step(cfg, g_params, vgg_params, perceptual_fn,
                           donate=False)
    z1 = jax.random.normal(jax.random.PRNGKey(4), (batch, g_cfg.style_dim))
    lr = jnp.float32(1e-3)
    step_flops = _flops_of(
        step.lower(state, z1, jax.random.PRNGKey(5), jnp.float32(0.9),
                   lr, lr).compile())

    scan = make_train_scan(cfg, g_params, vgg_params, perceptual_fn, scan_k,
                           donate=True)
    zs = jax.random.normal(jax.random.PRNGKey(6),
                           (scan_k, batch, g_cfg.style_dim))
    keys = jax.random.split(jax.random.PRNGKey(7), scan_k)
    psis = jnp.full((scan_k,), 0.9)
    lrs = jnp.full((scan_k,), 1e-3)
    compiled = scan.lower(state, zs, keys, psis, lrs, lrs).compile()

    state, m = compiled(state, zs, keys, psis, lrs, lrs)
    _ = float(m["p"][0])
    ts = []
    for _ in range(6):
        t0 = time.time()
        state, m = compiled(state, zs, keys, psis, lrs, lrs)
        _ = float(m["p"][0])
        ts.append(time.time() - t0)

    @jax.jit
    def null_probe(s):
        return s["t"]["stns.0.warp_head.linear.bias"][0]
    oh = _timeit(null_probe, state)
    dt = max(min(ts) - oh, 1e-6)
    mfu = (step_flops * scan_k / dt / V5E_BF16_PEAK_FLOPS
           if step_flops else None)
    return batch * scan_k / dt, mfu


def _round_mfu(mfu):
    return round(mfu, 4) if mfu is not None else None


def main():
    # Reference per-GPU batch (5, README.md:276-277): the defensible
    # per-chip comparison point for BASELINE config #5.
    train5, mfu5 = bench_train_step(batch=5)
    print(json.dumps({
        "metric": "train_imgs_per_sec_per_chip_256px_batch5",
        "value": round(train5, 2),
        "unit": "imgs/s",
        "vs_baseline": None,
        "mfu_bf16_peak": _round_mfu(mfu5),
    }), flush=True)
    scan5, mfu5s = bench_train_scan(batch=5, scan_k=8)
    print(json.dumps({
        "metric": "train_imgs_per_sec_per_chip_256px_batch5_scan8",
        "value": round(scan5, 2),
        "unit": "imgs/s",
        "vs_baseline": None,
        "mfu_bf16_peak": _round_mfu(mfu5s),
    }), flush=True)
    # bf16 + scan is the best measured batch-5 operating point (what the
    # CLI gives with --compute_dtype bfloat16; scan auto-on at batch < 16)
    scan5b, mfu5sb = bench_train_scan(batch=5, scan_k=8,
                                      compute_dtype="bfloat16")
    print(json.dumps({
        "metric": "train_imgs_per_sec_per_chip_256px_batch5_scan8_bf16",
        "value": round(scan5b, 2),
        "unit": "imgs/s",
        "vs_baseline": None,
        "mfu_bf16_peak": _round_mfu(mfu5sb),
    }), flush=True)
    train_rate, mfu40 = bench_train_step()
    print(json.dumps({
        "metric": "train_imgs_per_sec_per_chip_256px",
        "value": round(train_rate, 2),
        "unit": "imgs/s",
        "vs_baseline": None,
        "mfu_bf16_peak": _round_mfu(mfu40),
    }), flush=True)
    train_bf16, mfu40b = bench_train_step("bfloat16")
    print(json.dumps({
        "metric": "train_imgs_per_sec_per_chip_256px_bf16",
        "value": round(train_bf16, 2),
        "unit": "imgs/s",
        "vs_baseline": None,
        "mfu_bf16_peak": _round_mfu(mfu40b),
    }), flush=True)
    pck_rate = bench_pck()
    print(json.dumps({
        "metric": "pck_eval_pairs_per_sec_per_chip_256px_iters3",
        "value": round(pck_rate, 2),
        "unit": "pairs/s",
        "vs_baseline": None,
    }), flush=True)
    congeal = bench_congeal()
    print(json.dumps({
        "metric": "congeal_imgs_per_sec_per_chip_256px_batch40",
        "value": round(congeal[40][0], 2),
        "unit": "imgs/s",
        "vs_baseline": round(congeal[40][0] / V100_BASELINE_IMGS_PER_SEC, 3),
        "mfu_bf16_peak": _round_mfu(congeal[40][1]),
    }), flush=True)
    print(json.dumps({
        "metric": "congeal_imgs_per_sec_per_chip_256px",
        "value": round(congeal[128][0], 2),
        "unit": "imgs/s",
        "vs_baseline": round(congeal[128][0] / V100_BASELINE_IMGS_PER_SEC, 3),
        "mfu_bf16_peak": _round_mfu(congeal[128][1]),
    }), flush=True)


if __name__ == "__main__":
    main()
