"""The GANgealing training driver.

Capability reference: train.py:31-266 — per-iteration psi annealing, loss,
Adam steps, SGDR scheduling in fractional epochs, EMA, scalar logging,
checkpoints at every LR-zero crossing, periodic visuals; cold-start PCA of
1M W samples (+ kmeans++ for clustering models).

TPU structure: one jitted step (train/state.py) re-used for the whole run;
psi/lr are traced scalars computed host-side; the latent batch is sharded
over the data mesh each iteration.
"""

import json
import os
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from gangealing_tpu.train.state import (
    TrainConfig, init_train_state, make_train_step, make_train_scan)
from gangealing_tpu.train.annealing import (
    psi_at_iter, lr_used_at_iter, lr_cycle_iters)
from gangealing_tpu.train.checkpoint import save_native, export_torch
from gangealing_tpu.train.visuals import (
    GANgealingWriter, create_training_visuals,
    create_training_cluster_visuals)
from gangealing_tpu.models.latent_learner import (
    PCA, assign_pca_buffers, assign_coefficients)
from gangealing_tpu.models.stylegan2 import batch_latent
from gangealing_tpu.parallel import (
    make_mesh, shard_global_batch, replicated_sharding)


def cold_start_ll(ll_params, g_params, cfg: TrainConfig, key,
                  perceptual_fn=None, perceptual_params=None, debug=False,
                  kmeans_latents=50000, mesh=None):
    """PCA(+kmeans++) initialization of the latent learner
    (train.py:228-243).

    ``mesh``: optional 1-D device mesh — the 1M-latent PCA pool generation
    and the kmeans++ generator/perceptual passes are sharded over the data
    axis (the reference shards the pool across ranks, train.py:231-233, and
    distributes kmeans++, latent_learner.py:85-123). Every per-latent
    computation is row-independent, so the meshed cold start equals the
    single-device one. The PCA fit itself stays host-side (sklearn over the
    gathered (n, 512) pool — cheap next to generating it)."""
    from gangealing_tpu.parallel import replicate, shard_batch
    from gangealing_tpu.models.stylegan2 import mapping

    n_pca = 1000 if debug else 1000000
    chunk = 10000
    if mesh is not None:
        g_params_m = replicate(mesh, g_params)
        map_fn = jax.jit(lambda p, z: mapping(p, cfg.g, z))
    ws = []
    for i in range(0, n_pca, chunk):
        kk = jax.random.fold_in(key, i)
        n = min(chunk, n_pca - i)
        if mesh is not None and n % mesh.devices.size == 0:
            # same z draw as batch_latent (stylegan2.py batch_latent),
            # sharded over the mesh before the mapping network
            z = jax.random.normal(kk, (n, cfg.g.style_dim))
            ws.append(np.asarray(map_fn(g_params_m, shard_batch(mesh, z))))
        else:
            ws.append(np.asarray(batch_latent(g_params, cfg.g, kk, n)))
    ws = np.concatenate(ws)
    pca = PCA(cfg.ll.n_comps, ws)
    ll_params = assign_pca_buffers(ll_params, pca)
    if cfg.clustering:
        if debug:
            centroids = jnp.asarray(ws[:cfg.t.num_heads])
        else:
            from gangealing_tpu.train.clustering import kmeans_plusplus
            pfn = lambda x, y: perceptual_fn(perceptual_params, x, y)
            centroids = kmeans_plusplus(
                g_params, cfg.g, pfn, cfg.t.num_heads, kmeans_latents,
                jax.random.fold_in(key, 999),
                inject_index=cfg.ll.inject_index, mesh=mesh)
        ll_params = assign_coefficients(ll_params, pca.encode(centroids))
    return ll_params


def train_gangealing(cfg: TrainConfig, g_params, t_params, ll_params,
                     perceptual_params, perceptual_fn: Callable,
                     results_path: str, start_iter: int = 0,
                     resume_state=None, real_loader=None, sample_reals=None,
                     seed: int = 0, n_sample: int = 64, n_mean: int = 8000,
                     vis_batch_size: int = 250, log_every: int = 25,
                     ckpt_every: int = 50000, vis_every: int = 5000,
                     use_mesh: bool = True, export_torch_ckpts: bool = True,
                     progress: bool = True, profile_dir: str = None,
                     profile_start: int = 0, profile_stop: int = 0,
                     scan_k: int = 1):
    """Run the training loop for cfg.iter iterations. Returns final state.

    ``scan_k``: fuse this many optimizer steps into ONE device dispatch via
    lax.scan (train/state.py make_train_scan) — identical math and schedule
    to single steps (per-iteration psi/lr/z are precomputed host-side and
    stacked), but one host round trip per k steps. This is the dispatch
    amortization that matters at tiny per-chip batches (the reference's
    per-GPU batch 5, README.md:276-277): see benchmarks/batch5_decompose.py
    for measured numbers. Log/ckpt/vis cadence is unchanged (per-step
    metrics come back stacked); the profiler window and checkpoint/visual
    POINTS round up to scan-block boundaries. A tail of cfg.iter % scan_k
    iterations runs as single steps.

    ``profile_dir``: capture a jax.profiler trace (TensorBoard/Perfetto)
    of iterations (profile_start, profile_stop] — a TPU-native
    observability surface the reference has no equivalent of. The window
    is relative to ``start_iter`` (so --auto_resume runs still capture:
    a resumed run traces its (profile_start+1)-th .. profile_stop-th new
    steps). It should sit past the first compile so the trace shows
    steady-state device time, not compilation.
    """
    if profile_dir:
        if profile_stop <= profile_start:
            raise ValueError(
                f"profile_stop ({profile_stop}) must be > profile_start "
                f"({profile_start}) when profile_dir is set")
        if profile_start >= cfg.iter - start_iter:
            raise ValueError(
                f"profile window ({profile_start}, {profile_stop}] starts "
                f"past the {cfg.iter - start_iter} steps this run will "
                f"execute (start_iter={start_iter}, iter={cfg.iter}); "
                "no trace would be captured")
    # only the primary process writes files (checkpoints, visuals, TB/JSONL
    # scalars, opt.txt) — concurrent writers on a shared filesystem would
    # corrupt them (the reference fences under primary(), train.py:48,138)
    primary = jax.process_index() == 0
    writer = GANgealingWriter(results_path) if primary else None
    if primary:
        with open(os.path.join(results_path, "opt.txt"), "w") as f:
            json.dump({k: str(v) for k, v in cfg.__dict__.items()}, f,
                      indent=2)

    mesh = make_mesh() if use_mesh and jax.device_count() > 1 else None

    # copy resume_state: the donated step would otherwise delete the
    # caller's buffers (init_train_state copies its own inputs already)
    state = jax.tree.map(jnp.copy, resume_state) \
        if resume_state is not None \
        else init_train_state(t_params, ll_params)
    if mesh is not None:
        rep = replicated_sharding(mesh)
        put = lambda t: jax.tree.map(lambda x: jax.device_put(x, rep), t)
        state = put(state)
        g_params = put(g_params)
        if perceptual_params is not None:
            perceptual_params = put(perceptual_params)

    step_fn = make_train_step(cfg, g_params, perceptual_params,
                              perceptual_fn)

    zero_lr = set(lr_cycle_iters(cfg.anneal_psi, cfg.period, cfg.iter,
                                 cfg.tm))
    early_vis = {100} | zero_lr

    key = jax.random.PRNGKey(seed)
    z_key, vis_key = jax.random.split(key)
    sample_z = jax.random.normal(jax.random.fold_in(vis_key, 1),
                                 (max(1, n_sample // cfg.t.num_heads),
                                  cfg.g.style_dim))
    big_sample_z = jax.random.normal(jax.random.fold_in(vis_key, 2),
                                     (n_mean, cfg.g.style_dim)) \
        if cfg.clustering else None

    def maybe_vis(i, psi):
        t_ema = jax.tree.map(np.asarray, state["t_ema"])
        # Vis runs on the PRIMARY process only (like the reference,
        # train.py:138). Under a multi-process runtime the training arrays
        # are replicated over the process-spanning mesh, and a computation
        # the primary dispatches alone on such arrays never completes (the
        # other processes are in the train loop, not this program). Pull
        # the replicas to host so the vis pipeline re-commits them to local
        # devices — np.asarray is a pure local-replica read, not a
        # collective, so it is safe from one process.
        g_p, ll_p, p_p = g_params, state["ll"], perceptual_params
        if jax.process_count() > 1:
            g_p = jax.tree.map(np.asarray, g_p)
            ll_p = jax.tree.map(np.asarray, ll_p)
            if p_p is not None:
                p_p = jax.tree.map(np.asarray, p_p)
        kk = jax.random.fold_in(vis_key, i)
        if cfg.clustering:
            pfn = lambda x, y: perceptual_fn(p_p, x, y)
            create_training_cluster_visuals(
                g_p, cfg.g, t_ema, cfg.t, ll_p, cfg.ll, pfn,
                real_loader, sample_z, big_sample_z, psi, n_mean, n_sample,
                cfg.t.num_heads, cfg.flips, vis_batch_size, i, writer, kk,
                padding_mode=cfg.padding_mode)
        else:
            create_training_visuals(
                g_p, cfg.g, t_ema, cfg.t, ll_p, cfg.ll,
                real_loader, sample_reals, sample_z, psi, n_mean, n_sample,
                i, writer, kk, padding_mode=cfg.padding_mode)

    def save(i):
        name = str(i).zfill(7)
        ckpt_dir = os.path.join(results_path, "checkpoints")
        host_state = jax.tree.map(np.asarray, state)
        save_native(os.path.join(ckpt_dir, name), host_state,
                    g_params=jax.tree.map(np.asarray, g_params),
                    args={k: str(v) for k, v in cfg.__dict__.items()})
        if export_torch_ckpts:
            export_torch(os.path.join(ckpt_dir, f"{name}.pt"), host_state,
                         jax.tree.map(np.asarray, g_params),
                         train_cfg=cfg, iteration=i)

    if vis_every > 0 and primary:
        maybe_vis(start_iter, 1.0 if cfg.anneal_psi > 0 else 0.0)

    scan_k = max(1, int(scan_k))
    scan_fn = make_train_scan(cfg, g_params, perceptual_params,
                              perceptual_fn, scan_k) if scan_k > 1 else None

    profiling = False
    trace_first = None
    t0 = time.time()
    n_total = cfg.iter - start_iter
    idx = 0
    while idx < n_total:
        blk = scan_k if (scan_k > 1 and idx + scan_k <= n_total) else 1
        iters_blk = [idx + start_iter + 1 + j for j in range(blk)]
        # start when the upcoming block OVERLAPS the window (idx jumps by
        # blk, so a window inside one scan block would otherwise never
        # match a block boundary and silently capture nothing)
        if profile_dir and idx + blk > profile_start and not profiling \
                and idx < profile_stop:
            jax.block_until_ready(state)  # trace starts on a step boundary
            jax.profiler.start_trace(profile_dir)
            profiling, trace_first = True, iters_blk[0]
        psis = [psi_at_iter(i, cfg.anneal_psi, cfg.anneal_fn)
                for i in iters_blk]
        lr_ts = [lr_used_at_iter(i, cfg.stn_lr, cfg.anneal_psi, cfg.period,
                                 cfg.tm, cfg.decay) for i in iters_blk]
        lr_lls = [lr_used_at_iter(i, cfg.ll_lr, cfg.anneal_psi, cfg.period,
                                  cfg.tm, cfg.decay) for i in iters_blk]
        zks = [jax.random.fold_in(z_key, i) for i in iters_blk]
        if blk == 1:
            z = jax.random.normal(zks[0], (cfg.batch, cfg.g.style_dim))
            if mesh is not None:
                z = shard_global_batch(mesh, z)
            state, metrics = step_fn(state, z,
                                     jax.random.fold_in(zks[0], 1),
                                     jnp.float32(psis[0]),
                                     jnp.float32(lr_ts[0]),
                                     jnp.float32(lr_lls[0]))
            metrics = jax.tree.map(lambda x: x[None], metrics)
        else:
            zs = jnp.stack(
                [jax.random.normal(zk, (cfg.batch, cfg.g.style_dim))
                 for zk in zks])
            keys = jnp.stack([jax.random.fold_in(zk, 1) for zk in zks])
            if mesh is not None:
                zs = shard_global_batch(mesh, zs, axis=1)
            state, metrics = scan_fn(state, zs, keys,
                                     jnp.asarray(psis, jnp.float32),
                                     jnp.asarray(lr_ts, jnp.float32),
                                     jnp.asarray(lr_lls, jnp.float32))
        if profiling and idx + blk >= profile_stop:
            jax.block_until_ready(state)
            jax.profiler.stop_trace()
            profiling = False
            print(f"\n[profiler] trace of iterations {trace_first}.."
                  f"{iters_blk[-1]} written to {profile_dir}", flush=True)
        log_js = [j for j, i in enumerate(iters_blk)
                  if i % log_every == 0 or i in zero_lr]
        if log_js and primary:
            mh = jax.tree.map(np.asarray, metrics)  # one host transfer
            for j in log_js:
                i = iters_blk[j]
                m = {k: float(v[j]) for k, v in mh.items()}
                writer.add_scalar("Loss/Reconstruction", m["p"], i)
                writer.add_scalar("Loss/TotalVariation", m["tv"], i)
                writer.add_scalar("Loss/FlowIdentity", m["f"], i)
                writer.add_scalar("Progress/psi", psis[j], i)
                writer.add_scalar("Progress/STN_LearningRate", lr_ts[j], i)
                writer.add_scalar("Progress/LL_LearningRate", lr_lls[j], i)
            if progress:
                i, j = iters_blk[log_js[-1]], log_js[-1]
                rate = (i - start_iter) / max(time.time() - t0, 1e-9)
                print(f"\r[{i}/{cfg.iter}] p={float(mh['p'][j]):.4f} "
                      f"tv={float(mh['tv'][j]):.6f} "
                      f"psi={psis[j]:.4f} {rate * cfg.batch:.1f} imgs/s",
                      end="", flush=True)
        # ckpt/vis points land on block boundaries (state only exists
        # there); a cadence hit inside a block saves at the block's end
        i_end = iters_blk[-1]
        if ckpt_every > 0 and primary \
                and any(i % ckpt_every == 0 or i in zero_lr
                        for i in iters_blk):
            save(i_end)
        if vis_every > 0 and primary \
                and any(i % vis_every == 0 or i in early_vis
                        for i in iters_blk):
            maybe_vis(i_end, psis[-1])
        idx += blk
    if profiling:  # window extended past the last iteration
        jax.block_until_ready(state)
        jax.profiler.stop_trace()
        print(f"\n[profiler] trace of iterations {trace_first}..{cfg.iter} "
              f"written to {profile_dir} (window extended past the last "
              "iteration; captured what ran)", flush=True)
    if progress:
        print()
    return state
