"""End-to-end micro training run through the full loop (3 iters, tiny
models, 8-device mesh), plus checkpoint save/export/restore."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gangealing_tpu.models.stylegan2 import GeneratorConfig, generator_init
from gangealing_tpu.models.stn import ComposedSTNConfig, composed_stn_init
from gangealing_tpu.models.latent_learner import (
    LatentLearnerConfig, latent_learner_init)
from gangealing_tpu.train.state import TrainConfig, init_train_state
from gangealing_tpu.train.loop import train_gangealing, cold_start_ll
from gangealing_tpu.train.checkpoint import (
    save_native, load_native, export_torch, parse_start_iter)


G_CFG = GeneratorConfig(size=64, style_dim=32, n_mlp=2, channel_multiplier=1,
                        max_channels=32)
T_CFG = ComposedSTNConfig(transforms=("similarity", "flow"), flow_size=64,
                          supersize=64, channel_multiplier=0.25,
                          flow_downsample=4, max_channels=32)
LL_CFG = LatentLearnerConfig(n_comps=2, inject_index=3,
                             n_latent=G_CFG.n_latent, num_heads=1,
                             style_dim=32)


def _l2(params, x, y):
    return jnp.mean((x - y) ** 2, axis=(1, 2, 3), keepdims=True)


@pytest.mark.slow
def test_full_loop_and_checkpoints(tmp_path):
    cfg = TrainConfig(g=G_CFG, t=T_CFG, ll=LL_CFG, batch=8, iter=3,
                      anneal_psi=2, period=1, tv_weight=10.0,
                      flow_identity_weight=1.0)
    g_params = generator_init(jax.random.PRNGKey(0), G_CFG)
    t_params = composed_stn_init(jax.random.PRNGKey(1), T_CFG)
    ll_params = latent_learner_init(jax.random.PRNGKey(2), LL_CFG)
    ll_params = cold_start_ll(ll_params, g_params, cfg, jax.random.PRNGKey(3),
                              debug=True)
    results = str(tmp_path / "results")
    os.makedirs(results, exist_ok=True)
    state = train_gangealing(
        cfg, g_params, t_params, ll_params, None, _l2, results,
        n_sample=4, n_mean=4, log_every=1, ckpt_every=0, vis_every=0,
        progress=False)
    assert int(state["step"]) == 3
    assert os.path.exists(os.path.join(results, "scalars.jsonl"))

    # native checkpoint roundtrip
    host_state = jax.tree.map(np.asarray, state)
    ck = str(tmp_path / "ckpt" / "0000003")
    save_native(ck, host_state, g_params=jax.tree.map(np.asarray, g_params))
    restored = load_native(ck)
    np.testing.assert_allclose(
        np.asarray(restored["state"]["t"]["stns.0.warp_head.linear.bias"]),
        np.asarray(host_state["t"]["stns.0.warp_head.linear.bias"]))

    # torch export + re-import through our own importer
    pt = str(tmp_path / "0000003.pt")
    export_torch(pt, host_state, jax.tree.map(np.asarray, g_params),
                 args={"flow_size": 64})
    from gangealing_tpu.io import load_torch_checkpoint
    back = load_torch_checkpoint(pt)
    assert "t_ema" in back and "g_ema" in back
    np.testing.assert_allclose(
        back["t_ema"]["stns.0.warp_head.linear.bias"],
        np.asarray(host_state["t_ema"]["stns.0.warp_head.linear.bias"]))
    assert parse_start_iter(pt) == 3


@pytest.mark.slow
def test_loop_scan_k_matches_single_steps(tmp_path):
    """train_gangealing(scan_k=2) over 5 iterations (two fused blocks + a
    single-step tail) produces the same final state as the plain per-step
    loop: identical per-iteration psi/lr/z schedule, only the dispatch
    granularity differs."""
    cfg = TrainConfig(g=G_CFG, t=T_CFG, ll=LL_CFG, batch=8, iter=5,
                      anneal_psi=2, period=1, tv_weight=10.0,
                      flow_identity_weight=1.0)
    g_params = generator_init(jax.random.PRNGKey(0), G_CFG)
    t_params = composed_stn_init(jax.random.PRNGKey(1), T_CFG)
    ll_params = latent_learner_init(jax.random.PRNGKey(2), LL_CFG)
    ll_params = cold_start_ll(ll_params, g_params, cfg, jax.random.PRNGKey(3),
                              debug=True)
    states = {}
    for k in (1, 2):
        results = str(tmp_path / f"results_k{k}")
        os.makedirs(results, exist_ok=True)
        states[k] = train_gangealing(
            cfg, g_params, t_params, ll_params, None, _l2, results,
            n_sample=4, n_mean=4, log_every=1, ckpt_every=0, vis_every=0,
            progress=False, scan_k=k)
        assert int(states[k]["step"]) == 5
    for part in ("t", "ll", "t_ema"):
        for pk in states[1][part]:
            # loose atol on O(1)-magnitude params: the scan body and the
            # single step are different executables (different fusion),
            # and Adam's m/(sqrt(v)+eps) amplifies ulp-level differences
            # on near-zero gradients (measured worst leaf over 5 steps:
            # 3.4e-5 abs on a single element, everything else <1e-5);
            # this is compilation noise, not a schedule mismatch — a wrong
            # psi/lr/z would shift whole tensors by ~lr=1e-3 per step
            np.testing.assert_allclose(
                np.asarray(states[2][part][pk]),
                np.asarray(states[1][part][pk]), rtol=1e-3, atol=1e-4,
                err_msg=f"{part}.{pk}")


@pytest.mark.slow
def test_profiler_trace_capture(tmp_path):
    """The --profile_dir window writes an xplane trace, counts steps
    relative to start_iter (so resumed runs still capture), and rejects
    mis-ordered / out-of-range windows (ADVICE r3)."""
    cfg = TrainConfig(g=G_CFG, t=T_CFG, ll=LL_CFG, batch=8, iter=3,
                      anneal_psi=2, period=1)
    g_params = generator_init(jax.random.PRNGKey(0), G_CFG)
    t_params = composed_stn_init(jax.random.PRNGKey(1), T_CFG)
    ll_params = latent_learner_init(jax.random.PRNGKey(2), LL_CFG)
    ll_params = cold_start_ll(ll_params, g_params, cfg, jax.random.PRNGKey(3),
                              debug=True)
    results = str(tmp_path / "results")
    os.makedirs(results, exist_ok=True)

    # mis-ordered window rejected up front, before any compute
    with pytest.raises(ValueError, match="profile_stop"):
        train_gangealing(cfg, g_params, t_params, ll_params, None, _l2,
                         results, vis_every=0, ckpt_every=0, progress=False,
                         profile_dir=str(tmp_path / "bad"), profile_start=2,
                         profile_stop=2)
    # window past the steps this run will execute: rejected, not silent
    with pytest.raises(ValueError, match="past"):
        train_gangealing(cfg, g_params, t_params, ll_params, None, _l2,
                         results, vis_every=0, ckpt_every=0, progress=False,
                         profile_dir=str(tmp_path / "bad"), profile_start=5,
                         profile_stop=10)

    # a RESUMED run (start_iter=1) with a relative window (1, 2] traces its
    # 2nd executed step (absolute iteration 3) — the r3 advisor scenario
    # where an absolute-iteration window would silently never fire.
    from gangealing_tpu.train.state import init_train_state
    trace_dir = str(tmp_path / "trace")
    state = train_gangealing(
        cfg, g_params, t_params, ll_params, None, _l2, results,
        start_iter=1, resume_state=init_train_state(t_params, ll_params),
        n_sample=4, n_mean=4, log_every=1, ckpt_every=0, vis_every=0,
        progress=False, profile_dir=trace_dir, profile_start=1,
        profile_stop=2)
    assert int(state["step"]) == 2
    traces = [f for root, _, fs in os.walk(trace_dir)
              for f in fs if f.endswith(".xplane.pb")]
    assert traces, f"no xplane trace written under {trace_dir}"

    # a window that starts and stops INSIDE one scan block (scan_k=4,
    # window (1, 3]): idx only visits block boundaries 0 and 4, so the
    # pre-fix boundary-equality gate never fired; the overlap gate must
    # still capture the block containing the window.
    cfg4 = TrainConfig(g=G_CFG, t=T_CFG, ll=LL_CFG, batch=8, iter=4,
                       anneal_psi=2, period=1)
    trace_dir2 = str(tmp_path / "trace_scan")
    state = train_gangealing(
        cfg4, g_params, t_params, ll_params, None, _l2, results,
        n_sample=4, n_mean=4, log_every=1, ckpt_every=0, vis_every=0,
        progress=False, scan_k=4, profile_dir=trace_dir2, profile_start=1,
        profile_stop=3)
    assert int(state["step"]) == 4
    traces = [f for root, _, fs in os.walk(trace_dir2)
              for f in fs if f.endswith(".xplane.pb")]
    assert traces, ("no xplane trace for a profile window inside a "
                    f"scan block under {trace_dir2}")


def test_cold_start_clustering(tmp_path):
    t_cfg = ComposedSTNConfig(**{**T_CFG.__dict__, "num_heads": 2})
    ll_cfg = LatentLearnerConfig(**{**LL_CFG.__dict__, "num_heads": 2})
    cfg = TrainConfig(g=G_CFG, t=t_cfg, ll=ll_cfg, batch=4, iter=1,
                      anneal_psi=1, period=1, flips=True)
    g_params = generator_init(jax.random.PRNGKey(0), G_CFG)
    ll_params = latent_learner_init(jax.random.PRNGKey(2), ll_cfg)
    ll_params = cold_start_ll(ll_params, g_params, cfg, jax.random.PRNGKey(3),
                              debug=True)
    assert ll_params["coefficients"].shape == (2, 2)
    assert ll_params["directions"].shape == (2, 32)
    # debug mode picks centroids straight from W samples; coefficients differ
    assert not np.allclose(np.asarray(ll_params["coefficients"][0]),
                           np.asarray(ll_params["coefficients"][1]))


@pytest.mark.slow
def test_kmeans_plusplus_tiny():
    from gangealing_tpu.train.clustering import kmeans_plusplus
    g_params = generator_init(jax.random.PRNGKey(0), G_CFG)
    cents = kmeans_plusplus(g_params, G_CFG, _l2_wrap, 3, 20,
                            jax.random.PRNGKey(1), inject_index=3,
                            batch_size=10)
    assert cents.shape == (3, 32)


@pytest.mark.slow
def test_cold_start_meshed_equals_single():
    """Distributed cold start (VERDICT r4 #5): the 8-device meshed PCA-pool
    generation and kmeans++ passes (the reference's rank-sharded pool,
    train.py:231-233, and distributed kmeans++, latent_learner.py:85-123)
    pick the same centroids and produce the same ll buffers as the
    single-device run — every per-latent computation is row-independent."""
    from gangealing_tpu.parallel import make_mesh
    from gangealing_tpu.train.clustering import kmeans_plusplus

    assert jax.device_count() == 8
    mesh = make_mesh()
    g_params = generator_init(jax.random.PRNGKey(0), G_CFG)

    # kmeans++ under the perceptual metric: same centroids either way
    # (batch_size divides the mesh so every batch takes the sharded path)
    c_single = kmeans_plusplus(g_params, G_CFG, _l2_wrap, 3, 32,
                               jax.random.PRNGKey(1), inject_index=3,
                               batch_size=16)
    c_meshed = kmeans_plusplus(g_params, G_CFG, _l2_wrap, 3, 32,
                               jax.random.PRNGKey(1), inject_index=3,
                               batch_size=16, mesh=mesh)
    np.testing.assert_allclose(np.asarray(c_meshed), np.asarray(c_single),
                               rtol=1e-6, atol=1e-7)

    # full cold start (PCA pool path; debug pool of 1000 divides the mesh)
    ll_cfg = LatentLearnerConfig(**{**LL_CFG.__dict__, "num_heads": 2})
    t_cfg = ComposedSTNConfig(**{**T_CFG.__dict__, "num_heads": 2})
    cfg = TrainConfig(g=G_CFG, t=t_cfg, ll=ll_cfg, batch=4, iter=1,
                      anneal_psi=1, period=1, flips=True)
    ll0 = latent_learner_init(jax.random.PRNGKey(2), ll_cfg)
    single = cold_start_ll(ll0, g_params, cfg, jax.random.PRNGKey(3),
                           debug=True)
    meshed = cold_start_ll(ll0, g_params, cfg, jax.random.PRNGKey(3),
                           debug=True, mesh=mesh)
    for k in single:
        np.testing.assert_allclose(np.asarray(meshed[k]),
                                   np.asarray(single[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def _l2_wrap(x, y):
    return jnp.mean((x - y) ** 2, axis=(1, 2, 3), keepdims=True)


def test_torch_adam_state_import():
    """torch Adam state_dict -> optax ScaleByAdamState with correct mapping
    (shape-checked against the model's parameters()-order key list)."""
    import torch
    from gangealing_tpu.io.torch_import import (
        import_torch_adam_state, learnable_key_order)
    from gangealing_tpu.train.state import adam

    t_params = composed_stn_init(jax.random.PRNGKey(1), T_CFG)
    order = learnable_key_order(t_params)
    assert len(order) == len(t_params)  # STN has no buffer keys

    # synthesize a torch-format optimizer state: moment i filled with i+1
    state = {}
    for i, k in enumerate(order):
        shape = tuple(np.asarray(t_params[k]).shape)
        state[i] = {"step": torch.tensor(123.0),
                    "exp_avg": torch.full(shape, float(i + 1)),
                    "exp_avg_sq": torch.full(shape, float(i + 1) ** 2)}
    tstate = {"state": state,
              "param_groups": [{"params": list(range(len(order)))}]}
    imported = import_torch_adam_state(tstate, t_params)
    assert int(imported.count) == 123
    for i, k in enumerate(order):
        np.testing.assert_allclose(np.asarray(imported.mu[k]), i + 1)
        np.testing.assert_allclose(np.asarray(imported.nu[k]), (i + 1) ** 2)

    # it must be consumable by our optimizer as-is
    opt = adam()
    grads = jax.tree.map(jnp.ones_like, t_params)
    updates, _ = opt.update(grads, imported, t_params)
    assert np.isfinite(float(jnp.asarray(
        updates["stns.0.warp_head.linear.bias"]).sum()))

    # mismatched param count must fail loudly (never silently misalign)
    bad = {"state": state, "param_groups": [{"params": [0, 1]}]}
    with pytest.raises(ValueError):
        import_torch_adam_state(bad, t_params)


def test_adam_state_import_shape_guard():
    """A permuted mapping with unique shapes must raise, not misassign."""
    import torch
    from gangealing_tpu.io.torch_import import import_torch_adam_state
    params = {"a.weight": jnp.zeros((2, 3)), "b.weight": jnp.zeros((4, 5))}
    state = {0: {"step": 1, "exp_avg": torch.zeros(4, 5),
                 "exp_avg_sq": torch.zeros(4, 5)},
             1: {"step": 1, "exp_avg": torch.zeros(2, 3),
                 "exp_avg_sq": torch.zeros(2, 3)}}
    with pytest.raises(ValueError):
        import_torch_adam_state({"state": state,
                                 "param_groups": [{"params": [0, 1]}]},
                                params)


@pytest.mark.slow
def test_optimizer_roundtrip_through_torch_export(tmp_path):
    """Train 2 steps -> export torch ckpt with Adam moments -> re-import ->
    moments identical."""
    from gangealing_tpu.train.state import make_train_step
    from gangealing_tpu.train.checkpoint import export_torch
    from gangealing_tpu.io import load_torch_checkpoint
    from gangealing_tpu.io.torch_import import import_torch_adam_state

    cfg = TrainConfig(g=G_CFG, t=T_CFG, ll=LL_CFG, batch=4, iter=2,
                      anneal_psi=1, period=1)
    g_params = generator_init(jax.random.PRNGKey(0), G_CFG)
    t_params = composed_stn_init(jax.random.PRNGKey(1), T_CFG)
    ll_params = latent_learner_init(jax.random.PRNGKey(2), LL_CFG)
    state = init_train_state(t_params, ll_params)
    step = make_train_step(cfg, g_params, None, _l2, donate=False)
    z = jax.random.normal(jax.random.PRNGKey(3), (4, 32))
    for i in range(2):
        state, _ = step(state, z, jax.random.PRNGKey(4 + i),
                        jnp.float32(0.5), jnp.float32(1e-3), jnp.float32(1e-2))

    host = jax.tree.map(np.asarray, state)
    pt = str(tmp_path / "0000002.pt")
    export_torch(pt, host, jax.tree.map(np.asarray, g_params))
    back = load_torch_checkpoint(pt)
    assert "t_optim" in back["_raw"]
    re_t = import_torch_adam_state(back["_raw"]["t_optim"],
                                   back["t"])
    assert int(re_t.count) == 2
    k = "stns.0.warp_head.linear.bias"
    np.testing.assert_allclose(np.asarray(re_t.mu[k]),
                               np.asarray(host["t_opt"].mu[k]), atol=1e-7)
    np.testing.assert_allclose(np.asarray(re_t.nu[k]),
                               np.asarray(host["t_opt"].nu[k]), atol=1e-7)
