"""Pin on-TPU numerical drift vs CPU-exact results (VERDICT r2 missing #5).

The reference-parity suite proves <=1e-4 agreement with the torch reference
on CPU; TPU f32 convs / bf16 matmuls at default precision carry larger
error (ops/resample.py notes), so this script measures — on the real
chip — how far the quantities that matter drift from the CPU-exact
computation, and asserts committed budgets (PARITY.md numerics table).

Two regimes, measured separately because they answer different questions:

1. KERNEL drift (fixed sampling coordinates): the TPU sampling kernels
   (banded Pallas mipmap at flagship 256->128 shapes) vs the CPU fold
   path on the SAME analytic warp grid. This is the numeric error a user
   actually inherits per warp. Budgets are tight (~5e-3 max abs on [-1,1]
   pixels at default bf16-matmul mode; ~2e-3 with the
   GANGEALING_GS_PRECISION=float32 + JAX_DEFAULT_MATMUL_PRECISION=highest
   knobs).

2. SYSTEM drift (trained model, end to end): congealed images,
   transferred keypoints, and a real synthetic-ground-truth PCK protocol
   through a ComposedSTN TRAINED (on the TPU, flagship shapes: supersize
   256 / flow 128 / channel_multiplier 0.5) on the structured synthetic
   generator — identical params + identical eval data on both backends.
   An UNTRAINED randomized STN is deliberately NOT used here: its head
   outputs are ~zero, so activation-level numeric noise exceeds the
   signal and the predicted warps diverge chaotically (measured r3:
   ~8.5px median flow drift vs ~1.6px median cross-sample flow spread —
   noise compared against noise). A trained model sits in an attractor
   and is the regime users run.

Artifacts cache in /tmp/gangealing_numerics/ (delete or pass --fresh to
rebuild). Run on the TPU box:  python benchmarks/tpu_numerics.py
"""

import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = "/tmp/gangealing_numerics"

# --- committed drift budgets (PARITY.md numerics table) -------------------
# kernel regime (fixed coordinates, flagship 256->128 mipmap warp)
BUDGET_KERNEL_MAX = {"default": 8e-3, "f32": 4e-3}   # max abs, [-1,1] pixels
BUDGET_KERNEL_RMS = {"default": 8e-4, "f32": 4e-4}
# system regime (trained flagship-shape STN, shared params + eval data).
# Default-precision budgets are set from measured r3 values (img rms
# 0.0043, kps median 1.29px, PCK@0.1 drift 0.45pts, @0.05 0.9pts) with
# ~1.5-2x headroom for run-to-run wobble; the f32-knob budgets are the
# tight-parity contract.
BUDGET_IMG_RMS = 0.01        # rms congealed-pixel drift
BUDGET_KPS_MED_PX = 2.0      # median keypoint-transfer drift, px @256
BUDGET_PCK_PTS = 0.5         # PCK@0.1 (published-protocol alpha) drift, pts
PCK_ALPHA_TIGHT_FACTOR = 4.0  # looser budget at the tighter alpha=0.05
BUDGET_IMG_RMS_F32 = 0.005
BUDGET_KPS_MED_PX_F32 = 1.0
BUDGET_PCK_PTS_F32 = 0.5

SIZE, FLOW = 256, 128
N_EVAL, N_KPS = 16, 16
TRAIN_ITERS = 1200


def _cfgs():
    from gangealing_tpu.models.stn import ComposedSTNConfig
    from gangealing_tpu.models.latent_learner import LatentLearnerConfig
    from gangealing_tpu.train.synthetic import STYLE_DIM, N_POSE
    t_cfg = ComposedSTNConfig(transforms=("similarity", "flow"),
                              flow_size=FLOW, supersize=SIZE,
                              channel_multiplier=0.5)
    ll_cfg = LatentLearnerConfig(n_comps=N_POSE + 1, inject_index=1,
                                 n_latent=2, num_heads=1,
                                 style_dim=STYLE_DIM)
    return t_cfg, ll_cfg


# --------------------------------------------------------------------------
# stage: train  (runs on the ACTIVE backend — the TPU in the orchestration)
# --------------------------------------------------------------------------

def stage_train(out_path):
    import jax
    import jax.numpy as jnp
    from gangealing_tpu.models.stn import composed_stn_init
    from gangealing_tpu.models.latent_learner import latent_learner_init
    from gangealing_tpu.models.stylegan2 import GeneratorConfig
    from gangealing_tpu.train.state import (
        TrainConfig, init_train_state, make_train_step)
    from gangealing_tpu.train.annealing import psi_at_iter
    from gangealing_tpu.train.losses import resize_fake2stn
    from gangealing_tpu.train.synthetic import (
        make_template, synthetic_generator, l2_perceptual_fn,
        STYLE_DIM, N_POSE, N_ELASTIC)
    from gangealing_tpu.models.latent_learner import (
        latent_learner_interpolate)

    t_cfg, ll_cfg = _cfgs()
    template = make_template(SIZE, 0)

    def sampler(ll_params, key, psi, batch, z):
        # flagship-size variant of make_synthetic_pair_sampler: unaligned
        # stays at SIZE (sample_from_full_res path), target resized to FLOW
        if z is None:
            z = jax.random.normal(key, (batch, STYLE_DIM))
        unaligned = synthetic_generator([template], z, SIZE)
        wplus = latent_learner_interpolate(ll_params, ll_cfg, z, psi)
        target = synthetic_generator([template], wplus[:, 0, :], SIZE)
        return unaligned, resize_fake2stn(target, SIZE, FLOW)

    seed, batch, stn_lr, ll_lr = 0, 32, 1e-3, 5e-3
    t_params = composed_stn_init(jax.random.PRNGKey(seed + 1), t_cfg)
    ll_params = latent_learner_init(jax.random.PRNGKey(seed + 2), ll_cfg)
    dirs = np.zeros((N_POSE + 1, STYLE_DIM), np.float32)
    dirs[:N_POSE, :N_POSE] = np.eye(N_POSE)
    dirs[N_POSE, N_POSE + N_ELASTIC] = 1.0
    ll_params["directions"] = jnp.asarray(dirs)
    ll_params["lat_mean"] = jnp.zeros((1, STYLE_DIM))

    cfg = TrainConfig(g=GeneratorConfig(size=SIZE, style_dim=STYLE_DIM,
                                        n_mlp=1),
                      t=t_cfg, ll=ll_cfg, batch=batch, stn_lr=stn_lr,
                      ll_lr=ll_lr, tv_weight=100.0,
                      flow_identity_weight=1.0,
                      anneal_psi=max(1, int(TRAIN_ITERS * 0.3)),
                      padding_mode="border", loss_fn="vgg_ssl",
                      sample_from_full_res=True)
    step = make_train_step(cfg, None, None, l2_perceptual_fn, donate=False,
                           pair_sampler=sampler)
    state = init_train_state(t_params, ll_params)
    key = jax.random.PRNGKey(seed)
    t0 = time.time()
    losses = []
    for i in range(1, TRAIN_ITERS + 1):
        psi = psi_at_iter(i, cfg.anneal_psi, cfg.anneal_fn)
        zk = jax.random.fold_in(key, i)
        z = jax.random.normal(zk, (batch, STYLE_DIM))
        state, metrics = step(state, z, jax.random.fold_in(zk, 1),
                              jnp.float32(psi), jnp.float32(stn_lr),
                              jnp.float32(ll_lr))
        losses.append(float(metrics["p"]))
        if i % 100 == 0 or i == 1:
            w = np.mean(losses[-50:])
            print(f"  train [{i}/{TRAIN_ITERS}] p={losses[-1]:.5f} "
                  f"win50={w:.5f} ({time.time() - t0:.0f}s)", flush=True)
    # post-annealing descent on window means (per-batch loss is noisy)
    early = float(np.mean(losses[cfg.anneal_psi:cfg.anneal_psi + 100]))
    late = float(np.mean(losses[-100:]))
    print(f"  post-anneal window means: early {early:.5f} late {late:.5f}")
    if not late < 0.8 * early:
        print("  WARNING: weak descent — drift numbers still valid but the "
              "attractor claim is weaker", flush=True)
    np.savez(out_path, **{k: np.asarray(v) for k, v in state["t"].items()})
    print(f"  trained params -> {out_path} ({time.time() - t0:.0f}s)")


# --------------------------------------------------------------------------
# stage: evalset  (CPU subprocess — exact, shared by both backends)
# --------------------------------------------------------------------------

def stage_evalset(out_path):
    import jax
    import jax.numpy as jnp
    from gangealing_tpu.train.synthetic import (
        make_template, synthetic_generator, synthetic_warp_grid, STYLE_DIM)

    template = make_template(SIZE, 0)
    rng = np.random.RandomState(123)
    zA = rng.randn(N_EVAL, STYLE_DIM).astype(np.float32)
    zB = rng.randn(N_EVAL, STYLE_DIM).astype(np.float32)
    imgsA = np.asarray(synthetic_generator([template], jnp.asarray(zA), SIZE))
    imgsB = np.asarray(synthetic_generator([template], jnp.asarray(zB), SIZE))
    gridA = np.asarray(synthetic_warp_grid(jnp.asarray(zA), SIZE), np.float64)
    gridB = np.asarray(synthetic_warp_grid(jnp.asarray(zB), SIZE), np.float64)

    # ground-truth correspondences: template points t_j; the rendered image
    # at output pixel p shows template coord grid(p), so the point appears
    # where grid(p) == t. Invert by nearest-cell + local bilinear refine.
    tpts = np.stack(np.meshgrid(np.linspace(-0.55, 0.55, 4),
                                np.linspace(-0.55, 0.55, 4),
                                indexing="ij"), -1).reshape(-1, 2)

    def invert(grid, t):  # grid (S,S,2) output->template; find p: grid(p)=t
        d = np.linalg.norm(grid - t, axis=-1)
        iy, ix = np.unravel_index(np.argmin(d), d.shape)
        # local Gauss-Newton on the bilinear surface around the best cell
        p = np.array([ix, iy], np.float64)
        for _ in range(12):
            x0, y0 = int(np.clip(p[0], 0, SIZE - 2)), \
                int(np.clip(p[1], 0, SIZE - 2))
            fx, fy = p[0] - x0, p[1] - y0
            g00, g01 = grid[y0, x0], grid[y0, x0 + 1]
            g10, g11 = grid[y0 + 1, x0], grid[y0 + 1, x0 + 1]
            val = (g00 * (1 - fx) * (1 - fy) + g01 * fx * (1 - fy)
                   + g10 * (1 - fx) * fy + g11 * fx * fy)
            J = np.stack([(g01 - g00) * (1 - fy) + (g11 - g10) * fy,
                          (g10 - g00) * (1 - fx) + (g11 - g01) * fx], -1)
            try:
                dp = np.linalg.solve(J, t - val)
            except np.linalg.LinAlgError:
                break
            p = p + np.clip(dp, -2, 2)
            if np.linalg.norm(dp) < 1e-8:
                break
        err = np.linalg.norm(val - t)
        return p, err

    kpsA = np.zeros((N_EVAL, len(tpts), 2), np.float32)
    kpsB = np.zeros_like(kpsA)
    vis = np.zeros((N_EVAL, len(tpts), 1), np.float32)
    for n in range(N_EVAL):
        for j, t in enumerate(tpts):
            pA, eA = invert(gridA[n], t)
            pB, eB = invert(gridB[n], t)
            inb = (eA < 1e-3 and eB < 1e-3
                   and np.all(pA > 4) and np.all(pA < SIZE - 5)
                   and np.all(pB > 4) and np.all(pB < SIZE - 5))
            kpsA[n, j], kpsB[n, j] = pA, pB
            vis[n, j, 0] = float(inb)
    thresh = np.full((N_EVAL,), 0.75 * SIZE, np.float32)  # ~bbox size
    np.savez(out_path, imgsA=imgsA, imgsB=imgsB, kpsA=kpsA, kpsB=kpsB,
             vis=vis, thresh=thresh)
    print(f"  evalset -> {out_path} "
          f"({int(vis.sum())}/{vis.size} kps valid)")


# --------------------------------------------------------------------------
# stage: eval  (runs on the ACTIVE backend with shared params + data)
# --------------------------------------------------------------------------

def stage_eval(params_path, evalset_path, out_path):
    import jax.numpy as jnp
    from gangealing_tpu.models.stn import (
        composed_stn_forward, composed_transfer_points)
    from gangealing_tpu.apps.pck import make_pck_batch_fn

    t_cfg, _ = _cfgs()
    params = {k: jnp.asarray(v) for k, v in np.load(params_path).items()}
    ev = np.load(evalset_path)
    a, b = jnp.asarray(ev["imgsA"]), jnp.asarray(ev["imgsB"])
    kpsA, kpsB = jnp.asarray(ev["kpsA"]), jnp.asarray(ev["kpsB"])
    vis, thresh = jnp.asarray(ev["vis"]), jnp.asarray(ev["thresh"])

    cong, _, _, _, _ = composed_stn_forward(params, t_cfg, a, iters=1,
                                            padding_mode="border")
    est = composed_transfer_points(params, t_cfg, a, b, kpsA, iters=1,
                                   padding_mode="border")
    fn = make_pck_batch_fn(t_cfg, (0.1, 0.05), iters=1, match_flows=False,
                           transfer_both_ways=False,
                           has_thresholds=True)
    correct, seen = fn(params, a, b, kpsA, kpsB, vis, thresh, thresh,
                      jnp.ones((a.shape[0],)))
    np.savez(out_path, cong=np.asarray(cong), est=np.asarray(est),
             pck=np.asarray(correct, np.float64) / max(float(seen), 1.0))


# --------------------------------------------------------------------------
# stage: kernel  (fixed-coordinate sampling on the ACTIVE backend)
# --------------------------------------------------------------------------

def stage_kernel(out_path):
    import jax.numpy as jnp
    from scipy.ndimage import gaussian_filter1d
    from gangealing_tpu.ops.mipmap import mipmap_warp

    rng = np.random.RandomState(0)
    imgs = np.tanh(rng.randn(8, 3, SIZE, SIZE)).astype(np.float32)
    imgs = gaussian_filter1d(gaussian_filter1d(imgs, 8.0, axis=2), 8.0,
                             axis=3)
    imgs = (imgs / (np.abs(imgs).max() + 1e-9)).astype(np.float32)
    y, x = np.meshgrid(np.linspace(-1, 1, FLOW), np.linspace(-1, 1, FLOW),
                       indexing="ij")
    grid = np.stack([x + 0.08 * np.sin(3 * y),
                     y + 0.06 * np.cos(2 * x + 1)], -1)
    grid = np.broadcast_to(grid[None], (8, FLOW, FLOW, 2)).astype(np.float32)
    out = mipmap_warp(jnp.asarray(imgs), jnp.asarray(grid))
    np.savez(out_path, fixed=np.asarray(out))


# --------------------------------------------------------------------------
# orchestration
# --------------------------------------------------------------------------

def _child(stage_argv, cpu=False, env_extra=None):
    env = dict(os.environ, **(env_extra or {}))
    if cpu:
        env["JAX_PLATFORMS"] = "cpu"
        env["GANGEALING_NUMERICS_CPU"] = "1"
    subprocess.check_call(
        [sys.executable, os.path.abspath(__file__), "--stage"] + stage_argv,
        env=env)


def main():
    import jax
    os.makedirs(WORK, exist_ok=True)
    fresh = "--fresh" in sys.argv
    print(f"backend: {jax.default_backend()}")

    p = {n: os.path.join(WORK, n + ".npz") for n in
         ("trained", "evalset", "eval_tpu", "eval_tpu_f32", "eval_cpu",
          "kernel_tpu", "kernel_f32", "kernel_cpu")}

    t0 = time.time()
    if fresh or not os.path.exists(p["evalset"]):
        print("building CPU-exact evalset...")
        _child(["evalset", p["evalset"]], cpu=True)
    if fresh or not os.path.exists(p["trained"]):
        print("training flagship-shape STN on the synthetic system (TPU)...")
        stage_train(p["trained"])

    print("kernel drift (fixed coordinates, 256->128 mipmap warp):")
    if fresh or not os.path.exists(p["kernel_tpu"]):
        stage_kernel(p["kernel_tpu"])
    if fresh or not os.path.exists(p["kernel_f32"]):
        _child(["kernel", p["kernel_f32"]],
               env_extra={"GANGEALING_GS_PRECISION": "float32",
                          "JAX_DEFAULT_MATMUL_PRECISION": "highest"})
    if fresh or not os.path.exists(p["kernel_cpu"]):
        _child(["kernel", p["kernel_cpu"]], cpu=True)
    kc = np.load(p["kernel_cpu"])["fixed"]
    kfail = []
    for tag, path in (("default", p["kernel_tpu"]), ("f32", p["kernel_f32"])):
        kt = np.load(path)["fixed"]
        d = np.abs(kt - kc)
        mx, rms = float(d.max()), float(np.sqrt((d ** 2).mean()))
        ok = mx <= BUDGET_KERNEL_MAX[tag] and rms <= BUDGET_KERNEL_RMS[tag]
        kfail.append(not ok)
        print(f"  {tag:8s}: max {mx:.3e} (budget {BUDGET_KERNEL_MAX[tag]:g})"
              f"  rms {rms:.3e} (budget {BUDGET_KERNEL_RMS[tag]:g})"
              f"  {'OK' if ok else 'OVER'}")

    print("system drift (trained STN, shared params + eval data):")
    if fresh or not os.path.exists(p["eval_tpu"]):
        stage_eval(p["trained"], p["evalset"], p["eval_tpu"])
    if fresh or not os.path.exists(p["eval_tpu_f32"]):
        _child(["eval", p["trained"], p["evalset"], p["eval_tpu_f32"]],
               env_extra={"GANGEALING_GS_PRECISION": "float32",
                          "JAX_DEFAULT_MATMUL_PRECISION": "highest"})
    if fresh or not os.path.exists(p["eval_cpu"]):
        _child(["eval", p["trained"], p["evalset"], p["eval_cpu"]], cpu=True)
    ec = np.load(p["eval_cpu"])
    sys_ok = True
    for tag, path, budgets in (
            ("default", p["eval_tpu"],
             (BUDGET_IMG_RMS, BUDGET_KPS_MED_PX, BUDGET_PCK_PTS)),
            ("f32knob", p["eval_tpu_f32"],
             (BUDGET_IMG_RMS_F32, BUDGET_KPS_MED_PX_F32,
              BUDGET_PCK_PTS_F32))):
        et = np.load(path)
        b_img, b_kps, b_pck = budgets
        d = np.abs(et["cong"] - ec["cong"])
        img_rms = float(np.sqrt((d ** 2).mean()))
        kd = np.linalg.norm(et["est"] - ec["est"], axis=-1)
        kps_med, kps_max = float(np.median(kd)), float(kd.max())
        pck_t, pck_c = et["pck"], ec["pck"]
        # the committed PCK budget applies at the published alpha=0.1
        # protocol (north star: "PCK within 0.5 pts"); tighter alphas are
        # reported but budgeted looser (PCK_ALPHA_TIGHT_FACTOR)
        pck_pts = float(np.abs(pck_t[0] - pck_c[0]) * 100)
        pck_pts_tight = float(np.abs(pck_t[1] - pck_c[1]) * 100)
        print(f"  [{tag}] congealed img rms {img_rms:.4g} (budget {b_img})"
              f"  max {float(d.max()):.4g}")
        print(f"  [{tag}] keypoint transfer px@256: median {kps_med:.4g} "
              f"(budget {b_kps})  max {kps_max:.4g}")
        print(f"  [{tag}] PCK tpu {np.round(pck_t * 100, 2)} "
              f"cpu {np.round(pck_c * 100, 2)} -> drift @0.1 {pck_pts:.3g} "
              f"pts (budget {b_pck}), @0.05 {pck_pts_tight:.3g} pts "
              f"(budget {b_pck * PCK_ALPHA_TIGHT_FACTOR:g})")
        sys_ok = (sys_ok and img_rms <= b_img and kps_med <= b_kps
                  and pck_pts <= b_pck
                  and pck_pts_tight <= b_pck * PCK_ALPHA_TIGHT_FACTOR)
    print(f"wall: {time.time() - t0:.0f}s")
    ok = sys_ok and not any(kfail)
    print("TPU NUMERICS", "OK" if ok else "OVER BUDGET")
    return 0 if ok else 1


if __name__ == "__main__":
    if "--stage" in sys.argv:
        i = sys.argv.index("--stage")
        stage, args = sys.argv[i + 1], sys.argv[i + 2:]
        if os.environ.get("GANGEALING_NUMERICS_CPU"):
            import jax
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_default_matmul_precision", "highest")
        {"evalset": stage_evalset, "eval": stage_eval,
         "kernel": stage_kernel, "train": stage_train}[stage](*args)
        raise SystemExit(0)
    raise SystemExit(main())
