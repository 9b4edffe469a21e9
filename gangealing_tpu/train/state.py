"""Training state and the jitted GANgealing train step.

Capability reference: train.py:31-171 (the per-iteration logic: loss ->
backward -> Adam steps for STN and ll -> EMA accumulate). The LR schedule is
computed host-side per iteration (annealing.py here) and passed in as a
traced scalar so one compiled step serves the whole run.

TPU design: params are replicated over a 1-D 'data' mesh; the latent batch z
is sharded on its leading axis. XLA turns the gradient reduction into ICI
psums automatically — this *is* DDP, minus the wrapper.
"""

from dataclasses import dataclass
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax

from gangealing_tpu.models.stylegan2 import GeneratorConfig
from gangealing_tpu.models.stn import ComposedSTNConfig
from gangealing_tpu.models.latent_learner import LatentLearnerConfig
from gangealing_tpu.train.losses import (
    gangealing_loss, gangealing_cluster_loss)
from gangealing_tpu.ops.flow import total_variation_loss, flow_identity_loss

EMA_ACCUM = 0.5 ** (32 / (10 * 1000))  # train.py:77


@dataclass(frozen=True)
class TrainConfig:
    g: GeneratorConfig
    t: ComposedSTNConfig
    ll: LatentLearnerConfig
    batch: int = 40                  # global batch
    stn_lr: float = 1e-3
    ll_lr: float = 1e-2
    tv_weight: float = 1000.0
    flow_identity_weight: float = 1.0
    freeze_ll: bool = False
    flips: bool = False
    sample_from_full_res: bool = False
    padding_mode: str = "border"
    loss_fn: str = "vgg_ssl"
    anneal_psi: int = 150000
    anneal_fn: str = "cosine"
    period: float = 37500.0
    decay: float = 0.9
    tm: int = 2
    iter: int = 800000
    compute_dtype: str = "float32"  # 'bfloat16': frozen G + VGG at MXU rate

    @property
    def clustering(self) -> bool:
        return self.t.num_heads > 1


def adam():
    return optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)


def init_train_state(t_params, ll_params) -> Dict[str, Any]:
    """Fresh optimizer state. Every param leaf is COPIED: the train
    step/scan donate the state buffers (and device_put can alias on some
    backends), so the state must never share buffers with caller-owned
    arrays — donation would delete them out from under the caller."""
    opt = adam()
    t_params = jax.tree.map(jnp.copy, t_params)
    ll_params = jax.tree.map(jnp.copy, ll_params)
    return {
        "t": t_params,
        "ll": ll_params,
        "t_ema": jax.tree.map(jnp.copy, t_params),
        "t_opt": opt.init(t_params),
        "ll_opt": opt.init(ll_params),
        "step": jnp.zeros((), jnp.int32),
    }


def ema_update(ema, params, decay=EMA_ACCUM):
    """accumulate() (models/__init__.py:19): ema = decay*ema + (1-decay)*p."""
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p, ema,
                        params)


def make_train_step(cfg: TrainConfig, g_params, perceptual_params,
                    perceptual_fn: Callable, donate=True, pair_sampler=None):
    """Build the jitted train step.

    perceptual_fn(params, x, y) -> (N, 1, 1, 1).
    Returns step(state, z, key, psi, lr_t, lr_ll) -> (state, metrics).
    The generator and perceptual params are closed over (frozen) — XLA
    keeps them device-resident constants.

    ``pair_sampler``: optional (unaligned, target) source replacing the GAN
    pair sampling (see train/losses.py default_pair_sampler) — the
    synthetic full-system demo plugs a fixed differentiable generator in
    here; g_params/cfg.g may then be None.
    """
    step = _build_step(cfg, g_params, perceptual_params, perceptual_fn,
                       pair_sampler)
    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_train_scan(cfg: TrainConfig, g_params, perceptual_params,
                    perceptual_fn: Callable, k: int, donate=True,
                    pair_sampler=None):
    """k train iterations fused into ONE jitted lax.scan call.

    scan(state, zs, keys, psis, lr_ts, lr_lls) -> (state, metrics) where
    every x has a leading (k,) axis and metrics are stacked per-step.
    Identical math to k make_train_step calls on the same inputs; one
    device dispatch instead of k amortizes per-call host/dispatch latency
    at small per-chip batches (see benchmarks/batch5_decompose.py for the
    measured batch-5 numbers). The reference runs one optimizer step per
    loop iteration (train.py:89-135); this is the same schedule, batched
    at the dispatch level only.
    """
    step = _build_step(cfg, g_params, perceptual_params, perceptual_fn,
                       pair_sampler)

    def scan_fn(state, zs, keys, psis, lr_ts, lr_lls):
        def body(st, x):
            return step(st, *x)
        return jax.lax.scan(body, state, (zs, keys, psis, lr_ts, lr_lls))

    donate_argnums = (0,) if donate else ()
    return jax.jit(scan_fn, donate_argnums=donate_argnums)


def _build_step(cfg: TrainConfig, g_params, perceptual_params,
                perceptual_fn: Callable, pair_sampler=None):
    opt = adam()

    def loss_fn(t_params, ll_params, z, key, psi):
        pfn = lambda x, y: perceptual_fn(perceptual_params, x, y)
        if cfg.clustering or cfg.flips:
            ploss, delta_flow = gangealing_cluster_loss(
                g_params, cfg.g, t_params, cfg.t, ll_params, cfg.ll, pfn,
                key, psi, z.shape[0], cfg.t.num_heads, cfg.flips,
                freeze_ll=cfg.freeze_ll,
                sample_from_full_res=cfg.sample_from_full_res,
                padding_mode=cfg.padding_mode,
                compute_dtype=cfg.compute_dtype, z=z,
                pair_sampler=pair_sampler)
        else:
            ploss, delta_flow = gangealing_loss(
                g_params, cfg.g, t_params, cfg.t, ll_params, cfg.ll, pfn,
                key, psi, z.shape[0], freeze_ll=cfg.freeze_ll,
                sample_from_full_res=cfg.sample_from_full_res,
                padding_mode=cfg.padding_mode,
                compute_dtype=cfg.compute_dtype, z=z,
                pair_sampler=pair_sampler)
        tv = total_variation_loss(delta_flow) if cfg.tv_weight > 0 \
            else jnp.zeros(())
        fid = flow_identity_loss(delta_flow) if cfg.flow_identity_weight > 0 \
            else jnp.zeros(())
        total = ploss + cfg.tv_weight * tv + cfg.flow_identity_weight * fid
        return total, {"p": ploss, "tv": tv, "f": fid}

    def step(state, z, key, psi, lr_t, lr_ll):
        (_, metrics), grads = jax.value_and_grad(
            lambda tp, lp: loss_fn(tp, lp, z, key, psi), argnums=(0, 1),
            has_aux=True)(state["t"], state["ll"])
        g_t, g_ll = grads
        u_t, t_opt = opt.update(g_t, state["t_opt"], state["t"])
        new_t = jax.tree.map(lambda p, u: p - lr_t * u, state["t"], u_t)
        if cfg.freeze_ll:
            new_ll, ll_opt = state["ll"], state["ll_opt"]
        else:
            u_ll, ll_opt = opt.update(g_ll, state["ll_opt"], state["ll"])
            new_ll = jax.tree.map(lambda p, u: p - lr_ll * u, state["ll"],
                                  u_ll)
        new_state = {
            "t": new_t,
            "ll": new_ll,
            "t_ema": ema_update(state["t_ema"], new_t),
            "t_opt": t_opt,
            "ll_opt": ll_opt,
            "step": state["step"] + 1,
        }
        return new_state, metrics

    return step
