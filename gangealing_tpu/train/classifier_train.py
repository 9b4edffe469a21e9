"""Cluster classifier training (post-hoc, everything else frozen).

Capability reference: train_cluster_classifier.py:30-137,175-215. Per step:
generate fakes, assign to min-perceptual-loss cluster (x flips) with the
frozen STN, train the classifier with cross-entropy on those assignments.
Warm-started from the similarity STN's encoder weights (:184-189).
"""

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gangealing_tpu.models.classifier import (
    ClassifierConfig, classifier_forward, reverse_topk_accuracy)
from gangealing_tpu.parallel import make_mesh, shard_global_batch, replicate
from gangealing_tpu.train.losses import assign_fake_images_to_clusters
from gangealing_tpu.train.state import TrainConfig, adam
from gangealing_tpu.train.annealing import lr_used_at_iter


def warm_start_from_stn(cls_params, t_params) -> Dict:
    """Copy the similarity-STN encoder weights into the classifier
    (train_cluster_classifier.py:184-189). Non-matching keys are kept."""
    out = dict(cls_params)
    prefix = "stns.0." if any(k.startswith("stns.0.") for k in t_params) \
        else ""
    for k in cls_params:
        src = prefix + k
        if src in t_params and t_params[src].shape == cls_params[k].shape:
            out[k] = t_params[src]
    return out


def make_classifier_train_step(cfg: TrainConfig, cls_cfg: ClassifierConfig,
                               g_params, t_params, ll_params,
                               perceptual_params, perceptual_fn: Callable):
    opt = adam()
    K = cfg.t.num_heads
    total_clusters = K * (1 + cfg.flips)

    def assign(key, z):
        pfn = lambda x, y: perceptual_fn(perceptual_params, x, y)
        min_val, min_idx, _, _, unaligned, resized, distances = \
            assign_fake_images_to_clusters(
                g_params, cfg.g, t_params, cfg.t, ll_params, cfg.ll, pfn,
                key, 0.0, cfg.batch, K, cfg.flips, freeze_ll=True,
                sample_from_full_res=cfg.sample_from_full_res,
                padding_mode=cfg.padding_mode, z=z)
        return (jax.lax.stop_gradient(resized[:cfg.batch]),
                jax.lax.stop_gradient(min_idx),
                jax.lax.stop_gradient(distances))

    def loss_fn(cls_params, imgs, labels):
        logits = classifier_forward(cls_params, cls_cfg, imgs)
        xent = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
            logits, labels))
        return xent, logits

    @jax.jit
    def step(cls_params, opt_state, key, lr, z=None):
        imgs, labels, distances = assign(key, z)
        (xent, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            cls_params, imgs, labels)
        updates, opt_state = opt.update(grads, opt_state, cls_params)
        cls_params = jax.tree.map(lambda p, u: p - lr * u, cls_params,
                                  updates)
        acc1 = reverse_topk_accuracy(distances, logits, k=1)
        acc2 = reverse_topk_accuracy(distances, logits, k=2)
        gt_counts = jnp.bincount(labels, length=total_clusters) / cfg.batch
        pred_counts = jnp.bincount(jnp.argmax(logits, 1),
                                   length=total_clusters) / cfg.batch
        metrics = {"cross_entropy": xent, "acc@1": acc1, "acc@2": acc2,
                   "gt_counts": gt_counts, "pred_counts": pred_counts}
        return cls_params, opt_state, metrics

    return step


def train_cluster_classifier(cfg: TrainConfig, cls_cfg: ClassifierConfig,
                             g_params, t_params, ll_params, cls_params,
                             perceptual_params, perceptual_fn,
                             iters: int, cls_lr: float = 0.001,
                             period: float = 2500.0, decay: float = 0.9,
                             tm: int = 2, seed: int = 0, log_every: int = 25,
                             writer=None, progress: bool = True,
                             use_mesh: bool = True):
    """Post-hoc classifier training. With >1 device (and ``use_mesh``) the
    fake-image batch is sharded over a 1-D data mesh with all frozen params
    and the classifier replicated — the TPU equivalent of the reference's
    DDP wrap (train_cluster_classifier.py:204-207): XLA inserts the
    gradient psums over ICI inside the jitted step. Multi-process runtime:
    every process draws the identical global z (same PRNG key) and
    shard_global_batch slices out its contiguous block — the same global
    step as the single-controller run, like the train loop
    (tests/test_multiprocess.py exercises the layout)."""
    n_proc = jax.process_count()
    if n_proc > 1:
        # a process-spanning mesh must cover all devices (dropping chips
        # would orphan whole processes); the global batch must be
        # divisible by the device count
        n_dev = jax.device_count()
        if not use_mesh:
            raise ValueError("use_mesh=False is a single-controller debug "
                             "mode; it cannot run under a multi-process "
                             "runtime (every process would train its own "
                             "full-batch classifier)")
        if cfg.batch % n_dev:
            raise ValueError(
                f"global batch ({cfg.batch}) must be divisible by the "
                f"device count ({n_dev}) under a multi-process runtime")
    else:
        # shard over the largest device count that divides the batch (a
        # sharded batch needs equal per-device shards; padding would change
        # the loss mean, so small batches just use fewer chips)
        n_dev = jax.device_count()
        while n_dev > 1 and cfg.batch % n_dev:
            n_dev -= 1
    mesh = make_mesh(n_dev) if use_mesh and n_dev > 1 else None
    if mesh is not None:
        g_params, t_params, ll_params, cls_params = (
            replicate(mesh, p) for p in
            (g_params, t_params, ll_params, cls_params))
        if perceptual_params is not None:
            perceptual_params = replicate(mesh, perceptual_params)
    step = make_classifier_train_step(cfg, cls_cfg, g_params, t_params,
                                      ll_params, perceptual_params,
                                      perceptual_fn)
    opt_state = adam().init(cls_params)
    if mesh is not None:
        opt_state = replicate(mesh, opt_state)
    key = jax.random.PRNGKey(seed)
    for i in range(1, iters + 1):
        # LR actually applied at iteration i: the reference steps the sched
        # AFTER the optimizer (train_cluster_classifier.py:106-107), so the
        # update runs on the epoch-(i-1)/period LR (anneal_psi forced to 0,
        # :148). Pinned by test_classifier_training_dynamics_parity.
        lr = lr_used_at_iter(i, cls_lr, 0, period, t_mult=tm, decay=decay)
        step_key = jax.random.fold_in(key, i)
        # z is materialized host-side from the exact split the kernel
        # would use for z=None (losses.py:33-35), so mesh and no-mesh runs
        # see bit-identical latents; only the layout differs.
        kz = jax.random.split(step_key, 3)[0]
        z = jax.random.normal(kz, (cfg.batch, cfg.g.style_dim))
        if mesh is not None:
            z = shard_global_batch(mesh, z)
        cls_params, opt_state, metrics = step(
            cls_params, opt_state, step_key, jnp.float32(lr), z)
        if (i % log_every == 0 or i == 1):
            m = {k: np.asarray(v) for k, v in metrics.items()}
            if writer is not None:
                writer.add_scalar("Loss/CrossEntropy",
                                  float(m["cross_entropy"]), i)
                writer.add_scalar("Loss/Accuracy@1", float(m["acc@1"]), i)
                writer.add_scalar("Loss/Accuracy@2", float(m["acc@2"]), i)
            if progress:
                print(f"\r[{i}/{iters}] xent={float(m['cross_entropy']):.4f}"
                      f" acc@1={float(m['acc@1']):.3f}", end="", flush=True)
    if progress:
        print()
    return cls_params, opt_state
