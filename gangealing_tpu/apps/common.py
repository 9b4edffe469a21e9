"""Shared eval-app utilities: checkpoint loading and flip determination.

Capability reference: applications/__init__.py:30-84 (load_stn,
determine_flips) and utils/download.py:10-29 (model zoo test-time
hyperparameters).
"""

import jax.numpy as jnp

from gangealing_tpu.models.stn import (
    ComposedSTNConfig, composed_forward_with_flip)
from gangealing_tpu.models.classifier import (
    ClassifierConfig, classifier_run_flip, classifier_run_flip_target)

from gangealing_tpu.utils.download import PRETRAINED_TEST_HYPERPARAMS  # noqa


def load_stn(ckpt_path, supersize=256, load_classifier=False, override=False):
    """Load a GANgealing checkpoint's t_ema (+classifier) into param dicts.
    Returns (params, cfg[, classifier_params, classifier_cfg]).

    When ``ckpt_path`` is a model-zoo name (e.g. 'cat'), the published
    test-time hyperparameters are merged into the stored args unless
    ``override`` (applications/__init__.py:36-39)."""
    from gangealing_tpu.io import load_torch_checkpoint, stn_config_from_args
    from gangealing_tpu.utils.download import find_model as zoo_find

    name = ckpt_path
    try:
        resolved, is_zoo = zoo_find(ckpt_path)
    except FileNotFoundError:
        resolved, is_zoo = ckpt_path, False
    ckpt = load_torch_checkpoint(resolved)
    args = ckpt.get("args", {})
    if is_zoo and not override and name in PRETRAINED_TEST_HYPERPARAMS:
        args = {**args, **PRETRAINED_TEST_HYPERPARAMS[name]}
    cfg = stn_config_from_args(args, supersize=supersize)
    params = {k: jnp.asarray(v) for k, v in ckpt["t_ema"].items()}
    if not load_classifier:
        return params, cfg
    if "classifier" in ckpt:
        c_cfg = ClassifierConfig(size=cfg.flow_size, supersize=supersize,
                                 channel_multiplier=cfg.channel_multiplier,
                                 num_heads=2 * cfg.num_heads)
        c_params = {k: jnp.asarray(v) for k, v in ckpt["classifier"].items()}
        return params, cfg, c_params, c_cfg
    return params, cfg, None, None


def determine_flips(params, cfg: ComposedSTNConfig, imgs,
                    classifier_params=None, classifier_cfg=None, cluster=None,
                    no_flip_inference=False, iters=1, padding_mode="border"):
    """Decide which inputs to mirror (applications/__init__.py:57-84).
    Returns (flipped_imgs, flip_indices (N,1,1,1) bool, warp_policy,
    clusters)."""
    N = imgs.shape[0]
    if classifier_params is not None:
        if cluster is None:
            flipped, _, classes, flip = classifier_run_flip(
                classifier_params, classifier_cfg, imgs)
            clusters = classes % cfg.num_heads
        else:
            flipped, flip = classifier_run_flip_target(
                classifier_params, classifier_cfg, imgs, cluster)
            clusters = jnp.full((N,), cluster, jnp.int32)
        warp_policy = jnp.eye(cfg.num_heads, dtype=imgs.dtype)[clusters]
        return flipped, flip.reshape(N, 1, 1, 1), warp_policy, clusters
    if not no_flip_inference:
        _, flipped, flip = composed_forward_with_flip(
            params, cfg, imgs, return_inputs=True, return_flip_indices=True,
            iters=iters, padding_mode=padding_mode)
        return flipped, flip, "cartesian", jnp.zeros((N,), jnp.int32)
    flip = jnp.zeros((N, 1, 1, 1), bool)
    return imgs, flip, "cartesian", jnp.zeros((N,), jnp.int32)
