"""Cluster classifier: ResNet encoder -> 2K logits (K clusters x {id, flip}).

Capability reference: models/cluster_classifier.py:8-101 (ResnetClassifier).
Same encoder blocks as the similarity STN, so it can be warm-started from STN
weights (train_cluster_classifier.py:184-189).
"""

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from gangealing_tpu.models.layers import (
    Params, conv_layer, conv_layer_init, res_block, res_block_init,
    equal_linear, equal_linear_init, add_subtree)
from gangealing_tpu.ops.resample import bilinear_downsample


@dataclass(frozen=True)
class ClassifierConfig:
    size: int = 128               # stn_in_size / flow_size
    supersize: int = 256
    channel_multiplier: float = 0.5
    num_heads: int = 2            # 2 * K (clusters x flips)
    max_channels: int = 512

    @property
    def channels(self):
        cm = self.channel_multiplier
        full = {4: 512, 8: 512, 16: 512, 32: 512, 64: int(256 * cm),
                128: int(128 * cm), 256: int(64 * cm), 512: int(32 * cm),
                1024: int(16 * cm)}
        return {k: min(v, self.max_channels) for k, v in full.items()}

    def encoder_plan(self):
        ch = self.channels
        log_size = int(math.log2(self.size))
        blocks = []
        in_ch = ch[self.size]
        for i in range(log_size, 2, -1):
            out_ch = ch[2 ** (i - 1)]
            blocks.append((int(in_ch), int(out_ch)))
            in_ch = out_ch
        return int(ch[self.size]), blocks, int(in_ch), int(ch[4])


def classifier_init(key, cfg: ClassifierConfig) -> Params:
    stem_ch, blocks, enc_out, ch4 = cfg.encoder_plan()
    p: Params = {}
    keys = jax.random.split(key, len(blocks) + 3)
    add_subtree(p, "convs.0", conv_layer_init(keys[0], 3, stem_ch, 1))
    for bi, (ic, oc) in enumerate(blocks):
        add_subtree(p, f"convs.{bi + 1}", res_block_init(keys[bi + 1], ic, oc))
    add_subtree(p, "final_conv", conv_layer_init(keys[-2], enc_out, ch4, 3))
    add_subtree(p, "to_logits",
                equal_linear_init(keys[-1], ch4 * 16, cfg.num_heads))
    return p


def classifier_forward(params: Params, cfg: ClassifierConfig, x):
    if x.shape[-1] > cfg.size:
        x = bilinear_downsample(x, x.shape[-1] // cfg.size)
    _, blocks, _, _ = cfg.encoder_plan()
    out = conv_layer(params, "convs.0", x, 1)
    for bi in range(len(blocks)):
        out = res_block(params, f"convs.{bi + 1}", out)
    out = conv_layer(params, "final_conv", out, 3)
    out = out.reshape(out.shape[0], -1)
    return equal_linear(params, "to_logits", out, activation=True)


def classifier_assign(params, cfg, x, ignore_flips=False):
    classes = jnp.argmax(classifier_forward(params, cfg, x), axis=1)
    if ignore_flips:
        classes = classes % (cfg.num_heads // 2)
    return classes


def classifier_run_flip(params, cfg, x):
    """Flip inputs predicted to need mirroring (cluster_classifier.py:70-76).
    Returns (flipped_input, preds, classes, flip_bools)."""
    k = cfg.num_heads // 2
    preds = classifier_forward(params, cfg, x)
    classes = jnp.argmax(preds, axis=1)
    flip = classes >= k
    x = jnp.where(flip.reshape(-1, 1, 1, 1), jnp.flip(x, 3), x)
    return x, preds, classes, flip


def classifier_run_flip_target(params, cfg, x, target_cluster):
    """Flip decision restricted to one cluster's {id, flip} pair
    (cluster_classifier.py:78-84)."""
    k = cfg.num_heads // 2
    preds = classifier_forward(params, cfg, x)
    pair = preds[:, jnp.asarray([target_cluster, target_cluster + k])]
    flip = jnp.argmax(pair, axis=1) == 1
    x = jnp.where(flip.reshape(-1, 1, 1, 1), jnp.flip(x, 3), x)
    return x, flip


def classifier_run_flip_cartesian(params, cfg, x):
    """Per-head flip + cartesian repeat (cluster_classifier.py:86-96)."""
    k = cfg.num_heads // 2
    N = x.shape[0]
    preds = classifier_forward(params, cfg, x)
    classes = jnp.argmax(preds.reshape(N, 2, k), axis=1)  # (N, k)
    flip = classes == 1
    xr = jnp.repeat(x[:, None], k, axis=1)  # (N, k, C, H, W)
    xr = jnp.where(flip[:, :, None, None, None], jnp.flip(xr, 4), xr)
    xr = xr.reshape(N * k, *x.shape[1:])
    warp_policy = jnp.tile(jnp.eye(k, dtype=x.dtype), (N, 1))
    return xr, warp_policy


def reverse_topk_accuracy(distances, logits, k=2):
    """"Reverse top-K": classifier prediction counts as correct if it lands in
    the k lowest-loss clusters (models/__init__.py:36-43)."""
    idx = jnp.argsort(distances, axis=1)[:, :k]
    pred = jnp.argmax(logits, axis=1)
    return jnp.mean(jnp.any(idx == pred[:, None], axis=1).astype(jnp.float32))
