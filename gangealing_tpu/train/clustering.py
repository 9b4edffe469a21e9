"""K-Means++ initialization of cluster coefficients in W-space under the
perceptual metric.

Capability reference: models/latent_learner.py:85-123 (kmeans_plusplus). The
reference's cross-rank synchronization (rank0_to_all of sampled centroids)
is unnecessary on a single controller: one process drives all chips, so
every "rank" trivially sees the same samples.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gangealing_tpu.models.stylegan2 import (
    GeneratorConfig, generator_apply, batch_latent)


def kmeans_plusplus(g_params, g_cfg: GeneratorConfig, perceptual_fn,
                    num_heads, num_latent, key, inject_index=6,
                    batch_size=100):
    """Returns (num_heads, style_dim) W-space centroids."""
    k_w, k_noise, k_pick = jax.random.split(key, 3)
    batch_w = batch_latent(g_params, g_cfg, k_w, num_latent)  # (M, D)
    mean_w = jnp.mean(batch_w, axis=0, keepdims=True)

    @jax.jit
    def gen(w, key):
        img, _ = generator_apply(
            g_params, g_cfg, [w, jnp.broadcast_to(mean_w, w.shape)],
            input_is_latent=True, inject_index=inject_index, key=key)
        return img

    fakes = []
    for i in range(0, num_latent, batch_size):
        kk = jax.random.fold_in(k_noise, i)
        fakes.append(np.asarray(gen(batch_w[i:i + batch_size], kk)))
    fakes = np.concatenate(fakes, 0)

    rng = np.random.RandomState(
        int(jax.random.randint(k_pick, (), 0, 2 ** 31 - 1)))
    centroid_idx = [int(rng.randint(0, num_latent))]
    dists = []

    @jax.jit
    def dist_batch(center_img, batch_imgs):
        c = jnp.broadcast_to(center_img, batch_imgs.shape)
        return perceptual_fn(c, batch_imgs).reshape(-1)

    for _ in range(num_heads - 1):
        kk = jax.random.fold_in(k_noise, 7777 + len(centroid_idx))
        center = gen(batch_w[centroid_idx[-1]][None], kk)
        dist = []
        for i in range(0, num_latent, batch_size):
            dist.append(np.asarray(dist_batch(
                center, jnp.asarray(fakes[i:i + batch_size]))))
        dists.append(np.concatenate(dist))
        closest = np.stack(dists).min(axis=0)
        logits = closest ** 2
        probs = logits / logits.sum()
        centroid_idx.append(int(rng.choice(num_latent, p=probs)))
    return jnp.asarray(np.asarray(batch_w)[centroid_idx])
