"""K-Means++ initialization of cluster coefficients in W-space under the
perceptual metric.

Capability reference: models/latent_learner.py:85-123 (kmeans_plusplus). The
reference shards the fake-image generation and perceptual-distance passes
across ranks and rank0-broadcasts each sampled centroid
(latent_learner.py:100,119); on a TPU single controller the same
distribution is a 1-D data mesh: batches of latents are sharded over the
chips (``mesh``), every per-image computation is row-independent, and the
host rng that samples centroids plays rank 0.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gangealing_tpu.models.stylegan2 import (
    GeneratorConfig, generator_apply, batch_latent)


def kmeans_plusplus(g_params, g_cfg: GeneratorConfig, perceptual_fn,
                    num_heads, num_latent, key, inject_index=6,
                    batch_size=100, mesh=None):
    """Returns (num_heads, style_dim) W-space centroids.

    ``mesh``: optional 1-D device mesh — the generator and
    perceptual-distance batches are sharded over the data axis. Per-image
    results are row-independent, so the meshed run picks the same
    centroids as the single-device run (tested at toy scale)."""
    from gangealing_tpu.parallel import shard_batch, replicate

    if mesh is not None:
        g_params = replicate(mesh, g_params)
    k_w, k_noise, k_pick = jax.random.split(key, 3)
    batch_w = batch_latent(g_params, g_cfg, k_w, num_latent)  # (M, D)
    mean_w = jnp.mean(batch_w, axis=0, keepdims=True)
    batch_w = np.asarray(batch_w)

    @jax.jit
    def gen(w, key):
        img, _ = generator_apply(
            g_params, g_cfg, [w, jnp.broadcast_to(mean_w, w.shape)],
            input_is_latent=True, inject_index=inject_index, key=key)
        return img

    def gen_batch(w, kk):
        w = jnp.asarray(w)
        if mesh is not None and w.shape[0] % mesh.devices.size == 0:
            w = shard_batch(mesh, w)
        return gen(w, kk)

    fakes = []
    for i in range(0, num_latent, batch_size):
        kk = jax.random.fold_in(k_noise, i)
        fakes.append(np.asarray(gen_batch(batch_w[i:i + batch_size], kk)))
    fakes = np.concatenate(fakes, 0)

    rng = np.random.RandomState(
        int(jax.random.randint(k_pick, (), 0, 2 ** 31 - 1)))
    centroid_idx = [int(rng.randint(0, num_latent))]
    dists = []

    @jax.jit
    def dist_batch(center_img, batch_imgs):
        c = jnp.broadcast_to(center_img, batch_imgs.shape)
        return perceptual_fn(c, batch_imgs).reshape(-1)

    def dist_batch_sharded(center_img, batch_imgs):
        if mesh is not None and batch_imgs.shape[0] % mesh.devices.size == 0:
            batch_imgs = shard_batch(mesh, batch_imgs)
        return dist_batch(center_img, batch_imgs)

    for _ in range(num_heads - 1):
        kk = jax.random.fold_in(k_noise, 7777 + len(centroid_idx))
        center = gen(jnp.asarray(batch_w[centroid_idx[-1]])[None], kk)
        dist = []
        for i in range(0, num_latent, batch_size):
            dist.append(np.asarray(dist_batch_sharded(
                center, jnp.asarray(fakes[i:i + batch_size]))))
        dists.append(np.concatenate(dist))
        closest = np.stack(dists).min(axis=0)
        logits = closest ** 2
        probs = logits / logits.sum()
        centroid_idx.append(int(rng.choice(num_latent, p=probs)))
    return jnp.asarray(batch_w[centroid_idx])
