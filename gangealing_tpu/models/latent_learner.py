"""The learned target mode ("ll"): coefficients over W-space PCA directions.

Capability reference: models/latent_learner.py:25-83 (DirectionInterpolator),
8-22 (PCA). The kmeans++ clustering init lives in train/clustering.py.

Params (torch names): 'coefficients' (K, ndirs) learned; buffers
'directions' (ndirs, 512) and 'lat_mean' (1, 512) assigned from PCA.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from gangealing_tpu.models.layers import Params


@dataclass(frozen=True)
class LatentLearnerConfig:
    n_comps: int = 1          # --ndirs
    inject_index: int = 5     # --inject
    n_latent: int = 14        # generator.n_latent
    num_heads: int = 1
    style_dim: int = 512


def latent_learner_init(key, cfg: LatentLearnerConfig) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "coefficients": jnp.zeros((cfg.num_heads, cfg.n_comps)),
        "directions": jax.random.normal(k1, (cfg.n_comps, cfg.style_dim)),
        "lat_mean": jax.random.normal(k2, (1, cfg.style_dim)),
    }


def latent_learner_interpolate(params: Params, cfg: LatentLearnerConfig,
                               styled_latent, psi, lat_mean=None,
                               unfold=False):
    """styled_latent: (N, 512) W vector. Returns (N*K, n_latent, 512) W+
    (latent_learner.py:56-70): the first ``inject_index`` W+ slots get the
    learned target latent lerped toward w by psi; the rest keep w."""
    N = styled_latent.shape[0]
    K = cfg.num_heads
    lat_mean = lat_mean if lat_mean is not None else params["lat_mean"]
    target = lat_mean + params["coefficients"] @ params["directions"]  # (K, 512)
    target = jnp.tile(target, (N, 1))  # (N*K, 512)
    w = jnp.repeat(styled_latent, K, axis=0)  # (N*K, 512)
    mixed = target + psi * (w - target)
    head = jnp.repeat(mixed[:, None, :], cfg.inject_index, axis=1)
    tail = jnp.repeat(w[:, None, :], cfg.n_latent - cfg.inject_index, axis=1)
    out = jnp.concatenate([head, tail], axis=1)  # (N*K, n_latent, 512)
    if unfold:
        out = out.reshape(N, K, cfg.n_latent, cfg.style_dim)
    return out


class PCA:
    """Host-side incremental PCA over W samples (latent_learner.py:8-22)."""

    def __init__(self, n_components, w_batch=None):
        import sklearn.decomposition
        self.pca = sklearn.decomposition.IncrementalPCA(n_components)
        if w_batch is not None:
            self.fit(w_batch)

    def fit(self, w_batch):
        self.pca.fit(np.asarray(w_batch))

    def update(self, w_batch):
        self.pca.partial_fit(np.asarray(w_batch))

    def encode(self, x):
        return jnp.asarray(self.pca.transform(np.asarray(x)))

    @property
    def components(self):
        return jnp.asarray(self.pca.components_.astype(np.float32))

    @property
    def mean(self):
        return jnp.asarray(self.pca.mean_[None].astype(np.float32))


def assign_pca_buffers(params: Params, pca: PCA) -> Params:
    """Replace direction/mean buffers from a fitted PCA
    (latent_learner.py:72-77)."""
    new = dict(params)
    new["directions"] = pca.components
    new["lat_mean"] = pca.mean
    return new


def assign_coefficients(params: Params, coefficients) -> Params:
    new = dict(params)
    new["coefficients"] = jnp.asarray(coefficients)
    return new
