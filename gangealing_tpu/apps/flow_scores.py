"""Flow-smoothness scores for dataset filtering.

Capability reference: applications/flow_scores.py:17-70. Per-image score =
negative TV smoothness of the predicted residual flow; low scores mark
images the STN cannot align well. Scores are cached to
<data>/flow_scores.pt (torch format, same as the reference).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from gangealing_tpu.models.stn import ComposedSTNConfig, composed_stn_forward
from gangealing_tpu.ops.flow import total_variation_loss
from gangealing_tpu.apps.common import determine_flips
from gangealing_tpu.data.dataset import (
    MultiResolutionDataset, DataLoader, Subset)


def make_score_fn(cfg: ComposedSTNConfig, iters=1, padding_mode="border",
                  no_flip_inference=False):
    @jax.jit
    def score_fn(params, batch):
        imgs, _, _, _ = determine_flips(params, cfg, batch,
                                        no_flip_inference=no_flip_inference,
                                        iters=iters,
                                        padding_mode=padding_mode)
        _, _, flows, _, _ = composed_stn_forward(params, cfg, imgs,
                                                 iters=iters,
                                                 padding_mode=padding_mode)
        return -total_variation_loss(flows, reduce_batch=False)

    return score_fn


def compute_flow_scores(params, cfg: ComposedSTNConfig, data_path,
                        real_size=256, batch=50, iters=1,
                        padding_mode="border", no_flip_inference=False,
                        save=True, mesh=None):
    """Returns (N,) numpy scores; optionally caches to flow_scores.pt.

    ``mesh``: optional 1-D device mesh — batches are sharded over the data
    axis (the reference rank-shards this loop, flow_scores.py:33-41; here
    each image's score is computed on one device and results read back in
    order, so no de-interleave step is needed).

    Multi-process runtime: each process scores its stride of the dataset
    on its local devices and the full score array is assembled with an
    all-gather + de-interleave, exactly the reference's
    all_gather(...).permute(1, 0).reshape(-1)[:N] reduction
    (flow_scores.py:39-42); only the primary process writes the cache."""
    from gangealing_tpu.parallel import (all_gather_hosts, pad_batch,
                                         replicate, round_up_batch,
                                         shard_batch)
    n_proc = jax.process_count()
    dset = MultiResolutionDataset(data_path, resolution=real_size)
    # Round the batch itself up to a device multiple so every full step
    # carries real images; only the final tail batch is padded.
    batch = round_up_batch(batch, mesh)
    loader = DataLoader(dset, batch_size=batch, shuffle=False,
                        drop_last=False, num_shards=n_proc,
                        shard_index=jax.process_index())
    score_fn = make_score_fn(cfg, iters=iters, padding_mode=padding_mode,
                             no_flip_inference=no_flip_inference)
    if mesh is not None:
        params = replicate(mesh, params)
    scores = []
    for b in loader:
        # pad the tail batch to keep a single compiled executable
        n = b.shape[0]
        xb = pad_batch(jnp.asarray(b), batch)
        if mesh is not None:
            xb = shard_batch(mesh, xb)
        s = np.asarray(score_fn(params, xb))[:n]
        scores.append(s)
    scores = np.concatenate(scores)
    if n_proc > 1:
        # (P, ceil(N/P)) -> stride-interleaved global order -> trim the
        # wrap padding the striding added
        gathered = np.asarray(all_gather_hosts(scores))
        scores = gathered.transpose(1, 0).reshape(-1)
    scores = scores[:len(dset)]
    if save and jax.process_index() == 0:
        import torch
        torch.save(torch.from_numpy(np.ascontiguousarray(scores)),
                   os.path.join(data_path, "flow_scores.pt"))
    return scores


def get_flow_scores(params, cfg, data_path, **kwargs):
    """Cached wrapper (applications/flow_scores.py:17-22)."""
    cache = os.path.join(data_path, "flow_scores.pt")
    if os.path.exists(cache):
        import torch
        return np.asarray(torch.load(cache, weights_only=False))
    return compute_flow_scores(params, cfg, data_path, **kwargs)


def get_high_score_indices(scores, fraction_retained):
    q = 1.0 - fraction_retained
    min_score = np.quantile(scores, q)
    return np.where(scores > min_score)[0].tolist()


def filter_dataset(dataset, scores, fraction_retained):
    """Drop the lowest-scoring images (applications/flow_scores.py:57-70)."""
    if isinstance(scores, str):
        import torch
        scores = np.asarray(torch.load(scores, weights_only=False))
    return Subset(dataset, get_high_score_indices(scores, fraction_retained))
