"""Spatial Transformer Networks: similarity + flow warping heads, single STN,
and the composed STN (the framework's public model API).

Capability reference:
  models/spatial_transformers/warping_heads.py (SimilarityHead:14, FlowHead:151,
  apply_affine:268, check_if_warp_exceeds_image_boundaries:280) and
  models/spatial_transformers/spatial_transformer.py (SpatialTransformer:388,
  ComposedSTN:48, get_stn:11).

Everything is functional over flat torch-named parameter dicts. Static
configuration (iters, output_resolution, warp_policy kind, padding_mode,
num_heads) is Python-level; dynamic data (images, alpha, base warps,
assignment logits) are traced arrays — so any combination jit-compiles to a
single XLA program.
"""

import math
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from gangealing_tpu.models.layers import (
    Params, conv_layer, conv_layer_init, res_block, res_block_init,
    equal_linear, equal_linear_init, equal_conv2d, equal_conv2d_init,
    add_subtree, subtree)
from gangealing_tpu.ops.grid_sample import grid_sample, affine_grid, identity_grid
from gangealing_tpu.ops.mipmap import mipmap_warp
from gangealing_tpu.ops.resample import bilinear_downsample, interpolate_bilinear


# ---------------------------------------------------------------------------
# config
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class STNConfig:
    transform: str = "similarity"  # 'similarity' | 'flow'
    flow_size: int = 128
    supersize: int = 256
    channel_multiplier: float = 0.5
    num_heads: int = 1
    flow_downsample: int = 8
    antialias: bool = True
    max_channels: int = 512  # cap (tests use small values; checkpoints 512)
    compute_dtype: str = "float32"  # 'bfloat16' runs the encoder on the MXU
    # at 2x rate; warp-head outputs stay float32 either way.

    @property
    def is_flow(self):
        return self.transform == "flow"

    @property
    def channels(self):
        cm = self.channel_multiplier
        full = {4: 512, 8: 512, 16: 512, 32: 512, 64: int(256 * cm),
                128: int(128 * cm), 256: int(64 * cm), 512: int(32 * cm),
                1024: int(16 * cm)}
        return {k: min(v, self.max_channels) for k, v in full.items()}

    def encoder_plan(self):
        """(in_ch, out_ch, downsample) per ResBlock, plus stem/final dims."""
        ch = self.channels
        log_size = int(math.log2(self.flow_size))
        log_downsample = int(math.log2(self.flow_downsample))
        end_log = log_size - 4 if self.is_flow else 2
        assert end_log >= 2, (
            f"flow_size={self.flow_size} too small for transform="
            f"{self.transform} (min 64 for flow, 16 for similarity)")
        blocks = []
        in_ch = ch[self.flow_size]
        num_down = 0
        for i in range(log_size, end_log, -1):
            down = (not self.is_flow) or (num_down < log_downsample)
            num_down += down
            out_ch = ch[2 ** (i - 1)]
            blocks.append((int(in_ch), int(out_ch), down))
            in_ch = out_ch
        return int(ch[self.flow_size]), blocks, int(in_ch), int(ch[4])


# ---------------------------------------------------------------------------
# warping heads
# ---------------------------------------------------------------------------

def make_affine_matrix(rot, scale, shift_x, shift_y):
    """(N, K) raw params -> (N, K, 2, 3) similarity matrices
    (warping_heads.py:36-50)."""
    N, K = rot.shape
    rot = jnp.tanh(rot) * math.pi
    scale = jnp.exp(scale)
    cos_r = jnp.cos(rot)
    sin_r = jnp.sin(rot)
    m = jnp.stack([scale * cos_r, -scale * sin_r, shift_x,
                   scale * sin_r, scale * cos_r, shift_y], axis=2)
    return m.reshape(N, K, 2, 3)


def make_3x3(m):
    """(..., 2, 3) -> (..., 3, 3) homogeneous."""
    one_hot = jnp.zeros(m.shape[:-2] + (1, 3), dtype=m.dtype).at[..., 0, 2].set(1.0)
    return jnp.concatenate([m, one_hot], axis=-2)


def apply_affine(matrix, grid):
    """Apply (N, 2, 3) affine to an arbitrary sampling grid (N, H, W, 2)
    (warping_heads.py:268-277)."""
    gshape = grid.shape
    g = grid.reshape(grid.shape[0], -1, 2)
    ones = jnp.ones(g.shape[:2] + (1,), dtype=g.dtype)
    g = jnp.concatenate([g, ones], axis=2)
    warped = jnp.einsum("npk,nok->npo", g, matrix)
    return warped.reshape(gshape)


def check_oob(grid, image_bounds, out_hw, split_size, threshold=0.025):
    """Fraction of sampled pixels beyond image bounds > threshold
    (warping_heads.py:280-309). Returns (N*split,) bool."""
    Ho, Wo = out_hw
    if image_bounds is None:
        boundary_y = jnp.asarray(float(Ho))
        boundary_x = jnp.asarray(float(Wo))
    else:
        ib = jnp.repeat(image_bounds, split_size, axis=0).astype(jnp.float32)
        landscape = ib[:, 0] < ib[:, 1]
        boundary_y = jnp.where(landscape, jnp.round(Ho * ib[:, 0] / ib[:, 1]),
                               float(Ho))
        boundary_x = jnp.where(landscape, float(Wo),
                               jnp.round(Wo * ib[:, 1] / ib[:, 0]))
    gx = jnp.abs(grid[..., 0].reshape(grid.shape[0], -1))
    gy = jnp.abs(grid[..., 1].reshape(grid.shape[0], -1))
    bx = jnp.reshape((boundary_x - 1) / Wo, (-1, 1))
    by = jnp.reshape((boundary_y - 1) / Ho, (-1, 1))
    oob_x = jnp.mean((gx > bx).astype(jnp.float32), axis=1) > threshold
    oob_y = jnp.mean((gy > by).astype(jnp.float32), axis=1) > threshold
    return jnp.logical_or(oob_x, oob_y)


def _warp(img, grid, antialias, padding_mode):
    if antialias:
        return mipmap_warp(img, grid, max_num_levels=3.5,
                           padding_mode=padding_mode)
    from gangealing_tpu.ops.grid_sample import grid_sample_auto
    return grid_sample_auto(img, grid, padding_mode=padding_mode)


def similarity_head_init(key, in_dim, num_heads=1) -> Params:
    # plain nn.Linear zero-initialized -> identity transform at init
    return {"linear.weight": jnp.zeros((4 * num_heads, in_dim)),
            "linear.bias": jnp.zeros((4 * num_heads,))}


def similarity_head(params: Params, cfg: STNConfig, img, features,
                    output_resolution=None, alpha=None, base_warp=None,
                    stop_grad=False, padding_mode="border",
                    return_out_of_bounds=False, image_bounds=None,
                    warp_policy="cartesian", unfold=False, prefix="warp_head"):
    """Regress + apply a similarity warp (warping_heads.py:58-148).

    warp_policy: 'cartesian' (static) or an (N, K)/(N, 2K) logits array
    ('assign_only').
    Returns (out, grid, matrix, oob).
    """
    K = cfg.num_heads
    N = features.shape[0]
    raw = features @ params[f"{prefix}.linear.weight"].T \
        + params[f"{prefix}.linear.bias"]  # (N, 4K)

    if isinstance(warp_policy, (jnp.ndarray, jax.Array)):
        assignments = jnp.argmax(warp_policy, axis=1) % K
        raw = raw.reshape(N, 4, K).transpose(0, 2, 1)  # (N, K, 4)
        raw = jnp.take_along_axis(raw, assignments[:, None, None].repeat(4, 2),
                                  axis=1)[:, 0]  # (N, 4)
        split = 1
        params_nk = [raw[:, i:i + 1] for i in range(4)]
    elif warp_policy == "cartesian":
        split = K
        params_nk = [raw[:, i * K:(i + 1) * K] for i in range(4)]
    else:
        raise NotImplementedError(warp_policy)

    matrix = make_affine_matrix(*params_nk)  # (N, split, 2, 3)
    if base_warp is not None:
        if base_warp.ndim == 3:
            base_warp = base_warp[:, None]
        matrix = base_warp @ make_3x3(matrix)
    if alpha is not None:
        eye = jnp.eye(2, 3, dtype=matrix.dtype)[None, None]
        a = jnp.reshape(alpha, (-1, 1, 1, 1))
        matrix = eye + a * (matrix - eye)
    out_res = output_resolution if output_resolution is not None else img.shape[-1]
    if stop_grad:
        matrix = jax.lax.stop_gradient(matrix)
    matrix = matrix.reshape(N * split, 2, 3)
    img_rep = jnp.repeat(img, split, axis=0)
    grid = affine_grid(matrix, (N * split, img.shape[1], out_res, out_res))
    out = _warp(img_rep, grid, cfg.antialias, padding_mode)
    oob = check_oob(grid, image_bounds, (out_res, out_res), split) \
        if return_out_of_bounds else None
    if unfold:
        out = out.reshape(N, -1, out.shape[1], out_res, out_res)
        matrix = matrix.reshape(N, -1, 2, 3)
        grid = grid.reshape(N, -1, out_res, out_res, 2)
    return out, grid, matrix, oob


def flow_head_init(key, in_ch, num_heads=1, flow_downsample=8) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {}
    add_subtree(p, "flow_out.0", equal_conv2d_init(k1, in_ch, in_ch, 3))
    fo2 = equal_conv2d_init(k2, in_ch, num_heads * 2, 3)
    fo2["weight"] = jnp.zeros_like(fo2["weight"])  # identity at init
    add_subtree(p, "flow_out.2", fo2)
    add_subtree(p, "mask_out.0", equal_conv2d_init(k3, in_ch, in_ch, 3))
    add_subtree(p, "mask_out.2", equal_conv2d_init(
        k4, in_ch, num_heads * 9 * flow_downsample * flow_downsample, 3))
    return p


def _unfold3x3(x):
    """(N, C, H, W) -> (N, C, 9, H, W): 3x3 zero-padded patch extraction in
    torch F.unfold channel order (ki*3 + kj)."""
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    H, W = x.shape[2], x.shape[3]
    patches = [xp[:, :, i:i + H, j:j + W] for i in range(3) for j in range(3)]
    return jnp.stack(patches, axis=2)


def convex_upsample_flow(flow, mask, ds):
    """RAFT convex upsampling (warping_heads.py:180-193).

    flow: (N, H, W, 2) low-res; mask: (N, 9*ds*ds, H, W). Returns
    (N, ds*H, ds*W, 2)."""
    N, H, W, _ = flow.shape
    f = flow.transpose(0, 3, 1, 2)  # (N, 2, H, W)
    m = mask.reshape(N, 1, 9, ds, ds, H, W)
    m = jax.nn.softmax(m, axis=2)
    up = _unfold3x3(ds * f).reshape(N, 2, 9, 1, 1, H, W)
    up = jnp.sum(m * up, axis=2)  # (N, 2, ds, ds, H, W)
    up = up.transpose(0, 4, 2, 5, 3, 1)  # (N, H, ds, W, ds, 2)
    return up.reshape(N, ds * H, ds * W, 2)


def flow_head(params: Params, cfg: STNConfig, img, features,
              output_resolution=None, alpha=None, base_warp=None,
              stop_grad=False, padding_mode="border",
              return_out_of_bounds=False, image_bounds=None,
              warp_policy="cartesian", unfold=False, prefix="warp_head"):
    """Regress + apply an unconstrained flow (warping_heads.py:205-265).

    features: (N, D, h, w) at flow_size/flow_downsample resolution.
    Returns (out, flow, delta_flow, oob)."""
    K = cfg.num_heads
    ds = cfg.flow_downsample
    N = features.shape[0]

    h = equal_conv2d(params, f"{prefix}.flow_out.0", features, padding=1)
    h = jax.nn.relu(h)
    raw_flow = equal_conv2d(params, f"{prefix}.flow_out.2", h, padding=1)
    Hc, Wc = raw_flow.shape[2], raw_flow.shape[3]
    low_flow = raw_flow.reshape(N, K, 2, Hc, Wc).transpose(0, 1, 3, 4, 2)

    hm = equal_conv2d(params, f"{prefix}.mask_out.0", features, padding=1)
    hm = jax.nn.relu(hm)
    mask = equal_conv2d(params, f"{prefix}.mask_out.2", hm, padding=1)
    mask = mask.reshape(N, K, 9 * ds * ds, Hc, Wc)

    if isinstance(warp_policy, (jnp.ndarray, jax.Array)):
        assignments = jnp.argmax(warp_policy, axis=1) % K
        low_flow = jnp.take_along_axis(
            low_flow, assignments[:, None, None, None, None], axis=1)[:, 0][:, None]
        mask = jnp.take_along_axis(
            mask, assignments[:, None, None, None, None], axis=1)[:, 0][:, None]
        split = 1
    elif warp_policy == "cartesian":
        split = K
    else:
        raise NotImplementedError(warp_policy)

    low_flow = low_flow.reshape(N * split, Hc, Wc, 2)
    mask = mask.reshape(N * split, -1, Hc, Wc)
    delta_flow = convex_upsample_flow(low_flow, mask, ds)  # (N*s, fs, fs, 2)
    fs = ds * Hc
    ident = identity_grid(1, fs, fs, dtype=delta_flow.dtype)
    flow = ident + delta_flow
    if base_warp is not None:
        flow = apply_affine(base_warp.reshape(-1, 2, 3), flow)
    if alpha is not None:
        a = jnp.reshape(alpha, (-1, 1, 1, 1))
        flow = ident + a * (flow - ident)
    if output_resolution is not None and output_resolution != flow.shape[1]:
        flow = interpolate_bilinear(
            flow.transpose(0, 3, 1, 2), output_resolution,
            output_resolution).transpose(0, 2, 3, 1)
    out_res = flow.shape[1]
    if stop_grad:
        flow = jax.lax.stop_gradient(flow)
    img_rep = jnp.repeat(img, split, axis=0)
    out = _warp(img_rep, flow, cfg.antialias, padding_mode)
    oob = check_oob(flow, image_bounds, (out_res, out_res), split) \
        if return_out_of_bounds else None
    if unfold:
        out = out.reshape(N, K, out.shape[1], out.shape[2], out.shape[3])
        flow = flow.reshape(N, K, out.shape[3], out.shape[4], 2)
        delta_flow = delta_flow.reshape(N, K, fs, fs, 2)
    return out, flow, delta_flow, oob


# ---------------------------------------------------------------------------
# single SpatialTransformer
# ---------------------------------------------------------------------------

def stn_init(key, cfg: STNConfig) -> Params:
    stem_ch, blocks, enc_out_ch, ch4 = cfg.encoder_plan()
    p: Params = {}
    keys = jax.random.split(key, len(blocks) + 4)
    add_subtree(p, "convs.0", conv_layer_init(keys[0], 3, stem_ch, 1))
    for bi, (ic, oc, down) in enumerate(blocks):
        add_subtree(p, f"convs.{bi + 1}",
                    res_block_init(keys[bi + 1], ic, oc, downsample=down))
    add_subtree(p, "final_conv", conv_layer_init(keys[-3], enc_out_ch, ch4, 3))
    if not cfg.is_flow:
        add_subtree(p, "final_linear",
                    equal_linear_init(keys[-2], ch4 * 4 * 4, ch4))
        add_subtree(p, "warp_head",
                    similarity_head_init(keys[-1], ch4, cfg.num_heads))
    else:
        add_subtree(p, "warp_head",
                    flow_head_init(keys[-1], enc_out_ch, cfg.num_heads,
                                   cfg.flow_downsample))
    return p


def stn_features(params: Params, cfg: STNConfig, img):
    """Encoder: downsample to flow_size, conv stack, final head features.

    With compute_dtype='bfloat16' the conv stack runs in bf16 (MXU 2x rate);
    features are cast back to float32 before the warp head so the regressed
    warps stay full precision."""
    if img.shape[-1] > cfg.flow_size:
        img = bilinear_downsample(img, img.shape[-1] // cfg.flow_size)
    if cfg.compute_dtype == "bfloat16":
        img = img.astype(jnp.bfloat16)
    _, blocks, _, ch4 = cfg.encoder_plan()
    out = conv_layer(params, "convs.0", img, 1)
    for bi, (_, _, down) in enumerate(blocks):
        out = res_block(params, f"convs.{bi + 1}", out, downsample=down)
    out = conv_layer(params, "final_conv", out, 3)
    out = out.astype(jnp.float32)
    if not cfg.is_flow:
        out = out.reshape(out.shape[0], -1)
        out = equal_linear(params, "final_linear", out, activation=True)
    return out


def stn_single_forward(params: Params, cfg: STNConfig, input_img,
                       output_resolution=None, base_warp=None,
                       input_img_for_sampling=None, stop_grad=False,
                       alpha=None, padding_mode="border", image_bounds=None,
                       warp_policy="cartesian", unfold=False,
                       return_out_of_bounds=False):
    """One STN application (spatial_transformer.py:569-615).
    Returns [out, grid, flow_or_matrix, oob]."""
    source = input_img if input_img_for_sampling is None else input_img_for_sampling
    feats = stn_features(params, cfg, input_img)
    out_res = output_resolution if output_resolution is not None else cfg.flow_size
    head = flow_head if cfg.is_flow else similarity_head
    return head(params, cfg, source, feats, output_resolution=out_res,
                alpha=alpha, base_warp=base_warp, stop_grad=stop_grad,
                padding_mode=padding_mode,
                return_out_of_bounds=return_out_of_bounds,
                image_bounds=image_bounds, warp_policy=warp_policy,
                unfold=unfold, prefix="warp_head")


def stn_forward(params: Params, cfg: STNConfig, input_img,
                output_resolution=None, iters=1, base_warp=None,
                input_img_for_sampling=None, stop_grad=False, alpha=None,
                padding_mode="border", image_bounds=None,
                warp_policy="cartesian", unfold=False,
                return_out_of_bounds=False,
                intermediate_output_resolution=None,
                return_intermediates=False):
    """STN forward with optional warp-composing recursion
    (spatial_transformer.py:472-567). ``iters`` is static.

    Returns [out, grid, flow_or_matrix, oob] ("packed" form)."""
    if iters == 1:
        return stn_single_forward(
            params, cfg, input_img, output_resolution=output_resolution,
            base_warp=base_warp, input_img_for_sampling=input_img_for_sampling,
            stop_grad=stop_grad, alpha=alpha, padding_mode=padding_mode,
            image_bounds=image_bounds, warp_policy=warp_policy, unfold=unfold,
            return_out_of_bounds=return_out_of_bounds)
    assert not cfg.is_flow, "iterated forward is only for similarity STNs"
    out = input_img
    source = input_img if input_img_for_sampling is None else input_img_for_sampling
    inter_res = intermediate_output_resolution or cfg.flow_size
    M = base_warp
    intermediates = []
    grid = oob = None
    for it in range(iters):
        last = it == iters - 1
        out, grid, M, oob = stn_single_forward(
            params, cfg, out,
            output_resolution=output_resolution if last else inter_res,
            base_warp=M, input_img_for_sampling=source, stop_grad=stop_grad,
            alpha=alpha if last else None, padding_mode=padding_mode,
            image_bounds=image_bounds,
            warp_policy=warp_policy, unfold=unfold and last,
            return_out_of_bounds=return_out_of_bounds and last)
        if return_intermediates:
            intermediates.append((out, M))
    if return_intermediates:
        return intermediates
    return [out, grid, M, oob]


def normalize_points(points, res, out_res):
    """[0, out_res-1] pixel coords -> [-1, 1] grid coords
    (spatial_transformer.py:617-619)."""
    return (points / (out_res - 1) - 0.5) * 2.0 * ((res - 1) / res)


def unnormalize_points(points, res, out_res):
    """[-1, 1] grid coords -> [0, out_res-1] pixel coords
    (spatial_transformer.py:621-623)."""
    return (points / ((res - 1) / res) / 2.0 + 0.5) * (out_res - 1)


def convert_points(points, current_res, target_res):
    points = normalize_points(points, target_res, current_res)
    return unnormalize_points(points, target_res, target_res)


def _invert_similarity(matrix):
    """(N, 2, 3) -> inverse 3x3, transposed for right-multiplication."""
    N = matrix.shape[0]
    m33 = make_3x3(matrix)
    inv = jnp.linalg.inv(m33)
    return inv.transpose(0, 2, 1)


def stn_congeal_points(params: Params, cfg: STNConfig, imgA, pointsA,
                       normalize_input_points=True,
                       unnormalize_output_points=False,
                       output_resolution=None, iters=1,
                       input_img_for_sampling=None, return_full=False,
                       **kwargs):
    """Map points in image A to congealed space
    (spatial_transformer.py:631-672)."""
    N, num_points, _ = pointsA.shape
    source_res = (imgA.shape[-1] if input_img_for_sampling is None
                  else input_img_for_sampling.shape[-1])
    outA, gridA, fomA, _ = stn_forward(
        params, cfg, imgA, output_resolution=output_resolution, iters=iters,
        input_img_for_sampling=input_img_for_sampling, **kwargs)
    if normalize_input_points:
        pointsA = normalize_points(pointsA, source_res, source_res)
    if not cfg.is_flow:
        pts = jnp.concatenate(
            [pointsA, jnp.ones((N, num_points, 1), pointsA.dtype)], axis=2)
        A2congealed = _invert_similarity(fomA)
        congealed = (pts @ A2congealed)[..., :2]
        if unnormalize_output_points:
            congealed = unnormalize_points(congealed, source_res, source_res)
    else:
        # Brute-force NN inversion of the reverse-sampling flow
        # (spatial_transformer.py:656-668).
        gridA_full = fomA + identity_grid(1, fomA.shape[1], fomA.shape[2],
                                          dtype=fomA.dtype)
        H, W = gridA_full.shape[1], gridA_full.shape[2]
        g = gridA_full.reshape(N, H * W, 2)
        # dist^2 = |p|^2 + |g|^2 - 2 <g, p>
        sims = jnp.einsum("nhc,npc->nhp", g, pointsA)
        d = (jnp.sum(pointsA ** 2, axis=-1)[:, None, :]
             + jnp.sum(g ** 2, axis=-1)[:, :, None] - 2 * sims)
        nn_idx = jnp.argmin(d, axis=1)  # (N, P)
        congealed = jnp.stack([nn_idx % W, nn_idx // W], axis=-1).astype(
            pointsA.dtype)
    if return_full:
        return outA, fomA, congealed
    return congealed


def stn_uncongeal_points(params: Params, cfg: STNConfig, imgB,
                         points_congealed, unnormalize_output_points=True,
                         normalize_input_points=False, output_resolution=None,
                         iters=1, input_img_for_sampling=None,
                         return_congealed_img=False, **kwargs):
    """Map congealed-space points into image B
    (spatial_transformer.py:674-707)."""
    N, num_points, _ = points_congealed.shape
    source_res = (imgB.shape[-1] if input_img_for_sampling is None
                  else input_img_for_sampling.shape[-1])
    outB, gridB, fomB, _ = stn_forward(
        params, cfg, imgB, output_resolution=output_resolution, iters=iters,
        input_img_for_sampling=input_img_for_sampling, **kwargs)
    if normalize_input_points:
        points_congealed = normalize_points(points_congealed, source_res,
                                            imgB.shape[-1])
    if not cfg.is_flow:
        pts = jnp.concatenate([points_congealed,
                               jnp.ones((N, num_points, 1),
                                        points_congealed.dtype)], axis=2)
        congealed2B = make_3x3(fomB).transpose(0, 2, 1)
        pointsB = (pts @ congealed2B)[..., :2]
    else:
        pointsB = sample_grid_at_points(gridB, points_congealed)
    if unnormalize_output_points:
        pointsB = unnormalize_points(pointsB, imgB.shape[-1], source_res)
    if return_congealed_img:
        return pointsB, outB
    return pointsB


def sample_grid_at_points(grid, points):
    """Sample an (N, H, W, 2) grid at (N, P, 2) normalized points via
    bilinear border sampling (spatial_transformer.py:704)."""
    g_img = grid.transpose(0, 3, 1, 2)  # (N, 2, H, W)
    pts = points[:, :, None, :].astype(jnp.float32)  # (N, P, 1, 2)
    sampled = grid_sample(g_img, pts, padding_mode="border")  # (N, 2, P, 1)
    return sampled[..., 0].transpose(0, 2, 1)  # (N, P, 2)


def stn_transfer_points(params: Params, cfg: STNConfig, imgA, imgB, pointsA,
                        output_resolution=None, iters=1, **kwargs):
    congealed = stn_congeal_points(params, cfg, imgA, pointsA,
                                   output_resolution=output_resolution,
                                   iters=iters, **kwargs)
    return stn_uncongeal_points(params, cfg, imgB, congealed,
                                normalize_input_points=False,
                                output_resolution=output_resolution,
                                iters=iters, **kwargs)


# ---------------------------------------------------------------------------
# ComposedSTN
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ComposedSTNConfig:
    transforms: Tuple[str, ...] = ("similarity", "flow")
    flow_size: int = 128
    supersize: int = 256
    channel_multiplier: float = 0.5
    num_heads: int = 1
    flow_downsample: int = 8
    antialias: bool = True
    max_channels: int = 512
    compute_dtype: str = "float32"

    def stn_cfg(self, transform: str) -> STNConfig:
        return STNConfig(transform=transform, flow_size=self.flow_size,
                         supersize=self.supersize,
                         channel_multiplier=self.channel_multiplier,
                         num_heads=self.num_heads,
                         flow_downsample=self.flow_downsample,
                         antialias=self.antialias,
                         max_channels=self.max_channels,
                         compute_dtype=self.compute_dtype)

    @property
    def stn_cfgs(self):
        return [self.stn_cfg(t) for t in self.transforms]

    @property
    def is_flow(self):
        return "flow" in self.transforms


def composed_stn_init(key, cfg: ComposedSTNConfig) -> Params:
    p: Params = {}
    keys = jax.random.split(key, len(cfg.transforms))
    for i, scfg in enumerate(cfg.stn_cfgs):
        add_subtree(p, f"stns.{i}", stn_init(keys[i], scfg))
    return p


def composed_stn_forward(params: Params, cfg: ComposedSTNConfig, input_img,
                         output_resolution=None, iters=1,
                         warp_policy="cartesian", alpha=None, unfold=False,
                         input_img_for_sampling=None, padding_mode="border",
                         stop_grad=False, image_bounds=None,
                         return_out_of_bounds=False,
                         return_intermediates=False):
    """Chain the STNs, threading each stage's warp into the next as base_warp
    (spatial_transformer.py:78-139).

    Returns [out, grid, flow_or_matrix, sim_out, oob]; the last two stages'
    extras are None when not applicable. Callers slice what they need.
    """
    out = input_img
    source = input_img if input_img_for_sampling is None else input_img_for_sampling
    warp = None
    inter_res = cfg.flow_size
    n_minus_1 = len(cfg.transforms) - 1
    K = cfg.num_heads
    sim_out = None
    intermediates = []
    grid = fom = oob = None
    for i, scfg in enumerate(cfg.stn_cfgs):
        last = i == n_minus_1
        if K > 1 and isinstance(warp_policy, str) and warp_policy == "cartesian":
            if i == 0:
                wp_t = "cartesian"
            else:
                # after stage 0, each of the N*K streams keeps its own head
                N_cur = out.shape[0]
                eye = jnp.eye(K, dtype=out.dtype)
                wp_t = jnp.tile(eye, (N_cur // K, 1))
        else:
            wp_t = warp_policy
        out, grid, fom, oob = stn_forward(
            params_view(params, f"stns.{i}"), scfg, out,
            output_resolution=output_resolution if last else inter_res,
            iters=iters if i == 0 else 1,
            base_warp=warp, input_img_for_sampling=source,
            alpha=alpha if last else None, padding_mode=padding_mode,
            stop_grad=stop_grad, image_bounds=image_bounds,
            warp_policy=wp_t, unfold=unfold and last,
            return_out_of_bounds=return_out_of_bounds and last)
        if K > 1 and isinstance(warp_policy, str) \
                and warp_policy == "cartesian" and i == 0:
            source = jnp.repeat(source, K, axis=0)
        if return_intermediates:
            intermediates.append((out, grid))
        if i == 0:
            sim_out = out
        warp = fom
    if return_intermediates:
        return intermediates
    return [out, grid, fom, sim_out, oob]


def params_view(params: Params, prefix: str) -> Params:
    return subtree(params, prefix)


def composed_congeal_points(params: Params, cfg: ComposedSTNConfig, imgA,
                            pointsA, output_resolution=None, iters=1,
                            normalize_input_points=True,
                            unnormalize_output_points=False,
                            return_full=False, **kwargs):
    """(spatial_transformer.py:159-182)."""
    inter_res = cfg.flow_size
    outA = imgA
    congealed = pointsA
    warpA = None
    n_minus_1 = len(cfg.transforms) - 1
    for i, scfg in enumerate(cfg.stn_cfgs):
        last = i == n_minus_1
        outA, warpA, congealed = stn_congeal_points(
            params_view(params, f"stns.{i}"), scfg, outA, congealed,
            normalize_input_points=normalize_input_points if i == 0 else True,
            unnormalize_output_points=(unnormalize_output_points if last
                                       else True),
            iters=iters if i == 0 else 1,
            output_resolution=output_resolution if last else inter_res,
            base_warp=warpA, input_img_for_sampling=imgA, return_full=True,
            **kwargs)
    if return_full:
        return outA, warpA, congealed
    return congealed


def composed_uncongeal_points(params: Params, cfg: ComposedSTNConfig, imgB,
                              points_congealed, output_resolution=None,
                              iters=1, unnormalize_output_points=True,
                              normalize_input_points=False,
                              return_congealed_img=False, **kwargs):
    """(spatial_transformer.py:141-157): one composed forward pass, then
    sample the final grid at the congealed points."""
    if normalize_input_points:
        points_congealed = normalize_points(points_congealed,
                                            imgB.shape[-1], cfg.flow_size)
    out, gridB, _, _, _ = composed_stn_forward(
        params, cfg, imgB, output_resolution=output_resolution, iters=iters,
        **kwargs)
    pointsB = sample_grid_at_points(gridB, points_congealed)
    if unnormalize_output_points:
        pointsB = unnormalize_points(pointsB, imgB.shape[-1], imgB.shape[-1])
    if return_congealed_img:
        return pointsB, out
    return pointsB


def composed_transfer_points(params: Params, cfg: ComposedSTNConfig, imgA,
                             imgB, pointsA, output_resolution=None, iters=1,
                             **kwargs):
    """(spatial_transformer.py:184-198)."""
    congealed = composed_congeal_points(
        params, cfg, imgA, pointsA, output_resolution=output_resolution,
        iters=iters, normalize_input_points=True, **kwargs)
    return composed_uncongeal_points(
        params, cfg, imgB, congealed, output_resolution=output_resolution,
        iters=iters, normalize_input_points=True,
        unnormalize_output_points=True, **kwargs)


# ---------------------------------------------------------------------------
# flip inference (TV-smoothness mirror selection)
# ---------------------------------------------------------------------------

def composed_forward_with_flip(params: Params, cfg: ComposedSTNConfig,
                               input_img, return_flow=False, return_warp=False,
                               return_inputs=False, return_flip_indices=False,
                               **kwargs):
    """Run img and mirror(img); keep whichever residual flow is smoother
    (spatial_transformer.py:200-240)."""
    from gangealing_tpu.ops.flow import total_variation_loss
    both = jnp.concatenate([input_img, jnp.flip(input_img, axis=3)], axis=0)
    out, warp, flow, _, _ = composed_stn_forward(params, cfg, both, **kwargs)
    N = input_img.shape[0]
    congealed, congealedF = out[:N], out[N:]
    warp_, warpF = warp[:N], warp[N:]
    flow_, flowF = flow[:N], flow[N:]
    tv = total_variation_loss(flow_, reduce_batch=False)
    tvF = total_variation_loss(flowF, reduce_batch=False)
    mirror = (tvF < tv).reshape(N, 1, 1, 1)
    outs = [jnp.where(mirror, congealedF, congealed)]
    if return_warp:
        warpF = warpF.at[..., 0].multiply(-1.0)
        outs.append(jnp.where(mirror[..., None] if warpF.ndim == 5 else mirror,
                              warpF, warp_))
    if return_flow:
        outs.append(jnp.where(mirror, flowF, flow_))
    if return_inputs:
        outs.append(jnp.where(mirror, jnp.flip(input_img, axis=3), input_img))
    if return_flip_indices:
        outs.append(mirror)
    return outs[0] if len(outs) == 1 else outs


def composed_match_flows(params: Params, cfg: ComposedSTNConfig, imgA, imgB,
                         pointsA, pointsB=None, permutation=None, **kwargs):
    """Pairwise 4-way flip matching for PCK eval
    (spatial_transformer.py:242-295)."""
    from gangealing_tpu.ops.flow import total_variation_loss
    N = imgA.shape[0]
    imgA_f, imgB_f = jnp.flip(imgA, axis=3), jnp.flip(imgB, axis=3)
    inputs = jnp.concatenate([imgA, imgB, imgA_f, imgB_f], axis=0)
    _, _, flows, _, _ = composed_stn_forward(params, cfg, inputs, **kwargs)
    tvA, tvB, tvAf, tvBf = jnp.split(
        total_variation_loss(flows, reduce_batch=False), 4)
    pick = jnp.argmin(jnp.stack(
        [tvA + tvB, tvAf + tvB, tvA + tvBf, tvAf + tvBf]), axis=0)
    pick4 = pick.reshape(N, 1, 1, 1)
    imgA = jnp.where(pick4 % 2 == 0, imgA, imgA_f)
    imgB = jnp.where(pick4 <= 1, imgB, imgB_f)
    W = imgA.shape[-1]
    flipA = (pick % 2 != 0).reshape(N, 1)
    pointsA = pointsA.at[:, :, 0].set(
        jnp.where(flipA, W - 1 - pointsA[:, :, 0], pointsA[:, :, 0]))
    if permutation is not None:
        perm = jnp.asarray(permutation)
        pointsA = jnp.where(flipA[:, :, None], pointsA[:, perm], pointsA)
    if pointsB is not None:
        flipB = (pick > 1).reshape(N, 1)
        pointsB = pointsB.at[:, :, 0].set(
            jnp.where(flipB, imgB.shape[-1] - 1 - pointsB[:, :, 0],
                      pointsB[:, :, 0]))
        if permutation is not None:
            pointsA = jnp.where(flipB[:, :, None], pointsA[:, perm], pointsA)
        return imgA, imgB, pointsA, pointsB, pick4
    return imgA, imgB, pointsA, pick4


# ---------------------------------------------------------------------------
# AR object propagation
# ---------------------------------------------------------------------------

def composed_propagate_object(params: Params, cfg: ComposedSTNConfig,
                              congealed_object_points,
                              congealed_object_values, congealed_mask_values,
                              target_image, sigma, classifier=None,
                              cluster=None, max_sigma=8.0,
                              **uncongeal_kwargs):
    """Propagate a congealed-space RGBA object onto target images via
    uncongealing + Gaussian splatting (spatial_transformer.py:297-366).

    classifier: optional (params, cfg) tuple for clustering models.
    Returns (propagated_object_img, propagated_mask_img), each (N, C/1, H, W).

    TPU note: the reference's per-image ragged "valid point" gathers are
    replaced by masking — out-of-bounds points are dropped inside splat2d
    already, so no data-dependent shapes arise.
    """
    from gangealing_tpu.ops.splat import splat2d_auto as splat2d

    N = target_image.shape[0]
    supersize = target_image.shape[-1]
    assert target_image.shape[-2] == supersize, "square inputs only"

    if cfg.num_heads == 1:
        warp_policy = "cartesian"
        flip = jnp.zeros((N, 1, 1, 1), bool)
    else:
        assert classifier is not None, \
            "clustering models need a cluster classifier"
        cls_params, cls_cfg = classifier
        from gangealing_tpu.models.classifier import classifier_run_flip_target
        _, flip_vec = classifier_run_flip_target(cls_params, cls_cfg,
                                                 target_image, cluster)
        flip = flip_vec.reshape(N, 1, 1, 1)
        warp_policy = jnp.eye(cfg.num_heads,
                              dtype=target_image.dtype)[
            jnp.full((N,), cluster, jnp.int32)]

    propagated = composed_uncongeal_points(
        params, cfg, target_image, congealed_object_points,
        normalize_input_points=False, unnormalize_output_points=True,
        warp_policy=warp_policy, **uncongeal_kwargs)  # (N, P, 2)

    # splat2d skips out-of-bounds points internally; match the reference's
    # rounding-based visibility rule by nudging coords that round outside.
    rounded = jnp.round(propagated)
    visible = ((rounded[..., 0] >= 0) & (rounded[..., 1] >= 0)
               & (rounded[..., 0] < supersize) & (rounded[..., 1] < supersize))
    # move invisible points far outside so splat2d drops them
    propagated = jnp.where(visible[..., None], propagated, -1e6)

    blank_img = jnp.zeros_like(target_image)
    blank_mask = blank_img[:, :1]
    obj_img = splat2d(blank_img, propagated, congealed_object_values, sigma,
                      False, max_sigma=max_sigma)
    mask_img = splat2d(blank_mask, propagated, congealed_mask_values, sigma,
                       True, max_sigma=max_sigma)
    obj_img = jnp.where(flip, jnp.flip(obj_img, 3), obj_img)
    mask_img = jnp.where(flip, jnp.flip(mask_img, 3), mask_img)
    return obj_img, mask_img
