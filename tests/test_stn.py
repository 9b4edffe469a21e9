"""Behavioral tests for the STN stack: identity-at-init, shapes, point
transfer round-trips, clustering policies, flip inference."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from gangealing_tpu.models.stn import (
    STNConfig, ComposedSTNConfig, stn_init, stn_forward, composed_stn_init,
    composed_stn_forward, composed_transfer_points, composed_forward_with_flip,
    composed_match_flows, make_affine_matrix, apply_affine,
    convex_upsample_flow, stn_congeal_points, stn_uncongeal_points,
    normalize_points, unnormalize_points)


S = 64
SIM_CFG = STNConfig(transform="similarity", flow_size=S, supersize=S,
                    channel_multiplier=0.25)
FLOW_CFG = STNConfig(transform="flow", flow_size=S, supersize=S,
                     channel_multiplier=0.25, flow_downsample=4)
COMP_CFG = ComposedSTNConfig(transforms=("similarity", "flow"), flow_size=S,
                             supersize=S, channel_multiplier=0.25,
                             flow_downsample=4)


def _img(rng, n=2, c=3, s=S):
    return jnp.asarray(rng.randn(n, c, s, s).astype(np.float32))


def test_similarity_identity_at_init(rng):
    params = stn_init(jax.random.PRNGKey(0), SIM_CFG)
    x = _img(rng)
    out, grid, M, _ = stn_forward(params, SIM_CFG, x)
    # zero-init head -> identity affine -> output == input
    eye = np.tile(np.eye(2, 3, dtype=np.float32), (2, 1, 1))
    np.testing.assert_allclose(np.asarray(M), eye, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)


def test_flow_identity_at_init(rng):
    params = stn_init(jax.random.PRNGKey(0), FLOW_CFG)
    x = _img(rng)
    out, flow, delta, _ = stn_forward(params, FLOW_CFG, x)
    np.testing.assert_allclose(np.asarray(delta), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)


def test_composed_forward_shapes(rng):
    params = composed_stn_init(jax.random.PRNGKey(0), COMP_CFG)
    x = _img(rng)
    out, grid, fom, sim_out, _ = composed_stn_forward(params, COMP_CFG, x)
    assert out.shape == (2, 3, S, S)
    assert grid.shape == (2, S, S, 2)
    assert fom.shape == (2, S, S, 2)  # residual flow of the last stage
    assert sim_out.shape == (2, 3, S, S)


def test_composed_output_resolution(rng):
    params = composed_stn_init(jax.random.PRNGKey(0), COMP_CFG)
    x = _img(rng)
    out, grid, _, _, _ = composed_stn_forward(params, COMP_CFG, x,
                                              output_resolution=64)
    assert out.shape == (2, 3, 64, 64)
    assert grid.shape == (2, 64, 64, 2)


def test_iterated_similarity(rng):
    params = stn_init(jax.random.PRNGKey(0), SIM_CFG)
    # Nudge head bias so warps are non-trivial and composition matters
    params["warp_head.linear.bias"] = jnp.asarray(
        np.array([0.1, 0.05, 0.02, -0.03], np.float32))
    x = _img(rng)
    out1, _, M1, _ = stn_forward(params, SIM_CFG, x, iters=1)
    out3, _, M3, _ = stn_forward(params, SIM_CFG, x, iters=3)
    assert out3.shape == out1.shape
    assert not np.allclose(np.asarray(M1), np.asarray(M3))


def test_transfer_points_identity_roundtrip(rng):
    """At init both stages are identity -> transferred points == inputs."""
    params = composed_stn_init(jax.random.PRNGKey(0), COMP_CFG)
    imgA, imgB = _img(rng), _img(rng)
    pts = jnp.asarray(rng.rand(2, 5, 2).astype(np.float32) * 31)
    out = composed_transfer_points(params, COMP_CFG, imgA, imgB, pts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=0.75)


def test_point_normalization_roundtrip(rng):
    pts = jnp.asarray(rng.rand(2, 7, 2).astype(np.float32) * 127)
    n = normalize_points(pts, 128, 128)
    back = unnormalize_points(n, 128, 128)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)


@pytest.mark.slow
def test_cluster_cartesian_and_assign(rng):
    cfg = ComposedSTNConfig(transforms=("similarity", "flow"), flow_size=S,
                            supersize=S, channel_multiplier=0.25,
                            flow_downsample=4, num_heads=3)
    params = composed_stn_init(jax.random.PRNGKey(0), cfg)
    x = _img(rng)
    out, grid, fom, _, _ = composed_stn_forward(params, cfg, x)
    assert out.shape == (6, 3, S, S)  # N*K
    # assign_only with logits
    logits = jnp.asarray(rng.randn(2, 3).astype(np.float32))
    out_a, _, _, _, _ = composed_stn_forward(params, cfg, x,
                                             warp_policy=logits)
    assert out_a.shape == (2, 3, S, S)


def test_forward_with_flip(rng):
    params = composed_stn_init(jax.random.PRNGKey(0), COMP_CFG)
    x = _img(rng)
    out, flow, inputs, flips = composed_forward_with_flip(
        params, COMP_CFG, x, return_flow=True, return_inputs=True,
        return_flip_indices=True)
    assert out.shape == (2, 3, S, S)
    assert flips.shape == (2, 1, 1, 1)


@pytest.mark.slow
def test_match_flows(rng):
    params = composed_stn_init(jax.random.PRNGKey(0), COMP_CFG)
    imgA, imgB = _img(rng), _img(rng)
    pts = jnp.asarray(rng.rand(2, 5, 2).astype(np.float32) * 31)
    a, b, pA, pick = composed_match_flows(params, COMP_CFG, imgA, imgB, pts)
    assert a.shape == imgA.shape and pA.shape == pts.shape
    assert pick.shape == (2, 1, 1, 1)


def test_make_affine_matrix_matches_spec(rng):
    rot = rng.randn(3, 2).astype(np.float32)
    sc = rng.randn(3, 2).astype(np.float32) * 0.3
    tx = rng.randn(3, 2).astype(np.float32)
    ty = rng.randn(3, 2).astype(np.float32)
    m = np.asarray(make_affine_matrix(*(jnp.asarray(v) for v in (rot, sc, tx, ty))))
    r = np.tanh(rot) * np.pi
    s = np.exp(sc)
    expect = np.stack([s * np.cos(r), -s * np.sin(r), tx,
                       s * np.sin(r), s * np.cos(r), ty], 2).reshape(3, 2, 2, 3)
    np.testing.assert_allclose(m, expect, atol=1e-6)


def test_convex_upsample_matches_torch_raft(rng):
    """Golden: our convex upsample vs the RAFT formula in torch ops."""
    N, H, W, ds = 2, 4, 4, 4
    flow = rng.randn(N, H, W, 2).astype(np.float32)
    mask = rng.randn(N, 9 * ds * ds, H, W).astype(np.float32)
    ours = convex_upsample_flow(jnp.asarray(flow), jnp.asarray(mask), ds)

    ft = torch.from_numpy(flow).permute(0, 3, 1, 2)
    mt = torch.from_numpy(mask).view(N, 1, 9, ds, ds, H, W)
    mt = torch.softmax(mt, dim=2)
    up = F.unfold(ds * ft, [3, 3], padding=1).view(N, 2, 9, 1, 1, H, W)
    up = torch.sum(mt * up, dim=2)
    up = up.permute(0, 4, 2, 5, 3, 1).reshape(N, ds * H, ds * W, 2)
    np.testing.assert_allclose(np.asarray(ours), up.numpy(), atol=1e-5,
                               rtol=1e-5)


def test_apply_affine_matches_affine_grid(rng):
    """apply_affine(theta, identity_grid) == affine_grid(theta)."""
    from gangealing_tpu.ops import identity_grid, affine_grid
    theta = jnp.asarray(rng.randn(2, 2, 3).astype(np.float32))
    ident = identity_grid(2, 8, 8)
    ours = apply_affine(theta, ident)
    expect = affine_grid(theta, (2, 1, 8, 8))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(expect), atol=1e-5)


def test_supersize_downsampling_path(rng):
    cfg = STNConfig(transform="similarity", flow_size=32, supersize=64,
                    channel_multiplier=0.25)
    params = stn_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.randn(2, 3, 64, 64).astype(np.float32))
    out, grid, M, _ = stn_forward(params, cfg, x)
    assert out.shape == (2, 3, 32, 32)  # flow_size output by default
    out2, _, _, _ = stn_forward(params, cfg, x, output_resolution=64)
    assert out2.shape == (2, 3, 64, 64)


@pytest.mark.slow
def test_stn_jit_and_grad(rng):
    params = composed_stn_init(jax.random.PRNGKey(0), COMP_CFG)
    x = _img(rng)

    @jax.jit
    def loss(p, x):
        out, _, fom, _, _ = composed_stn_forward(p, COMP_CFG, x)
        return jnp.mean(out ** 2) + jnp.mean(fom ** 2)

    g = jax.grad(loss)(params, x)
    gnorms = [float(jnp.linalg.norm(v)) for v in g.values()]
    assert np.isfinite(gnorms).all()
    assert any(n > 0 for n in gnorms)
