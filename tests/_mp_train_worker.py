"""Worker for tests/test_multiprocess.py: one GANgealing train step on a
4-device CPU mesh, either as a single controller (4 local devices) or as one
of two processes in a real jax.distributed cluster (2 local devices each,
Gloo over localhost standing in for DCN).

Run:  python _mp_train_worker.py single
      python _mp_train_worker.py multi <process_id> <coordinator_port>

Prints one line "METRIC p=<float> tv=<float>" on success. The multi-process
path exercises exactly what real multi-host TPU (DCN) uses: distributed
init, a global mesh spanning non-addressable devices, shard_batch /
replicate assembling global arrays from process-local data, and
all_gather_hosts crossing processes. Capability reference:
utils/distributed.py:6-14 (setup_distributed), train.py:255-259 (DDP).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
_NDEV = "4" if sys.argv[1] in ("single", "flow_single", "prop_single",
                               "congeal_single", "avg_single",
                               "mr_single") else "2"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count="
                           + _NDEV)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def flow_main():
    """Sharded flow-score eval: each process scores its dataset stride on
    its local 2-device mesh and compute_flow_scores assembles the global
    array with all_gather_hosts — the multi-host eval-reduction path
    (reference applications/flow_scores.py:39-42)."""
    mode = sys.argv[1]
    if mode == "flow":
        pid, port, data_path = int(sys.argv[2]), sys.argv[3], sys.argv[4]
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=2, process_id=pid)
        assert jax.process_count() == 2
    else:
        data_path = sys.argv[2]

    from gangealing_tpu.apps.flow_scores import compute_flow_scores
    from gangealing_tpu.models.stn import (
        ComposedSTNConfig, composed_stn_init)
    from gangealing_tpu.parallel import auto_mesh

    cfg = ComposedSTNConfig(transforms=("similarity", "flow"), flow_size=64,
                            supersize=64, channel_multiplier=0.25,
                            flow_downsample=4, max_channels=32)
    params = composed_stn_init(jax.random.PRNGKey(0), cfg)
    k = "stns.1.warp_head.flow_out.2.weight"
    params[k] = 0.05 * jax.random.normal(jax.random.PRNGKey(7),
                                         params[k].shape)
    scores = compute_flow_scores(params, cfg, data_path, real_size=64,
                                 batch=3, no_flip_inference=True, save=False,
                                 mesh=auto_mesh())
    print("SCORES " + ",".join(f"{s:.8f}" for s in scores), flush=True)


def prop_main():
    """propagate_to_images across processes: each process congeals its
    stride of 7 images (short second stripe + padded tail batch) and the
    results are reassembled in global order via gather_process_stripes —
    the newly wired multi-process app path (reference
    propagate_to_images.py:90-96 DistributedSampler striding)."""
    import numpy as np

    mode = sys.argv[1]
    if mode == "prop":
        pid, port = int(sys.argv[2]), sys.argv[3]
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=2, process_id=pid)
        assert jax.process_count() == 2

    from gangealing_tpu.apps.propagate_to_images import propagate_to_images
    from gangealing_tpu.models.stn import (
        ComposedSTNConfig, composed_stn_init)
    from gangealing_tpu.parallel import auto_mesh

    cfg = ComposedSTNConfig(transforms=("similarity", "flow"), flow_size=64,
                            supersize=64, channel_multiplier=0.25,
                            flow_downsample=4, max_channels=32)
    params = composed_stn_init(jax.random.PRNGKey(0), cfg)
    k = "stns.1.warp_head.flow_out.2.weight"
    params[k] = 0.05 * jax.random.normal(jax.random.PRNGKey(7),
                                         params[k].shape)
    rng = np.random.RandomState(0)
    imgs = rng.rand(7, 3, 64, 64).astype(np.float32) * 2 - 1
    res = propagate_to_images(params, cfg, imgs, batch=3, mesh=auto_mesh(),
                              no_flip_inference=True, average_n=4)
    per_img = res["congealed"].reshape(7, -1).mean(axis=1)
    avg = float(res["average_congealed"].mean())
    print("PROP " + ",".join(f"{v:.8f}" for v in per_img)
          + f" AVG {avg:.8f}", flush=True)


def _tiny_stn():
    from gangealing_tpu.models.stn import (
        ComposedSTNConfig, composed_stn_init)
    cfg = ComposedSTNConfig(transforms=("similarity", "flow"), flow_size=64,
                            supersize=64, channel_multiplier=0.25,
                            flow_downsample=4, max_channels=32)
    params = composed_stn_init(jax.random.PRNGKey(0), cfg)
    k = "stns.1.warp_head.flow_out.2.weight"
    params[k] = 0.05 * jax.random.normal(jax.random.PRNGKey(7),
                                         params[k].shape)
    return params, cfg


def congeal_main():
    """congeal_dataset across processes: each process aligns its stride of
    the 10-image LMDB on its local devices and writes accepted PNGs under
    its per-process filename prefix into the SHARED temp folder; used
    indices cross processes via all_gatherv and only the primary process
    builds the output LMDB behind host barriers (the reference's
    chr(ord('a')+rank) scheme, congeal_dataset.py:29-38)."""
    import numpy as np

    mode = sys.argv[1]
    if mode == "congeal":
        pid, port, data_path, out = (int(sys.argv[2]), sys.argv[3],
                                     sys.argv[4], sys.argv[5])
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=2, process_id=pid)
        assert jax.process_count() == 2
    else:
        data_path, out = sys.argv[2], sys.argv[3]

    from gangealing_tpu.apps.congeal_dataset import align_and_filter_dataset
    from gangealing_tpu.data.dataset import MultiResolutionDataset
    from gangealing_tpu.parallel import auto_mesh

    params, cfg = _tiny_stn()
    used = align_and_filter_dataset(
        params, cfg, data_path, out, real_size=64, flow_size=64,
        output_resolution=64, batch=3, min_effective_resolution=32,
        no_flip_inference=True, mesh=auto_mesh())
    line = "USED " + ",".join(map(str, used))
    if jax.process_index() == 0:
        # LMDB item order differs between runs (per-process PNG prefixes),
        # so compare content as a sorted multiset of per-image means
        ds = MultiResolutionDataset(out, resolution=64)
        means = sorted(float(np.asarray(ds[i], np.float32).mean())
                       for i in range(len(ds)))
        line += " MEANS " + ",".join(f"{m:.6f}" for m in means)
    print(line, flush=True)


def avg_main():
    """average_image_video across processes: each process sums its stride
    of the images and the per-frame partial sums are reduced across hosts
    (the reference's per-rank n_mean shards + all_gather mean,
    vis_correspondence.py:338-379)."""
    import numpy as np

    mode = sys.argv[1]
    if mode == "avg":
        pid, port = int(sys.argv[2]), sys.argv[3]
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=2, process_id=pid)
        assert jax.process_count() == 2

    from gangealing_tpu.apps.vis_correspondence import average_image_video
    from gangealing_tpu.parallel import auto_mesh

    params, cfg = _tiny_stn()
    rng = np.random.RandomState(0)
    imgs = rng.rand(7, 3, 64, 64).astype(np.float32) * 2 - 1
    frames = average_image_video(params, cfg, imgs, num_frames=3, batch=3,
                                 mesh=auto_mesh())
    means = [float(np.asarray(f, np.float32).mean()) for f in frames]
    print("AVGFRAMES " + ",".join(f"{m:.6f}" for m in means), flush=True)


def mr_main():
    """mixed_reality across processes: each process renders its stride of
    the frames (propagated points + congealed frames) and the results are
    reassembled in global frame order via gather_process_stripes (the
    reference's stride-shard + de-interleave, mixed_reality.py:28-33)."""
    import numpy as np

    mode = sys.argv[1]
    if mode == "mr":
        pid, port = int(sys.argv[2]), sys.argv[3]
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=2, process_id=pid)
        assert jax.process_count() == 2

    from gangealing_tpu.apps.mixed_reality import run_gangealing_on_video
    from gangealing_tpu.parallel import auto_mesh

    params, cfg = _tiny_stn()
    rng = np.random.RandomState(0)
    frames = rng.rand(7, 3, 64, 64).astype(np.float32) * 2 - 1
    pts = rng.rand(5, 2).astype(np.float32) * 63
    colors = rng.rand(5, 3).astype(np.float32) * 2 - 1
    alphas = np.ones((5, 1), np.float32)
    out = run_gangealing_on_video(
        params, cfg, frames, points=np.asarray(pts),
        colors=np.asarray(colors), alphas=np.asarray(alphas),
        batch=3, no_flip_inference=True, save_correspondences=True,
        mesh=auto_mesh())
    lines = []
    for key in ("propagated", "congealed", "correspondences"):
        arr = np.asarray(out[key], np.float32)
        per_frame = arr.reshape(arr.shape[0], -1).mean(1)
        lines.append(key.upper() + " "
                     + ",".join(f"{m:.6f}" for m in per_frame))
    print("\n".join(lines), flush=True)


def gather_main():
    """gather_process_stripes with an EMPTY stripe on process 1
    (n_total=1 < process count): the empty process passes a bare
    np.zeros((0,)) and the descriptor gather must reconcile it to the
    non-empty process's trailing shape and dtype (both the float32 image
    case and the int32 assignment case that previously dtype-mismatched
    in bucket_real_images_by_cluster)."""
    import numpy as np

    pid, port = int(sys.argv[2]), sys.argv[3]
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2, process_id=pid)
    assert jax.process_count() == 2

    from gangealing_tpu.parallel import gather_process_stripes

    f_local = (np.arange(12, dtype=np.float32).reshape(1, 3, 4)
               if pid == 0 else np.zeros((0,)))
    f = gather_process_stripes(f_local, 1)
    assert f.shape == (1, 3, 4) and f.dtype == np.float32, (f.shape, f.dtype)
    i_local = (np.asarray([[7, 9]], np.int32) if pid == 0
               else np.zeros((0,)))
    g = gather_process_stripes(i_local, 1)
    assert g.shape == (1, 2) and g.dtype == np.int32, (g.shape, g.dtype)
    print(f"GATHER {f.sum():.1f} {int(g.sum())}", flush=True)


def main():
    mode = sys.argv[1]
    if mode == "gather":
        return gather_main()
    if mode in ("flow", "flow_single"):
        return flow_main()
    if mode in ("prop", "prop_single"):
        return prop_main()
    if mode in ("congeal", "congeal_single"):
        return congeal_main()
    if mode in ("avg", "avg_single"):
        return avg_main()
    if mode in ("mr", "mr_single"):
        return mr_main()
    if mode == "multi":
        pid, port = int(sys.argv[2]), sys.argv[3]
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=2, process_id=pid)
        assert jax.process_count() == 2
    assert len(jax.devices()) == 4, jax.devices()

    import numpy as np
    import jax.numpy as jnp
    from gangealing_tpu.models.stylegan2 import (
        GeneratorConfig, generator_init)
    from gangealing_tpu.models.stn import ComposedSTNConfig, composed_stn_init
    from gangealing_tpu.models.latent_learner import (
        LatentLearnerConfig, latent_learner_init)
    from gangealing_tpu.models.lpips import vgg16_init, lpips_distance
    from gangealing_tpu.train.state import (
        TrainConfig, init_train_state, make_train_step)
    from gangealing_tpu.parallel import (
        make_mesh, shard_batch, shard_global_batch, replicate,
        all_gather_hosts)

    g_cfg = GeneratorConfig(size=64, style_dim=32, n_mlp=2,
                            channel_multiplier=1, max_channels=32)
    t_cfg = ComposedSTNConfig(transforms=("similarity", "flow"), flow_size=64,
                              supersize=64, channel_multiplier=0.25,
                              flow_downsample=4, max_channels=32)
    ll_cfg = LatentLearnerConfig(n_comps=2, inject_index=3,
                                 n_latent=g_cfg.n_latent, num_heads=1,
                                 style_dim=32)
    cfg = TrainConfig(g=g_cfg, t=t_cfg, ll=ll_cfg, batch=4,
                      tv_weight=1000.0, flow_identity_weight=1.0,
                      anneal_psi=100, period=50, loss_fn="vgg_ssl")

    g_params = generator_init(jax.random.PRNGKey(0), g_cfg)
    t_params = composed_stn_init(jax.random.PRNGKey(1), t_cfg)
    ll_params = latent_learner_init(jax.random.PRNGKey(2), ll_cfg)
    vgg_params = vgg16_init(jax.random.PRNGKey(3))

    def perceptual_fn(p, x, y):
        return lpips_distance(p, x, y, use_lins=False) / 18.0

    mesh = make_mesh()
    state = replicate(mesh, init_train_state(t_params, ll_params))
    g_params = replicate(mesh, g_params)
    vgg_params = replicate(mesh, vgg_params)

    # Global batch of 4 z's, one per device. Multi process: each process
    # contributes only ITS two rows (contiguous-block layout of shard_batch).
    z_global = np.asarray(
        jax.random.normal(jax.random.PRNGKey(4), (4, g_cfg.style_dim)))
    if mode == "multi":
        pid = jax.process_index()
        z = shard_batch(mesh, z_global[2 * pid:2 * pid + 2])
        # shard_global_batch (what train/loop.py + classifier_train feed a
        # process-spanning mesh): every process passes the FULL global
        # batch and its contiguous block is sliced out automatically —
        # must produce the same local shards as the manual slicing above,
        # for the plain batch axis and for the scan layout (axis=1)
        zg = shard_global_batch(mesh, z_global)
        for a, b in zip(z.addressable_shards, zg.addressable_shards):
            assert a.index == b.index
            np.testing.assert_array_equal(np.asarray(a.data),
                                          np.asarray(b.data))
        zs_global = np.stack([z_global, z_global + 1.0])  # (k=2, 4, D)
        zs = shard_global_batch(mesh, zs_global, axis=1)
        for sh in zs.addressable_shards:
            np.testing.assert_array_equal(np.asarray(sh.data),
                                          zs_global[sh.index])
    else:
        z = shard_batch(mesh, z_global)

    step = make_train_step(cfg, g_params, vgg_params, perceptual_fn,
                           donate=False)
    new_state, metrics = step(state, z, jax.random.PRNGKey(5),
                              jnp.float32(0.9), jnp.float32(1e-3),
                              jnp.float32(1e-2))
    jax.block_until_ready(new_state)
    p, tv = float(metrics["p"]), float(metrics["tv"])
    assert np.isfinite(p) and np.isfinite(tv)

    if mode == "multi":
        # every process must see the same (psum-reduced) loss, and the
        # host-gather helper must cross processes
        got = all_gather_hosts(np.asarray([p], np.float32))
        assert got.shape[0] == 2, got.shape
        assert abs(got[0] - got[1]) < 1e-6, got
    print(f"METRIC p={p:.8f} tv={tv:.8f}", flush=True)


if __name__ == "__main__":
    main()
