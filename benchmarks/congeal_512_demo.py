"""BASELINE config #3 shaped run: flow_scores + congeal_dataset at 512px."""

import io
import os
import sys
import tempfile
import time

import numpy as np
import jax


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    from PIL import Image
    from gangealing_tpu.data.lmdb_io import write_lmdb
    from gangealing_tpu.models.stn import ComposedSTNConfig, composed_stn_init
    from gangealing_tpu.apps.flow_scores import compute_flow_scores
    from gangealing_tpu.apps.congeal_dataset import align_and_filter_dataset
    from gangealing_tpu.data.dataset import MultiResolutionDataset

    tmp = tempfile.mkdtemp()
    rng = np.random.RandomState(0)
    print(f"building synthetic 512px LMDB of {n} images ...", flush=True)
    items = {b"length": str(n).encode()}
    for i in range(n):
        arr = (rng.rand(512, 512, 3) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=90)
        items[f"512-{str(i).zfill(5)}".encode()] = buf.getvalue()
    path = os.path.join(tmp, "data")
    write_lmdb(path, items)

    cfg = ComposedSTNConfig(flow_size=128, supersize=512,
                            channel_multiplier=0.5)
    params = composed_stn_init(jax.random.PRNGKey(0), cfg)
    # non-zero similarity head -> non-trivial scales/warps
    import jax.numpy as jnp
    params["stns.0.warp_head.linear.bias"] = jnp.asarray(
        [0.05, -0.1, 0.02, 0.01])
    # non-zero flow head so per-image flow scores vary (all-equal scores
    # drop everything under the reference's strict quantile filter)
    k = "stns.1.warp_head.flow_out.2.weight"
    params[k] = 0.05 * jax.random.normal(jax.random.PRNGKey(7),
                                         params[k].shape)

    t0 = time.time()
    scores = compute_flow_scores(params, cfg, path, real_size=512, batch=16,
                                 no_flip_inference=True, save=True)
    t1 = time.time()
    print(f"flow_scores: {n} imgs in {t1 - t0:.1f}s "
          f"({n / (t1 - t0):.1f} imgs/s incl compile); "
          f"range [{scores.min():.5f}, {scores.max():.5f}]", flush=True)

    out = os.path.join(tmp, "aligned")
    t0 = time.time()
    used = align_and_filter_dataset(
        params, cfg, path, out, real_size=512, flow_size=128,
        output_resolution=512, batch=8, min_effective_resolution=192,
        flow_scores_path=os.path.join(path, "flow_scores.pt"),
        fraction_retained=0.75, no_flip_inference=True)
    t1 = time.time()
    ds = MultiResolutionDataset(out, resolution=512)
    print(f"congeal_dataset: kept {len(used)} of {n} in {t1 - t0:.1f}s; "
          f"output LMDB has {len(ds)} imgs at 512px", flush=True)
    x = ds[0]
    assert x.shape == (3, 512, 512)
    print("OK")


if __name__ == "__main__":
    main()
