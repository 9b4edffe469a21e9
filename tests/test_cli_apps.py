"""CLI-level drive of propagate_to_images with the full reference flag
surface (objects/colorscale, flow-score filtering, dset_indices,
output_resolution, n_mean, save_individual_images)."""

import io
import os
import sys

import numpy as np
import pytest

import jax


def _png_bytes(arr):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="png")
    return buf.getvalue()


@pytest.mark.slow
def test_cli_propagate_full_flags(tmp_path, monkeypatch, rng):
    import torch
    from gangealing_tpu.models.stn import ComposedSTNConfig, composed_stn_init
    from gangealing_tpu.data.lmdb_io import write_lmdb
    from gangealing_tpu.cli.propagate_to_images import main
    from PIL import Image

    S = 64
    cfg = ComposedSTNConfig(transforms=("similarity", "flow"), flow_size=S,
                            supersize=S, channel_multiplier=0.25,
                            flow_downsample=4)
    params = composed_stn_init(jax.random.PRNGKey(0), cfg)
    ckpt = {
        "t_ema": {k: torch.from_numpy(np.asarray(v).copy())
                  for k, v in params.items()},
        "args": __import__("argparse").Namespace(
            transform=["similarity", "flow"], flow_size=S,
            stn_channel_multiplier=0.25, flow_downsample=4,
            num_heads=1, real_size=S),
    }
    ckpt_path = str(tmp_path / "stn.pt")
    torch.save(ckpt, ckpt_path)

    n = 6
    items = {b"length": str(n).encode()}
    for i in range(n):
        img = (rng.rand(S, S, 3) * 255).astype(np.uint8)
        items[f"{S}-{str(i).zfill(5)}".encode()] = _png_bytes(img)
    data = str(tmp_path / "data")
    write_lmdb(data, items)

    rgba = np.zeros((S, S, 4), np.uint8)
    rgba[20:40, 24:44, 3] = 255
    label = str(tmp_path / "label.png")
    Image.fromarray(rgba).save(label)

    scores = np.linspace(1.0, 0.1, n).astype(np.float32)
    flow_scores = str(tmp_path / "flow_scores.pt")
    torch.save(torch.from_numpy(scores), flow_scores)

    out = str(tmp_path / "vis")
    argv = ["propagate", "--ckpt", ckpt_path, "--real_data_path", data,
            "--real_size", str(S), "--out", out, "--label_path", label,
            "-s", "1.5", "-o", "0.8", "--no_flip_inference",
            "--flow_scores", flow_scores, "--fraction_retained", "0.5",
            "--dset_indices", "0", "2", "--resolution", str(S),
            "--output_resolution", "32", "--n_mean", "1",
            "--save_individual_images"]
    monkeypatch.setattr(sys, "argv", argv)
    main()

    assert os.path.exists(os.path.join(out, "congealed.png"))
    assert os.path.exists(os.path.join(out, "propagated.png"))
    # individual images saved under the (post-filter) dataset indices
    assert os.path.exists(os.path.join(out, "congealed", "00000.png"))
    assert os.path.exists(os.path.join(out, "congealed", "00002.png"))
    assert os.path.exists(os.path.join(out, "propagated", "00000.png"))

    # --average_path: the label (loaded at --resolution 32) must be splatted
    # onto the real_size average at CONVERTED coordinates (reference
    # make_visuals: convert resolution -> output_resolution=real_size) —
    # i.e. land in the label's relative position, not the top-left quadrant.
    avg_path = str(tmp_path / "avg.png")
    Image.fromarray(np.zeros((S, S, 3), np.uint8)).save(avg_path)
    out2 = str(tmp_path / "vis2")
    argv = ["propagate", "--ckpt", ckpt_path, "--real_data_path", data,
            "--real_size", str(S), "--out", out2, "--label_path", label,
            "--no_flip_inference", "--dset_indices", "0",
            "--resolution", str(S // 2), "--average_path", avg_path]
    monkeypatch.setattr(sys, "argv", argv)
    main()
    ann = np.asarray(Image.open(
        os.path.join(out2, "average_annotated.png")).convert("L"),
        np.float32)
    if ann.shape[0] == S + 4:  # images2grid pads a 2px border
        ann = ann[2:-2, 2:-2]
    assert ann.shape == (S, S)
    # label alpha covers rows 20:40, cols 24:44 (of 64); the annotation must
    # light that region, not its half-scale top-left-shrunken copy
    right_region = ann[22:38, 26:42].mean()
    wrong_region = ann[8:12, 10:14].mean()  # where unconverted pts would land
    assert right_region > 40, right_region
    assert right_region > 4 * (wrong_region + 1e-6), (right_region,
                                                      wrong_region)
