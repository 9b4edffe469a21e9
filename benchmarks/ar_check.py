"""Drive the full mixed_reality AR pipeline on the real TPU: ComposedSTN
uncongeal of a 1024-resolution dense label per frame, Pallas MXU splat,
laplacian-pyramid blending, congealed-video path. Reference capability:
applications/mixed_reality.py:83-300.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/ar_check.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax
from PIL import Image
from gangealing_tpu.models.stn import ComposedSTNConfig, composed_stn_init
from gangealing_tpu.apps.mixed_reality import run_gangealing_on_video

S = 256
cfg = ComposedSTNConfig(transforms=("similarity", "flow"), flow_size=128,
                        supersize=S, channel_multiplier=0.5)
params = composed_stn_init(jax.random.PRNGKey(0), cfg)
rng = np.random.RandomState(0)
frames = (rng.rand(6, 3, S, S).astype(np.float32) * 2 - 1)
rgba = np.zeros((128, 128, 4), np.uint8)
rgba[40:80, 50:90, 1] = 255; rgba[40:80, 50:90, 3] = 255
os.makedirs("/tmp/ar", exist_ok=True)  # scratch dir for the label
Image.fromarray(rgba).save("/tmp/ar/label.png")
out = run_gangealing_on_video(
    params, cfg, frames, label_path="/tmp/ar/label.png", sigma=1.5,
    opacity=1.0, blend_alg="laplacian", resolution=1024, batch=2,
    no_flip_inference=True)
prop = out["propagated"]
print("propagated:", prop.shape, "finite:", np.isfinite(prop).all())
print("congealed:", out["congealed"].shape)
print("AR TPU OK")
