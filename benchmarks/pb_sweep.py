"""Sweep GANGEALING_POINT_BLOCK over the flagship congeal forward.

The point block is captured at trace time (ops/pallas_mipmap.py), so each
sweep point runs in a FRESH subprocess with the env set before any compile;
this also defeats the persistent jit cache keying subtleties.

Usage:  python benchmarks/pb_sweep.py [batch [blocks...]]
        python benchmarks/pb_sweep.py 128 512 1024
"""

import os
import subprocess
import sys

_CHILD = """
import os, sys
sys.path.insert(0, {repo!r})
import numpy as np
import jax, jax.numpy as jnp
from gangealing_tpu.models.stn import (ComposedSTNConfig, composed_stn_init,
                                       composed_stn_forward)
from gangealing_tpu.utils.profiling import timed_call

B = {batch}
cfg = ComposedSTNConfig(flow_size=128, supersize=256, channel_multiplier=0.5)
params = composed_stn_init(jax.random.PRNGKey(0), cfg)
x = jax.random.normal(jax.random.PRNGKey(1), (B, 3, 256, 256))
fwd = jax.jit(lambda p, x: composed_stn_forward(p, cfg, x)[0].mean())
dt = timed_call(fwd, params, x)
print(f"PB={{os.environ.get('GANGEALING_POINT_BLOCK', 'auto')}}: "
      f"{{dt * 1e3:7.2f}} ms  {{B / dt:8.1f}} imgs/s", flush=True)
"""


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    blocks = sys.argv[2:] or ["auto", "512", "1024"]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for pb in blocks:
        env = dict(os.environ)
        if pb == "auto":
            env.pop("GANGEALING_POINT_BLOCK", None)
        else:
            env["GANGEALING_POINT_BLOCK"] = pb
        code = _CHILD.format(repo=repo, batch=batch)
        subprocess.run([sys.executable, "-c", code], env=env, check=False)


if __name__ == "__main__":
    main()
