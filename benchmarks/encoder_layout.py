"""Round-4 encoder-schedule experiments (committed record; all LOSE).

Three attempts to beat XLA's NCHW encoder schedule at the flagship
batch-128 shapes (ComposedSTN flow_size=128, cm=0.5), each measured on a
real v5e chip. Run: python benchmarks/encoder_layout.py [batch]

1. fused blur->conv (GANGEALING_FUSE_BLUR_CONV=1, models/layers.py):
   compose the downsampling ConvLayer's FIR blur into its 3x3 stride-2
   conv (one 6x6 conv, zero extra HBM traffic, 4x FLOPs on that conv).
   MEASURED: sim encoder 14.9 -> 21.6 ms, flow 15.9 -> 20.6 ms. The
   strided convs are FLOP-bound at ~60% MXU efficiency, so 4x FLOPs
   cost more than the eliminated blur round trip saves.

2. NHWC encoder (this file): transpose once at entry, run every conv in
   NHWC/HWIO (TPU's native conv layout) with depthwise separable FIR
   blurs (native in NHWC, no relayout), transpose back at exit.
   MEASURED: sim 14.2 (NCHW) vs 15.3 (NHWC), flow 13.9 vs 15.4 — the
   banded-matrix FIR in NCHW already matches native depthwise, and
   XLA's NCHW conv schedule is slightly better at these shapes.

3. slot-major mipmap coords (not in this file; ops/pallas_mipmap.py
   docstring): the (N, P, 16) coords operand costs a 1.9ms/warp XLA
   relayout copy (trace: 'data formatting', mipmap.py:231). Two kernel
   rewrites that consume slot-major (N, 16, P) coords — (a) fully
   transposed point-in-lanes math, (b) in-kernel (16, PB) block
   transpose — measured 44 ms and 49 ms per warp vs 12.7 ms baseline:
   Mosaic lowers sublane-contraction dot_generals and sub-128-lane
   transposes poorly. The 2 x 1.9 ms copies stay as a characterized
   residual (~5.7% of the forward).

Conclusion: the XLA NCHW schedule + banded-FIR matmuls + the existing
Pallas warp kernel are the measured optimum of the design space above;
the congeal forward's remaining structure is convs 33.5 ms + warp
kernels 25.5 ms + coords copies 3.8 ms + misc 3.7 ms (trace-profiled,
batch 128).
"""

import math
import sys

import jax
import jax.numpy as jnp
from jax import lax

from gangealing_tpu.models.stn import ComposedSTNConfig, composed_stn_init
from gangealing_tpu.utils.profiling import timed_call
import gangealing_tpu.models.layers as L

DN_NHWC = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                     ("NHWC", "HWIO", "NHWC"))
K1 = jnp.asarray([1.0, 3.0, 3.0, 1.0])
K1 = K1 / K1.sum()


def _lrelu(x, b):
    if b is not None:
        x = x + b
    return jnp.where(x >= 0, x, x * 0.2) * 2 ** 0.5


def _conv(x, w, s, pad):
    return lax.conv_general_dilated(x, w, (s, s), pad,
                                    dimension_numbers=DN_NHWC)


def _fir_sep(x, pad, stride=1):
    """Separable [1,3,3,1] FIR as native NHWC depthwise convs."""
    C = x.shape[-1]
    kv = jnp.broadcast_to(K1[:, None, None, None], (4, 1, 1, C))
    kh = jnp.broadcast_to(K1[None, :, None, None], (1, 4, 1, C))
    x = lax.conv_general_dilated(x, kv, (stride, 1), (pad, (0, 0)),
                                 dimension_numbers=DN_NHWC,
                                 feature_group_count=C)
    return lax.conv_general_dilated(x, kh, (1, stride), ((0, 0), pad),
                                    dimension_numbers=DN_NHWC,
                                    feature_group_count=C)


def encoder_stack_nhwc(p, cfg):
    """The STN encoder conv stack in NHWC (stem + ResBlocks + final_conv),
    numerically equivalent to the NCHW path (models/stn.py:stn_features)."""
    _, blocks, _, _ = cfg.encoder_plan()

    def hwio(w, fan):
        return jnp.transpose(w, (2, 3, 1, 0)) / math.sqrt(fan)

    def run(x_nchw):
        x = jnp.transpose(x_nchw, (0, 2, 3, 1))
        w = p["convs.0.0.weight"]
        x = _lrelu(_conv(x, hwio(w, w.shape[1]), 1, ((0, 0), (0, 0))),
                   p["convs.0.1.bias"])
        for bi, (ic, oc, down) in enumerate(blocks):
            pre = f"convs.{bi + 1}"
            w1 = p[f"{pre}.conv1.0.weight"]
            out = _lrelu(_conv(x, hwio(w1, ic * 9), 1, ((1, 1), (1, 1))),
                         p[f"{pre}.conv1.1.bias"])
            if down:
                out = _fir_sep(out, (2, 2))
                w2 = p[f"{pre}.conv2.1.weight"]
                out = _lrelu(_conv(out, hwio(w2, ic * 9), 2,
                                   ((0, 0), (0, 0))),
                             p[f"{pre}.conv2.2.bias"])
                ws = p[f"{pre}.skip.1.weight"]
                sk = _conv(_fir_sep(x, (1, 1), stride=2), hwio(ws, ic), 1,
                           ((0, 0), (0, 0)))
            else:
                w2 = p[f"{pre}.conv2.0.weight"]
                out = _lrelu(_conv(out, hwio(w2, ic * 9), 1,
                                   ((1, 1), (1, 1))),
                             p[f"{pre}.conv2.1.bias"])
                ws = p[f"{pre}.skip.0.weight"]
                sk = _conv(x, hwio(ws, ic), 1, ((0, 0), (0, 0)))
            x = (out + sk) / math.sqrt(2)
        wf = p["final_conv.0.weight"]
        x = _lrelu(_conv(x, hwio(wf, wf.shape[1] * 9), 1, ((1, 1), (1, 1))),
                   p["final_conv.1.bias"])
        return jnp.transpose(x, (0, 3, 1, 2))

    return run


def encoder_stack_nchw(p, cfg):
    _, blocks, _, _ = cfg.encoder_plan()

    def run(x):
        out = L.conv_layer(p, "convs.0", x, 1)
        for bi, (_, _, down) in enumerate(blocks):
            out = L.res_block(p, f"convs.{bi + 1}", out, downsample=down)
        return L.conv_layer(p, "final_conv", out, 3)

    return run


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cfg = ComposedSTNConfig(flow_size=128, supersize=256,
                            channel_multiplier=0.5)
    params = composed_stn_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(2), (B, 3, 128, 128))
    for name, pre, c in [("sim", "stns.0.", cfg.stn_cfgs[0]),
                         ("flow", "stns.1.", cfg.stn_cfgs[1])]:
        p = {k[len(pre):]: v for k, v in params.items() if k.startswith(pre)}
        fn_a = jax.jit(encoder_stack_nchw(p, c))
        fn_b = jax.jit(encoder_stack_nhwc(p, c))
        a, b = fn_a(x), fn_b(x)
        rel = float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(a)))
        t0 = timed_call(lambda x: fn_a(x).mean(), x)
        t1 = timed_call(lambda x: fn_b(x).mean(), x)
        print(f"{name}: NCHW {t0 * 1e3:6.2f} ms   NHWC {t1 * 1e3:6.2f} ms"
              f"   (rel err {rel:.1e})", flush=True)


if __name__ == "__main__":
    main()
