from gangealing_tpu.ops.grid_sample import (
    grid_sample, grid_sample_auto, affine_grid, identity_grid)
from gangealing_tpu.ops.pallas_grid_sample import (
    grid_sample_mxu, grid_sample_mxu_diff)
from gangealing_tpu.ops.resample import (
    upfirdn2d, upfirdn2d_general, upsample2x, downsample2x, blur,
    fused_leaky_relu, bilinear_downsample, interpolate_bilinear, make_kernel)
from gangealing_tpu.ops.mipmap import mipmap_warp, mipmap_levels
from gangealing_tpu.ops.splat import splat2d
from gangealing_tpu.ops.flow import total_variation_loss, flow_identity_loss
