from gangealing_tpu.ops.grid_sample import grid_sample, affine_grid, identity_grid
