"""gangealing_tpu — a TPU-native (JAX/XLA/Pallas) framework for GAN-Supervised
Dense Visual Alignment (GANgealing, CVPR 2022).

Re-designed from scratch for TPU hardware: functional parameter pytrees, jit-compiled
compute graphs, Pallas kernels for the sampling/resampling primitives, and
`jax.sharding.Mesh`-based data parallelism over ICI in place of NCCL DDP.

Capability reference: wpeebles/gangealing (see SURVEY.md at repo root).
"""

__version__ = "0.1.0"
