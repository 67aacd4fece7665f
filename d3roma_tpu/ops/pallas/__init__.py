"""Custom Pallas TPU kernels for the hot paths.

- groupnorm.py: single-pass fused GroupNorm(+affine)+SiLU — one HBM read
  and one write, where XLA's decomposition reads the activation twice
  (reduction kernel + normalize/map kernel). Used by the UNet/VAE resnet
  blocks at latent resolutions where a whole batch item fits VMEM.
"""

from d3roma_tpu.ops.pallas.groupnorm import (  # noqa: F401
    fused_group_norm_silu,
    group_norm_silu_supported,
)
