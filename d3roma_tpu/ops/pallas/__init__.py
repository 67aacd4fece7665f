"""Custom Pallas TPU kernels for the hot paths.

- groupnorm.py: single-pass fused GroupNorm(+affine)+SiLU — one HBM read
  and one write, where XLA's decomposition reads the activation twice
  (reduction kernel + normalize/map kernel). Used by the UNet/VAE resnet
  blocks at latent resolutions where a whole batch item fits VMEM.
- conv2d.py: implicit-GEMM stride-1 SAME 3x3 conv (bf16 or int8 MXU) —
  the conv becomes 9 accumulated MXU dots over row-shifted views of one
  VMEM-resident flattened frame.
- attention.py: whole-row multi-head attention for the UNet's d=64
  transformer levels (<= ~6k tokens) — minimal lane padding, no online
  softmax, optional int8 MXU dots.
- geglu.py: fused GEGLU feed-forward (proj -> gelu-gate -> out-proj) —
  the 8x-wide intermediate never leaves VMEM; optional int8 MXU dots.
- winograd_fused.py: fused Winograd F(2x2,3x3) conv — the transformed
  tiles V and tap products M stay in VMEM (the XLA Winograd is
  HBM-bound on their round trips); 2.25x fewer MXU FLOPs than any
  direct-form conv.
"""

from d3roma_tpu.ops.pallas.attention import (  # noqa: F401
    mha_attention,
    mha_attention_tp,
    mha_supported,
    tp_attention_ok,
)
from d3roma_tpu.ops.pallas.attention_fused import (  # noqa: F401
    fused_attention_supported,
    fused_self_attention,
)
from d3roma_tpu.ops.pallas.conv2d import (  # noqa: F401
    conv3x3_flat,
    conv3x3_supported,
)
from d3roma_tpu.ops.pallas.geglu import (  # noqa: F401
    geglu_ff,
    geglu_ff_tp,
    tp_geglu_ok,
)
from d3roma_tpu.ops.pallas.groupnorm import (  # noqa: F401
    fused_group_norm_silu,
    group_norm_silu_supported,
)
from d3roma_tpu.ops.pallas.winograd_fused import (  # noqa: F401
    conv3x3_wino_fused,
    wino_fused_supported,
)
