"""Int8 dynamic-quantization compute paths for TPU inference.

The v5e MXU executes int8 x int8 -> int32 contractions at twice the bf16
rate (394 TOPS vs 197 TFLOPS peak). The reference has no quantization
support at all (pure fp16/fp32 torch); this module is a TPU-native
performance feature for the inference path, enabled per-pipeline via
`GuidedLatentDiffusionPipeline.quantize_int8()`.

Design:

- These functions are *injected* into flax modules through the public
  `nn.Dense(dot_general=...)` / `nn.Conv(conv_general_dilated=...)` hooks,
  so the parameter tree is unchanged — weights stay bf16/fp32 on disk and
  in checkpoints, and import/export paths are untouched.
- Weights are quantized symmetrically per output channel *at trace time*;
  inside the sampling `lax.scan` the weight quantization is loop-invariant
  and XLA hoists it out of the loop, so the per-step cost is the int8
  weight stream (half the bf16 bytes) plus the activation quantization.
- Activations are quantized dynamically: per token/row for dense layers
  (the scale reduces exactly over the contracted axis) and per batch item
  for convolutions (spatial windows overlap, so only batch factors out of
  the contraction).
- Accumulation is exact int32; dequantization multiplies the two absmax
  scales back in fp32 before casting to the compute dtype, so the only
  losses vs bf16 compute are the 8-bit rounding of inputs.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_EPS = 1e-8


def absmax_scale(x: jnp.ndarray, axes) -> jnp.ndarray:
    """Symmetric absmax scale over `axes`, kept-dims, >= _EPS (so exact-zero
    tensors quantize to zeros instead of NaN)."""
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axes, keepdims=True) / 127.0
    return jnp.maximum(s, _EPS)


def quantize_int8(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Round-to-nearest symmetric int8 quantization with the given scale."""
    return (
        jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127.0, 127.0)
        .astype(jnp.int8)
    )


# Static activation scale for the "static" quant mode: GN/SiLU-normalized
# activations rarely exceed ~8 in magnitude. Dynamic absmax is exact but
# inserts a serial full reduction before every matmul/conv; a constant
# scale removes that dependency (PTQ-style; calibration can refine it).
STATIC_ACT_SCALE = 8.0 / 127.0


def int8_dot_general_static(lhs, rhs, dimension_numbers, precision=None,
                            preferred_element_type=None):
    """int8 dot with a CONSTANT activation scale (no absmax pass)."""
    (lc, rc), (lb, rb) = dimension_numbers
    if lb or rb or tuple(lc) != (lhs.ndim - 1,) or tuple(rc) != (0,):
        return lax.dot_general(
            lhs, rhs, dimension_numbers, precision=precision,
            preferred_element_type=preferred_element_type,
        )
    out_dtype = jnp.promote_types(lhs.dtype, rhs.dtype)
    ls = jnp.float32(STATIC_ACT_SCALE)
    rs = absmax_scale(rhs, axes=(0,))
    out = lax.dot_general(
        quantize_int8(lhs, ls), quantize_int8(rhs, rs),
        dimension_numbers, preferred_element_type=jnp.int32,
    )
    out = out.astype(jnp.float32) * ls * jnp.squeeze(rs, axis=0)
    return out.astype(out_dtype)


def int8_conv_general_dilated_static(lhs, rhs, window_strides, padding,
                                     lhs_dilation=None, rhs_dilation=None,
                                     dimension_numbers=None,
                                     feature_group_count=1,
                                     batch_group_count=1, precision=None,
                                     preferred_element_type=None):
    """int8 conv with a CONSTANT activation scale (no absmax pass)."""
    if feature_group_count != 1 or batch_group_count != 1:
        return lax.conv_general_dilated(
            lhs, rhs, window_strides, padding, lhs_dilation, rhs_dilation,
            dimension_numbers, feature_group_count, batch_group_count,
            precision=precision, preferred_element_type=preferred_element_type,
        )
    out_dtype = jnp.promote_types(lhs.dtype, rhs.dtype)
    ls = jnp.float32(STATIC_ACT_SCALE)
    rs = absmax_scale(rhs, axes=tuple(range(rhs.ndim - 1)))
    out = lax.conv_general_dilated(
        quantize_int8(lhs, ls), quantize_int8(rhs, rs),
        window_strides, padding, lhs_dilation, rhs_dilation,
        dimension_numbers, preferred_element_type=jnp.int32,
    )
    out = out.astype(jnp.float32) * ls * rs.reshape((1,) * (out.ndim - 1) + (-1,))
    return out.astype(out_dtype)


def int8_conv_mxu(lhs, rhs, window_strides, padding,
                  lhs_dilation=None, rhs_dilation=None,
                  dimension_numbers=None, feature_group_count=1,
                  batch_group_count=1, precision=None,
                  preferred_element_type=None):
    """Drop-in `lax.conv_general_dilated` for flax Conv: dispatch stride-1
    SAME 3x3 convs whose frame fits VMEM to the Pallas implicit-GEMM int8
    kernel (ops/pallas/conv2d.py); everything else falls back to the XLA
    static-int8 conv (which already runs the full-resolution VAE frames
    near the int8 roofline — docs/PERFORMANCE.md)."""
    from d3roma_tpu.ops.pallas.conv2d import conv3x3_flat, conv3x3_supported

    if (
        feature_group_count == 1
        and batch_group_count == 1
        and lhs_dilation in (None, (1, 1))
        and rhs_dilation in (None, (1, 1))
        # the kernel's VMEM frame block is int8 (quantized pre-kernel)
        and conv3x3_supported(lhs.shape, rhs.shape, window_strides, padding,
                              jnp.int8)
    ):
        return conv3x3_flat(lhs, rhs, quant="static")
    return int8_conv_general_dilated_static(
        lhs, rhs, window_strides, padding, lhs_dilation, rhs_dilation,
        dimension_numbers, feature_group_count, batch_group_count,
        precision=precision, preferred_element_type=preferred_element_type,
    )


def int8_dot_general(lhs, rhs, dimension_numbers, precision=None,
                     preferred_element_type=None):
    """Drop-in `lax.dot_general` for flax Dense: dynamic int8 x int8 -> int32.

    Supports the Dense contraction pattern (lhs contracts its last axis
    against rhs axis 0, no batch dims) — the only pattern flax Dense emits.
    Scales: per-row (token) for lhs, per-output-feature for rhs.
    """
    (lc, rc), (lb, rb) = dimension_numbers
    if lb or rb or tuple(lc) != (lhs.ndim - 1,) or tuple(rc) != (0,):
        # not the Dense pattern — fall back to the exact matmul
        return lax.dot_general(
            lhs, rhs, dimension_numbers, precision=precision,
            preferred_element_type=preferred_element_type,
        )
    out_dtype = jnp.promote_types(lhs.dtype, rhs.dtype)
    ls = absmax_scale(lhs, axes=(lhs.ndim - 1,))      # [..., 1]
    rs = absmax_scale(rhs, axes=(0,))                  # [1, *out_features]
    out = lax.dot_general(
        quantize_int8(lhs, ls), quantize_int8(rhs, rs),
        dimension_numbers, preferred_element_type=jnp.int32,
    )
    out = out.astype(jnp.float32) * ls * jnp.squeeze(rs, axis=0)
    return out.astype(out_dtype)


def int8_conv_general_dilated(lhs, rhs, window_strides, padding,
                              lhs_dilation=None, rhs_dilation=None,
                              dimension_numbers=None, feature_group_count=1,
                              batch_group_count=1, precision=None,
                              preferred_element_type=None):
    """Drop-in `lax.conv_general_dilated` for flax Conv (NHWC/HWIO/NHWC):
    dynamic int8 x int8 -> int32 convolution.

    Scales: per batch item for the input (the only lhs axis outside the
    contraction), per output channel for the kernel.
    """
    if feature_group_count != 1 or batch_group_count != 1:
        return lax.conv_general_dilated(
            lhs, rhs, window_strides, padding, lhs_dilation, rhs_dilation,
            dimension_numbers, feature_group_count, batch_group_count,
            precision=precision, preferred_element_type=preferred_element_type,
        )
    out_dtype = jnp.promote_types(lhs.dtype, rhs.dtype)
    ls = absmax_scale(lhs, axes=tuple(range(1, lhs.ndim)))   # [B, 1, 1, 1]
    rs = absmax_scale(rhs, axes=tuple(range(rhs.ndim - 1)))  # [1, 1, 1, O]
    out = lax.conv_general_dilated(
        quantize_int8(lhs, ls), quantize_int8(rhs, rs),
        window_strides, padding, lhs_dilation, rhs_dilation,
        dimension_numbers, preferred_element_type=jnp.int32,
    )
    out = out.astype(jnp.float32) * ls * rs.reshape((1,) * (out.ndim - 1) + (-1,))
    return out.astype(out_dtype)
