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

import threading

import jax.numpy as jnp
from jax import lax

_EPS = 1e-8


def is_nhwc_dn(dimension_numbers) -> bool:
    """True iff `dimension_numbers` denotes NHWC/HWIO/NHWC.

    flax nn.Conv passes a NUMERIC lax.ConvDimensionNumbers (lhs_spec
    (0,3,1,2), rhs_spec (3,2,0,1), out_spec (0,3,1,2)), never the string
    tuple — a gate comparing against ("NHWC","HWIO","NHWC") silently
    rejects every real model call and falls back to the XLA conv.

    None is REJECTED: `lax.conv_general_dilated(dimension_numbers=None)`
    means the NCHW/OIHW defaults — an NHWC-assuming kernel would
    silently contract the wrong axes."""
    dn = dimension_numbers
    if dn == ("NHWC", "HWIO", "NHWC"):
        return True
    return (getattr(dn, "lhs_spec", None) == (0, 3, 1, 2)
            and getattr(dn, "rhs_spec", None) == (3, 2, 0, 1)
            and getattr(dn, "out_spec", None) == (0, 3, 1, 2))


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


# Fallback static activation scale for the "static" quant mode:
# GN/SiLU-normalized activations rarely exceed ~8 in magnitude. Dynamic
# absmax is exact but inserts a serial full reduction before every
# matmul/conv; a constant scale removes that dependency (PTQ-style).
# Calibrated per-layer scales (below) replace this default whenever a
# calibration table is active.
STATIC_ACT_SCALE = 8.0 / 127.0


class _ActScaleCtx(threading.local):
    """Per-call static activation-scale context (thread-local: the
    serving layer traces pipelines from MicroBatcher worker threads
    while the main thread may trace its own — each thread gets an
    independent context, so concurrent traces can't interleave scale
    consumption or trip the nesting assert).

    The static int8 ops consume activation scales in *call order* during
    tracing — the order is deterministic per model apply, so an index into
    a flat table identifies the layer without threading names through the
    flax `dot_general`/`conv_general_dilated` injection hooks.

    Modes:
      None      — every call uses STATIC_ACT_SCALE (uncalibrated PTQ).
      "capture" — every call *records* a tracer of absmax(x)/127 into
                  `taps` and computes in float (calibration pass; the taps
                  become jit outputs, see calibration.capture_scales).
                  With `quantiles` set, each tap is a VECTOR
                  [absmax, q_1, ..., q_n]/127 (the listed |x| quantiles
                  alongside the max) so one capture pass serves several
                  clipping strategies (percentile clipping is a standard
                  PTQ lever against absmax-outlier scale inflation).
      "replay"  — every call consumes the next calibrated scale (a python
                  float, i.e. a compile-time constant: zero runtime cost).
                  Call indices in `pins` run UNQUANTIZED (bf16 pinning of
                  drift-sensitive layers) while still consuming their
                  index, keeping the call-order contract intact.
    """

    def __init__(self):
        self.mode = None
        self.taps = None
        self.scales = None
        self.idx = 0
        self.quantiles = None
        self.pins = frozenset()
        self.shape_log = None


_ACTX = _ActScaleCtx()


class _ScaleCtxManager:
    def __init__(self, mode, payload, quantiles=None, pins=(),
                 shape_log=None):
        self.mode, self.payload = mode, payload
        self.quantiles, self.pins = quantiles, pins
        self.shape_log = shape_log

    def __enter__(self):
        assert _ACTX.mode is None, "nested act-scale contexts"
        _ACTX.mode = self.mode
        if self.mode == "capture":
            _ACTX.taps = self.payload
            _ACTX.quantiles = (tuple(self.quantiles)
                               if self.quantiles else None)
            _ACTX.shape_log = self.shape_log
        else:
            _ACTX.scales = list(self.payload)
            _ACTX.idx = 0
            _ACTX.pins = frozenset(self.pins or ())
        return self.payload

    def __exit__(self, *exc):
        idx, n = _ACTX.idx, len(_ACTX.scales or ())
        _ACTX.mode = None
        _ACTX.taps = None
        _ACTX.scales = None
        _ACTX.idx = 0
        _ACTX.quantiles = None
        _ACTX.pins = frozenset()
        _ACTX.shape_log = None
        if self.mode == "replay" and exc[0] is None:
            # idx == 0 means the jit cache was hit (no tracing happened);
            # anything else but full consumption is a call-order drift.
            if idx not in (0, n):
                raise RuntimeError(
                    f"calibrated-scale replay consumed {idx} of {n} scales "
                    "— the quantized call sequence no longer matches the "
                    "calibration pass")
        return False


def act_ctx_mode():
    """The active act-scale context mode: None | "capture" | "replay".

    Model code consults this to keep the CAPTURE forward free of Mosaic
    kernels: tapless Pallas paths (whole-row attention) are skipped and
    tap-consuming fused branches run inline XLA math instead — the
    Mosaic compiles made the capture programs slower to build than the
    remote-compile relay's connection lifetime (observed: Broken pipe at
    ~30 min), and the kernels do not change the recorded statistics."""
    return _ACTX.mode


def capture_act_scales(taps: list, quantiles=None, shape_log=None):
    """Context: static int8 ops record absmax(x)/127 tracers into `taps`
    and compute in float (the calibration forward). With `quantiles`
    (e.g. (0.9995, 0.999)), each tap is [absmax, q...]/127 instead of a
    scalar — see _ActScaleCtx.

    `shape_log`, when a list, additionally records `(kind, x.shape)` per
    call in call order (kind in {"dot","conv","attn","geglu"}) — shapes
    are static at trace time, so this works under `jax.eval_shape` with
    no device compute. It is how call indices are mapped back to layers
    (pipeline.quant_call_map / kind_pins: per-layer-class bf16 pinning)."""
    return _ScaleCtxManager("capture", taps, quantiles=quantiles,
                            shape_log=shape_log)


def replay_act_scales(scales, pins=()):
    """Context: static int8 ops consume `scales` (floats) in call order;
    call indices in `pins` run unquantized (bf16-pinned) but still
    consume their index."""
    return _ScaleCtxManager("replay", scales, pins=pins)


def consume_act_scale(x, kind=None):
    """Per-call activation-scale hook for the static int8 paths.

    Returns ("float", None) in capture mode (after recording the tap) —
    the caller must run the unquantized op; otherwise ("int8", scale)
    where scale is a python float (replay) or STATIC_ACT_SCALE, or
    ("float", None) for a bf16-pinned replay index. `kind` labels the
    call site for the capture-mode shape log (see capture_act_scales).
    """
    if _ACTX.mode == "capture":
        if _ACTX.shape_log is not None:
            _ACTX.shape_log.append(
                (kind, tuple(int(d) for d in x.shape)))
        ax = jnp.abs(x.astype(jnp.float32))
        if _ACTX.quantiles:
            qs = jnp.quantile(ax.reshape(-1),
                              jnp.asarray(_ACTX.quantiles, jnp.float32))
            _ACTX.taps.append(
                jnp.concatenate([jnp.max(ax)[None], qs]) / 127.0)
        else:
            _ACTX.taps.append(jnp.max(ax) / 127.0)
        return "float", None
    if _ACTX.mode == "replay":
        if _ACTX.idx >= len(_ACTX.scales):
            raise RuntimeError(
                f"calibrated-scale replay needs more than the "
                f"{len(_ACTX.scales)} captured scales — the quantized "
                "call sequence no longer matches the calibration pass. "
                "With wino_static, conv eligibility depends on batch "
                "size and the D3ROMA_WINO_* env: calibrate at the "
                "deployment batch size and env settings.")
        i = _ACTX.idx
        _ACTX.idx += 1
        if i in _ACTX.pins:
            return "float", None  # bf16-pinned layer
        return "int8", float(_ACTX.scales[i])
    return "int8", STATIC_ACT_SCALE


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
    mode, scale = consume_act_scale(lhs, kind="dot")
    if mode == "float":  # calibration capture pass
        return lax.dot_general(
            lhs, rhs, dimension_numbers, precision=precision,
            preferred_element_type=preferred_element_type,
        )
    ls = jnp.float32(scale)
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
    """int8 conv with a CONSTANT activation scale (no absmax pass).

    NHWC/HWIO only: the scale axes below assume channel-last operands,
    so any other layout falls back to the float conv (silently-wrong
    per-axis scales, not an error, would be the alternative)."""
    if (feature_group_count != 1 or batch_group_count != 1
            or not is_nhwc_dn(dimension_numbers)):
        return lax.conv_general_dilated(
            lhs, rhs, window_strides, padding, lhs_dilation, rhs_dilation,
            dimension_numbers, feature_group_count, batch_group_count,
            precision=precision, preferred_element_type=preferred_element_type,
        )
    out_dtype = jnp.promote_types(lhs.dtype, rhs.dtype)
    mode, scale = consume_act_scale(lhs, kind="conv")
    if mode == "float":  # calibration capture pass
        return lax.conv_general_dilated(
            lhs, rhs, window_strides, padding, lhs_dilation, rhs_dilation,
            dimension_numbers, feature_group_count, batch_group_count,
            precision=precision, preferred_element_type=preferred_element_type,
        )
    ls = jnp.float32(scale)
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
        # the Pallas kernel assumes NHWC/HWIO; any other layout must take
        # the XLA path or results would be silently transposed
        and is_nhwc_dn(dimension_numbers)
        and lhs_dilation in (None, (1, 1))
        and rhs_dilation in (None, (1, 1))
        # the kernel's VMEM frame block is int8 (quantized pre-kernel)
        and conv3x3_supported(lhs.shape, rhs.shape, window_strides, padding,
                              jnp.int8)
    ):
        mode, scale = consume_act_scale(lhs, kind="conv")
        if mode == "float":  # calibration capture pass
            return lax.conv_general_dilated(
                lhs, rhs, window_strides, padding, lhs_dilation,
                rhs_dilation, dimension_numbers,
                precision=precision,
                preferred_element_type=preferred_element_type,
            )
        # same output-dtype convention as the XLA fallback below: a
        # shape-dependent dtype flip (bf16 vs promoted f32) would change
        # numerics between kernel-admitted and rejected conv sites
        return conv3x3_flat(lhs, rhs, quant="static", act_scale=scale,
                            out_dtype=jnp.promote_types(lhs.dtype, rhs.dtype))
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
    contraction), per output channel for the kernel. Non-NHWC layouts
    fall back to the float conv (the scale axes assume channel-last).
    """
    if (feature_group_count != 1 or batch_group_count != 1
            or not is_nhwc_dn(dimension_numbers)):
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


def int8_conv_halo(lhs, rhs, window_strides, padding,
                   lhs_dilation=None, rhs_dilation=None,
                   dimension_numbers=None, feature_group_count=1,
                   batch_group_count=1, precision=None,
                   preferred_element_type=None):
    """Drop-in `lax.conv_general_dilated` for flax Conv: dispatch stride-1
    SAME 3x3 NHWC convs to the halo-DMA implicit-GEMM kernel
    (ops/pallas/conv2d_halo.py); everything else falls back to the XLA
    static-int8 conv."""
    from d3roma_tpu.ops.pallas.conv2d_halo import (
        conv3x3_halo,
        halo_conv_supported,
    )

    if (
        feature_group_count == 1
        and batch_group_count == 1
        and is_nhwc_dn(dimension_numbers)
        and lhs_dilation in (None, (1, 1))
        and rhs_dilation in (None, (1, 1))
        and halo_conv_supported(lhs.shape, rhs.shape, window_strides, padding)
    ):
        mode, scale = consume_act_scale(lhs, kind="conv")
        if mode == "float":  # calibration capture pass
            return lax.conv_general_dilated(
                lhs, rhs, window_strides, padding, lhs_dilation,
                rhs_dilation, dimension_numbers,
                precision=precision,
                preferred_element_type=preferred_element_type,
            )
        return conv3x3_halo(lhs, rhs, quant="static", act_scale=scale,
                            out_dtype=jnp.promote_types(lhs.dtype, rhs.dtype))
    return int8_conv_general_dilated_static(
        lhs, rhs, window_strides, padding, lhs_dilation, rhs_dilation,
        dimension_numbers, feature_group_count, batch_group_count,
        precision=precision, preferred_element_type=preferred_element_type,
    )
