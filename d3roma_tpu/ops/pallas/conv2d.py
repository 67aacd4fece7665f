"""MXU implicit-GEMM 3x3 convolution (stride 1, SAME) as a Pallas TPU kernel.

Why: the flagship UNet (SD2.1 geometry, reference train.py:751-772) spends
~56% of its per-step FLOPs in stride-1 3x3 convolutions at the latent
resolutions (45x80 ... 6x10).  XLA's conv lowering runs these at
~60-90 TFLOP/s on v5e in bf16 AND in int8 — far below the ~150 TFLOP/s the
same chip sustains on plain int8 GEMMs (measured, docs/PERFORMANCE.md).
This kernel restructures the conv so the MXU sees exactly those GEMMs.

The flattening trick
--------------------
Zero-pad the input by 1 pixel and flatten the spatial dims:
``P[h*(W+2) + w, c]`` for the padded frame.  The output pixel (h, w)
(0-indexed in the unpadded frame) is then

    y[h*(W+2) + w] = sum_{dy,dx in 0..2} P[h*(W+2)+w + dy*(W+2)+dx] @ K[dy,dx]

i.e. every conv tap is the SAME GEMM with the lhs shifted by a constant
number of rows (off = dy*(W+2)+dx).  The kernel runs 9 accumulated MXU dots
over row-shifted views of one VMEM-resident block — no im2col
materialization, no halo DMA.  Rows whose w >= W compute garbage that the
caller slices off; the FLOP overhead is (H+2)(W+2)/(HW) - 1 (7% at 45x80).

Grid: (cout_blocks, B) — the weight block stays resident while the kernel
sweeps the batch.  Each step holds one batch item's whole flattened frame,
so applicability is gated on the frame fitting VMEM — exactly the UNet's
latent resolutions; the full-resolution VAE frames fall back to XLA, which
already runs them near the int8 roofline (docs/PERFORMANCE.md).

int8 path: weights are quantized per output channel at trace time (hoisted
out of the sampling scan by XLA); activations are quantized INSIDE the
kernel with a static scale (ops/quant.py STATIC_ACT_SCALE — one VPU pass
over VMEM-resident data, no extra HBM traffic, no serial absmax reduction).
Accumulation is exact int32; dequantization is fused into the epilogue.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from d3roma_tpu.ops.quant import STATIC_ACT_SCALE, absmax_scale, quantize_int8

# One batch item's flattened frame must fit VMEM next to the weight block,
# the int32 accumulator and the output block (~16 MB/core total).
_MAX_X_BLOCK_BYTES = 4 * 1024 * 1024
_TN = 128  # output-channel block (one MXU lane tile)


def conv3x3_supported(x_shape, w_shape, strides, padding, dtype) -> bool:
    """Gate: stride-1 SAME 3x3, one frame small enough to hold in VMEM."""
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    if tuple(w_shape[:2]) != (3, 3) or tuple(strides) != (1, 1):
        return False
    if not isinstance(padding, str):
        pad = tuple(tuple(p) for p in padding)
        if pad != ((1, 1), (1, 1)):
            return False
    elif padding != "SAME":
        return False
    _, h, w, cin = x_shape
    m_pad = (h + 2) * (w + 2)
    return m_pad * cin * jnp.dtype(dtype).itemsize <= _MAX_X_BLOCK_BYTES


def _row_chunk(cin: int, itemsize: int) -> int:
    """Rows per inner chunk: the 9 shifted tap slices are materialized by
    Mosaic, so bound 9 * chunk * cin * itemsize to ~5 MB (whole-frame
    accumulation OOM'd scoped VMEM at 640-channel frames)."""
    target = 5 * 1024 * 1024 // (9 * cin * itemsize)
    return max(256, 1 << (target.bit_length() - 1)) if target >= 256 else 256


def _kernel_int8(x_ref, w_ref, ws_ref, o_ref, *, offsets, m_out, act_scale):
    """x_ref: [M_pad, Cin] int8 (one flattened padded frame, pre-quantized
    in XLA so the VMEM block is 1 byte/elem — the quantize pass fuses into
    the producing op).  w_ref: [9*Cin, TN] int8   ws_ref: [1, TN] f32
    o_ref: [M_pad, TN].  Rows are processed in chunks so the tap slices
    and the int32 accumulator stay within scoped VMEM."""
    cin = x_ref.shape[1]
    tn = o_ref.shape[1]
    deq = act_scale * ws_ref[0, :][None, :]
    chunk = _row_chunk(cin, 1)
    for r0 in range(0, m_out, chunk):
        r = min(chunk, m_out - r0)
        acc = jnp.zeros((r, tn), jnp.int32)
        for t, off in enumerate(offsets):
            acc += jax.lax.dot_general(
                x_ref[r0 + off:r0 + off + r, :],
                w_ref[t * cin:(t + 1) * cin, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        o_ref[r0:r0 + r, :] = (acc.astype(jnp.float32) * deq).astype(o_ref.dtype)


def _kernel_bf16(x_ref, w_ref, o_ref, *, offsets, m_out):
    cin = x_ref.shape[1]
    tn = o_ref.shape[1]
    chunk = _row_chunk(cin, 2)
    for r0 in range(0, m_out, chunk):
        r = min(chunk, m_out - r0)
        acc = jnp.zeros((r, tn), jnp.float32)
        for t, off in enumerate(offsets):
            acc += jax.lax.dot_general(
                x_ref[r0 + off:r0 + off + r, :],
                w_ref[t * cin:(t + 1) * cin, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        o_ref[r0:r0 + r, :] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("quant", "act_scale", "interpret", "out_dtype")
)
def conv3x3_flat(x, w, *, quant: Optional[str] = None,
                 act_scale: float = STATIC_ACT_SCALE,
                 out_dtype=None, interpret: bool = False):
    """Stride-1 SAME 3x3 conv, NHWC x HWIO -> NHWC, via flattened-GEMM taps.

    quant=None: bf16/f32 MXU dots.  quant="static": int8 MXU dots with the
    given static activation scale and per-output-channel weight scales.
    """
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    out_dtype = out_dtype or x.dtype
    wp2 = wd + 2
    m_pad = (h + 2) * wp2
    # rows [0, m_out) cover every output pixel (h,w) at index h*wp2+w;
    # the largest tap slice then ends exactly at m_pad
    m_out = (h - 1) * wp2 + wd
    offsets = tuple(dy * wp2 + dx for dy in range(3) for dx in range(3))

    p = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).reshape(b, m_pad, cin)
    # [3,3,Cin,Cout] -> [9*Cin, Cout], rows grouped per tap
    wf = w.reshape(9 * cin, cout)

    grid = (pl.cdiv(cout, _TN), b)  # w block constant while sweeping batch
    out_spec = pl.BlockSpec((None, m_pad, _TN), lambda j, i: (i, 0, j),
                            memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((None, m_pad, cin), lambda j, i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((9 * cin, _TN), lambda j, i: (0, j),
                          memory_space=pltpu.VMEM)

    if quant == "static":
        ws = absmax_scale(wf, axes=(0,))  # [1, Cout]
        wq = quantize_int8(wf, ws)
        pq = quantize_int8(p, jnp.float32(act_scale))
        kern = functools.partial(
            _kernel_int8, offsets=offsets, m_out=m_out,
            act_scale=float(act_scale),
        )
        y = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[x_spec, w_spec,
                      pl.BlockSpec((1, _TN), lambda j, i: (0, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((b, m_pad, cout), out_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            interpret=interpret,
        )(pq, wq, ws.astype(jnp.float32))
    else:
        kern = functools.partial(_kernel_bf16, offsets=offsets, m_out=m_out)
        y = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[x_spec, w_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((b, m_pad, cout), out_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            interpret=interpret,
        )(p, wf.astype(x.dtype))

    # y[b, h*(W+2)+w, n] is output pixel (h, w); pad rows are garbage
    return y.reshape(b, h + 2, wp2, cout)[:, :h, :wd, :]


# --------------------------------------------------------------------- #
# Row-tap variant: dx folded into channels, tile-aligned dy taps
# --------------------------------------------------------------------- #

_MAX_XCAT_BYTES = 5 * 1024 * 1024


def conv3x3_rowtap_supported(x_shape, w_shape, strides, padding) -> bool:
    """Gate for conv3x3_rowtap: stride-1 SAME 3x3 with the dx-concat frame
    small enough to hold in VMEM (int8)."""
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    if tuple(w_shape[:2]) != (3, 3) or tuple(strides) != (1, 1):
        return False
    if not isinstance(padding, str):
        pad = tuple(tuple(p) for p in padding)
        if pad != ((1, 1), (1, 1)):
            return False
    elif padding != "SAME":
        return False
    _, h, w, cin = x_shape
    w_eff = -(-w // 32) * 32
    return (h + 2) * w_eff * 3 * cin <= _MAX_XCAT_BYTES


def _kernel_rowtap_int8(x_ref, w_ref, ws_ref, o_ref, *, w_eff, m_out,
                        act_scale):
    """x_ref: [(H+2)*W_eff, 3C] int8 (dx pre-folded into channels, rows
    flattened so the 3 dy taps are row shifts of W_eff — a multiple of the
    int8 sublane tile, so Mosaic slices are views, not VPU copies).
    w_ref: [3*3C, TN] int8 (dy-major).  o_ref: [H*W_eff, TN]."""
    c3 = x_ref.shape[1]
    tn = o_ref.shape[1]
    deq = act_scale * ws_ref[0, :][None, :]
    chunk = _row_chunk(c3, 1)
    chunk = -(-chunk // 32) * 32
    for r0 in range(0, m_out, chunk):
        r = min(chunk, m_out - r0)
        acc = jnp.zeros((r, tn), jnp.int32)
        for dy in range(3):
            acc += jax.lax.dot_general(
                x_ref[r0 + dy * w_eff:r0 + dy * w_eff + r, :],
                w_ref[dy * c3:(dy + 1) * c3, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        o_ref[r0:r0 + r, :] = (acc.astype(jnp.float32) * deq).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("act_scale", "out_dtype", "interpret")
)
def conv3x3_rowtap(x, w, *, act_scale: float = STATIC_ACT_SCALE,
                   out_dtype=None, interpret: bool = False):
    """Stride-1 SAME 3x3 conv via dx-concat + 3 tile-aligned dy-tap GEMMs.

    The flat-GEMM kernel above (conv3x3_flat) loses to XLA's conv emitter
    because its 9 tap offsets (dy*(W+2)+dx) are not multiples of the int8
    sublane tile, so every tap slice is a VPU relayout copy.  Here the dx
    taps are folded into the channel dim in XLA (one fused concat), and
    the remaining 3 dy taps are row shifts by W_eff — W padded to a
    32-multiple — which Mosaic can slice without copying. int8 MXU only.
    """
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    out_dtype = out_dtype or x.dtype
    w_eff = -(-wd // 32) * 32

    # dx fold: SAME-pad W, take the 3 dx slices, concat on channels
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
    xc = jnp.concatenate(
        [xp[:, :, 0:wd], xp[:, :, 1:wd + 1], xp[:, :, 2:wd + 2]], axis=-1
    )
    # pad W to the tile multiple, H by 1 (SAME) on both sides
    xc = jnp.pad(xc, ((0, 0), (1, 1), (0, w_eff - wd), (0, 0)))
    m_pad = (h + 2) * w_eff
    m_out = h * w_eff
    xf = xc.reshape(b, m_pad, 3 * cin)

    # [3,3,Cin,Cout] -> [3 (dy), 3*Cin (dx-major), Cout]
    wf = w.reshape(3, 3 * cin, cout).reshape(9 * cin, cout)
    ws = absmax_scale(wf, axes=(0,))  # [1, Cout]
    wq = quantize_int8(wf, ws)
    xq = quantize_int8(xf, jnp.float32(act_scale))

    grid = (b, pl.cdiv(cout, _TN))
    x_spec = pl.BlockSpec((None, m_pad, 3 * cin), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((9 * cin, _TN), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((1, _TN), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((None, m_out, _TN), lambda i, j: (i, 0, j),
                          memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel_rowtap_int8, w_eff=w_eff, m_out=m_out,
                             act_scale=float(act_scale))
    y = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[x_spec, w_spec, s_spec],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((b, m_out, cout), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(xq, wq, ws.astype(jnp.float32))

    return y.reshape(b, h, w_eff, cout)[:, :, :wd, :]
