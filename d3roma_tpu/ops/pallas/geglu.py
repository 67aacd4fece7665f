"""Fused GEGLU feed-forward (proj -> gelu-gate -> out-proj) Pallas kernel.

The SD-style transformer FF (reference model: SD2.1-geometry) is
``x @ W1 -> split(h, gate) -> h * gelu(gate) -> @ W2`` with an 8x-wide
intermediate.  XLA runs this as two GEMMs with the [N, 8C] intermediate
round-tripping through HBM plus separate elementwise/quantize passes —
measured ~61 TFLOP/s effective on v5e (11.4 ms of a 95 ms UNet step).
This kernel keeps the intermediate entirely in VMEM:

- grid (row_blocks, col_chunks): each program computes an h/gate column
  chunk for one row block and immediately accumulates its contribution to
  the second GEMM into a persistent f32 scratch accumulator; the [N, 4C]
  intermediate never exists in HBM.
- int8 path: x is pre-quantized in XLA (absmax fuses into the producing
  LayerNorm); weights are quantized per column at trace time; the gated
  intermediate is re-quantized per (row-block, chunk) on the VPU with a
  local absmax, and its scale folds into the f32 accumulation, so both
  GEMMs run on the int8 MXU.
- bf16 path: same structure with bf16 dots (still removes the HBM
  round-trip of the intermediate).

Weight layout: W1 is pre-split into W1h/W1g (the h and gate halves), so a
column chunk j needs one contiguous block of each.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from d3roma_tpu.ops.quant import STATIC_ACT_SCALE, absmax_scale, quantize_int8

def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_cols(f: int) -> int:
    """Largest 128-multiple <= 1024 dividing F (F is always a multiple of
    128 here: 4*C for C in {320, 640, 1280}).  Padding F instead wastes
    real MXU work — F=1280 padded to 2*1024 cost +60% at the widest level."""
    for d in range(min(1024, f), 0, -128):
        if f % d == 0:
            return d
    return min(1024, f)


def geglu_supported(c: int, f: int) -> bool:
    """Shapes the fused kernel can lower. The failure class is the F
    (hidden) axis: _pick_cols must find a lane-aligned column chunk, so
    F has to be a multiple of 128 (e.g. C=24 -> F=96 yields a 96-wide
    block Mosaic cannot tile). The flagship dims (C in {320, 640, 1280},
    F = 4C) are measured-good (docs/PERFORMANCE.md); the caps exclude
    far-off-menu widths whose weight chunks could not fit VMEM. Callers
    MUST gate on this before geglu_ff instead of crashing at trace
    time."""
    return f % 128 == 0 and c <= 2048 and f <= 8192


def _pick_rows(c: int) -> tuple[int, int]:
    """(macro row block, in-kernel sub-chunk).  Large macro blocks keep the
    weight chunks resident across more rows (the j grid dim is innermost,
    so weights are re-fetched once per (row block, chunk)); the sub-chunk
    bounds the transient f32 h/gate slabs."""
    return (2048, 512) if c <= 640 else (512, 256)


def _kernel_int8(x_ref, w1h_ref, w1g_ref, w2_ref, s1h_ref, s1g_ref, s2_ref,
                 b1h_ref, b1g_ref, b2_ref, o_ref, acc_ref,
                 *, n_chunks, sub_rows, act_scale, out_dtype):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:, :] = jnp.broadcast_to(b2_ref[0, :][None, :], acc_ref.shape)

    rows = x_ref.shape[0]
    d1h = act_scale * s1h_ref[0, :][None, :]
    d1g = act_scale * s1g_ref[0, :][None, :]
    b1h = b1h_ref[0, :][None, :]
    b1g = b1g_ref[0, :][None, :]
    s2 = s2_ref[0, :][None, :]
    # sub-chunk the rows so the transient f32 h/gate slabs stay small
    # while the macro row block keeps the weight chunks resident longer
    for r0 in range(0, rows, sub_rows):
        x = x_ref[r0:r0 + sub_rows, :]
        h = jax.lax.dot_general(
            x, w1h_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * d1h + b1h
        g = jax.lax.dot_general(
            x, w1g_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * d1g + b1g
        y = h * jax.nn.gelu(g)
        # local absmax re-quantization of the gated intermediate; the
        # scale folds into the f32 accumulation below
        sy = jnp.maximum(jnp.max(jnp.abs(y)), 1e-6) / 127.0
        yq = jnp.round(y / sy).astype(jnp.int8)
        part = jax.lax.dot_general(
            yq, w2_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc_ref[r0:r0 + sub_rows, :] += part.astype(jnp.float32) * (sy * s2)

    @pl.when(j == n_chunks - 1)
    def _():
        o_ref[:, :] = acc_ref[:, :].astype(out_dtype)


def _kernel_bf16(x_ref, w1h_ref, w1g_ref, w2_ref, b1h_ref, b1g_ref, b2_ref,
                 o_ref, acc_ref, *, n_chunks, sub_rows, out_dtype):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:, :] = jnp.broadcast_to(b2_ref[0, :][None, :], acc_ref.shape)

    rows = x_ref.shape[0]
    b1h = b1h_ref[0, :][None, :]
    b1g = b1g_ref[0, :][None, :]
    for r0 in range(0, rows, sub_rows):
        x = x_ref[r0:r0 + sub_rows, :]
        h = jax.lax.dot_general(
            x, w1h_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1h
        g = jax.lax.dot_general(
            x, w1g_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1g
        y = (h * jax.nn.gelu(g)).astype(x.dtype)
        acc_ref[r0:r0 + sub_rows, :] += jax.lax.dot_general(
            y, w2_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == n_chunks - 1)
    def _():
        o_ref[:, :] = acc_ref[:, :].astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("quant", "act_scale", "interpret")
)
def geglu_ff(x, w1h, w1g, w2, b1h=None, b1g=None, b2=None, *, quant=None,
             act_scale: float = STATIC_ACT_SCALE, interpret: bool = False):
    """x: [B, N, C]; w1h/w1g: [C, F]; w2: [F, C]; biases [F]/[F]/[C]
    -> [B, N, C].

    quant=None: bf16/f32 dots.  quant="static": int8 MXU dots with the
    given static activation scale for x and per-column weight scales.
    """
    b, n, c = x.shape
    f = w1h.shape[1]
    out_dtype = x.dtype
    b1h = jnp.zeros((f,), jnp.float32) if b1h is None else b1h
    b1g = jnp.zeros((f,), jnp.float32) if b1g is None else b1g
    b2 = jnp.zeros((c,), jnp.float32) if b2 is None else b2

    blk_rows, sub_rows = _pick_rows(c)
    rows = b * n
    rows_pad = _round_up(rows, blk_rows)
    xf = x.reshape(rows, c)
    if rows_pad != rows:
        xf = jnp.pad(xf, ((0, rows_pad - rows), (0, 0)))

    blk_cols = _pick_cols(f)
    n_chunks = f // blk_cols if f % blk_cols == 0 else -(-f // blk_cols)
    f_pad = n_chunks * blk_cols
    if f_pad != f:
        w1h = jnp.pad(w1h, ((0, 0), (0, f_pad - f)))
        w1g = jnp.pad(w1g, ((0, 0), (0, f_pad - f)))
        w2 = jnp.pad(w2, ((0, f_pad - f), (0, 0)))
        b1h = jnp.pad(b1h, (0, f_pad - f))
        b1g = jnp.pad(b1g, (0, f_pad - f))
    b1h = b1h.reshape(1, f_pad).astype(jnp.float32)
    b1g = b1g.reshape(1, f_pad).astype(jnp.float32)
    b2r = b2.reshape(1, c).astype(jnp.float32)

    grid = (rows_pad // blk_rows, n_chunks)
    x_spec = pl.BlockSpec((blk_rows, c), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM)
    w1_spec = pl.BlockSpec((c, blk_cols), lambda i, j: (0, j),
                           memory_space=pltpu.VMEM)
    w2_spec = pl.BlockSpec((blk_cols, c), lambda i, j: (j, 0),
                           memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((blk_rows, c), lambda i, j: (i, 0),
                          memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((blk_rows, c), jnp.float32)]

    if quant == "static":
        s1h = absmax_scale(w1h, axes=(0,))  # [1, F]
        s1g = absmax_scale(w1g, axes=(0,))
        s2 = absmax_scale(w2, axes=(0,))    # [1, C]
        w1hq, w1gq = quantize_int8(w1h, s1h), quantize_int8(w1g, s1g)
        w2q = quantize_int8(w2, s2)
        xq = quantize_int8(xf, jnp.float32(act_scale))
        s1_spec = pl.BlockSpec((1, blk_cols), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM)
        s2_spec = pl.BlockSpec((1, c), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM)
        kern = functools.partial(_kernel_int8, n_chunks=n_chunks,
                                 sub_rows=sub_rows,
                                 act_scale=float(act_scale),
                                 out_dtype=out_dtype)
        out = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[x_spec, w1_spec, w1_spec, w2_spec,
                      s1_spec, s1_spec, s2_spec, s1_spec, s1_spec, s2_spec],
            out_specs=o_spec,
            out_shape=jax.ShapeDtypeStruct((rows_pad, c), out_dtype),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            interpret=interpret,
        )(xq, w1hq, w1gq, w2q, s1h.astype(jnp.float32),
          s1g.astype(jnp.float32), s2.astype(jnp.float32), b1h, b1g, b2r)
    else:
        s1_spec = pl.BlockSpec((1, blk_cols), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM)
        s2_spec = pl.BlockSpec((1, c), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM)
        kern = functools.partial(_kernel_bf16, n_chunks=n_chunks,
                                 sub_rows=sub_rows, out_dtype=out_dtype)
        out = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[x_spec, w1_spec, w1_spec, w2_spec,
                      s1_spec, s1_spec, s2_spec],
            out_specs=o_spec,
            out_shape=jax.ShapeDtypeStruct((rows_pad, c), out_dtype),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            interpret=interpret,
        )(xf.astype(x.dtype), w1h.astype(x.dtype), w1g.astype(x.dtype),
          w2.astype(x.dtype), b1h, b1g, b2r)

    return out[:rows].reshape(b, n, c)


# ---------------------------------------------------------------------- #
# Tensor-parallel composition (round 5)
# ---------------------------------------------------------------------- #


def tp_geglu_ok(mesh, c: int, f: int, batch: int) -> bool:
    """Can the fused GEGLU run under `mesh` via shard_map? Megatron
    column+row split over the hidden F axis: each device's F-chunk must
    itself satisfy geglu_supported (f/tp % 128 — at tp=4 the C=320 level's
    F=1280 chunks to 320 and falls back to the unfused GSPMD path)."""
    from d3roma_tpu.parallel.mesh import DATA_AXIS
    from d3roma_tpu.parallel.tensor import MODEL_AXIS

    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    tp = axes.get(MODEL_AXIS, 1)
    dp = axes.get(DATA_AXIS, 1)
    return (tp > 1 and f % tp == 0 and geglu_supported(c, f // tp)
            and batch % dp == 0)


def geglu_ff_tp(x, w1h, w1g, w2, b1h, b1g, b2, mesh, *, quant=None,
                act_scale: float = STATIC_ACT_SCALE,
                interpret: bool = False):
    """geglu_ff under a ``(data, model)`` mesh via ``shard_map`` —
    Megatron-style column-parallel W1 + row-parallel W2 over the hidden F
    axis: each device runs the unchanged fused kernel on its F-chunk
    (producing a partial [rows, C] output), a single ``psum`` over the
    model axis combines the partials, and the output bias is added once
    after the reduction. Weight resharding on entry is loop-invariant in
    a denoise scan, so XLA hoists it out of the hot loop; the int8 path's
    numerics differ from the unsharded kernel only in the per-(row-block,
    chunk) requantization boundaries of the gated intermediate."""
    from d3roma_tpu.parallel.mesh import DATA_AXIS
    from d3roma_tpu.parallel.tensor import MODEL_AXIS

    P = jax.sharding.PartitionSpec
    assert tp_geglu_ok(mesh, x.shape[-1], w1h.shape[1], x.shape[0])

    def f(x_, w1h_, w1g_, w2_, b1h_, b1g_):
        part = geglu_ff(x_, w1h_, w1g_, w2_, b1h_, b1g_, None, quant=quant,
                        act_scale=act_scale, interpret=interpret)
        return jax.lax.psum(part, MODEL_AXIS)

    out = jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(DATA_AXIS, None, None), P(None, MODEL_AXIS),
                  P(None, MODEL_AXIS), P(MODEL_AXIS, None), P(MODEL_AXIS),
                  P(MODEL_AXIS)),
        out_specs=P(DATA_AXIS, None, None),
        check_vma=False,
    )(x, w1h, w1g, w2, b1h, b1g)
    return out + b2.astype(out.dtype)
