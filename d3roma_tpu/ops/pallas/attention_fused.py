"""Fully-fused transformer self-attention: QKV projections + whole-row
attention + output projection in ONE Pallas TPU kernel.

Motivation (measured on the flagship UNet, v5e, batch 16): with the
standalone whole-row attention kernel (ops/pallas/attention.py) the
self-attention stack costs 29 ms of a 77 ms UNet step, but only ~12 ms of
that is MXU/softmax floor — the rest is XLA glue around each of the 16
attention sites: projection outputs round-tripping HBM, [B,N,H,D] ->
[B,H,N,D] transposes, pad/slice copies, and absmax/quantize passes.
This kernel eliminates the glue by computing everything from the LN'd
hidden states in VMEM:

- grid (batch, q-block, head), head innermost.
- At (q-block 0, head 0) the kernel projects K and V for ALL heads from
  the VMEM-resident full token block into int8 (or bf16) scratch that
  persists across the whole (q-block, head) sweep of that batch item.
- Each program projects its q block for one head, computes the whole
  [block_q, N] score row, softmax, PV, and accumulates the head's output
  through the output projection into a persistent f32 accumulator;
  the accumulator is written once after the last head.
- int8 path: x is pre-quantized in XLA with the static activation scale
  (it is a LayerNorm output, same convention as the static dense path);
  Wq/Wk/Wv are int8 with per-column scales; projection outputs are
  re-quantized per head with a local dynamic absmax (q per block, k/v per
  batch) so BOTH attention dots run on the int8 MXU; the softmax'd P uses
  the exact static scale 127. The output projection runs in bf16 (its
  FLOPs are tiny; skipping a third re-quantization).

Shapes are static per call: d=64 heads, 240..3840 tokens, C=320/640/1280
(reference model: SD2.1-geometry, train.py:751-772).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from d3roma_tpu.ops.quant import STATIC_ACT_SCALE, absmax_scale, quantize_int8

_LANES = 128
_NEG = -1e30
_BLK_Q = 256
_MAX_N = 6144


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def fused_attention_supported(n: int, c: int, head_dim: int,
                              itemsize: int = 1) -> bool:
    """Whole-row scores + all-head K/V scratch must fit VMEM.

    `itemsize` is the compute-dtype element size the kernel will run with:
    1 for the int8 (quant="static") path, 2 for bf16 — the bf16 path
    doubles the x/K/V/weight blocks, so shapes the int8 gate admits (e.g.
    N=3600, C=320) overflow Mosaic's VMEM allocation in bf16.
    """
    if head_dim != 64 or c % head_dim != 0:
        return False
    n_pad = _round_up(n, _BLK_Q)
    h = c // head_dim
    e = itemsize
    kv = 2 * h * n_pad * head_dim * e      # persistent K/V scratch
    x_full = n_pad * c * e                 # whole-token input block
    x_blk = _BLK_Q * c * e                 # q-block input
    slab = _BLK_Q * n_pad * 4              # f32 score row
    w_qkv = 3 * h * c * head_dim * e       # projection weights
    w_o = c * c * 2                        # out projection (always bf16)
    acc = _BLK_Q * c * 4                   # f32 output accumulator
    total = kv + x_full + x_blk + slab + w_qkv + w_o + acc
    return n_pad <= _MAX_N and total <= 11 * 1024 * 1024


def _kernel_int8(x_blk_ref, x_full_ref, wq_ref, wk_ref, wv_ref, wo_ref,
                 swq_ref, swk_ref, swv_ref, bo_ref, o_ref,
                 k_s, v_s, kvs_s, acc_ref,
                 *, heads, n_real, scale, act_scale, out_dtype):
    h = pl.program_id(2)
    d = k_s.shape[-1]

    @pl.when((pl.program_id(1) == 0) & (h == 0))
    def _():
        xf = x_full_ref[:, :]
        for hh in range(heads):
            k_i32 = jax.lax.dot_general(
                xf, wk_ref[hh], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            k_f = k_i32.astype(jnp.float32) * (
                act_scale * swk_ref[hh, 0, :][None, :])
            sk = jnp.maximum(jnp.max(jnp.abs(k_f)), 1e-6) / 127.0
            k_s[hh] = jnp.round(k_f / sk).astype(jnp.int8)
            kvs_s[hh, 0] = sk
            v_i32 = jax.lax.dot_general(
                xf, wv_ref[hh], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            v_f = v_i32.astype(jnp.float32) * (
                act_scale * swv_ref[hh, 0, :][None, :])
            sv = jnp.maximum(jnp.max(jnp.abs(v_f)), 1e-6) / 127.0
            v_s[hh] = jnp.round(v_f / sv).astype(jnp.int8)
            kvs_s[hh, 1] = sv

    @pl.when(h == 0)
    def _():
        acc_ref[:, :] = jnp.broadcast_to(bo_ref[0, :][None, :], acc_ref.shape)

    xq = x_blk_ref[:, :]
    q_i32 = jax.lax.dot_general(
        xq, wq_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    q_f = q_i32.astype(jnp.float32) * (act_scale * swq_ref[0, 0, :][None, :])
    sq = jnp.maximum(jnp.max(jnp.abs(q_f)), 1e-6) / 127.0
    qq = jnp.round(q_f / sq).astype(jnp.int8)

    kh = k_s[h]
    s = jax.lax.dot_general(
        qq, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * (scale * sq * kvs_s[h, 0])
    if n_real < kh.shape[0]:
        j = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(j < n_real, s, _NEG)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p8 = jnp.round(p * 127.0).astype(jnp.int8)
    pv = jax.lax.dot_general(
        p8, v_s[h], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    o_h = (pv.astype(jnp.float32) * (kvs_s[h, 1] / 127.0) / denom)
    # output projection for this head (bf16 dot, f32 accumulate):
    # out += o_h @ Wo[h*d:(h+1)*d, :]
    acc_ref[:, :] += jax.lax.dot_general(
        o_h.astype(jnp.bfloat16), wo_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(h == heads - 1)
    def _():
        o_ref[:, :] = acc_ref[:, :].astype(out_dtype)


def _kernel_bf16(x_blk_ref, x_full_ref, wq_ref, wk_ref, wv_ref, wo_ref,
                 bo_ref, o_ref, k_s, v_s, acc_ref,
                 *, heads, n_real, scale, out_dtype):
    h = pl.program_id(2)

    @pl.when((pl.program_id(1) == 0) & (h == 0))
    def _():
        xf = x_full_ref[:, :]
        for hh in range(heads):
            k_s[hh] = jax.lax.dot_general(
                xf, wk_ref[hh], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(xf.dtype)
            v_s[hh] = jax.lax.dot_general(
                xf, wv_ref[hh], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(xf.dtype)

    @pl.when(h == 0)
    def _():
        acc_ref[:, :] = jnp.broadcast_to(bo_ref[0, :][None, :], acc_ref.shape)

    x = x_blk_ref[:, :]
    q = jax.lax.dot_general(
        x, wq_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)
    kh = k_s[h]
    s = jax.lax.dot_general(
        q, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * scale
    if n_real < kh.shape[0]:
        j = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(j < n_real, s, _NEG)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(x.dtype), v_s[h], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[:, :] += jax.lax.dot_general(
        (pv / denom).astype(x.dtype), wo_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(h == heads - 1)
    def _():
        o_ref[:, :] = acc_ref[:, :].astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "quant", "sm_scale", "act_scale", "interpret"),
)
def fused_self_attention(x, wq, wk, wv, wo, bo, *, heads: int,
                         quant: str | None = None,
                         sm_scale: float | None = None,
                         act_scale: float = STATIC_ACT_SCALE,
                         interpret: bool = False):
    """x: [B, N, C] (LN output); wq/wk/wv/wo: [C, C]; bo: [C] -> [B, N, C].

    Computes softmax((x Wq)(x Wk)^T / sqrt(d)) (x Wv) Wo + bo per head,
    entirely in one kernel. quant="static" runs projections and both
    attention dots on the int8 MXU.
    """
    b, n, c = x.shape
    d = c // heads
    out_dtype = x.dtype
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(d)
    n_pad = _round_up(n, _BLK_Q)

    xp = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
    # [C, C] -> per-head [H, C, d] (q/k/v) and [H, d, C] (out)
    wq_h = jnp.transpose(wq.reshape(c, heads, d), (1, 0, 2))
    wk_h = jnp.transpose(wk.reshape(c, heads, d), (1, 0, 2))
    wv_h = jnp.transpose(wv.reshape(c, heads, d), (1, 0, 2))
    wo_h = wo.reshape(heads, d, c)

    grid = (b, n_pad // _BLK_Q, heads)
    x_blk_spec = pl.BlockSpec((None, _BLK_Q, c), lambda bi, i, hi: (bi, i, 0),
                              memory_space=pltpu.VMEM)
    x_full_spec = pl.BlockSpec((None, n_pad, c), lambda bi, i, hi: (bi, 0, 0),
                               memory_space=pltpu.VMEM)
    w_h_spec = pl.BlockSpec((1, c, d), lambda bi, i, hi: (hi, 0, 0),
                            memory_space=pltpu.VMEM)
    w_all_spec = pl.BlockSpec((heads, c, d), lambda bi, i, hi: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    wo_spec = pl.BlockSpec((1, d, c), lambda bi, i, hi: (hi, 0, 0),
                           memory_space=pltpu.VMEM)
    bo_spec = pl.BlockSpec((1, c), lambda bi, i, hi: (0, 0),
                           memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((None, _BLK_Q, c), lambda bi, i, hi: (bi, i, 0),
                          memory_space=pltpu.VMEM)

    if quant == "static":
        swq = absmax_scale(wq_h, axes=(1,))  # [H, 1, d]
        swk = absmax_scale(wk_h, axes=(1,))
        swv = absmax_scale(wv_h, axes=(1,))
        wqq, wkq, wvq = (quantize_int8(w, s) for w, s in
                         ((wq_h, swq), (wk_h, swk), (wv_h, swv)))
        xq = quantize_int8(xp, jnp.float32(act_scale))
        sw_h_spec = pl.BlockSpec((1, 1, d), lambda bi, i, hi: (hi, 0, 0),
                                 memory_space=pltpu.VMEM)
        sw_all_spec = pl.BlockSpec((heads, 1, d), lambda bi, i, hi: (0, 0, 0),
                                   memory_space=pltpu.VMEM)
        kern = functools.partial(
            _kernel_int8, heads=heads, n_real=n, scale=scale,
            act_scale=float(act_scale), out_dtype=out_dtype)
        out = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[x_blk_spec, x_full_spec, w_h_spec, w_all_spec,
                      w_all_spec, wo_spec, sw_h_spec, sw_all_spec,
                      sw_all_spec, bo_spec],
            out_specs=o_spec,
            out_shape=jax.ShapeDtypeStruct((b, n_pad, c), out_dtype),
            scratch_shapes=[
                pltpu.VMEM((heads, n_pad, d), jnp.int8),
                pltpu.VMEM((heads, n_pad, d), jnp.int8),
                pltpu.SMEM((heads, 2), jnp.float32),
                pltpu.VMEM((_BLK_Q, c), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
            interpret=interpret,
        )(xq, xq, wqq, wkq, wvq, wo_h.astype(jnp.bfloat16),
          swq.astype(jnp.float32), swk.astype(jnp.float32),
          swv.astype(jnp.float32), bo.reshape(1, c).astype(jnp.float32))
    else:
        kern = functools.partial(
            _kernel_bf16, heads=heads, n_real=n, scale=scale,
            out_dtype=out_dtype)
        cdt = x.dtype
        out = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[x_blk_spec, x_full_spec, w_h_spec, w_all_spec,
                      w_all_spec, wo_spec, bo_spec],
            out_specs=o_spec,
            out_shape=jax.ShapeDtypeStruct((b, n_pad, c), out_dtype),
            scratch_shapes=[
                pltpu.VMEM((heads, n_pad, d), cdt),
                pltpu.VMEM((heads, n_pad, d), cdt),
                pltpu.VMEM((_BLK_Q, c), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
            interpret=interpret,
        )(xp.astype(cdt), xp.astype(cdt), wq_h.astype(cdt), wk_h.astype(cdt),
          wv_h.astype(cdt), wo_h.astype(cdt),
          bo.reshape(1, c).astype(jnp.float32))

    return out[:, :n]
