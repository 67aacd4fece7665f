"""Whole-row multi-head attention as a Pallas TPU kernel, tuned for the
diffusion UNet's shapes (head_dim 64, 240..3712 tokens).

Why not the library flash kernel: flash attention exists to keep the N^2
score matrix out of HBM for LONG sequences.  The UNet's longest
self-attention is 45x80 = 3600 tokens (reference model: SD2.1-geometry,
train.py:751-772), where a whole SCORE ROW BLOCK fits VMEM.  The online
softmax machinery is pure overhead at these lengths, and the library
kernel's 512-multiple padding does 29% extra MXU work at N=3600
(4096^2/3600^2).  This kernel instead:

- pads keys to the 128-lane tile only (3712 at N=3600 -> 6% overhead),
- computes each [block_q, Nk] score block in one MXU dot, one fp32
  softmax pass, one PV dot — no running max/denominator fixups,
- optionally runs both dots on the int8 MXU (2x the bf16 rate on v5e):
  q/k/v are quantized per (batch, head) with dynamic absmax scales in XLA
  (measured FASTER than quantizing inside the kernel — XLA fuses the
  absmax/round passes into the projection epilogues, while in-kernel
  VPU quantization serializes with the MXU dots: 77.4 vs 82.7 ms/step on
  the flagship UNet); the softmax'd P matrix is quantized with the exact
  static scale 127 (P in [0,1]), so PV error is bounded by 0.4% of the
  value magnitude.

The kernel keeps K/V VMEM-resident across the q-block sweep (their block
index map is constant in the q dimension), so HBM traffic per (b, h) is
one K/V read + one Q/O pass — the same as flash.

Applicability gate: Nk_pad * block_q * 4B (the fp32 score block) plus K/V
must fit VMEM; covers the UNet levels (3712 tokens max) with room to
spare. Longer sequences should use the library flash kernel.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_NEG = -1e30
# score block + K/V + P must fit VMEM next to pipeline double-buffers
_MAX_NK = 6144


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def mha_supported(n_kv: int, head_dim: int, itemsize: int = 2) -> bool:
    """Whole-row attention needs the [block_q, Nk] fp32 score slab and the
    [Nk, d] K/V blocks resident; beyond ~6k tokens use the flash kernel.

    Wide heads (the VAE's single 512-dim head at 3600 tokens) fit only on
    the int8 path (itemsize=1): bf16 K/V slabs at head_dim 512 overflow
    Mosaic VMEM allocation on device (measured), int8 halves them —
    138 vs XLA's 54 TFLOP/s at the VAE mid-attention shape."""
    nk = _round_up(n_kv, _LANES)
    if nk > _MAX_NK:
        return False
    if head_dim <= 128:
        return True
    return itemsize == 1 and head_dim <= 512 and nk * head_dim <= 2**21


def _kernel_f32(q_ref, k_ref, v_ref, o_ref, *, m_real, scale, out_dtype):
    # block dims declared None are squeezed: refs are [tokens, d]
    q = q_ref[:, :]
    k = k_ref[:, :]
    v = v_ref[:, :]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if m_real < k.shape[0]:
        j = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(j < m_real, s, _NEG)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(q.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:, :] = (pv / denom).astype(out_dtype)


def _kernel_int8(q_ref, k_ref, v_ref, sq_ref, sk_ref, sv_ref, o_ref,
                 *, m_real, scale, out_dtype):
    q = q_ref[:, :]
    k = k_ref[:, :]
    v = v_ref[:, :]
    # scales are per (batch, head): [1, 1] blocks of the [B, H, 1, 1] arrays
    sq = sq_ref[0, 0]
    sk = sk_ref[0, 0]
    sv = sv_ref[0, 0]
    s_i32 = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    s = s_i32.astype(jnp.float32) * (scale * sq * sk)
    if m_real < k.shape[0]:
        j = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(j < m_real, s, _NEG)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    # p in [0, 1] -> exact int8 scale 127 (round-to-nearest on the VPU)
    p_i8 = jnp.round(p * 127.0).astype(jnp.int8)
    pv = jax.lax.dot_general(
        p_i8, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    o_ref[:, :] = (
        pv.astype(jnp.float32) * (sv / 127.0) / denom
    ).astype(out_dtype)


def _absmax_bh(x):
    """Per-(batch, head) absmax of [B, H, N, D] -> [B, H, 1, 1] fp32."""
    m = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(2, 3), keepdims=True)
    return jnp.maximum(m, 1e-6) / 127.0


@functools.partial(
    jax.jit,
    static_argnames=("quant", "sm_scale", "block_q", "interpret"),
)
def mha_attention(q, k, v, *, quant: str | None = None,
                  sm_scale: float | None = None, block_q: int = 256,
                  interpret: bool = False):
    """Multi-head attention, q: [B, N, H, D], k/v: [B, M, H, D] -> [B, N, H, D].

    quant=None: bf16/f32 MXU dots with fp32 softmax.  quant="int8": both
    dots on the int8 MXU (dynamic per-(b,h) scales for q/k/v, exact static
    scale for the softmax'd P).
    """
    b, n, h, d = q.shape
    m = k.shape[1]
    out_dtype = q.dtype
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(d)

    m_pad = _round_up(m, _LANES)
    blk_q = min(block_q, _round_up(n, 16))
    n_pad = _round_up(n, blk_q)

    # [B, N, H, D] -> [B, H, N, D]: Mosaic needs the token dim in the
    # sublane (second-to-last) position; a squeezed head dim there is
    # rejected by the block-shape rules. Same transpose the flash kernel
    # wrapper pays.
    qp = jnp.pad(jnp.swapaxes(q, 1, 2), ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))
    kp = jnp.pad(jnp.swapaxes(k, 1, 2), ((0, 0), (0, 0), (0, m_pad - m), (0, 0)))
    vp = jnp.pad(jnp.swapaxes(v, 1, 2), ((0, 0), (0, 0), (0, m_pad - m), (0, 0)))

    grid = (b, h, n_pad // blk_q)
    q_spec = pl.BlockSpec((None, None, blk_q, d),
                          lambda bi, hi, i: (bi, hi, i, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((None, None, m_pad, d),
                           lambda bi, hi, i: (bi, hi, 0, 0),
                           memory_space=pltpu.VMEM)
    o_spec = q_spec

    if quant == "int8":
        sq, sk, sv = _absmax_bh(qp), _absmax_bh(kp), _absmax_bh(vp)
        qq = jnp.round(qp.astype(jnp.float32) / sq).astype(jnp.int8)
        kq = jnp.round(kp.astype(jnp.float32) / sk).astype(jnp.int8)
        vq = jnp.round(vp.astype(jnp.float32) / sv).astype(jnp.int8)
        s_spec = pl.BlockSpec((None, None, 1, 1),
                              lambda bi, hi, i: (bi, hi, 0, 0),
                              memory_space=pltpu.SMEM)
        kern = functools.partial(_kernel_int8, m_real=m, scale=scale,
                                 out_dtype=out_dtype)
        out = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec, s_spec, s_spec, s_spec],
            out_specs=o_spec,
            out_shape=jax.ShapeDtypeStruct((b, h, n_pad, d), out_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            interpret=interpret,
        )(qq, kq, vq, sq, sk, sv)
    else:
        kern = functools.partial(_kernel_f32, m_real=m, scale=scale,
                                 out_dtype=out_dtype)
        out = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=o_spec,
            out_shape=jax.ShapeDtypeStruct((b, h, n_pad, d), out_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            interpret=interpret,
        )(qp, kp, vp)

    return jnp.swapaxes(out[:, :, :n], 1, 2)


# ---------------------------------------------------------------------- #
# Tensor-parallel composition (round 5)
# ---------------------------------------------------------------------- #


def tp_attention_ok(mesh, B: int, N: int) -> bool:
    """Can mha_attention run under `mesh` via shard_map? The q TOKEN dim
    shards over the model axis (works for ANY head count — the flagship's
    5-head level does not divide tp, so head-sharding would be a dead
    end), so N must divide tp; the batch must divide the data axis."""
    from d3roma_tpu.parallel.mesh import DATA_AXIS
    from d3roma_tpu.parallel.tensor import MODEL_AXIS

    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    tp = axes.get(MODEL_AXIS, 1)
    dp = axes.get(DATA_AXIS, 1)
    return tp > 1 and N % tp == 0 and B % dp == 0


def mha_attention_tp(q, k, v, mesh, *, quant: str | None = None,
                     sm_scale: float | None = None, block_q: int = 256,
                     interpret: bool = False):
    """mha_attention under a ``(data, model)`` mesh via ``shard_map``.

    A bare ``pallas_call`` is not GSPMD-partitionable, which is why the
    kernels were gated off under tensor parallelism through round 4
    (docs/PARALLELISM.md). Composition strategy: shard the q TOKEN dim
    over the model axis and replicate K/V — each device runs the
    unchanged whole-row kernel on its token rows against the full K/V
    (whole-row attention needs full K/V regardless). Per-shard score rows
    are exact, so the result is bit-identical to the unsharded kernel up
    to the kernel's own padding behavior. Costs one q/K/V reshard on
    entry (activations are MBs — ICI noise at batch-1 latency shapes,
    where TP is the lever); the ``(b, h)``-absmax int8 scales see the
    full K/V and the full q rows of the local shard, matching the
    unsharded kernel's scales for K/V exactly and for q per token-slice
    (q scales are per-(batch, head) absmax over the local rows — an int8
    ROUNDING-level difference only)."""
    from d3roma_tpu.parallel.mesh import DATA_AXIS
    from d3roma_tpu.parallel.tensor import MODEL_AXIS

    shard_map = jax.shard_map
    assert tp_attention_ok(mesh, q.shape[0], q.shape[1])
    q_spec = jax.sharding.PartitionSpec(DATA_AXIS, MODEL_AXIS, None, None)
    kv_spec = jax.sharding.PartitionSpec(DATA_AXIS, None, None, None)

    def f(q_, k_, v_):
        return mha_attention(q_, k_, v_, quant=quant, sm_scale=sm_scale,
                             block_q=block_q, interpret=interpret)

    return shard_map(f, mesh=mesh, in_specs=(q_spec, kv_spec, kv_spec),
                     out_specs=q_spec, check_vma=False)(q, k, v)
