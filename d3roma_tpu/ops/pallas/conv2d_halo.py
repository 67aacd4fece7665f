"""Halo-DMA implicit-GEMM 3x3 convolution (Mosaic/Pallas TPU).

Third-generation attack on the int8 conv stack (the round-2 binding
constraint — docs/PERFORMANCE.md). The earlier implicit-GEMM kernel
(conv2d.py) held one whole frame in VMEM and sliced the 9 tap operands
in-kernel; those slices shift rows by +-1/+-(W+2) elements, which is
sublane-misaligned under the (8,128) VMEM tiling, so Mosaic materialized
each with VPU copies and the kernel lost to XLA's conv emitter.

This version splits the 9 taps into a host-side dx fold and an in-kernel
dy halo, shaped by two on-device Mosaic findings:

- memref slices (DMA operands included) must be LANE-aligned: slicing a
  [M, 320] window fails with "Slice shape along dimension 1 must be
  aligned to tiling (128)". All channel dims are therefore lane-padded
  on the host (Cin 320->384 costs +20% MACs at the UNet's hottest level;
  640/1280 and the VAE's 128/256/512 are already aligned).
- DMA row offsets must be SUBLANE-TILE-aligned even from HBM ("Failed to
  prove that a tile index in dimension 0 is divisible by the tiling") —
  so the +-1-element dx shifts cannot be DMA base offsets at all.

Hence:

- The dx in {-1,0,1} taps are folded into the channel dim on the host:
  x3[b,h,w] = concat(x[w-1], x[w], x[w+1]) — one fused XLA pad/concat
  pass over the (already int8) input, [B,Hp,Wr,3*cin_p]. The row width
  Wr is padded up to the sublane tile so dy row-shifts stay aligned.
- Batch and height fold into one large GEMM M dim (16 x 47 x 96 ~ 72k
  rows at the flagship's 45x80 level); the array stays in HBM
  (memory_space=pltpu.HBM) so row-windows can be DMA'd at block offsets.
- Each grid step issues THREE async copies of the same [block_m, 3cin_p]
  window at row offsets {-Wr, 0, +Wr} (the dy taps) — all tile-aligned.
  The 3x re-read of the 3x-folded input is ~9x raw input traffic, ~0.3 ms
  of HBM time at flagship shapes, overlapped with the MXU.
- The 3 accumulating [block_m, 3cin_p] x [3cin_p, cout_p] contractions
  run on aligned operands only — int8 x int8 -> int32 on the MXU (or
  bf16), with K=3*cin_p deep enough to keep the MXU busy.

Reference obligation: the conv stack of the SD2.1 UNet/VAE
(reference models come from diffusers; conv math per train.py:751-772).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from d3roma_tpu.ops.quant import STATIC_ACT_SCALE, absmax_scale, quantize_int8

_LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _row_align(itemsize: int) -> int:
    # Mosaic sublane tile: (8,128) for 16/32-bit, (32,128) for int8.
    return 32 if itemsize == 1 else 8


def halo_conv_supported(x_shape, w_shape, strides, padding,
                        itemsize: int = 1, block_m: int = 512) -> bool:
    """Stride-1 SAME 3x3 with the per-block working set inside VMEM."""
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
    cin, cout = w_shape[2], w_shape[3]
    if cin % 8 or cout % 8:
        return False
    if block_m % _row_align(itemsize):
        return False
    cin_p, cout_p = _round_up(cin, _LANES), _round_up(cout, _LANES)
    bufs = 3 * block_m * 3 * cin_p * itemsize    # dy tap windows
    wts = 3 * 3 * cin_p * cout_p * itemsize      # resident weights
    acc = block_m * cout_p * 4                   # f32 accumulator
    out = block_m * cout_p * 2
    return bufs + wts + acc + out <= 11 * 1024 * 1024


def _kernel(x_hbm, w_ref, ws_ref, o_ref, bufs, acc_ref, sems,
            *, offsets, block_m, quant, act_scale, out_dtype):
    """One grid step: 3 dy-halo DMAs -> 3 aligned MXU contractions."""
    base = pl.program_id(0) * block_m
    copies = []
    for t, off in enumerate(offsets):
        c = pltpu.make_async_copy(
            x_hbm.at[pl.ds(base + off, block_m), :],
            bufs.at[t], sems.at[t],
        )
        c.start()
        copies.append(c)

    cout = o_ref.shape[1]
    acc_ref[:, :] = jnp.zeros((block_m, cout), jnp.float32)
    for t in range(3):
        copies[t].wait()
        prod = jax.lax.dot_general(
            bufs[t], w_ref[t],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32 if quant else jnp.float32,
        )
        acc_ref[:, :] += prod.astype(jnp.float32)

    out = acc_ref[:, :]
    if quant:
        out = out * (act_scale * ws_ref[0, :][None, :])
    o_ref[:, :] = out.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("quant", "act_scale", "block_m", "interpret", "out_dtype"),
)
def conv3x3_halo(x, w, *, quant: str | None = "static",
                 act_scale: float = STATIC_ACT_SCALE,
                 block_m: int = 512, interpret: bool = False,
                 out_dtype=None):
    """[B,H,W,Cin] x [3,3,Cin,Cout] -> [B,H,W,Cout], stride-1 SAME."""
    B, H, W, Cin = x.shape
    Cout = w.shape[3]
    out_dtype = out_dtype or x.dtype
    Wp, Hp = W + 2, H + 2
    cin_p = _round_up(Cin, _LANES)
    cout_p = _round_up(Cout, _LANES)
    itemsize = 1 if quant else 2
    Wr = _round_up(Wp, _row_align(itemsize))

    # width-pad by 2 so the three dx-shifted views slice in-bounds
    xpe = jnp.pad(x, ((0, 0), (1, 1), (2, 2), (0, cin_p - Cin)))
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, cin_p - Cin), (0, cout_p - Cout)))
    if quant:
        xpe = quantize_int8(xpe, jnp.float32(act_scale))
        ws = absmax_scale(wp, axes=(0, 1, 2))  # [1,1,1,cout_p]
        wq = quantize_int8(wp, ws).reshape(3, 3 * cin_p, cout_p)
        ws_in = ws.reshape(1, cout_p).astype(jnp.float32)
        buf_dtype = jnp.int8
    else:
        xpe = xpe.astype(jnp.bfloat16)
        wq = wp.astype(jnp.bfloat16).reshape(3, 3 * cin_p, cout_p)
        ws_in = jnp.ones((1, cout_p), jnp.float32)
        buf_dtype = jnp.bfloat16

    # dx fold: x3[b,h,w,(k,c)] = xpe[b,h,w+k,c], k=dx+1 — matches the
    # row-major (dx, cin) weight reshape above
    x3 = jnp.concatenate([xpe[:, :, k:k + Wp] for k in range(3)], axis=-1)
    x3 = jnp.pad(x3, ((0, 0), (0, 0), (0, Wr - Wp), (0, 0)))
    Mp = B * Hp * Wr
    Mg = _round_up(Mp, block_m)
    # guard rows so every dy tap base + off (off in {-Wr, 0, +Wr}) stays
    # in-bounds without clamping; guard reads only feed pad-border
    # outputs, which the final interior slice discards
    lo = Wr
    hi = Wr + (Mg - Mp)
    xf = jnp.pad(x3.reshape(Mp, 3 * cin_p), ((lo, hi), (0, 0)))

    # base row m reads dy taps at xf[lo + m + (dy-1)*Wr]; fold `lo` in
    offsets = [lo + (dy - 1) * Wr for dy in range(3)]

    grid = (Mg // block_m,)
    kern = functools.partial(
        _kernel, offsets=offsets, block_m=block_m,
        quant=bool(quant), act_scale=float(act_scale), out_dtype=out_dtype,
    )
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # x pinned to HBM
            pl.BlockSpec((3, 3 * cin_p, cout_p), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, cout_p), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mg, cout_p), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((3, block_m, 3 * cin_p), buf_dtype),
            pltpu.VMEM((block_m, cout_p), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xf, wq, ws_in)

    out = out[:Mp, :Cout].reshape(B, Hp, Wr, Cout)
    return out[:, 1:H + 1, 1:W + 1, :]
