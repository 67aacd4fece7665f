"""Halo-DMA implicit-GEMM 3x3 convolution (Mosaic/Pallas TPU).

Third-generation attack on the int8 conv stack (the round-2 binding
constraint — docs/PERFORMANCE.md). The earlier implicit-GEMM kernel
(conv2d.py) held one whole frame in VMEM and sliced the 9 tap operands
in-kernel; those slices shift rows by +-1/+-(W+2) elements, which is
sublane-misaligned under the (8,128) VMEM tiling, so Mosaic materialized
each with VPU copies and the kernel lost to XLA's conv emitter.

Here the tap shifts move into the DMA BASE OFFSETS instead:

- The padded input is flattened to [M, Cin] rows (batch and height folded
  into one large GEMM M dim: 16 x 47 x 82 ~ 62k rows at the flagship's
  45x80 level) and stays in HBM (memory_space=ANY).
- Each grid step issues NINE async copies of the SAME [block_m, Cin]
  window at element-granular row offsets base + dy*(W+2) + dx — the DMA
  engine handles the relayout, so every tap lands sublane-ALIGNED at the
  start of its own VMEM buffer. The 9x input re-read is ~0.2 ms/conv of
  HBM traffic at flagship shapes, overlapped with the MXU.
- The 9 accumulating [block_m, Cin] x [Cin, Cout] contractions then run
  on aligned operands only — int8 x int8 -> int32 on the MXU (or bf16).

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
    # budget with lane-padded channel dims (Mosaic rounds lanes to 128)
    cin_p, cout_p = _round_up(cin, _LANES), _round_up(cout, _LANES)
    bufs = 9 * block_m * cin_p * itemsize        # tap windows
    wts = 9 * cin_p * cout_p * itemsize          # resident weights
    acc = block_m * cout_p * 4                   # f32 accumulator
    out = block_m * cout_p * 2
    return bufs + wts + acc + out <= 11 * 1024 * 1024


def _kernel(x_hbm, w_ref, ws_ref, o_ref, bufs, acc_ref, sems,
            *, offsets, block_m, quant, act_scale, out_dtype):
    """One grid step: 9 halo DMAs -> 9 aligned MXU contractions."""
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
    for t in range(9):
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
    static_argnames=("quant", "act_scale", "block_m", "interpret"),
)
def conv3x3_halo(x, w, *, quant: str | None = "static",
                 act_scale: float = STATIC_ACT_SCALE,
                 block_m: int = 512, interpret: bool = False):
    """[B,H,W,Cin] x [3,3,Cin,Cout] -> [B,H,W,Cout], stride-1 SAME."""
    B, H, W, Cin = x.shape
    Cout = w.shape[3]
    out_dtype = x.dtype
    Wp, Hp = W + 2, H + 2

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    Mp = B * Hp * Wp
    Mg = _round_up(Mp, block_m)
    # guard rows so every tap window base + off (off in [-(Wp+1), Wp+1])
    # stays in-bounds without clamping; guard reads only feed pad-border
    # outputs, which the final interior slice discards
    lo = Wp + 1
    hi = (Wp + 1) + (Mg - Mp)

    if quant:
        xq = quantize_int8(xp, jnp.float32(act_scale)).reshape(Mp, Cin)
        ws = absmax_scale(w, axes=(0, 1, 2))  # [1,1,1,Cout]
        wq = quantize_int8(w, ws).reshape(9, Cin, Cout)
        ws_in = ws.reshape(1, Cout).astype(jnp.float32)
        buf_dtype = jnp.int8
    else:
        xq = xp.astype(jnp.bfloat16).reshape(Mp, Cin)
        wq = w.astype(jnp.bfloat16).reshape(9, Cin, Cout)
        ws_in = jnp.ones((1, Cout), jnp.float32)
        buf_dtype = jnp.bfloat16

    xf = jnp.pad(xq, ((lo, hi), (0, 0)))

    offsets = [dy * Wp + dx for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    # base row m reads taps at xf[lo + m + off]; fold `lo` into the base
    offsets = [lo + off for off in offsets]

    grid = (Mg // block_m,)
    kern = functools.partial(
        _kernel, offsets=offsets, block_m=block_m,
        quant=bool(quant), act_scale=float(act_scale), out_dtype=out_dtype,
    )
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec((9, Cin, Cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, Cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mg, Cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((9, block_m, Cin), buf_dtype),
            pltpu.VMEM((block_m, Cout), jnp.float32),
            pltpu.SemaphoreType.DMA((9,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(xf, wq, ws_in)

    out = out[:Mp].reshape(B, Hp, Wp, Cout)
    return out[:, 1:-1, 1:-1, :]
