"""Fused GroupNorm + SiLU as a single-pass Pallas TPU kernel.

The UNet/VAE resnet blocks run GroupNorm -> SiLU before every conv
(~60 sites per UNet forward). XLA lowers GroupNorm to a reduction kernel
plus a normalize kernel, reading the activation from HBM twice and writing
once; this kernel computes the per-(batch, group) statistics and the
normalized, SiLU-activated output in ONE pass over VMEM-resident data —
one HBM read + one write (the round-1 plan's "fused Pallas epilogue",
docs/PERFORMANCE.md lever list).

Grid: one program per batch item; the whole [H, W, C] slab lives in VMEM.
That caps applicability at slabs of a few MB — exactly the UNet's latent
resolutions (45x80x320 ... 12x20x1280 ≈ 0.6-2.3 MB bf16). Callers gate with
`group_norm_silu_supported` and fall back to the XLA composition for
full-resolution VAE tensors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Leave generous headroom under the ~16 MB/core VMEM: input slab + f32
# compute intermediates + output slab.
_MAX_SLAB_BYTES = 4 * 1024 * 1024


def group_norm_silu_supported(shape, dtype) -> bool:
    """True when one batch item's [H, W, C] slab is small enough to hold in
    VMEM alongside its f32 intermediates."""
    if len(shape) != 4:
        return False
    _, h, w, c = shape
    return h * w * c * jnp.dtype(dtype).itemsize <= _MAX_SLAB_BYTES


def _gn_silu_kernel(x_ref, gamma_ref, beta_ref, o_ref, *, groups: int,
                    eps: float, apply_silu: bool):
    _, h, w, c = x_ref.shape  # block is [1, H, W, C]
    cg = c // groups
    x = x_ref[:].astype(jnp.float32).reshape(h * w, groups, cg)
    mean = jnp.mean(x, axis=(0, 2), keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=(0, 2), keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(h * w, c) * gamma_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)
    if apply_silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[:] = y.reshape(1, h, w, c).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "apply_silu", "interpret"))
def fused_group_norm_silu(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    groups: int = 32,
    eps: float = 1e-5,
    apply_silu: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: [B, H, W, C]; gamma/beta: [C]. Returns silu(groupnorm(x)) in
    x.dtype. Statistics in fp32 regardless of input dtype."""
    b, h, w, c = x.shape
    assert c % groups == 0, (c, groups)
    kernel = functools.partial(
        _gn_silu_kernel, groups=groups, eps=eps, apply_silu=apply_silu
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, gamma, beta)
