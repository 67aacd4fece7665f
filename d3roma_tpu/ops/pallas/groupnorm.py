"""Fused GroupNorm + SiLU as a single-pass Pallas TPU kernel.

The UNet/VAE resnet blocks run GroupNorm -> SiLU before every conv
(~60 sites per UNet forward). XLA lowers GroupNorm to a reduction kernel
plus a normalize kernel, reading the activation from HBM twice and writing
once; this kernel computes the per-(batch, group) statistics and the
normalized, SiLU-activated output in ONE pass over VMEM-resident data —
one HBM read + one write (the round-1 plan's "fused Pallas epilogue",
docs/PERFORMANCE.md lever list).

Layout notes (Mosaic): the group dimension never appears as an array axis —
a reshape to [..., groups, C/groups] puts a non-128 stride in the lanes and
fails to lower. Instead the per-channel sums are folded to per-group sums
by a [C, G] one-hot dot and broadcast back by its [G, C] transpose (two
tiny MXU dots; a single [C, C] matrix would cost C^2 floats of VMEM —
15+ MB at the up-block concat widths).

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
import numpy as np
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


@functools.lru_cache(maxsize=None)
def _group_matrix(c: int, groups: int) -> np.ndarray:
    """[C, G] one-hot group assignment: column g selects group g's channels.
    sums @ M folds per-channel sums to per-group; (· @ M.T) broadcasts back."""
    cg = c // groups
    gid = np.arange(c) // cg
    return (gid[:, None] == np.arange(groups)[None, :]).astype(np.float32)


def _gn_silu_kernel(x_ref, gamma_ref, beta_ref, fold_ref, bcast_ref, o_ref, *,
                    inv_n: float, eps: float, apply_silu: bool):
    """Two passes over H rows with a fori_loop: materializing the whole
    [H*W, C] slab in fp32 (plus temps) overflows VMEM at compile time for
    the 45x80x320 level — per-row temps are a few hundred KB instead."""
    _, h, w, c = x_ref.shape  # block is [1, H, W, C]

    def accumulate(i, acc):
        s, q = acc
        row = x_ref[0, i].astype(jnp.float32)  # [W, C]
        return (s + jnp.sum(row, axis=0, keepdims=True),
                q + jnp.sum(row * row, axis=0, keepdims=True))

    zeros = jnp.zeros((1, c), jnp.float32)
    sums, sqs = jax.lax.fori_loop(0, h, accumulate, (zeros, zeros))

    def per_group(v):  # [1, C] -> group-folded, broadcast back to [1, C]
        folded = jnp.dot(v, fold_ref[:], preferred_element_type=jnp.float32)
        return jnp.dot(folded, bcast_ref[:], preferred_element_type=jnp.float32)

    mean = per_group(sums) * inv_n   # [1, C]
    ex2 = per_group(sqs) * inv_n     # [1, C]
    var = ex2 - mean * mean
    scale = jax.lax.rsqrt(var + eps) * gamma_ref[:].astype(jnp.float32)
    shift = beta_ref[:].astype(jnp.float32) - mean * scale

    def normalize(i, _):
        row = x_ref[0, i].astype(jnp.float32)
        y = row * scale + shift
        if apply_silu:
            y = y * jax.nn.sigmoid(y)
        o_ref[0, i] = y.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, h, normalize, 0)


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
    inv_n = 1.0 / (h * w * (c // groups))
    fold = jnp.asarray(_group_matrix(c, groups))       # [C, G]
    bcast = jnp.asarray(_group_matrix(c, groups).T)    # [G, C]
    kernel = functools.partial(
        _gn_silu_kernel, inv_n=inv_n, eps=eps, apply_silu=apply_silu
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, groups), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((groups, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, gamma, beta, fold, bcast)
