"""Shared NHWC building blocks for the diffusion UNets and VAE.

From-scratch Flax implementations with diffusers-compatible structure so
reference checkpoints can be imported (reference model zoo is external
diffusers — SURVEY.md §1 layer 6; construction at train.py:788-810,
train.py:751-772). All convs are NHWC (TPU-native layout); weight import
transposes from the reference's NCHW.
"""

from __future__ import annotations

import math
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

def _pallas_backend():
    """Where Pallas kernels may run: "tpu" (Mosaic), "interpret" (forced
    via D3ROMA_PALLAS_INTERPRET=1 — CPU equality tests of the kernel
    paths, incl. the shard_map TP composition), or None (XLA fallback)."""
    if jax.default_backend() == "tpu":
        return "tpu"
    if os.environ.get("D3ROMA_PALLAS_INTERPRET") == "1":
        return "interpret"
    return None


from d3roma_tpu.ops.quant import (
    STATIC_ACT_SCALE,
    act_ctx_mode,
    consume_act_scale,
    int8_conv_general_dilated,
    int8_conv_general_dilated_static,
    int8_conv_halo,
    int8_conv_mxu,
    int8_dot_general,
    int8_dot_general_static,
)


def _dense_q(quant) -> dict:
    """kwargs enabling the int8 dot path on an nn.Dense (see ops/quant.py).

    `quant` is False (off), True/"all" (dense + conv, dynamic activation
    scales), "dense" (dense layers only), "static" (dense + conv with a
    constant activation scale — no absmax pass before each op), "mxu"
    (static scales + the Pallas implicit-GEMM conv kernel), "wino"
    (bf16 Winograd convs, bf16 denses — ops/winograd.py), or
    "wino_static" (Winograd convs + static-int8 denses)."""
    if not quant or quant == "wino":
        return {}
    if quant in ("static", "mxu", "halo", "wino_static"):
        return {"dot_general": int8_dot_general_static}
    return {"dot_general": int8_dot_general}


def _conv_q(quant) -> dict:
    """kwargs enabling the int8 conv path on an nn.Conv (off in "dense" mode)."""
    if not quant or quant == "dense":
        return {}
    if quant in ("wino", "wino_static"):
        from d3roma_tpu.ops.winograd import (
            wino_conv_general_dilated,
            wino_static_conv_general_dilated,
        )

        return {"conv_general_dilated": (
            wino_static_conv_general_dilated if quant == "wino_static"
            else wino_conv_general_dilated)}
    if quant == "halo":
        return {"conv_general_dilated": int8_conv_halo}
    if quant == "mxu":
        return {"conv_general_dilated": int8_conv_mxu}
    if quant == "static":
        return {"conv_general_dilated": int8_conv_general_dilated_static}
    return {"conv_general_dilated": int8_conv_general_dilated}


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal timestep embeddings. t: [B] -> [B, dim]."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    out = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out




def flash_self_attention(q, k, v):
    """Spatial self-attention via the Pallas TPU flash-attention kernel.

    q/k/v: [B, N, heads, head_dim]. Tokens are padded to a 512 multiple and
    masked out with segment ids, so the N^2 score matrix never materializes
    in HBM (the dominant memory traffic of the UNet's top attention levels
    at 45x80+ latents).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    B, N, H, D = q.shape
    pad = (-N) % 512
    Np = N + pad

    def prep(x):
        x = jnp.swapaxes(x, 1, 2)  # [B,H,N,D]
        return jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))

    seg = jnp.concatenate(
        [jnp.zeros((B, N), jnp.int32), jnp.ones((B, pad), jnp.int32)], axis=1
    )
    block = min(512, Np)
    sizes = BlockSizes(
        block_q=block, block_k_major=block, block_k=block, block_b=1,
    )
    out = flash_attention(
        prep(q), prep(k), prep(v),
        segment_ids=SegmentIds(q=seg, kv=seg),
        sm_scale=1.0 / math.sqrt(D),
        block_sizes=sizes,
    )
    return jnp.swapaxes(out[:, :, :N, :], 1, 2)


class GroupNormSiLU(nn.Module):
    """GroupNorm (+ optional SiLU) with the single-pass fused Pallas kernel
    on TPU (ops/pallas/groupnorm.py) and an XLA composition elsewhere.
    Param tree matches nn.GroupNorm (scale/bias), so checkpoints are
    interchangeable."""

    groups: int = 32
    eps: float = 1e-5
    apply_silu: bool = True
    fused: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if self.fused and x.ndim == 4 and jax.default_backend() == "tpu":
            from d3roma_tpu.ops.pallas import (
                fused_group_norm_silu,
                group_norm_silu_supported,
            )

            if group_norm_silu_supported(x.shape, x.dtype):
                return fused_group_norm_silu(
                    x, scale, bias, self.groups, self.eps, self.apply_silu
                )
        # XLA fallback: fp32 statistics, but the big elementwise normalize
        # runs in the compute dtype (as flax GroupNorm does) — an fp32
        # normalize doubles the slab's HBM traffic for bf16 models
        shape = x.shape
        g = self.groups
        cg = c // g
        xf = x.astype(jnp.float32).reshape(shape[:-1] + (g, cg))
        red = tuple(range(1, xf.ndim - 2)) + (xf.ndim - 1,)
        mean = xf.mean(axis=red)                                  # [B, G]
        var = jnp.square(xf).mean(axis=red) - jnp.square(mean)    # [B, G]
        inv = jax.lax.rsqrt(var + self.eps)
        # fold stats + affine into per-(batch, channel) scale/shift
        inv_c = jnp.repeat(inv, cg, axis=-1)                      # [B, C]
        mean_c = jnp.repeat(mean, cg, axis=-1)
        full_scale = (inv_c * scale).astype(self.dtype)
        full_shift = (bias - mean_c * inv_c * scale).astype(self.dtype)
        bshape = (shape[0],) + (1,) * (x.ndim - 2) + (c,)
        y = x.astype(self.dtype) * full_scale.reshape(bshape) + full_shift.reshape(bshape)
        return nn.silu(y) if self.apply_silu else y


class TimestepEmbedding(nn.Module):
    """2-layer MLP lifting the sinusoidal embedding."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb):
        x = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(t_emb)
        x = nn.silu(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(x)
        return x


class ResnetBlock2D(nn.Module):
    """GroupNorm -> SiLU -> conv -> (+time) -> GroupNorm -> SiLU -> conv (+skip)."""

    out_channels: int
    use_time_emb: bool = True
    groups: int = 32
    eps: float = 1e-5
    dropout: float = 0.0
    quant: bool = False
    fused_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t_emb=None, deterministic: bool = True):
        residual = x
        h = GroupNormSiLU(self.groups, self.eps, fused=self.fused_norm,
                          dtype=self.dtype, name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1", **_conv_q(self.quant))(h)
        if self.use_time_emb and t_emb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(t_emb)
            )
            h = h + t[:, None, None, :]
        h = GroupNormSiLU(self.groups, self.eps, fused=self.fused_norm,
                          dtype=self.dtype, name="norm2")(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2", **_conv_q(self.quant))(h)
        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut",
                **_conv_q(self.quant),
            )(residual)
        return residual + h


class SelfAttention2D(nn.Module):
    """Spatial self-attention over HxW tokens with a GroupNorm pre-norm
    (diffusers AttnBlock-compatible)."""

    channels: int
    head_dim: int = 8
    groups: int = 32
    eps: float = 1e-5
    rescale_output_factor: float = 1.0
    quant: bool = False
    dtype: jnp.dtype = jnp.float32
    tp_mesh: Any = None  # see CrossAttention.tp_mesh

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        num_heads = max(1, C // self.head_dim)
        h = nn.GroupNorm(self.groups, epsilon=self.eps, dtype=self.dtype, name="group_norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="to_q", **_dense_q(self.quant))(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k", **_dense_q(self.quant))(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v", **_dense_q(self.quant))(h)
        q = q.reshape(B, H * W, num_heads, C // num_heads)
        k = k.reshape(B, H * W, num_heads, C // num_heads)
        v = v.reshape(B, H * W, num_heads, C // num_heads)
        attn = None
        backend = _pallas_backend()
        if (backend
                and self.quant in (True, "all", "static", "mxu", "halo", "wino_static")
                and act_ctx_mode() != "capture"
                and H * W >= 512 and C // num_heads >= 64):
            from d3roma_tpu.ops.pallas import mha_attention, mha_supported

            # the VAE's single wide head (512-dim, 3600 tokens) runs the
            # whole-row kernel on the int8 MXU: 3.1 vs 7.8 ms/call at
            # batch 16 vs the XLA score-matrix path (docs/PERFORMANCE.md)
            if mha_supported(H * W, C // num_heads, itemsize=1):
                interp = backend == "interpret"
                if self.tp_mesh is not None:
                    from d3roma_tpu.ops.pallas import (
                        mha_attention_tp,
                        tp_attention_ok,
                    )

                    if tp_attention_ok(self.tp_mesh, B, H * W):
                        attn = mha_attention_tp(q, k, v, self.tp_mesh,
                                                quant="int8",
                                                interpret=interp)
                else:
                    attn = mha_attention(q, k, v, quant="int8",
                                         interpret=interp)
        if attn is None:
            attn = jax.nn.dot_product_attention(q, k, v)
        attn = attn.reshape(B, H * W, C)
        out = nn.Dense(C, dtype=self.dtype, name="to_out", **_dense_q(self.quant))(attn)
        out = out.reshape(B, H, W, C)
        return (x + out) / self.rescale_output_factor


class CrossAttention(nn.Module):
    """Multi-head attention over [B, N, C] queries with optional [B, M, D]
    context (self-attention when context is None).

    use_flash selects the attention implementation:
      False         — XLA dot_product_attention (scores materialized)
      True          — Pallas library flash kernel for long self-attention
      "pallas"      — whole-row Pallas kernel (ops/pallas/attention.py)
                      for BOTH self- and cross-attention; minimal lane
                      padding. When the int8 quant path is active the
                      kernel also runs both attention dots on the int8 MXU.
      "pallas-self" — whole-row kernel for self-attention only; the
                      77-token cross-attention stays on the XLA path
                      (its score matrix is tiny and XLA fuses it).
      "fused"       — fully-fused self-attention kernel (QKV projections
                      + attention + out projection in ONE pallas_call,
                      ops/pallas/attention_fused.py); cross-attention on
                      the XLA path. Param tree unchanged.
    Non-TPU backends always fall back to the XLA path (kernels are
    Mosaic-compiled; tests run on CPU), except "fused" which runs the
    kernel in interpret mode so the fused param tree stays testable."""

    query_dim: int
    heads: int
    head_dim: int
    context_dim: Optional[int] = None
    use_flash: object = False
    flash_min_seq: int = 1024
    quant: bool = False
    dtype: jnp.dtype = jnp.float32
    # (data, model) Mesh: route Pallas kernels through their shard_map TP
    # composition (ops/pallas: mha_attention_tp / geglu_ff_tp). A bare
    # pallas_call is not GSPMD-partitionable, so with a mesh set, kernel
    # sites either shard_map or fall back to XLA — never the bare kernel.
    tp_mesh: Any = None

    @nn.compact
    def __call__(self, x, context=None):
        is_self = context is None
        context = x if context is None else context
        inner = self.heads * self.head_dim
        B, N, _ = x.shape
        M = context.shape[1]
        dq = _dense_q(self.quant)
        if self.use_flash == "fused" and is_self and self.tp_mesh is None:
            from d3roma_tpu.ops.pallas import (
                fused_attention_supported,
                fused_self_attention,
            )

            # the fused kernel only has a STATIC-activation-scale int8
            # variant: dynamic-scale quant settings (True/"all") take the
            # unfused dynamic path below rather than silently downgrading
            aq = "static" if self.quant in ("static", "mxu", "halo", "wino_static") else None
            itemsize = 1 if aq else jnp.dtype(self.dtype).itemsize
            if ((aq or not self.quant)
                    and x.shape[-1] == inner and self.query_dim == inner
                    and fused_attention_supported(N, inner, self.head_dim,
                                                  itemsize)):
                wq, _ = _DenseParams(inner, inner, use_bias=False, name="to_q")()
                wk, _ = _DenseParams(inner, inner, use_bias=False, name="to_k")()
                wv, _ = _DenseParams(inner, inner, use_bias=False, name="to_v")()
                wo, bo = _DenseParams(inner, self.query_dim, name="to_out")()
                ascale = STATIC_ACT_SCALE
                if aq:
                    # per-call calibrated scale (ops/quant.py): capture
                    # mode records the tap, then runs the same math inline
                    # in XLA — a Mosaic kernel compile in the capture
                    # program adds nothing to the statistics and made the
                    # capture compiles outlive the remote relay connection
                    mode, s = consume_act_scale(x, kind="attn")
                    if mode == "float":
                        xf = x.astype(self.dtype)
                        qf = (xf @ wq.astype(self.dtype)).reshape(
                            B, N, self.heads, self.head_dim)
                        kf = (xf @ wk.astype(self.dtype)).reshape(
                            B, N, self.heads, self.head_dim)
                        vf = (xf @ wv.astype(self.dtype)).reshape(
                            B, N, self.heads, self.head_dim)
                        attn = jax.nn.dot_product_attention(qf, kf, vf)
                        return (attn.reshape(B, N, inner)
                                @ wo.astype(self.dtype)
                                + bo.astype(self.dtype))
                    ascale = s
                return fused_self_attention(
                    x.astype(self.dtype), wq, wk, wv, wo, bo,
                    heads=self.heads, quant=aq, act_scale=ascale,
                    interpret=jax.default_backend() != "tpu",
                )
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q", **dq)(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k", **dq)(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v", **dq)(context)
        q = q.reshape(B, N, self.heads, self.head_dim)
        k = k.reshape(B, M, self.heads, self.head_dim)
        v = v.reshape(B, M, self.heads, self.head_dim)
        backend = _pallas_backend()
        use_pallas = self.use_flash == "pallas" or (
            self.use_flash == "pallas-self" and is_self
        )
        if use_pallas and backend:
            from d3roma_tpu.ops.pallas import mha_attention, mha_supported

            # below ~512 tokens the kernel's fixed cost (layout transposes,
            # pad/quantize passes, tiny-program grid) exceeds the XLA
            # attention it replaces — measured 1.3 ms/call at N=240 vs the
            # score-matrix path (docs/PERFORMANCE.md)
            # the whole-row kernel consumes no taps, so the capture pass
            # (calibration) skips it — pure-XLA capture programs compile
            # fast enough for the remote relay; statistics shift is within
            # the int8-rounding the kernel itself introduces
            if (mha_supported(M, self.head_dim) and M >= 512
                    and act_ctx_mode() != "capture"):
                aq = "int8" if self.quant in (True, "all", "static", "mxu", "halo", "wino_static") else None
                interp = backend == "interpret"
                if self.tp_mesh is not None:
                    from d3roma_tpu.ops.pallas import (
                        mha_attention_tp,
                        tp_attention_ok,
                    )

                    if tp_attention_ok(self.tp_mesh, B, N):
                        attn = mha_attention_tp(
                            q, k, v, self.tp_mesh, quant=aq,
                            interpret=interp).reshape(B, N, inner)
                        return nn.Dense(self.query_dim, dtype=self.dtype,
                                        name="to_out", **dq)(attn)
                    # ineligible under this mesh -> XLA path below (a
                    # bare pallas_call cannot be GSPMD-partitioned)
                else:
                    attn = mha_attention(
                        q, k, v, quant=aq,
                        interpret=interp).reshape(B, N, inner)
                    return nn.Dense(self.query_dim, dtype=self.dtype,
                                    name="to_out", **dq)(attn)
        if (self.use_flash and backend == "tpu" and is_self
                and N >= self.flash_min_seq and self.tp_mesh is None):
            attn = flash_self_attention(q, k, v).reshape(B, N, inner)
        else:
            attn = jax.nn.dot_product_attention(q, k, v).reshape(B, N, inner)
        return nn.Dense(self.query_dim, dtype=self.dtype, name="to_out", **dq)(attn)


class GEGLU(nn.Module):
    dim_out: int
    quant: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj",
                     **_dense_q(self.quant))(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * nn.gelu(gate)


class _DenseParams(nn.Module):
    """Declares nn.Dense-shaped params (same names, shapes, inits) without
    the matmul — lets a fused kernel own the compute while the param tree
    stays checkpoint-compatible with the unfused modules."""

    in_dim: int
    out_dim: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.in_dim, self.out_dim))
        b = (self.param("bias", nn.initializers.zeros, (self.out_dim,))
             if self.use_bias else None)
        return k, b


class _GegluParams(nn.Module):
    in_dim: int
    dim_out: int

    @nn.compact
    def __call__(self):
        return _DenseParams(self.in_dim, self.dim_out * 2, name="proj")()


class FeedForward(nn.Module):
    """GEGLU MLP. With fused=True on TPU the whole proj -> gelu-gate ->
    out-proj runs as one Pallas kernel (ops/pallas/geglu.py) — the 8x-wide
    intermediate never leaves VMEM; param tree is identical either way."""

    dim: int
    mult: int = 4
    quant: bool = False
    fused: bool = False
    dtype: jnp.dtype = jnp.float32
    tp_mesh: Any = None  # see CrossAttention.tp_mesh

    @nn.compact
    def __call__(self, x):
        f = self.dim * self.mult
        # the fused kernel only has a static-activation-scale int8 variant;
        # dynamic-scale quant (True/"all") uses the unfused path below
        q = "static" if self.quant in ("static", "mxu", "halo", "wino_static") else None
        from d3roma_tpu.ops.pallas.geglu import geglu_supported

        tp_ok = True
        if self.tp_mesh is not None:
            from d3roma_tpu.ops.pallas.geglu import tp_geglu_ok

            # under a TP mesh the fused kernel runs only via its
            # shard_map split (a bare pallas_call is not
            # GSPMD-partitionable); an ineligible shape (F/tp not
            # lane-aligned) takes the unfused GSPMD path. NOTE the gate
            # changes the static-int8 scale call order vs an un-meshed
            # pipeline — calibrate() with tp_mesh already set (the gates
            # then match between capture and replay).
            tp_ok = tp_geglu_ok(self.tp_mesh, x.shape[-1], f, x.shape[0])
        # gate BEFORE consume_act_scale: shape-deterministic, so the
        # capture/replay scale call-order stays consistent either way
        if (self.fused and (q or not self.quant) and tp_ok
                and geglu_supported(x.shape[-1], f)):
            from d3roma_tpu.ops.pallas import geglu_ff

            k1, b1 = _GegluParams(x.shape[-1], f, name="net_0")()
            k2, b2 = _DenseParams(f, self.dim, name="net_2")()
            ascale = STATIC_ACT_SCALE
            if q:
                mode, s = consume_act_scale(x, kind="geglu")  # calibrated per-call scale
                if mode == "float":
                    # capture pass: tap recorded; run the GEGLU math inline
                    # in XLA (no Mosaic compile in the capture program)
                    xf = x.astype(self.dtype)
                    h = xf @ k1.astype(self.dtype) + b1.astype(self.dtype)
                    h = h[..., :f] * nn.gelu(h[..., f:])
                    return h @ k2.astype(self.dtype) + b2.astype(self.dtype)
                ascale = s
            # interpret mode keeps the fused path usable (and its param
            # tree testable) on non-TPU backends
            interp = _pallas_backend() != "tpu"
            if self.tp_mesh is not None:
                from d3roma_tpu.ops.pallas.geglu import geglu_ff_tp

                return geglu_ff_tp(
                    x.astype(self.dtype), k1[:, :f], k1[:, f:], k2,
                    b1[:f], b1[f:], b2, self.tp_mesh, quant=q,
                    act_scale=ascale, interpret=interp)
            return geglu_ff(x.astype(self.dtype), k1[:, :f], k1[:, f:], k2,
                            b1[:f], b1[f:], b2, quant=q, act_scale=ascale,
                            interpret=interp)
        x = GEGLU(f, quant=self.quant, dtype=self.dtype, name="net_0")(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="net_2",
                        **_dense_q(self.quant))(x)


class BasicTransformerBlock(nn.Module):
    """LN -> self-attn -> LN -> cross-attn -> LN -> GEGLU FF, all residual
    (SD-style)."""

    dim: int
    heads: int
    head_dim: int
    context_dim: int
    use_flash: object = False
    quant: bool = False
    fused_ff: bool = False
    dtype: jnp.dtype = jnp.float32
    tp_mesh: Any = None  # see CrossAttention.tp_mesh

    @nn.compact
    def __call__(self, x, context):
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + CrossAttention(
            self.dim, self.heads, self.head_dim, use_flash=self.use_flash,
            quant=self.quant, dtype=self.dtype, tp_mesh=self.tp_mesh,
            name="attn1"
        )(h)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = x + CrossAttention(
            self.dim, self.heads, self.head_dim, self.context_dim,
            use_flash=self.use_flash, quant=self.quant, dtype=self.dtype,
            tp_mesh=self.tp_mesh, name="attn2",
        )(h, context)
        h = nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        x = x + FeedForward(self.dim, quant=self.quant, fused=self.fused_ff,
                            dtype=self.dtype, tp_mesh=self.tp_mesh,
                            name="ff")(h)
        return x


class Transformer2D(nn.Module):
    """Spatial transformer: GroupNorm -> linear in -> N blocks -> linear out,
    residual (SD use_linear_projection=True layout)."""

    channels: int
    heads: int
    head_dim: int
    context_dim: int
    depth: int = 1
    groups: int = 32
    use_flash: object = False
    quant: bool = False
    fused_ff: bool = False
    dtype: jnp.dtype = jnp.float32
    tp_mesh: Any = None  # see CrossAttention.tp_mesh

    @nn.compact
    def __call__(self, x, context):
        B, H, W, C = x.shape
        residual = x
        h = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        h = h.reshape(B, H * W, C)
        h = nn.Dense(self.heads * self.head_dim, dtype=self.dtype, name="proj_in",
                     **_dense_q(self.quant))(h)
        for i in range(self.depth):
            h = BasicTransformerBlock(
                self.heads * self.head_dim, self.heads, self.head_dim,
                self.context_dim, use_flash=self.use_flash, quant=self.quant,
                fused_ff=self.fused_ff, dtype=self.dtype,
                tp_mesh=self.tp_mesh, name=f"transformer_blocks_{i}",
            )(h, context)
        h = nn.Dense(C, dtype=self.dtype, name="proj_out",
                     **_dense_q(self.quant))(h)
        return residual + h.reshape(B, H, W, C)


class Downsample2D(nn.Module):
    """Stride-2 conv downsample. diffusers convention: the UNet's
    downsamplers use symmetric padding=1; the VAE encoder uses padding=0
    with an asymmetric (0,1) pre-pad."""

    channels: int
    asymmetric_padding: bool = False
    quant: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.asymmetric_padding:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            return nn.Conv(
                self.channels, (3, 3), strides=(2, 2), padding="VALID",
                dtype=self.dtype, name="conv", **_conv_q(self.quant),
            )(x)
        return nn.Conv(
            self.channels, (3, 3), strides=(2, 2), padding=1,
            dtype=self.dtype, name="conv", **_conv_q(self.quant),
        )(x)


class Upsample2D(nn.Module):
    """Nearest 2x upsample + conv. `out_hw` overrides the target size so
    odd skip-connection sizes re-align (diffusers' forward_upsample_size
    behavior — needed e.g. for 360x640 inputs whose latent H 45 is not a
    power-of-two multiple)."""

    channels: int
    quant: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, out_hw=None):
        B, H, W, C = x.shape
        th, tw = out_hw if out_hw is not None else (H * 2, W * 2)
        x = jax.image.resize(x, (B, th, tw, C), method="nearest")
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv", **_conv_q(self.quant))(x)
