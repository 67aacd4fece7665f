"""Latent-space cross-attention UNet (diffusers UNet2DConditionModel / SD2.1
equivalent).

From-scratch Flax NHWC implementation structured for weight import from the
reference's Stable Diffusion 2.1 checkpoint, including the conv_in widening
rule that duplicates and rescales the first conv for 4*(1+#conds) input
channels (reference: train.py:751-772). Default hyperparameters match SD2.1:
block_out_channels (320, 640, 1280, 1280), 64-dim attention heads,
cross_attention_dim 1024, linear transformer projections.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from d3roma_tpu.models.layers import (
    Downsample2D,
    ResnetBlock2D,
    TimestepEmbedding,
    Transformer2D,
    Upsample2D,
    timestep_embedding,
)


class UNet2DCondition(nn.Module):
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D", "DownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D", "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
    )
    layers_per_block: int = 2
    attention_head_dim: int = 64
    cross_attention_dim: int = 1024
    norm_groups: int = 32
    # False = XLA attention, True = library flash kernel (long self-attn),
    # "pallas" = whole-row Pallas kernel for all attention sites
    use_flash_attention: object = False
    fused_ff: bool = False  # fused Pallas GEGLU feed-forward (ops/pallas/geglu.py)
    quant: bool = False  # int8 MXU path for inference (ops/quant.py)
    fused_norm: bool = False  # fused Pallas GroupNorm+SiLU (ops/pallas/)
    remat: bool = False  # rematerialize blocks (trade FLOPs for HBM in training)
    # (data, model) Mesh enabling the shard_map TP composition of the
    # Pallas kernels (models/layers.py::CrossAttention.tp_mesh)
    tp_mesh: object = None
    # DeepCache shallow-pass depth: how many TRAILING up blocks (and the
    # matching leading down blocks) the cached pass refreshes. 1 = the
    # classic shallowest split (conv_in + down block 0 + last up block,
    # ~36% of step FLOPs at the flagship shape); 2 = a medium split that
    # also refreshes down block 1 + up block 2 (~2/3 of step FLOPs) for
    # lower cross-step drift. The trunk tensor's shape depends on this.
    cache_depth: int = 1
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,
        timesteps: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,
        deterministic: bool = True,
        cached_trunk: jnp.ndarray = None,
        return_trunk: bool = False,
    ):
        """sample: [B, h, w, in_channels] latents (+concat cond latents);
        encoder_hidden_states: [B, 77, cross_attention_dim] text embedding.

        DeepCache support (Ma et al., CVPR 2024 — inference-time deep-feature
        reuse across adjacent denoise steps; the reference has no analog):

        - ``return_trunk=True``: additionally return the *trunk* — the
          feature map entering the LAST up block (after the final upsample),
          the shallowest cache point.
        - ``cached_trunk=trunk``: run only the shallow path — conv_in, down
          block 0 (whose skips the last up block consumes), the last up
          block at the new timestep's embedding, and conv_out — splicing the
          given trunk in place of the deep levels (~34% of the full step's
          FLOPs at the flagship latent shape). Exact when the trunk comes
          from a full pass over the same (sample, t); an approximation when
          reused across steps (the DeepCache schedule).

        Both paths create identically-named modules, so one param tree
        serves all three call forms.
        """
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        context = encoder_hidden_states.astype(self.dtype)

        c0 = self.block_out_channels[0]
        t_emb = timestep_embedding(
            timesteps, c0, self.flip_sin_to_cos, self.freq_shift
        ).astype(self.dtype)
        t_emb = TimestepEmbedding(c0 * 4, dtype=self.dtype, name="time_embedding")(t_emb)

        def heads_for(ch):
            return max(1, ch // self.attention_head_dim)

        ResBlock = nn.remat(ResnetBlock2D) if self.remat else ResnetBlock2D
        AttnBlock = nn.remat(Transformer2D) if self.remat else Transformer2D

        # conv_in is never quantized: its input is the raw latent/image
        # stack (not GN-normalized) and its FLOPs share is negligible
        x = nn.Conv(c0, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(sample)

        n_up = len(self.up_block_types)
        depth = int(self.cache_depth)
        if not (1 <= depth <= n_up - 1):
            raise ValueError(
                f"cache_depth must be in [1, {n_up - 1}] (the mid block "
                f"is always part of the cached trunk), got {depth}")
        # first up block the shallow (cached) pass refreshes; the trunk is
        # the feature entering it. Up block i consumes the skips of down
        # block (n_up-1-i), so the shallow pass runs down blocks
        # [0, depth) — with their downsamples except the last one's.
        refresh_from = n_up - depth

        # ---- down ----
        skips = [x]
        for i, (btype, ch) in enumerate(zip(self.down_block_types, self.block_out_channels)):
            is_last = i == len(self.block_out_channels) - 1
            for j in range(self.layers_per_block):
                x = ResBlock(ch, groups=self.norm_groups, eps=1e-5,
                                  quant=self.quant, fused_norm=self.fused_norm, dtype=self.dtype,
                                  name=f"down_{i}_res_{j}")(x, t_emb)
                if btype == "CrossAttnDownBlock2D":
                    x = AttnBlock(
                        ch, heads_for(ch), self.attention_head_dim,
                        self.cross_attention_dim, groups=self.norm_groups,
                        use_flash=self.use_flash_attention, quant=self.quant,
                        fused_ff=self.fused_ff, tp_mesh=self.tp_mesh,
                        dtype=self.dtype, name=f"down_{i}_attn_{j}",
                    )(x, context)
                skips.append(x)
            if cached_trunk is not None and i == depth - 1:
                # shallow pass: the skips gathered so far are exactly what
                # the refreshed up blocks consume — everything deeper is
                # replaced by the cached trunk
                break
            if not is_last:
                x = Downsample2D(ch, quant=self.quant, dtype=self.dtype,
                                 name=f"down_{i}_downsample")(x)
                skips.append(x)

        rev = tuple(reversed(self.block_out_channels))

        if cached_trunk is None:
            # ---- mid (UNetMidBlock2DCrossAttn) ----
            mid_ch = self.block_out_channels[-1]
            x = ResBlock(mid_ch, groups=self.norm_groups, quant=self.quant,
                              fused_norm=self.fused_norm,
                              dtype=self.dtype, name="mid_res_0")(x, t_emb)
            x = AttnBlock(mid_ch, heads_for(mid_ch), self.attention_head_dim,
                              self.cross_attention_dim, groups=self.norm_groups,
                              use_flash=self.use_flash_attention, quant=self.quant,
                              fused_ff=self.fused_ff, tp_mesh=self.tp_mesh,
                              dtype=self.dtype, name="mid_attn")(x, context)
            x = ResBlock(mid_ch, groups=self.norm_groups, quant=self.quant,
                              fused_norm=self.fused_norm,
                              dtype=self.dtype, name="mid_res_1")(x, t_emb)

            # ---- up (the blocks the cached pass does NOT refresh) ----
            for i in range(refresh_from):
                btype = self.up_block_types[i]
                ch = rev[i]
                for j in range(self.layers_per_block + 1):
                    skip = skips.pop()
                    x = jnp.concatenate([x, skip], axis=-1)
                    x = ResBlock(ch, groups=self.norm_groups, quant=self.quant,
                                      fused_norm=self.fused_norm,
                                      dtype=self.dtype, name=f"up_{i}_res_{j}")(x, t_emb)
                    if btype == "CrossAttnUpBlock2D":
                        x = AttnBlock(
                            ch, heads_for(ch), self.attention_head_dim,
                            self.cross_attention_dim, groups=self.norm_groups,
                            use_flash=self.use_flash_attention, quant=self.quant,
                            fused_ff=self.fused_ff, tp_mesh=self.tp_mesh,
                            dtype=self.dtype, name=f"up_{i}_attn_{j}",
                        )(x, context)
                x = Upsample2D(ch, quant=self.quant, dtype=self.dtype,
                               name=f"up_{i}_upsample")(
                    x, out_hw=skips[-1].shape[1:3]
                )
            trunk = x
        else:
            trunk = cached_trunk.astype(self.dtype)
            x = trunk

        # ---- the refreshed tail up blocks (shared by full and cached) ----
        for i in range(refresh_from, n_up):
            btype = self.up_block_types[i]
            ch = rev[i]
            for j in range(self.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = ResBlock(ch, groups=self.norm_groups, quant=self.quant,
                                  fused_norm=self.fused_norm,
                                  dtype=self.dtype, name=f"up_{i}_res_{j}")(x, t_emb)
                if btype == "CrossAttnUpBlock2D":
                    x = AttnBlock(
                        ch, heads_for(ch), self.attention_head_dim,
                        self.cross_attention_dim, groups=self.norm_groups,
                        use_flash=self.use_flash_attention, quant=self.quant,
                        fused_ff=self.fused_ff, tp_mesh=self.tp_mesh,
                        dtype=self.dtype, name=f"up_{i}_attn_{j}",
                    )(x, context)
            if i < n_up - 1:
                x = Upsample2D(ch, quant=self.quant, dtype=self.dtype,
                               name=f"up_{i}_upsample")(
                    x, out_hw=skips[-1].shape[1:3]
                )

        from d3roma_tpu.models.layers import GroupNormSiLU

        x = GroupNormSiLU(self.norm_groups, 1e-5, fused=self.fused_norm,
                          dtype=self.dtype, name="conv_norm_out")(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=jnp.float32,
                    name="conv_out")(x)
        if return_trunk:
            return x, trunk
        return x


def widened_in_channels(cond_channels: str, latent_channels: int = 4) -> int:
    """4 * (1 + number of conditions) (reference: train.py:753-756)."""
    dup = len(cond_channels.split("+")) + 1
    return dup * latent_channels
