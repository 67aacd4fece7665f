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
                        fused_ff=self.fused_ff,
                        dtype=self.dtype, name=f"down_{i}_attn_{j}",
                    )(x, context)
                skips.append(x)
            if cached_trunk is not None:
                # shallow (cached) pass: block 0's skips are all the last
                # up block consumes — the downsample and every deeper
                # level are replaced by the cached trunk
                break
            if not is_last:
                x = Downsample2D(ch, quant=self.quant, dtype=self.dtype,
                                 name=f"down_{i}_downsample")(x)
                skips.append(x)

        rev = tuple(reversed(self.block_out_channels))
        last_up = len(self.up_block_types) - 1

        if cached_trunk is None:
            # ---- mid (UNetMidBlock2DCrossAttn) ----
            mid_ch = self.block_out_channels[-1]
            x = ResBlock(mid_ch, groups=self.norm_groups, quant=self.quant,
                              fused_norm=self.fused_norm,
                              dtype=self.dtype, name="mid_res_0")(x, t_emb)
            x = AttnBlock(mid_ch, heads_for(mid_ch), self.attention_head_dim,
                              self.cross_attention_dim, groups=self.norm_groups,
                              use_flash=self.use_flash_attention, quant=self.quant,
                              fused_ff=self.fused_ff,
                              dtype=self.dtype, name="mid_attn")(x, context)
            x = ResBlock(mid_ch, groups=self.norm_groups, quant=self.quant,
                              fused_norm=self.fused_norm,
                              dtype=self.dtype, name="mid_res_1")(x, t_emb)

            # ---- up (all but the last block) ----
            for i in range(last_up):
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
                            fused_ff=self.fused_ff,
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

        # ---- the last up block (shared by full and cached passes) ----
        btype = self.up_block_types[last_up]
        ch = rev[last_up]
        for j in range(self.layers_per_block + 1):
            skip = skips.pop()
            x = jnp.concatenate([x, skip], axis=-1)
            x = ResBlock(ch, groups=self.norm_groups, quant=self.quant,
                              fused_norm=self.fused_norm,
                              dtype=self.dtype, name=f"up_{last_up}_res_{j}")(x, t_emb)
            if btype == "CrossAttnUpBlock2D":
                x = AttnBlock(
                    ch, heads_for(ch), self.attention_head_dim,
                    self.cross_attention_dim, groups=self.norm_groups,
                    use_flash=self.use_flash_attention, quant=self.quant,
                    fused_ff=self.fused_ff,
                    dtype=self.dtype, name=f"up_{last_up}_attn_{j}",
                )(x, context)

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
