"""Pixel-space conditional UNet (diffusers UNet2DModel equivalent).

From-scratch Flax NHWC implementation matching the reference's pixel-space
family construction (reference: train.py:788-810): configurable
block_out_channels, layers_per_block=2, (Attn)DownBlock2D / (Attn)UpBlock2D
layouts, channel-concat conditioning at the input.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from d3roma_tpu.models.layers import (
    Downsample2D,
    ResnetBlock2D,
    SelfAttention2D,
    TimestepEmbedding,
    Upsample2D,
    timestep_embedding,
)


class UNet2D(nn.Module):
    """UNet over NHWC images. in_channels = depth_channels + condition
    channels (reference: train.py:777-786); out_channels = depth_channels."""

    in_channels: int
    out_channels: int
    block_out_channels: Tuple[int, ...] = (128, 128, 256, 256, 512, 512)
    down_block_types: Tuple[str, ...] = (
        "DownBlock2D", "DownBlock2D", "DownBlock2D",
        "DownBlock2D", "AttnDownBlock2D", "DownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D", "AttnUpBlock2D", "UpBlock2D",
        "UpBlock2D", "UpBlock2D", "UpBlock2D",
    )
    layers_per_block: int = 2
    attention_head_dim: int = 8
    norm_groups: int = 32
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    dropout: float = 0.0
    quant: bool = False  # int8 MXU path for inference (ops/quant.py)
    fused_norm: bool = False  # fused Pallas GroupNorm+SiLU (ops/pallas/)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample: jnp.ndarray, timesteps: jnp.ndarray, deterministic=True):
        """sample: [B, H, W, in_channels]; timesteps: scalar or [B]."""
        assert len(self.down_block_types) == len(self.block_out_channels)
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        c0 = self.block_out_channels[0]
        t_emb = timestep_embedding(
            timesteps, c0, self.flip_sin_to_cos, self.freq_shift
        ).astype(self.dtype)
        t_emb = TimestepEmbedding(c0 * 4, dtype=self.dtype, name="time_embedding")(t_emb)

        # conv_in is never quantized: its input is the raw latent/image
        # stack (not GN-normalized) and its FLOPs share is negligible
        x = nn.Conv(c0, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(sample)

        # ---- down path ----
        skips = [x]
        for i, (btype, ch) in enumerate(zip(self.down_block_types, self.block_out_channels)):
            is_last = i == len(self.block_out_channels) - 1
            for j in range(self.layers_per_block):
                x = ResnetBlock2D(
                    ch, groups=self.norm_groups, dropout=self.dropout,
                    quant=self.quant, fused_norm=self.fused_norm, dtype=self.dtype, name=f"down_{i}_res_{j}",
                )(x, t_emb, deterministic)
                if btype == "AttnDownBlock2D":
                    x = SelfAttention2D(
                        ch, self.attention_head_dim, self.norm_groups,
                        quant=self.quant, dtype=self.dtype,
                        name=f"down_{i}_attn_{j}",
                    )(x)
                skips.append(x)
            if not is_last:
                x = Downsample2D(ch, quant=self.quant, dtype=self.dtype,
                                 name=f"down_{i}_downsample")(x)
                skips.append(x)

        # ---- mid ----
        mid_ch = self.block_out_channels[-1]
        x = ResnetBlock2D(mid_ch, groups=self.norm_groups, dropout=self.dropout,
                          quant=self.quant, fused_norm=self.fused_norm, dtype=self.dtype,
                          name="mid_res_0")(x, t_emb, deterministic)
        x = SelfAttention2D(mid_ch, self.attention_head_dim, self.norm_groups,
                            quant=self.quant, dtype=self.dtype, name="mid_attn")(x)
        x = ResnetBlock2D(mid_ch, groups=self.norm_groups, dropout=self.dropout,
                          quant=self.quant, fused_norm=self.fused_norm, dtype=self.dtype,
                          name="mid_res_1")(x, t_emb, deterministic)

        # ---- up path ----
        rev_channels = tuple(reversed(self.block_out_channels))
        for i, btype in enumerate(self.up_block_types):
            ch = rev_channels[i]
            is_last = i == len(self.up_block_types) - 1
            for j in range(self.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = ResnetBlock2D(
                    ch, groups=self.norm_groups, dropout=self.dropout,
                    quant=self.quant, fused_norm=self.fused_norm, dtype=self.dtype, name=f"up_{i}_res_{j}",
                )(x, t_emb, deterministic)
                if btype == "AttnUpBlock2D":
                    x = SelfAttention2D(
                        ch, self.attention_head_dim, self.norm_groups,
                        quant=self.quant, dtype=self.dtype,
                        name=f"up_{i}_attn_{j}",
                    )(x)
            if not is_last:
                x = Upsample2D(ch, quant=self.quant, dtype=self.dtype,
                               name=f"up_{i}_upsample")(
                    x, out_hw=skips[-1].shape[1:3]
                )

        from d3roma_tpu.models.layers import GroupNormSiLU

        x = GroupNormSiLU(self.norm_groups, 1e-5, fused=self.fused_norm,
                          dtype=self.dtype, name="conv_norm_out")(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=jnp.float32,
                    name="conv_out")(x)
        return x


def pixel_in_channels(cond_channels: str, depth_channels: int) -> int:
    """Input channel count per condition combo (reference: train.py:777-786)."""
    table = {
        "left+right+raw": 6 + 2 * depth_channels,
        "rgb+raw": 3 + 2 * depth_channels,
        "rgb+left+right": 9 + depth_channels,
        "rgb+left+right+raw": 9 + 2 * depth_channels,
        "rgb": 3 + depth_channels,
        "left+right": 6 + depth_channels,
    }
    if cond_channels not in table:
        raise ValueError(f"{cond_channels} not supported")
    return table[cond_channels]
