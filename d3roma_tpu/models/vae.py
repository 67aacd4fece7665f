"""AutoencoderKL (Stable Diffusion VAE) — Flax NHWC implementation.

The reference uses the frozen SD2.1 VAE to move disparity/RGB into latent
space (reference: train.py:821-833, core/custom_pipelines.py:304-321 with the
0.18215 scaling; disparity is tiled to 3 channels before encoding,
custom_pipelines.py:35-40). Decoder/encoder structure matches diffusers
AutoencoderKL for weight import.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from d3roma_tpu.models.layers import (
    Downsample2D,
    ResnetBlock2D,
    SelfAttention2D,
    Upsample2D,
)

SD_LATENT_SCALE = 0.18215


class Encoder(nn.Module):
    out_channels: int = 4  # latent channels (doubled for mean/logvar)
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_groups: int = 32
    quant: bool = False
    fused_norm: bool = False
    dtype: jnp.dtype = jnp.float32
    tp_mesh: object = None  # layers.py::CrossAttention.tp_mesh

    @nn.compact
    def __call__(self, x):
        # conv_in unquantized: raw [-1,1] image input, negligible FLOPs
        x = nn.Conv(self.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(self.block_out_channels):
            is_last = i == len(self.block_out_channels) - 1
            for j in range(self.layers_per_block):
                x = ResnetBlock2D(ch, use_time_emb=False, groups=self.norm_groups,
                                  eps=1e-6, quant=self.quant,
                                  fused_norm=self.fused_norm, dtype=self.dtype,
                                  name=f"down_{i}_res_{j}")(x)
            if not is_last:
                x = Downsample2D(ch, asymmetric_padding=True, quant=self.quant,
                                 dtype=self.dtype,
                                 name=f"down_{i}_downsample")(x)
        ch = self.block_out_channels[-1]
        x = ResnetBlock2D(ch, use_time_emb=False, groups=self.norm_groups,
                          eps=1e-6, quant=self.quant, fused_norm=self.fused_norm,
                          dtype=self.dtype, name="mid_res_0")(x)
        x = SelfAttention2D(ch, head_dim=ch, groups=self.norm_groups,
                            tp_mesh=self.tp_mesh,
                            eps=1e-6, quant=self.quant, dtype=self.dtype,
                            name="mid_attn")(x)
        x = ResnetBlock2D(ch, use_time_emb=False, groups=self.norm_groups,
                          eps=1e-6, quant=self.quant, fused_norm=self.fused_norm,
                          dtype=self.dtype, name="mid_res_1")(x)
        x = nn.GroupNorm(self.norm_groups, epsilon=1e-6, dtype=self.dtype,
                         name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(2 * self.out_channels, (3, 3), padding=1,
                       dtype=jnp.float32, name="conv_out")(x)


class Decoder(nn.Module):
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 3
    norm_groups: int = 32
    quant: bool = False
    fused_norm: bool = False
    dtype: jnp.dtype = jnp.float32
    tp_mesh: object = None  # layers.py::CrossAttention.tp_mesh

    @nn.compact
    def __call__(self, z):
        rev = tuple(reversed(self.block_out_channels))
        # conv_in unquantized: scaled-latent input, negligible FLOPs
        x = nn.Conv(rev[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        x = ResnetBlock2D(rev[0], use_time_emb=False, groups=self.norm_groups,
                          eps=1e-6, quant=self.quant, fused_norm=self.fused_norm,
                          dtype=self.dtype, name="mid_res_0")(x)
        x = SelfAttention2D(rev[0], head_dim=rev[0], groups=self.norm_groups,
                            tp_mesh=self.tp_mesh,
                            eps=1e-6, quant=self.quant, dtype=self.dtype,
                            name="mid_attn")(x)
        x = ResnetBlock2D(rev[0], use_time_emb=False, groups=self.norm_groups,
                          eps=1e-6, quant=self.quant, fused_norm=self.fused_norm,
                          dtype=self.dtype, name="mid_res_1")(x)
        for i, ch in enumerate(rev):
            is_last = i == len(rev) - 1
            for j in range(self.layers_per_block):
                x = ResnetBlock2D(ch, use_time_emb=False, groups=self.norm_groups,
                                  eps=1e-6, quant=self.quant,
                                  fused_norm=self.fused_norm, dtype=self.dtype,
                                  name=f"up_{i}_res_{j}")(x)
            if not is_last:
                x = Upsample2D(ch, quant=self.quant, dtype=self.dtype,
                               name=f"up_{i}_upsample")(x)
        x = nn.GroupNorm(self.norm_groups, epsilon=1e-6, dtype=self.dtype,
                         name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=jnp.float32,
                       name="conv_out")(x)


class GaussianPosterior(NamedTuple):
    mean: jnp.ndarray
    logvar: jnp.ndarray

    def sample(self, key):
        std = jnp.exp(0.5 * jnp.clip(self.logvar, -30.0, 20.0))
        return self.mean + std * jax.random.normal(key, self.mean.shape, self.mean.dtype)

    def mode(self):
        return self.mean


class AutoencoderKL(nn.Module):
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    norm_groups: int = 32
    quant: bool = False
    fused_norm: bool = False
    dtype: jnp.dtype = jnp.float32
    tp_mesh: object = None  # layers.py::CrossAttention.tp_mesh

    def setup(self):
        self.encoder = Encoder(
            self.latent_channels, self.block_out_channels,
            norm_groups=self.norm_groups, quant=self.quant,
            fused_norm=self.fused_norm, dtype=self.dtype,
            tp_mesh=self.tp_mesh,
        )
        self.decoder = Decoder(
            self.out_channels, self.block_out_channels,
            norm_groups=self.norm_groups, quant=self.quant,
            fused_norm=self.fused_norm, dtype=self.dtype,
            tp_mesh=self.tp_mesh,
        )
        # 1x1 convs around the latent (diffusers quant_conv/post_quant_conv)
        self.quant_conv = nn.Conv(2 * self.latent_channels, (1, 1), name="quant_conv")
        self.post_quant_conv = nn.Conv(self.latent_channels, (1, 1), name="post_quant_conv")

    def encode(self, x) -> GaussianPosterior:
        h = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(h, 2, axis=-1)
        return GaussianPosterior(mean, logvar)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, key=None):
        post = self.encode(x)
        z = post.sample(key) if key is not None else post.mode()
        return self.decode(z), post


def encode_image_to_latent(vae_apply, x: jnp.ndarray, sample_key=None) -> jnp.ndarray:
    """[-1,1] image [B,H,W,3] -> scaled latent [B,H/8,W/8,4]
    (reference: train.py:131-141; mode, not sample, at train/inference)."""
    post = vae_apply(x, method="encode")
    z = post.sample(sample_key) if sample_key is not None else post.mode()
    return z * SD_LATENT_SCALE


def encode_disp_to_latent(vae_apply, disp: jnp.ndarray, sample_key=None) -> jnp.ndarray:
    """Disparity [B,H,W,1] tiled to 3 channels then encoded
    (reference: train.py:143-155, custom_pipelines.py:35-40)."""
    return encode_image_to_latent(vae_apply, jnp.tile(disp, (1, 1, 1, 3)), sample_key)


def decode_latent(vae_apply, z: jnp.ndarray, mean_channels: bool = True) -> jnp.ndarray:
    """Scaled latent -> image; disparity decoding averages the 3 output
    channels (reference: custom_pipelines.py:256-273)."""
    img = vae_apply(z / SD_LATENT_SCALE, method="decode")
    if mean_channels:
        img = jnp.mean(img, axis=-1, keepdims=True)
    return img
