"""Weight-import mapping tests: diffusers-style torch state dicts -> Flax
trees matching the models' init structure (shape- and path-exact)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3roma_tpu.models import AutoencoderKL, UNet2D, UNet2DCondition
from d3roma_tpu.models.torch_import import (
    unet_torch_to_flax,
    vae_torch_to_flax,
    widen_conv_in,
)


def _paths(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _paths(v, prefix + (k,))
    else:
        yield prefix, np.asarray(tree).shape


def _tree_structures_match(imported, init):
    ip = dict(_paths(init))
    tp = dict(_paths(imported))
    missing = sorted(set(ip) - set(tp))
    extra = sorted(set(tp) - set(ip))
    mismatched = [(k, ip[k], tp[k]) for k in ip if k in tp and ip[k] != tp[k]]
    assert not missing, f"missing from import: {missing[:8]}"
    assert not extra, f"extra in import: {extra[:8]}"
    assert not mismatched, f"shape mismatch: {mismatched[:8]}"


def _synth_unet2d_state_dict():
    """Handcraft a diffusers-UNet2DModel-style state dict for a 2-block
    (Down, AttnDown) / (AttnUp, Up) config with layers_per_block=1,
    block_out_channels (8, 16), in 5 -> out 1, head_dim 8."""
    sd = {}

    def conv(name, cout, cin, k=3):
        sd[name + ".weight"] = np.random.randn(cout, cin, k, k).astype(np.float32)
        sd[name + ".bias"] = np.random.randn(cout).astype(np.float32)

    def lin(name, cout, cin):
        sd[name + ".weight"] = np.random.randn(cout, cin).astype(np.float32)
        sd[name + ".bias"] = np.random.randn(cout).astype(np.float32)

    def norm(name, c):
        sd[name + ".weight"] = np.random.randn(c).astype(np.float32)
        sd[name + ".bias"] = np.random.randn(c).astype(np.float32)

    def resnet(prefix, cin, cout, temb=32):
        norm(prefix + ".norm1", cin)
        conv(prefix + ".conv1", cout, cin)
        lin(prefix + ".time_emb_proj", cout, temb)
        norm(prefix + ".norm2", cout)
        conv(prefix + ".conv2", cout, cout)
        if cin != cout:
            conv(prefix + ".conv_shortcut", cout, cin, k=1)

    def attn(prefix, c):
        norm(prefix + ".group_norm", c)
        lin(prefix + ".to_q", c, c)
        lin(prefix + ".to_k", c, c)
        lin(prefix + ".to_v", c, c)
        lin(prefix + ".to_out.0", c, c)

    conv("conv_in", 8, 5)
    lin("time_embedding.linear_1", 32, 8)
    lin("time_embedding.linear_2", 32, 32)
    # down block 0: DownBlock2D (1 resnet + downsampler)
    resnet("down_blocks.0.resnets.0", 8, 8)
    conv("down_blocks.0.downsamplers.0.conv", 8, 8)
    # down block 1: AttnDownBlock2D (1 resnet + attn, last -> no downsampler)
    resnet("down_blocks.1.resnets.0", 8, 16)
    attn("down_blocks.1.attentions.0", 16)
    # mid
    resnet("mid_block.resnets.0", 16, 16)
    attn("mid_block.attentions.0", 16)
    resnet("mid_block.resnets.1", 16, 16)
    # up block 0: AttnUpBlock2D (layers_per_block+1 = 2 resnets + attns + upsampler)
    resnet("up_blocks.0.resnets.0", 32, 16)
    attn("up_blocks.0.attentions.0", 16)
    resnet("up_blocks.0.resnets.1", 24, 16)
    attn("up_blocks.0.attentions.1", 16)
    conv("up_blocks.0.upsamplers.0.conv", 16, 16)
    # up block 1: UpBlock2D
    resnet("up_blocks.1.resnets.0", 24, 8)
    resnet("up_blocks.1.resnets.1", 16, 8)
    norm("conv_norm_out", 8)
    conv("conv_out", 1, 8)
    return sd


def test_unet2d_import_structure_matches_init():
    model = UNet2D(
        in_channels=5, out_channels=1, block_out_channels=(8, 16),
        down_block_types=("DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D"),
        layers_per_block=1, attention_head_dim=8, norm_groups=4,
    )
    init = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 5)), jnp.array([0])
    )["params"]
    imported = unet_torch_to_flax(_synth_unet2d_state_dict())
    _tree_structures_match(imported, init)
    # imported weights actually run
    out = model.apply({"params": jax.tree.map(jnp.asarray, imported)},
                      jnp.zeros((1, 16, 16, 5)), jnp.array([3]))
    assert out.shape == (1, 16, 16, 1)


def _synth_vae_state_dict():
    sd = {}

    def conv(name, cout, cin, k=3):
        sd[name + ".weight"] = np.random.randn(cout, cin, k, k).astype(np.float32)
        sd[name + ".bias"] = np.random.randn(cout).astype(np.float32)

    def lin(name, cout, cin):
        sd[name + ".weight"] = np.random.randn(cout, cin).astype(np.float32)
        sd[name + ".bias"] = np.random.randn(cout).astype(np.float32)

    def norm(name, c):
        sd[name + ".weight"] = np.random.randn(c).astype(np.float32)
        sd[name + ".bias"] = np.random.randn(c).astype(np.float32)

    def resnet(prefix, cin, cout):
        norm(prefix + ".norm1", cin)
        conv(prefix + ".conv1", cout, cin)
        norm(prefix + ".norm2", cout)
        conv(prefix + ".conv2", cout, cout)
        if cin != cout:
            conv(prefix + ".conv_shortcut", cout, cin, k=1)

    def attn(prefix, c):
        norm(prefix + ".group_norm", c)
        lin(prefix + ".to_q", c, c)
        lin(prefix + ".to_k", c, c)
        lin(prefix + ".to_v", c, c)
        lin(prefix + ".to_out.0", c, c)

    # encoder: blocks (8, 16), layers_per_block=2
    conv("encoder.conv_in", 8, 3)
    resnet("encoder.down_blocks.0.resnets.0", 8, 8)
    resnet("encoder.down_blocks.0.resnets.1", 8, 8)
    conv("encoder.down_blocks.0.downsamplers.0.conv", 8, 8)
    resnet("encoder.down_blocks.1.resnets.0", 8, 16)
    resnet("encoder.down_blocks.1.resnets.1", 16, 16)
    resnet("encoder.mid_block.resnets.0", 16, 16)
    attn("encoder.mid_block.attentions.0", 16)
    resnet("encoder.mid_block.resnets.1", 16, 16)
    norm("encoder.conv_norm_out", 16)
    conv("encoder.conv_out", 8, 16)  # 2*latent
    conv("quant_conv", 8, 8, k=1)
    conv("post_quant_conv", 4, 4, k=1)
    # decoder: reversed, layers_per_block=3
    conv("decoder.conv_in", 16, 4)
    resnet("decoder.mid_block.resnets.0", 16, 16)
    attn("decoder.mid_block.attentions.0", 16)
    resnet("decoder.mid_block.resnets.1", 16, 16)
    for j in range(3):
        resnet(f"decoder.up_blocks.0.resnets.{j}", 16, 16)
    conv("decoder.up_blocks.0.upsamplers.0.conv", 16, 16)
    resnet("decoder.up_blocks.1.resnets.0", 16, 8)
    resnet("decoder.up_blocks.1.resnets.1", 8, 8)
    resnet("decoder.up_blocks.1.resnets.2", 8, 8)
    norm("decoder.conv_norm_out", 8)
    conv("decoder.conv_out", 3, 8)
    return sd


def test_vae_import_structure_matches_init():
    vae = AutoencoderKL(block_out_channels=(8, 16), latent_channels=4, norm_groups=4)
    init = jax.jit(vae.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3))
    )["params"]
    imported = vae_torch_to_flax(_synth_vae_state_dict())
    _tree_structures_match(imported, init)
    post = vae.apply({"params": jax.tree.map(jnp.asarray, imported)},
                     jnp.zeros((1, 16, 16, 3)), method="encode")
    assert post.mean.shape == (1, 8, 8, 4)


def test_widen_conv_in_on_imported_tree():
    sd = _synth_unet2d_state_dict()
    tree = unet_torch_to_flax(sd)
    widened = widen_conv_in(tree, dup=3)
    assert widened["conv_in"]["kernel"].shape == (3, 3, 15, 8)
