"""Golden numerical parity of the Flax building blocks vs hand-written torch
modules implementing the diffusers conventions (norm eps/order, conv padding,
time-embedding injection, attention scaling). These pin down exactly the
semantics the weight importer assumes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from d3roma_tpu.models.layers import (
    Downsample2D,
    ResnetBlock2D,
    SelfAttention2D,
    Upsample2D,
    timestep_embedding,
)

ATOL = 2e-4


def _conv_to_flax(w, b):
    return {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))), "bias": jnp.asarray(b)}


def _lin_to_flax(w, b):
    return {"kernel": jnp.asarray(np.transpose(w)), "bias": jnp.asarray(b)}


def _norm_to_flax(w, b):
    return {"scale": jnp.asarray(w), "bias": jnp.asarray(b)}


def test_resnet_block_matches_torch():
    """GroupNorm -> SiLU -> conv3 -> +temb -> GroupNorm -> SiLU -> conv3 + skip."""
    torch.manual_seed(0)
    B, H, W, Cin, Cout, Temb = 2, 8, 8, 8, 12, 16
    g = 4
    norm1 = torch.nn.GroupNorm(g, Cin, eps=1e-5)
    conv1 = torch.nn.Conv2d(Cin, Cout, 3, padding=1)
    temb_proj = torch.nn.Linear(Temb, Cout)
    norm2 = torch.nn.GroupNorm(g, Cout, eps=1e-5)
    conv2 = torch.nn.Conv2d(Cout, Cout, 3, padding=1)
    shortcut = torch.nn.Conv2d(Cin, Cout, 1)
    for m in (norm1, conv1, temb_proj, norm2, conv2, shortcut):
        for p in m.parameters():
            torch.nn.init.normal_(p, 0, 0.5)

    x = torch.randn(B, Cin, H, W)
    temb = torch.randn(B, Temb)
    with torch.no_grad():
        h = conv1(F.silu(norm1(x)))
        h = h + temb_proj(F.silu(temb))[:, :, None, None]
        h = conv2(F.silu(norm2(h)))
        ref = (shortcut(x) + h).permute(0, 2, 3, 1).numpy()

    blk = ResnetBlock2D(Cout, groups=g)
    params = {
        "norm1": _norm_to_flax(norm1.weight.detach().numpy(), norm1.bias.detach().numpy()),
        "conv1": _conv_to_flax(conv1.weight.detach().numpy(), conv1.bias.detach().numpy()),
        "time_emb_proj": _lin_to_flax(temb_proj.weight.detach().numpy(), temb_proj.bias.detach().numpy()),
        "norm2": _norm_to_flax(norm2.weight.detach().numpy(), norm2.bias.detach().numpy()),
        "conv2": _conv_to_flax(conv2.weight.detach().numpy(), conv2.bias.detach().numpy()),
        "conv_shortcut": _conv_to_flax(shortcut.weight.detach().numpy(), shortcut.bias.detach().numpy()),
    }
    out = blk.apply({"params": params},
                    jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
                    jnp.asarray(temb.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=ATOL)


def test_self_attention_matches_torch():
    """GroupNorm pre-norm + multihead attention + residual (diffusers
    AttnBlock with to_out)."""
    torch.manual_seed(1)
    B, H, W, C, heads = 1, 4, 6, 16, 2
    hd = C // heads
    gn = torch.nn.GroupNorm(4, C, eps=1e-5)
    q = torch.nn.Linear(C, C)
    k = torch.nn.Linear(C, C)
    v = torch.nn.Linear(C, C)
    o = torch.nn.Linear(C, C)
    x = torch.randn(B, C, H, W)
    with torch.no_grad():
        hN = gn(x).flatten(2).transpose(1, 2)  # B,N,C
        qq = q(hN).view(B, -1, heads, hd).transpose(1, 2)
        kk = k(hN).view(B, -1, heads, hd).transpose(1, 2)
        vv = v(hN).view(B, -1, heads, hd).transpose(1, 2)
        attn = torch.softmax(qq @ kk.transpose(-1, -2) / np.sqrt(hd), dim=-1)
        out = (attn @ vv).transpose(1, 2).reshape(B, -1, C)
        ref = (x + o(out).transpose(1, 2).view(B, C, H, W)).permute(0, 2, 3, 1).numpy()

    blk = SelfAttention2D(C, head_dim=hd, groups=4)
    params = {
        "group_norm": _norm_to_flax(gn.weight.detach().numpy(), gn.bias.detach().numpy()),
        "to_q": _lin_to_flax(q.weight.detach().numpy(), q.bias.detach().numpy()),
        "to_k": _lin_to_flax(k.weight.detach().numpy(), k.bias.detach().numpy()),
        "to_v": _lin_to_flax(v.weight.detach().numpy(), v.bias.detach().numpy()),
        "to_out": _lin_to_flax(o.weight.detach().numpy(), o.bias.detach().numpy()),
    }
    out = blk.apply({"params": params}, jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=ATOL)


@pytest.mark.parametrize("asymmetric", [False, True])
def test_downsample_matches_torch(asymmetric):
    torch.manual_seed(2)
    conv = torch.nn.Conv2d(6, 6, 3, stride=2, padding=0 if asymmetric else 1)
    x = torch.randn(1, 6, 8, 10)
    with torch.no_grad():
        if asymmetric:
            xp = F.pad(x, (0, 1, 0, 1))  # diffusers VAE convention
            ref = conv(xp)
        else:
            ref = conv(x)  # diffusers UNet convention (padding=1)
    ref = ref.permute(0, 2, 3, 1).numpy()

    blk = Downsample2D(6, asymmetric_padding=asymmetric)
    params = {"conv": _conv_to_flax(conv.weight.detach().numpy(), conv.bias.detach().numpy())}
    out = blk.apply({"params": params}, jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=ATOL)


def test_upsample_matches_torch():
    torch.manual_seed(3)
    conv = torch.nn.Conv2d(6, 6, 3, padding=1)
    x = torch.randn(1, 6, 5, 7)
    with torch.no_grad():
        ref = conv(F.interpolate(x, scale_factor=2, mode="nearest"))
    ref = ref.permute(0, 2, 3, 1).numpy()
    blk = Upsample2D(6)
    params = {"conv": _conv_to_flax(conv.weight.detach().numpy(), conv.bias.detach().numpy())}
    out = blk.apply({"params": params}, jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=ATOL)


def test_timestep_embedding_matches_diffusers_convention():
    """flip_sin_to_cos=True, downscale_freq_shift=0 (diffusers Timesteps)."""
    t = np.array([0, 1, 500, 999], np.int64)
    dim = 32
    half = dim // 2
    exponent = -np.log(10000.0) * np.arange(half) / half
    emb = np.exp(exponent)[None] * t[:, None].astype(np.float64)
    ref = np.concatenate([np.cos(emb), np.sin(emb)], axis=-1)
    out = timestep_embedding(jnp.asarray(t), dim)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
