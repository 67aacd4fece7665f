"""Model zoo tests: shapes, jit, gradient flow, CLIP golden parity vs torch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3roma_tpu.models import (
    AutoencoderKL,
    CLIPTextConfig,
    CLIPTextModel,
    UNet2D,
    UNet2DCondition,
    empty_prompt_tokens,
    pixel_in_channels,
    widened_in_channels,
)


SMALL_PIXEL = dict(
    block_out_channels=(32, 32, 64),
    down_block_types=("DownBlock2D", "AttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "AttnUpBlock2D", "UpBlock2D"),
    layers_per_block=2,
    norm_groups=8,
)


def test_unet2d_shapes_and_jit():
    model = UNet2D(in_channels=5, out_channels=1, **SMALL_PIXEL)
    x = jnp.zeros((2, 32, 64, 5))
    t = jnp.array([3, 100])
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t)
    fn = jax.jit(lambda p, x, t: model.apply(p, x, t))
    out = fn(params, x, t)
    assert out.shape == (2, 32, 64, 1)
    assert jnp.all(jnp.isfinite(out))


def test_unet2d_timestep_changes_output():
    model = UNet2D(in_channels=2, out_channels=1, **SMALL_PIXEL)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 2))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, jnp.array([0]))
    o1 = model.apply(params, x, jnp.array([0]))
    o2 = model.apply(params, x, jnp.array([100]))
    assert float(jnp.abs(o1 - o2).max()) > 1e-6


def test_unet2d_grad_flows():
    model = UNet2D(in_channels=2, out_channels=1, **SMALL_PIXEL)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 2))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, jnp.array([5]))

    def loss(p):
        return jnp.mean(model.apply(p, x, jnp.array([5])) ** 2)

    g = jax.grad(loss)(params)
    norms = [float(jnp.abs(v).sum()) for v in jax.tree.leaves(g)]
    assert all(np.isfinite(norms))
    assert sum(n > 0 for n in norms) > len(norms) * 0.9


def test_pixel_in_channels_table():
    # reference: train.py:777-786
    assert pixel_in_channels("left+right+raw", 1) == 8
    assert pixel_in_channels("rgb+raw", 1) == 5
    assert pixel_in_channels("rgb+left+right", 1) == 10
    assert pixel_in_channels("rgb+left+right+raw", 1) == 11
    with pytest.raises(ValueError):
        pixel_in_channels("bogus", 1)


def test_unet2d_condition_shapes():
    model = UNet2DCondition(
        in_channels=8, out_channels=4,
        block_out_channels=(32, 64),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        attention_head_dim=16, cross_attention_dim=24, norm_groups=8,
    )
    x = jnp.zeros((1, 16, 16, 8))
    ctx = jnp.zeros((1, 7, 24))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, jnp.array([10]), ctx)
    out = jax.jit(lambda p: model.apply(p, x, jnp.array([10]), ctx))(params)
    assert out.shape == (1, 16, 16, 4)
    assert widened_in_channels("rgb+raw") == 12  # 4*(2+1)
    assert widened_in_channels("left+right+raw") == 16


def test_vae_roundtrip_shapes():
    vae = AutoencoderKL(block_out_channels=(16, 32), latent_channels=4, norm_groups=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    params = jax.jit(vae.init)(jax.random.PRNGKey(1), x)
    post = vae.apply(params, x, method="encode")
    assert post.mean.shape == (1, 16, 16, 4)  # /2 per non-final block
    recon = vae.apply(params, post.mode(), method="decode")
    assert recon.shape == (1, 32, 32, 3)


def test_clip_matches_torch_transformers():
    """Golden numeric parity: tiny random CLIPTextModel in torch vs flax."""
    import torch
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel as HFModel

    from d3roma_tpu.models.torch_import import clip_text_torch_to_flax

    hf_cfg = HFConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, hidden_act="gelu",
    )
    torch.manual_seed(0)
    hf = HFModel(hf_cfg).eval()

    ids = np.array([[1, 5, 9, 2, 0, 0, 0, 0]], np.int64)
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).last_hidden_state.numpy()

    cfg = CLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, hidden_act="gelu",
    )
    flax_model = CLIPTextModel(cfg)
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = {"params": clip_text_torch_to_flax(sd)}
    out = flax_model.apply(params, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_empty_prompt_tokens():
    # reference tokenizes "" with padding="do_not_pad" (train.py:121-129):
    # the context is exactly [BOS, EOS]
    ids = empty_prompt_tokens()
    assert ids.shape == (1, 2)
    assert ids[0, 0] == 49406 and ids[0, 1] == 49407
    # EOS-padded variant still available for max_length-padding callers
    ids77 = empty_prompt_tokens(77)
    assert ids77.shape == (1, 77) and ids77[0, -1] == 49407


def test_conv_in_widening_rule():
    """Widened conv produces the same output as original when the extra
    input channels replicate the original input (reference: train.py:758-769)."""
    from d3roma_tpu.models.torch_import import widen_conv_in

    key = jax.random.PRNGKey(0)
    kernel = jax.random.normal(key, (3, 3, 4, 8))
    bias = jax.random.normal(jax.random.fold_in(key, 1), (8,))
    params = {"conv_in": {"kernel": kernel, "bias": bias}}
    widened = widen_conv_in(params, dup=3)
    assert widened["conv_in"]["kernel"].shape == (3, 3, 12, 8)

    x = jax.random.normal(jax.random.fold_in(key, 2), (1, 8, 8, 4))
    x3 = jnp.tile(x, (1, 1, 1, 3))
    hi = jax.lax.Precision.HIGHEST
    # the reference divides bias by dup as well (train.py:761), so the widened
    # conv reproduces Wx + b/dup, not Wx + b
    out_orig = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=hi,
    ) + bias / 3
    out_wide = jax.lax.conv_general_dilated(
        x3, widened["conv_in"]["kernel"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=hi,
    ) + widened["conv_in"]["bias"]
    np.testing.assert_allclose(np.asarray(out_wide), np.asarray(out_orig), atol=1e-4)


def test_flash_attention_matches_xla_path():
    """Pallas flash self-attention (interpret mode on CPU) must match the
    einsum/XLA attention numerically."""
    from jax.experimental.pallas import tpu as pltpu

    from d3roma_tpu.models.layers import CrossAttention

    B, N, heads, hd = 1, 1088, 2, 64  # N >= flash_min_seq, non-512-multiple
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, N, heads * hd), jnp.float32)

    ref_attn = CrossAttention(heads * hd, heads, hd, use_flash=False)
    params = jax.jit(ref_attn.init)(key, x)["params"]
    ref = ref_attn.apply({"params": params}, x)

    flash_attn = CrossAttention(heads * hd, heads, hd, use_flash=True,
                                flash_min_seq=1024)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attn.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)
