"""Int8 dynamic-quantization path (ops/quant.py): numerics vs exact compute.

The int8 MXU path is a TPU inference feature with no reference counterpart
(the reference is pure fp16/fp32 torch); these tests pin its accuracy
contract — per-row/per-channel symmetric absmax quantization keeps layer
outputs within ~1% of the exact result — and that the flagship models run
end-to-end with quant=True.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3roma_tpu.ops.quant import (
    absmax_scale,
    int8_conv_general_dilated,
    int8_dot_general,
    quantize_int8,
)


def rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


def test_quantize_roundtrip_exact_for_representable():
    x = jnp.asarray([[-127.0, -1.0, 0.0, 1.0, 64.0, 127.0]])
    s = absmax_scale(x, axes=(1,))
    q = quantize_int8(x, s)
    assert q.dtype == jnp.int8
    np.testing.assert_allclose(np.asarray(q, np.float32) * np.asarray(s), x, rtol=1e-6)


def test_zero_input_quantizes_to_zero():
    x = jnp.zeros((4, 8))
    s = absmax_scale(x, axes=(1,))
    assert np.all(np.isfinite(np.asarray(s)))
    assert np.all(np.asarray(quantize_int8(x, s)) == 0)


def test_int8_dot_close_to_exact():
    k = jax.random.PRNGKey(0)
    lhs = jax.random.normal(k, (64, 256))
    rhs = jax.random.normal(jax.random.fold_in(k, 1), (256, 128)) * 0.05
    dn = (((1,), (0,)), ((), ()))
    exact = jax.lax.dot_general(lhs, rhs, dn, preferred_element_type=jnp.float32)
    q = int8_dot_general(lhs, rhs, dn)
    assert rel_err(q, exact) < 0.015


def test_int8_dot_per_row_scale_invariance():
    # wildly different row magnitudes must not cross-contaminate (per-row scales)
    k = jax.random.PRNGKey(2)
    lhs = jax.random.normal(k, (4, 64)) * jnp.asarray([[1e-3], [1.0], [1e3], [10.0]])
    rhs = jax.random.normal(jax.random.fold_in(k, 3), (64, 32))
    dn = (((1,), (0,)), ((), ()))
    exact = jax.lax.dot_general(lhs, rhs, dn, preferred_element_type=jnp.float32)
    q = int8_dot_general(lhs, rhs, dn)
    for r in range(4):
        assert rel_err(q[r], exact[r]) < 0.02, f"row {r}"


def test_int8_dot_falls_back_on_nonstandard_pattern():
    # batched contraction is not the Dense pattern -> exact fallback
    lhs = jnp.ones((2, 3, 4))
    rhs = jnp.ones((2, 4, 5))
    dn = (((2,), (1,)), ((0,), (0,)))
    out = int8_dot_general(lhs, rhs, dn)
    exact = jax.lax.dot_general(lhs, rhs, dn)
    np.testing.assert_allclose(np.asarray(out), np.asarray(exact), rtol=1e-6)


def test_int8_conv_close_to_exact():
    k = jax.random.PRNGKey(1)
    x = jax.random.normal(k, (2, 16, 20, 32))
    w = jax.random.normal(jax.random.fold_in(k, 1), (3, 3, 32, 48)) * 0.1
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    exact = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    q = int8_conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=dn)
    assert rel_err(q, exact) < 0.015


def test_int8_conv_strided():
    k = jax.random.PRNGKey(5)
    x = jax.random.normal(k, (1, 17, 21, 8))
    w = jax.random.normal(jax.random.fold_in(k, 1), (3, 3, 8, 16))
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    exact = jax.lax.conv_general_dilated(
        x, w, (2, 2), [(1, 1), (1, 1)], dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    q = int8_conv_general_dilated(x, w, (2, 2), [(1, 1), (1, 1)], dimension_numbers=dn)
    assert q.shape == exact.shape
    assert rel_err(q, exact) < 0.015


@pytest.mark.parametrize("family", ["ldm", "pixel"])
def test_quantized_unet_output_close_to_float(family):
    """End-to-end: quant=True forward stays close to the float forward on a
    small random-init model (the architecture decides error accumulation)."""
    key = jax.random.PRNGKey(0)
    if family == "ldm":
        from d3roma_tpu.models import UNet2DCondition

        model = UNet2DCondition(
            in_channels=8, out_channels=4, block_out_channels=(32, 64),
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
            layers_per_block=1, attention_head_dim=8, cross_attention_dim=32,
            norm_groups=8,
        )
        x = jax.random.normal(key, (1, 8, 8, 8))
        ctx = jax.random.normal(jax.random.fold_in(key, 1), (1, 7, 32))
        params = model.init(key, x, jnp.array([0]), ctx)["params"]
        args = (x, jnp.array([3]), ctx)
    else:
        from d3roma_tpu.models import UNet2D

        model = UNet2D(
            in_channels=5, out_channels=1, block_out_channels=(32, 64),
            down_block_types=("DownBlock2D", "AttnDownBlock2D"),
            up_block_types=("AttnUpBlock2D", "UpBlock2D"),
            layers_per_block=1, norm_groups=8,
        )
        x = jax.random.normal(key, (1, 16, 16, 5))
        params = model.init(key, x, jnp.array([0]))["params"]
        args = (x, jnp.array([3]))

    ref = model.apply({"params": params}, *args)
    qmodel = dataclasses.replace(model, quant=True)
    out = qmodel.apply({"params": params}, *args)
    assert out.shape == ref.shape
    assert np.all(np.isfinite(np.asarray(out)))
    assert rel_err(out, ref) < 0.12  # random-init nets amplify; trained ~1-3%


def test_quantized_pipeline_runs():
    """quantize_int8() on the latent pipeline produces finite outputs."""
    from d3roma_tpu.guidance import FlowGuidance
    from d3roma_tpu.models import AutoencoderKL, UNet2DCondition
    from d3roma_tpu.ops import Normalizer, ScheduleConfig
    from d3roma_tpu.pipelines import GuidedLatentDiffusionPipeline, SamplerSpec

    key = jax.random.PRNGKey(0)
    unet = UNet2DCondition(
        in_channels=8, out_channels=4, block_out_channels=(32, 64),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, attention_head_dim=8, cross_attention_dim=32,
        norm_groups=8,
    )
    # 4 blocks -> 8x downsample, matching latent_pipeline's H//8 convention
    vae = AutoencoderKL(block_out_channels=(16, 16, 16, 32), norm_groups=8)
    lat = jnp.zeros((1, 4, 4, 8))
    ctx = jnp.zeros((1, 7, 32))
    unet_params = unet.init(key, lat, jnp.array([0]), ctx)["params"]
    vae_params = vae.init(jax.random.fold_in(key, 1), jnp.zeros((1, 8, 8, 3)))["params"]
    sched = ScheduleConfig(num_train_timesteps=16, prediction_type="v_prediction",
                           clip_sample=False)
    pipe = GuidedLatentDiffusionPipeline(
        unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
        text_embed=jnp.zeros((1, 7, 32)),
        spec=SamplerSpec("my_ddim", sched),
        guidance=FlowGuidance(flow_guidance_weight=0.0),
        normalizer=Normalizer(ssi=False),
    ).quantize_int8()
    assert pipe.unet.quant and pipe.vae.quant
    out = pipe(jax.random.PRNGKey(3), num_inference_steps=2,
               num_intermediate_images=1, cond_channels="rgb",
               rgb_images=jnp.ones((1, 16, 16, 3)) * 0.1)
    assert np.all(np.isfinite(np.asarray(out.images)))


def test_fused_groupnorm_silu_matches_fallback():
    """The Pallas GN+SiLU kernel (interpret mode) matches the XLA fallback
    and flax nn.GroupNorm + silu."""
    import flax.linen as fnn

    from d3roma_tpu.ops.pallas.groupnorm import fused_group_norm_silu

    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (2, 12, 20, 64))
    gamma = jax.random.normal(jax.random.fold_in(k, 1), (64,)) * 0.2 + 1.0
    beta = jax.random.normal(jax.random.fold_in(k, 2), (64,)) * 0.1
    out = fused_group_norm_silu(x, gamma, beta, groups=8, interpret=True)
    ref = fnn.silu(
        fnn.GroupNorm(8, epsilon=1e-5).apply(
            {"params": {"scale": gamma, "bias": beta}}, x
        )
    )
    assert rel_err(out, ref) < 1e-5

    # fused_norm=True models fall back to the XLA path off-TPU and still
    # match a fused_norm=False forward exactly
    from d3roma_tpu.models import UNet2D

    model = UNet2D(in_channels=5, out_channels=1, block_out_channels=(32, 64),
                   down_block_types=("DownBlock2D", "DownBlock2D"),
                   up_block_types=("UpBlock2D", "UpBlock2D"),
                   layers_per_block=1, norm_groups=8)
    xs = jax.random.normal(k, (1, 16, 16, 5))
    params = model.init(k, xs, jnp.array([0]))["params"]
    a = model.apply({"params": params}, xs, jnp.array([3]))
    b = dataclasses.replace(model, fused_norm=True).apply(
        {"params": params}, xs, jnp.array([3])
    )
    assert rel_err(a, b) < 1e-6


def test_static_int8_unet_close_to_float():
    """Static-scale int8 (constant activation scale, no absmax pass): the
    conv/dense inputs are GN/LN-normalized so a fixed scale keeps outputs
    close; conv_in layers are exempt (raw image/latent inputs)."""
    from d3roma_tpu.models import UNet2DCondition

    key = jax.random.PRNGKey(0)
    model = UNet2DCondition(
        in_channels=8, out_channels=4, block_out_channels=(32, 64),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, attention_head_dim=8, cross_attention_dim=32,
        norm_groups=8,
    )
    x = jax.random.normal(key, (1, 8, 8, 8))
    ctx = jax.random.normal(jax.random.fold_in(key, 1), (1, 7, 32))
    params = model.init(key, x, jnp.array([0]), ctx)["params"]
    ref = model.apply({"params": params}, x, jnp.array([3]), ctx)
    out = dataclasses.replace(model, quant="static").apply(
        {"params": params}, x, jnp.array([3]), ctx)
    assert np.all(np.isfinite(np.asarray(out)))
    assert rel_err(out, ref) < 0.25  # coarser than dynamic rowwise scales
