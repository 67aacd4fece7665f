"""fast_inference kernel-config plumbing: config knob -> pipeline modules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3roma_tpu.guidance import FlowGuidance
from d3roma_tpu.models import AutoencoderKL, UNet2DCondition
from d3roma_tpu.ops import Normalizer, ScheduleConfig
from d3roma_tpu.pipelines import GuidedLatentDiffusionPipeline, SamplerSpec


def _tiny_pipe():
    unet = UNet2DCondition(
        in_channels=8, out_channels=4, block_out_channels=(8, 16),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, attention_head_dim=8, cross_attention_dim=16,
        norm_groups=4,
    )
    vae = AutoencoderKL(block_out_channels=(4, 4, 4, 8), latent_channels=4,
                        norm_groups=2)
    key = jax.random.PRNGKey(0)
    up = jax.jit(unet.init)(key, jnp.zeros((1, 4, 4, 8)), jnp.array([0]),
                            jnp.zeros((1, 4, 16)))["params"]
    vp = jax.jit(vae.init)(jax.random.fold_in(key, 1), jnp.zeros((1, 32, 32, 3)))["params"]
    sched = ScheduleConfig(num_train_timesteps=8, prediction_type="v_prediction",
                           clip_sample=False)
    return GuidedLatentDiffusionPipeline(
        unet=unet, unet_params=up, vae=vae, vae_params=vp,
        text_embed=jnp.zeros((1, 4, 16)),
        spec=SamplerSpec("my_ddim", sched),
        guidance=FlowGuidance(flow_guidance_weight=0.0),
        normalizer=Normalizer(ssi=False, mode="average", num_chs=1,
                              ch_bounds=(128.0,), ch_gammas=(1.0,)),
    )


def test_throughput_mode_sets_kernel_config():
    p = _tiny_pipe().fast_inference("throughput")
    assert p.unet.use_flash_attention == "pallas-self"
    assert p.unet.fused_ff is True
    assert p.unet.quant == "static"
    assert p.vae.quant == "static"
    assert p.unet.dtype == jnp.bfloat16


def test_latency_mode_skips_int8():
    p = _tiny_pipe().fast_inference("latency")
    assert p.unet.use_flash_attention == "pallas-self"
    assert p.unet.quant is False
    assert p.vae.quant is False


def test_wino_mode_sets_winograd_convs():
    p = _tiny_pipe().fast_inference("wino")
    assert p.unet.use_flash_attention == "pallas-self"
    assert p.unet.fused_ff is True
    assert p.unet.quant == "wino_static"
    assert p.vae.quant == "wino_static"


def test_off_is_identity_and_bad_mode_raises():
    p = _tiny_pipe()
    assert p.fast_inference("off") is p
    with pytest.raises(ValueError):
        p.fast_inference("warp9")


def test_fast_pipeline_runs_end_to_end():
    """The fast config must sample on CPU too (kernels fall back / run in
    interpret mode) — same output contract as the plain pipeline."""
    p = _tiny_pipe().fast_inference("latency")
    rgb = jnp.zeros((1, 32, 32, 3))
    out = p(jax.random.PRNGKey(0), num_inference_steps=2,
            num_intermediate_images=1, cond_channels="rgb",
            rgb_images=rgb)
    assert out.images.shape[0] == 1
    assert np.all(np.isfinite(np.asarray(out.images, np.float32)))


def test_from_pretrained_params_are_device_arrays(tmp_path):
    """msgpack_restore yields host numpy arrays; loading must commit them
    to device once — as jit arguments numpy trees are re-uploaded on
    every call (30-65 s/frame for the flagship on a remote device)."""
    p = _tiny_pipe()
    d = str(tmp_path / "pipe")
    p.save_pretrained(d)
    loaded = GuidedLatentDiffusionPipeline.from_pretrained(d)
    leaves = jax.tree.leaves(loaded.unet_params) + jax.tree.leaves(loaded.vae_params)
    assert all(isinstance(leaf, jax.Array) for leaf in leaves)


def test_denorm_builder_guidance_no_retrace(tmp_path):
    """The denorm_builder path must thread per-frame raw/mask as traced
    arguments: two calls with different raw data but equal shapes reuse
    ONE jitted program (the old per-call closure retraced every frame)."""
    import dataclasses

    from d3roma_tpu.guidance import FlowGuidance

    p = _tiny_pipe()
    p = dataclasses.replace(
        p, guidance=FlowGuidance(flow_guidance_weight=1.0,
                                 flow_guidance_mode="gradient"))
    rgb = jnp.zeros((1, 32, 32, 3))
    builder = lambda x, raw, mask: x  # identity denormer for the test
    outs = []
    for seed in (0, 1):
        raw = jnp.abs(jax.random.normal(jax.random.PRNGKey(seed), (1, 32, 32, 1))) + 5.0
        mask = (raw > 0).astype(jnp.float32)
        out = p(jax.random.PRNGKey(seed), num_inference_steps=2,
                num_intermediate_images=1, cond_channels="rgb",
                rgb_images=rgb, raw_depth=raw,
                denorm_builder=builder, denorm_mask=mask)
        outs.append(out)
    assert len(p._jitted) == 1  # one cache entry across both frames
    assert all(np.all(np.isfinite(np.asarray(o.images, np.float32)))
               for o in outs)
