"""Pipeline tests: scan-based sampling loops, guidance, save/load."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3roma_tpu.guidance import FlowGuidance, photometric_grad, photometric_optimize
from d3roma_tpu.models import AutoencoderKL, UNet2D, UNet2DCondition
from d3roma_tpu.ops import Normalizer, ScheduleConfig
from d3roma_tpu.pipelines import (
    GuidedDiffusionPipeline,
    GuidedLatentDiffusionPipeline,
    SamplerSpec,
    build_cond_concat,
    run_sampler,
)

SMALL_SCHED = ScheduleConfig(num_train_timesteps=20, prediction_type="epsilon",
                             clip_sample=False)


def _oracle_sampler_run(kind, eta=0.0):
    """Run the scan with an oracle model; check it denoises to x0."""
    tables = SMALL_SCHED.tables()
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (1, 8, 8, 1)) * 0.3
    conds = jnp.zeros((1, 8, 8, 2))

    def model_fn(model_input, t):
        x = model_input[..., :1]
        ab = tables.alphas_cumprod[t]
        return (x - jnp.sqrt(ab) * x0) / jnp.sqrt(1 - ab)

    spec = SamplerSpec(kind=kind, schedule=SMALL_SCHED, eta=eta)
    final, stack = run_sampler(
        model_fn, spec, tables, jax.random.normal(jax.random.fold_in(key, 1), x0.shape),
        conds, key, num_inference_steps=20,
    )
    assert stack.shape[0] == 20
    # last x_hat0 should match the oracle x0 closely
    np.testing.assert_allclose(np.asarray(stack[-1]), np.asarray(x0), atol=0.05)


def test_run_sampler_ddim_oracle():
    _oracle_sampler_run("my_ddim")


def test_run_sampler_ddpm_oracle():
    _oracle_sampler_run("my_ddpm")


def test_build_cond_concat_combos():
    rgb = jnp.zeros((1, 4, 4, 3))
    left = jnp.ones((1, 4, 4, 3))
    right = jnp.ones((1, 4, 4, 3)) * 2
    raw = jnp.ones((1, 4, 4, 1)) * 3
    assert build_cond_concat("rgb", rgb).shape[-1] == 3
    assert build_cond_concat("rgb+raw", rgb, raw=raw).shape[-1] == 4
    assert build_cond_concat("left+right+raw", left=left, right=right, raw=raw).shape[-1] == 7
    assert build_cond_concat("rgb+left+right+raw", rgb, left, right, raw).shape[-1] == 10
    with pytest.raises(ValueError):
        build_cond_concat("bogus", rgb)


def test_pixel_pipeline_end_to_end(tmp_path):
    """Small pixel pipeline: runs, shapes right, saves and reloads."""
    unet = UNet2D(in_channels=5, out_channels=1,
                  block_out_channels=(16, 32),
                  down_block_types=("DownBlock2D", "AttnDownBlock2D"),
                  up_block_types=("AttnUpBlock2D", "UpBlock2D"),
                  layers_per_block=1, norm_groups=8)
    x = jnp.zeros((1, 16, 16, 5))
    params = jax.jit(unet.init)(jax.random.PRNGKey(0), x, jnp.array([0]))["params"]

    pipe = GuidedDiffusionPipeline(
        unet=unet, unet_params=params,
        spec=SamplerSpec("my_ddpm", SMALL_SCHED),
        guidance=FlowGuidance(flow_guidance_weight=0.0),
        normalizer=Normalizer(ssi=False, mode="average", num_chs=1,
                              ch_bounds=(128.0,), ch_gammas=(1.0,)),
    )
    rgb = jnp.zeros((1, 16, 16, 3))
    raw = jnp.zeros((1, 16, 16, 1))
    out = pipe(jax.random.PRNGKey(1), num_inference_steps=4,
               num_intermediate_images=2, depth_channels=1,
               cond_channels="rgb+raw", rgb_images=rgb, sim_disp=raw)
    assert out.images.shape == (1, 16, 16, 1)
    assert out.intermediates.shape == (2, 1, 16, 16, 1)
    assert np.all(np.isfinite(np.asarray(out.images)))

    d = str(tmp_path / "pipe")
    pipe.save_pretrained(d)
    loaded = GuidedDiffusionPipeline.from_pretrained(d)
    out2 = loaded(jax.random.PRNGKey(1), num_inference_steps=4,
                  num_intermediate_images=2, depth_channels=1,
                  cond_channels="rgb+raw", rgb_images=rgb, sim_disp=raw)
    np.testing.assert_allclose(np.asarray(out.images), np.asarray(out2.images),
                               atol=1e-5)


def _tiny_latent_pipe():
    unet = UNet2DCondition(
        in_channels=12, out_channels=4, block_out_channels=(16, 32),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, attention_head_dim=8, cross_attention_dim=16,
        norm_groups=8,
    )
    x = jnp.zeros((1, 4, 4, 12))
    ctx = jnp.zeros((1, 3, 16))
    unet_params = jax.jit(unet.init)(
        jax.random.PRNGKey(0), x, jnp.array([0]), ctx
    )["params"]

    vae = AutoencoderKL(block_out_channels=(8, 16), latent_channels=4,
                        norm_groups=4)
    vae_params = jax.jit(vae.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3))
    )["params"]
    return unet, unet_params, vae, vae_params


def test_latent_pipeline_end_to_end(tmp_path):
    unet, unet_params, vae, vae_params = _tiny_latent_pipe()
    # VAE with 2 blocks downsamples by 2 (one non-final block): 32 -> 16? No:
    # blocks (8,16): one downsample -> /2. latent H = H/2 here (toy), but the
    # pipeline divides by 8 for SD geometry; use 32x32 inputs -> latent 4x4
    # via its own geometry. For the toy VAE we bypass by using 32x32 images
    # and asserting finite output shape.
    pipe = GuidedLatentDiffusionPipeline(
        unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
        text_embed=jnp.zeros((1, 3, 16)),
        spec=SamplerSpec("my_ddim", SMALL_SCHED),
        guidance=FlowGuidance(flow_guidance_weight=0.0, flow_guidance_mode="gradient"),
        normalizer=Normalizer(ssi=True),
    )
    d = str(tmp_path / "lpipe")
    pipe.save_pretrained(d)
    loaded = GuidedLatentDiffusionPipeline.from_pretrained(d)
    assert loaded.unet.cross_attention_dim == 16
    assert loaded.spec.kind == "my_ddim"
    assert loaded.normalizer.ssi is True


def test_latent_guidance_gradient_mode_reduces_loss():
    """The inner Adam loop must pull the decoded depth toward raw_depth."""
    guid = FlowGuidance(flow_guidance_weight=1.0, flow_guidance_mode="gradient",
                        num_opt_steps=25, opt_lr=0.05)
    raw_depth = jnp.full((1, 8, 8, 1), 2.0)

    # "decoder": a fixed linear map from latent to depth; "denormer": identity
    def decoder(z):
        return jnp.mean(z, axis=-1, keepdims=True)

    def denormer(x):
        return x + 1.0

    fn = guid.make_latent_guidance_fn(decoder, denormer, raw_depth)
    z0 = jnp.zeros((1, 8, 8, 4))
    before = float(jnp.mean(jnp.abs(denormer(decoder(z0)) - raw_depth)))
    z1 = fn(z0, jnp.int32(5))
    after = float(jnp.mean(jnp.abs(denormer(decoder(z1)) - raw_depth)))
    assert after < before


def test_pixel_imputation_fn():
    guid = FlowGuidance(flow_guidance_weight=1.0, flow_guidance_mode="imputation")
    raw = jnp.full((1, 4, 4, 1), 0.5)
    mask = jnp.zeros((1, 4, 4, 1), bool).at[0, 0, 0, 0].set(True)
    fn = guid.make_pixel_imputation_fn(raw, mask)
    x0 = jnp.zeros((1, 4, 4, 1))
    out = fn(x0, jnp.int32(3))
    assert float(out[0, 0, 0, 0]) == 0.5
    assert float(out[0, 1, 1, 0]) == 0.0


def test_latent_guidance_rejects_imputation():
    guid = FlowGuidance(flow_guidance_weight=1.0, flow_guidance_mode="imputation")
    with pytest.raises(NotImplementedError):
        guid.make_latent_guidance_fn(lambda z: z, lambda x: x, jnp.ones((1, 2, 2, 1)))


def test_photometric_grad_direction():
    """Gradient should be nonzero when disparity is wrong, ~zero when right."""
    key = jax.random.PRNGKey(0)
    H, W = 16, 32
    # a textured right image; left = right shifted by 3px (disparity 3)
    right = jax.random.uniform(key, (1, H, W, 3))
    right = jax.image.resize(right[:, :, ::2], (1, H, W, 3), "bilinear")  # smooth
    left = jnp.roll(right, 3, axis=2)
    unnorm = lambda nd: nd * 10.0  # normalized disp in [0,1] -> pixels

    g_wrong = photometric_grad(jnp.full((1, H, W), 0.0), left, right, unnorm)
    g_right = photometric_grad(jnp.full((1, H, W), 0.3), left, right, unnorm)
    assert float(jnp.abs(g_wrong).sum()) > 0
    # optimize should reduce the loss
    refined = photometric_optimize(jnp.full((1, H, W), 0.0), left, right, unnorm,
                                   num_iters=10)
    assert refined.shape == (1, H, W)
    assert np.all(np.isfinite(np.asarray(refined)))


def test_half_precision_pipeline_matches_fp32_roughly(tmp_path):
    unet = UNet2D(in_channels=5, out_channels=1,
                  block_out_channels=(16, 32),
                  down_block_types=("DownBlock2D", "AttnDownBlock2D"),
                  up_block_types=("AttnUpBlock2D", "UpBlock2D"),
                  layers_per_block=1, norm_groups=8)
    x = jnp.zeros((1, 16, 16, 5))
    params = jax.jit(unet.init)(jax.random.PRNGKey(0), x, jnp.array([0]))["params"]
    pipe = GuidedDiffusionPipeline(
        unet=unet, unet_params=params,
        spec=SamplerSpec("my_ddpm", SMALL_SCHED),
        guidance=FlowGuidance(flow_guidance_weight=0.0),
        normalizer=Normalizer(ssi=True, safe_ssi=False),
    )
    hp = pipe.half_precision()
    assert jax.tree.leaves(hp.unet_params)[0].dtype == jnp.bfloat16
    rgb = jnp.zeros((1, 16, 16, 3)); raw = jnp.zeros((1, 16, 16, 1))
    kw = dict(num_inference_steps=4, num_intermediate_images=2,
              depth_channels=1, cond_channels="rgb+raw",
              rgb_images=rgb, sim_disp=raw)
    a = pipe(jax.random.PRNGKey(1), **kw).images
    b = hp(jax.random.PRNGKey(1), **kw).images
    # bf16 params change numerics but must stay close on this tiny model
    assert float(jnp.abs(a - b).mean()) < 0.1


def test_ddim_eta_stochastic_path():
    """eta > 0 adds noise but still denoises with the oracle model."""
    tables = SMALL_SCHED.tables()
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (1, 8, 8, 1)) * 0.3
    conds = jnp.zeros((1, 8, 8, 2))

    def model_fn(model_input, t):
        x = model_input[..., :1]
        ab = tables.alphas_cumprod[t]
        return (x - jnp.sqrt(ab) * x0) / jnp.sqrt(1 - ab)

    spec = SamplerSpec(kind="my_ddim", schedule=SMALL_SCHED, eta=1.0)
    final, stack = run_sampler(model_fn, spec, tables,
                               jax.random.normal(jax.random.fold_in(key, 1), x0.shape),
                               conds, key, num_inference_steps=20)
    np.testing.assert_allclose(np.asarray(stack[-1]), np.asarray(x0), atol=0.2)
    assert np.isfinite(np.asarray(final)).all()


def test_pixel_pipeline_with_imputation_guidance():
    """Imputation guidance drags x_hat0 toward the raw disparity where the
    sensor saw something — with a zero model, the output inherits the raw
    values in the masked region."""
    unet = UNet2D(in_channels=5, out_channels=1, block_out_channels=(8, 16),
                  down_block_types=("DownBlock2D", "DownBlock2D"),
                  up_block_types=("UpBlock2D", "UpBlock2D"),
                  layers_per_block=1, norm_groups=4)
    x = jnp.zeros((1, 16, 16, 5))
    params = jax.jit(unet.init)(jax.random.PRNGKey(0), x, jnp.array([0]))["params"]
    # zero out the final conv so the model predicts x0 = 0 everywhere
    params = jax.tree_util.tree_map_with_path(
        lambda path, p: jnp.zeros_like(p) if "conv_out" in str(path) else p, params
    )
    sched = ScheduleConfig(num_train_timesteps=20, prediction_type="sample",
                           clip_sample=True)
    pipe = GuidedDiffusionPipeline(
        unet=unet, unet_params=params,
        spec=SamplerSpec("my_ddpm", sched),
        guidance=FlowGuidance(flow_guidance_weight=1.0,
                              flow_guidance_mode="imputation"),
        normalizer=Normalizer(ssi=True, safe_ssi=False),
    )
    raw = jnp.full((1, 16, 16, 1), 0.7)
    mask = jnp.ones((1, 16, 16, 1), bool)
    out = pipe(jax.random.PRNGKey(1), num_inference_steps=10,
               num_intermediate_images=2, depth_channels=1,
               cond_channels="rgb+raw", rgb_images=jnp.zeros((1, 16, 16, 3)),
               sim_disp=raw, raw_mask=mask)
    # final x_hat0 (perturbed) should equal the imputed raw value
    inter = np.asarray(out.intermediates[-1])
    np.testing.assert_allclose(inter, 0.7, atol=1e-4)


def test_split_programs_matches_monolithic():
    """split_programs=True (three jitted programs: encode / scan / decode)
    must reproduce the monolithic single-program output — it exists so
    latency/streaming deployments can compile where the monolithic batch-1
    program overflows the remote compile helper."""
    from tests.test_calibration import _tiny_latent_pipe

    pipe = _tiny_latent_pipe()
    key = jax.random.PRNGKey(0)
    rgb = jax.random.normal(jax.random.fold_in(key, 1), (1, 32, 32, 3)) * 0.3
    raw = jnp.abs(jax.random.normal(jax.random.fold_in(key, 2), (1, 32, 32, 1))) * 0.3
    kwargs = dict(num_inference_steps=3, num_intermediate_images=2,
                  cond_channels="rgb+raw", rgb_images=rgb, sim_disp=raw)

    mono = pipe(jax.random.PRNGKey(9), **kwargs)
    split = pipe(jax.random.PRNGKey(9), split_programs=True, **kwargs)
    np.testing.assert_allclose(np.asarray(split.images),
                               np.asarray(mono.images), atol=1e-5)
    np.testing.assert_allclose(np.asarray(split.intermediates),
                               np.asarray(mono.intermediates), atol=1e-5)


def test_split_programs_matches_monolithic_with_guidance():
    """The split scan program builds the in-step gradient-guidance closure
    (VAE decode + denormalizer) exactly like the monolithic one."""
    import dataclasses as _dc

    from tests.test_calibration import _tiny_latent_pipe

    pipe = _tiny_latent_pipe()
    pipe = _dc.replace(pipe, guidance=FlowGuidance(
        flow_guidance_weight=1.0, flow_guidance_mode="gradient",
        num_opt_steps=2, opt_lr=0.05))
    key = jax.random.PRNGKey(0)
    rgb = jax.random.normal(jax.random.fold_in(key, 1), (1, 32, 32, 3)) * 0.3
    raw = jnp.abs(jax.random.normal(jax.random.fold_in(key, 2), (1, 32, 32, 1))) * 0.3
    raw_depth = jnp.abs(jax.random.normal(jax.random.fold_in(key, 3),
                                          (1, 32, 32, 1))) + 0.5
    mask = jnp.ones((1, 32, 32, 1), bool)

    def builder(x, rd, m):
        return x  # identity denormalizer, data threaded as traced args

    kwargs = dict(num_inference_steps=3, num_intermediate_images=1,
                  cond_channels="rgb+raw", rgb_images=rgb, sim_disp=raw,
                  raw_depth=raw_depth, denorm_builder=builder,
                  denorm_mask=mask)
    mono = pipe(jax.random.PRNGKey(9), **kwargs)
    split = pipe(jax.random.PRNGKey(9), split_programs=True, **kwargs)
    np.testing.assert_allclose(np.asarray(split.images),
                               np.asarray(mono.images), atol=1e-5)


def test_scan_chunk_matches_monolithic():
    """scan_chunk=c runs the denoise as ceil(S/c) calls of one compiled
    chunk program (timesteps traced); the carried (x, key) makes the step
    and PRNG sequence — and the result — identical to the monolithic scan,
    including a tail chunk when c does not divide S."""
    from tests.test_calibration import _tiny_latent_pipe

    pipe = _tiny_latent_pipe()
    key = jax.random.PRNGKey(0)
    rgb = jax.random.normal(jax.random.fold_in(key, 1), (1, 32, 32, 3)) * 0.3
    raw = jnp.abs(jax.random.normal(jax.random.fold_in(key, 2), (1, 32, 32, 1))) * 0.3
    kwargs = dict(num_inference_steps=5, num_intermediate_images=2,
                  cond_channels="rgb+raw", rgb_images=rgb, sim_disp=raw)

    mono = pipe(jax.random.PRNGKey(9), **kwargs)
    for c in (1, 2, 5):
        chunked = pipe(jax.random.PRNGKey(9), scan_chunk=c, **kwargs)
        np.testing.assert_allclose(np.asarray(chunked.images),
                                   np.asarray(mono.images), atol=1e-5,
                                   err_msg=f"scan_chunk={c}")
        np.testing.assert_allclose(np.asarray(chunked.intermediates),
                                   np.asarray(mono.intermediates), atol=1e-5,
                                   err_msg=f"scan_chunk={c}")


def test_scan_chunk_with_guidance_matches_monolithic():
    import dataclasses as _dc

    from tests.test_calibration import _tiny_latent_pipe

    pipe = _tiny_latent_pipe()
    pipe = _dc.replace(pipe, guidance=FlowGuidance(
        flow_guidance_weight=1.0, flow_guidance_mode="gradient",
        num_opt_steps=2, opt_lr=0.05))
    key = jax.random.PRNGKey(0)
    rgb = jax.random.normal(jax.random.fold_in(key, 1), (1, 32, 32, 3)) * 0.3
    raw = jnp.abs(jax.random.normal(jax.random.fold_in(key, 2), (1, 32, 32, 1))) * 0.3
    raw_depth = jnp.abs(jax.random.normal(jax.random.fold_in(key, 3),
                                          (1, 32, 32, 1))) + 0.5
    mask = jnp.ones((1, 32, 32, 1), bool)
    builder = lambda x, rd, m: x
    kwargs = dict(num_inference_steps=3, num_intermediate_images=1,
                  cond_channels="rgb+raw", rgb_images=rgb, sim_disp=raw,
                  raw_depth=raw_depth, denorm_builder=builder,
                  denorm_mask=mask)
    mono = pipe(jax.random.PRNGKey(9), **kwargs)
    chunked = pipe(jax.random.PRNGKey(9), scan_chunk=2, **kwargs)
    np.testing.assert_allclose(np.asarray(chunked.images),
                               np.asarray(mono.images), atol=1e-5)
