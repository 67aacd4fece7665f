"""Winograd F(2x2,3x3) conv: exactness vs lax.conv_general_dilated.

The transforms are exact in f32, so with an f32 GEMM the result must
match the direct conv to float tolerance; bf16-GEMM error must stay
comparable to a direct bf16 conv's.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax import lax

from d3roma_tpu.ops.winograd import (
    wino_conv_general_dilated,
    winograd_conv3x3,
    winograd_supported,
)


def _direct(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("shape", [
    (2, 8, 8, 4, 6),      # even H/W
    (1, 45, 80, 8, 8),    # the flagship latent grid (odd H)
    (2, 7, 9, 3, 5),      # odd H and W
    (1, 2, 2, 2, 2),      # single tile
])
def test_winograd_matches_direct_f32(shape):
    B, H, W, C, O = shape
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (B, H, W, C), jnp.float32)
    w = jax.random.normal(kw, (3, 3, C, O), jnp.float32) / 3.0
    ref = _direct(x, w)
    got = winograd_conv3x3(x, w, gemm_dtype=jnp.float32)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_winograd_bf16_error_comparable_to_direct_bf16():
    kx, kw = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (2, 16, 20, 16), jnp.float32)
    w = jax.random.normal(kw, (3, 3, 16, 16), jnp.float32) / 3.0
    exact = np.asarray(_direct(x, w))
    direct_bf16 = np.asarray(
        _direct(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16))
    ).astype(np.float32)
    wino_bf16 = np.asarray(
        winograd_conv3x3(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16))
    ).astype(np.float32)
    err_direct = np.abs(direct_bf16 - exact).mean()
    err_wino = np.abs(wino_bf16 - exact).mean()
    # transform range growth costs ~2 bits -> allow 4x the direct error
    assert err_wino < 4 * err_direct + 1e-6


def test_dispatcher_gates():
    assert winograd_supported((1, 8, 8, 4), (3, 3, 4, 4), (1, 1), "SAME")
    assert winograd_supported((1, 8, 8, 4), (3, 3, 4, 4), (1, 1),
                              ((1, 1), (1, 1)))
    assert not winograd_supported((1, 8, 8, 4), (3, 3, 4, 4), (2, 2), "SAME")
    assert not winograd_supported((1, 8, 8, 4), (1, 1, 4, 4), (1, 1), "SAME")
    assert not winograd_supported((1, 8, 8, 4), (3, 3, 4, 4), (1, 1), "VALID")


def test_dispatcher_fallback_matches_direct():
    """Non-eligible convs (stride 2) route to the exact XLA conv."""
    kx, kw = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(kx, (1, 8, 8, 4), jnp.float32)
    w = jax.random.normal(kw, (3, 3, 4, 6), jnp.float32)
    ref = lax.conv_general_dilated(
        x, w, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = wino_conv_general_dilated(
        x, w, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)


def test_unet_wino_mode_close_to_bf16():
    """quant='wino' routes every eligible UNet conv through Winograd and
    stays close to the plain bf16 forward."""
    from d3roma_tpu.models import UNet2DCondition

    kw = dict(in_channels=8, out_channels=4,
              block_out_channels=(32, 64, 64, 64),
              attention_head_dim=8, cross_attention_dim=32, norm_groups=8,
              dtype=jnp.bfloat16)
    unet = UNet2DCondition(**kw)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(4), (1, 7, 32))
    params = jax.jit(unet.init)(jax.random.PRNGKey(0), x,
                                jnp.array([0]), ctx)["params"]
    ref = unet.apply({"params": params}, x, jnp.array([0]), ctx)
    wino = UNet2DCondition(**{**kw, "quant": "wino"}).apply(
        {"params": params}, x, jnp.array([0]), ctx)
    assert jnp.abs(wino.astype(jnp.float32) - ref.astype(jnp.float32)).mean() \
        < 0.05 * (jnp.abs(ref.astype(jnp.float32)).mean() + 1e-6)


@pytest.mark.parametrize("shape", [
    (1, 16, 16, 8, 8),
    (2, 13, 17, 8, 16),   # odd H/W, O > C
    (1, 45, 80, 16, 8),   # flagship latent grid
])
def test_fused_kernel_matches_direct(shape):
    """The Pallas fused Winograd kernel (interpret mode) reproduces the
    direct conv to bf16-GEMM tolerance."""
    from d3roma_tpu.ops.pallas.winograd_fused import conv3x3_wino_fused

    B, H, W, C, O = shape
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (B, H, W, C), jnp.float32)
    w = jax.random.normal(kw, (3, 3, C, O), jnp.float32) / 3.0
    ref = np.asarray(_direct(x, w))
    got = np.asarray(conv3x3_wino_fused(x, w, block_tr=2, interpret=True))
    assert got.shape == ref.shape
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.02


def test_fused_block_tr_selection():
    from d3roma_tpu.ops.pallas.winograd_fused import (
        pick_block_tr,
        wino_fused_supported,
    )

    # flagship latent site: biggest block fits
    assert pick_block_tr((16, 45, 80, 320), (3, 3, 320, 320)) == 8
    # full-res VAE site: wide rows -> only tr=2 fits the VMEM cap
    assert pick_block_tr((16, 360, 640, 128), (3, 3, 128, 128)) == 2
    # th=12: tr=8 pads 12->16 (33% waste), tr=4 is exact
    assert pick_block_tr((16, 23, 40, 640), (3, 3, 640, 640)) == 4
    # wide-C site: VMEM cap forces tr=4 (tr=8 measured-fails Mosaic)
    assert pick_block_tr((16, 45, 80, 640), (3, 3, 640, 320)) == 4
    assert wino_fused_supported((16, 45, 80, 320), (3, 3, 320, 320),
                                (1, 1), "SAME")
    assert not wino_fused_supported((16, 45, 80, 320), (3, 3, 320, 320),
                                    (2, 2), "SAME")


def test_wino_static_pipeline_end_metric_gate():
    """End-metric gate for the wino_static mode: the full latent pipeline
    with Winograd convs + calibrated static-int8 denses stays close to
    the bf16 output, and calibrate() keeps wino_static's (dense-only)
    scale sequence."""
    import dataclasses as _dc

    from tests.test_calibration import _tiny_latent_pipe

    pipe = _tiny_latent_pipe()
    key = jax.random.PRNGKey(0)
    rgb = jax.random.normal(jax.random.fold_in(key, 1), (1, 32, 32, 3)) * 0.3
    raw = jnp.abs(jax.random.normal(jax.random.fold_in(key, 2),
                                    (1, 32, 32, 1))) * 0.3
    kwargs = dict(num_inference_steps=3, num_intermediate_images=1,
                  cond_channels="rgb+raw", rgb_images=rgb, sim_disp=raw)

    out_f = np.asarray(pipe(jax.random.PRNGKey(9), **kwargs).images)

    wino = _dc.replace(
        pipe, unet=_dc.replace(pipe.unet, quant="wino_static"),
        vae=_dc.replace(pipe.vae, quant="wino_static"))
    cal = wino.calibrate(
        jax.random.PRNGKey(3), [dict(rgb_images=rgb, sim_disp=raw)],
        cond_channels="rgb+raw", num_inference_steps=3)
    out_w = np.asarray(cal(jax.random.PRNGKey(9), **kwargs).images)

    scale = np.abs(out_f).mean()
    assert np.abs(out_w - out_f).mean() < 0.05 * max(scale, 0.1)

    # pure-wino (bf16 denses) must be tighter still
    wino_bf = _dc.replace(
        pipe, unet=_dc.replace(pipe.unet, quant="wino"),
        vae=_dc.replace(pipe.vae, quant="wino"))
    out_wb = np.asarray(wino_bf(jax.random.PRNGKey(9), **kwargs).images)
    assert np.abs(out_wb - out_f).mean() < 0.02 * max(scale, 0.1)


def test_fused_kernel_multi_o_block():
    """O > o_block exercises the V-cache-across-o-blocks path and the
    o-block-major (v, o) lane un-interleave."""
    from d3roma_tpu.ops.pallas.winograd_fused import conv3x3_wino_fused

    kx, kw = jax.random.split(jax.random.PRNGKey(5))
    x = jax.random.normal(kx, (1, 10, 12, 8), jnp.float32)
    w = jax.random.normal(kw, (3, 3, 8, 160), jnp.float32) / 3.0
    ref = np.asarray(_direct(x, w))
    got = np.asarray(conv3x3_wino_fused(x, w, block_tr=2, o_block=128,
                                        interpret=True))
    assert got.shape == ref.shape
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.02
