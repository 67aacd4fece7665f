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


@pytest.mark.full  # compile-heavy tier (README)
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
    assert pick_block_tr((16, 45, 80, 320)) == 8
    # full-res VAE site: only tr=2 would fit the VMEM cap, but tr=2's
    # DMA row offsets (multiples of 4) are sub-sublane-tile and FAULT on
    # device — rejected; in wino_static the site runs static int8 instead
    assert pick_block_tr((16, 360, 640, 128)) is None
    # th=12: tr=8 pads 12->16 (33% waste), tr=4 is exact
    assert pick_block_tr((16, 23, 40, 640)) == 4
    # wide-C site: VMEM cap forces tr=4 (tr=8 measured-fails Mosaic)
    assert pick_block_tr((16, 45, 80, 640)) == 4
    assert wino_fused_supported((16, 45, 80, 320), (3, 3, 320, 320),
                                (1, 1), "SAME")
    assert not wino_fused_supported((16, 45, 80, 320), (3, 3, 320, 320),
                                    (2, 2), "SAME")


@pytest.mark.full  # compile-heavy tier (README)
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

    # o_block=64 (the wide-C config: half-lane (v,o) packs) must
    # un-interleave identically
    got64 = np.asarray(conv3x3_wino_fused(x, w, block_tr=2, o_block=64,
                                          interpret=True))
    rel64 = np.abs(got64 - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel64 < 0.02


def test_wino_mode_actually_routes(monkeypatch):
    """Regression (review finding): flax passes a NUMERIC
    ConvDimensionNumbers, not ("NHWC","HWIO","NHWC") — the dispatcher
    must still route eligible convs to Winograd. Spy on winograd_conv3x3
    through a real nn.Conv call."""
    import flax.linen as nn

    import d3roma_tpu.ops.winograd as wg

    calls = {"n": 0}
    real = wg.winograd_conv3x3

    def spy(x, w, **kw):
        calls["n"] += 1
        return real(x, w, **kw)

    monkeypatch.setattr(wg, "winograd_conv3x3", spy)
    conv = nn.Conv(8, (3, 3), padding=1,
                   conv_general_dilated=wg.wino_conv_general_dilated)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    params = conv.init(jax.random.PRNGKey(1), x)
    calls["n"] = 0
    conv.apply(params, x)
    assert calls["n"] == 1, "flax Conv did not route through Winograd"

    # stride-2 flax conv must NOT route
    calls["n"] = 0
    conv2 = nn.Conv(8, (3, 3), strides=(2, 2), padding=1,
                    conv_general_dilated=wg.wino_conv_general_dilated)
    params2 = conv2.init(jax.random.PRNGKey(1), x)
    conv2.apply(params2, x)
    assert calls["n"] == 0


def test_wino_batch_chunking(monkeypatch):
    """Big slabs route through the serialized batch-chunked Winograd when
    D3ROMA_WINO_CHUNK=1 (and stay on the fallback when it's off)."""
    import d3roma_tpu.ops.winograd as wg

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 10, 12, 4),
                          jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 4, 6),
                          jnp.float32) * 0.2
    # force chunking: V+M liveness is 10*12*(8*128+16*128)/2^20 =
    # 0.35 MB per image, so a 0.4 MB cap admits exactly bc=1
    monkeypatch.setenv("D3ROMA_WINO_SLAB_MB", "0.4")
    monkeypatch.setenv("D3ROMA_WINO_CHUNK", "1")
    bc = wg._wino_eligible(x, w, (1, 1), "SAME", None, None,
                             ("NHWC", "HWIO", "NHWC"), 1, 1)
    assert bc == 1  # largest divisor of 4 whose slab fits

    calls = {"n": 0}
    real = wg.winograd_conv3x3

    def spy(xc, wc, **kw):
        calls["n"] += 1
        assert xc.shape[0] == 1
        return real(xc, wc, **kw)

    monkeypatch.setattr(wg, "winograd_conv3x3", spy)
    got = wg.wino_conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # lax.map traces the body once
    assert calls["n"] == 1
    ref = _direct(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)

    # chunking off -> ineligible -> exact fallback, no winograd call
    monkeypatch.setenv("D3ROMA_WINO_CHUNK", "0")
    assert wg._wino_eligible(
        x, w, (1, 1), "SAME", None, None,
        ("NHWC", "HWIO", "NHWC"), 1, 1) is None
    calls["n"] = 0
    got2 = wg.wino_conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert calls["n"] == 0
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_flagship_routing_table(monkeypatch):
    """Pins the wino_static routing policy at the flagship conv sites
    (round-3 measured policy: fused Winograd ONLY where pick_config
    admits the shape — 12.30 fps e2e came from these sites — static
    int8 everywhere else; the XLA Winograd fallback measured 6.09 fps
    e2e and must never be routed). Also pins the tr=2 exclusion: the
    (16,90,160,512) decoder site faulted on device at tr=2."""
    monkeypatch.setenv("D3ROMA_WINO_CHUNK", "0")
    monkeypatch.delenv("D3ROMA_WINO_SLAB_MB", raising=False)
    from d3roma_tpu.ops.pallas.winograd_fused import pick_config
    from d3roma_tpu.ops.winograd import _wino_eligible

    class A:
        def __init__(self, sh):
            self.shape = sh

    dn = ("NHWC", "HWIO", "NHWC")

    def route(B, H, W, C, O, s=1):
        bc = _wino_eligible(A((B, H, W, C)), A((3, 3, C, O)), (s, s),
                            "SAME", None, None, dn, 1, 1)
        if bc is None:
            return "static"
        return "fused" if pick_config((bc, H, W, C)) else "static"

    # UNet latent sites -> fused
    assert route(16, 45, 80, 320, 320) == "fused"
    assert route(16, 45, 80, 320, 640) == "fused"
    assert route(16, 23, 40, 640, 640) == "fused"
    # strides, concat widths, bottom level -> static (not XLA wino)
    assert route(16, 45, 80, 320, 320, s=2) == "static"
    assert route(16, 45, 80, 960, 320) == "static"
    assert route(16, 12, 20, 1280, 1280) == "static"
    # VAE: deep 45x80 sites fused (incl. the stacked-encode batch 32);
    # the tr=2 fault site and the full-res slabs -> static
    assert route(32, 45, 80, 512, 512) == "fused"
    assert route(16, 45, 80, 512, 512) == "fused"
    assert route(16, 90, 160, 512, 512) == "static"
    assert route(16, 360, 640, 128, 128) == "static"
