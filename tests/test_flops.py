"""Analytic FLOPs accounting vs XLA's own HLO cost analysis.

The MFU numbers bench.py reports are only as good as the estimator; this
pins it against the compiler's count on small models (pure XLA paths, so
cost analysis sees every contraction)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3roma_tpu.models import AutoencoderKL, UNet2DCondition
from d3roma_tpu.utils.flops import (
    latent_pipeline_flops_per_frame,
    unet2d_condition_flops,
    vae_decoder_flops,
    vae_encoder_flops,
)


def _xla_flops(jitted, *args):
    c = jitted.lower(*args).compile().cost_analysis()
    d = c[0] if isinstance(c, (list, tuple)) else c
    return float(d["flops"])


def test_unet_flops_matches_xla():
    unet = UNet2DCondition(
        in_channels=8, out_channels=4, block_out_channels=(32, 64),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=2, attention_head_dim=8, cross_attention_dim=16,
        norm_groups=8,
    )
    x = jnp.zeros((1, 16, 24, 8))
    ctx = jnp.zeros((1, 5, 16))
    t = jnp.zeros((1,), jnp.int32)
    params = jax.jit(unet.init)(jax.random.PRNGKey(0), x, t, ctx)["params"]
    f = jax.jit(lambda p, x, t, c: unet.apply({"params": p}, x, t, c))
    xla = _xla_flops(f, params, x, t, ctx)
    est = unet2d_condition_flops(
        16, 24, in_channels=8, out_channels=4, block_out_channels=(32, 64),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=2, attention_head_dim=8, cross_attention_dim=16,
        ctx_len=5,
    )
    # XLA additionally counts elementwise/norm flops the MFU convention
    # excludes: the analytic count must land within ~12% below it
    assert est <= xla
    assert abs(est - xla) / xla < 0.12


def test_vae_flops_matches_xla():
    vae = AutoencoderKL(block_out_channels=(16, 32), latent_channels=4,
                        norm_groups=4)
    img = jnp.zeros((1, 32, 32, 3))
    params = jax.jit(vae.init)(jax.random.PRNGKey(0), img)["params"]

    enc = jax.jit(lambda p, x: vae.apply({"params": p}, x, method="encode").mode())
    xla_enc = _xla_flops(enc, params, img)
    est_enc = vae_encoder_flops(32, 32, block_out_channels=(16, 32))
    assert abs(est_enc - xla_enc) / xla_enc < 0.12

    z = jnp.zeros((1, 16, 16, 4))
    dec = jax.jit(lambda p, z: vae.apply({"params": p}, z, method="decode"))
    xla_dec = _xla_flops(dec, params, z)
    est_dec = vae_decoder_flops(16, 16, block_out_channels=(16, 32))
    assert abs(est_dec - xla_dec) / xla_dec < 0.12


def test_shallow_unet_flops_matches_xla():
    """The DeepCache shallow-pass estimator must track XLA's count of the
    actual cached_trunk program (same MFU convention as the full pass)."""
    from d3roma_tpu.utils.flops import unet2d_condition_shallow_flops

    geom = dict(in_channels=8, out_channels=4, block_out_channels=(32, 64),
                down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
                up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
                layers_per_block=2, attention_head_dim=8,
                cross_attention_dim=16)
    unet = UNet2DCondition(norm_groups=8, **geom)
    x = jnp.zeros((1, 16, 24, 8))
    ctx = jnp.zeros((1, 5, 16))
    t = jnp.zeros((1,), jnp.int32)
    params = jax.jit(unet.init)(jax.random.PRNGKey(0), x, t, ctx)["params"]
    # trunk channels = the penultimate up block's width (rev[0] = 64 here)
    trunk = jnp.zeros((1, 16, 24, 64))
    f = jax.jit(lambda p, x, t, c, tr: unet.apply(
        {"params": p}, x, t, c, cached_trunk=tr))
    xla = _xla_flops(f, params, x, t, ctx, trunk)
    est = unet2d_condition_shallow_flops(16, 24, ctx_len=5, **geom)
    assert est <= xla
    assert abs(est - xla) / xla < 0.12


def test_deepcache_pipeline_flops_pattern():
    """cache_interval=k counts groups of 1 full + (k-1) shallow passes,
    remainder full — between the all-shallow and all-full bounds and
    consistent with the hand-computed pattern."""
    full = latent_pipeline_flops_per_frame(360, 640, steps=10)
    dc = latent_pipeline_flops_per_frame(360, 640, steps=10,
                                         cache_interval=2)
    shallow = dc["unet_shallow_per_step"]
    unet = dc["unet_per_step"]
    assert 0 < shallow < unet
    expect = (5 * unet + 5 * shallow
              + 2 * dc["vae_encode"] + dc["vae_decode"])
    assert dc["total"] == expect
    assert dc["total"] < full["total"]
    # remainder: 10 steps at k=3 -> 3 groups (3 full + 6 shallow) + 1 full
    dc3 = latent_pipeline_flops_per_frame(360, 640, steps=10,
                                          cache_interval=3)
    expect3 = (4 * unet + 6 * shallow
               + 2 * dc3["vae_encode"] + dc3["vae_decode"])
    assert dc3["total"] == expect3


def test_flagship_pipeline_flops_magnitude():
    """SD2.1-geometry sanity: the flagship UNet forward at 45x80 latent is
    in the hundreds-of-GFLOPs range per sample, and the 10-step frame
    total is dominated by the UNet."""
    r = latent_pipeline_flops_per_frame(360, 640, steps=10)
    assert 2e11 < r["unet_per_step"] < 2e12
    assert r["total"] > 10 * r["unet_per_step"]
    assert r["vae_decode"] > r["unet_per_step"] * 0.2  # full-res convs are real
