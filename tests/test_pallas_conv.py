"""Pallas implicit-GEMM conv3x3 kernel (ops/pallas/conv2d.py) vs lax.conv.

Runs in interpreter mode so the suite stays hardware-independent; the TPU
performance claims live in docs/PERFORMANCE.md.
"""

import jax
import jax.numpy as jnp
import pytest

from d3roma_tpu.ops.pallas.conv2d import conv3x3_flat, conv3x3_supported
from d3roma_tpu.ops.quant import int8_conv_general_dilated_static, int8_conv_mxu


def _ref_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@pytest.mark.parametrize(
    "shape",
    [(2, 8, 10, 128, 128), (1, 5, 7, 64, 192), (2, 6, 6, 32, 96)],
)
def test_bf16_path_matches_lax_conv(shape):
    b, h, w, cin, cout = shape
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (b, h, w, cin), jnp.float32)
    wt = jax.random.normal(k2, (3, 3, cin, cout), jnp.float32) * 0.05
    got = conv3x3_flat(x, wt, interpret=True)
    ref = _ref_conv(x, wt)
    assert jnp.max(jnp.abs(got - ref)) < 1e-4


def test_int8_path_matches_xla_static_int8():
    """The kernel's quantize/dequantize must agree with the XLA static-int8
    conv (ops/quant.py) — both use STATIC_ACT_SCALE activations and
    per-output-channel weight scales."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(k1, (2, 9, 11, 64), jnp.float32)
    wt = jax.random.normal(k2, (3, 3, 64, 128), jnp.float32) * 0.05
    got = conv3x3_flat(x, wt, quant="static", interpret=True)
    ref = int8_conv_general_dilated_static(
        x, wt, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    assert jnp.max(jnp.abs(got - ref)) < 1e-5
    # and stays close to the float conv (8-bit rounding only)
    fref = _ref_conv(x, wt)
    scale = float(jnp.max(jnp.abs(fref)))
    assert float(jnp.max(jnp.abs(got - fref))) < 0.05 * scale


def test_supported_gate():
    # UNet latent frames fit; full-resolution VAE frames do not
    assert conv3x3_supported(
        (16, 45, 80, 320), (3, 3, 320, 320), (1, 1), ((1, 1), (1, 1)), jnp.bfloat16
    )
    assert not conv3x3_supported(
        (16, 360, 640, 128), (3, 3, 128, 128), (1, 1), "SAME", jnp.bfloat16
    )
    # wrong kernel size / stride / padding
    assert not conv3x3_supported(
        (16, 45, 80, 320), (1, 1, 320, 320), (1, 1), "SAME", jnp.bfloat16
    )
    assert not conv3x3_supported(
        (16, 45, 80, 320), (3, 3, 320, 320), (2, 2), "SAME", jnp.bfloat16
    )
    assert not conv3x3_supported(
        (16, 45, 80, 320), (3, 3, 320, 320), (1, 1), ((0, 1), (1, 1)), jnp.bfloat16
    )


def test_int8_conv_mxu_fallback_matches_static():
    """The flax-hook dispatcher must agree with the XLA static path on both
    branches (kernel-eligible and fallback)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    # stride-2 conv -> fallback branch
    x = jax.random.normal(k1, (1, 8, 8, 32), jnp.float32)
    wt = jax.random.normal(k2, (3, 3, 32, 64), jnp.float32) * 0.1
    got = int8_conv_mxu(x, wt, (2, 2), ((1, 1), (1, 1)),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = int8_conv_general_dilated_static(
        x, wt, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert jnp.max(jnp.abs(got - ref)) < 1e-6


def test_rowtap_matches_reference():
    """dx-folded row-tap variant (int8): aligned dy taps, ~1% quant noise."""
    import jax
    import numpy as np

    from d3roma_tpu.ops.pallas.conv2d import (
        conv3x3_rowtap,
        conv3x3_rowtap_supported,
    )

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 12, 20, 32))
    w = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 32, 64)) * 0.1
    y = conv3x3_rowtap(x, w, act_scale=4.0 / 127.0, interpret=True)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    err = np.abs(np.asarray(y) - np.asarray(ref))
    assert err.mean() / np.abs(np.asarray(ref)).mean() < 0.03
    assert conv3x3_rowtap_supported((16, 45, 80, 320), (3, 3, 320, 320),
                                    (1, 1), "SAME")
    assert not conv3x3_rowtap_supported((16, 360, 640, 128), (3, 3, 128, 128),
                                        (1, 1), "SAME")
