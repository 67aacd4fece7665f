"""Halo-DMA implicit-GEMM conv vs lax.conv_general_dilated (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3roma_tpu.ops.pallas.conv2d_halo import conv3x3_halo, halo_conv_supported


def _ref_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("b,h,w,cin,cout", [
    (2, 6, 10, 128, 128),
    (1, 9, 12, 128, 256),
])
def test_halo_conv_bf16_matches_xla(b, h, w, cin, cout):
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (b, h, w, cin), jnp.float32)
    wgt = jax.random.normal(jax.random.fold_in(k, 1), (3, 3, cin, cout)) * 0.05
    out = conv3x3_halo(x, wgt, quant=None, block_m=128, interpret=True)
    ref = _ref_conv(x, wgt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_halo_conv_int8_close_to_float():
    k = jax.random.PRNGKey(2)
    x = jnp.clip(jax.random.normal(k, (2, 6, 10, 128)), -4, 4)
    wgt = jax.random.normal(jax.random.fold_in(k, 1), (3, 3, 128, 128)) * 0.05
    out = conv3x3_halo(x, wgt, quant="static", act_scale=4.0 / 127.0,
                       block_m=128, interpret=True)
    ref = _ref_conv(x, wgt)
    err = np.abs(np.asarray(out) - np.asarray(ref)).mean()
    assert err < 0.05 * max(float(jnp.abs(ref).mean()), 0.1)


def test_supported_gate():
    assert halo_conv_supported((16, 45, 80, 320), (3, 3, 320, 640),
                               (1, 1), "SAME")
    assert halo_conv_supported((16, 45, 80, 640), (3, 3, 640, 640),
                               (1, 1), "SAME")
    # 1280-channel weights alone exceed the VMEM budget
    assert not halo_conv_supported((16, 12, 20, 1280), (3, 3, 1280, 1280),
                                   (1, 1), "SAME")
    assert not halo_conv_supported((16, 45, 80, 320), (3, 3, 320, 640),
                                   (2, 2), "SAME")  # strided
    assert not halo_conv_supported((16, 45, 80, 321), (3, 3, 321, 640),
                                   (1, 1), "SAME")  # unaligned channels


def test_quant_mode_halo_dispatch(monkeypatch):
    """quant='halo' routes eligible convs through the halo kernel (interpret
    on CPU via direct call) and falls back to XLA static int8 elsewhere."""
    import jax

    from d3roma_tpu.ops import quant as Q

    calls = []
    real = Q.int8_conv_general_dilated_static

    def spy_static(*a, **k):
        calls.append("xla")
        return real(*a, **k)

    import d3roma_tpu.ops.pallas.conv2d_halo as CH0

    real_halo = CH0.conv3x3_halo

    def spy_halo(x, w, **k):
        calls.append("halo")
        return real_halo(x, w, interpret=True, block_m=128, **k)

    monkeypatch.setattr(Q, "int8_conv_general_dilated_static", spy_static)
    import d3roma_tpu.ops.pallas.conv2d_halo as CH

    monkeypatch.setattr(CH, "conv3x3_halo", spy_halo)

    x = jnp.zeros((1, 8, 8, 128))
    w3 = jnp.zeros((3, 3, 128, 128))
    w1 = jnp.zeros((1, 1, 128, 128))
    Q.int8_conv_halo(x, w3, (1, 1), "SAME",
                     dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert calls[-1] == "halo"
    Q.int8_conv_halo(x, w1, (1, 1), "SAME",
                     dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert calls[-1] == "xla"  # 1x1 -> fallback
