"""Whole-row Pallas attention kernel vs the XLA reference.

Shapes mirror the flagship UNet's transformer levels at the 640x360
release setting (reference inference.py:267-271): 45x80=3600 tokens /
5 heads (level 0), 23x40=920 / 10 (level 1), 12x20=240 / 20 (level 2),
plus the 77-token cross-attention context.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3roma_tpu.ops.pallas.attention import mha_attention, mha_supported


def _ref_attention(q, k, v):
    return jax.nn.dot_product_attention(q, k, v)


def _rand_qkv(key, b, n, m, h, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, n, h, d), dtype)
    k = jax.random.normal(kk, (b, m, h, d), dtype)
    v = jax.random.normal(kv, (b, m, h, d), dtype)
    return q, k, v


@pytest.mark.parametrize(
    "b,n,h,d",
    [(2, 3600, 5, 64), (2, 920, 10, 64), (2, 240, 4, 64), (1, 64, 2, 64)],
)
def test_self_attention_matches_xla(b, n, h, d):
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), b, n, n, h, d)
    out = mha_attention(q, k, v, interpret=True)
    ref = _ref_attention(q, k, v)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_cross_attention_context77():
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), 2, 920, 77, 8, 64)
    out = mha_attention(q, k, v, interpret=True)
    ref = _ref_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_bf16_inputs():
    q, k, v = _rand_qkv(jax.random.PRNGKey(2), 1, 920, 920, 5, 64,
                        jnp.bfloat16)
    out = mha_attention(q, k, v, interpret=True)
    ref = _ref_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                         v.astype(jnp.float32))
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_int8_close_to_float():
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), 2, 920, 920, 5, 64)
    out = mha_attention(q, k, v, quant="int8", interpret=True)
    ref = _ref_attention(q, k, v)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    # int8 Q/K perturbs the softmax weights; bound the output error
    # relative to the value magnitude
    assert err.mean() < 0.02
    assert err.max() < 0.15


def test_sm_scale_override():
    q, k, v = _rand_qkv(jax.random.PRNGKey(4), 1, 240, 240, 2, 64)
    out = mha_attention(q, k, v, sm_scale=0.05, interpret=True)
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k) * 0.05
    p = jax.nn.softmax(s, axis=-1)
    ref = jnp.einsum("bhnm,bmhd->bnhd", p, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_supported_gate():
    assert mha_supported(3600, 64)
    assert mha_supported(77, 64)
    assert not mha_supported(100_000, 64)
    assert not mha_supported(512, 256)


def test_wide_head_int8_vae_shape():
    # the VAE mid-attention: single 512-dim head over 45x80 tokens
    # (models/vae.py mid_attn; reference AttnBlock via diffusers)
    q, k, v = _rand_qkv(jax.random.PRNGKey(5), 1, 640, 640, 1, 512)
    q, k, v = q * 0.1, k * 0.1, v * 0.1
    out = mha_attention(q, k, v, quant="int8", interpret=True)
    ref = _ref_attention(q, k, v)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    assert err.mean() < 0.02
    assert err.max() < 0.15


def test_supported_gate_wide_head():
    # wide heads admitted only on the int8 path (itemsize=1) and only
    # while the K/V slab stays inside the VMEM budget
    assert not mha_supported(3600, 512)              # bf16: measured OOM
    assert mha_supported(3600, 512, itemsize=1)      # VAE mid-attention
    assert mha_supported(512, 256, itemsize=1)
    assert not mha_supported(3600, 1024, itemsize=1)
    assert not mha_supported(6000, 512, itemsize=1)  # slab over budget
