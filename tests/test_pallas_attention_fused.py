"""Fully-fused self-attention kernel (QKV + attention + out-proj) vs the
reference einsum composition, at the flagship UNet's level shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3roma_tpu.ops.pallas.attention_fused import (
    fused_attention_supported,
    fused_self_attention,
)


def _ref(x, wq, wk, wv, wo, bo, heads):
    b, n, c = x.shape
    d = c // heads
    q = (x @ wq).reshape(b, n, heads, d)
    k = (x @ wk).reshape(b, n, heads, d)
    v = (x @ wv).reshape(b, n, heads, d)
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k) / np.sqrt(d)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhnm,bmhd->bnhd", p, v).reshape(b, n, c)
    return o @ wo + bo


def _inputs(key, b, n, c):
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (b, n, c))
    wq = jax.random.normal(ks[1], (c, c)) / np.sqrt(c)
    wk = jax.random.normal(ks[2], (c, c)) / np.sqrt(c)
    wv = jax.random.normal(ks[3], (c, c)) / np.sqrt(c)
    wo = jax.random.normal(ks[4], (c, c)) / np.sqrt(c)
    bo = jnp.linspace(-0.2, 0.2, c)
    return x, wq, wk, wv, wo, bo


@pytest.mark.parametrize("b,n,c,heads", [(1, 920, 320, 5), (2, 240, 256, 4)])
def test_fused_matches_reference(b, n, c, heads):
    x, wq, wk, wv, wo, bo = _inputs(jax.random.PRNGKey(0), b, n, c)
    out = fused_self_attention(x, wq, wk, wv, wo, bo, heads=heads,
                               interpret=True)
    ref = _ref(x, wq, wk, wv, wo, bo, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=5e-4)


def test_fused_int8_close_to_float():
    x, wq, wk, wv, wo, bo = _inputs(jax.random.PRNGKey(1), 1, 384, 320)
    x = jnp.clip(x, -4.0, 4.0)
    out = fused_self_attention(x, wq, wk, wv, wo, bo, heads=5,
                               quant="static", act_scale=4.0 / 127.0,
                               interpret=True)
    ref = _ref(x, wq, wk, wv, wo, bo, 5)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).mean()
    assert err.mean() < 0.05 * max(scale, 0.1)


def test_supported_gate():
    # int8 path (itemsize 1, the default): flagship shapes all admitted
    assert fused_attention_supported(3600, 320, 64)
    assert fused_attention_supported(920, 640, 64)
    assert fused_attention_supported(240, 1280, 64)
    assert not fused_attention_supported(100_000, 320, 64)
    assert not fused_attention_supported(3600, 320, 32)
    # bf16 path (itemsize 2) doubles x/K/V/weight blocks: the N=3600
    # C=320 shape overflows VMEM (~12 MB actual) and must be rejected
    # even though the int8 gate admits it (ADVICE r2)
    assert not fused_attention_supported(3600, 320, 64, itemsize=2)
    assert fused_attention_supported(920, 640, 64, itemsize=2)
    assert not fused_attention_supported(240, 1280, 64, itemsize=2)


def test_module_fused_param_tree_and_output():
    """CrossAttention(use_flash="fused") must keep the exact param tree of
    the unfused module and compute the same function (interpret mode)."""
    import jax.numpy as jnp

    from d3roma_tpu.models.layers import CrossAttention

    x = jax.random.normal(jax.random.PRNGKey(3), (1, 256, 320))
    m_ref = CrossAttention(320, 5, 64)
    m_fused = CrossAttention(320, 5, 64, use_flash="fused")
    p_ref = m_ref.init(jax.random.PRNGKey(0), x)["params"]
    p_fused = m_fused.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree.map(lambda a: a.shape, p_ref) == \
        jax.tree.map(lambda a: a.shape, p_fused)
    out_ref = m_ref.apply({"params": p_ref}, x)
    out_fused = m_fused.apply({"params": p_ref}, x)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               atol=2e-4, rtol=2e-4)


def test_dynamic_quant_uses_unfused_path():
    """quant=True ("all": dynamic activation scales) has no fused-kernel
    variant — the module must fall back to the unfused dynamic path
    EXACTLY (ADVICE r2: silent downgrade to the static scale diverged
    numerically from the dynamic path the same setting selects elsewhere)."""
    from d3roma_tpu.models.layers import CrossAttention

    x = jax.random.normal(jax.random.PRNGKey(4), (1, 256, 320))
    m_dyn = CrossAttention(320, 5, 64, quant=True)
    m_fused = CrossAttention(320, 5, 64, quant=True, use_flash="fused")
    p = m_dyn.init(jax.random.PRNGKey(0), x)["params"]
    out_dyn = m_dyn.apply({"params": p}, x)
    out_fused = m_fused.apply({"params": p}, x)
    np.testing.assert_array_equal(np.asarray(out_fused), np.asarray(out_dyn))
