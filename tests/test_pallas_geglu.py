"""Fused GEGLU feed-forward kernel vs the unfused module math.

Shapes mirror the flagship UNet transformer levels (C=320/640/1280,
F=4C; reference model: SD2.1-geometry, train.py:751-772)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3roma_tpu.models.layers import FeedForward
from d3roma_tpu.ops.pallas.geglu import geglu_ff


def _ref(x, w1h, w1g, w2, b1h, b1g, b2):
    h = x @ w1h + b1h
    g = x @ w1g + b1g
    return (h * jax.nn.gelu(g)) @ w2 + b2


def _inputs(key, b, n, c, f):
    ks = jax.random.split(key, 6)
    x = jax.random.normal(ks[0], (b, n, c))
    w1h = jax.random.normal(ks[1], (c, f)) * 0.05
    w1g = jax.random.normal(ks[2], (c, f)) * 0.05
    w2 = jax.random.normal(ks[3], (f, c)) * 0.05
    b1h = jax.random.normal(ks[4], (f,)) * 0.1
    b1g = jnp.zeros((f,))
    b2 = jax.random.normal(ks[5], (c,)) * 0.1
    return x, w1h, w1g, w2, b1h, b1g, b2


@pytest.mark.parametrize("c,f,n", [(320, 1280, 450), (1280, 5120, 60)])
def test_fused_matches_reference(c, f, n):
    x, w1h, w1g, w2, b1h, b1g, b2 = _inputs(jax.random.PRNGKey(0), 2, n, c, f)
    out = geglu_ff(x, w1h, w1g, w2, b1h, b1g, b2, interpret=True)
    ref = _ref(x, w1h, w1g, w2, b1h, b1g, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_fused_int8_close_to_float():
    x, w1h, w1g, w2, b1h, b1g, b2 = _inputs(jax.random.PRNGKey(1), 2, 128, 320, 1280)
    x = jnp.clip(x, -4.0, 4.0)
    out = geglu_ff(x, w1h, w1g, w2, b1h, b1g, b2, quant="static",
                   act_scale=4.0 / 127.0, interpret=True)
    ref = _ref(x, w1h, w1g, w2, b1h, b1g, b2)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).mean()
    assert err.mean() < 0.05 * max(scale, 1.0)


def test_module_fused_matches_unfused():
    """FeedForward(fused=True) must declare the exact same param tree as
    the unfused module (checkpoint compatibility) and compute the same
    function (interpret-mode kernel on CPU)."""
    x = jax.random.normal(jax.random.PRNGKey(7), (1, 64, 320))
    p_ref = FeedForward(320).init(jax.random.PRNGKey(0), x)["params"]
    p_fused = FeedForward(320, fused=True).init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree.map(lambda a: a.shape, p_ref) == \
        jax.tree.map(lambda a: a.shape, p_fused)
    for (pa, a), (pb, bb) in zip(
        jax.tree_util.tree_leaves_with_path(p_ref),
        jax.tree_util.tree_leaves_with_path(p_fused),
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))
    out_ref = FeedForward(320).apply({"params": p_ref}, x)
    out_fused = FeedForward(320, fused=True).apply({"params": p_ref}, x)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               atol=1e-4, rtol=1e-4)
