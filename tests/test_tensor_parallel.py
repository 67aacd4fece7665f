"""Tensor parallelism: TP-sharded programs equal the replicated ones.

The reference has no model parallelism (Accelerate DP only); TP here is
declarative — parameter PartitionSpecs + GSPMD collectives
(d3roma_tpu/parallel/tensor.py). These tests run real 2-D meshes on the
virtual 8-device CPU platform and assert value equality against the
single-sharding run, which validates the spec rules end-to-end (any
mis-sharding that XLA cannot implement fails to compile; any it can
implement must produce identical values).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

# compile-heavy tier: deselected by the default pytest invocation
# (pyproject addopts); run with `pytest -m full` (README)
pytestmark = pytest.mark.full

from d3roma_tpu.models import AutoencoderKL, UNet2DCondition
from d3roma_tpu.parallel import (
    batch_sharding,
    make_mesh_dp_tp,
    replicate_sharding,
    shard_params_tp,
    tp_param_specs,
    tp_shard_count,
)


def _tiny_unet():
    unet = UNet2DCondition(
        in_channels=12, out_channels=4, block_out_channels=(8, 16),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, attention_head_dim=8, cross_attention_dim=16,
        norm_groups=4,
    )
    lat = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 4, 12))
    t = jnp.array([3, 5, 1, 7])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (4, 4, 16))
    params = jax.jit(unet.init)(jax.random.PRNGKey(0), lat[:1], t[:1],
                                ctx[:1])["params"]
    return unet, params, (lat, t, ctx)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_unet_tp_matches_replicated():
    unet, params, (lat, t, ctx) = _tiny_unet()

    def apply(p, x, tt, cc):
        return unet.apply({"params": p}, x, tt, cc)

    ref = jax.jit(apply)(params, lat, t, ctx)

    mesh = make_mesh_dp_tp(2, 4)
    assert tp_shard_count(params, mesh) > 10  # rules actually engage
    p_tp = shard_params_tp(params, mesh)
    # the placed tree really is distributed on the model axis
    flat = jax.tree_util.tree_leaves(p_tp)
    assert any(len(x.sharding.device_set) == 8 for x in flat)
    args = jax.device_put((lat, t, ctx), batch_sharding(mesh))
    out = jax.jit(apply, out_shardings=batch_sharding(mesh))(p_tp, *args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_unet_tp_grads_match_replicated():
    unet, params, (lat, t, ctx) = _tiny_unet()

    def loss_fn(p, x, tt, cc):
        return jnp.mean(unet.apply({"params": p}, x, tt, cc) ** 2)

    ref_loss, ref_grads = jax.jit(jax.value_and_grad(loss_fn))(
        params, lat, t, ctx)

    mesh = make_mesh_dp_tp(2, 4)
    p_tp = shard_params_tp(params, mesh)
    args = jax.device_put((lat, t, ctx), batch_sharding(mesh))
    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(p_tp, *args)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5),
        grads, ref_grads)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_vae_tp_matches_replicated():
    vae = AutoencoderKL(block_out_channels=(8, 8, 8, 16), latent_channels=4,
                        norm_groups=2)
    img = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 3))
    params = jax.jit(vae.init)(jax.random.PRNGKey(0), img[:1])["params"]

    def apply(p, x):
        return vae.apply({"params": p}, x)

    ref = jax.jit(apply)(params, img)
    mesh = make_mesh_dp_tp(1, 8)
    assert tp_shard_count(params, mesh) > 10
    p_tp = shard_params_tp(params, mesh)
    img_s = jax.device_put(img, batch_sharding(mesh))
    out = jax.jit(apply)(p_tp, img_s)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5),
        out, ref)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_unet_spatial_parallel_matches_replicated():
    """H-dim (sequence) sharding: GSPMD's conv halo exchanges and the
    attention all-gather reproduce the replicated values exactly."""
    from d3roma_tpu.parallel import make_mesh_dp_sp, spatial_sharding

    unet, params, _ = _tiny_unet()
    lat = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 16, 12))
    t = jnp.array([3, 5])
    ctx = jax.random.normal(jax.random.PRNGKey(5), (2, 4, 16))

    def apply(p, x, tt, cc):
        return unet.apply({"params": p}, x, tt, cc)

    ref = jax.jit(apply)(params, lat, t, ctx)
    mesh = make_mesh_dp_sp(2, 4)
    sp = spatial_sharding(mesh)
    out = jax.jit(apply, out_shardings=sp)(
        jax.device_put(params, NamedSharding(mesh, P())),
        jax.device_put(lat, sp),
        jax.device_put(t, batch_sharding(mesh)),
        jax.device_put(ctx, batch_sharding(mesh)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_tp_specs_identity_without_model_axis():
    from d3roma_tpu.parallel import make_mesh

    _, params, _ = _tiny_unet()
    mesh = make_mesh(jax.devices()[:2])
    specs = jax.tree_util.tree_leaves(
        tp_param_specs(params, mesh), is_leaf=lambda s: isinstance(s, P))
    assert all(s == P() for s in specs)


def test_tp_specs_shapes_divide():
    """Every sharded leaf's sharded dim divides tp; non-divisible dims
    stay replicated instead of relying on XLA padding."""
    _, params, _ = _tiny_unet()
    mesh = make_mesh_dp_tp(2, 4)
    specs = tp_param_specs(params, mesh)

    def check(path, x):
        spec = _get(specs, path)
        for dim, ax in enumerate(spec):
            if ax == "model":
                assert x.shape[dim] % 4 == 0, (path, x.shape, spec)

    def _get(tree, path):
        for k in path:
            tree = tree[k.key]
        return tree

    jax.tree_util.tree_map_with_path(check, params)


# ---------------------------------------------------------------------- #
# Pallas kernels under TP via shard_map (round 5 — VERDICT r4 #4)
# ---------------------------------------------------------------------- #


def _kernel_unet():
    """Tokens >= 512 at head_dim 64 so the whole-row attention gate opens;
    C=128 so the fused GEGLU's F=512 chunks to 128 under tp=4."""
    unet = UNet2DCondition(
        in_channels=12, out_channels=4, block_out_channels=(128, 128),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, attention_head_dim=64, cross_attention_dim=16,
        norm_groups=4, use_flash_attention="pallas-self", fused_ff=True,
    )
    lat = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 32, 12)) * 0.3
    t = jnp.array([3, 5])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 16)) * 0.3
    params = jax.jit(unet.init)(jax.random.PRNGKey(0), lat[:1], t[:1],
                                ctx[:1])["params"]
    return unet, params, (lat, t, ctx)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_unet_pallas_kernels_tp_match_replicated(monkeypatch):
    """fast-kernel UNet (whole-row attention + fused GEGLU, interpret
    mode) under DP2xTP4 == the replicated kernel run. This is the
    composition round 4 gated off (docs/PARALLELISM.md: 'a pallas_call is
    not GSPMD-partitionable') — now routed through shard_map
    (ops/pallas::mha_attention_tp / geglu_ff_tp)."""
    import dataclasses as _dc

    monkeypatch.setenv("D3ROMA_PALLAS_INTERPRET", "1")
    unet, params, (lat, t, ctx) = _kernel_unet()

    ref = jax.jit(lambda p, x, tt, cc: unet.apply({"params": p}, x, tt, cc)
                  )(params, lat, t, ctx)

    mesh = make_mesh_dp_tp(2, 4)
    unet_tp = _dc.replace(unet, tp_mesh=mesh)
    # the gates actually open on the flagship-like level: token count 512
    from d3roma_tpu.ops.pallas import tp_attention_ok, tp_geglu_ok

    assert tp_attention_ok(mesh, 2, 16 * 32)
    assert tp_geglu_ok(mesh, 128, 512, 2)

    p_tp = shard_params_tp(params, mesh)
    args = jax.device_put((lat, t, ctx), batch_sharding(mesh))
    out = jax.jit(
        lambda p, x, tt, cc: unet_tp.apply({"params": p}, x, tt, cc),
        out_shardings=batch_sharding(mesh))(p_tp, *args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_vae_pallas_attention_tp_matches_replicated(monkeypatch):
    """VAE mid-attention through the whole-row kernel under TP (int8 —
    the only mode the wide-head kernel supports): shard_map path vs the
    replicated kernel, same quantization. Rounding boundaries differ
    (per-shard q absmax), so tolerance is int8-scale, not fp."""
    import dataclasses as _dc

    monkeypatch.setenv("D3ROMA_PALLAS_INTERPRET", "1")
    # 256x128 input -> 32x16 = 512 tokens at the mid attention (the
    # kernel gate needs >= 512) with a 64-dim single head
    vae = AutoencoderKL(block_out_channels=(8, 8, 16, 64),
                        latent_channels=4, norm_groups=4, quant="static")
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 256, 128, 3)) * 0.3
    params = jax.jit(vae.init)(jax.random.PRNGKey(0), x[:1])["params"]

    def apply(v):
        def f(p, xx):
            return v.apply({"params": p}, xx, method=v.encode).mean
        return f

    ref = jax.jit(apply(vae))(params, x)
    mesh = make_mesh_dp_tp(2, 4)
    vae_tp = _dc.replace(vae, tp_mesh=mesh)
    p_tp = shard_params_tp(params, mesh)
    xs = jax.device_put(x, batch_sharding(mesh))
    out = jax.jit(apply(vae_tp))(p_tp, xs)
    scale = float(np.abs(np.asarray(ref)).max())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=max(2e-2 * scale, 2e-2))
