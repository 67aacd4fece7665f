"""AOT serving artifacts (serving/aot.py): jax.export program roundtrip,
parameter-as-argument contract, and the compiled-executable cache."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# compile-heavy tier: deselected by the default pytest invocation
# (pyproject addopts); run with `pytest -m full` (README)
pytestmark = pytest.mark.full

from d3roma_tpu.guidance import FlowGuidance
from d3roma_tpu.models import UNet2D
from d3roma_tpu.ops import Normalizer
from d3roma_tpu.pipelines import GuidedDiffusionPipeline, SamplerSpec
from d3roma_tpu.serving import (
    ExecutableCache,
    ServingSignature,
    export_serving,
    load_serving,
    save_serving,
)
from tests.test_calibration import _tiny_latent_pipe
from tests.test_pipelines import SMALL_SCHED


def _tiny_pixel_pipe():
    unet = UNet2D(in_channels=5, out_channels=1,
                  block_out_channels=(16, 32),
                  down_block_types=("DownBlock2D", "AttnDownBlock2D"),
                  up_block_types=("AttnUpBlock2D", "UpBlock2D"),
                  layers_per_block=1, norm_groups=8)
    x = jnp.zeros((1, 16, 16, 5))
    params = jax.jit(unet.init)(jax.random.PRNGKey(0), x,
                                jnp.array([0]))["params"]
    return GuidedDiffusionPipeline(
        unet=unet, unet_params=params,
        spec=SamplerSpec("my_ddpm", SMALL_SCHED),
        guidance=FlowGuidance(flow_guidance_weight=0.0),
        normalizer=Normalizer(ssi=False, mode="average", num_chs=1,
                              ch_bounds=(128.0,), ch_gammas=(1.0,)),
    )


LATENT_KW = dict(num_inference_steps=3, num_intermediate_images=1,
                 cond_channels="rgb+raw")
LATENT_SIG = ServingSignature(batch=1, height=32, width=32,
                              num_inference_steps=3,
                              num_intermediate_images=1,
                              cond_channels="rgb+raw")


def _latent_inputs():
    key = jax.random.PRNGKey(0)
    rgb = jax.random.normal(jax.random.fold_in(key, 1), (1, 32, 32, 3)) * 0.3
    raw = jnp.abs(
        jax.random.normal(jax.random.fold_in(key, 2), (1, 32, 32, 1))) * 0.3
    return rgb, raw


def test_export_roundtrip_latent(tmp_path):
    """save_serving -> load_serving -> bind: same output as __call__."""
    pipe = _tiny_latent_pipe()
    rgb, raw = _latent_inputs()
    ref = np.asarray(pipe(jax.random.PRNGKey(9), rgb_images=rgb,
                          sim_disp=raw, **LATENT_KW).images)

    d = str(tmp_path / "serving")
    save_serving(pipe, d, LATENT_SIG)
    assert os.path.exists(os.path.join(d, "program.jaxexport"))
    prog = load_serving(d)
    assert prog.is_latent
    assert prog.signature == LATENT_SIG
    out = prog.bind(pipe)(jax.random.PRNGKey(9), rgb_images=rgb,
                          sim_disp=raw)
    np.testing.assert_allclose(np.asarray(out.images), ref, atol=1e-5)
    # intermediates come through the pytree too
    assert out.intermediates.shape[0] == 1


def test_export_deepcache_program_and_manifest(tmp_path):
    """A DeepCache pipeline exports its grouped serving program; the
    manifest discloses the interval (1 for exact-numerics exports) so
    consumers can tell approximation programs apart."""
    import json

    pipe = _tiny_latent_pipe()
    d_exact = str(tmp_path / "exact")
    save_serving(pipe, d_exact, LATENT_SIG)
    with open(os.path.join(d_exact, "manifest.json")) as f:
        assert json.load(f)["deepcache_interval"] == 1

    dc = pipe.deepcache(2)
    rgb, raw = _latent_inputs()
    ref = np.asarray(dc(jax.random.PRNGKey(9), rgb_images=rgb,
                        sim_disp=raw, **LATENT_KW).images)
    d = str(tmp_path / "serving")
    save_serving(dc, d, LATENT_SIG)
    prog = load_serving(d)
    assert prog.manifest["deepcache_interval"] == 2
    out = prog.bind(dc)(jax.random.PRNGKey(9), rgb_images=rgb, sim_disp=raw)
    np.testing.assert_allclose(np.asarray(out.images), ref, atol=1e-5)


def test_export_params_are_arguments_not_constants(tmp_path):
    """The artifact must carry NO weights: binding different params to the
    same loaded program changes the output."""
    import dataclasses

    pipe = _tiny_latent_pipe()
    rgb, raw = _latent_inputs()
    d = str(tmp_path / "serving")
    save_serving(pipe, d, LATENT_SIG)
    prog = load_serving(d)
    out1 = np.asarray(prog.bind(pipe)(jax.random.PRNGKey(9), rgb_images=rgb,
                                      sim_disp=raw).images)
    scaled = dataclasses.replace(
        pipe, unet_params=jax.tree.map(lambda p: p * 3.0, pipe.unet_params))
    out2 = np.asarray(prog.bind(scaled)(jax.random.PRNGKey(9),
                                        rgb_images=rgb,
                                        sim_disp=raw).images)
    assert not np.allclose(out1, out2)


def test_export_roundtrip_pixel(tmp_path):
    pipe = _tiny_pixel_pipe()
    rgb = jnp.ones((1, 16, 16, 3)) * 0.2
    raw = jnp.ones((1, 16, 16, 1)) * 0.1
    ref = np.asarray(pipe(jax.random.PRNGKey(3), num_inference_steps=4,
                          num_intermediate_images=2, depth_channels=1,
                          cond_channels="rgb+raw", rgb_images=rgb,
                          sim_disp=raw).images)
    sig = ServingSignature(batch=1, height=16, width=16,
                           num_inference_steps=4, num_intermediate_images=2,
                           cond_channels="rgb+raw", depth_channels=1)
    d = str(tmp_path / "serving")
    save_serving(pipe, d, sig)
    prog = load_serving(d)
    assert not prog.is_latent
    out = prog.bind(pipe)(jax.random.PRNGKey(3), rgb_images=rgb,
                          sim_disp=raw)
    np.testing.assert_allclose(np.asarray(out.images), ref, atol=1e-5)


def test_bind_rejects_wrong_pipeline_family(tmp_path):
    lat = _tiny_latent_pipe()
    d = str(tmp_path / "serving")
    save_serving(lat, d, LATENT_SIG)
    with pytest.raises(ValueError, match="exported from"):
        load_serving(d).bind(_tiny_pixel_pipe())


def test_export_with_guidance_matches_call(tmp_path):
    """A guidance-enabled program (raw_depth + mask as traced args,
    denorm_builder code baked in) exports and matches __call__."""
    import dataclasses

    pipe = _tiny_latent_pipe()
    pipe = dataclasses.replace(
        pipe, guidance=FlowGuidance(flow_guidance_weight=0.5,
                                    flow_guidance_mode="gradient",
                                    num_opt_steps=2, opt_lr=0.05))
    rgb, raw = _latent_inputs()
    raw_depth = jnp.abs(raw) * 4.0
    mask = (raw_depth > 0.2).astype(jnp.float32)
    builder = lambda x, rd, m: x * m  # stands in for D3RoMa's denormalize

    ref = np.asarray(pipe(
        jax.random.PRNGKey(5), rgb_images=rgb, sim_disp=raw,
        raw_depth=raw_depth, denorm_builder=builder, denorm_mask=mask,
        **LATENT_KW).images)

    sig = ServingSignature(batch=1, height=32, width=32,
                           num_inference_steps=3, num_intermediate_images=1,
                           cond_channels="rgb+raw", with_guidance=True)
    d = str(tmp_path / "serving")
    save_serving(pipe, d, sig, denorm_builder=builder)
    out = load_serving(d).bind(pipe)(
        jax.random.PRNGKey(5), rgb_images=rgb, sim_disp=raw,
        raw_depth=raw_depth, denorm_mask=mask)
    np.testing.assert_allclose(np.asarray(out.images), ref, atol=1e-5)


def test_export_with_guidance_requires_builder():
    pipe = _tiny_latent_pipe()
    sig = ServingSignature(batch=1, height=32, width=32,
                           cond_channels="rgb+raw", with_guidance=True)
    with pytest.raises(ValueError, match="denorm_builder"):
        export_serving(pipe, sig)


@pytest.fixture
def fresh_cc_cache(tmp_path):
    """Point jax's persistent compilation cache at a fresh dir: an
    executable served FROM that cache serializes to a broken payload
    (the store-time validation in ExecutableCache rejects it — correct
    in production, but these tests assert the cache gets populated)."""
    old = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", str(tmp_path / "cc"))
    yield
    jax.config.update("jax_compilation_cache_dir", old)


def test_executable_cache_hit_skips_compile(tmp_path, fresh_cc_cache):
    """Second process (simulated): the cache entry loads WITHOUT invoking
    lower/compile, and computes the same result."""
    cache = ExecutableCache(str(tmp_path / "aot"))
    f = jax.jit(lambda a, b: a @ b + 1.0)
    args = (jnp.ones((4, 8)), jnp.ones((8, 4)))
    c1 = cache.get_or_compile("tok", f, args)
    ref = np.asarray(c1(*args))
    files = os.listdir(str(tmp_path / "aot"))
    assert any(n.startswith("exec_") for n in files)

    class Boom:
        def lower(self, *a, **k):
            raise AssertionError("cache miss: lower() was called")

    c2 = cache.get_or_compile("tok", Boom(), args)
    np.testing.assert_allclose(np.asarray(c2(*args)), ref)


def test_executable_cache_keys_on_token_and_shapes(tmp_path):
    cache = ExecutableCache(str(tmp_path / "aot"))
    args44 = (jnp.ones((4, 4)), jnp.ones((4, 4)))
    args88 = (jnp.ones((8, 8)), jnp.ones((8, 8)))
    assert cache._entry_path("a", args44) != cache._entry_path("b", args44)
    assert cache._entry_path("a", args44) != cache._entry_path("a", args88)


def test_pipeline_with_aot_cache_end_to_end(tmp_path, fresh_cc_cache):
    """pipeline.with_aot_cache: first call populates the cache; a FRESH
    pipeline object (new process stand-in) reuses the entry and matches."""
    cache_dir = str(tmp_path / "aot")
    rgb, raw = _latent_inputs()

    p1 = _tiny_latent_pipe().with_aot_cache(cache_dir)
    out1 = np.asarray(p1(jax.random.PRNGKey(9), rgb_images=rgb,
                         sim_disp=raw, **LATENT_KW).images)
    entries = [n for n in os.listdir(cache_dir) if n.startswith("exec_")]
    assert len(entries) == 1

    p2 = _tiny_latent_pipe().with_aot_cache(cache_dir)
    out2 = np.asarray(p2(jax.random.PRNGKey(9), rgb_images=rgb,
                         sim_disp=raw, **LATENT_KW).images)
    np.testing.assert_allclose(out2, out1, atol=1e-6)
    # no second entry was written (hit, not a recompile)
    assert [n for n in os.listdir(cache_dir)
            if n.startswith("exec_")] == entries


def test_export_for_tpu_from_cpu_host():
    """Cross-platform lowering: a TPU serving artifact builds on a CPU
    host (the build-box -> TPU-server deployment story)."""
    pipe = _tiny_latent_pipe()
    sig = ServingSignature(batch=1, height=32, width=32,
                           num_inference_steps=2, num_intermediate_images=1,
                           cond_channels="rgb+raw")
    exp = export_serving(pipe, sig, platforms=("tpu",))
    assert tuple(exp.platforms) == ("tpu",)
    assert len(exp.serialize()) > 0


def test_export_serving_cli(tmp_path, monkeypatch):
    """scripts/export_serving.py: pipeline dir -> loadable artifact."""
    import importlib

    pipe = _tiny_latent_pipe()
    pdir = str(tmp_path / "pipe")
    pipe.save_pretrained(pdir)
    out = str(tmp_path / "artifact")
    monkeypatch.setattr("sys.argv", [
        "export_serving.py", "--pipeline-dir", pdir, "--out", out,
        "--batch", "1", "--height", "32", "--width", "32",
        "--steps", "2", "--cond-channels", "rgb+raw"])
    importlib.import_module("scripts.export_serving").main()

    prog = load_serving(out)
    assert prog.signature.num_inference_steps == 2
    rgb, raw = _latent_inputs()
    loaded_pipe = type(pipe).from_pretrained(pdir)
    outp = prog.bind(loaded_pipe)(jax.random.PRNGKey(1), rgb_images=rgb,
                                  sim_disp=raw)
    assert np.all(np.isfinite(np.asarray(outp.images)))


def test_split_programs_aot_cache_end_to_end(tmp_path, fresh_cc_cache):
    """The split (latency/streaming) path caches its enc/scan/dec
    programs; a fresh pipeline reuses them and matches bit-for-bit."""
    cache_dir = str(tmp_path / "aot")
    rgb, raw = _latent_inputs()
    kw = dict(LATENT_KW, split_programs=True)

    p1 = _tiny_latent_pipe().with_aot_cache(cache_dir)
    out1 = np.asarray(p1(jax.random.PRNGKey(9), rgb_images=rgb,
                         sim_disp=raw, **kw).images)
    entries = sorted(n for n in os.listdir(cache_dir)
                     if n.startswith("exec_"))
    assert len(entries) == 3  # enc / scan / dec (init is not cached)

    p2 = _tiny_latent_pipe().with_aot_cache(cache_dir)
    out2 = np.asarray(p2(jax.random.PRNGKey(9), rgb_images=rgb,
                         sim_disp=raw, **kw).images)
    np.testing.assert_array_equal(out2, out1)
    assert sorted(n for n in os.listdir(cache_dir)
                  if n.startswith("exec_")) == entries


def test_pipeline_aot_cache_skips_closure_programs_without_token(tmp_path):
    """denormer/denorm_builder closures are process-local: without an
    explicit token the pipeline must NOT cache those programs."""
    import dataclasses

    cache_dir = str(tmp_path / "aot")
    pipe = _tiny_latent_pipe().with_aot_cache(cache_dir)
    pipe = dataclasses.replace(
        pipe, guidance=FlowGuidance(flow_guidance_weight=0.5,
                                    flow_guidance_mode="gradient",
                                    num_opt_steps=1, opt_lr=0.05))
    rgb, raw = _latent_inputs()
    raw_depth = jnp.abs(raw) * 4.0
    mask = jnp.ones_like(raw_depth)
    pipe(jax.random.PRNGKey(5), rgb_images=rgb, sim_disp=raw,
         raw_depth=raw_depth, denorm_builder=lambda x, rd, m: x * m,
         denorm_mask=mask, **LATENT_KW)
    assert not os.path.exists(cache_dir) or not [
        n for n in os.listdir(cache_dir) if n.startswith("exec_")]


def test_bind_rejects_calibration_mismatch(tmp_path):
    """The exported program bakes the int8 activation scales in as
    constants; bind() must refuse a pipeline whose calibration differs
    (it would silently run the export-time scales)."""
    import dataclasses

    pipe = _tiny_latent_pipe()
    d = str(tmp_path / "serving")
    save_serving(pipe, d, LATENT_SIG)
    prog = load_serving(d)
    prog.bind(pipe)  # matching (both uncalibrated): fine
    calibrated = dataclasses.replace(pipe, act_scales={"unet": [0.1, 0.2]})
    with pytest.raises(ValueError, match="activation scales"):
        prog.bind(calibrated)
    # and the other direction: exported-calibrated vs bound-uncalibrated
    d2 = str(tmp_path / "serving2")
    save_serving(calibrated, d2, LATENT_SIG)
    prog2 = load_serving(d2)
    prog2.bind(calibrated)
    with pytest.raises(ValueError, match="activation scales"):
        prog2.bind(pipe)
    # a DIFFERENT calibration is also a mismatch, not just presence
    other = dataclasses.replace(pipe, act_scales={"unet": [0.3, 0.4]})
    with pytest.raises(ValueError, match="activation scales"):
        prog2.bind(other)


def test_closure_token_collision_raises(tmp_path):
    """One aot_cache_token, two different denorm_builder closures: the
    second would silently be served the first's baked executable — the
    pipeline must refuse instead."""
    import dataclasses

    pipe = _tiny_latent_pipe().with_aot_cache(
        str(tmp_path / "aot"), token="cfg-v1")
    pipe = dataclasses.replace(
        pipe, guidance=FlowGuidance(flow_guidance_weight=0.5,
                                    flow_guidance_mode="gradient",
                                    num_opt_steps=1, opt_lr=0.05))
    rgb, raw = _latent_inputs()
    raw_depth = jnp.abs(raw) * 4.0
    mask = jnp.ones_like(raw_depth)
    kw = dict(LATENT_KW, rgb_images=rgb, sim_disp=raw,
              raw_depth=raw_depth, denorm_mask=mask)
    pipe(jax.random.PRNGKey(5), denorm_builder=lambda x, rd, m: x * m, **kw)
    with pytest.raises(ValueError, match="cfg-v1"):
        pipe(jax.random.PRNGKey(5),
             denorm_builder=lambda x, rd, m: x * m + 1.0, **kw)


def test_pixel_copy_methods_preserve_aot_cache(tmp_path):
    pipe = _tiny_pixel_pipe().with_aot_cache(str(tmp_path / "aot"), "tok")
    for derived in (pipe.replace_sampler(pipe.spec), pipe.half_precision(),
                    pipe.quantize_int8(), pipe.fuse_norms()):
        assert derived.aot_cache_dir == pipe.aot_cache_dir
        assert derived.aot_cache_token == "tok"


def test_pixel_sig_distinguishes_mask_and_dtype():
    """The pixel memo sig must key on raw_mask presence and input dtypes:
    when an ExecutableCache entry backs the memo, the stored object
    cannot retrace, so a collision would crash mid-serving."""
    pipe = _tiny_pixel_pipe()
    rgb = jnp.ones((1, 16, 16, 3)) * 0.2
    raw = jnp.ones((1, 16, 16, 1)) * 0.1
    kw = dict(num_inference_steps=2, num_intermediate_images=1,
              depth_channels=1, cond_channels="rgb+raw")
    pipe(jax.random.PRNGKey(0), rgb_images=rgb, sim_disp=raw, **kw)
    pipe(jax.random.PRNGKey(0), rgb_images=rgb, sim_disp=raw,
         raw_mask=jnp.ones_like(raw), **kw)
    pipe(jax.random.PRNGKey(0), rgb_images=rgb.astype(jnp.bfloat16),
         sim_disp=raw, **kw)
    assert len(pipe._jitted) == 3
