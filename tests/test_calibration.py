"""Calibrated static-int8 activation scales (r2 judge item #2).

The release bench default quantizes activations with ONE global scale
(ops/quant.py STATIC_ACT_SCALE). Calibration replaces it with per-layer
scales captured from real activations in call order, stored with the
pipeline export, at identical runtime cost (compile-time constants)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3roma_tpu.ops.quant import (
    STATIC_ACT_SCALE,
    capture_act_scales,
    consume_act_scale,
    int8_dot_general_static,
    replay_act_scales,
)


def _dot(x, w):
    return int8_dot_general_static(x, w, (((1,), (0,)), ((), ())))


def test_capture_records_absmax_in_call_order():
    x1 = jnp.full((4, 8), 0.5)
    x2 = jnp.full((4, 8), 2.0)
    w = jnp.eye(8)

    def fn(x1, x2):
        taps = []
        with capture_act_scales(taps):
            a = _dot(x1, w)
            b = _dot(x2, w)
        return a + b, jnp.stack(taps)

    _, scales = jax.jit(fn)(x1, x2)
    np.testing.assert_allclose(np.asarray(scales),
                               [0.5 / 127.0, 2.0 / 127.0], rtol=1e-6)


def test_replay_consumes_scales_in_call_order_and_guards_drift():
    w = jnp.eye(8)
    x = jnp.full((4, 8), 0.5)

    def fn(x):
        with replay_act_scales([0.5 / 127.0, 2.0 / 127.0]):
            a = _dot(x, w)
            b = _dot(4.0 * x, w)
        return a, b

    a, b = jax.jit(fn)(x)
    # per-call scales: first call exact at 0.5-absmax, second clips 2.0->2.0
    np.testing.assert_allclose(np.asarray(a), np.asarray(x), atol=0.5 / 127)
    np.testing.assert_allclose(np.asarray(b), 2.0 * np.ones((4, 8)), atol=2.5 / 127)

    # drift guard: consuming only part of the table raises
    def bad(x):
        with replay_act_scales([1.0, 1.0, 1.0]):
            return _dot(x, w)

    with pytest.raises(RuntimeError, match="consumed 1 of 3"):
        jax.jit(bad)(jnp.full((4, 9), 0.5) @ jnp.ones((9, 8)))


def test_calibrated_scale_beats_global_default_for_small_activations():
    """Activations with absmax 0.4 get ~6 int8 levels under the global 8.0
    scale but the full 127 under a calibrated scale."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-0.4, 0.4, (64, 128)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.05, (128, 128)).astype(np.float32))
    ref = x @ w

    err_global = np.abs(np.asarray(_dot(x, w)) - np.asarray(ref)).mean()

    def calibrated(x, w):
        with replay_act_scales([0.4 / 127.0]):
            return _dot(x, w)

    err_cal = np.abs(np.asarray(jax.jit(calibrated)(x, w)) - np.asarray(ref)).mean()
    assert err_cal < err_global / 5


def _tiny_latent_pipe():
    """Tiny latent pipeline with a real /8 VAE geometry so the sampling
    loop actually executes end-to-end (the test_pipelines toy VAE only
    downsamples /2 and is used for save/load tests only)."""
    from d3roma_tpu.guidance import FlowGuidance
    from d3roma_tpu.models import AutoencoderKL, UNet2DCondition
    from d3roma_tpu.ops import Normalizer
    from d3roma_tpu.pipelines import GuidedLatentDiffusionPipeline, SamplerSpec
    from tests.test_pipelines import SMALL_SCHED

    unet = UNet2DCondition(
        in_channels=12, out_channels=4, block_out_channels=(16, 32),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, attention_head_dim=8, cross_attention_dim=16,
        norm_groups=8,
    )
    x = jnp.zeros((1, 4, 4, 12))
    ctx = jnp.zeros((1, 3, 16))
    unet_params = jax.jit(unet.init)(
        jax.random.PRNGKey(0), x, jnp.array([0]), ctx)["params"]
    vae = AutoencoderKL(block_out_channels=(4, 4, 4, 8), latent_channels=4,
                        norm_groups=2)
    vae_params = jax.jit(vae.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))["params"]
    return GuidedLatentDiffusionPipeline(
        unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
        text_embed=jnp.zeros((1, 3, 16)),
        spec=SamplerSpec("my_ddim", SMALL_SCHED),
        guidance=FlowGuidance(flow_guidance_weight=0.0,
                              flow_guidance_mode="gradient"),
        normalizer=Normalizer(ssi=True),
    )


@pytest.mark.full  # compile-heavy tier (README)
def test_pipeline_calibrate_end_metric_gate(tmp_path):
    """End-metric gate: the calibrated static-int8 pipeline's output must
    stay close to bf16 (delta below the uncalibrated-static delta, and
    small in absolute terms), and the scales must survive export/import."""
    from d3roma_tpu.pipelines import GuidedLatentDiffusionPipeline

    pipe = _tiny_latent_pipe()
    key = jax.random.PRNGKey(0)
    rgb = jax.random.normal(jax.random.fold_in(key, 1), (1, 32, 32, 3)) * 0.3
    raw = jnp.abs(jax.random.normal(jax.random.fold_in(key, 2), (1, 32, 32, 1))) * 0.3

    kwargs = dict(num_inference_steps=3, num_intermediate_images=1,
                  cond_channels="rgb+raw", rgb_images=rgb, sim_disp=raw)

    out_f = np.asarray(pipe(jax.random.PRNGKey(9), **kwargs).images)

    import dataclasses as _dc

    static = _dc.replace(
        pipe, unet=_dc.replace(pipe.unet, quant="static"),
        vae=_dc.replace(pipe.vae, quant="static"))
    out_s = np.asarray(static(jax.random.PRNGKey(9), **kwargs).images)

    calibrated = static.calibrate(
        jax.random.PRNGKey(3),
        [dict(rgb_images=rgb, sim_disp=raw)],
        cond_channels="rgb+raw", num_inference_steps=3,
    )
    assert set(calibrated.act_scales) == {"unet", "unet_cached",
                                          "vae_encode", "vae_decode"}
    assert all(len(v) > 0 for v in calibrated.act_scales.values())
    out_c = np.asarray(calibrated(jax.random.PRNGKey(9), **kwargs).images)

    d_static = np.abs(out_s - out_f).mean()
    d_cal = np.abs(out_c - out_f).mean()
    scale = np.abs(out_f).mean()
    assert d_cal <= d_static * 1.05  # never worse than the global scale
    assert d_cal < 0.05 * max(scale, 0.1)  # close to bf16 in absolute terms

    # export/import roundtrip carries the scales and reproduces the output
    d = str(tmp_path / "pipe")
    calibrated.save_pretrained(d)
    loaded = GuidedLatentDiffusionPipeline.from_pretrained(d)
    assert loaded.act_scales == calibrated.act_scales
    import dataclasses as _dc2

    loaded_q = _dc2.replace(
        loaded, unet=_dc2.replace(loaded.unet, quant="static"),
        vae=_dc2.replace(loaded.vae, quant="static"))
    out_l = np.asarray(loaded_q(jax.random.PRNGKey(9), **kwargs).images)
    np.testing.assert_allclose(out_l, out_c, atol=1e-5)


def test_calibrate_broadcasts_text_embed_to_batch():
    """Regression: calibrating on a batch > 1 with the pipeline's (1, L, D)
    text embed must broadcast the context like the sampling loop does
    (bench.py calibrates on the full bench batch)."""
    import dataclasses as _dc

    pipe = _tiny_latent_pipe()
    static = _dc.replace(
        pipe, unet=_dc.replace(pipe.unet, quant="static"),
        vae=_dc.replace(pipe.vae, quant="static"))
    key = jax.random.PRNGKey(0)
    rgb = jax.random.normal(key, (2, 32, 32, 3)) * 0.3
    cal = static.calibrate(key, [dict(rgb_images=rgb,
                                      sim_disp=jnp.abs(rgb[..., :1]))],
                           num_inference_steps=2)
    assert all(len(v) > 0 for v in cal.act_scales.values())


def test_fast_inference_keeps_act_scales():
    import dataclasses as _dc

    pipe = _tiny_latent_pipe()
    static = _dc.replace(
        pipe, unet=_dc.replace(pipe.unet, quant="static"),
        vae=_dc.replace(pipe.vae, quant="static"))
    key = jax.random.PRNGKey(0)
    rgb = jax.random.normal(key, (1, 32, 32, 3)) * 0.3
    cal = static.calibrate(key, [dict(rgb_images=rgb,
                                      sim_disp=jnp.abs(rgb[..., :1]))],
                           num_inference_steps=2)
    assert cal.fast_inference("throughput").act_scales == cal.act_scales
    assert cal.replace_sampler(cal.spec).act_scales == cal.act_scales


def test_calibrate_pipeline_cli(tmp_path):
    """scripts/calibrate_pipeline.py writes act_scales.json for an export."""
    import json

    from scripts.calibrate_pipeline import main as cal_main

    pipe = _tiny_latent_pipe()
    d = str(tmp_path / "pipe")
    pipe.save_pretrained(d)
    rc = cal_main([d, "--frames", "1", "--batches", "1",
                   "--image-size", "32x32", "--steps", "2"])
    assert rc == 0
    with open(os.path.join(d, "act_scales.json")) as f:
        scales = json.load(f)
    assert set(scales) == {"unet", "unet_cached", "vae_encode", "vae_decode"}

    from d3roma_tpu.pipelines import GuidedLatentDiffusionPipeline

    assert GuidedLatentDiffusionPipeline.from_pretrained(d).act_scales == scales


def test_capture_forward_is_mosaic_free():
    """The calibration capture pass must not trace any pallas_call: Mosaic
    compiles made the capture programs outlive the remote relay connection
    (Broken pipe at ~30 min). Tap-consuming fused branches run inline XLA
    math after recording their tap; tapless kernel routes are skipped."""
    import jax

    from d3roma_tpu.models import UNet2DCondition

    unet = UNet2DCondition(
        in_channels=8, out_channels=4, block_out_channels=(16, 32),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, attention_head_dim=8, cross_attention_dim=16,
        norm_groups=8, use_flash_attention="pallas-self", fused_ff=True,
        quant="static",
    )
    x = jnp.zeros((1, 8, 8, 8))
    ctx = jnp.zeros((1, 3, 16))
    params = jax.jit(unet.init)(jax.random.PRNGKey(0), x,
                                jnp.array([0]), ctx)["params"]

    def capture_fwd(x):
        taps = []
        with capture_act_scales(taps):
            out = unet.apply({"params": params}, x, jnp.array([0]), ctx)
        return out, jnp.stack(taps)

    jaxpr = jax.make_jaxpr(capture_fwd)(x)
    assert "pallas_call" not in str(jaxpr)

    # the normal (uncaptured) forward keeps the fused GEGLU kernel
    jaxpr_run = jax.make_jaxpr(
        lambda x: unet.apply({"params": params}, x, jnp.array([0]), ctx))(x)
    assert "pallas_call" in str(jaxpr_run)


@pytest.mark.full  # compile-heavy tier (README)
def test_calibrate_matches_wino_routing_at_the_stacked_encode_batch(monkeypatch):
    """Regression (round 3, on-chip): __call__ encodes ALL conditions in
    ONE stacked call (2-4x the frame batch), and wino_static conv routing
    depends on batch size through the liveness cap — so calibrate() must
    capture the encode through the same stacked program. When it captured
    per-condition (batch B) instead, a conv eligible at B but over-cap at
    2B consumed a scale only in the deployed program, and replay ran out
    of scales mid-trace (observed at the 180x320/C=128 VAE sites,
    batch 16 vs 32)."""
    import dataclasses as _dc

    # cap chosen so the 32x32 full-res VAE convs fit at batch 1 (the old
    # per-condition capture) but NOT at the stacked batch 2 the pipeline
    # actually encodes: ~3.1 MB/item inflated liveness at C<=128
    monkeypatch.setenv("D3ROMA_WINO_SLAB_MB", "4")
    monkeypatch.setenv("D3ROMA_WINO_CHUNK", "0")

    pipe = _tiny_latent_pipe()
    wino = _dc.replace(
        pipe, unet=_dc.replace(pipe.unet, quant="wino_static"),
        vae=_dc.replace(pipe.vae, quant="wino_static"))
    key = jax.random.PRNGKey(0)
    rgb = jax.random.normal(jax.random.fold_in(key, 1), (1, 32, 32, 3)) * 0.3
    raw = jnp.abs(jax.random.normal(jax.random.fold_in(key, 2),
                                    (1, 32, 32, 1))) * 0.3

    cal = wino.calibrate(jax.random.PRNGKey(3),
                         [dict(rgb_images=rgb, sim_disp=raw)],
                         cond_channels="rgb+raw", num_inference_steps=2)
    assert all(len(v) > 0 for v in cal.act_scales.values())
    # the deployed program must replay the captured sequence exactly
    out = cal(jax.random.PRNGKey(9), num_inference_steps=2,
              num_intermediate_images=1, cond_channels="rgb+raw",
              rgb_images=rgb, sim_disp=raw)
    assert np.all(np.isfinite(np.asarray(out.images, np.float32)))


def test_calibrate_interval_beyond_steps_still_captures_cached_table():
    """cache_interval > num_inference_steps: the deployed schedule has no
    shallow step, so without the dual-capture fallback calibrate() would
    produce no 'unet_cached' table and _unet_cache_fns would reject the
    calibrated pipe on first call (advisor r4)."""
    import dataclasses as _dc

    pipe = _tiny_latent_pipe()
    static = _dc.replace(
        pipe, unet=_dc.replace(pipe.unet, quant="static"),
        vae=_dc.replace(pipe.vae, quant="static")).deepcache(5)
    key = jax.random.PRNGKey(0)
    rgb = jax.random.normal(jax.random.fold_in(key, 1), (1, 32, 32, 3)) * 0.3
    raw = jnp.abs(jax.random.normal(jax.random.fold_in(key, 2),
                                    (1, 32, 32, 1))) * 0.3

    cal = static.calibrate(jax.random.PRNGKey(3),
                           [dict(rgb_images=rgb, sim_disp=raw)],
                           cond_channels="rgb+raw", num_inference_steps=2)
    assert len(cal.act_scales.get("unet_cached", [])) > 0
    # the calibrated pipe must run (interval 5 > 2 steps -> all-full tail)
    out = cal(jax.random.PRNGKey(9), num_inference_steps=2,
              num_intermediate_images=1, cond_channels="rgb+raw",
              rgb_images=rgb, sim_disp=raw)
    assert np.all(np.isfinite(np.asarray(out.images, np.float32)))


def test_capture_quantiles_and_with_act_clipping():
    """calibrate(quantiles=...) records [absmax, q...] per call; the flat
    tables stay absmax-based; with_act_clipping re-derives percentile
    tables and registers bf16 pins without recapture."""
    import dataclasses as _dc

    pipe = _tiny_latent_pipe()
    static = _dc.replace(
        pipe, unet=_dc.replace(pipe.unet, quant="static"),
        vae=_dc.replace(pipe.vae, quant="static"))
    key = jax.random.PRNGKey(0)
    rgb = jax.random.normal(jax.random.fold_in(key, 1), (1, 32, 32, 3)) * 0.3
    raw = jnp.abs(jax.random.normal(jax.random.fold_in(key, 2),
                                    (1, 32, 32, 1))) * 0.3

    cal = static.calibrate(jax.random.PRNGKey(3),
                           [dict(rgb_images=rgb, sim_disp=raw)],
                           cond_channels="rgb+raw", num_inference_steps=2,
                           quantiles=(0.999, 0.99))
    assert cal.act_scales["@quantiles"] == [0.999, 0.99]
    n = len(cal.act_scales["unet"])
    assert len(cal.act_scales["unet@q"]) == n
    assert all(len(row) == 3 for row in cal.act_scales["unet@q"])
    # flat table == absmax column * margin (default strategy unchanged)
    import numpy as _np

    _np.testing.assert_allclose(
        cal.act_scales["unet"],
        [max(r[0] * 1.25, 1e-8) for r in cal.act_scales["unet@q"]],
        rtol=1e-6)
    # quantiles are <= absmax per call
    for row in cal.act_scales["unet@q"]:
        assert row[1] <= row[0] + 1e-9 and row[2] <= row[1] + 1e-9

    clipped = cal.with_act_clipping(percentile=0.99)
    assert all(a <= b + 1e-9 for a, b in zip(clipped.act_scales["unet"],
                                             cal.act_scales["unet"]))
    with pytest.raises(ValueError, match="not captured"):
        cal.with_act_clipping(percentile=0.5)

    # pins: pinned program still runs and matches the unpinned shapes
    pinned = cal.with_act_clipping(pins={"unet": [0, 1]})
    assert pinned.act_scales["unet@pins"] == [0, 1]
    kwargs = dict(num_inference_steps=2, num_intermediate_images=1,
                  cond_channels="rgb+raw", rgb_images=rgb, sim_disp=raw)
    out_cal = np.asarray(cal(jax.random.PRNGKey(9), **kwargs).images)
    out_pin = np.asarray(pinned(jax.random.PRNGKey(9), **kwargs).images)
    assert out_pin.shape == out_cal.shape
    assert np.all(np.isfinite(out_pin))
    # pinning layers 0,1 changes the program numerics (they ran in float)
    assert not np.allclose(out_pin, out_cal)


def test_replay_pins_run_float_and_keep_call_order():
    """ops/quant.py: a pinned index runs the float op but still consumes
    its slot, so subsequent calls get their own scales."""
    from d3roma_tpu.ops.quant import (
        int8_dot_general_static,
        replay_act_scales,
    )

    x = jnp.array([[0.5, -1.0, 2.0]], jnp.float32)
    w = jnp.eye(3, dtype=jnp.float32)
    dn = (((1,), (0,)), ((), ()))
    with replay_act_scales([0.004, 0.004], pins=[0]):
        out0 = int8_dot_general_static(x, w, dn)  # pinned -> exact
        out1 = int8_dot_general_static(x, w, dn)  # quantized at 0.004
    np.testing.assert_allclose(np.asarray(out0), np.asarray(x), atol=1e-7)
    # 2.0 / 0.004 = 500 > 127 -> clipped to 127*0.004 = 0.508
    assert abs(float(out1[0, 2]) - 0.508) < 1e-6


def test_quant_call_map_abstract_trace_and_kind_pins():
    """quant_call_map derives the static-int8 call-order map from an
    abstract (eval_shape) trace: entry counts match the real capture's
    tap counts per table, the classic PTQ-sensitive layers (conv_in /
    conv_out / time-embed) never appear (architecturally unquantized —
    models/unet2d_condition.py), and kind_pins selects exactly the
    requested layer class."""
    pipe = _tiny_latent_pipe()
    cmap = pipe.quant_call_map(batch=2, height=32, width=32)
    assert set(cmap) == {"unet", "unet_cached"}
    # the shallow cached pass visits a strict subset of call sites
    assert 0 < len(cmap["unet_cached"]) < len(cmap["unet"])
    for log in cmap.values():
        for kind, shape in log:
            assert kind in ("dot", "conv", "attn", "geglu")
            # conv_in input (12ch raw latent stack) is never quantized;
            # rank-2 time-embed dots are never quantized
            assert not (kind == "conv" and shape[-1] == 12)
            assert not (kind == "dot" and len(shape) == 2)
    # the map's length equals the number of scales the REAL capture
    # records (the call-order contract pins/replay rely on)
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp

    from d3roma_tpu.ops.quant import capture_act_scales

    qpipe = _dc.replace(pipe, unet=_dc.replace(pipe.unet, quant="static"))
    taps = []
    x = jnp.zeros((2, 4, 4, 12), jnp.bfloat16)
    ctx = jnp.zeros((2, 3, 16), jnp.bfloat16)
    with capture_act_scales(taps):
        qpipe.unet.apply({"params": qpipe.unet_params}, x,
                         jnp.zeros((2,), jnp.int32), ctx)
    assert len(taps) == len(cmap["unet"])
    # kind_pins: exactly the conv entries, as replay-table indices
    pins = pipe.kind_pins(("conv",), batch=2, height=32, width=32)
    for tab in ("unet", "unet_cached"):
        expect = [i for i, (k, _) in enumerate(cmap[tab]) if k == "conv"]
        assert pins[tab] == expect


def test_kind_pins_replay_runs_and_changes_output():
    """A kind-pinned replay keeps the scale call-order contract (no
    consumed-count drift) while running the pinned class in bf16 —
    the output matches the fully-quantized replay less closely than
    itself (i.e. pinning really changes the compute path)."""
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp

    pipe = _tiny_latent_pipe()
    qpipe = _dc.replace(pipe, unet=_dc.replace(pipe.unet, quant="static"))
    n = len(pipe.quant_call_map(batch=2, height=32, width=32)["unet"])
    scales = {"unet": [0.05] * n}
    base = _dc.replace(qpipe, act_scales=scales)
    pinned = base.with_act_clipping(
        pins=base.kind_pins(("conv",), batch=2, height=32, width=32))
    assert pinned.act_scales["unet@pins"]

    x = jnp.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (2, 4, 4, 12)),
        jnp.bfloat16)
    ctx = jnp.zeros((2, 3, 16), jnp.bfloat16)
    t = jnp.zeros((2,), jnp.int32)

    def run(p):
        fn = p._replayed(
            lambda xx: p.unet.apply({"params": p.unet_params}, xx, t, ctx),
            "unet")
        return jax.jit(fn)(x)

    out_q = run(base)
    out_pin = run(pinned)
    # pinned path really diverges from the all-int8 one
    assert float(jnp.max(jnp.abs(out_q - out_pin))) > 0.0
