"""Streaming pipeline + synthetic generator integration tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3roma_tpu.synthetic import ProceduralSceneRenderer, SceneConfig, generate_dataset


def small_cfg(**kw):
    return SceneConfig(height=90, width=160, **kw)


def test_procedural_scene_consistency():
    r = ProceduralSceneRenderer(small_cfg(), seed=0)
    f = r.render()
    assert f["depth"].shape == (90, 160)
    assert f["rgb"].dtype == np.uint8
    assert (f["depth"] > 0).all()
    # sim depth has holes (transparent/specular objects) but matches GT
    # where the sensor saw the surface
    vis = f["sim_depth"] > 0
    assert 0.3 < vis.mean() <= 1.0
    rel = np.abs(f["sim_depth"][vis] - f["depth"][vis]) / f["depth"][vis]
    assert np.median(rel) < 0.01


def test_procedural_stereo_ir_matches_depth():
    """The generated IR pair must be consistent with GT disparity — checked
    by running our own stereo matcher on it."""
    from d3roma_tpu.ops.stereo import stereo_match

    r = ProceduralSceneRenderer(small_cfg(speckle_density=0.15), seed=3)
    f = r.render()
    fxb = f["fxb"]
    gt_disp = fxb / f["depth"]
    lo = max(1, int(np.floor(gt_disp.min())) - 2)
    hi = int(np.ceil(gt_disp.max())) + 2
    L = jnp.asarray(f["ir_l"][None, ..., None].astype(np.float32) / 255.0)
    R = jnp.asarray(f["ir_r"][None, ..., None].astype(np.float32) / 255.0)
    out = stereo_match(L, R, fxb, lo, hi, block_size=11)
    disp = np.asarray(out.disp)[0]
    valid = np.asarray(out.valid)[0]
    interior = (slice(12, -12), slice(hi + 4, -12))
    v = valid[interior]
    err = np.abs(disp[interior] - gt_disp[interior])[v]
    assert v.mean() > 0.5
    assert np.median(err) < 1.0, f"median disparity err {np.median(err)}"


def test_generate_dataset_layout_loads_via_hiss(tmp_path):
    from functools import partial

    from d3roma_tpu.data.datasets import HISS
    from d3roma_tpu.utils import frame_utils
    from d3roma_tpu.utils.camera import Realsense

    root = str(tmp_path / "HISS")
    generate_dataset(root, 2, "train", SceneConfig(height=360, width=640), seed=1)
    cam = Realsense.default_sim(min_depth=0.2, max_depth=3.0)
    cam.change_resolution("320x180")
    ds = HISS(cam, (128, 256), split="train", root=root,
              reader=partial(frame_utils.readDispReal, cam), seed=0)
    assert len(ds) == 2
    item = ds[0]
    assert item["rgb"].shape == (128, 256, 3)
    assert (item["raw_depth"] >= 0).all()
    assert item["valid"].sum() > 0


def test_streaming_processor_with_file_replay(tmp_path):
    """Full streaming loop against a replay source with a stub restorer."""
    import cv2

    from d3roma_tpu.streaming import D3RoMaProcessor, FileReplaySource

    scene = tmp_path / "frames"
    scene.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        cv2.imwrite(str(scene / f"{i:04d}_color.png"),
                    rng.integers(0, 255, (48, 64, 3), np.uint8))
        cv2.imwrite(str(scene / f"{i:04d}_depth.png"),
                    rng.integers(500, 1500, (48, 64)).astype(np.uint16))

    class StubDroma:
        def infer_with_rgb_raw(self, rgb, depth):
            return depth * 1.01  # pretend restoration

    K = np.array([[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]])
    published = []
    proc = D3RoMaProcessor(StubDroma(), K,
                           publish=lambda r, p, m: published.append((r, p, m)))
    src = FileReplaySource(str(scene))
    proc.run_source(src, max_frames=3)
    assert proc.frames_processed == 3
    assert len(published) == 3
    raw_pc, pred_pc = published[0][0], published[0][1]
    assert raw_pc[0].shape[1] == 3 and len(raw_pc[0]) > 0
    assert published[0][2]["latency_s"] > 0


def test_streaming_worker_thread_queue(tmp_path):
    import time

    from d3roma_tpu.streaming import D3RoMaProcessor

    class StubDroma:
        def infer_with_rgb_raw(self, rgb, depth):
            return depth

    K = np.eye(3) * 50.0
    K[2, 2] = 1
    done = []
    proc = D3RoMaProcessor(StubDroma(), K, publish=lambda r, p, m: done.append(1),
                           queue_size=2)
    proc.start()
    rng = np.random.default_rng(0)
    for _ in range(5):
        proc.submit(rng.integers(0, 255, (24, 32, 3), np.uint8),
                    rng.uniform(0.5, 1.5, (24, 32)).astype(np.float32))
    deadline = time.time() + 20
    while len(done) < 2 and time.time() < deadline:
        time.sleep(0.05)
    proc.stop()
    assert len(done) >= 2  # processed some; queue drops when saturated


def test_merge_xyz_rgb_packing():
    from d3roma_tpu.streaming import merge_xyz_rgb

    xyz = np.array([[1.0, 2.0, 3.0]], np.float32)
    rgb = np.array([[255, 128, 1]], np.uint8)
    packed = merge_xyz_rgb(xyz, rgb)
    assert packed.dtype.itemsize == 16
    assert packed["rgb"][0] == (255 << 16) | (128 << 8) | 1


def test_crop_workspace():
    from d3roma_tpu.streaming import crop_workspace

    pts = np.array([[0, 0, 0.5], [2, 2, 2.0]], np.float32)
    kept, _ = crop_workspace(pts, None)
    assert len(kept) == 1


def test_isaac_replicator_math_without_isaac():
    """Pose sampling + material protocol are pure math; the real Omni
    backend gates on the Isaac import (see tests/test_isaac_replicator.py
    for the full protocol run on the simulation backend)."""
    from d3roma_tpu.synthetic.isaac import (
        IsaacReplicator,
        ReplicatorConfig,
        assign_materials,
        camera_orbit_poses,
    )

    rng = np.random.default_rng(0)
    cfg = ReplicatorConfig()
    poses = camera_orbit_poses(rng, np.array([0.0, 0, 0.8]), 8,
                               cfg.hemisphere_radius, cfg.hemisphere_elevation)
    assert len(poses) == 8
    for pos, quat in poses:
        assert pos[2] > 0.8  # above the surface
        np.testing.assert_allclose(np.linalg.norm(quat), 1.0, atol=1e-5)
    mats = assign_materials(rng, 20, cfg.material_probs)
    assert set(mats) <= {"diffuse", "specular", "transparent"}
    with pytest.raises(ImportError, match="Isaac Sim is not installed"):
        IsaacReplicator(cfg)  # default backend = OmniBackend


def test_file_replay_accepts_bundled_rgb_naming(tmp_path):
    """The bundled capture (datasets/Real/xiaomeng) names frames
    0000_rgb.png; FileReplaySource must replay that layout too, which is
    what `camera_test.py --replay datasets/Real/xiaomeng` drives."""
    import cv2

    from d3roma_tpu.streaming import FileReplaySource

    rng = np.random.default_rng(0)
    for i in range(2):
        cv2.imwrite(str(tmp_path / f"{i:04d}_rgb.png"),
                    rng.integers(0, 255, (24, 32, 3), np.uint8))
        cv2.imwrite(str(tmp_path / f"{i:04d}_depth.png"),
                    rng.integers(400, 2000, (24, 32)).astype(np.uint16))
    src = FileReplaySource(str(tmp_path))
    rgb, depth = next(src.frames())
    assert rgb.shape == (24, 32, 3) and depth.shape == (24, 32)
    assert 0.3 < float(depth.mean()) < 2.1  # mm -> meters conversion


# ---------------------------------------------------------------------- #
# Startup compile-probe (round 5 — VERDICT r4 #6)
# ---------------------------------------------------------------------- #


def test_streaming_probe_falls_through_to_first_compilable(tmp_path, monkeypatch):
    """select_streaming_mode probes candidates in preference order in a
    child process and picks the first that exits 0; failures and
    timeouts burn a slot, not the server. Child invocation is stubbed at
    subprocess level (the real probe child builds the full pipeline)."""
    import subprocess as sp

    from d3roma_tpu.streaming import probe

    calls = []

    def fake_run(cmd, timeout=None, capture_output=None):
        mode = [a.split("=")[1] for a in cmd
                if a.startswith("task.fast_inference=")][0]
        calls.append(mode)

        class R:
            returncode = 0 if mode == "dense" else 1
            stderr = b"" if mode == "dense" else b"HTTP 500 tpu_compile"
        return R()

    monkeypatch.setattr(sp, "subprocess", sp, raising=False)
    monkeypatch.setattr(probe.subprocess, "run", fake_run)
    rec = tmp_path / "results.jsonl"
    out = probe.select_streaming_mode(
        ["task=eval_ldm"], records_path=str(rec))
    assert calls == ["latency", "dense"]  # stopped at the winner
    assert out["mode"] == "dense"
    assert "task.fast_inference=dense" in out["overrides"]
    assert out["probe"][0]["ok"] is False
    assert "HTTP 500" in out["probe"][0]["error"]
    assert out["probe"][1]["ok"] is True
    # outcome recorded for perf logs
    import json as _json

    row = _json.loads(rec.read_text().splitlines()[-1])
    assert row["kind"] == "streaming_probe" and row["mode"] == "dense"


def test_streaming_probe_timeout_and_no_winner(tmp_path, monkeypatch):
    import subprocess as sp

    from d3roma_tpu.streaming import probe

    def fake_run(cmd, timeout=None, capture_output=None):
        raise sp.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(probe.subprocess, "run", fake_run)
    out = probe.select_streaming_mode(
        ["task=eval_ldm"], candidates=("latency",), timeout_s=1.0,
        records_path=str(tmp_path / "r.jsonl"))
    assert out["mode"] is None
    assert "timed out" in out["probe"][0]["error"]
    # caller's overrides unchanged when nothing compiled
    assert out["overrides"] == ["task=eval_ldm"]


def test_http_server_metrics_carries_probe_info():
    from d3roma_tpu.streaming import InferenceHTTPServer

    info = {"mode": "dense", "probe": [{"mode": "latency", "ok": False}]}
    srv = InferenceHTTPServer(lambda frames: [f[1] for f in frames],
                              probe_info=info)
    assert srv.metrics["streaming_probe"] == info


def test_fast_inference_dense_mode():
    """'dense' = latency kernels + dynamic int8 projections (the fastest
    batch-1 config that COMPILES when the relay rejects bf16)."""
    from tests.test_calibration import _tiny_latent_pipe

    pipe = _tiny_latent_pipe().fast_inference("dense")
    assert pipe.unet.quant == "dense"
    assert pipe.vae.quant == "dense"
    assert pipe.unet.use_flash_attention == "pallas-self"
