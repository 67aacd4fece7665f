"""Integration tests for the offline tooling CLIs (scripts/)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))


@pytest.fixture
def hiss_tree(tmp_path):
    from d3roma_tpu.synthetic import ProceduralSceneRenderer, SceneConfig, write_hiss_frame

    scene = tmp_path / "HISS" / "train" / "scene_0000"
    r = ProceduralSceneRenderer(SceneConfig(height=96, width=160), seed=0)
    for i in range(2):
        write_hiss_frame(str(scene), i, r.render())
    return tmp_path / "HISS"


def test_stereo_matching_cli(hiss_tree):
    import importlib

    sm = importlib.import_module("stereo_matching")
    # fresh tree has sim depth from the generator; force overwrite via CLI
    sm.main([str(hiss_tree), "--min-disp", "4", "--max-disp", "40",
             "--batch", "2", "--overwrite", "--fx", "223.2", "--baseline", "0.055"])
    outs = list((hiss_tree / "train" / "scene_0000").glob("*_simDepthImage.exr"))
    assert len(outs) == 2
    from d3roma_tpu.utils.exr import read_exr

    depth = read_exr(str(outs[0]))
    assert depth.shape == (96, 160)
    assert (depth >= 0).all() and np.isfinite(depth).all()
    assert (depth > 0).mean() > 0.2  # matcher found a good fraction


def test_check_stereo_cli(hiss_tree, tmp_path):
    from functools import partial

    import importlib

    cs = importlib.import_module("check_stereo")
    from d3roma_tpu.data.datasets import HISS
    from d3roma_tpu.utils import frame_utils
    from d3roma_tpu.utils.camera import Realsense

    cam = Realsense.default_sim(min_depth=0.2, max_depth=3.0)
    cam.change_resolution("160x96")
    ds = HISS(cam, (96, 160), split="train", root=str(hiss_tree),
              reader=partial(frame_utils.readDispReal, cam), seed=0)
    out = str(tmp_path / "bad.txt")
    bad = cs.check(ds, out, ratio=1e9)  # absurd ratio -> nothing flagged
    assert bad == []
    assert os.path.exists(out)


def test_check_sceneflow_cli(tmp_path):
    import importlib

    csf = importlib.import_module("check_sceneflow")
    rng = np.random.default_rng(0)
    gt = rng.uniform(5, 50, (32, 48)).astype(np.float32)
    good_sim = gt + rng.normal(0, 0.2, gt.shape).astype(np.float32)
    bad_sim = gt + rng.normal(0, 30, gt.shape).astype(np.float32)
    out = str(tmp_path / "bad_his.txt")
    bad = csf.check(
        [("good.png", gt, good_sim), ("bad.png", gt, bad_sim)], out,
        precision_threshold=0.2,
    )
    assert bad == ["bad.png"]
    assert open(out).read().strip() == "bad.png"


def test_evaluate_cli_end_to_end(tmp_path, monkeypatch):
    """Full evaluate.py CLI: exported pipeline dir + synthetic Real data."""
    import cv2
    import jax
    import jax.numpy as jnp

    from d3roma_tpu.guidance import FlowGuidance
    from d3roma_tpu.models import UNet2D
    from d3roma_tpu.ops import Normalizer, ScheduleConfig
    from d3roma_tpu.pipelines import GuidedDiffusionPipeline, SamplerSpec

    # synthetic Real capture
    scene = tmp_path / "datasets" / "Real" / "synth"
    scene.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(2):
        cv2.imwrite(str(scene / f"{i:04d}_color.png"),
                    rng.integers(0, 255, (96, 128, 3), np.uint8))
        cv2.imwrite(str(scene / f"{i:04d}_depth.png"),
                    rng.integers(400, 2000, (96, 128)).astype(np.uint16))
        ir = rng.integers(0, 255, (96, 128), np.uint8)
        cv2.imwrite(str(scene / f"{i:04d}_ir_l.png"), ir)
        cv2.imwrite(str(scene / f"{i:04d}_ir_r.png"), ir)

    # tiny exported pipeline
    sched = ScheduleConfig(num_train_timesteps=8, prediction_type="sample")
    unet = UNet2D(in_channels=5, out_channels=1, block_out_channels=(8, 16),
                  down_block_types=("DownBlock2D", "DownBlock2D"),
                  up_block_types=("UpBlock2D", "UpBlock2D"),
                  layers_per_block=1, norm_groups=4)
    params = jax.jit(unet.init)(jax.random.PRNGKey(0),
                                jnp.zeros((1, 32, 64, 5)), jnp.array([0]))["params"]
    pipe = GuidedDiffusionPipeline(
        unet=unet, unet_params=params, spec=SamplerSpec("my_ddpm", sched),
        guidance=FlowGuidance(flow_guidance_weight=0.0),
        normalizer=Normalizer(ssi=True, safe_ssi=False),
    )
    pretrained = str(tmp_path / "pre")
    pipe.save_pretrained(pretrained)

    # patch the Real dataset at the synthetic root
    from functools import partial

    import d3roma_tpu.data.loader as L
    from d3roma_tpu.data.datasets import Real
    from d3roma_tpu.utils import frame_utils
    from d3roma_tpu.utils.camera import Realsense

    def patched(config, name, split):
        cam = Realsense.default_real("fxm")
        cam.change_resolution(config.camera_resolution)
        return Real(cam, tuple(config.image_size), split=split,
                    root=str(tmp_path / "datasets" / "Real"), scene="synth",
                    reader=partial(frame_utils.readDispReal, cam), seed=0)

    monkeypatch.setattr(L, "create_dataset", patched)
    monkeypatch.chdir(tmp_path)

    import evaluate as eval_cli

    eval_cli.main([
        "task=train_dreds_reprod",
        f"task.resume_pretrained={pretrained}",
        "task.ldm=false", "task.depth_channels=1",
        "task.cond_channels=rgb+raw", "task.camera_resolution=128x96",
        "task.image_size=[32,64]", "task.divis_by=32",
        "task.num_train_timesteps=8", "task.num_inference_timesteps=4",
        "task.num_intermediate_images=2", "task.eval_dataset=[Real]",
        "task.eval_batch_size=1", "task.eval_num_batch=1",
        "task.ssi=true", "task.safe_ssi=false",
        "task.plot_error_map=false", "task.write_pcd=false",
        f"task.eval_output={tmp_path}/evalout",
    ])
    assert os.path.exists(tmp_path / "evalout" / "eval.log")
    log = open(tmp_path / "evalout" / "eval.log").read()
    assert "metrics" in log and "epe" in log


def test_evaluate_cli_guidance_sweep_and_artifacts(tmp_path, monkeypatch):
    """The CLI sweeps flow_guidance_weights with per-weight metric log lines
    (reference: evaluate.py:188-194) and writes the denoise-grid artifact
    (reference: evaluate.py:213-226)."""
    import cv2
    import jax
    import jax.numpy as jnp

    from d3roma_tpu.guidance import FlowGuidance
    from d3roma_tpu.models import UNet2D
    from d3roma_tpu.ops import Normalizer, ScheduleConfig
    from d3roma_tpu.pipelines import GuidedDiffusionPipeline, SamplerSpec

    scene = tmp_path / "datasets" / "Real" / "synth"
    scene.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(2):
        cv2.imwrite(str(scene / f"{i:04d}_color.png"),
                    rng.integers(0, 255, (96, 128, 3), np.uint8))
        cv2.imwrite(str(scene / f"{i:04d}_depth.png"),
                    rng.integers(400, 2000, (96, 128)).astype(np.uint16))
        ir = rng.integers(0, 255, (96, 128), np.uint8)
        cv2.imwrite(str(scene / f"{i:04d}_ir_l.png"), ir)
        cv2.imwrite(str(scene / f"{i:04d}_ir_r.png"), ir)

    sched = ScheduleConfig(num_train_timesteps=8, prediction_type="sample")
    unet = UNet2D(in_channels=5, out_channels=1, block_out_channels=(8, 16),
                  down_block_types=("DownBlock2D", "DownBlock2D"),
                  up_block_types=("UpBlock2D", "UpBlock2D"),
                  layers_per_block=1, norm_groups=4)
    params = jax.jit(unet.init)(jax.random.PRNGKey(0),
                                jnp.zeros((1, 32, 64, 5)), jnp.array([0]))["params"]
    pipe = GuidedDiffusionPipeline(
        unet=unet, unet_params=params, spec=SamplerSpec("my_ddpm", sched),
        guidance=FlowGuidance(flow_guidance_weight=0.0,
                              flow_guidance_mode="imputation"),
        normalizer=Normalizer(ssi=True, safe_ssi=False),
    )
    pretrained = str(tmp_path / "pre")
    pipe.save_pretrained(pretrained)

    from functools import partial

    import d3roma_tpu.data.loader as L
    from d3roma_tpu.data.datasets import Real
    from d3roma_tpu.utils import frame_utils
    from d3roma_tpu.utils.camera import Realsense

    def patched(config, name, split):
        cam = Realsense.default_real("fxm")
        cam.change_resolution(config.camera_resolution)
        return Real(cam, tuple(config.image_size), split=split,
                    root=str(tmp_path / "datasets" / "Real"), scene="synth",
                    reader=partial(frame_utils.readDispReal, cam), seed=0)

    monkeypatch.setattr(L, "create_dataset", patched)
    monkeypatch.chdir(tmp_path)

    import evaluate as eval_cli

    eval_cli.main([
        "task=train_dreds_reprod",
        f"task.resume_pretrained={pretrained}",
        "task.ldm=false", "task.depth_channels=1",
        "task.cond_channels=rgb+raw", "task.camera_resolution=128x96",
        "task.image_size=[32,64]", "task.divis_by=32",
        "task.num_train_timesteps=8", "task.num_inference_timesteps=4",
        "task.num_intermediate_images=2", "task.eval_dataset=[Real]",
        "task.eval_batch_size=1", "task.eval_num_batch=1",
        "task.ssi=true", "task.safe_ssi=false",
        "task.flow_guidance_weights=[0.0,1.0]",
        "task.flow_guidance_mode=imputation",
        "task.plot_error_map=true", "task.write_pcd=false",
        "task.plot_denoised_images=true",
        f"task.eval_output={tmp_path}/evalout2",
    ])
    log = open(tmp_path / "evalout2" / "eval.log").read()
    # per-weight metric lines for BOTH weights + per-weight aggregates
    assert "guidance_weight=0 " in log or "guidance_weight=0\n" in log or "guidance_weight=0 epe" in log or "guidance_weight=0" in log
    assert "guidance_weight=1" in log
    assert log.count("aggregate") >= 2
    # denoise-grid artifact written by the eval loop
    import glob as _glob

    assert _glob.glob(str(tmp_path / "evalout2" / "Real" / "*_denoised.png"))
    assert _glob.glob(str(tmp_path / "evalout2" / "Real" / "*_pred_disp.png"))


def test_sharding_report_cli(capsys):
    """sharding_report prints the TP partition summary for a small
    pixel config without touching any device."""
    import importlib

    sr = importlib.import_module("sharding_report")
    from d3roma_tpu.config import compose

    base = compose([
        "task=train_dreds_reprod",
        "task.tensor_parallel=2",
        "task.block_out_channels=[8,16]",
    ])
    sr.report(base.task, 2, show_leaves=False)
    out = capsys.readouterr().out
    assert "[unet]" in out and "tensor_parallel=2" in out
    assert "per-device params memory" in out
    # tp=1 path: everything replicated
    sr.report(base.task, 1)
    out = capsys.readouterr().out
    assert "0/" in out
