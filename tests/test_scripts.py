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
