"""Isaac replicator protocol tests (no Isaac install needed).

The orchestration (d3roma_tpu/synthetic/isaac/replicator.py) is written
against the backend interface, so the full reference protocol —
surfaces -> settle -> materials -> hemisphere poses -> GT pass -> rgb/ir
pass with projector toggling -> ticked writers (reference:
isaacsim/replicate/std_object.py:200-322, custom_writer.py:18-247) —
executes here on the procedural SimBackend and writes real files.
"""

import glob
import json
import os

import numpy as np
import pytest

from d3roma_tpu.synthetic.isaac import (
    ColorWriter,
    FileBackend,
    FrameTicker,
    GtWriter,
    IRWriter,
    IsaacReplicator,
    ReplicatorConfig,
    SimBackend,
    look_at_quaternion,
    obb_corners,
    sample_material_spec,
    sample_scene_materials,
    surface_center_from_obb,
)


# --------------------------- geometry --------------------------------- #


def test_obb_corners_axis_aligned():
    c = obb_corners(np.zeros(3), np.eye(3), np.array([1.0, 2.0, 3.0]))
    assert c.shape == (8, 3)
    np.testing.assert_allclose(
        np.abs(c), np.broadcast_to(np.abs(c[0]), c.shape), err_msg="symmetric"
    )
    np.testing.assert_allclose(sorted(np.unique(np.abs(c[:, 0]))), [1.0])
    np.testing.assert_allclose(sorted(np.unique(np.abs(c[:, 2]))), [3.0])


def test_surface_center_is_top_face_mean():
    centroid = np.array([1.0, 2.0, 0.5])
    he = np.array([0.4, 0.3, 0.25])
    pos, meta = surface_center_from_obb(centroid, np.eye(3), he)
    # the reference picks corners [2,3,6,7]: +axis1 side of the box
    np.testing.assert_allclose(pos, [1.0, 2.3, 0.5], atol=1e-9)
    assert meta["orientation"].shape == (4,)


def test_look_at_quaternion_faces_target():
    pos = np.array([1.0, 1.0, 2.0])
    target = np.array([0.0, 0.0, 0.5])
    q = look_at_quaternion(pos, target)
    np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-9)
    # rotate camera -z by q: should point at the target
    w, x, y, z = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])
    fwd = R @ np.array([0.0, 0.0, -1.0])
    expect = (target - pos) / np.linalg.norm(target - pos)
    np.testing.assert_allclose(fwd, expect, atol=1e-9)


# --------------------------- materials -------------------------------- #


def test_material_specs_have_class_fields():
    rng = np.random.default_rng(0)
    spec = sample_material_spec(rng, "specular")
    assert spec["mdl"] == "OmniPBR.mdl"
    assert 0.7 <= spec["metallic_constant"] <= 1.0
    spec = sample_material_spec(rng, "transparent")
    assert spec["mdl"] == "OmniGlass.mdl" and 1.4 <= spec["glass_ior"] <= 1.55
    spec = sample_material_spec(rng, "diffuse")
    assert len(spec["diffuse_color_constant"]) == 3
    specs = sample_scene_materials(rng, 30, (0.4, 0.3, 0.3))
    assert {s["class"] for s in specs} <= {"diffuse", "specular", "transparent"}


# --------------------------- writers ---------------------------------- #


def test_writers_gate_on_ticker_phase(tmp_path):
    fb = FileBackend(str(tmp_path))
    ticker = FrameTicker()
    cw = ColorWriter(fb, ticker)
    iw = IRWriter(fb, ticker)
    rgb = np.zeros((8, 10, 3), np.uint8)

    ticker.phase = "ir"
    cw.write({"rgb_RenderProduct_CameraRGB": rgb})  # wrong phase: no file
    assert not glob.glob(str(tmp_path / "*_color.png"))
    ticker.phase = "rgb"
    cw.write({"rgb_RenderProduct_CameraRGB": rgb})
    assert os.path.exists(tmp_path / "0000_color.png")

    ticker.phase = "ir"
    iw.write({"rgb_Camera01": rgb, "rgb_Camera02": rgb})
    assert os.path.exists(tmp_path / "0000_ir_l.png")
    assert os.path.exists(tmp_path / "0000_ir_r.png")


def test_gt_writer_dup_suppression_and_disparity(tmp_path):
    from d3roma_tpu.utils.exr import read_exr

    cfg = ReplicatorConfig()
    fb = FileBackend(str(tmp_path))
    ticker = FrameTicker()
    gw = GtWriter(fb, ticker, render_disparity=True,
                  depth_sensor_cfg=cfg.depth_sensor_cfg)
    depth = np.full((6, 8), 2.0, np.float32)

    ticker.phase, ticker.step = "gt", 1
    gw.write({"distance_to_image_plane": depth})
    gw.write({"distance_to_image_plane": depth})  # duplicate tick: suppressed
    ticker.step = 2
    gw.write({"distance_to_image_plane": depth})
    seqs = sorted(glob.glob(str(tmp_path / "*_depth.exr")))
    assert [os.path.basename(s) for s in seqs] == ["0000_depth.exr", "0001_depth.exr"]

    # disparity = fxb / depth with fxb = focal * 0.055 (custom_writer.py:107-118)
    focal = cfg.resolution[0] / (2 * np.tan(np.radians(cfg.fov_deg) / 2))
    disp = read_exr(str(tmp_path / "0000_disp.exr"))
    np.testing.assert_allclose(disp, focal * 0.055 / 2.0, rtol=1e-4)


def test_gt_writer_rejects_wrong_baseline():
    cfg = ReplicatorConfig(baseline=0.06)
    with pytest.raises(AssertionError, match="baseline"):
        GtWriter(FileBackend("/tmp"), FrameTicker(), render_disparity=True,
                 depth_sensor_cfg=cfg.depth_sensor_cfg)


# --------------------------- full protocol ---------------------------- #


def test_replicator_start_end_to_end(tmp_path):
    """The complete protocol on the SimBackend: two surfaces, continuous
    sequence ids, HISS layout on disk, GT/photo passes geometrically
    consistent."""
    from d3roma_tpu.synthetic.procedural import SceneConfig
    from d3roma_tpu.utils.exr import read_exr

    cfg = ReplicatorConfig(out_root=str(tmp_path / "hiss"), frames_per_surface=3,
                           resolution=(64, 48), render_disparity=True)
    backend = SimBackend(SceneConfig(height=48, width=64), seed=0)
    rep = IsaacReplicator(cfg, seed=0, backend=backend)
    n = rep.start(max_surfaces=2)
    assert n == 6

    out = tmp_path / "hiss"
    for i in range(6):
        for suffix in ("color.png", "ir_l.png", "ir_r.png", "depth.exr", "disp.exr"):
            assert os.path.exists(out / f"{i:04d}_{suffix}"), f"{i:04d}_{suffix}"
    # per-surface meta with material protocol recorded
    meta = json.loads((out / "meta_0.json").read_text())
    assert meta["surface"]["category"] == "table"
    assert all(m["material"] in ("diffuse", "specular", "transparent")
               for m in meta["models"])
    assert os.path.exists(out / "meta_3.json")

    # GT depth and written disparity agree through fxb
    depth = read_exr(str(out / "0002_depth.exr"))
    disp = read_exr(str(out / "0002_disp.exr"))
    focal = cfg.resolution[0] / (2 * np.tan(np.radians(cfg.fov_deg) / 2))
    np.testing.assert_allclose(disp, focal * 0.055 / np.maximum(depth, 1e-9),
                               rtol=1e-3)

    # the photo pass saw the projector ON only for IR frames (SimBackend
    # asserts this inside render()); ir files are grayscale
    import cv2

    ir = cv2.imread(str(out / "0000_ir_l.png"), -1)
    assert ir.ndim == 2

    # the HISS loaders can list the output (depth exr + stereo pair present)
    assert len(glob.glob(str(out / "*_ir_l.png"))) == 6
