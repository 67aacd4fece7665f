"""Tests for camera geometry, point clouds, file IO, viz."""

import os

import numpy as np
import pytest

from d3roma_tpu.utils import (
    DepthCamera,
    K,
    Realsense,
    RGBDCamera,
    backproject_depth,
    read_ply,
    voxel_downsample,
    write_ply,
)
from d3roma_tpu.utils.frame_utils import (
    readDispReal,
    readFlow,
    readPFM,
    writeFlow,
    writePFM,
    interpolate_missing_pixels,
)


def test_K_scaling_and_inverse():
    k = K(400.0, 410.0, 320.0, 180.0)
    k2 = k * 0.5
    assert k2.fx == 200.0 and k2.cy == 90.0
    np.testing.assert_allclose(k.inv @ k.arr, np.eye(3), atol=1e-12)


def test_realsense_disparity_window():
    cam = Realsense.default_real("fxm")
    assert cam.resolution == (360, 640)
    # min/max disp derived from depth range (reference camera.py:110-125)
    assert cam.min_disp == pytest.approx(cam.K_depth.fx * cam.baseline / cam.max_depth)
    assert cam.max_disp == pytest.approx(cam.K_depth.fx * cam.baseline / cam.min_depth)
    assert cam.baseline > 0.05  # ~5.5cm stereo baseline, sign-flipped by _T_fc
    # normalize/unnormalize round trip with clipping
    d = np.linspace(cam.min_disp + 0.1, cam.max_disp - 0.1, 10)
    nd = cam.normalize_disp(d)
    np.testing.assert_allclose(cam.unnormalize_disp(nd), d, rtol=1e-6)


def test_change_resolution_once():
    cam = Realsense.default_real("wsl")
    fx0 = cam.K_color.fx
    cam.change_resolution("320x180")
    assert cam.H == 180 and cam.W == 320
    assert cam.K_color.fx == pytest.approx(fx0 / 2)
    with pytest.raises(RuntimeError):
        cam.change_resolution("640x360")


def test_from_device_factory():
    assert DepthCamera.from_device("clearpose").device == "clearpose"
    assert DepthCamera.from_device("syntodd").device == "syntodd"
    assert DepthCamera.from_device("sim").device == "sim"
    assert DepthCamera.from_device("wsl").device == "wsl"


def test_rgbd_pseudo_baseline_matches_realsense_fxb():
    cam = RGBDCamera.default_clearpose()
    # hack: fxb pinned to 24.54705 (reference camera.py:225-229)
    assert cam.fxb == pytest.approx(24.54705)


def test_sim_camera_fov_focal():
    cam = Realsense.default_sim(fov=90.0)
    # fx = W / (2 tan(fov/2)) = 640/2 = 320
    assert cam.intrinsics["color"][0] == pytest.approx(320.0)


def test_backproject_identity():
    Kmat = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    depth = np.full((48, 64), 2.0, np.float32)
    pts, _ = backproject_depth(depth, Kmat)
    assert pts.shape == (48 * 64, 3)
    np.testing.assert_allclose(pts[:, 2], 2.0)
    # center pixel maps to (0, 0, z)
    center = pts[24 * 64 + 32]
    np.testing.assert_allclose(center, [0, 0, 2.0], atol=1e-5)


def test_ply_roundtrip(tmp_path):
    pts = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
    cols = np.random.default_rng(1).integers(0, 255, size=(100, 3)).astype(np.uint8)
    p = str(tmp_path / "t.ply")
    write_ply(p, pts, cols)
    pts2, cols2 = read_ply(p)
    np.testing.assert_allclose(pts2, pts, rtol=1e-6)
    np.testing.assert_array_equal(cols2, cols)


def test_voxel_downsample():
    pts = np.array([[0.0, 0, 0], [0.01, 0, 0], [1.0, 1, 1]], np.float32)
    out, _ = voxel_downsample(pts, None, 0.1)
    assert out.shape[0] == 2
    np.testing.assert_allclose(sorted(out[:, 0]), [0.005, 1.0], atol=1e-6)


def test_depth_reprojection_identity_extrinsics():
    cam = RGBDCamera.default_clearpose()
    depth = np.full((cam.H, cam.W), 1.5, np.float32)
    out = cam.transform_depth_to_rgb_frame(depth)
    # identity extrinsics + same K -> same depth (up to fill)
    valid = out > 0
    assert valid.mean() > 0.95
    np.testing.assert_allclose(out[valid], 1.5, atol=1e-5)


def test_pfm_roundtrip(tmp_path):
    img = np.random.default_rng(2).normal(size=(12, 16)).astype(np.float32)
    p = str(tmp_path / "t.pfm")
    writePFM(p, img)
    np.testing.assert_allclose(readPFM(p), img, rtol=1e-6)
    # color variant
    img3 = np.random.default_rng(3).normal(size=(8, 10, 3)).astype(np.float32)
    writePFM(str(tmp_path / "c.pfm"), img3)
    np.testing.assert_allclose(readPFM(str(tmp_path / "c.pfm")), img3, rtol=1e-6)


def test_flo_roundtrip(tmp_path):
    uv = np.random.default_rng(4).normal(size=(6, 8, 2)).astype(np.float32)
    p = str(tmp_path / "t.flo")
    writeFlow(p, uv)
    np.testing.assert_allclose(readFlow(p), uv, rtol=1e-6)


def test_readDispReal_missing_file_fault_masking():
    cam = Realsense.default_real("fxm")
    disp, valid, lo, hi = readDispReal(cam, "/nonexistent/file.png")
    # dummy disparity hack (reference: frame_utils.py:170-172)
    assert disp.shape == tuple(cam.resolution)
    assert lo == 0 and hi == 1


def test_readDispReal_depth_png(tmp_path):
    import cv2

    cam = Realsense.default_real("fxm")
    # depth in millimeters, 1m everywhere
    depth_mm = np.full((360, 640), 1000, np.uint16)
    p = str(tmp_path / "0000_depth.png")
    cv2.imwrite(p, depth_mm)
    disp, valid, _, _ = readDispReal(cam, p)
    expect = cam.fxb_depth / 1.0
    np.testing.assert_allclose(disp[valid], expect, rtol=1e-5)
    assert valid.mean() > 0.99


def test_interpolate_missing_pixels():
    img = np.ones((8, 8), np.float32) * 3.0
    mask = np.zeros((8, 8), bool)
    mask[4, 4] = True
    img[4, 4] = 0.0
    out = interpolate_missing_pixels(img, mask)
    assert out[4, 4] == pytest.approx(3.0)


def test_viz_outputs(tmp_path):
    from d3roma_tpu.utils.viz import (
        colorize,
        make_image_grid,
        plot_denoised_images,
        plot_error_map,
        plot_uncertainties,
    )

    gt = np.random.default_rng(5).uniform(size=(16, 16))
    pred = gt + 0.1
    plot_error_map(gt, pred, None, str(tmp_path / "err.png"))
    plot_uncertainties(gt, str(tmp_path / "unc.png"))
    plot_denoised_images([gt, pred], str(tmp_path / "grid.png"))
    assert os.path.exists(tmp_path / "err.png")
    c = colorize(gt)
    assert c.shape == (16, 16, 3) and c.dtype == np.uint8
    canvas = make_image_grid([c, c, c], 2, 2)
    assert canvas.shape == (32, 32, 3)


def test_exr_roundtrip(tmp_path):
    from d3roma_tpu.utils.exr import read_exr, write_exr

    img = np.random.default_rng(9).uniform(0, 5, (17, 23)).astype(np.float32)
    p = str(tmp_path / "t.exr")
    write_exr(p, img)
    np.testing.assert_allclose(read_exr(p), img, rtol=1e-7)

    img3 = np.random.default_rng(10).uniform(size=(8, 9, 3)).astype(np.float32)
    p3 = str(tmp_path / "t3.exr")
    write_exr(p3, img3, ["R", "G", "B"])
    out = read_exr(p3)
    np.testing.assert_allclose(out, img3, rtol=1e-7)


def test_exr_via_frame_utils(tmp_path):
    from d3roma_tpu.utils.exr import write_exr
    from d3roma_tpu.utils.frame_utils import read_gen

    img = np.random.default_rng(11).uniform(0.2, 2.0, (12, 16)).astype(np.float32)
    p = str(tmp_path / "d.exr")
    write_exr(p, img)
    np.testing.assert_allclose(np.asarray(read_gen(p)), img, rtol=1e-7)


def test_native_exr_matches_python(tmp_path):
    from d3roma_tpu.utils import native_io
    from d3roma_tpu.utils.exr import write_exr

    if not native_io.available():
        pytest.skip("no compiler/native lib")
    rng = np.random.default_rng(12)
    img = rng.uniform(0, 3, (33, 47)).astype(np.float32)
    p = str(tmp_path / "n.exr")
    write_exr(p, img)
    np.testing.assert_allclose(native_io.read_exr(p), img, rtol=1e-7)
    # native writer roundtrip through the python reader
    p2 = str(tmp_path / "n2.exr")
    native_io.write_exr(p2, img)
    from d3roma_tpu.utils.exr import read_exr

    np.testing.assert_allclose(read_exr(p2), img, rtol=1e-7)


def test_native_exr_batch(tmp_path):
    from d3roma_tpu.utils import native_io
    from d3roma_tpu.utils.exr import write_exr

    if not native_io.available():
        pytest.skip("no compiler/native lib")
    rng = np.random.default_rng(13)
    paths, imgs = [], []
    for i in range(6):
        img = rng.uniform(0, 2, (20, 30)).astype(np.float32)
        p = str(tmp_path / f"b{i}.exr")
        write_exr(p, img)
        paths.append(p)
        imgs.append(img)
    out, status = native_io.read_exr_batch(paths, num_threads=3)
    assert (status > 0).all()
    np.testing.assert_allclose(out, np.stack(imgs), rtol=1e-7)


def test_flatten_and_seed():
    from d3roma_tpu.utils.misc import flatten, pretty_json, seed_everything

    seed_everything(7)
    a = np.random.rand()
    seed_everything(7)
    assert np.random.rand() == a
    d = flatten({"disp": {"epe": 1.0, "d1": 0.5}, "n": 2})
    assert d == {"disp_epe": 1.0, "disp_d1": 0.5, "n": 2}
    assert "epe" in pretty_json({"epe": 1.0})


def test_named_schedule_sampler_factory():
    from d3roma_tpu.ops.resample import create_named_schedule_sampler
    from d3roma_tpu.ops.schedules import ScheduleConfig

    wfn, state = create_named_schedule_sampler("uniform", 10)
    assert state is None and wfn().shape == (10,)
    tables = ScheduleConfig(num_train_timesteps=10).tables()
    wfn, _ = create_named_schedule_sampler("snr", 10, tables)
    w = np.asarray(wfn())
    assert w[0] > w[-1]  # early timesteps have higher SNR
    wfn, st = create_named_schedule_sampler("loss-second-moment", 10)
    assert st is not None and wfn(st).shape == (10,)
    with pytest.raises(NotImplementedError):
        create_named_schedule_sampler("bogus", 10)


def test_native_exr_rejects_malformed(tmp_path):
    """Hardened decoder: corrupt scanline headers / truncated chlists must
    produce error codes, never out-of-bounds writes (advisor finding on
    native/d3roma_io.cpp decode_exr)."""
    import struct

    from d3roma_tpu.utils import native_io

    if not native_io.available():
        pytest.skip("no compiler/native lib")
    rng = np.random.default_rng(21)
    img = rng.uniform(0, 3, (9, 13)).astype(np.float32)
    good = str(tmp_path / "good.exr")
    native_io.write_exr(good, img)  # NONE compression, y=0..8 blocks
    raw = open(good, "rb").read()

    # (a) block y far outside [0, H) -> heap-offset attack; must error
    pat = struct.pack("<ii", 0, 13 * 4)
    idx = raw.find(pat)
    assert idx > 0
    bad = raw[:idx] + struct.pack("<ii", 2**20, 13 * 4) + raw[idx + 8:]
    p = str(tmp_path / "bad_y.exr")
    open(p, "wb").write(bad)
    with pytest.raises((ValueError, NotImplementedError)):
        native_io.read_exr(p)

    # (b) NONE-compression block smaller than the scanline payload
    bad = raw[:idx] + struct.pack("<ii", 0, 8) + raw[idx + 8:]
    p = str(tmp_path / "bad_size.exr")
    open(p, "wb").write(bad)
    with pytest.raises((ValueError, NotImplementedError)):
        native_io.read_exr(p)

    # (c) negative block size
    bad = raw[:idx] + struct.pack("<ii", 0, -4) + raw[idx + 8:]
    p = str(tmp_path / "bad_neg.exr")
    open(p, "wb").write(bad)
    with pytest.raises((ValueError, NotImplementedError)):
        native_io.read_exr(p)

    # (d) truncated chlist attribute (name with no pixel-type payload)
    hdr = struct.pack("<II", 0x01312F76, 2)
    hdr += b"channels\x00chlist\x00" + struct.pack("<i", 3) + b"Y\x00\x00"
    hdr += b"\x00"
    p = str(tmp_path / "bad_chlist.exr")
    open(p, "wb").write(hdr)
    with pytest.raises((ValueError, NotImplementedError)):
        native_io.read_exr(p)

    # the good file still decodes
    np.testing.assert_allclose(native_io.read_exr(good), img, rtol=1e-7)


def test_jittable_reproject_matches_host():
    """ops/reproject.py agrees with the host-side numpy scatter where the
    scatter is unambiguous (one source per target pixel)."""
    import jax.numpy as jnp

    from d3roma_tpu.ops.reproject import reproject_depth
    from d3roma_tpu.utils.camera import Realsense

    cam = Realsense.default_real("fxm")
    cam.change_resolution("64x36")
    rng = np.random.default_rng(3)
    depth = rng.uniform(0.5, 2.0, (36, 64)).astype(np.float32)
    depth[rng.random((36, 64)) < 0.2] = 0.0  # holes

    host = cam._reproject(depth, cam.K_depth.arr, cam.K_color.arr, cam.T_cl,
                          (36, 64), aggressive_fill=True)
    dev = np.asarray(reproject_depth(
        jnp.asarray(depth), jnp.asarray(cam.K_depth.arr),
        jnp.asarray(cam.K_color.arr), jnp.asarray(cam.T_cl), (36, 64),
        aggressive_fill=True,
    ))
    # same hole pattern; where both are filled the device z-buffer keeps the
    # NEAREST surface, so dev <= host (the numpy scatter keeps an arbitrary
    # last writer); filled values are destination-frame z (close to source depth)
    assert ((host > 0) == (dev > 0)).mean() > 0.97
    both = (host > 0) & (dev > 0)
    assert np.mean(dev[both] <= host[both] + 1e-4) > 0.98
    src = np.sort(depth[depth > 0].ravel())
    idx = np.searchsorted(src, dev[both])
    nearest = src[np.clip(idx, 0, len(src) - 1)]
    nearest_lo = src[np.clip(idx - 1, 0, len(src) - 1)]
    err = np.minimum(np.abs(nearest - dev[both]), np.abs(nearest_lo - dev[both]))
    assert err.max() < 5e-3  # dest-frame z differs from source depth by the transform z-effect


def test_compose_coerces_scientific_notation():
    """YAML 1.1 parses "2e-4" as a string; the override surface must
    coerce by the target field's type (reference hydra coerces by
    annotation)."""
    from d3roma_tpu.config import compose

    base = compose(["task=train_hiss", "task.learning_rate=2e-4",
                    "task.num_epochs=1e2"])
    assert isinstance(base.task.learning_rate, float)
    assert base.task.learning_rate == 2e-4
    assert base.task.num_epochs == 100


def test_native_exr_rgb_channel_order_matches_python(tmp_path):
    """3-channel R/G/B EXR: both decoders must return the SAME (RGB)
    channel order — the native reader used to return raw storage order
    (alphabetical B,G,R), silently swapping channels per host."""
    from d3roma_tpu.utils import native_io
    from d3roma_tpu.utils.exr import read_exr as py_read
    from d3roma_tpu.utils.exr import write_exr

    if not native_io.available():
        pytest.skip("no compiler/native lib")
    rng = np.random.default_rng(5)
    img = rng.uniform(0, 1, (9, 13, 3)).astype(np.float32)
    p = str(tmp_path / "rgb.exr")
    # name the planes explicitly (write_exr's 3-channel default treats
    # input as BGR, cv2-style); storage order is alphabetical either way
    write_exr(p, img, channel_names=["R", "G", "B"])
    a = py_read(p)
    b = native_io.read_exr(p)
    np.testing.assert_allclose(b, a, rtol=1e-7)
    np.testing.assert_allclose(a, img, rtol=1e-7)  # RGB order preserved
    # batch reader uses the same convention
    batch, status = native_io.read_exr_batch([p, p])
    assert (status >= 0).all()  # per-file element counts
    np.testing.assert_allclose(batch[0], img, rtol=1e-7)
    # empty batch is a no-op, not an IndexError
    empty, st = native_io.read_exr_batch([])
    assert empty.size == 0 and st.size == 0


def test_step_timer_phases():
    import jax.numpy as jnp

    from d3roma_tpu.utils.profiling import StepTimer

    t = StepTimer()
    for _ in range(3):
        with t.phase("fwd", block_on=jnp.ones(4)):
            pass
        with t.phase("host"):
            pass
    s = t.summary()
    assert set(s) == {"fwd", "host"}
    assert t.counts["fwd"] == 3 and s["fwd"] >= 0
    t.log()  # smoke: no crash


def test_profiler_trace_writes(tmp_path):
    import jax.numpy as jnp

    from d3roma_tpu.utils.profiling import trace

    d = str(tmp_path / "trace")
    with trace(d):
        jnp.ones(8).block_until_ready()
    import os as _os

    assert _os.path.isdir(d) and _os.listdir(d)
