"""The reference's RAFT-heritage stereo readers, ported and REGISTERED
(reference: data/stereo_datasets.py:264-321 — SintelStereo,
FallingThings, TartanAir, and the stereo KITTI class; unregistered in the
reference's own factory, data/data_loader.py:10). Each on-disk format is
fixture-synthesized and driven through the reader + dataset listing +
registry factory."""

import json
import os
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

cv2 = pytest.importorskip("cv2")


def _img(rng, h, w):
    return rng.integers(0, 255, (h, w, 3), np.uint8)


# --------------------------- Sintel ----------------------------------- #


def _write_sintel(root, h=20, w=28, seed=0):
    rng = np.random.default_rng(seed)
    for side in ("clean_left", "clean_right"):
        (root / "training" / side / "alley_1").mkdir(parents=True)
    (root / "training" / "disparities" / "alley_1").mkdir(parents=True)
    (root / "training" / "occlusions" / "alley_1").mkdir(parents=True)
    # RGB packing d = R*4 + G/2^6 + B/2^14 (Sintel SDK)
    r = rng.integers(1, 15, (h, w), np.uint8)
    g = rng.integers(0, 255, (h, w), np.uint8)
    b = rng.integers(0, 255, (h, w), np.uint8)
    disp = r * 4.0 + g / 64.0 + b / 16384.0
    cv2.imwrite(str(root / "training" / "disparities" / "alley_1" /
                    "frame_0001.png"), np.stack([b, g, r], -1))
    occ = np.zeros((h, w), np.uint8)
    occ[:3] = 255  # occluded band
    cv2.imwrite(str(root / "training" / "occlusions" / "alley_1" /
                    "frame_0001.png"), occ)
    for side in ("clean_left", "clean_right"):
        cv2.imwrite(str(root / "training" / side / "alley_1" /
                        "frame_0001.png"), _img(rng, h, w))
    return disp, occ


def test_sintel_reader_and_listing(tmp_path):
    from d3roma_tpu.data.datasets import SintelStereo
    from d3roma_tpu.utils.frame_utils import readDispSintelStereo

    disp, occ = _write_sintel(tmp_path)
    got, valid = readDispSintelStereo(
        str(tmp_path / "training" / "disparities" / "alley_1" /
            "frame_0001.png"))
    np.testing.assert_allclose(got, disp, atol=1e-4)
    assert not valid[:3].any() and valid[3:].all()

    ds = SintelStereo(root=str(tmp_path))
    assert len(ds) == 1
    left, right = ds.image_list[0]
    assert "clean_left" in left and "clean_right" in right
    item = ds[0]
    m = item["valid"][..., 0] > 0
    assert m.any() and not m[:3].any()
    np.testing.assert_allclose(item["disp"][..., 0][m],
                               disp[m.reshape(disp.shape)], atol=1e-4)


# ------------------------ FallingThings ------------------------------- #


def test_fallingthings_reader_and_listing(tmp_path):
    from d3roma_tpu.data.datasets import FallingThings
    from d3roma_tpu.utils.frame_utils import readDispFallingThings

    rng = np.random.default_rng(1)
    scene = tmp_path / "mixed" / "kitchen_0"
    scene.mkdir(parents=True)
    h, w, fx = 16, 24, 768.16
    depth = rng.integers(3000, 20000, (h, w)).astype(np.uint16)  # 0.1 mm
    cv2.imwrite(str(scene / "000000.left.depth.png"), depth)
    cv2.imwrite(str(scene / "000000.left.jpg"), _img(rng, h, w))
    cv2.imwrite(str(scene / "000000.right.jpg"), _img(rng, h, w))
    (scene / "_camera_settings.json").write_text(json.dumps(
        {"camera_settings": [{"intrinsic_settings": {"fx": fx}}]}))
    (tmp_path / "filenames.txt").write_text("mixed/kitchen_0/000000.left.jpg\n")

    got, valid = readDispFallingThings(str(scene / "000000.left.depth.png"))
    np.testing.assert_allclose(got, fx * 600.0 / depth, rtol=1e-5)
    assert valid.all()

    ds = FallingThings(root=str(tmp_path))
    assert len(ds) == 1
    assert ds.image_list[0][1].endswith("right.jpg")
    item = ds[0]
    assert (item["disp"][..., 0] > 0).all()


# -------------------------- TartanAir --------------------------------- #


def test_tartanair_reader_listing_and_filters(tmp_path):
    from d3roma_tpu.data.datasets import TartanAir
    from d3roma_tpu.utils.frame_utils import readDispTartanAir

    rng = np.random.default_rng(2)
    h, w = 12, 18
    names = []
    for env in ("abandonedfactory/Easy", "seasonsforest_winter/Easy",
                "hospital/Hard"):
        img_dir = tmp_path / env / "P001" / "image_left"
        dep_dir = tmp_path / env / "P001" / "depth_left"
        img_dir.mkdir(parents=True)
        dep_dir.mkdir(parents=True)
        name = f"{env}/P001/image_left/000000_left.png"
        cv2.imwrite(str(tmp_path / name), _img(rng, h, w))
        right = name.replace("_left", "_right")
        (tmp_path / right).parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(tmp_path / right), _img(rng, h, w))
        depth = rng.uniform(0.5, 10.0, (h, w)).astype(np.float32)
        np.save(str(dep_dir / "000000_left_depth.npy"), depth)
        names.append(name)
    (tmp_path / "tartanair_filenames.txt").write_text("\n".join(names))

    depth0 = np.load(str(tmp_path / "abandonedfactory/Easy/P001/depth_left/"
                         "000000_left_depth.npy"))
    got, valid = readDispTartanAir(
        str(tmp_path / "abandonedfactory/Easy/P001/depth_left/"
            "000000_left_depth.npy"))
    np.testing.assert_allclose(got, 80.0 / depth0, rtol=1e-5)
    assert valid.all()

    ds = TartanAir(root=str(tmp_path))
    # seasonsforest_winter/Easy excluded (reference hard-codes the filter)
    assert len(ds) == 2
    assert all("seasonsforest_winter" not in p for p, _ in ds.image_list)
    item = ds[0]
    assert (item["disp"][..., 0] > 0).all()

    ds_kw = TartanAir(root=str(tmp_path), keywords=["hospital"])
    assert len(ds_kw) == 1


# ------------------------- KITTI stereo ------------------------------- #


def test_kitti_stereo_listing_and_dummy_gt(tmp_path):
    from d3roma_tpu.data.datasets import KITTIStereo

    rng = np.random.default_rng(3)
    h, w = 14, 20
    for sub in ("image_2", "image_3", "disp_occ_0"):
        (tmp_path / "training" / sub).mkdir(parents=True)
    cv2.imwrite(str(tmp_path / "training" / "image_2" / "000000_10.png"),
                _img(rng, h, w))
    cv2.imwrite(str(tmp_path / "training" / "image_3" / "000000_10.png"),
                _img(rng, h, w))
    disp = rng.uniform(2, 60, (h, w)).astype(np.float32)
    sparse = (rng.random((h, w)) < 0.6)
    enc = np.where(sparse, (disp * 256).astype(np.uint16), 0)
    cv2.imwrite(str(tmp_path / "training" / "disp_occ_0" / "000000_10.png"),
                enc)

    ds = KITTIStereo(root=str(tmp_path))
    assert len(ds) == 1
    item = ds[0]
    m = item["valid"][..., 0] > 0
    assert m.sum() == sparse.sum()
    np.testing.assert_allclose(item["disp"][..., 0][m],
                               (enc[sparse] / 256.0), atol=1e-3)

    # testing image_set: no GT on disk -> every frame maps to the fixed
    # training dummy path (reference stereo_datasets.py:318 semantics)
    (tmp_path / "testing" / "image_2").mkdir(parents=True)
    (tmp_path / "testing" / "image_3").mkdir(parents=True)
    cv2.imwrite(str(tmp_path / "testing" / "image_2" / "000001_10.png"),
                _img(rng, h, w))
    cv2.imwrite(str(tmp_path / "testing" / "image_3" / "000001_10.png"),
                _img(rng, h, w))
    ds_test = KITTIStereo(root=str(tmp_path), image_set="testing")
    assert ds_test.disparity_list[0].endswith("disp_occ_0/000085_10.png")


# --------------------------- registry --------------------------------- #


def test_registry_reaches_raft_datasets(tmp_path, monkeypatch):
    """`task.train_dataset=[SintelStereo]` etc. must resolve through
    create_dataset (the reference never registered these classes —
    docs/PARITY.md records the deliberate divergence)."""
    from d3roma_tpu.config import compose
    from d3roma_tpu.data.loader import STEREO_DATASETS, create_dataset

    for name in ("SintelStereo", "FallingThings", "TartanAir",
                 "KITTIStereo"):
        assert name in STEREO_DATASETS

    _write_sintel(tmp_path / "datasets" / "SintelStereo")
    monkeypatch.chdir(tmp_path)
    config = compose(["task=eval_ldm_mixed_rgb+raw"]).task
    ds = create_dataset(config, "SintelStereo", "val")
    assert len(ds) == 1
