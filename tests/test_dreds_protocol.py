"""DREDS domain-randomization protocol distributions (VERDICT r4 #5).

Asserts the seedable protocol module reproduces the reference's
randomization distributions (dreds_renderer.py:458-540,
replicate/std_object.py:25-110, scene_replicator.py:283-362) and that
the replicator's rendered HISS tree carries the DR record.
"""

import json
import os

import numpy as np
import pytest

from d3roma_tpu.synthetic.isaac.dreds_protocol import (
    CLASS_SCALE_RANGES,
    LIGHT_TABLES,
    dreds_material_type,
    dreds_select_models,
    sample_lighting,
    sample_placement,
    tick_intensities,
)


def test_material_type_distribution_transparent_capable():
    """bottle (transparent+specular capable): raw 1/8 + 1/8(fallthrough)
    -> expected raw .125, diffuse .125, transparent .5, specular .25."""
    rng = np.random.default_rng(0)
    n = 6000
    counts = {}
    for _ in range(n):
        t = dreds_material_type(rng, "bottle")
        counts[t] = counts.get(t, 0) + 1
    freq = {k: v / n for k, v in counts.items()}
    assert abs(freq["raw"] - 0.125) < 0.03
    assert abs(freq["diffuse"] - 0.125) < 0.03
    assert abs(freq["transparent"] - 0.5) < 0.04
    assert abs(freq["specular"] - 0.25) < 0.04


def test_material_type_distribution_diffuse_only_class():
    """camera (neither transparent- nor specular-capable): raw 1/4,
    diffuse 3/4."""
    rng = np.random.default_rng(1)
    n = 4000
    counts = {}
    for _ in range(n):
        t = dreds_material_type(rng, "camera")
        counts[t] = counts.get(t, 0) + 1
    freq = {k: v / n for k, v in counts.items()}
    assert set(freq) == {"raw", "diffuse"}
    assert abs(freq["raw"] - 0.25) < 0.04
    assert abs(freq["diffuse"] - 0.75) < 0.04


def _catalog():
    cat = []
    for cls in ("bottle", "bowl", "mug", "can", "car", "camera"):
        for i in range(3):
            cat.append({"class_name": cls, "instance_name": f"{cls}_{i}",
                        "instance_path": f"/cad/{cls}/{i}.usd"})
    for i in range(5):
        cat.append({"class_name": "other", "instance_name": f"other_{i}",
                    "instance_path": f"/cad/other/{i}.usd"})
    return cat


def test_select_models_protocol_counts_and_scales():
    rng = np.random.default_rng(2)
    for _ in range(50):
        models = dreds_select_models(rng, _catalog())
        classes = [m["class_name"] for m in models]
        # exactly one instance per transparent-capable class, always
        for cls in ("bottle", "bowl", "mug"):
            assert classes.count(cls) == 1
        named = [c for c in classes if c not in ("bottle", "bowl", "mug",
                                                 "other")]
        distractors = [c for c in classes if c == "other"]
        assert 1 <= len(named) <= 4
        assert 1 <= len(distractors) <= 3
        # protocol scale ranges per class; unique instance ids
        for m in models:
            lo, hi = CLASS_SCALE_RANGES.get(m["class_name"],
                                            CLASS_SCALE_RANGES["other"])
            assert lo <= m["scale"] <= hi
            assert m["material_type"] in ("raw", "diffuse", "specular",
                                          "transparent")
        assert len({m["instance_id"] for m in models}) == len(models)


def test_placement_distribution():
    rng = np.random.default_rng(3)
    anchor = np.array([1.0, 2.0, 0.8])
    xs, ys = [], []
    for i in range(500):
        pos, euler = sample_placement(rng, anchor, i % 7)
        assert abs(pos[0] - anchor[0]) <= 0.3
        assert abs(pos[1] - anchor[1]) <= 0.3
        assert pos[2] == pytest.approx(anchor[2] + ((i % 7) + 1) * 0.05)
        assert 0 <= euler[0] <= np.pi / 2
        assert 0 <= euler[1] <= np.pi / 2
        assert 0 <= euler[2] <= np.pi
        xs.append(pos[0]); ys.append(pos[1])
    # actually spread over the scatter range, not degenerate
    assert np.std(xs) > 0.1 and np.std(ys) > 0.1


def test_sample_lighting_tables():
    rng = np.random.default_rng(4)
    for lt in ("Sphere", "Disk", "Rect"):
        d = sample_lighting(rng, (lt,))
        tab = LIGHT_TABLES[lt]
        assert d["type"] == lt
        on, off = d["intensity"]
        assert tab["intensity_on"][0] <= on <= tab["intensity_on"][1]
        assert tab["intensity_off"][0] <= off <= tab["intensity_off"][1]
        for k in ("radius", "height", "width"):
            if k in tab:
                assert tab[k][0] <= d[k] <= tab[k][1]
        assert d["env_intensity"] == [0.0, 10.0]
    # type selection actually varies over the candidate list
    types = {sample_lighting(rng, ("Sphere", "Disk", "Rect"))["type"]
             for _ in range(50)}
    assert len(types) == 3


def test_tick_intensity_sequences_alternate():
    lighting = {"intensity": [9000.0, 450.0], "env_intensity": [0.0, 10.0]}
    scene, env = tick_intensities(lighting, 3)
    assert scene == [9000.0, 450.0] * 3
    assert env == [0.0, 10.0] * 3


def test_sim_backend_light_tick_dims_rgb():
    """The procedural backend must make the DR observable: an 'off'-level
    scene intensity yields visibly dimmer RGB frames than 'on'."""
    from d3roma_tpu.synthetic.isaac.backend import SimBackend

    b = SimBackend(seed=0)
    b.create_stereo_rig({"fov": 71.3, "resolution": [64, 48],
                         "placement": {}})
    b.create_scene_light(sample_lighting(np.random.default_rng(0)),
                         np.zeros(3))
    b.set_camera_pose(np.array([0.5, 0, 1.0]), np.array([1, 0, 0, 0]))
    b.set_projector(False)
    b.set_scene_light_tick(10000.0, 0.0)
    bright = b.render("rgb")["rgb_RenderProduct_CameraRGB"]
    b.set_scene_light_tick(500.0, 10.0)
    dim = b.render("rgb")["rgb_RenderProduct_CameraRGB"]
    assert float(dim.mean()) < 0.5 * float(bright.mean())


def test_replicator_meta_records_lighting_and_selection(tmp_path):
    """End-to-end tree: the replicated HISS output's meta.json carries
    the per-scene lighting DR draw and the selection mode, and the frame
    files land per the writer contract."""
    from d3roma_tpu.synthetic.isaac.backend import SimBackend
    from d3roma_tpu.synthetic.isaac.replicator import (
        IsaacReplicator,
        ReplicatorConfig,
    )

    cfg = ReplicatorConfig(out_root=str(tmp_path / "HISS"),
                           frames_per_surface=2)
    rep = IsaacReplicator(cfg, seed=0, backend=SimBackend(seed=0))
    n = rep.start(max_surfaces=1)
    assert n == 2
    meta = json.load(open(tmp_path / "HISS" / "meta_0.json"))
    dr = meta["domain_randomization"]
    light = dr["lighting"]
    assert light["type"] in LIGHT_TABLES
    assert len(light["intensity"]) == 2
    assert light["intensity"][0] > light["intensity"][1]  # on > off
    files = sorted(os.listdir(tmp_path / "HISS"))
    for seq in (0, 1):
        assert f"{seq:04d}_color.png" in files
        assert f"{seq:04d}_ir_l.png" in files
        assert f"{seq:04d}_ir_r.png" in files
        assert f"{seq:04d}_depth.exr" in files
