"""Rendering backends for the Isaac replicator.

The orchestration in replicator.py is written against this small interface
so that everything except the actual omni.* calls is executable and
testable anywhere:

- OmniBackend  — the real Isaac Sim implementation (import-gated; mirrors
  reference isaacsim/replicator.py:38-153, scene_replicator.py:231-431).
- SimBackend   — an in-repo implementation on top of the procedural
  renderer (synthetic/procedural.py). It honors the same protocol —
  surfaces, physics settle, material binding semantics (transparent objects
  vanish from the photo-pass raw sensor, GT pass binds opaque), stereo rig,
  projector toggling — so `IsaacReplicator.start()` runs end-to-end in CI
  and produces real HISS-layout files.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


class SurfaceOBB(Tuple):
    """(centroid [3], axes [3,3], half_extent [3], category str)."""


class OmniBackend:
    """Isaac-Sim-backed implementation. Construction fails cleanly without
    an Isaac install."""

    def __init__(self, headless: bool = True, rt_subframes: int = 32):
        try:
            from isaacsim import SimulationApp  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "Isaac Sim is not installed; use SimBackend (procedural "
                "renderer) or d3roma_tpu.synthetic.procedural.generate_dataset"
            ) from e
        from isaacsim import SimulationApp

        self._app = SimulationApp({"headless": headless})
        import omni.replicator.core as rep
        from omni.isaac.core import World

        self._rep = rep
        self._world = World()
        rep.settings.carb_settings("/omni/replicator/RTSubframes", rt_subframes)
        self._rig = None
        self._projector = None

    # -- scene ----------------------------------------------------- #
    def load_stage(self, usd_path: str) -> None:  # pragma: no cover - Isaac only
        from omni.isaac.core.utils.stage import open_stage

        open_stage(usd_path)

    def hide_prims(self, name_substrings: Sequence[str]) -> None:  # pragma: no cover
        """Hide ceilings/walls etc. (reference: isaacsim/replicator.py:126-153)."""
        import omni.usd
        from pxr import UsdGeom

        stage = omni.usd.get_context().get_stage()
        for prim in stage.Traverse():
            name = prim.GetName().lower()
            if any(s in name for s in name_substrings):
                UsdGeom.Imageable(prim).MakeInvisible()

    def find_surfaces(self) -> List[tuple]:  # pragma: no cover - Isaac only
        """Support surfaces as OBB tuples (reference computes OBBs with
        omni.isaac.core.utils.bounds; the top-face math lives in
        geometry.surface_center_from_obb)."""
        import omni.usd
        from omni.isaac.core.utils.bounds import compute_obb, create_bbox_cache

        stage = omni.usd.get_context().get_stage()
        bb_cache = create_bbox_cache()
        out = []
        for prim in stage.Traverse():
            name = prim.GetName().lower()
            if any(k in name for k in ("table", "desk", "counter", "shelf")):
                centroid, axes, half_extent = compute_obb(bb_cache, prim.GetPrimPath())
                out.append((centroid, axes, half_extent, name))
        return out

    def spawn_objects(self, surface, n: int, rng) -> List[str]:  # pragma: no cover
        """Drop CAD models above the surface with physics enabled
        (reference: std_object.py:18-120)."""
        raise NotImplementedError("CAD spawning requires the DREDS asset set")

    def settle_physics(self, objects, max_rounds: int = 10, steps: int = 250,
                       vel_eps: float = 1e-3) -> bool:  # pragma: no cover
        from omni.isaac.core.prims import RigidPrim

        for _ in range(max_rounds):
            for _ in range(steps):
                self._world.step(render=False)
            if all(np.linalg.norm(RigidPrim(o).get_linear_velocity()) <= vel_eps
                   for o in objects):
                return True
        return False

    def bind_materials(self, objects, specs, opaque: bool) -> None:  # pragma: no cover
        """OmniPBR/OmniGlass binding (reference: std_object.py:120-213;
        opaque=True restores the original materials for the GT pass)."""
        raise NotImplementedError

    def create_stereo_rig(self, sensor_cfg: dict) -> None:  # pragma: no cover
        """RGB + left/right IR cameras + IR projector rect light
        (reference: scene_replicator.py:364-431)."""
        raise NotImplementedError

    def set_camera_pose(self, pos, quat) -> None:  # pragma: no cover
        raise NotImplementedError

    def set_projector(self, on: bool) -> None:  # pragma: no cover
        raise NotImplementedError

    def set_renderer_mode(self, mode: str) -> None:  # pragma: no cover
        if mode == "PathTracing":
            self._rep.settings.set_render_pathtraced()
        else:
            self._rep.settings.set_render_rtx_realtime()

    def render(self, phase: str) -> Dict[str, np.ndarray]:  # pragma: no cover
        self._rep.orchestrator.step(pause_timeline=True)
        raise NotImplementedError("annotator fetch wiring is Isaac-version specific")

    def close(self) -> None:  # pragma: no cover
        self._app.close()


class SimBackend:
    """Procedural-renderer backend with the same protocol.

    One procedural frame is rendered per camera-pose step and served to all
    phases of that step, so color/ir/depth stay geometrically consistent.
    Material semantics honored: in the GT pass (opaque bindings) the depth
    annotator sees every object; in the photo pass, transparent objects
    drop out of the simulated raw sensor exactly as in procedural.py.
    """

    def __init__(self, scene_cfg=None, seed: int = 0):
        from d3roma_tpu.synthetic.procedural import ProceduralSceneRenderer, SceneConfig

        self.cfg = scene_cfg or SceneConfig()
        self._renderer = ProceduralSceneRenderer(self.cfg, seed)
        self._frame: Optional[dict] = None
        self._pose_cache: dict = {}
        self._projector_on = False
        self._opaque = True
        self.renderer_mode = "RayTracedLighting"
        self.hidden: List[str] = []
        self.stage: Optional[str] = None

    # -- scene ----------------------------------------------------- #
    def load_stage(self, usd_path: str) -> None:
        self.stage = usd_path

    def hide_prims(self, name_substrings: Sequence[str]) -> None:
        self.hidden = list(name_substrings)

    def find_surfaces(self) -> List[tuple]:
        """Two synthetic support surfaces (a table and a counter)."""
        eye = np.eye(3)
        return [
            (np.array([0.0, 0.0, 0.4]), eye, np.array([0.5, 0.4, 0.4]), "table"),
            (np.array([1.2, 0.3, 0.5]), eye, np.array([0.6, 0.3, 0.5]), "counter"),
        ]

    def spawn_objects(self, surface, n: int, rng) -> List[str]:
        return [f"obj_{i}" for i in range(n)]

    def settle_physics(self, objects, max_rounds: int = 10, steps: int = 250,
                       vel_eps: float = 1e-3) -> bool:
        return True  # procedural objects are placed at rest

    def bind_materials(self, objects, specs, opaque: bool) -> None:
        self._opaque = opaque

    def create_stereo_rig(self, sensor_cfg: dict) -> None:
        self.sensor_cfg = sensor_cfg

    def set_camera_pose(self, pos, quat) -> None:
        # one procedural frame per pose, cached so the GT pass and the
        # photo pass see the SAME geometry at the same index
        key = np.asarray(pos, np.float64).tobytes()
        if key not in self._pose_cache:
            self._pose_cache[key] = self._renderer.render()
        self._frame = self._pose_cache[key]

    def set_projector(self, on: bool) -> None:
        self._projector_on = on

    def set_renderer_mode(self, mode: str) -> None:
        self.renderer_mode = mode

    def render(self, phase: str) -> Dict[str, np.ndarray]:
        assert self._frame is not None, "set_camera_pose before render"
        f = self._frame
        if phase == "gt":
            # GT depth is rendered against opaque bindings: full geometry
            return {"distance_to_image_plane": f["depth"]}
        if phase == "rgb":
            assert not self._projector_on, "projector must be off for RGB frames"
            return {"rgb_RenderProduct_CameraRGB": f["rgb"]}
        if phase == "ir":
            assert self._projector_on, "projector must be on for IR frames"
            gray = lambda x: np.stack([x] * 3, axis=-1)
            return {
                "rgb_Camera01": gray(f["ir_l"]),
                "rgb_Camera02": gray(f["ir_r"]),
            }
        raise ValueError(phase)

    def close(self) -> None:
        pass
