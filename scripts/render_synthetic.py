#!/usr/bin/env python
"""Synthetic stereo-IR/depth generation launcher.

The runnable entrypoint the reference exposes as ``isaacsim/render.py``
(reference: isaacsim/render.py:17-48 — Hydra cfg -> SimulationApp ->
World -> IRReplicator.start()): one command turns a YAML config into a
training-ready HISS-layout tree (color/ir_l/ir_r PNGs + depth EXRs +
meta_{seq}.json) via the backend-agnostic replication protocol
(d3roma_tpu/synthetic/isaac/replicator.py).

Backend selection (``backend:`` key or --backend):
  auto  OmniBackend when Isaac Sim (`isaacsim`/omni) imports — the real
        RTX path — else the hermetic procedural SimBackend (CI path).
  omni  require Isaac Sim; fail loudly when absent.
  sim   force the procedural renderer.

Usage:
  python scripts/render_synthetic.py [--config conf/synthetic/hssd.yaml]
      [key=value ...]         # dotted overrides, YAML-coerced, e.g.
                              # writer_config.output_dir=/tmp/hiss seed=3
"""

import argparse
import os
import sys

import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DEFAULT_CONFIG = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "conf", "synthetic", "hssd.yaml")


def apply_overrides(cfg: dict, overrides) -> dict:
    """``a.b.c=value`` dotted-path overrides, values YAML-coerced
    (the launcher analog of the reference's Hydra override list,
    isaacsim/render.py:19)."""
    for item in overrides:
        if "=" not in item:
            raise SystemExit(f"override must be key=value, got {item!r}")
        path, raw = item.split("=", 1)
        node = cfg
        keys = path.split(".")
        for k in keys[:-1]:
            node = node.setdefault(k, {})
            if not isinstance(node, dict):
                raise SystemExit(f"cannot override through non-dict {k!r}")
        node[keys[-1]] = yaml.safe_load(raw) if raw != "" else None
    return cfg


def build_replicator(cfg: dict, backend: str = None):
    """cfg dict -> (IsaacReplicator, seed). Pure of side effects other
    than backend construction, so tests can drive it hermetically."""
    from d3roma_tpu.synthetic.isaac import IsaacReplicator, ReplicatorConfig

    sensor = cfg.get("depth_sensor", {})
    cam = cfg.get("camera_sampling", {})
    writer = cfg.get("writer_config", {})
    scene = cfg.get("scene", {})
    layout = cfg.get("layout", {})
    W, H = sensor.get("resolution", [640, 360])
    rc = ReplicatorConfig(
        scene_usd=scene.get("usd") or "",
        cad_root=layout.get("cad_model_dir") or "",
        out_root=writer.get("output_dir", "datasets/HISS/train"),
        frames_per_surface=int(cfg.get("num_frames_per_surface", 3)),
        rt_subframes=int(cfg.get("rt_subframes", 8)),
        resolution=(W, H),
        fov_deg=float(sensor.get("fov", 71.28)),
        baseline=float(sensor.get("baseline", 0.055)),
        hemisphere_radius=tuple(cam.get("radius", (0.6, 1.4))),
        hemisphere_elevation=tuple(cam.get("elevation_deg", (20.0, 70.0))),
        material_probs=tuple(cfg.get("materials", {}).get("probs",
                                                          (0.4, 0.3, 0.3))),
        max_objects=int(layout.get("max_objects", 12)),
        render_disparity=bool(writer.get("disparity", False)),
        renderer=cfg.get("launch_config", {}).get("renderer",
                                                  "RayTracedLighting"),
        hide_prim_names=tuple(scene.get("hide_prims",
                                        ("ceiling", "ceilings", "wall"))),
    )

    seed = int(cfg.get("seed", -1))
    if seed < 0:  # ref :50 — negative seed = fresh randomization
        seed = int.from_bytes(os.urandom(4), "little")

    choice = backend or cfg.get("backend", "auto")
    if choice not in ("auto", "omni", "sim"):
        raise SystemExit(f"unknown backend {choice!r} (auto|omni|sim)")
    b = None
    if choice in ("auto", "omni"):
        try:
            from d3roma_tpu.synthetic.isaac.backend import OmniBackend

            b = OmniBackend(
                headless=bool(cfg.get("launch_config", {}).get("headless",
                                                               True)),
                rt_subframes=rc.rt_subframes,
                cad_root=rc.cad_root or None)
        except ImportError:
            if choice == "omni":
                raise
            print("# Isaac Sim not available — using the procedural "
                  "SimBackend", file=sys.stderr)
    if b is None:
        from d3roma_tpu.synthetic.isaac.backend import SimBackend
        from d3roma_tpu.synthetic.procedural import SceneConfig

        b = SimBackend(SceneConfig(height=H, width=W, fov_deg=rc.fov_deg,
                                   baseline=rc.baseline), seed=seed)
    return IsaacReplicator(rc, seed=seed, backend=b), seed


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--config", default=_DEFAULT_CONFIG)
    ap.add_argument("--backend", choices=("auto", "omni", "sim"))
    ap.add_argument("overrides", nargs="*", metavar="key=value")
    args = ap.parse_args(argv)

    with open(args.config) as f:
        cfg = yaml.safe_load(f) or {}
    apply_overrides(cfg, args.overrides)

    rep, seed = build_replicator(cfg, backend=args.backend)
    max_surfaces = cfg.get("max_surfaces")
    n = rep.start(max_surfaces=None if max_surfaces in (None, "")
                  else int(max_surfaces))
    print(f"wrote {n} frames (seed {seed}) -> {rep.cfg.out_root}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
