"""AOT serving artifacts: export the serving program, cache executables.

Two complementary mechanisms, both built on the pipelines' `serving_fn`
(the EXACT program `pipeline.__call__` runs):

1. **Portable program export** (`export_serving` / `save_serving` /
   `load_serving`): serializes the traced+lowered serving program
   (StableHLO via `jax.export`) at a pinned `ServingSignature`. Parameters
   enter as ARGUMENTS, so the artifact carries no weights — it loads next
   to the pipeline directory (`save_pretrained` weights) and runs without
   the model-definition code having to re-trace an 866M-param 10-step
   scan (minutes of host time on the flagship). The artifact can be
   lowered for a platform the exporting host doesn't have (e.g. export
   for TPU from a CPU build box via `platforms=("tpu",)`).

2. **Compiled-executable cache** (`ExecutableCache`): pickles the
   device-specific compiled executable
   (`jax.experimental.serialize_executable`). A serving restart on the
   same device kind skips BOTH tracing and XLA compilation — on this
   environment's remote-compile relay a cold flagship compile is
   15-30 min (docs/PERFORMANCE.md), which the cache turns into a file
   load. Wired into `pipeline.with_aot_cache(dir)`; every load/serialize
   failure falls back to the ordinary jit path, so the cache can never
   break serving.

The reference has no analog (torch recompiles nothing but pays eager
dispatch instead); this is the TPU-native production-serving story:
ship (pipeline dir + exported program), warm-start from the executable
cache.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import logging
import os
import pickle
import tempfile
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)

_FORMAT_VERSION = 1


def _act_scales_sha(scales) -> str:
    """Stable hash of a pipeline's calibrated int8 activation-scale table
    (empty string when uncalibrated)."""
    if not scales:
        return ""
    return hashlib.sha256(
        json.dumps(scales, sort_keys=True).encode()).hexdigest()[:24]


def _register_output_serialization():
    """jax.export needs custom-pytree (NamedTuple) nodes registered to
    serialize the program's out_tree; idempotent for re-imports."""
    from jax import export as jexport

    from d3roma_tpu.pipelines.sampling import PipelineOutput

    try:
        jexport.register_namedtuple_serialization(
            PipelineOutput, serialized_name="d3roma_tpu.PipelineOutput")
    except ValueError:
        pass  # already registered (same name -> same type)


_register_output_serialization()


@dataclasses.dataclass(frozen=True)
class ServingSignature:
    """The static knobs + input shapes that pin one serving program.

    `batch` is the TOTAL pipeline batch (frames x inference rounds — the
    deployment paths broadcast rounds into the batch dim,
    inference.py::run_pipeline). `height`/`width` are the array sizes as
    fed to the pipeline (already padded/resized by the caller)."""

    batch: int
    height: int
    width: int
    num_inference_steps: int = 10
    num_intermediate_images: int = 1
    cond_channels: str = "rgb+raw"
    add_noise_rgb: bool = False
    dtype: str = "float32"
    # pixel family only (GuidedDiffusionPipeline)
    depth_channels: int = 1
    # latent family with guidance: the raw_depth/mask args are part of the
    # program signature (the denormalizer itself is supplied at export
    # time — it is code, not data)
    with_guidance: bool = False

    def to_json(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_json(cls, d: dict) -> "ServingSignature":
        return cls(**d)

    # ---------------------------------------------------------------- #
    def _img(self, ch: int):
        return jax.ShapeDtypeStruct(
            (self.batch, self.height, self.width, ch), jnp.dtype(self.dtype))

    def cond_structs(self):
        """(rgb, left, right, raw) ShapeDtypeStructs (None when absent)."""
        toks = self.cond_channels.split("+")
        rgb = self._img(3) if "rgb" in toks else None
        left = self._img(3) if "left" in toks else None
        right = self._img(3) if "right" in toks else None
        raw = self._img(1) if "raw" in toks else None
        return rgb, left, right, raw

    def key_struct(self):
        k = jax.random.PRNGKey(0)
        return jax.ShapeDtypeStruct(k.shape, k.dtype)


def _params_structs(tree):
    return jax.tree.map(
        lambda p: jax.ShapeDtypeStruct(jnp.shape(p), jnp.result_type(p)),
        tree)


def _is_latent(pipe) -> bool:
    # duck-typed on the vae attribute (avoids an import cycle with
    # pipelines/pipeline.py)
    return hasattr(pipe, "vae_params")


def _abstract_args(pipe, sig: ServingSignature, for_export: bool = True):
    """The serving_fn argument tuple as ShapeDtypeStructs."""
    rgb, left, right, raw = sig.cond_structs()
    key = sig.key_struct()
    if _is_latent(pipe):
        raw_depth = mask = None
        if sig.with_guidance:
            raw_depth = sig._img(1)
            mask = sig._img(1)
        return (_params_structs(pipe.unet_params),
                _params_structs(pipe.vae_params),
                _params_structs(pipe.text_embed), key,
                rgb, left, right, raw, raw_depth, mask)
    mask = sig._img(1) if sig.with_guidance else None
    return (_params_structs(pipe.unet_params), key,
            rgb, left, right, raw, mask)


def _build_serving_fn(pipe, sig: ServingSignature, denorm_builder=None):
    if _is_latent(pipe):
        if sig.with_guidance and denorm_builder is None:
            raise ValueError(
                "with_guidance=True needs a denorm_builder "
                "fn(x, raw_depth, mask) — it becomes part of the program")
        return pipe.serving_fn(
            sig.num_inference_steps, sig.num_intermediate_images,
            sig.cond_channels, sig.add_noise_rgb,
            denorm_builder=denorm_builder if sig.with_guidance else None)
    return pipe.serving_fn(
        sig.num_inference_steps, sig.num_intermediate_images,
        sig.depth_channels, sig.cond_channels, sig.add_noise_rgb)


def export_serving(pipe, sig: ServingSignature,
                   platforms: Optional[Sequence[str]] = None,
                   denorm_builder=None) -> "jax.export.Exported":
    """Trace + lower the serving program and return the `jax.export`
    artifact (no compilation, no execution — safe on a build box).

    `platforms`: lowering platforms, e.g. ``("tpu",)`` to build a TPU
    artifact from a CPU host; default = the current backend."""
    from jax import export as jexport

    fn = jax.jit(_build_serving_fn(pipe, sig, denorm_builder))
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jexport.export(fn, **kwargs)(*_abstract_args(pipe, sig))


def save_serving(pipe, out_dir: str, sig: ServingSignature,
                 platforms: Optional[Sequence[str]] = None,
                 denorm_builder=None) -> str:
    """Export and write `<out_dir>/{program.jaxexport,manifest.json}`.
    Returns `out_dir`. Pairs with the pipeline directory written by
    `save_pretrained` (which carries the weights this program consumes)."""
    exp = export_serving(pipe, sig, platforms, denorm_builder)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "program.jaxexport"), "wb") as f:
        f.write(exp.serialize())
    manifest = {
        "format_version": _FORMAT_VERSION,
        "pipeline_class": type(pipe).__name__,
        "signature": sig.to_json(),
        "platforms": list(exp.platforms),
        "jax_version": jax.__version__,
        "calibrated_int8": bool(getattr(pipe, "act_scales", None)),
        # exact scale-table hash: the scales are baked into the exported
        # program as constants, so bind() must refuse a pipeline whose
        # calibration differs (the program would silently ignore it)
        "act_scales_sha": _act_scales_sha(getattr(pipe, "act_scales", None)),
        # disclosed so consumers can tell an exact-numerics program from a
        # DeepCache (deep-trunk reuse) one — the approximation is baked in
        "deepcache_interval": int(getattr(pipe, "cache_interval", 1) or 1),
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return out_dir


class ServingProgram:
    """A loaded serving artifact: `call(...)` runs the program (compiling
    it for the local device on first use, through the persistent
    compilation cache when one is configured)."""

    def __init__(self, exported, manifest: dict):
        self.exported = exported
        self.manifest = manifest
        self.signature = ServingSignature.from_json(manifest["signature"])
        self.pipeline_class = manifest["pipeline_class"]

    @property
    def is_latent(self) -> bool:
        return self.pipeline_class == "GuidedLatentDiffusionPipeline"

    def call(self, *args):
        """Positional args exactly as the exported serving_fn takes them:
        latent: (unet_params, vae_params, text_embed, key,
                 rgb, left, right, raw, raw_depth, mask)
        pixel:  (params, key, rgb, left, right, raw, mask)"""
        return self.exported.call(*args)

    def bind(self, pipe) -> "BoundServing":
        """Attach a pipeline's weights -> callable(key, **conds).

        Refuses a pipeline whose int8 calibration state differs from the
        one baked into the exported program: the scales entered the export
        as trace-time constants, so binding a recalibrated (or
        uncalibrated) pipeline would silently run the export-time scales.
        """
        if type(pipe).__name__ != self.pipeline_class:
            raise ValueError(
                f"artifact was exported from {self.pipeline_class}, "
                f"got {type(pipe).__name__}")
        scales = getattr(pipe, "act_scales", None)
        if "act_scales_sha" in self.manifest:
            if self.manifest["act_scales_sha"] != _act_scales_sha(scales):
                raise ValueError(
                    "pipeline's int8 activation scales differ from the "
                    "ones baked into this exported program (manifest "
                    "act_scales_sha mismatch) — re-export the serving "
                    "artifact from the calibrated pipeline")
        elif self.manifest.get("calibrated_int8", False) != bool(scales):
            # older artifact without the exact hash: bool-level check
            raise ValueError(
                "exported program calibration state (calibrated_int8="
                f"{self.manifest.get('calibrated_int8')}) does not match "
                "the bound pipeline — re-export the serving artifact")
        return BoundServing(self, pipe)


class BoundServing:
    """`fn(key, rgb_images=..., sim_disp=..., ...) -> PipelineOutput` —
    the exported program bound to a pipeline's parameters (mirrors the
    `pipeline.__call__` keyword surface for the exported signature)."""

    def __init__(self, program: ServingProgram, pipe):
        self.program = program
        self.pipe = pipe

    def __call__(self, key, rgb_images=None, left_images=None,
                 right_images=None, sim_disp=None, raw_depth=None,
                 denorm_mask=None):
        p = self.program
        if p.is_latent:
            return p.call(self.pipe.unet_params, self.pipe.vae_params,
                          self.pipe.text_embed, key, rgb_images,
                          left_images, right_images, sim_disp, raw_depth,
                          denorm_mask)
        return p.call(self.pipe.unet_params, key, rgb_images, left_images,
                      right_images, sim_disp, denorm_mask)


def load_serving(out_dir: str) -> ServingProgram:
    from jax import export as jexport

    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    if manifest.get("format_version", 0) > _FORMAT_VERSION:
        raise ValueError(
            f"serving artifact format {manifest['format_version']} is newer "
            f"than this build ({_FORMAT_VERSION})")
    with open(os.path.join(out_dir, "program.jaxexport"), "rb") as f:
        exported = jexport.deserialize(f.read())
    return ServingProgram(exported, manifest)


# ====================================================================== #
# Compiled-executable cache
# ====================================================================== #

def _tree_fingerprint(tree) -> str:
    leaves, treedef = jax.tree.flatten(tree)
    parts = [str(treedef)] + [
        f"{jnp.shape(x)}:{jnp.result_type(x)}" for x in leaves]
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:24]


class ExecutableCache:
    """Persist compiled executables across processes on the same device
    kind (`jax.experimental.serialize_executable`).

    `get_or_compile(token, jit_fn, args)`:
      - cache hit  -> deserialize_and_load: NO tracing, NO XLA compile
        (plus ONE validation execution with the provided args)
      - cache miss -> jit_fn.lower(*args).compile(), roundtrip-validate,
        serialize to disk, return the compiled callable (one compile —
        the same cost the plain jit path pays — plus two validation
        executions, negligible next to the compile they guard)
    Every failure mode (unpicklable backend, device-kind mismatch, a
    stale jax version) logs and falls back to compiling, so enabling the
    cache can never break serving. Entries are keyed by (token, arg
    shapes/dtypes, jax version, backend/device kind), so a config or
    shape change misses instead of loading the wrong program."""

    def __init__(self, cache_dir: str):
        self.cache_dir = cache_dir

    def _entry_path(self, token: str, args) -> str:
        dev = jax.devices()[0]
        raw = "|".join([
            token, _tree_fingerprint(args), jax.__version__,
            dev.platform, getattr(dev, "device_kind", "?"),
        ])
        name = hashlib.sha256(raw.encode()).hexdigest()[:32]
        return os.path.join(self.cache_dir, f"exec_{name}.pkl")

    def get_or_compile(self, token: str, jit_fn, args):
        from jax.experimental import serialize_executable as se

        path = self._entry_path(token, args)
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    payload, in_tree, out_tree, n_dev = pickle.load(f)
                # rebind to the same NUMBER of devices the executable was
                # compiled for — the default binds all local devices, which
                # breaks a 1-device serving program on a multi-device host
                loaded = se.deserialize_and_load(
                    payload, in_tree, out_tree,
                    execution_devices=jax.devices()[:n_dev] if n_dev else None)
                # one validation execution: loader failures (missing AOT
                # symbols, device mismatch) surface at first EXECUTE, not
                # at deserialize — don't hand serving a callable that will
                # blow up mid-request
                jax.block_until_ready(loaded(*args))
                logger.info("AOT executable cache hit: %s", path)
                return loaded
            except Exception as e:  # noqa: BLE001 — any failure -> recompile
                logger.warning("AOT cache load failed (%s: %s) — "
                               "recompiling", type(e).__name__, e)
        compiled = jit_fn.lower(*args).compile()
        try:
            payload, in_tree, out_tree = se.serialize(compiled)
            try:
                n_dev = len(
                    compiled._executable.xla_executable.local_devices())
            except Exception:  # noqa: BLE001 — internals moved; bind default
                n_dev = None
            # validate BEFORE persisting: an executable that came out of
            # jax's persistent compilation cache serializes to a payload
            # whose AOT functions are missing (observed on XLA:CPU —
            # "Function ..._fusion not found"); executing the roundtripped
            # executable once catches that class of corruption here
            # instead of on some future serving restart
            check = se.deserialize_and_load(
                payload, in_tree, out_tree,
                execution_devices=jax.devices()[:n_dev] if n_dev else None)
            jax.block_until_ready(check(*args))
            os.makedirs(self.cache_dir, exist_ok=True)
            fd, tmp = tempfile.mkstemp(dir=self.cache_dir, suffix=".tmp")
            with os.fdopen(fd, "wb") as f:
                pickle.dump((payload, in_tree, out_tree, n_dev), f)
            os.replace(tmp, path)  # atomic: concurrent servers race safely
            logger.info("AOT executable cached: %s", path)
        except Exception as e:  # noqa: BLE001 — serving works uncached
            logger.warning("AOT cache store failed (%s: %s) — continuing "
                           "uncached", type(e).__name__, e)
        return compiled
