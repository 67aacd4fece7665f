"""Tensor parallelism: shard the MODEL over a second mesh axis.

The reference has no model parallelism at all (its 866M UNet fits one
GPU; Accelerate gives it pure DP — train.py:722-727). On TPU the same
declarative machinery that gives us DP extends to TP: we annotate
PartitionSpecs on the *parameters* and let jit's SPMD partitioner insert
every collective (all-gather of channel-sharded conv weights' outputs,
reduce-scatter after row-parallel projections) over the ``model`` mesh
axis, riding ICI. No collective appears in model code.

Partitioning rules (Megatron-style column/row pairing where the layer
names make the pairing explicit, plain output-channel sharding for
convs):

- attention ``to_q/to_k/to_v`` and feed-forward ``net_0`` kernels:
  column-parallel — ``P(None, "model")``;
- attention ``to_out``, feed-forward ``net_2``, spatial-transformer
  ``proj_out``: row-parallel — ``P("model", None)`` (their input dim is
  the column-sharded inner dim, so the matmul contracts locally and XLA
  reduces partial sums across the axis);
- conv HWIO kernels: output-channel sharded — ``P(None, None, None,
  "model")``;
- everything else (biases, norm scale/bias, time embeddings): replicated.

A dimension that does not divide the axis size stays replicated (the
gate keeps specs valid for any tp; XLA could pad, but an uneven shard of
a 5-head attention buys nothing).

Activations stay batch-sharded on ``data`` only; GSPMD chooses the
intermediate layouts. Correctness does not depend on the rules — any
spec assignment computes the same values (tests assert TP == replicated
to fp tolerance); the rules only decide where memory and collectives
land.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from d3roma_tpu.parallel.mesh import DATA_AXIS

MODEL_AXIS = "model"

_ROW_PARALLEL_NAMES = ("to_out", "net_2", "proj_out")


def make_mesh_dp_tp(dp: int, tp: int, devices=None) -> Mesh:
    """2-D ``(data, model)`` mesh. On a real slice, put ``model`` on the
    fastest (innermost) ICI dimension — TP collectives are per-layer,
    DP's gradient psum is once per step."""
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= dp * tp, (dp, tp, len(devices))
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def _leaf_spec(path, x, tp: int) -> P:
    names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
    if names and names[-1] == "kernel":
        if x.ndim == 4 and x.shape[-1] % tp == 0:
            return P(None, None, None, MODEL_AXIS)
        if x.ndim == 2:
            if any(n in _ROW_PARALLEL_NAMES for n in names):
                if x.shape[0] % tp == 0:
                    return P(MODEL_AXIS, None)
                return P()
            if x.shape[-1] % tp == 0:
                return P(None, MODEL_AXIS)
    return P()


def tp_param_specs(params, mesh: Mesh):
    """PartitionSpec pytree for a Flax param tree under ``mesh``'s
    ``model`` axis (identity — all P() — if the mesh has no model axis)."""
    tp = dict(zip(mesh.axis_names, mesh.devices.shape)).get(MODEL_AXIS, 1)
    if tp == 1:
        return jax.tree.map(lambda _: P(), params)
    return jax.tree_util.tree_map_with_path(
        lambda p, x: _leaf_spec(p, x, tp), params)


def tp_param_shardings(params, mesh: Mesh):
    return jax.tree.map(lambda s: NamedSharding(mesh, s),
                        tp_param_specs(params, mesh),
                        is_leaf=lambda s: isinstance(s, P))


def shard_params_tp(params, mesh: Mesh):
    """Place a (host or replicated) param tree onto the 2-D mesh with the
    TP rules. Optimizer/EMA trees of the same structure can reuse
    `tp_param_shardings` so the train state shards consistently."""
    return jax.device_put(params, tp_param_shardings(params, mesh))


def shard_state_tp(state, mesh: Mesh):
    """TP-shard a whole TrainState consistently.

    The optax moment trees mirror the param dict (same ``kernel`` leaf
    names), so the same path+shape rules apply to them; sharding params
    and moments identically keeps the jitted step's input and output
    shardings equal — otherwise step 2 recompiles the entire program and
    the donated step-1 buffers are wasted."""
    tp = dict(zip(mesh.axis_names, mesh.devices.shape)).get(MODEL_AXIS, 1)
    sh = jax.tree_util.tree_map_with_path(
        lambda p, x: NamedSharding(
            mesh, _leaf_spec(p, x, tp) if tp > 1 else P()), state)
    return jax.device_put(state, sh)


def shard_pipeline_tp(pipeline, tp: int, log=None):
    """TP-shard a sampling pipeline's params for serving/eval.

    Builds the (data, model) mesh, checks the rules actually engage
    (`tp_shard_count` — silently-replicated "TP" is the failure mode the
    diagnostic exists for), and returns (pipeline, mesh).

    Pallas-kernel modes COMPOSE with TP since round 5: the mesh is set as
    ``tp_mesh`` on the UNet/VAE modules, which routes each kernel site
    through its shard_map composition (ops/pallas: mha_attention_tp /
    geglu_ff_tp — a bare pallas_call is not GSPMD-partitionable) and
    falls back to the XLA path at mesh-ineligible shapes. NOTE: with
    calibrated static int8, calibrate() must run on the TP-meshed
    pipeline (this function's result) — the kernel gates decide the scale
    call order, and they consult the mesh."""
    import dataclasses

    assert jax.device_count() % tp == 0, (
        f"tensor_parallel={tp} must divide {jax.device_count()} devices")
    mesh = make_mesh_dp_tp(jax.device_count() // tp, tp)
    assert tp_shard_count(pipeline.unet_params, mesh) > 0, (
        "tensor_parallel set but no UNet param dim divides it")
    repl = {"unet_params": shard_params_tp(pipeline.unet_params, mesh)}
    if getattr(pipeline, "vae_params", None) is not None:
        repl["vae_params"] = shard_params_tp(pipeline.vae_params, mesh)
    # route Pallas kernel sites through their shard_map TP composition
    if getattr(pipeline.unet, "tp_mesh", "missing") is None:
        repl["unet"] = dataclasses.replace(pipeline.unet, tp_mesh=mesh)
    if (getattr(pipeline, "vae", None) is not None
            and getattr(pipeline.vae, "tp_mesh", "missing") is None):
        repl["vae"] = dataclasses.replace(pipeline.vae, tp_mesh=mesh)
    if log is not None:
        log.info("mesh: DP%d x TP%d", jax.device_count() // tp, tp)
    return dataclasses.replace(pipeline, **repl), mesh


def tp_shard_count(params, mesh: Mesh) -> int:
    """Number of leaves actually sharded on the model axis (diagnostic:
    a mesh/model mismatch that silently replicates everything shows up
    as 0)."""
    specs = jax.tree_util.tree_leaves(tp_param_specs(params, mesh),
                                      is_leaf=lambda x: isinstance(x, P))
    return sum(MODEL_AXIS in s for s in specs)
