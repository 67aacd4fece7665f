"""Device mesh + sharding helpers.

TPU-native replacement for the reference's Accelerate/NCCL data parallelism
(reference: train.py:722-727, 551-553; distributed_evaluate.py:96): a 1-D
``data`` mesh over all devices, batches sharded on the leading axis, model
state replicated. Gradient all-reduce is not explicit anywhere — jit's SPMD
partitioner inserts the psum over the data axis, riding ICI. Multi-host
entry goes through `jax.distributed.initialize` + `jax.make_array_from_
process_local_data` so each host feeds only its local shard.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None, axis: str = DATA_AXIS) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh, spec: P = None) -> Dict:
    """Place a host-global numpy batch onto the mesh, sharded on axis 0.

    In multi-process mode each process holds only its slice and we build the
    global array from local shards (the `gather_for_metrics`-free
    equivalent of Accelerate's sharded loaders).

    `spec` optionally shards extra dims (e.g. the spatial
    `P("data", "seq")` from `parallel.spatial`); leaves with too few
    dims for it fall back to leading-axis sharding.
    """
    sharding = batch_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, replicate_sharding(mesh))
        sh = sharding
        # the extra-dim spec targets image leaves (NHWC); a 2-D leaf like
        # per-sample intrinsics must NOT get a feature dim sharded on "seq"
        if spec is not None and x.ndim == 4:
            sh = NamedSharding(mesh, spec)
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sh, x)
        return jax.device_put(x, sh)

    return {k: put(v) for k, v in batch.items()
            if not isinstance(v, (list, str))}


def replicate_state(state, mesh: Mesh):
    return jax.device_put(state, replicate_sharding(mesh))


def slice_process_local(batch: Dict, process_index: int = None,
                        process_count: int = None) -> Dict:
    """Keep this process's contiguous row-slice of a host-global batch.

    Multi-host loaders here are seed-identical on every host (no
    per-rank dataloader sharding), so before `shard_batch` each process
    must keep only ITS slice — `make_array_from_process_local_data`
    treats the passed rows as the process-local shard, and feeding the
    full batch would assemble process_count duplicate copies of every
    sample. The leading dim must divide process_count (pad first with
    `pad_batch_to_devices(batch, global_data_axis_size)`).
    """
    pc = process_count if process_count is not None else jax.process_count()
    if pc <= 1:
        return batch
    pi = process_index if process_index is not None else jax.process_index()
    rows = next(v.shape[0] for v in batch.values()
                if getattr(v, "ndim", 0) >= 1)
    assert rows % pc == 0, f"batch rows {rows} not divisible by {pc} processes"
    per = rows // pc
    return {
        k: (v[pi * per:(pi + 1) * per]
            if getattr(v, "ndim", 0) >= 1 and v.shape[0] == rows else v)
        for k, v in batch.items()
    }


def pad_batch_to_devices(batch: Dict, n_devices: int) -> Dict:
    """Pad the batch so the leading dim divides the mesh (eval tails).

    Adds a ``sample_valid`` [B] row marking real samples (1.0) vs padded
    duplicates (0.0) so downstream metric accumulation can drop the
    duplicates — the reference de-duplicates exactly this case via
    Accelerate's `gather_for_metrics` even-batches logic
    (reference: distributed_evaluate.py:162-167).
    """
    out = {}
    orig_b = None
    for k, v in batch.items():
        if isinstance(v, (list, str)):
            out[k] = v
            continue
        v = np.asarray(v)
        if v.ndim == 0:
            out[k] = v
            continue
        b = v.shape[0]
        rem = (-b) % n_devices
        if orig_b is None:
            orig_b = b
        if rem:
            pad = np.repeat(v[-1:], rem, axis=0)
            v = np.concatenate([v, pad], axis=0)
        out[k] = v
    if orig_b is not None:
        padded_b = orig_b + ((-orig_b) % n_devices)
        out["sample_valid"] = (np.arange(padded_b) < orig_b).astype(np.float32)
    return out
