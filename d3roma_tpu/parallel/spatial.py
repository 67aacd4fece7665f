"""Spatial (sequence) parallelism: shard the image/row dimension.

Beyond the reference (Accelerate DP only): for latency-bound or
larger-than-memory images, the H dimension of the NHWC activations is
sharded over a ``seq`` mesh axis. Everything stays declarative — 3x3
convs need halo rows from the neighbor shard and GSPMD inserts the
`ppermute`-style halo exchanges itself; attention over the flattened
H*W tokens triggers an all-gather of the sharded dim. Model code is
unchanged (tests assert SP == replicated equality).

This composes with `parallel.tensor`'s model axis; the eval-time
coarse-to-fine quadrant tiling (evaluation/eval_loop.py) remains the
HBM-level alternative when no second axis is available.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from d3roma_tpu.parallel.mesh import DATA_AXIS

SEQ_AXIS = "seq"


def make_mesh_dp_sp(dp: int, sp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= dp * sp, (dp, sp, len(devices))
    arr = np.asarray(devices[: dp * sp]).reshape(dp, sp)
    return Mesh(arr, (DATA_AXIS, SEQ_AXIS))


def spatial_batch_spec() -> P:
    """Batch on ``data``, image rows on ``seq`` (NHWC leaves)."""
    return P(DATA_AXIS, SEQ_AXIS)


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, spatial_batch_spec())
