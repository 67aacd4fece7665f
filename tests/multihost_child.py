"""Child process for the 2-process multi-host test (run via subprocess).

Usage: python tests/multihost_child.py PROC_ID NUM_PROCS COORD_ADDR

Exercises the only previously-untested parallelism branch:
`shard_batch`'s `jax.process_count() > 1` path, which builds global arrays
from process-local shards via `make_array_from_process_local_data`
(d3roma_tpu/parallel/mesh.py), plus one jitted data-parallel train step
whose gradient all-reduce rides the SPMD partitioner — the TPU-native
equivalent of the reference's Accelerate/NCCL DDP (train.py:722-727).
Prints CHECK lines the parent asserts on.
"""

import os
import sys


def main():
    proc_id, num_procs, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()

    import jax

    jax.distributed.initialize(
        coordinator_address=coord, num_processes=num_procs, process_id=proc_id
    )
    assert jax.process_count() == num_procs
    assert jax.device_count() == 4 * num_procs
    assert jax.local_device_count() == 4

    import jax.numpy as jnp
    import numpy as np

    from d3roma_tpu.parallel import make_mesh, replicate_sharding, shard_batch

    mesh = make_mesh()

    # each process contributes a distinct local shard; the global array is
    # assembled by make_array_from_process_local_data inside shard_batch
    local = np.full((4, 2, 2), float(proc_id + 1), np.float32)
    batch = shard_batch({"x": local, "fxb": np.full((4,), 10.0, np.float32),
                         "path": ["ignored"] * 4}, mesh)
    assert batch["x"].shape == (4 * num_procs, 2, 2)

    # global reduction across both processes' shards: sum = 4*2*2*(1+2)
    total = float(jax.jit(lambda x: jnp.sum(x))(batch["x"]))
    print(f"CHECK sum={total}", flush=True)

    # one data-parallel sgd step: replicated params, sharded batch; the
    # partitioner inserts the cross-process psum for the grad
    w0 = jax.device_put(jnp.ones((2, 2), jnp.float32),
                        replicate_sharding(mesh))

    def loss_fn(w, x):
        pred = jnp.einsum("bij,jk->bik", x, w)
        return jnp.mean(pred**2)

    @jax.jit
    def step(w, x):
        loss, g = jax.value_and_grad(loss_fn)(w, x)
        return w - 0.1 * g, loss

    w1, loss = step(w0, batch["x"])
    # replicated result must be identical on every process
    w1_host = np.asarray(jax.device_get(
        jax.device_put(w1, replicate_sharding(mesh))))
    print(f"CHECK loss={float(loss):.6f}", flush=True)
    print(f"CHECK w1={w1_host.reshape(-1).round(6).tolist()}", flush=True)

    # eval-side host transfer: batch["x"] spans non-addressable devices, so
    # plain np.asarray raises; eval_loop._to_host must gather the global
    # value (the metric path distributed_evaluate drives)
    from d3roma_tpu.evaluation.eval_loop import _to_host

    try:
        np.asarray(batch["x"])
        print("CHECK asarray_raises=False", flush=True)
    except Exception:
        print("CHECK asarray_raises=True", flush=True)
    xg = _to_host(batch["x"])
    assert xg.shape == (4 * num_procs, 2, 2)
    print(f"CHECK to_host_sum={float(xg.sum())}", flush=True)

    # distributed_evaluate's multi-host batch path: BOTH processes hold
    # the same seed-identical "global" batch; slice_process_local keeps
    # each process's rows so the assembled global batch has every sample
    # exactly once (feeding the full batch duplicated each sample
    # process_count times)
    from d3roma_tpu.parallel import slice_process_local

    full = {"x": np.arange(8, dtype=np.float32).reshape(8, 1),
            "fxb": np.full((8,), 10.0, np.float32)}
    local = slice_process_local(dict(full))
    assert local["x"].shape[0] == 8 // num_procs
    g = shard_batch(local, mesh)
    assert g["x"].shape == (8, 1)  # global rows == original batch
    gx = _to_host(g["x"]).ravel().tolist()
    print(f"CHECK dedup_rows={sorted(gx)}", flush=True)

    print("CHECK done", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
