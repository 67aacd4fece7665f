"""2-process multi-host test: the `jax.process_count() > 1` branch of
`shard_batch` (parallel/mesh.py) and a cross-process data-parallel step,
run as real subprocesses against one jax.distributed coordinator — the
"fake cluster" for the code path the reference only ever exercised on real
multi-GPU via `accelerate launch` (reference: distributed_evaluate.py:96,
README.md:230-266)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

# compile-heavy tier: deselected by the default pytest invocation
# (pyproject addopts); run with `pytest -m full` (README)
pytestmark = pytest.mark.full

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(ROOT, "tests", "multihost_child.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_shard_batch_and_dp_step():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # no remote-compile relay
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, CHILD, str(i), "2", coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=ROOT,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert "CHECK done" in out, f"proc {i} incomplete:\n{out}"

    def grab(out, key):
        for line in out.splitlines():
            if line.startswith(f"CHECK {key}="):
                return line.split("=", 1)[1]
        raise AssertionError(f"missing CHECK {key}")

    # global sum over both processes' shards: 4*2*2*(1+2) = 48
    for out in outs:
        assert float(grab(out, "sum")) == pytest.approx(48.0)
    # the DP step must produce identical replicated params + loss everywhere
    assert grab(outs[0], "loss") == grab(outs[1], "loss")
    assert grab(outs[0], "w1") == grab(outs[1], "w1")
    # and the loss must reflect BOTH shards (mean over the global batch of
    # x@w with x=1s and 2s, w=1s: rows of proc0 give (2)^2, proc1 (4)^2)
    assert float(grab(outs[0], "loss")) == pytest.approx((4.0 + 16.0) / 2)
    # eval host transfer: the sharded array is NOT fully addressable
    # (np.asarray raises) but _to_host gathers the full global value
    for out in outs:
        assert grab(out, "asarray_raises") == "True"
        assert float(grab(out, "to_host_sum")) == pytest.approx(48.0)
    # slice_process_local: the assembled global batch holds every sample
    # exactly once (no per-process duplication)
    for out in outs:
        assert grab(out, "dedup_rows") == str([float(i) for i in range(8)])
