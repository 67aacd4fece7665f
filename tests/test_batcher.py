"""MicroBatcher + batched D3RoMa serving path.

The batcher is the multi-stream serving front-end (one batch-16 pipeline
call costs ~4x less per frame than 16 single calls on the v5e —
docs/PERFORMANCE.md); these tests cover its aggregation contract on a
fake model and the batched D3RoMa path end-to-end on a tiny pipeline.
"""
import threading
import time

import numpy as np
import pytest

from d3roma_tpu.streaming import MicroBatcher


def test_batcher_orders_and_resolves():
    calls = []

    def infer(items):
        calls.append(list(items))
        return [x * 10 for x in items]

    mb = MicroBatcher(infer, max_batch=4, max_wait_ms=50, pad=False)
    futs = [mb.submit(i) for i in range(10)]
    assert [f.result(timeout=5) for f in futs] == [i * 10 for i in range(10)]
    mb.stop()
    assert sum(len(c) for c in calls) == 10
    assert mb.items == 10


def test_batcher_pads_to_fixed_batch():
    sizes = []

    def infer(items):
        sizes.append(len(items))
        return [x + 1 for x in items]

    mb = MicroBatcher(infer, max_batch=8, max_wait_ms=20, pad=True)
    futs = [mb.submit(i) for i in range(3)]
    assert [f.result(timeout=5) for f in futs] == [1, 2, 3]
    mb.stop()
    # every call ships the full fixed batch (one compiled program)
    assert all(s == 8 for s in sizes)
    assert mb.padded_rows >= 5


def test_batcher_aggregates_concurrent_submitters():
    sizes = []
    gate = threading.Barrier(9)  # 8 clients + the checker below

    def infer(items):
        sizes.append(len(items))
        return items

    mb = MicroBatcher(infer, max_batch=8, max_wait_ms=200, pad=False)
    results = {}

    def client(i):
        gate.wait()
        results[i] = mb.submit(i).result(timeout=10)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    gate.wait()
    for t in threads:
        t.join()
    mb.stop()
    assert results == {i: i for i in range(8)}
    # 8 near-simultaneous requests ride few calls, not 8 singles
    assert len(sizes) <= 3


def test_batcher_propagates_errors_per_batch():
    def infer(items):
        raise ValueError("boom")

    mb = MicroBatcher(infer, max_batch=2, max_wait_ms=10)
    f = mb.submit(1)
    with pytest.raises(ValueError, match="boom"):
        f.result(timeout=5)
    mb.stop()


def test_batcher_stop_drains():
    done = []

    def infer(items):
        time.sleep(0.05)
        done.extend(items)
        return items

    mb = MicroBatcher(infer, max_batch=2, max_wait_ms=5, pad=False)
    futs = [mb.submit(i) for i in range(6)]
    mb.stop(drain=True)
    for f in futs:
        f.result(timeout=5)
    assert sorted(done) == list(range(6))
    with pytest.raises(RuntimeError):
        mb.submit(99)


# --------------------------------------------------------------------- #
def _tiny_droma(R=1):
    from d3roma_tpu.inference import D3RoMa
    from d3roma_tpu.utils.camera import Realsense
    from tests.test_calibration import _tiny_latent_pipe

    return D3RoMa(
        overrides=[
            "task=train_ldm_mixed_rgb+raw",
            "task.cond_channels=rgb+raw",
            "task.image_size=[48,64]",
            "task.num_inference_timesteps=2",
            "task.num_intermediate_images=1",
            f"task.num_inference_rounds={R}",
            "task.flow_guidance_weights=[0.0]",
            "task.ssi=true", "task.safe_ssi=false",
        ],
        camera=Realsense.default_real("fxm"), variant="rgb+raw",
        pipeline=_tiny_latent_pipe(),
    )


@pytest.mark.full  # compile-heavy tier (README)
def test_d3roma_batched_no_cross_frame_mixing():
    """Two frames with very different depth scales: per-frame SSI must
    align each prediction to ITS OWN raw input (order preserved, no
    leakage across batch rows)."""
    droma = _tiny_droma()
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, (48, 64, 3), np.uint8)
    # depth ramps (SSI needs a non-degenerate quantile range)
    ramp = np.linspace(0.8, 1.2, 48 * 64).reshape(48, 64).astype(np.float32)
    near = 0.4 * ramp   # ~0.4 m scene
    far = 4.0 * ramp    # ~4.0 m scene
    d_near, d_far = droma.infer_with_rgb_raw_batch([(rgb, near), (rgb, far)])
    assert d_near.shape == d_far.shape == (48, 64)
    assert np.isfinite(d_near).all() and np.isfinite(d_far).all()
    # SSI alignment target is the raw disparity, so the restored depth
    # must sit near each frame's own scene scale
    assert abs(np.median(d_near) - 0.4) < 0.2
    assert abs(np.median(d_far) - 4.0) < 2.0


def test_d3roma_batched_multi_round():
    droma = _tiny_droma(R=2)
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 255, (48, 64, 3), np.uint8)
    raw = rng.uniform(0.5, 1.5, (48, 64)).astype(np.float32)
    (depth,) = droma.infer_with_rgb_raw_batch([(rgb, raw)])
    assert depth.shape == (48, 64)
    assert np.isfinite(depth).all()
    assert droma.last_uncertainty.shape == (1, 48, 64)


def test_batcher_serves_d3roma():
    """End-to-end: concurrent clients -> MicroBatcher -> ONE batched
    pipeline call -> per-client depths."""
    droma = _tiny_droma()
    rng = np.random.default_rng(2)
    mb = MicroBatcher(droma.infer_with_rgb_raw_batch, max_batch=4,
                      max_wait_ms=100, pad=True)
    ramp = np.linspace(0.8, 1.2, 48 * 64).reshape(48, 64).astype(np.float32)
    frames = [
        (rng.integers(0, 255, (48, 64, 3), np.uint8),
         0.5 * (i + 1) * ramp)
        for i in range(3)
    ]
    futs = [mb.submit(f) for f in frames]
    depths = [f.result(timeout=300) for f in futs]
    mb.stop()
    assert mb.batches == 1 and mb.padded_rows == 1
    for i, d in enumerate(depths):
        assert d.shape == (48, 64)
        assert abs(np.median(d) - 0.5 * (i + 1)) < 0.3 * (i + 1)


def test_processor_batched_drain():
    """D3RoMaProcessor(max_batch>1) drains queued frames into ONE batched
    call, pads the tail to a fixed batch, and publishes per frame."""
    from d3roma_tpu.streaming import D3RoMaProcessor

    calls = []

    class StubDroma:
        def infer_with_rgb_raw(self, rgb, depth):
            calls.append(1)
            return depth

        def infer_with_rgb_raw_batch(self, frames):
            calls.append(len(frames))
            return [d for _, d in frames]

    K = np.eye(3) * 50.0
    K[2, 2] = 1
    published = []
    proc = D3RoMaProcessor(StubDroma(), K,
                           publish=lambda r, p, m: published.append(1),
                           max_batch=4)
    rng = np.random.default_rng(0)
    frames = [(rng.integers(0, 255, (24, 32, 3), np.uint8),
               rng.uniform(0.5, 1.5, (24, 32)).astype(np.float32))
              for _ in range(3)]
    proc.process_frames(frames)
    assert calls == [4]          # one padded fixed-size batched call
    assert len(published) == 3   # padded row not published
    assert proc.frames_processed == 3
    # a single frame ALSO rides the padded batch program — exactly one
    # program shape ever compiles (batch-1 programs are the known
    # remote-compile failure case and would double compile cost)
    proc.process_frame(*frames[0])
    assert calls == [4, 4]


def test_submit_full_queue_raises_immediately():
    """A full backlog must surface as queue.Full (the serving layer maps
    it to 503) instead of blocking the caller past any timeout."""
    import queue as _q

    hang = threading.Event()

    def stall(items):
        hang.wait(10)
        return items

    b = MicroBatcher(stall, max_batch=1, max_wait_ms=1, queue_size=2)
    try:
        b.submit(1)  # worker picks this up and stalls
        time.sleep(0.2)
        b.submit(2)
        b.submit(3)
        with pytest.raises(_q.Full):
            b.submit(4)
    finally:
        hang.set()
        b.stop()


def test_stop_does_not_strand_racing_submit():
    """Items enqueued concurrently with stop() must be either processed
    (drain=True) or cancelled — never left with an unresolved Future."""
    done = []

    def infer(items):
        return items

    for trial in range(50):
        b = MicroBatcher(infer, max_batch=4, max_wait_ms=1)
        futs = []

        def spam():
            for i in range(20):
                try:
                    futs.append(b.submit(i))
                except RuntimeError:
                    return

        t = threading.Thread(target=spam)
        t.start()
        b.stop(drain=True)
        t.join()
        for f in futs:
            # every accepted future resolves (result or cancellation)
            assert f.done() or f.cancelled(), trial
        done.append(len(futs))
    assert sum(done) > 0  # the race actually exercised submissions


def test_worker_death_fails_fast():
    """A fatal (BaseException) error kills the worker but resolves the
    in-flight futures; later submits fail fast instead of queueing into
    a dead batcher."""
    def fatal(items):
        raise SystemExit("runtime aborted")

    b = MicroBatcher(fatal, max_batch=1, max_wait_ms=1)
    f = b.submit(1)
    with pytest.raises(RuntimeError, match="worker died"):
        f.result(timeout=5)
    deadline = time.monotonic() + 5
    while time.monotonic() < deadline:
        try:
            b.submit(2)
            time.sleep(0.02)
        except RuntimeError:
            break
    else:
        raise AssertionError("submit never failed fast after worker death")
