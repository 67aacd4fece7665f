#!/usr/bin/env python
"""RealSense capture latency smoke test (reference: camera_test.py:1-44):
two threads pulling frames, printing per-frame latency. Works against live
hardware (pyrealsense2) or --replay DIR for a hermetic run."""

import argparse
import threading
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--replay", default=None, help="frame dir for FileReplaySource")
    p.add_argument("--frames", type=int, default=30)
    p.add_argument("--serial", default=None)
    args = p.parse_args(argv)

    from d3roma_tpu.streaming import FileReplaySource, RealSenseSource

    src = (FileReplaySource(args.replay, loop=True) if args.replay
           else RealSenseSource(args.serial))

    stats = []

    def worker(name):
        it = src.frames()
        for i in range(args.frames):
            t0 = time.time()
            rgb, depth = next(it)
            dt = time.time() - t0
            stats.append(dt)
            print(f"[{name}] frame {i}: {rgb.shape} {depth.shape} {dt*1000:.1f}ms")

    threads = [threading.Thread(target=worker, args=(f"t{i}",)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if not stats:
        raise SystemExit("no frames captured (worker errors above?)")
    print(f"mean latency: {sum(stats)/len(stats)*1000:.2f} ms over {len(stats)} frames")
    src.close()


if __name__ == "__main__":
    main()
