#!/usr/bin/env python
"""Report how a config's models shard under task.tensor_parallel.

    python scripts/sharding_report.py task=train_ldm_mixed_rgb+raw \
        task.tensor_parallel=4 [--leaves]

Prints, per model (UNet, and VAE for LDM configs): total params, leaves
sharded on the model axis vs replicated, bytes per device at the
config's mixed_precision, and (with --leaves) the per-leaf
PartitionSpec table. Pure host-side analysis — builds shapes with
jax.eval_shape, touches no device, so it runs anywhere (including with
the TPU transport down).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fmt_bytes(n):
    for unit in ("B", "KB", "MB", "GB"):
        if n < 1024:
            return f"{n:.1f} {unit}"
        n /= 1024
    return f"{n:.1f} TB"


def report(config, tp: int, show_leaves: bool = False):
    import jax
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from d3roma_tpu.parallel.tensor import MODEL_AXIS, _leaf_spec
    from d3roma_tpu.training import build_models

    models = jax.eval_shape(
        lambda key: {k: v for k, v in build_models(config, key).items()
                     if k.endswith("_params")},
        jax.random.PRNGKey(0))
    itemsize = 2 if config.mixed_precision == "bf16" else 4

    param_trees = {"unet": models["unet_params"]}
    if config.ldm:
        param_trees["vae"] = models["vae_params"]

    for name, params in param_trees.items():
        leaves = jax.tree_util.tree_leaves_with_path(params)
        total = sum(int(np.prod(x.shape)) for _, x in leaves)
        sharded_params = 0
        n_sharded = 0
        rows = []
        for path, x in leaves:
            spec = _leaf_spec(path, x, tp) if tp > 1 else P()
            size = int(np.prod(x.shape))
            if MODEL_AXIS in spec:
                n_sharded += 1
                sharded_params += size
            if show_leaves:
                rows.append((jax.tree_util.keystr(path), x.shape, spec))
        per_device = (sharded_params // tp + (total - sharded_params))
        print(f"[{name}] params: {total / 1e6:.1f}M "
              f"({_fmt_bytes(total * itemsize)} at "
              f"{'bf16' if itemsize == 2 else 'f32'})")
        print(f"  tensor_parallel={tp}: {n_sharded}/{len(leaves)} leaves "
              f"sharded on '{MODEL_AXIS}' "
              f"({sharded_params / max(total, 1):.1%} of params)")
        print(f"  per-device params memory: {_fmt_bytes(per_device * itemsize)}"
              f" (replicated would be {_fmt_bytes(total * itemsize)})")
        if show_leaves:
            for key, shape, spec in rows:
                print(f"    {key:60s} {str(tuple(shape)):24s} {spec}")


def main(argv):
    ap = argparse.ArgumentParser()
    ap.add_argument("overrides", nargs="*")
    ap.add_argument("--leaves", action="store_true",
                    help="print the per-leaf PartitionSpec table")
    args = ap.parse_args(argv)

    from d3roma_tpu.config import compose

    base = compose(args.overrides)
    config = base.task
    tp = max(1, int(getattr(config, "tensor_parallel", 1) or 1))
    report(config, tp, args.leaves)


if __name__ == "__main__":
    main(sys.argv[1:])
