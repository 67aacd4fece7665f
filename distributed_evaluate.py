#!/usr/bin/env python
"""Multi-chip data-parallel evaluation (reference: distributed_evaluate.py).

    python distributed_evaluate.py task=eval_dreds_reprod task.resume_pretrained=...

The reference shards only the dataloader across ranks and all-gathers
metric tensors (distributed_evaluate.py:96,153-167). Here each batch is
sharded over the data mesh and the jitted pipeline runs SPMD — per-batch
metrics come back already global, so there is no gather code. On multi-host
pods, `jax.distributed.initialize()` is called automatically when the
JAX_COORDINATOR env vars are present.
"""

import logging
import os
import sys
from functools import partial

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("distributed_evaluate")


def main(argv):
    import jax

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()

    import numpy as np

    from d3roma_tpu.config import compose, set_debug
    from d3roma_tpu.data import device_preprocess, fetch_dataloader
    from d3roma_tpu.evaluation import evaluate_dataset
    from d3roma_tpu.ops.normalizer import Normalizer
    from d3roma_tpu.parallel import (make_mesh, pad_batch_to_devices,
                                     shard_batch, slice_process_local)
    from d3roma_tpu.pipelines import (
        GuidedDiffusionPipeline,
        GuidedLatentDiffusionPipeline,
        create_sampler_spec,
    )

    base = compose(argv)
    config = base.task
    if base.debug:
        set_debug(config)

    assert config.resume_pretrained and os.path.exists(config.resume_pretrained)
    cls = GuidedLatentDiffusionPipeline if config.ldm else GuidedDiffusionPipeline
    pipeline = cls.from_pretrained(config.resume_pretrained)
    tp = max(1, int(getattr(config, "tensor_parallel", 1) or 1))
    if config.fast_inference != "off" and hasattr(pipeline, "fast_inference"):
        if tp > 1:
            # Pallas-kernel modes are unvalidated under a model-sharded
            # mesh (pallas_call needs shard_map, not GSPMD)
            logger.warning("tensor_parallel=%d: fast_inference=%s kernels "
                           "are not TP-validated; using the XLA path",
                           tp, config.fast_inference)
        else:
            pipeline = pipeline.fast_inference(config.fast_inference)
    pipeline = pipeline.replace_sampler(create_sampler_spec(config, train=False))
    if config.deepcache > 1 and hasattr(pipeline, "deepcache"):
        # after replace_sampler so the heun validation sees the final spec
        pipeline = pipeline.deepcache(config.deepcache)

    if tp > 1:
        # 2-D (data, model) mesh: batches shard on data, the UNet/VAE
        # params shard Megatron-style on model (parallel/tensor.py)
        from d3roma_tpu.parallel import shard_pipeline_tp

        pipeline, mesh = shard_pipeline_tp(pipeline, tp, logger)
    else:
        mesh = make_mesh()
    # tails only need the DATA axis size; padding to the device count
    # would run the sampling scan on tp-fold extra duplicated rows
    n_pad = dict(zip(mesh.axis_names, mesh.devices.shape))["data"]
    norm = Normalizer.from_config(config)

    def preprocess(raw_batch):
        arrays = {k: v for k, v in raw_batch.items()
                  if not isinstance(v, (list, str))}
        arrays = pad_batch_to_devices(arrays, n_pad)
        # multi-host: keep only this process's row-slice (loaders are
        # seed-identical on every host — feeding the full batch would
        # assemble process_count duplicate copies of every sample)
        arrays = slice_process_local(arrays)
        sharded = shard_batch(arrays, mesh)
        return device_preprocess(sharded, norm, config.prediction_space)

    _, val_loaders = fetch_dataloader(config)
    key = jax.random.PRNGKey(base.seed if base.seed and base.seed >= 0 else 0)
    for name, loader in zip(config.eval_dataset, val_loaders):
        metrics, stat = evaluate_dataset(
            config, pipeline, loader, key, preprocess=preprocess,
            dataset_name=name,
        )
        if jax.process_index() == 0:
            logger.info("[%s] metrics over %d devices: %s", name,
                        mesh.devices.size, metrics)


if __name__ == "__main__":
    main(sys.argv[1:])
