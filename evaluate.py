#!/usr/bin/env python
"""Evaluation CLI (reference: evaluate.py:299-427).

    python evaluate.py task=eval_dreds_reprod task.resume_pretrained=...

Loads an exported pipeline, overrides the sampler from the config, runs the
eval datasets with optional coarse-to-fine tiling / ensembling / guidance
sweep, writes metric logs + artifacts.
"""

import logging
import os
import sys

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("evaluate")


def main(argv):
    import jax

    from d3roma_tpu.config import compose, get_output_dir, set_debug
    from d3roma_tpu.data import fetch_dataloader
    from d3roma_tpu.evaluation import evaluate_dataset
    from d3roma_tpu.ops.normalizer import Normalizer
    from d3roma_tpu.pipelines import (
        GuidedDiffusionPipeline,
        GuidedLatentDiffusionPipeline,
        create_sampler_spec,
    )
    from d3roma_tpu.training.train_loop import _preprocess_eval
    from functools import partial

    base = compose(argv)
    config = base.task
    if base.debug:
        set_debug(config)

    assert config.resume_pretrained and os.path.exists(config.resume_pretrained), (
        f"resume_pretrained not found: {config.resume_pretrained!r}"
    )
    cls = GuidedLatentDiffusionPipeline if config.ldm else GuidedDiffusionPipeline
    pipeline = cls.from_pretrained(config.resume_pretrained)
    pipeline = pipeline.replace_sampler(create_sampler_spec(config, train=False))
    if config.fast_inference != "off" and hasattr(pipeline, "fast_inference"):
        pipeline = pipeline.fast_inference(config.fast_inference)
    from d3roma_tpu.config import deepcache_active

    if ((deepcache_active(config.deepcache) or config.deepcache_depth != 1)
            and hasattr(pipeline, "deepcache")):
        pipeline = pipeline.deepcache(config.deepcache,
                                      depth=config.deepcache_depth)

    out_dir = config.eval_output or os.path.join(
        get_output_dir(base), f"eval_{config.eval_split}"
    )
    os.makedirs(out_dir, exist_ok=True)
    fh = logging.FileHandler(os.path.join(out_dir, "eval.log"))
    fh.setLevel(logging.INFO)
    logging.getLogger().addHandler(fh)
    logging.getLogger().setLevel(logging.INFO)

    _, val_loaders = fetch_dataloader(config)
    norm = Normalizer.from_config(config)
    key = jax.random.PRNGKey(base.seed if base.seed and base.seed >= 0 else 0)

    for name, loader in zip(config.eval_dataset, val_loaders):
        metrics, stat = evaluate_dataset(
            config, pipeline, loader, key,
            eval_output_dir=os.path.join(out_dir, name),
            preprocess=partial(_preprocess_eval, config=config, normalizer=norm),
            # every artifact-producing flag opens the artifact block —
            # plot_denoised_images / plot_intermediate_metrics / the HISS
            # EXR protocol must not silently require an unrelated flag
            write_artifacts=(config.plot_error_map or config.write_pcd
                             or config.plot_denoised_images
                             or config.plot_intermediate_metrics
                             or name == "HISS"),
            dataset_name=name,
        )
        logger.info("[%s] metrics: %s", name, metrics)
        logger.info("[%s] rejected %d abnormal samples: %s", name,
                    stat.num_rejected, stat.abnormal_indexes)


if __name__ == "__main__":
    main(sys.argv[1:])
