#!/usr/bin/env python
"""DeepCache accuracy sweep on a trained flagship checkpoint.

Measures the end-metric drift of the DeepCache approximation (deep-trunk
reuse across denoise steps, Ma et al. CVPR 2024) against the exact
10-step DDIM run, on the capstone-trained flagship LDM checkpoint
(_scratch/capstone_ldm.py writes it to /tmp/capstone_ldm/run). The
checkpoint is weakly trained, so ABSOLUTE metrics are poor — the
k-vs-exact DELTAS are the signal (same eval PRNG keys per k, bf16 exact
compute, no quantization, isolating the caching approximation).

Feeds the accuracy table in docs/PERFORMANCE.md that gates the bench
default interval (bench.py DEFAULT_DEEPCACHE).

Run (on the TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/deepcache_accuracy.py
Env:
  DC_KS=1,3,5        intervals to measure (1 = exact baseline, required)
  DC_RUN=/tmp/capstone_ldm   capstone work dir (datasets/ + run/checkpoints)
"""
import json
import os
import sys
import time

KS = [int(k) for k in os.environ.get("DC_KS", "1,3,5").split(",")]
WORK = os.environ.get("DC_RUN", "/tmp/capstone_ldm")
assert 1 in KS, "interval 1 (exact) is the baseline — include it in DC_KS"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(WORK)  # datasets/HISS resolves relative to the capstone work dir

import jax

from d3roma_tpu.config import compose
from d3roma_tpu.data import fetch_dataloader
from d3roma_tpu.evaluation import evaluate_dataset
from d3roma_tpu.ops import Normalizer
from d3roma_tpu.training.checkpoint import load_state
from d3roma_tpu.training.state import create_train_state
from d3roma_tpu.training.train_loop import (
    _preprocess_eval,
    build_models,
    create_pipeline,
)

# identical config to _scratch/capstone_ldm.py (the checkpoint's run)
base = compose([
    "task=train_ldm_mixed_rgb+raw",
    "task.train_dataset=[HISS]",
    "task.dataset_weight=[16]",
    "task.eval_dataset=[HISS]",
    "task.train_batch_size=8",
    "task.eval_batch_size=4",
    "task.eval_num_batch=2",
    "task.mixed_precision=bf16",
    "task.optimizer=adafactor",
])
config = base.task

ckpt = os.path.join(WORK, "run", "checkpoints", "last")
assert os.path.isdir(ckpt), f"no capstone checkpoint at {ckpt} — run _scratch/capstone_ldm.py first"

models = build_models(config, jax.random.PRNGKey(0))
template = create_train_state(config, models["unet_params"], steps_per_epoch=128)
state, counter = load_state(ckpt, template)
print(f"# loaded checkpoint @ step {counter.global_step}", file=sys.stderr)
models = {**models, "unet_params": state.params}
del state, template

pipeline = create_pipeline(config, models).half_precision()
normalizer = Normalizer.from_config(config)
_, val_loaders = fetch_dataloader(config, seed=0)
loader = val_loaders[0]

from functools import partial

preprocess = partial(_preprocess_eval, config=config, normalizer=normalizer)

results = {}
for k in KS:
    pipe = pipeline.deepcache(k) if k > 1 else pipeline
    t0 = time.time()
    # same key per k -> identical noise draws; deltas isolate the caching
    m, _ = evaluate_dataset(config, pipe, loader, jax.random.PRNGKey(1234),
                            preprocess=preprocess,
                            max_batches=config.eval_num_batch,
                            dataset_name="HISS")
    results[k] = m
    print(f"# k={k} done in {time.time() - t0:.0f}s: "
          f"epe={m['disp']['epe']:.4f} absrel={m['depth']['rel']:.4f}",
          file=sys.stderr)

base_m = results[1]
table = {}
for k in KS:
    row = {}
    for space, met in (("disp", "epe"), ("depth", "rel"),
                       ("depth", "rmse"), ("depth", "mae")):
        v, b = results[k][space][met], base_m[space][met]
        row[f"{space}_{met}"] = round(float(v), 4)
        if k != 1 and b:
            row[f"{space}_{met}_drift_pct"] = round(100.0 * (v - b) / b, 2)
    table[k] = row
print(json.dumps({"checkpoint_step": counter.global_step,
                  "frames": config.eval_batch_size * config.eval_num_batch,
                  "table": table}, indent=1))
