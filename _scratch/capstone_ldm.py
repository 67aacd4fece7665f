"""On-chip flagship LDM training capstone (round 3).

Validates that the FLAGSHIP latent-diffusion training configuration
(SD2.1-geometry 866M UNet + VAE encode of rgb+raw conds, bf16 AMP,
v-prediction) actually fits and trains on ONE real v5e chip — the claim
was previously validated only by the 8-device CPU dryrun at tiny shapes.

Records: per-step loss curve, steps/sec post-compile, peak-memory proxy,
and (if the eval compile survives the relay) one in-training eval with
best-EPE export.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python /root/repo/_scratch/capstone_ldm.py
"""
import json
import os
import sys
import time

WORK = "/tmp/capstone_ldm"
MAX_STEPS = int(os.environ.get("CAP_STEPS", "120"))
VAL_AT = int(os.environ.get("CAP_VAL", str(MAX_STEPS)))  # 0 disables eval
BATCH = int(os.environ.get("CAP_BATCH", "8"))

os.makedirs(WORK, exist_ok=True)
os.chdir(WORK)

import logging
logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(name)s %(levelname)s %(message)s")

from d3roma_tpu.synthetic import SceneConfig, generate_dataset

if not os.path.isdir("datasets/HISS/train"):
    print("generating procedural HISS data ...", flush=True)
    generate_dataset("datasets/HISS", 64, "train",
                     SceneConfig(height=360, width=640), seed=11)
    generate_dataset("datasets/HISS", 8, "val",
                     SceneConfig(height=360, width=640), seed=97)

from d3roma_tpu.config import compose
from d3roma_tpu.training import train

base = compose([
    "task=train_ldm_mixed_rgb+raw",
    "task.train_dataset=[HISS]",
    # oversample x16 -> 1024-sample epoch (128 steps at batch 8), so the
    # 120-step run stays inside epoch 0 and pays ONE end-of-run checkpoint
    # save instead of one ~80 s save every 8 steps
    "task.dataset_weight=[16]",
    "task.eval_dataset=[HISS]",
    f"task.train_batch_size={BATCH}",
    "task.eval_batch_size=4",
    "task.eval_num_batch=2",
    "task.mixed_precision=bf16",
    "task.gradient_accumulation_steps=1",
    f"task.val_every_global_steps={VAL_AT if VAL_AT else 10 ** 9}",
    "task.learning_rate=1e-4",
    "task.lr_warmup_steps=0",
    "task.num_epochs=1000",
    # f32 AdamW on 866M params = 16.7 GB > the 15.75 GB single chip
    # (measured; the reference trains on 8x A100-40G). Factored moments
    # fit. Multi-chip AdamW sharding is covered by the DP/TP dryruns.
    f"task.optimizer={os.environ.get('CAP_OPT', 'adafactor')}",
])
config = base.task
config.output_dir = os.path.join(WORK, "run")


class Recorder:
    """writer-duck: timestamps every scalar the train loop emits."""

    def __init__(self):
        self.scalars = []

    def add_scalar(self, key, value, step):
        self.scalars.append((key, float(value), int(step), time.time()))
        print(f"  [{time.strftime('%H:%M:%S')}] {key} @{step}: {value:.5f}",
              flush=True)


rec = Recorder()
t0 = time.time()
state, counter, models = train(config, base_config=base,
                               output_dir=config.output_dir,
                               max_steps=MAX_STEPS, writer=rec)
wall = time.time() - t0

losses = [(s, v, t) for k, v, s, t in rec.scalars if k == "train/loss"]
result = {
    "max_steps": MAX_STEPS,
    "batch": BATCH,
    "wall_s": round(wall, 1),
    "losses": [(s, round(v, 5)) for s, v, _ in losses],
    "best_epe": (None if counter.best_epe in (None, float("inf"))
                 else round(float(counter.best_epe), 4)),
}
# steps/sec measured between the first and last RECORDED loss (both
# post-compile; recording happens every 10 steps)
if len(losses) >= 2:
    (s0, _, ta), (s1, _, tb) = losses[0], losses[-1]
    if tb > ta:
        result["steps_per_s_postcompile"] = round((s1 - s0) / (tb - ta), 3)
        result["s_per_step"] = round((tb - ta) / (s1 - s0), 3)
print("CAPSTONE_RESULT " + json.dumps(result), flush=True)
