"""Checkpoint / resume via Orbax.

Two artifacts, as in the reference (SURVEY §5):
- *train state* (params + optimizer + sampler state + RNG + StepCounter):
  `save_state` per epoch to checkpoints/last and on anomalies
  (reference: train.py:689-692, 446-453); resume restores state and
  fast-forwards the dataloader (reference: train.py:556-562).
- *pipeline export*: `save_pretrained` directories per epoch / best model
  (reference: train.py:680-682, 700-701), consumed by from_pretrained at
  eval/inference.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax
import orbax.checkpoint as ocp

from d3roma_tpu.training.state import StepCounter, TrainState


def save_state(ckpt_dir: str, state: TrainState, counter: StepCounter) -> None:
    ckpt_dir = os.path.abspath(ckpt_dir)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(ckpt_dir, "state"), jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(ckpt_dir, "counter.json"), "w") as f:
        json.dump(counter.state_dict(), f)


def load_state(
    ckpt_dir: str, template: TrainState
) -> Tuple[TrainState, StepCounter]:
    ckpt_dir = os.path.abspath(ckpt_dir)
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(
        os.path.join(ckpt_dir, "state"), jax.device_get(template)
    )
    counter = StepCounter()
    cpath = os.path.join(ckpt_dir, "counter.json")
    if os.path.exists(cpath):
        with open(cpath) as f:
            counter.load_state_dict(json.load(f))
    return state, counter


def latest_checkpoint(root: str) -> Optional[str]:
    last = os.path.join(root, "checkpoints", "last")
    return last if os.path.exists(os.path.join(last, "counter.json")) else None
