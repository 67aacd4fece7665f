#!/usr/bin/env python
"""Training CLI.

Same contract as the reference Hydra main (reference: train.py:703-898,
invoked as ``accelerate launch train.py task=... task.tag=release``):

    python train.py task=train_dreds_reprod task.tag=release debug=true

Multi-host TPU pods: run the same command per host — device mesh and
sharding replace the Accelerate launcher (SURVEY.md §2.9).
"""

import logging
import os
import sys

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(name)s %(levelname)s %(message)s")


def main(argv):
    from d3roma_tpu.config import compose, get_output_dir, set_debug
    from d3roma_tpu.training import train

    base = compose(argv)
    config = base.task
    if base.debug:
        set_debug(config)
    if base.seed is not None and base.seed >= 0:
        import numpy as np
        np.random.seed(base.seed)

    output_dir = config.output_dir or get_output_dir(base)
    config.output_dir = output_dir
    os.makedirs(output_dir, exist_ok=True)

    fh = logging.FileHandler(os.path.join(output_dir, "train.log"))
    fh.setLevel(logging.INFO)
    logging.getLogger().addHandler(fh)
    logging.getLogger().setLevel(logging.INFO)
    logging.info("output dir: %s", output_dir)

    writer = None
    try:
        from tensorboardX import SummaryWriter

        writer = SummaryWriter(os.path.join(output_dir, "tb"))
    except Exception:
        logging.warning("tensorboardX unavailable; scalar logging disabled")

    train(config, base_config=base, output_dir=output_dir, writer=writer)


if __name__ == "__main__":
    main(sys.argv[1:])
