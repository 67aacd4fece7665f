from d3roma_tpu.evaluation.averager import RunningAverager  # noqa: F401
from d3roma_tpu.evaluation.eval_loop import (  # noqa: F401
    evaluate_intermediate_metrics,
    denormalize,
    eval_batch,
    eval_sliced_batch,
    evaluate_dataset,
)
