from d3roma_tpu.training.state import (  # noqa: F401
    StepCounter,
    TrainState,
    build_lr_schedule,
    build_optimizer,
    create_train_state,
)
from d3roma_tpu.training.train_step import make_train_step  # noqa: F401
from d3roma_tpu.training.train_loop import build_models, create_pipeline, train  # noqa: F401
from d3roma_tpu.training.checkpoint import (  # noqa: F401
    latest_checkpoint,
    load_state,
    save_state,
)
from d3roma_tpu.training.forensics import AbnormalLossDetector  # noqa: F401
