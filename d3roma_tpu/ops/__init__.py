from d3roma_tpu.ops.schedules import (  # noqa: F401
    ScheduleConfig,
    ScheduleTables,
    add_noise,
    get_velocity,
    make_betas,
    set_timesteps,
    snr,
)
from d3roma_tpu.ops.scheduler_step import (  # noqa: F401
    StepOutput,
    ddim_step,
    ddpm_step,
    dynamic_threshold,
    posterior_mean_variance,
    predict_x0_and_eps,
)
from d3roma_tpu.ops.normalizer import Normalizer, normalize_rgb  # noqa: F401
from d3roma_tpu.ops.padding import InputPadder  # noqa: F401
from d3roma_tpu.ops.metrics import compute_errors, metrics_to_dict  # noqa: F401
from d3roma_tpu.ops.scale_shift import (  # noqa: F401
    compute_scale_and_shift,
    ransac_scale_shift,
)
from d3roma_tpu.ops.noise import make_noise, pyramid_noise_like  # noqa: F401
from d3roma_tpu.ops.ensemble import ensemble_depths  # noqa: F401
from d3roma_tpu.ops.warp import bilinear_sample, warp_right_to_left  # noqa: F401
