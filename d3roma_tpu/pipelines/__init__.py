from d3roma_tpu.pipelines.sampling import (  # noqa: F401
    PipelineOutput,
    SamplerSpec,
    build_cond_concat,
    latent_pipeline,
    pixel_pipeline,
    run_sampler,
)
from d3roma_tpu.pipelines.pipeline import (  # noqa: F401
    GuidedDiffusionPipeline,
    GuidedLatentDiffusionPipeline,
    create_sampler_spec,
)
