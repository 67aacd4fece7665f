from d3roma_tpu.synthetic.procedural import (  # noqa: F401
    ProceduralSceneRenderer,
    SceneConfig,
    generate_dataset,
    write_hiss_frame,
)
