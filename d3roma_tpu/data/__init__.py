from d3roma_tpu.data.loader import (  # noqa: F401
    MONO_DATASETS,
    STEREO_DATASETS,
    DataLoader,
    collate,
    create_dataset,
    fetch_dataloader,
)
from d3roma_tpu.data.preprocess import device_preprocess  # noqa: F401
