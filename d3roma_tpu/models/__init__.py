from d3roma_tpu.models.unet2d import UNet2D, pixel_in_channels  # noqa: F401
from d3roma_tpu.models.unet2d_condition import (  # noqa: F401
    UNet2DCondition,
    widened_in_channels,
)
from d3roma_tpu.models.vae import (  # noqa: F401
    SD_LATENT_SCALE,
    AutoencoderKL,
    decode_latent,
    encode_disp_to_latent,
    encode_image_to_latent,
)
from d3roma_tpu.models.clip_text import (  # noqa: F401
    CLIPTextConfig,
    CLIPTextModel,
    empty_prompt_tokens,
)
