"""d3roma_tpu — TPU-native depth-restoration diffusion framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of D3RoMa
(disparity-diffusion depth sensing; reference: jie0530/d3roma). Conditional
diffusion restores noisy / incomplete camera depth, conditioned on stereo IR
pairs, RGB, and raw sensor disparity. Pixel-space and latent (SD-style)
model families, guided DDPM/DDIM sampling fused into a single jitted loop,
data-parallel training over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

from d3roma_tpu.config import TrainingConfig  # noqa: F401
