"""The jitted training step.

Rebuild of the reference `train_step` (reference: train.py:157-538) as one
pure SPMD function: importance-sampled timesteps, pyramid/randn noise,
forward process, channel-concat conditioning, UNet forward, per-prediction-
type loss (epsilon / v_prediction / v_pred_depth / sample), importance
weighting, loss-aware sampler update, AdamW step. Under a data mesh, the
batch arrives sharded on axis 0 and jit's partitioner inserts the gradient
psum — there is no explicit collective code (SURVEY §2.9).

Differences by design:
- The v-prediction recon-MAE diagnostic decodes x_hat0 on device and
  returns it as a metric — no `.cpu()` round-trip in the hot loop
  (the reference's known host round-trip at train.py:344-361).
- The LDM path VAE-encodes GT/conds inside the same jitted program.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from d3roma_tpu.models.vae import decode_latent, encode_disp_to_latent, encode_image_to_latent
from d3roma_tpu.ops.noise import make_noise
from d3roma_tpu.ops.resample import (
    loss_aware_weights,
    sample_timesteps,
    update_loss_aware,
)
from d3roma_tpu.ops.schedules import ScheduleTables, add_noise, extract, get_velocity
from d3roma_tpu.pipelines.sampling import build_cond_concat
from d3roma_tpu.training.state import TrainState


def make_train_step(
    config,
    unet_apply: Callable,  # (params, model_input, t[, text_embed]) -> out
    tx: optax.GradientTransformation,
    tables: ScheduleTables,
    vae_apply: Optional[Callable] = None,  # (vae_params, x, method) -> ...
    text_embed: Optional[jnp.ndarray] = None,
    t_sampler: Optional[str] = None,  # None -> config.timestep_sampler
):
    """Returns step_fn(state, batch, key, vae_params=None) -> (state, metrics).

    batch: the device_preprocess output dict (normalized_disp, sim_disp,
    normalized_rgb, left_image, right_image, mask, ...), channel-last.

    The frozen VAE params are a TRACED ARGUMENT of step_fn, not a
    closure capture: a captured param tree becomes lowering constants
    embedded in the serialized compile request, which a remote-compile
    transport rejects outright for the flagship VAE (observed: HTTP 413
    "length limit exceeded" — the same trap the calibration capture
    programs hit, see GuidedLatentDiffusionPipeline.calibrate).
    """
    ldm = config.ldm
    loss_kind = config.loss_type
    pred_type = config.prediction_type
    cond_channels = config.cond_channels
    if t_sampler is None:
        t_sampler = getattr(config, "timestep_sampler", "uniform")
    if t_sampler not in ("uniform", "loss-second-moment"):
        raise ValueError(f"unknown timestep_sampler {t_sampler!r}")

    def elementwise_loss(a, b):
        if loss_kind == "l1":
            return jnp.abs(a - b)
        if loss_kind == "mse":
            return (a - b) ** 2
        raise ValueError(f"loss type {loss_kind} not supported")

    def step_fn(state: TrainState, batch: Dict, key: jax.Array,
                vae_params=None):
        va = (None if vae_apply is None
              else lambda x, method: vae_apply(vae_params, x, method))
        k_noise, k_t, k_rgbnoise = jax.random.split(key, 3)

        normalized_disp = batch["normalized_disp"]
        mask = batch["mask"]

        # clip GT into the sample range, masking clipped pixels
        # (reference: train.py:168-171)
        if config.clip_sample:
            r = config.clip_sample_range
            clipped = jnp.clip(normalized_disp, -r, r)
            mask = mask * (jnp.abs(clipped) < r).astype(mask.dtype)
            normalized_disp = clipped

        if ldm:
            x_clean = encode_disp_to_latent(va, normalized_disp)
            cond_sim = encode_disp_to_latent(va, batch["sim_disp"])
            cond_rgb = (
                encode_image_to_latent(va, batch["normalized_rgb"])
                if "rgb" in cond_channels else None
            )
            cond_left = (
                encode_image_to_latent(va, batch["left_image"])
                if "left" in cond_channels else None
            )
            cond_right = (
                encode_image_to_latent(va, batch["right_image"])
                if "right" in cond_channels else None
            )
        else:
            x_clean = normalized_disp
            cond_sim = batch["sim_disp"]
            cond_rgb = batch["normalized_rgb"] if "rgb" in cond_channels else None
            cond_left = batch["left_image"] if "left" in cond_channels else None
            cond_right = batch["right_image"] if "right" in cond_channels else None

        bs = x_clean.shape[0]
        noise = make_noise(k_noise, x_clean.shape, config.noise_strategy, x_clean.dtype)

        # importance-sampled timesteps (reference: train.py:261, resample.py)
        if t_sampler == "uniform":
            t = jax.random.randint(k_t, (bs,), 0, config.num_train_timesteps)
            weights = jnp.ones((bs,), jnp.float32)
        else:
            w_table = loss_aware_weights(state.sampler_state)
            t, weights = sample_timesteps(k_t, w_table, bs)

        if cond_rgb is not None and config.noise_rgb:
            rgb_noise = jax.random.normal(k_rgbnoise, cond_rgb.shape, cond_rgb.dtype)
            noisy_rgb = add_noise(tables, cond_rgb, rgb_noise, t)
            cond_rgb = cond_rgb * 0.5 + noisy_rgb * 0.5

        noisy = add_noise(tables, x_clean, noise, t)
        conds = build_cond_concat(cond_channels, cond_rgb, cond_left, cond_right, cond_sim)

        def loss_fn(params):
            inputs = jnp.concatenate([noisy, conds], axis=-1)
            if ldm:
                ctx = jnp.broadcast_to(text_embed, (bs,) + text_embed.shape[1:])
                model_output = unet_apply(params, inputs, t, ctx)
            else:
                model_output = unet_apply(params, inputs, t)

            metrics = {}
            if pred_type == "epsilon":
                if ldm:
                    network_loss = elementwise_loss(model_output, noise)
                else:
                    network_loss = elementwise_loss(model_output * mask, noise * mask)
            elif pred_type == "v_prediction":
                v = get_velocity(tables, x_clean, noise, t)
                network_loss = elementwise_loss(model_output, v)
                # recon diagnostic (reference: train.py:313-347), on device
                ab = extract(tables.alphas_cumprod, t, noisy.ndim)
                x0_hat_latent = jnp.sqrt(ab) * noisy - jnp.sqrt(1 - ab) * jax.lax.stop_gradient(model_output)
                if ldm:
                    x0_hat = jnp.clip(decode_latent(va, x0_hat_latent), -1, 1)
                else:
                    x0_hat = jnp.clip(x0_hat_latent, -1, 1)
                metrics["recon_mae"] = jnp.mean(jnp.abs(x0_hat - normalized_disp))
            elif pred_type == "v_pred_depth":
                # decoded-x0 pixel loss (reference: train.py:363-381)
                ab = extract(tables.alphas_cumprod, t, noisy.ndim)
                x0_hat_latent = jnp.sqrt(ab) * noisy - jnp.sqrt(1 - ab) * model_output
                x0_hat = decode_latent(va, x0_hat_latent)
                network_loss = elementwise_loss(x0_hat * mask, normalized_disp * mask)
                metrics["recon_mae"] = jnp.mean(
                    jnp.abs(jnp.clip(jax.lax.stop_gradient(x0_hat), -1, 1) - normalized_disp)
                )
            elif pred_type == "sample":
                # per-channel weighted masked loss (reference: train.py:383-413)
                channel_weights = (1.0, 1.0, 1.0)
                network_loss = 0.0
                for c in range(config.depth_channels):
                    network_loss = network_loss + elementwise_loss(
                        model_output[..., c : c + 1] * mask,
                        normalized_disp[..., c : c + 1] * mask,
                    ) * channel_weights[min(c, 2)]
                network_loss = network_loss / config.depth_channels
            else:
                raise NotImplementedError(pred_type)

            w = weights.reshape(-1, 1, 1, 1)
            loss = jnp.mean(network_loss * w)
            # per-sample loss for the loss-aware sampler
            per_sample = jnp.mean(
                network_loss.reshape(bs, -1), axis=1
            )
            metrics["per_sample_loss"] = per_sample
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        grad_norm = optax.global_norm(grads)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        sampler_state = update_loss_aware(
            state.sampler_state, t, metrics["per_sample_loss"]
        )

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            sampler_state=sampler_state,
        )
        out_metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
            "t_mean": jnp.mean(t.astype(jnp.float32)),
        }
        if "recon_mae" in metrics:
            out_metrics["recon_mae"] = metrics["recon_mae"]
        out_metrics["per_sample_loss"] = metrics["per_sample_loss"]
        out_metrics["timesteps"] = t
        return new_state, out_metrics

    return step_fn
