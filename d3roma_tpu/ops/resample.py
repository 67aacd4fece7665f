"""Importance sampling of diffusion timesteps — functional state-machine.

TPU-native rebuild of the reference's schedule samplers
(reference: core/resample.py:8-163). The reference keeps mutable numpy state
on the host and syncs across ranks with torch.distributed all_gather; here
the sampler state is a pytree living *inside* the jitted train step, updated
with pure scatter ops. Under pjit the global batch is already visible to the
program, so the update is equivalent to the reference's
`update_with_all_losses` over the gathered batch with no explicit collective.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class SamplerState(NamedTuple):
    """State of a loss-second-moment resampler.

    loss_history: [T, H] ring buffer of recent losses per timestep.
    loss_counts:  [T] number of valid entries per timestep.
    """

    loss_history: jnp.ndarray
    loss_counts: jnp.ndarray


def init_loss_aware_state(T: int, history_per_term: int = 10) -> SamplerState:
    return SamplerState(
        loss_history=jnp.zeros((T, history_per_term), jnp.float32),
        loss_counts=jnp.zeros((T,), jnp.int32),
    )


def loss_aware_weights(state: SamplerState, uniform_prob: float = 0.001) -> jnp.ndarray:
    """sqrt(E[loss^2]) per timestep, mixed with a uniform floor; uniform until
    every timestep's history is full (reference: core/resample.py:141-150)."""
    T, H = state.loss_history.shape
    warmed = jnp.all(state.loss_counts == H)
    w = jnp.sqrt(jnp.mean(state.loss_history**2, axis=-1))
    w = w / jnp.maximum(jnp.sum(w), 1e-12)
    w = w * (1.0 - uniform_prob) + uniform_prob / T
    return jnp.where(warmed, w, jnp.ones((T,), jnp.float32) / T)


def update_loss_aware(
    state: SamplerState, ts: jnp.ndarray, losses: jnp.ndarray
) -> SamplerState:
    """Insert (t, loss) pairs: append while the ring isn't full, else shift
    out the oldest (reference: core/resample.py:152-160). Sequential semantics
    within a batch are preserved via a scan so duplicate timesteps stack."""

    def insert(carry, tl):
        hist, counts = carry
        t, loss = tl
        t = t.astype(jnp.int32)
        cnt = counts[t]
        H = hist.shape[1]
        full = cnt == H
        row = hist[t]
        shifted = jnp.where(full, jnp.roll(row, -1).at[H - 1].set(loss), row.at[cnt].set(loss))
        hist = hist.at[t].set(shifted)
        counts = counts.at[t].set(jnp.where(full, cnt, cnt + 1))
        return (hist, counts), None

    (hist, counts), _ = jax.lax.scan(
        insert, (state.loss_history, state.loss_counts), (ts, losses)
    )
    return SamplerState(hist, counts)


def sample_timesteps(
    key: jax.Array, weights: jnp.ndarray, batch_size: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Importance-sample timesteps; returns (t [B], importance weights [B])
    with E[w * loss] unbiased (reference: core/resample.py:45-61)."""
    T = weights.shape[0]
    p = weights / jnp.sum(weights)
    t = jax.random.categorical(key, jnp.log(jnp.maximum(p, 1e-20)), shape=(batch_size,))
    w = 1.0 / (T * jnp.take(p, t))
    return t, w


def uniform_weights(T: int) -> jnp.ndarray:
    return jnp.ones((T,), jnp.float32)


def snr_weights(tables) -> jnp.ndarray:
    """SNR-proportional sampling (reference: core/resample.py:72-77)."""
    ab = tables.alphas_cumprod
    return ab / (1.0 - ab)


def create_named_schedule_sampler(name: str, T: int, tables=None):
    """Name-based factory (reference: core/resample.py:8-22). Returns
    (weights_fn, state | None): uniform and snr are stateless; the
    loss-aware sampler carries a SamplerState updated per step."""
    if name == "uniform":
        return (lambda state=None: uniform_weights(T)), None
    if name == "snr":
        assert tables is not None, "snr sampler needs schedule tables"
        w = snr_weights(tables)
        return (lambda state=None: w), None
    if name == "loss-second-moment":
        state = init_loss_aware_state(T)
        return loss_aware_weights, state
    raise NotImplementedError(f"unknown schedule sampler: {name}")
