"""Disparity normalization to the diffusion working range [-1, 1].

TPU-native (channel-last, fixed-shape, mask-based) equivalent of the
reference's `Normalizer` (reference: utils_d3roma/utils.py:137-293). Three
regimes:

- ``average``:   y = ((x / bound) ** gamma - t) * s, replicated over
  ``num_chs`` channels; denormalize averages the per-channel inverses.
- ``piecewise``: bounded residual decomposition into up to 3 channels with
  per-channel gamma.
- ``ssi``:       per-sample quantile scale/shift to [0,1] then (y-t)*s;
  denormalization re-aligns against the raw disparity by least squares or
  batched RANSAC.

All ops are pure jnp with static shapes — boolean fancy indexing in the
reference becomes masked reductions here.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp

from d3roma_tpu.ops.scale_shift import compute_scale_and_shift, ransac_scale_shift


def masked_quantile(x: jnp.ndarray, mask: jnp.ndarray, qs: Sequence[float], axis=None):
    """Quantiles of x restricted to mask (NaN-based, fixed shape)."""
    masked = jnp.where(mask, x, jnp.nan)
    return jnp.nanquantile(masked, jnp.asarray(qs), axis=axis)


@dataclasses.dataclass(frozen=True)
class Normalizer:
    ssi: bool = False
    mode: str = "piecewise"  # "piecewise" | "average"
    num_chs: int = 3
    ch_bounds: Tuple[float, ...] = (64.0, 32.0, 32.0)
    ch_gammas: Tuple[float, ...] = (1.0, 1.0, 1.0)
    t: float = 0.5
    s: float = 2.0
    safe_ssi: bool = True
    ransac_error_threshold: float = 0.6
    low_p: float = 0.0
    high_p: float = 1.0

    @staticmethod
    def from_config(config) -> "Normalizer":
        return Normalizer(
            ssi=config.ssi,
            mode=config.normalize_mode,
            num_chs=config.num_chs,
            ch_bounds=tuple(config.ch_bounds),
            ch_gammas=tuple(config.ch_gammas),
            t=config.norm_t,
            s=config.norm_s,
            safe_ssi=config.safe_ssi,
            low_p=getattr(config, "ssi_low_p", 0.0),
            high_p=getattr(config, "ssi_high_p", 1.0),
            ransac_error_threshold=config.ransac_error_threshold,
        )

    # ------------------------------------------------------------------ #
    # normalize: x [..., H, W, 1] -> y [..., H, W, num_chs]
    # ------------------------------------------------------------------ #
    def normalize(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        low: Optional[jnp.ndarray] = None,
        up: Optional[jnp.ndarray] = None,
    ):
        """Returns (y, low, up). Channel-last; x has a trailing channel dim
        of 1. For ssi, low/up are per-sample min/max quantiles over the mask
        (reference: utils.py:170-185)."""
        if self.ssi:
            if mask is None:
                mask = jnp.ones_like(x, dtype=bool)
            mask = mask.astype(bool)
            if low is None or up is None:
                # per-sample quantiles over leading batch dims if present
                if x.ndim == 4:  # [B,H,W,1]
                    q = masked_quantile(
                        x.reshape(x.shape[0], -1),
                        mask.reshape(x.shape[0], -1),
                        [self.low_p, self.high_p],
                        axis=1,
                    )  # [2, B]
                    low = q[0].reshape(-1, 1, 1, 1)
                    up = q[1].reshape(-1, 1, 1, 1)
                else:  # [H,W,1]
                    q = masked_quantile(x, mask, [self.low_p, self.high_p])
                    low, up = q[0], q[1]
            # degenerate masks: an all-invalid frame yields NaN low/up
            # (nanquantile over no values) and a constant masked region
            # yields up == low -> 0/0. Both would poison the training
            # loss; fall back to a harmless identity window instead.
            bad = ~jnp.isfinite(low) | ~jnp.isfinite(up) | (up - low <= 0)
            low = jnp.where(bad, 0.0, low)
            up = jnp.where(bad, 1.0, up)
            y = (jnp.clip((x - low) / (up - low), 0.0, 1.0) - self.t) * self.s
            y = jnp.where(mask, y, 0.0)
            return y, low, up
        else:
            y = self._encode(x)
            return (y - self.t) * self.s, None, None

    def _encode(self, x: jnp.ndarray) -> jnp.ndarray:
        total_bound = float(sum(self.ch_bounds[: max(1, self.num_chs)]))
        x = jnp.clip(x, max=total_bound)
        if self.mode == "average":
            assert len(self.ch_bounds) >= 1
            gamma, bound = self.ch_gammas[0], self.ch_bounds[0]
            ch = (x / bound) ** gamma
            return jnp.concatenate([ch] * self.num_chs, axis=-1)
        elif self.mode == "piecewise":
            chs = []
            residual = x
            for i in range(self.num_chs):
                bound = self.ch_bounds[i]
                gamma = self.ch_gammas[i]
                ch = jnp.minimum(residual, bound) / bound
                residual = jnp.where(ch < 1.0, 0.0, residual - bound)
                chs.append(ch**gamma)
            return jnp.concatenate(chs, axis=-1)
        raise ValueError(f"unknown normalize mode: {self.mode!r}")

    # ------------------------------------------------------------------ #
    # denormalize: y [B, H, W, C] -> disparity [B, H, W, R]
    # (R = rounds when ssi, or C // num_chs otherwise)
    # ------------------------------------------------------------------ #
    def denormalize(
        self,
        y: jnp.ndarray,
        raw_disp: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        key=None,
    ) -> jnp.ndarray:
        """Invert `normalize`. Channel-last [B,H,W,C].

        ssi: re-align each of the R channel-stacked rounds to raw_disp
        ([B,H,W,1]) over mask via LSQ or RANSAC (reference: utils.py:231-258).
        """
        if self.ssi:
            assert raw_disp is not None and mask is not None
            B, H, W, R = y.shape
            pred = jnp.moveaxis(y, -1, 1).reshape(B * R, H * W)
            gt = jnp.broadcast_to(
                jnp.moveaxis(raw_disp, -1, 1), (B, R, H, W)
            ).reshape(B * R, H * W)
            m = jnp.broadcast_to(
                jnp.moveaxis(mask.astype(y.dtype), -1, 1), (B, R, H, W)
            ).reshape(B * R, H * W)
            if self.safe_ssi:
                assert key is not None, "safe_ssi RANSAC needs a PRNG key"
                st = ransac_scale_shift(
                    pred, gt, m, key,
                    n_frac=0.1, k_iters=10, d_frac=0.2,
                    error_threshold=self.ransac_error_threshold,
                )
            else:
                st = compute_scale_and_shift(pred, gt, m)
            s = st[:, 0].reshape(B, 1, 1, R)
            t = st[:, 1].reshape(B, 1, 1, R)
            return y * s + t
        else:
            B, H, W, C = y.shape
            R = C // self.num_chs
            y = y.reshape(B, H, W, R, self.num_chs)
            z = self._decode(y / self.s + self.t)
            return z.reshape(B, H, W, R)

    def _decode(self, y: jnp.ndarray) -> jnp.ndarray:
        """y [..., num_chs] -> disparity [..., 1]-squeezed (last dim dropped)."""
        if self.mode == "average":
            gamma, bound = self.ch_gammas[0], self.ch_bounds[0]
            z = jnp.sum(y ** (1.0 / gamma), axis=-1) * (bound / self.num_chs)
            return z
        elif self.mode == "piecewise":
            z = 0.0
            for i in range(self.num_chs):
                z = z + y[..., i] ** (1.0 / self.ch_gammas[i]) * self.ch_bounds[i]
            return z
        raise ValueError(f"unknown normalize mode: {self.mode!r}")


def normalize_rgb(*images):
    """uint8 [0,255] -> [-1,1] (reference: utils_d3roma/utils.py:663-671)."""
    return [None if im is None else (im / 255.0 - 0.5) * 2.0 for im in images]
