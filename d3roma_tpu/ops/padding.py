"""Divisibility padding for arbitrary input sizes.

Channel-last equivalent of the reference's `InputPadder`
(reference: utils_d3roma/utils.py:297-325). TPU note: pad sizes are computed
from static shapes at trace time, so each distinct resolution compiles once —
bucket resolutions upstream.
"""

from __future__ import annotations

import jax.numpy as jnp


class InputPadder:
    """Pads [B, H, W, C] images so H and W are divisible by `divis_by`."""

    def __init__(self, dims, mode: str = "sintel", divis_by: int = 8):
        # dims may be a full NHWC shape or a bare (H, W)
        if len(dims) >= 3:
            self.ht, self.wd = int(dims[-3]), int(dims[-2])
        else:
            self.ht, self.wd = int(dims[0]), int(dims[1])
        pad_ht = (((self.ht // divis_by) + 1) * divis_by - self.ht) % divis_by
        pad_wd = (((self.wd // divis_by) + 1) * divis_by - self.wd) % divis_by
        if mode == "sintel":
            # (left, right, top, bottom)
            self._pad = (pad_wd // 2, pad_wd - pad_wd // 2, pad_ht // 2, pad_ht - pad_ht // 2)
        else:
            self._pad = (pad_wd // 2, pad_wd - pad_wd // 2, 0, pad_ht)

    @property
    def padded_size(self):
        return (
            self._pad[2] + self._pad[3] + self.ht,
            self._pad[0] + self._pad[1] + self.wd,
        )

    def _pad_widths(self):
        l, r, t, b = self._pad
        return ((0, 0), (t, b), (l, r), (0, 0))

    def pad(self, *inputs):
        """Replicate-pad NHWC tensors (None passthrough)."""
        out = []
        for x in inputs:
            if x is None:
                out.append(None)
                continue
            assert x.ndim == 4, "expected B,H,W,C"
            out.append(jnp.pad(x, self._pad_widths(), mode="edge"))
        return out

    def pad_zero(self, *inputs):
        out = []
        for x in inputs:
            if x is None:
                out.append(None)
                continue
            assert x.ndim == 4, "expected B,H,W,C"
            out.append(jnp.pad(x, self._pad_widths(), mode="constant"))
        return out

    def unpad(self, x):
        assert x.ndim == 4, "expected B,H,W,C"
        ht, wd = x.shape[1], x.shape[2]
        l, r, t, b = self._pad
        return x[:, t : ht - b, l : wd - r, :]
