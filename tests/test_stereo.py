"""Stereo block-matching tests: synthetic rectified pair with known disparity."""

import jax
import jax.numpy as jnp
import numpy as np

from d3roma_tpu.ops.stereo import (
    lrc_check,
    median_blur,
    ncc_cost_volume,
    soft_argmax_disp,
    stereo_match,
)


def _synthetic_pair(H=64, W=160, disp=12, seed=0):
    """Right image = textured random field; left = right shifted by `disp`
    (so left-frame disparity == disp everywhere it's visible)."""
    rng = np.random.default_rng(seed)
    tex = rng.uniform(0, 1, (H, W + disp)).astype(np.float32)
    # smooth slightly so NCC has structure at block scale
    import scipy.ndimage as ndi

    tex = ndi.gaussian_filter(tex, 1.0)
    # stereo convention: d = x_l - x_r >= 0, so L(x) = R(x - d)
    left = tex[:, :W]
    right = tex[:, disp:]
    return left[None, ..., None], right[None, ..., None]


def test_cost_volume_peaks_at_true_disparity():
    left, right = _synthetic_pair(disp=12)
    costL, costR = ncc_cost_volume(jnp.asarray(left), jnp.asarray(right), 5, 20, 11)
    assert costL.shape[0] == 16
    # at interior pixels, argmax over D should be disparity 12 -> index 7
    amax = np.asarray(jnp.argmax(costL, axis=0))[0, 20:-20, 40:-40]
    frac = (amax == 7).mean()
    assert frac > 0.9, f"only {frac:.2%} at true disparity"


def test_soft_argmax_subpixel():
    left, right = _synthetic_pair(disp=12)
    costL, _ = ncc_cost_volume(jnp.asarray(left), jnp.asarray(right), 5, 20, 11)
    disp = np.asarray(soft_argmax_disp(costL, 5, 20, beta=100.0))
    interior = disp[0, 20:-20, 40:-40]
    assert abs(np.median(interior) - 12) < 0.5


def test_full_stereo_match_recovers_disparity():
    left, right = _synthetic_pair(disp=12)
    out = stereo_match(jnp.asarray(left), jnp.asarray(right), fxb=24.0,
                       min_disp=5, max_disp=20, block_size=11)
    disp = np.asarray(out.disp)[0]
    valid = np.asarray(out.valid)[0]
    interior = disp[20:-20, 40:-40]
    vi = valid[20:-20, 40:-40]
    assert vi.mean() > 0.8
    assert abs(np.median(interior[vi]) - 12) < 0.5
    # depth = fxb / disp
    depth = np.asarray(out.depth)[0, 20:-20, 40:-40]
    np.testing.assert_allclose(np.median(depth[vi]), 24.0 / 12, rtol=0.05)


def test_lrc_invalidates_mismatch():
    dispL = jnp.full((1, 8, 16), 5.0)
    dispR = jnp.full((1, 8, 16), 5.0)
    ok = np.asarray(lrc_check(dispL, dispR))
    assert (ok[0, :, 6:] == 5.0).all()  # consistent interior kept
    bad = np.asarray(lrc_check(dispL, jnp.full((1, 8, 16), 9.0)))
    assert (bad == -1.0).mean() > 0.9


def test_median_blur_removes_speckle():
    x = np.ones((1, 16, 16), np.float32)
    x[0, 8, 8] = 100.0
    out = np.asarray(median_blur(jnp.asarray(x), 5))
    assert out[0, 8, 8] == 1.0


def test_bilateral_filter_preserves_edges():
    from d3roma_tpu.ops.stereo import bilateral_filter

    # step edge + speckle noise
    x = np.zeros((1, 16, 32), np.float32)
    x[:, :, 16:] = 10.0
    rng = np.random.default_rng(0)
    noisy = x + rng.normal(0, 0.1, x.shape).astype(np.float32)
    out = np.asarray(bilateral_filter(jnp.asarray(noisy), 5, sigma_color=1.0))
    # noise reduced on flats
    assert np.std(out[0, :, :12]) < np.std(noisy[0, :, :12])
    # edge magnitude preserved (no blur across the jump)
    assert abs(out[0, 8, 20] - out[0, 8, 10]) > 9.0
