"""Tests for Normalizer, scale/shift, RANSAC, metrics, padding, losses."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from d3roma_tpu.ops import (
    InputPadder,
    Normalizer,
    compute_errors,
    compute_scale_and_shift,
    metrics_to_dict,
    normalize_rgb,
    ransac_scale_shift,
)
from d3roma_tpu.ops.losses import (
    discretized_gaussian_log_likelihood,
    normal_kl,
    ssim,
)


def test_scale_shift_vs_torch_lstsq():
    """Cross-check the closed form against torch least squares."""
    rng = np.random.default_rng(0)
    pred = rng.normal(size=(3, 500)).astype(np.float32)
    s_true, t_true = 2.5, -0.7
    target = s_true * pred + t_true + 0.01 * rng.normal(size=pred.shape).astype(np.float32)
    mask = (rng.random(pred.shape) > 0.3).astype(np.float32)

    st = np.asarray(compute_scale_and_shift(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask)))

    for b in range(3):
        m = mask[b] > 0
        A = torch.stack([torch.tensor(pred[b][m]), torch.ones(m.sum())], dim=1)
        sol = torch.linalg.lstsq(A, torch.tensor(target[b][m])[:, None]).solution
        np.testing.assert_allclose(st[b], sol.numpy().ravel(), rtol=1e-3, atol=1e-3)


def test_ransac_recovers_scale_shift_with_outliers():
    rng = np.random.default_rng(1)
    pred = rng.uniform(0.1, 1.0, size=(2, 2000)).astype(np.float32)
    target = 3.0 * pred + 0.5
    # 20% gross outliers
    out_idx = rng.choice(2000, 400, replace=False)
    target[:, out_idx] += rng.normal(0, 20, size=(2, 400))
    mask = np.ones_like(pred)

    st = np.asarray(
        ransac_scale_shift(
            jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask),
            jax.random.PRNGKey(0), k_iters=10, error_threshold=0.5,
        )
    )
    np.testing.assert_allclose(st[:, 0], 3.0, rtol=0.05)
    np.testing.assert_allclose(st[:, 1], 0.5, atol=0.1)


def test_normalizer_average_roundtrip():
    norm = Normalizer(ssi=False, mode="average", num_chs=1, ch_bounds=(128.0,), ch_gammas=(1.0,))
    x = jnp.asarray(np.random.default_rng(2).uniform(1, 127, size=(4, 6, 1)).astype(np.float32))
    y, _, _ = norm.normalize(x)
    assert y.shape == (4, 6, 1)
    assert float(jnp.max(jnp.abs(y))) <= 1.0 + 1e-6
    z = norm.denormalize(y[None])  # [1,4,6,1] -> [1,4,6,1]
    np.testing.assert_allclose(np.asarray(z[0, ..., 0]), np.asarray(x[..., 0]), rtol=1e-5)


def test_normalizer_average_multichannel_roundtrip():
    norm = Normalizer(ssi=False, mode="average", num_chs=3, ch_bounds=(64.0,), ch_gammas=(2.0,))
    x = jnp.asarray(np.random.default_rng(3).uniform(0.5, 63, size=(5, 5, 1)).astype(np.float32))
    y, _, _ = norm.normalize(x)
    assert y.shape == (5, 5, 3)
    z = norm.denormalize(y[None])
    np.testing.assert_allclose(np.asarray(z[0, ..., 0]), np.asarray(x[..., 0]), rtol=1e-4)


def test_normalizer_piecewise_roundtrip():
    norm = Normalizer(ssi=False, mode="piecewise", num_chs=3,
                      ch_bounds=(64.0, 32.0, 32.0), ch_gammas=(1.0, 1.0, 1.0))
    x = jnp.asarray(np.random.default_rng(4).uniform(0, 127, size=(8, 8, 1)).astype(np.float32))
    y, _, _ = norm.normalize(x)
    assert y.shape == (8, 8, 3)
    z = norm.denormalize(y[None])
    np.testing.assert_allclose(np.asarray(z[0, ..., 0]), np.asarray(x[..., 0]), rtol=1e-4, atol=1e-3)


def test_normalizer_ssi_roundtrip_with_alignment():
    norm = Normalizer(ssi=True, safe_ssi=False)
    rng = np.random.default_rng(5)
    disp = rng.uniform(5, 50, size=(2, 8, 8, 1)).astype(np.float32)
    mask = np.ones_like(disp, dtype=bool)
    y, low, up = norm.normalize(jnp.asarray(disp), jnp.asarray(mask))
    assert float(jnp.max(y)) <= 1.0 + 1e-5 and float(jnp.min(y)) >= -1.0 - 1e-5
    # denormalize realigns against raw disparity (here, the gt itself)
    z = norm.denormalize(y, raw_disp=jnp.asarray(disp), mask=jnp.asarray(mask.astype(np.float32)))
    np.testing.assert_allclose(np.asarray(z), disp, rtol=1e-3, atol=1e-2)


def test_compute_errors_perfect_prediction():
    rng = np.random.default_rng(6)
    gt = rng.uniform(5, 60, size=(2, 16, 16)).astype(np.float32)
    fxb = np.array([400.0, 400.0], np.float32)
    md, me = compute_errors(jnp.asarray(gt), jnp.asarray(gt), "disp", fxb=jnp.asarray(fxb))
    d = metrics_to_dict(md, me)
    assert d["disp"]["epe"] < 1e-5
    assert d["depth"]["a1"] == 1.0
    assert d["depth"]["rmse"] < 1e-4


def test_compute_errors_known_offset():
    gt = np.full((1, 4, 480), 10.0, np.float32)
    pred = gt + 1.5  # epe = 1.5 everywhere, width=480 so scale=1
    md, me = compute_errors(jnp.asarray(gt), jnp.asarray(pred), "disp",
                            fxb=jnp.asarray([100.0], np.float32))
    d = metrics_to_dict(md, me)
    np.testing.assert_allclose(d["disp"]["epe"], 1.5, rtol=1e-5)
    assert d["disp"]["d1"] == 1.0  # err > 1
    assert d["disp"]["d2"] == 0.0  # err < 2


def test_compute_errors_respects_mask():
    gt = np.full((1, 4, 4), 10.0, np.float32)
    pred = gt.copy()
    pred[0, 0, 0] = 100.0  # gross error, masked out
    mask = np.ones_like(gt, bool)
    mask[0, 0, 0] = False
    md, _ = compute_errors(jnp.asarray(gt), jnp.asarray(pred), "disp",
                           masks=jnp.asarray(mask), fxb=jnp.asarray([100.0], np.float32))
    assert float(md[0, 0]) < 1e-6


def test_input_padder_roundtrip():
    x = jnp.asarray(np.random.default_rng(7).normal(size=(2, 270, 480, 3)).astype(np.float32))
    padder = InputPadder(x.shape, divis_by=64)
    (p,) = padder.pad(x)
    assert p.shape[1] % 64 == 0 and p.shape[2] % 64 == 0
    assert p.shape[1:3] == padder.padded_size
    u = padder.unpad(p)
    np.testing.assert_array_equal(np.asarray(u), np.asarray(x))


def test_normal_kl_golden():
    # KL(N(0,1) || N(0,1)) = 0; KL(N(1,1)||N(0,1)) = 0.5
    z = jnp.zeros(())
    np.testing.assert_allclose(float(normal_kl(z, z, z, z)), 0.0, atol=1e-7)
    np.testing.assert_allclose(float(normal_kl(jnp.ones(()), z, z, z)), 0.5, atol=1e-6)


def test_discretized_gaussian_ll_is_high_at_mean():
    x = jnp.zeros((4, 4))
    ll_good = discretized_gaussian_log_likelihood(x, means=x, log_scales=jnp.full_like(x, -5.0))
    ll_bad = discretized_gaussian_log_likelihood(x, means=x + 1.0, log_scales=jnp.full_like(x, -5.0))
    assert float(ll_good.mean()) > float(ll_bad.mean())


def test_ssim_identity_is_zero():
    x = jnp.asarray(np.random.default_rng(8).uniform(size=(1, 16, 16, 1)).astype(np.float32))
    d = ssim(x, x)
    assert float(jnp.max(d)) < 1e-4
    y = jnp.roll(x, 3, axis=2)
    assert float(ssim(x, y).mean()) > float(d.mean())


def test_normalize_rgb():
    out = normalize_rgb(jnp.asarray([0.0, 127.5, 255.0]), None)
    np.testing.assert_allclose(np.asarray(out[0]), [-1.0, 0.0, 1.0], atol=1e-6)
    assert out[1] is None


def test_compute_errors_depth_space():
    rng = np.random.default_rng(14)
    gt_depth = rng.uniform(0.5, 2.0, size=(2, 8, 8)).astype(np.float32)
    pred = gt_depth * 1.02  # 2% relative error
    fxb = np.array([400.0, 400.0], np.float32)
    md, me = compute_errors(jnp.asarray(gt_depth), jnp.asarray(pred),
                            "depth", fxb=jnp.asarray(fxb))
    d = metrics_to_dict(md, me)
    assert d["depth"]["a1"] == 1.0  # within 5%
    np.testing.assert_allclose(d["depth"]["rel"], 0.02, rtol=1e-3)


def test_input_padder_kitti_mode():
    x = jnp.zeros((1, 37, 50, 1))
    p = InputPadder(x.shape, mode="kitti", divis_by=8)
    (out,) = p.pad(x)
    # kitti mode pads only top=0/bottom and splits width
    assert out.shape[1] % 8 == 0 and out.shape[2] % 8 == 0
    np.testing.assert_array_equal(np.asarray(p.unpad(out)), np.asarray(x))


def test_normalizer_piecewise_residual_decomposition():
    norm = Normalizer(ssi=False, mode="piecewise", num_chs=3,
                      ch_bounds=(64.0, 32.0, 32.0), ch_gammas=(1.0, 1.0, 1.0))
    # value 100 = 64 + 32 + 4 -> channels [1.0, 1.0, 0.125]
    x = jnp.full((1, 1, 1), 100.0)
    y, _, _ = norm.normalize(x)
    raw = np.asarray(y / norm.s + norm.t)[0, 0]
    np.testing.assert_allclose(raw, [1.0, 1.0, 0.125], atol=1e-6)


def test_scale_shift_degenerate_mask_falls_back_to_identity():
    """Empty or near-constant masks yield a singular system; the solver
    must return (s=1, t=0) instead of dividing by a tiny/negative det
    (divergence from the reference's det+=1e-4 nudge, documented in
    ops/scale_shift.py)."""
    from d3roma_tpu.ops.scale_shift import compute_scale_and_shift

    pred = jnp.ones((2, 16)) * 3.0
    tgt = jnp.ones((2, 16)) * 7.0
    # row 0: empty mask (det = 0); row 1: valid
    mask = jnp.stack([jnp.zeros(16), jnp.ones(16)])
    st = np.asarray(compute_scale_and_shift(pred, tgt, mask))
    assert np.allclose(st[0], [1.0, 0.0])  # identity fallback
    assert np.all(np.isfinite(st))
    # single-pixel mask: det = a00*a11 - a01^2 = p^2 - p^2 = 0 exactly
    mask1 = jnp.zeros((1, 16)).at[0, 3].set(1.0)
    st1 = np.asarray(compute_scale_and_shift(pred[:1], tgt[:1], mask1))
    assert np.allclose(st1[0], [1.0, 0.0])


def test_ensemble_depths_single_round_is_finite():
    """R=1 has no pairwise term (empty triu -> NaN objective); must
    return the rescaled input with zero uncertainty, not NaNs."""
    from d3roma_tpu.ops import ensemble_depths

    img = jnp.asarray(np.random.default_rng(0).uniform(2, 9, (1, 8, 12)),
                      jnp.float32)
    aligned, unc = ensemble_depths(img)
    assert np.all(np.isfinite(np.asarray(aligned)))
    np.testing.assert_allclose(np.asarray(unc), 0.0)
    # rescaled to [0,1] like the aligned multi-round output
    assert -1e-6 <= float(jnp.min(aligned)) < 0.1
    assert 0.9 < float(jnp.max(aligned)) <= 1.0 + 1e-5
