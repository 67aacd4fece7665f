"""Training subsystem tests: step semantics, sharded DP step, checkpoint."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3roma_tpu.config import TrainingConfig
from d3roma_tpu.models import UNet2D
from d3roma_tpu.ops.resample import init_loss_aware_state, loss_aware_weights
from d3roma_tpu.parallel import make_mesh, replicate_sharding, shard_batch
from d3roma_tpu.training import (
    AbnormalLossDetector,
    StepCounter,
    build_optimizer,
    create_train_state,
    load_state,
    make_train_step,
    save_state,
)


def _tiny_config(**kw):
    cfg = TrainingConfig(
        ldm=False, depth_channels=1, cond_channels="rgb+raw",
        image_size=(16, 16), divis_by=8, num_train_timesteps=20,
        prediction_type="sample", noise_strategy="randn", loss_type="l1",
        train_batch_size=4, gradient_accumulation_steps=1,
        clip_grad_norm=1.0, learning_rate=1e-3, lr_warmup_steps=0,
        clip_sample=True, block_out_channels=(8, 16),
    )
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def _setup(cfg, seed=0):
    from d3roma_tpu.models import pixel_in_channels

    in_ch = pixel_in_channels(cfg.cond_channels, cfg.depth_channels)
    unet = UNet2D(in_channels=in_ch, out_channels=cfg.depth_channels,
                  block_out_channels=tuple(cfg.block_out_channels),
                  down_block_types=("DownBlock2D", "DownBlock2D"),
                  up_block_types=("UpBlock2D", "UpBlock2D"),
                  layers_per_block=1, norm_groups=4)
    x = jnp.zeros((1, 16, 16, in_ch))
    params = jax.jit(unet.init)(jax.random.PRNGKey(seed), x, jnp.array([0]))["params"]

    def unet_apply(p, xx, t):
        return unet.apply({"params": p}, xx, t)

    tables = cfg.schedule_config(train=True).tables()
    tx = build_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(cfg, params, 10, seed)
    step_fn = jax.jit(make_train_step(cfg, unet_apply, tx, tables))
    return state, step_fn, tx


def _batch(cfg, key, b=4):
    h, w = cfg.image_hw
    ks = jax.random.split(key, 4)
    disp = jax.random.uniform(ks[0], (b, h, w, 1), minval=-0.9, maxval=0.9)
    return {
        "normalized_disp": disp,
        "sim_disp": disp + 0.05 * jax.random.normal(ks[1], disp.shape),
        "normalized_rgb": jax.random.uniform(ks[2], (b, h, w, 3), minval=-1, maxval=1),
        "left_image": jnp.zeros((b, h, w, 3)),
        "right_image": jnp.zeros((b, h, w, 3)),
        "mask": jnp.ones((b, h, w, 1)),
    }


def test_train_step_runs_and_loss_decreases():
    cfg = _tiny_config()
    state, step_fn, _ = _setup(cfg)
    key = jax.random.PRNGKey(0)
    batch = _batch(cfg, key)
    losses = []
    for i in range(30):
        state, metrics = step_fn(state, batch, jax.random.fold_in(key, i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.9, losses
    assert int(state.step) == 30


def test_adafactor_optimizer_trains_with_small_state():
    """task.optimizer=adafactor: loss decreases AND the optimizer state
    carries no per-param first/second Adam moments (the factored second
    moment is O(rows+cols) — the lever that fits the flagship 866M UNet
    on a single 16 GB chip, training/state.py)."""
    cfg = _tiny_config(optimizer="adafactor")
    state, step_fn, _ = _setup(cfg)
    key = jax.random.PRNGKey(0)
    batch = _batch(cfg, key)
    def opt_size(st):
        return sum(np.prod(np.shape(l)) for l in jax.tree.leaves(st)
                   if hasattr(l, "shape"))

    adamw_state = create_train_state(_tiny_config(), state.params, 10)
    # the factored second moment is O(rows+cols) per tensor vs AdamW's two
    # full per-param moments (at the flagship's 866M the ratio is ~100x;
    # at this tiny model it is already well under half)
    assert opt_size(state.opt_state) < 0.6 * opt_size(adamw_state.opt_state)
    losses = []
    for i in range(30):
        state, metrics = step_fn(state, batch, jax.random.fold_in(key, i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.9, losses


def test_unknown_optimizer_rejected():
    cfg = _tiny_config(optimizer="sgd")
    with pytest.raises(ValueError, match="unknown optimizer"):
        build_optimizer(cfg, steps_per_epoch=10)


@pytest.mark.parametrize("pred_type", ["epsilon", "v_prediction"])
def test_train_step_prediction_types(pred_type):
    cfg = _tiny_config(prediction_type=pred_type)
    state, step_fn, _ = _setup(cfg)
    key = jax.random.PRNGKey(1)
    state, metrics = step_fn(state, _batch(cfg, key), key)
    assert np.isfinite(float(metrics["loss"]))
    if pred_type == "v_prediction":
        assert "recon_mae" in metrics


def test_loss_aware_sampler_updates():
    cfg = _tiny_config()
    state, step_fn, _ = _setup(cfg)
    key = jax.random.PRNGKey(2)
    before = int(jnp.sum(state.sampler_state.loss_counts))
    state, _ = step_fn(state, _batch(cfg, key), key)
    after = int(jnp.sum(state.sampler_state.loss_counts))
    assert after == before + 4  # batch size items inserted


def test_loss_aware_weights_warmup():
    st = init_loss_aware_state(10, history_per_term=2)
    w = loss_aware_weights(st)
    np.testing.assert_allclose(np.asarray(w), 0.1)  # uniform until warm

    from d3roma_tpu.ops.resample import update_loss_aware

    # fill history: timestep 3 has big losses
    for _ in range(2):
        ts = jnp.arange(10)
        losses = jnp.ones((10,)).at[3].set(100.0)
        st = update_loss_aware(st, ts, losses)
    w = np.asarray(loss_aware_weights(st))
    assert w[3] > w[0] * 10


def test_sharded_dp_step_on_8_devices():
    """The multi-chip 'fake cluster': batch sharded over 8 CPU devices,
    params replicated, jit inserts the gradient psum."""
    assert jax.device_count() == 8
    mesh = make_mesh()
    cfg = _tiny_config(train_batch_size=8)
    state, step_fn, _ = _setup(cfg)
    state = jax.device_put(state, replicate_sharding(mesh))
    key = jax.random.PRNGKey(3)
    batch = {k: np.asarray(v) for k, v in _batch(cfg, key, b=8).items()}
    sharded = shard_batch(batch, mesh)
    # batch really is sharded on the data axis
    assert len(sharded["normalized_disp"].sharding.device_set) == 8
    state2, metrics = step_fn(state, sharded, key)
    assert np.isfinite(float(metrics["loss"]))

    # parity: sharded step == single-device step (same math, psum'd grads)
    state_r, step_fn2, _ = _setup(cfg)
    single = {k: jnp.asarray(v) for k, v in batch.items()}
    state3, metrics_single = step_fn2(state_r, single, key)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(metrics_single["loss"]), rtol=1e-4
    )


def test_gradient_accumulation():
    cfg = _tiny_config(gradient_accumulation_steps=2)
    state, step_fn, _ = _setup(cfg)
    key = jax.random.PRNGKey(4)
    p0 = jax.tree.leaves(state.params)[0].copy()
    state, _ = step_fn(state, _batch(cfg, key), key)
    p1 = jax.tree.leaves(state.params)[0]
    # first micro-step buffers the grads; params unchanged
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1))
    state, _ = step_fn(state, _batch(cfg, key), jax.random.fold_in(key, 1))
    p2 = jax.tree.leaves(state.params)[0]
    assert float(jnp.abs(p2 - p0).max()) > 0


def test_checkpoint_roundtrip(tmp_path):
    cfg = _tiny_config()
    state, step_fn, _ = _setup(cfg)
    key = jax.random.PRNGKey(5)
    state, _ = step_fn(state, _batch(cfg, key), key)
    counter = StepCounter()
    counter.tick(1.0)
    counter.new_epoch()

    d = str(tmp_path / "ckpt")
    save_state(d, jax.device_get(state), counter)

    template, _, _ = _setup(cfg)
    restored, counter2 = load_state(d, template)
    assert int(restored.step) == 1
    assert counter2.epoch == 1 and counter2.global_step == 1
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_abnormal_loss_detector(tmp_path):
    det = AbnormalLossDetector(str(tmp_path), ratio=10.0, min_history=1)
    assert not det.check(1.0, 1.0, 5, 100)
    # storm: loss 100x the average -> dump
    assert det.check(100.0, 1.0, 5, 101, batch={"x": np.zeros(3)},
                     paths=["/data/bad.png"])
    dump = tmp_path / "checkpoints" / "101_dump"
    assert (dump / "dump.npz").exists()
    assert (dump / "paths.txt").read_text() == "/data/bad.png"
    # nan -> abnormal regardless of history
    assert det.check(float("nan"), 0.0, 0, 102)


def test_lr_schedules():
    from d3roma_tpu.training import build_lr_schedule

    cfg = _tiny_config(lr_warmup_steps=10, learning_rate=1e-3, lr_scheduler="constant")
    s = build_lr_schedule(cfg, steps_per_epoch=100)
    assert float(s(0)) == 0.0
    assert float(s(10)) == pytest.approx(1e-3)
    assert float(s(10000)) == pytest.approx(1e-3)

    cfg.lr_scheduler = "cosine"
    s = build_lr_schedule(cfg, steps_per_epoch=100)
    assert float(s(10)) == pytest.approx(1e-3, rel=1e-3)
    assert float(s(int(1e9))) < 1e-3

    cfg.lr_scheduler = "linear"
    s = build_lr_schedule(cfg, steps_per_epoch=1)
    assert float(s(cfg.num_epochs * 1)) < 1e-4


def test_ldm_train_step():
    """Latent-family train step: VAE encodes inside the jitted program,
    v-prediction loss + recon diagnostic."""
    from d3roma_tpu.models import AutoencoderKL, UNet2DCondition

    cfg = _tiny_config(
        ldm=True, depth_channels=4, prediction_type="v_prediction",
        cond_channels="rgb+raw", image_size=(16, 16),
        clip_sample=False,
    )
    unet = UNet2DCondition(
        in_channels=12, out_channels=4, block_out_channels=(8, 16),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, attention_head_dim=8, cross_attention_dim=16,
        norm_groups=4,
    )
    vae = AutoencoderKL(block_out_channels=(4, 8), latent_channels=4, norm_groups=2)
    key = jax.random.PRNGKey(0)
    # VAE with 2 blocks halves resolution once: 16 -> 8 latent
    unet_params = jax.jit(unet.init)(
        key, jnp.zeros((1, 8, 8, 12)), jnp.array([0]), jnp.zeros((1, 4, 16))
    )["params"]
    vae_params = jax.jit(vae.init)(
        jax.random.fold_in(key, 1), jnp.zeros((1, 16, 16, 3))
    )["params"]

    def vae_apply(p, x, method):
        return vae.apply({"params": p}, x, method=method)

    def unet_apply(p, x, t, ctx):
        return unet.apply({"params": p}, x, t, ctx)

    text = jnp.zeros((1, 4, 16))
    tables = cfg.schedule_config(train=True).tables()
    tx = build_optimizer(cfg, 10)
    state = create_train_state(cfg, unet_params, 10)
    step_fn = jax.jit(make_train_step(cfg, unet_apply, tx, tables,
                                      vae_apply=vae_apply, text_embed=text))
    batch = _batch(cfg, key)
    state, metrics = step_fn(state, batch, key, vae_params)
    assert np.isfinite(float(metrics["loss"]))
    assert "recon_mae" in metrics and np.isfinite(float(metrics["recon_mae"]))
    assert int(state.step) == 1


def test_nan_batch_does_not_corrupt_params():
    """optax.apply_if_finite: a batch producing non-finite grads is
    rejected before it reaches the params or the MultiSteps accumulator
    (without it, one bad batch NaN'd the model forever)."""
    cfg = _tiny_config()
    state, step_fn, _ = _setup(cfg)
    batch = _batch(cfg, jax.random.PRNGKey(0))
    bad = dict(batch)
    bad["normalized_disp"] = batch["normalized_disp"].at[0, 0, 0, 0].set(jnp.nan)
    state1, metrics = step_fn(state, bad, jax.random.PRNGKey(1))
    assert not np.isfinite(float(metrics["loss"]))  # detector still fires
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state1.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and a following good batch updates normally
    state2, m2 = step_fn(state1, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m2["loss"]))
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state1.params), jax.tree.leaves(state2.params))
    )
    assert changed


def test_lr_horizon_counts_optimizer_updates():
    """Under gradient accumulation the schedule count advances once per
    OPTIMIZER update (reference divides by gradient_accumulation_steps,
    train.py:868): a linear decay must reach ~0 by the end of training,
    not get cut off a third of the way."""
    from d3roma_tpu.training.state import build_lr_schedule

    cfg = _tiny_config(lr_scheduler="linear", gradient_accumulation_steps=3,
                  num_epochs=1, lr_warmup_steps=0)
    sched = build_lr_schedule(cfg, steps_per_epoch=30)
    # 30 micro-steps / 3 = 10 optimizer updates
    assert float(sched(10)) < 0.1 * cfg.learning_rate
    assert float(sched(5)) == pytest.approx(cfg.learning_rate / 2, rel=0.2)


def test_timestep_sampler_default_is_uniform_reference_parity():
    """The reference trains with uniform timestep sampling (train.py:572,
    594); loss-second-moment stays an opt-in. Config default must match."""
    cfg = _tiny_config()
    assert cfg.timestep_sampler == "uniform"
    import d3roma_tpu.training.train_step as TS

    with pytest.raises(ValueError, match="timestep_sampler"):
        TS.make_train_step(cfg, lambda *a: None, None, cfg.schedule_config(train=True).tables(),
                           t_sampler="bogus")


def test_norm_groups_divides_all_widths(tmp_path, monkeypatch):
    """block_out_channels=(48, 96): min(32, 48)=32 does not divide 48;
    build_models must pick the largest common divisor <= 32 (24)."""
    from d3roma_tpu.training.train_loop import build_models

    cfg = _tiny_config(block_out_channels=(48, 96))
    models = build_models(cfg, jax.random.PRNGKey(0))
    assert models["unet"].norm_groups == 24  # largest common divisor <= 32


def test_forensic_dump_cap(tmp_path):
    from d3roma_tpu.training.forensics import AbnormalLossDetector

    det = AbnormalLossDetector(str(tmp_path), min_history=0, max_dumps=2)
    for step in range(5):
        assert det.check(float("nan"), 1.0, 100, step, batch={"x": np.ones(2)})
    dumps = [d for d in os.listdir(tmp_path / "checkpoints") if d.endswith("_dump")]
    assert len(dumps) == 2
