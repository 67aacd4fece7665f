"""Distributed-eval semantics: padded tail rows must not bias metrics.

The reference de-duplicates padded tail samples via Accelerate's
`gather_for_metrics` even-batches logic (reference:
distributed_evaluate.py:162-167). Here `pad_batch_to_devices` marks padded
duplicate rows with sample_valid=0 and `evaluate_dataset` drops them before
they reach the RunningAverager.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3roma_tpu.config import TrainingConfig
from d3roma_tpu.evaluation import eval_batch, evaluate_dataset
from d3roma_tpu.parallel import make_mesh, pad_batch_to_devices, shard_batch


def _config():
    return TrainingConfig(
        name="dist", ldm=False, depth_channels=1, cond_channels="rgb+raw",
        camera_resolution="96x64", image_size=(32, 64), divis_by=32,
        num_train_timesteps=8, num_inference_timesteps=4,
        num_intermediate_images=2, prediction_type="sample",
        noise_strategy="randn", sampler="my_ddpm",
        ssi=True, safe_ssi=False, prediction_space="disp",
        train_dataset=["Real_train_fxm"], eval_dataset=["Real_test_fxm"],
        dataset_weight=[1], train_batch_size=2, eval_batch_size=3,
        eval_num_batch=1, num_epochs=1, gradient_accumulation_steps=1,
        learning_rate=1e-4, lr_warmup_steps=0, lr_scheduler="constant",
        val_every_global_steps=1000, save_model_epochs=1,
        block_out_channels=(8, 16), clip_sample=True,
        num_inference_rounds=1,
    )


def test_pad_batch_marks_padded_rows():
    batch = {"x": np.zeros((5, 4, 4, 1)), "fxb": np.ones((5,)),
             "path": ["a"] * 5}
    out = pad_batch_to_devices(batch, 8)
    assert out["x"].shape[0] == 8
    np.testing.assert_array_equal(
        out["sample_valid"], [1, 1, 1, 1, 1, 0, 0, 0])
    # divisible batches: all rows valid, no padding
    out2 = pad_batch_to_devices({"x": np.zeros((8, 2))}, 8)
    assert out2["x"].shape[0] == 8
    np.testing.assert_array_equal(out2["sample_valid"], np.ones(8))


def _batch_np(b, h=32, w=64, seed=0):
    rng = np.random.default_rng(seed)
    # distinct per-row content so a duplicated tail row shifts the mean
    disp = np.stack([
        rng.uniform(5 + 15 * i, 15 + 15 * i, (h, w, 1)).astype(np.float32)
        for i in range(b)
    ])
    return {
        "raw_disp": disp,
        "normalized_disp": ((disp / 64 - 0.5) * 2).astype(np.float32),
        "sim_disp": ((disp / 64 - 0.5) * 2).astype(np.float32),
        "normalized_rgb": np.zeros((b, h, w, 3), np.float32),
        "left_image": np.zeros((b, h, w, 3), np.float32),
        "right_image": np.zeros((b, h, w, 3), np.float32),
        "mask": np.ones((b, h, w, 1), np.float32),
        "raw_depth": (400.0 / np.maximum(disp, 1e-3)).astype(np.float32),
        "fxb": np.full((b,), 400.0, np.float32),
    }


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8-device mesh")
def test_padded_duplicates_do_not_bias_metrics():
    """len(dataset) % devices != 0: aggregate must equal the mean over the
    REAL rows of the very same padded sharded run, and the averager must
    see exactly the real sample count."""
    from d3roma_tpu.training import build_models, create_pipeline

    cfg = _config()
    models = build_models(cfg, jax.random.PRNGKey(0))
    pipeline = create_pipeline(cfg, models)

    mesh = make_mesh()
    raw = _batch_np(3)

    def prep(b):
        return shard_batch(pad_batch_to_devices(b, jax.device_count()), mesh)

    key = jax.random.PRNGKey(7)
    metrics, stat = evaluate_dataset(
        cfg, pipeline, [raw], key, preprocess=prep, max_batches=1,
    )
    # only the 3 real samples enter the averager
    assert len(stat) == 3

    # expected: per-row metrics of the SAME padded run, real rows only
    _, (md, me), _, _, _ = eval_batch(
        cfg, pipeline, prep(raw), jax.random.fold_in(key, 0))
    assert md.shape[0] == 8
    expected_epe = float(np.mean(md[:3, 0]))
    biased_epe = float(np.mean(md[:, 0]))
    assert metrics["disp"]["epe"] == pytest.approx(expected_epe, rel=1e-4)
    # the duplicated tail row (distinct content) would have moved the mean
    assert abs(biased_epe - expected_epe) > 1e-3


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8-device mesh")
@pytest.mark.full  # compile-heavy tier (README)
def test_tp_sharded_eval_matches_replicated():
    """task.tensor_parallel on the eval side: a pipeline with TP-sharded
    params on a (data, model) mesh reproduces the replicated metrics."""
    import dataclasses

    from d3roma_tpu.parallel import make_mesh_dp_tp, shard_params_tp
    from d3roma_tpu.training import build_models, create_pipeline

    cfg = _config()
    models = build_models(cfg, jax.random.PRNGKey(0))
    pipeline = create_pipeline(cfg, models)
    raw = _batch_np(4)
    key = jax.random.PRNGKey(7)

    mesh1 = make_mesh()
    prep1 = lambda b: shard_batch(pad_batch_to_devices(b, 8), mesh1)  # noqa: E731
    ref, _ = evaluate_dataset(cfg, pipeline, [raw], key,
                              preprocess=prep1, max_batches=1)

    mesh2 = make_mesh_dp_tp(2, 4)
    pipe_tp = dataclasses.replace(
        pipeline, unet_params=shard_params_tp(pipeline.unet_params, mesh2))
    prep2 = lambda b: shard_batch(pad_batch_to_devices(b, 8), mesh2)  # noqa: E731
    got, _ = evaluate_dataset(cfg, pipe_tp, [raw], key,
                              preprocess=prep2, max_batches=1)
    for space in ref:
        for k, v in ref[space].items():
            assert got[space][k] == pytest.approx(v, rel=1e-4, abs=1e-6), (
                space, k)
