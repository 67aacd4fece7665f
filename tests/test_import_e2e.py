"""Hermetic end-to-end checkpoint import: write a small *diffusers-format*
pipeline directory with torch (exact key names, incl. the pre-widening
4-channel conv_in), run scripts/import_reference_pipeline.py, load the
converted pipeline, run 2 denoise steps, and golden-check the conv_in
widening rule numerically against the reference formula
(reference: train.py:754-772 — weight.repeat(1, dup, 1, 1)/dup, bias/dup).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

RNG = np.random.default_rng(7)


def _t(*shape, scale=0.05):
    return torch.tensor(RNG.normal(0, scale, shape).astype(np.float32))


def _conv(sd, name, cout, cin, k=3):
    sd[f"{name}.weight"] = _t(cout, cin, k, k)
    sd[f"{name}.bias"] = _t(cout)


def _lin(sd, name, cout, cin, bias=True):
    sd[f"{name}.weight"] = _t(cout, cin)
    if bias:
        sd[f"{name}.bias"] = _t(cout)


def _norm(sd, name, c):
    sd[f"{name}.weight"] = torch.ones(c)
    sd[f"{name}.bias"] = torch.zeros(c)


def _resnet(sd, prefix, cin, cout, temb=None):
    _norm(sd, f"{prefix}.norm1", cin)
    _conv(sd, f"{prefix}.conv1", cout, cin)
    if temb:
        _lin(sd, f"{prefix}.time_emb_proj", cout, temb)
    _norm(sd, f"{prefix}.norm2", cout)
    _conv(sd, f"{prefix}.conv2", cout, cout)
    if cin != cout:
        _conv(sd, f"{prefix}.conv_shortcut", cout, cin, k=1)


def _vae_attn(sd, prefix, c):
    _norm(sd, f"{prefix}.group_norm", c)
    for p in ("to_q", "to_k", "to_v", "to_out.0"):
        _lin(sd, f"{prefix}.{p}", c, c)


def _transformer(sd, prefix, c, heads, head_dim, ctx):
    inner = heads * head_dim
    _norm(sd, f"{prefix}.norm", c)
    _lin(sd, f"{prefix}.proj_in", inner, c)
    tb = f"{prefix}.transformer_blocks.0"
    for n in ("norm1", "norm2", "norm3"):
        _norm(sd, f"{tb}.{n}", inner)
    for a, kdim in (("attn1", inner), ("attn2", ctx)):
        _lin(sd, f"{tb}.{a}.to_q", inner, inner, bias=False)
        _lin(sd, f"{tb}.{a}.to_k", inner, kdim, bias=False)
        _lin(sd, f"{tb}.{a}.to_v", inner, kdim, bias=False)
        _lin(sd, f"{tb}.{a}.to_out.0", inner, inner)
    _lin(sd, f"{tb}.ff.net.0.proj", inner * 8, inner)
    _lin(sd, f"{tb}.ff.net.2", inner, inner * 4)
    _lin(sd, f"{prefix}.proj_out", c, inner)


def _write_cond_unet(dirpath):
    """Tiny UNet2DConditionModel: blocks (8,16), 1 layer/block,
    (CrossAttnDown, Down) / (Up, CrossAttnUp), ctx 16, head_dim 8,
    4-channel conv_in (pre-widening, as in a bare SD checkpoint)."""
    os.makedirs(dirpath, exist_ok=True)
    cfg = {
        "_class_name": "UNet2DConditionModel",
        "in_channels": 4, "out_channels": 4,
        "block_out_channels": [8, 16], "layers_per_block": 1,
        "down_block_types": ["CrossAttnDownBlock2D", "DownBlock2D"],
        "up_block_types": ["UpBlock2D", "CrossAttnUpBlock2D"],
        "cross_attention_dim": 16,
        "attention_head_dim": [1, 2],  # head counts; head_dim = 8/1 = 8
        "norm_num_groups": 4,
    }
    with open(os.path.join(dirpath, "config.json"), "w") as f:
        json.dump(cfg, f)
    sd = {}
    temb = 32  # 4 * c0
    _conv(sd, "conv_in", 8, 4)
    _lin(sd, "time_embedding.linear_1", temb, 8)
    _lin(sd, "time_embedding.linear_2", temb, temb)
    # down 0: CrossAttn (1 resnet + transformer + downsampler)
    _resnet(sd, "down_blocks.0.resnets.0", 8, 8, temb)
    _transformer(sd, "down_blocks.0.attentions.0", 8, 1, 8, 16)
    _conv(sd, "down_blocks.0.downsamplers.0.conv", 8, 8)
    # down 1: plain (last -> no downsampler)
    _resnet(sd, "down_blocks.1.resnets.0", 8, 16, temb)
    # mid
    _resnet(sd, "mid_block.resnets.0", 16, 16, temb)
    _transformer(sd, "mid_block.attentions.0", 16, 2, 8, 16)
    _resnet(sd, "mid_block.resnets.1", 16, 16, temb)
    # up 0: UpBlock2D, 2 resnets, skips: [conv_in 8, d0r0 8, d0down 8, d1r0 16]
    _resnet(sd, "up_blocks.0.resnets.0", 32, 16, temb)
    _resnet(sd, "up_blocks.0.resnets.1", 24, 16, temb)
    _conv(sd, "up_blocks.0.upsamplers.0.conv", 16, 16)
    # up 1: CrossAttnUp
    _resnet(sd, "up_blocks.1.resnets.0", 24, 8, temb)
    _transformer(sd, "up_blocks.1.attentions.0", 8, 1, 8, 16)
    _resnet(sd, "up_blocks.1.resnets.1", 16, 8, temb)
    _transformer(sd, "up_blocks.1.attentions.1", 8, 1, 8, 16)
    _norm(sd, "conv_norm_out", 8)
    _conv(sd, "conv_out", 4, 8)
    torch.save(sd, os.path.join(dirpath, "diffusion_pytorch_model.bin"))
    return sd


def _write_vae(dirpath):
    """Tiny AutoencoderKL with 4 blocks -> the /8 latent the pipeline assumes."""
    os.makedirs(dirpath, exist_ok=True)
    boc = [4, 4, 4, 8]
    cfg = {"_class_name": "AutoencoderKL", "latent_channels": 4,
           "block_out_channels": boc, "norm_num_groups": 2}
    with open(os.path.join(dirpath, "config.json"), "w") as f:
        json.dump(cfg, f)
    sd = {}
    _conv(sd, "encoder.conv_in", boc[0], 3)
    cin = boc[0]
    for i, ch in enumerate(boc):
        for j in range(2):  # encoder layers_per_block = 2
            _resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}", cin, ch)
            cin = ch
        if i < len(boc) - 1:
            _conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv", ch, ch)
    top = boc[-1]
    _resnet(sd, "encoder.mid_block.resnets.0", top, top)
    _vae_attn(sd, "encoder.mid_block.attentions.0", top)
    _resnet(sd, "encoder.mid_block.resnets.1", top, top)
    _norm(sd, "encoder.conv_norm_out", top)
    _conv(sd, "encoder.conv_out", 8, top)  # 2 * latent
    _conv(sd, "quant_conv", 8, 8, k=1)
    _conv(sd, "post_quant_conv", 4, 4, k=1)
    rev = boc[::-1]
    _conv(sd, "decoder.conv_in", rev[0], 4)
    _resnet(sd, "decoder.mid_block.resnets.0", rev[0], rev[0])
    _vae_attn(sd, "decoder.mid_block.attentions.0", rev[0])
    _resnet(sd, "decoder.mid_block.resnets.1", rev[0], rev[0])
    cin = rev[0]
    for i, ch in enumerate(rev):
        for j in range(3):  # decoder layers_per_block = 3
            _resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}", cin, ch)
            cin = ch
        if i < len(rev) - 1:
            _conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv", ch, ch)
    _norm(sd, "decoder.conv_norm_out", rev[-1])
    _conv(sd, "decoder.conv_out", 3, rev[-1])
    torch.save(sd, os.path.join(dirpath, "diffusion_pytorch_model.bin"))


def _write_text_encoder(dirpath):
    os.makedirs(dirpath, exist_ok=True)
    cfg = {"vocab_size": 49408, "hidden_size": 16, "intermediate_size": 32,
           "num_hidden_layers": 1, "num_attention_heads": 2,
           "max_position_embeddings": 77, "hidden_act": "gelu"}
    with open(os.path.join(dirpath, "config.json"), "w") as f:
        json.dump(cfg, f)
    sd = {}
    sd["text_model.embeddings.token_embedding.weight"] = _t(49408, 16)
    sd["text_model.embeddings.position_embedding.weight"] = _t(77, 16)
    L = "text_model.encoder.layers.0"
    _norm(sd, f"{L}.layer_norm1", 16)
    for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
        _lin(sd, f"{L}.self_attn.{p}", 16, 16)
    _norm(sd, f"{L}.layer_norm2", 16)
    _lin(sd, f"{L}.mlp.fc1", 32, 16)
    _lin(sd, f"{L}.mlp.fc2", 16, 32)
    _norm(sd, "text_model.final_layer_norm", 16)
    torch.save(sd, os.path.join(dirpath, "pytorch_model.bin"))


def test_import_cli_end_to_end(tmp_path):
    ref = str(tmp_path / "ref")
    out = str(tmp_path / "out")
    unet_sd = _write_cond_unet(os.path.join(ref, "unet"))
    _write_vae(os.path.join(ref, "vae"))
    _write_text_encoder(os.path.join(ref, "text_encoder"))
    os.makedirs(os.path.join(ref, "scheduler"), exist_ok=True)
    with open(os.path.join(ref, "scheduler", "scheduler_config.json"), "w") as f:
        json.dump({"_class_name": "MyDDIMScheduler", "num_train_timesteps": 16,
                   "beta_schedule": "scaled_linear", "beta_start": 0.00085,
                   "beta_end": 0.012, "prediction_type": "v_prediction",
                   "clip_sample": False, "steps_offset": 1}, f)

    from scripts.import_reference_pipeline import main

    main([ref, out, "--cond-channels", "rgb+raw"])

    # ---- golden-check the widening rule against the reference formula ----
    from d3roma_tpu.pipelines import GuidedLatentDiffusionPipeline

    pipe = GuidedLatentDiffusionPipeline.from_pretrained(out)
    dup = 3  # rgb+raw -> 1 + 2 conds
    w_ref = unet_sd["conv_in.weight"].repeat(1, dup, 1, 1) / dup  # [O, 4*dup, k, k]
    b_ref = unet_sd["conv_in.bias"] / dup
    kernel = np.asarray(pipe.unet_params["conv_in"]["kernel"])  # HWIO
    np.testing.assert_allclose(
        kernel, w_ref.numpy().transpose(2, 3, 1, 0), rtol=1e-6,
        err_msg="conv_in widening deviates from reference train.py:758-769",
    )
    np.testing.assert_allclose(
        np.asarray(pipe.unet_params["conv_in"]["bias"]), b_ref.numpy(), rtol=1e-6
    )
    assert pipe.unet.in_channels == 12
    assert pipe.spec.kind == "my_ddim"
    assert pipe.spec.schedule.num_train_timesteps == 16

    # the empty-prompt embedding came from the real (tiny) text tower:
    # [BOS, EOS] only (reference encodes "" with padding="do_not_pad")
    assert pipe.text_embed.shape == (1, 2, 16)
    assert float(np.abs(np.asarray(pipe.text_embed)).max()) > 0

    # ---- run 2 denoise steps through the imported pipeline ----
    H = W = 32
    out_pipe = pipe(
        jax.random.PRNGKey(0), num_inference_steps=2,
        num_intermediate_images=1, cond_channels="rgb+raw",
        rgb_images=jnp.ones((1, H, W, 3)) * 0.2,
        sim_disp=jnp.ones((1, H, W, 1)) * 0.3,
    )
    assert out_pipe.images.shape == (1, H, W, 1)
    assert np.all(np.isfinite(np.asarray(out_pipe.images)))
