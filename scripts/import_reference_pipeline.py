#!/usr/bin/env python
"""Convert a reference (diffusers) pipeline directory into a d3roma_tpu one.

    python scripts/import_reference_pipeline.py REF_DIR OUT_DIR \
        [--cond-channels rgb+raw] [--text-encoder DIR]

REF_DIR is a diffusers `save_pretrained` directory (unet/ vae/ scheduler/
[text_encoder/ tokenizer/] subdirs, torch weights) as exported by the
reference train.py; OUT_DIR becomes a GuidedLatentDiffusionPipeline /
GuidedDiffusionPipeline directory loadable by this framework. Covers the
NCHW->HWIO mapping and computes the empty-prompt CLIP embedding once
(reference: custom_pipelines.py:241-254) so inference needs no tokenizer.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("ref_dir")
    p.add_argument("out_dir")
    p.add_argument("--cond-channels", default=None,
                   help="widen conv_in for this combo when importing a bare "
                        "SD2.1 unet (reference: train.py:751-772)")
    args = p.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from d3roma_tpu.guidance import FlowGuidance
    from d3roma_tpu.models import (
        AutoencoderKL,
        CLIPTextConfig,
        CLIPTextModel,
        UNet2D,
        UNet2DCondition,
        empty_prompt_tokens,
        widened_in_channels,
    )
    from d3roma_tpu.models.torch_import import (
        clip_text_torch_to_flax,
        load_torch_state_dict,
        unet_torch_to_flax,
        vae_torch_to_flax,
        widen_conv_in,
    )
    from d3roma_tpu.ops.normalizer import Normalizer
    from d3roma_tpu.ops.schedules import ScheduleConfig
    from d3roma_tpu.pipelines import (
        GuidedDiffusionPipeline,
        GuidedLatentDiffusionPipeline,
        SamplerSpec,
    )

    unet_dir = os.path.join(args.ref_dir, "unet")
    with open(os.path.join(unet_dir, "config.json")) as f:
        ucfg = json.load(f)

    is_ldm = ucfg.get("_class_name", "") == "UNet2DConditionModel" or (
        "cross_attention_dim" in ucfg
    )
    sd = load_torch_state_dict(unet_dir)
    unet_params = unet_torch_to_flax(sd)

    # scheduler config
    sch_path = os.path.join(args.ref_dir, "scheduler", "scheduler_config.json")
    sch = {}
    if os.path.exists(sch_path):
        with open(sch_path) as f:
            sch = json.load(f)
    schedule = ScheduleConfig(
        num_train_timesteps=sch.get("num_train_timesteps", 1000),
        beta_schedule=sch.get("beta_schedule", "scaled_linear"),
        beta_start=sch.get("beta_start", 0.00085),
        beta_end=sch.get("beta_end", 0.012),
        prediction_type=sch.get("prediction_type", "v_prediction"),
        clip_sample=sch.get("clip_sample", False),
        thresholding=sch.get("thresholding", False),
        timestep_spacing="leading",
        steps_offset=sch.get("steps_offset", 1),
        set_alpha_to_one=False,
    )
    kind = "my_ddim" if "DDIM" in sch.get("_class_name", "") else "my_ddpm"

    guid_path = os.path.join(args.ref_dir, "guidance", "config.json")
    gkw = {}
    if os.path.exists(guid_path):
        with open(guid_path) as f:
            g = json.load(f)
        gkw = {k: g[k] for k in
               ("flow_guidance_weight", "perturb_start_ratio", "flow_guidance_mode")
               if k in g}
    guidance = FlowGuidance(**gkw)

    if is_ldm:
        in_ch = ucfg["in_channels"]
        if args.cond_channels and in_ch == 4:
            dup = len(args.cond_channels.split("+")) + 1
            unet_params = widen_conv_in(unet_params, dup)
            in_ch = widened_in_channels(args.cond_channels)
        boc = tuple(ucfg.get("block_out_channels", (320, 640, 1280, 1280)))
        ahd = ucfg.get("attention_head_dim", 64)
        if isinstance(ahd, (list, tuple)):
            # diffusers stores per-block head COUNTS under this name (its
            # historical naming bug); the per-head dim is channels/heads
            head_dim = boc[0] // int(ahd[0])
        elif int(ahd) < 32 and boc[0] % int(ahd) == 0:
            # scalar <32 is the SD1.x-style head COUNT (e.g. 8 ->
            # per-head dim 320/8 = 40); hardcoding 64 here regrouped
            # 8x40 weights as 5x64 heads — silently wrong attention
            head_dim = boc[0] // int(ahd)
        else:
            head_dim = int(ahd)  # already a per-head dim (SD2.x-style 64)
        n = len(boc)
        default_down = ("CrossAttnDownBlock2D",) * (n - 1) + ("DownBlock2D",)
        default_up = ("UpBlock2D",) + ("CrossAttnUpBlock2D",) * (n - 1)
        unet = UNet2DCondition(
            in_channels=in_ch,
            out_channels=ucfg.get("out_channels", 4),
            block_out_channels=boc,
            down_block_types=tuple(ucfg.get("down_block_types", default_down)),
            up_block_types=tuple(ucfg.get("up_block_types", default_up)),
            layers_per_block=ucfg.get("layers_per_block", 2),
            attention_head_dim=head_dim,
            cross_attention_dim=ucfg.get("cross_attention_dim", 1024),
            norm_groups=ucfg.get("norm_num_groups", 32),
        )
        vcfg_path = os.path.join(args.ref_dir, "vae", "config.json")
        with open(vcfg_path) as f:
            vcfg = json.load(f)
        vae = AutoencoderKL(
            latent_channels=vcfg.get("latent_channels", 4),
            block_out_channels=tuple(vcfg.get("block_out_channels", (128, 256, 512, 512))),
            norm_groups=vcfg.get("norm_num_groups", 32),
        )
        vae_params = vae_torch_to_flax(load_torch_state_dict(os.path.join(args.ref_dir, "vae")))

        # precompute the empty-prompt embedding with the bundled text encoder
        te_dir = os.path.join(args.ref_dir, "text_encoder")
        if os.path.exists(te_dir):
            with open(os.path.join(te_dir, "config.json")) as f:
                tcfg = json.load(f)
            clip = CLIPTextModel(CLIPTextConfig(
                vocab_size=tcfg.get("vocab_size", 49408),
                hidden_size=tcfg.get("hidden_size", 1024),
                intermediate_size=tcfg.get("intermediate_size", 4096),
                num_hidden_layers=tcfg.get("num_hidden_layers", 23),
                num_attention_heads=tcfg.get("num_attention_heads", 16),
                max_position_embeddings=tcfg.get("max_position_embeddings", 77),
                hidden_act=tcfg.get("hidden_act", "gelu"),
            ))
            clip_params = clip_text_torch_to_flax(load_torch_state_dict(te_dir))
            # [BOS, EOS] only — the reference encodes "" with
            # padding="do_not_pad" (train.py:121-129)
            ids = jnp.asarray(empty_prompt_tokens())
            text_embed = clip.apply({"params": clip_params}, ids)
            print("computed empty-prompt embedding from text_encoder")
        else:
            text_embed = jnp.zeros((1, 2, ucfg.get("cross_attention_dim", 1024)))
            print("WARNING: no text_encoder dir; zero text embedding")

        pipe = GuidedLatentDiffusionPipeline(
            unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
            text_embed=text_embed, spec=SamplerSpec(kind, schedule),
            guidance=guidance, normalizer=Normalizer(
                ssi=False, mode="average", num_chs=1,
                ch_bounds=(128.0,), ch_gammas=(1.0,),
            ),
        )
    else:
        unet = UNet2D(
            in_channels=ucfg["in_channels"],
            out_channels=ucfg["out_channels"],
            block_out_channels=tuple(ucfg["block_out_channels"]),
            down_block_types=tuple(ucfg["down_block_types"]),
            up_block_types=tuple(ucfg["up_block_types"]),
            layers_per_block=ucfg.get("layers_per_block", 2),
        )
        pipe = GuidedDiffusionPipeline(
            unet=unet, unet_params=unet_params,
            spec=SamplerSpec(kind, schedule), guidance=guidance,
            normalizer=Normalizer(ssi=True),
        )

    pipe.save_pretrained(args.out_dir)
    print(f"imported {'LDM' if is_ldm else 'pixel'} pipeline -> {args.out_dir}")


if __name__ == "__main__":
    main()
