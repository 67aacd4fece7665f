"""Import diffusers/transformers torch checkpoints into the Flax models.

Handles the NCHW->HWIO conv transpose, linear transposes, diffusers->flax
name mapping for UNet2D / UNet2DCondition / AutoencoderKL / CLIPTextModel,
and the reference's conv_in widening rule (duplicate the 4-channel kernel
across 1+#conds groups and divide by the count — reference:
train.py:751-772). Checkpoints load from `diffusion_pytorch_model.safetensors`
or `.bin` files in a diffusers model directory.
"""

from __future__ import annotations

import os
import re
from typing import Dict

import numpy as np


def load_torch_state_dict(model_dir: str) -> Dict[str, np.ndarray]:
    """Load a diffusers/transformers weight file as numpy arrays."""
    for name in (
        "diffusion_pytorch_model.safetensors",
        "model.safetensors",
        "diffusion_pytorch_model.bin",
        "pytorch_model.bin",
    ):
        path = os.path.join(model_dir, name)
        if os.path.exists(path):
            if path.endswith(".safetensors"):
                from safetensors.numpy import load_file

                return load_file(path)
            import torch

            sd = torch.load(path, map_location="cpu", weights_only=True)
            return {k: v.numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"no weight file found in {model_dir}")


def _conv_w(x):  # [O,I,kh,kw] -> [kh,kw,I,O]
    return np.transpose(x, (2, 3, 1, 0))


def _lin_w(x):  # [O,I] -> [I,O]
    return np.transpose(x, (1, 0))


def _set(tree: dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _param_kind(torch_key: str):
    """Classify a torch parameter name -> (flax leaf name, transform)."""
    if torch_key.endswith(".weight"):
        return "weight", None
    if torch_key.endswith(".bias"):
        return "bias", None
    raise ValueError(torch_key)


_NORM_PAT = re.compile(r"(norm|layer_norm|group_norm)")


def _insert(tree, flax_prefix, leaf_module, torch_key, arr, is_conv, is_norm, is_embed=False):
    kind, _ = _param_kind(torch_key)
    if is_embed:
        _set(tree, flax_prefix + (leaf_module, "embedding"), arr)
    elif kind == "weight":
        if is_norm:
            _set(tree, flax_prefix + (leaf_module, "scale"), arr)
        elif is_conv:
            _set(tree, flax_prefix + (leaf_module, "kernel"), _conv_w(arr))
        else:
            _set(tree, flax_prefix + (leaf_module, "kernel"), _lin_w(arr))
    else:
        _set(tree, flax_prefix + (leaf_module, "bias"), arr)


def _map_resnet(tree, prefix, rest, arr):
    """rest like 'norm1.weight', 'conv1.weight', 'time_emb_proj.weight'..."""
    mod, leaf = rest.rsplit(".", 1)
    is_norm = mod.startswith("norm")
    is_conv = mod.startswith("conv")
    _insert(tree, prefix, mod, rest, arr, is_conv, is_norm)


def _map_attnblock(tree, prefix, rest, arr):
    """diffusers Attention inside (Attn)Blocks: group_norm/to_q/to_k/to_v/to_out.0"""
    mod, leaf = rest.rsplit(".", 1)
    mod = mod.replace("to_out.0", "to_out")
    is_norm = mod == "group_norm"
    _insert(tree, prefix, mod, rest, arr, is_conv=False, is_norm=is_norm)


def _map_transformer2d(tree, prefix, rest, arr):
    """Transformer2DModel keys: norm, proj_in, proj_out,
    transformer_blocks.{d}.(norm1|attn1.to_q|...|ff.net.0.proj|ff.net.2)"""
    if rest.startswith("norm."):
        _insert(tree, prefix, "norm", rest, arr, is_conv=False, is_norm=True)
        return
    if rest.startswith(("proj_in.", "proj_out.")):
        mod = rest.split(".")[0]
        # SD2.1 uses linear projections; older checkpoints use 1x1 convs
        is_conv = arr.ndim == 4
        if is_conv:
            arr = arr[..., 0, 0] if rest.endswith("weight") else arr
            _insert(tree, prefix, mod, rest, arr, is_conv=False, is_norm=False)
        else:
            _insert(tree, prefix, mod, rest, arr, is_conv=False, is_norm=False)
        return
    m = re.match(r"transformer_blocks\.(\d+)\.(.*)", rest)
    assert m, rest
    d, inner = int(m.group(1)), m.group(2)
    block = prefix + (f"transformer_blocks_{d}",)
    if inner.startswith(("norm1.", "norm2.", "norm3.")):
        mod = inner.split(".")[0]
        _insert(tree, block, mod, inner, arr, is_conv=False, is_norm=True)
    elif inner.startswith(("attn1.", "attn2.")):
        attn, sub = inner.split(".", 1)
        sub_mod = sub.rsplit(".", 1)[0].replace("to_out.0", "to_out")
        _insert(tree, block + (attn,), sub_mod, inner, arr, False, False)
    elif inner.startswith("ff.net.0.proj"):
        _insert(tree, block + ("ff", "net_0"), "proj", inner, arr, False, False)
    elif inner.startswith("ff.net.2"):
        _insert(tree, block + ("ff",), "net_2", inner, arr, False, False)
    else:
        raise KeyError(inner)


def _map_block_item(tree, flax_block, rest, arr):
    """rest after 'down_blocks.N.' e.g. 'resnets.0.norm1.weight'."""
    m = re.match(r"resnets\.(\d+)\.(.*)", rest)
    if m:
        _map_resnet(tree, (f"{flax_block}_res_{m.group(1)}",), m.group(2), arr)
        return
    m = re.match(r"attentions\.(\d+)\.(.*)", rest)
    if m:
        prefix = (f"{flax_block}_attn_{m.group(1)}",)
        inner = m.group(2)
        if inner.startswith(("transformer_blocks", "proj_in", "proj_out", "norm.")):
            _map_transformer2d(tree, prefix, inner, arr)
        else:
            _map_attnblock(tree, prefix, inner, arr)
        return
    m = re.match(r"(downsamplers|upsamplers)\.0\.conv\.(.*)", rest)
    if m:
        kind = "downsample" if m.group(1) == "downsamplers" else "upsample"
        _insert(tree, (f"{flax_block}_{kind}",), "conv", rest, arr, True, False)
        return
    raise KeyError(rest)


def unet_torch_to_flax(sd: Dict[str, np.ndarray]) -> dict:
    """Map a diffusers UNet2DModel / UNet2DConditionModel state dict to the
    Flax param tree of d3roma_tpu.models.unet2d / unet2d_condition."""
    tree: dict = {}
    for key, arr in sd.items():
        arr = np.asarray(arr)
        if key.startswith("conv_in."):
            _insert(tree, (), "conv_in", key, arr, True, False)
        elif key.startswith("time_embedding."):
            mod = key.split(".")[1]
            _insert(tree, ("time_embedding",), mod, key, arr, False, False)
        elif key.startswith("conv_norm_out."):
            _insert(tree, (), "conv_norm_out", key, arr, False, True)
        elif key.startswith("conv_out."):
            _insert(tree, (), "conv_out", key, arr, True, False)
        elif key.startswith("mid_block.resnets."):
            m = re.match(r"mid_block\.resnets\.(\d+)\.(.*)", key)
            _map_resnet(tree, (f"mid_res_{m.group(1)}",), m.group(2), arr)
        elif key.startswith("mid_block.attentions.0."):
            inner = key[len("mid_block.attentions.0."):]
            if inner.startswith(("transformer_blocks", "proj_in", "proj_out", "norm.")):
                _map_transformer2d(tree, ("mid_attn",), inner, arr)
            else:
                _map_attnblock(tree, ("mid_attn",), inner, arr)
        elif key.startswith(("down_blocks.", "up_blocks.")):
            m = re.match(r"(down|up)_blocks\.(\d+)\.(.*)", key)
            _map_block_item(tree, f"{m.group(1)}_{m.group(2)}", m.group(3), arr)
        else:
            # label_emb / class_embedding etc. are unused by the reference
            continue
    return tree


def vae_torch_to_flax(sd: Dict[str, np.ndarray]) -> dict:
    """Map a diffusers AutoencoderKL state dict to the Flax AutoencoderKL tree."""
    tree: dict = {}
    for key, arr in sd.items():
        arr = np.asarray(arr)
        if key.startswith(("quant_conv.", "post_quant_conv.")):
            mod = key.split(".")[0]
            _insert(tree, (), mod, key, arr, True, False)
            continue
        side, rest = key.split(".", 1)  # encoder / decoder
        assert side in ("encoder", "decoder"), key
        prefix = (side,)
        if rest.startswith("conv_in."):
            _insert(tree, prefix, "conv_in", rest, arr, True, False)
        elif rest.startswith("conv_norm_out."):
            _insert(tree, prefix, "conv_norm_out", rest, arr, False, True)
        elif rest.startswith("conv_out."):
            _insert(tree, prefix, "conv_out", rest, arr, True, False)
        elif rest.startswith("mid_block.resnets."):
            m = re.match(r"mid_block\.resnets\.(\d+)\.(.*)", rest)
            _map_resnet(tree, prefix + (f"mid_res_{m.group(1)}",), m.group(2), arr)
        elif rest.startswith("mid_block.attentions.0."):
            _map_attnblock(tree, prefix + ("mid_attn",),
                           rest[len("mid_block.attentions.0."):], arr)
        elif rest.startswith(("down_blocks.", "up_blocks.")):
            m = re.match(r"(down|up)_blocks\.(\d+)\.(.*)", rest)
            _map_block_item_vae(tree, prefix, f"{m.group(1)}_{m.group(2)}", m.group(3), arr)
        else:
            continue
    return tree


def _map_block_item_vae(tree, prefix, flax_block, rest, arr):
    m = re.match(r"resnets\.(\d+)\.(.*)", rest)
    if m:
        _map_resnet(tree, prefix + (f"{flax_block}_res_{m.group(1)}",), m.group(2), arr)
        return
    m = re.match(r"(downsamplers|upsamplers)\.0\.conv\.(.*)", rest)
    if m:
        kind = "downsample" if m.group(1) == "downsamplers" else "upsample"
        _insert(tree, prefix + (f"{flax_block}_{kind}",), "conv", rest, arr, True, False)
        return
    raise KeyError(rest)


def clip_text_torch_to_flax(sd: Dict[str, np.ndarray]) -> dict:
    """Map a transformers CLIPTextModel state dict to the Flax CLIPTextModel."""
    tree: dict = {}
    for key, arr in sd.items():
        arr = np.asarray(arr)
        k = key[len("text_model."):] if key.startswith("text_model.") else key
        if k == "embeddings.token_embedding.weight":
            _set(tree, ("token_embedding", "embedding"), arr)
        elif k == "embeddings.position_embedding.weight":
            _set(tree, ("position_embedding", "embedding"), arr)
        elif k.startswith("final_layer_norm."):
            _insert(tree, (), "final_layer_norm", k, arr, False, True)
        elif k.startswith("encoder.layers."):
            m = re.match(r"encoder\.layers\.(\d+)\.(.*)", k)
            i, inner = int(m.group(1)), m.group(2)
            prefix = (f"layers_{i}",)
            if inner.startswith(("layer_norm1.", "layer_norm2.")):
                mod = inner.split(".")[0]
                _insert(tree, prefix, mod, inner, arr, False, True)
            elif inner.startswith("self_attn."):
                mod = inner.split(".")[1]
                _insert(tree, prefix + ("self_attn",), mod, inner, arr, False, False)
            elif inner.startswith("mlp."):
                mod = "mlp_" + inner.split(".")[1]
                _insert(tree, prefix, mod, inner, arr, False, False)
        else:
            continue  # position_ids buffer, pooler, etc.
    return tree


def widen_conv_in(params: dict, dup: int) -> dict:
    """Apply the reference's conv_in widening to an imported flax tree:
    kernel [kh,kw,4,O] -> [kh,kw,4*dup,O] tiled on the input axis, both
    kernel and bias divided by dup (reference: train.py:758-769)."""
    import jax.numpy as jnp

    kernel = params["conv_in"]["kernel"]
    bias = params["conv_in"]["bias"]
    new_kernel = jnp.tile(kernel, (1, 1, dup, 1)) / dup
    new_bias = bias / dup
    out = dict(params)
    out["conv_in"] = {"kernel": new_kernel, "bias": new_bias}
    return out
