"""Minimal CLIP text encoder (Flax) for the empty-prompt embedding.

The reference uses a frozen CLIP text encoder solely to embed the empty
prompt "" once per pipeline run (reference: train.py:825-827,
core/custom_pipelines.py:241-254). This is a from-scratch Flax
implementation of the CLIPTextModel forward pass (token + position
embeddings, pre-LN causal transformer, final LN) sized for SD2.1's
OpenCLIP-ViT/H text tower by default, with weight import from a torch
state dict. Because the prompt is always empty, the embedding can also be
precomputed once and baked into the exported pipeline — see
`empty_prompt_tokens`.
"""

from __future__ import annotations

import dataclasses
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 23
    num_attention_heads: int = 16
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    hidden_act: str = "gelu"  # SD2.1 uses plain gelu; SD1.x "quick_gelu"


def _act(name: str):
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    if name == "quick_gelu":
        return lambda x: x * nn.sigmoid(1.702 * x)
    raise ValueError(name)


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        c = self.cfg
        head_dim = c.hidden_size // c.num_attention_heads
        B, N, _ = x.shape
        q = nn.Dense(c.hidden_size, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(c.hidden_size, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(c.hidden_size, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(B, N, c.num_attention_heads, head_dim)
        k = k.reshape(B, N, c.num_attention_heads, head_dim)
        v = v.reshape(B, N, c.num_attention_heads, head_dim)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(head_dim)
        scores = jnp.where(causal_mask, scores, -1e9)
        attn = nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, N, c.hidden_size)
        return nn.Dense(c.hidden_size, dtype=self.dtype, name="out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm1")(x)
        x = x + CLIPAttention(c, dtype=self.dtype, name="self_attn")(h, causal_mask)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm2")(x)
        h = nn.Dense(c.intermediate_size, dtype=self.dtype, name="mlp_fc1")(h)
        h = _act(c.hidden_act)(h)
        h = nn.Dense(c.hidden_size, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    cfg: CLIPTextConfig = CLIPTextConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """input_ids: [B, N] int32 -> last_hidden_state [B, N, hidden]."""
        c = self.cfg
        B, N = input_ids.shape
        tok = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = nn.Embed(c.max_position_embeddings, c.hidden_size, dtype=self.dtype,
                       name="position_embedding")(jnp.arange(N)[None, :])
        x = tok + pos
        causal = jnp.tril(jnp.ones((N, N), bool))[None, None]
        for i in range(c.num_hidden_layers):
            x = CLIPEncoderLayer(c, dtype=self.dtype, name=f"layers_{i}")(x, causal)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                            name="final_layer_norm")(x)


def empty_prompt_tokens(max_len: int = 2) -> np.ndarray:
    """Token ids for the empty prompt: [BOS, EOS] — length 2.

    The reference tokenizes "" with padding="do_not_pad"
    (train.py:116-129 AND custom_pipelines.py:241-254), so its text
    embedding is [1, 2, D] and cross-attention attends over exactly two
    tokens. Padding to 77 would both diverge from reference numerics and
    pay ~38x the cross-attention KV work. Precomputing the ids removes
    the tokenizer dependency at inference. `max_len` > 2 reproduces
    CLIPTokenizer's EOS-padded form for callers that need a fixed 77
    (SD1.x-style max_length padding — NOT the reference's behavior).
    """
    ids = np.full((1, max_len), 49407, np.int32)
    ids[0, 0] = 49406
    return ids
