"""CLIP text encoder in flax with an ``inputs_embeds`` injection path.

Parity targets:
- HF ``CLIPTextModel`` (SD-1.x text encoder: vocab 49408, hidden 768,
  12 layers, 12 heads, quick_gelu, causal mask, eps 1e-5).
- The reference's fork ``data_generation/attndb_clip.py:117-173``, whose only
  functional change is accepting ``inputs_embeds`` so learnable token vectors
  flow differentiably into the encoder. Here that's just an optional argument:
  pass token-level embeddings (pre-position-add) and they are used instead of
  the embedding lookup, exactly as the fork does.

The learnable-token splice itself (write trainable embeddings at recorded
start indices, ``finetune_sd_token.py:1002-1010``) lives in
``agenda_tpu/train/finetune_sd_token.py`` (``splice_token_embeddings``) as a
vectorized scatter.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from agenda_tpu.kernels.attention import attention_reference


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"

    @classmethod
    def tiny(cls) -> "CLIPTextConfig":
        return cls(
            vocab_size=1000,
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=2,
        )


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    raise ValueError(f"Unknown activation {name}")


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, causal_mask: jax.Array) -> jax.Array:
        cfg = self.config
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="layer_norm1")(x)
        b, s, c = h.shape
        heads = cfg.num_attention_heads
        hd = c // heads
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(h)
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(h)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(h)
        # attention_reference applies the 1/sqrt(head_dim) scale internally,
        # matching HF CLIPAttention's q-scaling.
        out = attention_reference(
            q.reshape(b, s, heads, hd),
            k.reshape(b, s, heads, hd),
            v.reshape(b, s, heads, hd),
            mask=causal_mask,
        ).reshape(b, s, c)
        x = x + nn.Dense(c, dtype=self.dtype, name="out_proj")(out)

        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = _act(cfg.hidden_act)(h)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,  # (B, S) int32
        inputs_embeds: Optional[jax.Array] = None,  # (B, S, C) pre-position embeds
    ) -> Tuple[jax.Array, jax.Array]:
        """Returns (last_hidden_state (B,S,C), pooled (B,C) at EOS argmax)."""
        cfg = self.config
        token_embedding = self.param(
            "token_embedding",
            nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.hidden_size),
            jnp.float32,
        )
        position_embedding = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (cfg.max_position_embeddings, cfg.hidden_size),
            jnp.float32,
        )
        if inputs_embeds is None:
            inputs_embeds = jnp.take(token_embedding, input_ids, axis=0)
        s = input_ids.shape[1]
        x = (inputs_embeds + position_embedding[None, :s]).astype(self.dtype)

        # Causal mask: (1, 1, S, S) additive.
        causal = jnp.triu(jnp.full((s, s), -1e9, jnp.float32), k=1)[None, None]

        for i in range(cfg.num_hidden_layers):
            x = CLIPEncoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x, causal)

        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="final_layer_norm")(x)
        x = x.astype(jnp.float32)

        # Pooled output: hidden state at the position of the max token id (EOS),
        # HF CLIPTextModel semantics (attndb_clip.py:89-95).
        eos_idx = jnp.argmax(input_ids, axis=-1)
        pooled = jnp.take_along_axis(x, eos_idx[:, None, None], axis=1)[:, 0]
        return x, pooled
