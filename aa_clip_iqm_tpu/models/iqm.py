"""IQM — Improved Querying (Q-Former-style) transformer, functional JAX.

Rebuilds the reference's HF-based IQM (model/iqm.py:23-673) as pure functions:
per layer — query self-attention, cross-attention to concatenated multi-level
visual tokens, cross-attention to the 2 text anchors, fixed-weight fusion
0.4*self + 0.3*visual + 0.3*text (model/iqm.py:311-315), then a query-specific
FFN. Attention/FFN sub-blocks are post-LN residual (BERT style, eps 1e-12).

Deviations from the reference, by design (SURVEY.md Q1/Q2): all IQM-family
parameters (including the visual/text feature projections the reference
creates lazily and never trains) live in this pytree and are checkpointed.
Dropout is omitted: the reference holds the model in eval() for both training
stages (survey Q5), so its dropouts are never active either.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..configs import IQMConfig
from ..ops.attention import cross_attention
from ..ops.layers import ACTIVATIONS, layer_norm, linear, xavier_linear


def _init_linear(rng, d_in, d_out):
    return xavier_linear(rng, d_in, d_out)


def _init_ln(dim):
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def _init_attention(rng, cfg: IQMConfig, kv_dim: int):
    ks = jax.random.split(rng, 4)
    h = cfg.hidden_size
    return {
        "q": _init_linear(ks[0], h, h),
        "k": _init_linear(ks[1], kv_dim, h),
        "v": _init_linear(ks[2], kv_dim, h),
        "out_dense": _init_linear(ks[3], h, h),
        "out_ln": _init_ln(h),
    }


def _init_ffn(rng, cfg: IQMConfig):
    k1, k2 = jax.random.split(rng)
    return {
        "intermediate": _init_linear(k1, cfg.hidden_size, cfg.intermediate_size),
        "output": _init_linear(k2, cfg.intermediate_size, cfg.hidden_size),
        "ln": _init_ln(cfg.hidden_size),
    }


def init_iqm_params(rng, cfg: IQMConfig):
    layers = []
    keys = jax.random.split(rng, cfg.num_hidden_layers + 1)
    for i in range(cfg.num_hidden_layers):
        ks = jax.random.split(keys[i], 4)
        layer = {"self": _init_attention(ks[0], cfg, cfg.hidden_size)}
        if i % cfg.cross_attention_frequency == 0:
            layer["cross"] = _init_attention(ks[1], cfg, cfg.encoder_hidden_size)
            layer["text_cross"] = _init_attention(
                ks[2], cfg, cfg.text_encoder_hidden_size
            )
        layer["ffn_q"] = _init_ffn(ks[3], cfg)
        layers.append(layer)
    return {"layernorm": _init_ln(cfg.hidden_size), "layers": layers}


def _attention_block(p, cfg: IQMConfig, q_in, kv_in):
    """IQM_Attention: MHA + SelfOutput (dense, residual, post-LN)."""
    ctx = cross_attention(
        {"q": p["q"], "k": p["k"], "v": p["v"]}, q_in, kv_in,
        cfg.num_attention_heads,
    )
    h = linear(p["out_dense"], ctx)
    return layer_norm(p["out_ln"], h + q_in, eps=cfg.layer_norm_eps)


def _ffn_block(p, cfg: IQMConfig, x):
    act = ACTIVATIONS[cfg.hidden_act]
    h = act(linear(p["intermediate"], x))
    h = linear(p["output"], h)
    return layer_norm(p["ln"], h + x, eps=cfg.layer_norm_eps)


def iqm_forward(params, cfg: IQMConfig, query_embeds, visual_tokens, text_tokens):
    """query_embeds: (B, Q, hidden); visual_tokens: (B, Lv, encoder_hidden);
    text_tokens: (B, Lt, text_encoder_hidden). Returns (B, Q, hidden)."""
    x = layer_norm(params["layernorm"], query_embeds, eps=cfg.layer_norm_eps)
    for layer in params["layers"]:
        attn_out = _attention_block(layer["self"], cfg, x, x)
        if "cross" in layer:
            visual_out = _attention_block(layer["cross"], cfg, attn_out, visual_tokens)
            text_out = _attention_block(layer["text_cross"], cfg, visual_out,
                                        text_tokens)
            fused = (cfg.fuse_self * attn_out + cfg.fuse_visual * visual_out
                     + cfg.fuse_text * text_out)
        else:
            fused = attn_out
        x = _ffn_block(layer["ffn_q"], cfg, fused)
    return x


def sinusoidal_positions(max_len: int, d_model: int):
    """Sinusoidal position table (1, max_len, d_model), parity with
    _create_positional_embedding (model/adapter.py:98-105). Stored as a
    trainable parameter initialized to this table, as in the reference."""
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-math.log(10000.0) / d_model)
    )
    pe = jnp.zeros((max_len, d_model))
    pe = pe.at[:, 0::2].set(jnp.sin(position * div))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div))
    return pe[None]
