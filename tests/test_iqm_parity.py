"""IQM layer parity vs a direct torch transcription of the reference
semantics (model/iqm.py): BERT-style post-LN attention blocks, query
self-attention -> visual cross-attention -> text cross-attention chained,
0.4/0.3/0.3 fusion, query FFN; top-level input LayerNorm (eps 1e-12)."""
import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from aa_clip_iqm_tpu.configs import IQMConfig
from aa_clip_iqm_tpu.models import iqm as iqm_mod

CFG = IQMConfig(
    hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
    intermediate_size=32, encoder_hidden_size=24, text_encoder_hidden_size=12,
)


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def _t_ln(p, x, eps=1e-12):
    return F.layer_norm(x, (x.shape[-1],), _t(p["scale"]), _t(p["bias"]), eps)


def _t_linear(p, x):
    return x @ _t(p["w"]) + _t(p["b"])


def _t_attention_block(p, cfg, q_in, kv_in):
    h = cfg.hidden_size
    heads = cfg.num_attention_heads
    hd = h // heads
    q = _t_linear(p["q"], q_in)
    k = _t_linear(p["k"], kv_in)
    v = _t_linear(p["v"], kv_in)

    def split(t):
        return t.reshape(t.shape[0], t.shape[1], heads, hd).permute(0, 2, 1, 3)

    # HF IQM scales by / sqrt(head_dim) (model/iqm.py:55,114)
    scores = split(q) @ split(k).transpose(-1, -2) / (hd ** 0.5)
    probs = torch.softmax(scores, dim=-1)
    ctx = (probs @ split(v)).permute(0, 2, 1, 3).reshape(
        q_in.shape[0], q_in.shape[1], h)
    out = _t_linear(p["out_dense"], ctx)
    return _t_ln(p["out_ln"], out + q_in)


def _t_ffn(p, cfg, x):
    h = F.gelu(_t_linear(p["intermediate"], x))
    h = _t_linear(p["output"], h)
    return _t_ln(p["ln"], h + x)


def torch_iqm_forward(params, cfg, queries, visual, text):
    x = _t_ln(params["layernorm"], _t(queries))
    visual_t, text_t = _t(visual), _t(text)
    for layer in params["layers"]:
        attn = _t_attention_block(layer["self"], cfg, x, x)
        cross = _t_attention_block(layer["cross"], cfg, attn, visual_t)
        text_out = _t_attention_block(layer["text_cross"], cfg, cross, text_t)
        fused = 0.4 * attn + 0.3 * cross + 0.3 * text_out
        x = _t_ffn(layer["ffn_q"], cfg, fused)
    return x


def test_iqm_forward_matches_torch_reference(rng):
    params = iqm_mod.init_iqm_params(jax.random.PRNGKey(3), CFG)
    b = 2
    queries = rng.standard_normal((b, 2, CFG.hidden_size)).astype(np.float32)
    visual = rng.standard_normal((b, 9, CFG.encoder_hidden_size)).astype(np.float32)
    text = rng.standard_normal((b, 2, CFG.text_encoder_hidden_size)).astype(np.float32)

    ref = torch_iqm_forward(params, CFG, queries, visual, text).numpy()
    out = np.asarray(iqm_mod.iqm_forward(params, CFG, jnp.asarray(queries),
                                         jnp.asarray(visual),
                                         jnp.asarray(text)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_sinusoidal_positions_match_reference_formula():
    """model/adapter.py:98-105 sinusoid table."""
    import math

    pe = np.asarray(iqm_mod.sinusoidal_positions(8, 6))[0]
    for pos in range(8):
        for i in range(0, 6, 2):
            div = math.exp(i * (-math.log(10000.0) / 6))
            np.testing.assert_allclose(pe[pos, i], math.sin(pos * div),
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(pe[pos, i + 1], math.cos(pos * div),
                                       rtol=1e-5, atol=1e-6)
