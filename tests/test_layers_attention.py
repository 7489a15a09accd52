"""Layer/attention parity vs torch modules."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from aa_clip_iqm_tpu.ops import attention as attn_ops
from aa_clip_iqm_tpu.ops import layers


def test_layer_norm_matches_torch(rng):
    x = rng.standard_normal((4, 9, 32)).astype(np.float32)
    scale = rng.standard_normal(32).astype(np.float32)
    bias = rng.standard_normal(32).astype(np.float32)
    ref = F.layer_norm(
        torch.from_numpy(x), (32,), torch.from_numpy(scale), torch.from_numpy(bias)
    ).numpy()
    out = np.asarray(layers.layer_norm({"scale": scale, "bias": bias}, x))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_gelu_variants_match_torch(rng):
    x = rng.standard_normal(1000).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(layers.gelu(x)), F.gelu(torch.from_numpy(x)).numpy(),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(layers.quick_gelu(x)),
        (torch.from_numpy(x) * torch.sigmoid(1.702 * torch.from_numpy(x))).numpy(),
        rtol=1e-5, atol=1e-6,
    )


def test_leaky_relu_matches_torch(rng):
    x = rng.standard_normal(100).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(layers.leaky_relu(x)),
        F.leaky_relu(torch.from_numpy(x)).numpy(), rtol=1e-6, atol=1e-7,
    )


def _mha_params(rng, d):
    w_in = rng.standard_normal((3 * d, d)).astype(np.float32) * 0.05
    b_in = rng.standard_normal(3 * d).astype(np.float32) * 0.05
    w_out = rng.standard_normal((d, d)).astype(np.float32) * 0.05
    b_out = rng.standard_normal(d).astype(np.float32) * 0.05
    params = {
        "qkv": {"w": w_in.T.copy(), "b": b_in},
        "out": {"w": w_out.T.copy(), "b": b_out},
    }
    return params, (w_in, b_in, w_out, b_out)


@pytest.mark.parametrize("causal", [False, True])
def test_mha_matches_torch_multihead(rng, causal):
    d, h, b, l = 32, 4, 2, 11
    params, (w_in, b_in, w_out, b_out) = _mha_params(rng, d)
    x = rng.standard_normal((b, l, d)).astype(np.float32)

    ref_attn = torch.nn.MultiheadAttention(d, h, batch_first=True)
    with torch.no_grad():
        ref_attn.in_proj_weight.copy_(torch.from_numpy(w_in))
        ref_attn.in_proj_bias.copy_(torch.from_numpy(b_in))
        ref_attn.out_proj.weight.copy_(torch.from_numpy(w_out))
        ref_attn.out_proj.bias.copy_(torch.from_numpy(b_out))
    mask = None
    jmask = None
    if causal:
        mask = torch.triu(torch.full((l, l), float("-inf")), diagonal=1)
        jmask = np.asarray(attn_ops.causal_mask(l))
    with torch.no_grad():
        ref, _ = ref_attn(torch.from_numpy(x), torch.from_numpy(x),
                          torch.from_numpy(x), attn_mask=mask)
    out = np.asarray(attn_ops.mha(params, x, h, attn_mask=jmask))
    np.testing.assert_allclose(out, ref.numpy(), rtol=1e-4, atol=1e-5)


def test_vv_attention_semantics(rng):
    """v-v surgery attention == softmax(v v^T / sqrt(hd)) @ v then out-proj
    (reference model/transformer.py:125-152)."""
    d, h, b, l = 32, 4, 2, 7
    params, (w_in, b_in, w_out, b_out) = _mha_params(rng, d)
    x = rng.standard_normal((b, l, d)).astype(np.float32)

    xt = torch.from_numpy(x)
    qkv = xt @ torch.from_numpy(w_in).T + torch.from_numpy(b_in)
    v = qkv[..., 2 * d:]
    vh = v.reshape(b, l, h, d // h).permute(0, 2, 1, 3)
    scale = (d // h) ** -0.5
    attn = torch.softmax(vh @ vh.transpose(-2, -1) * scale, dim=-1)
    ref = (attn @ vh).permute(0, 2, 1, 3).reshape(b, l, d)
    ref = ref @ torch.from_numpy(w_out).T + torch.from_numpy(b_out)

    out = np.asarray(attn_ops.vv_attention(params, x, h))
    np.testing.assert_allclose(out, ref.numpy(), rtol=1e-4, atol=1e-5)


def test_norm_preserving_blend(rng):
    x = rng.standard_normal((3, 5, 16)).astype(np.float32)
    a = rng.standard_normal((3, 5, 16)).astype(np.float32)
    out = np.asarray(layers.norm_preserving_blend(x, a, 0.1))
    xn = np.linalg.norm(x, axis=-1, keepdims=True)
    an = np.linalg.norm(a, axis=-1, keepdims=True)
    ref = 0.1 * (a * xn / an) + 0.9 * x
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_l2_normalize(rng):
    x = rng.standard_normal((4, 8)).astype(np.float32)
    out = np.asarray(layers.l2_normalize(x))
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, rtol=1e-5)


def test_vv_batch_axis_matches_executed_reference(rng):
    """vv_attention_batch_axis == the reference surgery attention as
    EXECUTED (survey Q9: softmax over the batch axis per token position,
    model/transformer.py:126-151 on the LND tensor from :528)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from torch_ref import torch_vv_batch_executed

    d, h, b, l = 32, 4, 3, 7
    params, (w_in, b_in, w_out, b_out) = _mha_params(rng, d)
    x = rng.standard_normal((b, l, d)).astype(np.float32)
    sd = {"blk.attn.in_proj_weight": w_in, "blk.attn.in_proj_bias": b_in,
          "blk.attn.out_proj.weight": w_out, "blk.attn.out_proj.bias": b_out}
    ref = torch_vv_batch_executed(torch.from_numpy(x), sd, "blk", h).numpy()
    out = np.asarray(attn_ops.vv_attention_batch_axis(params, x, h))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
    # Executed semantics differ from the intended token-axis surgery the
    # shipped pipeline uses (they only coincide in degenerate cases).
    tok = np.asarray(attn_ops.vv_attention(params, x, h))
    assert np.abs(tok - out).max() > 1e-3


def test_vv_batch_axis_degenerates_at_batch_one(rng):
    """At batch 1 the executed reference surgery is exactly out_proj(v):
    softmax over a singleton batch axis is identity."""
    d, h, l = 32, 4, 7
    params, (w_in, b_in, w_out, b_out) = _mha_params(rng, d)
    x = rng.standard_normal((1, l, d)).astype(np.float32)
    v = x @ w_in.T[:, 2 * d:] + b_in[2 * d:]
    ref = v @ w_out.T + b_out
    out = np.asarray(attn_ops.vv_attention_batch_axis(params, x, h))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
