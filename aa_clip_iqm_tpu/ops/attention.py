"""Multi-head attention ops: XLA reference path + CLIP-Surgery v-v variant.

Weight layout: packed qkv as in torch nn.MultiheadAttention
(in_proj_weight/in_proj_bias, reference model/transformer.py:200), stored
transposed for right-multiplication:
    params = {"qkv": {"w": (d, 3d), "b": (3d,)}, "out": {"w": (d, d), "b": (d,)}}

The v-v "surgery" attention (reference model/transformer.py:102-152) replaces
queries and keys by values: attn = softmax((v @ v^T) * scale) @ v. After
DAPM_replace, the residual block's attention output is the v-v path (the
original-path output is computed and discarded by the reference, :148-152);
we simply don't compute it.

A fused Pallas flash-attention kernel lives in :mod:`.pallas_attention`; this
module dispatches to it for long sequences on TPU and falls back to the XLA
path elsewhere.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import linear


def _split_heads(x, num_heads):
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, l, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * hd)


def qkv_project(params, x):
    y = linear(params["qkv"], x)
    return jnp.split(y, 3, axis=-1)


def sdpa(q, k, v, scale, attn_mask=None):
    """Scaled dot-product attention; softmax in fp32.

    q,k,v: (B, H, L, hd). attn_mask: additive (Lq, Lk) or broadcastable.
    """
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if attn_mask is not None:
        logits = logits + attn_mask.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


def _packed_pallas_ok(x, num_heads: int, attn_mask) -> bool:
    import jax

    from . import pallas_attention as pa

    # The Mosaic kernel only compiles on TPU; anywhere else (CPU smoke runs,
    # GPU) silently fall back to the XLA path — unless tests force the
    # interpreter. This makes use_pallas safe to leave on everywhere.
    if not pa.INTERPRET and jax.default_backend() != "tpu":
        return False
    l = x.shape[1]
    w = x.shape[-1]
    if attn_mask is not None or l < 2 * pa.BLK_Q or l > pa.ROW_KERNEL_MAX_TOKENS:
        return False
    if w % num_heads:
        return False
    hd = w // num_heads
    group = max(1, 128 // hd)
    # Mosaic block columns must tile in 128-lane panels of whole heads.
    return (group * hd) % 128 == 0 and num_heads % group == 0


def mha(params, x, num_heads: int, attn_mask=None, use_pallas: bool = False,
        valid_len=None):
    """Standard self-attention block core (torch MultiheadAttention parity).

    valid_len: when the caller runs the tower on pre-padded tokens (padding
    once for all layers instead of per-layer), the number of real tokens —
    the kernel masks the padded keys.
    """
    if use_pallas and _packed_pallas_ok(x, num_heads, attn_mask):
        from .pallas_attention import flash_mha_packed

        qkv = linear(params["qkv"], x)
        hd = x.shape[-1] // num_heads
        out = flash_mha_packed(qkv, num_heads, hd ** -0.5,
                               valid_len=valid_len)
        return linear(params["out"], out)
    q, k, v = qkv_project(params, x)
    hd = x.shape[-1] // num_heads
    scale = hd ** -0.5
    qh, kh, vh = (_split_heads(t, num_heads) for t in (q, k, v))
    if use_pallas:
        from .pallas_attention import flash_mha
        out = flash_mha(qh, kh, vh, scale, attn_mask=attn_mask)
    else:
        out = sdpa(qh, kh, vh, scale, attn_mask)
    return linear(params["out"], _merge_heads(out))


def vv_attention(params, x, num_heads: int, use_pallas: bool = False,
                 valid_len=None):
    """CLIP-Surgery value-value attention (q = k = v) over the TOKEN axis.

    This is the intended surgery semantics. The executed reference differs
    (survey Q9): its custom ``Attention.forward`` unpacks ``B, N, C =
    q_x.shape`` on a seq-first (L, N, C) tensor (model/transformer.py:126,
    input permuted NLD->LND at :528), so its softmax runs over the BATCH
    axis at each token position — images in a batch attend to each other,
    and at batch 1 the branch degenerates to ``out_proj(v)``. That path only
    feeds the frozen stage-1 feature extractor (train.py:75-85; eval builds
    no surgery model, test_last.py:210-228), so eval parity is unaffected;
    :func:`vv_attention_batch_axis` transcribes it exactly for
    training-reproduction studies."""
    if use_pallas and _packed_pallas_ok(x, num_heads, None):
        from .pallas_attention import flash_mha_packed

        qkv = linear(params["qkv"], x)
        hd = x.shape[-1] // num_heads
        out = flash_mha_packed(qkv, num_heads, hd ** -0.5, vv=True,
                               valid_len=valid_len)
        return linear(params["out"], out)
    _, _, v = qkv_project(params, x)
    hd = x.shape[-1] // num_heads
    scale = hd ** -0.5
    vh = _split_heads(v, num_heads)
    if use_pallas:
        from .pallas_attention import flash_mha
        out = flash_mha(vh, vh, vh, scale)
    else:
        out = sdpa(vh, vh, vh, scale)
    return linear(params["out"], _merge_heads(out))


def vv_attention_batch_axis(params, x, num_heads: int):
    """EXECUTED-reference surgery attention (survey Q9): per token position,
    each batch sample's value vector attends over the other samples in the
    batch (model/transformer.py:126-151 applied to an LND input). Provided
    for exact stage-1 training reproduction only — batch-composition-
    dependent by construction, so never used by the shipped pipeline."""
    _, _, v = qkv_project(params, x)                    # (B, L, d)
    hd = x.shape[-1] // num_heads
    # Heads split the channel dim as usual; attention contracts the batch
    # axis independently at every token index.
    vh = _split_heads(v, num_heads)                     # (B, H, L, hd)
    logits = jnp.einsum("bhld,chld->lhbc", vh, vh) * hd ** -0.5
    attn = jax.nn.softmax(logits, axis=-1)              # (L, H, B, B)
    out = jnp.einsum("lhbc,chld->bhld", attn, vh)
    return linear(params["out"], _merge_heads(out))


def causal_mask(length: int, dtype=jnp.float32):
    """Additive causal mask (upper-triangular -inf), torch build_attention_mask
    parity (model/transformer.py:629-635)."""
    mask = jnp.full((length, length), -jnp.inf, dtype=dtype)
    return jnp.triu(mask, k=1)


def cross_attention(params, q_in, kv_in, num_heads: int, attn_mask=None):
    """Separate q/k/v projections (used by IQM, reference iqm.py:23-139).

    params: {"q": {...}, "k": {...}, "v": {...}, "out": {...}} — "out" optional.
    """
    q = linear(params["q"], q_in)
    k = linear(params["k"], kv_in)
    v = linear(params["v"], kv_in)
    hd = q.shape[-1] // num_heads
    scale = hd ** -0.5
    out = sdpa(
        _split_heads(q, num_heads),
        _split_heads(k, num_heads),
        _split_heads(v, num_heads),
        scale,
        attn_mask,
    )
    return _merge_heads(out)
