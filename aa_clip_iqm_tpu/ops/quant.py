"""Int8 quantized inference tier for the frozen CLIP backbone.

The backbone is frozen (the reference trains only adapters —
/root/reference/train.py:322-350), which makes its big matmuls the textbook
case for quantization: weights are static, so they are quantized ONCE at
load time (per-output-channel symmetric int8), and activations are
quantized dynamically per token at run time. Both dot operands then being
int8, the MXU runs the contraction at its int8 rate (2x the bf16 peak on
v5e) with int32 accumulation; the per-token x per-channel rescale is a
cheap fused VPU epilogue.

Scope: the visual-tower block matmuls (qkv, out-proj, c_fc, c_proj) — ~82%
of the 518px inference FLOPs (bench derivation in cli/bench.py). LayerNorm,
attention softmax/PV, embeddings, the final proj, the text tower, and every
adapter/IQM matmul stay in the caller's compute dtype: they are cheap,
and keeping the score head + anchors full-precision protects the anomaly
-map numerics the same way the bf16 tier keeps LayerNorm fp32.

Differentiability: int8_linear carries a straight-through custom VJP
(backward with dequantized weights), so adapter training that backprops
*through* a quantized frozen block gets correct, non-zero gradients —
without it, round()'s zero gradient would silently kill them. Training
defaults still use the fp backbone for exactness; the quantized-forward
training tier is an opt-in experiment (see docs/DESIGN.md for measured
numerics bounds).

No reference analogue (the reference runs strict fp32; SURVEY.md §6).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def quantize_linear_params(p):
    """{"w": (..., in, out) [, "b"]} -> {"w_q": int8, "scale": (..., 1, out)
    fp32 [, "b"]}. Per-output-channel symmetric: scale = max|w_col| / 127.
    Host-side numpy (load-time, like the checkpoint converter)."""
    w = np.asarray(p["w"], np.float32)
    scale = np.max(np.abs(w), axis=-2, keepdims=True) / 127.0
    scale = np.maximum(scale, 1e-12).astype(np.float32)
    w_q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    out = {"w_q": jnp.asarray(w_q), "scale": jnp.asarray(scale)}
    if "b" in p and p["b"] is not None:
        out["b"] = p["b"]
    return out


def int8_linear(qp, x):
    """y = dequant(quant(x) @ w_q) + b with dynamic per-token activation
    scales. x: (..., in) any float dtype; returns x.dtype.

    The contraction is int8 x int8 -> int32 (`preferred_element_type`), the
    layout XLA lowers onto the TPU int8 MXU path; the rescale
    (s_x * scale) broadcasts (..., 1) x (1, out) into the epilogue.

    Differentiable (straight-through): without a custom VJP the gradient
    w.r.t. x would be silently ZERO (round() has no gradient), breaking any
    adapter training that backprops *through* a quantized frozen block. The
    backward uses the dequantized weights at the compute dtype —
    dx = dy @ (w_q * scale)^T — i.e. the quantizer is treated as identity,
    the standard straight-through estimator. Weights take no gradient (the
    backbone is frozen; int8 leaves are non-differentiable by dtype anyway).
    """
    return _int8_linear_ste(qp["w_q"], qp["scale"], qp.get("b"), x)


@jax.custom_vjp
def _int8_linear_ste(w_q, scale, b, x):
    return _int8_linear_fwd_math(w_q, scale, b, x)


def _int8_linear_fwd_math(w_q, scale, b, x):
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    s_x = jnp.maximum(amax, 1e-6) * (1.0 / 127.0)
    x_q = jnp.clip(jnp.round(x32 / s_x), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_q, w_q,
        dimension_numbers=(((x_q.ndim - 1,), (w_q.ndim - 2,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * s_x * scale.reshape(scale.shape[-1])
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def _int8_fwd(w_q, scale, b, x):
    return _int8_linear_fwd_math(w_q, scale, b, x), (w_q, scale, b)


def _int8_bwd(res, dy):
    w_q, scale, b = res
    has_b = b is not None
    x_dtype = dy.dtype  # primal output dtype == x.dtype
    w_deq = (w_q.astype(jnp.float32) * scale).astype(x_dtype)
    dx = jax.lax.dot_general(
        dy.astype(x_dtype), w_deq,
        dimension_numbers=(((dy.ndim - 1,), (w_deq.ndim - 1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x_dtype)
    # Frozen-weight cotangents: float0 for the int8 weight (integer primals
    # carry no tangent space), explicit zeros for the fp scale (STE treats
    # the quantizer as identity, so scale is a constant of the map).
    dw = np.zeros(w_q.shape, jax.dtypes.float0)
    dscale = jnp.zeros_like(scale)
    db = (jnp.sum(dy.astype(jnp.float32),
                  axis=tuple(range(dy.ndim - 1)))
          if has_b else None)
    return dw, dscale, db, dx


_int8_linear_ste.defvjp(_int8_fwd, _int8_bwd)


def _quantize_block_tree(blocks, scope: str = "all"):
    """Stacked-block pytree -> same structure with the block matmuls
    quantized (ln_1/ln_2 untouched). Works on the (layers, ...) stacked
    layout: scales get a per-layer leading axis and scan-slice like any
    other leaf.

    scope: "all" quantizes qkv/out/c_fc/c_proj; "attn" quantizes only the
    attention projections and leaves the MLP in float — that keeps the MLP
    eligible for the fused LN->MLP Pallas kernel (ops/pallas_mlp.py skips
    quantized weights), stacking the two optimizations; "mlp" quantizes only
    c_fc/c_proj (served by the fused int8 LN->MLP kernel) and keeps the
    attention projections in the compute dtype — the measured XLA int8 dot
    gives qkv/out no rate advantage on v5e (docs/DESIGN.md), so this scope
    drops their per-token activation-quant overhead and their quantization
    error while keeping the kernel that carries the int8 win.
    """
    quant_mlp = scope in ("all", "mlp")
    quant_attn = scope in ("all", "attn")
    mlp = blocks["mlp"]
    return {
        "ln_1": blocks["ln_1"],
        "attn": {
            "qkv": quantize_linear_params(blocks["attn"]["qkv"])
            if quant_attn else blocks["attn"]["qkv"],
            "out": quantize_linear_params(blocks["attn"]["out"])
            if quant_attn else blocks["attn"]["out"],
        },
        "ln_2": blocks["ln_2"],
        "mlp": {
            "c_fc": quantize_linear_params(mlp["c_fc"]) if quant_mlp
            else mlp["c_fc"],
            "c_proj": quantize_linear_params(mlp["c_proj"]) if quant_mlp
            else mlp["c_proj"],
        },
    }


def quantize_backbone_tier(frozen, tier):
    """Tier-string front-end shared by every CLI/env/serving entry point.

    tier: None / "" (no-op), "int8" (all block matmuls), "int8_attn"
    (qkv/out only; the MLP keeps the fused fp Pallas kernel) or "int8_mlp"
    (c_fc/c_proj only, through the fused int8 kernel; attention projections
    stay in the compute dtype). Anything else — e.g. a typo'd
    AACLIP_BENCH_QUANT=int8-attn — raises instead of silently running the
    fp tier under a quantized label.
    """
    if tier in (None, ""):
        return frozen
    scopes = {"int8": "all", "int8_attn": "attn", "int8_mlp": "mlp"}
    if tier not in scopes:
        raise ValueError(
            f"unknown quantization tier {tier!r}; expected 'int8',"
            " 'int8_attn' or 'int8_mlp'")
    return quantize_backbone_int8(frozen, scope=scopes[tier])


def quantize_backbone_int8(frozen, scope: str = "all"):
    """Frozen CLIP pytree -> copy with the visual-tower block matmuls in
    int8. Everything else (visual embeddings/LNs/proj, the whole text tower,
    logit_scale) is shared by reference with the input pytree.

    scope: "all" (every block matmul), "attn" (qkv/out only — the MLP
    stays float and keeps the fused LN->MLP Pallas kernel) or "mlp"
    (c_fc/c_proj only — attention projections stay float; see
    _quantize_block_tree).

    The quantized pytree is a drop-in `frozen` argument for every inference
    path (`ops.layers.linear` dispatches on the "w_q" key), including
    encode_image_adapted and the fused predict program. Do not feed it to
    `parallel.mesh.shard_backbone` (the TP sharding spec describes the fp
    layout) or to a gradient path.
    """
    if scope not in ("all", "attn", "mlp"):
        raise ValueError(
            f"scope must be 'all', 'attn' or 'mlp', got {scope!r}")
    visual = dict(frozen["visual"])
    if "blocks" not in visual:
        raise ValueError("int8 tier supports the ViT tower only "
                         "(ModifiedResNet is conv-dominated)")
    visual["blocks"] = _quantize_block_tree(visual["blocks"], scope)
    out = dict(frozen)
    out["visual"] = visual
    return out
