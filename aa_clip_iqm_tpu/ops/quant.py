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


def calibrate_ln_amax(visual, vision_cfg, images, act_name: str = "gelu",
                      adapters=None, adapter_weight: float = 0.0,
                      adapt_until: int = 0, compute_dtype=jnp.float32,
                      use_pallas: bool = False):
    """Per-layer, per-channel amax of the post-LN activations — the inputs
    of the two LN-fed quantized matmuls (qkv after ln_1, c_fc after ln_2) —
    over a calibration batch, on the PLAIN tower the predict pipeline runs
    (no surgery: eval builds no v-v model, reference test_last.py:210-228;
    residual adapters included when given, mirroring encode_image_adapted).

    Returns {"qkv": (layers, width), "c_fc": (layers, width)} float32.
    Final-state parity with models.clip.vision_forward is pinned by test
    (tests/test_quant.py) so this forward cannot drift from the real one.
    """
    from ..models import clip as clip_mod
    from . import attention as attn_ops
    from .layers import (
        ACTIVATIONS,
        layer_norm,
        mlp_block,
        norm_preserving_blend,
        simple_adapter,
    )

    act = ACTIVATIONS[act_name]

    def stats_forward(images):
        x = clip_mod.patchify(visual, images.astype(compute_dtype),
                              vision_cfg.patch_size)
        b = x.shape[0]
        cls = jnp.broadcast_to(
            visual["class_embedding"].astype(compute_dtype),
            (b, 1, vision_cfg.width))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + visual["positional_embedding"].astype(compute_dtype)
        x = layer_norm(visual["ln_pre"], x)

        def body(adapted):
            def f(x, layer_params):
                block = layer_params[0] if adapted else layer_params
                h1 = layer_norm(block["ln_1"], x)
                s1 = jnp.max(jnp.abs(h1.astype(jnp.float32)), axis=(0, 1))
                x = x + attn_ops.mha(block["attn"], h1, vision_cfg.heads,
                                     use_pallas=use_pallas)
                h2 = layer_norm(block["ln_2"], x)
                s2 = jnp.max(jnp.abs(h2.astype(jnp.float32)), axis=(0, 1))
                x = x + mlp_block(block["mlp"], h2, act)
                if adapted:
                    x = norm_preserving_blend(
                        x, simple_adapter(layer_params[1], x), adapter_weight)
                return x, (s1, s2)
            return f

        s1s, s2s = [], []
        for start, stop in clip_mod._segments(vision_cfg.layers,
                                              [adapt_until]):
            seg = jax.tree.map(lambda p: p[start:stop], visual["blocks"])
            adapted = adapters is not None and start < adapt_until
            xs = ((seg, jax.tree.map(lambda p: p[start:stop], adapters))
                  if adapted else seg)
            x, (s1, s2) = jax.lax.scan(body(adapted), x, xs)
            s1s.append(s1)
            s2s.append(s2)
        return (jnp.concatenate(s1s, axis=0), jnp.concatenate(s2s, axis=0), x)

    s_qkv, s_cfc, _ = jax.jit(stats_forward)(jnp.asarray(images))
    return {"qkv": np.asarray(s_qkv), "c_fc": np.asarray(s_cfc)}


def activation_outlier_ratio(stats):
    """Per-site outlier diagnostic from calibration stats: max/median of the
    per-channel activation amax across all layers, for each quantized-matmul
    input site. This is the operational go/no-go number from the outlier
    study (docs/DESIGN.md "int8 outlier robustness"): ratios at or below
    the study's measured-harmless band mean plain int8 tiers are safe;
    far above it, re-run the study's factor sweep / prefer '+smooth' or
    int8_mlp before making int8 a serving default."""
    return {k: float(np.max(v) / max(float(np.median(v)), 1e-9))
            for k, v in stats.items()}


def smooth_backbone(frozen, stats, alpha: float = 0.5, scope: str = "all"):
    """SmoothQuant-style outlier migration for the LN-fed block matmuls.

    Real transformer activations develop a few channels 20-100x the rest
    (largely LN-gain amplified); per-TOKEN dynamic activation quantization
    (int8_linear) then sets its scale from the outlier and crushes every
    other channel's resolution. Because the backbone is frozen and both
    quantized-matmul inputs are LayerNorm outputs, the per-channel balancing
    factor s folds ENTIRELY into existing parameters at load time:

        ln.scale /= s, ln.bias /= s   (LN output channel j shrinks by s_j)
        w[j, :]  *= s_j               (the matmul result is unchanged)

    — exact identity in float (pinned by test), zero runtime cost, and no
    kernel changes (the fused int8 LN->MLP kernel just reads the folded
    params). s_j = amax_act_j^alpha / amax_w_row_j^(1-alpha), the SmoothQuant
    migration rule (Xiao et al., arXiv 2211.10438); alpha=0.5 default.

    Scope matches the quantization scope: "all" folds qkv + c_fc, "attn"
    only qkv, "mlp" only c_fc. Not covered (documented in docs/DESIGN.md):
    the out-proj input (attention output — folding through the v-v surgery
    blocks would change their attention weights) and the c_proj input (GELU
    is not scale-equivariant); both are measured benign in the outlier study
    (tools/int8_outlier_study.py).

    stats: calibrate_ln_amax output. Returns a new frozen pytree; apply
    BEFORE quantize_backbone_int8.
    """
    def fold(ln, lin, a_amax):
        w = np.asarray(lin["w"], np.float32)             # (L, d_in, d_out)
        w_amax = np.maximum(np.max(np.abs(w), axis=-1), 1e-6)
        a = np.maximum(np.asarray(a_amax, np.float32), 1e-6)
        s = np.clip(a ** alpha / w_amax ** (1.0 - alpha), 1e-4, 1e4)
        new_ln = {"scale": jnp.asarray(np.asarray(ln["scale"], np.float32) / s),
                  "bias": jnp.asarray(np.asarray(ln["bias"], np.float32) / s)}
        new_lin = dict(lin)
        new_lin["w"] = jnp.asarray(w * s[..., None])
        return new_ln, new_lin

    blocks = dict(frozen["visual"]["blocks"])
    if scope in ("all", "attn"):
        ln_1, qkv = fold(blocks["ln_1"], blocks["attn"]["qkv"], stats["qkv"])
        blocks["ln_1"] = ln_1
        blocks["attn"] = dict(blocks["attn"], qkv=qkv)
    if scope in ("all", "mlp"):
        ln_2, c_fc = fold(blocks["ln_2"], blocks["mlp"]["c_fc"],
                          stats["c_fc"])
        blocks["ln_2"] = ln_2
        blocks["mlp"] = dict(blocks["mlp"], c_fc=c_fc)
    visual = dict(frozen["visual"], blocks=blocks)
    return dict(frozen, visual=visual)


def quantize_backbone_tier(frozen, tier, smooth_stats=None,
                           smooth_alpha: float = 0.5):
    """Tier-string front-end shared by every CLI/env/serving entry point.

    tier: None / "" (no-op), "int8" (all block matmuls), "int8_attn"
    (qkv/out only; the MLP keeps the fused fp Pallas kernel) or "int8_mlp"
    (c_fc/c_proj only, through the fused int8 kernel; attention projections
    stay in the compute dtype). Any tier takes a "+smooth" suffix
    (e.g. "int8+smooth"): SmoothQuant outlier migration folded in before
    quantization — requires `smooth_stats` from :func:`calibrate_ln_amax`
    on a calibration batch. Anything else — e.g. a typo'd
    AACLIP_BENCH_QUANT=int8-attn — raises instead of silently running the
    fp tier under a quantized label.
    """
    if tier in (None, ""):
        return frozen
    base, _, suffix = tier.partition("+")
    scopes = {"int8": "all", "int8_attn": "attn", "int8_mlp": "mlp"}
    if base not in scopes or suffix not in ("", "smooth"):
        raise ValueError(
            f"unknown quantization tier {tier!r}; expected 'int8',"
            " 'int8_attn' or 'int8_mlp', optionally with a '+smooth'"
            " suffix")
    if suffix == "smooth":
        if smooth_stats is None:
            raise ValueError(
                f"tier {tier!r} needs calibration statistics: pass "
                "smooth_stats=calibrate_ln_amax(...) (a calibration batch "
                "of real images through the fp backbone)")
        frozen = smooth_backbone(frozen, smooth_stats, alpha=smooth_alpha,
                                 scope=scopes[base])
    return quantize_backbone_int8(frozen, scope=scopes[base])


def quantize_backbone_auto(frozen, tier, cfg=None, calib_images=None,
                           trainable=None, smooth_alpha: float = 0.5,
                           use_pallas: bool = False):
    """CLI-facing tier wrapper that resolves '+smooth' calibration.

    Plain tiers pass straight through to :func:`quantize_backbone_tier`.
    For '+smooth' tiers it runs :func:`calibrate_ln_amax` on
    ``calib_images`` (a (B, 3, H, W) batch of CLIP-normalized images — real
    data preferred), or on a seeded random batch when none are at hand.
    LN-gain-driven outlier channels — the dominant real-weight failure mode
    (docs/DESIGN.md outlier study) — are input-independent (the post-LN
    channel scale is ~|ln.scale_j| for any input), so random-batch
    calibration already captures them; residual-stream outliers need real
    images. ``cfg`` (ModelConfig) is required for '+smooth' tiers;
    ``trainable`` additionally threads the residual adapters into the
    calibration forward, mirroring the production tower.
    """
    if not (tier and tier.endswith("+smooth")):
        return quantize_backbone_tier(frozen, tier)
    if cfg is None:
        raise ValueError(
            f"tier {tier!r} needs the model config for calibration")
    v = cfg.clip.vision
    if calib_images is None:
        rng = np.random.default_rng(0)
        calib_images = rng.standard_normal(
            (4, 3, v.image_size, v.image_size)).astype(np.float32)
    kwargs = {}
    if trainable is not None:
        kwargs = dict(adapters=trainable["image_adapter"]["layer_adapters"],
                      adapter_weight=cfg.adapter.image_adapt_weight,
                      adapt_until=cfg.adapter.image_adapt_until)
    # use_pallas: route the calibration forward's attention through the
    # flash kernels — numerically equivalent for amax purposes, and the
    # XLA-attention flagship program's remote compile has been observed to
    # exceed the tunnel's connection lifetime (~30 min) where the Pallas
    # one compiles in minutes.
    stats = calibrate_ln_amax(frozen["visual"], v, calib_images,
                              act_name=cfg.clip.act, use_pallas=use_pallas,
                              **kwargs)
    return quantize_backbone_tier(frozen, tier, smooth_stats=stats,
                                  smooth_alpha=smooth_alpha)


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
