"""Functional CLIP towers (ViT vision + text transformer) for TPU.

Re-designs the reference's torch CLIP runtime (model/model.py,
model/transformer.py) as pure functions over explicit parameter pytrees:

  params = {
    "visual": {patch_embed, class_embedding, positional_embedding, ln_pre,
               blocks, ln_post, proj},
    "text":   {token_embedding, positional_embedding, blocks,
               ln_final, text_projection},
    "logit_scale": (),
  }
  blocks = {ln_1, attn: {qkv: {w,b}, out: {w,b}}, ln_2,
            mlp: {c_fc: {w,b}, c_proj: {w,b}}}
  with every leaf STACKED on a leading layer axis (see stack_blocks) so
  homogeneous layer ranges run under lax.scan.

TPU-first choices vs the reference:
  - conv1 patchify (model/transformer.py:359-365) is a reshape + one matmul
    (MXU) instead of a convolution; mathematically identical.
  - multi-depth taps (`out_layers`, model/transformer.py:295-317) are plain
    Python-level collection inside the unrolled block loop — static shapes,
    no dynamic control flow under jit.
  - CLIP-Surgery v-v attention + DAPM_replace (model/transformer.py:102-152,
    406-425) become a per-block dispatch flag (`vv_from`): blocks at index >=
    vv_from run value-value attention with the same weights. No module
    mutation, no weight copies.
  - LayerNorm computes in fp32; matmuls run in the caller-chosen compute
    dtype (bf16 on TPU) with fp32 accumulation.
"""
from __future__ import annotations

import math
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import CLIPConfig, TextConfig, VisionConfig
from ..ops import attention as attn_ops
from ..ops.layers import ACTIVATIONS, layer_norm, linear, mlp_block


# --------------------------------------------------------------------------
# Initialization
# --------------------------------------------------------------------------

def _init_linear(rng, d_in, d_out, std=None, bias=True):
    k1, _ = jax.random.split(rng)
    std = std if std is not None else (d_in ** -0.5)
    p = {"w": jax.random.normal(k1, (d_in, d_out), jnp.float32) * std}
    if bias:
        p["b"] = jnp.zeros((d_out,), jnp.float32)
    return p


def _init_ln(dim):
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def _init_block(rng, width, mlp_ratio=4.0):
    ks = jax.random.split(rng, 4)
    hidden = int(width * mlp_ratio)
    return {
        "ln_1": _init_ln(width),
        "attn": {
            "qkv": _init_linear(ks[0], width, 3 * width),
            "out": _init_linear(ks[1], width, width),
        },
        "ln_2": _init_ln(width),
        "mlp": {
            "c_fc": _init_linear(ks[2], width, hidden),
            "c_proj": _init_linear(ks[3], hidden, width),
        },
    }


def stack_blocks(blocks):
    """List of per-layer block pytrees -> one pytree with leaves stacked on
    axis 0 (layers-major). Enables lax.scan over layers: compile time is one
    block body instead of `layers` copies."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *blocks)


def block_slice(stacked, i: int):
    """Extract layer i's params from a stacked block pytree."""
    return jax.tree.map(lambda x: x[i], stacked)


def num_blocks(stacked) -> int:
    return jax.tree.leaves(stacked)[0].shape[0]


def init_vision_params(rng, cfg: VisionConfig):
    ks = jax.random.split(rng, cfg.layers + 4)
    scale = cfg.width ** -0.5
    patch_dim = 3 * cfg.patch_size * cfg.patch_size
    return {
        "patch_embed": {"w": jax.random.normal(ks[0], (patch_dim, cfg.width)) * scale},
        "class_embedding": jax.random.normal(ks[1], (cfg.width,)) * scale,
        "positional_embedding": (
            jax.random.normal(ks[2], (cfg.num_patches + 1, cfg.width)) * scale
        ),
        "ln_pre": _init_ln(cfg.width),
        "blocks": stack_blocks([
            _init_block(ks[4 + i], cfg.width, cfg.mlp_ratio) for i in range(cfg.layers)
        ]),
        "ln_post": _init_ln(cfg.width),
        "proj": jax.random.normal(ks[3], (cfg.width, cfg.output_dim)) * scale,
    }


def init_text_params(rng, cfg: TextConfig):
    ks = jax.random.split(rng, cfg.layers + 3)
    return {
        "token_embedding": jax.random.normal(ks[0], (cfg.vocab_size, cfg.width)) * 0.02,
        "positional_embedding": (
            jax.random.normal(ks[1], (cfg.context_length, cfg.width)) * 0.01
        ),
        "blocks": stack_blocks(
            [_init_block(ks[3 + i], cfg.width) for i in range(cfg.layers)]
        ),
        "ln_final": _init_ln(cfg.width),
        "text_projection": (
            jax.random.normal(ks[2], (cfg.width, cfg.output_dim)) * cfg.width ** -0.5
        ),
    }


def init_clip_params(rng, cfg: CLIPConfig):
    from ..configs import ResNetVisionConfig

    kv, kt = jax.random.split(rng)
    if isinstance(cfg.vision, ResNetVisionConfig):
        from .modified_resnet import init_resnet_params

        visual = init_resnet_params(kv, cfg.vision)
    else:
        visual = init_vision_params(kv, cfg.vision)
    return {
        "visual": visual,
        "text": init_text_params(kt, cfg.text),
        "logit_scale": jnp.asarray(math.log(1 / 0.07), jnp.float32),
    }


# --------------------------------------------------------------------------
# Forward passes
# --------------------------------------------------------------------------

# Pad the token axis once to the 128-lane tile for the whole tower instead
# of letting the attention kernels pad/slice per layer (see vision_forward).
# History: before the fused LN->MLP kernel this measured ~3% SLOWER (XLA
# fused the per-layer pads into the MLP chain for free); with the Pallas MLP
# those pads became standalone 0.42 ms/layer ops and the balance flipped:
# ON = 124.3 vs OFF = 114.3 img/s @518 int8_attn (+8.7%). Padding also makes
# the fused-MLP flatten a free bitcast (1408 % 8 == 0), killing its
# re-tiling reshapes. Off automatically wherever the packed kernels are
# (CPU fallback, masked attention, unsupported head layout).
PREPAD_TOKENS = True

# Route the whole attention residual branch (LN -> qkv -> attention ->
# out-proj -> residual) through the single fused Pallas kernel in
# ops/pallas_attn_block.py instead of the XLA LN/projections + flash-attention
# chain. Opt-in (env AACLIP_FUSED_ATTN=1): see docs/DESIGN.md for the
# on-chip A/B at the flagship shape.
FUSED_ATTN = os.environ.get("AACLIP_FUSED_ATTN", "0") == "1"

def patchify(params, images, patch_size: int):
    """(B, 3, H, W) -> (B, L, width) via reshape + matmul (== strided conv)."""
    b, c, h, w = images.shape
    gh, gw = h // patch_size, w // patch_size
    x = images.reshape(b, c, gh, patch_size, gw, patch_size)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, gh * gw, c * patch_size * patch_size)
    return linear(params["patch_embed"], x)


def _maybe_prepad(x, num_heads: int, use_pallas: bool, fused_mlp=True):
    """Tower-wide token pad to the 128-lane tile (PREPAD_TOKENS).

    Returns (possibly padded x, valid_len or None). valid_len is the real
    token count for the attention kernels' key mask; None means no padding
    was applied (already aligned, or a block would take the XLA fallback,
    which has no key mask). Tied to fused_mlp: without the Pallas MLP in
    the tower XLA fuses the per-layer pads for free and prepadding only
    adds FLOPs (XLA-MLP grad path measured 31.17 vs 32.03 img/s; with the
    frozen-mode kernel prepad wins again, 32.90 vs 32.70)."""
    from ..ops import pallas_mlp

    valid_len = None
    n_tokens = x.shape[1]
    # The bf16 check mirrors the fused-MLP kernels' own eligibility
    # (ln_mlp_residual[_int8]_ok all require bf16 x): under float32 compute
    # no fused MLP ever dispatches, and prepad-without-fused-MLP is the
    # measured-slower configuration this gate exists to avoid. INTERPRET
    # keeps the CPU interpreter tests (which drive the tower in f32) on the
    # prepadded path.
    if (PREPAD_TOKENS and use_pallas and fused_mlp and n_tokens % 128
            and (x.dtype == jnp.bfloat16 or pallas_mlp.INTERPRET)
            and attn_ops._packed_pallas_ok(x, num_heads, None)):
        valid_len = n_tokens
        x = jnp.pad(x, ((0, 0), (0, 128 - n_tokens % 128), (0, 0)))
    return x, valid_len


def _run_block(block, x, num_heads, act, attn_mask=None, vv=False,
               use_pallas=False, valid_len=None, fused_mlp=True):
    """Pre-norm residual attention block (model/transformer.py:239-258).

    When ``vv`` is set the attention is the CLIP-Surgery value-value variant
    and the original-path output is not computed at all (the reference computes
    and discards it, model/transformer.py:148-152).
    """
    from ..ops import pallas_attn_block, pallas_mlp

    if (use_pallas and FUSED_ATTN and attn_mask is None
            and pallas_attn_block.ln_attn_residual_ok(
                x, block["attn"], num_heads)):
        # Fully-fused attention branch: LN, qkv, softmax-attention, out-proj
        # and residual in one VMEM-resident kernel (ops/pallas_attn_block.py).
        # Opt-in via FUSED_ATTN / AACLIP_FUSED_ATTN=1 (see docs/DESIGN.md
        # for the on-chip A/B vs the flash chain).
        x = pallas_attn_block.ln_attn_residual(
            block["ln_1"], block["attn"], x, num_heads, vv, valid_len)
    else:
        h = layer_norm(block["ln_1"], x)
        if vv:
            a = attn_ops.vv_attention(block["attn"], h, num_heads,
                                      use_pallas=use_pallas,
                                      valid_len=valid_len)
        else:
            a = attn_ops.mha(block["attn"], h, num_heads,
                             attn_mask=attn_mask, use_pallas=use_pallas,
                             valid_len=valid_len)
        x = x + a

    if (use_pallas and fused_mlp
            and pallas_mlp.ln_mlp_residual_ok(x, block["mlp"], act)):
        # Fused LN -> MLP -> residual kernel: hidden activations never touch
        # HBM, GELU overlaps the matmuls (see ops/pallas_mlp.py; ~21% faster
        # than the XLA chain at the flagship shape). fused_mlp == "frozen"
        # additionally uses the Pallas dx-only backward (valid ONLY when the
        # block params carry no gradient — the stage-2 frozen backbone).
        fn = (pallas_mlp.ln_mlp_residual_frozen if fused_mlp == "frozen"
              else pallas_mlp.ln_mlp_residual)
        x = fn(block["ln_2"], block["mlp"], x, act)
    elif (use_pallas and fused_mlp
          and pallas_mlp.ln_mlp_residual_int8_ok(x, block["mlp"], act)):
        # int8 tier (ops/quant.py scope="all"): the fused kernel keeps the
        # int8 weights VMEM-resident and runs the contractions at the MXU's
        # double int8 rate, stacking the quantization and fusion wins that
        # were mutually exclusive before (the XLA int8_linear fallback below
        # round-trips the hidden tensor through HBM).
        x = pallas_mlp.ln_mlp_residual_int8(block["ln_2"], block["mlp"], x,
                                            act)
    else:
        x = x + mlp_block(block["mlp"], layer_norm(block["ln_2"], x), act)
    return x


def run_block_range(stacked, x, start: int, stop: int, num_heads: int, act,
                    attn_mask=None, vv: bool = False, adapters=None,
                    adapter_weight: float = 0.0, use_pallas: bool = False,
                    remat: bool = False, valid_len=None,
                    fused_mlp=True):
    """lax.scan blocks [start, stop) of a stacked-parameter tower.

    Compile-time design: all homogeneous layer ranges run as one scanned block
    body (the program contains each block's HLO once), instead of the
    reference's per-layer module loop unrolled 24x into the graph.

    adapters: stacked residual-adapter params covering exactly [start, stop)
    (SimpleAdapter + norm-preserving blend after each block,
    model/adapter.py:163-170); None for plain ranges.
    """
    if stop <= start:
        return x
    from ..ops.layers import norm_preserving_blend, simple_adapter

    seg = jax.tree.map(lambda p: p[start:stop], stacked)

    def body(carry, layer_params):
        if adapters is None:
            block = layer_params
        else:
            block, adapter = layer_params
        y = _run_block(block, carry, num_heads, act, attn_mask=attn_mask,
                       vv=vv, use_pallas=use_pallas, valid_len=valid_len,
                       fused_mlp=fused_mlp)
        if adapters is not None:
            y = norm_preserving_blend(y, simple_adapter(adapter, y),
                                      adapter_weight)
        return y, None

    if remat:
        body = jax.checkpoint(body)
    xs = seg if adapters is None else (seg, adapters)
    x, _ = jax.lax.scan(body, x, xs)
    return x


def _segments(n_layers: int, events) -> list:
    """Sorted consecutive (start, stop) ranges split at the given events."""
    bounds = sorted({0, n_layers, *[e for e in events if 0 <= e <= n_layers]})
    return list(zip(bounds[:-1], bounds[1:]))


def vision_forward(
    params,
    cfg: VisionConfig,
    images,
    out_layers: Sequence[int] = (),
    act_name: str = "gelu",
    vv_from: Optional[int] = None,
    adapters=None,
    adapter_weight: float = 0.0,
    adapt_until: int = 0,
    compute_dtype=jnp.float32,
    use_pallas: bool = False,
    remat: bool = False,
    keep_idx=None,
    fused_mlp=True,
):
    """ViT forward with multi-depth taps, scanned in homogeneous segments.

    Args:
      out_layers: 1-based layer indices whose full token outputs (incl. CLS)
        are collected, parity with Transformer.forward(out_layers)
        (model/transformer.py:295-317).
      vv_from: 0-based block index from which attention is value-value
        (surgery). DAPM_replace(DPAM_layer=k) == vv_from = layers - (k - 1).
      adapters: stacked SimpleAdapter params (adapt_until, width, width)
        applied after blocks [0, adapt_until) with the norm-preserving blend.
      keep_idx: optional (B, K) int32 patch-dropout kept-token indices
        (ops.layers.patch_dropout_indices); applied after the positional
        embedding, before ln_pre — the reference PatchDropout call site
        (model/transformer.py:62-99, applied in VisionTransformer.forward).
        CLS is always kept; taps then carry K+1 tokens.

    Returns: (pooled (B, output_dim), taps list of (B, L+1, width), final x).
    """
    x = patchify(params, images.astype(compute_dtype), cfg.patch_size)
    b = x.shape[0]
    cls = params["class_embedding"].astype(compute_dtype)
    cls = jnp.broadcast_to(cls, (b, 1, cfg.width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["positional_embedding"].astype(compute_dtype)
    if keep_idx is not None:
        kept = jnp.take_along_axis(x[:, 1:], keep_idx[..., None], axis=1)
        x = jnp.concatenate([x[:, :1], kept], axis=1)
    x = layer_norm(params["ln_pre"], x)

    # Tower-wide token padding (PREPAD_TOKENS, see the flag comment): pad
    # once to the 128-lane tile instead of letting the attention kernel
    # pad/slice per layer; the kernel masks keys >= valid_len. Trades ~2.8%
    # extra matmul FLOPs (1408 vs 1370 rows everywhere) for the per-layer
    # pad/slice copies — a net +8.7% with the Pallas MLP kernel in the
    # tower. Only safe when every block takes the packed-kernel path (the
    # XLA fallback has no key mask).
    x, valid_len = _maybe_prepad(x, cfg.heads, use_pallas, fused_mlp)

    act = ACTIVATIONS[act_name]
    events = [adapt_until, *out_layers]
    if vv_from is not None:
        events.append(vv_from)
    taps = []
    for start, stop in _segments(cfg.layers, events):
        seg_adapters = None
        if start < adapt_until:
            seg_adapters = jax.tree.map(lambda p: p[start:stop], adapters)
        x = run_block_range(
            params["blocks"], x, start, stop, cfg.heads, act,
            vv=vv_from is not None and start >= vv_from,
            adapters=seg_adapters, adapter_weight=adapter_weight,
            use_pallas=use_pallas, remat=remat, valid_len=valid_len,
            fused_mlp=fused_mlp,
        )
        if stop in out_layers:
            taps.append(x if valid_len is None else x[:, :valid_len])

    if valid_len is not None:
        x = x[:, :valid_len]
    pooled = layer_norm(params["ln_post"], x[:, 0])
    pooled = jnp.dot(pooled, params["proj"].astype(pooled.dtype),
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return pooled, taps, x


def text_forward(
    params,
    cfg: TextConfig,
    tokens,
    act_name: str = "gelu",
    adapters=None,
    adapter_weight: float = 0.0,
    adapt_until: int = 0,
    final_proj="clip",
    compute_dtype=jnp.float32,
):
    """Text transformer, parity with CLIP.encode_text (model/model.py:190-201).

    Args:
      tokens: (B, ctx) int32 token ids (0-padded, EOT = max id in row).
      adapters: stacked SimpleAdapter params (adapt_until, width, width)
        applied after blocks [0, adapt_until) with the norm-preserving blend
        (model/adapter.py:284-295).
      final_proj: "clip" -> pooled @ text_projection;
                  callable -> applied to pooled ln_final output instead
                  (AdaptedCLIP replaces the projection with a trained
                  SimpleProj, model/adapter.py:299).

    Returns pooled (B, output_dim or proj output dim).
    """
    x = params["token_embedding"][tokens].astype(compute_dtype)
    x = x + params["positional_embedding"].astype(compute_dtype)
    mask = attn_ops.causal_mask(cfg.context_length)
    act = ACTIVATIONS[act_name]
    for start, stop in _segments(cfg.layers, [adapt_until]):
        seg_adapters = None
        if start < adapt_until:
            seg_adapters = jax.tree.map(lambda p: p[start:stop], adapters)
        x = run_block_range(params["blocks"], x, start, stop, cfg.heads, act,
                            attn_mask=mask, adapters=seg_adapters,
                            adapter_weight=adapter_weight)
    x = layer_norm(params["ln_final"], x)
    eot = jnp.argmax(tokens, axis=-1)
    pooled = x[jnp.arange(x.shape[0]), eot]
    if final_proj == "clip":
        return jnp.dot(pooled, params["text_projection"].astype(pooled.dtype),
                       preferred_element_type=jnp.float32).astype(x.dtype)
    return final_proj(pooled)


def encode_image(params, cfg: CLIPConfig, images, compute_dtype=jnp.float32,
                 use_pallas: bool = False):
    """CLIP.encode_image (model/model.py:185-188): pooled image embedding
    from either tower — ViT, or ModifiedResNet when cfg.vision is a
    ResNetVisionConfig (the reference's build dispatch, model/model.py:72-117,
    model/clip.py:129-130)."""
    from ..configs import ResNetVisionConfig

    if isinstance(cfg.vision, ResNetVisionConfig):
        from .modified_resnet import resnet_forward

        pooled, _ = resnet_forward(params["visual"], cfg.vision, images,
                                   compute_dtype=compute_dtype)
        return pooled
    pooled, _, _ = vision_forward(params["visual"], cfg.vision, images,
                                  act_name=cfg.act,
                                  compute_dtype=compute_dtype,
                                  use_pallas=use_pallas)
    return pooled


def dual_vision_features(
    params,
    cfg: VisionConfig,
    images,
    out_layers: Sequence[int],
    vv_from: int,
    act_name: str = "gelu",
    compute_dtype=jnp.float32,
    use_pallas: bool = False,
):
    """Stage-1 visual features: surgery taps + plain CLS, shared prefix.

    The reference runs two *complete* CLIP copies per stage-1 batch — a
    DAPM-surgeried one for patch taps and a plain one for the CLS token
    (train.py:75-76). Both share identical weights and identical computation
    up to the first surgeried block, so we fork a single forward at
    ``vv_from`` instead: blocks [0, vv_from) run once, then the v-v branch
    and the plain branch continue separately. Saves ~`vv_from/layers` of the
    stage-1 visual FLOPs with bit-identical results.

    Returns (cls_pooled (B, output_dim), surgery_taps [(B, L+1, width)]).
    """
    x = patchify(params, images.astype(compute_dtype), cfg.patch_size)
    b = x.shape[0]
    cls = jnp.broadcast_to(params["class_embedding"].astype(compute_dtype),
                           (b, 1, cfg.width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["positional_embedding"].astype(compute_dtype)
    x = layer_norm(params["ln_pre"], x)
    x, valid_len = _maybe_prepad(x, cfg.heads, use_pallas)

    act = ACTIVATIONS[act_name]
    n_layers = cfg.layers
    taps = []
    # Shared prefix [0, vv_from): taps here are identical in both branches
    # (a layer-k output taken before any surgeried block), so collect them
    # while running the prefix once.
    for start, stop in _segments(vv_from, list(out_layers)):
        x = run_block_range(params["blocks"], x, start, stop, cfg.heads, act,
                            use_pallas=use_pallas, valid_len=valid_len)
        if stop in out_layers:
            taps.append(x if valid_len is None else x[:, :valid_len])

    xs = x
    for start, stop in _segments(n_layers, [vv_from, *out_layers]):
        if stop <= vv_from:
            continue
        xs = run_block_range(params["blocks"], xs, start, stop, cfg.heads,
                             act, vv=True, use_pallas=use_pallas,
                             valid_len=valid_len)
        if stop in out_layers:
            taps.append(xs if valid_len is None else xs[:, :valid_len])

    xp = run_block_range(params["blocks"], x, vv_from, n_layers, cfg.heads,
                         act, use_pallas=use_pallas, valid_len=valid_len)
    pooled = layer_norm(params["ln_post"], xp[:, 0])
    pooled = jnp.dot(pooled, params["proj"].astype(pooled.dtype),
                     preferred_element_type=jnp.float32).astype(xp.dtype)
    return pooled, taps


def surgery_vv_from(num_layers: int, dpam_layer: int) -> int:
    """0-based first v-v block index for DAPM_replace(dpam_layer)
    (model/transformer.py:406-425 replaces the last dpam_layer-1 blocks)."""
    return num_layers - (dpam_layer - 1)


# --------------------------------------------------------------------------
# Positional-embedding resize (load-time, host-side numpy)
# --------------------------------------------------------------------------

def resize_pos_embed_np(pos_embed: np.ndarray, new_grid: int) -> np.ndarray:
    """Bicubic-resize the (L+1, width) positional embedding to a new grid,
    parity with resize_pos_embed (model/model.py:396-427): bicubic,
    antialias=True, align_corners=False; CLS row passes through."""
    from ..ops.interp import resize_grid_bicubic

    tok, img = pos_embed[:1], pos_embed[1:]
    old_grid = int(round(math.sqrt(img.shape[0])))
    if old_grid * old_grid != img.shape[0]:
        raise ValueError(f"pos embed length {img.shape[0]} not square")
    if old_grid == new_grid:
        return pos_embed
    grid = img.reshape(old_grid, old_grid, -1)
    resized = resize_grid_bicubic(grid, (new_grid, new_grid), antialias=True)
    return np.concatenate([tok, resized.reshape(new_grid * new_grid, -1)], axis=0)
