"""AdaptedCLIP — the central trainable model, functional JAX.

Rebuilds reference model/adapter.py:10-304 with frozen CLIP params and
trainable adapter params as *separate pytrees*:

    apply(frozen, trainable, images, text_anchors) -> AdaptedOutputs

Trainable pytree layout:
  {
    "image_adapter": {"layer_adapters": stacked {w}, "seg_proj": [..],
                      "det_proj": {..}},
    "text_adapter":  {"layers": stacked {w}, "proj": {..}},
    "iqm": {...},                       # models/iqm.py
    "class_query_mlp": {"fc1", "fc2"},
    "query_adapters": [..],
    "pos_embedding": (1, 2, hidden),    # only the 2 query slots are ever used
    "visual_feature_proj": {w, b},      # FIXED vs reference Q2: trained+saved
    "text_feature_proj": {w, b},        #   (lazily created / untrained in ref)
    "query_proj": {w, b},               #   hidden->768, replaces the per-batch
                                        #   random nn.Linear (train.py:176-179,
                                        #   test_last.py:111-118)
    "iqm_layer_norm": {scale, bias},
  }
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Optional

import jax
import jax.numpy as jnp

from ..configs import ModelConfig
from ..ops.layers import (
    l2_normalize,
    layer_norm,
    leaky_relu,
    linear,
    simple_proj,
    xavier_linear,
)
from . import clip as clip_model
from . import iqm as iqm_model


def init_adapter_params(rng, cfg: ModelConfig):
    """Initialize the full trainable pytree (xavier-uniform weights, matching
    AdaptedCLIP._init_weights_, model/adapter.py:107-123)."""
    from ..configs import ResNetVisionConfig

    if isinstance(cfg.clip.vision, ResNetVisionConfig):
        # Same scope as the reference: AdaptedCLIP taps ViT resblocks
        # (model/adapter.py:161-172); RN backbones are encode-only.
        raise ValueError(
            "AdaptedCLIP requires a ViT vision tower; ModifiedResNet "
            "configs support encode_image/encode_text only")
    a = cfg.adapter
    v_width = cfg.clip.vision.width
    t_width = cfg.clip.text.width
    out_dim = cfg.clip.embed_dim
    hidden = cfg.iqm.hidden_size
    n_levels = len(a.levels)

    keys = iter(jax.random.split(rng, 64))

    params = {
        "image_adapter": {
            # Stacked (adapt_until, width, width) for lax.scan consumption.
            "layer_adapters": clip_model.stack_blocks([
                xavier_linear(next(keys), v_width, v_width, bias=False)
                for _ in range(a.image_adapt_until)
            ]),
            "seg_proj": [
                xavier_linear(next(keys), v_width, out_dim, bias=False)
                for _ in range(n_levels)
            ],
            "det_proj": xavier_linear(next(keys), v_width, out_dim, bias=False),
        },
        "text_adapter": {
            "layers": clip_model.stack_blocks([
                xavier_linear(next(keys), t_width, t_width, bias=False)
                for _ in range(a.text_adapt_until)
            ]),
            "proj": xavier_linear(next(keys), t_width, t_width, bias=False),
        },
        "iqm": iqm_model.init_iqm_params(next(keys), cfg.iqm),
        "class_query_mlp": {
            "fc1": xavier_linear(next(keys), v_width, hidden),
            "fc2": xavier_linear(next(keys), hidden, hidden),
        },
        "query_adapters": [
            xavier_linear(next(keys), v_width, hidden, bias=False)
            for _ in range(n_levels)
        ],
        "pos_embedding": iqm_model.sinusoidal_positions(2, hidden),
        "visual_feature_proj": xavier_linear(next(keys), hidden, hidden),
        "text_feature_proj": xavier_linear(
            next(keys), cfg.iqm.text_encoder_hidden_size,
            cfg.iqm.text_encoder_hidden_size,
        ),
        "query_proj": xavier_linear(next(keys), hidden, out_dim),
        "iqm_layer_norm": {"scale": jnp.ones((hidden,)), "bias": jnp.zeros((hidden,))},
    }
    return params


@dataclass
class AdaptedOutputs:
    seg_tokens: List[Any]        # per level: (B, L, embed_dim), L2-normalized
    det_token: Any               # (B, embed_dim), L2-normalized + mean-pooled
    iqm_queries: Optional[Any]   # (B, 2, iqm_hidden) or None
    cls_raw: Any                 # (B, width) final-block CLS (pre ln_post)
    keep_idx: Optional[Any] = None  # (B, K) patch-dropout kept indices


def encode_image_adapted(frozen, trainable, cfg: ModelConfig, images,
                         text_anchors=None, compute_dtype=jnp.float32,
                         use_pallas: bool = False,
                         remat: bool = False,
                         patch_drop_rng=None,
                         fused_mlp=True) -> AdaptedOutputs:
    """AdaptedCLIP.forward (model/adapter.py:137-271), functional.

    text_anchors: (B, embed_dim, 2) per-sample anchors, or None to skip IQM.
    patch_drop_rng: PRNG key enabling patch dropout at the configured rate
        (cfg.clip.vision.patch_dropout) — the explicit training switch for
        the reference's never-active PatchDropout (model/model.py:29, survey
        Q5). None (eval / default) keeps every token; when active, seg_tokens
        carry K < L tokens and keep_idx maps them back to grid cells.
    """
    a = cfg.adapter
    vis = frozen["visual"]
    ia = trainable["image_adapter"]

    keep_idx = None
    rate = cfg.clip.vision.patch_dropout
    if patch_drop_rng is not None and rate > 0.0:
        from ..ops.layers import patch_dropout_indices

        keep_idx = patch_dropout_indices(
            patch_drop_rng, images.shape[0], cfg.clip.vision.num_patches, rate)

    _, taps, x_final = clip_model.vision_forward(
        vis, cfg.clip.vision, images, out_layers=tuple(a.levels),
        act_name=cfg.clip.act, adapters=ia["layer_adapters"],
        adapter_weight=a.image_adapt_weight, adapt_until=a.image_adapt_until,
        compute_dtype=compute_dtype, use_pallas=use_pallas, remat=remat,
        keep_idx=keep_idx, fused_mlp=fused_mlp,
    )

    # Patch tokens (CLS dropped) -> frozen ln_post (model/adapter.py:172-176).
    tokens = [layer_norm(vis["ln_post"], t[:, 1:, :]) for t in taps]

    seg_tokens = [
        l2_normalize(simple_proj(ia["seg_proj"][i], t, a.relu))
        for i, t in enumerate(tokens)
    ]
    det = simple_proj(ia["det_proj"], tokens[-1], a.relu)
    det_token = jnp.mean(l2_normalize(det), axis=1)

    iqm_queries = None
    if text_anchors is not None:
        iqm_queries = _iqm_branch(trainable, cfg, tokens, x_final, text_anchors)

    return AdaptedOutputs(seg_tokens=seg_tokens, det_token=det_token,
                          iqm_queries=iqm_queries, cls_raw=x_final[:, 0],
                          keep_idx=keep_idx)


def _iqm_branch(trainable, cfg: ModelConfig, tokens, x_final, text_anchors):
    """IQM query pipeline (model/adapter.py:187-269) with fixed projections."""
    mlp = trainable["class_query_mlp"]
    cls_feature = x_final[:, 0]                                # (B, width)
    q = linear(mlp["fc2"], jax.nn.relu(linear(mlp["fc1"], cls_feature)))
    class_query = jnp.repeat(q[:, None, :], 2, axis=1)          # (B, 2, hidden)
    query_embeds = class_query + trainable["pos_embedding"][:, :2, :].astype(q.dtype)

    projected = [
        simple_proj(trainable["query_adapters"][i], t, cfg.adapter.relu)
        for i, t in enumerate(tokens)
    ]
    visual = jnp.concatenate(projected, axis=1)                 # (B, 4L, hidden)
    visual = linear(trainable["visual_feature_proj"], visual)

    # (B, embed_dim, 2) -> (B, 2, embed_dim): two text tokens (normal /
    # abnormal anchors) of embed_dim features, through a TRAINED projection.
    # DELIBERATE deviation from the executed reference (survey Q2/Q10): its
    # dim-3 branch never transposes (model/adapter.py:229-235 keeps
    # (B, 768, 2)), so its lazily-created text_feature_proj becomes an
    # UNTRAINED nn.Linear(2, 768) (:242-243) and the IQM cross-attends over
    # 768 "tokens" of randomly-projected 2-dim pairs — noise, like the rest
    # of its eval-time IQM branch (Q1). We feed the anchors as the two
    # semantic tokens the architecture describes.
    text = jnp.swapaxes(text_anchors, -1, -2)
    text = linear(trainable["text_feature_proj"], text.astype(visual.dtype))

    out = iqm_model.iqm_forward(trainable["iqm"], cfg.iqm, query_embeds,
                                visual, text)
    # Adapter-level regularization LN: torch-default eps 1e-5
    # (model/adapter.py:94), NOT the BERT 1e-12 used inside IQM.
    out = layer_norm(trainable["iqm_layer_norm"], out, eps=1e-5)
    return out


def project_queries(trainable, queries):
    """Project IQM queries (B, 2, hidden) into patch-feature space
    (B, 2, embed_dim) with the *trained* projection — the fix for the
    reference's per-batch random nn.Linear (survey Q2)."""
    return linear(trainable["query_proj"], queries)


def encode_text_adapted(frozen, trainable, cfg: ModelConfig, tokens,
                        compute_dtype=jnp.float32):
    """AdaptedCLIP.encode_text (model/adapter.py:273-304): adapters with
    norm-preserving blend on the first text_adapt_until layers; the final
    SimpleProj(relu=True) replaces CLIP's text_projection."""
    a = cfg.adapter
    ta = trainable["text_adapter"]

    def final_proj(pooled):
        return leaky_relu(linear(ta["proj"], pooled))

    return clip_model.text_forward(
        frozen["text"], cfg.clip.text, tokens, act_name=cfg.clip.act,
        adapters=ta["layers"], adapter_weight=a.text_adapt_weight,
        adapt_until=a.text_adapt_until, final_proj=final_proj,
        compute_dtype=compute_dtype,
    )


def encode_text_frozen(frozen, cfg: ModelConfig, tokens, compute_dtype=jnp.float32):
    """Raw CLIP text encoding (model/model.py:190-201)."""
    return clip_model.text_forward(
        frozen["text"], cfg.clip.text, tokens, act_name=cfg.clip.act,
        compute_dtype=compute_dtype,
    )
