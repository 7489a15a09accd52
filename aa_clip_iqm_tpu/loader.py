"""Model assembly: config + backbone weights + adapter init in one call.

Replaces the reference's create_model / AdaptedCLIP construction sequence
(train.py:304-332, test_last.py:210-229). Backbone weights come from an
OpenAI .pt checkpoint (converted via torch-CPU) or a cached .npz; with
``allow_random`` a randomly-initialized backbone is used instead (smoke tests,
benchmarks without weights).
"""
from __future__ import annotations

import os
from typing import Optional

import jax

from .configs import (
    AdapterConfig,
    IQMConfig,
    ModelConfig,
    get_model_config,
)
from .models import adapters as adapters_mod
from .models import clip as clip_mod
from .models.convert import (
    find_backbone,
    load_openai_checkpoint,
    load_params_npz,
    save_params_npz,
)


def build_model_config(model_name: str = "ViT-L-14-336", img_size: int = 518,
                       relu: bool = False, text_adapt_weight: float = 0.1,
                       image_adapt_weight: float = 0.1,
                       text_adapt_until: int = 3, image_adapt_until: int = 6,
                       levels=(6, 12, 18, 24), iqm_hidden_size: int = 512,
                       iqm_num_layers: int = 2, iqm_num_heads: int = 8,
                       surgery_until_layer: int = 20,
                       patch_dropout: float = 0.0) -> ModelConfig:
    if model_name == "tiny-test":
        # Miniature architecture for CLI dry-runs (tools/parity_run.py CI
        # path, fast drives): ignores the adapter/IQM size knobs and uses
        # the same tiny dims the unit tests exercise.
        from .configs import tiny_test_config

        return tiny_test_config(img_size)
    clip_cfg = get_model_config(model_name, img_size=img_size)
    from .configs import ResNetVisionConfig

    if isinstance(clip_cfg.vision, ResNetVisionConfig):
        # ModifiedResNet backbone (model/clip.py:129-130): backbone-only —
        # the AA-CLIP adaptation layer taps ViT blocks (model/adapter.py),
        # so RN configs serve encode_image/encode_text, not AdaptedCLIP.
        red = clip_cfg.vision.reduction
        if img_size % red:
            raise ValueError(
                f"img_size {img_size} must be a multiple of the ResNet "
                f"reduction {red} (e.g. {img_size // red * red})")
        return ModelConfig(clip=clip_cfg)
    if patch_dropout:
        import dataclasses

        clip_cfg = dataclasses.replace(
            clip_cfg, vision=dataclasses.replace(
                clip_cfg.vision, patch_dropout=patch_dropout))
    patch = clip_cfg.vision.patch_size
    if img_size % patch:
        raise ValueError(
            f"img_size {img_size} must be a multiple of the patch size "
            f"{patch} (e.g. {img_size // patch * patch} or "
            f"{(img_size // patch + 1) * patch})")
    return ModelConfig(
        clip=clip_cfg,
        adapter=AdapterConfig(
            text_adapt_weight=text_adapt_weight,
            image_adapt_weight=image_adapt_weight,
            text_adapt_until=text_adapt_until,
            image_adapt_until=image_adapt_until,
            levels=tuple(levels),
            relu=relu,
        ),
        iqm=IQMConfig(
            hidden_size=iqm_hidden_size,
            num_hidden_layers=iqm_num_layers,
            num_attention_heads=iqm_num_heads,
            encoder_hidden_size=iqm_hidden_size,
        ),
        surgery_until_layer=surgery_until_layer,
    )


def load_frozen_backbone(cfg: ModelConfig, backbone_path: Optional[str] = None,
                         allow_random: bool = False, seed: int = 0,
                         cache_npz: bool = True):
    """Load (or randomly init) the frozen CLIP params for cfg.clip."""
    path = backbone_path or find_backbone()
    if path is None:
        if not allow_random:
            raise FileNotFoundError(
                "No CLIP backbone checkpoint found. Provide --backbone "
                "pointing to the OpenAI ViT-L-14-336px.pt (or a converted "
                ".npz), or pass allow_random for an untrained backbone."
            )
        return clip_mod.init_clip_params(jax.random.PRNGKey(seed), cfg.clip)
    if path.endswith(".npz"):
        params = load_params_npz(path)
        # npz caches store the native-resolution pos embed; resize if needed
        # (ViT: visual.positional_embedding; RN: attnpool.positional_embedding).
        import numpy as np

        vis = params["visual"]
        holder, key = ((vis, "positional_embedding")
                       if "positional_embedding" in vis
                       else (vis["attnpool"], "positional_embedding"))
        pos = np.asarray(holder[key])
        want = cfg.clip.vision.grid ** 2 + 1
        if pos.shape[0] != want:
            holder[key] = jax.numpy.asarray(
                clip_mod.resize_pos_embed_np(pos, cfg.clip.vision.grid))
        return params
    # Per-resolution cache next to the .pt: the pos embed inside is already
    # resized, and loading it skips the torch conversion entirely. Only a
    # cache at least as new as the .pt is trusted (replacing the checkpoint
    # invalidates it), and cache_npz=False disables both read and write.
    cache = (os.path.splitext(path)[0]
             + f".{cfg.clip.vision.image_size}.npz")
    if (cache_npz and os.path.isfile(cache)
            and os.path.getmtime(cache) >= os.path.getmtime(path)):
        return load_params_npz(cache)
    params = load_openai_checkpoint(path, cfg.clip)
    if cache_npz:
        try:
            save_params_npz(params, cache)
        except OSError:
            pass
    return params


def init_trainable(cfg: ModelConfig, seed: int = 111):
    return adapters_mod.init_adapter_params(jax.random.PRNGKey(seed), cfg)
