"""High-level serving API: one object from checkpoint to anomaly maps.

The reference has no serving surface (its only consumers are the train/eval
CLIs). For production use this wraps model assembly, checkpoint restore,
anchor caching, and the fused jitted predict program behind one class:

    from aa_clip_iqm_tpu.serving import AnomalyDetector

    det = AnomalyDetector.from_checkpoint("ckpt/baseline", dataset="MVTec")
    maps, scores = det.predict(images, class_name="bottle")   # numpy in/out
    maps, scores = det.predict_paths(["a.png", "b.png"], "bottle")

Anchors are computed once per dataset and cached in HBM; each distinct batch
shape compiles once. Works zero-shot (no checkpoint: raw CLIP anchors +
untrained adapters are allowed but quality needs a trained checkpoint).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from .configs import ModelConfig
from .data.datasets import _load_image, normalize_clip
from .data.registry import DOMAINS
from .evaluation.predict import make_predict_fn
from .loader import build_model_config, init_trainable, load_frozen_backbone
from .train import checkpoint as ckpt
from .train.driver import compute_frozen_anchors


class AnomalyDetector:
    """Batched anomaly-map inference for one dataset's class vocabulary."""

    def __init__(self, frozen, trainable, model_cfg: ModelConfig,
                 dataset: str, img_size: int = 518, adapted_text: bool = True,
                 compute_dtype=jnp.bfloat16, use_pallas: bool = True,
                 text_weight: float = 0.6, iqm_weight: float = 0.4):
        # use_pallas is safe on any backend: the attention wrapper falls back
        # to the XLA path off-TPU (ops/attention._packed_pallas_ok).
        self.frozen = frozen
        self.trainable = trainable
        self.cfg = model_cfg
        self.dataset = dataset
        self.img_size = img_size
        self.domain = DOMAINS.get(dataset, "Industrial")
        self._predict = make_predict_fn(
            model_cfg, img_size, self.domain, compute_dtype=compute_dtype,
            use_pallas=use_pallas, text_weight=text_weight,
            iqm_weight=iqm_weight)
        self.anchors: Dict[str, jnp.ndarray] = compute_frozen_anchors(
            frozen, trainable, model_cfg, dataset, adapted=adapted_text,
            compute_dtype=compute_dtype)

    # ------------------------------------------------------------------
    @classmethod
    def from_checkpoint(cls, save_path: Optional[str], dataset: str,
                        img_size: int = 518, backbone: Optional[str] = None,
                        allow_random_backbone: bool = False,
                        model_name: str = "ViT-L-14-336",
                        **kwargs) -> "AnomalyDetector":
        """Assemble from a training save_path (or None for zero-shot)."""
        cfg = build_model_config(model_name=model_name, img_size=img_size)
        frozen = load_frozen_backbone(cfg, backbone,
                                      allow_random=allow_random_backbone)
        trainable = init_trainable(cfg)
        adapted_text = False
        if save_path:
            restored_text = ckpt.load_stage1(save_path,
                                             trainable["text_adapter"])
            if restored_text is not None:
                trainable = dict(trainable)
                trainable["text_adapter"] = restored_text["params"]
                adapted_text = True
            restored = ckpt.load_stage2(save_path, trainable,
                                        latest_numbered=True)
            if restored is not None:
                trainable = restored["params"]
        return cls(frozen, trainable, cfg, dataset, img_size=img_size,
                   adapted_text=adapted_text, **kwargs)

    # ------------------------------------------------------------------
    def class_names(self) -> List[str]:
        return list(self.anchors.keys())

    def predict(self, images: np.ndarray,
                class_name: str) -> Tuple[np.ndarray, np.ndarray]:
        """images: (B, 3, H, W) float32, CLIP-normalized, H=W=img_size.
        Returns (anomaly maps (B, H, W) float32, image scores (B,))."""
        if class_name not in self.anchors:
            raise KeyError(
                f"unknown class {class_name!r}; available: {self.class_names()}")
        b = images.shape[0]
        anchor = self.anchors[class_name]
        anchors_b = jnp.broadcast_to(anchor[None], (b,) + anchor.shape)
        maps, scores = self._predict(self.frozen, self.trainable,
                                     jnp.asarray(images), anchors_b)
        return np.asarray(maps), np.asarray(scores)

    def predict_paths(self, paths: Sequence[str],
                      class_name: str) -> Tuple[np.ndarray, np.ndarray]:
        """Load, preprocess (bicubic + CLIP normalize) and predict.

        Ragged request sizes are padded to a small bucket so each bucket
        compiles once (ViT-L compiles are expensive); padding is sliced off.
        """
        from .evaluation.predict import _bucket

        n = len(paths)
        images = np.stack([
            normalize_clip(_load_image(p, self.img_size)) for p in paths
        ]).astype(np.float32)
        bucket = _bucket(n, multiple=8) if n > 1 else 1
        if bucket != n:
            images = np.concatenate(
                [images, np.zeros((bucket - n,) + images.shape[1:],
                                  np.float32)], axis=0)
        maps, scores = self.predict(images, class_name)
        return maps[:n], scores[:n]
