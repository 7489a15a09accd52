"""Inference pipeline: fused anomaly-map prediction + per-class evaluation.

The whole scoring path — adapted ViT forward, seg projections, anchor
similarity, IQM query maps, blur/upsample (as matmuls), fusion, image logit —
is one jitted XLA program (`make_predict_fn`). Parity target:
test_last.py:53-158 (get_predictions) + the per-class driver loop
(test_last.py:273-327).
"""
from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import EvalConfig, ModelConfig
from ..data.registry import DOMAINS
from ..models import adapters as adapters_mod
from ..ops.metrics import metrics_eval
from . import scoring


def make_predict_fn(cfg: ModelConfig, img_size: int, domain: str,
                    use_iqm: bool = True, compute_dtype=jnp.float32,
                    use_pallas: bool = False, text_weight: float = 0.6,
                    iqm_weight: float = 0.4, mesh=None):
    """Build predict(frozen, trainable, images, anchors) ->
    (final_map (B,H,W) fp32, image_logit (B,)).

    anchors: (B, embed_dim, 2). When `mesh` is given the batch axis is
    annotated to shard over its 'data' axis and params are replicated, so the
    same program runs single-chip or data-parallel over ICI.
    """

    def predict(frozen, trainable, images, anchors):
        out = adapters_mod.encode_image_adapted(
            frozen, trainable, cfg, images,
            text_anchors=anchors if use_iqm else None,
            compute_dtype=compute_dtype, use_pallas=use_pallas,
        )
        img_logit = scoring.image_logit(out.det_token, anchors)
        text_maps = [
            scoring.similarity_map_test(s, anchors, img_size, domain)
            for s in out.seg_tokens
        ]
        iqm_maps = []
        if use_iqm:
            q = adapters_mod.project_queries(trainable, out.iqm_queries)
            iqm_maps = [
                scoring.iqm_score_map(s, q, img_size) for s in out.seg_tokens
            ]
        final = scoring.fuse_maps(text_maps, iqm_maps,
                                  text_weight=text_weight,
                                  iqm_weight=iqm_weight)
        return final.astype(jnp.float32), img_logit.astype(jnp.float32)

    if mesh is not None:
        from ..parallel.mesh import batch_sharding, replicated

        data_spec = batch_sharding(mesh)
        return jax.jit(
            predict,
            in_shardings=(replicated(mesh), replicated(mesh), data_spec,
                          data_spec),
            out_shardings=(data_spec, data_spec),
        )
    return jax.jit(predict)


def predict_class(predict_fn, frozen, trainable, dataset, class_anchor,
                  batch_size: int):
    """Run a per-class test dataset through the jitted predict fn.

    Pads tail batches to the fixed batch size (static shapes — one
    compilation) and strips padding on the host. Returns dict of numpy arrays.
    """
    masks, labels, maps, image_scores, file_names = [], [], [], [], []
    anchor_b = jnp.broadcast_to(class_anchor[None], (batch_size,) + class_anchor.shape)
    for batch in dataset.batches(batch_size, pad_to_batch=True):
        n = batch["n_valid"]
        final_map, img_logit = predict_fn(
            frozen, trainable, jnp.asarray(batch["image"]), anchor_b)
        maps.append(np.asarray(final_map)[:n])
        image_scores.append(np.asarray(img_logit)[:n])
        masks.append(batch["mask"][:n])
        labels.append(batch["label"][:n])
        file_names.extend(batch["file_name"][:n])
    return {
        "masks": np.concatenate(masks, axis=0),
        "labels": np.concatenate(labels, axis=0),
        "maps": np.concatenate(maps, axis=0),
        "image_scores": np.concatenate(image_scores, axis=0),
        "file_names": file_names,
    }


def evaluate_dataset(frozen, trainable, model_cfg: ModelConfig,
                     eval_cfg: EvalConfig, datasets: Dict, anchors: Dict,
                     logger=None, visualize_dir: Optional[str] = None,
                     mesh=None, use_iqm: bool = True,
                     compute_dtype=jnp.float32, use_pallas: bool = False):
    """Per-class sweep producing a results table (list of metric dicts plus
    an Average row), parity with test_last.py:273-327."""
    domain = DOMAINS[eval_cfg.dataset]
    predict_fn = make_predict_fn(
        model_cfg, eval_cfg.img_size, domain, use_iqm=use_iqm,
        compute_dtype=compute_dtype, use_pallas=use_pallas,
        text_weight=eval_cfg.text_weight, iqm_weight=eval_cfg.iqm_weight,
        mesh=mesh,
    )
    rows = []
    for class_name, dataset in datasets.items():
        preds = predict_class(predict_fn, frozen, trainable, dataset,
                              anchors[class_name], eval_cfg.batch_size)
        if visualize_dir:
            from .visualize import dump_heatmaps

            dump_heatmaps(
                preds["masks"], preds["maps"], preds["file_names"],
                visualize_dir, eval_cfg.dataset, class_name)
        row = metrics_eval(
            preds["masks"], preds["labels"], preds["maps"],
            preds["image_scores"], class_name, domain)
        rows.append(row)
        if logger:
            logger.info("%s: %s", class_name, row)

    metric_keys = ["pixel AUC", "pixel AP", "image AUC", "image AP"]
    avg = {"class name": "Average"}
    for k in metric_keys:
        avg[k] = float(np.mean([r[k] for r in rows])) if rows else 0.0
    rows.append(avg)
    return rows


def results_table(rows) -> str:
    """Render rows as the reference's pandas-style table."""
    import pandas as pd

    df = pd.DataFrame(rows, columns=["class name", "pixel AUC", "pixel AP",
                                     "image AUC", "image AP"])
    return df.to_string(index=False, justify="center")
