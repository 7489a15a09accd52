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


def _device_normalize(images_u8):
    """CLIP normalization of CHW uint8 images on device — same op order as
    data.datasets.normalize_clip ((u8/255 - mean)/std in fp32), so the result
    is bit-identical to host-normalized float32 input."""
    from ..data.registry import IMAGE_MEAN, IMAGE_STD

    mean = jnp.asarray(IMAGE_MEAN, jnp.float32).reshape(1, 3, 1, 1)
    std = jnp.asarray(IMAGE_STD, jnp.float32).reshape(1, 3, 1, 1)
    return (images_u8.astype(jnp.float32) / 255.0 - mean) / std


@functools.lru_cache(maxsize=8)
def make_predict_fn(cfg: ModelConfig, img_size: int, domain: str,
                    use_iqm: bool = True, compute_dtype=jnp.float32,
                    use_pallas: bool = False, text_weight: float = 0.6,
                    iqm_weight: float = 0.4, mesh=None,
                    image_score_mode: str = "fixed"):
    """Build predict(frozen, trainable, images, anchors) ->
    (final_map (B,H,W) fp32, image_logit (B,)).

    anchors: (B, embed_dim, 2). When `mesh` is given the batch axis is
    annotated to shard over its 'data' axis and params are replicated, so the
    same program runs single-chip or data-parallel over ICI.
    image_score_mode: "fixed" (per-sample abnormal logit, default) or
    "reference_eval" (the executed reference's eval transcription — survey
    Q11; for parity studies, requires batch >= 2 and is batch-composition
    dependent like the reference).

    LRU-cached on the (all-hashable, value-type) arguments: repeated
    `evaluate_dataset` calls — benchmark sweeps, per-epoch evals, serving
    reloads — get the SAME jitted callable back, so jax's jit cache hits and
    the multi-second ViT-L re-trace per tail-bucket shape is paid once per
    process, not once per sweep (closures capture only these args, never
    params; params are explicit call inputs).
    """
    if image_score_mode not in ("fixed", "reference_eval"):
        raise ValueError(f"unknown image_score_mode {image_score_mode!r}")
    logit_fn = (scoring.image_logit if image_score_mode == "fixed"
                else scoring.image_logit_reference_eval)

    def predict(frozen, trainable, images, anchors):
        # uint8 input: the caller shipped raw (quantized) pixels — apply the
        # CLIP normalization here, on device, in fp32 (bit-identical to the
        # host normalize_clip path; 4x less host->device transfer). dtype is
        # static under jit so this branch costs nothing.
        if images.dtype == jnp.uint8:
            images = _device_normalize(images)
        out = adapters_mod.encode_image_adapted(
            frozen, trainable, cfg, images,
            text_anchors=anchors if use_iqm else None,
            compute_dtype=compute_dtype, use_pallas=use_pallas,
        )
        img_logit = logit_fn(out.det_token, anchors)
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


def _tail_buckets(batch_size: int):
    """Compile-once bucket ladder for ragged tail batches: powers of two
    below batch_size, then batch_size itself (same idea as the serving
    ladder, serving.DEFAULT_BATCH_BUCKETS)."""
    ladder = [b for b in (1, 2, 4, 8, 16, 32, 64, 128) if b < batch_size]
    return tuple(ladder) + (batch_size,)


def predict_class(predict_fn, frozen, trainable, dataset, class_anchor,
                  batch_size: int, device_resident: bool = False,
                  image_score_mode: str = "fixed", buckets=None):
    """Run a per-class test dataset through the jitted predict fn.

    Full batches run at the fixed batch size; the ragged tail batch is
    zero-padded only up to the smallest power-of-two bucket that fits
    (``_tail_buckets``) instead of the full batch size — a 33-image class at
    batch 32 runs 32+1 images of compute, not 64, at a bounded number of
    compiled shapes. With ``device_resident`` the anomaly maps and masks
    stay on device (for on-device metrics; only the tiny image logits are
    fetched) — on remote-attached accelerators the map fetch otherwise
    dominates eval wall-clock.

    ``image_score_mode`` must echo the mode ``predict_fn`` was built with:
    "reference_eval" scores the batch from sample index 1 (survey Q11), so a
    tail batch with a single valid sample would silently score from a
    zero-padded row — the reference's executed eval would crash there
    (``pred[:, 1]`` on a size-1 batch); we raise with the same meaning.

    ``buckets``: override the tail ladder — pass ``(batch_size,)`` to pad
    every tail to the full batch (required when predict_fn shards the batch
    axis over a mesh, where every shape must divide the data axis).
    """
    from ..data.datasets import prefetch

    masks, labels, maps, image_scores, file_names = [], [], [], [], []
    if buckets is None:
        buckets = _tail_buckets(batch_size)
    for batch in prefetch(dataset.batches(batch_size)):
        n = batch["n_valid"]
        if image_score_mode == "reference_eval" and n < 2:
            raise ValueError(
                "image_score_mode='reference_eval' needs >= 2 valid samples "
                f"per batch (got a batch with {n}); the reference's executed "
                "eval indexes sample 1 and would crash here too. Use "
                "--image_score_mode fixed or a batch size that avoids "
                "1-sample tail batches.")
        bucket = next(b for b in buckets if b >= n)
        images = batch["image"]
        if bucket != n:
            images = np.concatenate(
                [images, np.zeros((bucket - n,) + images.shape[1:],
                                  images.dtype)], axis=0)
        anchor_b = jnp.broadcast_to(class_anchor[None],
                                    (bucket,) + class_anchor.shape)
        final_map, img_logit = predict_fn(
            frozen, trainable, jnp.asarray(images), anchor_b)
        if device_resident:
            maps.append(final_map[:n])
            masks.append(jnp.asarray(batch["mask"][:n, 0] != 0))
            # keep the logits on device too: np.asarray here would BLOCK the
            # loop on every batch (a full tunnel round trip each), stalling
            # the async dispatch pipeline; device-resident consumers
            # (class_metrics_device) never need them on host at all.
            image_scores.append(img_logit[:n])
        else:
            maps.append(np.asarray(final_map)[:n])
            masks.append(batch["mask"][:n])
            image_scores.append(np.asarray(img_logit)[:n])
        labels.append(batch["label"][:n])
        file_names.extend(batch["file_name"][:n])
    cat = jnp.concatenate if device_resident else np.concatenate
    return {
        "masks": cat(masks, axis=0),
        "labels": np.concatenate(labels, axis=0),
        "maps": cat(maps, axis=0),
        "image_scores": cat(image_scores, axis=0),
        "file_names": file_names,
    }


def _bucket(n: int, multiple: int = 16) -> int:
    return ((n + multiple - 1) // multiple) * multiple


@functools.partial(jax.jit, static_argnames=("medical", "mixed_labels"))
def _image_metrics_device(pmax, image_scores, labels, valid, n_valid,
                          medical: bool, mixed_labels: bool):
    """Image-level AUROC/AP on device over a bucket-padded batch.

    Mirrors the host path exactly: conditional min-max of the raw image
    logits (reference forward_utils.py:246-253 — applied only when
    max != 1), 0.5/0.5 blend with the per-image normalized map maxima
    (Medical domain: pmax only), then rank metrics over the valid rows.
    `mixed_labels` is decided on host from the (host) label vector — the
    reference returns 0.0 for single-label classes rather than NaN.
    """
    from ..ops.metrics import _rank_metrics, masked_conditional_minmax

    if not mixed_labels:
        return jnp.zeros(()), jnp.zeros(())
    image_preds = masked_conditional_minmax(image_scores, valid)
    combined = pmax if medical else pmax * 0.5 + image_preds * 0.5
    scores = jnp.where(valid, combined, -jnp.inf)
    lab = jnp.where(valid, labels.astype(jnp.float32), 0.0)
    return _rank_metrics(scores, lab, n_valid)


def _finalize_row(row):
    """Fetch a deferred device-metric row and apply the reference's
    round(x, 4) * 100 report formatting."""
    if "_device" not in row:
        return row
    vals = np.asarray(row.pop("_device"))
    for key, v in zip(("pixel AUC", "pixel AP", "image AUC", "image AP"),
                      vals):
        row[key] = round(float(v), 4) * 100
    return row


def class_metrics_device(preds, class_name: str, domain: str,
                         defer: bool = False):
    """Per-class metric dict with ALL metrics computed on device.

    preds: predict_class(..., device_resident=True) output. Pixel AUROC/AP,
    the per-image normalized maxima, and the image-level metrics all run on
    the accelerator over bucket-padded shapes (one compile per bucket, not
    per class size) — nothing in here blocks on the device. With
    ``defer=True`` the returned row carries the four metrics as a single
    un-fetched device array under "_device" (finalize with
    :func:`_finalize_row`), letting a multi-class sweep overlap one class's
    metric sort with the next class's decode + predict dispatch.
    """
    from ..ops.metrics import pixel_metrics_device

    maps, masks = preds["maps"], preds["masks"]
    b, h, w = maps.shape
    bb = _bucket(b)
    if bb != b:
        maps = jnp.pad(maps, ((0, bb - b), (0, 0), (0, 0)))
        masks = jnp.pad(masks, ((0, bb - b), (0, 0), (0, 0)))
    valid = jnp.arange(bb) < b
    pix_auc, pix_ap, pmax = pixel_metrics_device(maps, masks, valid,
                                                 b * h * w)

    image_label = np.asarray(preds["labels"]).reshape(-1)
    image_scores = jnp.asarray(preds["image_scores"]).reshape(-1)
    if bb != b:
        image_scores = jnp.pad(image_scores, (0, bb - b))
    labels_dev = jnp.pad(jnp.asarray(image_label, jnp.float32), (0, bb - b))
    img_auc, img_ap = _image_metrics_device(
        pmax, image_scores, labels_dev, valid, b,
        medical=domain == "Medical",
        mixed_labels=bool(image_label.max() != image_label.min()))
    row = {
        "class name": class_name,
        "_device": jnp.stack([pix_auc, pix_ap, img_auc, img_ap]),
    }
    return row if defer else _finalize_row(row)


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
        mesh=mesh, image_score_mode=eval_cfg.image_score_mode,
    )
    # Device-resident metrics skip the per-batch map fetch; visualization
    # needs the maps on host, so it uses the host path.
    device_resident = not visualize_dir
    rows = []

    def _settle(row):
        """Finalize + log a row once the NEXT class's work is dispatched:
        the metric fetch (already ahead of that class in the device queue)
        overlaps its host decode, while a mid-sweep failure — e.g. a tunnel
        outage hours into a flagship run — loses at most one class's row."""
        row = _finalize_row(row)
        if logger:
            logger.info("%s: %s", row["class name"], row)
        return row

    for class_name, dataset in datasets.items():
        preds = predict_class(predict_fn, frozen, trainable, dataset,
                              anchors[class_name], eval_cfg.batch_size,
                              device_resident=device_resident,
                              image_score_mode=eval_cfg.image_score_mode,
                              buckets=(eval_cfg.batch_size,) if mesh else None)
        if device_resident:
            # defer=True: the row holds un-fetched device scalars; _settle
            # syncs it one class later (pipeline depth 1).
            row = class_metrics_device(preds, class_name, domain, defer=True)
        else:
            from .visualize import dump_heatmaps

            dump_heatmaps(
                preds["masks"], preds["maps"], preds["file_names"],
                visualize_dir, eval_cfg.dataset, class_name)
            row = metrics_eval(
                preds["masks"], preds["labels"], preds["maps"],
                preds["image_scores"], class_name, domain)
        rows.append(row)
        if len(rows) >= 2:
            rows[-2] = _settle(rows[-2])
    if rows:
        rows[-1] = _settle(rows[-1])

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
