"""Similarity-map scoring: the fused anomaly-map pipeline.

Parity targets:
  - calculate_similarity_map (forward_utils.py:196-216): 100 * patches @
    anchors; train -> bilinear align_corners=True upsample + channel softmax;
    test -> score (pos+1-neg)/2, Gaussian blur (Industrial k=7 s=1, Medical
    k=9 s=1.5), then upsample.
  - IQM query maps (train.py:184-209, test_last.py:109-138): sigmoid of
    cosine-similarity difference, align_corners=False upsample.
  - Eval fusion (test_last.py:141-149): 0.6 * sum(text maps) + 0.4 * sum(IQM).

TPU design: blur+upsample collapse into two precomputed matmuls
(ops/interp.blur_and_upsample), so the entire per-level post-processing is
MXU work inside one jitted program — no gathers, no host round-trips.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops.interp import blur_and_upsample, resize_bilinear
from ..ops.layers import l2_normalize

BLUR_SETTINGS = {"Industrial": (7, 1.0), "Medical": (9, 1.5)}


def _to_grid(patch_scores):
    """(B, L, ...) -> (B, ..., H, H) with L = H*H."""
    b, l = patch_scores.shape[0], patch_scores.shape[1]
    h = int(math.isqrt(l))
    if h * h != l:
        raise ValueError(f"patch count {l} is not a perfect square")
    if patch_scores.ndim == 2:
        return patch_scores.reshape(b, h, h)
    c = patch_scores.shape[2]
    return patch_scores.transpose(0, 2, 1).reshape(b, c, h, h)


def similarity_logits(patch_features, anchors):
    """100 * (B, L, D) @ (B, D, 2) -> (B, L, 2)."""
    return 100.0 * jnp.einsum(
        "bld,bdc->blc", patch_features.astype(jnp.float32),
        anchors.astype(jnp.float32), preferred_element_type=jnp.float32,
    )


def similarity_map_train(patch_features, anchors, img_size: int):
    """Training-path map: upsampled logits, softmax over the 2 channels.
    Returns (B, 2, img, img) probabilities."""
    grid = _to_grid(similarity_logits(patch_features, anchors))  # (B,2,H,H)
    up = resize_bilinear(grid, img_size, img_size, align_corners=True)
    return jax.nn.softmax(up, axis=1)


def similarity_map_test(patch_features, anchors, img_size: int, domain: str):
    """Test-path map: (pos+1-neg)/2, blur, upsample. Returns (B, img, img)."""
    logits = similarity_logits(patch_features, anchors)
    score = (logits[..., 1] + 1.0 - logits[..., 0]) * 0.5   # (B, L)
    grid = _to_grid(score)
    ks, sigma = BLUR_SETTINGS[domain]
    return blur_and_upsample(grid, img_size, ks, sigma)


def iqm_score_map(patch_features, queries_projected, img_size: int,
                  align_corners: bool = False):
    """sigmoid(cos(f, q_abnormal) - cos(f, q_normal)) per patch, upsampled.

    patch_features: (B, L, D); queries_projected: (B, 2, D).
    Returns (B, img, img).
    """
    f = l2_normalize(patch_features.astype(jnp.float32))
    q = l2_normalize(queries_projected.astype(jnp.float32))
    sims = jnp.einsum("bld,bqd->blq", f, q,
                      preferred_element_type=jnp.float32)
    diff = sims[..., 1] - sims[..., 0]
    pred = jax.nn.sigmoid(diff)
    grid = _to_grid(pred)
    return resize_bilinear(grid, img_size, img_size, align_corners=align_corners)


def iqm_patch_pred(patch_features, queries_projected):
    """Per-patch IQM anomaly probability sigmoid(cos(f, q_abn) - cos(f, q_nrm))
    (train.py:198-209). Returns (B, L)."""
    f = l2_normalize(patch_features.astype(jnp.float32))
    q = l2_normalize(queries_projected.astype(jnp.float32))
    sims = jnp.einsum("bld,bqd->blq", f, q, preferred_element_type=jnp.float32)
    return jax.nn.sigmoid(sims[..., 1] - sims[..., 0])


def iqm_train_map(patch_features, queries_projected, img_size: int):
    """Two-channel (1-p, p) IQM map for the stage-2 segmentation loss
    (train.py:198-209); align_corners=False upsample."""
    pred = iqm_patch_pred(patch_features, queries_projected)  # (B, L)
    grid = _to_grid(pred)[:, None]                           # (B,1,H,H)
    two_ch = jnp.concatenate([1.0 - grid, grid], axis=1)     # (B,2,H,H)
    return resize_bilinear(two_ch, img_size, img_size, align_corners=False)


def mask_to_patch_cells(mask, patch_size: int):
    """(B, 1, H, W) mask -> (B, L) per-patch-cell defect fraction, in the
    row-major cell order of models.clip.patchify. Used by the patch-dropout
    training path, where the seg loss runs at token resolution on kept cells
    instead of upsampling to img_size."""
    b = mask.shape[0]
    m = mask.reshape(b, mask.shape[-2], mask.shape[-1]).astype(jnp.float32)
    gh, gw = m.shape[1] // patch_size, m.shape[2] // patch_size
    cells = m.reshape(b, gh, patch_size, gw, patch_size).mean(axis=(2, 4))
    return cells.reshape(b, gh * gw)


def fuse_maps(text_maps: Sequence, iqm_maps: Sequence,
              text_weight: float = 0.6, iqm_weight: float = 0.4):
    """final = w_t * sum(text levels) + w_i * sum(IQM levels)
    (test_last.py:141-149). Each map (B, img, img)."""
    text_sum = sum(text_maps)
    if iqm_maps:
        return text_weight * text_sum + iqm_weight * sum(iqm_maps)
    return text_sum


def image_logit(det_token, anchors):
    """Per-sample abnormal-channel image score ((det_i @ anchors_i)[1]+1)/2.

    Matches the reference's TRAIN-time classification logits
    (train.py:153-155: per-sample det @ anchors, CE over [normal, abnormal]
    with label 1 = abnormal). DELIBERATE deviation from its EVAL path
    (survey Q11): test_last.py:90-92 computes ``det(B,768) @
    anchors(B,768,2)`` which torch-broadcasts to (B, B, 2), then
    ``pred[:, 1]`` selects batch-sample *index 1*'s logits for every row
    (crashing when B == 1), and metrics_eval keeps channel 0 — the NORMAL
    anchor (forward_utils.py:269-271). The executed eval score is thus one
    fixed sample's normality per batch, constant across the batch; see
    :func:`image_logit_reference_eval` for the exact transcription."""
    pred = jnp.einsum("bd,bdc->bc", det_token.astype(jnp.float32),
                      anchors.astype(jnp.float32))
    return (pred[:, 1] + 1.0) * 0.5


def image_logit_reference_eval(det_token, anchors):
    """Exact transcription of the reference's EXECUTED eval image score
    (test_last.py:90-92 + forward_utils.py:269-271) for parity studies: the
    whole batch scores as sample index 1's normal-anchor cosine. Requires
    B >= 2 like the reference (B == 1 raises there). Not used by the eval
    pipeline — see :func:`image_logit` for the shipped semantics."""
    if det_token.shape[0] < 2:
        # Fail like the reference does (pred[:, 1] IndexErrors at B == 1)
        # instead of letting JAX's clamped indexing silently score sample 0.
        raise ValueError(
            "image_logit_reference_eval requires batch >= 2: the reference's"
            " pred[:, 1] crashes at B == 1 (test_last.py:90-92)")
    pred = jnp.einsum("d,bdc->bc", det_token.astype(jnp.float32)[1],
                      anchors.astype(jnp.float32))
    return (pred[:, 0] + 1.0) * 0.5
