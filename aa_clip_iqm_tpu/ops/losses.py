"""Training losses: focal, binary dice, segmentation composite, image CE.

Semantics follow the reference exactly:
  - FocalLoss (forward_utils.py:21-109): inputs are per-pixel class
    probabilities (softmax already applied upstream); labels smoothed by
    clamping the one-hot to [smooth/(C-1), 1-smooth]; pt gets +smooth;
    loss = mean(-(1-pt)^gamma * log(pt)) with alpha == 1.
  - BinaryDiceLoss (forward_utils.py:112-126): smooth=1, per-sample dice on
    flattened maps, averaged.
  - calculate_seg_loss (forward_utils.py:223-227):
      focal(probs_2ch, mask) + dice(ch0, 1-mask) + dice(ch1, mask).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def focal_loss(probs, target, gamma: float = 2.0, smooth: float = 1e-5,
               sample_weight=None):
    """probs: (B, C, ...) class probabilities; target: (B, 1, ...) or (B, ...)
    integer/binary labels. sample_weight: optional (B,) weights (e.g. a
    validity mask for batch padding) — weighted mean over pixels."""
    num_class = probs.shape[1]
    b = probs.shape[0]
    p = jnp.moveaxis(probs, 1, -1).reshape(b, -1, num_class).astype(jnp.float32)
    t = target.reshape(b, -1).astype(jnp.int32)
    one_hot = jax.nn.one_hot(t, num_class, dtype=jnp.float32)
    one_hot = jnp.clip(one_hot, smooth / (num_class - 1), 1.0 - smooth)
    pt = jnp.sum(one_hot * p, axis=-1) + smooth
    loss = -jnp.power(1.0 - pt, gamma) * jnp.log(pt)   # (B, pixels)
    if sample_weight is None:
        return jnp.mean(loss)
    w = sample_weight.astype(jnp.float32)
    per_sample = jnp.mean(loss, axis=1)
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)


def binary_dice_loss(pred, target, smooth: float = 1.0, sample_weight=None):
    """pred/target: (B, ...) in [0,1]."""
    n = pred.shape[0]
    p = pred.reshape(n, -1).astype(jnp.float32)
    t = target.reshape(n, -1).astype(jnp.float32)
    inter = jnp.sum(p * t, axis=1)
    dice = (2.0 * inter + smooth) / (jnp.sum(p, axis=1) + jnp.sum(t, axis=1) + smooth)
    if sample_weight is None:
        return 1.0 - jnp.sum(dice) / n
    w = sample_weight.astype(jnp.float32)
    return 1.0 - jnp.sum(dice * w) / jnp.maximum(jnp.sum(w), 1.0)


def seg_loss(probs_2ch, mask, sample_weight=None):
    """Composite segmentation loss on 2-channel probability maps.

    probs_2ch: (B, 2, H, W) softmaxed (normal, abnormal); mask: (B, 1, H, W).
    """
    m = mask.reshape(mask.shape[0], *mask.shape[-2:]).astype(jnp.float32)
    loss = focal_loss(probs_2ch, mask, sample_weight=sample_weight)
    loss += binary_dice_loss(probs_2ch[:, 0], 1.0 - m,
                             sample_weight=sample_weight)
    loss += binary_dice_loss(probs_2ch[:, 1], m, sample_weight=sample_weight)
    return loss


def seg_loss_tokens(probs_2ch, cell_frac, sample_weight=None):
    """Token-resolution segmentation composite for the patch-dropout path.

    With patch dropout active the kept tokens no longer form a full grid, so
    the upsample-to-img_size composite (seg_loss) cannot apply; instead the
    same focal+dice combination runs directly on the kept cells against the
    per-cell defect fraction (evaluation.scoring.mask_to_patch_cells).

    probs_2ch: (B, 2, K) softmaxed (normal, abnormal); cell_frac: (B, K) in
    [0, 1] — binarized at 0.5 for the focal target, used continuously for
    the dice terms.
    """
    hard = (cell_frac >= 0.5).astype(jnp.int32)
    loss = focal_loss(probs_2ch, hard, sample_weight=sample_weight)
    loss += binary_dice_loss(probs_2ch[:, 0], 1.0 - cell_frac,
                             sample_weight=sample_weight)
    loss += binary_dice_loss(probs_2ch[:, 1], cell_frac,
                             sample_weight=sample_weight)
    return loss


def cross_entropy_logits(logits, labels, sample_weight=None):
    """F.cross_entropy parity: mean over batch of -log_softmax[label]."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    picked = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                                  axis=-1)[:, 0]
    if sample_weight is None:
        return jnp.mean(picked)
    w = sample_weight.astype(jnp.float32)
    return jnp.sum(picked * w) / jnp.maximum(jnp.sum(w), 1.0)
