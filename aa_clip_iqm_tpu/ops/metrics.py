"""Evaluation metrics: exact rank-based AUROC / average precision.

sklearn-parity implementations (validated in tests against
sklearn.metrics.roc_auc_score / average_precision_score, the reference's
metric backend — forward_utils.py:288-296) that run on-device, so the
518^2 x N pixel score tensors never round-trip to the host for ranking.

AUROC: Mann-Whitney U with midrank tie correction,
    AUC = (sum of positive midranks - P(P+1)/2) / (P * N_neg).
AP: AP = (1/P) * sum over positives of precision at that element's score
    threshold (>= semantics), which collapses tie groups exactly like
    sklearn's step-function integral.

Both come out of ONE two-operand sort (scores carrying labels) followed by
associative scans (cumsum/cummax/cummin) — no searchsorted. The earlier
implementation (2 full sorts + 4 binary-search gathers over the 518^2 x B
pixel tensor) spent ~4.7 s/class on chip in the gathers alone; TPU gathers
serialize where scans ride the VPU. Tie groups are handled exactly: every
per-element quantity below (first/last index of the element's tie group,
positives-at-or-above-threshold) is a group-level constant propagated by a
monotone cummax/cummin, so midranks and >=-threshold counts match the
sorted-array definitions bit-for-bit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _rank_metrics(scores, labels, n_valid):
    """AUROC + AP from one sort, with optional front-padding.

    scores: (N,) float with padded entries = -inf; labels: (N,) {0,1} with
    padded entries = 0; n_valid: count of real entries. Padded entries sort
    to the front as their own tie group(s): for any valid score v the count
    `#(>= v)` never includes a pad, so subtracting the pad count from the
    midranks and using n_valid for the negative count restores the exact
    unpadded statistics. Lets per-class eval jit once per *bucketed* shape
    instead of once per class size.
    """
    scores = scores.reshape(-1).astype(jnp.float32)
    labels = labels.reshape(-1).astype(jnp.float32)
    n = scores.shape[0]
    n_pad = n - n_valid
    s, l = jax.lax.sort((scores, labels), num_keys=1)
    idx = jnp.arange(n, dtype=jnp.int32)
    boundary = s[1:] != s[:-1]
    first = jnp.concatenate([jnp.ones((1,), bool), boundary])
    last = jnp.concatenate([boundary, jnp.ones((1,), bool)])
    # First/last index of each element's tie group: group-start indices are
    # increasing, so a running max of (index where group starts, else -1)
    # holds each element's own group start; symmetrically a reverse running
    # min of (index where group ends, else n) holds its group end.
    f = jax.lax.cummax(jnp.where(first, idx, -1))
    e = jax.lax.cummin(jnp.where(last, idx, n), reverse=True)
    # 1-based midrank of a tie group spanning [f, e] is (f + e)/2 + 1.
    midrank = (f + e).astype(jnp.float32) * 0.5 + 1.0

    l_int = (l > 0).astype(jnp.int32)
    p_int = jnp.sum(l_int)
    p = p_int.astype(jnp.float32)
    neg = n_valid - p
    pos_rank_sum = jnp.sum((midrank - n_pad) * l)
    auc = (pos_rank_sum - p * (p + 1.0) * 0.5) / (p * neg)

    # AP with >= semantics: at element i's threshold, tp = #positives with
    # score >= s[i] = P - (positives strictly before i's group start) and
    # n_ge = n - f[i]. P - cumsum_excl is non-increasing, so a running min
    # of its value at group starts propagates each group's own constant.
    c_excl = jnp.cumsum(l_int) - l_int
    tp = jax.lax.cummin(
        jnp.where(first, p_int - c_excl, jnp.iinfo(jnp.int32).max))
    n_ge = (n - f).astype(jnp.float32)
    precision = tp.astype(jnp.float32) / n_ge
    ap = jnp.sum(precision * l) / p
    return auc, ap


def auroc(scores, labels):
    """scores: (N,) float; labels: (N,) {0,1}. Returns scalar float32."""
    return _rank_metrics(scores, labels, scores.size)[0]


def average_precision(scores, labels):
    """sklearn average_precision_score parity."""
    return _rank_metrics(scores, labels, scores.size)[1]


@jax.jit
def auroc_ap(scores, labels):
    return _rank_metrics(scores, labels, scores.size)


def _masked_auroc_ap(scores, labels, n_valid):
    """AUROC/AP over the first-class citizens of a padded score array
    (see :func:`_rank_metrics` for the padding contract)."""
    return _rank_metrics(scores, labels, n_valid)


def masked_conditional_minmax(x, valid_mask):
    """The reference's conditional min-max (forward_utils.py:246-253) over
    the valid entries of a padded array: normalize to [0, 1] unless the raw
    max is exactly 1.0 (then pass through unchanged). ``valid_mask``
    broadcasts against ``x``; padded entries get whatever the affine map
    produces (callers re-mask before use). Shared by the pixel and image
    device-metric paths so the rng==0 / max!=1 edge semantics can never
    diverge between them."""
    x = x.astype(jnp.float32)
    mx = jnp.max(jnp.where(valid_mask, x, -jnp.inf))
    mn = jnp.min(jnp.where(valid_mask, x, jnp.inf))
    rng = mx - mn
    norm = (x - mn) / jnp.where(rng == 0, 1.0, rng)
    return jnp.where(mx != 1.0, norm, x)


@jax.jit
def pixel_metrics_device(maps, masks, valid, n_valid):
    """Device-resident per-class pixel metrics + normalized image maxima.

    maps: (B, H, W) fused anomaly maps (padded rows allowed);
    masks: (B, H, W) bool ground truth; valid: (B,) bool row validity;
    n_valid: scalar count of valid pixels (B_valid * H * W).

    Returns (pixel_auroc, pixel_ap, pmax (B,)) — pmax computed on the
    min-max-normalized maps, matching the reference's image-score
    aggregation input (forward_utils.py:246-282). Only scalars and a (B,)
    vector ever reach the host.
    """
    v3 = valid[:, None, None]
    pix = masked_conditional_minmax(maps, v3)

    pmax = jnp.max(pix, axis=(1, 2))
    scores = jnp.where(v3, pix, -jnp.inf).reshape(-1)
    labels = (masks & v3).reshape(-1)
    auc, ap = _masked_auroc_ap(scores, labels, n_valid)
    return auc, ap, pmax


def minmax_normalize(x):
    """Reference min-max normalization (forward_utils.py:246-253), applied
    only when max(x) != 1."""
    x = np.asarray(x, dtype=np.float32)
    if x.max() != 1:
        rng = x.max() - x.min()
        x = (x - x.min()) / rng if rng else np.zeros_like(x)
    return x


def metrics_eval(pixel_label, image_label, pixel_preds, image_preds,
                 class_name: str, domain: str, use_device: bool = True):
    """Per-class metric dict, parity with forward_utils.py:233-308.

    pixel_label: (N,1,H,W) or (N,H,W); image_label: (N,); pixel_preds:
    (N,H,W) or (N,1,H,W); image_preds: (N,).
    """
    pixel_label = np.asarray(pixel_label)
    image_label = np.asarray(image_label)
    pixel_preds = minmax_normalize(pixel_preds)
    image_preds = minmax_normalize(image_preds)
    if pixel_preds.ndim == 4 and pixel_preds.shape[1] == 1:
        pixel_preds = pixel_preds[:, 0]
    if image_preds.ndim > 1:
        image_preds = image_preds.reshape(-1)

    pmax = pixel_preds.max(axis=(1, 2))
    if domain != "Medical":
        image_scores = pmax * 0.5 + image_preds * 0.5
    else:
        image_scores = pmax

    pl = (pixel_label.reshape(-1) != 0).astype(np.float32)
    pp = pixel_preds.reshape(-1)
    if use_device:
        pix_auc, pix_ap = (float(v) for v in auroc_ap(jnp.asarray(pp), jnp.asarray(pl)))
    else:
        from sklearn.metrics import average_precision_score, roc_auc_score
        pix_auc = float(roc_auc_score(pl, pp))
        pix_ap = float(average_precision_score(pl, pp))

    if image_label.max() != image_label.min():
        il = image_label.reshape(-1).astype(np.float32)
        if use_device:
            img_auc, img_ap = (
                float(v) for v in auroc_ap(jnp.asarray(image_scores), jnp.asarray(il))
            )
        else:
            from sklearn.metrics import average_precision_score, roc_auc_score
            img_auc = float(roc_auc_score(il, image_scores))
            img_ap = float(average_precision_score(il, image_scores))
    else:
        img_auc, img_ap = 0.0, 0.0

    return {
        "class name": class_name,
        "pixel AUC": round(pix_auc, 4) * 100,
        "pixel AP": round(pix_ap, 4) * 100,
        "image AUC": round(img_auc, 4) * 100,
        "image AP": round(img_ap, 4) * 100,
    }
