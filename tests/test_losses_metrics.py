"""Loss parity (vs hand-computed torch) + metric parity vs sklearn."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from sklearn.metrics import average_precision_score, roc_auc_score

import jax.numpy as jnp

from aa_clip_iqm_tpu.ops import losses, metrics


def _torch_focal(probs, target, gamma=2.0, smooth=1e-5):
    """Direct transcription of the reference FocalLoss semantics
    (forward_utils.py:56-109) for test comparison."""
    num_class = probs.shape[1]
    logit = probs.permute(0, 2, 3, 1).reshape(-1, num_class)
    t = target.reshape(-1, 1).long()
    one_hot = torch.zeros(t.size(0), num_class).scatter_(1, t, 1)
    one_hot = torch.clamp(one_hot, smooth / (num_class - 1), 1.0 - smooth)
    pt = (one_hot * logit).sum(1) + smooth
    logpt = pt.log()
    return (-1 * torch.pow(1 - pt, gamma) * logpt).mean()


def test_focal_loss_matches_reference_semantics(rng):
    probs = torch.softmax(torch.from_numpy(
        rng.standard_normal((2, 2, 8, 8)).astype(np.float32)), dim=1)
    mask = torch.from_numpy(
        (rng.random((2, 1, 8, 8)) > 0.7).astype(np.float32))
    ref = _torch_focal(probs, mask).item()
    out = float(losses.focal_loss(jnp.asarray(probs.numpy()),
                                  jnp.asarray(mask.numpy())))
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_dice_loss(rng):
    pred = rng.random((3, 8, 8)).astype(np.float32)
    target = (rng.random((3, 8, 8)) > 0.5).astype(np.float32)
    n = 3
    p = pred.reshape(n, -1)
    t = target.reshape(n, -1)
    inter = (p * t).sum(1)
    dice = (2 * inter + 1) / (p.sum(1) + t.sum(1) + 1)
    ref = 1 - dice.sum() / n
    out = float(losses.binary_dice_loss(jnp.asarray(pred), jnp.asarray(target)))
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_cross_entropy_matches_torch(rng):
    logits = rng.standard_normal((6, 2)).astype(np.float32)
    labels = rng.integers(0, 2, 6)
    ref = F.cross_entropy(torch.from_numpy(logits),
                          torch.from_numpy(labels.astype(np.int64))).item()
    out = float(losses.cross_entropy_logits(jnp.asarray(logits),
                                            jnp.asarray(labels)))
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_auroc_matches_sklearn(rng):
    scores = rng.standard_normal(5000).astype(np.float32)
    labels = (rng.random(5000) > 0.8).astype(np.float32)
    ref = roc_auc_score(labels, scores)
    out = float(metrics.auroc(jnp.asarray(scores), jnp.asarray(labels)))
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_auroc_with_ties_matches_sklearn(rng):
    scores = rng.integers(0, 10, 3000).astype(np.float32)  # heavy ties
    labels = (rng.random(3000) > 0.7).astype(np.float32)
    ref = roc_auc_score(labels, scores)
    out = float(metrics.auroc(jnp.asarray(scores), jnp.asarray(labels)))
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_ap_matches_sklearn(rng):
    scores = rng.standard_normal(4000).astype(np.float32)
    labels = (rng.random(4000) > 0.85).astype(np.float32)
    ref = average_precision_score(labels, scores)
    out = float(metrics.average_precision(jnp.asarray(scores), jnp.asarray(labels)))
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_ap_with_ties_matches_sklearn(rng):
    scores = rng.integers(0, 8, 2000).astype(np.float32)
    labels = (rng.random(2000) > 0.75).astype(np.float32)
    ref = average_precision_score(labels, scores)
    out = float(metrics.average_precision(jnp.asarray(scores), jnp.asarray(labels)))
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_metrics_eval_dict(rng):
    n, h = 8, 16
    pixel_label = (rng.random((n, 1, h, h)) > 0.9).astype(np.float32)
    image_label = (pixel_label.sum(axis=(1, 2, 3)) > 0).astype(np.int64)
    pixel_preds = rng.random((n, h, h)).astype(np.float32)
    image_preds = rng.random(n).astype(np.float32)
    res = metrics.metrics_eval(pixel_label, image_label, pixel_preds,
                               image_preds, "widget", "Industrial")
    ref_sk = metrics.metrics_eval(pixel_label, image_label, pixel_preds,
                                  image_preds, "widget", "Industrial",
                                  use_device=False)
    for k in ("pixel AUC", "pixel AP", "image AUC", "image AP"):
        np.testing.assert_allclose(res[k], ref_sk[k], atol=1e-2)


def test_image_logit_matches_reference_train_semantics(rng):
    """image_logit == the reference TRAIN-time per-sample classification
    logits, abnormal channel (train.py:153-155: det.unsqueeze(1) @ anchors
    -> (B,1,2), [:,0]); the shipped eval score deliberately reuses these
    sane semantics (survey Q11)."""
    from aa_clip_iqm_tpu.evaluation import scoring

    det = rng.standard_normal((4, 16)).astype(np.float32)
    anchors = rng.standard_normal((4, 16, 2)).astype(np.float32)
    ref = torch.matmul(torch.from_numpy(det).unsqueeze(1),
                       torch.from_numpy(anchors))[:, 0]
    ref = ((ref[:, 1] + 1) / 2).numpy()
    out = np.asarray(scoring.image_logit(det, anchors))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_image_logit_reference_eval_transcription(rng):
    """image_logit_reference_eval == the reference EVAL path as executed
    (survey Q11): det(B,768) @ anchors(B,768,2) broadcasts to (B,B,2)
    (test_last.py:90), pred[:,1] pins batch sample 1, (x+1)/2 (:91), and
    metrics_eval keeps channel 0 — the NORMAL anchor
    (forward_utils.py:269-271)."""
    from aa_clip_iqm_tpu.evaluation import scoring

    det = rng.standard_normal((4, 16)).astype(np.float32)
    anchors = rng.standard_normal((4, 16, 2)).astype(np.float32)
    pred = torch.from_numpy(det) @ torch.from_numpy(anchors)  # (B, B, 2)
    assert pred.shape == (4, 4, 2)
    ref = ((pred[:, 1] + 1) / 2)[:, 0].numpy()
    out = np.asarray(scoring.image_logit_reference_eval(det, anchors))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
    # The executed eval score is constant across the batch only when the
    # anchors are (as in the reference) identical per batch row.
    anchors_same = np.broadcast_to(anchors[:1], anchors.shape).copy()
    out_same = np.asarray(scoring.image_logit_reference_eval(det,
                                                            anchors_same))
    np.testing.assert_allclose(out_same, np.full(4, out_same[0]), rtol=1e-5)
    # B == 1 must fail loudly like the reference (pred[:, 1] IndexErrors),
    # not silently clamp to sample 0 under JAX indexing.
    with pytest.raises(ValueError, match="batch >= 2"):
        scoring.image_logit_reference_eval(det[:1], anchors[:1])
