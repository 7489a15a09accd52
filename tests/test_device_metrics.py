"""Device-resident per-class metrics == host/sklearn path."""
import numpy as np

import jax.numpy as jnp

from aa_clip_iqm_tpu.evaluation.predict import class_metrics_device
from aa_clip_iqm_tpu.ops.metrics import metrics_eval, pixel_metrics_device


def _fake_preds(rng, n=11, h=24):
    masks = (rng.random((n, 1, h, h)) > 0.92).astype(np.float32)
    labels = (masks.sum(axis=(1, 2, 3)) > 0).astype(np.int64)
    maps = rng.random((n, h, h)).astype(np.float32) + masks[:, 0] * 0.3
    image_scores = rng.random(n).astype(np.float32)
    return masks, labels, maps, image_scores


def test_class_metrics_device_matches_host(rng):
    masks, labels, maps, image_scores = _fake_preds(rng)
    host_row = metrics_eval(masks, labels, maps, image_scores, "w",
                            "Industrial", use_device=False)
    preds = {
        "masks": jnp.asarray(masks[:, 0] != 0),
        "labels": labels,
        "maps": jnp.asarray(maps),
        "image_scores": image_scores,
    }
    dev_row = class_metrics_device(preds, "w", "Industrial")
    for key in ("pixel AUC", "pixel AP", "image AUC", "image AP"):
        np.testing.assert_allclose(dev_row[key], host_row[key], atol=1e-2)


def test_class_metrics_device_medical_aggregation(rng):
    masks, labels, maps, image_scores = _fake_preds(rng)
    host_row = metrics_eval(masks, labels, maps, image_scores, "w", "Medical",
                            use_device=False)
    preds = {
        "masks": jnp.asarray(masks[:, 0] != 0),
        "labels": labels,
        "maps": jnp.asarray(maps),
        "image_scores": image_scores,
    }
    dev_row = class_metrics_device(preds, "w", "Medical")
    for key in ("pixel AUC", "pixel AP", "image AUC", "image AP"):
        np.testing.assert_allclose(dev_row[key], host_row[key], atol=1e-2)


def test_class_metrics_deferred_row_matches_immediate(rng):
    """defer=True returns an un-fetched device row that finalizes to exactly
    the defer=False values (the eval sweep's cross-class pipelining path)."""
    from aa_clip_iqm_tpu.evaluation.predict import _finalize_row

    masks, labels, maps, image_scores = _fake_preds(rng)
    preds = {
        "masks": jnp.asarray(masks[:, 0] != 0),
        "labels": labels,
        "maps": jnp.asarray(maps),
        "image_scores": jnp.asarray(image_scores),
    }
    now = class_metrics_device(preds, "w", "Industrial")
    deferred = class_metrics_device(preds, "w", "Industrial", defer=True)
    assert "_device" in deferred and "pixel AUC" not in deferred
    finalized = _finalize_row(deferred)
    assert "_device" not in finalized
    assert finalized == now
    # single-label class: image metrics are 0.0 like the reference
    ones = dict(preds, labels=np.ones_like(labels))
    row = _finalize_row(class_metrics_device(ones, "w", "Industrial",
                                             defer=True))
    assert row["image AUC"] == 0.0 and row["image AP"] == 0.0


def test_pixel_metrics_padding_invariance(rng):
    """Bucket padding must not change the metrics."""
    n, h = 7, 16
    maps = rng.random((n, h, h)).astype(np.float32)
    masks = rng.random((n, h, h)) > 0.9
    a1, p1, pm1 = pixel_metrics_device(
        jnp.asarray(maps), jnp.asarray(masks), jnp.ones(n, bool), n * h * h)
    pad = 16 - n
    maps_p = np.concatenate([maps, np.zeros((pad, h, h), np.float32)])
    masks_p = np.concatenate([masks, np.zeros((pad, h, h), bool)])
    valid = np.arange(16) < n
    a2, p2, pm2 = pixel_metrics_device(
        jnp.asarray(maps_p), jnp.asarray(masks_p), jnp.asarray(valid),
        n * h * h)
    np.testing.assert_allclose(float(a1), float(a2), rtol=1e-6)
    np.testing.assert_allclose(float(p1), float(p2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pm1), np.asarray(pm2)[:n], rtol=1e-6)
