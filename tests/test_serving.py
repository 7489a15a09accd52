"""AnomalyDetector serving API: checkpoint restore, anchors, predict."""
import logging
import os

import numpy as np
import pytest

import jax

from aa_clip_iqm_tpu.configs import TrainConfig, tiny_test_config
from aa_clip_iqm_tpu.data.synthetic import generate, register_synthetic
from aa_clip_iqm_tpu.models import adapters as adapters_mod
from aa_clip_iqm_tpu.models.clip import init_clip_params
from aa_clip_iqm_tpu.serving import AnomalyDetector
from aa_clip_iqm_tpu.train.driver import run_training

IMG = 56


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("servdata"))
    generate(root, n_normal=4, n_anomalous=4, size=IMG, seed=5,
             class_names=("widget",))
    metadata_root = register_synthetic(root)
    cfg = tiny_test_config(IMG)
    frozen = init_clip_params(jax.random.PRNGKey(0), cfg.clip)
    trainable = adapters_mod.init_adapter_params(jax.random.PRNGKey(1), cfg)
    save_path = os.path.join(root, "ckpt")
    train_cfg = TrainConfig(
        dataset="Synth", img_size=IMG, training_mode="full_shot", shot=-1,
        text_batch_size=4, image_batch_size=4, text_epoch=1, image_epoch=1,
        save_path=save_path, compute_dtype="float32")
    run_training(frozen, trainable, cfg, train_cfg,
                 logging.getLogger("serv"), metadata_root=metadata_root)
    return root, save_path, cfg, frozen


def test_detector_from_checkpoint(trained, rng):
    root, save_path, cfg, frozen = trained

    det = AnomalyDetector(
        frozen,
        _restored_trainable(save_path, cfg), cfg, "Synth", img_size=IMG,
        adapted_text=True, compute_dtype=np.float32, use_pallas=False)
    assert det.class_names() == ["widget"]
    images = rng.standard_normal((3, 3, IMG, IMG)).astype(np.float32)
    maps, scores = det.predict(images, "widget")
    assert maps.shape == (3, IMG, IMG)
    assert scores.shape == (3,)
    assert np.isfinite(maps).all() and np.isfinite(scores).all()


def test_detector_predict_paths(trained):
    root, save_path, cfg, frozen = trained
    det = AnomalyDetector(
        frozen, _restored_trainable(save_path, cfg), cfg, "Synth",
        img_size=IMG, adapted_text=True, compute_dtype=np.float32,
        use_pallas=False)
    img_dir = os.path.join(root, "Synth", "widget", "test", "defect")
    paths = [os.path.join(img_dir, f) for f in sorted(os.listdir(img_dir))[:2]]
    maps, scores = det.predict_paths(paths, "widget")
    assert maps.shape == (2, IMG, IMG)


def test_detector_unknown_class(trained, rng):
    root, save_path, cfg, frozen = trained
    det = AnomalyDetector(
        frozen, _restored_trainable(save_path, cfg), cfg, "Synth",
        img_size=IMG, adapted_text=True, compute_dtype=np.float32,
        use_pallas=False)
    with pytest.raises(KeyError, match="unknown class"):
        det.predict(rng.standard_normal((1, 3, IMG, IMG)).astype(np.float32),
                    "nope")


def _restored_trainable(save_path, cfg):
    from aa_clip_iqm_tpu.train import checkpoint as ckpt

    trainable = adapters_mod.init_adapter_params(jax.random.PRNGKey(1), cfg)
    restored_text = ckpt.load_stage1(save_path, trainable["text_adapter"])
    trainable = dict(trainable)
    trainable["text_adapter"] = restored_text["params"]
    restored = ckpt.load_stage2(save_path, trainable, latest_numbered=True)
    return restored["params"]


def test_predict_buckets_ragged_batches(trained, rng):
    """Ragged caller batch sizes pad to buckets: one compile per bucket,
    not per batch shape, and padding never leaks into the outputs."""
    root, save_path, cfg, frozen = trained
    det = AnomalyDetector(
        frozen, _restored_trainable(save_path, cfg), cfg, "Synth",
        img_size=IMG, adapted_text=True, compute_dtype=np.float32,
        use_pallas=False)
    images = rng.standard_normal((8, 3, IMG, IMG)).astype(np.float32)
    maps8, scores8 = det.predict(images, "widget")
    for n in (1, 2, 3, 5, 8):
        maps, scores = det.predict(images[:n], "widget")
        assert maps.shape == (n, IMG, IMG) and scores.shape == (n,)
        np.testing.assert_allclose(maps, maps8[:n], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(scores, scores8[:n], rtol=1e-4, atol=1e-5)
    if hasattr(det._predict, "_cache_size"):
        # bucket sizes hit: 1 and 8 -> at most 2 compiled programs
        assert det._predict._cache_size() <= 2


def test_micro_batching_service(trained, rng):
    from aa_clip_iqm_tpu.serving import MicroBatchingService

    root, save_path, cfg, frozen = trained
    det = AnomalyDetector(
        frozen, _restored_trainable(save_path, cfg), cfg, "Synth",
        img_size=IMG, adapted_text=True, compute_dtype=np.float32,
        use_pallas=False)
    images = rng.standard_normal((5, 3, IMG, IMG)).astype(np.float32)
    ref_maps, ref_scores = det.predict(images, "widget")

    svc = MicroBatchingService(det, max_batch=4, max_latency_ms=50.0)
    try:
        futs = [svc.submit(images[i], "widget") for i in range(5)]
        for i, fut in enumerate(futs):
            amap, score = fut.result(timeout=60)
            assert amap.shape == (IMG, IMG)
            np.testing.assert_allclose(amap, ref_maps[i], rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(score, ref_scores[i], rtol=1e-4,
                                       atol=1e-5)
        # errors propagate through the future, not the worker thread
        bad = svc.submit(images[0], "nope")
        with pytest.raises(KeyError, match="unknown class"):
            bad.result(timeout=60)
        with pytest.raises(ValueError, match="one"):
            svc.submit(images, "widget")
    finally:
        svc.close()


@pytest.mark.parametrize("weights", ["external", "baked"])
def test_exported_predictor_roundtrip(trained, rng, tmp_path, weights):
    """export_predictor artifacts reload without model code and reproduce
    the live detector's outputs, incl. bucket padding and oversize splits —
    in both weight modes (external weights.npz / baked StableHLO consts)."""
    from aa_clip_iqm_tpu.serving import ExportedPredictor, export_predictor

    root, save_path, cfg, frozen = trained
    det = AnomalyDetector(
        frozen, _restored_trainable(save_path, cfg), cfg, "Synth",
        img_size=IMG, adapted_text=True, compute_dtype=np.float32,
        use_pallas=False)
    out = str(tmp_path / "exported")
    export_predictor(det, out, batch_sizes=(1, 2), weights=weights)

    pred = ExportedPredictor(out)
    assert pred.class_names() == ["widget"]
    assert pred.img_size == IMG

    images = rng.standard_normal((3, 3, IMG, IMG)).astype(np.float32)
    ref_maps, ref_scores = det.predict(images, "widget")
    # n=3 exceeds the largest bucket (2): exercises the split path; n=1
    # exact; n=2 exact bucket.
    for n in (1, 2, 3):
        maps, scores = pred.predict(images[:n], "widget")
        assert maps.shape == (n, IMG, IMG)
        np.testing.assert_allclose(maps, ref_maps[:n], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(scores, ref_scores[:n], rtol=1e-4,
                                   atol=1e-5)
    with pytest.raises(KeyError, match="unknown class"):
        pred.predict(images[:1], "nope")


def test_micro_batching_over_exported(trained, rng, tmp_path):
    """MicroBatchingService composes with the artifact-backed predictor
    (same bucketed-predict contract as the live detector)."""
    from aa_clip_iqm_tpu.serving import (
        ExportedPredictor,
        MicroBatchingService,
        export_predictor,
    )

    root, save_path, cfg, frozen = trained
    det = AnomalyDetector(
        frozen, _restored_trainable(save_path, cfg), cfg, "Synth",
        img_size=IMG, adapted_text=True, compute_dtype=np.float32,
        use_pallas=False)
    out = str(tmp_path / "exported")
    export_predictor(det, out, batch_sizes=(1, 2))
    pred = ExportedPredictor(out)

    images = rng.standard_normal((2, 3, IMG, IMG)).astype(np.float32)
    ref_maps, ref_scores = det.predict(images, "widget")
    svc = MicroBatchingService(pred, max_batch=2, max_latency_ms=50.0)
    try:
        futs = [svc.submit(images[i], "widget") for i in range(2)]
        for i, fut in enumerate(futs):
            amap, score = fut.result(timeout=120)
            np.testing.assert_allclose(amap, ref_maps[i], rtol=1e-4,
                                       atol=1e-5)
            np.testing.assert_allclose(score, ref_scores[i], rtol=1e-4,
                                       atol=1e-5)
    finally:
        svc.close()
    with pytest.raises(ValueError, match="shape-specialized"):
        pred.predict(images[:, :, : IMG // 2], "widget")


def test_exported_predictor_bf16_weights(trained, rng, tmp_path):
    """bfloat16 leaves survive the external weights.npz round trip (npz has
    no bf16 dtype: saved as fp32, restored to the exported signature's
    dtype via the manifest's bf16_keys)."""
    import jax.numpy as jnp

    from aa_clip_iqm_tpu.serving import ExportedPredictor, export_predictor

    root, save_path, cfg, frozen = trained
    trainable = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16),
                             _restored_trainable(save_path, cfg))
    det = AnomalyDetector(
        frozen, trainable, cfg, "Synth", img_size=IMG, adapted_text=True,
        compute_dtype=np.float32, use_pallas=False)
    out = str(tmp_path / "exported")
    export_predictor(det, out, batch_sizes=(2,))

    import json
    with open(os.path.join(out, "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["bf16_keys"] and all(
        k.startswith("trainable/") for k in manifest["bf16_keys"])

    images = rng.standard_normal((2, 3, IMG, IMG)).astype(np.float32)
    ref_maps, ref_scores = det.predict(images, "widget")
    pred = ExportedPredictor(out)
    maps, scores = pred.predict(images, "widget")
    np.testing.assert_allclose(maps, ref_maps, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(scores, ref_scores, rtol=1e-4, atol=1e-5)
