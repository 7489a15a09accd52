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
