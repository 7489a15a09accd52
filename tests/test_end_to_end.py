"""End-to-end smoke: synthetic dataset -> two-stage training -> evaluation.

Runs the full pipeline with the tiny model config on a generated micro-dataset
(no downloads), including checkpoint save/resume and per-class metrics. Uses
single-device jit (the multi-device path is covered by test_parallel.py).
"""
import logging
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aa_clip_iqm_tpu.configs import EvalConfig, TrainConfig, tiny_test_config
from aa_clip_iqm_tpu.data.datasets import get_dataset
from aa_clip_iqm_tpu.data.synthetic import generate, register_synthetic
from aa_clip_iqm_tpu.evaluation.predict import evaluate_dataset, results_table
from aa_clip_iqm_tpu.models import adapters as adapters_mod
from aa_clip_iqm_tpu.models.clip import init_clip_params
from aa_clip_iqm_tpu.train import checkpoint as ckpt
from aa_clip_iqm_tpu.train.driver import compute_frozen_anchors, run_training

IMG = 56  # tiny config image size (4x4 grid of 14px patches)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synthdata"))
    generate(root, n_normal=4, n_anomalous=4, size=IMG, seed=3)
    metadata_root = register_synthetic(root)
    return root, metadata_root


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_config(IMG)
    frozen = init_clip_params(jax.random.PRNGKey(0), cfg.clip)
    trainable = adapters_mod.init_adapter_params(jax.random.PRNGKey(1), cfg)
    return cfg, frozen, trainable


def test_full_pipeline(synth, model, tmp_path):
    _, metadata_root = synth
    cfg, frozen, trainable = model
    save_path = str(tmp_path / "ckpt")
    train_cfg = TrainConfig(
        dataset="Synth", img_size=IMG, training_mode="full_shot", shot=-1,
        text_batch_size=4, image_batch_size=4, text_epoch=1, image_epoch=1,
        save_path=save_path, compute_dtype="float32",
    )
    logger = logging.getLogger("test_e2e")

    trained, anchors = run_training(
        frozen, trainable, cfg, train_cfg, logger,
        metadata_root=metadata_root)

    # anchors exist per class and are unit-norm columns
    a = np.asarray(anchors["widget"])
    assert a.shape == (cfg.clip.embed_dim, 2)
    np.testing.assert_allclose(np.linalg.norm(a, axis=0), 1.0, rtol=1e-4)

    # checkpoints on disk
    assert os.path.isdir(os.path.join(save_path, "text_adapter", "params"))
    assert os.path.isdir(os.path.join(save_path, "image_adapter_1", "params"))

    # training actually changed the trainable params
    before = np.asarray(trainable["image_adapter"]["det_proj"]["w"])
    after = np.asarray(trained["image_adapter"]["det_proj"]["w"])
    assert np.abs(before - after).max() > 0

    # text adapter should NOT change during stage 2
    # (it trained in stage 1 then froze)
    # evaluation
    datasets = get_dataset("Synth", IMG, None, -1, "test",
                           metadata_root=metadata_root)
    eval_cfg = EvalConfig(dataset="Synth", img_size=IMG, batch_size=4,
                          save_path=save_path, compute_dtype="float32")
    rows = evaluate_dataset(frozen, trained, cfg, eval_cfg, datasets, anchors)
    assert rows[-1]["class name"] == "Average"
    for row in rows:
        for key in ("pixel AUC", "pixel AP", "image AUC", "image AP"):
            assert np.isfinite(row[key])
            assert 0.0 <= row[key] <= 100.0
    table = results_table(rows)
    assert "Average" in table

    # eval-style restore of the numbered checkpoint round-trips
    restored = ckpt.load_stage2(save_path, trained, latest_numbered=True)
    assert restored["epoch"] == 1
    r = np.asarray(restored["params"]["image_adapter"]["det_proj"]["w"])
    np.testing.assert_array_equal(r, after)


def test_resume_skips_completed_epochs(synth, model, tmp_path):
    _, metadata_root = synth
    cfg, frozen, trainable = model
    save_path = str(tmp_path / "ckpt2")
    train_cfg = TrainConfig(
        dataset="Synth", img_size=IMG, training_mode="full_shot", shot=-1,
        text_batch_size=4, image_batch_size=4, text_epoch=1, image_epoch=1,
        save_path=save_path, compute_dtype="float32",
    )
    logger = logging.getLogger("test_resume")
    trained1, _ = run_training(frozen, trainable, cfg, train_cfg, logger,
                               metadata_root=metadata_root)
    # Second invocation resumes at the saved epoch counts: no further steps,
    # parameters unchanged.
    trained2, _ = run_training(frozen, trained1, cfg, train_cfg, logger,
                               metadata_root=metadata_root)
    w1 = np.asarray(trained1["image_adapter"]["det_proj"]["w"])
    w2 = np.asarray(trained2["image_adapter"]["det_proj"]["w"])
    np.testing.assert_array_equal(w1, w2)


def test_few_shot_training_mode(synth, model, tmp_path):
    """few_shot mode consumes a {shot}-shot.jsonl produced by the subset
    tool (dataset/__init__.py:226-229 layout)."""
    import subprocess
    import sys

    root, metadata_root = synth
    cfg, frozen, trainable = model
    full = os.path.join(metadata_root, "Synth", "full-shot.jsonl")
    subset = os.path.join(metadata_root, "Synth", "4-shot.jsonl")
    tool = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "gen_metadata.py")
    subprocess.run([sys.executable, tool, "subset", "--full", full,
                    "--shot", "4", "--out", subset], check=True)

    train_cfg = TrainConfig(
        dataset="Synth", img_size=IMG, training_mode="few_shot", shot=4,
        text_batch_size=4, image_batch_size=4, text_epoch=0, image_epoch=1,
        save_path=str(tmp_path / "ckpt_fs"), compute_dtype="float32",
    )
    logger = logging.getLogger("test_fs")
    trained, anchors = run_training(frozen, trainable, cfg, train_cfg, logger,
                                    metadata_root=metadata_root)
    assert os.path.isdir(os.path.join(str(tmp_path / "ckpt_fs"),
                                      "image_adapter_1", "params"))


def test_checkpoint_pruning(synth, model, tmp_path):
    """keep_checkpoints retains only the newest N numbered stage-2 dirs."""
    _, metadata_root = synth
    cfg, frozen, trainable = model
    save_path = str(tmp_path / "ckpt_prune")
    train_cfg = TrainConfig(
        dataset="Synth", img_size=IMG, training_mode="full_shot", shot=-1,
        text_batch_size=4, image_batch_size=4, text_epoch=0, image_epoch=3,
        save_path=save_path, compute_dtype="float32", keep_checkpoints=2,
    )
    run_training(frozen, trainable, cfg, train_cfg,
                 logging.getLogger("test_prune"),
                 metadata_root=metadata_root)
    numbered = sorted(d for d in os.listdir(save_path)
                      if d.startswith("image_adapter_"))
    assert numbered == ["image_adapter_2", "image_adapter_3"]
    # eval restore still finds the latest
    restored = ckpt.load_stage2(save_path, trainable, latest_numbered=True)
    assert restored["epoch"] == 3


def test_zero_shot_predict_without_training(synth, model):
    """The inference path runs with freshly-initialized adapters (zero-shot
    plumbing; quality needs real CLIP weights)."""
    _, metadata_root = synth
    cfg, frozen, trainable = model
    datasets = get_dataset("Synth", IMG, None, -1, "test",
                           metadata_root=metadata_root)
    anchors = compute_frozen_anchors(frozen, trainable, cfg, "Synth",
                                     adapted=False)
    eval_cfg = EvalConfig(dataset="Synth", img_size=IMG, batch_size=3,
                          compute_dtype="float32")
    rows = evaluate_dataset(frozen, trainable, cfg, eval_cfg, datasets,
                            anchors)
    assert len(rows) == 2  # one class + Average


def test_device_normalize_eval_matches_host_normalized(synth, model):
    """The device_normalize eval path (uint8 transfer + on-device CLIP
    normalization — what cli/evaluate.py and the eval bench ship) must
    produce the same metrics as the host-normalized float path.

    Regression guard for a real bug: collate() used to cast the uint8
    images to float32, so predict_fn saw float inputs, skipped its
    on-device normalization, and ran the backbone on raw 0..255 pixels —
    per-item parity tests (test_datasets) never caught it because only
    batches() goes through collate."""
    _, metadata_root = synth
    cfg, frozen, trainable = model
    anchors = compute_frozen_anchors(frozen, trainable, cfg, "Synth",
                                     adapted=False)
    eval_cfg = EvalConfig(dataset="Synth", img_size=IMG, batch_size=3,
                          compute_dtype="float32")
    rows = {}
    for dev_norm in (False, True):
        datasets = get_dataset("Synth", IMG, None, -1, "test",
                               metadata_root=metadata_root,
                               device_normalize=dev_norm)
        if dev_norm:  # the batch (not just the item) must stay uint8
            batch = next(iter(datasets.values())).batches(3).__next__()
            assert batch["image"].dtype == np.uint8
        rows[dev_norm] = evaluate_dataset(frozen, trainable, cfg, eval_cfg,
                                          datasets, anchors)
    for host_row, dev_row in zip(rows[False], rows[True]):
        for key in ("pixel AUC", "pixel AP", "image AUC", "image AP"):
            # identical fp32 normalization math -> metrics match tightly
            assert abs(host_row[key] - dev_row[key]) < 0.05, (
                key, host_row, dev_row)


def test_image_score_mode_dispatch(model):
    """make_predict_fn's image_score_mode switches between the shipped
    per-sample score and the executed-reference transcription (survey Q11);
    both return batch-shaped fp32 logits, and unknown modes fail loudly."""
    from aa_clip_iqm_tpu.evaluation import scoring
    from aa_clip_iqm_tpu.evaluation.predict import make_predict_fn

    cfg, frozen, trainable = model
    rng = np.random.default_rng(5)
    images = jnp.asarray(rng.standard_normal((3, 3, IMG, IMG)),
                         dtype=jnp.float32)
    anchors = jnp.asarray(rng.standard_normal((3, cfg.clip.embed_dim, 2)),
                          dtype=jnp.float32)

    out = {}
    for mode in ("fixed", "reference_eval"):
        fn = make_predict_fn(cfg, IMG, "Industrial", image_score_mode=mode)
        _, logit = fn(frozen, trainable, images, anchors)
        out[mode] = np.asarray(logit)
        assert out[mode].shape == (3,)

    # The two semantics differ on generic inputs, and each matches its
    # scoring function applied to the model's det token.
    det = adapters_mod.encode_image_adapted(
        frozen, trainable, cfg, images, text_anchors=anchors).det_token
    np.testing.assert_allclose(
        out["fixed"], np.asarray(scoring.image_logit(det, anchors)),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        out["reference_eval"],
        np.asarray(scoring.image_logit_reference_eval(det, anchors)),
        rtol=1e-4, atol=1e-5)
    assert np.abs(out["fixed"] - out["reference_eval"]).max() > 1e-6

    with pytest.raises(ValueError):
        make_predict_fn(cfg, IMG, "Industrial", image_score_mode="bogus")


def test_reference_eval_rejects_one_sample_tail(synth, model):
    """predict_class in reference_eval mode refuses a tail batch with one
    valid sample: sample index 1 would be a zero-padded row, silently scoring
    the batch from padding (the executed reference crashes there instead —
    pred[:, 1] on a size-1 batch). The default mode accepts the same batch
    composition."""
    from aa_clip_iqm_tpu.evaluation.predict import (
        make_predict_fn,
        predict_class,
    )

    _, metadata_root = synth
    cfg, frozen, trainable = model
    datasets = get_dataset("Synth", IMG, None, -1, "test",
                           metadata_root=metadata_root)
    dataset = next(iter(datasets.values()))
    n = len(dataset)
    assert n >= 3, "synthetic test split too small for a 1-sample tail"
    batch = n - 1  # tail batch has exactly one valid sample
    anchor = jnp.asarray(
        np.random.default_rng(0).standard_normal((cfg.clip.embed_dim, 2)),
        dtype=jnp.float32)

    fn = make_predict_fn(cfg, IMG, "Industrial",
                         image_score_mode="reference_eval")
    with pytest.raises(ValueError, match="reference_eval"):
        predict_class(fn, frozen, trainable, dataset, anchor, batch,
                      image_score_mode="reference_eval")

    out = predict_class(make_predict_fn(cfg, IMG, "Industrial"), frozen,
                        trainable, dataset, anchor, batch)
    assert out["image_scores"].shape == (n,)


def test_predict_class_tail_bucketing(synth, model):
    """Tail batches pad to the smallest power-of-two bucket, not the full
    batch size, and results are identical to full-batch padding (VERDICT r3
    weak item 4: a 33-image class at batch 32 must not run 64 images)."""
    from aa_clip_iqm_tpu.evaluation.predict import (
        _tail_buckets,
        make_predict_fn,
        predict_class,
    )

    assert _tail_buckets(32) == (1, 2, 4, 8, 16, 32)
    assert _tail_buckets(6) == (1, 2, 4, 6)

    _, metadata_root = synth
    cfg, frozen, trainable = model
    datasets = get_dataset("Synth", IMG, None, -1, "test",
                           metadata_root=metadata_root)
    dataset = next(iter(datasets.values()))
    n = len(dataset)
    batch = n - 1  # -> one full batch + a 1-sample tail
    anchor = jnp.asarray(
        np.random.default_rng(0).standard_normal((cfg.clip.embed_dim, 2)),
        dtype=jnp.float32)

    fn = make_predict_fn(cfg, IMG, "Industrial")
    seen = []

    def spy(frozen_, trainable_, images, anchors):
        seen.append(images.shape[0])
        return fn(frozen_, trainable_, images, anchors)

    out = predict_class(spy, frozen, trainable, dataset, anchor, batch)
    assert seen == [batch, 1]  # tail ran at bucket 1, not batch
    full = predict_class(fn, frozen, trainable, dataset, anchor, batch,
                         buckets=(batch,))
    np.testing.assert_allclose(out["maps"], full["maps"], rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(out["image_scores"], full["image_scores"],
                               rtol=1e-5, atol=1e-6)
    assert out["file_names"] == full["file_names"]
