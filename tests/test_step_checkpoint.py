"""Mid-epoch step checkpointing + deterministic in-epoch resume.

The reference resumes at epoch granularity only (train.py:356-375). The step
tier (TrainConfig.checkpoint_every_steps) must satisfy a stronger contract:
a run interrupted after k steps and resumed reaches BIT-IDENTICAL parameters
vs an uninterrupted run, in both stages. That requires the epoch data order
to be a pure function of (seed, epoch) (TrainDataset.epoch_batches) and the
per-step dropout keys to be fold_in-derived, both verified here, plus the
per-step scalars.jsonl schema (SURVEY §5).
"""
import json
import logging
import os

import numpy as np
import pytest

import jax

from aa_clip_iqm_tpu.configs import TrainConfig, tiny_test_config
from aa_clip_iqm_tpu.data.datasets import TrainDataset, get_dataset
from aa_clip_iqm_tpu.data.synthetic import generate, register_synthetic
from aa_clip_iqm_tpu.models import adapters as adapters_mod
from aa_clip_iqm_tpu.models.clip import init_clip_params
from aa_clip_iqm_tpu.train.driver import (
    compute_frozen_anchors,
    run_stage1,
    run_stage2,
)

IMG = 56


class SimulatedOutage(Exception):
    pass


class InterruptAfter:
    """Dataset wrapper that simulates a mid-run crash after n_steps batches
    (total, across epochs) — the tunnel-outage failure mode this feature
    exists for."""

    def __init__(self, ds, n_steps: int):
        self.ds = ds
        self.remaining = n_steps

    def __len__(self):
        return len(self.ds)

    def epoch_batches(self, epoch, batch_size, start_batch=0, **kw):
        for batch in self.ds.epoch_batches(epoch, batch_size,
                                           start_batch=start_batch, **kw):
            if self.remaining <= 0:
                raise SimulatedOutage(f"interrupted in epoch {epoch}")
            self.remaining -= 1
            yield batch


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synthdata"))
    generate(root, n_normal=4, n_anomalous=4, size=IMG, seed=3)
    return register_synthetic(root)


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_config(IMG)
    frozen = init_clip_params(jax.random.PRNGKey(0), cfg.clip)
    trainable = adapters_mod.init_adapter_params(jax.random.PRNGKey(1), cfg)
    return cfg, frozen, trainable


def _train_cfg(save_path, **kw):
    base = dict(dataset="Synth", img_size=IMG, training_mode="full_shot",
                shot=-1, text_batch_size=4, image_batch_size=4, text_epoch=2,
                image_epoch=2, save_path=save_path, compute_dtype="float32",
                checkpoint_every_steps=1)
    base.update(kw)
    return TrainConfig(**base)


@pytest.fixture(scope="module")
def data(synth):
    logger = logging.getLogger("test_step_ckpt")
    text_ds, image_ds = get_dataset("Synth", IMG, "full_shot", -1, "train",
                                    logger, metadata_root=synth)
    return text_ds, image_ds


def _assert_trees_equal(a, b):
    leaves_a = jax.tree.leaves(a)
    leaves_b = jax.tree.leaves(b)
    assert len(leaves_a) == len(leaves_b)
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_epoch_batches_deterministic(data, monkeypatch):
    """The epoch stream is a pure function of (seed, epoch): replayable,
    epoch-distinct, start_batch-skippable, and worker-count invariant."""
    _, image_ds = data
    ref = list(image_ds.epoch_batches(1, 4))
    replay = list(image_ds.epoch_batches(1, 4))
    assert len(ref) == 2
    for a, b in zip(ref, replay):
        np.testing.assert_array_equal(a["image"], b["image"])
        assert a["file_name"] == b["file_name"]

    other = list(image_ds.epoch_batches(2, 4))
    assert any(a["file_name"] != b["file_name"]
               or np.abs(a["image"] - b["image"]).max() > 0
               for a, b in zip(ref, other))

    skipped = list(image_ds.epoch_batches(1, 4, start_batch=1))
    assert len(skipped) == 1
    np.testing.assert_array_equal(skipped[0]["image"], ref[1]["image"])

    monkeypatch.setenv("AACLIP_DATA_WORKERS", "2")
    threaded = list(image_ds.epoch_batches(1, 4))
    for a, b in zip(ref, threaded):
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["mask"], b["mask"])


def test_stage1_interrupt_resume_bit_identical(synth, model, data, tmp_path):
    cfg, frozen, trainable = model
    text_ds, _ = data
    logger = logging.getLogger("test_step_ckpt")

    # Uninterrupted baseline: 2 epochs x 2 steps.
    straight = run_stage1(frozen, trainable, cfg,
                          _train_cfg(str(tmp_path / "s1_a")), text_ds, logger)

    # Interrupt after 3 of the 4 steps (mid-epoch 1), then resume.
    cfg_b = _train_cfg(str(tmp_path / "s1_b"))
    with pytest.raises(SimulatedOutage):
        run_stage1(frozen, trainable, cfg, cfg_b, InterruptAfter(text_ds, 3),
                   logger)
    assert os.path.isdir(os.path.join(cfg_b.save_path, "text_adapter_step"))
    resumed = run_stage1(frozen, trainable, cfg, cfg_b, text_ds, logger)

    _assert_trees_equal(straight["text_adapter"], resumed["text_adapter"])
    # completing the stage cleared the step checkpoint
    assert not os.path.isdir(os.path.join(cfg_b.save_path,
                                          "text_adapter_step"))


def test_stage2_interrupt_resume_bit_identical(synth, model, data, tmp_path):
    cfg, frozen, trainable = model
    _, image_ds = data
    logger = logging.getLogger("test_step_ckpt")
    anchors = compute_frozen_anchors(frozen, trainable, cfg, "Synth",
                                     adapted=False)

    straight = run_stage2(frozen, trainable, cfg,
                          _train_cfg(str(tmp_path / "s2_a")), image_ds,
                          anchors, logger)

    cfg_b = _train_cfg(str(tmp_path / "s2_b"))
    with pytest.raises(SimulatedOutage):
        run_stage2(frozen, trainable, cfg, cfg_b,
                   InterruptAfter(image_ds, 3), anchors, logger)
    resumed = run_stage2(frozen, trainable, cfg, cfg_b, image_ds, anchors,
                         logger)

    _assert_trees_equal(straight, resumed)
    assert not os.path.isdir(os.path.join(cfg_b.save_path,
                                          "image_adapter_step"))

    # scalars.jsonl: epoch 0 written by the interrupted run, the resumed
    # run appends epoch 1 from its resume step on (the interrupted epoch's
    # in-flight losses are lost by design — no per-step sync).
    rows = [json.loads(line) for line in
            open(os.path.join(cfg_b.save_path, "scalars.jsonl"))]
    assert [(r["epoch"], r["step"]) for r in rows] == [(0, 0), (0, 1), (1, 1)]


def test_stage2_patch_dropout_resume_bit_identical(synth, model, data,
                                                   tmp_path):
    """The per-step fold_in key derivation makes resume exact even with
    patch dropout active (the RNG-bearing stage-2 path)."""
    import dataclasses

    cfg, frozen, _ = model
    cfg = dataclasses.replace(
        cfg, clip=dataclasses.replace(
            cfg.clip, vision=dataclasses.replace(cfg.clip.vision,
                                                 patch_dropout=0.25)))
    trainable = adapters_mod.init_adapter_params(jax.random.PRNGKey(1), cfg)
    _, image_ds = data
    logger = logging.getLogger("test_step_ckpt")
    anchors = compute_frozen_anchors(frozen, trainable, cfg, "Synth",
                                     adapted=False)

    straight = run_stage2(frozen, trainable, cfg,
                          _train_cfg(str(tmp_path / "pd_a"), image_epoch=1),
                          image_ds, anchors, logger)
    cfg_b = _train_cfg(str(tmp_path / "pd_b"), image_epoch=1)
    with pytest.raises(SimulatedOutage):
        run_stage2(frozen, trainable, cfg, cfg_b,
                   InterruptAfter(image_ds, 1), anchors, logger)
    resumed = run_stage2(frozen, trainable, cfg, cfg_b, image_ds, anchors,
                         logger)
    _assert_trees_equal(straight, resumed)


def test_scalars_schema_and_lr(synth, model, data, tmp_path):
    """Per-step scalars: pinned schema, per-epoch step indexing, and the lr
    column following the image-group cosine schedule."""
    from aa_clip_iqm_tpu.train import optim

    cfg, frozen, trainable = model
    text_ds, image_ds = data
    logger = logging.getLogger("test_step_ckpt")
    anchors = compute_frozen_anchors(frozen, trainable, cfg, "Synth",
                                     adapted=False)
    train_cfg = _train_cfg(str(tmp_path / "scal"), checkpoint_every_steps=0)
    run_stage1(frozen, trainable, cfg, train_cfg, text_ds, logger)
    run_stage2(frozen, trainable, cfg, train_cfg, image_ds, anchors, logger)

    rows = [json.loads(line) for line in
            open(os.path.join(train_cfg.save_path, "scalars.jsonl"))]
    assert all(set(r) == {"stage", "epoch", "step", "loss", "lr", "wall_ms"}
               for r in rows)
    s1 = [r for r in rows if r["stage"] == "stage1"]
    s2 = [r for r in rows if r["stage"] == "stage2"]
    # 8 samples / batch 4 = 2 steps/epoch, 2 epochs per stage
    assert [(r["epoch"], r["step"]) for r in s1] == \
        [(0, 0), (0, 1), (1, 0), (1, 1)]
    assert [(r["epoch"], r["step"]) for r in s2] == \
        [(0, 0), (0, 1), (1, 0), (1, 1)]
    assert all(np.isfinite(r["loss"]) and r["wall_ms"] > 0 for r in rows)
    assert all(r["lr"] == train_cfg.text_lr for r in s1)
    sched = optim.cosine_annealing(train_cfg.image_lr, 4)
    for g, r in enumerate(s2):
        np.testing.assert_allclose(r["lr"], float(sched(g)), rtol=1e-6)


def test_async_saver_snapshot_survives_donation(tmp_path):
    """_StepSaver must checkpoint the state AT save time: the device-copy
    snapshot is enqueued before the next step donates/overwrites the
    buffers, so the background write sees pre-donation values."""
    import jax.numpy as jnp

    from aa_clip_iqm_tpu.train import checkpoint as ckpt
    from aa_clip_iqm_tpu.train.driver import _StepSaver

    params = {"w": jnp.arange(8, dtype=jnp.float32)}
    opt = {"mu": jnp.ones(8, jnp.float32)}
    saver = _StepSaver(use_async=True)
    saver.save(str(tmp_path), "stage2", 3, 7, params, opt)

    # Simulate the next training step consuming the buffers via donation.
    bump = jax.jit(lambda x: x + 100.0, donate_argnums=0)
    params = {"w": bump(params["w"])}
    opt = {"mu": bump(opt["mu"])}
    saver.wait()

    restored = ckpt.load_step(str(tmp_path), "stage2",
                              {"w": jnp.zeros(8, jnp.float32)},
                              {"mu": jnp.zeros(8, jnp.float32)})
    assert restored["epoch"] == 3 and restored["step"] == 7
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.arange(8, dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(restored["opt_state"]["mu"]),
                                  np.ones(8, np.float32))


def test_async_saver_surfaces_write_errors(tmp_path, monkeypatch):
    """A failed background write raises on the next wait(), not silently."""
    import jax.numpy as jnp

    from aa_clip_iqm_tpu.train import checkpoint as ckpt
    from aa_clip_iqm_tpu.train.driver import _StepSaver

    def boom(*a, **k):
        raise RuntimeError("disk full")

    monkeypatch.setattr(ckpt, "save_step", boom)
    saver = _StepSaver(use_async=True)
    saver.save(str(tmp_path), "stage1", 0, 1,
               {"w": jnp.zeros(2)}, {"mu": jnp.zeros(2)})
    with pytest.raises(RuntimeError, match="disk full"):
        saver.wait()
    # the error is consumed: a subsequent wait is clean
    saver.wait()
