"""Patch-dropout training switch: wiring through stage 2.

The reference configures patch_dropout=0.2 (model/model.py:29) but holds the
model in eval() for all of training (train.py:333, survey Q5) so it never
activates. Here it is an explicit opt-in: these tests cover the index op, the
token-count contract (training shrinks, eval unchanged), the token-resolution
seg-loss path, and a full stage-2 step with dropout on.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aa_clip_iqm_tpu.configs import TrainConfig, tiny_test_config
from aa_clip_iqm_tpu.evaluation.scoring import mask_to_patch_cells
from aa_clip_iqm_tpu.models import adapters as adapters_mod
from aa_clip_iqm_tpu.models.clip import init_clip_params
from aa_clip_iqm_tpu.ops.layers import patch_dropout_indices
from aa_clip_iqm_tpu.train import optim, steps

IMG = 56  # tiny config: 4x4 grid of 14px patches -> L=16
RATE = 0.25


def _cfg(rate=RATE):
    cfg = tiny_test_config(IMG)
    return dataclasses.replace(
        cfg, clip=dataclasses.replace(
            cfg.clip, vision=dataclasses.replace(
                cfg.clip.vision, patch_dropout=rate)))


@pytest.fixture(scope="module")
def model():
    cfg = _cfg()
    frozen = init_clip_params(jax.random.PRNGKey(0), cfg.clip)
    trainable = adapters_mod.init_adapter_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(7)
    images = rng.standard_normal((2, 3, IMG, IMG)).astype(np.float32)
    anchors = rng.standard_normal((2, cfg.clip.embed_dim, 2)).astype(np.float32)
    return cfg, frozen, trainable, jnp.asarray(images), jnp.asarray(anchors)


def test_indices_sorted_unique_in_range():
    idx = np.asarray(patch_dropout_indices(jax.random.PRNGKey(3), 4, 16, RATE))
    assert idx.shape == (4, 12)  # keep = int(16 * 0.75)
    for row in idx:
        assert (np.diff(row) > 0).all()        # sorted, no repeats
        assert row.min() >= 0 and row.max() < 16


def test_training_mode_shrinks_tokens(model):
    cfg, frozen, trainable, images, anchors = model
    l_full = cfg.clip.vision.num_patches
    keep = int(l_full * (1 - RATE))
    out = adapters_mod.encode_image_adapted(
        frozen, trainable, cfg, images, text_anchors=anchors,
        patch_drop_rng=jax.random.PRNGKey(5))
    assert out.keep_idx.shape == (2, keep)
    for s in out.seg_tokens:
        assert s.shape[1] == keep
    assert out.det_token.shape == (2, cfg.clip.embed_dim)
    assert out.iqm_queries.shape == (2, 2, cfg.iqm.hidden_size)


def test_eval_path_unchanged(model):
    """No rng (eval) -> full token count, identical to a rate-0 config."""
    cfg, frozen, trainable, images, anchors = model
    out = adapters_mod.encode_image_adapted(
        frozen, trainable, cfg, images, text_anchors=anchors)
    assert out.keep_idx is None
    cfg0 = _cfg(0.0)
    out0 = adapters_mod.encode_image_adapted(
        frozen, trainable, cfg0, images, text_anchors=anchors,
        patch_drop_rng=jax.random.PRNGKey(5))
    assert out0.keep_idx is None
    for s, s0 in zip(out.seg_tokens, out0.seg_tokens):
        assert s.shape[1] == cfg.clip.vision.num_patches
        np.testing.assert_array_equal(np.asarray(s), np.asarray(s0))


def test_mask_to_patch_cells_row_major():
    mask = np.zeros((1, 1, IMG, IMG), np.float32)
    # fully defective patch at grid cell (row 1, col 2) -> index 1*4+2 = 6
    mask[0, 0, 14:28, 28:42] = 1.0
    # half-defective patch at (3, 0) -> index 12
    mask[0, 0, 42:49, 0:14] = 1.0
    cells = np.asarray(mask_to_patch_cells(jnp.asarray(mask), 14))
    assert cells.shape == (1, 16)
    assert cells[0, 6] == pytest.approx(1.0)
    assert cells[0, 12] == pytest.approx(0.5)
    assert np.delete(cells[0], [6, 12]).max() == 0.0


def test_stage2_step_with_dropout(model):
    cfg, frozen, trainable, images, anchors = model
    train_cfg = TrainConfig(img_size=IMG, image_epoch=1,
                            compute_dtype="float32")
    tx = optim.stage2_optimizer(trainable, train_cfg.image_lr, 10)
    opt_state = tx.init(trainable)
    step = steps.make_stage2_step(cfg, train_cfg, tx)

    masks = jnp.zeros((2, 1, IMG, IMG), jnp.float32)
    masks = masks.at[1, 0, 14:28, 28:42].set(1.0)
    labels = jnp.asarray([0, 1], jnp.int32)
    weights = jnp.ones((2,), jnp.float32)
    # snapshot before the step: the step donates the trainable buffers
    before = np.asarray(trainable["image_adapter"]["det_proj"]["w"])
    q_before = np.asarray(trainable["query_proj"]["w"])

    new_params, opt_state, loss = step(
        trainable, opt_state, frozen, images, masks, labels, anchors,
        weights, jax.random.PRNGKey(11))
    assert np.isfinite(float(loss))
    after = np.asarray(new_params["image_adapter"]["det_proj"]["w"])
    assert np.abs(before - after).max() > 0
    # IQM family receives gradient through the token-resolution loss too
    q_after = np.asarray(new_params["query_proj"]["w"])
    assert np.abs(q_before - q_after).max() > 0
