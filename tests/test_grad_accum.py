"""Stage-2 gradient accumulation (TrainConfig.grad_accum_steps).

No reference analogue (the reference trains single-GPU full-batch,
train.py:299-300); this is the TPU-first memory/batch decoupling: the jitted
step lax.scans over microbatches, so peak activation memory is one
microbatch's while the optimizer update is EXACTLY the full-batch one.
Exactness holds because every loss term is ``const + weighted-mean`` over
per-sample values (ops/losses.py) — verified here against the unaccumulated
step, including zero-weight (padding) rows and a fully-padded microbatch.
"""
import logging

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aa_clip_iqm_tpu.configs import TrainConfig, tiny_test_config
from aa_clip_iqm_tpu.models import adapters as adapters_mod
from aa_clip_iqm_tpu.models.clip import init_clip_params
from aa_clip_iqm_tpu.train import optim, steps

IMG = 56


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_config(IMG)
    frozen = init_clip_params(jax.random.PRNGKey(0), cfg.clip)
    trainable = adapters_mod.init_adapter_params(jax.random.PRNGKey(1), cfg)
    return cfg, frozen, trainable


def _batch(b, weights=None):
    rng = np.random.default_rng(7)
    images = jnp.asarray(rng.standard_normal((b, 3, IMG, IMG)), jnp.float32)
    masks = jnp.asarray((rng.random((b, 1, IMG, IMG)) > 0.8), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 2, b), jnp.int64)
    anchors = jnp.asarray(rng.standard_normal((b, 32, 2)), jnp.float32)
    w = jnp.ones(b, jnp.float32) if weights is None \
        else jnp.asarray(weights, jnp.float32)
    return images, masks, labels, anchors, w


def _steps_pair(cfg, trainable, accum, tx=None, **kw):
    base = TrainConfig(img_size=IMG, image_epoch=1, compute_dtype="float32")
    if tx is None:
        tx = optim.stage2_optimizer(trainable, base.image_lr, 10)
    opt_state = tx.init(trainable)
    full = steps.make_stage2_step(cfg, base, tx, compute_dtype=jnp.float32,
                                  donate=False, **kw)
    acc_cfg = TrainConfig(img_size=IMG, image_epoch=1,
                          compute_dtype="float32", grad_accum_steps=accum)
    accd = steps.make_stage2_step(cfg, acc_cfg, tx, compute_dtype=jnp.float32,
                                  donate=False, **kw)
    return full, accd, opt_state


def _assert_trees_close(a, b, rtol=2e-5, atol=1e-6):
    flat_a = jax.tree.leaves(a)
    flat_b = jax.tree.leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


def test_grad_accum_matches_full_batch(model):
    """Through the REAL optimizer (AdamW groups). atol 1e-5 not 1e-6:
    Adam's m/(sqrt(v)+eps) amplifies fp32 summation-order noise for
    near-zero gradient coordinates; the update scale is 5e-4, so 1e-5
    still pins the math (the gradient-exactness test below uses SGD)."""
    cfg, frozen, trainable = model
    full, accd, opt_state = _steps_pair(cfg, trainable, accum=4)
    args = _batch(8)
    t1, o1, loss1 = full(trainable, opt_state, frozen, *args)
    t4, o4, loss4 = accd(trainable, opt_state, frozen, *args)
    np.testing.assert_allclose(float(loss1), float(loss4), rtol=1e-5)
    _assert_trees_close(t1, t4, rtol=1e-4, atol=1e-5)
    _assert_trees_close(o1, o4, rtol=1e-4, atol=1e-5)


def test_grad_accum_weighted_and_padded_microbatch(model):
    """Zero-weight rows (batch padding), including microbatch 3 being
    ENTIRELY padding — its numerator contribution must be exactly zero.
    SGD(1.0) makes the parameter delta literally the gradient, so this
    compares accumulated vs full-batch GRADIENTS at fp32-reorder
    tolerance with no optimizer amplification."""
    import optax

    cfg, frozen, trainable = model
    full, accd, opt_state = _steps_pair(cfg, trainable, accum=4,
                                        tx=optax.sgd(1.0))
    weights = [1, 1, 1, 1, 1, 0, 0, 0]  # microbatches of 2: last is all-pad
    args = _batch(8, weights=weights)
    t1, _, loss1 = full(trainable, opt_state, frozen, *args)
    t4, _, loss4 = accd(trainable, opt_state, frozen, *args)
    np.testing.assert_allclose(float(loss1), float(loss4), rtol=1e-5)
    _assert_trees_close(t1, t4)


def test_grad_accum_under_mesh_matches_single_device(model):
    from aa_clip_iqm_tpu.parallel import mesh as mesh_mod

    cfg, frozen, trainable = model
    full, _, opt_state = _steps_pair(cfg, trainable, accum=2)
    mesh = mesh_mod.make_mesh()
    acc_cfg = TrainConfig(img_size=IMG, image_epoch=1,
                          compute_dtype="float32", grad_accum_steps=2)
    tx = optim.stage2_optimizer(trainable, acc_cfg.image_lr, 10)
    sharded = steps.make_stage2_step(cfg, acc_cfg, tx,
                                     compute_dtype=jnp.float32, mesh=mesh,
                                     donate=False)
    args = _batch(16)
    t1, _, loss1 = full(trainable, opt_state, frozen, *args)
    t8, _, loss8 = sharded(trainable, opt_state, frozen, *args)
    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-4)
    _assert_trees_close(t1, t8, rtol=1e-4, atol=1e-5)


def test_grad_accum_patch_dropout_deterministic(model):
    import dataclasses

    cfg, frozen, _ = model
    clip = dataclasses.replace(
        cfg.clip, vision=dataclasses.replace(cfg.clip.vision,
                                             patch_dropout=0.5))
    cfg_pd = dataclasses.replace(cfg, clip=clip)
    trainable = adapters_mod.init_adapter_params(jax.random.PRNGKey(1), cfg_pd)
    acc_cfg = TrainConfig(img_size=IMG, image_epoch=1,
                          compute_dtype="float32", grad_accum_steps=2)
    tx = optim.stage2_optimizer(trainable, acc_cfg.image_lr, 10)
    opt_state = tx.init(trainable)
    step = steps.make_stage2_step(cfg_pd, acc_cfg, tx,
                                  compute_dtype=jnp.float32, donate=False)
    args = _batch(4)
    rng = jax.random.PRNGKey(9)
    t_a, _, loss_a = step(trainable, opt_state, frozen, *args, rng)
    t_b, _, loss_b = step(trainable, opt_state, frozen, *args, rng)
    assert float(loss_a) == float(loss_b)  # bitwise deterministic
    for x, y in zip(jax.tree.leaves(t_a), jax.tree.leaves(t_b)):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_grad_accum_rejects_indivisible_batch(model):
    cfg, frozen, trainable = model
    _, accd, opt_state = _steps_pair(cfg, trainable, accum=4)
    args = _batch(6)  # 6 % 4 != 0
    with pytest.raises(ValueError, match="grad_accum"):
        accd(trainable, opt_state, frozen, *args)


def test_driver_validates_batch_divisibility(tmp_path):
    from aa_clip_iqm_tpu.train.driver import run_stage2

    cfg = tiny_test_config(IMG)
    frozen = init_clip_params(jax.random.PRNGKey(0), cfg.clip)
    trainable = adapters_mod.init_adapter_params(jax.random.PRNGKey(1), cfg)
    bad = TrainConfig(img_size=IMG, image_batch_size=3, grad_accum_steps=2,
                      save_path=str(tmp_path), compute_dtype="float32")
    with pytest.raises(ValueError, match="divisible"):
        run_stage2(frozen, trainable, cfg, bad, [], {},
                   logging.getLogger("t"))
