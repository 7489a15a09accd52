"""Two-stage training orchestration (reference train.py:240-436).

run_training(frozen, model_cfg, train_cfg) executes:
  stage 1 — text-anchor adaptation with checkpoint-resume;
  anchor freeze — adapted (or raw, if text_epoch==0) per-class anchors;
  stage 2 — image adapter + IQM training with per-epoch checkpoints.

Data parallelism: when a mesh is provided, batches are sharded over its
'data' axis and the jitted steps carry sharding annotations (XLA inserts the
gradient psums over ICI).
"""
from __future__ import annotations

import functools
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import ModelConfig, TrainConfig
from ..data.datasets import get_dataset, prefetch
from ..models import adapters as adapters_mod
from ..prompts import batched_prompt_tokens
from . import checkpoint as ckpt
from . import optim, steps


def _dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


def _pad_batch(batch, multiple: int):
    """Zero-pad the batch to a device-count multiple; the returned n_valid
    feeds a per-sample weight mask so padded rows carry zero loss."""
    n = batch["image"].shape[0]
    if n % multiple == 0:
        return batch, n
    pad = multiple - n % multiple

    def pad_arr(x):
        return np.concatenate(
            [x, np.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)

    out = dict(batch)
    for key in ("image", "mask"):
        out[key] = pad_arr(batch[key])
    out["label"] = np.concatenate([batch["label"], np.zeros(pad, np.int64)])
    out["class_name"] = list(batch["class_name"]) + \
        [batch["class_name"][-1]] * pad
    return out, n


def run_stage1(frozen, trainable, model_cfg: ModelConfig,
               train_cfg: TrainConfig, text_dataset, logger,
               mesh=None, use_pallas: bool = False):
    """Returns updated trainable with the adapted text adapter."""
    dtype = _dtype(train_cfg.compute_dtype)
    classes, prompt_toks, n_norm, n_abn = batched_prompt_tokens(
        train_cfg.dataset)
    class_to_idx = {c: i for i, c in enumerate(classes)}

    tx = optim.stage1_optimizer(train_cfg.text_lr)
    text_params = trainable["text_adapter"]
    opt_state = tx.init(text_params)
    start_epoch = 0

    restored = ckpt.load_stage1(train_cfg.save_path, text_params, opt_state)
    if restored is not None:
        text_params = restored["params"]
        if restored["opt_state"] is not None:
            opt_state = restored["opt_state"]
        start_epoch = restored["epoch"]
        logger.info("resumed stage 1 from epoch %d", start_epoch)

    visual_fn = steps.make_stage1_visual_fn(
        model_cfg, compute_dtype=dtype, use_pallas=use_pallas, mesh=mesh)
    step_fn = steps.make_stage1_step(
        model_cfg, train_cfg, prompt_toks, len(classes), n_norm, n_abn,
        tx, compute_dtype=dtype, mesh=mesh)

    n_dev = 1 if mesh is None else mesh.devices.size
    for epoch in range(start_epoch, train_cfg.text_epoch):
        logger.info("training text epoch %d:", epoch)
        losses = []
        t0 = time.time()
        for batch in prefetch(text_dataset.batches(
                train_cfg.text_batch_size, shuffle=True)):
            batch, n_valid = _pad_batch(batch, n_dev)
            images = jnp.asarray(batch["image"])
            masks = jnp.asarray(batch["mask"])
            class_idx = jnp.asarray(
                [class_to_idx[c] for c in batch["class_name"]], jnp.int32)
            weights = jnp.asarray(
                (np.arange(images.shape[0]) < n_valid).astype(np.float32))
            patch_feats = visual_fn(frozen, images)
            text_params, opt_state, loss = step_fn(
                text_params, opt_state, frozen, patch_feats, masks, class_idx,
                weights)
            # keep the loss on device: fetching per step would synchronize
            # the dispatch pipeline every iteration
            losses.append(loss)
        mean_loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
        logger.info("loss: %f (%.1fs)", mean_loss, time.time() - t0)
        ckpt.save_stage1(train_cfg.save_path, epoch + 1, text_params, opt_state)

    trainable = dict(trainable)
    trainable["text_adapter"] = text_params
    return trainable


@functools.lru_cache(maxsize=8)
def _anchors_program(model_cfg: ModelConfig, adapted: bool, compute_dtype,
                     n_classes: int, n_norm: int, n_abn: int):
    """One jitted text-tower + anchor-reduction program, LRU-cached on its
    static configuration. Without the jit the 12-layer text encoder runs
    eagerly — hundreds of op dispatches, each a host->device round trip on
    remote-attached accelerators — and without the cache every
    compute_frozen_anchors call would re-trace it."""
    from ..prompts import anchors_from_flat_embeddings

    def f(frozen, trainable, tokens):
        if adapted:
            emb = adapters_mod.encode_text_adapted(
                frozen, trainable, model_cfg, tokens,
                compute_dtype=compute_dtype)
        else:
            emb = adapters_mod.encode_text_frozen(
                frozen, model_cfg, tokens, compute_dtype=compute_dtype)
        return anchors_from_flat_embeddings(emb, n_classes, n_norm, n_abn)

    return jax.jit(f)


def compute_frozen_anchors(frozen, trainable, model_cfg: ModelConfig,
                           dataset_name: str, adapted: bool,
                           compute_dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """Per-class anchors with the adapted (or raw when text_epoch==0 —
    train.py:417-423) text encoder.

    All classes' prompt sentences go through one batched encoder call (the
    reference loops classes x states through separate forwards,
    forward_utils.py:185-192 — identical math, one compile, one dispatch),
    jitted end-to-end through the anchor reduction (_anchors_program).
    """
    classes, tokens, n_norm, n_abn = batched_prompt_tokens(dataset_name)
    program = _anchors_program(model_cfg, adapted, compute_dtype,
                               len(classes), n_norm, n_abn)
    anchors = program(frozen, trainable, tokens)
    return {c: anchors[i] for i, c in enumerate(classes)}


def run_stage2(frozen, trainable, model_cfg: ModelConfig,
               train_cfg: TrainConfig, image_dataset, anchors, logger,
               mesh=None, use_pallas: bool = False):
    dtype = _dtype(train_cfg.compute_dtype)
    # ceil: batches() yields the partial tail batch (reference DataLoader
    # default drop_last=False, train.py:394-396), so the schedule must count
    # it too.
    steps_per_epoch = max(1, -(-len(image_dataset)
                               // train_cfg.image_batch_size))
    total_steps = steps_per_epoch * train_cfg.image_epoch
    tx = optim.stage2_optimizer(
        trainable, train_cfg.image_lr, total_steps,
        iqm_lr_scale=train_cfg.iqm_lr_scale,
        image_wd=train_cfg.image_weight_decay,
        iqm_wd=train_cfg.iqm_weight_decay,
        torch_quirk_period_steps=(train_cfg.image_epoch
                                  if train_cfg.torch_lr_quirk else None))
    opt_state = tx.init(trainable)
    start_epoch = 0

    restored = ckpt.load_stage2(train_cfg.save_path, trainable, opt_state)
    if restored is not None:
        trainable = restored["params"]
        if restored["opt_state"] is not None:
            opt_state = restored["opt_state"]
        start_epoch = restored["epoch"]
        logger.info("resumed stage 2 from epoch %d", start_epoch)

    step_fn = steps.make_stage2_step(
        model_cfg, train_cfg, tx, compute_dtype=dtype, use_pallas=use_pallas,
        mesh=mesh, clip_grad_norm=train_cfg.clip_grad_norm)
    # The step donates its trainable/opt-state inputs (their HBM is reused
    # for the outputs). Copy once up front so the *caller's* pytree stays
    # alive; from step 2 on, donation consumes only buffers this loop owns.
    trainable = jax.tree.map(
        lambda x: x.copy() if isinstance(x, jax.Array) else x, trainable)
    opt_state = jax.tree.map(
        lambda x: x.copy() if isinstance(x, jax.Array) else x, opt_state)
    patch_drop = model_cfg.clip.vision.patch_dropout > 0.0

    n_dev = 1 if mesh is None else mesh.devices.size
    for epoch in range(start_epoch, train_cfg.image_epoch):
        logger.info("training image epoch %d:", epoch)
        if patch_drop:
            # Per-epoch key derivation: a resumed run (start_epoch > 0)
            # continues the dropout-mask sequence at its epoch instead of
            # replaying the sequence from epoch 0.
            drop_rng = jax.random.fold_in(
                jax.random.PRNGKey(train_cfg.seed), epoch)
        losses = []
        t0 = time.time()
        for batch in prefetch(image_dataset.batches(
                train_cfg.image_batch_size, shuffle=True)):
            batch, n_valid = _pad_batch(batch, n_dev)
            anchor_stack = jnp.stack(
                [anchors[c] for c in batch["class_name"]], axis=0)
            weights = jnp.asarray(
                (np.arange(batch["image"].shape[0]) < n_valid)
                .astype(np.float32))
            step_args = (trainable, opt_state, frozen,
                         jnp.asarray(batch["image"]),
                         jnp.asarray(batch["mask"]),
                         jnp.asarray(batch["label"]), anchor_stack, weights)
            if patch_drop:
                drop_rng, key = jax.random.split(drop_rng)
                trainable, opt_state, loss = step_fn(*step_args, key)
            else:
                trainable, opt_state, loss = step_fn(*step_args)
            losses.append(loss)
        mean_loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
        logger.info("loss: %f (%.1fs)", mean_loss, time.time() - t0)
        ckpt.save_stage2(train_cfg.save_path, epoch + 1, trainable, opt_state,
                         keep_last=train_cfg.keep_checkpoints)
    return trainable


def run_training(frozen, trainable, model_cfg: ModelConfig,
                 train_cfg: TrainConfig, logger, mesh=None,
                 use_pallas: bool = False, metadata_root: Optional[str] = None):
    """Full two-stage pipeline. Returns (trainable, anchors)."""
    text_ds, image_ds = get_dataset(
        train_cfg.dataset, train_cfg.img_size, train_cfg.training_mode,
        train_cfg.shot, "train", logger, metadata_root=metadata_root,
        seed=train_cfg.seed)

    if train_cfg.text_epoch > 0:
        trainable = run_stage1(frozen, trainable, model_cfg, train_cfg,
                               text_ds, logger, mesh=mesh,
                               use_pallas=use_pallas)

    anchors = compute_frozen_anchors(
        frozen, trainable, model_cfg, train_cfg.dataset,
        adapted=train_cfg.text_epoch > 0,
        compute_dtype=_dtype(train_cfg.compute_dtype))

    trainable = run_stage2(frozen, trainable, model_cfg, train_cfg, image_ds,
                           anchors, logger, mesh=mesh, use_pallas=use_pallas)
    return trainable, anchors
