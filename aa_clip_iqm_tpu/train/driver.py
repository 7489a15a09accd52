"""Two-stage training orchestration (reference train.py:240-436).

run_training(frozen, model_cfg, train_cfg) executes:
  stage 1 — text-anchor adaptation with checkpoint-resume;
  anchor freeze — adapted (or raw, if text_epoch==0) per-class anchors;
  stage 2 — image adapter + IQM training with per-epoch checkpoints.

Data parallelism: when a mesh is provided, batches are sharded over its
'data' axis and the jitted steps carry sharding annotations (XLA inserts the
gradient psums over ICI).

Resumability: both stages resume at epoch granularity from the rolling
checkpoint (reference train.py:356-375 semantics), and — with
TrainConfig.checkpoint_every_steps > 0 — at STEP granularity from the step
tier (checkpoint.save_step). In-epoch resume is exact because each epoch's
batch stream is a pure function of (dataset seed, epoch)
(TrainDataset.epoch_batches) and the per-step patch-dropout key is
fold_in(fold_in(seed, epoch), step) — no sequential RNG state survives an
interruption.

Observability: per-step {stage, epoch, step, loss, lr, wall_ms} rows append
to {save_path}/scalars.jsonl at each epoch end (SURVEY §5). Losses stay on
device during the epoch and are fetched in ONE transfer — the step loop
never synchronizes.
"""
from __future__ import annotations

import functools
import json
import math
import os
import threading
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


def _append_scalars(save_path: str, stage: str, epoch: int, first_step: int,
                    loss_host, lrs, wall_ms):
    """Append per-step scalar rows to {save_path}/scalars.jsonl.

    Schema (pinned by tests/test_step_checkpoint.py):
      {"stage", "epoch", "step", "loss", "lr", "wall_ms"}
    step is the batch index within the epoch. wall_ms is host
    dispatch-to-dispatch time: dispatch is async, so early steps read fast,
    but once the in-flight pipeline fills the host is backpressured to the
    true device step rate — epoch-mean wall_ms is the real step time.
    """
    os.makedirs(save_path, exist_ok=True)
    with open(os.path.join(save_path, "scalars.jsonl"), "a") as f:
        for i, loss in enumerate(np.asarray(loss_host, np.float64)):
            f.write(json.dumps({
                "stage": stage, "epoch": int(epoch),
                "step": int(first_step + i), "loss": float(loss),
                "lr": float(np.asarray(lrs)[i]),
                "wall_ms": round(float(wall_ms[i]), 3)}) + "\n")


class _StepSaver:
    """Overlapped mid-epoch checkpoint writer.

    save() snapshots params/opt_state with device-side copies (async
    dispatch, ~free) and hands the host fetch + orbax write to a background
    thread, so the step loop never stalls on the slow host link (this host's
    device->host path is ~150 MB/s; a flagship params+opt fetch is seconds).
    The device copy is what makes this safe under buffer donation: it is
    enqueued before the next step's donation, so the snapshot reads the
    pre-donation values and the checkpoint is exactly the state at (epoch,
    step) regardless of how far training has advanced by the time the write
    lands. At most one save is in flight; errors surface at the next
    save()/wait(). Callers must wait() before the epoch-tier save/clear (a
    concurrent rmtree would race the write) and on loop exit.
    """

    def __init__(self, use_async: bool = True):
        self.use_async = use_async
        self._thread = None
        self._err = None

    def save(self, save_path: str, stage: str, epoch: int, step: int,
             params, opt_state):
        if not self.use_async:
            ckpt.save_step(save_path, stage, epoch, step, params, opt_state)
            return
        self.wait()
        snap = jax.tree.map(
            lambda x: x.copy() if isinstance(x, jax.Array) else x,
            (params, opt_state))

        def work():
            try:
                ckpt.save_step(save_path, stage, epoch, step, *snap)
            except BaseException as e:  # surfaced on the main thread
                self._err = e

        self._thread = threading.Thread(
            target=work, name=f"step-ckpt-{stage}", daemon=True)
        self._thread.start()

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._err is not None:
            err, self._err = self._err, None
            raise err


def _load_step_resume(train_cfg: TrainConfig, stage: str, params, opt_state,
                      start_epoch: int, logger):
    """Mid-epoch resume point, if one exists for the in-progress epoch.

    Returns (params, opt_state, start_epoch, start_step). A step checkpoint
    from an already-completed epoch (possible only if the post-epoch
    clear_step was lost to a crash) is ignored — the epoch tier wins."""
    if train_cfg.checkpoint_every_steps <= 0:
        return params, opt_state, start_epoch, 0
    restored = ckpt.load_step(train_cfg.save_path, stage, params, opt_state)
    if restored is None or restored["epoch"] < start_epoch:
        return params, opt_state, start_epoch, 0
    logger.info("resumed %s mid-epoch at epoch %d step %d", stage,
                restored["epoch"], restored["step"])
    return (restored["params"], restored["opt_state"], restored["epoch"],
            restored["step"])


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
    text_params, opt_state, start_epoch, start_step = _load_step_resume(
        train_cfg, "stage1", text_params, opt_state, start_epoch, logger)

    visual_fn = steps.make_stage1_visual_fn(
        model_cfg, compute_dtype=dtype, use_pallas=use_pallas, mesh=mesh)
    step_fn = steps.make_stage1_step(
        model_cfg, train_cfg, prompt_toks, len(classes), n_norm, n_abn,
        tx, compute_dtype=dtype, mesh=mesh)

    n_dev = 1 if mesh is None else mesh.devices.size
    every = train_cfg.checkpoint_every_steps
    saver = _StepSaver(train_cfg.async_step_checkpoint)
    try:
        for epoch in range(start_epoch, train_cfg.text_epoch):
            first = start_step if epoch == start_epoch else 0
            logger.info("training text epoch %d:", epoch)
            losses, wall_ms = [], []
            t0 = time.time()
            t_prev = time.perf_counter()
            for i, batch in enumerate(prefetch(text_dataset.epoch_batches(
                    epoch, train_cfg.text_batch_size, start_batch=first))):
                step = first + i
                batch, n_valid = _pad_batch(batch, n_dev)
                images = jnp.asarray(batch["image"])
                masks = jnp.asarray(batch["mask"])
                class_idx = jnp.asarray(
                    [class_to_idx[c] for c in batch["class_name"]], jnp.int32)
                weights = jnp.asarray(
                    (np.arange(images.shape[0]) < n_valid).astype(np.float32))
                patch_feats = visual_fn(frozen, images)
                text_params, opt_state, loss = step_fn(
                    text_params, opt_state, frozen, patch_feats, masks,
                    class_idx, weights)
                # keep the loss on device: fetching per step would synchronize
                # the dispatch pipeline every iteration
                losses.append(loss)
                now = time.perf_counter()
                wall_ms.append((now - t_prev) * 1e3)
                t_prev = now
                if every > 0 and (step + 1) % every == 0:
                    saver.save(train_cfg.save_path, "stage1", epoch, step + 1,
                               text_params, opt_state)
                    t_prev = time.perf_counter()  # exclude save dispatch
            if losses:
                loss_host = np.asarray(jnp.stack(losses))  # ONE device fetch
                mean_loss = float(loss_host.mean())
                _append_scalars(train_cfg.save_path, "stage1", epoch, first,
                                loss_host,
                                np.full(len(losses), train_cfg.text_lr),
                                wall_ms)
            else:
                mean_loss = float("nan")
            logger.info("loss: %f (%.1fs)", mean_loss, time.time() - t0)
            saver.wait()  # epoch-tier save/clear must not race a step write
            ckpt.save_stage1(train_cfg.save_path, epoch + 1, text_params,
                             opt_state)
            if every > 0:
                ckpt.clear_step(train_cfg.save_path, "stage1")
    finally:
        # On an interruption (the outage path this tier exists for), let the
        # in-flight snapshot land: it is a consistent (epoch, step) state.
        # Save errors here must not mask the original exception.
        try:
            saver.wait()
        except Exception:
            logger.exception("in-flight step checkpoint failed during unwind")

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
    if train_cfg.grad_accum_steps > 1 \
            and train_cfg.image_batch_size % train_cfg.grad_accum_steps:
        raise ValueError(
            f"image_batch_size={train_cfg.image_batch_size} must be divisible "
            f"by grad_accum_steps={train_cfg.grad_accum_steps} (every full "
            "batch splits into equal microbatches; only tails are padded)")
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
    trainable, opt_state, start_epoch, start_step = _load_step_resume(
        train_cfg, "stage2", trainable, opt_state, start_epoch, logger)
    # The image-group LR curve, re-evaluated on host for the scalars rows
    # (same construction the optimizer holds, optim.stage2_optimizer).
    lr_sched = optim.cosine_annealing(
        train_cfg.image_lr, total_steps,
        torch_quirk_period_steps=(train_cfg.image_epoch
                                  if train_cfg.torch_lr_quirk else None))

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
    # Tail batches must stay divisible into grad_accum microbatches too.
    pad_multiple = math.lcm(n_dev, max(1, train_cfg.grad_accum_steps))
    every = train_cfg.checkpoint_every_steps
    saver = _StepSaver(train_cfg.async_step_checkpoint)
    try:
        for epoch in range(start_epoch, train_cfg.image_epoch):
            first = start_step if epoch == start_epoch else 0
            logger.info("training image epoch %d:", epoch)
            if patch_drop:
                # Per-epoch base key; the per-step key is fold_in(base, step)
                # so a mid-epoch resume re-derives the exact mask sequence
                # without replaying the consumed steps' splits.
                drop_rng = jax.random.fold_in(
                    jax.random.PRNGKey(train_cfg.seed), epoch)
            losses, wall_ms = [], []
            t0 = time.time()
            t_prev = time.perf_counter()
            for i, batch in enumerate(prefetch(image_dataset.epoch_batches(
                    epoch, train_cfg.image_batch_size, start_batch=first))):
                step = first + i
                batch, n_valid = _pad_batch(batch, pad_multiple)
                anchor_stack = jnp.stack(
                    [anchors[c] for c in batch["class_name"]], axis=0)
                weights = jnp.asarray(
                    (np.arange(batch["image"].shape[0]) < n_valid)
                    .astype(np.float32))
                step_args = (trainable, opt_state, frozen,
                             jnp.asarray(batch["image"]),
                             jnp.asarray(batch["mask"]),
                             jnp.asarray(batch["label"]), anchor_stack,
                             weights)
                if patch_drop:
                    trainable, opt_state, loss = step_fn(
                        *step_args, jax.random.fold_in(drop_rng, step))
                else:
                    trainable, opt_state, loss = step_fn(*step_args)
                losses.append(loss)
                now = time.perf_counter()
                wall_ms.append((now - t_prev) * 1e3)
                t_prev = now
                if every > 0 and (step + 1) % every == 0:
                    # Snapshot-by-copy keeps this safe under donation: the
                    # copies are enqueued before the next step consumes the
                    # buffers (_StepSaver).
                    saver.save(train_cfg.save_path, "stage2", epoch, step + 1,
                               trainable, opt_state)
                    t_prev = time.perf_counter()  # exclude save dispatch
            if losses:
                loss_host = np.asarray(jnp.stack(losses))  # ONE device fetch
                mean_loss = float(loss_host.mean())
                g0 = epoch * steps_per_epoch + first
                _append_scalars(train_cfg.save_path, "stage2", epoch, first,
                                loss_host,
                                lr_sched(jnp.arange(g0, g0 + len(losses))),
                                wall_ms)
            else:
                mean_loss = float("nan")
            logger.info("loss: %f (%.1fs)", mean_loss, time.time() - t0)
            saver.wait()  # epoch-tier save/clear must not race a step write
            ckpt.save_stage2(train_cfg.save_path, epoch + 1, trainable,
                             opt_state, keep_last=train_cfg.keep_checkpoints)
            if every > 0:
                ckpt.clear_step(train_cfg.save_path, "stage2")
    finally:
        try:
            saver.wait()
        except Exception:
            logger.exception("in-flight step checkpoint failed during unwind")
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
