"""Jitted training steps for the two adaptation stages.

Stage 1 — text-anchor adaptation (train.py:38-114): the gradient path is the
adapted text encoder through the full prompt ensemble; visual features come
from the frozen surgery/plain towers (no grad). TPU design choices:
  - anchors for *all* dataset classes are produced by one batched text-encoder
    call per step (static shapes; per-sample anchors are a gather), replacing
    the reference's per-unique-class Python loop (train.py:63-68);
  - the visual extraction runs as a separate jitted no-grad program with the
    shared-prefix dual forward (models/clip.dual_vision_features), so the
    backward pass never traverses the 24-block ViT.

Stage 2 — patch alignment + IQM (train.py:117-237): anchors are frozen inputs;
loss = 0.5*CE(det) + sum_levels 0.3*seg(text map) + sum_levels 0.2*seg(IQM map)
with the trained query projection (fixing survey Q2).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..configs import ModelConfig, TrainConfig
from ..evaluation import scoring
from ..models import adapters as adapters_mod
from ..models import clip as clip_mod
from ..ops.losses import cross_entropy_logits, seg_loss, seg_loss_tokens
from ..prompts import anchors_from_flat_embeddings


# ----------------------------------------------------------------------
# Stage 1
# ----------------------------------------------------------------------

def make_stage1_visual_fn(cfg: ModelConfig, compute_dtype=jnp.float32,
                          use_pallas: bool = False, mesh=None):
    """No-grad visual features for stage 1.

    Returns jitted fn(frozen, images) -> (patch_feats list [(B, L, D)], each
    already ln_post'ed, projected, L2-normalized, CLS-added — train.py:75-85).
    """
    levels = tuple(cfg.adapter.levels)
    vv_from = clip_mod.surgery_vv_from(cfg.clip.vision.layers,
                                       cfg.surgery_until_layer)

    def features(frozen, images):
        vis = frozen["visual"]
        cls_pooled, taps = clip_mod.dual_vision_features(
            vis, cfg.clip.vision, images, levels, vv_from,
            act_name=cfg.clip.act, compute_dtype=compute_dtype,
            use_pallas=use_pallas,
        )
        from ..ops.layers import l2_normalize, layer_norm

        cls_n = l2_normalize(cls_pooled)
        feats = []
        for t in taps:
            tok = layer_norm(vis["ln_post"], t[:, 1:, :])
            proj = jnp.dot(tok, vis["proj"].astype(tok.dtype),
                           preferred_element_type=jnp.float32).astype(tok.dtype)
            f = l2_normalize(proj) + cls_n[:, None, :]
            feats.append(f)
        return [jax.lax.stop_gradient(f) for f in feats]

    if mesh is not None:
        from ..parallel.mesh import batch_sharding, replicated

        return jax.jit(features,
                       in_shardings=(replicated(mesh), batch_sharding(mesh)))
    return jax.jit(features)


def make_stage1_step(cfg: ModelConfig, train_cfg: TrainConfig, prompt_tokens,
                     n_classes: int, n_normal: int, n_abnormal: int,
                     tx: optax.GradientTransformation,
                     compute_dtype=jnp.float32, mesh=None):
    """Build jitted step(text_params, opt_state, frozen, patch_feats,
    masks, class_idx) -> (text_params, opt_state, loss).

    class_idx: (B,) int32 index of each sample's class into the anchor stack.
    """
    img_size = train_cfg.img_size
    last_only = train_cfg.stage1_last_level_only
    norm_w = train_cfg.text_norm_weight

    def loss_fn(text_params, frozen, patch_feats, masks, class_idx, weights):
        emb = adapters_mod.encode_text_adapted(
            frozen, {"text_adapter": text_params}, cfg, prompt_tokens,
            compute_dtype=compute_dtype,
        )
        anchors_all = anchors_from_flat_embeddings(
            emb, n_classes, n_normal, n_abnormal)          # (C, D, 2)
        anchors = anchors_all[class_idx]                   # (B, D, 2)

        # Orthogonality regularizer (train.py:91-96, survey Q8). Weighted
        # mean so batch-padding rows (weight 0) don't dilute it.
        w = weights.astype(jnp.float32)
        dots = jnp.sum(anchors[:, :, 0] * anchors[:, :, 1], axis=1)
        ortho = (jnp.sum(dots * w) / jnp.maximum(jnp.sum(w), 1.0)) ** 2

        losses = []
        for f in patch_feats:
            probs = scoring.similarity_map_train(f, anchors, img_size)
            losses.append(seg_loss(probs, masks, sample_weight=weights))
        if last_only:
            # Fidelity with the reference's loss reassignment (survey Q3):
            # only the deepest level contributes gradient.
            total = losses[-1]
        else:
            total = sum(losses)
        total = total + ortho * norm_w
        return total

    def step(text_params, opt_state, frozen, patch_feats, masks, class_idx,
             weights):
        loss, grads = jax.value_and_grad(loss_fn)(
            text_params, frozen, patch_feats, masks, class_idx, weights)
        updates, opt_state = tx.update(grads, opt_state, text_params)
        text_params = optax.apply_updates(text_params, updates)
        return text_params, opt_state, loss

    # No buffer donation: the adapter pytrees are tiny and callers may hold
    # references to the initial parameters (donation would invalidate them).
    if mesh is not None:
        from ..parallel.mesh import batch_sharding, replicated

        rep, dat = replicated(mesh), batch_sharding(mesh)
        return jax.jit(
            step,
            in_shardings=(rep, rep, rep, [dat] * len(cfg.adapter.levels),
                          dat, dat, dat),
            out_shardings=(rep, rep, rep),
        )
    return jax.jit(step)


# ----------------------------------------------------------------------
# Stage 2
# ----------------------------------------------------------------------

def make_stage2_step(cfg: ModelConfig, train_cfg: TrainConfig,
                     tx: optax.GradientTransformation,
                     compute_dtype=jnp.float32, use_pallas: bool = False,
                     mesh=None, clip_grad_norm: Optional[float] = None,
                     donate: bool = True, frozen_sharding=None):
    """Build jitted step(trainable, opt_state, frozen, images, masks, labels,
    anchors, weights[, rng]) -> (trainable, opt_state, loss).

    With donate=True (default) the trainable/opt-state buffers are donated:
    the returned pytrees reuse the inputs' HBM, so callers must rebind
    (``trainable, opt_state, _ = step(...)``) and not touch the old
    references afterwards — the training loop's natural usage. Pass
    donate=False to call the step repeatedly from the same initial state
    (e.g. comparison tests).

    When cfg.clip.vision.patch_dropout > 0 the step takes a trailing PRNG key
    and trains on the kept tokens only: the seg losses then run at token
    resolution against per-cell mask fractions (seg_loss_tokens) since the
    kept tokens no longer form a full grid.

    Gradient accumulation (train_cfg.grad_accum_steps > 1, no reference
    analogue — the reference is single-GPU full-batch only): the batch is
    split into grad_accum_steps microbatches processed by one lax.scan, so
    peak activation memory is that of a single microbatch. The result is
    EXACT: every loss term is ``const + weighted-mean`` over per-sample
    values (ops/losses.py), so accumulating per-microbatch numerators
    ``loss_k * sum(w_k)`` and dividing by the total valid weight reproduces
    the full-batch loss and gradients up to fp32 summation order
    (tests/test_grad_accum.py). With patch dropout the per-microbatch key is
    fold_in(step_rng, k), so the draw differs from the unaccumulated run
    (the masks are still deterministic in (seed, epoch, step, k)).
    """
    img_size = train_cfg.img_size
    text_w = train_cfg.text_loss_weight
    iqm_w = train_cfg.iqm_loss_weight
    det_w = train_cfg.det_loss_weight
    grad_accum = max(1, int(getattr(train_cfg, "grad_accum_steps", 1)))

    remat = train_cfg.remat
    patch_drop = cfg.clip.vision.patch_dropout > 0.0
    patch_size = cfg.clip.vision.patch_size

    def loss_fn(trainable, frozen, images, masks, labels, anchors, weights,
                rng):
        out = adapters_mod.encode_image_adapted(
            frozen, trainable, cfg, images, text_anchors=anchors,
            compute_dtype=compute_dtype, use_pallas=use_pallas, remat=remat,
            patch_drop_rng=rng,
            # "frozen": fused LN->MLP kernel forward + Pallas dx-only
            # backward. Valid because the backbone blocks carry no gradient
            # here (only the adapters train); the general kernel's
            # XLA-recompute backward measured slower than plain XLA under
            # remat (31.69 vs 32.03 img/s @518), but the dx-only backward
            # wins: 2.60 vs 2.91 ms/layer probed at the stage-2 shape,
            # 32.90 vs 32.07 img/s end-to-end (with tower prepad).
            fused_mlp="frozen",
        )
        cls_logits = jnp.einsum("bd,bdc->bc",
                                out.det_token.astype(jnp.float32),
                                anchors.astype(jnp.float32))
        total = cross_entropy_logits(cls_logits, labels,
                                     sample_weight=weights) * det_w

        q = adapters_mod.project_queries(trainable, out.iqm_queries)
        if out.keep_idx is not None:
            cells = scoring.mask_to_patch_cells(masks, patch_size)  # (B, L)
            cells = jnp.take_along_axis(cells, out.keep_idx, axis=1)
            for f in out.seg_tokens:
                logits = scoring.similarity_logits(f, anchors)      # (B,K,2)
                probs = jnp.swapaxes(jax.nn.softmax(logits, -1), 1, 2)
                total += seg_loss_tokens(probs, cells,
                                         sample_weight=weights) * text_w * 0.5
            for f in out.seg_tokens:
                pred = scoring.iqm_patch_pred(f, q)                 # (B, K)
                probs = jnp.stack([1.0 - pred, pred], axis=1)
                total += seg_loss_tokens(probs, cells,
                                         sample_weight=weights) * iqm_w * 0.5
            return total

        for f in out.seg_tokens:
            probs = scoring.similarity_map_train(f, anchors, img_size)
            total += seg_loss(probs, masks, sample_weight=weights) * text_w * 0.5

        for f in out.seg_tokens:
            iqm_map = scoring.iqm_train_map(f, q, img_size)
            total += seg_loss(iqm_map, masks, sample_weight=weights) * iqm_w * 0.5
        return total

    def _accum_value_and_grad(trainable, frozen, images, masks, labels,
                              anchors, weights, rng):
        """(loss, grads) over grad_accum microbatches via lax.scan.

        Exactness: each loss term is ``const + sum(per_sample*w)/max(sum w, 1)``
        with 0/1 weights, so ``loss_k * sum(w_k)`` is the exact numerator
        contribution of microbatch k (an all-padded microbatch contributes 0)
        and the full-batch loss is ``sum_k num_k / max(sum_k w_k, 1)`` —
        constants reassemble because they scale with w_k."""
        batch = images.shape[0]
        if batch % grad_accum:
            raise ValueError(
                f"batch size {batch} is not divisible by grad_accum_steps="
                f"{grad_accum}; the driver pads batches to "
                "lcm(device_count, grad_accum_steps)")
        micro = batch // grad_accum

        def split(x):
            return x.reshape((grad_accum, micro) + x.shape[1:])

        xs = jax.tree.map(split, (images, masks, labels, anchors, weights))
        if mesh is not None:
            # Keep the microbatch axis (now axis 1) sharded over the
            # data-parallel tiers; the scan axis is unsharded.
            from ..parallel.mesh import _data_axes
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(mesh, P(None, _data_axes(mesh)))
            xs = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(x, sh), xs)

        def numerator(trainable, mb, rng_k):
            mb_images, mb_masks, mb_labels, mb_anchors, mb_weights = mb
            w_sum = jnp.sum(mb_weights.astype(jnp.float32))
            loss = loss_fn(trainable, frozen, mb_images, mb_masks, mb_labels,
                           mb_anchors, mb_weights, rng_k)
            return loss * w_sum, w_sum

        def body(carry, scanned):
            g_acc, num_acc, w_acc = carry
            k, mb = scanned
            rng_k = None if rng is None else jax.random.fold_in(rng, k)
            (num, w_sum), g = jax.value_and_grad(
                numerator, has_aux=True)(trainable, mb, rng_k)
            return (jax.tree.map(jnp.add, g_acc, g),
                    num_acc + num, w_acc + w_sum), None

        g_zero = jax.tree.map(jnp.zeros_like, trainable)
        (g_sum, num, w_tot), _ = jax.lax.scan(
            body, (g_zero, jnp.float32(0.0), jnp.float32(0.0)),
            (jnp.arange(grad_accum), xs))
        denom = jnp.maximum(w_tot, 1.0)
        return num / denom, jax.tree.map(lambda g: g / denom, g_sum)

    def step(trainable, opt_state, frozen, images, masks, labels, anchors,
             weights, rng=None):
        if grad_accum > 1:
            loss, grads = _accum_value_and_grad(
                trainable, frozen, images, masks, labels, anchors, weights,
                rng)
        else:
            loss, grads = jax.value_and_grad(loss_fn)(
                trainable, frozen, images, masks, labels, anchors, weights,
                rng)
        if clip_grad_norm is not None:
            from .optim import clip_stage2_grads

            grads = clip_stage2_grads(grads, clip_grad_norm)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, loss

    donate_argnums = (0, 1) if donate else ()
    if not patch_drop:
        # rng stays out of the jitted signature on the default path.
        def step_no_rng(trainable, opt_state, frozen, images, masks, labels,
                        anchors, weights):
            return step(trainable, opt_state, frozen, images, masks, labels,
                        anchors, weights, None)

        if mesh is not None:
            from ..parallel.mesh import batch_sharding, replicated

            rep, dat = replicated(mesh), batch_sharding(mesh)
            # frozen_sharding lets callers run a tensor-parallel backbone
            # (e.g. backbone_param_sharding) under the same step program.
            frz = frozen_sharding if frozen_sharding is not None else rep
            return jax.jit(
                step_no_rng,
                in_shardings=(rep, rep, frz, dat, dat, dat, dat, dat),
                out_shardings=(rep, rep, rep),
                donate_argnums=donate_argnums,
            )
        return jax.jit(step_no_rng, donate_argnums=donate_argnums)

    if mesh is not None:
        from ..parallel.mesh import batch_sharding, replicated

        rep, dat = replicated(mesh), batch_sharding(mesh)
        frz = frozen_sharding if frozen_sharding is not None else rep
        return jax.jit(
            step,
            in_shardings=(rep, rep, frz, dat, dat, dat, dat, dat, rep),
            out_shardings=(rep, rep, rep),
            donate_argnums=donate_argnums,
        )
    return jax.jit(step, donate_argnums=donate_argnums)
