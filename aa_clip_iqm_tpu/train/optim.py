"""Optimizers and schedules (optax), mirroring the reference's settings.

Stage 1 (train.py:335-339): Adam over the text adapter, lr 1e-5,
betas (0.5, 0.999).

Stage 2 (train.py:342-353): AdamW with two parameter groups —
  image_adapter:  lr = image_lr,       weight_decay 1e-4
  IQM family:     lr = image_lr * 0.1, weight_decay 1e-3
plus a cosine schedule to eta_min=1e-6. Deliberate delta (documented): the
reference constructs CosineAnnealingLR with T_max = image_epoch but steps it
*per batch* (train.py:222, :353), so the LR completes its cosine in the first
`image_epoch` batches and then climbs back up periodically. We schedule the
cosine over the true total step count. Set `torch_quirk_period_steps` to
reproduce the reference curve exactly if desired.

The stage-2 optimizer also covers the IQM projections the reference leaves
untrained (survey Q1/Q2) and freezes the text adapter via a zero-update group.
pos_embedding and iqm_layer_norm match the executed reference instead: they
are absent from its optimizer groups, so they stay at init (sinusoidal table /
identity LN) — see UNTRAINED_IQM_KEYS.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import optax


def cosine_annealing(base_lr: float, total_steps: int, eta_min: float = 1e-6,
                     torch_quirk_period_steps: Optional[int] = None):
    """CosineAnnealingLR-equivalent schedule.

    With `torch_quirk_period_steps` set, reproduces torch's periodic cosine
    eta_min + (base-eta_min) * (1+cos(pi * t / T)) / 2 evaluated per *step*
    with T = torch_quirk_period_steps (the reference's per-batch stepping of a
    T_max=epochs scheduler). Otherwise a single cosine over total_steps.
    """
    if torch_quirk_period_steps is not None:
        T = torch_quirk_period_steps

        def schedule(step):
            return eta_min + (base_lr - eta_min) * (
                1 + jnp.cos(math.pi * step / T)) / 2

        return schedule
    return optax.cosine_decay_schedule(
        init_value=base_lr, decay_steps=max(total_steps, 1),
        alpha=eta_min / base_lr,
    )


def stage1_optimizer(text_lr: float = 1e-5):
    return optax.adam(learning_rate=text_lr, b1=0.5, b2=0.999)


IQM_FAMILY_KEYS = (
    # The reference's iqm_params group is exactly iqm + class_query_mlp +
    # query_adapters (train.py:343-345). The three projections are its lazy,
    # never-optimized nn.Linears — training them is the deliberate Q1/Q2 fix.
    "iqm", "class_query_mlp", "query_adapters",
    "visual_feature_proj", "text_feature_proj", "query_proj",
)

# Reference modules that exist but sit in NO optimizer group (train.py:
# 342-350), so they stay at their init values for the whole run:
# pos_embedding keeps its deterministic sinusoidal table and iqm_layer_norm
# stays an identity-affine LayerNorm. We match the executed reference and
# keep both frozen (they remain in the checkpoint pytree unchanged).
# NOTE: moving keys between label groups changes the multi_transform
# opt-state STRUCTURE (masked adamw moments become MaskedNode), so stage-2
# resume from a checkpoint saved under the old labels fails with an orbax
# structure mismatch — the same invalidation class as changing the param
# pytree layout (CLAUDE.md invariants). Trainable params themselves restore
# fine; only mid-run opt-state resume is affected.
UNTRAINED_IQM_KEYS = ("pos_embedding", "iqm_layer_norm")


def stage2_param_labels(trainable):
    """Label pytree: 'image' / 'iqm' / 'frozen' per top-level group."""
    labels = {}
    for key, sub in trainable.items():
        if key == "image_adapter":
            label = "image"
        elif key in IQM_FAMILY_KEYS:
            label = "iqm"
        else:  # text_adapter (stage-1-only) + UNTRAINED_IQM_KEYS
            label = "frozen"
        labels[key] = jax.tree.map(lambda _: label, sub)
    return labels


def stage2_optimizer(trainable, image_lr: float, total_steps: int,
                     iqm_lr_scale: float = 0.1, image_wd: float = 1e-4,
                     iqm_wd: float = 1e-3, eta_min: float = 1e-6,
                     torch_quirk_period_steps: Optional[int] = None):
    image_sched = cosine_annealing(image_lr, total_steps, eta_min,
                                   torch_quirk_period_steps)
    iqm_sched = cosine_annealing(image_lr * iqm_lr_scale, total_steps, eta_min,
                                 torch_quirk_period_steps)
    tx = optax.multi_transform(
        {
            "image": optax.adamw(learning_rate=image_sched, b1=0.9, b2=0.999,
                                 weight_decay=image_wd),
            "iqm": optax.adamw(learning_rate=iqm_sched, b1=0.9, b2=0.999,
                               weight_decay=iqm_wd),
            "frozen": optax.set_to_zero(),
        },
        stage2_param_labels(trainable),
    )
    return tx


def global_norm_clip(max_norm: float = 1.0):
    """Functional gradient clipping. NOTE: the reference's clip_grad_norm_ is
    a no-op (runs before zero_grad/backward — survey Q4); ours actually clips.
    """
    return optax.clip_by_global_norm(max_norm)


def clip_stage2_grads(grads, max_norm: float):
    """Global-norm clip over the gradients whose stage-2 updates APPLY.

    The 'frozen' label group (text_adapter + UNTRAINED_IQM_KEYS) receives
    real, nonzero gradients in the backward (those params participate in the
    forward) but its updates are set_to_zero — counting them in the global
    norm would over-clip the trained groups. They are zeroed before the norm
    (free: their updates are discarded anyway)."""
    labels = stage2_param_labels(grads)
    grads = jax.tree.map(
        lambda g, lab: jnp.zeros_like(g) if lab == "frozen" else g,
        grads, labels)
    clipped, _ = optax.clip_by_global_norm(max_norm).update(
        grads, optax.EmptyState())
    return clipped
