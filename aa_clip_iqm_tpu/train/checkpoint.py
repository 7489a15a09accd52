"""Orbax checkpointing with the reference's directory-scan resume UX.

Reference semantics (train.py:105-113, 225-236, 356-375; test_last.py:231-248):
  - stage 1 saves {epoch, text_adapter, optimizer} to text_adapter.pth each
    epoch; stage 2 saves image_adapter.pth plus per-epoch image_adapter_{N}.pth;
  - resume scans save_path and restores module+optimizer+epoch;
  - eval loads the numerically-latest image_adapter_{N}.

Ours mirrors that layout with orbax directories; params and optimizer state
are separate sub-checkpoints so evaluation can restore weights without
reconstructing optimizer templates:

  save_path/text_adapter/{params,opt}
  save_path/image_adapter/{params,opt}        (rolling resume point)
  save_path/image_adapter_{N}/{params,opt}    (per-epoch)
  save_path/{text,image}_adapter_step/{params,opt}  (opt-in mid-epoch tier)

Fixing survey Q1: the stage-2 checkpoint contains the *full* trainable pytree
(IQM family included), not just the image adapter.

The step tier (TrainConfig.checkpoint_every_steps > 0) has no reference
analogue: this host's documented failure mode is multi-hour TPU-tunnel
outages while a flagship-scale epoch is itself hours, so epoch granularity
can lose an epoch of work. A step checkpoint records {epoch, step, params,
opt_state}; the driver resumes at (epoch, step) by re-deriving the epoch's
data order from (seed, epoch) (datasets.TrainDataset.epoch_batches) and
skipping the consumed batches. Completing an epoch clears the step
checkpoint — a surviving one always refers to the in-progress epoch.
"""
from __future__ import annotations

import os
import re
from typing import Any, Optional

import orbax.checkpoint as ocp


def save_state(directory: str, state: Any):
    directory = os.path.abspath(directory)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(directory, state, force=True)
    ckptr.wait_until_finished()


def restore_state(directory: str, template: Any):
    directory = os.path.abspath(directory)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(directory, template)


def _save_pair(base: str, epoch: int, params, opt_state):
    save_state(os.path.join(base, "params"),
               {"epoch": epoch, "params": params})
    if opt_state is not None:
        save_state(os.path.join(base, "opt"), opt_state)


def _load_pair(base: str, template_params, template_opt):
    if not os.path.isdir(os.path.join(base, "params")):
        return None
    restored = restore_state(os.path.join(base, "params"),
                             {"epoch": 0, "params": template_params})
    out = {"epoch": int(restored["epoch"]), "params": restored["params"],
           "opt_state": None}
    if template_opt is not None and os.path.isdir(os.path.join(base, "opt")):
        out["opt_state"] = restore_state(os.path.join(base, "opt"),
                                         template_opt)
    return out


def _step_dir(save_path: str, stage: str) -> str:
    return os.path.join(save_path,
                        {"stage1": "text_adapter_step",
                         "stage2": "image_adapter_step"}[stage])


def save_step(save_path: str, stage: str, epoch: int, step: int, params,
              opt_state):
    """Mid-epoch step checkpoint: params + optimizer state + (epoch, step).

    ``step`` counts COMPLETED steps inside ``epoch`` — resume continues at
    batch index ``step`` of that epoch's deterministic order."""
    base = _step_dir(save_path, stage)
    save_state(os.path.join(base, "params"),
               {"epoch": epoch, "step": step, "params": params})
    save_state(os.path.join(base, "opt"), opt_state)


def load_step(save_path: str, stage: str, template_params, template_opt):
    """Returns {epoch, step, params, opt_state} or None. Unlike the epoch
    tier, the optimizer state is mandatory: resuming mid-epoch with a fresh
    optimizer would silently diverge from the uninterrupted run."""
    base = _step_dir(save_path, stage)
    if not (os.path.isdir(os.path.join(base, "params"))
            and os.path.isdir(os.path.join(base, "opt"))):
        return None
    restored = restore_state(os.path.join(base, "params"),
                             {"epoch": 0, "step": 0,
                              "params": template_params})
    return {"epoch": int(restored["epoch"]), "step": int(restored["step"]),
            "params": restored["params"],
            "opt_state": restore_state(os.path.join(base, "opt"),
                                       template_opt)}


def clear_step(save_path: str, stage: str):
    """Drop the step checkpoint (called after each completed epoch so a
    surviving step checkpoint always belongs to the in-progress epoch)."""
    import shutil

    shutil.rmtree(_step_dir(save_path, stage), ignore_errors=True)


def save_stage1(save_path: str, epoch: int, text_adapter, opt_state):
    _save_pair(os.path.join(save_path, "text_adapter"), epoch, text_adapter,
               opt_state)


def load_stage1(save_path: str, template_params, template_opt=None):
    return _load_pair(os.path.join(save_path, "text_adapter"),
                      template_params, template_opt)


def save_stage2(save_path: str, epoch: int, trainable, opt_state,
                keep_last: int = 0):
    _save_pair(os.path.join(save_path, "image_adapter"), epoch, trainable,
               opt_state)
    _save_pair(os.path.join(save_path, f"image_adapter_{epoch}"), epoch,
               trainable, None)
    if keep_last > 0:
        prune_numbered(save_path, keep_last)


def prune_numbered(save_path: str, keep_last: int):
    """Delete all but the newest `keep_last` image_adapter_{N} directories."""
    import shutil

    numbered = []
    for name in os.listdir(save_path):
        m = re.fullmatch(r"image_adapter_(\d+)", name)
        if m:
            numbered.append((int(m.group(1)), name))
    numbered.sort()
    for _, name in numbered[:-keep_last]:
        shutil.rmtree(os.path.join(save_path, name), ignore_errors=True)


def load_stage2(save_path: str, template_params, template_opt=None,
                latest_numbered: bool = False):
    """Resume point (image_adapter/) or, for eval, the numerically-latest
    image_adapter_{N}/ (test_last.py:240-246)."""
    base = (latest_numbered_dir(save_path) if latest_numbered
            else os.path.join(save_path, "image_adapter"))
    if base is None:
        return None
    return _load_pair(base, template_params, template_opt)


def latest_numbered_dir(save_path: str) -> Optional[str]:
    if not os.path.isdir(save_path):
        return None
    best, best_n = None, -1
    for name in os.listdir(save_path):
        m = re.fullmatch(r"image_adapter_(\d+)", name)
        if m and int(m.group(1)) > best_n:
            best_n = int(m.group(1))
            best = os.path.join(save_path, name)
    return best


def restore_adapters(save_path: str, trainable,
                     require_stage2: bool = True):
    """Evaluation-time restore shared by every entry point (serving,
    evaluate/single-image CLIs, parity runner): stage-1 text adapter if
    present, then the numerically-latest stage-2 checkpoint
    (test_last.py:231-248 semantics).

    Returns ``(trainable, adapted_text, epoch)``; ``epoch`` is None when no
    stage-2 checkpoint exists (only reachable with require_stage2=False —
    the zero-shot fallback; otherwise FileNotFoundError).
    """
    adapted = False
    restored_text = load_stage1(save_path, trainable["text_adapter"])
    if restored_text is not None:
        trainable = dict(trainable)
        trainable["text_adapter"] = restored_text["params"]
        adapted = True
    restored = load_stage2(save_path, trainable, latest_numbered=True)
    if restored is None:
        if require_stage2:
            raise FileNotFoundError(
                f"no stage-2 image-adapter checkpoint under {save_path}")
        return trainable, adapted, None
    return restored["params"], adapted, restored["epoch"]
