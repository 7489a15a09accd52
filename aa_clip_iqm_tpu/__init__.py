"""aa_clip_iqm_tpu — TPU-native anomaly-aware CLIP (AA-CLIP + IQM) framework.

A from-scratch JAX / XLA / Pallas / pjit rebuild of the capabilities of the
AA-CLIP-IQM reference (zero-/few-shot visual anomaly detection & localization
on a frozen CLIP ViT-L/14-336 backbone). The compute path is pure-functional
JAX with explicit parameter pytrees; parallelism is expressed with
``jax.sharding`` over a device mesh.

Layers (mirrors SURVEY.md layer map):
  - :mod:`aa_clip_iqm_tpu.tokenizer` — CLIP byte-level BPE (reference model/tokenizer.py)
  - :mod:`aa_clip_iqm_tpu.models`    — CLIP towers, adapters, IQM (reference model/)
  - :mod:`aa_clip_iqm_tpu.ops`       — attention/losses/metrics/resize kernels
  - :mod:`aa_clip_iqm_tpu.data`      — dataset registry + JSONL datasets (reference dataset/)
  - :mod:`aa_clip_iqm_tpu.train`     — two-stage adaptation drivers (reference train.py)
  - :mod:`aa_clip_iqm_tpu.evaluation`— per-class eval + visualization (reference test_last.py)
  - :mod:`aa_clip_iqm_tpu.parallel`  — mesh / sharding utilities (no reference analogue)
"""

__version__ = "0.1.0"
