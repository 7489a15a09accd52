"""Deterministic synthetic weights for golden-fixture parity tests.

Both sides of the reference-fixture chain use this module:

  * ``tools/record_reference_fixtures.py`` (run manually, torch + the
    reference code on sys.path) loads these values into the *executed*
    reference modules and records their outputs into ``tests/fixtures/``.
  * ``tests/test_reference_fixtures.py`` regenerates the identical values,
    maps them into our JAX pytrees, and asserts our forward passes match the
    recorded outputs.

Weights are a pure function of the canonical state-dict key string and the
shape, so the fixtures only need to store the key/shape manifest (tiny) plus
inputs and outputs — never the multi-hundred-MB ViT-L weight arrays.

Keys are the reference modules' own state-dict names with module aliases
canonicalized (AdaptedCLIP exposes the backbone both as ``clipmodel`` and
``image_encoder``; the ``clipmodel.``-prefixed spelling is canonical and the
prefix itself is stripped so plain-CLIP and AdaptedCLIP fixtures share
backbone values).
"""
from __future__ import annotations

import zlib

import numpy as np


def canonical_key(name: str) -> str:
    """Collapse the reference's parameter-name aliases to one spelling."""
    if name.startswith("image_encoder."):
        name = "clipmodel.visual." + name[len("image_encoder."):]
    if name.startswith("clipmodel."):
        name = name[len("clipmodel."):]
    return name


def synth_value(key: str, shape, scale: float = 1.0) -> np.ndarray:
    """Deterministic pseudo-random value for a (canonical) key + shape.

    Conditioning rules keep deep random towers numerically sane:
      * 1-D ``*.weight`` (LayerNorm / BatchNorm scale): near 1.
      * ``running_var``: strictly positive.
      * ``*.bias``: small nonzero values (zero would hide bias-mapping bugs).
      * matrices / conv kernels: std = fan_in**-0.5 (fan_in = prod of the
        non-leading dims in the torch layout).
    """
    shape = tuple(int(s) for s in shape)
    seed = zlib.crc32(key.encode("utf-8")) & 0xFFFFFFFF
    rs = np.random.default_rng(seed)
    _arr = np.ascontiguousarray  # 0-d shapes: keep ndarray, not numpy scalar
    if "num_batches_tracked" in key:
        return _arr(np.zeros(shape, np.int64))
    if "running_var" in key:
        return _arr((0.5 + rs.random(shape)).astype(np.float32))
    base = rs.standard_normal(shape).astype(np.float32)
    leaf = key.rsplit(".", 1)[-1]
    if len(shape) <= 1 and (leaf in ("weight", "scale") or "norm" in key.lower()):
        if leaf == "bias":
            return _arr((0.02 * base * scale).astype(np.float32))
        return _arr((1.0 + 0.05 * base * scale).astype(np.float32))
    if leaf == "bias" or "running_mean" in key:
        return _arr((0.02 * base * scale).astype(np.float32))
    if len(shape) >= 2:
        fan_in = 1
        for s in shape[1:]:
            fan_in *= s
        return _arr((base * (fan_in ** -0.5) * scale).astype(np.float32))
    # 1-D embeddings/scalars (class_embedding, logit_scale, ...)
    return _arr((0.02 * base * scale).astype(np.float32))


def synth_state_dict(manifest) -> dict:
    """manifest: iterable of (canonical_key, shape) -> {key: ndarray}."""
    return {k: synth_value(k, shape) for k, shape in manifest}


def synth_tokens(n_rows: int, context_length: int, vocab_size: int,
                 seed: int = 7) -> np.ndarray:
    """Plausible CLIP token rows: SOT-ish ids, EOT = vocab-1 (the max id, so
    ``argmax`` pooling finds it — model/model.py:199), zero padding after."""
    rs = np.random.default_rng(seed)
    out = np.zeros((n_rows, context_length), np.int64)
    for i in range(n_rows):
        n = int(rs.integers(3, context_length - 1))
        out[i, :n] = rs.integers(1, vocab_size - 1, size=n)
        out[i, n] = vocab_size - 1
    return out
