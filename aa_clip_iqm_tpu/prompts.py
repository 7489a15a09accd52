"""Prompt engine: anomaly-aware text-anchor construction.

Parity with the reference prompt ensemble (dataset/constants.py:135-148,
forward_utils.py:131-192): per class, normal/abnormal state sets are formatted
with the class's descriptive "real name", crossed with sentence templates,
tokenized, encoded, L2-normalized, mean-pooled per state, re-normalized and
stacked into a (embed_dim, 2) anchor pair.

The encode function is pluggable so stage 1 can differentiate through it
(adapted text encoder) while eval uses a cached no-grad pass.
"""
from __future__ import annotations

from typing import Callable, Dict, List

import jax.numpy as jnp

from .data.registry import CLASS_NAMES, PROMPTS, REAL_NAMES
from .ops.layers import l2_normalize
from .tokenizer import tokenize


def class_prompt_sentences(dataset_name: str, class_name: str) -> List[List[str]]:
    """[[normal sentences], [abnormal sentences]] for one class."""
    if class_name == "object":
        real_name = class_name
    else:
        if class_name not in CLASS_NAMES[dataset_name]:
            raise KeyError(
                f"class_name {class_name} not found; available: "
                f"{CLASS_NAMES[dataset_name]}"
            )
        real_name = REAL_NAMES[dataset_name][class_name]
    groups = []
    for states in (PROMPTS["normal"], PROMPTS["abnormal"]):
        sentences = [
            template.format(state.format(real_name))
            for state in states
            for template in PROMPTS["templates"]
        ]
        groups.append(sentences)
    return groups


def class_prompt_tokens(dataset_name: str, class_name: str):
    """Tokenized prompt groups: list of (n_sentences, 77) int32 arrays."""
    return [jnp.asarray(tokenize(g)) for g in
            class_prompt_sentences(dataset_name, class_name)]


def anchors_from_embeddings(normal_emb, abnormal_emb):
    """Mean-of-normalized-embeddings anchor per state, stacked (dim, 2)
    (forward_utils.py:154-162)."""
    cols = []
    for emb in (normal_emb, abnormal_emb):
        e = l2_normalize(emb.astype(jnp.float32))
        mean = jnp.mean(e, axis=0)
        cols.append(mean / jnp.linalg.norm(mean))
    return jnp.stack(cols, axis=1)


def compute_class_anchor(encode_fn: Callable, dataset_name: str, class_name: str):
    """encode_fn: (tokens (N,77) int32) -> (N, embed_dim). Returns (dim, 2)."""
    groups = class_prompt_tokens(dataset_name, class_name)
    return anchors_from_embeddings(encode_fn(groups[0]), encode_fn(groups[1]))


def compute_all_anchors(encode_fn: Callable, dataset_name: str) -> Dict[str, jnp.ndarray]:
    """Per-class anchor dict (forward_utils.py:185-192)."""
    return {
        c: compute_class_anchor(encode_fn, dataset_name, c)
        for c in CLASS_NAMES[dataset_name]
    }


def per_sentence_embeddings(encode_fn: Callable, dataset_name: str,
                            class_name: str):
    """Un-pooled normalized embeddings of every prompt sentence, concatenated
    normal-then-abnormal — the reference's per-sentence variant
    (get_adapted_single_sentence_text_embedding, forward_utils.py:165-182)."""
    groups = class_prompt_tokens(dataset_name, class_name)
    embs = [l2_normalize(encode_fn(g).astype(jnp.float32)) for g in groups]
    return jnp.concatenate(embs, axis=0)


def stack_batch_anchors(anchor_dict, class_names) -> jnp.ndarray:
    """(B, dim, 2) per-sample anchor stack (train.py:69-72, :145-147)."""
    return jnp.stack([anchor_dict[c] for c in class_names], axis=0)


def batched_prompt_tokens(dataset_name: str):
    """All classes' prompt tokens stacked for one-shot batched encoding:
    returns (classes, tokens (C*S,77), n_normal, n_abnormal).

    TPU-friendly alternative to the per-class Python loop: one text-encoder
    call embeds every sentence of every class, then anchors are reduced with
    a reshape — keeps the MXU busy and compiles once.
    """
    classes = list(CLASS_NAMES[dataset_name])
    per_class = [class_prompt_sentences(dataset_name, c) for c in classes]
    n_normal = len(per_class[0][0])
    n_abnormal = len(per_class[0][1])
    sentences = []
    for normal, abnormal in per_class:
        sentences.extend(normal)
        sentences.extend(abnormal)
    return classes, jnp.asarray(tokenize(sentences)), n_normal, n_abnormal


def anchors_from_flat_embeddings(emb, n_classes: int, n_normal: int,
                                 n_abnormal: int):
    """(C*(n_normal+n_abnormal), dim) -> (C, dim, 2) anchors."""
    per = n_normal + n_abnormal
    e = l2_normalize(emb.astype(jnp.float32)).reshape(n_classes, per, -1)
    normal = jnp.mean(e[:, :n_normal], axis=1)
    abnormal = jnp.mean(e[:, n_normal:], axis=1)
    normal = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)
    abnormal = abnormal / jnp.linalg.norm(abnormal, axis=-1, keepdims=True)
    return jnp.stack([normal, abnormal], axis=2)
