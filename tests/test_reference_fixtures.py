"""Parity vs golden fixtures recorded from the EXECUTED reference program.

The fixtures in tests/fixtures/*.npz were produced by running the reference
PyTorch code itself (tools/record_reference_fixtures.py) on deterministic
synthetic weights (tests/fixture_weights.py). These tests regenerate the same
weights, map them into our JAX pytrees, and pin our forward passes against
the recorded outputs — an oracle independent of the builder-authored
transcriptions in tests/torch_ref.py. No torch and no reference import here;
only the npz recordings.

Covered reference surfaces: CLIP.encode_image/encode_text
(model/model.py:185-201), DAPM_replace surgery with the executed batch-axis
v-v attention (model/transformer.py:102-152,406-425 — survey Q9),
IQM.forward (model/iqm.py:497-673), AdaptedCLIP.forward/encode_text at the
live ViT-L geometry (model/adapter.py:137-304), forward_utils'
similarity-map/seg-loss/metrics math (forward_utils.py:196-308), and the
eval driver's executed IQM-map/fusion/broadcast-score math
(test_last.py:53-158 via get_predictions itself).
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fixture_weights import synth_state_dict, synth_value

from aa_clip_iqm_tpu.configs import (
    AdapterConfig,
    CLIPConfig,
    IQMConfig,
    ModelConfig,
    ResNetVisionConfig,
    TextConfig,
    VisionConfig,
)
from aa_clip_iqm_tpu.evaluation import scoring
from aa_clip_iqm_tpu.models import adapters as adapters_mod
from aa_clip_iqm_tpu.models import clip as clip_mod
from aa_clip_iqm_tpu.models import iqm as iqm_mod
from aa_clip_iqm_tpu.models.convert import torch_state_dict_to_params
from aa_clip_iqm_tpu.ops import losses, metrics
from aa_clip_iqm_tpu.ops.attention import vv_attention_batch_axis
from aa_clip_iqm_tpu.ops.layers import layer_norm, mlp_block

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")


def _load(name):
    path = os.path.join(FIXTURE_DIR, name + ".npz")
    with np.load(path) as data:
        return {k: data[k] for k in data.files}


def _meta(fx, key):
    return json.loads(bytes(fx[key]).decode("utf-8"))


def _clip_config(raw) -> CLIPConfig:
    v, t = raw["vision_cfg"], raw["text_cfg"]
    return CLIPConfig(
        embed_dim=raw["embed_dim"],
        vision=VisionConfig(
            image_size=v["image_size"], patch_size=v["patch_size"],
            width=v["width"], layers=v["layers"], head_width=v["head_width"],
            output_dim=raw["embed_dim"],
        ),
        text=TextConfig(
            context_length=t["context_length"], vocab_size=t["vocab_size"],
            width=t["width"], heads=t["heads"], layers=t["layers"],
            output_dim=raw["embed_dim"],
        ),
        act="gelu",  # the live reference path builds CLIP without quick_gelu
    )


def _lin(sd, prefix):
    p = {"w": jnp.asarray(sd[prefix + ".weight"].T)}
    if prefix + ".bias" in sd:
        p["b"] = jnp.asarray(sd[prefix + ".bias"])
    return p


def _ln(sd, prefix):
    return {"scale": jnp.asarray(sd[prefix + ".weight"]),
            "bias": jnp.asarray(sd[prefix + ".bias"])}


# --------------------------------------------------------------------------
# Small-config CLIP towers
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def small_clip():
    fx = _load("small_clip")
    cfg = _clip_config(_meta(fx, "config_json"))
    sd = synth_state_dict(_meta(fx, "manifest_json"))
    params = torch_state_dict_to_params(sd, cfg)
    return fx, cfg, params


def test_vision_forward_matches_executed_reference(small_clip):
    fx, cfg, params = small_clip
    out_layers = tuple(int(v) for v in fx["out_layers"])
    pooled, taps, _ = clip_mod.vision_forward(
        params["visual"], cfg.vision, jnp.asarray(fx["image"]),
        out_layers=out_layers, act_name=cfg.act)
    np.testing.assert_allclose(np.asarray(pooled), fx["pooled"],
                               rtol=2e-5, atol=2e-5)
    for i in range(len(out_layers)):
        np.testing.assert_allclose(np.asarray(taps[i]), fx[f"tap_{i}"],
                                   rtol=2e-5, atol=2e-5)


def test_text_forward_matches_executed_reference(small_clip):
    fx, cfg, params = small_clip
    out = clip_mod.text_forward(params["text"], cfg.text,
                                jnp.asarray(fx["tokens"]), act_name=cfg.act)
    np.testing.assert_allclose(np.asarray(out), fx["text_out"],
                               rtol=2e-5, atol=2e-5)


# --------------------------------------------------------------------------
# Tokenizer + prompt engine vs the executed reference
# (fixture recorded with the reference's OWN vocab file and its own
# get_adapted_single_class_text_embedding crossing/pooling code; our side
# runs the vendored vocab + aa_clip_iqm_tpu.prompts end to end)
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tokenizer_fx():
    fx = _load("tokenizer")
    return fx, _meta(fx, "config_json")


def test_prompt_sentences_match_executed_reference(tokenizer_fx):
    from aa_clip_iqm_tpu import prompts

    fx, raw = tokenizer_fx
    for ds, cls in raw["classes"]:
        groups = prompts.class_prompt_sentences(ds, cls)
        assert [list(g) for g in groups] == raw["sentences"][f"{ds}__{cls}"]


def test_prompt_tokens_match_executed_reference(tokenizer_fx):
    from aa_clip_iqm_tpu.tokenizer import tokenize

    fx, raw = tokenizer_fx
    for ds, cls in raw["classes"]:
        key = f"{ds}__{cls}"
        for gi, kind in enumerate(("normal", "abnormal")):
            ours = tokenize(raw["sentences"][key][gi])
            np.testing.assert_array_equal(ours, fx[f"tokens_{key}_{kind}"])


def test_tokenize_extra_texts_match_executed_reference(tokenizer_fx):
    from aa_clip_iqm_tpu.tokenizer import tokenize

    fx, raw = tokenizer_fx
    np.testing.assert_array_equal(tokenize(raw["extra_texts"]),
                                  fx["tokens_extra"])
    np.testing.assert_array_equal(tokenize([raw["long_text"]], truncate=True),
                                  fx["tokens_truncated"])


def test_class_anchor_matches_executed_reference(tokenizer_fx):
    """Full prompt->anchor pipeline (tokenize, encode, normalize, mean-pool,
    re-normalize, stack) vs the anchors the reference program computed."""
    from aa_clip_iqm_tpu import prompts

    fx, raw = tokenizer_fx
    cfg = _clip_config(raw["clip"])
    sd = synth_state_dict(_meta(fx, "manifest_json"))
    params = torch_state_dict_to_params(sd, cfg)

    def encode(tokens):
        return clip_mod.text_forward(params["text"], cfg.text, tokens,
                                     act_name=cfg.act)

    for ds, cls in raw["classes"]:
        anchor = prompts.compute_class_anchor(encode, ds, cls)
        np.testing.assert_allclose(np.asarray(anchor),
                                   fx[f"anchor_{ds}__{cls}"],
                                   rtol=2e-5, atol=2e-5)


# --------------------------------------------------------------------------
# ModifiedResNet tower (executed standalone; the reference's live ViT path
# never calls it — model/model.py:185-188 passes out_layers, which
# ModifiedResNet.forward does not accept)
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def small_resnet():
    fx = _load("small_resnet")
    raw = _meta(fx, "config_json")
    v, t = raw["vision_cfg"], raw["text_cfg"]
    cfg = CLIPConfig(
        embed_dim=raw["embed_dim"],
        vision=ResNetVisionConfig(
            image_size=v["image_size"], layers=tuple(v["layers"]),
            width=v["width"], output_dim=raw["embed_dim"],
            # reference convention: heads = width*32 // head_width
            # (model/model.py:86)
            heads=v["width"] * 32 // v["head_width"]),
        text=TextConfig(
            context_length=t["context_length"], vocab_size=t["vocab_size"],
            width=t["width"], heads=t["heads"], layers=t["layers"],
            output_dim=raw["embed_dim"]),
        act="gelu")
    # The manifest carries the frozen BatchNorm running stats as well —
    # synth_state_dict regenerates exactly what the recorder assigned.
    sd = synth_state_dict(_meta(fx, "manifest_json"))
    params = torch_state_dict_to_params(sd, cfg)  # RN dispatch branch
    return fx, cfg, params


def test_resnet_forward_matches_executed_reference(small_resnet):
    from aa_clip_iqm_tpu.models.modified_resnet import resnet_forward

    fx, cfg, params = small_resnet
    pooled, features = resnet_forward(params["visual"], cfg.vision,
                                      jnp.asarray(fx["image"]))
    np.testing.assert_allclose(np.asarray(pooled), fx["pooled"],
                               rtol=2e-5, atol=2e-5)
    assert len(features) == len(cfg.vision.layers)


def test_resnet_text_forward_matches_executed_reference(small_resnet):
    fx, cfg, params = small_resnet
    out = clip_mod.text_forward(params["text"], cfg.text,
                                jnp.asarray(fx["tokens"]), act_name=cfg.act)
    np.testing.assert_allclose(np.asarray(out), fx["text_out"],
                               rtol=2e-5, atol=2e-5)


def _executed_surgery_tower(params, cfg, images, out_layers, vv_from):
    """Vision tower with the EXECUTED reference surgery semantics: blocks
    [vv_from, layers) run batch-axis v-v attention (survey Q9) — the
    reference's custom Attention unpacks B,N,C from an (L,N,C) input."""
    vis = params["visual"]
    x = clip_mod.patchify(vis, images, cfg.vision.patch_size)
    b = x.shape[0]
    cls = jnp.broadcast_to(vis["class_embedding"], (b, 1, cfg.vision.width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + vis["positional_embedding"]
    x = layer_norm(vis["ln_pre"], x)

    from aa_clip_iqm_tpu.ops.layers import ACTIVATIONS
    act = ACTIVATIONS[cfg.act]
    taps = []
    x = clip_mod.run_block_range(vis["blocks"], x, 0, vv_from,
                                 cfg.vision.heads, act)
    if vv_from in out_layers:
        taps.append(x)
    for i in range(vv_from, cfg.vision.layers):
        block = clip_mod.block_slice(vis["blocks"], i)
        h = layer_norm(block["ln_1"], x)
        x = x + vv_attention_batch_axis(block["attn"], h, cfg.vision.heads)
        x = x + mlp_block(block["mlp"], layer_norm(block["ln_2"], x), act)
        if i + 1 in out_layers:
            taps.append(x)
    # Prefix taps before vv_from (identical to the plain tower) were skipped
    # above for simplicity; recompute them via the plain path.
    prefix_taps = []
    xp = clip_mod.patchify(vis, images, cfg.vision.patch_size)
    xp = jnp.concatenate([cls, xp], axis=1) + vis["positional_embedding"]
    xp = layer_norm(vis["ln_pre"], xp)
    for start, stop in clip_mod._segments(vv_from, list(out_layers)):
        xp = clip_mod.run_block_range(vis["blocks"], xp, start, stop,
                                      cfg.vision.heads, act)
        if stop in out_layers and stop < vv_from:
            prefix_taps.append(xp)
    taps = prefix_taps + [t for t in taps]
    pooled = layer_norm(vis["ln_post"], x[:, 0])
    pooled = pooled @ vis["proj"]
    return pooled, taps


def test_surgery_batch_axis_matches_executed_reference(small_clip):
    _, cfg, params = small_clip
    fx = _load("small_clip_surgery")
    meta = _meta(fx, "config_json")
    vv_from = clip_mod.surgery_vv_from(cfg.vision.layers, meta["dpam_layer"])
    out_layers = tuple(int(v) for v in fx["out_layers"])
    pooled, taps = _executed_surgery_tower(
        params, cfg, jnp.asarray(fx["image"]), out_layers, vv_from)
    np.testing.assert_allclose(np.asarray(pooled), fx["pooled"],
                               rtol=2e-5, atol=2e-5)
    for i in range(len(out_layers)):
        np.testing.assert_allclose(np.asarray(taps[i]), fx[f"tap_{i}"],
                                   rtol=2e-5, atol=2e-5)


def test_surgery_differs_from_token_axis_vv(small_clip):
    """Sanity: the executed batch-axis semantics is NOT the intended
    token-axis v-v surgery our shipped pipeline uses (survey Q9)."""
    _, cfg, params = small_clip
    fx = _load("small_clip_surgery")
    meta = _meta(fx, "config_json")
    vv_from = clip_mod.surgery_vv_from(cfg.vision.layers, meta["dpam_layer"])
    _, taps, _ = clip_mod.vision_forward(
        params["visual"], cfg.vision, jnp.asarray(fx["image"]),
        out_layers=(cfg.vision.layers,), act_name=cfg.act, vv_from=vv_from)
    last = np.asarray(taps[-1])
    assert not np.allclose(last, fx["tap_2"], atol=1e-3)


# --------------------------------------------------------------------------
# IQM
# --------------------------------------------------------------------------

def map_iqm_state_dict(sd, n_layers: int, freq: int):
    """Reference IQM module keys (model/iqm.py:156-233,234-353,497-515) ->
    our pytree (models/iqm.py init_iqm_params layout)."""
    def attn(prefix):
        return {
            "q": _lin(sd, prefix + ".attention.query"),
            "k": _lin(sd, prefix + ".attention.key"),
            "v": _lin(sd, prefix + ".attention.value"),
            "out_dense": _lin(sd, prefix + ".output.dense"),
            "out_ln": _ln(sd, prefix + ".output.LayerNorm"),
        }

    layers = []
    for i in range(n_layers):
        pre = f"encoder.layer.{i}"
        layer = {"self": attn(pre + ".attention")}
        if i % freq == 0:
            layer["cross"] = attn(pre + ".crossattention")
            layer["text_cross"] = attn(pre + ".text_crossattention")
        layer["ffn_q"] = {
            "intermediate": _lin(sd, pre + ".intermediate_query.dense"),
            "output": _lin(sd, pre + ".output_query.dense"),
            "ln": _ln(sd, pre + ".output_query.LayerNorm"),
        }
        layers.append(layer)
    return {"layernorm": _ln(sd, "layernorm"), "layers": layers}


@pytest.mark.parametrize("name", ["small_iqm", "small_iqm_freq2"])
def test_iqm_forward_matches_executed_reference(name):
    fx = _load(name)
    kw = _meta(fx, "config_json")
    cfg = IQMConfig(
        hidden_size=kw["hidden_size"],
        num_hidden_layers=kw["num_hidden_layers"],
        num_attention_heads=kw["num_attention_heads"],
        intermediate_size=kw["intermediate_size"],
        encoder_hidden_size=kw["encoder_hidden_size"],
        text_encoder_hidden_size=kw["text_encoder_hidden_size"],
        cross_attention_frequency=kw["cross_attention_frequency"],
    )
    sd = synth_state_dict(_meta(fx, "manifest_json"))
    params = map_iqm_state_dict(sd, cfg.num_hidden_layers,
                                cfg.cross_attention_frequency)
    out = iqm_mod.iqm_forward(params, cfg, jnp.asarray(fx["queries"]),
                              jnp.asarray(fx["visual"]),
                              jnp.asarray(fx["text"]))
    np.testing.assert_allclose(np.asarray(out), fx["out"],
                               rtol=2e-5, atol=2e-5)


# --------------------------------------------------------------------------
# AdaptedCLIP at the live ViT-L geometry
# --------------------------------------------------------------------------

def map_adapted_trainable(sd, cfg: ModelConfig):
    """Reference AdaptedCLIP trainable keys (model/adapter.py:33-105) ->
    our trainable pytree (models/adapters.py init_adapter_params layout).
    The lazily-created visual/text_feature_proj use the synthetic values the
    recorder injected after first forward (survey Q2 — untrained in the
    reference, trained+checkpointed here)."""
    a = cfg.adapter
    n_levels = len(a.levels)
    iqm_sd = {k[len("iqm."):]: v for k, v in sd.items()
              if k.startswith("iqm.")}
    return {
        "image_adapter": {
            "layer_adapters": {"w": jnp.asarray(np.stack(
                [sd[f"image_adapter.layer_adapters.{i}.fc.0.weight"].T
                 for i in range(a.image_adapt_until)]))},
            "seg_proj": [
                {"w": jnp.asarray(sd[f"image_adapter.seg_proj.{i}.fc.weight"].T)}
                for i in range(n_levels)],
            "det_proj": {"w": jnp.asarray(sd["image_adapter.det_proj.fc.weight"].T)},
        },
        "text_adapter": {
            "layers": {"w": jnp.asarray(np.stack(
                [sd[f"text_adapter.{i}.fc.0.weight"].T
                 for i in range(a.text_adapt_until)]))},
            "proj": {"w": jnp.asarray(
                sd[f"text_adapter.{a.text_adapt_until}.fc.0.weight"].T)},
        },
        "iqm": map_iqm_state_dict(iqm_sd, cfg.iqm.num_hidden_layers,
                                  cfg.iqm.cross_attention_frequency),
        "class_query_mlp": {"fc1": _lin(sd, "class_query_mlp.0"),
                            "fc2": _lin(sd, "class_query_mlp.2")},
        "query_adapters": [
            {"w": jnp.asarray(sd[f"query_adapters.{i}.fc.weight"].T)}
            for i in range(n_levels)],
        "pos_embedding": jnp.asarray(sd["pos_embedding"][:, :2, :]),
        "visual_feature_proj": _lin(sd, "visual_feature_proj"),
        "text_feature_proj": _lin(sd, "text_feature_proj"),
        "query_proj": {"w": jnp.zeros((cfg.iqm.hidden_size, cfg.clip.embed_dim)),
                       "b": jnp.zeros((cfg.clip.embed_dim,))},
        "iqm_layer_norm": _ln(sd, "iqm_layer_norm"),
    }


@pytest.fixture(scope="module")
def adapted_full():
    fx = _load("adapted_full")
    raw = _meta(fx, "config_json")
    clip_cfg = _clip_config(raw)
    cfg = ModelConfig(
        clip=clip_cfg,
        adapter=AdapterConfig(),  # live defaults: until 3/6, levels 4, no relu
        iqm=IQMConfig(
            hidden_size=raw["iqm"]["hidden_size"],
            num_hidden_layers=raw["iqm"]["num_layers"],
            num_attention_heads=raw["iqm"]["num_heads"],
            encoder_hidden_size=raw["iqm"]["hidden_size"],
            text_encoder_hidden_size=clip_cfg.text.width,
        ),
    )
    sd = synth_state_dict(_meta(fx, "manifest_json"))
    frozen = torch_state_dict_to_params(sd, clip_cfg)
    trainable = map_adapted_trainable(sd, cfg)
    return fx, cfg, frozen, trainable


def test_adapted_forward_matches_executed_reference(adapted_full):
    fx, cfg, frozen, trainable = adapted_full
    b = fx["image"].shape[0]
    anchors = jnp.broadcast_to(jnp.asarray(fx["anchors"])[None],
                               (b, *fx["anchors"].shape))
    out = adapters_mod.encode_image_adapted(
        frozen, trainable, cfg, jnp.asarray(fx["image"]), text_anchors=anchors)
    for i in range(len(cfg.adapter.levels)):
        np.testing.assert_allclose(np.asarray(out.seg_tokens[i]),
                                   fx[f"seg_{i}"], rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(out.det_token), fx["det_token"],
                               rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(out.iqm_queries), fx["iqm_out"],
                               rtol=5e-4, atol=5e-4)


def test_adapted_encode_text_matches_executed_reference(adapted_full):
    fx, cfg, frozen, trainable = adapted_full
    tokens = jnp.asarray(fx["tokens"])
    out = adapters_mod.encode_text_adapted(frozen, trainable, cfg, tokens)
    np.testing.assert_allclose(np.asarray(out), fx["text_out"],
                               rtol=5e-4, atol=5e-5)
    frozen_out = adapters_mod.encode_text_frozen(frozen, cfg, tokens)
    np.testing.assert_allclose(np.asarray(frozen_out), fx["text_frozen"],
                               rtol=5e-4, atol=5e-5)


# --------------------------------------------------------------------------
# forward_utils math (similarity map, seg loss, metrics)
# --------------------------------------------------------------------------

def test_similarity_map_train_matches_executed_reference():
    fx = _load("forward_utils")
    b = fx["feats"].shape[0]
    anchors = jnp.broadcast_to(jnp.asarray(fx["anchors"])[None],
                               (b, *fx["anchors"].shape))
    sim = scoring.similarity_map_train(jnp.asarray(fx["feats"]), anchors,
                                       fx["sim_train"].shape[-1])
    np.testing.assert_allclose(np.asarray(sim), fx["sim_train"],
                               rtol=2e-5, atol=2e-6)


def test_seg_loss_matches_executed_reference():
    fx = _load("forward_utils")
    loss = losses.seg_loss(jnp.asarray(fx["sim_train"]),
                           jnp.asarray(fx["mask"]))
    np.testing.assert_allclose(float(loss), float(fx["seg_loss"]),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("domain,key", [("Industrial", "metrics_industrial"),
                                        ("Medical", "metrics_medical")])
def test_metrics_eval_matches_executed_reference(domain, key):
    fx = _load("forward_utils")
    res = metrics.metrics_eval(fx["pixel_label"], fx["image_label"],
                               fx["pixel_preds"], fx["image_preds"],
                               "x", domain)
    got = np.asarray([res["pixel AUC"], res["pixel AP"],
                      res["image AUC"], res["image AP"]])
    np.testing.assert_allclose(got, fx[key], atol=0.011)


# --------------------------------------------------------------------------
# eval driver map math (test_last.get_predictions, executed)
# --------------------------------------------------------------------------

def test_eval_maps_match_executed_reference():
    """The reference EVAL driver itself (test_last.py:53-158) produced this
    fixture: IQM query maps through the executed fresh-Linear projection
    (survey Q2), sigmoid cosine differences, align_corners=False upsample,
    the 0.6/0.4 fusion, and the (B,B,2)-broadcast image score (survey Q11).
    The only substituted piece was the kornia-dependent text-map call, whose
    synthetic outputs are fixture INPUTS here."""
    fx = _load("eval_maps")
    cfg = _meta(fx, "config_json")
    img = cfg["img"]
    queries = jnp.asarray(fx["queries"])                     # (B, 2, dq)
    # torch nn.Linear: x @ W.T + b
    q_proj = jnp.einsum("bqd,fd->bqf", queries,
                        jnp.asarray(fx["proj_w"])) + jnp.asarray(fx["proj_b"])
    iqm_maps, text_maps = [], []
    for i in range(cfg["levels"]):
        iqm_maps.append(scoring.iqm_score_map(
            jnp.asarray(fx[f"feat_{i}"]), q_proj, img, align_corners=False))
        text_maps.append(jnp.asarray(fx[f"text_map_{i}"])[:, 0])
    final = scoring.fuse_maps(text_maps, iqm_maps)
    np.testing.assert_allclose(np.asarray(final), fx["preds"][:, 0],
                               rtol=2e-5, atol=2e-6)

    b = fx["det"].shape[0]
    anchors = jnp.broadcast_to(jnp.asarray(fx["anchors"])[None],
                               (b, *fx["anchors"].shape))
    score = scoring.image_logit_reference_eval(jnp.asarray(fx["det"]),
                                               anchors)
    # metrics_eval keeps channel 0 of the recorded (B, 2) image preds —
    # the NORMAL anchor (forward_utils.py:269-271).
    np.testing.assert_allclose(np.asarray(score), fx["preds_image"][:, 0],
                               rtol=1e-5, atol=1e-6)
