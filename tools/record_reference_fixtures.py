"""Record golden-activation fixtures by EXECUTING the reference model code.

Runs the PyTorch reference (/root/reference) itself — not a transcription —
on deterministic synthetic weights (tests/fixture_weights.py) and dumps
inputs/outputs into tests/fixtures/*.npz. The fixture tests
(tests/test_reference_fixtures.py) then pin the JAX pipeline against these
recordings with no torch and no reference import at test time, breaking the
same-author-transcription circularity in the parity chain (tests/torch_ref.py
is written by the same builder as the implementation; these fixtures are
produced by the reference program itself).

STANDALONE TOOL: run manually (`python tools/record_reference_fixtures.py`),
never imported by the package or the tests — the shipped code keeps the
"never import /root/reference" invariant. Requires torch + transformers
(installed here); kornia/ftfy/cv2/ipdb are stubbed (module-import only, no
stubbed function is ever executed on a recorded path).

Reference surfaces driven (file:line):
  * CLIP.encode_image -> VisionTransformer.forward(x, out_layers)
    (model/model.py:185-188, model/transformer.py:490-551)
  * DAPM_replace surgery + the executed batch-axis v-v attention
    (model/transformer.py:406-425, :102-152 — survey Q9 semantics)
  * CLIP.encode_text (model/model.py:190-201)
  * IQM.forward (model/iqm.py:497-673), standalone at small configs
  * AdaptedCLIP.forward + .encode_text at the live ViT-L geometry
    (model/adapter.py:137-304) incl. the lazily-created projections
  * forward_utils.calculate_similarity_map (train branch, :196-216),
    calculate_seg_loss (:223-227), metrics_eval (:233-308)
  * ModifiedResNet.forward (model/modified_resnet.py:132-217) via a CLIP
    built with a tuple-typed vision_cfg.layers (model/model.py:85-93),
    incl. frozen-BN eval statistics
  * tokenize() (model/tokenizer.py:150-186) + the reference's own
    prompt-anchor construction get_adapted_single_class_text_embedding
    (forward_utils.py:138-162) — sentences, token ids and (dim, 2) anchors
  * test_last.get_predictions (test_last.py:53-158): the EVAL-path IQM
    query maps (fresh per-batch Linear projection — survey Q2 — cosine
    sims, sigmoid, align_corners=False upsample), the 0.6/0.4 map fusion,
    and the broadcast image score (survey Q11), with only the
    kornia-dependent text-map call substituted by synthetic maps

Usage: `python tools/record_reference_fixtures.py [fixture_name ...]`
(no args = record everything).
"""
from __future__ import annotations

import json
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("AACLIP_REFERENCE_PATH", "/root/reference")
FIXTURE_DIR = os.path.join(REPO, "tests", "fixtures")

sys.path.insert(0, os.path.join(REPO, "tests"))   # fixture_weights
sys.path.insert(0, REFERENCE)                     # the reference package

from fixture_weights import (  # noqa: E402
    canonical_key,
    synth_tokens,
    synth_value,
)


def _stub_modules():
    """Stub unavailable imports of the reference modules. Every stubbed
    callable raises if actually executed; only module import is satisfied."""
    import importlib.machinery

    def _raise(*a, **k):
        raise RuntimeError("stubbed dependency called during recording")

    def _mod(name):
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        return m

    ipdb = _mod("ipdb")
    ipdb.set_trace = _raise
    sys.modules.setdefault("ipdb", ipdb)

    kornia = _mod("kornia")
    kornia_filters = _mod("kornia.filters")
    kornia_filters.gaussian_blur2d = _raise
    kornia.filters = kornia_filters
    sys.modules.setdefault("kornia", kornia)
    sys.modules.setdefault("kornia.filters", kornia_filters)

    cv2 = _mod("cv2")
    cv2.applyColorMap = _raise
    cv2.cvtColor = _raise
    cv2.imwrite = _raise
    cv2.COLORMAP_JET = 2
    cv2.COLOR_BGR2RGB = 4
    sys.modules.setdefault("cv2", cv2)

    torchvision = _mod("torchvision")
    tv_transforms = _mod("torchvision.transforms")
    torchvision.transforms = tv_transforms
    for attr in ("Compose", "Resize", "CenterCrop", "ToTensor", "Normalize",
                 "ToPILImage", "RandomApply", "RandomRotation", "RandomAffine",
                 "RandomHorizontalFlip", "RandomVerticalFlip", "ColorJitter"):
        setattr(tv_transforms, attr, _raise)
    sys.modules.setdefault("torchvision", torchvision)
    sys.modules.setdefault("torchvision.transforms", tv_transforms)

    ftfy = _mod("ftfy")
    ftfy.fix_text = _raise
    sys.modules.setdefault("ftfy", ftfy)

    if "pkg_resources" not in sys.modules:  # removed in setuptools >= 81
        import packaging

        pkg_resources = _mod("pkg_resources")
        pkg_resources.packaging = packaging
        sys.modules["pkg_resources"] = pkg_resources

    # transformers >= 4.40 moved these helpers out of modeling_utils; the
    # reference (pinned to an older transformers) imports them from there.
    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as pu
    for name in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices",
                 "prune_linear_layer"):
        if not hasattr(mu, name):
            setattr(mu, name, getattr(pu, name))


def _load_synth_weights(model):
    """Assign deterministic values to every param/buffer by canonical name."""
    import torch

    with torch.no_grad():
        for name, p in model.named_parameters():
            p.data = torch.from_numpy(synth_value(canonical_key(name), p.shape))
        for name, b in model.named_buffers():
            if b is None or "attn_mask" in name:
                continue  # causal mask: structural, keep
            if b.dtype in (torch.int64, torch.int32):
                continue  # num_batches_tracked etc.
            b.data = torch.from_numpy(synth_value(canonical_key(name), b.shape))


def _manifest(model, buffers: bool = False):
    """Canonical (key, shape) list. ``buffers=True`` additionally records the
    float buffers `_load_synth_weights` assigned (BatchNorm running stats) so
    the test side can regenerate them; structural/int buffers (attn_mask,
    num_batches_tracked) are never part of the synthetic state."""
    import torch

    keys = {}
    for name, p in model.named_parameters():
        keys[canonical_key(name)] = list(p.shape)
    if buffers:
        for name, b in model.named_buffers():
            if b is None or "attn_mask" in name:
                continue
            if b.dtype in (torch.int64, torch.int32):
                continue
            keys[canonical_key(name)] = list(b.shape)
    return sorted(keys.items())


def _save(name, manifest=None, config=None, **arrays):
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    payload = {k: np.asarray(v) for k, v in arrays.items()}
    if manifest is not None:
        payload["manifest_json"] = np.bytes_(json.dumps(manifest))
    if config is not None:
        payload["config_json"] = np.bytes_(json.dumps(config))
    path = os.path.join(FIXTURE_DIR, name + ".npz")
    np.savez_compressed(path, **payload)
    size = os.path.getsize(path) / 1e6
    print(f"  wrote {path} ({size:.2f} MB)")


SMALL_CFG = {
    "embed_dim": 48,
    "vision_cfg": {"image_size": 28, "patch_size": 7, "width": 64,
                   "layers": 6, "head_width": 16},
    "text_cfg": {"context_length": 16, "vocab_size": 256, "width": 64,
                 "heads": 4, "layers": 3},
}


def _build_small_clip():
    import torch
    from model.model import CLIP

    torch.manual_seed(0)
    model = CLIP(embed_dim=SMALL_CFG["embed_dim"],
                 vision_cfg=SMALL_CFG["vision_cfg"],
                 text_cfg=SMALL_CFG["text_cfg"])
    model.eval()  # the live reference holds eval() in both stages (survey Q5)
    _load_synth_weights(model)
    return model


def record_small_clip():
    import torch

    print("[small_clip] CLIP vision/text towers @ tiny config")
    model = _build_small_clip()
    rs = np.random.default_rng(11)
    x = rs.standard_normal((2, 3, 28, 28)).astype(np.float32)
    out_layers = [2, 4, 6]
    with torch.no_grad():
        pooled, taps = model.encode_image(torch.from_numpy(x), out_layers)
    tokens = synth_tokens(3, 16, 256, seed=5)
    with torch.no_grad():
        text_out = model.encode_text(torch.from_numpy(tokens))
    _save(
        "small_clip",
        manifest=_manifest(model), config=SMALL_CFG,
        image=x, out_layers=np.asarray(out_layers),
        pooled=pooled.numpy(),
        **{f"tap_{i}": t.numpy() for i, t in enumerate(taps)},
        tokens=tokens, text_out=text_out.numpy(),
    )

    # Surgery model: same weights, last DPAM_layer-1 blocks replaced by the
    # executed (batch-axis, survey Q9) v-v attention.
    dpam = 4
    model.visual.DAPM_replace(DPAM_layer=dpam)
    model.eval()
    with torch.no_grad():
        pooled_s, taps_s = model.encode_image(torch.from_numpy(x), out_layers)
    _save(
        "small_clip_surgery",
        config={**SMALL_CFG, "dpam_layer": dpam},
        image=x, out_layers=np.asarray(out_layers),
        pooled=pooled_s.numpy(),
        **{f"tap_{i}": t.numpy() for i, t in enumerate(taps_s)},
    )


IQM_CASES = [
    # (name, config kwargs, visual len, text len)
    ("small_iqm", dict(hidden_size=32, num_hidden_layers=2,
                       num_attention_heads=4, intermediate_size=64,
                       encoder_hidden_size=24, text_encoder_hidden_size=16,
                       cross_attention_frequency=1), 9, 2),
    ("small_iqm_freq2", dict(hidden_size=32, num_hidden_layers=3,
                             num_attention_heads=2, intermediate_size=48,
                             encoder_hidden_size=40,
                             text_encoder_hidden_size=24,
                             cross_attention_frequency=2), 5, 3),
]


def record_iqm():
    import torch
    from model.iqm import IQM, IQMConfig

    for name, kwargs, lv, lt in IQM_CASES:
        print(f"[{name}] IQM.forward standalone")
        torch.manual_seed(0)
        cfg = IQMConfig(**kwargs)
        model = IQM(cfg)
        model.eval()
        _load_synth_weights(model)
        rs = np.random.default_rng(23)
        q = rs.standard_normal((2, 2, kwargs["hidden_size"])).astype(np.float32)
        vis = rs.standard_normal(
            (2, lv, kwargs["encoder_hidden_size"])).astype(np.float32)
        txt = rs.standard_normal(
            (2, lt, kwargs["text_encoder_hidden_size"])).astype(np.float32)
        with torch.no_grad():
            out = model(
                query_embeds=torch.from_numpy(q), query_length=2,
                encoder_hidden_states=torch.from_numpy(vis),
                text_encoder_hidden_states=torch.from_numpy(txt),
            ).last_hidden_state
        _save(name, manifest=_manifest(model), config=kwargs,
              queries=q, visual=vis, text=txt, out=out.numpy())


FULL_CFG = {
    # Live ViT-L geometry (widths/layers the reference hardcodes in
    # AdaptedCLIP, model/adapter.py:35-54,137-304) at a small image size.
    "embed_dim": 768,
    "vision_cfg": {"image_size": 70, "patch_size": 14, "width": 1024,
                   "layers": 24, "head_width": 64},
    "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 768,
                 "heads": 12, "layers": 12},
    "iqm": {"hidden_size": 512, "num_layers": 2, "num_heads": 8},
}


def record_adapted_full():
    import torch
    from model.adapter import AdaptedCLIP
    from model.model import CLIP

    print("[adapted_full] AdaptedCLIP.forward/encode_text @ ViT-L geometry")
    torch.manual_seed(0)
    clip_model = CLIP(embed_dim=FULL_CFG["embed_dim"],
                      vision_cfg=FULL_CFG["vision_cfg"],
                      text_cfg=FULL_CFG["text_cfg"])
    model = AdaptedCLIP(
        clip_model=clip_model,
        relu=False,  # train.py:251 --relu default (store_true, off)
        iqm_hidden_size=FULL_CFG["iqm"]["hidden_size"],
        iqm_num_layers=FULL_CFG["iqm"]["num_layers"],
        iqm_num_heads=FULL_CFG["iqm"]["num_heads"],
    )
    model.eval()
    _load_synth_weights(model)

    rs = np.random.default_rng(41)
    x = rs.standard_normal((2, 3, 70, 70)).astype(np.float32)
    # Stage-2 anchors: per-class (embed_dim, 2) — the dim-2 branch the live
    # train loop hits (model/adapter.py:226-228 transposes to (B, 2, 768)).
    anchors = rs.standard_normal((768, 2)).astype(np.float32)

    xt = torch.from_numpy(x)
    at = torch.from_numpy(anchors)
    with torch.no_grad():
        model(xt, at)  # creates the lazy visual/text_feature_proj Linears
        for attr in ("visual_feature_proj", "text_feature_proj"):
            lin = getattr(model, attr)
            lin.weight.data = torch.from_numpy(
                synth_value(f"{attr}.weight", lin.weight.shape))
            lin.bias.data = torch.from_numpy(
                synth_value(f"{attr}.bias", lin.bias.shape))
        seg_tokens, det_token, iqm_outputs = model(xt, at)

    tokens = synth_tokens(4, 77, 49408, seed=13)
    with torch.no_grad():
        text_out = model.encode_text(torch.from_numpy(tokens))
        text_frozen = model.encode_text(torch.from_numpy(tokens),
                                        adapt_text=False)

    manifest = _manifest(model)
    manifest += [("visual_feature_proj.weight", [512, 512]),
                 ("visual_feature_proj.bias", [512]),
                 ("text_feature_proj.weight", [768, 768]),
                 ("text_feature_proj.bias", [768])]
    _save(
        "adapted_full",
        manifest=manifest, config=FULL_CFG,
        image=x, anchors=anchors,
        **{f"seg_{i}": t.numpy() for i, t in enumerate(seg_tokens)},
        det_token=det_token.numpy(),
        iqm_out=iqm_outputs.last_hidden_state.numpy(),
        tokens=tokens, text_out=text_out.numpy(),
        text_frozen=text_frozen.numpy(),
    )


TOKENIZER_CFG = {
    # Real CLIP vocab so genuine token ids embed; tiny text tower otherwise.
    "embed_dim": 40,
    "vision_cfg": {"image_size": 28, "patch_size": 7, "width": 32,
                   "layers": 2, "head_width": 16},
    "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 32,
                 "heads": 2, "layers": 2},
}

# Classes spanning both prompt branches: REAL_NAMES lookup and the literal
# "object" stage-1 path (forward_utils.py:139-145).
PROMPT_CLASSES = [("MVTec", "bottle"), ("MVTec", "zipper"),
                  ("VisA", "candle"), ("MVTec", "object")]

# Pure printable ASCII with at most singly-escaped HTML entities — the input
# class on which real ftfy.fix_text is the identity (its transforms: mojibake
# repair, width folding, quote uncurling, ligatures, NFC — are all no-ops
# here), so recording with an identity stand-in captures the true reference
# behavior. Non-ASCII fix_text semantics are pinned separately by
# tests/test_tokenizer.py's property tests.
EXTRA_TEXTS = [
    "",
    "a photo of a flawless bottle.",
    "isn't it FLAWED?!  it's fine... maybe;",
    "  leading and   internal \t whitespace \n runs  ",
    "R2-D2 has 3 dents & 42% scratches &amp; one chip",
    "hyphenated-word under_score CamelCase ALLCAPS 100x 0.5mm",
    "quotes \"double\" and 'single' and `backtick`",
    "<|startoftext|> literal control token <|endoftext|>",
]
LONG_TEXT = "a bottle with a dent and a scratch " * 20  # >77 tokens


def record_tokenizer():
    """Reference tokenize() + the reference's own prompt-anchor construction.

    Drives get_adapted_single_class_text_embedding (forward_utils.py:138-162)
    with a tiny real-vocab CLIP: the reference code itself builds the prompt
    cross product, tokenizes it, encodes, normalizes, mean-pools and stacks
    the (embed_dim, 2) anchor. The sentences are captured by wrapping the
    module-global tokenize, so the crossing ORDER is the executed reference's
    too, not a transcription.
    """
    import torch
    from model.model import CLIP
    from model.tokenizer import tokenize

    import forward_utils as fu

    print("[tokenizer] reference tokenize + prompt-anchor construction")
    ftfy = sys.modules["ftfy"]
    saved_fix_text = ftfy.fix_text
    ftfy.fix_text = lambda s: s  # identity on this corpus; see EXTRA_TEXTS
    torch.manual_seed(0)
    model = CLIP(embed_dim=TOKENIZER_CFG["embed_dim"],
                 vision_cfg=TOKENIZER_CFG["vision_cfg"],
                 text_cfg=TOKENIZER_CFG["text_cfg"])
    model.eval()
    _load_synth_weights(model)

    captured = []
    orig_tokenize = fu.tokenize

    def capture_tokenize(texts, *a, **k):
        captured.append(list(texts))
        return orig_tokenize(texts, *a, **k)

    arrays, sentences = {}, {}
    fu.tokenize = capture_tokenize
    try:
        for ds, cls in PROMPT_CLASSES:
            captured.clear()
            with torch.no_grad():
                anchor = fu.get_adapted_single_class_text_embedding(
                    model, ds, cls, torch.device("cpu"))
            assert len(captured) == 2  # normal group, abnormal group
            key = f"{ds}__{cls}"
            sentences[key] = [list(g) for g in captured]
            arrays[f"anchor_{key}"] = anchor.numpy()
            arrays[f"tokens_{key}_normal"] = tokenize(captured[0]).numpy()
            arrays[f"tokens_{key}_abnormal"] = tokenize(captured[1]).numpy()
        arrays["tokens_extra"] = tokenize(EXTRA_TEXTS).numpy()
        arrays["tokens_truncated"] = tokenize([LONG_TEXT],
                                              truncate=True).numpy()
    finally:
        fu.tokenize = orig_tokenize
        ftfy.fix_text = saved_fix_text
    _save(
        "tokenizer",
        manifest=_manifest(model),
        config={"clip": TOKENIZER_CFG,
                "classes": [list(c) for c in PROMPT_CLASSES],
                "sentences": sentences,
                "extra_texts": EXTRA_TEXTS,
                "long_text": LONG_TEXT},
        **arrays,
    )


RN_CFG = {
    # Tuple-typed vision layers select ModifiedResNet (model/model.py:85-93);
    # heads = width*32 // head_width, attnpool spatial = image_size//32.
    "embed_dim": 48,
    "vision_cfg": {"image_size": 64, "layers": [2, 2, 2, 2], "width": 8,
                   "head_width": 64},
    "text_cfg": {"context_length": 12, "vocab_size": 128, "width": 32,
                 "heads": 2, "layers": 2},
}


def record_modified_resnet():
    """ModifiedResNet tower + RN-config text tower, executed standalone.

    The reference's live ViT path never calls this tower (CLIP.encode_image
    passes out_layers, which ModifiedResNet.forward does not accept —
    model/model.py:185-188 vs model/modified_resnet.py:210-217), so the
    tower is driven directly, covering the 3-conv stem, avg-pool
    anti-aliased striding, frozen-BN eval statistics, and AttentionPool2d.
    """
    import torch
    from model.model import CLIP

    print("[small_resnet] ModifiedResNet CLIP @ tiny RN config")
    torch.manual_seed(0)
    model = CLIP(embed_dim=RN_CFG["embed_dim"],
                 vision_cfg=RN_CFG["vision_cfg"],
                 text_cfg=RN_CFG["text_cfg"])
    model.eval()  # BatchNorm must consume the (synthetic) running stats
    _load_synth_weights(model)
    rs = np.random.default_rng(31)
    x = rs.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        pooled = model.visual(torch.from_numpy(x))
    tokens = synth_tokens(3, 12, 128, seed=9)
    with torch.no_grad():
        text_out = model.encode_text(torch.from_numpy(tokens))
    _save(
        "small_resnet",
        manifest=_manifest(model, buffers=True), config=RN_CFG,
        image=x, pooled=pooled.numpy(),
        tokens=tokens, text_out=text_out.numpy(),
    )


def record_forward_utils():
    import torch
    from forward_utils import (
        calculate_seg_loss,
        calculate_similarity_map,
        metrics_eval,
    )

    print("[forward_utils] similarity map (train), seg loss, metrics")
    rs = np.random.default_rng(77)
    feats = rs.standard_normal((2, 25, 48)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    anchors = rs.standard_normal((48, 2)).astype(np.float32)
    anchors /= np.linalg.norm(anchors, axis=0, keepdims=True)
    with torch.no_grad():
        sim_train = calculate_similarity_map(
            torch.from_numpy(feats), torch.from_numpy(anchors), 28, test=False)
        mask = (rs.random((2, 1, 28, 28)) < 0.2).astype(np.float32)
        seg_loss = calculate_seg_loss(sim_train, torch.from_numpy(mask))

    pixel_preds = rs.random((6, 12, 12)).astype(np.float32)
    pixel_label = (rs.random((6, 12, 12)) < 0.3).astype(np.int64)
    image_label = np.array([0, 1, 0, 1, 1, 0], np.int64)
    image_preds = rs.random((6,)).astype(np.float32)
    res_ind = metrics_eval(pixel_label.copy(), image_label.copy(),
                           pixel_preds.copy(), image_preds.copy(),
                           "widget", "Industrial")
    res_med = metrics_eval(pixel_label.copy(), image_label.copy(),
                           pixel_preds.copy(), image_preds.copy(),
                           "organ", "Medical")
    _save(
        "forward_utils",
        feats=feats, anchors=anchors, sim_train=sim_train.numpy(),
        mask=mask, seg_loss=np.float32(seg_loss.item()),
        pixel_preds=pixel_preds, pixel_label=pixel_label,
        image_label=image_label, image_preds=image_preds,
        metrics_industrial=np.asarray(
            [res_ind["pixel AUC"], res_ind["pixel AP"],
             res_ind["image AUC"], res_ind["image AP"]], np.float64),
        metrics_medical=np.asarray(
            [res_med["pixel AUC"], res_med["pixel AP"],
             res_med["image AUC"], res_med["image AP"]], np.float64),
    )


def record_eval_maps():
    """Execute the reference EVAL driver's map math (test_last.py:53-158).

    Drives `test_last.get_predictions` itself with a stub AdaptedCLIP that
    returns fixed (patch_features, det_feature, iqm_outputs) and a one-batch
    loader. The ONE substitution is `calculate_similarity_map` (its test
    branch needs kornia's gaussian_blur2d, uninstallable here): it returns
    pre-generated synthetic text maps, which the fixture records as inputs.
    Everything else that runs is the reference's own executed code:
      - the (B,B,2) broadcast image score `(pred[:,1]+1)/2`
        (test_last.py:90-92, survey Q11);
      - the IQM branch (test_last.py:104-138): query extraction, the fresh
        `nn.Linear` projection created on the first level and implicitly
        reused after (norm_query is REBOUND to the projected dim — survey
        Q2 as executed), cosine sims, sigmoid, reshape, bilinear
        align_corners=False upsample;
      - the 0.6/0.4 fusion over level sums (test_last.py:141-149).
    The projection weights are regenerated post-hoc by replaying the torch
    RNG (manual_seed + one nn.Linear construction — nothing else in the
    driven path consumes RNG) and saved for the JAX side.
    """
    import torch
    import torch.nn as nn

    import test_last

    print("[eval_maps] test_last.get_predictions IQM maps + fusion + score")
    B, L, img = 2, 25, 20
    d_feat, d_query, d_embed = 48, 32, 40
    levels = 2
    rs = np.random.default_rng(55)
    feats = [rs.standard_normal((B, L, d_feat)).astype(np.float32)
             for _ in range(levels)]
    det = rs.standard_normal((B, d_embed)).astype(np.float32)
    queries = rs.standard_normal((B, 2, d_query)).astype(np.float32)
    anchors = rs.standard_normal((d_embed, 2)).astype(np.float32)
    anchors /= np.linalg.norm(anchors, axis=0, keepdims=True)
    text_maps = [rs.standard_normal((B, 1, img, img)).astype(np.float32)
                 for _ in range(levels)]

    class StubAdapted(nn.Module):
        def forward(self, image, text_embeddings=None):
            out = types.SimpleNamespace(
                last_hidden_state=torch.from_numpy(queries))
            return ([torch.from_numpy(f) for f in feats],
                    torch.from_numpy(det), out)

    calls = []

    def fake_similarity_map(f, emb, img_size, test=False, domain=None):
        calls.append((np.asarray(f.detach()), bool(test), domain))
        return torch.from_numpy(text_maps[len(calls) - 1])

    loader = [{
        "image": torch.zeros((B, 3, img, img)),
        "mask": torch.from_numpy(
            (rs.random((B, 1, img, img)) < 0.2).astype(np.float32)),
        "label": torch.from_numpy(np.array([0, 1], np.int64)),
        "file_name": ["a.png", "b.png"],
        "class_name": ["widget"] * B,
    }]

    saved = test_last.calculate_similarity_map
    test_last.calculate_similarity_map = fake_similarity_map
    try:
        torch.manual_seed(7)
        masks, labels, preds, preds_image, file_names = \
            test_last.get_predictions(
                StubAdapted(), torch.from_numpy(anchors), loader,
                torch.device("cpu"), img, dataset="MVTec")
    finally:
        test_last.calculate_similarity_map = saved
    assert len(calls) == levels and all(c[1] for c in calls)
    # Replay the RNG to recover the fresh projection's weights: the driven
    # path creates exactly one nn.Linear(d_query, d_feat) after the seed.
    torch.manual_seed(7)
    proj = nn.Linear(d_query, d_feat)
    _save(
        "eval_maps",
        config={"B": B, "L": L, "img": img, "levels": levels,
                "d_feat": d_feat, "d_query": d_query, "d_embed": d_embed,
                "file_names": list(file_names)},
        **{f"feat_{i}": f for i, f in enumerate(feats)},
        **{f"text_map_{i}": m for i, m in enumerate(text_maps)},
        det=det, queries=queries, anchors=anchors,
        proj_w=proj.weight.detach().numpy(),
        proj_b=proj.bias.detach().numpy(),
        preds=preds, preds_image=preds_image,
        masks=masks, labels=labels,
    )


RECORDERS = {
    "small_clip": record_small_clip,
    "iqm": record_iqm,
    "forward_utils": record_forward_utils,
    "adapted_full": record_adapted_full,
    "small_resnet": record_modified_resnet,
    "tokenizer": record_tokenizer,
    "eval_maps": record_eval_maps,
}


def main():
    names = sys.argv[1:] or list(RECORDERS)
    unknown = [n for n in names if n not in RECORDERS]
    if unknown:
        raise SystemExit(f"unknown fixture(s) {unknown}; "
                         f"choose from {sorted(RECORDERS)}")
    _stub_modules()
    for n in names:
        RECORDERS[n]()
    print("done")


if __name__ == "__main__":
    main()
