"""OpenAI CLIP checkpoint -> JAX parameter pytree converter.

The reference loads `model/ViT-L-14-336px.pt` via torch (model/openai.py:17-136,
model/clip.py:107-132) and bicubic-resizes the visual positional embedding for
non-native image sizes (model/model.py:396-427). This module performs the same
load host-side with torch-CPU (or a plain state-dict of numpy arrays), maps the
weights into our functional layout (see models/clip.py docstring), and resizes
the pos-embed with our bicubic operator.

Weight-layout notes (torch -> ours):
  - nn.Linear weight (out, in)  -> w (in, out): transpose.
  - MultiheadAttention in_proj_weight (3d, d) -> qkv.w (d, 3d): transpose
    (q/k/v chunk order is preserved by the transpose).
  - conv1 weight (width, 3, p, p) -> patch_embed.w (3*p*p, width): the
    flattened (c, ph, pw) order matches our patchify token layout.

Also supports saving/loading the converted pytree as a flat .npz so torch is
only needed once.
"""
from __future__ import annotations

import io
import os
from typing import Dict

import jax.numpy as jnp
import numpy as np

from ..configs import CLIPConfig
from .clip import resize_pos_embed_np


def _t(x):
    return np.ascontiguousarray(np.asarray(x, dtype=np.float32).T)


def _ln(sd, prefix):
    return {"scale": np.asarray(sd[prefix + ".weight"], np.float32),
            "bias": np.asarray(sd[prefix + ".bias"], np.float32)}


def _block(sd, prefix):
    return {
        "ln_1": _ln(sd, prefix + ".ln_1"),
        "attn": {
            "qkv": {"w": _t(sd[prefix + ".attn.in_proj_weight"]),
                    "b": np.asarray(sd[prefix + ".attn.in_proj_bias"], np.float32)},
            "out": {"w": _t(sd[prefix + ".attn.out_proj.weight"]),
                    "b": np.asarray(sd[prefix + ".attn.out_proj.bias"], np.float32)},
        },
        "ln_2": _ln(sd, prefix + ".ln_2"),
        "mlp": {
            "c_fc": {"w": _t(sd[prefix + ".mlp.c_fc.weight"]),
                     "b": np.asarray(sd[prefix + ".mlp.c_fc.bias"], np.float32)},
            "c_proj": {"w": _t(sd[prefix + ".mlp.c_proj.weight"]),
                       "b": np.asarray(sd[prefix + ".mlp.c_proj.bias"], np.float32)},
        },
    }


def _stack_np(blocks):
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *blocks)


def _text_tree(sd, cfg: CLIPConfig):
    return {
        "token_embedding": np.asarray(sd["token_embedding.weight"], np.float32),
        "positional_embedding": np.asarray(sd["positional_embedding"], np.float32),
        "blocks": _stack_np([_block(sd, f"transformer.resblocks.{i}")
                             for i in range(cfg.text.layers)]),
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": np.asarray(sd["text_projection"], np.float32),
    }


def _conv_t(w):
    """torch conv kernel (out, in, kh, kw) -> HWIO."""
    return np.ascontiguousarray(
        np.asarray(w, np.float32).transpose(2, 3, 1, 0))


def _bn_t(sd, prefix):
    return {"scale": np.asarray(sd[prefix + ".weight"], np.float32),
            "bias": np.asarray(sd[prefix + ".bias"], np.float32),
            "mean": np.asarray(sd[prefix + ".running_mean"], np.float32),
            "var": np.asarray(sd[prefix + ".running_var"], np.float32)}


def _lin_t(sd, prefix):
    p = {"w": _t(sd[prefix + ".weight"])}
    if prefix + ".bias" in sd:
        p["b"] = np.asarray(sd[prefix + ".bias"], np.float32)
    return p


def resnet_state_dict_to_params(sd: Dict[str, "np.ndarray"], cfg: CLIPConfig):
    """Map an OpenAI RN-style CLIP state dict into our ModifiedResNet pytree
    (reference tower: model/modified_resnet.py:132-217; torch key layout:
    visual.conv{1-3}/bn{1-3} stem, visual.layer{1-4}.{i}.conv*/bn*/
    downsample.{0,1}, visual.attnpool.{q,k,v,c}_proj + positional_embedding).
    The attnpool positional embedding is bicubic-resized for non-native
    image sizes, like the ViT path."""
    v = cfg.vision  # ResNetVisionConfig
    visual = {}
    for i in (1, 2, 3):
        visual[f"conv{i}"] = {"kernel": _conv_t(sd[f"visual.conv{i}.weight"])}
        visual[f"bn{i}"] = _bn_t(sd, f"visual.bn{i}")
    stages = []
    for s, n_blocks in enumerate(v.layers, start=1):
        blocks = []
        for bi in range(n_blocks):
            pre = f"visual.layer{s}.{bi}"
            blk = {
                "conv1": {"kernel": _conv_t(sd[pre + ".conv1.weight"])},
                "bn1": _bn_t(sd, pre + ".bn1"),
                "conv2": {"kernel": _conv_t(sd[pre + ".conv2.weight"])},
                "bn2": _bn_t(sd, pre + ".bn2"),
                "conv3": {"kernel": _conv_t(sd[pre + ".conv3.weight"])},
                "bn3": _bn_t(sd, pre + ".bn3"),
            }
            if pre + ".downsample.0.weight" in sd:
                blk["downsample"] = {
                    "conv": {"kernel": _conv_t(sd[pre + ".downsample.0.weight"])},
                    "bn": _bn_t(sd, pre + ".downsample.1"),
                }
            blocks.append(blk)
        stages.append(blocks)
    visual["layers"] = stages

    pos = np.asarray(sd["visual.attnpool.positional_embedding"], np.float32)
    pos = resize_pos_embed_np(pos, v.grid)
    visual["attnpool"] = {
        "positional_embedding": pos,
        "q": _lin_t(sd, "visual.attnpool.q_proj"),
        "k": _lin_t(sd, "visual.attnpool.k_proj"),
        "v": _lin_t(sd, "visual.attnpool.v_proj"),
        "c_proj": _lin_t(sd, "visual.attnpool.c_proj"),
    }
    params = {
        "visual": visual,
        "text": _text_tree(sd, cfg),
        "logit_scale": np.asarray(sd.get("logit_scale", np.log(1 / 0.07)),
                                  np.float32),
    }
    return _to_jax(params)


def torch_state_dict_to_params(sd: Dict[str, "np.ndarray"], cfg: CLIPConfig):
    """Map an OpenAI CLIP state dict (numpy-valued) into our pytree, resizing
    the visual positional embedding to cfg.vision.image_size. Dispatches to
    the ModifiedResNet mapping for RN configs (list-typed vision layers,
    model/clip.py:129-130)."""
    if not all(isinstance(v, np.ndarray) for v in sd.values()):
        sd = {k: np.asarray(v) for k, v in sd.items()}
    from ..configs import ResNetVisionConfig

    if isinstance(cfg.vision, ResNetVisionConfig):
        return resnet_state_dict_to_params(sd, cfg)

    n_vis = cfg.vision.layers
    conv_w = np.asarray(sd["visual.conv1.weight"], np.float32)
    width = conv_w.shape[0]
    patch_embed_w = np.ascontiguousarray(conv_w.reshape(width, -1).T)

    pos = np.asarray(sd["visual.positional_embedding"], np.float32)
    pos = resize_pos_embed_np(pos, cfg.vision.grid)

    visual = {
        "patch_embed": {"w": patch_embed_w},
        "class_embedding": np.asarray(sd["visual.class_embedding"], np.float32),
        "positional_embedding": pos,
        "ln_pre": _ln(sd, "visual.ln_pre"),
        "blocks": _stack_np([_block(sd, f"visual.transformer.resblocks.{i}")
                             for i in range(n_vis)]),
        "ln_post": _ln(sd, "visual.ln_post"),
        "proj": np.asarray(sd["visual.proj"], np.float32),
    }
    params = {
        "visual": visual,
        "text": _text_tree(sd, cfg),
        "logit_scale": np.asarray(sd.get("logit_scale", np.log(1 / 0.07)),
                                  np.float32),
    }
    return _to_jax(params)


def _to_jax(tree):
    if isinstance(tree, dict):
        return {k: _to_jax(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_to_jax(v) for v in tree]
    return jnp.asarray(tree)


def load_openai_checkpoint(path: str, cfg: CLIPConfig):
    """Load an OpenAI .pt checkpoint (JIT archive or plain state dict) via
    torch-CPU and convert. Parity with load_openai_model (model/openai.py)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        sd = obj.state_dict()  # TorchScript JIT archive
    elif isinstance(obj, dict) and "state_dict" in obj:
        sd = obj["state_dict"]
    else:
        sd = obj
    sd = {k: v.float().numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    sd.pop("input_resolution", None)
    sd.pop("context_length", None)
    sd.pop("vocab_size", None)
    return torch_state_dict_to_params(sd, cfg)


# --------------------------------------------------------------------------
# Flat npz round-trip (torch-free cache of the converted backbone)
# --------------------------------------------------------------------------

def _flatten(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, f"{prefix}{k}/")
    elif isinstance(tree, list):
        for i, v in enumerate(tree):
            yield from _flatten(v, f"{prefix}{i}/")
    else:
        yield prefix[:-1], np.asarray(tree)


def save_params_npz(params, path: str):
    flat = dict(_flatten(params))
    buf = io.BytesIO()
    np.savez(buf, **flat)
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def load_params_npz(path: str):
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    root: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def listify(node):
        if isinstance(node, dict):
            keys = list(node.keys())
            if keys and all(k.isdigit() for k in keys):
                return [listify(node[str(i)]) for i in range(len(keys))]
            return {k: listify(v) for k, v in node.items()}
        return jnp.asarray(node)

    return listify(root)


# --------------------------------------------------------------------------
# Reference adapter-checkpoint importer (migration path for users of the
# PyTorch reference)
# --------------------------------------------------------------------------

def import_reference_text_adapter(sd, trainable):
    """Map a reference text_adapter state dict (train.py:105-113 saves
    model.text_adapter.state_dict(): nn.ModuleList of SimpleAdapters then a
    SimpleProj — keys '{i}.fc.0.weight') into our trainable pytree. Returns an
    updated copy of `trainable`."""
    import copy

    out = copy.deepcopy(trainable)
    layers = out["text_adapter"]["layers"]["w"]
    n_layers = layers.shape[0]
    stacked = np.stack([
        _t(_np(sd[f"{i}.fc.0.weight"])) for i in range(n_layers)
    ])
    out["text_adapter"]["layers"]["w"] = jnp.asarray(stacked)
    proj_key = f"{n_layers}.fc.0.weight"
    out["text_adapter"]["proj"]["w"] = jnp.asarray(_t(_np(sd[proj_key])))
    return out


def import_reference_image_adapter(sd, trainable, relu: bool = False):
    """Map a reference image_adapter state dict (train.py:225-236 saves the
    ModuleDict {layer_adapters, seg_proj, det_proj}) into our pytree.

    SimpleProj key layout depends on the --relu flag: with LeakyReLU the
    Linear nests as 'fc.0.weight', without as 'fc.weight'
    (model/adapter_modules.py:17-23)."""
    import copy

    out = copy.deepcopy(trainable)
    ia = out["image_adapter"]
    n_ad = ia["layer_adapters"]["w"].shape[0]
    ia["layer_adapters"]["w"] = jnp.asarray(np.stack([
        _t(_np(sd[f"layer_adapters.{i}.fc.0.weight"])) for i in range(n_ad)
    ]))
    proj_key = "fc.0.weight" if relu else "fc.weight"
    for i in range(len(ia["seg_proj"])):
        ia["seg_proj"][i]["w"] = jnp.asarray(
            _t(_np(sd[f"seg_proj.{i}.{proj_key}"])))
    ia["det_proj"]["w"] = jnp.asarray(_t(_np(sd[f"det_proj.{proj_key}"])))
    return out


def _np(v):
    return v.float().numpy() if hasattr(v, "numpy") else np.asarray(v)


def import_reference_checkpoints(save_path: str, trainable, relu: bool = False):
    """Load the reference's text_adapter.pth and latest image_adapter_{N}.pth
    from a directory (test_last.py:231-248 layout) into our pytree. The IQM
    family keeps its initialization — the reference never persists it
    (survey Q1)."""
    import glob as globlib
    import re

    import torch

    text_files = globlib.glob(os.path.join(save_path, "text_adapter.pth"))
    if text_files:
        ckpt = torch.load(text_files[0], map_location="cpu",
                          weights_only=False)
        trainable = import_reference_text_adapter(ckpt["text_adapter"],
                                                  trainable)
    image_files = globlib.glob(os.path.join(save_path, "image_adapter_*.pth"))
    if image_files:
        image_files.sort(
            key=lambda p: int(re.findall(r"_(\d+)\.pth$", p)[0]))
        ckpt = torch.load(image_files[-1], map_location="cpu",
                          weights_only=False)
        trainable = import_reference_image_adapter(ckpt["image_adapter"],
                                                   trainable, relu=relu)
    return trainable


def find_backbone(model_name: str = "ViT-L-14-336",
                  search_dirs=(".", "weights", os.path.expanduser("~"))):
    """Locate a usable backbone checkpoint (.npz cache preferred, else .pt)."""
    names = [f"{model_name}.npz", f"{model_name}px.npz",
             f"{model_name}px.pt", f"{model_name}.pt"]
    for d in search_dirs:
        for n in names:
            p = os.path.join(d, n)
            if os.path.isfile(p):
                return p
    return None
