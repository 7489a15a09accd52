"""Importing reference-trained adapter .pth checkpoints into our pytree."""
import numpy as np
import torch

import jax

from aa_clip_iqm_tpu.configs import tiny_test_config
from aa_clip_iqm_tpu.models import adapters as adapters_mod
from aa_clip_iqm_tpu.models.convert import (
    import_reference_image_adapter,
    import_reference_text_adapter,
)


def _make_trainable():
    cfg = tiny_test_config(56)
    return cfg, adapters_mod.init_adapter_params(jax.random.PRNGKey(0), cfg)


def test_text_adapter_import(rng):
    cfg, trainable = _make_trainable()
    t_width = cfg.clip.text.width
    n = cfg.adapter.text_adapt_until
    sd = {}
    for i in range(n):
        sd[f"{i}.fc.0.weight"] = torch.from_numpy(
            rng.standard_normal((t_width, t_width)).astype(np.float32))
    sd[f"{n}.fc.0.weight"] = torch.from_numpy(
        rng.standard_normal((t_width, t_width)).astype(np.float32))

    out = import_reference_text_adapter(sd, trainable)
    for i in range(n):
        np.testing.assert_allclose(
            np.asarray(out["text_adapter"]["layers"]["w"])[i],
            sd[f"{i}.fc.0.weight"].numpy().T, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["text_adapter"]["proj"]["w"]),
                               sd[f"{n}.fc.0.weight"].numpy().T, rtol=1e-6)
    # untouched groups keep their init
    np.testing.assert_array_equal(
        np.asarray(out["query_proj"]["w"]),
        np.asarray(trainable["query_proj"]["w"]))


def test_image_adapter_import_no_relu(rng):
    cfg, trainable = _make_trainable()
    v_width = cfg.clip.vision.width
    out_dim = cfg.clip.embed_dim
    n = cfg.adapter.image_adapt_until
    sd = {}
    for i in range(n):
        sd[f"layer_adapters.{i}.fc.0.weight"] = torch.from_numpy(
            rng.standard_normal((v_width, v_width)).astype(np.float32))
    for i in range(len(cfg.adapter.levels)):
        sd[f"seg_proj.{i}.fc.weight"] = torch.from_numpy(
            rng.standard_normal((out_dim, v_width)).astype(np.float32))
    sd["det_proj.fc.weight"] = torch.from_numpy(
        rng.standard_normal((out_dim, v_width)).astype(np.float32))

    out = import_reference_image_adapter(sd, trainable, relu=False)
    np.testing.assert_allclose(
        np.asarray(out["image_adapter"]["seg_proj"][0]["w"]),
        sd["seg_proj.0.fc.weight"].numpy().T, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out["image_adapter"]["layer_adapters"]["w"])[1],
        sd["layer_adapters.1.fc.0.weight"].numpy().T, rtol=1e-6)
