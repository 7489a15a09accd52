"""Flagship-scale golden parity: ViT-L/14 @ 518px vs the torch transcription.

The regular parity suite runs tiny towers; a shape/numerics bug that only
appears at the real operating point (24 layers, width 1024, 1370 tokens,
batch 1 — train.py:247-249) would escape it. This test runs the full
converted forward at that scale on random weights. It costs minutes on the
single CPU core, so it is opt-in:

    AACLIP_SCALE_TESTS=1 python -m pytest tests/test_flagship_scale.py -q

Real-weights AUROC parity (BASELINE.md north-star) still requires the OpenAI
checkpoint + datasets; this is the strongest scale check available without
them (VERDICT round 1, next-round item 3).
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aa_clip_iqm_tpu.configs import CLIPConfig, TextConfig, VisionConfig
from aa_clip_iqm_tpu.models import clip as jclip
from aa_clip_iqm_tpu.models.convert import torch_state_dict_to_params

from torch_ref import make_clip_state_dict, torch_text_forward, torch_vision_forward

pytestmark = pytest.mark.skipif(
    not os.environ.get("AACLIP_SCALE_TESTS"),
    reason="flagship-scale parity is opt-in (minutes on 1 CPU core); "
    "set AACLIP_SCALE_TESTS=1",
)

IMG = 518
GRID = 37  # 518 / 14

CFG = CLIPConfig(
    embed_dim=768,
    vision=VisionConfig(image_size=IMG, patch_size=14, width=1024, layers=24,
                        head_width=64, output_dim=768),
    text=TextConfig(context_length=77, vocab_size=49408, width=768, heads=12,
                    layers=12, output_dim=768),
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(42)
    # Generate the pos embed at the 518px grid directly so the torch
    # transcription (which consumes sd verbatim) and the converter agree
    # without the resize entering the comparison (resize parity is covered
    # by test_interp / test_clip_parity).
    sd = make_clip_state_dict(
        rng, v_layers=24, v_width=1024, v_patch=14, v_grid=GRID,
        t_layers=12, t_width=768, vocab=49408, embed_dim=768,
    )
    params = torch_state_dict_to_params(sd, CFG)
    return sd, params, rng


def test_vision_forward_518(setup):
    sd, params, rng = setup
    images = rng.standard_normal((1, 3, IMG, IMG)).astype(np.float32) * 0.5
    ref_pooled, ref_taps, ref_x = torch_vision_forward(
        sd, images, heads=16, n_layers=24, patch=14,
        out_layers=(6, 12, 18, 24))
    pooled, taps, x = jax.jit(
        lambda im: jclip.vision_forward(params["visual"], CFG.vision, im,
                                        out_layers=(6, 12, 18, 24))
    )(jnp.asarray(images))
    assert x.shape == (1, GRID * GRID + 1, 1024)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled.numpy(),
                               rtol=2e-4, atol=2e-4)
    for t, rt in zip(taps, ref_taps):
        np.testing.assert_allclose(np.asarray(t), rt.numpy(),
                                   rtol=2e-4, atol=2e-4)


def test_vv_surgery_forward_518(setup):
    """DAPM surgery at the real depth (vv from block 5 of 24 — DPAM_layer=20,
    train.py:250)."""
    sd, params, rng = setup
    vv_from = jclip.surgery_vv_from(24, 20)
    assert vv_from == 5
    images = rng.standard_normal((1, 3, IMG, IMG)).astype(np.float32) * 0.5
    _, ref_taps, _ = torch_vision_forward(
        sd, images, heads=16, n_layers=24, patch=14, out_layers=(24,),
        vv_from=vv_from)
    _, taps, _ = jax.jit(
        lambda im: jclip.vision_forward(params["visual"], CFG.vision, im,
                                        out_layers=(24,), vv_from=vv_from)
    )(jnp.asarray(images))
    np.testing.assert_allclose(np.asarray(taps[0]), ref_taps[0].numpy(),
                               rtol=2e-4, atol=2e-4)


def test_text_forward_full_width(setup):
    sd, params, rng = setup
    tokens = np.zeros((4, 77), dtype=np.int32)
    for i in range(4):
        n = int(rng.integers(8, 30))
        tokens[i, :n] = rng.integers(1, 49407, n)
        tokens[i, n - 1] = 49407
    ref = torch_text_forward(sd, tokens, heads=12, n_layers=12)
    out = jax.jit(
        lambda t: jclip.text_forward(params["text"], CFG.text, t)
    )(jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                               rtol=2e-4, atol=2e-4)
