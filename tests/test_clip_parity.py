"""End-to-end backbone parity: converter + JAX forward vs functional-torch ref."""
import numpy as np
import pytest

import jax.numpy as jnp

from aa_clip_iqm_tpu.configs import CLIPConfig, TextConfig, VisionConfig
from aa_clip_iqm_tpu.models import clip as jclip
from aa_clip_iqm_tpu.models.convert import (
    load_params_npz,
    save_params_npz,
    torch_state_dict_to_params,
)

from torch_ref import (
    make_clip_state_dict,
    torch_text_forward,
    torch_vision_forward,
)

V_LAYERS, V_WIDTH, PATCH, GRID = 3, 64, 14, 4
T_LAYERS, T_WIDTH, VOCAB, EMBED = 2, 32, 1000, 32
HEADS_V, HEADS_T = 4, 2

CFG = CLIPConfig(
    embed_dim=EMBED,
    vision=VisionConfig(
        image_size=PATCH * GRID, patch_size=PATCH, width=V_WIDTH,
        layers=V_LAYERS, head_width=V_WIDTH // HEADS_V, output_dim=EMBED,
    ),
    text=TextConfig(
        context_length=77, vocab_size=VOCAB, width=T_WIDTH, heads=HEADS_T,
        layers=T_LAYERS, output_dim=EMBED,
    ),
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    sd = make_clip_state_dict(
        rng, v_layers=V_LAYERS, v_width=V_WIDTH, v_patch=PATCH, v_grid=GRID,
        t_layers=T_LAYERS, t_width=T_WIDTH, vocab=VOCAB, embed_dim=EMBED,
    )
    params = torch_state_dict_to_params(sd, CFG)
    images = rng.standard_normal((2, 3, PATCH * GRID, PATCH * GRID)).astype(np.float32)
    return sd, params, images, rng


def test_vision_forward_parity(setup):
    sd, params, images, _ = setup
    ref_pooled, ref_taps, ref_x = torch_vision_forward(
        sd, images, HEADS_V, V_LAYERS, PATCH, out_layers=(1, 3))
    pooled, taps, x = jclip.vision_forward(
        params["visual"], CFG.vision, jnp.asarray(images), out_layers=(1, 3))
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(x), ref_x.numpy(), rtol=1e-4, atol=1e-5)
    assert len(taps) == 2
    for t, rt in zip(taps, ref_taps):
        np.testing.assert_allclose(np.asarray(t), rt.numpy(), rtol=1e-4, atol=1e-5)


def test_vision_forward_vv_surgery_parity(setup):
    sd, params, images, _ = setup
    vv_from = jclip.surgery_vv_from(V_LAYERS, dpam_layer=3)  # last 2 blocks vv
    assert vv_from == 1
    _, ref_taps, _ = torch_vision_forward(
        sd, images, HEADS_V, V_LAYERS, PATCH, out_layers=(2, 3), vv_from=vv_from)
    _, taps, _ = jclip.vision_forward(
        params["visual"], CFG.vision, jnp.asarray(images), out_layers=(2, 3),
        vv_from=vv_from)
    for t, rt in zip(taps, ref_taps):
        np.testing.assert_allclose(np.asarray(t), rt.numpy(), rtol=1e-4, atol=1e-5)


def test_dual_vision_features_matches_two_towers(setup):
    """The shared-prefix stage-1 forward == running the surgery tower and the
    plain tower separately (train.py:75-76 runs two full CLIP copies)."""
    sd, params, images, _ = setup
    vv_from = jclip.surgery_vv_from(V_LAYERS, dpam_layer=3)
    pooled_ref, _, _ = jclip.vision_forward(
        params["visual"], CFG.vision, jnp.asarray(images))
    _, taps_ref, _ = jclip.vision_forward(
        params["visual"], CFG.vision, jnp.asarray(images), out_layers=(2, 3),
        vv_from=vv_from)
    pooled, taps = jclip.dual_vision_features(
        params["visual"], CFG.vision, jnp.asarray(images), (2, 3), vv_from)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(pooled_ref),
                               rtol=1e-5, atol=1e-6)
    for t, rt in zip(taps, taps_ref):
        np.testing.assert_allclose(np.asarray(t), np.asarray(rt),
                                   rtol=1e-5, atol=1e-6)


def test_text_forward_parity(setup):
    sd, params, _, rng = setup
    tokens = np.zeros((3, 77), dtype=np.int32)
    for i in range(3):
        n = int(rng.integers(5, 20))
        tokens[i, :n] = rng.integers(1, VOCAB - 1, n)
        tokens[i, n - 1] = VOCAB - 1  # EOT = max id
    ref = torch_text_forward(sd, tokens, HEADS_T, T_LAYERS)
    out = jclip.text_forward(params["text"], CFG.text, jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_npz_roundtrip(setup, tmp_path):
    sd, params, images, _ = setup
    path = str(tmp_path / "backbone.npz")
    save_params_npz(params, path)
    params2 = load_params_npz(path)
    p1, _, _ = jclip.vision_forward(params["visual"], CFG.vision,
                                    jnp.asarray(images))
    p2, _, _ = jclip.vision_forward(params2["visual"], CFG.vision,
                                    jnp.asarray(images))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_pos_embed_resize_applied(setup):
    """Converting with a larger image size bicubic-resizes the pos embed."""
    sd, _, _, _ = setup
    big = CFG.with_image_size(PATCH * 7)
    params = torch_state_dict_to_params(sd, big)
    assert params["visual"]["positional_embedding"].shape == (7 * 7 + 1, V_WIDTH)
