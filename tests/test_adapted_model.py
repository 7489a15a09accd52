"""AdaptedCLIP composition parity vs functional-torch reference."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from aa_clip_iqm_tpu.configs import AdapterConfig, IQMConfig, ModelConfig
from aa_clip_iqm_tpu.models import adapters as jadapters
from aa_clip_iqm_tpu.models.convert import torch_state_dict_to_params

from test_clip_parity import CFG, EMBED, HEADS_T, HEADS_V, PATCH, T_LAYERS, V_LAYERS, V_WIDTH, T_WIDTH, GRID, VOCAB
from torch_ref import make_clip_state_dict, torch_text_forward, torch_vision_forward

MODEL_CFG = ModelConfig(
    clip=CFG,
    adapter=AdapterConfig(
        text_adapt_until=1, image_adapt_until=2, levels=(1, 3), relu=False,
    ),
    iqm=IQMConfig(
        hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=32, encoder_hidden_size=16,
        text_encoder_hidden_size=EMBED,
    ),
    surgery_until_layer=3,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(13)
    sd = make_clip_state_dict(
        rng, v_layers=V_LAYERS, v_width=V_WIDTH, v_patch=PATCH, v_grid=GRID,
        t_layers=T_LAYERS, t_width=T_WIDTH, vocab=VOCAB, embed_dim=EMBED,
    )
    frozen = torch_state_dict_to_params(sd, CFG)
    trainable = jadapters.init_adapter_params(jax.random.PRNGKey(0), MODEL_CFG)
    images = rng.standard_normal((2, 3, PATCH * GRID, PATCH * GRID)).astype(np.float32)
    return sd, frozen, trainable, images, rng


def _torch_blend(x, w_np, weight):
    adapted = F.leaky_relu(x @ torch.from_numpy(w_np))
    xn = x.norm(dim=-1, keepdim=True)
    an = adapted.norm(dim=-1, keepdim=True)
    return weight * (adapted * xn / an) + (1 - weight) * x


def test_encode_image_adapted_parity(setup):
    sd, frozen, trainable, images, _ = setup
    a = MODEL_CFG.adapter
    ia = trainable["image_adapter"]

    def hook(i, x):
        if i < a.image_adapt_until:
            w = np.asarray(ia["layer_adapters"]["w"])[i]
            x = _torch_blend(x, w, a.image_adapt_weight)
        return x

    _, ref_taps, ref_x = torch_vision_forward(
        sd, images, HEADS_V, V_LAYERS, PATCH, out_layers=a.levels,
        adapter_hook=hook,
    )
    # reference head: tokens (no CLS) -> ln_post -> seg_proj -> normalize
    ln_w = torch.from_numpy(sd["visual.ln_post.weight"])
    ln_b = torch.from_numpy(sd["visual.ln_post.bias"])
    ref_seg = []
    for lvl, t in enumerate(ref_taps):
        tok = F.layer_norm(t[:, 1:], (V_WIDTH,), ln_w, ln_b)
        proj = tok @ torch.from_numpy(np.asarray(ia["seg_proj"][lvl]["w"]))
        ref_seg.append(F.normalize(proj, dim=-1))
    det_tok = F.layer_norm(ref_taps[-1][:, 1:], (V_WIDTH,), ln_w, ln_b)
    det = det_tok @ torch.from_numpy(np.asarray(ia["det_proj"]["w"]))
    ref_det = F.normalize(det, dim=-1).mean(1)

    out = jadapters.encode_image_adapted(frozen, trainable, MODEL_CFG,
                                         jnp.asarray(images))
    for s, rs in zip(out.seg_tokens, ref_seg):
        np.testing.assert_allclose(np.asarray(s), rs.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.det_token), ref_det.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.cls_raw), ref_x[:, 0].numpy(),
                               rtol=1e-4, atol=1e-5)


def test_encode_text_adapted_parity(setup):
    sd, frozen, trainable, _, rng = setup
    a = MODEL_CFG.adapter
    ta = trainable["text_adapter"]
    tokens = np.zeros((4, 77), dtype=np.int32)
    for i in range(4):
        n = int(rng.integers(5, 15))
        tokens[i, :n] = rng.integers(1, VOCAB - 1, n)
        tokens[i, n - 1] = VOCAB - 1

    def hook(i, x):
        if i < a.text_adapt_until:
            x = _torch_blend(x, np.asarray(ta["layers"]["w"])[i],
                             a.text_adapt_weight)
        return x

    def final_proj(pooled):
        return F.leaky_relu(pooled @ torch.from_numpy(np.asarray(ta["proj"]["w"])))

    ref = torch_text_forward(sd, tokens, HEADS_T, T_LAYERS, adapter_hook=hook,
                             final_proj=final_proj)
    out = jadapters.encode_text_adapted(frozen, trainable, MODEL_CFG,
                                        jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_iqm_branch_runs_and_differentiates(setup):
    _, frozen, trainable, images, rng = setup
    anchors = jnp.asarray(rng.standard_normal((2, EMBED, 2)).astype(np.float32))

    def loss_fn(tr):
        out = jadapters.encode_image_adapted(frozen, tr, MODEL_CFG,
                                             jnp.asarray(images),
                                             text_anchors=anchors)
        q = jadapters.project_queries(tr, out.iqm_queries)
        return jnp.sum(q ** 2), out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
    assert out.iqm_queries.shape == (2, 2, MODEL_CFG.iqm.hidden_size)
    assert np.isfinite(float(loss))
    # Every IQM-family parameter must receive gradient (the reference left
    # its lazy projections untrained — survey Q1/Q2; we assert the fix).
    for key in ("iqm", "class_query_mlp", "query_adapters", "pos_embedding",
                "visual_feature_proj", "text_feature_proj", "query_proj"):
        leaf_norms = [float(jnp.abs(g).sum())
                      for g in jax.tree.leaves(grads[key])]
        assert any(n > 0 for n in leaf_norms), f"no gradient reached {key}"


def test_frozen_params_receive_no_grads(setup):
    """Training differentiates only the trainable pytree."""
    _, frozen, trainable, images, _ = setup

    def loss_fn(tr):
        out = jadapters.encode_image_adapted(frozen, tr, MODEL_CFG,
                                             jnp.asarray(images))
        return sum(jnp.sum(s) for s in out.seg_tokens)

    grads = jax.grad(loss_fn)(trainable)
    assert jax.tree.structure(grads) == jax.tree.structure(trainable)
