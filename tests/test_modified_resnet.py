"""ModifiedResNet tower: parity vs a torch transcription, config registry
wiring, state-dict conversion, and loader round-trip (the reference's resnet
branch, model/clip.py:129-130 + model/modified_resnet.py)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from aa_clip_iqm_tpu.configs import ResNetVisionConfig, get_model_config
from aa_clip_iqm_tpu.models import clip as jclip
from aa_clip_iqm_tpu.models import modified_resnet as mr
from aa_clip_iqm_tpu.models.convert import (
    load_params_npz,
    save_params_npz,
    torch_state_dict_to_params,
)

from torch_ref import make_rn_state_dict, torch_rn_forward

TINY = ResNetVisionConfig(image_size=64, layers=(1, 1, 1, 1), width=16,
                          output_dim=32, heads=4)


def test_forward_shapes():
    params = mr.init_resnet_params(jax.random.PRNGKey(0), TINY)
    images = jnp.zeros((2, 3, 64, 64))
    pooled, feats = mr.resnet_forward(params, TINY, images)
    assert pooled.shape == (2, 32)
    assert len(feats) == 4
    # stem: /4; stages stride 1,2,2,2 -> final /32
    assert feats[0].shape == (2, 64, 16, 16)
    assert feats[-1].shape == (2, 512, 2, 2)


def test_bottleneck_matches_torch(rng):
    """One bottleneck block vs a direct torch computation (stride-2 path with
    anti-aliased avgpool + downsample branch)."""
    cin, stride = 8, 2
    cfg = ResNetVisionConfig(image_size=32, layers=(1,), width=8,
                             output_dim=16, heads=2)
    params = mr.init_resnet_params(jax.random.PRNGKey(1), cfg)
    block = params["layers"][0][0]
    # randomize BN stats so the test is not trivial
    for bn in ("bn1", "bn2", "bn3"):
        block[bn]["mean"] = jnp.asarray(rng.standard_normal(
            block[bn]["mean"].shape).astype(np.float32) * 0.1)
        block[bn]["var"] = jnp.asarray(
            1.0 + rng.random(block[bn]["var"].shape).astype(np.float32))

    x = rng.standard_normal((2, cin, 16, 16)).astype(np.float32)

    def t_conv(p, x, stride=1, padding=0):
        w = torch.from_numpy(np.asarray(p["kernel"])).permute(3, 2, 0, 1)
        return F.conv2d(x, w, stride=stride, padding=padding)

    def t_bn(p, x):
        return F.batch_norm(
            x, torch.from_numpy(np.asarray(p["mean"])),
            torch.from_numpy(np.asarray(p["var"])),
            torch.from_numpy(np.asarray(p["scale"])),
            torch.from_numpy(np.asarray(p["bias"])), training=False)

    xt = torch.from_numpy(x)
    out = F.relu(t_bn(block["bn1"], t_conv(block["conv1"], xt)))
    out = F.relu(t_bn(block["bn2"], t_conv(block["conv2"], out, padding=1)))
    out = F.avg_pool2d(out, stride)
    out = t_bn(block["bn3"], t_conv(block["conv3"], out))
    identity = F.avg_pool2d(xt, stride)
    identity = t_bn(block["downsample"]["bn"],
                    t_conv(block["downsample"]["conv"], identity))
    ref = F.relu(out + identity).numpy()

    got = np.asarray(mr.bottleneck_forward(block, jnp.asarray(x), stride=stride))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_full_tower_parity_vs_torch(rng):
    """Converted random RN state dict: full forward (stem, 4 stages,
    attention pool) matches the torch transcription."""
    sd = make_rn_state_dict(rng, layers=TINY.layers, width=TINY.width,
                            embed_dim=TINY.output_dim,
                            image_size=TINY.image_size)
    from aa_clip_iqm_tpu.configs import CLIPConfig, TextConfig

    cfg = CLIPConfig(embed_dim=TINY.output_dim, vision=TINY,
                     text=TextConfig(width=32, heads=4, layers=2,
                                     vocab_size=1000, output_dim=32))
    params = torch_state_dict_to_params(sd, cfg)
    images = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    ref = torch_rn_forward(sd, images, TINY.layers, TINY.num_heads).numpy()
    got = np.asarray(jclip.encode_image(params, cfg, jnp.asarray(images)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_rn50_registry_and_loader_roundtrip(rng, tmp_path):
    """build_model_config("RN50") + load_frozen_backbone round-trip a random
    RN state dict (.pt and .npz cache), and encode_image runs."""
    from aa_clip_iqm_tpu.loader import build_model_config, load_frozen_backbone

    clip_cfg = get_model_config("RN50")
    assert isinstance(clip_cfg.vision, ResNetVisionConfig)
    assert clip_cfg.vision.layers == (3, 4, 6, 3)
    assert clip_cfg.vision.num_heads == 32
    assert clip_cfg.text.width == 512

    model_cfg = build_model_config("RN50", img_size=64)
    # tiny stand-in weights with the RN50 *shape* would be heavy; round-trip
    # the tiny tower through the same npz/loader machinery instead.
    sd = make_rn_state_dict(rng, layers=TINY.layers, width=TINY.width,
                            embed_dim=TINY.output_dim,
                            image_size=TINY.image_size)
    from aa_clip_iqm_tpu.configs import CLIPConfig, ModelConfig, TextConfig

    tiny_clip = CLIPConfig(embed_dim=TINY.output_dim, vision=TINY,
                           text=TextConfig(width=32, heads=4, layers=2,
                                           vocab_size=1000, output_dim=32))
    tiny_model = ModelConfig(clip=tiny_clip)

    pt_path = str(tmp_path / "rn.pt")
    torch.save({k: torch.from_numpy(v) if isinstance(v, np.ndarray)
                else v for k, v in sd.items()}, pt_path)
    params = load_frozen_backbone(tiny_model, pt_path)
    pooled = jclip.encode_image(params, tiny_clip,
                                jnp.zeros((1, 3, 64, 64)))
    assert pooled.shape == (1, TINY.output_dim)

    # npz round-trip preserves the tree exactly
    npz_path = str(tmp_path / "rn.npz")
    save_params_npz(params, npz_path)
    params2 = load_params_npz(npz_path)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params2))
    for v1, v2 in zip(jax.tree_util.tree_leaves(params),
                      jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))

    # adaptation is ViT-only (reference model/adapter.py): explicit error
    from aa_clip_iqm_tpu.models.adapters import init_adapter_params

    with pytest.raises(ValueError, match="ViT"):
        init_adapter_params(jax.random.PRNGKey(0), tiny_model)

    del model_cfg


def test_attention_pool_query_is_mean_token(rng):
    cfg = ResNetVisionConfig(image_size=32, layers=(1,), width=8,
                             output_dim=16, heads=2)
    params = mr.init_resnet_params(jax.random.PRNGKey(2), cfg)
    embed = params["attnpool"]["q"]["w"].shape[0]
    x = rng.standard_normal((2, embed, 1, 1)).astype(np.float32)
    # single spatial position: pool output must be finite and (B, out_dim)
    pe = params["attnpool"]["positional_embedding"]
    params["attnpool"]["positional_embedding"] = pe[:2]
    out = mr.attention_pool_forward(params["attnpool"], jnp.asarray(x),
                                    num_heads=2)
    assert out.shape == (2, 16)
    assert np.isfinite(np.asarray(out)).all()
