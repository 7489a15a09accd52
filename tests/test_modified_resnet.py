"""ModifiedResNet tower: shape/semantic checks vs a torch mini-reference."""
import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from aa_clip_iqm_tpu.models import modified_resnet as mr


def test_forward_shapes():
    params, cfg = mr.init_resnet_params(
        jax.random.PRNGKey(0), layers=(1, 1, 1, 1), width=16,
        output_dim=32, heads=4, image_size=64)
    images = jnp.zeros((2, 3, 64, 64))
    pooled, feats = mr.resnet_forward(params, cfg, images)
    assert pooled.shape == (2, 32)
    assert len(feats) == 4
    # stem: /4; stages stride 1,2,2,2 -> final /32
    assert feats[0].shape == (2, 64, 16, 16)
    assert feats[-1].shape == (2, 512, 2, 2)


def test_bottleneck_matches_torch(rng):
    """One bottleneck block vs a direct torch computation (stride-2 path with
    anti-aliased avgpool + downsample branch)."""
    cin, planes, stride = 8, 4, 2
    params, _ = mr.init_resnet_params(jax.random.PRNGKey(1), layers=(1,),
                                      width=8, image_size=32)
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


def test_attention_pool_query_is_mean_token(rng):
    params, cfg = mr.init_resnet_params(jax.random.PRNGKey(2), layers=(1,),
                                        width=8, output_dim=16, heads=2,
                                        image_size=32)
    # final feature map of the 1-stage net is width*4 = 32 channels at /8... use
    # attnpool directly on a crafted map matching its embed dim (32).
    embed = params["attnpool"]["q"]["w"].shape[0]
    x = rng.standard_normal((2, embed, 1, 1)).astype(np.float32)
    # single spatial position: pool output must be finite and (B, out_dim)
    pe = params["attnpool"]["positional_embedding"]
    params["attnpool"]["positional_embedding"] = pe[:2]
    out = mr.attention_pool_forward(params["attnpool"], jnp.asarray(x),
                                    num_heads=2)
    assert out.shape == (2, 16)
    assert np.isfinite(np.asarray(out)).all()
