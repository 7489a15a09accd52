"""ModifiedResNet vision tower (functional JAX) — CLIP's anti-aliased ResNet.

Parity target: reference model/modified_resnet.py:47-217 (Bottleneck with
avg-pool anti-aliased striding, 3-conv stem, attention pooling head). The
reference never exercises it (the shipped config is ViT — model/clip.py:129
has the resnet branch) but it is part of the model family surface, so the
rebuild carries it: RN50-style configs load and run on TPU.

Conventions: NCHW inputs like the rest of the framework; convs stored as
HWIO right-multiplied kernels; BatchNorm runs in inference mode with frozen
statistics (the reference freezes BN for CLIP inference as well,
model/modified_resnet.py:8-44).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..configs import ResNetVisionConfig
from ..ops.attention import sdpa
from ..ops.layers import linear


def _conv(params, x, stride: int = 1, padding: int = 0):
    """NCHW conv with HWIO kernel."""
    return jax.lax.conv_general_dilated(
        x, params["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _bn(params, x, eps: float = 1e-5):
    """Inference-mode BatchNorm (frozen running stats), fp32 math."""
    x32 = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(params["var"].astype(jnp.float32) + eps)
    scale = (params["scale"] * inv).reshape(1, -1, 1, 1)
    shift = (params["bias"] - params["mean"] * params["scale"] * inv)
    y = x32 * scale + shift.reshape(1, -1, 1, 1)
    return y.astype(x.dtype)


def _avg_pool(x, k: int):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, k, k), (1, 1, k, k), "VALID"
    ) / (k * k)


def bottleneck_forward(params, x, stride: int = 1):
    """Bottleneck: 1x1 -> 3x3 -> (avgpool if stride>1) -> 1x1 (expansion 4);
    downsample branch = avgpool + 1x1 conv (model/modified_resnet.py:47-92)."""
    out = jax.nn.relu(_bn(params["bn1"], _conv(params["conv1"], x)))
    out = jax.nn.relu(_bn(params["bn2"], _conv(params["conv2"], out, padding=1)))
    if stride > 1:
        out = _avg_pool(out, stride)
    out = _bn(params["bn3"], _conv(params["conv3"], out))
    if "downsample" in params:
        identity = x
        if stride > 1:
            identity = _avg_pool(identity, stride)
        identity = _bn(params["downsample"]["bn"],
                       _conv(params["downsample"]["conv"], identity))
    else:
        identity = x
    return jax.nn.relu(out + identity)


def attention_pool_forward(params, x, num_heads: int):
    """AttentionPool2d (model/modified_resnet.py:95-129): flatten the grid,
    prepend the mean token, add positional embedding, one MHA layer with the
    mean token as query."""
    b, c, h, w = x.shape
    tokens = x.reshape(b, c, h * w).transpose(0, 2, 1)      # (B, HW, C)
    mean = jnp.mean(tokens, axis=1, keepdims=True)
    tokens = jnp.concatenate([mean, tokens], axis=1)         # (B, HW+1, C)
    tokens = tokens + params["positional_embedding"].astype(tokens.dtype)

    q = linear(params["q"], tokens[:, :1])
    k = linear(params["k"], tokens)
    v = linear(params["v"], tokens)
    hd = q.shape[-1] // num_heads

    def split(t):
        return t.reshape(t.shape[0], t.shape[1], num_heads, hd).transpose(0, 2, 1, 3)

    out = sdpa(split(q), split(k), split(v), hd ** -0.5)
    out = out.transpose(0, 2, 1, 3).reshape(b, 1, -1)
    return linear(params["c_proj"], out)[:, 0]


def resnet_forward(params, cfg: ResNetVisionConfig, images,
                   compute_dtype=jnp.float32):
    """Full ModifiedResNet: 3-conv stem (stride-2 first conv + avgpool),
    4 stages, attention pooling. Returns (pooled (B, output_dim), stage
    feature maps [(B, C, H, W)] for dense heads)."""
    x = images.astype(compute_dtype)
    for i in (1, 2, 3):
        stride = 2 if i == 1 else 1
        x = jax.nn.relu(_bn(params[f"bn{i}"],
                            _conv(params[f"conv{i}"], x, stride=stride,
                                  padding=1)))
    x = _avg_pool(x, 2)

    features = []
    for stage_idx, blocks in enumerate(params["layers"]):
        for block_idx, block in enumerate(blocks):
            stride = 2 if (stage_idx > 0 and block_idx == 0) else 1
            x = bottleneck_forward(block, x, stride=stride)
        features.append(x)

    pooled = attention_pool_forward(params["attnpool"], x, cfg.num_heads)
    return pooled, features


def init_resnet_params(rng, cfg: ResNetVisionConfig):
    """Random init with the reference's architecture shape (RN50 default)."""
    layers, width = cfg.layers, cfg.width
    output_dim, image_size = cfg.output_dim, cfg.image_size
    keys = jax.random.split(rng, 256)
    ki = iter(range(256))

    def conv_p(cin, cout, k):
        return {"kernel": jax.random.normal(
            keys[next(ki)], (k, k, cin, cout)) * (cin * k * k) ** -0.5}

    def bn_p(c):
        return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
                "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}

    params = {
        "conv1": conv_p(3, width // 2, 3), "bn1": bn_p(width // 2),
        "conv2": conv_p(width // 2, width // 2, 3), "bn2": bn_p(width // 2),
        "conv3": conv_p(width // 2, width, 3), "bn3": bn_p(width),
    }

    def bottleneck_p(cin, planes, downsample):
        p = {
            "conv1": conv_p(cin, planes, 1), "bn1": bn_p(planes),
            "conv2": conv_p(planes, planes, 3), "bn2": bn_p(planes),
            "conv3": conv_p(planes, planes * 4, 1), "bn3": bn_p(planes * 4),
        }
        if downsample:
            p["downsample"] = {"conv": conv_p(cin, planes * 4, 1),
                               "bn": bn_p(planes * 4)}
        return p

    stages = []
    cin = width
    for stage_idx, n_blocks in enumerate(layers):
        planes = width * (2 ** stage_idx)
        blocks = []
        for block_idx in range(n_blocks):
            downsample = block_idx == 0 and (cin != planes * 4 or stage_idx > 0)
            blocks.append(bottleneck_p(cin, planes, downsample))
            cin = planes * 4
        stages.append(blocks)
    params["layers"] = stages

    embed_dim = cin
    spatial = cfg.grid
    params["attnpool"] = {
        "positional_embedding": jax.random.normal(
            keys[next(ki)], (spatial * spatial + 1, embed_dim)) * embed_dim ** -0.5,
        "q": {"w": jax.random.normal(keys[next(ki)], (embed_dim, embed_dim)) * 0.02,
              "b": jnp.zeros((embed_dim,))},
        "k": {"w": jax.random.normal(keys[next(ki)], (embed_dim, embed_dim)) * 0.02,
              "b": jnp.zeros((embed_dim,))},
        "v": {"w": jax.random.normal(keys[next(ki)], (embed_dim, embed_dim)) * 0.02,
              "b": jnp.zeros((embed_dim,))},
        "c_proj": {"w": jax.random.normal(keys[next(ki)],
                                          (embed_dim, output_dim)) * 0.02,
                   "b": jnp.zeros((output_dim,))},
    }
    return params
