"""Elementary transformer layers as pure functions on param dicts.

Numerics mirror the reference's torch modules where parity matters:
  - LayerNorm computes in float32 and casts back (model/transformer.py:26-43).
  - QuickGELU is x * sigmoid(1.702 x) (model/transformer.py:46-49); the live
    reference model actually runs exact erf-GELU (see configs.CLIPConfig.act).
  - SimpleAdapter / SimpleProj are bias-free Linears with optional LeakyReLU
    (negative slope 0.01, torch default) (model/adapter_modules.py:6-26).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm(params, x, eps: float = 1e-5):
    """Float32 LayerNorm over the last axis, cast back to x.dtype."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


def gelu(x):
    """Exact (erf) GELU — matches torch.nn.GELU default."""
    return jax.nn.gelu(x, approximate=False)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


ACTIVATIONS = {"gelu": gelu, "quick_gelu": quick_gelu}


def xavier_uniform(rng, d_in: int, d_out: int):
    """Xavier-uniform weight init (torch nn.init.xavier_uniform_ parity,
    used for all adapter/IQM weights — model/adapter.py:107-123)."""
    import math

    a = math.sqrt(6.0 / (d_in + d_out))
    return jax.random.uniform(rng, (d_in, d_out), jnp.float32, -a, a)


def xavier_linear(rng, d_in: int, d_out: int, bias: bool = True):
    """Xavier weights + torch-default uniform biases. The reference's
    _init_weights_ xavier-inits only p.dim() > 1 (model/adapter.py:107-123),
    so every Linear bias keeps nn.Linear's reset_parameters draw
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)); match that distribution so
    train-from-scratch starts from the same statistical point."""
    import math

    kw, kb = jax.random.split(rng)
    p = {"w": xavier_uniform(kw, d_in, d_out)}
    if bias:
        bound = 1.0 / math.sqrt(d_in)
        p["b"] = jax.random.uniform(kb, (d_out,), jnp.float32, -bound, bound)
    return p


def linear(params, x, precision=None):
    """y = x @ W + b. W stored (in, out). Params carrying an int8-quantized
    weight ({"w_q", "scale"} from ops.quant) dispatch to the int8 MXU path —
    one hook point covers every projection in the model."""
    if "w_q" in params:
        from .quant import int8_linear

        return int8_linear(params, x)
    y = jnp.dot(x, params["w"].astype(x.dtype), precision=precision,
                preferred_element_type=jnp.float32)
    if "b" in params and params["b"] is not None:
        y = y + params["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def leaky_relu(x, negative_slope: float = 0.01):
    return jnp.where(x >= 0, x, negative_slope * x)


def simple_adapter(params, x):
    """Bias-free Linear + LeakyReLU (reference SimpleAdapter)."""
    return leaky_relu(linear(params, x))


def simple_proj(params, x, relu: bool):
    """Bias-free Linear, optional LeakyReLU (reference SimpleProj)."""
    y = linear(params, x)
    return leaky_relu(y) if relu else y


def l2_normalize(x, axis: int = -1, eps: float = 0.0):
    n = jnp.linalg.norm(x.astype(jnp.float32), axis=axis, keepdims=True)
    if eps:
        n = jnp.maximum(n, eps)
    return (x.astype(jnp.float32) / n).astype(x.dtype)


def norm_preserving_blend(x, adapted, weight: float):
    """x <- w * adapted * |x|/|adapted| + (1-w) * x.

    The norm-preserving residual blend used around every adapter
    (model/adapter.py:163-170, :288-295). Computed in float32 for stability.
    """
    x32 = x.astype(jnp.float32)
    a32 = adapted.astype(jnp.float32)
    xn = jnp.linalg.norm(x32, axis=-1, keepdims=True)
    an = jnp.linalg.norm(a32, axis=-1, keepdims=True)
    out = weight * (a32 * xn / an) + (1.0 - weight) * x32
    return out.astype(x.dtype)


def mlp_block(params, x, act):
    """Transformer MLP: c_fc -> act -> c_proj."""
    h = linear(params["c_fc"], x)
    h = act(h)
    return linear(params["c_proj"], h)


def patch_dropout_indices(rng, batch: int, num_tokens: int, rate: float):
    """Per-sample kept-token indices for patch dropout: keep
    max(1, int(L*(1-rate))) of L tokens, uniformly without replacement
    (reference PatchDropout, model/transformer.py:62-99).

    Returns (B, K) int32, sorted ascending so the kept tokens preserve their
    spatial order (the reference's torch.topk-of-randn selection is unordered;
    order is irrelevant to attention, and sorted indices let the stage-2 loss
    gather matching mask cells). K is static under jit.
    """
    keep = max(1, int(num_tokens * (1.0 - rate)))
    scores = jax.random.normal(rng, (batch, num_tokens))
    _, idx = jax.lax.top_k(scores, keep)
    return jnp.sort(idx, axis=-1).astype(jnp.int32)


def patch_dropout(rng, x, rate: float, exclude_first: bool = True):
    """Randomly keep max(1, int(L*(1-rate))) tokens per sample
    (reference PatchDropout, model/transformer.py:62-99; CLS excluded).

    NOTE: the reference *configures* rate 0.2 (model/model.py:29) but holds
    the model in eval() throughout training (survey Q5), so this never runs
    in the live pipeline. Wired into stage 2 as an opt-in training
    regularizer (configs.VisionConfig.patch_dropout); the kept count is
    static under jit.
    """
    if rate <= 0.0:
        return x
    if exclude_first:
        cls, tokens = x[:, :1], x[:, 1:]
    else:
        cls, tokens = None, x
    b, l, _ = tokens.shape
    idx = patch_dropout_indices(rng, b, l, rate)
    kept = jnp.take_along_axis(tokens, idx[..., None], axis=1)
    if cls is not None:
        kept = jnp.concatenate([cls, kept], axis=1)
    return kept
