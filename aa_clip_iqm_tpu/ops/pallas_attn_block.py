"""Fully-fused attention half of a transformer block as one Pallas kernel.

Computes ``x + out_proj(attn(qkv_proj(layer_norm(x))))`` — the entire
attention residual branch (reference: model/transformer.py:239-258, the
``x = x + self.attention(self.ln_1(x))`` line) — without materializing any
intermediate in HBM. The standalone chain pays, per layer at ViT-L/518
batch 16: the (B, L, 3W) packed-qkv write + re-read (~276 MB), the
attention-output write + re-read (~92 MB), and a separate LayerNorm pass;
here qkv panels are projected straight out of a VMEM-resident normalized
copy of x, attended, and accumulated through the out-projection into an
fp32 scratch that is flushed once with the residual.

Grid: (batch, head_panels) with the panel axis innermost, so the x block
(index constant in the panel axis) is fetched once per batch item, the
normalized copy is computed once (``panel == 0``) into VMEM scratch, and
the output block is revisited across panels and written once at the last
panel (the revisiting-output pattern of the backward kernels in
:mod:`.pallas_attention`). Head panels are 128 columns (two hd=64 heads)
to satisfy Mosaic's lane tiling, exactly like
:func:`.pallas_attention.flash_mha_packed`.

The ``vv`` flag implements the CLIP-Surgery value-value variant (q = k = v
= the value projection, model/transformer.py:102-152) by pointing all
three weight/bias panels at the value section.

Gradients: a custom_vjp re-derives the chain with XLA ops (exact XLA
cotangents). The kernel is aimed at the no-grad paths (inference, stage-1
frozen extraction); the stage-2 grad path keeps the flash kernels with
their Pallas backwards (see models/clip.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_attention import LANE, _mask_bias

# Tests flip this (together with pallas_attention.INTERPRET) to run the
# same kernel under the Pallas interpreter on CPU.
INTERPRET = False


def _kernel(x_ref, lns_ref, lnb_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref,
            bv_ref, wo_ref, bo_ref, o_ref, xn_s, acc_s, *, scale: float,
            seq_len: int, heads_per_panel: int, n_panels: int, eps: float):
    hi = pl.program_id(1)

    @pl.when(hi == 0)
    def _norm():
        # LayerNorm once per batch item into VMEM scratch; every panel
        # re-reads it for its projections.
        x32 = x_ref[0].astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
        xn = (x32 - mu) * jax.lax.rsqrt(var + eps)
        xn_s[...] = (xn * lns_ref[0] + lnb_ref[0]).astype(xn_s.dtype)
        acc_s[...] = jnp.zeros_like(acc_s)

    xn = xn_s[...]                                         # (L, d)
    q = jax.lax.dot_general(                               # (L, panel) f32
        xn, wq_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bq_ref[0]
    k = jax.lax.dot_general(
        xn, wk_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bk_ref[0]
    v = (jax.lax.dot_general(
        xn, wv_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bv_ref[0]).astype(xn.dtype)

    l_pad = xn.shape[0]
    hd = q.shape[-1] // heads_per_panel
    outs = []
    for i in range(heads_per_panel):
        sl = slice(i * hd, (i + 1) * hd)
        s = jax.lax.dot_general(                           # (L, L) f32
            q[:, sl] * scale, k[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if seq_len < l_pad:
            s = s + _mask_bias(l_pad, seq_len)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(                           # (L, hd) f32
            p.astype(v.dtype), v[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        outs.append(o / l)
    o_panel = jnp.concatenate(outs, axis=-1).astype(xn.dtype)

    acc_s[...] += jax.lax.dot_general(                     # (L, d) f32
        o_panel, wo_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(hi == n_panels - 1)
    def _flush():
        o_ref[0] = (x_ref[0].astype(jnp.float32) + acc_s[...]
                    + bo_ref[0]).astype(o_ref.dtype)


def _xla_chain(ln_params, attn_params, x, num_heads, vv, valid_len, eps):
    from .layers import layer_norm, linear
    from .pallas_attention import _packed_reference

    h = layer_norm(ln_params, x, eps=eps)
    qkv = linear(attn_params["qkv"], h)
    hd = x.shape[-1] // num_heads
    out = _packed_reference(qkv, num_heads, hd ** -0.5, vv, valid_len)
    return x + linear(attn_params["out"], out)


def ln_attn_residual_ok(x, attn_params, num_heads: int) -> bool:
    """Gate: TPU (or interpreter), bf16 activations, float weights, lane-
    tileable shapes, whole-head 128-column panels, square projections."""
    if not INTERPRET and jax.default_backend() != "tpu":
        return False
    if x.dtype != jnp.bfloat16 or x.ndim != 3:
        return False
    if "w" not in attn_params["qkv"]:   # int8-quantized ({'w_q','scale','b'})
        return False
    w = attn_params["qkv"]["w"]
    d = x.shape[-1]
    if not jnp.issubdtype(w.dtype, jnp.floating):
        return False
    if w.shape[-1] != 3 * d or attn_params["out"]["w"].shape != (d, d):
        return False
    l = x.shape[1]
    if l % LANE or d % LANE or d % num_heads:
        return False
    hd = d // num_heads
    group = max(1, LANE // hd)
    return (group * hd) % LANE == 0 and num_heads % group == 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def ln_attn_residual(ln_params, attn_params, x, num_heads: int,
                     vv: bool = False, valid_len=None, eps: float = 1e-5):
    """x + out_proj(attn(qkv(layer_norm(x)))) in one VMEM-resident kernel.

    x: (B, L, d) bf16 with L a multiple of 128 (the tower pre-pads; see
    models/clip.py _maybe_prepad). Guard call sites with
    :func:`ln_attn_residual_ok`.
    """
    b, l_pad, d = x.shape
    hd = d // num_heads
    group = max(1, LANE // hd)
    panel = group * hd
    n_panels = d // panel
    q_sec, k_sec = (2, 2) if vv else (0, 1)  # v-v: all panels from v columns
    seq_len = valid_len if valid_len is not None else l_pad
    scale = hd ** -0.5

    wqkv = attn_params["qkv"]["w"].astype(x.dtype)          # (d, 3d)
    bqkv = attn_params["qkv"]["b"].astype(jnp.float32).reshape(1, 3 * d)
    wo = attn_params["out"]["w"].astype(x.dtype)            # (d, d)
    bo = attn_params["out"]["b"].astype(jnp.float32).reshape(1, d)
    lns = ln_params["scale"].astype(jnp.float32).reshape(1, d)
    lnb = ln_params["bias"].astype(jnp.float32).reshape(1, d)

    kern = functools.partial(_kernel, scale=scale, seq_len=seq_len,
                             heads_per_panel=group, n_panels=n_panels,
                             eps=eps)
    full = lambda bi, hi: (0, 0)  # noqa: E731 — whole-array blocks
    sec_panels = d // panel

    def wcol(s):
        return pl.BlockSpec((d, panel), lambda bi, hi, s=s:
                            (0, s * sec_panels + hi),
                            memory_space=pltpu.VMEM)

    def bcol(s):
        return pl.BlockSpec((1, panel), lambda bi, hi, s=s:
                            (0, s * sec_panels + hi),
                            memory_space=pltpu.VMEM)

    kwargs = {}
    if not INTERPRET:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"))
    out = pl.pallas_call(
        kern,
        grid=(b, n_panels),
        in_specs=[
            pl.BlockSpec((1, l_pad, d), lambda bi, hi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
            wcol(q_sec), wcol(k_sec), wcol(2),
            bcol(q_sec), bcol(k_sec), bcol(2),
            pl.BlockSpec((panel, d), lambda bi, hi: (hi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, l_pad, d), lambda bi, hi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l_pad, d), x.dtype),
        scratch_shapes=(
            pltpu.VMEM((l_pad, d), x.dtype),
            pltpu.VMEM((l_pad, d), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(8 * b * l_pad * d * d            # qkv + out projections
                   + 4 * b * num_heads * l_pad * l_pad * hd),
            bytes_accessed=2 * b * l_pad * d * x.dtype.itemsize,
            transcendentals=b * num_heads * l_pad * l_pad,
        ),
        interpret=INTERPRET,
        **kwargs,
    )(x, lns, lnb, wqkv, wqkv, wqkv, bqkv, bqkv, bqkv, wo, bo)
    return out


def _fwd(ln_params, attn_params, x, num_heads, vv, valid_len, eps):
    return (ln_attn_residual(ln_params, attn_params, x, num_heads, vv,
                             valid_len, eps),
            (ln_params, attn_params, x))


def _bwd(num_heads, vv, valid_len, eps, res, g):
    ln_params, attn_params, x = res
    _, vjp = jax.vjp(
        lambda lp, ap, xx: _xla_chain(lp, ap, xx, num_heads, vv, valid_len,
                                      eps),
        ln_params, attn_params, x)
    return vjp(g)


ln_attn_residual.defvjp(_fwd, _bwd)
