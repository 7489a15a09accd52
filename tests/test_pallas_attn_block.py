"""Fused LN->qkv->attention->out-proj->residual kernel parity vs the XLA
chain (interpret mode on CPU; the same kernel compiles for TPU via Mosaic).

Reference semantics: model/transformer.py:239-258 (x + attention(ln_1(x)))
including the CLIP-Surgery v-v variant (transformer.py:102-152).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aa_clip_iqm_tpu.ops import pallas_attention as pa
from aa_clip_iqm_tpu.ops import pallas_attn_block as pb


@pytest.fixture(autouse=True)
def interpret_mode():
    pb.INTERPRET = True
    pa.INTERPRET = True
    yield
    pb.INTERPRET = False
    pa.INTERPRET = False


def _params(rng, d):
    def w(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32)
                           * 0.05)

    ln = {"scale": 1.0 + 0.1 * w(d), "bias": 0.1 * w(d)}
    attn = {"qkv": {"w": w(d, 3 * d), "b": 0.1 * w(3 * d)},
            "out": {"w": w(d, d), "b": 0.1 * w(d)}}
    return ln, attn


@pytest.mark.parametrize("b,l,d,heads,vv,valid", [
    (2, 128, 128, 2, False, None),   # hd=64 -> two heads per 128-panel
    (1, 128, 128, 2, True, None),    # v-v surgery path
    (2, 128, 128, 2, False, 100),    # padded rows masked out
    (1, 256, 256, 2, False, None),   # hd=128 -> one head per panel, 2 panels
    (1, 128, 128, 1, True, 70),      # single hd=128 head + vv + mask
])
def test_kernel_matches_xla_chain(rng, b, l, d, heads, vv, valid):
    ln, attn = _params(rng, d)
    x = jnp.asarray(rng.standard_normal((b, l, d)), jnp.bfloat16)
    ref = np.asarray(
        pb._xla_chain(ln, attn, x, heads, vv, valid, 1e-5), np.float32)
    out = np.asarray(
        pb.ln_attn_residual(ln, attn, x, heads, vv, valid), np.float32)
    n = valid if valid is not None else l
    # Padded rows are garbage in both paths; compare the valid region.
    np.testing.assert_allclose(out[:, :n], ref[:, :n], rtol=0.06, atol=0.06)


def test_gate_conditions(rng):
    ln, attn = _params(rng, 128)
    x = jnp.zeros((2, 128, 128), jnp.bfloat16)
    assert pb.ln_attn_residual_ok(x, attn, 2)
    # fp32 activations, 2-D input, non-128 length, width not lane-aligned,
    # quantized weights -> XLA path.
    assert not pb.ln_attn_residual_ok(x.astype(jnp.float32), attn, 2)
    assert not pb.ln_attn_residual_ok(jnp.zeros((128, 128), jnp.bfloat16),
                                      attn, 2)
    assert not pb.ln_attn_residual_ok(jnp.zeros((2, 130, 128), jnp.bfloat16),
                                      attn, 2)
    q = {"qkv": {"w": attn["qkv"]["w"].astype(jnp.int8),
                 "b": attn["qkv"]["b"]}, "out": attn["out"]}
    assert not pb.ln_attn_residual_ok(x, q, 2)
    # int8 tier replaces 'w' with {'w_q','scale'}; the gate must return
    # False, not KeyError (regression).
    q8 = {"qkv": {"w_q": attn["qkv"]["w"].astype(jnp.int8),
                  "scale": jnp.ones(384), "b": attn["qkv"]["b"]},
          "out": attn["out"]}
    assert not pb.ln_attn_residual_ok(x, q8, 2)
    # hd=32 -> 4 heads/panel is fine; heads not divisible by group is not.
    assert pb.ln_attn_residual_ok(x, attn, 4)
    assert not pb.ln_attn_residual_ok(x, attn, 128 // 42)


def test_gate_off_tpu_without_interpret(rng):
    pb.INTERPRET = False
    ln, attn = _params(rng, 128)
    assert not pb.ln_attn_residual_ok(
        jnp.zeros((2, 128, 128), jnp.bfloat16), attn, 2)


def test_block_dispatch_uses_kernel(rng, monkeypatch):
    """_run_block routes the attention branch through the fused kernel when
    FUSED_ATTN is on and the gate passes, and matches the plain path."""
    from aa_clip_iqm_tpu.models import clip as clip_mod

    d, heads = 128, 2
    ln, attn = _params(rng, d)
    block = {
        "ln_1": ln,
        "attn": attn,
        "ln_2": {"scale": jnp.ones(d), "bias": jnp.zeros(d)},
        "mlp": {"c_fc": {"w": 0.05 * jnp.asarray(
            rng.standard_normal((d, 4 * d)), jnp.float32),
            "b": jnp.zeros(4 * d)},
            "c_proj": {"w": 0.05 * jnp.asarray(
                rng.standard_normal((4 * d, d)), jnp.float32),
                "b": jnp.zeros(d)}},
    }
    from aa_clip_iqm_tpu.ops.layers import gelu

    x = jnp.asarray(rng.standard_normal((1, 128, d)), jnp.bfloat16)
    called = {}
    real = pb.ln_attn_residual

    def spy(*a, **k):
        called["hit"] = True
        return real(*a, **k)

    monkeypatch.setattr(pb, "ln_attn_residual", spy)
    monkeypatch.setattr(clip_mod, "FUSED_ATTN", True)
    y_fused = clip_mod._run_block(block, x, heads, gelu, use_pallas=True,
                                  vv=True)
    assert called.get("hit")
    monkeypatch.setattr(clip_mod, "FUSED_ATTN", False)
    y_plain = clip_mod._run_block(block, x, heads, gelu, use_pallas=False,
                                  vv=True)
    np.testing.assert_allclose(np.asarray(y_fused, np.float32),
                               np.asarray(y_plain, np.float32),
                               rtol=0.06, atol=0.06)


def test_custom_vjp_matches_xla_grads(rng):
    """Backward re-derives the chain with XLA ops on the saved inputs, so
    cotangents agree with jax.grad of the reference chain to fp32 accuracy."""
    ln, attn = _params(rng, 128)
    x = jnp.asarray(rng.standard_normal((1, 128, 128)), jnp.bfloat16)

    def loss_kernel(ap, xx):
        return jnp.sum(pb.ln_attn_residual(ln, ap, xx, 2, False, 100)
                       .astype(jnp.float32)[:, :100] ** 2)

    def loss_xla(ap, xx):
        return jnp.sum(pb._xla_chain(ln, ap, xx, 2, False, 100, 1e-5)
                       .astype(jnp.float32)[:, :100] ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1))(attn, x)
    gx = jax.grad(loss_xla, argnums=(0, 1))(attn, x)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gx)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=0.08, atol=0.08)
