"""Fused LN->MLP->residual kernel parity vs the XLA chain (interpret mode on
CPU; the same kernel compiles for TPU via Mosaic)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aa_clip_iqm_tpu.ops import pallas_mlp as pm
from aa_clip_iqm_tpu.ops.layers import gelu, layer_norm, mlp_block, quick_gelu


@pytest.fixture(autouse=True)
def interpret_mode():
    pm.INTERPRET = True
    yield
    pm.INTERPRET = False


def _params(rng, d, h):
    def w(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.05)

    ln = {"scale": 1.0 + 0.1 * w(d), "bias": 0.1 * w(d)}
    mlp = {"c_fc": {"w": w(d, h), "b": w(h)},
           "c_proj": {"w": w(h, d), "b": w(d)}}
    return ln, mlp


def _xla(ln, mlp, x, act):
    return x + mlp_block(mlp, layer_norm(ln, x), act)


@pytest.mark.parametrize("m,d,h,act", [
    (640, 256, 1024, gelu),       # m a multiple of TM? no — 640 > TM pads
    (130, 128, 512, gelu),        # partial final row tile
    (512, 128, 384, quick_gelu),  # ch=128 fallback, quick_gelu
])
def test_kernel_matches_xla_chain(rng, m, d, h, act):
    ln, mlp = _params(rng, d, h)
    x = jnp.asarray(rng.standard_normal((m, d)), jnp.bfloat16)
    ref = np.asarray(_xla(ln, mlp, x, act), np.float32)
    out = np.asarray(pm.ln_mlp_residual(ln, mlp, x, act), np.float32)
    # bf16 rounding dominates (the erf polynomial's 1.5e-7 is far below it).
    np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.05)


def test_batched_shape_roundtrip(rng):
    ln, mlp = _params(rng, 128, 512)
    x = jnp.asarray(rng.standard_normal((2, 70, 128)), jnp.bfloat16)
    out = pm.ln_mlp_residual(ln, mlp, x, gelu)
    assert out.shape == x.shape and out.dtype == x.dtype
    ref = np.asarray(_xla(ln, mlp, x, gelu), np.float32)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               rtol=0.05, atol=0.05)


def test_gate_conditions(rng):
    ln, mlp = _params(rng, 128, 512)
    x16 = jnp.zeros((8, 128), jnp.bfloat16)
    assert pm.ln_mlp_residual_ok(x16, mlp, gelu)
    assert pm.ln_mlp_residual_ok(x16, mlp, quick_gelu)
    # fp32 compute, unknown activation, odd width, int8-quantized weights ->
    # XLA path.
    assert not pm.ln_mlp_residual_ok(jnp.zeros((8, 128), jnp.float32), mlp,
                                     gelu)
    assert not pm.ln_mlp_residual_ok(x16, mlp, jnp.tanh)
    assert not pm.ln_mlp_residual_ok(jnp.zeros((8, 120), jnp.bfloat16), mlp,
                                     gelu)
    q = {"c_fc": {"w_q": 0, "scale": 0, "b": 0}, "c_proj": mlp["c_proj"]}
    assert not pm.ln_mlp_residual_ok(x16, q, gelu)


def test_gate_off_tpu_without_interpret():
    pm.INTERPRET = False
    ln = {"scale": jnp.ones(128), "bias": jnp.zeros(128)}
    mlp = {"c_fc": {"w": jnp.zeros((128, 512)), "b": jnp.zeros(512)},
           "c_proj": {"w": jnp.zeros((512, 128)), "b": jnp.zeros(128)}}
    assert not pm.ln_mlp_residual_ok(jnp.zeros((8, 128), jnp.bfloat16), mlp,
                                     gelu)


def test_custom_vjp_matches_xla_grads(rng):
    """Backward re-derives the chain with XLA ops on the saved inputs, so
    cotangents agree with jax.grad of the reference chain to fp32 accuracy."""
    ln, mlp = _params(rng, 128, 256)
    x = jnp.asarray(rng.standard_normal((64, 128)), jnp.bfloat16)

    def loss_kernel(mlp_p, xx):
        return jnp.sum(pm.ln_mlp_residual(ln, mlp_p, xx, gelu)
                       .astype(jnp.float32) ** 2)

    def loss_xla(mlp_p, xx):
        return jnp.sum(_xla(ln, mlp_p, xx, gelu).astype(jnp.float32) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1))(mlp, x)
    gx = jax.grad(loss_xla, argnums=(0, 1))(mlp, x)
    # Grad-of-output differs only through the fwd output entering the loss
    # (bf16-level); the chain rule pieces are identical XLA programs.
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gx)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=0.08, atol=0.08)


@pytest.mark.parametrize("act", [gelu, quick_gelu])
def test_frozen_dx_kernel_matches_xla_xgrad(rng, act):
    """The dx-only Pallas backward reproduces XLA's x-cotangent (frozen
    params); ln/mlp cotangents come back as zeros."""
    ln, mlp = _params(rng, 128, 256)
    x = jnp.asarray(rng.standard_normal((130, 128)), jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((130, 128)), jnp.bfloat16)

    _, vjp_x = jax.vjp(lambda xx: _xla(ln, mlp, xx, act), x)
    (dx_ref,) = vjp_x(g)

    _, vjp_k = jax.vjp(
        lambda lp, mp, xx: pm.ln_mlp_residual_frozen(lp, mp, xx, act),
        ln, mlp, x)
    dln, dmlp, dx = vjp_k(g)
    np.testing.assert_allclose(np.asarray(dx, np.float32),
                               np.asarray(dx_ref, np.float32),
                               rtol=0.08, atol=0.08)
    for leaf in jax.tree.leaves((dln, dmlp)):
        assert not np.any(np.asarray(leaf))


def test_frozen_forward_equals_general(rng):
    ln, mlp = _params(rng, 128, 256)
    x = jnp.asarray(rng.standard_normal((64, 128)), jnp.bfloat16)
    a = np.asarray(pm.ln_mlp_residual(ln, mlp, x, gelu), np.float32)
    b = np.asarray(pm.ln_mlp_residual_frozen(ln, mlp, x, gelu), np.float32)
    np.testing.assert_array_equal(a, b)


def _quantize_mlp(mlp):
    from aa_clip_iqm_tpu.ops.quant import quantize_linear_params

    return {"c_fc": quantize_linear_params(mlp["c_fc"]),
            "c_proj": quantize_linear_params(mlp["c_proj"])}


def _int8_transcription(ln, qmlp, x, act, ch):
    """The kernel's exact quantization math as plain XLA ops (per-row input
    scale, per-(row, chunk) hidden scale), for tight parity in interpret
    mode."""
    x32 = x.astype(jnp.float32)
    xn = layer_norm(ln, x32)
    sx = jnp.maximum(jnp.max(jnp.abs(xn), -1, keepdims=True), 1e-6) / 127.0
    x_q = jnp.clip(jnp.round(xn / sx), -127, 127).astype(jnp.int8)
    c_fc, c_proj = qmlp["c_fc"], qmlp["c_proj"]
    h = c_fc["w_q"].shape[-1]
    acc = jnp.zeros((x32.shape[0], x32.shape[-1]), jnp.float32)
    for j in range(0, h, ch):
        hid = jax.lax.dot_general(
            x_q, c_fc["w_q"][:, j:j + ch],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        hid = act(hid * (sx * c_fc["scale"][0, j:j + ch])
                  + c_fc["b"][j:j + ch])
        sh = jnp.maximum(jnp.max(jnp.abs(hid), -1, keepdims=True),
                         1e-6) / 127.0
        h_q = jnp.clip(jnp.round(hid / sh), -127, 127).astype(jnp.int8)
        acc = acc + jax.lax.dot_general(
            h_q, c_proj["w_q"][j:j + ch],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32) * sh
    out = x32 + acc * c_proj["scale"][0] + c_proj["b"]
    return out.astype(x.dtype)


@pytest.mark.parametrize("m,d,h,act,ch", [
    (640, 256, 1024, gelu, 1024),
    (130, 128, 512, gelu, 512),
    (512, 128, 384, quick_gelu, 128),
    (256, 1024, 4096, gelu, 1024),  # flagship ViT-L width
])
def test_int8_kernel_matches_transcription(rng, m, d, h, act, ch):
    """Interpret-mode kernel == the same quantization math in plain XLA, and
    both land within quant error of the fp chain."""
    ln, mlp = _params(rng, d, h)
    qmlp = _quantize_mlp(mlp)
    x = jnp.asarray(rng.standard_normal((m, d)), jnp.bfloat16)
    assert pm.ln_mlp_residual_int8_ok(x, qmlp, act)
    out = np.asarray(pm.ln_mlp_residual_int8(ln, qmlp, x, act), np.float32)
    ref = np.asarray(_int8_transcription(ln, qmlp, x.astype(jnp.float32),
                                         act, ch), np.float32)
    # Reduction-order ulps can flip jnp.round at exact .5 quantization
    # boundaries (±1 int8 step, amplified by the fp scales), so allow a
    # <0.1% fraction of boundary flips with a bounded magnitude; everything
    # else must match the transcription tightly.
    diff = np.abs(out - ref)
    loose = diff > 2e-2 + 2e-2 * np.abs(ref)
    assert loose.mean() < 1e-3, f"{loose.mean():%} elements off"
    assert diff.max() < 0.25, f"boundary flip too large: {diff.max()}"
    fp = np.asarray(_xla(ln, mlp, x, act), np.float32)
    err = np.abs(out - fp).max() / (np.abs(fp).max() + 1e-9)
    assert err < 0.08, f"int8 kernel diverges from fp chain: {err}"


def test_int8_gate_conditions(rng):
    ln, mlp = _params(rng, 128, 512)
    qmlp = _quantize_mlp(mlp)
    x16 = jnp.zeros((8, 128), jnp.bfloat16)
    assert pm.ln_mlp_residual_int8_ok(x16, qmlp, gelu)
    # float weights, fp32 compute, unknown act, odd width -> not eligible.
    assert not pm.ln_mlp_residual_int8_ok(x16, mlp, gelu)
    assert not pm.ln_mlp_residual_int8_ok(
        jnp.zeros((8, 128), jnp.float32), qmlp, gelu)
    assert not pm.ln_mlp_residual_int8_ok(x16, qmlp, jnp.tanh)
    # the fp gate keeps rejecting quantized params
    assert not pm.ln_mlp_residual_ok(x16, qmlp, gelu)


def test_int8_ste_backward(rng):
    """STE backward == grads of the dequantized XLA chain; w_q cotangent is
    float0, scale cotangent zeros, dx/dln/db real."""
    ln, mlp = _params(rng, 128, 256)
    qmlp = _quantize_mlp(mlp)
    x = jnp.asarray(rng.standard_normal((64, 128)), jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((64, 128)), jnp.bfloat16)

    deq = {k: {"w": (qmlp[k]["w_q"].astype(jnp.float32)
                     * qmlp[k]["scale"]).astype(jnp.bfloat16),
               "b": qmlp[k]["b"]} for k in ("c_fc", "c_proj")}
    _, vjp_ref = jax.vjp(lambda lp, mp, xx: _xla(lp, mp, xx, gelu),
                         ln, deq, x)
    dln_r, dmlp_r, dx_r = vjp_ref(g)

    _, vjp_k = jax.vjp(
        lambda lp, mp, xx: pm.ln_mlp_residual_int8(lp, mp, xx, gelu),
        ln, qmlp, x)
    dln, dmlp, dx = vjp_k(g)
    np.testing.assert_allclose(np.asarray(dx, np.float32),
                               np.asarray(dx_r, np.float32),
                               rtol=0.08, atol=0.08)
    for k in ("c_fc", "c_proj"):
        assert dmlp[k]["w_q"].dtype == jax.dtypes.float0
        assert not np.any(np.asarray(dmlp[k]["scale"]))
        np.testing.assert_allclose(np.asarray(dmlp[k]["b"], np.float32),
                                   np.asarray(dmlp_r[k]["b"], np.float32),
                                   rtol=0.08, atol=0.08)
    for a, b in zip(jax.tree.leaves(dln), jax.tree.leaves(dln_r)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=0.08, atol=0.08)


def test_block_dispatch_uses_int8_kernel(rng, monkeypatch):
    """_run_block routes a quantized-MLP block through the int8 fused kernel
    and the output tracks the dequantized float path."""
    from aa_clip_iqm_tpu.models import clip as clip_mod

    cfg_d, heads = 128, 2
    _, mlp = _params(rng, cfg_d, 4 * cfg_d)
    block = {
        "ln_1": {"scale": jnp.ones(cfg_d), "bias": jnp.zeros(cfg_d)},
        "attn": {"qkv": {"w": jnp.asarray(
            rng.standard_normal((cfg_d, 3 * cfg_d)) * 0.05, jnp.float32),
            "b": jnp.zeros(3 * cfg_d)},
            "out": {"w": jnp.asarray(
                rng.standard_normal((cfg_d, cfg_d)) * 0.05, jnp.float32),
                "b": jnp.zeros(cfg_d)}},
        "ln_2": {"scale": jnp.ones(cfg_d), "bias": jnp.zeros(cfg_d)},
        "mlp": _quantize_mlp(mlp),
    }
    x = jnp.asarray(rng.standard_normal((1, 16, cfg_d)), jnp.bfloat16)
    called = {}
    real = pm.ln_mlp_residual_int8

    def spy(*a, **k):
        called["hit"] = True
        return real(*a, **k)

    monkeypatch.setattr(pm, "ln_mlp_residual_int8", spy)
    y_fused = clip_mod._run_block(block, x, heads, gelu, use_pallas=True)
    assert called.get("hit")
    block_fp = dict(block, mlp=mlp)
    y_plain = clip_mod._run_block(block_fp, x, heads, gelu, use_pallas=False)
    np.testing.assert_allclose(np.asarray(y_fused, np.float32),
                               np.asarray(y_plain, np.float32),
                               rtol=0.1, atol=0.1)


def test_block_dispatch_uses_kernel(rng, monkeypatch):
    """_run_block routes through the fused kernel when the gate passes."""
    from aa_clip_iqm_tpu.models import clip as clip_mod

    cfg_d, heads = 128, 2
    block = {
        "ln_1": {"scale": jnp.ones(cfg_d), "bias": jnp.zeros(cfg_d)},
        "attn": {"qkv": {"w": jnp.asarray(
            rng.standard_normal((cfg_d, 3 * cfg_d)) * 0.05, jnp.float32),
            "b": jnp.zeros(3 * cfg_d)},
            "out": {"w": jnp.asarray(
                rng.standard_normal((cfg_d, cfg_d)) * 0.05, jnp.float32),
                "b": jnp.zeros(cfg_d)}},
        "ln_2": {"scale": jnp.ones(cfg_d), "bias": jnp.zeros(cfg_d)},
        "mlp": _params(rng, cfg_d, 4 * cfg_d)[1],
    }
    x = jnp.asarray(rng.standard_normal((1, 16, cfg_d)), jnp.bfloat16)
    called = {}
    real = pm.ln_mlp_residual

    def spy(*a, **k):
        called["hit"] = True
        return real(*a, **k)

    monkeypatch.setattr(pm, "ln_mlp_residual", spy)
    y_fused = clip_mod._run_block(block, x, heads, gelu, use_pallas=True)
    assert called.get("hit")
    y_plain = clip_mod._run_block(block, x, heads, gelu, use_pallas=False)
    np.testing.assert_allclose(np.asarray(y_fused, np.float32),
                               np.asarray(y_plain, np.float32),
                               rtol=0.06, atol=0.06)
