"""Flash-attention kernel parity vs the XLA reference path (interpret mode on
CPU; the same kernel compiles for TPU via Mosaic)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aa_clip_iqm_tpu.ops import pallas_attention as pa
from aa_clip_iqm_tpu.ops.attention import sdpa


@pytest.fixture(autouse=True)
def interpret_mode():
    pa.INTERPRET = True
    yield
    pa.INTERPRET = False


def _rand_qkv(rng, b, h, l, hd, dtype=np.float32):
    def r():
        return rng.standard_normal((b, h, l, hd)).astype(dtype)

    return r(), r(), r()


@pytest.mark.parametrize("seq_len", [256, 384, 1370])
def test_flash_matches_sdpa(rng, seq_len):
    b, h, hd = 1, 2, 64
    q, k, v = _rand_qkv(rng, b, h, seq_len, hd)
    scale = hd ** -0.5
    ref = np.asarray(sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          scale))
    out = np.asarray(pa.flash_mha(jnp.asarray(q), jnp.asarray(k),
                                  jnp.asarray(v), scale))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_flash_vv_semantics(rng):
    """v-v surgery: passing v for q and k gives value-value attention."""
    b, h, l, hd = 1, 2, 256, 64
    _, _, v = _rand_qkv(rng, b, h, l, hd)
    scale = hd ** -0.5
    vj = jnp.asarray(v)
    ref = np.asarray(sdpa(vj, vj, vj, scale))
    out = np.asarray(pa.flash_mha(vj, vj, vj, scale))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_flash_short_seq_falls_back(rng):
    b, h, l, hd = 2, 2, 77, 32
    q, k, v = _rand_qkv(rng, b, h, l, hd)
    scale = hd ** -0.5
    mask = np.triu(np.full((l, l), -np.inf, np.float32), 1)
    ref = np.asarray(sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          scale, jnp.asarray(mask)))
    out = np.asarray(pa.flash_mha(jnp.asarray(q), jnp.asarray(k),
                                  jnp.asarray(v), scale,
                                  attn_mask=jnp.asarray(mask)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_blockwise_kernel_matches_sdpa(rng):
    """Force the online-softmax blockwise path (used for long sequences)."""
    b, h, hd = 1, 2, 64
    q, k, v = _rand_qkv(rng, b, h, 384, hd)
    scale = hd ** -0.5
    ref = np.asarray(sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          scale))
    old = pa.ROW_KERNEL_MAX_TOKENS
    pa.ROW_KERNEL_MAX_TOKENS = 0
    try:
        out = np.asarray(pa.flash_mha(jnp.asarray(q), jnp.asarray(k),
                                      jnp.asarray(v), scale))
    finally:
        pa.ROW_KERNEL_MAX_TOKENS = old
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_flash_bf16(rng):
    b, h, l, hd = 1, 2, 256, 64
    q, k, v = _rand_qkv(rng, b, h, l, hd, dtype=np.float32)
    scale = hd ** -0.5
    qb, kb, vb = (jnp.asarray(x, jnp.bfloat16) for x in (q, k, v))
    ref = np.asarray(sdpa(qb, kb, vb, scale).astype(jnp.float32))
    out = np.asarray(pa.flash_mha(qb, kb, vb, scale).astype(jnp.float32))
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)


def test_packed_matches_mha_path(rng):
    """flash_mha_packed on a packed qkv == unpack + sdpa."""
    b, l, heads, hd = 2, 256, 4, 64
    w = heads * hd
    qkv = rng.standard_normal((b, l, 3 * w)).astype(np.float32)
    scale = hd ** -0.5
    ref = np.asarray(pa._packed_reference(jnp.asarray(qkv), heads, scale,
                                          False))
    out = np.asarray(pa.flash_mha_packed(jnp.asarray(qkv), heads, scale))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_packed_vv_matches_reference(rng):
    b, l, heads, hd = 1, 256, 4, 64
    w = heads * hd
    qkv = rng.standard_normal((b, l, 3 * w)).astype(np.float32)
    scale = hd ** -0.5
    ref = np.asarray(pa._packed_reference(jnp.asarray(qkv), heads, scale, True))
    out = np.asarray(pa.flash_mha_packed(jnp.asarray(qkv), heads, scale,
                                         vv=True))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_packed_gradient(rng):
    """Gradient through the flash backward kernel matches the reference
    autodiff (dq, dk, dv all exercised via the packed layout)."""
    b, l, heads, hd = 1, 256, 2, 64
    w = heads * hd
    qkv = jnp.asarray(rng.standard_normal((b, l, 3 * w)).astype(np.float32))
    scale = hd ** -0.5

    g1 = jax.grad(lambda t: jnp.sum(
        pa.flash_mha_packed(t, heads, scale) ** 2))(qkv)
    g2 = jax.grad(lambda t: jnp.sum(
        pa._packed_reference(t, heads, scale, False) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3,
                               atol=1e-4)


def test_packed_gradient_with_tail_padding(rng):
    """Backward with a non-128-multiple sequence (kernel pads + masks)."""
    b, l, heads, hd = 1, 300, 2, 64
    w = heads * hd
    qkv = jnp.asarray(rng.standard_normal((b, l, 3 * w)).astype(np.float32))
    scale = hd ** -0.5

    def loss_flash(t):
        return jnp.sum(pa.flash_mha_packed(t, heads, scale) ** 2)

    def loss_ref(t):
        return jnp.sum(pa._packed_reference(t, heads, scale, False) ** 2)

    g1 = jax.grad(loss_flash)(qkv)
    g2 = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3,
                               atol=1e-4)


@pytest.mark.parametrize("seq_len", [256, 300])
def test_packed_gradient_vv(rng, seq_len):
    """v-v path gradients: the flash backward kernel (three-way shared-operand
    accumulation) vs both autodiff oracles, incl. a tail-padded length."""
    b, heads, hd = 1, 2, 64
    w = heads * hd
    qkv = jnp.asarray(
        rng.standard_normal((b, seq_len, 3 * w)).astype(np.float32))
    scale = hd ** -0.5
    assert pa.VV_BWD_KERNEL
    g1 = jax.grad(lambda t: jnp.sum(
        pa.flash_mha_packed(t, heads, scale, True) ** 2))(qkv)
    g2 = jax.grad(lambda t: jnp.sum(
        pa._packed_reference(t, heads, scale, True) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3,
                               atol=1e-4)
    # The recompute branch of the custom VJP stays available as a fallback.
    pa.VV_BWD_KERNEL = False
    try:
        g3 = jax.grad(lambda t: jnp.sum(
            pa.flash_mha_packed(t, heads, scale, True) ** 2))(qkv)
    finally:
        pa.VV_BWD_KERNEL = True
    np.testing.assert_allclose(np.asarray(g3), np.asarray(g2), rtol=1e-3,
                               atol=1e-4)


def test_mha_wrapper_packed_path_matches_xla(rng):
    """ops.attention.mha with use_pallas routes through the packed kernel and
    matches the XLA path."""
    from aa_clip_iqm_tpu.ops import attention as attn_ops

    d, h, b, l = 128, 2, 2, 384
    w_in = rng.standard_normal((d, 3 * d)).astype(np.float32) * 0.05
    params = {
        "qkv": {"w": w_in, "b": rng.standard_normal(3 * d).astype(np.float32) * 0.01},
        "out": {"w": rng.standard_normal((d, d)).astype(np.float32) * 0.05,
                "b": np.zeros(d, np.float32)},
    }
    x = jnp.asarray(rng.standard_normal((b, l, d)).astype(np.float32))
    ref = np.asarray(attn_ops.mha(params, x, h))
    out = np.asarray(attn_ops.mha(params, x, h, use_pallas=True))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)
    ref_vv = np.asarray(attn_ops.vv_attention(params, x, h))
    out_vv = np.asarray(attn_ops.vv_attention(params, x, h, use_pallas=True))
    np.testing.assert_allclose(out_vv, ref_vv, rtol=2e-4, atol=2e-5)


def test_vision_forward_prepadded_pallas_matches_xla(rng):
    """Full tower with tower-wide pre-padding + packed kernel == XLA path."""
    from aa_clip_iqm_tpu.configs import VisionConfig
    from aa_clip_iqm_tpu.models import clip as jclip

    cfg = VisionConfig(image_size=224, patch_size=14, width=256, layers=2,
                       head_width=64, output_dim=64)
    params = jclip.init_vision_params(jax.random.PRNGKey(0), cfg)
    images = jnp.asarray(
        rng.standard_normal((1, 3, 224, 224)).astype(np.float32))
    # 257 tokens -> pre-padded to 384 inside the tower
    p_ref, taps_ref, x_ref = jclip.vision_forward(params, cfg, images,
                                                  out_layers=(1, 2))
    old_prepad = jclip.PREPAD_TOKENS
    jclip.PREPAD_TOKENS = True
    try:
        p_out, taps_out, x_out = jclip.vision_forward(params, cfg, images,
                                                      out_layers=(1, 2),
                                                      use_pallas=True)
    finally:
        jclip.PREPAD_TOKENS = old_prepad
    np.testing.assert_allclose(np.asarray(p_out), np.asarray(p_ref),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(x_out), np.asarray(x_ref),
                               rtol=2e-3, atol=2e-4)
    for a, b in zip(taps_out, taps_ref):
        assert a.shape == b.shape == (1, 257, 256)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_dual_vision_features_prepadded_matches_xla(rng):
    """Stage-1 dual forward with tower-wide pre-padding == XLA path: taps
    come back sliced to the real token count in both branches."""
    from aa_clip_iqm_tpu.configs import VisionConfig
    from aa_clip_iqm_tpu.models import clip as jclip

    cfg = VisionConfig(image_size=224, patch_size=14, width=256, layers=3,
                       head_width=64, output_dim=64)
    params = jclip.init_vision_params(jax.random.PRNGKey(0), cfg)
    images = jnp.asarray(
        rng.standard_normal((1, 3, 224, 224)).astype(np.float32))
    p_ref, taps_ref = jclip.dual_vision_features(params, cfg, images,
                                                 out_layers=(1, 3), vv_from=2)
    old_prepad = jclip.PREPAD_TOKENS
    jclip.PREPAD_TOKENS = True
    try:
        p_out, taps_out = jclip.dual_vision_features(
            params, cfg, images, out_layers=(1, 3), vv_from=2,
            use_pallas=True)
    finally:
        jclip.PREPAD_TOKENS = old_prepad
    np.testing.assert_allclose(np.asarray(p_out), np.asarray(p_ref),
                               rtol=2e-3, atol=2e-4)
    for a, b in zip(taps_out, taps_ref):
        assert a.shape == b.shape == (1, 257, 256)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_flash_gradient_matches_sdpa(rng):
    b, h, l, hd = 1, 1, 256, 64
    q, k, v = _rand_qkv(rng, b, h, l, hd)
    scale = hd ** -0.5

    def loss_flash(q, k, v):
        return jnp.sum(pa.flash_mha(q, k, v, scale) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(sdpa(q, k, v, scale) ** 2)

    args = (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
    for gf, gr in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=1e-3, atol=1e-4)
