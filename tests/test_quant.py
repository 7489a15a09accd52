"""Int8 quantized inference tier (ops/quant.py): numerics bounds + drop-in
compatibility with the fused predict pipeline."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aa_clip_iqm_tpu.configs import tiny_test_config
from aa_clip_iqm_tpu.models import adapters as adapters_mod
from aa_clip_iqm_tpu.models.clip import init_clip_params, vision_forward
from aa_clip_iqm_tpu.ops.layers import linear
from aa_clip_iqm_tpu.ops.quant import (
    int8_linear,
    quantize_backbone_int8,
    quantize_linear_params,
)

IMG = 56


def test_int8_linear_error_bound(rng):
    """Per-channel weight quant + per-token activation quant: relative error
    of the product stays at the few-percent level typical of int8."""
    d_in, d_out = 96, 64
    p = {"w": rng.standard_normal((d_in, d_out)).astype(np.float32) * 0.05,
         "b": rng.standard_normal(d_out).astype(np.float32) * 0.01}
    x = jnp.asarray(rng.standard_normal((4, 17, d_in)).astype(np.float32))
    ref = np.asarray(linear(p, x))
    qp = quantize_linear_params(p)
    assert qp["w_q"].dtype == jnp.int8
    assert qp["scale"].shape == (1, d_out)
    out = np.asarray(int8_linear(qp, x))
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel
    # the dispatch hook: linear() routes quantized params automatically
    np.testing.assert_array_equal(np.asarray(linear(qp, x)), out)


def test_int8_linear_stacked_layout(rng):
    """Stacked (layers, in, out) weights quantize per layer per channel and
    scan-slice like fp leaves (the block layout vision_forward scans)."""
    L, d_in, d_out = 3, 32, 48
    w = rng.standard_normal((L, d_in, d_out)).astype(np.float32) * 0.05
    qp = quantize_linear_params({"w": w})
    assert qp["w_q"].shape == (L, d_in, d_out)
    assert qp["scale"].shape == (L, 1, d_out)
    x = jnp.asarray(rng.standard_normal((2, 5, d_in)).astype(np.float32))
    for i in range(L):
        sl = jax.tree.map(lambda a: a[i], qp)
        ref = np.asarray(linear({"w": w[i]}, x))
        out = np.asarray(int8_linear(sl, x))
        assert np.linalg.norm(out - ref) / np.linalg.norm(ref) < 0.03


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_config(IMG)
    frozen = init_clip_params(jax.random.PRNGKey(0), cfg.clip)
    trainable = adapters_mod.init_adapter_params(jax.random.PRNGKey(1), cfg)
    return cfg, frozen, trainable


def test_quantized_backbone_vision_forward(model, rng):
    """The quantized pytree drops into vision_forward (scan over int8
    leaves) and tracks the fp forward closely."""
    cfg, frozen, _ = model
    qfrozen = quantize_backbone_int8(frozen)
    # fp leaves shared by reference, matmuls replaced
    assert "w_q" in qfrozen["visual"]["blocks"]["attn"]["qkv"]
    assert qfrozen["visual"]["ln_post"] is frozen["visual"]["ln_post"]
    assert qfrozen["text"] is frozen["text"]

    images = jnp.asarray(
        rng.standard_normal((2, 3, IMG, IMG)).astype(np.float32))
    pooled, taps, _ = vision_forward(
        frozen["visual"], cfg.clip.vision, images,
        out_layers=cfg.adapter.levels)
    pooled_q, taps_q, _ = vision_forward(
        qfrozen["visual"], cfg.clip.vision, images,
        out_layers=cfg.adapter.levels)
    corr = np.corrcoef(np.asarray(pooled).ravel(),
                       np.asarray(pooled_q).ravel())[0, 1]
    assert corr > 0.995, corr
    for t, tq in zip(taps, taps_q):
        corr = np.corrcoef(np.asarray(t).ravel(),
                           np.asarray(tq).ravel())[0, 1]
        assert corr > 0.995, corr


def test_quantize_scope_attn(model, rng):
    """scope='attn' quantizes qkv/out only: the MLP stays float (eligible
    for the fused LN->MLP kernel) and the forward still tracks fp."""
    cfg, frozen, _ = model
    qfrozen = quantize_backbone_int8(frozen, scope="attn")
    blocks = qfrozen["visual"]["blocks"]
    assert "w_q" in blocks["attn"]["qkv"] and "w_q" in blocks["attn"]["out"]
    assert "w_q" not in blocks["mlp"]["c_fc"]
    assert blocks["mlp"]["c_proj"] is frozen["visual"]["blocks"]["mlp"]["c_proj"]

    images = jnp.asarray(
        rng.standard_normal((2, 3, IMG, IMG)).astype(np.float32))
    pooled, _, _ = vision_forward(frozen["visual"], cfg.clip.vision, images)
    pooled_q, _, _ = vision_forward(qfrozen["visual"], cfg.clip.vision,
                                    images)
    corr = np.corrcoef(np.asarray(pooled).ravel(),
                       np.asarray(pooled_q).ravel())[0, 1]
    assert corr > 0.995, corr

    import pytest

    with pytest.raises(ValueError):
        quantize_backbone_int8(frozen, scope="bogus")


def test_quantize_scope_mlp(model, rng):
    """scope='mlp' quantizes c_fc/c_proj only (served by the fused int8
    LN->MLP kernel); the attention projections keep the fp path — the
    measured XLA int8 dot gives qkv/out no rate advantage on v5e
    (docs/DESIGN.md), so this scope drops their activation-quant overhead.
    Forward still tracks fp."""
    cfg, frozen, _ = model
    qfrozen = quantize_backbone_int8(frozen, scope="mlp")
    blocks = qfrozen["visual"]["blocks"]
    assert "w_q" in blocks["mlp"]["c_fc"] and "w_q" in blocks["mlp"]["c_proj"]
    assert "w_q" not in blocks["attn"]["qkv"]
    assert blocks["attn"]["out"] is frozen["visual"]["blocks"]["attn"]["out"]

    images = jnp.asarray(
        rng.standard_normal((2, 3, IMG, IMG)).astype(np.float32))
    pooled, _, _ = vision_forward(frozen["visual"], cfg.clip.vision, images)
    pooled_q, _, _ = vision_forward(qfrozen["visual"], cfg.clip.vision,
                                    images)
    corr = np.corrcoef(np.asarray(pooled).ravel(),
                       np.asarray(pooled_q).ravel())[0, 1]
    assert corr > 0.995, corr


def test_quantize_backbone_tier_frontend(model):
    """quantize_backbone_tier: the shared CLI/env/serving tier mapping —
    None/'' pass through untouched, valid tiers map to the right scope, and
    a typo raises instead of silently running an unintended tier."""
    import pytest

    from aa_clip_iqm_tpu.ops.quant import quantize_backbone_tier

    cfg, frozen, _ = model
    assert quantize_backbone_tier(frozen, None) is frozen
    assert quantize_backbone_tier(frozen, "") is frozen
    q_all = quantize_backbone_tier(frozen, "int8")
    assert "w_q" in q_all["visual"]["blocks"]["mlp"]["c_fc"]
    q_attn = quantize_backbone_tier(frozen, "int8_attn")
    assert "w_q" in q_attn["visual"]["blocks"]["attn"]["qkv"]
    assert "w_q" not in q_attn["visual"]["blocks"]["mlp"]["c_fc"]
    q_mlp = quantize_backbone_tier(frozen, "int8_mlp")
    assert "w_q" in q_mlp["visual"]["blocks"]["mlp"]["c_fc"]
    assert "w_q" not in q_mlp["visual"]["blocks"]["attn"]["qkv"]
    with pytest.raises(ValueError, match="int8-attn"):
        quantize_backbone_tier(frozen, "int8-attn")


def test_quantized_predict_pipeline(model, rng):
    """End-to-end fused predict with the int8 backbone: finite outputs,
    anomaly maps rank-correlated with the fp pipeline (the bf16-study
    methodology, docs/DESIGN.md)."""
    from scipy import stats

    from aa_clip_iqm_tpu.evaluation.predict import make_predict_fn

    cfg, frozen, trainable = model
    qfrozen = quantize_backbone_int8(frozen)
    predict = make_predict_fn(cfg, IMG, "Industrial",
                              compute_dtype=jnp.float32)
    images = jnp.asarray(
        rng.standard_normal((2, 3, IMG, IMG)).astype(np.float32))
    anchors = rng.standard_normal(
        (2, cfg.clip.embed_dim, 2)).astype(np.float32)
    anchors /= np.linalg.norm(anchors, axis=1, keepdims=True)
    anchors = jnp.asarray(anchors)

    maps, scores = predict(frozen, trainable, images, anchors)
    maps_q, scores_q = predict(qfrozen, trainable, images, anchors)
    assert np.isfinite(np.asarray(maps_q)).all()
    assert np.isfinite(np.asarray(scores_q)).all()
    rho = stats.spearmanr(np.asarray(maps).ravel(),
                          np.asarray(maps_q).ravel()).statistic
    assert rho > 0.98, rho


def test_quantize_rejects_resnet():
    from aa_clip_iqm_tpu.configs import get_model_config
    from aa_clip_iqm_tpu.models.clip import init_clip_params as init

    cfg = get_model_config("RN50", img_size=64)
    frozen = init(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="ViT"):
        quantize_backbone_int8(frozen)


def _inject_ln_gain_outliers(frozen, channels, factor):
    """Synthesize the real-weight risk (GPT-style outlier channels): scale a
    few LN gain channels by `factor`, which amplifies the same activation
    channels at every quantized-matmul input."""
    import jax

    def boost(ln):
        scale = np.asarray(ln["scale"], np.float32).copy()
        scale[..., list(channels)] *= factor
        return dict(ln, scale=jnp.asarray(scale))

    blocks = dict(frozen["visual"]["blocks"])
    blocks["ln_1"] = boost(blocks["ln_1"])
    blocks["ln_2"] = boost(blocks["ln_2"])
    return dict(frozen, visual=dict(frozen["visual"], blocks=blocks))


def test_calibration_forward_parity(model, rng):
    """calibrate_ln_amax's internal forward must track vision_forward (it is
    a re-statement of the plain XLA block path): the recorded amax of the
    qkv input equals the true post-ln_1 amax computed from scratch for
    layer 0, and stats have the right shapes/positivity."""
    from aa_clip_iqm_tpu.ops.layers import layer_norm as ln_op
    from aa_clip_iqm_tpu.ops.quant import calibrate_ln_amax

    cfg, frozen, trainable = model
    v = cfg.clip.vision
    images = jnp.asarray(
        rng.standard_normal((2, 3, IMG, IMG)).astype(np.float32))
    stats = calibrate_ln_amax(frozen["visual"], v, images,
                              act_name=cfg.clip.act)
    assert stats["qkv"].shape == (v.layers, v.width)
    assert stats["c_fc"].shape == (v.layers, v.width)
    assert (stats["qkv"] > 0).all() and (stats["c_fc"] > 0).all()

    # layer-0 cross-check from first principles (embed + ln_pre + ln_1)
    from aa_clip_iqm_tpu.models.clip import block_slice, patchify

    x = patchify(frozen["visual"], images, v.patch_size)
    cls = jnp.broadcast_to(frozen["visual"]["class_embedding"],
                           (2, 1, v.width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + frozen["visual"]["positional_embedding"]
    x = ln_op(frozen["visual"]["ln_pre"], x)
    h1 = ln_op(block_slice(frozen["visual"]["blocks"], 0)["ln_1"], x)
    expect = np.max(np.abs(np.asarray(h1)), axis=(0, 1))
    np.testing.assert_allclose(stats["qkv"][0], expect, rtol=1e-5)

    # adapters included when passed (mirrors encode_image_adapted)
    stats_a = calibrate_ln_amax(
        frozen["visual"], v, images, act_name=cfg.clip.act,
        adapters=trainable["image_adapter"]["layer_adapters"],
        adapter_weight=cfg.adapter.image_adapt_weight,
        adapt_until=cfg.adapter.image_adapt_until)
    # layer 0's qkv input precedes any adapter -> identical stats there
    np.testing.assert_allclose(stats_a["qkv"][0], stats["qkv"][0], rtol=1e-6)
    # later layers sit behind adapter blends -> stats differ
    assert not np.allclose(stats_a["qkv"][-1], stats["qkv"][-1])


def test_smooth_backbone_fp_identity(model, rng):
    """The SmoothQuant fold (ln /= s, w rows *= s) is an exact identity of
    the float forward — before quantization nothing may change."""
    from aa_clip_iqm_tpu.ops.quant import calibrate_ln_amax, smooth_backbone

    cfg, frozen, _ = model
    v = cfg.clip.vision
    frozen = _inject_ln_gain_outliers(frozen, channels=(3, 17), factor=40.0)
    images = jnp.asarray(
        rng.standard_normal((2, 3, IMG, IMG)).astype(np.float32))
    stats = calibrate_ln_amax(frozen["visual"], v, images,
                              act_name=cfg.clip.act)
    smoothed = smooth_backbone(frozen, stats, alpha=0.5)
    # the fold really moved scale around
    assert not np.allclose(
        np.asarray(smoothed["visual"]["blocks"]["ln_1"]["scale"]),
        np.asarray(frozen["visual"]["blocks"]["ln_1"]["scale"]))

    pooled, taps, _ = vision_forward(frozen["visual"], v, images,
                                     out_layers=cfg.adapter.levels)
    pooled_s, taps_s, _ = vision_forward(smoothed["visual"], v, images,
                                         out_layers=cfg.adapter.levels)
    # identity up to fp32 rounding: (g/s)*s re-rounds once per channel and
    # the factor-40 outlier gains amplify that through the tower
    np.testing.assert_allclose(np.asarray(pooled_s), np.asarray(pooled),
                               rtol=2e-3, atol=5e-4)
    for t, ts in zip(taps, taps_s):
        np.testing.assert_allclose(np.asarray(ts), np.asarray(t),
                                   rtol=2e-3, atol=5e-4)


def test_smooth_recovers_outlier_int8(model, rng):
    """The study's synthetic failure mode in miniature: LN-gain outlier
    channels degrade plain int8 (per-token activation scales collapse);
    '+smooth' must recover most of the lost fidelity."""
    from aa_clip_iqm_tpu.ops.quant import (
        calibrate_ln_amax,
        quantize_backbone_tier,
    )

    cfg, frozen, _ = model
    v = cfg.clip.vision
    frozen = _inject_ln_gain_outliers(frozen, channels=(5, 29, 44),
                                      factor=80.0)
    images = jnp.asarray(
        rng.standard_normal((4, 3, IMG, IMG)).astype(np.float32))
    pooled, _, _ = vision_forward(frozen["visual"], v, images)

    def err(frozen_q):
        pooled_q, _, _ = vision_forward(frozen_q["visual"], v, images)
        d = np.asarray(pooled_q) - np.asarray(pooled)
        return float(np.linalg.norm(d) / np.linalg.norm(np.asarray(pooled)))

    stats = calibrate_ln_amax(frozen["visual"], v, images,
                              act_name=cfg.clip.act)
    e_plain = err(quantize_backbone_tier(frozen, "int8"))
    e_smooth = err(quantize_backbone_tier(frozen, "int8+smooth",
                                          smooth_stats=stats))
    assert e_smooth < e_plain, (e_plain, e_smooth)
    assert e_smooth < 0.6 * e_plain, (e_plain, e_smooth)


def test_smooth_tier_frontend(model, rng):
    """'+smooth' suffix contract: every base tier accepts it, it requires
    calibration stats, and malformed suffixes raise."""
    from aa_clip_iqm_tpu.ops.quant import (
        calibrate_ln_amax,
        quantize_backbone_tier,
    )

    cfg, frozen, _ = model
    images = jnp.asarray(
        rng.standard_normal((2, 3, IMG, IMG)).astype(np.float32))
    stats = calibrate_ln_amax(frozen["visual"], cfg.clip.vision, images,
                              act_name=cfg.clip.act)
    with pytest.raises(ValueError, match="calibration"):
        quantize_backbone_tier(frozen, "int8+smooth")
    with pytest.raises(ValueError, match="unknown quantization tier"):
        quantize_backbone_tier(frozen, "int8+fast")
    q = quantize_backbone_tier(frozen, "int8_mlp+smooth", smooth_stats=stats)
    assert "w_q" in q["visual"]["blocks"]["mlp"]["c_fc"]
    # mlp scope smooths ln_2 only; ln_1 is untouched
    np.testing.assert_array_equal(
        np.asarray(q["visual"]["blocks"]["ln_1"]["scale"]),
        np.asarray(frozen["visual"]["blocks"]["ln_1"]["scale"]))
    assert not np.allclose(
        np.asarray(q["visual"]["blocks"]["ln_2"]["scale"]),
        np.asarray(frozen["visual"]["blocks"]["ln_2"]["scale"]))
    q_attn = quantize_backbone_tier(frozen, "int8_attn+smooth",
                                    smooth_stats=stats)
    assert "w_q" in q_attn["visual"]["blocks"]["attn"]["qkv"]
    np.testing.assert_array_equal(
        np.asarray(q_attn["visual"]["blocks"]["ln_2"]["scale"]),
        np.asarray(frozen["visual"]["blocks"]["ln_2"]["scale"]))


def test_int8_linear_ste_gradients(rng):
    """Straight-through backward: grads w.r.t. x match the dequantized-
    weight linear (without the VJP they would be silently zero through
    round()); bias grads flow; int8 weights take no grad."""
    p = {"w": rng.standard_normal((24, 16)).astype(np.float32) * 0.05,
         "b": rng.standard_normal(16).astype(np.float32) * 0.01}
    qp = quantize_linear_params(p)
    x = jnp.asarray(rng.standard_normal((3, 24)).astype(np.float32))
    w_deq = np.asarray(qp["w_q"], np.float32) * np.asarray(qp["scale"])

    g = jax.grad(lambda x: jnp.sum(int8_linear(qp, x) ** 2))(x)
    g_ref = jax.grad(lambda x: jnp.sum(
        linear({"w": w_deq, "b": p["b"]}, x) ** 2))(x)
    rel = np.linalg.norm(np.asarray(g) - np.asarray(g_ref)) / \
        np.linalg.norm(np.asarray(g_ref))
    assert rel < 0.01, rel
    # no-bias path differentiates too
    qp2 = quantize_linear_params({"w": p["w"]})
    g2 = jax.grad(lambda x: jnp.sum(int8_linear(qp2, x)))(x)
    assert np.isfinite(np.asarray(g2)).all()


def test_stage2_step_trains_through_quantized_backbone(model, rng):
    """A full stage-2 step over the int8 frozen backbone produces finite
    loss and non-zero adapter updates (the STE backward at work)."""
    from aa_clip_iqm_tpu.configs import TrainConfig
    from aa_clip_iqm_tpu.train import optim, steps

    cfg, frozen, trainable = model
    qfrozen = quantize_backbone_int8(frozen)
    train_cfg = TrainConfig(img_size=IMG, compute_dtype="float32")
    tx = optim.stage2_optimizer(trainable, train_cfg.image_lr, 4)
    opt_state = tx.init(trainable)
    step = steps.make_stage2_step(cfg, train_cfg, tx,
                                  compute_dtype=jnp.float32, donate=False)
    b = 2
    images = jnp.asarray(rng.standard_normal((b, 3, IMG, IMG)).astype(np.float32))
    masks = jnp.asarray((rng.random((b, 1, IMG, IMG)) > 0.8).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 2, b).astype(np.int64))
    anchors = jnp.asarray(rng.standard_normal(
        (b, cfg.clip.embed_dim, 2)).astype(np.float32))
    weights = jnp.ones(b, jnp.float32)
    new_tr, _, loss = step(trainable, opt_state, qfrozen, images, masks,
                           labels, anchors, weights)
    assert np.isfinite(float(loss))
    diff = np.abs(
        np.asarray(new_tr["image_adapter"]["layer_adapters"]["w"]) -
        np.asarray(trainable["image_adapter"]["layer_adapters"]["w"])).max()
    assert diff > 0


def test_stage2_step_through_int8_pallas_kernel(rng, monkeypatch):
    """The stage-2 step with use_pallas over an int8 backbone routes the MLP
    through the fused int8 kernel (interpret mode stands in for Mosaic) and
    still trains: finite loss, non-zero adapter updates through the STE
    custom_vjp inside the block scan. Needs a width-128 tower (the kernel
    gate requires d % 128 == 0, which the width-64 tiny fixture fails)."""
    import dataclasses

    from aa_clip_iqm_tpu.configs import TrainConfig
    from aa_clip_iqm_tpu.ops import pallas_mlp as pm
    from aa_clip_iqm_tpu.train import optim, steps

    cfg = tiny_test_config(IMG)
    cfg = dataclasses.replace(
        cfg, clip=dataclasses.replace(
            cfg.clip, vision=dataclasses.replace(
                cfg.clip.vision, width=128)))
    frozen = init_clip_params(jax.random.PRNGKey(0), cfg.clip)
    trainable = adapters_mod.init_adapter_params(jax.random.PRNGKey(1), cfg)
    qfrozen = quantize_backbone_int8(frozen)

    from aa_clip_iqm_tpu.ops.layers import gelu

    blk = jax.tree.map(lambda x: x[0], qfrozen["visual"]["blocks"])
    x_probe = jnp.zeros((4, 128), jnp.bfloat16)
    monkeypatch.setattr(pm, "INTERPRET", True)
    assert pm.ln_mlp_residual_int8_ok(x_probe, blk["mlp"], gelu)

    called = {}
    real = pm.ln_mlp_residual_int8

    def spy(*a, **k):
        called["hit"] = True
        return real(*a, **k)

    monkeypatch.setattr(pm, "ln_mlp_residual_int8", spy)

    train_cfg = TrainConfig(img_size=IMG, compute_dtype="bfloat16")
    tx = optim.stage2_optimizer(trainable, train_cfg.image_lr, 4)
    opt_state = tx.init(trainable)
    step = steps.make_stage2_step(cfg, train_cfg, tx,
                                  compute_dtype=jnp.bfloat16,
                                  use_pallas=True, donate=False)
    b = 2
    images = jnp.asarray(
        rng.standard_normal((b, 3, IMG, IMG)).astype(np.float32))
    masks = jnp.asarray(
        (rng.random((b, 1, IMG, IMG)) > 0.8).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 2, b).astype(np.int64))
    anchors = jnp.asarray(rng.standard_normal(
        (b, cfg.clip.embed_dim, 2)).astype(np.float32))
    weights = jnp.ones(b, jnp.float32)
    new_tr, _, loss = step(trainable, opt_state, qfrozen, images, masks,
                           labels, anchors, weights)
    assert called.get("hit"), "int8 fused kernel was not dispatched"
    assert np.isfinite(float(loss))
    diff = np.abs(
        np.asarray(new_tr["image_adapter"]["layer_adapters"]["w"]) -
        np.asarray(trainable["image_adapter"]["layer_adapters"]["w"])).max()
    assert diff > 0
