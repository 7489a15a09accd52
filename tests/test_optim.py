"""Optimizer/schedule parity vs torch.optim (reference train.py:335-353)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from aa_clip_iqm_tpu.train import optim  # noqa: E402


def _torch_steps(opt_cls, params_np, grads_np, n_steps, scheduler_fn=None,
                 **kw):
    ps = [torch.nn.Parameter(torch.from_numpy(p.copy())) for p in params_np]
    opt = opt_cls(ps, **kw)
    sched = scheduler_fn(opt) if scheduler_fn else None
    for t in range(n_steps):
        opt.zero_grad()
        for p, g in zip(ps, grads_np):
            p.grad = torch.from_numpy(g * (t + 1))  # vary grads per step
        opt.step()
        if sched is not None:
            sched.step()
    return [p.detach().numpy() for p in ps]


def _optax_steps(tx, params, grads_np, n_steps):
    state = tx.init(params)
    for t in range(n_steps):
        grads = jax.tree.map(lambda g: jnp.asarray(g * (t + 1)),
                             jax.tree.map(np.asarray, grads_np))
        updates, state = tx.update(grads, state, params)
        import optax as _optax

        params = _optax.apply_updates(params, updates)
    return params


def test_stage1_adam_matches_torch(rng):
    """Adam lr 1e-5 betas (0.5, 0.999) — train.py:335-339."""
    p = rng.standard_normal((8, 4)).astype(np.float32)
    g = (rng.standard_normal((8, 4)) * 0.1).astype(np.float32)
    ref = _torch_steps(torch.optim.Adam, [p], [g], 5, lr=1e-5,
                       betas=(0.5, 0.999))[0]
    ours = _optax_steps(optim.stage1_optimizer(1e-5),
                        {"w": jnp.asarray(p)}, {"w": g}, 5)
    np.testing.assert_allclose(np.asarray(ours["w"]), ref, rtol=1e-5,
                               atol=1e-7)


def test_stage2_adamw_groups_and_cosine_match_torch(rng):
    """Two AdamW groups (image lr/wd 5e-4/1e-4; IQM lr x0.1, wd 1e-3) with a
    per-step cosine to eta_min=1e-6 — train.py:342-353 semantics over the
    true total step count; text adapter frozen."""
    total = 6
    p_img = rng.standard_normal((6, 3)).astype(np.float32)
    p_iqm = rng.standard_normal((5, 2)).astype(np.float32)
    p_txt = rng.standard_normal((4,)).astype(np.float32)
    g_img = (rng.standard_normal((6, 3)) * 0.1).astype(np.float32)
    g_iqm = (rng.standard_normal((5, 2)) * 0.1).astype(np.float32)
    g_txt = (rng.standard_normal((4,)) * 0.1).astype(np.float32)

    trainable = {"image_adapter": {"w": jnp.asarray(p_img)},
                 "iqm": {"w": jnp.asarray(p_iqm)},
                 "text_adapter": {"w": jnp.asarray(p_txt)}}
    tx = optim.stage2_optimizer(trainable, 5e-4, total)
    ours = _optax_steps(tx, trainable,
                        {"image_adapter": {"w": g_img},
                         "iqm": {"w": g_iqm},
                         "text_adapter": {"w": g_txt}}, total)

    def sched(opt):
        return torch.optim.lr_scheduler.CosineAnnealingLR(
            opt, T_max=total, eta_min=1e-6)

    ref_img = _torch_steps(torch.optim.AdamW, [p_img], [g_img], total,
                           scheduler_fn=sched, lr=5e-4, weight_decay=1e-4)[0]
    ref_iqm = _torch_steps(torch.optim.AdamW, [p_iqm], [g_iqm], total,
                           scheduler_fn=sched, lr=5e-5, weight_decay=1e-3)[0]
    np.testing.assert_allclose(np.asarray(ours["image_adapter"]["w"]),
                               ref_img, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours["iqm"]["w"]), ref_iqm,
                               rtol=1e-4, atol=1e-6)
    # frozen group untouched
    np.testing.assert_array_equal(np.asarray(ours["text_adapter"]["w"]),
                                  p_txt)


def test_torch_lr_quirk_schedule_curve():
    """torch_quirk_period_steps reproduces the reference's per-batch-stepped
    T_max=epochs scheduler: the closed-form periodic cosine that completes
    in the first T steps then climbs back (train.py:222,353)."""
    T, base, eta = 5, 5e-4, 1e-6
    sched = optim.cosine_annealing(base, total_steps=100,
                                   torch_quirk_period_steps=T)
    dummy = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base)
    tsched = torch.optim.lr_scheduler.CosineAnnealingLR(dummy, T_max=T,
                                                        eta_min=eta)
    for t in range(3 * T):
        np.testing.assert_allclose(float(sched(t)), tsched.get_last_lr()[0],
                                   rtol=1e-5, atol=1e-9)
        tsched.step()
    # periodicity: back at base lr after a full 2T cycle
    np.testing.assert_allclose(float(sched(2 * T)), base, rtol=1e-6)
    assert float(sched(T)) == pytest.approx(eta, rel=1e-3)


def test_default_cosine_decays_over_total_steps():
    base, total, eta = 5e-4, 40, 1e-6
    sched = optim.cosine_annealing(base, total_steps=total, eta_min=eta)
    assert float(sched(0)) == pytest.approx(base)
    assert float(sched(total)) == pytest.approx(eta, rel=1e-2)
    vals = [float(sched(t)) for t in range(total + 1)]
    assert all(a >= b - 1e-12 for a, b in zip(vals, vals[1:]))  # monotone


def test_stage2_param_labels_match_reference_groups():
    """The reference's optimizer groups (train.py:342-350) train exactly
    image_adapter, and iqm + class_query_mlp + query_adapters at lr x0.1.
    pos_embedding and iqm_layer_norm exist but sit in NO group, so they stay
    at init (sinusoidal table / identity LN) — we label them 'frozen'. The
    three lazy projections are the deliberate Q1/Q2 fix: trained ('iqm')."""
    trainable = {k: {"w": jnp.zeros((2, 2))} for k in (
        "image_adapter", "text_adapter", "iqm", "class_query_mlp",
        "query_adapters", "visual_feature_proj", "text_feature_proj",
        "query_proj", "pos_embedding", "iqm_layer_norm")}
    labels = optim.stage2_param_labels(trainable)
    got = {k: labels[k]["w"] for k in trainable}
    assert got["image_adapter"] == "image"
    for k in ("iqm", "class_query_mlp", "query_adapters",
              "visual_feature_proj", "text_feature_proj", "query_proj"):
        assert got[k] == "iqm", k
    for k in ("text_adapter", "pos_embedding", "iqm_layer_norm"):
        assert got[k] == "frozen", k

    # Frozen-at-init is real: a stage-2 update leaves them byte-identical.
    tx = optim.stage2_optimizer(trainable, 5e-4, 4)
    state = tx.init(trainable)
    grads = jax.tree.map(jnp.ones_like, trainable)
    import optax as _optax

    updates, _ = tx.update(grads, state, trainable)
    new = _optax.apply_updates(trainable, updates)
    for k in ("pos_embedding", "iqm_layer_norm", "text_adapter"):
        np.testing.assert_array_equal(np.asarray(new[k]["w"]),
                                      np.asarray(trainable[k]["w"]))
    assert np.abs(np.asarray(new["iqm"]["w"])).max() > 0


def test_clip_stage2_grads_masks_frozen_groups():
    """--clip_grad_norm's global norm covers ONLY the groups whose updates
    apply: frozen-labeled gradients (text_adapter, pos_embedding,
    iqm_layer_norm) are zeroed before the norm, so they neither consume the
    clip budget nor survive into the clipped tree."""
    trainable = {
        "image_adapter": {"w": jnp.full((2, 2), 3.0)},
        "iqm": {"w": jnp.full((2, 2), 4.0)},
        "text_adapter": {"w": jnp.full((2, 2), 100.0)},   # frozen
        "pos_embedding": {"w": jnp.full((2, 2), 100.0)},  # frozen
    }
    max_norm = 1.0
    clipped = optim.clip_stage2_grads(trainable, max_norm)

    # trained-group norm: sqrt(4*9 + 4*16) = 10 -> scale 1/10
    trained_norm = float(np.sqrt(4 * 9.0 + 4 * 16.0))
    np.testing.assert_allclose(np.asarray(clipped["image_adapter"]["w"]),
                               3.0 / trained_norm, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(clipped["iqm"]["w"]),
                               4.0 / trained_norm, rtol=1e-6)
    # frozen grads are zeroed (their updates are set_to_zero anyway) — had
    # they been counted, the scale would be dominated by the 100s.
    np.testing.assert_array_equal(np.asarray(clipped["text_adapter"]["w"]), 0.0)
    np.testing.assert_array_equal(np.asarray(clipped["pos_embedding"]["w"]), 0.0)

    # applied-update global norm respects the threshold exactly
    applied = np.sqrt(sum(float(np.square(np.asarray(clipped[k]["w"])).sum())
                          for k in ("image_adapter", "iqm")))
    assert applied == pytest.approx(max_norm, rel=1e-5)
