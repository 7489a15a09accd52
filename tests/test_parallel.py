"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Validates that training steps and the predict pipeline compile and execute
data-parallel (and with tensor-parallel backbone shardings) over a
jax.sharding.Mesh, and that DP results match single-device results.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aa_clip_iqm_tpu.configs import TrainConfig, tiny_test_config
from aa_clip_iqm_tpu.evaluation.predict import make_predict_fn
from aa_clip_iqm_tpu.models import adapters as adapters_mod
from aa_clip_iqm_tpu.models.clip import init_clip_params
from aa_clip_iqm_tpu.parallel import mesh as mesh_mod
from aa_clip_iqm_tpu.train import optim, steps

IMG = 56


@pytest.fixture(scope="module")
def model():
    cfg = tiny_test_config(IMG)
    frozen = init_clip_params(jax.random.PRNGKey(0), cfg.clip)
    trainable = adapters_mod.init_adapter_params(jax.random.PRNGKey(1), cfg)
    return cfg, frozen, trainable


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(5)
    b = 8
    return {
        "image": rng.standard_normal((b, 3, IMG, IMG)).astype(np.float32),
        "mask": (rng.random((b, 1, IMG, IMG)) > 0.8).astype(np.float32),
        "label": rng.integers(0, 2, b).astype(np.int64),
    }


def test_device_count():
    assert jax.device_count() == 8


def test_data_parallel_stage2_matches_single_device(model, batch):
    cfg, frozen, trainable = model
    train_cfg = TrainConfig(img_size=IMG, image_epoch=1,
                            compute_dtype="float32")
    tx = optim.stage2_optimizer(trainable, train_cfg.image_lr, 10)
    opt_state = tx.init(trainable)
    anchors = jnp.asarray(
        np.random.default_rng(2).standard_normal(
            (8, cfg.clip.embed_dim, 2)).astype(np.float32))

    args = (jnp.asarray(batch["image"]), jnp.asarray(batch["mask"]),
            jnp.asarray(batch["label"]), anchors,
            jnp.ones(batch["image"].shape[0], jnp.float32))

    # donate=False: the same trainable/opt_state feed both step variants
    single = steps.make_stage2_step(cfg, train_cfg, tx,
                                    compute_dtype=jnp.float32, donate=False)
    t1, _, loss1 = single(trainable, opt_state, frozen, *args)

    mesh = mesh_mod.make_mesh()
    sharded = steps.make_stage2_step(cfg, train_cfg, tx,
                                     compute_dtype=jnp.float32, mesh=mesh,
                                     donate=False)
    t8, _, loss8 = sharded(trainable, opt_state, frozen, *args)

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-4)
    w1 = np.asarray(t1["image_adapter"]["det_proj"]["w"])
    w8 = np.asarray(t8["image_adapter"]["det_proj"]["w"])
    np.testing.assert_allclose(w1, w8, rtol=1e-4, atol=1e-5)


def test_data_parallel_predict_matches_single_device(model, batch):
    cfg, frozen, trainable = model
    anchors = jnp.asarray(
        np.random.default_rng(3).standard_normal(
            (8, cfg.clip.embed_dim, 2)).astype(np.float32))
    images = jnp.asarray(batch["image"])

    single = make_predict_fn(cfg, IMG, "Industrial")
    map1, logit1 = single(frozen, trainable, images, anchors)

    mesh = mesh_mod.make_mesh()
    dp = make_predict_fn(cfg, IMG, "Industrial", mesh=mesh)
    map8, logit8 = dp(frozen, trainable, images, anchors)

    np.testing.assert_allclose(np.asarray(map1), np.asarray(map8),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(logit1), np.asarray(logit8),
                               rtol=1e-4, atol=1e-5)


def test_tensor_parallel_backbone_sharding(model, batch):
    """Backbone params shard over the 'model' axis; forward still matches."""
    cfg, frozen, trainable = model
    mesh = mesh_mod.make_mesh(n_data=2, n_model=4)
    frozen_tp = mesh_mod.shard_backbone(mesh, frozen)

    # stacked qkv weights (L, d, 3d) shard their column axis 4-way on 'model'
    qkv = frozen_tp["visual"]["blocks"]["attn"]["qkv"]["w"]
    shard_shape = qkv.addressable_shards[0].data.shape
    assert shard_shape[2] == qkv.shape[2] // 4

    anchors = jnp.asarray(
        np.random.default_rng(4).standard_normal(
            (8, cfg.clip.embed_dim, 2)).astype(np.float32))
    single = make_predict_fn(cfg, IMG, "Industrial")
    ref_map, ref_logit = single(frozen, trainable,
                                jnp.asarray(batch["image"]), anchors)

    out_map, out_logit = single(frozen_tp, trainable,
                                jnp.asarray(batch["image"]), anchors)
    np.testing.assert_allclose(np.asarray(out_map), np.asarray(ref_map),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_logit), np.asarray(ref_logit),
                               rtol=1e-3, atol=1e-4)


def test_multislice_mesh_stage2_matches_single_device(model, batch):
    """('replica', 'data', 'model') mesh — DCN-replica DP x intra-slice DP x
    Megatron TP — produces the same step as a single device. On the virtual
    CPU mesh the 'replica' axis stands in for the DCN tier; the shardings and
    collectives are exactly what a real multi-slice run would compile."""
    cfg, frozen, trainable = model
    train_cfg = TrainConfig(img_size=IMG, image_epoch=1,
                            compute_dtype="float32")
    tx = optim.stage2_optimizer(trainable, train_cfg.image_lr, 10)
    opt_state = tx.init(trainable)
    anchors = jnp.asarray(
        np.random.default_rng(2).standard_normal(
            (8, cfg.clip.embed_dim, 2)).astype(np.float32))
    args = (jnp.asarray(batch["image"]), jnp.asarray(batch["mask"]),
            jnp.asarray(batch["label"]), anchors,
            jnp.ones(batch["image"].shape[0], jnp.float32))

    single = steps.make_stage2_step(cfg, train_cfg, tx,
                                    compute_dtype=jnp.float32, donate=False)
    t1, _, loss1 = single(trainable, opt_state, frozen, *args)

    mesh = mesh_mod.make_multislice_mesh(2, n_data=2, n_model=2)
    assert dict(mesh.shape) == {"replica": 2, "data": 2, "model": 2}
    # Batch axes shard over both DP tiers (replica x data = 4-way).
    assert mesh_mod.batch_sharding(mesh).spec == jax.sharding.PartitionSpec(
        ("replica", "data"))
    frozen_tp = mesh_mod.shard_backbone(mesh, frozen)
    sharded = steps.make_stage2_step(
        cfg, train_cfg, tx, compute_dtype=jnp.float32, mesh=mesh,
        donate=False,
        frozen_sharding=mesh_mod.backbone_param_sharding(mesh, frozen))
    t8, _, loss8 = sharded(trainable, opt_state, frozen_tp, *args)

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-4)
    w1 = np.asarray(t1["image_adapter"]["det_proj"]["w"])
    w8 = np.asarray(t8["image_adapter"]["det_proj"]["w"])
    np.testing.assert_allclose(w1, w8, rtol=1e-4, atol=1e-5)


def test_stage1_step_data_parallel(model, batch):
    cfg, frozen, trainable = model
    from aa_clip_iqm_tpu.data.synthetic import register_synthetic
    import tempfile

    register_synthetic(tempfile.mkdtemp(), dataset_name="SynthP")
    from aa_clip_iqm_tpu.prompts import batched_prompt_tokens

    classes, toks, n_norm, n_abn = batched_prompt_tokens("SynthP")
    train_cfg = TrainConfig(img_size=IMG, compute_dtype="float32")
    tx = optim.stage1_optimizer()
    text_params = trainable["text_adapter"]
    opt_state = tx.init(text_params)

    mesh = mesh_mod.make_mesh()
    visual_fn = steps.make_stage1_visual_fn(cfg, mesh=mesh)
    step_fn = steps.make_stage1_step(cfg, train_cfg, toks, len(classes),
                                     n_norm, n_abn, tx, mesh=mesh)
    feats = visual_fn(frozen, jnp.asarray(batch["image"]))
    class_idx = jnp.zeros(8, jnp.int32)
    weights = jnp.ones(8, jnp.float32)
    new_params, _, loss = step_fn(text_params, opt_state, frozen, feats,
                                  jnp.asarray(batch["mask"]), class_idx,
                                  weights)
    assert np.isfinite(float(loss))
    diff = np.abs(np.asarray(new_params["layers"]["w"]) -
                  np.asarray(text_params["layers"]["w"])).max()
    assert diff > 0


def test_multislice_mesh_validates_device_count():
    """make_multislice_mesh refuses silently-short device lists (ADVICE r2):
    asking for more mesh cells than devices is an error, not a truncation."""
    import pytest

    devices = jax.devices()
    with pytest.raises(ValueError, match="devices"):
        mesh_mod.make_multislice_mesh(2, n_data=len(devices), n_model=2,
                                      devices=devices)
    # Exact fit still works.
    mesh = mesh_mod.make_multislice_mesh(2, n_data=len(devices) // 4,
                                         n_model=2, devices=devices)
    assert mesh.devices.shape == (2, len(devices) // 4, 2)
    # n_model bigger than a slice would derive n_data == 0 -> a zero-device
    # mesh; must raise up front instead.
    with pytest.raises(ValueError, match="data axis"):
        mesh_mod.make_multislice_mesh(len(devices), n_model=2,
                                      devices=devices)


# ----------------------------------------------------------------------
# Multi-host readiness (parallel/multihost.py) — validated at the only
# process count this machine has (1); the multi-process branches follow the
# documented JAX contract and need a real pod.
# ----------------------------------------------------------------------

def test_multihost_noop_without_optin(monkeypatch):
    from aa_clip_iqm_tpu.parallel import multihost

    monkeypatch.delenv("AACLIP_MULTIHOST", raising=False)
    assert multihost.maybe_initialize() is False


def test_process_local_rows_single_process():
    from aa_clip_iqm_tpu.parallel import multihost

    mesh = mesh_mod.make_mesh()
    assert multihost.process_local_rows(mesh, 16) == (0, 16)
    # 'model'-axis replicas share rows; dedup must keep the range exact
    tp = mesh_mod.make_mesh(n_data=4, n_model=2)
    assert multihost.process_local_rows(tp, 8) == (0, 8)
    ms = mesh_mod.make_multislice_mesh(n_slices=2, n_data=2, n_model=2)
    assert multihost.process_local_rows(ms, 4) == (0, 4)


def test_global_device_batch_matches_device_put():
    from aa_clip_iqm_tpu.parallel import multihost

    mesh = mesh_mod.make_mesh()
    rng = np.random.default_rng(11)
    batch = {
        "image": rng.standard_normal((8, 3, 8, 8)).astype(np.float32),
        "label": rng.integers(0, 2, 8).astype(np.int64),
        "class_name": ["a"] * 8,
    }
    out = multihost.global_device_batch(mesh, batch, global_batch=8)
    assert out["class_name"] == ["a"] * 8  # non-arrays pass through
    want = mesh_mod.batch_sharding(mesh)
    for key in ("image", "label"):
        assert out[key].sharding.is_equivalent_to(want, out[key].ndim)
        np.testing.assert_array_equal(np.asarray(out[key]), batch[key])
