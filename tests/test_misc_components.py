"""Patch dropout, per-sentence prompts, profiling helpers."""
import numpy as np

import jax
import jax.numpy as jnp

from aa_clip_iqm_tpu.ops.layers import patch_dropout
from aa_clip_iqm_tpu.utils.profiling import StepTimer, sync, trace


def test_patch_dropout_keeps_cls_and_count(rng):
    x = jnp.asarray(rng.standard_normal((2, 17, 8)).astype(np.float32))
    out = patch_dropout(jax.random.PRNGKey(0), x, rate=0.5)
    # CLS kept + max(1, int(16*0.5)) = 8 tokens
    assert out.shape == (2, 9, 8)
    np.testing.assert_array_equal(np.asarray(out[:, 0]), np.asarray(x[:, 0]))
    # every kept token is one of the input tokens
    src = np.asarray(x[0, 1:])
    for tok in np.asarray(out[0, 1:]):
        assert any(np.allclose(tok, s) for s in src)


def test_patch_dropout_zero_rate_identity(rng):
    x = jnp.asarray(rng.standard_normal((2, 5, 4)).astype(np.float32))
    out = patch_dropout(jax.random.PRNGKey(0), x, rate=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_per_sentence_embeddings_shape():
    from aa_clip_iqm_tpu.prompts import per_sentence_embeddings

    def encode(tokens):
        return jnp.ones((tokens.shape[0], 8))

    emb = per_sentence_embeddings(encode, "MVTec", "bottle")
    assert emb.shape == (16, 8)  # 6 normal + 10 abnormal sentences
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1), 1.0,
                               rtol=1e-5)


def test_step_timer_and_sync():
    timer = StepTimer()
    for _ in range(3):
        timer.start()
        out = jnp.ones((8, 8)) * 2
        timer.stop(out)
    s = timer.summary()
    assert s["steps"] == 3 and s["mean_s"] > 0


def test_trace_noop_without_dir():
    with trace(None):
        sync(jnp.ones(3))
