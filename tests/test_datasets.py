"""Train-time augmentation parity vs the reference's executed PIL backend.

The reference's ColorJitter stack (dataset/__init__.py:48-67) runs through
torchvision's PIL backend, i.e. PIL ImageEnhance exactly:
Brightness = Image.blend(black, img, f); Contrast = blend from the rounded
ImageStat mean of img.convert('L'); Color = blend from img.convert('L').
datasets._color_jitter transcribes those fixed-point/truncation semantics in
numpy — these tests pin it byte-identical against real PIL.
"""
import numpy as np
import pytest
from PIL import Image, ImageEnhance

from aa_clip_iqm_tpu.data import datasets


FACTOR_SETS = [
    (0.5, 1.5, 1.0),
    (1.37, 0.63, 1.12),
    (1.0, 1.0, 1.0),
    (1.5, 0.5, 0.5),
    (0.72, 1.08, 1.49),
]


def _pil_jitter(u8_hwc, fb, fc, fs):
    pil = Image.fromarray(u8_hwc)
    pil = ImageEnhance.Brightness(pil).enhance(fb)
    pil = ImageEnhance.Contrast(pil).enhance(fc)
    pil = ImageEnhance.Color(pil).enhance(fs)
    return np.asarray(pil, np.uint8)


@pytest.mark.parametrize("factors", FACTOR_SETS)
def test_color_jitter_byte_identical_to_pil(rng, factors):
    u8 = rng.integers(0, 256, (21, 17, 3), dtype=np.uint8)
    ref = _pil_jitter(u8, *factors)
    out = datasets._color_jitter(np.random.default_rng(0), u8,
                                 factors=factors)
    np.testing.assert_array_equal(out, ref)


def test_pil_gray_matches_convert_l(rng):
    """_pil_gray == Image.convert('L'): truncated 16.16 fixed-point luma."""
    u8 = rng.integers(0, 256, (13, 9, 3), dtype=np.uint8)
    ref = np.asarray(Image.fromarray(u8).convert("L"), np.uint8)
    np.testing.assert_array_equal(datasets._pil_gray(u8), ref)


def test_color_jitter_random_draw_order(rng):
    """Each stage draws (p-gate, factor) independently in brightness ->
    contrast -> saturation order; a seeded rng reproduces the composition."""
    u8 = rng.integers(0, 256, (11, 11, 3), dtype=np.uint8)
    out1 = datasets._color_jitter(np.random.default_rng(7), u8)
    out2 = datasets._color_jitter(np.random.default_rng(7), u8)
    np.testing.assert_array_equal(out1, out2)
    assert out1.dtype == np.uint8 and out1.shape == u8.shape


# ---------------------------------------------------------------------------
# Multi-worker decode (AACLIP_DATA_WORKERS)


def _collect(batches):
    return [{k: v for k, v in b.items()} for b in batches]


def _assert_batches_equal(a, b):
    assert len(a) == len(b)
    for ba, bb in zip(a, b):
        assert ba.keys() == bb.keys()
        for k in ba:
            if isinstance(ba[k], np.ndarray):
                np.testing.assert_array_equal(ba[k], bb[k])
            else:
                assert ba[k] == bb[k]


@pytest.fixture
def synth_root(tmp_path):
    from aa_clip_iqm_tpu.data.synthetic import generate
    return generate(str(tmp_path), n_normal=3, n_anomalous=4, size=32, seed=2)


def test_eval_workers_output_identical(synth_root, monkeypatch):
    """Eval decode is RNG-free: the thread-pool map must be order-preserving
    and bit-identical to the serial path."""
    data_path, meta_path = synth_root
    ds = datasets.SingleClassTestDataset(data_path, meta_path, img_size=24,
                                         class_name="widget")
    monkeypatch.setenv("AACLIP_DATA_WORKERS", "1")
    serial = _collect(ds.batches(3, pad_to_batch=True))
    monkeypatch.setenv("AACLIP_DATA_WORKERS", "4")
    threaded = _collect(ds.batches(3, pad_to_batch=True))
    _assert_batches_equal(serial, threaded)


def test_train_workers_deterministic(synth_root, monkeypatch):
    """workers>1 uses per-sample counter-derived RNG streams: two epochs'
    worth of batches from identically-seeded datasets must match exactly,
    independent of thread scheduling."""
    data_path, meta_path = synth_root
    monkeypatch.setenv("AACLIP_DATA_WORKERS", "4")
    runs = []
    for _ in range(2):
        ds = datasets.TrainDataset(data_path, meta_path, img_size=24, seed=9)
        runs.append(_collect(ds.batches(3)) + _collect(ds.batches(3)))
    _assert_batches_equal(runs[0], runs[1])


def test_train_workers_serial_stream_unchanged(synth_root, monkeypatch):
    """workers=1 (the default) must keep the legacy sequential RNG stream:
    same batches as an unset env var."""
    data_path, meta_path = synth_root
    monkeypatch.delenv("AACLIP_DATA_WORKERS", raising=False)
    ds = datasets.TrainDataset(data_path, meta_path, img_size=24, seed=5)
    default = _collect(ds.batches(4))
    monkeypatch.setenv("AACLIP_DATA_WORKERS", "1")
    ds = datasets.TrainDataset(data_path, meta_path, img_size=24, seed=5)
    explicit = _collect(ds.batches(4))
    _assert_batches_equal(default, explicit)


def test_data_workers_parsing(monkeypatch):
    monkeypatch.setenv("AACLIP_DATA_WORKERS", "bogus")
    assert datasets._data_workers() == 1
    monkeypatch.setenv("AACLIP_DATA_WORKERS", "-3")
    assert datasets._data_workers() == 1
    monkeypatch.setenv("AACLIP_DATA_WORKERS", "6")
    assert datasets._data_workers() == 6


def test_device_normalize_uint8_path_bit_identical(synth_root):
    """device_normalize mode: uint8 transfer + on-device CLIP normalization
    must reproduce the host-normalized float path exactly (the quantized
    resize output is lossless — PIL's resize emits uint8)."""
    import jax.numpy as jnp

    from aa_clip_iqm_tpu.evaluation.predict import _device_normalize

    data_path, meta_path = synth_root
    host = datasets.SingleClassTestDataset(data_path, meta_path, img_size=24,
                                           class_name="widget")
    dev = datasets.SingleClassTestDataset(data_path, meta_path, img_size=24,
                                          class_name="widget",
                                          device_normalize=True)
    for i in range(min(len(host), 3)):
        h, d = host[i], dev[i]
        assert d["image"].dtype == np.uint8
        normalized = np.asarray(_device_normalize(
            jnp.asarray(d["image"][None])))[0]
        np.testing.assert_allclose(normalized, h["image"], rtol=0, atol=2e-7)
        np.testing.assert_array_equal(d["mask"], h["mask"])
        assert d["file_name"] == h["file_name"]
