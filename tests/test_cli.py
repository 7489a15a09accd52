"""In-suite end-to-end drives of the three CLI mains (tiny model, synthetic
data). The verify skill drives the same surfaces manually; these keep them
from regressing between drives."""
import os
import sys

import numpy as np
import pytest

import jax

from aa_clip_iqm_tpu.data.synthetic import generate, register_synthetic

IMG = 56


@pytest.fixture(scope="module")
def cli_data(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("clidata"))
    generate(root, n_normal=4, n_anomalous=4, size=IMG, seed=11,
             class_names=("widget",))
    metadata_root = register_synthetic(root)
    return root, metadata_root


def _run_main(monkeypatch, module, argv):
    monkeypatch.setattr(sys, "argv", [module.__name__] + argv)
    return module.main()


def test_train_then_evaluate_cli(cli_data, monkeypatch, capsys):
    from aa_clip_iqm_tpu.cli import evaluate as evaluate_cli
    from aa_clip_iqm_tpu.cli import train as train_cli

    root, metadata_root = cli_data
    save_path = os.path.join(root, "ckpt")
    _run_main(monkeypatch, train_cli, [
        "--model_name", "tiny-test", "--img_size", str(IMG),
        "--dataset", "Synth", "--training_mode", "full_shot",
        "--text_batch_size", "4", "--image_batch_size", "4",
        "--text_epoch", "1", "--image_epoch", "1",
        "--compute_dtype", "float32", "--random_backbone",
        "--metadata_root", metadata_root, "--save_path", save_path])
    assert os.path.isdir(os.path.join(save_path, "text_adapter"))
    assert os.path.isdir(os.path.join(save_path, "image_adapter_1"))

    _run_main(monkeypatch, evaluate_cli, [
        "--model_name", "tiny-test", "--img_size", str(IMG),
        "--dataset", "Synth", "--image_batch_size", "4",
        "--compute_dtype", "float32", "--random_backbone",
        "--metadata_root", metadata_root, "--save_path", save_path])
    out = capsys.readouterr().out
    assert "Average" in out and "pixel AUC" in out


def test_single_image_cli_zero_shot(cli_data, monkeypatch, capsys, tmp_path):
    from aa_clip_iqm_tpu.cli import single_image as si_cli

    root, _ = cli_data
    img_dir = os.path.join(root, "Synth", "widget", "test", "defect")
    image = os.path.join(img_dir, sorted(os.listdir(img_dir))[0])
    out = str(tmp_path / "map.png")
    _run_main(monkeypatch, si_cli, [
        "--model_name", "tiny-test", "--img_size", str(IMG),
        "--image_path", image, "--class_name", "widget",
        "--dataset", "Synth", "--random_backbone",
        "--compute_dtype", "float32", "--out", out])
    printed = capsys.readouterr().out
    assert "image anomaly score" in printed
    amap = np.load(str(tmp_path / "map.npy"))
    assert amap.shape == (IMG, IMG) and np.isfinite(amap).all()


def test_single_image_cli_visualize(cli_data, monkeypatch, tmp_path):
    cv2 = pytest.importorskip("cv2")
    from aa_clip_iqm_tpu.cli import single_image as si_cli

    root, _ = cli_data
    img_dir = os.path.join(root, "Synth", "widget", "test", "defect")
    image = os.path.join(img_dir, sorted(os.listdir(img_dir))[0])
    out = str(tmp_path / "overlay.png")
    _run_main(monkeypatch, si_cli, [
        "--model_name", "tiny-test", "--img_size", str(IMG),
        "--image_path", image, "--class_name", "widget",
        "--dataset", "Synth", "--random_backbone",
        "--compute_dtype", "float32", "--visualize", "--out", out])
    overlay = cv2.imread(out)
    assert overlay is not None and overlay.shape == (IMG, IMG, 3)


def test_bench_rejects_unknown_mode(monkeypatch):
    """A typo'd AACLIP_BENCH_MODE must raise (before backend init), not
    silently run the inference bench under the intended label — same
    contract as the AACLIP_BENCH_QUANT tier strings."""
    from aa_clip_iqm_tpu.cli import bench

    monkeypatch.setenv("AACLIP_BENCH_MODE", "latnecy")
    with pytest.raises(ValueError, match="AACLIP_BENCH_MODE"):
        bench.main_dispatch()


def test_bench_sweep_configs():
    """AACLIP_BENCH_SWEEP parsing: unset -> the single env-driven config,
    'grid' (legacy alias '1') -> the batch x attention grid, a comma list ->
    those batches honoring the AACLIP_BENCH_PALLAS default (ADVICE r3: a
    comma list must not silently override PALLAS=0), malformed/non-positive
    -> ValueError (never a silent fallback)."""
    from aa_clip_iqm_tpu.cli.bench import _sweep_configs

    assert _sweep_configs(None, 16, True) == [(16, True)]
    assert _sweep_configs("", 8, False) == [(8, False)]
    grid = [(16, False), (16, True), (32, False), (32, True)]
    assert _sweep_configs("grid", 16, True) == grid
    assert _sweep_configs("1", 16, True) == grid  # legacy alias
    assert _sweep_configs("16,24,32", 16, True) == [
        (16, True), (24, True), (32, True)]
    # comma list honors an explicit AACLIP_BENCH_PALLAS=0
    assert _sweep_configs("16,24", 16, False) == [(16, False), (24, False)]
    # batch-1 measurements use AACLIP_BENCH_BATCH=1 without SWEEP ('1' stays
    # the legacy grid alias); '2,1' style lists still include batch 1
    assert _sweep_configs("2,1", 16, True) == [(2, True), (1, True)]
    with pytest.raises(ValueError, match="AACLIP_BENCH_SWEEP"):
        _sweep_configs("16,fast", 16, True)
    with pytest.raises(ValueError, match="positive"):
        _sweep_configs("16,0", 16, True)


def test_bench_median_spread_helpers(monkeypatch):
    """Median-of-N bench statistics: median + (max-min)/median spread, and
    the AACLIP_BENCH_REPEATS knob (>=1, default 3)."""
    from aa_clip_iqm_tpu.cli.bench import _median_spread, _repeats

    med, spread = _median_spread([100.0, 110.0, 105.0])
    assert med == 105.0
    np.testing.assert_allclose(spread, 100.0 * 10.0 / 105.0)
    med, spread = _median_spread([50.0])
    assert (med, spread) == (50.0, 0.0)

    monkeypatch.delenv("AACLIP_BENCH_REPEATS", raising=False)
    assert _repeats() == 3
    monkeypatch.setenv("AACLIP_BENCH_REPEATS", "5")
    assert _repeats() == 5
    monkeypatch.setenv("AACLIP_BENCH_REPEATS", "0")
    assert _repeats() == 1
