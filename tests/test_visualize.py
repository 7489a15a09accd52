"""Visualization parity vs a cv2 transcription of the reference
(forward_utils.py:311-355: apply_ad_scoremap / visualize) — VERDICT r2
weak #4. Pixel-exact assertions on synthetic maps."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from aa_clip_iqm_tpu.evaluation.visualize import (
    apply_ad_scoremap,
    dump_heatmaps,
    render_overlay,
)


def ref_apply_ad_scoremap(image, scoremap, alpha=0.5):
    """Transcription of forward_utils.py:311-313."""
    scoremap = cv2.applyColorMap(scoremap, cv2.COLORMAP_JET)
    return (alpha * image + (1 - alpha) * scoremap).astype(np.uint8)


def test_render_overlay_matches_open_coded_formula():
    """render_overlay (the shared single-map front-end used by the serving
    and single-image CLIs) == min-max normalize -> uint8 heat ->
    apply_ad_scoremap, byte-identical."""
    rng = np.random.default_rng(0)
    amap = rng.random((24, 24)).astype(np.float32) * 3 - 1
    bgr = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    norm = (amap - amap.min()) / (amap.max() - amap.min() + 1e-8)
    expect = ref_apply_ad_scoremap(bgr, (norm * 255).astype(np.uint8))
    np.testing.assert_array_equal(render_overlay(bgr, amap), expect)
    # Degenerate constant map must not NaN (the +1e-8 guard).
    out = render_overlay(bgr, np.full((24, 24), 0.5, np.float32))
    assert out.dtype == np.uint8 and out.shape == (24, 24, 3)


def ref_visualize(pixel_label, pixel_preds, file_names, save_dir,
                  dataset_name, class_name, data_root):
    """Transcription of forward_utils.py:316-355 (visualize), with
    DATA_PATH[dataset_name] replaced by the data_root argument. MVTec-only
    filename scheme, like the reference (:343-347)."""
    if pixel_preds.max() != 1:
        pixel_preds = (pixel_preds - pixel_preds.min()) / (
            pixel_preds.max() - pixel_preds.min())
        pixel_preds = (pixel_preds * 255).astype(np.uint8)
    if pixel_label.dtype != np.uint8:
        pixel_label = pixel_label != 0
        pixel_label = (pixel_label * 255).astype(np.uint8)
    save_dir = os.path.join(save_dir, "visualization", dataset_name,
                            class_name)
    os.makedirs(save_dir, exist_ok=True)
    for idx, file in enumerate(file_names):
        image = cv2.imread(os.path.join(data_root, file))
        image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
        image = cv2.resize(image, pixel_label.shape[-2:])
        save_image_list = [image]
        if dataset_name == "MVTec":
            damage_name, image_name = file.split("/")[-2:]
            file_name = f"{damage_name}_{image_name}"
        else:
            raise NotImplementedError
        save_image_list.append(
            cv2.cvtColor(pixel_label[idx, 0], cv2.COLOR_GRAY2RGB))
        save_image_list.append(
            cv2.cvtColor(pixel_preds[idx], cv2.COLOR_GRAY2RGB))
        save_image_list = save_image_list[:1] + [
            ref_apply_ad_scoremap(image, _) for _ in save_image_list[1:]]
        cv2.imwrite(os.path.join(save_dir, file_name),
                    np.vstack(save_image_list))


def test_apply_ad_scoremap_matches_reference(rng):
    image = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    scoremap = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    ours = apply_ad_scoremap(image, scoremap)
    # The reference feeds apply_ad_scoremap a GRAY2RGB-replicated scoremap
    # (forward_utils.py:349-353); cv2.applyColorMap on replicated CV_8UC3
    # applies the LUT per channel, which equals the single-channel result —
    # both call shapes must agree with the transcription.
    ref_1ch = ref_apply_ad_scoremap(image, scoremap)
    ref_3ch = ref_apply_ad_scoremap(
        image, cv2.cvtColor(scoremap, cv2.COLOR_GRAY2RGB))
    np.testing.assert_array_equal(ours, ref_1ch)
    np.testing.assert_array_equal(ref_1ch, ref_3ch)


@pytest.fixture
def mvtec_layout(tmp_path, rng):
    """A fake MVTec-style test tree with real PNGs on disk."""
    size = 24
    files, root = [], str(tmp_path / "data")
    for damage, name in (("broken_large", "000.png"), ("good", "001.png")):
        rel = f"bottle/test/{damage}/{name}"
        p = os.path.join(root, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        cv2.imwrite(p, rng.integers(0, 256, (size, size, 3)).astype(np.uint8))
        files.append(rel)
    labels = (rng.random((2, 1, size, size)) > 0.7).astype(np.float32)
    preds = rng.random((2, size, size)).astype(np.float32)
    return root, files, labels, preds, size


def test_dump_heatmaps_pixel_parity_mvtec(tmp_path, mvtec_layout):
    """Byte-identical output PNGs vs the reference transcription on the
    MVTec filename scheme (stacked original / GT overlay / pred overlay)."""
    root, files, labels, preds, size = mvtec_layout
    ours_dir = str(tmp_path / "ours")
    ref_dir = str(tmp_path / "ref")
    dump_heatmaps(labels, preds, files, ours_dir, "MVTec", "bottle",
                  data_root=root)
    ref_visualize(labels, preds, files, ref_dir, "MVTec", "bottle",
                  data_root=root)

    names = sorted(os.listdir(
        os.path.join(ref_dir, "visualization", "MVTec", "bottle")))
    assert names == ["broken_large_000.png", "good_001.png"]
    ours_names = sorted(os.listdir(
        os.path.join(ours_dir, "visualization", "MVTec", "bottle")))
    assert ours_names == names  # generalized scheme == MVTec scheme on MVTec
    for n in names:
        ours = cv2.imread(
            os.path.join(ours_dir, "visualization", "MVTec", "bottle", n))
        ref = cv2.imread(
            os.path.join(ref_dir, "visualization", "MVTec", "bottle", n))
        assert ours.shape == (3 * size, size, 3)  # 3 stacked panels
        np.testing.assert_array_equal(ours, ref)


def test_dump_heatmaps_generalizes_beyond_mvtec(tmp_path, mvtec_layout):
    """Non-MVTec datasets get the same flat '{parent}_{name}' scheme instead
    of the reference's NotImplementedError (forward_utils.py:343-347) —
    deliberate generalization, pixel content still parity."""
    root, files, labels, preds, size = mvtec_layout
    out = str(tmp_path / "gen")
    dump_heatmaps(labels, preds, files, out, "SomethingElse", "bottle",
                  data_root=root)
    names = sorted(os.listdir(
        os.path.join(out, "visualization", "SomethingElse", "bottle")))
    assert names == ["broken_large_000.png", "good_001.png"]
    with pytest.raises(NotImplementedError):
        ref_visualize(labels, preds, files, str(tmp_path / "refgen"),
                      "SomethingElse", "bottle", data_root=root)


def test_dump_heatmaps_constant_and_unit_max_maps(tmp_path, mvtec_layout):
    """Degenerate inputs the reference mishandles: a constant map divides by
    zero (NaN) and a max==1.0 float map skips uint8 conversion entirely
    (forward_utils.py:324-328), crashing cvtColor. Ours must write valid
    panels for both."""
    root, files, labels, _, size = mvtec_layout
    for tag, preds in (
            ("const", np.full((2, size, size), 0.5, np.float32)),
            ("unitmax", np.linspace(0, 1, 2 * size * size, dtype=np.float32)
             .reshape(2, size, size))):
        out = str(tmp_path / tag)
        dump_heatmaps(labels, preds, files, out, "MVTec", "bottle",
                      data_root=root)
        for n in ("broken_large_000.png", "good_001.png"):
            img = cv2.imread(
                os.path.join(out, "visualization", "MVTec", "bottle", n))
            assert img is not None and img.shape == (3 * size, size, 3)
