"""Model-config registry + loader validation."""
import pytest

from aa_clip_iqm_tpu.configs import get_model_config, list_models
from aa_clip_iqm_tpu.loader import build_model_config


def test_registry_lists_both_families():
    models = list_models()
    assert "ViT-L-14-336" in models
    assert "ViT-B-16-plus-240" in models


def test_vit_l_config():
    cfg = get_model_config("ViT-L-14-336", img_size=518)
    assert cfg.embed_dim == 768
    assert cfg.vision.width == 1024 and cfg.vision.layers == 24
    assert cfg.vision.heads == 16
    assert cfg.vision.grid == 37
    assert cfg.text.width == 768 and cfg.text.heads == 12


def test_vit_b_plus_config():
    cfg = get_model_config("ViT-B-16-plus-240")
    assert cfg.embed_dim == 640
    assert cfg.vision.width == 896 and cfg.vision.patch_size == 16
    assert cfg.vision.heads == 14
    assert cfg.text.width == 640


def test_slash_name_normalized():
    cfg = get_model_config("ViT-L/14-336", img_size=518)
    assert cfg.vision.layers == 24


def test_unknown_model_raises():
    with pytest.raises(FileNotFoundError, match="available"):
        get_model_config("ViT-XXL-999")


def test_img_size_must_tile_patches():
    with pytest.raises(ValueError, match="multiple of the patch size"):
        build_model_config(img_size=500)  # 500 % 14 != 0


def test_unknown_dataset_raises():
    from aa_clip_iqm_tpu.data.datasets import get_dataset

    with pytest.raises(KeyError, match="available"):
        get_dataset("NopeSet", 70, None, -1, "test")
