"""Native C++ image pipeline parity vs the PIL/cv2/numpy reference path."""
import numpy as np
import pytest
from PIL import Image

from aa_clip_iqm_tpu.data import native
from aa_clip_iqm_tpu.data.registry import IMAGE_MEAN, IMAGE_STD

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def test_bicubic_resize_matches_pil(rng):
    img = rng.integers(0, 256, (97, 123, 3)).astype(np.uint8)
    for size in (70, 256):
        ref = np.asarray(
            Image.fromarray(img).resize((size, size), Image.BICUBIC),
            np.float32).transpose(2, 0, 1) / 255.0
        out = native.resize_bicubic_rgb(img, size)
        assert out.shape == (3, size, size)
        # PIL computes in 8.8 fixed point; we use doubles. Off-by-one-LSB
        # rounding differences remain on upscale.
        np.testing.assert_allclose(out, ref, atol=1.01 / 255.0)


def test_nearest_mask_matches_pil(rng):
    mask = (rng.random((83, 57)) > 0.5).astype(np.uint8) * 255
    size = 64
    ref = (np.asarray(Image.fromarray(mask, "L").resize((size, size),
                                                        Image.NEAREST)) != 0
           ).astype(np.float32)
    out = native.resize_nearest_mask(mask, size)
    np.testing.assert_array_equal(out, ref)


def test_normalize_matches_numpy(rng):
    img = rng.random((3, 32, 32)).astype(np.float32)
    mean = np.asarray(IMAGE_MEAN, np.float32).reshape(3, 1, 1)
    std = np.asarray(IMAGE_STD, np.float32).reshape(3, 1, 1)
    ref = (img - mean) / std
    out = native.normalize_chw(img.copy(), IMAGE_MEAN, IMAGE_STD)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_warp_affine_bilinear_matches_cv2(rng):
    import cv2

    stack = rng.random((4, 48, 48)).astype(np.float32)
    M = cv2.getRotationMatrix2D((23.5, 23.5), 17.0, 1.0)
    ref = cv2.warpAffine(stack.transpose(1, 2, 0), M, (48, 48),
                         flags=cv2.INTER_LINEAR).transpose(2, 0, 1)
    out = native.warp_affine_chw(stack, M, bilinear=True)
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_warp_affine_nearest_matches_cv2_and_keeps_masks_binary(rng):
    import cv2

    img = rng.random((3, 48, 48)).astype(np.float32)
    mask = (rng.random((1, 48, 48)) > 0.5).astype(np.float32)
    stack = np.concatenate([img, mask], axis=0)
    M = cv2.getRotationMatrix2D((23.5, 23.5), -23.0, 1.0)
    ref = cv2.warpAffine(stack.transpose(1, 2, 0), M, (48, 48),
                         flags=cv2.INTER_NEAREST).transpose(2, 0, 1)
    out = native.warp_affine_chw(stack, M, bilinear=False)
    # identical pixel choice up to boundary rounding ties
    mismatches = np.mean(out != ref)
    assert mismatches < 0.02
    assert set(np.unique(out[3])) <= {0.0, 1.0}  # mask stays binary


def test_flip_matches_numpy(rng):
    stack = rng.random((4, 16, 16)).astype(np.float32)
    np.testing.assert_array_equal(native.flip_chw(stack, True, False),
                                  stack[:, :, ::-1])
    np.testing.assert_array_equal(native.flip_chw(stack, False, True),
                                  stack[:, ::-1, :])
    np.testing.assert_array_equal(native.flip_chw(stack, True, True),
                                  stack[:, ::-1, ::-1])
