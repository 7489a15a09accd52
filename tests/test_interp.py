"""Resize/blur linear-operator parity vs torch F.interpolate + manual conv."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from aa_clip_iqm_tpu.ops import interp


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("src,dst", [(37, 518), (17, 238), (5, 11), (8, 8)])
def test_bilinear_matrix_matches_torch(rng, align_corners, src, dst):
    img = rng.standard_normal((2, 1, src, src)).astype(np.float32)
    ref = F.interpolate(
        torch.from_numpy(img), size=(dst, dst), mode="bilinear",
        align_corners=align_corners,
    ).numpy()
    out = np.asarray(interp.resize_bilinear(img, dst, dst, align_corners))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("ks,sigma", [(7, 1.0), (9, 1.5)])
def test_gaussian_kernel_normalized(ks, sigma):
    k = interp.gaussian_kernel1d(ks, sigma)
    assert k.shape == (ks,)
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)
    np.testing.assert_allclose(k, k[::-1])  # symmetric for odd ks


@pytest.mark.parametrize("ks,sigma", [(7, 1.0), (9, 1.5)])
def test_reflect_blur_matches_torch_conv(rng, ks, sigma):
    """Blur operator == reflect-pad + conv2d with the separable kernel
    (kornia gaussian_blur2d semantics)."""
    n = 37
    img = rng.standard_normal((2, 1, n, n)).astype(np.float32)
    k1 = interp.gaussian_kernel1d(ks, sigma).astype(np.float64)
    kernel2d = np.outer(k1, k1).astype(np.float32)
    pad = ks // 2
    x = torch.from_numpy(img)
    x = F.pad(x, (pad, pad, pad, pad), mode="reflect")
    ref = F.conv2d(x, torch.from_numpy(kernel2d)[None, None]).numpy()

    G = interp.reflect_blur_matrix(n, ks, sigma)
    out = np.asarray(interp.apply_separable(G, G, img))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_fused_blur_upsample_matches_sequential(rng):
    n, dst, ks, sigma = 37, 518, 7, 1.0
    img = rng.standard_normal((1, n, n)).astype(np.float32)
    G = interp.reflect_blur_matrix(n, ks, sigma)
    blurred = np.asarray(interp.apply_separable(G, G, img))
    seq = np.asarray(interp.resize_bilinear(blurred, dst, dst, align_corners=True))
    fused = np.asarray(interp.blur_and_upsample(img, dst, ks, sigma))
    np.testing.assert_allclose(fused, seq, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("src,dst", [(24, 37), (24, 24), (16, 37)])
def test_bicubic_matches_torch(rng, src, dst):
    grid = rng.standard_normal((src, src, 8)).astype(np.float32)
    t = torch.from_numpy(grid).permute(2, 0, 1)[None]
    ref = F.interpolate(
        t, size=(dst, dst), mode="bicubic", antialias=True, align_corners=False
    )[0].permute(1, 2, 0).numpy()
    out = interp.resize_grid_bicubic(grid, (dst, dst), antialias=True)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_pos_embed_resize_shape(rng):
    from aa_clip_iqm_tpu.models.clip import resize_pos_embed_np

    pos = rng.standard_normal((24 * 24 + 1, 32)).astype(np.float32)
    out = resize_pos_embed_np(pos, 37)
    assert out.shape == (37 * 37 + 1, 32)
    np.testing.assert_array_equal(out[0], pos[0])  # CLS row untouched
