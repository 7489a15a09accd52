"""ctypes binding for the native C++ image pipeline (native/image_pipeline.cpp).

Auto-builds the shared library on first use when a compiler is present;
callers fall back to the PIL/numpy path when it is not. All functions take
and return numpy arrays.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libaaclip_data.so"))

_lib = None
_load_failed = False


def _float_ptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8_ptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _double_ptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def load_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if not os.path.isfile(_LIB_PATH):
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.resize_bicubic_rgb_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int]
        lib.resize_nearest_mask_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int]
        lib.normalize_chw.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float)]
        lib.warp_affine_chw.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int]
        lib.flip_chw.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        _lib = lib
    except (OSError, subprocess.CalledProcessError):
        _load_failed = True
    return _lib


def available() -> bool:
    return load_library() is not None


def resize_bicubic_rgb(img_u8: np.ndarray, size: int) -> np.ndarray:
    """uint8 (H, W, 3) -> float32 (3, size, size) in [0,1], PIL-parity."""
    lib = load_library()
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    out = np.empty((3, size, size), np.float32)
    lib.resize_bicubic_rgb_u8(_u8_ptr(img_u8), img_u8.shape[0],
                              img_u8.shape[1], _float_ptr(out), size, size)
    return out


def resize_nearest_mask(mask_u8: np.ndarray, size: int) -> np.ndarray:
    lib = load_library()
    mask_u8 = np.ascontiguousarray(mask_u8, np.uint8)
    out = np.empty((size, size), np.float32)
    lib.resize_nearest_mask_u8(_u8_ptr(mask_u8), mask_u8.shape[0],
                               mask_u8.shape[1], _float_ptr(out), size, size)
    return out


def normalize_chw(img: np.ndarray, mean, std) -> np.ndarray:
    lib = load_library()
    img = np.ascontiguousarray(img, np.float32)
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    lib.normalize_chw(_float_ptr(img), img.shape[0], img.shape[1],
                      img.shape[2], _float_ptr(mean), _float_ptr(std))
    return img


def warp_affine_chw(stack: np.ndarray, M: np.ndarray,
                    bilinear: bool = False) -> np.ndarray:
    """cv2.warpAffine-equivalent warp (zero border) of (C, H, W). Default is
    nearest-neighbor — torchvision's RandomRotation/RandomAffine default,
    which the reference depends on to keep mask channels binary."""
    lib = load_library()
    stack = np.ascontiguousarray(stack, np.float32)
    M = np.ascontiguousarray(M, np.float64)
    out = np.empty_like(stack)
    lib.warp_affine_chw(_float_ptr(stack), _float_ptr(out), stack.shape[0],
                        stack.shape[1], stack.shape[2], _double_ptr(M),
                        int(bilinear))
    return out


def flip_chw(stack: np.ndarray, horizontal: bool, vertical: bool) -> np.ndarray:
    lib = load_library()
    stack = np.ascontiguousarray(stack, np.float32)
    out = np.empty_like(stack)
    lib.flip_chw(_float_ptr(stack), _float_ptr(out), stack.shape[0],
                 stack.shape[1], stack.shape[2], int(horizontal),
                 int(vertical))
    return out
